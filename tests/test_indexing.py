"""Indexing operator invariants (oracle parity for the registered queries
lives in test_registry_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bioclip_vector_db_spark.operators import indexing
from bioclip_vector_db_spark.plans.registry import load_all_plans

load_all_plans()



def test_faiss_ids_dense_per_partition(spark, sf_dir):
    """O20: within each partition, faiss_id is exactly 0..n_p-1 (the
    reference's per-partition defaultdict counter, faiss_utils.py:45)."""
    from bioclip_vector_db_spark.operators.knn import assigned_corpus

    ids = indexing.with_faiss_ids(assigned_corpus(spark, sf_dir))
    per_part = ids.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("faiss_id").alias("lo"),
        F.max("faiss_id").alias("hi"),
        F.countDistinct("faiss_id").alias("nd"),
    )
    for r in per_part.collect():
        assert r.lo == 0 and r.hi == r.n - 1 and r.nd == r.n


def test_trained_centroids_unit_norm(spark, sf_dir):
    """O18: cosine-mode KMeans centers are unit-normalized — the invariant
    the kmeans_train query used to carry before its oracle was reduced to
    the deterministic (partition_id, dim) projection."""
    from bioclip_vector_db_spark.functions.vector import l2_norm

    cent = indexing.trained_centroids(spark, sf_dir)
    norms = cent.select(F.round(l2_norm(F.col("centroid")), 6).alias("norm")).collect()
    assert norms and all(abs(r.norm - 1.0) < 1e-6 for r in norms)


def test_nlist_rule(spark):
    """O18: nlist = floor(10*sqrt(N)) (storage_impl.py:78-82)."""
    assert indexing.derive_nlist(10_000_000) == 31_622
    assert indexing.derive_nlist(1) == 10
    assert indexing.derive_nlist(0) == 1


def test_kmeans_refresh_drift_accounting(spark, sf_dir):
    """The refresh ledger must balance and actually detect drift: counts
    are conserved (every vector assigned exactly once before and after),
    the negated arrival slice forces real churn (some partition moves
    vectors out), every centroid that owns vectors shifts (its mean now
    includes drifted mass or lost members), and empty partitions keep
    their old centroid (shift exactly 0)."""
    from bioclip_vector_db_spark.plans.registry import QUERIES

    rows = QUERIES["kmeans_refresh"](spark, sf_dir).collect()
    assert len(rows) == 10  # one ledger row per partition
    total_before = sum(r.n_before for r in rows)
    total_after = sum(r.n_after for r in rows)
    assert total_before == total_after  # conservation
    assert any(r.n_moved_out > 0 for r in rows)  # drift detected
    for r in rows:
        assert 0 <= r.n_moved_out <= r.n_before, r
        if r.n_before == 0:
            assert r.centroid_shift == 0.0, r  # kept old centroid


# ---------------------------------------------------------------------------
# delete_ids (O7 extension): partition-pruned rewrite + rebuild equality
# ---------------------------------------------------------------------------


def _snapshot(root):
    """(relpath -> (size, mtime_ns)) for every file under root."""
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def test_delete_ids_rewrites_only_touched_partitions(spark, sf_dir, tmp_path):
    """The plan guard made byte-level: deleting ids confined to ONE
    partition must leave every other partition's files untouched (same
    names, sizes, mtimes) in BOTH tables, while the touched partition is
    rewritten, renumbered dense, and equal to a from-scratch rebuild."""
    import os

    from bioclip_vector_db_spark.operators.knn import fixture_centroids
    from bioclip_vector_db_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    cent = fixture_centroids(spark, sf_dir)
    idx = str(tmp_path / "index")
    indexing.append_to_index(spark, idx, emb, cent)

    corpus = spark.read.parquet(f"{idx}/corpus")
    p0 = corpus.select("partition_id").orderBy("partition_id").first()[0]
    victims = [
        r["vec_id"]
        for r in corpus.filter(F.col("partition_id") == p0)
        .select("vec_id")
        .orderBy("vec_id")
        .limit(3)
        .collect()
    ]
    assert victims

    before = {t: _snapshot(f"{idx}/{t}") for t in ("corpus", "id_mapping")}
    stats = indexing.delete_ids(
        spark, idx, spark.createDataFrame([(v,) for v in victims], "vec_id long")
    )
    assert stats == {"n_deleted": 3, "partitions_rewritten": 1}
    after = {t: _snapshot(f"{idx}/{t}") for t in ("corpus", "id_mapping")}

    for t in ("corpus", "id_mapping"):
        untouched_b = {
            k: v for k, v in before[t].items()
            if f"partition_id={p0}{os.sep}" not in k and not k.startswith("_")
        }
        untouched_a = {
            k: v for k, v in after[t].items()
            if f"partition_id={p0}{os.sep}" not in k and not k.startswith("_")
        }
        assert untouched_b == untouched_a, f"{t}: untouched partition files changed"
        assert {k for k in before[t] if f"partition_id={p0}{os.sep}" in k} != {
            k for k in after[t] if f"partition_id={p0}{os.sep}" in k
        } or before[t] != after[t], f"{t}: touched partition not rewritten"

    # Post-delete index == rebuilt-from-scratch without the victims.
    rebuilt_dir = str(tmp_path / "rebuilt")
    indexing.append_to_index(
        spark, rebuilt_dir, emb.filter(~F.col("vec_id").isin(victims)), cent
    )

    def rows(d):
        return sorted(
            tuple(r)
            for r in spark.read.parquet(f"{d}/id_mapping")
            .select("partition_id", "faiss_id", "original_id", "metadata")
            .collect()
        )

    assert rows(idx) == rows(rebuilt_dir)

    # The compaction planner picks up the shrunken layout unchanged.
    n_rows = spark.read.parquet(f"{idx}/corpus").count()
    indexing.compact_index(spark, idx)
    assert spark.read.parquet(f"{idx}/corpus").count() == n_rows


def test_delete_ids_drops_fully_emptied_partition(spark, sf_dir, tmp_path):
    """Deleting EVERY row of a partition must remove its directory from
    both tables (dynamic overwrite alone would leave it stale), and a
    later append re-seeds the partition's faiss_ids from zero."""
    import os

    from bioclip_vector_db_spark.operators.knn import fixture_centroids
    from bioclip_vector_db_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    cent = fixture_centroids(spark, sf_dir)
    idx = str(tmp_path / "index")
    indexing.append_to_index(spark, idx, emb, cent)

    corpus = spark.read.parquet(f"{idx}/corpus")
    p0 = corpus.select("partition_id").orderBy("partition_id").first()[0]
    victims_df = corpus.filter(F.col("partition_id") == p0).select("vec_id")
    n_victims = victims_df.count()
    victims = [r["vec_id"] for r in victims_df.collect()]

    stats = indexing.delete_ids(spark, idx, victims_df)
    assert stats["n_deleted"] == n_victims and stats["partitions_rewritten"] == 1
    for t in ("corpus", "id_mapping"):
        assert not os.path.exists(f"{idx}/{t}/partition_id={p0}")
    assert (
        spark.read.parquet(f"{idx}/corpus")
        .filter(F.col("partition_id") == p0)
        .count()
        == 0
    )

    # Re-append the deleted rows: the emptied partition restarts at 0 and
    # the result again equals a from-scratch build of the full corpus.
    indexing.append_to_index(
        spark, idx, emb.filter(F.col("vec_id").isin(victims)), cent
    )
    full_dir = str(tmp_path / "full")
    indexing.append_to_index(spark, full_dir, emb, cent)

    def rows(d):
        return sorted(
            tuple(r)
            for r in spark.read.parquet(f"{d}/id_mapping")
            .select("partition_id", "faiss_id", "original_id", "metadata")
            .collect()
        )

    assert rows(idx) == rows(full_dir)


def test_delete_ids_noop_on_unknown_ids(spark, sf_dir, tmp_path):
    from bioclip_vector_db_spark.operators.knn import fixture_centroids
    from bioclip_vector_db_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    cent = fixture_centroids(spark, sf_dir)
    idx = str(tmp_path / "index")
    indexing.append_to_index(spark, idx, emb, cent)
    before = spark.read.parquet(f"{idx}/id_mapping").count()
    stats = indexing.delete_ids(
        spark, idx, spark.createDataFrame([(10**12,)], "vec_id long")
    )
    assert stats == {"n_deleted": 0, "partitions_rewritten": 0}
    assert spark.read.parquet(f"{idx}/id_mapping").count() == before


def test_delete_ids_preserves_survivor_provenance(spark, sf_dir, tmp_path):
    """Deleting one row must not disturb the surviving mapping rows'
    created_at or metadata — they are ingestion provenance (TTL and
    audit queries key on created_at), not derived values. Only faiss_id
    may change (the dense renumbering)."""
    from bioclip_vector_db_spark.operators.knn import fixture_centroids
    from bioclip_vector_db_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    cent = fixture_centroids(spark, sf_dir)
    idx = str(tmp_path / "index")
    indexing.append_to_index(spark, idx, emb, cent)

    mapping = spark.read.parquet(f"{idx}/id_mapping")
    p0 = mapping.select("partition_id").orderBy("partition_id").first()[0]
    victim = int(
        mapping.filter(F.col("partition_id") == p0)
        .select(F.col("original_id").cast("long").alias("v"))
        .orderBy("v")
        .first()[0]
    )
    before = {
        r["original_id"]: (r["metadata"], r["created_at"])
        for r in mapping.filter(F.col("partition_id") == p0).collect()
    }
    indexing.delete_ids(
        spark, idx, spark.createDataFrame([(victim,)], "vec_id long")
    )
    after = {
        r["original_id"]: (r["metadata"], r["created_at"])
        for r in spark.read.parquet(f"{idx}/id_mapping")
        .filter(F.col("partition_id") == p0)
        .collect()
    }
    assert str(victim) not in after
    expected = {k: v for k, v in before.items() if k != str(victim)}
    assert after == expected


def test_delete_ids_torn_state_recovers_by_rerun(spark, sf_dir, tmp_path):
    """The crash-recovery contract (docstring): a failure BETWEEN the
    corpus overwrite and the id_mapping overwrite leaves the mapping
    holding deleted rows / stale faiss_ids. Recovery = re-running the
    SAME delete_ids call. Simulated here by restoring the pre-delete
    id_mapping over the post-delete corpus (exactly the torn state),
    then asserting the re-run converges both tables to the
    rebuilt-from-scratch oracle."""
    import shutil

    from bioclip_vector_db_spark.operators.knn import fixture_centroids
    from bioclip_vector_db_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    cent = fixture_centroids(spark, sf_dir)
    idx = str(tmp_path / "index")
    indexing.append_to_index(spark, idx, emb, cent)

    victims = [r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").limit(4).collect()]
    victims_df = spark.createDataFrame([(v,) for v in victims], "vec_id long")

    stale_mapping = str(tmp_path / "stale_mapping")
    shutil.copytree(f"{idx}/id_mapping", stale_mapping)
    indexing.delete_ids(spark, idx, victims_df)
    # Tear the index: corpus reflects the delete, id_mapping does not.
    shutil.rmtree(f"{idx}/id_mapping")
    shutil.copytree(stale_mapping, f"{idx}/id_mapping")

    # The torn mapping still resolves the victims' partitions, so the
    # re-run touches the same partitions and converges both tables
    # (the post-write count gate passes on the converged state).
    indexing.delete_ids(spark, idx, victims_df)

    rebuilt = str(tmp_path / "rebuilt")
    indexing.append_to_index(
        spark, rebuilt, emb.filter(~F.col("vec_id").isin(victims)), cent
    )

    def rows(d, table, cols):
        return sorted(
            tuple(r) for r in spark.read.parquet(f"{d}/{table}").select(*cols).collect()
        )

    m_cols = ["partition_id", "faiss_id", "original_id", "metadata"]
    assert rows(idx, "id_mapping", m_cols) == rows(rebuilt, "id_mapping", m_cols)
    c_cols = ["partition_id", "faiss_id", "vec_id"]
    assert rows(idx, "corpus", c_cols) == rows(rebuilt, "corpus", c_cols)
