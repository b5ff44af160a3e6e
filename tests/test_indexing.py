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
