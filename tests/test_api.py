"""API-parity layer: the reference's serving verbs over a built index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bioclip_vector_db_spark.api import VectorSearchEngine
from bioclip_vector_db_spark.operators.indexing import build_index
from bioclip_vector_db_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("api") / "index")
    emb = load_table(spark, sf_dir, "embeddings")
    build_index(emb, out, k=5)
    return VectorSearchEngine(spark, out)


def test_search_single_vector(spark, sf_dir, engine):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 17).collect()[0].embedding
    rows = engine.search(list(qv), top_n=5, nprobe=5).collect()
    assert rows[0].id == "17" and abs(rows[0].distance) < 1e-6
    assert [r.distance for r in rows] == sorted(r.distance for r in rows)


def test_health(engine):
    h = engine.health()
    assert h["status"] == "healthy"
    assert h["total_embeddings"] == 500
    assert h["dimension_consistent"] is True
    assert 1 <= h["partitions_loaded"] <= 5


def test_point_lookup(engine):
    row = engine.query("42").collect()
    assert len(row) == 1 and row[0].original_id == "42"


def test_reset_requires_force(engine):
    with pytest.raises(ValueError):
        engine.reset()


def test_add_batch_incremental_equals_rebuild(spark, sf_dir, tmp_path):
    """The incremental append contract: with centroids FIXED, building on
    the prefix then add_batch-ing the suffix yields the same three index
    tables — and the same search results — as one rebuild over the union.
    The append path must not re-fit (it never calls train_kmeans)."""
    from bioclip_vector_db_spark.operators.knn import fixture_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cent = fixture_centroids(spark, sf_dir)
    prefix, suffix = emb.filter(F.col("vec_id") < 400), emb.filter(F.col("vec_id") >= 400)

    full_dir = str(tmp_path / "full")
    incr_dir = str(tmp_path / "incr")
    build_index(emb, full_dir, centroids=cent)
    build_index(prefix, incr_dir, centroids=cent)
    engine = VectorSearchEngine(spark, incr_dir).add_batch(suffix)

    full = VectorSearchEngine(spark, full_dir)
    key = ["partition_id", "faiss_id"]
    for attr in ("corpus", "id_mapping"):
        a = getattr(full, attr).drop("created_at").orderBy(*key).collect()
        b = getattr(engine, attr).drop("created_at").orderBy(*key).collect()
        assert a == b, f"{attr} diverged between rebuild and append"

    qv = emb.filter(F.col("vec_id") == 450).collect()[0].embedding
    got = engine.search(list(qv), top_n=5, nprobe=3).collect()
    want = full.search(list(qv), top_n=5, nprobe=3).collect()
    assert got == want and got[0].id == "450"

    # Dedup guard (O12): re-adding the same rows must be a no-op.
    again = engine.add_batch(suffix)
    assert again.corpus.count() == full.corpus.count()


def test_compact_index_preserves_tables(spark, sf_dir, tmp_path):
    """After fragmenting appends, compaction must reduce file counts while
    keeping both tables and search results bit-identical."""
    from bioclip_vector_db_spark.operators.indexing import compact_index
    from bioclip_vector_db_spark.operators.knn import fixture_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cent = fixture_centroids(spark, sf_dir)
    d = str(tmp_path / "frag")
    build_index(emb.filter(F.col("vec_id") < 300), d, centroids=cent)
    engine = VectorSearchEngine(spark, d)
    engine = engine.add_batch(emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400)))
    engine = engine.add_batch(emb.filter(F.col("vec_id") >= 400))

    key = ["partition_id", "faiss_id"]
    before = {
        t: getattr(engine, t).drop("created_at").orderBy(*key).collect()
        for t in ("corpus", "id_mapping")
    }
    counts = compact_index(spark, d)
    after_engine = VectorSearchEngine(spark, d)
    for t in ("corpus", "id_mapping"):
        assert getattr(after_engine, t).drop("created_at").orderBy(*key).collect() == before[t], t
        assert counts[f"{t}_files_after"] < counts[f"{t}_files_before"], counts

    qv = emb.filter(F.col("vec_id") == 123).collect()[0].embedding
    assert after_engine.search(list(qv), top_n=5, nprobe=3).collect()[0].id == "123"
