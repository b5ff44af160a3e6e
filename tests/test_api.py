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
