"""X1/X2 dedup: oracle parity + structural invariants (bucketed plans,
survivor determinism, LSH candidate containment)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bioclip_vector_db_spark.operators import dedup
from bioclip_vector_db_spark.plans.registry import load_all_plans
from bioclip_vector_db_spark.sources.catalog import load_table

load_all_plans()

def test_exact_dedup_survivor_is_lowest_id(spark):
    df = spark.createDataFrame(
        [(5, "aaa"), (1, "aaa"), (3, "bbb"), (2, "aaa")], "doc_id long, text string"
    )
    out = {r.text: r.doc_id for r in dedup.exact_dedup(df).collect()}
    assert out == {"aaa": 1, "bbb": 3}


def test_near_dup_pairs_found_for_known_dups(spark, sf_dir):
    """Re-ingesting identical documents must always be caught: identical
    shingle sets -> identical signatures -> same bucket -> Jaccard 1.0."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copy = docs.filter(F.col("doc_id") < 20).withColumn("doc_id", F.col("doc_id") + 10000)
    pairs = dedup.near_dup_pairs(docs.unionByName(copy), 0.999)
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    assert {(i, i + 10000) for i in range(20)} <= got


def test_lsh_candidates_never_all_pairs(spark, sf_dir):
    """No BroadcastNestedLoopJoin / CartesianProduct anywhere in the LSH
    plan — the round-1 quadratic-join regression guard."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = dedup.near_dup_pairs(docs, 0.8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bucketed_threshold_join_has_no_all_pairs_stage(spark, sf_dir):
    """The gated X4 plan must be bucketed end-to-end: every join an
    equi-join, no cross/nested-loop stage anywhere — the scale guarantee
    the exact all-pairs kernel cannot make."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    plan = (
        dedup.embedding_threshold_join(emb, 0.3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bucketed_threshold_join_identical_vectors_always_found(spark, sf_dir):
    """Recall -> 1 as similarity -> 1: an identical pair agrees on every
    band, so re-ingested copies are always candidates."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copy = emb.filter(F.col("vec_id") < 10).withColumn("vec_id", F.col("vec_id") + 10000)
    out = dedup.embedding_threshold_join(emb.unionByName(copy), 0.999)
    got = {(r.a_id, r.b_id) for r in out.collect()}
    assert {(i, i + 10000) for i in range(10)} <= got


def test_simhash_identical_vectors_same_bucket(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copy = emb.filter(F.col("vec_id") < 10).withColumn("vec_id", F.col("vec_id") + 10000)
    out = dedup.embedding_near_dups(emb.unionByName(copy), 0.999)
    got = {(r.a_id, r.b_id): r.similarity for r in out.collect()}
    assert set(got) == {(i, i + 10000) for i in range(10)}
    assert all(abs(s - 1.0) < 1e-6 for s in got.values())
