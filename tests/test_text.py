"""X5 text analysis: oracle parity + invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from bioclip_vector_db_spark.operators import text as text_ops
from bioclip_vector_db_spark.plans.registry import load_all_plans
from bioclip_vector_db_spark.sources.catalog import load_table

load_all_plans()

def test_doc_stats_invariants(spark, sf_dir):
    stats = text_ops.doc_stats(load_table(spark, sf_dir, "documents"))
    bad = stats.filter(
        (F.col("n_distinct_words") > F.col("n_words"))
        | (F.col("distinct_ratio") > 1.0)
        | (F.col("n_words") <= 0)
    )
    assert bad.count() == 0


def test_lexical_fp_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta")], "doc_id long, text string"
    )
    fps = {r.doc_id: (r.content_fp, r.lexical_fp) for r in text_ops.fingerprints(df).collect()}
    assert fps[1][0] != fps[2][0]
    assert fps[1][1] == fps[2][1]


def test_word_count_total_matches_sum_of_doc_words(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    total_from_counts = text_ops.word_counts(docs).agg(F.sum("n")).collect()[0][0]
    total_from_stats = text_ops.doc_stats(docs).agg(F.sum("n_words")).collect()[0][0]
    assert total_from_counts == total_from_stats
