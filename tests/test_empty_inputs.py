"""Empty-input robustness: every reusable operator must handle a
zero-row input without throwing.

At 100 TB this is not a corner case — a filtered slice, a quiet
micro-batch, a partition with no survivors, or a fresh corpus all hand
operators empty DataFrames. The failure class is real: the sf0.1 parity
sweep caught dedup_minhash_eval emitting an all-NULL row on a zero-pair
slice (sum() over an empty join is NULL where count(*) is 0, and ANSI
0/0 then throws DIVIDE_BY_ZERO). This gate pins the contract for the
reusable operator surface: empty in → empty out (or the documented
one-row zero summary), never an exception.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from bioclip_vector_db_spark.operators import dedup, knn, text


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id bigint, text string")


def _empty_edges(spark):
    return spark.createDataFrame([], "a_id bigint, b_id bigint")


def _empty_embeddings(spark):
    return spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        ),
    )


DOC_OPERATORS = [
    ("exact_dedup", lambda s: dedup.exact_dedup(_empty_docs(s))),
    ("near_dup_pairs", lambda s: dedup.near_dup_pairs(_empty_docs(s), 0.5)),
    (
        "jaccard_pairs",
        lambda s: dedup.jaccard_pairs(_empty_docs(s), 0.5, max_shingle_df=None),
    ),
    ("duplicate_spans", lambda s: dedup.duplicate_spans(_empty_docs(s))),
    ("doc_stats", lambda s: text.doc_stats(_empty_docs(s))),
    (
        "language_id",  # passes the labeled lang column through, so it's required
        lambda s: text.language_id(
            s.createDataFrame([], "doc_id bigint, text string, lang string")
        ),
    ),
    ("quality_scores", lambda s: text.quality_scores(_empty_docs(s))),
    ("inverted_index", lambda s: text.inverted_index(_empty_docs(s))),
    ("winnowing_fingerprints", lambda s: text.winnowing_fingerprints(_empty_docs(s))),
    ("unicode_clean", lambda s: text.unicode_clean(_empty_docs(s))),
    ("near_dup_clusters", lambda s: dedup.near_dup_clusters(_empty_edges(s))),
    ("pagerank_fixed", lambda s: dedup.pagerank_fixed(_empty_edges(s))),
    ("triangle_counts", lambda s: dedup.triangle_counts(_empty_edges(s))),
]


@pytest.mark.parametrize("name,build", DOC_OPERATORS, ids=[n for n, _ in DOC_OPERATORS])
def test_operator_handles_empty_input(name, build, spark):
    assert build(spark).count() == 0


def test_minhash_confusion_empty_corpus(spark):
    """The confusion-matrix summary keeps its one-row zero-count contract
    even on a fully empty corpus (not just a pair-less one)."""
    row = dedup.minhash_confusion(_empty_docs(spark)).collect()
    assert len(row) == 1
    assert (row[0].tp, row[0].fn, row[0].fp) == (0, 0, 0)
    assert row[0].recall is None and row[0].precision is None


def test_mmr_rerank_empty_corpus(spark, sf_dir):
    """Zero candidates for every query: no output rows, no exception."""
    queries = knn._fixture_queries(spark, sf_dir).limit(1)
    assert knn.mmr_rerank(queries, _empty_embeddings(spark), k=3).count() == 0


def test_unicode_clean_null_text_passthrough(spark):
    """NULL text cells exist in real corpora; the Arrow batch must pass
    them through as NULL (clean_text/lengths all NULL), not crash in
    unicodedata.normalize(None)."""
    docs = spark.createDataFrame(
        [(1, "keep me"), (2, None)], "doc_id bigint, text string"
    )
    rows = {r.doc_id: r for r in text.unicode_clean(docs).collect()}
    assert rows[1].clean_text == "keep me"
    assert rows[2].clean_text is None
    assert rows[2].orig_len is None and rows[2].clean_len is None


def test_asof_join_empty_sides(spark):
    """An empty build side yields probe rows with NULL matches (not an
    exception, not dropped rows); an empty probe yields zero rows."""
    from bioclip_vector_db_spark.operators import temporal

    schema = "user_id bigint, ts bigint, event_id bigint, value double"
    probe = spark.createDataFrame([(1, 100, 11, 1.0), (1, 200, 12, 2.0)], schema)
    empty = spark.createDataFrame([], schema)
    out = temporal.asof_join(probe, empty, ["user_id"]).collect()
    assert len(out) == 2
    assert all(r["asof_event_id"] is None for r in out)
    assert temporal.asof_join(empty, probe, ["user_id"]).count() == 0
