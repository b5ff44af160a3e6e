"""Engine A/B gates for the r16 Arrow-native kernel rebuilds (r15 verdict
items 1 and 7): every blocked-BLAS kernel in knn_numpy and the text
unicode_clean stage run Arrow-native by default, with the original pandas
stages kept as twins — both engines call the SAME numeric cores, so
results must be BYTE-identical, not approximately equal. The plan must
show the engine actually switched (mapInArrow vs mapInPandas nodes), and
parity must survive re-batching (a repartitioned input feeds different
Arrow batch shapes through the same core)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bioclip_vector_db_spark.operators import knn, knn_numpy, text
from bioclip_vector_db_spark.operators.knn_numpy import (
    argmax_centroid_numpy,
    assign_partitions_numpy,
    knn_join_numpy,
    pq_encode_numpy,
    route_queries_numpy,
)
from bioclip_vector_db_spark.operators.quantization import pq_codebooks
from bioclip_vector_db_spark.sources.catalog import load_table


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _ab(build):
    """Collect both engines (and a repartitioned-arrow leg: different
    batch boundaries through the same numeric core) and assert exact
    equality."""
    arrow = build("arrow")
    pandas = build("pandas")
    a, p = _rows(arrow), _rows(pandas)
    assert a == p, f"engine mismatch: {a[:2]} vs {p[:2]}"
    # The engines must actually differ in the physical plan, not just in
    # the kwarg: the arrow build runs MapInArrow (no pandas stage at
    # all), the pandas twin MapInPandas.
    assert "MapInArrow" in _plan(arrow) and "MapInPandas" not in _plan(arrow)
    assert "MapInPandas" in _plan(pandas) and "MapInArrow" not in _plan(pandas)
    return a


def test_assign_partitions_engines_identical(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = knn.fixture_centroids(spark, sf_dir)
    base = _ab(
        lambda e: assign_partitions_numpy(emb, cents, engine=e)
    )
    # Re-batched leg: 7 partitions feed different batch shapes.
    rebatched = _rows(
        assign_partitions_numpy(emb.repartition(7), cents, engine="arrow")
    )
    assert rebatched == base


def test_assign_partitions_routed_engines_identical(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = knn.fixture_centroids(spark, sf_dir)
    _ab(lambda e: assign_partitions_numpy(emb, cents, routed=True, engine=e))


def test_argmax_centroid_engines_identical(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = knn.fixture_centroids(spark, sf_dir).select(
        F.col("partition_id").cast("long").alias("cid"),
        F.col("centroid").alias("cvec"),
    )
    _ab(
        lambda e: argmax_centroid_numpy(
            emb, cents, routed=False, engine=e
        )
    )
    _ab(
        lambda e: argmax_centroid_numpy(emb, cents, routed=True, engine=e)
    )


def test_route_queries_engines_identical(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = knn.fixture_centroids(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    base = _ab(
        lambda e: route_queries_numpy(queries, cents, 3, engine=e)
    )
    rebatched = _rows(
        route_queries_numpy(queries.repartition(5), cents, 3, engine="arrow")
    )
    assert rebatched == base


def test_knn_join_engines_identical(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    corpus = emb.filter(F.col("vec_id") >= 8)
    _ab(lambda e: knn_join_numpy(queries, corpus, k=5, engine=e))


def test_pq_encode_engines_identical(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cb = pq_codebooks(emb)
    base = _ab(
        lambda e: pq_encode_numpy(emb, cb, m=8, sub_dim=8, engine=e)
    )
    rebatched = _rows(
        pq_encode_numpy(emb.repartition(7), cb, m=8, sub_dim=8, engine="arrow")
    )
    assert rebatched == base


def test_unicode_clean_engines_identical(spark, sf_dir):
    """The text twin (r15 verdict item 7): NFC + strip + NBSP + both
    length counts byte-identical between the Arrow-kernel stage and the
    pandas original, on the gate's own tainted corpus plus NULL and
    empty cells."""
    docs = load_table(spark, sf_dir, "documents")
    tainted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 50 == 0,
            F.concat(F.col("text"), F.lit(text._UNICODE_TAINT)),
        )
        .when(F.col("doc_id") % 97 == 0, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 93 == 0, F.lit(""))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    base = _ab(lambda e: text.unicode_clean(tainted, engine=e))
    rebatched = _rows(
        text.unicode_clean(tainted.repartition(7), engine="arrow")
    )
    assert rebatched == base


def test_engine_rejects_unknown(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = knn.fixture_centroids(spark, sf_dir)
    with pytest.raises(ValueError, match="engine"):
        assign_partitions_numpy(emb, cents, engine="polars")
    with pytest.raises(ValueError, match="engine"):
        text.unicode_clean(emb.select(F.col("vec_id").alias("doc_id"), F.lit("x").alias("text")), engine="polars")


def test_margin_calibration_cached_per_plan(spark, sf_dir):
    """r15 verdict item 6: a second distributed-tier call over the SAME
    vector/centroid plans must serve the calibrated margin (and its
    vector sample) from the session cache — no second calibration-sample
    Spark job — and produce identical results."""
    import numpy as np

    from bioclip_vector_db_spark.operators import knn_routed

    rng = np.random.default_rng(7)
    K, N, D = 64, 400, 16
    cents_rows = [(int(i), rng.standard_normal(D).tolist()) for i in range(K)]
    base = rng.standard_normal((K, D))
    vec_rows = [
        (int(i), (base[i % K] + 0.01 * rng.standard_normal(D)).tolist())
        for i in range(N)
    ]
    cents = spark.createDataFrame(cents_rows, "cid long, cvec array<double>")
    vecs = spark.createDataFrame(vec_rows, "vec_id long, embedding array<double>")

    calls = {"n": 0}
    orig = knn_routed._sample_vector_matrix

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    knn_routed._MARGIN_CACHE.clear()
    knn_routed._sample_vector_matrix = counting
    try:
        first = _rows(
            argmax_centroid_numpy(vecs, cents, routed="distributed")
        )
        n_after_first = calls["n"]
        assert n_after_first >= 1
        second = _rows(
            argmax_centroid_numpy(vecs, cents, routed="distributed")
        )
        # The margin-calibration sample collect must NOT re-run: the
        # cache also feeds the salt-escalation sample, so the call count
        # is unchanged.
        assert calls["n"] == n_after_first, (
            f"calibration sample re-collected: {calls['n']} vs {n_after_first}"
        )
        assert first == second
    finally:
        knn_routed._sample_vector_matrix = orig
        knn_routed._MARGIN_CACHE.clear()
