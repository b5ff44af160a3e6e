"""Salted-join equivalence: salting must not change join results, only
the key distribution across tasks."""

from __future__ import annotations

from pyspark.sql import functions as F

from bioclip_vector_db_spark.functions.skew import salted_equi_join
from bioclip_vector_db_spark.sources.catalog import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = (
        li.join(orders, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 6).alias("q"))
    )
    salted = (
        salted_equi_join(li, orders, "l_orderkey", salts=4)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 6).alias("q"))
    )
    a = {(r.l_orderkey): (r.n, r.q) for r in plain.collect()}
    b = {(r.l_orderkey): (r.n, r.q) for r in salted.collect()}
    assert a == b


def test_salted_join_rejects_build_sided_outer(spark):
    """right/full outer would duplicate unmatched build rows per replica —
    the helper must refuse rather than silently diverge from a plain join."""
    import pytest as _pytest

    a = spark.createDataFrame([(1, "x")], "k int, v string")
    b = spark.createDataFrame([(2, "y")], "k int, w string")
    for how in ("right", "full", "outer"):
        with _pytest.raises(ValueError):
            salted_equi_join(a, b, "k", how=how)


def test_caller_salt_source_is_wrapped(spark):
    """Any integer salt expression is safe: negatives/overflows are
    pmod-wrapped into [0, salts), so no matches are dropped."""
    probe = spark.range(100).select(F.col("id").alias("k"))
    build = spark.range(100).select(F.col("id").alias("k"), F.lit("v").alias("v"))
    out = salted_equi_join(probe, build, "k", salts=4, salt_source=F.hash(F.col("k")))
    assert out.count() == 100


def test_salted_join_spreads_hot_key(spark):
    """A single pathological key must land in multiple salt buckets."""
    hot = spark.range(10_000).select(F.lit(7).alias("k"), F.col("id"))
    dim = spark.createDataFrame([(7, "x")], "k int, v string")
    out = salted_equi_join(hot, dim, "k", salts=8)
    assert out.count() == 10_000
    from bioclip_vector_db_spark.functions.skew import SALT_COL, default_salt

    salted = hot.withColumn(SALT_COL, default_salt("k", 8))
    n_buckets = salted.select(SALT_COL).distinct().count()
    assert n_buckets >= 4
