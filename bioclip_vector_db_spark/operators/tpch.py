"""Generic relational surface — TPC-H-shaped queries over the star schema.

The reference exercises these categories implicitly (SURVEY.md §2.5: equi/
semi/anti joins, aggregation, windows, sort/limit, set ops); these queries
demonstrate them at classic analytic shape on the driver's TPC-H-ish
fixtures, with the plans a 100-TB warehouse wants:

- dimension tables (region/nation/customer) broadcast into fact scans;
- aggregations partial map-side (sum/count combine before the shuffle);
- top-k as ORDER BY + LIMIT => TakeOrderedAndProject (no full sort) or
  rank-window => WindowGroupLimit;
- filters on the fact table pushed into the parquet scan (PushedFilters).

Float parity: monetary sums accumulate ~1e9 magnitudes where cross-engine
addition order leaves ~1e-5 absolute noise, so money aggregates round to 2
decimals (mathematically exact for 2-decimal inputs — far above the noise
floor, far below the cent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table


@register(
    "tpch_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_tpch_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1-shape [Q]: scan-filter-aggregate with map-side partial combine —
    the canonical linear-scan aggregation."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.count(F.lit(1)).cast("bigint").alias("count_order"),
    )


@register(
    "tpch_top_orders",
    oracle="""
SELECT o.o_orderkey, o.o_orderdate,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def q_tpch_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shape [Q]: selective dim filter broadcast into two fact joins,
    then global top-10 by revenue (TakeOrderedAndProject)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@register(
    "tpch_revenue_forecast",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
""",
)
def q_tpch_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-shape [Q]: pure filter-aggregate — every predicate pushes into
    the parquet scan; zero joins, one partial+final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.02, 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


@register(
    "tpch_top_customers_per_nation",
    oracle="""
WITH ranked AS (
    SELECT n.n_name AS nation, c.c_name AS customer, c.c_acctbal,
           row_number() OVER (
               PARTITION BY n.n_name
               ORDER BY c.c_acctbal DESC, c.c_custkey) AS rank
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT nation, customer, round(c_acctbal, 2) AS acctbal, rank
FROM ranked WHERE rank <= 3
""",
)
def q_tpch_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k [Q]: top-3 customers by balance per nation —
    WindowGroupLimit takes the per-partition top-3 before the shuffle."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    w = Window.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_name").alias("customer"),
            F.round("c_acctbal", 2).alias("acctbal"),
            "rank",
        )
    )


@register(
    "tpch_promo_revenue_share",
    oracle="""
SELECT round(
           100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                            THEN l.l_extendedprice * (1 - l.l_discount)
                            ELSE 0 END)
           / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_share_pct,
       count(*)::BIGINT AS n_lineitems
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-04-01'
""",
)
def q_tpch_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-shape [Q]: conditional-aggregate ratio over a fact x broadcast
    dim join (part is the small side)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        )
    )


@register(
    "tpch_top_suppliers",
    oracle="""
SELECT s.s_suppkey, s.s_name, n.n_name AS nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY s.s_suppkey, s.s_name, n.n_name
ORDER BY revenue DESC, s_suppkey
LIMIT 10
""",
)
def q_tpch_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 suppliers by revenue with nation names — two broadcast dim
    joins into one fact aggregation, global top-k."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("s_suppkey").asc())
        .limit(10)
    )


@register(
    "tpch_active_customers_semi",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2001-01-01'
)
""",
)
def q_tpch_active_customers_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join [Q]: customers with at least one recent order — EXISTS as
    ``left_semi`` (the categorical twin of the dedup anti join, O12)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "tpch_nation_rollup",
    oracle="""
SELECT coalesce(r.r_name, 'ALL') AS region,
       coalesce(n.n_name, 'ALL') AS nation,
       count(*)::BIGINT AS n_customers,
       round(sum(c.c_acctbal), 2) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
)
def q_tpch_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup [Q]: region -> nation -> grand-total hierarchy in one pass
    (Spark expands grouping sets without rescanning the input)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            "n_customers",
            "total_acctbal",
        )
    )


@register(
    "tpch_shipping_priority",
    oracle="""
SELECT l.l_orderkey, o.o_orderdate,
       round(sum(l.l_extendedprice::DECIMAL(15,2) * (1 - l.l_discount)::DECIMAL(5,2)), 2)::DOUBLE AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY sum(l.l_extendedprice::DECIMAL(15,2) * (1 - l.l_discount)::DECIMAL(5,2)) DESC, l.l_orderkey ASC
LIMIT 10
""",
)
def q_tpch_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shape [Q]: segment-filtered customer dim broadcast into the
    orders join, both date filters pushed into the fact scans, revenue
    aggregation with map-side combine, global top-10 via
    TakeOrderedAndProject (no full sort).

    Revenue accumulates in DECIMAL, not DOUBLE: the top-10 cutoff orders
    a cross-row sum, and engine-specific float reduction order could
    flip rank-10/11 membership by an ULP. Per-term double->decimal
    rounding is deterministic (same binary input in both engines), and
    decimal summation is exact, so the cutoff is order-independent; the
    reported column is the rounded sum cast back to DOUBLE."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "tpch_customer_order_distribution",
    oracle="""
WITH per_customer AS (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
)
SELECT c_count::BIGINT AS c_count, count(*)::BIGINT AS custdist
FROM per_customer GROUP BY c_count
""",
)
def q_tpch_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shape [Q]: LEFT OUTER join preserving order-less customers,
    then a double aggregation (orders per customer -> customers per order
    count) — the histogram-of-a-groupBy shape; both aggregations combine
    map-side and the second one's input is already tiny."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_customer = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_customer.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    ).select(F.col("c_count").cast("bigint").alias("c_count"), "custdist")


@register(
    "tpch_salted_skew_join",
    oracle="""
SELECT o.o_orderpriority,
       count(*)::BIGINT AS n_items,
       round(sum(l.l_extendedprice), 2) AS total_price
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
""",
)
def q_tpch_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew path [Q]: the fact-dimension join executed through
    functions.skew.salted_equi_join (8 salts: probe rows get a
    deterministic salt, the build side replicates per salt, the join key
    becomes (key, salt)) — the explicit hot-key mitigation for joins AQE
    can't split, gated on producing EXACTLY the plain join's aggregate.
    The pytest equivalence tests (tests/test_skew.py) check row-level
    parity; this gate pins the end-to-end aggregate against the SQL
    oracle so the salting stays registered, not just library code."""
    from ..functions.skew import salted_equi_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    j = salted_equi_join(li, orders, "l_orderkey", salts=8)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )
