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

#: Exact integer-revenue recipe for RANK-CUTOFF queries (top-k on a
#: cross-row revenue sum). l_extendedprice has 2 decimals and l_discount
#: has 2, so round(price*100) and round((1-disc)*100) are both exact
#: BIGINTs and their product is revenue in 1e-4 currency units — BIGINT
#: summation is exact and order-independent like the DECIMAL form, but
#: stays inside whole-stage codegen (the DECIMAL sum measured ~2x slower
#: on tpch_top_suppliers at sf0.1). Same family as tpch_revenue_gini's
#: integer cents. Group sums stay far under 2^63: per-group row counts
#: are order- or supplier-sized (constant / SF-invariant), each term
#: <= ~1e9.
def _revenue_e4():
    # Built lazily: Column construction needs an active SparkContext.
    return F.round(F.col("l_extendedprice") * 100, 0).cast("bigint") * F.round(
        (F.lit(1) - F.col("l_discount")) * 100, 0
    ).cast("bigint")

#: SQL twin of _REVENUE_E4 (DuckDB).
_REVENUE_E4_SQL = (
    "round(l.l_extendedprice * 100)::BIGINT * round((1 - l.l_discount) * 100)::BIGINT"
)


def _revenue_from_e4(col: str = "rev_e4"):
    """Rounded-to-cent DOUBLE from the exact 1e-4-unit integer sum:
    half-up at the half-cent in pure integer arithmetic, then one IEEE
    division both engines perform identically (cents <= ~1e14 are exact
    in a double)."""
    return (F.expr(f"({col} + 50) div 100") / 100.0).alias("revenue")


#: SQL twin of _revenue_from_e4 (DuckDB // is floor division; sums are
#: positive here).
_REVENUE_FROM_E4_SQL = "((rev_e4 + 50) // 100) / 100.0 AS revenue"


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
    oracle=f"""
WITH agged AS (
    SELECT o.o_orderkey, o.o_orderdate, sum({_REVENUE_E4_SQL}) AS rev_e4
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY rev_e4 DESC, o_orderkey
    LIMIT 10
)
SELECT o_orderkey, o_orderdate, {_REVENUE_FROM_E4_SQL} FROM agged
""",
)
def q_tpch_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shape [Q]: selective dim filter broadcast into two fact joins,
    then global top-10 by revenue (TakeOrderedAndProject). The top-10
    cutoff orders on the exact integer-1e-4-unit revenue sum
    (order-independent in both engines, codegen-friendly) — same
    rank-cutoff discipline as q_tpch_shipping_priority."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    agged = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(_revenue_e4()).alias("rev_e4"))
    )
    return (
        agged.orderBy(F.col("rev_e4").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_orderdate", _revenue_from_e4())
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
    oracle=f"""
WITH agged AS (
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation, sum({_REVENUE_E4_SQL}) AS rev_e4
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY s.s_suppkey, s.s_name, n.n_name
    ORDER BY rev_e4 DESC, s_suppkey
    LIMIT 10
)
SELECT s_suppkey, s_name, nation, {_REVENUE_FROM_E4_SQL} FROM agged
""",
)
def q_tpch_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 suppliers by revenue with nation names — two broadcast dim
    joins into one fact aggregation, global top-k. Rank cutoff on the
    exact integer revenue sum (same discipline as
    q_tpch_shipping_priority)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    agged = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .agg(F.sum(_revenue_e4()).alias("rev_e4"))
    )
    return (
        agged.orderBy(F.col("rev_e4").desc(), F.col("s_suppkey").asc())
        .limit(10)
        .select("s_suppkey", "s_name", "nation", _revenue_from_e4())
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
    oracle=f"""
WITH agged AS (
    SELECT l.l_orderkey, o.o_orderdate, sum({_REVENUE_E4_SQL}) AS rev_e4
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY rev_e4 DESC, l.l_orderkey ASC
    LIMIT 10
)
SELECT l_orderkey, o_orderdate, {_REVENUE_FROM_E4_SQL} FROM agged
""",
)
def q_tpch_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shape [Q]: segment-filtered customer dim broadcast into the
    orders join, both date filters pushed into the fact scans, revenue
    aggregation with map-side combine, global top-10 via
    TakeOrderedAndProject (no full sort).

    Revenue accumulates as the EXACT integer sum of
    round(price*100) * round((1-disc)*100) (1e-4 currency units), not as
    a DOUBLE sum: the top-10 cutoff orders a cross-row sum, and
    engine-specific float reduction order could flip rank-10/11
    membership by an ULP. Per-term rounding is deterministic (same binary
    input in both engines), BIGINT summation is exact, so the cutoff is
    order-independent — and unlike the DECIMAL form it stays inside
    whole-stage codegen (~2x on this shape at sf0.1). The reported
    column is the integer half-up cent rounding divided once in IEEE."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    agged = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_revenue_e4()).alias("rev_e4"))
    )
    return (
        agged.orderBy(F.col("rev_e4").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "o_orderdate", _revenue_from_e4())
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


@register(
    "tpch_local_supplier_volume",
    oracle="""
SELECT n.n_name AS nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
""",
)
def q_tpch_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shape [Q]: the 6-way star join with a same-nation constraint —
    revenue where the ordering customer and the supplying supplier share a
    nation, restricted to one region and a two-year window.

    Plan shape for 100 TB: the two facts (lineitem, orders) shuffle-join on
    orderkey; every dimension (customer, supplier, nation, region) is
    broadcast so the same-nation constraint (c_nationkey = s_nationkey)
    evaluates map-side as a post-join filter rather than forcing a second
    fact shuffle; the date filter pushes into the orders scan. Catalyst
    also gets the freedom to reorder the dim joins — nothing here pins a
    join order."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("nation").asc())
    )


@register(
    "tpch_small_qty_revenue",
    oracle="""
WITH part_qty AS (
    SELECT l_partkey,
           sum(l_quantity)::BIGINT AS sum_qty,
           count(*)::BIGINT AS cnt
    FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN part_qty a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND 5 * l.l_quantity::BIGINT * a.cnt < a.sum_qty
""",
)
def q_tpch_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-shape [Q]: revenue from small-quantity orders — the classic
    correlated scalar subquery (l_quantity < 0.2 * avg(l_quantity) per
    part) DECORRELATED into a per-part aggregate joined back to the fact.

    Scale notes: the per-part aggregate is a map-side-combined groupBy on
    the join key itself, so under AQE both sides of the self-join arrive
    hash-partitioned on l_partkey and the join adds no extra shuffle; the
    brand filter broadcasts the part dim. The 0.2*avg comparison runs in
    INTEGER arithmetic (5*qty*cnt < sum_qty — quantities are integral) so
    the boundary predicate cannot flip on float division order in either
    engine."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    part_qty = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").cast("bigint").alias("sum_qty"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(part_qty.withColumnRenamed("l_partkey", "pq_partkey"),
              F.col("l_partkey") == F.col("pq_partkey"))
        .filter(
            5 * F.col("l_quantity").cast("bigint") * F.col("cnt") < F.col("sum_qty")
        )
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "tpch_large_volume_customers",
    oracle="""
WITH big AS (
    SELECT l_orderkey, sum(l_quantity)::BIGINT AS sum_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING sum(l_quantity) > 250
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       round(o.o_totalprice, 2) AS totalprice, big.sum_qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY totalprice DESC, o_orderkey
LIMIT 20
""",
)
def q_tpch_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shape [Q]: large-volume customers — a HAVING-filtered fact
    aggregate (orders whose total quantity exceeds 250) joined back to
    orders and customer, global top-20 by order value.

    Scale notes: the heavy side is the lineitem groupBy(orderkey), which
    combines map-side; the HAVING filter shrinks it to ~1% of orders
    BEFORE any join, so the join back to orders is a small-side broadcast
    at any scale where the threshold keeps selectivity (AQE converts it
    at runtime); sum_qty stays BIGINT (quantities are integral) so the
    threshold predicate is exact in both engines. Top-20 runs as
    TakeOrderedAndProject — no global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


@register(
    "tpch_disjunctive_revenue",
    oracle="""
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 50
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q_tpch_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shape [Q]: disjunctive join predicates (OR of brand/size/qty
    conjunctions) — the shape that breaks naive predicate pushdown.

    Scale notes: Catalyst cannot push the mixed OR across the join, but it
    CAN and does push the derived single-side residuals: the part scan
    gets (brand IN (1,2,3) AND size<=50-ish) and the lineitem scan gets
    (quantity BETWEEN 1 AND 30) — both extracted from the disjunction —
    so the join sees pre-filtered inputs and the full OR evaluates as a
    post-join filter on the broadcast part side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "tpch_dormant_rich_customers",
    oracle="""
WITH bal AS (
    SELECT sum(c_acctbal::DECIMAL(15,2)) AS total, count(*)::BIGINT AS n
    FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_mktsegment AS segment,
       count(*)::BIGINT AS numcust,
       round(sum(c.c_acctbal), 2) AS totacctbal
FROM customer c, bal
WHERE c.c_acctbal::DECIMAL(15,2) * bal.n > bal.total
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c.c_mktsegment
""",
)
def q_tpch_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shape [Q]: dormant high-balance customers — a global scalar
    aggregate (average positive account balance) gating a scan, plus an
    anti join against recent orders, rolled up by segment.

    Scale notes: the scalar subquery is a 1-row aggregate broadcast as a
    literal cross join (Spark plans it as BroadcastNestedLoopJoin over one
    row — constant cost); the NOT EXISTS is a shuffle-free broadcast anti
    join once the date filter shrinks orders. The above-average predicate
    runs in exact DECIMAL cross-multiplied form (bal*n > total) — acctbal
    is 2-decimal data, so neither engine's float division order can flip
    a boundary row."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(15,2)")).alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .crossJoin(F.broadcast(bal))
        .filter(F.col("c_acctbal").cast("decimal(15,2)") * F.col("n") > F.col("total"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "tpch_order_priority_check",
    oracle="""
SELECT o.o_orderpriority AS priority, count(*)::BIGINT AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
""",
)
def q_tpch_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shape [Q]: correlated EXISTS with an inequality on the
    correlated column (a lineitem shipped >60 days after its order date)
    — counted per order priority over a six-month order window.

    Scale notes: Spark plans the EXISTS as a LEFT SEMI hash join keyed on
    orderkey with the date inequality as a residual condition, so each
    order is matched once regardless of how many late lines it has (no
    fan-out then distinct); the order-date window pushes into the orders
    scan and, being the semi join's probe side, bounds the state. The
    fixture has no commitdate/receiptdate columns, so "late" is
    ship-vs-order lag — same correlated-inequality shape as the original
    commit/receipt comparison."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
    )


@register(
    "tpch_volume_shipping",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       date_part('year', l.l_shipdate)::BIGINT AS l_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, date_part('year', l.l_shipdate)
""",
)
def q_tpch_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shape [Q]: bilateral trade volume — revenue between an ordered
    nation pair in both directions, per ship year. The nation dim joins
    twice under different roles (supplier's vs customer's nation).

    Scale notes: the only fact-fact shuffle is lineitem-orders on
    orderkey; customer/supplier/nation all broadcast, and the disjunctive
    nation-pair predicate evaluates map-side after the broadcasts (its
    single-side residuals n1/n2 IN (A,B) prune each broadcast build
    before the join). Grouping is on three low-cardinality columns —
    partial aggregation collapses the map output to a handful of rows per
    task."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "tpch_market_share",
    oracle="""
WITH vol AS (
    SELECT date_part('year', o.o_orderdate)::BIGINT AS o_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume,
           n1.n_name AS supp_nation
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n2.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
)
SELECT o_year,
       round(round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END), 2)
             / round(sum(volume), 2), 6) AS mkt_share
FROM vol GROUP BY o_year
""",
)
def q_tpch_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-shape [Q]: national market share — one nation's fraction of
    regional promo-part revenue per order year, a conditional-aggregate
    ratio (sum(CASE)/sum) computed in a single grouped pass.

    Scale notes: one fact-fact shuffle (lineitem-orders); part, customer,
    supplier, nation x2, region all broadcast; both CASE branches
    accumulate in the SAME aggregation so the ratio needs no self-join.
    Float parity across engines: numerator and denominator are each
    rounded to 2 decimals first (summation-order noise is ~1e-5 on ~1e9
    magnitudes — far below the cent), so the final division divides
    bit-identical doubles in both engines and rounds to 6."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n1 = n.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey"))
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    return vol.groupBy("o_year").agg(
        F.round(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0))),
                2,
            )
            / F.round(F.sum("volume"), 2),
            6,
        ).alias("mkt_share")
    )


@register(
    "tpch_product_profit",
    oracle="""
SELECT n.n_name AS nation,
       date_part('year', o.o_orderdate)::BIGINT AS o_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)
                 - 0.6 * p.p_retailprice * l.l_quantity), 2) AS profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY n.n_name, date_part('year', o.o_orderdate)
""",
)
def q_tpch_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shape [Q]: product-line profit by supplier nation and order
    year, parts selected by an unanchored LIKE on p_name. The fixture has
    no partsupp.ps_supplycost, so cost is modeled as 60% of the part's
    retail price — the aggregate keeps Q9's sum-of-differences shape.

    Scale notes: the LIKE cannot prune the part scan via min/max stats but
    the filtered part dim is still tiny, so it broadcasts and the
    name-filter applies before the join build; the single fact-fact
    shuffle is lineitem-orders on orderkey; supplier/nation broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
                ),
                2,
            ).alias("profit")
        )
    )


@register(
    "tpch_late_shipment_priority",
    oracle="""
SELECT date_part('year', l.l_shipdate)::BIGINT AS ship_year,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
GROUP BY date_part('year', l.l_shipdate)
""",
)
def q_tpch_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shape [Q]: late shipments split into high/low order priority
    per ship year — two CASE branches of one aggregation (the fixture has
    no l_shipmode; priority plays its role, lateness is the same
    cross-table date inequality as the Q4 gate).

    Scale notes: single orderkey shuffle join; the lateness predicate is
    a residual on the joined row (it references both sides so no scan
    pushdown exists for it — the correct plan evaluates it before the
    aggregate, which Spark does); both counts accumulate in one grouped
    pass with map-side combine."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "tpch_part_supplier_counts",
    oracle="""
WITH ps AS (
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p.p_brand, p.p_size::BIGINT AS p_size,
       count(DISTINCT ps.l_suppkey)::BIGINT AS supplier_cnt
FROM ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND NOT EXISTS (
      SELECT 1 FROM supplier s
      WHERE s.s_suppkey = ps.l_suppkey AND s.s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p_size
LIMIT 20
""",
)
def q_tpch_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shape [Q]: distinct supplier count per (brand, size) over the
    observed part-supplier pairs, excluding blacklisted suppliers
    (negative balance stands in for Q16's complaints LIKE — the fixture
    has no partsupp/comment, so lineitem's distinct (part, supplier)
    pairs are the relationship table).

    Scale notes: NO standalone pair-distinct (r17) — the count-distinct
    aggregate dedups (brand, size, suppkey) itself with map-side partial
    aggregation, so a prior DISTINCT over (partkey, suppkey) was a whole
    extra exchange + aggregation pass over the fact table for an
    identical result (guide §2.4; Exchange 10->8, HashAggregate 12->8,
    rows proven equal). The supplier blacklist is a broadcast anti join
    (6 rows); part dim broadcasts — so the only fact-table shuffle left
    is the aggregate's own. Top-20 via TakeOrderedAndProject with full
    tiebreaks."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), F.col("p_brand").asc(), F.col("p_size").asc())
        .limit(20)
    )


@register(
    "tpch_waiting_suppliers",
    oracle="""
WITH order_supp AS (
    SELECT l.l_orderkey, l.l_suppkey,
           max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END) AS is_late
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY l.l_orderkey, l.l_suppkey
), marked AS (
    SELECT l_orderkey, l_suppkey, is_late,
           count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
           sum(is_late) OVER (PARTITION BY l_orderkey) AS n_late
    FROM order_supp
)
SELECT s.s_name, count(*)::BIGINT AS numwait
FROM marked m
JOIN supplier s ON s.s_suppkey = m.l_suppkey
WHERE m.is_late = 1 AND m.n_supp > 1 AND m.n_late = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 10
""",
)
def q_tpch_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shape [Q]: suppliers who alone held up a multi-supplier order —
    the classic EXISTS (another supplier on the order) + NOT EXISTS
    (another LATE supplier on the order) double correlation, DECORRELATED
    into one per-(order, supplier) aggregate plus two windows over the
    order key, so the fact shuffles once instead of three times.

    Scale notes: order_supp collapses lineitem to at most one row per
    (order, supplier) with map-side combine keyed on the join key; both
    existence tests become window counts over that reduced set — same
    partitioning, zero extra shuffles (the groupBy partitioning on
    l_orderkey+l_suppkey satisfies the window's l_orderkey clustering
    under AQE); supplier dim broadcasts at the end. "Late" is the same
    ship-vs-order-date lag as the Q4/Q12 gates (no receipt/commit dates
    in the fixture)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    order_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    marked = order_supp.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("is_late").over(w).alias("n_late"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        marked.filter(
            (F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


@register(
    "tpch_min_cost_supplier",
    oracle="""
WITH ps AS (
    SELECT DISTINCT l.l_partkey, l.l_suppkey FROM lineitem l
), eu AS (
    SELECT s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
), best AS (
    SELECT ps.l_partkey, min(eu.s_acctbal) AS min_bal
    FROM ps JOIN eu ON eu.s_suppkey = ps.l_suppkey
    GROUP BY ps.l_partkey
)
SELECT p.p_partkey, p.p_name,
       min(eu.s_name) AS s_name,
       round(best.min_bal, 2) AS acctbal
FROM ps
JOIN eu   ON eu.s_suppkey = ps.l_suppkey
JOIN best ON best.l_partkey = ps.l_partkey AND eu.s_acctbal = best.min_bal
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_size <= 10
GROUP BY p.p_partkey, p.p_name, best.min_bal
ORDER BY acctbal, p.p_partkey
LIMIT 25
""",
)
def q_tpch_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shape [Q]: for each small part, the region-local supplier with
    the minimum account balance (stand-in for Q2's min ps_supplycost —
    no partsupp in the fixture) — the correlated scalar-min subquery
    DECORRELATED into a per-part min aggregate joined back on
    (part, min-value), with a deterministic min-name tiebreak.

    Scale notes: NO standalone pair DISTINCT (r17) — every consumer of
    the pair set is duplicate-insensitive (min(s_acctbal) per part, the
    min-value join back, min(s_name) in the final aggregate), so the
    DISTINCT was one extra full exchange + aggregation pass over the
    fact projection in EACH of the two pair subtrees for a provably
    identical result (collected rows equal; Exchange 28->23,
    HashAggregate 11->4). Duplicate (part, supplier) rows now ride to
    the partkey-keyed aggregates, whose map-side partial aggregation
    collapses them before any shuffle — fewer shuffled bytes at any
    duplication factor the fixture or TPC-H exhibits. The
    region-filtered supplier side broadcasts twice (probe + verify)
    rather than shuffling the pair set twice."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    pairs = li.join(F.broadcast(eu), li.l_suppkey == F.col("s_suppkey"))
    best = pairs.groupBy("l_partkey").agg(F.min("s_acctbal").alias("min_bal"))
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10).select(
        "p_partkey", "p_name"
    )
    return (
        pairs.join(
            best.withColumnRenamed("l_partkey", "b_partkey"),
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_partkey", "p_name", "min_bal")
        .agg(F.min("s_name").alias("s_name"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round(F.col("min_bal"), 2).alias("acctbal"),
        )
        .orderBy(F.col("acctbal").asc(), F.col("p_partkey").asc())
        .limit(25)
    )


@register(
    "tpch_retention_cohorts",
    oracle="""
WITH firsts AS (
    SELECT o_custkey,
           min(date_trunc('month', o_orderdate)) AS cohort_month
    FROM orders GROUP BY o_custkey
),
activity AS (
    SELECT DISTINCT o.o_custkey, f.cohort_month,
           date_diff('month', f.cohort_month,
                     date_trunc('month', o.o_orderdate)) AS month_offset
    FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
)
SELECT cohort_month::TIMESTAMP AS cohort_month,
       month_offset::BIGINT AS month_offset,
       count(*)::BIGINT AS active_customers
FROM activity
GROUP BY cohort_month, month_offset
""",
)
def q_tpch_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention [Q]: customers bucketed by first-order month, then
    counted per months-since-cohort offset — the classic retention
    triangle a product warehouse derives from any activity fact.

    Scale notes: the first-order aggregate and the activity join both key
    on custkey, so one hash partitioning serves min-aggregate -> join ->
    distinct; the month offset computes map-side from month-truncated
    timestamps (integer month arithmetic — no float date math to drift);
    the final rollup is a low-cardinality groupBy with map-side combine."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    month = F.date_trunc("month", F.col("o_orderdate"))
    firsts = o.groupBy("o_custkey").agg(F.min(month).alias("cohort_month"))
    offset = (
        (F.year(month) - F.year("cohort_month")) * 12
        + (F.month(month) - F.month("cohort_month"))
    ).cast("bigint")
    activity = (
        o.join(firsts, "o_custkey")
        .select("o_custkey", "cohort_month", offset.alias("month_offset"))
        .distinct()
    )
    return activity.groupBy("cohort_month", "month_offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("active_customers")
    )


@register(
    "tpch_returned_item_ranking",
    oracle=f"""
WITH agged AS (
    SELECT c.c_custkey, c.c_name, n.n_name AS nation, c.c_acctbal,
           sum({_REVENUE_E4_SQL}) AS rev_e4
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY rev_e4 DESC, c_custkey
    LIMIT 20
)
SELECT c_custkey, c_name, nation, {_REVENUE_FROM_E4_SQL},
       round(c_acctbal, 2) AS acctbal
FROM agged
""",
)
def q_tpch_returned_item_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shape [Q]: customers ranked by revenue lost to returned items
    in a quarter — fact-fact join with BOTH scans pre-filtered (order
    window pushed to orders, returnflag pushed to lineitem), customer and
    nation dims broadcast, top-20 via TakeOrderedAndProject. Rank cutoff
    on the exact integer revenue sum (same discipline as
    q_tpch_shipping_priority)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "c_custkey", "c_name", F.col("n_name").alias("nation"), "c_acctbal"
        )
        .agg(F.sum(_revenue_e4()).alias("rev_e4"))
        .orderBy(F.col("rev_e4").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "nation",
            _revenue_from_e4(),
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
        )
    )


@register(
    "tpch_abc_analysis",
    oracle="""
WITH part_rev AS (
    SELECT l_partkey,
           round(sum(l_extendedprice::DECIMAL(15,2) * (1 - l_discount)::DECIMAL(5,2)), 2)::DOUBLE AS revenue
    FROM lineitem GROUP BY l_partkey
),
ranked AS (
    SELECT l_partkey, revenue,
           sum(revenue) OVER (ORDER BY revenue DESC, l_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum_rev,
           sum(revenue) OVER () AS total_rev
    FROM part_rev
)
SELECT l_partkey, revenue,
       CASE WHEN cum_rev <= 0.5 * total_rev THEN 'A'
            WHEN cum_rev <= 0.8 * total_rev THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
""",
)
def q_tpch_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification [Q]: parts bucketed by cumulative
    revenue share (A = first 50%, B = to 80%, C = tail) — the
    inventory-prioritization classic built on a cumulative-distribution
    window.

    Float parity: per-part revenue accumulates in exact DECIMAL (4-dp
    products hit .xx5 cent boundaries for ~10% of parts — float noise
    there flips the rounding), rounds to 2, and casts back to DOUBLE
    BEFORE the cumulative window, so both engines accumulate the same
    doubles in the same
    (revenue DESC, partkey) order — the running sum is then deterministic
    because windowed accumulation order is specified, unlike a grouped
    sum. Scale notes: the per-part aggregate combines map-side; the
    cumulative window is a single global sort at fixture size and a
    range-partitioned two-pass prefix sum at 100 TB (same decomposition
    as compaction_plan — documented, the classification cut is
    order-preserving either way)."""
    li = load_table(spark, sf_dir, "lineitem")
    # DECIMAL accumulation: per-part sums of 4-decimal products land on
    # .xx5 rounding boundaries constantly (1 in 10 parts) — float noise
    # there flips the cent. Exact decimal arithmetic in both engines
    # (same discipline as tpch_shipping_priority), cast back to DOUBLE.
    part_rev = li.groupBy("l_partkey").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(15,2)")
                * (1 - F.col("l_discount")).cast("decimal(5,2)")
            ),
            2,
        )
        .cast("double")
        .alias("revenue")
    )
    w_cum = (
        Window.orderBy(F.col("revenue").desc(), F.col("l_partkey").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy()
    ranked = part_rev.select(
        "l_partkey",
        "revenue",
        F.sum("revenue").over(w_cum).alias("cum_rev"),
        F.sum("revenue").over(w_all).alias("total_rev"),
    )
    return ranked.select(
        "l_partkey",
        "revenue",
        F.when(F.col("cum_rev") <= 0.5 * F.col("total_rev"), "A")
        .when(F.col("cum_rev") <= 0.8 * F.col("total_rev"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@register(
    "tpch_part_size_ranks",
    oracle="""
SELECT p_partkey, p_brand, p_size::BIGINT AS p_size,
       rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC)::BIGINT AS size_rank,
       dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC)::BIGINT AS size_dense_rank,
       round(percent_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC), 9) AS size_pct_rank
FROM part
WHERE p_partkey % 20 = 0
""",
)
def q_tpch_part_size_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-family semantics [Q]: rank / dense_rank / percent_rank per
    brand over a column FULL of ties (p_size repeats constantly) — the
    three tie behaviors (gapped, dense, normalized) pinned cross-engine
    in one window pass. Every other ranking in this repo uses row_number
    with a total tiebreak; this gate covers the tie-preserving family a
    warehouse user reaches for when equal keys must share a rank.
    percent_rank divides two integers per row (round-9, no accumulation)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 20 == 0)
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    return p.select(
        "p_partkey",
        "p_brand",
        F.col("p_size").cast("bigint").alias("p_size"),
        F.rank().over(w).cast("bigint").alias("size_rank"),
        F.dense_rank().over(w).cast("bigint").alias("size_dense_rank"),
        F.round(F.percent_rank().over(w), 9).alias("size_pct_rank"),
    )


@register(
    "tpch_yoy_growth",
    oracle="""
WITH yearly AS (
    SELECT n.n_name AS nation,
           date_part('year', o.o_orderdate)::BIGINT AS o_year,
           round(sum(l.l_extendedprice::DECIMAL(15,2)
                     * (1 - l.l_discount)::DECIMAL(5,2)), 2)::DOUBLE AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE n.n_nationkey < 5
    GROUP BY n.n_name, date_part('year', o.o_orderdate)
)
SELECT nation, o_year, revenue,
       round(revenue / lag(revenue) OVER (
           PARTITION BY nation ORDER BY o_year) - 1.0, 6) AS yoy_growth
FROM yearly
""",
)
def q_tpch_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend analytics [Q]: year-over-year revenue growth per nation —
    yearly DECIMAL-exact revenue rollup, then one lag window per nation
    computing the growth ratio (a division of two already-rounded
    doubles — deterministic; the first year is NULL growth by
    construction). Two shuffles total: the (nation, year) aggregate and
    the nation-keyed window."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 5)
    yearly = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(15,2)")
                    * (1 - F.col("l_discount")).cast("decimal(5,2)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("nation").orderBy("o_year")
    return yearly.select(
        "nation",
        "o_year",
        "revenue",
        F.round(F.col("revenue") / F.lag("revenue").over(w) - 1.0, 6).alias(
            "yoy_growth"
        ),
    )


@register(
    "tpch_basket_affinity",
    oracle="""
WITH ob AS (
    SELECT DISTINCT l.l_orderkey, p.p_brand
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
n_orders AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n FROM ob),
brand_n AS (SELECT p_brand, count(*)::BIGINT AS c FROM ob GROUP BY p_brand),
pair_n AS (
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*)::BIGINT AS c_ab
    FROM ob a JOIN ob b
      ON b.l_orderkey = a.l_orderkey AND a.p_brand < b.p_brand
    GROUP BY a.p_brand, b.p_brand
)
SELECT p.brand_a, p.brand_b, p.c_ab,
       round(p.c_ab * 1.0 / n.n, 6) AS support,
       round((p.c_ab * 1.0 * n.n) / (ca.c * 1.0 * cb.c), 6) AS lift
FROM pair_n p
JOIN brand_n ca ON ca.p_brand = p.brand_a
JOIN brand_n cb ON cb.p_brand = p.brand_b
CROSS JOIN n_orders n
WHERE p.c_ab >= 20
""",
)
def q_tpch_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis [Q]: brand co-occurrence within orders —
    support and lift per brand pair (min co-count 20), the association
    signal a recommender's candidate generator mines from transactions.
    All inputs are exact integers; support and lift are single
    cross-multiplied divisions, round-6.

    Scale shape: the basket table collapses to DISTINCT (order, brand)
    first — the only fact-sized stage; the pair join is keyed on the
    ORDER (fan-out bounded by brands-per-order squared, a per-basket
    constant, never corpus-quadratic); marginals broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # Posting-list form (optimization round 17, guide §2.3/§2.4): ONE
    # order-keyed exchange builds each basket's sorted distinct brand set
    # (collect_set dedups (order, brand) inside the aggregation — partial
    # map-side, replacing the separate DISTINCT exchange), and the a<b
    # brand pairs are expanded MAP-SIDE from the sorted array and
    # partially aggregated before the pair shuffle. The old form
    # re-shuffled the fact-sized distinct table into an order-keyed
    # self-join and shuffled RAW pairs to the groupBy; this shuffles the
    # fact table once and per-(brand_a, brand_b) partials after. Fan-out
    # stays the per-basket constant (C(brands-per-order, 2) — TPC-H
    # baskets are bounded), never corpus-quadratic. n_orders and the
    # marginals are projections of the SAME basket table (no second
    # fact-table pass).
    from ..plans.registry import transient_persist

    per_order = transient_persist(
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("brands"))
    )
    n_orders = per_order.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    brand_n = (
        per_order.select(F.explode("brands").alias("p_brand"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("brands"),
            lambda x, i: F.transform(
                F.slice(F.col("brands"), i + F.lit(2), F.size(F.col("brands"))),
                lambda y: F.struct(x.alias("brand_a"), y.alias("brand_b")),
            ),
        )
    )
    pair_n = (
        per_order.select(F.explode(pair_structs).alias("pr"))
        .select("pr.brand_a", "pr.brand_b")
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
        .filter(F.col("c_ab") >= 20)
    )
    ca = brand_n.select(F.col("p_brand").alias("brand_a"), F.col("c").alias("ca"))
    cb = brand_n.select(F.col("p_brand").alias("brand_b"), F.col("c").alias("cb"))
    return (
        pair_n.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "c_ab",
            F.round(F.col("c_ab") / F.col("n"), 6).alias("support"),
            F.round(
                (F.col("c_ab") * F.col("n")) / (F.col("ca") * F.col("cb")), 6
            ).alias("lift"),
        )
    )


@register(
    "tpch_revenue_gini",
    oracle="""
WITH cust_rev AS (
    SELECT n.n_name AS nation, c.c_custkey,
           round(sum(l.l_extendedprice::DECIMAL(15,2)
                     * (1 - l.l_discount)::DECIMAL(5,2)) * 100)::BIGINT AS cents
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name, c.c_custkey
),
ranked AS (
    SELECT nation, cents,
           row_number() OVER (
               PARTITION BY nation ORDER BY cents, c_custkey) AS rk,
           count(*) OVER (PARTITION BY nation) AS n
    FROM cust_rev
)
SELECT nation, max(n)::BIGINT AS n_customers,
       round((2.0 * sum(rk * cents)) / (max(n) * sum(cents))
             - (max(n) + 1.0) / max(n), 6) AS gini
FROM ranked GROUP BY nation
""",
)
def q_tpch_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inequality analytics [Q]: Gini coefficient of customer revenue per
    nation — the rank formula ``G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n``
    over revenues held as EXACT integer cents (DECIMAL sum * 100), ranked
    ascending with a custkey tiebreak: both big sums are pure BIGINT
    aggregates, so the only float ops are the two final divisions —
    deterministic in both engines.

    Scale shape: one custkey-keyed revenue aggregate, one nation-keyed
    rank window (per-nation sort, parallel across nations), one rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust_rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "c_custkey")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(15,2)")
                    * (1 - F.col("l_discount")).cast("decimal(5,2)")
                )
                * 100
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    w = Window.partitionBy("nation").orderBy(
        F.col("cents").asc(), F.col("c_custkey").asc()
    )
    wn = Window.partitionBy("nation")
    ranked = cust_rev.select(
        "nation",
        "cents",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.groupBy("nation").agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.round(
            (2.0 * F.sum(F.col("rk") * F.col("cents")))
            / (F.max("n") * F.sum("cents"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
    )
