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
