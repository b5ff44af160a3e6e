"""Temporal joins over event streams — as-of and range joins.

Neither exists in the reference (its only temporal artifact is the
``created_at`` column, metadata_storage.py:85) nor as a Spark builtin;
both are table stakes for an event/training-data pipeline (SURVEY §2.6
north-star scope), so they are implemented here Spark-first:

- **As-of join** (``asof_join``): for each probe row, the latest build row
  at-or-before its timestamp within a key group. NOT implemented as an
  inequality join + argmax — that expands every probe row by its whole
  build history before re-collapsing. Instead: union-tag both sides and
  take a running ``last(ignorenulls)`` over (key, ts) — ONE shuffle on the
  key, zero row expansion, and the sort is the shuffle's sort. This is the
  gaps-and-islands trick session_stats already uses, applied to carrying
  payloads forward.
- **Range join** (``range_join_aggregate``): match build rows in a
  trailing window [probe.ts - width, probe.ts). A raw inequality join is a
  cartesian-per-key; instead build rows are replicated into the two
  ``width``-sized time buckets they can serve, the join is EQUI on
  (key, bucket) — a plain hash join Catalyst can plan — and the exact
  range predicate is the join residual. Replication factor is exactly 2
  regardless of data volume or skew, so the plan survives 100x scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    *,
    ts_col: str = "ts",
    tiebreak: str = "event_id",
    payload: tuple[str, ...] = ("event_id", "value"),
    prefix: str = "asof_",
) -> DataFrame:
    """Probe rows + the latest build row with ``build.ts <= probe.ts`` in
    the same ``on`` group (null payload when no build row precedes).

    Build payloads ride in ONE struct so every output column comes from
    the SAME matched row even if individual payload fields are null.
    Ordering puts build rows before probe rows at equal ts (at-or-before
    semantics) with a total ``tiebreak``; later build rows win.
    """
    b = build.select(
        *on,
        F.col(ts_col),
        F.col(tiebreak),
        F.struct(F.col(ts_col).alias(f"{prefix}{ts_col}"), *payload).alias("_payload"),
        F.lit(True).alias("_is_build"),
    )
    p = probe.withColumn("_is_build", F.lit(False))
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_is_build").desc(), F.col(tiebreak).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        p.unionByName(b, allowMissingColumns=True)
        .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
        .filter(~F.col("_is_build"))
        .drop("_is_build", "_payload")
    )
    carried = carried.withColumn(f"{prefix}{ts_col}", F.col(f"_match.{prefix}{ts_col}"))
    for c in payload:
        carried = carried.withColumn(f"{prefix}{c}", F.col(f"_match.{c}"))
    return carried.drop("_match")


@register(
    "events_asof_join",
    oracle="""
WITH tagged AS (
    SELECT user_id, ts, event_id, value,
           event_type = 'click' AS is_build
    FROM events WHERE event_type IN ('click', 'purchase')
),
runs AS (
    SELECT *,
           last_value(CASE WHEN is_build THEN event_id END IGNORE NULLS) OVER w AS click_id,
           last_value(CASE WHEN is_build THEN ts END IGNORE NULLS) OVER w AS click_ts
    FROM tagged
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts, is_build DESC, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id,
       event_id AS purchase_id,
       ts AS purchase_ts,
       click_id,
       click_ts,
       epoch_us(ts) - epoch_us(click_ts) AS wait_us
FROM runs WHERE NOT is_build
""",
)
def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join [Q]: every purchase matched to the same user's most
    recent click at-or-before it (time-to-convert analysis). One shuffle
    by user_id, no row expansion — see asof_join."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(purchases, clicks, ["user_id"], payload=("event_id",))
    return out.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("asof_event_id").alias("click_id"),
        F.col("asof_ts").alias("click_ts"),
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("wait_us"),
    )


@register(
    "events_range_join",
    oracle="""
SELECT e.user_id,
       e.event_id AS error_id,
       e.ts AS error_ts,
       count(v.ts)::BIGINT AS n_views,
       round(coalesce(sum(v.value), 0), 6) AS views_value
FROM events e
LEFT JOIN events v
  ON v.user_id = e.user_id
 AND v.event_type = 'view'
 AND v.ts >= e.ts - INTERVAL 10 MINUTE
 AND v.ts < e.ts
WHERE e.event_type = 'error'
GROUP BY 1, 2, 3
""",
)
def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join [Q]: per error event, the same user's view activity in
    the trailing 10 minutes (what was the user looking at when it broke).
    Bucket-replicated equi-join — replication factor exactly 2, plain hash
    join, zero-match errors preserved."""
    ev = load_table(spark, sf_dir, "events")
    width_sec = 600
    width_us = width_sec * 1_000_000
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select("user_id", "ts", "event_id")
        .withColumn("_bucket", F.floor(F.unix_micros("ts") / F.lit(width_us)))
        .alias("e")
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", "ts", "value")
        .withColumn("_b0", F.floor(F.unix_micros("ts") / F.lit(width_us)))
        .withColumn("_bucket", F.explode(F.array(F.col("_b0"), F.col("_b0") + 1)))
        .drop("_b0")
        .alias("v")
    )
    cond = (
        (F.col("e._bucket") == F.col("v._bucket"))
        & (F.col("e.user_id") == F.col("v.user_id"))
        & (F.col("v.ts") >= F.col("e.ts") - F.expr(f"INTERVAL {width_sec} SECOND"))
        & (F.col("v.ts") < F.col("e.ts"))
    )
    return (
        errors.join(views, cond, "left")
        .groupBy(
            F.col("e.user_id").alias("user_id"),
            F.col("e.event_id").alias("error_id"),
            F.col("e.ts").alias("error_ts"),
        )
        .agg(
            F.count(F.col("v.ts")).cast("bigint").alias("n_views"),
            F.round(F.coalesce(F.sum("v.value"), F.lit(0.0)), 6).alias("views_value"),
        )
    )


@register(
    "events_user_running_value",
    oracle="""
SELECT user_id, event_id, ts,
       round(sum(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING), 6) AS running_value,
       round(value - lag(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id), 6) AS delta_value
FROM events
WHERE user_id < 20
""",
)
def q_events_user_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 window coverage [Q]: per-user running value total + lag delta
    (cumulative-behavior features). One shuffle by user_id; both window
    frames share the same sort so WindowExec evaluates them in one pass."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 6
        ).alias("running_value"),
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta_value"),
    )


@register(
    "events_funnel",
    oracle="""
WITH v AS (
    SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
    FROM events GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(e.ts) AS t_click
    FROM events e JOIN v ON v.user_id = e.user_id
    WHERE e.event_type = 'click' AND e.ts > v.t_view
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, min(e.ts) AS t_purchase
    FROM events e JOIN c ON c.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v WHERE t_view IS NOT NULL)::BIGINT AS viewed,
       (SELECT count(*) FROM c)::BIGINT AS clicked_after_view,
       (SELECT count(*) FROM p)::BIGINT AS purchased_after_click
""",
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis [Q]: users progressing through ordered
    view -> click -> purchase stages (each stage strictly after the
    user's FIRST event of the prior stage). Three keyed aggregations
    chained by joins — per-user state never materializes more than one
    timestamp per stage, so the funnel holds at any event volume."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).cast("bigint").alias("viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).cast("bigint").alias("clicked_after_view")))
        .crossJoin(
            p.agg(F.count(F.lit(1)).cast("bigint").alias("purchased_after_click"))
        )
    )


@register(
    "events_anomaly_zscore",
    oracle="""
WITH daily AS (
    SELECT user_id, date_trunc('day', ts)::TIMESTAMP AS day, count(*)::BIGINT AS n_events
    FROM events GROUP BY user_id, date_trunc('day', ts)
),
stats AS (
    SELECT user_id, day, n_events,
           count(*) OVER (PARTITION BY user_id)     AS n,
           sum(n_events) OVER (PARTITION BY user_id) AS s,
           sum(n_events * n_events) OVER (PARTITION BY user_id) AS ss
    FROM daily
)
SELECT user_id, day, n_events,
       round((n * n_events - s) / sqrt((n * ss - s * s)::DOUBLE), 6) AS zscore
FROM stats
WHERE n * n_events - s > 0
  AND (n * n_events - s) * (n * n_events - s) > 4 * (n * ss - s * s)
""",
)
def q_events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral anomaly detection [Q]: per-user daily event counts whose
    z-score against that user's own daily distribution exceeds +2 — the
    burst-detection pass an abuse/quality pipeline runs over activity
    logs.

    Numeric parity across engines is INTEGER, not float: with n days,
    sum s and sum-of-squares ss (all BIGINT), ``z > 2`` is equivalent to
    ``(n*cnt - s)^2 > 4*(n*ss - s^2)`` with ``n*cnt - s > 0`` — the
    boundary decision never touches a double (zero-variance users fall
    out for free: both sides are then 0). The reported zscore divides
    bit-identical integer-derived doubles, so round-6 matches exactly.

    Scale notes: one shuffle on user_id serves both the daily groupBy and
    the stats window (same key — AQE reuses the partitioning); everything
    else is map-side. State per user is its day vector — bounded by the
    retention window, not the corpus.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    w = Window.partitionBy("user_id")
    stats = daily.select(
        "user_id",
        "day",
        "n_events",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("n_events").over(w).alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("ss"),
    )
    dev = F.col("n") * F.col("n_events") - F.col("s")
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return (
        stats.filter((dev > 0) & (dev * dev > 4 * var_n2))
        .select(
            "user_id",
            "day",
            "n_events",
            F.round(dev / F.sqrt(var_n2.cast("double")), 6).alias("zscore"),
        )
    )


@register(
    "events_ohlc_downsample",
    oracle="""
WITH ranked AS (
    SELECT event_type, date_trunc('hour', ts)::TIMESTAMP AS hour, value,
           row_number() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts, event_id) AS rn_open,
           row_number() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts DESC, event_id DESC) AS rn_close
    FROM events
)
SELECT event_type, hour,
       round(max(CASE WHEN rn_open = 1 THEN value END), 2)  AS open_value,
       round(max(value), 2) AS high_value,
       round(min(value), 2) AS low_value,
       round(max(CASE WHEN rn_close = 1 THEN value END), 2) AS close_value,
       count(*)::BIGINT AS n_events
FROM ranked
GROUP BY event_type, hour
""",
)
def q_events_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup [Q]: OHLC downsampling — per (event_type, hour)
    the first/max/min/last value plus the event count, the canonical
    time-series continuous-aggregate shape (open/close = value at the
    earliest/latest (ts, event_id), deterministic under the full
    tiebreak).

    Scale notes: one shuffle on (event_type, hour) serves both window
    passes and the final aggregate (same key); both row_numbers share one
    sort (descending rank is derived from the same ordering). At
    continuous-ingest scale this is the incremental-rollup query a
    watermark-windowed stream maintains; the batch form here is its
    backfill twin."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts")).alias("hour")
    base = ev.select("event_type", hour, "value", "ts", "event_id")
    w_open = Window.partitionBy("event_type", "hour").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_close = Window.partitionBy("event_type", "hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = base.select(
        "event_type",
        "hour",
        "value",
        F.row_number().over(w_open).alias("rn_open"),
        F.row_number().over(w_close).alias("rn_close"),
    )
    return ranked.groupBy("event_type", "hour").agg(
        F.round(F.max(F.when(F.col("rn_open") == 1, F.col("value"))), 2).alias(
            "open_value"
        ),
        F.round(F.max("value"), 2).alias("high_value"),
        F.round(F.min("value"), 2).alias("low_value"),
        F.round(F.max(F.when(F.col("rn_close") == 1, F.col("value"))), 2).alias(
            "close_value"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


#: Relative error budget for the approx-distinct contract gate: HLL++ at
#: the default rsd (0.05) stays far inside 15% at any cardinality, and at
#: fixture cardinalities (<=150 users) the sparse-mode sketch is exact.
APPROX_DISTINCT_TOLERANCE = 0.15


@register(
    "events_approx_distinct_users",
    oracle="""
SELECT event_type,
       count(DISTINCT user_id)::BIGINT AS exact_users,
       TRUE AS within_tolerance
FROM events GROUP BY event_type
""",
)
def q_events_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch accuracy contract [Q]: per event type, the EXACT distinct
    user count alongside a boolean asserting the HLL++
    approx_count_distinct estimate lands within 15% of it. The oracle
    pins the exact count and ``TRUE`` — i.e. what's gated is the
    ACCURACY CONTRACT of the sketch (the thing a 100-TB pipeline
    actually relies on), since the estimate itself is
    engine-implementation-defined and has no cross-engine twin.

    At scale the exact count is the one you cannot afford (full shuffle
    of (type, user) pairs); the sketch is one map-side pass with
    constant-size state. Registering both sides keeps the swap honest."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("_approx"),
    )
    tol = F.lit(APPROX_DISTINCT_TOLERANCE)
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            <= tol * F.col("exact_users")
        ).alias("within_tolerance"),
    )


@register(
    "events_gap_fill",
    oracle="""
WITH observed AS (
    SELECT event_type, date_trunc('hour', ts)::TIMESTAMP AS hour,
           round(sum(value), 6) AS hour_value
    FROM events GROUP BY 1, 2
),
bounds AS (
    SELECT event_type, min(hour) AS h0, max(hour) AS h1 FROM observed GROUP BY 1
),
spine AS (
    SELECT b.event_type, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS hour
    FROM bounds b
)
SELECT s.event_type, s.hour,
       (o.hour_value IS NOT NULL) AS observed,
       round(last_value(o.hour_value IGNORE NULLS) OVER (
           PARTITION BY s.event_type ORDER BY s.hour
           ROWS UNBOUNDED PRECEDING), 6) AS filled_value
FROM spine s LEFT JOIN observed o
  ON o.event_type = s.event_type AND o.hour = s.hour
""",
)
def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling [Q]: a dense hourly spine per event type
    (generated between that type's first and last active hour), left
    joined against observed hourly totals, holes forward-filled with the
    last observed value — the regularization step before any
    fixed-step time-series model sees the data.

    Scale notes: the spine GENERATES (types x hours) rows from a
    bounds-only aggregate — it never materializes from the fact table;
    the join and the forward-fill window share one (event_type) keyed
    partitioning; last(ignorenulls=True) over ROWS UNBOUNDED PRECEDING
    is the running-state form (WindowExec carries one value per
    partition, no per-row scan-back)."""
    ev = load_table(spark, sf_dir, "events")
    observed = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.round(F.sum("value"), 6).alias("hour_value"))
    bounds = observed.groupBy("event_type").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    w = Window.partitionBy("event_type").orderBy("hour").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        spine.join(observed, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.col("hour_value").isNotNull().alias("observed"),
            F.round(
                F.last("hour_value", ignorenulls=True).over(w), 6
            ).alias("filled_value"),
        )
    )


@register(
    "events_type_correlation",
    oracle="""
WITH hourly AS (
    SELECT date_trunc('hour', ts)::TIMESTAMP AS hour,
           sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS x,
           sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS y
    FROM events GROUP BY 1
),
s AS (
    SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
           sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
           sum(x * y)::BIGINT AS sxy
    FROM hourly
)
SELECT n, sx, sy,
       round((n * sxy - sx * sy)
             / sqrt(((n * sxx - sx * sx) * (n * syy - sy * sy))::DOUBLE), 6)
           AS pearson_r
FROM s
""",
)
def q_events_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-signal analytics [Q]: Pearson correlation between hourly
    click and view counts — one conditional-aggregate pass builds both
    series (no self-join), one moment aggregate reduces them, and the
    correlation assembles from exact BIGINT moments with a single double
    sqrt/division at the end (the same integer-first discipline as the
    z-score gate: no float accumulation order anywhere near the value).

    Scale notes: two shuffles total, both map-side combined — (hour) for
    the series, then the global moment reduce. A built-in corr() would be
    one call but accumulates in floats with engine-defined order; the
    moment form is what stays hash-exact cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    s = hourly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = (
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    ).cast("double")
    return s.select(
        "n",
        "sx",
        "sy",
        F.round(num / F.sqrt(den), 6).alias("pearson_r"),
    )


@register(
    "events_markov_transitions",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
),
counts AS (
    SELECT prev_type, event_type AS next_type, count(*)::BIGINT AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
),
tot AS (
    SELECT prev_type, sum(n)::BIGINT AS row_total FROM counts GROUP BY prev_type
)
SELECT c.prev_type, c.next_type, c.n,
       round(c.n * 1.0 / t.row_total, 6) AS p
FROM counts c JOIN tot t USING (prev_type)
""",
)
def q_events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral modeling [Q]: first-order Markov transition matrix over
    per-user event sequences — lag() pairs each event with its
    predecessor, one grouped count per (prev, next), row-normalized into
    transition probabilities (integer count / integer row total — one
    exact division, round-6).

    Scale notes: one shuffle on user_id for the lag window; the
    transition count is a tiny (types^2) aggregate with map-side combine;
    the row-total join is broadcast-sized by construction."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = counts.groupBy("prev_type").agg(F.sum("n").cast("bigint").alias("row_total"))
    return counts.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.col("row_total"), 6).alias("p"),
    )


@register(
    "events_user_rfm",
    oracle="""
WITH maxts AS (SELECT max(ts) AS tmax FROM events),
per_user AS (
    SELECT user_id,
           date_diff('day', max(ts), (SELECT tmax FROM maxts))::BIGINT AS recency_days,
           count(*)::BIGINT AS frequency,
           round(sum(value::DECIMAL(12,2)), 2)::DOUBLE AS monetary
    FROM events GROUP BY user_id
)
SELECT user_id, recency_days, frequency, monetary,
       ntile(5) OVER (ORDER BY recency_days ASC, user_id)::BIGINT AS r_score,
       ntile(5) OVER (ORDER BY frequency DESC, user_id)::BIGINT AS f_score,
       ntile(5) OVER (ORDER BY monetary DESC, user_id)::BIGINT AS m_score
FROM per_user
""",
)
def q_events_user_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer segmentation [Q]: RFM scoring — per-user recency (days
    since last event vs the corpus max), frequency, and monetary total,
    each quintile-bucketed with ntile over a TOTAL order (metric +
    user_id tiebreak, so bucket boundaries are deterministic; monetary
    accumulates in exact DECIMAL for the same cent-boundary reason as the
    ABC gate).

    Scale notes: one user-keyed aggregate; the corpus max rides a 1-row
    broadcast; the three ntiles share one (user-count)-sized input —
    at 100 TB users still fit a single quantile pass or swap to
    percent_rank bucketing over the same total order."""
    ev = load_table(spark, sf_dir, "events")
    tmax = ev.agg(F.max("ts").alias("tmax"))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(tmax))
        .select(
            "user_id",
            F.datediff(F.col("tmax"), F.col("last_ts")).cast("bigint").alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
        )
    )
    return per_user.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5)
        .over(Window.orderBy(F.col("recency_days").asc(), F.col("user_id").asc()))
        .cast("bigint")
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("frequency").desc(), F.col("user_id").asc()))
        .cast("bigint")
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("monetary").desc(), F.col("user_id").asc()))
        .cast("bigint")
        .alias("m_score"),
    )


@register(
    "events_rolling_active_users",
    oracle="""
WITH day_user AS (
    SELECT DISTINCT date_trunc('day', ts)::TIMESTAMP AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM day_user),
contrib AS (
    SELECT d.day, du.user_id
    FROM days d JOIN day_user du
      ON du.day <= d.day AND du.day > d.day - INTERVAL 7 DAY
)
SELECT day,
       count(DISTINCT user_id)::BIGINT AS wau
FROM contrib GROUP BY day
""",
)
def q_events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth analytics [Q]: rolling 7-day active users per day (WAU) —
    the trailing-distinct aggregate no window frame can express (COUNT
    DISTINCT over a sliding range isn't a streaming-friendly frame).

    Scale shape: events first collapse to DISTINCT (day, user) rows —
    the only corpus-sized stage; each such row then EXPLODES to the <=7
    observation days it contributes to (a constant replication factor,
    the bucket-replication trick the range join uses), and one grouped
    count-distinct finishes. Versus the oracle's declarative theta-join
    (fine at fixture scale), the explode form is an equi-join on day —
    shuffle-bounded at 7x the daily-active row count, never a range
    probe per day pair."""
    ev = load_table(spark, sf_dir, "events")
    day_user = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    days = day_user.select("day").distinct()
    contrib = day_user.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(6))
        ).alias("_off"),
        F.col("day").alias("_src_day"),
        "user_id",
    ).select(
        (F.col("_src_day") + F.make_dt_interval(days=F.col("_off"))).alias("day"),
        "user_id",
    )
    return (
        contrib.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    )


@register(
    "events_twap",
    oracle="""
WITH seq AS (
    SELECT event_type, value,
           epoch_us(ts)::BIGINT AS t_us,
           lead(epoch_us(ts)::BIGINT) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS t_next_us
    FROM events
)
SELECT event_type,
       count(*)::BIGINT AS n_segments,
       round(sum(value::DECIMAL(12,2) * (t_next_us - t_us))
             / sum(t_next_us - t_us), 6)::DOUBLE AS twap
FROM seq
WHERE t_next_us IS NOT NULL
GROUP BY event_type
""",
)
def q_events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irregular time series [Q]: time-weighted average value per event
    type — each observation holds until the next one (step-function
    integral), so the mean weighs values by their holding duration in
    microseconds, not by observation count: the standard TWAP correction
    for irregularly sampled feeds (a value sampled rarely counts for the
    whole gap it covered).

    Exactness: weights are integer microsecond gaps, values 2-decimal —
    the weighted sum accumulates in DECIMAL x BIGINT (exact), and one
    final division rounds to 6. One event_type-keyed window + one grouped
    aggregate on the same partitioning."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    t_us = F.unix_micros(F.col("ts"))
    seq = ev.select(
        "event_type",
        "value",
        t_us.alias("t_us"),
        F.lead(t_us).over(w).alias("t_next_us"),
    ).filter(F.col("t_next_us").isNotNull())
    gap = F.col("t_next_us") - F.col("t_us")
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.round(
            F.sum(F.col("value").cast("decimal(12,2)") * gap) / F.sum(gap), 6
        )
        .cast("double")
        .alias("twap"),
    )


#: Fixed-point scale for per-term entropy contributions (same
#: quantize-before-sum discipline as text.LM_LP_SCALE): each term is
#: floored to an integer BEFORE the aggregate, so summation order cannot
#: produce engine-dependent last bits.
ENTROPY_SCALE = 10**9


@register(
    "events_user_entropy",
    oracle=f"""
WITH counts AS (
    SELECT user_id, event_type, count(*)::BIGINT AS c
    FROM events GROUP BY user_id, event_type
),
tot AS (SELECT user_id, sum(c)::BIGINT AS n FROM counts GROUP BY user_id),
terms AS (
    SELECT c.user_id,
           floor(-(c.c * 1.0 / t.n) * ln(c.c * 1.0 / t.n) * {ENTROPY_SCALE})::BIGINT
               AS term_e9
    FROM counts c JOIN tot t USING (user_id)
)
SELECT t.user_id, tt.n AS n_events,
       round(sum(t.term_e9) / {ENTROPY_SCALE}.0, 6) AS entropy_nats
FROM terms t JOIN tot tt ON tt.user_id = t.user_id
GROUP BY t.user_id, tt.n
""",
)
def q_events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity [Q]: Shannon entropy (nats) of each user's
    event-type distribution — the specialization/exploration signal a
    personalization pipeline features on.

    Exactness discipline: each ``-p ln p`` term is floor-quantized to an
    integer at 1e9 scale BEFORE the per-user sum (the text.LM_LP_SCALE
    convention), so aggregate accumulation order — which neither engine
    specifies — cannot move the result; the final division is one double
    op on an exact integer. One (user, type) count, one user rollup."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = counts.groupBy("user_id").agg(F.sum("c").cast("bigint").alias("n"))
    p = F.col("c") / F.col("n")
    terms = counts.join(tot, "user_id").select(
        "user_id",
        "n",
        F.floor(-p * F.log(p) * ENTROPY_SCALE).cast("bigint").alias("term_e9"),
    )
    return terms.groupBy("user_id", F.col("n").alias("n_events")).agg(
        F.round(F.sum("term_e9") / F.lit(float(ENTROPY_SCALE)), 6).alias(
            "entropy_nats"
        )
    )


@register(
    "events_bot_regularity",
    oracle="""
WITH gaps AS (
    SELECT user_id,
           (epoch_us(ts)::BIGINT // 1000000)
             - (lag(epoch_us(ts)::BIGINT // 1000000) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS gap_s
    FROM events
),
stats AS (
    SELECT user_id, count(*)::BIGINT AS n,
           sum(gap_s)::BIGINT AS s, sum(gap_s * gap_s)::BIGINT AS ss
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY user_id HAVING count(*) >= 10
)
SELECT user_id, n,
       round(s * 1.0 / n, 6) AS mean_gap_s,
       (100 * (n * ss - s * s) < s * s) AS too_regular
FROM stats
""",
)
def q_events_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Abuse detection [Q]: inter-arrival regularity — a user whose event
    gaps have a coefficient of variation under 0.1 fires like a cron job,
    not a human. The CV threshold decides ENTIRELY in BIGINT:
    ``cv < 0.1  <=>  100 * (n*ss - s^2) < s^2`` over second-granularity
    integer gaps (the z-score/correlation cross-multiplication trick;
    micros would overflow s^2 at real horizons, seconds don't). One
    user-keyed lag window + one aggregate on the same partitioning;
    users under 10 gaps are excluded (CV is noise there)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    t_s = F.floor(F.unix_micros(F.col("ts")) / 1000000).cast("bigint")
    gaps = ev.select(
        "user_id", (t_s - F.lag(t_s).over(w)).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    stats = (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("gap_s").cast("bigint").alias("s"),
            F.sum(F.col("gap_s") * F.col("gap_s")).cast("bigint").alias("ss"),
        )
        .filter(F.col("n") >= 10)
    )
    return stats.select(
        "user_id",
        "n",
        F.round(F.col("s") / F.col("n"), 6).alias("mean_gap_s"),
        (
            100 * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
            < F.col("s") * F.col("s")
        ).alias("too_regular"),
    )


@register(
    "events_profile_similarity",
    oracle="""
WITH prof AS (
    SELECT event_type, hour(ts)::INT AS h, count(*)::BIGINT AS c
    FROM events GROUP BY event_type, hour(ts)
),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           sum(a.c * b.c)::BIGINT AS dot
    FROM prof a JOIN prof b
      ON b.h = a.h AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
),
norms AS (SELECT event_type, sum(c * c)::BIGINT AS nrm2 FROM prof GROUP BY event_type)
SELECT p.type_a, p.type_b,
       round(p.dot / sqrt((na.nrm2 * nb.nrm2)::DOUBLE), 6) AS cosine_sim
FROM pairs p
JOIN norms na ON na.event_type = p.type_a
JOIN norms nb ON nb.event_type = p.type_b
""",
)
def q_events_profile_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral clustering [Q]: cosine similarity between event types'
    hour-of-day activity profiles (24-dim integer count vectors) — the
    signal that groups usage patterns (e.g. errors tracking clicks means
    load-correlated failures). Dot products and norms are pure BIGINT
    aggregates over the hour-keyed join; the one float op per pair is the
    final divide-by-sqrt, round-6.

    Scale shape: the profile table is (types x 24) rows regardless of
    corpus size — everything after the first hour-keyed count is
    constant-sized."""
    ev = load_table(spark, sf_dir, "events")
    prof = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = prof.select(F.col("event_type").alias("type_a"), "h", F.col("c").alias("ca"))
    b = prof.select(F.col("event_type").alias("type_b"), F.col("h").alias("hb"), F.col("c").alias("cb"))
    pairs = (
        a.join(b, (F.col("h") == F.col("hb")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("dot"))
    )
    norms = prof.groupBy("event_type").agg(
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("nrm2")
    )
    na = norms.select(F.col("event_type").alias("type_a"), F.col("nrm2").alias("na2"))
    nb = norms.select(F.col("event_type").alias("type_b"), F.col("nrm2").alias("nb2"))
    return (
        pairs.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.round(
                F.col("dot") / F.sqrt((F.col("na2") * F.col("nb2")).cast("double")), 6
            ).alias("cosine_sim"),
        )
    )
