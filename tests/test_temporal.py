"""Temporal operators: as-of / range joins + running windows."""

from __future__ import annotations

from bioclip_vector_db_spark.plans.registry import load_all_plans

load_all_plans()

def test_asof_join_matches_bruteforce(spark):
    """Property: the union-tag as-of join equals the brute-force
    definition (max build.ts <= probe.ts per key) on randomized data."""
    import random

    rng = random.Random(7)
    probes, builds = [], []
    eid = 0
    for key in range(6):
        for _ in range(rng.randint(0, 12)):
            eid += 1
            probes.append((key, rng.randint(0, 50), eid, 1.0))
        for _ in range(rng.randint(0, 12)):
            eid += 1
            builds.append((key, rng.randint(0, 50), eid, 2.0))
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from bioclip_vector_db_spark.operators.temporal import asof_join

    schema = "user_id long, tsec long, event_id long, value double"
    to_df = lambda rows: (  # noqa: E731
        spark.createDataFrame(rows, schema).withColumn(
            "ts", F.timestamp_seconds("tsec")
        ).drop("tsec")
    )
    probe_df, build_df = to_df(probes), to_df(builds)
    got = {
        r.event_id: r.asof_event_id
        for r in asof_join(probe_df, build_df, ["user_id"], payload=("event_id",)).collect()
    }
    build_by_key: dict[int, list] = {}
    for key, tsec, beid, _v in builds:
        build_by_key.setdefault(key, []).append((tsec, beid))
    want = {}
    for key, tsec, peid, _v in probes:
        cands = [(t, b) for t, b in build_by_key.get(key, []) if t <= tsec]
        # Later build rows win; ties on ts break to the larger event_id
        # (the running last over (ts asc, event_id asc) keeps the last).
        want[peid] = max(cands)[1] if cands else None
    assert got == want


def test_range_join_matches_bruteforce(spark):
    """Property: the bucket-replicated range join equals the brute-force
    trailing-window definition on randomized data, including zero-match
    probes and window-boundary hits."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(11)
    width = 600
    errors = [(k, rng.randint(0, 4000), i) for i, k in enumerate(
        rng.choices(range(4), k=30))]
    views = [(k, rng.randint(0, 4000), round(rng.uniform(0, 5), 2)) for k in
             rng.choices(range(4), k=120)]
    e_df = spark.createDataFrame(
        [(k, t, i) for k, t, i in errors], "user_id long, tsec long, event_id long"
    ).select("user_id", F.timestamp_seconds("tsec").alias("ts"), "event_id")
    v_df = spark.createDataFrame(views, "user_id long, tsec long, value double").select(
        "user_id", F.timestamp_seconds("tsec").alias("ts"), "value"
    )
    width_us = width * 1_000_000
    eb = e_df.withColumn("_bucket", F.floor(F.unix_micros("ts") / F.lit(width_us))).alias("e")
    vb = (
        v_df.withColumn("_b0", F.floor(F.unix_micros("ts") / F.lit(width_us)))
        .withColumn("_bucket", F.explode(F.array(F.col("_b0"), F.col("_b0") + 1)))
        .drop("_b0")
        .alias("v")
    )
    cond = (
        (F.col("e._bucket") == F.col("v._bucket"))
        & (F.col("e.user_id") == F.col("v.user_id"))
        & (F.col("v.ts") >= F.col("e.ts") - F.expr(f"INTERVAL {width} SECOND"))
        & (F.col("v.ts") < F.col("e.ts"))
    )
    got = {
        (r.event_id): (r.n, round(r.s, 6))
        for r in eb.join(vb, cond, "left")
        .groupBy(F.col("e.event_id").alias("event_id"))
        .agg(
            F.count(F.col("v.ts")).alias("n"),
            F.coalesce(F.sum("v.value"), F.lit(0.0)).alias("s"),
        )
        .collect()
    }
    want = {}
    for k, t, i in errors:
        hits = [val for vk, vt, val in views if vk == k and t - width <= vt < t]
        want[i] = (len(hits), round(sum(hits), 6))
    assert got == want
