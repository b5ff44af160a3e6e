"""Temporal operators: as-of / range joins + running windows."""

from __future__ import annotations

import pytest

from bioclip_vector_db_spark.plans.registry import ORACLES, QUERIES, load_all_plans

from .conftest import assert_matches_oracle

load_all_plans()

TEMPORAL_QUERIES = [
    "events_asof_join",
    "events_range_join",
    "events_user_running_value",
    "events_cube",
    "dq_audit",
    "events_funnel",
    "json_malformed_handling",
]


@pytest.mark.parametrize("name", TEMPORAL_QUERIES)
def test_oracle_parity(name, spark, sf_dir, duck):
    assert_matches_oracle(QUERIES[name](spark, sf_dir), duck, ORACLES[name])


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
