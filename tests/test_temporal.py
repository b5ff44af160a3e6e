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
]


@pytest.mark.parametrize("name", TEMPORAL_QUERIES)
def test_oracle_parity(name, spark, sf_dir, duck):
    assert_matches_oracle(QUERIES[name](spark, sf_dir), duck, ORACLES[name])
