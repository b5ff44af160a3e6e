"""Generic relational queries: oracle parity."""

from __future__ import annotations

import pytest

from bioclip_vector_db_spark.plans.registry import ORACLES, QUERIES, load_all_plans

from .conftest import assert_matches_oracle

load_all_plans()

TPCH_QUERIES = [
    "tpch_active_customers_semi",
    "tpch_promo_revenue_share",
    "tpch_top_suppliers",
    "tpch_pricing_summary",
    "tpch_top_orders",
    "tpch_revenue_forecast",
    "tpch_top_customers_per_nation",
    "tpch_nation_rollup",
]


@pytest.mark.parametrize("name", TPCH_QUERIES)
def test_oracle_parity(name, spark, sf_dir, duck):
    assert_matches_oracle(QUERIES[name](spark, sf_dir), duck, ORACLES[name])
