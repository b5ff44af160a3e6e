"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``bioclip_vector_db_spark``; this module is a
thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from bioclip_vector_db_spark.plans.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
    load_all_plans,
)

load_all_plans()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: exact top-10 cosine KNN
    (the reference's core capability, SURVEY.md O24+O27+O28)."""
    return QUERIES["knn_bruteforce"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable releases the PREVIOUS invocation's transient persisted
    intermediates before building its plan (plans/registry.py
    release_transient): harnesses that run the whole registry in one
    session — the driver's correctness gate included — would otherwise
    accumulate one dead cache entry per persisting query, and by
    invocation time the prior query's result has been consumed. A
    released intermediate is only ever recomputed, never wrong."""
    from bioclip_vector_db_spark.plans.registry import release_transient

    load_all_plans()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_transient()
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query in ``queries()``."""
    load_all_plans()
    return dict(ORACLES)
