"""Query registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md section 2 lands here twice:
a Spark callable ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible)
its ANSI-SQL twin that DuckDB runs on the same parquet tables. The driver
hash-compares the two at sf0.01 — this registry IS the correctness surface.

Parity rules (enforced by convention in every registered query):
- identical output column names on both sides (alias everything);
- float outputs computed in DOUBLE and rounded to functions.vector.PARITY_SCALE
  decimals BEFORE any ORDER BY / row_number so both engines rank identically;
- every window/top-k has a total tiebreak (always ends on a key column);
- integer rank/count columns cast to BIGINT to match DuckDB.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Modules that register queries on import. Every entry must exist on disk.
_PLAN_MODULES = (
    "bioclip_vector_db_spark.operators.knn",
    "bioclip_vector_db_spark.operators.indexing",
    "bioclip_vector_db_spark.operators.relational",
    "bioclip_vector_db_spark.operators.taxon",
    "bioclip_vector_db_spark.operators.dedup",
    "bioclip_vector_db_spark.operators.text",
    "bioclip_vector_db_spark.streaming.events",
    "bioclip_vector_db_spark.operators.embedding",
    "bioclip_vector_db_spark.operators.multimodal",
    "bioclip_vector_db_spark.operators.tpch",
    "bioclip_vector_db_spark.operators.quantization",
    "bioclip_vector_db_spark.streaming.stateful",
    "bioclip_vector_db_spark.streaming.ingest",
    "bioclip_vector_db_spark.operators.temporal",
    "bioclip_vector_db_spark.sources.webdataset",
    "bioclip_vector_db_spark.sources.jsonl",
    "bioclip_vector_db_spark.sources.csv",
)


#: Per-invocation persisted intermediates awaiting release. Spark's
#: CacheManager holds cached plans until explicitly unpersisted — a query
#: that persists a shingle/signature table and returns leaks that cache
#: entry every invocation (the ContextCleaner only reclaims GC'd RDDs,
#: not DataFrame cache entries). Harnesses that run MANY queries in one
#: session (bench.py, tools/check_correctness.py) call
#: release_transient() after consuming each result; one-shot library use
#: never needs to.
_TRANSIENT: list = []


def transient_persist(df):
    """persist() for an intermediate whose useful life is ONE query
    invocation: registers the DataFrame for release_transient()."""
    df = df.persist()
    _TRANSIENT.append(df)
    return df


def release_transient() -> None:
    """Unpersist every transient intermediate registered since the last
    call. Safe to call while results are still referenced — a later
    action just recomputes without the cache."""
    while _TRANSIENT:
        try:
            _TRANSIENT.pop().unpersist()
        except Exception:
            pass


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: declare a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_plans() -> None:
    """Import every operator module so its @register calls run."""
    for mod in _PLAN_MODULES:
        importlib.import_module(mod)
