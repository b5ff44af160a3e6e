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
import threading
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
#:
#: THREAD-LOCAL on purpose (r11): the registry was one global list, and
#: a serving tier running queries from several driver threads (each
#: calling release_transient after its own query, exactly like the
#: single-threaded harnesses do) would unpersist ANOTHER thread's
#: in-flight intermediates. The docstring used to call that safe ("a
#: later action just recomputes") — measured counterexample: under a
#: 4-thread mix, `semantic_dedup` intermittently (~15% of sessions)
#: returned an EMPTY result when a sibling thread unpersisted its
#: persisted `ranked` table mid-collect — Spark 4.1.2 silently served
#: zero rows instead of recomputing (no task error, no log line).
#: Thread-locality removes the cross-thread unpersist entirely: each
#: thread releases exactly what it registered. Pinned by
#: tests/test_concurrency.py (the 4-thread gate plus
#: test_release_transient_is_thread_scoped).
_TRANSIENT_TLS = threading.local()

#: Every per-thread list ever created, for release_all_transients() —
#: without it, a transient registered on a short-lived worker thread
#: that exits before calling release_transient() would be unreleasable
#: (the persist lives JVM-side regardless of the Python thread's fate).
_ALL_TRANSIENT_LISTS: list[list] = []
_TRANSIENT_LOCK = threading.Lock()


def _transient_list() -> list:
    lst = getattr(_TRANSIENT_TLS, "dfs", None)
    if lst is None:
        lst = _TRANSIENT_TLS.dfs = []
    return lst


def transient_persist(df):
    """persist() for an intermediate whose useful life is ONE query
    invocation: registers the DataFrame for release_transient() — on the
    CALLING thread's registry (see _TRANSIENT_TLS)."""
    df = df.persist()
    lst = _transient_list()
    with _TRANSIENT_LOCK:
        # Indexed at REGISTRATION time (not list creation):
        # release_all_transients prunes emptied lists, so a thread that
        # registers again after a drain must re-index its (identical,
        # TLS-held) list or the next drain would miss it. The append
        # happens INSIDE the lock: appended outside, a drain's prune
        # could interleave between index-check and append and drop the
        # list from the index with a live entry about to land in it —
        # an unreleasable JVM-side persist.
        if not any(l is lst for l in _ALL_TRANSIENT_LISTS):
            _ALL_TRANSIENT_LISTS.append(lst)
        lst.append(df)
    return df


def release_transient() -> None:
    """Unpersist every transient intermediate the CALLING thread
    registered since its last call. Never touches other threads'
    registrations — unpersisting a plan another thread is mid-query on
    is NOT safe (see _TRANSIENT_TLS)."""
    lst = _transient_list()
    while lst:
        try:
            lst.pop().unpersist()
        except Exception:
            pass


def release_all_transients() -> None:
    """Quiescent-teardown drain: unpersist EVERY thread's registered
    transients, including those of worker threads that exited without
    calling release_transient() (their persists live JVM-side regardless
    of the Python thread's fate). Only call when no query is in flight on
    ANY thread — cross-thread unpersist of an in-flight plan is exactly
    the silent-empty-result race release_transient()'s thread-scoping
    exists to prevent (see _TRANSIENT_TLS). Wired into the long-running
    harnesses' shutdown paths (bench.py, tools/check_correctness.py,
    tools/scale_stress.py) and api.VectorSearchEngine.close().

    Emptied lists are PRUNED from the index afterwards (r11 ADVICE:
    one retained list per thread ever created is an unbounded leak on a
    serving driver with churning worker threads). A list that picked up
    a new registration between the drain and the prune — a caller
    violating the quiescence contract — is kept, never dropped with
    live entries."""
    with _TRANSIENT_LOCK:
        lists = list(_ALL_TRANSIENT_LISTS)
    for lst in lists:
        while lst:
            try:
                lst.pop().unpersist()
            except Exception:
                pass
    with _TRANSIENT_LOCK:
        _ALL_TRANSIENT_LISTS[:] = [l for l in _ALL_TRANSIENT_LISTS if l]


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
