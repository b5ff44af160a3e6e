"""Per-query construction-vs-execution profiler (guide §1.1/§1.4).

Splits each registered query's wall time into DRIVER-SIDE CONSTRUCTION
(the ``QUERIES[name](spark, sf_dir)`` call: py4j Column building, plan
analysis, any eager actions the operator runs internally) and EXECUTION
(a noop-sink write of the returned DataFrame — computes every column of
every row, §1.4). Queries whose callable performs its work eagerly
(streaming gates, durable writes) show their cost under "construct";
the split is the diagnostic, not a benchmark.

Usage:
    python tools/profile_construct.py [sf_dir] name [name ...]
Prints one JSON line per query:
    {"query": ..., "construct_s": ..., "exec_s": ..., "exec2_s": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bioclip_vector_db_spark.plans.registry import (  # noqa: E402
    QUERIES,
    load_all_plans,
    release_transient,
)
from bioclip_vector_db_spark.session import get_spark  # noqa: E402


def main(argv: list[str]) -> int:
    load_all_plans()
    sf_dir = "/root/testdata/sf0.1"
    names: list[str] = []
    for a in argv:
        if os.path.isdir(a):
            sf_dir = a
        elif a in QUERIES:
            names.append(a)
        else:
            print(f"unknown argument {a!r}: not a directory or registered query")
            return 2
    spark = get_spark("profile_construct")
    # Same untimed warm-up as bench.py: prebuilt index artifacts + JVM.
    from bioclip_vector_db_spark.operators.dedup import (
        cached_embedding_band_keys,
        cached_embedding_signatures,
    )
    from bioclip_vector_db_spark.operators.indexing import trained_centroids
    from bioclip_vector_db_spark.operators.knn import assigned_corpus

    assigned_corpus(spark, sf_dir).count()
    trained_centroids(spark, sf_dir).count()
    cached_embedding_signatures(spark, sf_dir).count()
    cached_embedding_band_keys(spark, sf_dir).count()
    for name in names:
        release_transient()
        spark.sparkContext.setJobDescription(f"profile:{name}:construct")
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        t_construct = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(f"profile:{name}:exec")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_exec = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_exec2 = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        print(
            json.dumps(
                {
                    "query": name,
                    "construct_s": round(t_construct, 3),
                    "exec_s": round(t_exec, 3),
                    "exec2_s": round(t_exec2, 3),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
