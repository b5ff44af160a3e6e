"""Run every declared query on a VANILLA SparkSession — no engine configs —
to prove the registry carries its own config needs (the driver supplies its
own session; round 1 lost json_metadata_roundtrip to exactly this).

Usage: python tools/check_vanilla_session.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]").appName("vanilla-gate").getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    import __spark_entry__ as entry_mod

    failures = []
    for name, fn in sorted(entry_mod.queries().items()):
        try:
            n = fn(spark, sf_dir).count()
            print(f"{name:32s} rows={n}")
        except Exception as e:  # noqa: BLE001 — report-and-continue gate
            failures.append(name)
            print(f"{name:32s} FAILED {type(e).__name__}: {str(e)[:200]}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
