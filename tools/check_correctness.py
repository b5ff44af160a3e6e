"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark and its DuckDB oracle side-by-side,
compares row count, column names, and values (rows sorted canonically,
floats compared both exactly and with tolerance so we can see how much
rounding headroom the parity convention has).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bioclip_vector_db_spark.session import get_spark  # noqa: E402
from bioclip_vector_db_spark.sources.catalog import TABLES  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def compare(name, spark_df, duck_rows, duck_cols):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    sc, sr = canon(s_rows, s_cols)
    dc, dr = canon(duck_rows, duck_cols)
    problems = []
    if sc != [c.lower() for c in dc] and sc != dc:
        problems.append(f"columns differ: spark={sc} duck={dc}")
    if len(sr) != len(dr):
        problems.append(f"rowcount differ: spark={len(sr)} duck={len(dr)}")
    exact = True
    max_float_diff = 0.0
    if not problems:
        for a, b in zip(sr, dr):
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float):
                    if math.isnan(x) and math.isnan(y):
                        continue
                    d = abs(x - y)
                    max_float_diff = max(max_float_diff, d)
                    if x != y:
                        exact = False
                elif x != y:
                    problems.append(f"value mismatch: {x!r} != {y!r} in row {a} vs {b}")
                    break
            if problems:
                break
    status = "OK" if not problems and exact else ("FLOAT-DRIFT" if not problems else "FAIL")
    print(f"{name:32s} {status:12s} rows={len(sr)} max_float_diff={max_float_diff:.3e}")
    for p in problems[:3]:
        print(f"    {p}")
    # The driver's gate is an exact order-insensitive value hash; any float
    # inequality that survives the parity rounding is a failure here too.
    record = {
        "status": status,
        "rows": len(sr),
        "max_float_diff": max_float_diff,
        "problems": problems[:3],
    }
    return not problems and exact, record


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: check_correctness.py [sf_dir] [query ...] --json OUT")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    ok = True
    records = {}
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            if name not in oracles:
                n = sdf.count()
                print(f"{name:32s} {'ROWS-ONLY':12s} rows={n}")
                records[name] = {"status": "ROWS-ONLY", "rows": n}
                continue
            rel = con.sql(oracles[name])
            q_ok, rec = compare(name, sdf, rel.fetchall(), rel.columns)
            ok &= q_ok
            records[name] = rec
        except Exception as e:
            ok = False
            print(f"{name:32s} ERROR        {type(e).__name__}: {e}")
            records[name] = {"status": "ERROR", "error": f"{type(e).__name__}: {e}"}
        finally:
            # 92 queries share one session: drop each invocation's
            # persisted intermediates so the sweep doesn't accumulate
            # dead cache blocks.
            from bioclip_vector_db_spark.plans.registry import release_transient

            release_transient()
    # Harness shutdown drain (r11 ADVICE): releases any transient a query
    # registered on a non-main thread and prunes the registry index.
    from bioclip_vector_db_spark.plans.registry import release_all_transients

    release_all_transients()
    if json_out:
        import json

        n_ok = sum(1 for r in records.values() if r["status"] == "OK")
        payload = {
            "sf_dir": sf_dir,
            "n_queries": len(records),
            "n_exact": n_ok,
            "all_exact": n_ok == len(records),
            "queries": records,
        }
        with open(json_out, "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)
            f.write("\n")
        print(f"wrote {json_out}: {n_ok}/{len(records)} exact")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
