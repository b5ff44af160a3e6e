"""Record / diff the physical-plan fingerprint corpus.

Computes the operator-multiset fingerprint of every registered query
(see bioclip_vector_db_spark/plans/fingerprint.py) at the test fixture
scale and compares against the committed PLAN_FINGERPRINTS.json; with
--write, refreshes the corpus instead (run after an INTENTIONAL plan
change, and eyeball the git diff — it is the review surface for "did my
edit change any plan I didn't mean to touch").

Usage:
    python tools/plan_fingerprints.py [--write] [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bioclip_vector_db_spark.plans.fingerprint import (  # noqa: E402
    load_corpus,
    plan_fingerprint,
    save_corpus,
)
from bioclip_vector_db_spark.plans.registry import (  # noqa: E402
    QUERIES,
    load_all_plans,
    release_transient,
)
from bioclip_vector_db_spark.session import get_spark  # noqa: E402


def main(argv: list[str]) -> int:
    write = "--write" in argv
    args = [a for a in argv if a != "--write"]
    load_all_plans()
    # Strict arg classification: a dir is the sf_dir, a registered name
    # is a target; anything else (e.g. a mistyped path) is an error, not
    # silently reinterpreted as a query name or dropped.
    sf_dir = "/root/testdata/sf0.001"
    names: list[str] = []
    for a in args:
        if os.path.isdir(a):
            sf_dir = a
        elif a in QUERIES:
            names.append(a)
        else:
            print(f"unknown argument {a!r}: not a directory or registered query")
            return 2
    spark = get_spark("plan-fingerprints", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    targets = names or sorted(QUERIES)
    if write and names:
        print(
            "NOTE: subset --write records under this invocation's cache "
            "state; run a full check afterwards (the full sorted sweep is "
            "the canonical protocol)."
        )

    corpus = load_corpus()
    rc = 0
    for name in targets:
        # Fingerprint BEFORE any action: the pre-execution initial plan is
        # the deterministic one (post-execution, AQE rewrites the tree).
        fp = plan_fingerprint(QUERIES[name](spark, sf_dir))
        release_transient()
        if write:
            corpus[name] = fp
            print(f"{name:<40} recorded ({sum(fp.values())} ops)")
        elif name not in corpus:
            print(f"{name:<40} MISSING from corpus (run with --write)")
            rc = 1
        elif corpus[name] != fp:
            want, got = corpus[name], fp
            diff = {
                k: (want.get(k, 0), got.get(k, 0))
                for k in sorted(set(want) | set(got))
                if want.get(k, 0) != got.get(k, 0)
            }
            print(f"{name:<40} PLAN CHANGED {diff}")
            rc = 1
        else:
            print(f"{name:<40} ok")
    if write:
        save_corpus(corpus)
    return rc


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
