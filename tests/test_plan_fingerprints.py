"""Plan-shape regression gate over EVERY registered query — the plan
analog of test_bench_guard: the physical plan's operator multiset must
match the committed PLAN_FINGERPRINTS.json. Catches silent optimizer
regressions (broadcast -> sort-merge, lost WindowGroupLimit, extra
Exchange) for all 170 queries, where tests/test_plans.py's hand-written
guards cover only the ~28 someone thought to pin.

Plan shape is only reproducible under a FIXED session protocol (fresh
JVM, queries built in sorted order, nothing executed — see
bioclip_vector_db_spark/plans/fingerprint.py on why materialized session
caches legitimately flip join strategies), so the check runs the
standalone tool in a subprocess rather than fingerprinting inside this
pytest session. After an INTENTIONAL plan change, refresh with
`python tools/plan_fingerprints.py --write [names...]` and review the
corpus diff.
"""

from __future__ import annotations

import os
import subprocess
import sys

from .conftest import SF_DIR

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_plan_fingerprints_match_corpus():
    import pytest

    if not SF_DIR.rstrip("/").endswith("sf0.001"):
        # A silent `return` would report PASSED with zero coverage.
        pytest.skip("plan-fingerprint corpus is recorded at sf0.001")
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "plan_fingerprints.py"), SF_DIR],
        capture_output=True,
        text=True,
        cwd=_REPO,
        timeout=900,
    )
    drifted = [
        line
        for line in proc.stdout.splitlines()
        if "PLAN CHANGED" in line or "MISSING" in line
    ]
    assert proc.returncode == 0, "plan drift:\n" + "\n".join(drifted) + (
        "" if drifted else f"\ntool failed:\n{proc.stderr[-2000:]}"
    )
