"""Bench regression guard: the >2x-vs-reference check in bench.py."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import bench


def test_find_regressions_logic():
    ref = {"fast": 0.05, "steady": 1.0, "regressed": 2.0, "removed": 0.8}
    got = {"fast": 0.4, "steady": 1.9, "regressed": 5.0, "brand_new": 9.9}
    out = bench.find_regressions(got, ref)
    # Only the real regression fires: sub-floor refs are jitter-exempt,
    # <2x is within budget, queries missing from either side are skipped.
    assert out == {"regressed": {"ref": 2.0, "got": 5.0}}


def test_bench_strict_fails_on_regression(tmp_path):
    """End-to-end: a doctored reference forces a regression; strict mode
    must exit 3 while stdout still carries exactly one driver-parseable
    JSON line."""
    ref_path = tmp_path / "ref.json"
    # An impossible 1ms reference plus a zeroed jitter floor: any real run
    # trips the guard, keeping the test host-speed independent.
    ref_path.write_text(json.dumps({"sf": 0.001, "queries": {"taxon_parse": 0.001}}))
    env = os.environ | {
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
        "SPARK_GRAFT_BENCH_REF": str(ref_path),
        "SPARK_GRAFT_BENCH_STRICT": "1",
        "SPARK_GRAFT_BENCH_ONLY": "taxon_parse",
        "SPARK_GRAFT_BENCH_FLOOR": "0",
        "SPARK_GRAFT_CPUS": "8",
    }
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(bench.__file__), "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 3, proc.stderr[-2000:]
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    assert payload["metric"] == "total_query_wall_clock"
    assert "taxon_parse" in payload["queries"]
    assert "BENCH-REGRESSION taxon_parse" in proc.stderr


def test_wipe_durable_gates_skips_locked_dirs(tmp_path, monkeypatch):
    """A bench run concurrent with another process mid-stream on the same
    gate must NOT rmtree its checkpoint out from under it: wipe takes the
    per-dir flock non-blocking and skips dirs whose lock is held."""
    import fcntl
    import tempfile

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    name = next(iter(bench.DURABLE_GATES))
    prefix = bench.DURABLE_GATES[name]
    held = tmp_path / f"{prefix}_held"
    free = tmp_path / f"{prefix}_free"
    for d in (held, free):
        d.mkdir()
        (d / "chk").write_text("checkpoint")
    fh = open(f"{held}.lock", "a+")
    try:
        fcntl.flock(fh, fcntl.LOCK_EX)
        bench.wipe_durable_gates([name])
        assert held.is_dir() and (held / "chk").exists()  # in use: kept
        assert not free.exists()  # idle: wiped
    finally:
        fcntl.flock(fh, fcntl.LOCK_UN)
        fh.close()
    bench.wipe_durable_gates([name])
    assert not held.exists()  # released: wiped on the next cold pass
