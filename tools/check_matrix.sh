#!/usr/bin/env bash
# Execution-path correctness matrix: the full 170-query DuckDB oracle
# gate under each alternate engine configuration (results must be
# hash-exact under every one — see SURVEY.md §2.7, round-8 entry).
#
# Usage: tools/check_matrix.sh [sf_dir]   (default /root/testdata/sf0.01)
# Each leg runs in a FRESH process (the hatches are static per session).
set -u
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
rc=0

run_leg() {
    local label="$1"; shift
    echo "=== $label ==="
    # Capture BOTH the output and the exit status: a leg that crashes
    # before the per-query loop (import error, pre-existing-session
    # RuntimeError, JVM OOM kill) prints a traceback matching none of the
    # failure patterns — the grep alone would report a false "all OK".
    local out status
    out="$(mktemp)"
    env "$@" python tools/check_correctness.py "$SF_DIR" >"$out" 2>&1
    status=$?
    if [ "$status" -ne 0 ] || grep -E "FAIL|ERROR|DRIFT|ROWS-ONLY" "$out"; then
        [ "$status" -ne 0 ] && tail -n 40 "$out"
        echo "=== $label: FAILED (exit=$status) ==="
        rc=1
    else
        echo "=== $label: all OK ==="
    fi
    rm -f "$out"
}

run_leg "baseline (AQE on, codegen on)" SPARK_GRAFT_CPUS=16
run_leg "AQE off" SPARK_GRAFT_AQE=0 SPARK_GRAFT_CPUS=16
run_leg "whole-stage codegen off" \
    SPARK_GRAFT_EXTRA_CONF="spark.sql.codegen.wholeStage=false" SPARK_GRAFT_CPUS=16
run_leg "3-core / 3 shuffle partitions" SPARK_GRAFT_CPUS=3
run_leg "7-row Arrow batches" \
    SPARK_GRAFT_EXTRA_CONF="spark.sql.execution.arrow.maxRecordsPerBatch=7" \
    SPARK_GRAFT_CPUS=16

exit $rc
