"""Cross-process durable-gate exclusion: the race the flock exists for.

Two separate driver processes invoke the durable streaming ingest gate
simultaneously. Without the gate lock they would share one checkpoint +
index dir and could double-append (duplicate foreachBatch commits,
HDFSMetadataLog write races on local FS); with it, one process runs the
pipeline fresh while the other blocks, then restarts idempotently against
the completed checkpoint. Either way both must return the exact one-shot
batch build's id_mapping.
"""

from __future__ import annotations

import os
import subprocess
import sys

_WORKER = """
import os, sys
sys.path.insert(0, {repo!r})
from bioclip_vector_db_spark.session import get_spark
from bioclip_vector_db_spark.plans.registry import QUERIES, load_all_plans

load_all_plans()
spark = get_spark("gate-race-" + sys.argv[1], cpus=4)
rows = sorted(
    map(tuple, QUERIES["streaming_index_ingest"](spark, {sf!r}).collect())
)
import json
print(json.dumps(rows[:5] + rows[-5:] + [[len(rows)]]))
"""


def test_concurrent_ingest_processes_agree(spark, sf_dir):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _WORKER.format(repo=repo, sf=sf_dir)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            cwd=repo,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]
        outs.append(out.decode().strip().splitlines()[-1])
    # Both processes saw identical, complete output...
    assert outs[0] == outs[1]
    # ...equal to the one-shot batch build in THIS session.
    import json

    from bioclip_vector_db_spark.plans.registry import QUERIES, load_all_plans

    load_all_plans()
    want = sorted(map(tuple, QUERIES["id_mapping_build"](spark, sf_dir).collect()))
    got = json.loads(outs[0])
    assert got[-1] == [len(want)]
    assert [list(r) for r in want[:5] + want[-5:]] == got[:-1]
