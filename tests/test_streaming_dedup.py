"""X7/O12: streaming deduplication — dropDuplicatesWithinWatermark as the
streaming analog of the reference's existence-check upsert guard
(vector_db.py:124-132): a re-delivered event id within the watermark
horizon is ignored, with bounded state."""

from __future__ import annotations

import time

import pandas as pd

from bioclip_vector_db_spark.streaming import events as ev


def _write_batch(path, rows):
    ns = 10**9
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [int(r[1] * ns) for r in rows],
            "user_id": [1] * len(rows),
            "event_type": ["click"] * len(rows),
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(path)


def test_streaming_dedup_drops_redelivery(spark, tmp_path):
    base = 1_700_000_000
    d = tmp_path / "stream"
    d.mkdir()
    # Batch 1: events 1,2. Batch 2 redelivers event 2 (same id, same ts —
    # an at-least-once source retry) plus a new event 3.
    _write_batch(d / "b1.parquet", [(1, base + 1), (2, base + 2)])
    time.sleep(1.05)
    _write_batch(d / "b2.parquet", [(2, base + 2), (3, base + 600)])

    stream = ev.read_events_stream(
        spark, str(d), pathGlobFilter="*.parquet", maxFilesPerTrigger="1"
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ids = sorted(r.event_id for r in spark.table("dedup_stream_sink").collect())
    assert ids == [1, 2, 3]
