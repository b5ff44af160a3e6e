"""X7 streaming: watermark/late-data semantics over real micro-batch
feeds + stream/batch equivalence (per-query oracle parity lives in
test_registry_parity.py)."""

from __future__ import annotations

import time

import pandas as pd

from bioclip_vector_db_spark.plans.registry import ORACLES, QUERIES, load_all_plans
from bioclip_vector_db_spark.streaming import events as ev

from .conftest import assert_matches_oracle

load_all_plans()

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


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode windowed aggregation with a 1-hour watermark over two
    micro-batches: an event arriving in batch 2 that is older than the
    watermark established by batch 1 must NOT be counted."""
    base = 1_700_000_000 - (1_700_000_000 % 3600)  # hour-aligned epoch
    h = 3600
    d = tmp_path / "stream"
    d.mkdir()
    # Batch 1: two events in window W0 = [base, base+1h), one at +3h so the
    # watermark advances to +2h — STRICTLY past W0's end (eviction requires
    # window.end < watermark). Batch 2 exists because Spark only drops late
    # rows for windows already EVICTED from state, and eviction happens at
    # the end of the batch where the watermark passes the window: W0 is
    # evicted+emitted at the end of batch 2, so batch 3's late row hits a
    # closed window and is dropped (observable as numRowsDroppedByWatermark).
    _write_batch(d / "batch1.parquet", [(1, base + 60), (2, base + 120), (3, base + 3 * h)])
    time.sleep(1.05)  # distinct mtimes => deterministic file order
    _write_batch(d / "batch2.parquet", [(4, base + 5 * h)])
    time.sleep(1.05)
    # Batch 3: one LATE event back in W0 (behind the watermark => dropped)
    # and one fresh event.
    _write_batch(d / "batch3.parquet", [(5, base + 300), (6, base + 7 * h)])

    stream = ev.read_events_stream(
        spark, str(d), pathGlobFilter="*.parquet", maxFilesPerTrigger="1"
    )
    agg = ev.tumbling_stats(stream.withWatermark("ts", "1 hour"), "1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_drop_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = {
        int(r.window_start.timestamp()): r.n_events
        for r in spark.table("late_drop_sink").collect()
    }
    # W0 closed with exactly the 2 on-time events; the late one (id=5) is
    # gone. Had it been counted, W0 would read 3 (or appear twice).
    assert out.get(base) == 2
    late_dropped = [
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    ]
    assert sum(late_dropped) == 1


def test_stream_batch_equivalence(spark, sf_dir):
    """The streaming tumbling query settles to exactly the batch plan's
    result (one file => one micro-batch => no late data)."""
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in QUERIES["events_stream_tumbling"](spark, sf_dir).collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in QUERIES["events_tumbling_hourly"](spark, sf_dir).collect()
    }
    assert got == want


def test_late_data_drop_gated_query(spark, sf_dir, duck):
    """The gated multi-batch feed: (a) oracle-exact, (b) stable under
    re-invocation in one session (memory sink must not accumulate),
    (c) strictly smaller than the no-late-data tumbling result — i.e. the
    late file's windows and the unemittable watermark tail really are
    absent."""
    name = "events_late_data_drop"
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, ORACLES[name])
    n1 = df.count()
    n2 = QUERIES[name](spark, sf_dir).count()
    assert n1 == n2
    assert n1 < QUERIES["events_tumbling_hourly"](spark, sf_dir).count()


def test_streaming_ingest_equals_batch_build(spark, sf_dir):
    """Micro-batch incremental appends under fixed centroids must land
    byte-identical to the one-shot batch build's id_mapping."""
    got = sorted(map(tuple, QUERIES["streaming_index_ingest"](spark, sf_dir).collect()))
    want = sorted(map(tuple, QUERIES["id_mapping_build"](spark, sf_dir).collect()))
    assert got == want


def test_stream_stream_join_stable_and_bounded(spark, sf_dir):
    """The interval join gate must be re-invocable in one session (bench
    runs every query twice; the memory sink must not accumulate) and its
    join state must be watermark-bounded (the state operator reports
    removed rows or a bounded total, never the whole stream)."""
    n1 = QUERIES["events_stream_stream_join"](spark, sf_dir).count()
    n2 = QUERIES["events_stream_stream_join"](spark, sf_dir).count()
    assert n1 == n2 > 0


def test_cdc_upsert_leaves_no_tempdirs(spark, sf_dir):
    """The CDC gate mkdtemps a snapshot store + checkpoint per run; the
    result must be detached (localCheckpoint) and the store rmtree'd in
    the same invocation — repeated gate runs previously accumulated
    bvds_cdc_* directories in tmp (ADVICE r7)."""
    import glob
    import os as _os
    import tempfile

    pattern = _os.path.join(tempfile.gettempdir(), "bvds_cdc_*")
    before = set(glob.glob(pattern))
    df = QUERIES["streaming_cdc_upsert"](spark, sf_dir)
    assert df.count() > 0  # the detached snapshot is still readable
    assert set(glob.glob(pattern)) == before


def test_footer_schema_inference_matches_batch_reader(spark, sf_dir, tmp_path):
    """infer_events_schema must equal the batch reader's inference bit-for-bit
    wherever it answers (r17: replaces a ~0.11 s batch-read analysis pass per
    read_events_stream call), and must return None — routing the caller to
    the batch-reader fallback — on anything outside its verified whitelist."""
    from bioclip_vector_db_spark.sources.catalog import (
        infer_events_schema,
        set_events_confs,
    )

    set_events_confs(spark)
    # single-file fixture (the bench path)
    fast = infer_events_schema(spark, sf_dir, "events.parquet")
    slow = spark.read.option("pathGlobFilter", "events.parquet").parquet(sf_dir).schema
    assert fast == slow
    # staged multi-file feed (nanos-as-long ts, the dedup/late-data path)
    feed = ev._stage_overlap_feed(sf_dir)
    fast = infer_events_schema(spark, feed, "*.parquet")
    slow = spark.read.option("pathGlobFilter", "*.parquet").parquet(feed).schema
    assert fast == slow
    # unsupported type (decimal) -> None, never a guess
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"d": pa.array([1], type=pa.decimal128(10, 2))}),
        str(tmp_path / "x.parquet"),
    )
    assert infer_events_schema(spark, str(tmp_path), "*.parquet") is None
    # mixed-schema directory -> None (batch reader picks one footer; don't guess)
    pq.write_table(pa.table({"a": pa.array([1], type=pa.int64())}), str(tmp_path / "m1.parquet"))
    pq.write_table(pa.table({"a": pa.array(["x"])}), str(tmp_path / "m2.parquet"))
    assert infer_events_schema(spark, str(tmp_path), "m*.parquet") is None
