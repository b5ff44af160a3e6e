"""transformWithStateInPandas wiring (r15 verdict item 3): the Spark 4
stateful-processor form of the per-user profile operator.

This sandbox has no ``google.protobuf`` (pyspark's TWS Python client
requires it — StateMessage_pb2), so the end-to-end tests SKIP here with
that named reason and run wherever the dependency exists; the
fail-fast contract itself is asserted unconditionally. Same gating
pattern as the BioCLIP model wiring (tests/test_embedding_wiring.py)."""

from __future__ import annotations

import time

import pandas as pd
import pytest

from bioclip_vector_db_spark.streaming import events as ev
from bioclip_vector_db_spark.streaming import stateful

_REASON = stateful.transform_with_state_unavailable_reason()


def _write_batch(path, rows):
    ns = 10**9
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [int(r[1] * ns) for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": ["click"] * len(rows),
            "value": [r[3] for r in rows],
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(path)


def _staged_feed(tmp_path):
    base = 1_700_000_000
    d = tmp_path / "stream"
    d.mkdir()
    _write_batch(
        d / "b1.parquet",
        [(1, base + 1, 7, 2.0), (2, base + 2, 7, 3.0), (3, base + 3, 9, 1.0)],
    )
    time.sleep(1.05)
    _write_batch(d / "b2.parquet", [(4, base + 10, 7, 5.0)])
    return d


def test_unavailable_fails_loud_with_named_dependency():
    """Wherever the TWS client cannot run, the operator must name the
    missing dependency up front — never surface pyspark's opaque
    'driver worker exited unexpectedly' STREAM_FAILED (the measured raw
    failure mode in this sandbox)."""
    if _REASON is None:
        pytest.skip("transformWithState deps present — fail-fast unreachable")
    assert "protobuf" in _REASON
    with pytest.raises(RuntimeError, match="protobuf"):
        stateful.running_user_profiles_tws(None)  # gate fires before use


def test_processor_semantics_match_legacy_update_fn():
    """The numeric contract the two APIs share, exercised WITHOUT the
    state server: feed the processor a fake ValueState and the same
    batches the legacy update fn gets — emissions must be identical
    (same accumulation, same round-6, same timestamp unit)."""

    class FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def getValueState(self, name, schema, ttlDurationMs=None):
            assert ttlDurationMs is None
            return FakeState()

    proc = stateful.UserProfileProcessor()
    proc.init(FakeHandle())

    class FakeGroupState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    legacy_state = FakeGroupState()

    def batch(rows):
        return pd.DataFrame(
            {
                "value": [v for _, v in rows],
                "ts": pd.to_datetime([t for t, _ in rows], unit="s"),
            }
        )

    b1 = batch([(1_700_000_001, 2.0), (1_700_000_002, 3.0)])
    b2 = batch([(1_700_000_010, 5.0)])
    for b in (b1, b2):
        tws_out = list(proc.handleInputRows((7,), iter([b]), None))
        legacy_out = list(
            stateful._update_user_profile((7,), iter([b]), legacy_state)
        )
        assert len(tws_out) == len(legacy_out) == 1
        pd.testing.assert_frame_equal(tws_out[0], legacy_out[0])


@pytest.mark.skipif(_REASON is not None, reason=_REASON or "")
def test_tws_accumulates_across_batches_and_matches_legacy(spark, tmp_path):
    """End-to-end on the staged 2-batch feed (runs where protobuf
    exists): per-batch emissions must accumulate exactly like the legacy
    operator's, under the RocksDB provider."""
    d = _staged_feed(tmp_path)
    stream = ev.read_events_stream(
        spark, str(d), pathGlobFilter="*.parquet", maxFilesPerTrigger="1"
    )
    with stateful.rocksdb_state_conf(spark):
        q = (
            stateful.running_user_profiles_tws(stream)
            .writeStream.format("memory")
            .queryName("tws_sink")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    rows = spark.table("tws_sink").collect()
    user7 = sorted((r.n_events, r.total_value) for r in rows if r.user_id == 7)
    assert user7 == [(2, 5.0), (3, 10.0)]
    user9 = [(r.n_events, r.total_value) for r in rows if r.user_id == 9]
    assert user9 == [(1, 1.0)]


@pytest.mark.skipif(_REASON is not None, reason=_REASON or "")
def test_tws_restart_resumes_from_checkpoint(spark, tmp_path):
    """Replay/restart (the streaming_cdc_upsert pattern): stop after
    batch 1, restart over the same checkpoint with batch 2 present —
    the resumed query must carry state forward, not recount."""
    base = 1_700_000_000
    d = tmp_path / "stream"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _write_batch(d / "b1.parquet", [(1, base + 1, 7, 2.0)])

    def run():
        stream = ev.read_events_stream(
            spark, str(d), pathGlobFilter="*.parquet", maxFilesPerTrigger="1"
        )
        with stateful.rocksdb_state_conf(spark):
            q = (
                stateful.running_user_profiles_tws(stream)
                .writeStream.format("memory")
                .queryName("tws_restart_sink")
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return spark.table("tws_restart_sink").collect()

    first = run()
    assert [(r.n_events, r.total_value) for r in first if r.user_id == 7] == [
        (1, 2.0)
    ]
    time.sleep(1.05)
    _write_batch(d / "b2.parquet", [(2, base + 10, 7, 5.0)])
    second = run()
    assert [(r.n_events, r.total_value) for r in second if r.user_id == 7] == [
        (2, 7.0)
    ]
