"""Shared scaffolding for staged micro-batch file feeds and stream sinks.

The multi-batch streaming gates (late-data, dedup, index ingest) all need
the same thing: a fixture table split into N files whose arrival ORDER is
deterministic. FileStreamSource processes oldest-mtime first (with
``latestFirst=false``), so each file gets a pinned ascending mtime; the
staged directory is cached per (source path, source mtime, split version)
and rebuilt only when the fixture or the split logic changes, so bench
loops reuse one feed.

Directories are built into a process-private temp dir and published with an
atomic ``os.rename`` — a concurrent builder (pytest workers + bench) either
wins the rename or discards its copy and reuses the winner's; readers never
observe a partially written feed.
"""

from __future__ import annotations

import contextlib
import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import SparkSession

#: Shuffle-partition count used while fixture-scale streaming queries run.
#: The state-store count of a stateful streaming query is fixed to the
#: shuffle-partition count at FIRST start, and every micro-batch pays an
#: open/commit round per store — measured here, addBatch time scales almost
#: linearly with store count while the fixture keyspace (~1.5k windows /
#: 150 users / 10k ids) fits trivially in one. Two stores keep the
#: multi-store code path honest without paying 32x fixed cost per batch.
#: A cluster-sized keyspace would keep the session default.
FIXTURE_STREAM_PARTITIONS = 2


@contextlib.contextmanager
def fixture_stream_conf(
    spark: SparkSession, partitions: int = FIXTURE_STREAM_PARTITIONS
) -> Iterator[None]:
    """Temporarily size ``spark.sql.shuffle.partitions`` for a
    fixture-scale streaming query; restores the session value on exit."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _publish_atomically(build: "Callable[[str], None]", out: str, stamp: str) -> str:
    """Run ``build(tmp_dir)`` then atomically rename it to ``out``.

    The ``_STAGED`` marker (holding ``stamp``) is written INSIDE the temp
    dir before the rename, so a published dir is always complete. Losing a
    publish race is fine — the other builder produced identical content.
    """
    marker = os.path.join(out, "_STAGED")
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == stamp:
                return out
        # Stale (source or logic changed): move aside and rebuild. Renaming
        # before rmtree keeps the window where `out` is absent minimal.
        stale = f"{out}.stale.{os.getpid()}"
        try:
            os.rename(out, stale)
        except OSError:
            pass
        else:
            shutil.rmtree(stale, ignore_errors=True)
    tmp = f"{out}.build.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    build(tmp)
    with open(os.path.join(tmp, "_STAGED"), "w") as fh:
        fh.write(stamp)
    try:
        os.rename(tmp, out)
    except OSError:
        # A concurrent builder published first; use theirs.
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def staged_feed(
    src: str,
    prefix: str,
    splits: "Callable[[object], Iterable[tuple[str, object]]]",
    version: str = "1",
) -> str:
    """Materialize ``src`` (a parquet file) as an ordered file feed.

    ``splits(table)`` receives the pyarrow table and yields
    ``(file_stem, table_slice)`` in ARRIVAL order; slices are written as
    ``<stem>.parquet`` with mtimes 1000, 2000, ... Returns the feed dir.

    ``version`` is a cache-buster for the SPLIT LOGIC: bump it (or pass a
    token derived from split parameters) whenever ``splits`` changes
    meaning, so stale staged feeds are not silently reused. The split
    function's bytecode is folded in automatically as a best-effort guard.
    """
    import pyarrow.parquet as pq

    code = getattr(getattr(splits, "__code__", None), "co_code", b"")
    token = hashlib.md5(
        b"|".join([os.path.abspath(src).encode(), version.encode(), code])
    ).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"{prefix}_{token}")
    stamp = str(os.path.getmtime(src))

    def build(tmp: str) -> None:
        tbl = pq.read_table(src)
        for i, (stem, part) in enumerate(splits(tbl)):
            path = os.path.join(tmp, f"{stem}.parquet")
            pq.write_table(part, path)
            mtime = 1000 * (i + 1)
            os.utime(path, (mtime, mtime))

    return _publish_atomically(build, out, stamp)


def durable_stream_dir(prefix: str, src: str, version: str = "1") -> tuple[str, bool]:
    """A STABLE checkpoint+sink directory for a file-sink streaming gate,
    keyed on (source path, source mtime, logic version).

    Returns ``(dir, fresh)`` — ``fresh`` is True when the caller should run
    the pipeline from scratch. When the directory already exists for the
    same source fingerprint, re-running the SAME query against it is the
    production restart path: the checkpoint's offset log shows every input
    file processed, availableNow terminates after a no-data pass, and the
    sink's exactly-once commit log already holds the full output. That
    restart-idempotence is part of what the gate verifies (and it stops
    bench/pytest loops from leaking one sink tree per invocation —
    re-invocations reuse one directory instead).

    Unlike :func:`staged_feed` there is no atomic publish here — the
    STREAMING CHECKPOINT is the consistency mechanism (a crashed run's
    uncommitted files are invisible to the sink log and are reconciled on
    restart), and two concurrent starts on one checkpoint are excluded by
    Spark's own streaming query lock.
    """
    token = hashlib.md5(
        b"|".join([os.path.abspath(src).encode(), version.encode()])
    ).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"{prefix}_{token}")
    marker = os.path.join(out, "_SRC_STAMP")
    stamp = str(os.path.getmtime(src))
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == stamp:
                return out, False
        shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    with open(marker, "w") as fh:
        fh.write(stamp)
    return out, True


def ts_as_int64_ns(tbl):
    """Replace a ``ts`` timestamp column with plain INT64 nanos so staged
    files need no nanosAsLong conf on the streaming reader."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ts_ns = pc.cast(tbl["ts"], pa.int64())
    return tbl.set_column(tbl.schema.get_field_index("ts"), "ts", ts_ns), ts_ns
