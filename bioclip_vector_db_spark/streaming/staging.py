"""Shared scaffolding for staged micro-batch file feeds.

The multi-batch streaming gates (late-data, dedup, index ingest) all need
the same thing: a fixture table split into N files whose arrival ORDER is
deterministic. FileStreamSource processes oldest-mtime first (with
``latestFirst=false``), so each file gets a pinned ascending mtime; the
staged directory is cached per (source path, source mtime) and rebuilt
only when the fixture changes, so bench loops reuse one feed.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable, Iterable


def staged_feed(
    src: str,
    prefix: str,
    splits: "Callable[[object], Iterable[tuple[str, object]]]",
) -> str:
    """Materialize ``src`` (a parquet file) as an ordered file feed.

    ``splits(table)`` receives the pyarrow table and yields
    ``(file_stem, table_slice)`` in ARRIVAL order; slices are written as
    ``<stem>.parquet`` with mtimes 1000, 2000, ... Returns the feed dir.
    """
    import pyarrow.parquet as pq

    key = hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"{prefix}_{key}")
    marker = os.path.join(out, "_STAGED")
    stamp = str(os.path.getmtime(src))
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == stamp:
                return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    tbl = pq.read_table(src)
    for i, (stem, part) in enumerate(splits(tbl)):
        path = os.path.join(out, f"{stem}.parquet")
        pq.write_table(part, path)
        mtime = 1000 * (i + 1)
        os.utime(path, (mtime, mtime))
    with open(marker, "w") as fh:
        fh.write(stamp)
    return out


def ts_as_int64_ns(tbl):
    """Replace a ``ts`` timestamp column with plain INT64 nanos so staged
    files need no nanosAsLong conf on the streaming reader."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ts_ns = pc.cast(tbl["ts"], pa.int64())
    return tbl.set_column(tbl.schema.get_field_index("ts"), "ts", ts_ns), ts_ns
