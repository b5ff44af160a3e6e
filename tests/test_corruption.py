"""Corrupt-Parquet failure-mode gate (r9 verdict item 5).

JSONL/CSV scans isolate bad input per-line (PERMISSIVE `_corrupt`
column, gated in test_round7_ops/test_webdataset); Parquet — the index's
own storage format — was the one format whose bit-rot behavior was
unpinned. This gate plants the two realistic corruptions in a built
index and pins the contract:

- a TRUNCATED part file (torn write / partial copy: the footer is gone)
  fails ANY read of the file, even footer-only counts — loudly;
- a BIT-FLIPPED data page (disk rot: footer intact) fails every read
  that touches the data pages — loudly. Footer-only accesses (count())
  may legitimately succeed, which is WHY the serving path's failure
  mode matters: queries that decode rows raise; none return wrong rows.

Recovery contract (documented here, the operator docstrings point at
it): a corrupt part file is not repairable in place — either rebuild
the index from source (build_index / append_to_index re-run), or drop
the affected partition directory and re-ingest just its rows; the
partition-pruned layout means either path touches only the damaged
partition. `spark.sql.files.ignoreCorruptFiles` stays false (session.py
default): silently skipping a corrupt index file would serve silently
WRONG nearest neighbors, strictly worse than failing.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from bioclip_vector_db_spark.operators import indexing
from bioclip_vector_db_spark.operators.knn import fixture_centroids
from bioclip_vector_db_spark.sources.catalog import load_table


def _build(spark, sf_dir, tmp_path) -> str:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    idx = str(tmp_path / "index")
    indexing.append_to_index(spark, idx, emb, fixture_centroids(spark, sf_dir))
    return idx


def _largest_part(idx: str, table: str = "corpus") -> str:
    parts = glob.glob(os.path.join(idx, table, "partition_id=*", "*.parquet"))
    assert parts
    return max(parts, key=os.path.getsize)


def _force_data_read(spark, path: str) -> float:
    """An aggregate that must decode data pages (no footer-only shortcut)."""
    return (
        spark.read.parquet(path)
        .select(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x).alias("s"))
        .agg(F.sum("s"))
        .collect()[0][0]
    )


def test_truncated_part_file_fails_loud(spark, sf_dir, tmp_path):
    idx = _build(spark, sf_dir, tmp_path)
    victim = _largest_part(idx)
    size = os.path.getsize(victim)
    with open(victim, "r+b") as fh:
        fh.truncate(size // 2)
    # Footer is gone: even a footer-only count must raise, as must any
    # data read — never an empty/short result.
    with pytest.raises(Exception, match="[Pp]arquet|[Cc]orrupt|footer|magic"):
        spark.read.parquet(f"{idx}/corpus").count()
    with pytest.raises(Exception, match="[Pp]arquet|[Cc]orrupt|footer|magic"):
        _force_data_read(spark, f"{idx}/corpus")


def test_bitflipped_part_file_fails_loud_on_data_read(spark, sf_dir, tmp_path):
    idx = _build(spark, sf_dir, tmp_path)
    victim = _largest_part(idx)
    size = os.path.getsize(victim)
    # Stomp 256 bytes in the middle of the data pages, keeping the
    # footer (last KBs) intact — classic silent disk rot.
    with open(victim, "r+b") as fh:
        fh.seek(max(16, size // 3))
        fh.write(b"\xff" * 256)
    with pytest.raises(Exception):
        _force_data_read(spark, f"{idx}/corpus")


def test_corrupt_partition_recovers_by_rebuild(spark, sf_dir, tmp_path):
    """The documented recovery: rebuild touching only the damaged
    partition — drop its directory, re-append its rows from source; the
    result equals a from-scratch index (untouched partitions were never
    read, let alone rewritten)."""
    import shutil

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    cent = fixture_centroids(spark, sf_dir)
    idx = _build(spark, sf_dir, tmp_path)
    victim = _largest_part(idx)
    part_dir = os.path.dirname(victim)
    pid = int(os.path.basename(part_dir).split("=")[1])
    with open(victim, "r+b") as fh:
        fh.truncate(os.path.getsize(victim) // 2)

    # Drop the damaged partition in BOTH tables, then re-ingest exactly
    # its rows (membership recomputed from the immutable centroids).
    for table in ("corpus", "id_mapping"):
        shutil.rmtree(os.path.join(idx, table, f"partition_id={pid}"))
    # Manual surgery on the index dir invalidates the in-process append
    # state (next-id offsets now overshoot the emptied partition) — the
    # recovery contract: invalidate, or recover from a fresh process,
    # which re-seeds from what is actually on disk.
    indexing.invalidate_append_state(idx)
    from bioclip_vector_db_spark.operators.knn import assign_partitions

    damaged_rows = (
        assign_partitions(emb, cent)
        .filter(F.col("partition_id") == pid)
        .select("vec_id", "embedding", "label")
    )
    indexing.append_to_index(spark, idx, damaged_rows, cent)

    rebuilt = str(tmp_path / "rebuilt")
    indexing.append_to_index(spark, rebuilt, emb, cent)

    def rows(d):
        return sorted(
            tuple(r)
            for r in spark.read.parquet(f"{d}/corpus")
            .select("partition_id", "faiss_id", "vec_id")
            .collect()
        )

    assert rows(idx) == rows(rebuilt)
