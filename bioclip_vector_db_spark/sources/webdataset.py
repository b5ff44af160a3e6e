"""O2: WebDataset-style tar-shard source.

The reference ingests local datasets as tar shards via a WebDataset
pipeline — ``SimpleShardList -> tarfile_to_samples -> decode ->
to_tuple(__key__, jpg, taxontag_com.txt)`` (reference:
src/bioclip_vector_db/vector_db.py:74-80). The Spark restatement:

1. ``spark.read.format("binaryFile")`` lists and reads the shard files —
   distributed, one task per shard, glob pushdown on the listing;
2. an Arrow ``mapInPandas`` stage unpacks each shard with the stdlib
   ``tarfile`` module, emitting one row per member:
   ``(shard, key, member, payload)`` where ``key`` is the member path
   without its extension (the WebDataset grouping convention);
3. ``group_samples`` pivots members back into one row per sample with a
   ``member -> payload`` map — the ``to_tuple`` analog, as an aggregation.

Shards are independent units of work — exactly what a 1000-executor scan
wants: parallelism = shard count, no shuffle until (3)'s group-by-key,
and that shuffle moves each sample's few members once.
"""

from __future__ import annotations

import io
import posixpath
import tarfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("member", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _split_key(name: str) -> tuple[str, str]:
    """WebDataset convention: ``dir/abc.jpg`` -> key ``dir/abc``, member
    ``jpg``; multi-dot suffixes stay whole (``x.taxontag_com.txt`` ->
    member ``taxontag_com.txt``, matching the reference's column name)."""
    base = posixpath.basename(name)
    stem, _, ext = base.partition(".")
    key = posixpath.join(posixpath.dirname(name), stem) if posixpath.dirname(name) else stem
    return key, ext


def read_webdataset(spark: SparkSession, path: str, glob: str = "*.tar") -> DataFrame:
    """Scan tar shards into member rows ``(shard, key, member, payload)``."""
    shards = (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
        .select("path", "content")
    )

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[tuple[str, str, str], bytes] = {}
            for shard_path, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(content)) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        key, ext = _split_key(m.name)
                        # Last occurrence wins: tar permits re-appending a
                        # member (an updated file), and extraction-order
                        # semantics say the later copy supersedes it —
                        # also keeps downstream map_from_entries safe from
                        # duplicate keys.
                        rows[(shard_path, key, ext)] = tf.extractfile(m).read()
            yield pd.DataFrame(
                [(s, k, e, p) for (s, k, e), p in rows.items()],
                columns=["shard", "key", "member", "payload"],
            )

    return shards.mapInPandas(unpack, MEMBER_SCHEMA)


def group_samples(members: DataFrame) -> DataFrame:
    """Pivot member rows into one row per sample:
    ``(shard, key, members: MAP<member, payload>)`` — the ``to_tuple``
    analog; callers project the map keys they need."""
    return members.groupBy("shard", "key").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("member", "payload")))
        ).alias("members")
    )
