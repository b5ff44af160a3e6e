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


def _stage_document_shards(sf_dir: str, n_shards: int = 4) -> str:
    """Pack the documents fixture into ``n_shards`` WebDataset tar shards
    (one member ``<key>.txt`` with the text, one ``<key>.lang.txt`` with
    the language) — deterministic content, cached per source file via the
    same publish-once staging as the streaming feeds. Driver-side tar
    writing is fixture STAGING, not the operator: the scan itself is the
    distributed binaryFile + mapInPandas path."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    from ..streaming.staging import _publish_atomically

    src = os.path.join(sf_dir, "documents.parquet")
    stamp = hashlib.md5(
        (str(os.path.getmtime(src)) + str(os.path.getsize(src)) + str(n_shards)).encode()
    ).hexdigest()
    import tempfile

    from ..streaming.staging import _reap_stale_gate_siblings

    out = os.path.join(tempfile.gettempdir(), f"bvds_wds_shards_{stamp[:12]}")
    # The stamp is part of the dir name (content-addressed), so a
    # regenerated fixture would strand the previous round's shards
    # forever — reap other-stamp siblings under the SAME non-blocking
    # per-dir flock discipline as the durable gates and bench wipe: a
    # concurrent process still scanning shards staged from an older
    # fixture holds its dir's lock and keeps its tar files; only
    # lock-free (abandoned) siblings are removed.
    _reap_stale_gate_siblings("bvds_wds_shards", keep=out)

    def build(tmp: str) -> None:
        tbl = pq.read_table(src, columns=["doc_id", "text", "lang"])
        rows = sorted(
            zip(
                tbl["doc_id"].to_pylist(),
                tbl["text"].to_pylist(),
                tbl["lang"].to_pylist(),
            )
        )
        tars = [
            tarfile.open(os.path.join(tmp, f"shard-{i}.tar"), "w")
            for i in range(n_shards)
        ]
        try:
            for doc_id, text, lang in rows:
                tf = tars[doc_id % n_shards]
                for member, payload in (
                    ("txt", text.encode()),
                    ("lang.txt", lang.encode()),
                ):
                    info = tarfile.TarInfo(name=f"doc{doc_id:08d}.{member}")
                    data = payload
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
        finally:
            for tf in tars:
                tf.close()

    return _publish_atomically(build, out, stamp)


from ..plans.registry import register  # noqa: E402
from ..sources.catalog import load_table as _load_table  # noqa: E402,F401


@register(
    "webdataset_scan_roundtrip",
    oracle="""
SELECT doc_id, text, lang, 2::BIGINT AS n_members FROM documents
""",
)
def q_webdataset_scan_roundtrip(spark, sf_dir: str) -> DataFrame:
    """O2 [Q]: the WebDataset tar-shard scan end-to-end — the documents
    corpus packed into 4 tar shards (WebDataset member conventions:
    ``<key>.txt``, ``<key>.lang.txt``), scanned back through
    binaryFile -> mapInPandas untar -> group_samples, and projected to
    rows. The oracle is the source table itself: a correct scan is a
    byte-exact round trip. Parallelism = shard count; the only shuffle
    is the per-sample member group-by."""
    shards = _stage_document_shards(sf_dir)
    samples = group_samples(read_webdataset(spark, shards))
    return samples.select(
        F.substring(F.col("key"), 4, 8).cast("bigint").alias("doc_id"),
        F.col("members")["txt"].cast("string").alias("text"),
        F.col("members")["lang.txt"].cast("string").alias("lang"),
        F.size("members").cast("bigint").alias("n_members"),
    )


# ---------------------------------------------------------------------------
# Write side: distributed WebDataset shard packing (the export sink)
# ---------------------------------------------------------------------------

#: Shard count for the export gate.
EXPORT_N_SHARDS = 8


def pack_webdataset(
    df, *, n_shards: int = EXPORT_N_SHARDS, id_col: str = "doc_id"
):
    """Pack a documents table into WebDataset tar shards DISTRIBUTEDLY:
    rows hash to a shard by id, each shard group becomes ONE deterministic
    tar blob (members sorted by key; zeroed mtime/uid/gid so the bytes are
    a pure function of the content) via applyInPandas — the export sink a
    training pipeline runs to hand a corpus to a dataloader.

    Returns ``(shard_id, payload, n_members)`` with one row per shard.
    At scale each shard group is one task producing one tar — the same
    parallelism as the dataloader that consumes it; shard size is set by
    ``n_shards`` against the corpus row count (a real export sizes shards
    to ~100MB-1GB)."""
    import pandas as pd

    from pyspark.sql import functions as F

    def _pack(pdf: pd.DataFrame):
        import io as _io
        import tarfile as _tarfile

        shard_id = int(pdf["_shard"].iloc[0])
        buf = _io.BytesIO()
        with _tarfile.open(fileobj=buf, mode="w") as tf:
            rows = sorted(
                zip(pdf["doc_id"], pdf["text"], pdf["lang"]), key=lambda r: r[0]
            )
            for doc_id, text, lang in rows:
                for member, payload in (
                    ("txt", str(text).encode()),
                    ("lang.txt", str(lang).encode()),
                ):
                    info = _tarfile.TarInfo(name=f"doc{int(doc_id):08d}.{member}")
                    data = payload
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tf.addfile(info, _io.BytesIO(data))
        return pd.DataFrame(
            {
                "shard_id": [shard_id],
                "payload": [buf.getvalue()],
                "n_members": [2 * len(pdf)],
            }
        )

    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 17, 8), 16, 10)
        .cast("bigint")
        % n_shards
    )
    return (
        df.select("doc_id", "text", "lang", shard.alias("_shard"))
        .groupBy("_shard")
        .applyInPandas(_pack, "shard_id long, payload binary, n_members long")
    )


@register(
    "webdataset_export_roundtrip",
    oracle="""
SELECT doc_id, text, lang FROM documents
""",
)
def q_webdataset_export_roundtrip(spark, sf_dir: str):
    """O2 write-side [Q]: pack the documents table into 8 deterministic
    tar shards (distributed applyInPandas, one tar per shard group), then
    scan the produced blobs back through the SAME untar path the read
    side uses — the full export->import cycle must reproduce the source
    table exactly. Gates the packing operator's byte discipline (sorted
    members, zeroed metadata) without ever trusting it: only the
    round-trip equality is asserted."""
    import pandas as pd

    from pyspark.sql import functions as F
    from ..plans.registry import transient_persist

    docs = _load_table(spark, sf_dir, "documents")
    shards = transient_persist(pack_webdataset(docs))

    def _unpack(batches):
        import io as _io
        import tarfile as _tarfile

        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                with _tarfile.open(fileobj=_io.BytesIO(bytes(payload))) as tf:
                    members = {}
                    for m in tf.getmembers():
                        key, ext = _split_key(m.name)
                        members.setdefault(key, {})[ext] = tf.extractfile(m).read()
                for key, mm in members.items():
                    out.append(
                        (
                            int(key[3:]),
                            mm["txt"].decode(),
                            mm["lang.txt"].decode(),
                        )
                    )
            yield pd.DataFrame(out, columns=["doc_id", "text", "lang"])

    return shards.select("payload").mapInPandas(
        _unpack, "doc_id long, text string, lang string"
    )
