"""X6/O2: multimodal (binary) columns — opaque payloads with typed metadata.

The reference's source rows carry image tensors next to caption strings
(reference: src/bioclip_vector_db/vector_db.py:74-80 WebDataset tuples of
``(__key__, jpg, taxontag_com.txt)``; T5 in SURVEY.md §1.2). In Spark the
payload is a ``BinaryType`` column plus a metadata struct — one row is one
multimodal record, and every transform is either a Catalyst expression over
the bytes (hashing, sizing) or an Arrow ``mapInPandas`` batch function
(decode / feature-extract / resize), never a driver-side loop.

The image/audio decode libraries are not in this container, so the decode
stage is a clearly-marked deterministic STUB (`decode_stub`): it derives
fake dimensions from the first payload bytes. The Spark-side plumbing —
binary schema, Arrow batch iteration, per-row error status (the reference
nulls failed decodes, vector_db.py:134-137) — is real and tested; swapping
in PIL/ffmpeg means replacing `_fake_decode` only.

O2 (WebDataset tar-shard scan) maps to ``spark.read.format("binaryFile")``,
exposed as `read_binary_dir` and exercised in tests with generated files:
each shard member becomes a (path, modTime, length, content) row, and glob
pushdown keeps partition listing parallel at 100-TB shard counts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.registry import register
from ..sources.catalog import load_table

#: Decoded-stub output schema: fake dims + per-row status.
DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("status", T.StringType()),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """O2: binary-file scan — (path, modificationTime, length, content)
    rows, one per file/shard member."""
    return spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)


def to_binary_corpus(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """X6: lift a text corpus into the multimodal layout: opaque binary
    payload + typed metadata struct in one row."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text").alias("modality"),
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.sha2(payload, 256).alias("payload_sha"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int | None, int | None, int | None, str]:
    """STUB for the real image decode (PIL/torchvision are not available in
    this container). Deterministic dims from the first two payload bytes;
    empty payloads report a decode error like the reference's null-filter
    path (vector_db.py:134-137)."""
    if payload is None or len(payload) < 2:
        return None, None, None, "decode_error"
    return payload[0] % 64 + 1, payload[1] % 64 + 1, 3, "ok"


def decode_stub(corpus: DataFrame) -> DataFrame:
    """The decode stage as Arrow ``mapInPandas``: batched columnar transfer,
    one output row per input row — the exact shape a real GPU decode/
    embed stage uses (batch size = Arrow batch, reference's --batch_size
    analog, vector_db.py:226-231)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "channels": decoded.map(lambda t: t[2]),
                    "status": decoded.map(lambda t: t[3]),
                }
            )

    return corpus.mapInPandas(decode_batches, DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# Declared queries
# ---------------------------------------------------------------------------


@register(
    "multimodal_binary_manifest",
    oracle="""
SELECT doc_id,
       'text' AS modality,
       octet_length(encode(text))::BIGINT AS n_bytes,
       sha256(text) AS payload_sha
FROM documents
WHERE doc_id % 10 = 0
""",
)
def q_multimodal_binary_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 [Q]: the multimodal manifest — binary payloads with typed
    metadata; sizes and digests computed over the bytes, proving the
    binary column round-trips exactly."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    corpus = to_binary_corpus(docs)
    return corpus.select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.payload_sha").alias("payload_sha"),
    )


@register(
    "multimodal_decode_stub",
    oracle="""
SELECT doc_id,
       CASE WHEN length(text) < 2 THEN NULL
            ELSE ascii(substr(text, 1, 1)) % 64 + 1 END AS width,
       CASE WHEN length(text) < 2 THEN NULL
            ELSE ascii(substr(text, 2, 1)) % 64 + 1 END AS height,
       CASE WHEN length(text) < 2 THEN NULL ELSE 3 END AS channels,
       CASE WHEN length(text) < 2 THEN 'decode_error' ELSE 'ok' END AS status
FROM documents
WHERE doc_id % 10 = 0
""",
)
def q_multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6/O10 [Q]: the mapInPandas decode stage over the binary corpus.
    The oracle mirrors the deterministic stub (payload bytes are the UTF-8
    text, so DuckDB reads them via ascii()); a real decoder would demote
    this to a rows-only [W] check."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return decode_stub(to_binary_corpus(docs))
