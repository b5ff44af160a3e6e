"""Streaming index ingest — the reference's batch-only ingest loop
re-expressed as a Structured Streaming pipeline.

The reference ingests with a sequential driver loop and explicitly no
streaming (src/bioclip_vector_db/vector_db.py:84 ``streaming=False``,
:124,153 — the loop buffers records and flushes per storage batch). Here
the same lifecycle — arrive, dedup, assign to a partition under FIXED
centroids, take the next dense faiss_id, land in the partitioned layout —
runs as ``readStream -> foreachBatch(append_to_index)``: each micro-batch
is one incremental append (operators.indexing.append_to_index, the exact
code path api.add_batch uses), so the streaming and serving ingest paths
cannot drift apart.

Scale notes: state lives entirely in the index tables (no streaming state
store); per-batch cost is the batch assignment plus one broadcast
max-faiss_id aggregate over the stored corpus; appends only touch the
partition directories the batch lands in. The per-batch anti-join dedup
scans stored vec_ids — at 100 TB that becomes a bloom-filter or
partition-pruned semi-join, which Spark's AQE already rewrites when the
id side is small.

Determinism of the gated query: the feed files split vec_id into three
ascending ranges processed in mtime order, so each partition's appended
rows arrive already sorted by vec_id and the final id_mapping is
byte-identical to the one-shot batch build — the ``id_mapping_build``
oracle applies verbatim.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.indexing import ASSIGNED_CTE, append_to_index
from ..operators.knn import fixture_centroids
from ..plans.registry import register


def _stage_embedding_feed(sf_dir: str, n_files: int = 3) -> str:
    """Split the embeddings fixture into ``n_files`` ascending-vec_id
    files (arrival order = id order, so per-partition faiss_id sequences
    match the one-shot build)."""
    from .staging import staged_feed

    def splits(tbl):
        import pyarrow.compute as pc

        hi = pc.max(tbl["vec_id"]).as_py() + 1
        step = max(1, hi // n_files)
        for i in range(n_files):
            lo_i = i * step
            hi_i = (i + 1) * step if i < n_files - 1 else hi
            yield f"f{i}", tbl.filter(
                pc.and_(
                    pc.greater_equal(tbl["vec_id"], lo_i),
                    pc.less(tbl["vec_id"], hi_i),
                )
            )

    return staged_feed(
        os.path.join(sf_dir, "embeddings.parquet"), "bvds_ingest_feed", splits
    )


def stream_ingest(
    spark: SparkSession, feed_dir: str, index_dir: str, centroids: DataFrame
) -> None:
    """Run the streaming ingest to completion (availableNow): one
    incremental index append per micro-batch."""

    def _append(batch: DataFrame, _batch_id: int) -> None:
        append_to_index(spark, index_dir, batch, centroids)

    # Infer the stream schema from the staged files themselves (footer
    # read) rather than hardcoding one — the regenerated fixtures have
    # changed physical types across rounds and the staged feed carries
    # whatever the source carries. One pyarrow footer read, no Spark job
    # (the batch-read inference pass cost a scheduler round-trip per cold
    # ingest); the Spark reader stays the fallback for any arrow->Spark
    # type gap.
    import glob

    try:
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        first = sorted(glob.glob(os.path.join(feed_dir, "*.parquet")))[0]
        schema = from_arrow_schema(pq.read_schema(first))
    except Exception:
        schema = (
            spark.read.option("pathGlobFilter", "*.parquet").parquet(feed_dir).schema
        )
    q = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(feed_dir)
        .writeStream.foreachBatch(_append)
        .option("checkpointLocation", f"{index_dir}/_ingest_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _index_consistent(spark: SparkSession, index_dir: str) -> bool:
    """True when the durable index dir's two tables agree: every corpus
    row has its id_mapping row (append_to_index writes them in that order
    non-atomically, so a crash between the writes shows up as
    corpus > id_mapping here). Empty/unreadable dirs are inconsistent."""
    try:
        n_corpus = spark.read.parquet(f"{index_dir}/corpus").count()
        n_mapping = spark.read.parquet(f"{index_dir}/id_mapping").count()
    except Exception:
        return False
    return n_corpus == n_mapping and n_corpus > 0


@register(
    "streaming_index_ingest",
    oracle=f"""
WITH {ASSIGNED_CTE.strip()}
SELECT partition_id, faiss_id, original_id, metadata FROM id_mapping
""",
)
def q_streaming_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7+O3/O6 [Q]: ingest the corpus as a 3-micro-batch stream of
    incremental appends under fixed centroids, then return the resulting
    id_mapping — byte-identical to the one-shot batch build's
    (same oracle as ``id_mapping_build``).

    The index dir is durable per (source, logic) fingerprint: a
    re-invocation is a streaming RESTART against the existing checkpoint —
    no unprocessed files, so availableNow terminates without re-appending,
    and the already-landed id_mapping is returned. A replayed uncommitted
    batch is absorbed by append_to_index's vec_id anti-join, so the sink
    is EFFECTIVELY-once at the corpus granularity — but append_to_index
    lands corpus and id_mapping as separate (concurrent) non-atomic
    writes, and a crash with only one landed leaves rows whose replay the
    anti-join removes before the other table's write, permanently
    desyncing the tables. The gate therefore VALIDATES a reused dir
    (corpus and id_mapping row counts must agree, either direction of
    mismatch fails) and rebuilds from scratch — crash recovery is
    rebuild, not repair.
    """
    from .staging import durable_stream_gate, fixture_stream_conf

    feed = _stage_embedding_feed(sf_dir)
    cent = fixture_centroids(spark, sf_dir)
    with durable_stream_gate(
        "bvds_stream_ingest",
        os.path.join(sf_dir, "embeddings.parquet"),
        logic=(stream_ingest, append_to_index),
        validate=lambda d: _index_consistent(spark, d),
    ) as (index_dir, _fresh):
        # Per-batch shuffles (anti-join, faiss-id window) move k*batch-sized
        # data; 32-way exchanges pay pure scheduling latency here (same
        # sizing note as the other streaming gates — a cluster keeps the
        # default).
        with fixture_stream_conf(spark):
            stream_ingest(spark, feed, index_dir, cent)
        return spark.read.parquet(f"{index_dir}/id_mapping").select(
            "partition_id", "faiss_id", "original_id", "metadata"
        )
