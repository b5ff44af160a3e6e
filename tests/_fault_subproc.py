"""Task-retry idempotency probe (round-9 verdict item 2b), run as a
SEPARATE process by tests/test_fault_injection.py.

The shared test session runs ``local[N]`` — task failures there abort the
job, which is the wrong regime for this check. This process builds its own
``local[4,2]`` session (spark.task.maxFailures=2 in local mode) and
injects a mapInPandas stage that raises on the FIRST attempt of every
task. Every stage downstream of the injection therefore executes under
real task retry, proving:

  1. the WebDataset tar-packing sink (applyInPandas) produces
     byte-identical shard payloads under retry — failed attempts leave no
     trace because packing is a pure function of the grouped rows;
  2. the incremental index append core (append_to_index: anti-join,
     faiss-id window, two parquet writes) lands the same corpus +
     id_mapping as a fault-free run — Spark's file committer discards
     the failed attempts' files.

Prints SUBPROC-OK as the last line on success; any assertion or Spark
error fails the process (non-zero exit), which the pytest wrapper turns
into a test failure.
"""

from __future__ import annotations

import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def flaky(iterator):
    """Pass-through mapInPandas kernel that fails every task's first
    attempt — the retry then streams the batches through unchanged."""
    from pyspark import TaskContext

    if TaskContext.get().attemptNumber() == 0:
        raise RuntimeError("injected first-attempt task failure")
    for pdf in iterator:
        yield pdf


def main() -> None:
    sf_dir, tmp = sys.argv[1], sys.argv[2]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4,2]")
        .appName("fault-subproc")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    from bioclip_vector_db_spark.operators.indexing import append_to_index
    from bioclip_vector_db_spark.operators.knn import fixture_centroids
    from bioclip_vector_db_spark.sources.webdataset import pack_webdataset

    # --- 1. tar-packing sink under task retry --------------------------------
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text", "lang"
    )
    flaky_docs = docs.mapInPandas(flaky, docs.schema)

    def shard_hashes(df):
        return sorted(
            (r["shard_id"], hashlib.sha256(bytes(r["payload"])).hexdigest())
            for r in pack_webdataset(df).collect()
        )

    clean = shard_hashes(docs)
    retried = shard_hashes(flaky_docs)
    assert clean == retried, f"tar payloads diverge under retry: {clean} != {retried}"
    assert len(clean) > 0
    print(f"tar shards byte-identical under retry: {len(clean)} shards")

    # --- 2. index append core under task retry -------------------------------
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding", "label"
    )
    cent = fixture_centroids(spark, sf_dir)
    flaky_emb = emb.mapInPandas(flaky, emb.schema)

    idx_retry = os.path.join(tmp, "idx_retry")
    idx_clean = os.path.join(tmp, "idx_clean")
    append_to_index(spark, idx_retry, flaky_emb, cent)
    append_to_index(spark, idx_clean, emb, cent)

    def mapping_rows(d):
        return sorted(
            tuple(r)
            for r in spark.read.parquet(f"{d}/id_mapping")
            .select("partition_id", "faiss_id", "original_id")
            .collect()
        )

    a, b = mapping_rows(idx_retry), mapping_rows(idx_clean)
    assert a == b, f"id_mapping diverges under retry ({len(a)} vs {len(b)} rows)"
    n_corpus = spark.read.parquet(f"{idx_retry}/corpus").count()
    assert n_corpus == len(a) > 0, f"corpus/id_mapping desync: {n_corpus} vs {len(a)}"
    print(f"append core retry-idempotent: {len(a)} mapping rows")

    print("SUBPROC-OK")


if __name__ == "__main__":
    main()
