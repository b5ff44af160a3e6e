"""End-to-end ingest (SURVEY.md §3.1 entry point 1): tar shards -> parse ->
embed -> dedup -> build -> search, through the real operator composition."""

from __future__ import annotations

import io
import tarfile

from pyspark.sql import functions as F

from bioclip_vector_db_spark import pipeline
from bioclip_vector_db_spark.operators import knn


def _caption(i: int) -> bytes:
    return (
        f"a photo of kingdom Animalia phylum Arthropoda class Insecta order "
        f"Lepidoptera family Fam{i % 3} genus Gen{i} species sp{i} "
        f"with common name common {i}."
    ).encode()


def _make_shards(d, n_samples=24, per_shard=8):
    for s in range(0, n_samples, per_shard):
        with tarfile.open(d / f"shard-{s:04d}.tar", "w") as tf:
            for i in range(s, min(s + per_shard, n_samples)):
                for member, payload in (
                    (f"sample{i:05d}.jpg", bytes([i % 251]) * 32),
                    (f"sample{i:05d}.taxontag_com.txt", _caption(i)),
                ):
                    info = tarfile.TarInfo(name=member)
                    info.size = len(payload)
                    tf.addfile(info, io.BytesIO(payload))


def test_ingest_builds_searchable_index(spark, tmp_path):
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    _make_shards(shard_dir)
    out = str(tmp_path / "index")

    built = pipeline.ingest_webdataset(spark, str(shard_dir), out, k=3)
    corpus = spark.read.parquet(f"{out}/corpus")
    centroids = spark.read.parquet(f"{out}/centroids")

    assert built["metrics"]["n_records"] == 24
    assert corpus.count() == 24
    # Parsed taxon metadata rides with the indexed vectors (O8 output).
    row = corpus.filter(F.col("key") == "sample00005").collect()[0]
    assert row.genus == "Gen5" and row.species == "sp5" and row.kingdom == "Animalia"

    # Search the built index: each sample's embedding must find itself.
    queries = corpus.filter(F.col("key").isin("sample00000", "sample00011")).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    hits = knn.ivf_search(queries, corpus, centroids, nprobe=3, top_n=5, global_limit=5)
    top1 = {r.query_id: r.neighbor_id for r in hits.filter(F.col("rank") == 1).collect()}
    assert all(q == n for q, n in top1.items())


def test_ingest_resume_skips_existing(spark, tmp_path):
    """O12 resume path: keys already in the corpus are dropped before the
    embed UDF (idempotent re-ingest)."""
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    _make_shards(shard_dir, n_samples=12)
    existing = spark.createDataFrame(
        [(f"sample{i:05d}",) for i in range(6)], "key string"
    )
    built = pipeline.ingest_webdataset(
        spark, str(shard_dir), str(tmp_path / "idx"), existing_ids=existing, k=2
    )
    assert built["metrics"]["n_records"] == 6
    keys = {r.key for r in built["corpus"].select("key").collect()}
    assert keys == {f"sample{i:05d}" for i in range(6, 12)}
