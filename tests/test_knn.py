"""KNN operator tests: oracle parity + semantic invariants.

Mirrors the reference's (untested) serving-path semantics from
SURVEY.md §2.4; the oracle-parity asserts replicate the driver's gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bioclip_vector_db_spark.operators import knn
from bioclip_vector_db_spark.plans.registry import load_all_plans
from bioclip_vector_db_spark.sources.catalog import load_table

load_all_plans()

def test_knn_self_is_nearest(spark, sf_dir):
    """A vector's nearest neighbor in a corpus containing itself is itself
    at distance ~0 (cosine over normalized vectors)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    top1 = knn.knn_join(queries, emb, k=1).collect()
    for r in top1:
        assert r.neighbor_id == r.query_id
        assert abs(r.distance) < 1e-6


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """With nprobe = nlist (all partitions probed) and top_n >= k, IVF search
    must equal brute force — the reference's recall=1 property within probed
    partitions (faiss_utils.py:139 flat index)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cent = knn.fixture_centroids(spark, sf_dir)
    corpus = knn.assign_partitions(emb, cent)
    nlist = cent.count()
    full = knn.ivf_search(queries, corpus, cent, nprobe=nlist, top_n=10, global_limit=10)
    brute = knn.knn_join(queries, emb, k=10)
    got = {(r.query_id, r.rank): r.neighbor_id for r in full.collect()}
    want = {(r.query_id, r.rank): r.neighbor_id for r in brute.collect()}
    assert got == want


def test_ivf_partition_pruning_limits_candidates(spark, sf_dir):
    """nprobe=1 results only contain neighbors from each query's single
    routed partition (O23 semantics)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cent = knn.fixture_centroids(spark, sf_dir)
    corpus = knn.assign_partitions(emb, cent)
    res = knn.ivf_search(queries, corpus, cent, nprobe=1, top_n=10, global_limit=100)
    parts = res.groupBy("query_id").agg(F.countDistinct("partition_id").alias("np")).collect()
    assert all(r.np == 1 for r in parts)


def test_ivf_recall_monotone_in_nprobe(spark, sf_dir):
    """Recall@10 vs brute force is non-decreasing in nprobe and reaches
    1.0 at nprobe = nlist — the accuracy/latency knob the reference exposes
    per request (neighborhood_server.py:313-317,417-421)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cent = knn.fixture_centroids(spark, sf_dir)
    corpus = knn.assigned_corpus(spark, sf_dir)
    nlist = cent.count()
    truth = {
        (r.query_id, r.neighbor_id) for r in knn.knn_join(queries, emb, k=10).collect()
    }
    recalls = []
    for nprobe in (1, 3, nlist):
        got = {
            (r.query_id, r.neighbor_id)
            for r in knn.ivf_search(
                queries, corpus, cent, nprobe=nprobe, top_n=10, global_limit=10
            ).collect()
        }
        recalls.append(len(got & truth) / len(truth))
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0


def test_centroids_are_unit_norm(spark, sf_dir):
    from bioclip_vector_db_spark.functions.vector import l2_norm

    cent = knn.fixture_centroids(spark, sf_dir)
    norms = cent.select(l2_norm(F.col("centroid")).alias("n")).collect()
    assert all(abs(r.n - 1.0) < 1e-9 for r in norms)
