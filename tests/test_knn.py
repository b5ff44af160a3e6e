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


def test_mmr_rerank_diversifies_dup_heavy_pool(spark, sf_dir):
    """MMR invariants: 5 unique picks per query; step 1 is the plain
    relevance argmax; and when the pool is salted with exact copies of
    the top hit, plain top-k returns the copies back-to-back while MMR
    defers them (an exact copy of a selected item scores rel-div*1.0,
    the worst possible penalty)."""
    from bioclip_vector_db_spark.operators.knn import (
        _fixture_queries,
        knn_join,
        mmr_rerank,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = _fixture_queries(spark, sf_dir)
    corpus = emb.filter(F.col("vec_id") >= 5)
    top1 = {
        r.query_id: r.neighbor_id
        for r in knn_join(queries, corpus, k=1).collect()
    }
    # Salt the corpus with an exact copy of every query's top-1 neighbor.
    copies = (
        corpus.join(
            spark.createDataFrame(
                [(v,) for v in set(top1.values())], "vec_id bigint"
            ),
            "vec_id",
        ).select((F.col("vec_id") + 50_000).alias("vec_id"), "embedding")
    )
    salted = corpus.unionByName(copies)
    sel = mmr_rerank(queries, salted).collect()
    by_q: dict[int, list] = {}
    for r in sel:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.step)
        ids = [r.vec_id for r in rows]
        assert len(ids) == len(set(ids)) == 5, (qid, ids)
        first = rows[0].vec_id
        # Step 1 is the pure relevance argmax: the known top-1 or its
        # identical copy (tiebreak by id keeps the original).
        assert first in (top1[qid], top1[qid] + 50_000), (qid, first)
        # The identical twin of the step-1 pick cannot be step 2: its
        # penalty is maximal. (It may appear later once diversity has
        # been bought elsewhere.)
        twin = first + 50_000 if first == top1[qid] else first - 50_000
        assert rows[1].vec_id != twin, (qid, ids)


def test_mmr_rerank_single_candidate_pool_emits_step1(spark, sf_dir):
    """A query whose candidate pool contains exactly ONE vector produces
    zero similarity-pair rows; the pair join must not drop it — the
    greedy still owes its step-1 relevance argmax (ADVICE r7: reachable
    via api.search_diverse against a tiny corpus)."""
    from bioclip_vector_db_spark.operators.knn import _fixture_queries, mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = _fixture_queries(spark, sf_dir).limit(2)
    corpus = emb.filter(F.col("vec_id") == 7)  # one-vector corpus
    rows = mmr_rerank(queries, corpus, k=3).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 2, rows  # both queries present, not vanished
    for qid, rs in by_q.items():
        assert [r.step for r in rs] == [1], (qid, rs)
        assert rs[0].vec_id == 7
