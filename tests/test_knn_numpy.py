"""The BLAS kernels must be rank-identical to the Catalyst expression
kernels (same logical plan, different inner loop), and the ``auto`` kernel
switch must route large-nlist assignment/routing onto blocked GEMMs —
never a per-row interpreted fold over >LARGE_NLIST_THRESHOLD centroids."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from bioclip_vector_db_spark.operators import knn, knn_numpy
from bioclip_vector_db_spark.operators.knn_numpy import (
    LARGE_NLIST_THRESHOLD,
    knn_join_numpy,
)
from bioclip_vector_db_spark.sources.catalog import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _big_centroids(spark, k=LARGE_NLIST_THRESHOLD + 176, dim=64):
    """Deterministic synthetic leader table above the kernel threshold."""
    return spark.range(k).select(
        F.col("id").cast("int").alias("partition_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.sin(F.col("id") * (i.cast("double") + 1.0)),
        ).alias("centroid"),
    )


def test_numpy_kernel_matches_expression_kernel(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    corpus = emb.filter(F.col("vec_id") >= 8)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.distance)
        for r in knn_join_numpy(queries, corpus, k=10).collect()
    }
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.distance)
        for r in knn.knn_join(queries, corpus, k=10).collect()
    }
    assert set(got) == set(want)
    for key, (nid, d) in want.items():
        gnid, gd = got[key]
        assert gnid == nid, key
        assert abs(gd - d) < 1e-8, key


def test_assign_kernels_agree(spark, sf_dir):
    """Both assignment kernels round-9 before the argmin and tiebreak to
    the smallest pid — identical winners on the fixture centroids."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = knn.fixture_centroids(spark, sf_dir)
    want = {
        r.vec_id: r.partition_id
        for r in knn.assign_partitions(emb, cents, kernel="expr")
        .select("vec_id", "partition_id")
        .collect()
    }
    got = {
        r.vec_id: r.partition_id
        for r in knn.assign_partitions(emb, cents, kernel="numpy")
        .select("vec_id", "partition_id")
        .collect()
    }
    assert got == want and len(got) > 0


def test_route_kernels_agree_at_large_nlist(spark, sf_dir, monkeypatch):
    """Routing kernels agree above the threshold, including with a tile
    size small enough to force multi-block scoring with candidate merge."""
    monkeypatch.setattr(knn_numpy, "_TILE_ELEMS", 2048)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    big = _big_centroids(spark)
    want = {
        (r.query_id, r.probe_rank): r.partition_id
        for r in knn.route_queries(queries, big, 5, kernel="expr").collect()
    }
    got = {
        (r.query_id, r.probe_rank): r.partition_id
        for r in knn.route_queries(queries, big, 5, kernel="numpy").collect()
    }
    assert got == want and len(got) == 8 * 5


def _tied_centroids(spark, k=LARGE_NLIST_THRESHOLD + 176, dim=64, n_distinct=8):
    """Adversarial leader table above the kernel threshold with only
    ``n_distinct`` distinct vectors: every query distance ties across
    ~k/n_distinct duplicate pids, so any kernel that truncates per-block
    candidates without a stable (distance, pid) order drops the small-pid
    survivors the expression kernel keeps."""
    return spark.range(k).select(
        F.col("id").cast("int").alias("partition_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.sin(
                (F.col("id") % n_distinct).cast("double") * (i.cast("double") + 1.0)
            ),
        ).alias("centroid"),
    )


def test_route_kernels_agree_with_tied_centroids(spark, sf_dir, monkeypatch):
    """Block-boundary tie-break parity: with >t equal-distance centroids
    inside one scoring block (forced by a tiny tile), the numpy kernel
    must surface the same smallest-pid winners as the expression kernel's
    (distance, pid) window order — byte-identical routing."""
    monkeypatch.setattr(knn_numpy, "_TILE_ELEMS", 2048)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    tied = _tied_centroids(spark)
    want = {
        (r.query_id, r.probe_rank): r.partition_id
        for r in knn.route_queries(queries, tied, 5, kernel="expr").collect()
    }
    got = {
        (r.query_id, r.probe_rank): r.partition_id
        for r in knn.route_queries(queries, tied, 5, kernel="numpy").collect()
    }
    assert got == want and len(got) == 8 * 5


def test_assign_kernels_agree_with_tied_centroids(spark, sf_dir, monkeypatch):
    """Assignment tie-break parity on the same adversarial geometry: the
    flat numpy kernel must resolve every all-duplicate argmin tie exactly
    like the expr fold — to the smallest pid (expr: lexicographic (d, pid)
    fold; numpy: first-occurrence argmin over pid-ascending blocks with
    strict-improvement updates). k is above ROUTED_K_THRESHOLD here, so
    the flat kernel is pinned explicitly via routed=False (the facade's
    kernel='numpy' would auto-route at this k — r11); the ROUTED kernel
    gets the weaker contract it can honor on all-duplicate geometry:
    the same argmin DISTANCE CLASS (every winner is some twin of the expr
    winner), since the globally-smallest twin may live outside the probed
    groups."""
    monkeypatch.setattr(knn_numpy, "_TILE_ELEMS", 2048)
    emb = load_table(spark, sf_dir, "embeddings").limit(64)
    tied = _tied_centroids(spark)
    want = {
        r.vec_id: r.partition_id
        for r in knn.assign_partitions(emb, tied, kernel="expr")
        .select("vec_id", "partition_id")
        .collect()
    }
    got = {
        r.vec_id: r.partition_id
        for r in knn_numpy.assign_partitions_numpy(emb, tied, routed=False)
        .select("vec_id", "partition_id")
        .collect()
    }
    assert got == want and len(got) == 64
    # Ties must land on the first duplicate block: every winner < n_distinct.
    assert all(pid < 8 for pid in got.values())
    # Routed kernel on the same geometry: winner may be any twin (pid
    # congruent mod n_distinct == same distance class), never a
    # different class.
    routed = {
        r.vec_id: r.partition_id
        for r in knn_numpy.assign_partitions_numpy(emb, tied, routed=True)
        .select("vec_id", "partition_id")
        .collect()
    }
    assert set(routed) == set(want)
    assert all(routed[v] % 8 == want[v] % 8 for v in want)


def test_pq_encode_kernels_agree_with_tied_codebooks(spark, sf_dir):
    """Kernel-switchover parity for PQ encode on adversarial geometry: a
    codebook above LARGE_NLIST_THRESHOLD whose entries repeat every 8
    codes, so every subspace argmin ties across ~k/8 duplicate codes.
    Both kernels must resolve to the smallest code (expr: lexicographic
    array_min over (d, code) structs; numpy: first-occurrence argmin over
    the code-sorted book) — and 'auto' must route this size onto the
    mapInPandas GEMM encoder."""
    from bioclip_vector_db_spark.operators.quantization import PQ_M, pq_encode

    k = LARGE_NLIST_THRESHOLD + 176
    tied_books = spark.range(k).select(
        F.col("id").cast("int").alias("code"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: F.sin(
                (F.col("id") % 8).cast("double") * (i.cast("double") + 1.0)
            ),
        ).alias("mean_vec"),
    )
    emb = load_table(spark, sf_dir, "embeddings").limit(64).select("vec_id", "embedding")
    cols = ["vec_id"] + [f"pq_code_{s}" for s in range(PQ_M)]
    expr = {
        r[0]: tuple(r[1:])
        for r in pq_encode(emb, tied_books, kernel="expr").select(*cols).collect()
    }
    auto = pq_encode(emb, tied_books)  # auto -> numpy at this size
    assert "MapInArrow" in _plan(auto)  # r16: the numpy kernels run Arrow-native
    blas = {r[0]: tuple(r[1:]) for r in auto.select(*cols).collect()}
    assert blas == expr and len(blas) == 64
    # Every tie must land in the first duplicate block of the codebook.
    assert all(c < 8 for codes in blas.values() for c in codes)


def test_pick_kernel_probe_memoized(spark, sf_dir):
    """kernel='auto' must fire its LIMIT-count probe job once per distinct
    centroid table per session — not once per route/assign/search call —
    and must recognize a re-built DataFrame over the same plan as the
    same table (semantic plan hash, no job)."""
    knn._KERNEL_CACHE.clear()
    tracker = spark.sparkContext.statusTracker()
    assert knn._pick_kernel("auto", _big_centroids(spark)) == "numpy"
    n_jobs = len(tracker.getJobIdsForGroup())
    assert knn._pick_kernel("auto", _big_centroids(spark)) == "numpy"
    assert knn._pick_kernel("auto", _big_centroids(spark)) == "numpy"
    assert len(tracker.getJobIdsForGroup()) == n_jobs
    # A semantically different table is a fresh probe (exactly one more).
    assert knn._pick_kernel("auto", knn.fixture_centroids(spark, sf_dir)) == "expr"
    n_jobs2 = len(tracker.getJobIdsForGroup())
    assert n_jobs2 > n_jobs
    assert knn._pick_kernel("auto", knn.fixture_centroids(spark, sf_dir)) == "expr"
    assert len(tracker.getJobIdsForGroup()) == n_jobs2


def test_auto_assignment_uses_blas_at_large_nlist(spark, sf_dir):
    """kernel='auto' must put large-nlist assignment on the blocked-GEMM
    map stage (mapInArrow since r16) — no interpreted per-row fold, no
    broadcast-nested-loop join — while small-k assignment stays on the
    expression path."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = knn.assign_partitions(emb, _big_centroids(spark))
    plan = _plan(out)
    assert "MapInArrow" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "Window" not in plan
    assert out.count() == emb.count()
    small = knn.assign_partitions(emb, knn.fixture_centroids(spark, sf_dir))
    assert "MapInArrow" not in _plan(small)


def test_auto_routing_uses_blas_at_large_nlist(spark, sf_dir):
    """kernel='auto' routing above the threshold: one Arrow map stage,
    no window, no row expansion; exactly nprobe ranked rows per query."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = knn.route_queries(queries, _big_centroids(spark), 3)
    plan = _plan(out)
    assert "MapInArrow" in plan and "Window" not in plan
    rows = out.collect()
    assert len(rows) == 4 * 3
    assert {(r.query_id, r.probe_rank) for r in rows} == {
        (q, p) for q in range(4) for p in (1, 2, 3)
    }


def test_numpy_kernel_emits_bounded_candidates(spark, sf_dir):
    """The map stage pre-limits to k per (task, query): the shuffled
    candidate count is tasks x queries x k at most, not corpus-sized."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    n_parts = emb.rdd.getNumPartitions()
    out = knn_join_numpy(queries, emb, k=5)
    # Final output is exactly queries x k on a corpus larger than k.
    assert out.count() == 3 * 5
    assert n_parts >= 1  # sanity: plan executed over real partitions


def test_semantic_dedup_numpy_kernel_matches_expr(spark, sf_dir):
    """The blocked-GEMM assignment (dedup.semantic_dedup(kernel='numpy'))
    must reproduce the expression fold's full decision table — same
    clusters, same exemplar ranks, same keep/drop — on the fixture, where
    round-9 similarities make both kernels' winners identical. The numpy
    path is the large-k scale route (assignment compute is n x k x dim
    and k grows with the corpus), so its tail must be the SAME shared
    _semantic_dedup_decide, not a reimplementation."""
    from bioclip_vector_db_spark.operators import dedup

    emb = load_table(spark, sf_dir, "embeddings")
    expr = {
        (r.vec_id, r.cluster_id, r.rank, r.kept)
        for r in dedup.semantic_dedup(emb, kernel="expr").collect()
    }
    via_numpy = {
        (r.vec_id, r.cluster_id, r.rank, r.kept)
        for r in dedup.semantic_dedup(emb, kernel="numpy").collect()
    }
    assert expr == via_numpy
    # And the numpy plan really is the map-side kernel: no broadcast
    # centroid fold, one Arrow map stage, no n x k expansion anywhere.
    plan = dedup.semantic_dedup(emb, kernel="numpy")._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan
    assert "array_max" not in plan


def test_semantic_dedup_auto_kernel_resolves_by_k(spark, sf_dir):
    """auto = expr below the threshold (the oracle-gated regime at every
    tested SF) and numpy above — resolved numerically from k with NO
    count job when the seed-centroid rule is in effect."""
    from bioclip_vector_db_spark.operators import dedup
    from bioclip_vector_db_spark.operators.knn_numpy import LARGE_NLIST_THRESHOLD

    emb = load_table(spark, sf_dir, "embeddings")
    small = dedup.semantic_dedup(emb, k=8, kernel="auto")
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "array_max" in plan_small and "MapInArrow" not in plan_small
    big = dedup.semantic_dedup(emb, k=LARGE_NLIST_THRESHOLD + 1, kernel="auto")
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan_big and "array_max" not in plan_big


def test_semantic_dedup_empty_centroids_is_empty_out(spark, sf_dir):
    """A corpus whose vec_ids never satisfy the 0-based seed rule (e.g.
    externally assigned ids starting at 10^6) derives ZERO centroids —
    both kernels must return an EMPTY decision table (the pre-fold
    crossJoin behavior), never the whole corpus kept=true under a NULL
    cluster (the silent no-op the round-9 review caught)."""
    from bioclip_vector_db_spark.operators import dedup

    emb = load_table(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    assert dedup.semantic_dedup(emb, k=8, kernel="expr").count() == 0
    assert dedup.semantic_dedup(emb, k=8, kernel="numpy").count() == 0


def test_knn_join_numpy_query_cap_fails_loud(spark, sf_dir, monkeypatch):
    """knn_join_numpy collects the query side to the driver (the GEMM
    operand); beyond KNN_JOIN_NUMPY_MAX_QUERIES that collect must raise
    a ValueError naming the distributed alternative, not OOM the driver
    (r9 verdict item 4). The probe is limit(cap+1), so the oversized
    side is never fully materialized."""
    import pytest

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    n = queries.count()
    monkeypatch.setattr(knn_numpy, "KNN_JOIN_NUMPY_MAX_QUERIES", n - 1)
    with pytest.raises(ValueError, match="knn_join"):
        knn_join_numpy(queries, emb, k=3)
    # At exactly the cap the join still runs (the contract is a bound,
    # not an off-by-one).
    monkeypatch.setattr(knn_numpy, "KNN_JOIN_NUMPY_MAX_QUERIES", n)
    assert knn_join_numpy(queries.limit(5), emb, k=3).count() == 15
