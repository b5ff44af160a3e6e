"""Round-7 additions: radius search, triangle counting, anomaly z-score,
compaction planning — planted-structure unit tests beyond the oracle gates."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bioclip_vector_db_spark.operators.dedup import triangle_counts
from bioclip_vector_db_spark.operators.knn import (
    RADIUS_SEARCH_R,
    assigned_corpus,
    fixture_centroids,
    _fixture_queries,
    radius_search,
)
from bioclip_vector_db_spark.operators.relational import compaction_plan
from bioclip_vector_db_spark.functions.vector import cosine_distance


def test_radius_search_equals_brute_force(spark, sf_dir):
    """The pruning bound must be invisible in the result: radius search
    == brute-force distance filter, at a radius other than the gated one
    (tighter radius => more pruning opportunity => stronger check)."""
    queries = _fixture_queries(spark, sf_dir)
    corpus = assigned_corpus(spark, sf_dir).select("vec_id", "embedding", "partition_id")
    cents = fixture_centroids(spark, sf_dir)
    for radius in (0.3, 0.65, RADIUS_SEARCH_R):
        got = {
            (r.query_id, r.neighbor_id)
            for r in radius_search(queries, corpus, cents, radius).collect()
        }
        brute = {
            (r.query_id, r.neighbor_id)
            for r in queries.crossJoin(
                corpus.select(F.col("vec_id").alias("neighbor_id"), "embedding")
            )
            .withColumn("d", cosine_distance(F.col("qv"), F.col("embedding")))
            .filter(F.col("d") <= radius)
            .collect()
        }
        assert got == brute, f"radius {radius}: pruning dropped qualifying rows"


def test_triangle_counts_k4(spark):
    """K4 has 4 triangles; every node sits in exactly 3 of them."""
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)], "a_id long, b_id long"
    )
    got = {r.vec_id: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_skewed_hub(spark):
    """A star (hub + 6 leaves, no leaf-leaf edges) has zero triangles —
    and one closing edge creates exactly one. Exercises the hub-heavy
    degree distribution the orientation exists for."""
    star = [(0, i) for i in range(1, 7)]
    edges = spark.createDataFrame(star, "a_id long, b_id long")
    assert triangle_counts(edges).count() == 0
    closed = spark.createDataFrame(star + [(1, 2)], "a_id long, b_id long")
    got = {r.vec_id: r.n_triangles for r in triangle_counts(closed).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_triangle_counts_canonicalizes_messy_input(spark):
    """Symmetrized, duplicated, and self-loop edges must not inflate
    counts: triangle_counts canonicalizes to a distinct a<b edge set
    internally (ADVICE r7 — previously an unenforced contract)."""
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    messy = k4 + [(b, a) for a, b in k4] + k4 + [(2, 2)]
    edges = spark.createDataFrame(messy, "a_id long, b_id long")
    got = {r.vec_id: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_assume_canonical_identical(spark):
    """assume_canonical=True must equal the defensive default on an
    already-canonical (distinct, a<b, no self-loop) edge set, while its
    plan skips the canonicalize aggregation entirely (the r16 exchange
    trim for callers like the LSH threshold joins)."""
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(k4 + [(0, 5), (4, 5)], "a_id long, b_id long")
    default = {
        (r.vec_id, r.n_triangles) for r in triangle_counts(edges).collect()
    }
    fast = triangle_counts(edges, assume_canonical=True)
    assert {(r.vec_id, r.n_triangles) for r in fast.collect()} == default


def test_compaction_plan_matches_naive_cumsum(spark):
    """Block-decomposed prefix sum == naive cumulative bin assignment,
    including an oversized file occupying its own bin."""
    sizes = [100, 900, 5000, 100, 100, 700, 100, 2500, 50]
    manifest = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "file_id long, size_chars long"
    )
    got = {
        r.file_id: r.bin_id
        for r in compaction_plan(manifest, target=1000, block_width=3).collect()
    }
    cum = 0
    want = {}
    for i, s in enumerate(sizes):
        want[i] = cum // 1000
        cum += s
    assert got == want
    # the 5000-char file crosses several bin boundaries; its successor
    # starts from the cumulative total, not from bin+1
    assert want[2] == 1 and want[3] == 6


def test_anomaly_zscore_flags_planted_burst(spark, sf_dir):
    """A synthetic user with flat activity plus one 10x day flags exactly
    that day with a positive z-score."""
    from bioclip_vector_db_spark.plans.registry import QUERIES
    import datetime

    rows = []
    eid = 0
    for day in range(1, 11):
        n = 50 if day == 5 else 2
        for k in range(n):
            rows.append(
                (eid, datetime.datetime(2024, 1, day, 1, 0, k), 999, "view", 1.0, "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    stats = daily.select(
        "user_id",
        "day",
        "n_events",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("n_events").over(w).alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("ss"),
    )
    dev = F.col("n") * F.col("n_events") - F.col("s")
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    flagged = stats.filter((dev > 0) & (dev * dev > 4 * var_n2)).collect()
    assert len(flagged) == 1
    assert flagged[0].day.day == 5


# ---------------------------------------------------------------------------
# Property tests (small example budget — each example runs a Spark job)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@given(
    st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(lambda e: e[0] != e[1]),
        min_size=0,
        max_size=30,
    )
)
@settings(max_examples=6, deadline=None)
def test_triangle_counts_match_naive(spark, raw_edges):
    """Degree-ordered triangle counting == naive per-node enumeration on
    arbitrary small graphs (duplicates and both orientations in the
    input collapse to one undirected edge set first, as the operator's
    contract requires distinct a<b pairs)."""
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw_edges})
    nodes = sorted({n for e in edges for n in e})
    eset = set(edges)
    want = {}
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            for w in nodes[nodes.index(v) + 1:]:
                if (u, v) in eset and (v, w) in eset and (u, w) in eset:
                    for n in (u, v, w):
                        want[n] = want.get(n, 0) + 1
    if not edges:
        return
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {r.vec_id: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == want


@given(st.lists(st.integers(1, 5000), min_size=1, max_size=40), st.integers(1, 4000))
@settings(max_examples=6, deadline=None)
def test_compaction_plan_property(spark, sizes, target):
    """Two-pass prefix-sum bin assignment == naive sequential packing for
    arbitrary manifests and targets (incl. oversized files and tiny
    block widths that force many blocks)."""
    manifest = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "file_id long, size_chars long"
    )
    got = {
        r.file_id: r.bin_id
        for r in compaction_plan(manifest, target=target, block_width=3).collect()
    }
    cum = 0
    want = {}
    for i, s in enumerate(sizes):
        want[i] = cum // target
        cum += s
    assert got == want


@given(st.integers(0, 2**31 - 1), st.floats(0.05, 1.2))
@settings(max_examples=6, deadline=None)
def test_radius_search_exact_on_random_vectors(spark, seed, radius):
    """Radius search == brute force for ARBITRARY unit vectors, an
    ARBITRARY partition assignment, and arbitrary (even bad) unit
    centroids: the spread-based bound must stay conservative no matter
    how poorly the layout matches the data."""
    import numpy as np

    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(30, 8))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    cents = rng.normal(size=(3, 8))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], int(i % 3)) for i in range(30)],
        "vec_id long, embedding array<double>, partition_id int",
    )
    cent_df = spark.createDataFrame(
        [(p, [float(x) for x in cents[p]]) for p in range(3)],
        "partition_id int, centroid array<double>",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(3)],
        "query_id long, qv array<double>",
    )
    got = {
        (r.query_id, r.neighbor_id)
        for r in radius_search(queries, corpus, cent_df, float(radius)).collect()
    }
    sims = vecs[:3] @ vecs.T
    want = {
        (q, n)
        for q in range(3)
        for n in range(30)
        if round(1.0 - sims[q, n], 9) <= radius
    }
    assert got == want


def test_jsonl_corrupt_lines_isolated(spark, sf_dir):
    """The staged JSONL feed plants one malformed line per file; the scan
    must isolate exactly those into _corrupt (never fail, never leak a
    partial row into the good set)."""
    from bioclip_vector_db_spark.sources.jsonl import (
        _stage_document_jsonl,
        read_jsonl,
    )

    staged = _stage_document_jsonl(sf_dir)
    # Spark disallows plans referencing ONLY the corrupt column from a raw
    # JSON scan — project real columns alongside it (the documented form).
    rows = (
        read_jsonl(spark, staged)
        .filter(F.col("_corrupt").isNotNull())
        .select("doc_id", "text", "_corrupt")
        .collect()
    )
    assert len(rows) == 4
    # corrupt rows carry no parsed payload
    assert all(r.text is None for r in rows)


def test_cdc_merge_replay_idempotent(spark, sf_dir, tmp_path):
    """Replaying a CDC micro-batch (crash after publish, before
    checkpoint commit) must republish an IDENTICAL snapshot: merge N
    reads snapshot N-1, never its own output."""
    from bioclip_vector_db_spark.streaming.ingest import merge_cdc_snapshot
    import os

    store = str(tmp_path / "cdc")
    os.makedirs(store)
    b0 = spark.createDataFrame(
        [(1, 100, 10, 1.0), (1, 200, 11, 2.0), (2, 50, 12, 9.0)],
        "user_id long, ts long, event_id long, value double",
    )
    b1 = spark.createDataFrame(
        [(1, 150, 13, 7.0), (2, 60, 14, 3.0)],  # user 1's record is LATE
        "user_id long, ts long, event_id long, value double",
    )
    merge_cdc_snapshot(spark, store, b0, 0)
    merge_cdc_snapshot(spark, store, b1, 1)
    snap1 = sorted(
        tuple(r) for r in spark.read.parquet(f"{store}/snap_1").collect()
    )
    # user 1: late ts=150 must NOT clobber ts=200; counts accumulate
    by_user = {r[0]: r for r in snap1}
    assert by_user[1][1] == 200 and by_user[1][4] == 3
    assert by_user[2][1] == 60 and by_user[2][4] == 2
    # replay batch 1
    merge_cdc_snapshot(spark, store, b1, 1)
    snap1b = sorted(
        tuple(r) for r in spark.read.parquet(f"{store}/snap_1").collect()
    )
    assert snap1b == snap1


def test_api_radius_and_diverse_search(spark, sf_dir, tmp_path):
    """The serving facade exposes the round-7 read paths: radius search
    equals a brute-force filter over the stored corpus, and diverse
    search returns k ranked rows per query."""
    from bioclip_vector_db_spark.api import VectorSearchEngine
    from bioclip_vector_db_spark.operators.indexing import build_index
    from bioclip_vector_db_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    index_dir = str(tmp_path / "idx")
    build_index(emb, index_dir, k=4)
    eng = VectorSearchEngine(spark, index_dir)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    got = {
        (r.query_id, r.neighbor_id)
        for r in eng.search_radius(queries, 0.8).collect()
    }
    brute = {
        (q.query_id, c.vec_id)
        for q in queries.collect()
        for c in emb.select("vec_id", "embedding").collect()
        if round(1.0 - sum(a * b for a, b in zip(q.qv, c.embedding)), 9) <= 0.8
    }
    assert got == brute
    diverse = eng.search_diverse(queries, k=3, pool=10).collect()
    assert len(diverse) == 6  # 2 queries x 3 steps
