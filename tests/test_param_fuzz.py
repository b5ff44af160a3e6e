"""Parameter-space differential fuzz gate (round-9 verdict item 1).

Every oracle-gated configuration in the registry is a fixed point — one
threshold, one band count, one k. The oracle GENERATORS, however, are
parameterized (`nd_ctes_sql`, `threshold_join_oracle_sql`,
`mp_threshold_join_oracle_sql`, `_ivf_oracle`, `bm25_oracle_sql`): the
SQL twin is produced from the same numbers the Spark plan runs. This
gate sweeps ~25 SEEDED random configurations per family, Spark vs the
generated DuckDB oracle, exact — so it gates the generator logic itself
(band slicing, seeded digest groups, shingle boundaries, probe masks,
routing/ranking cutoffs), which is exactly where a latent off-by-one
would hide that no fixed registered instance can expose.

Determinism: configurations are drawn once at import from
random.Random(<fixed seed>), so every run (and every pytest -k
selection) sees the identical config list; a failure names its config
in the test id and reproduces.
"""

from __future__ import annotations

import random

import pytest

from bioclip_vector_db_spark.operators import dedup, knn, text
from bioclip_vector_db_spark.plans.registry import release_transient
from bioclip_vector_db_spark.sources.catalog import load_table

from .conftest import assert_matches_oracle

N_CFGS = 25

# ---------------------------------------------------------------------------
# Seeded config draws (module scope: identical under any pytest selection)
# ---------------------------------------------------------------------------


def _draw(rng, make, n=N_CFGS):
    """n distinct configs from a fixed-seed RNG."""
    out: list[tuple] = []
    while len(out) < n:
        cfg = make(rng)
        if cfg not in out:
            out.append(cfg)
    return out


_r1 = random.Random(0x5EED1)
#: (shingle_width, n_hashes, n_bands, threshold). n_hashes up to 12
#: crosses the one-md5 boundary (SLICES_PER_DIGEST=6), exercising the
#: seeded digest-group path on BOTH sides.
MINHASH_CFGS = _draw(
    _r1,
    lambda r: (
        r.randint(2, 5),
        (k := r.choice([2, 3, 4, 6, 8, 10, 12])),
        r.choice([b for b in range(1, k + 1) if k % b == 0]),
        round(r.uniform(0.3, 0.9), 2),
    ),
)

_r2 = random.Random(0x5EED2)
#: (bands, threshold); bands must divide SIMHASH_PLANES=16.
BANDED_CFGS = _draw(
    _r2, lambda r: (r.choice([1, 2, 4, 8, 16]), round(r.uniform(0.05, 0.7), 2))
)

_r3 = random.Random(0x5EED3)
_MP_SHAPES = [
    (b, w) for b in (2, 3, 4, 6, 8, 12) for w in (3, 4, 6, 8) if b * w <= 96
]


def _mp_cfg(r) -> tuple:
    """(bands, width, probe_hamming, threshold); bands*width <= MP_PLANES=96."""
    bands, width = r.choice(_MP_SHAPES)
    return (bands, width, r.randint(0, min(3, width)), round(r.uniform(0.05, 0.7), 2))


MP_CFGS = _draw(_r3, _mp_cfg)

_r4 = random.Random(0x5EED4)


def _ivf_cfg(r) -> tuple:
    """(nprobe, top_n, global_limit, loaded_spec|None, label_in|None)."""
    loaded = None
    if r.random() < 0.5:
        toks = []
        for _ in range(r.randint(1, 3)):
            a = r.randint(0, 9)
            b = r.randint(a, 9)
            toks.append(f"{a}-{b}" if b > a else str(a))
        loaded = ",".join(toks)
    labels = None
    if r.random() < 0.4:
        labels = tuple(sorted(r.sample(range(10), r.randint(1, 4))))
    return (
        r.randint(1, 10),
        r.randint(1, 15),
        r.choice([5, 10, 25, 50, 100]),
        loaded,
        labels,
    )


IVF_CFGS = _draw(_r4, _ivf_cfg)

_r5 = random.Random(0x5EED5)
#: Vocabulary drawn from the fixture generator's actual word pool, plus
#: two absent terms (df=0 edge: the term contributes no postings row on
#: either side).
_BM25_VOCAB = [
    "scan", "column", "window", "order", "sort", "part", "agg", "value",
    "line", "key", "join", "merge", "group", "query", "vector", "hash",
    "slow", "stream", "filter", "fast", "batch", "spark", "table",
    "zzz_absent", "qqq_absent",
]
BM25_CFGS = _draw(
    _r5,
    lambda r: (
        tuple(r.sample(_BM25_VOCAB, r.randint(1, 3))),
        round(r.uniform(0.5, 2.5), 2),
        round(r.uniform(0.0, 1.0), 2),
        r.choice([3, 5, 10, 20]),
    ),
)


def _release():
    # Drop per-config persisted intermediates (shingle/signature tables):
    # 125 configs would otherwise pile dead blocks into the block manager.
    release_transient()


# ---------------------------------------------------------------------------
# Family 1: MinHash LSH near-dup pairs vs nd_ctes_sql
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("width,n_hashes,n_bands,thr", MINHASH_CFGS)
def test_fuzz_minhash_near_dup(width, n_hashes, n_bands, thr, spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = dedup.near_dup_pairs(
        docs, thr, shingle_width=width, n_hashes=n_hashes, n_bands=n_bands
    )
    oracle = (
        "WITH "
        + dedup.nd_ctes_sql(
            shingle_width=width, n_hashes=n_hashes, n_bands=n_bands, threshold=thr
        )
        + "\nSELECT a_id, b_id, jaccard FROM nd"
    )
    try:
        assert_matches_oracle(got, duck, oracle)
    finally:
        _release()


# ---------------------------------------------------------------------------
# Family 2: banded simhash threshold join vs threshold_join_oracle_sql
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bands,thr", BANDED_CFGS)
def test_fuzz_banded_threshold_join(bands, thr, spark, sf_dir, duck):
    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    got = dedup.embedding_threshold_join(vecs, thr, bands=bands)
    try:
        assert_matches_oracle(
            got, duck, dedup.threshold_join_oracle_sql(bands=bands, threshold=thr)
        )
    finally:
        _release()


# ---------------------------------------------------------------------------
# Family 3: multi-probe threshold join vs mp_threshold_join_oracle_sql
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bands,width,h,thr", MP_CFGS)
def test_fuzz_multiprobe_threshold_join(bands, width, h, thr, spark, sf_dir, duck):
    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    got = dedup.embedding_threshold_join_multiprobe(
        vecs, thr, bands=bands, width=width, probe_hamming=h
    )
    try:
        assert_matches_oracle(
            got,
            duck,
            dedup.mp_threshold_join_oracle_sql(
                bands=bands, width=width, probe_hamming=h, threshold=thr
            ),
        )
    finally:
        _release()


# ---------------------------------------------------------------------------
# Family 4: IVF scatter-gather search vs _ivf_oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("nprobe,top_n,glim,loaded,labels", IVF_CFGS)
def test_fuzz_ivf_search(nprobe, top_n, glim, loaded, labels, spark, sf_dir, duck):
    queries = knn._fixture_queries(spark, sf_dir)
    cent = knn.fixture_centroids(spark, sf_dir)
    corpus = knn.assigned_corpus(spark, sf_dir)
    if labels is not None:
        from pyspark.sql import functions as F

        corpus = corpus.filter(F.col("label").isin(*labels))
    got = knn.ivf_search(
        queries,
        corpus,
        cent,
        nprobe=nprobe,
        top_n=top_n,
        global_limit=glim,
        loaded_partitions=loaded,
    )
    oracle = knn._ivf_oracle(
        loaded, labels, nprobe=nprobe, top_n=top_n, global_limit=glim
    )
    try:
        assert_matches_oracle(got, duck, oracle)
    finally:
        _release()


# ---------------------------------------------------------------------------
# Family 5: BM25 scored retrieval vs bm25_oracle_sql
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("terms,k1,b,top_k", BM25_CFGS)
def test_fuzz_bm25(terms, k1, b, top_k, spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    got = text.bm25_search(docs, terms, top_k=top_k, k1=k1, b=b)
    try:
        assert_matches_oracle(
            got, duck, text.bm25_oracle_sql(terms, k1=k1, b=b, top_k=top_k)
        )
    finally:
        _release()


# ---------------------------------------------------------------------------
# Family 6: overlapping token chunking vs chunk_oracle_sql
# ---------------------------------------------------------------------------

_r6 = random.Random(0x5EED6)
#: (width, stride). stride may EXCEED width (gap chunking) — both engines
#: must agree on the uncovered-token case, not just the overlap case.
CHUNK_CFGS = _draw(
    _r6, lambda r: (r.randint(1, 48), r.randint(1, 48))
)


@pytest.mark.parametrize("width,stride", CHUNK_CFGS)
def test_fuzz_chunking(width, stride, spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    got = text.chunk_documents(docs, width=width, stride=stride)
    try:
        assert_matches_oracle(
            got, duck, text.chunk_oracle_sql(width=width, stride=stride)
        )
    finally:
        _release()


# ---------------------------------------------------------------------------
# Family 7: token-budget batch packing vs pack_oracle_sql
# ---------------------------------------------------------------------------

_r7 = random.Random(0x5EED7)
#: (budget, block_width). The oracle depends ONLY on budget — block_width
#: is the two-pass prefix-sum's parallelism knob, swept independently so
#: every config simultaneously fuzzes the batch-boundary arithmetic AND
#: proves block tiling is result-invariant (block_width=1 degenerates to
#: one window partition per doc; 100000 to one block per language).
PACK_CFGS = _draw(
    _r7,
    lambda r: (
        r.choice([1, 8, 33, 100, 512, 4096]),
        r.choice([1, 7, 64, 256, 1000, 100000]),
    ),
    n=20,
)


@pytest.mark.parametrize("budget,block_width", PACK_CFGS)
def test_fuzz_pack_batches(budget, block_width, spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    got = text.pack_batches(docs, budget=budget, block_width=block_width)
    try:
        assert_matches_oracle(got, duck, text.pack_oracle_sql(budget=budget))
    finally:
        _release()


# ---------------------------------------------------------------------------
# Family 8: winnowing fingerprints vs winnow_oracle_sql
# ---------------------------------------------------------------------------

_r8 = random.Random(0x5EED8)
#: (k, w, pos_base). k=1 hits the single-word-gram boundary; w=1 makes
#: every k-gram a fingerprint (the frame degenerates to the row itself);
#: pos_base=128 is tight against the fixture's 99-token max doc, so the
#: packed-key arithmetic is exercised near its overflow guard.
WINNOW_CFGS = _draw(
    _r8,
    lambda r: (
        r.randint(1, 5),
        r.randint(1, 8),
        r.choice([128, 1024, 4096, 65536]),
    ),
    n=15,
)


@pytest.mark.parametrize("k,w,pos_base", WINNOW_CFGS)
def test_fuzz_winnowing(k, w, pos_base, spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    got = text.winnowing_fingerprints(docs, k=k, w=w, pos_base=pos_base)
    try:
        assert_matches_oracle(
            got, duck, text.winnow_oracle_sql(k=k, w=w, pos_base=pos_base)
        )
    finally:
        _release()


# ---------------------------------------------------------------------------
# Family 9: MMR diversified rerank vs _mmr_oracle_sql
# ---------------------------------------------------------------------------

_r9 = random.Random(0x5EED9)
#: (k, pool, rel_weight, div_weight). div=0 degenerates to plain
#: relevance rank; div > rel pushes the greedy argmax into the penalty
#:-dominated regime where the unset-vs-zero running-max distinction
#: (psim can be negative) actually decides rows.
MMR_CFGS = _draw(
    _r9,
    lambda r: (
        r.randint(2, 5),
        r.randint(5, 25),
        r.randint(1, 3),
        r.randint(0, 4),
    ),
    n=12,
)


@pytest.mark.parametrize("k,pool,rel,div", MMR_CFGS)
def test_fuzz_mmr_rerank(k, pool, rel, div, spark, sf_dir, duck):
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    queries = knn._fixture_queries(spark, sf_dir)
    corpus = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    got = knn.mmr_rerank(
        queries, corpus, k=k, pool=pool, rel_weight=rel, div_weight=div
    )
    try:
        assert_matches_oracle(
            got, duck, knn._mmr_oracle_sql(k=k, pool=pool, rel=rel, div=div)
        )
    finally:
        _release()


# ---------------------------------------------------------------------------
# Family 10: damped PageRank iteration count vs _pagerank_oracle_sql
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("iters", [1, 2, 4, 5, 6])
def test_fuzz_pagerank_iters(iters, spark, sf_dir, duck):
    """The fixpoint loop's per-iteration round-to-9 is what keeps the
    float recursion hash-exact cross-engine; sweeping the unroll depth
    gates that convention at every depth, not just the registered 3."""
    from pyspark.sql import functions as F

    from bioclip_vector_db_spark.operators.knn import _cached

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = _cached(
        spark, sf_dir, "near_dup_pairs_08", lambda: dedup.near_dup_pairs(docs, 0.8)
    )
    got = dedup.pagerank_fixed(pairs, iters=iters).select(
        F.col("id").alias("doc_id"), "rank"
    )
    try:
        assert_matches_oracle(got, duck, dedup._pagerank_oracle_sql(iters=iters))
    finally:
        _release()


# ---------------------------------------------------------------------------
# Family 11: PQ encode + ADC search subspace layout vs pq_adc_oracle_sql
# ---------------------------------------------------------------------------

_r11 = random.Random(0x5EED11)
#: (m, sub_dim, k) with m * sub_dim <= dim(=64). Includes the degenerate
#: m=1 (one subspace = exact-quantized L2) and partial-coverage layouts
#: (m * sub_dim < 64) where both engines must ignore the identical tail.
#: The subspace slicing and the left-associated ADC term sum are exactly
#: where an off-by-one or an association mismatch would hide. m is capped
#: at 16: adc_score builds one join per subspace, and Catalyst analysis
#: over a 64-join chain takes minutes (the m=64 byte-per-dim layout is a
#: real config but not a per-commit-test one).
_PQ_SHAPES = [(1, 64), (2, 32), (4, 16), (8, 8), (16, 4), (2, 16), (3, 8), (5, 12)]
PQ_CFGS = _draw(
    _r11,
    lambda r: (*r.choice(_PQ_SHAPES), r.choice([1, 3, 5, 10, 25])),
    n=10,
)


@pytest.mark.parametrize("m,sub_dim,top_k", PQ_CFGS)
def test_fuzz_pq_adc(m, sub_dim, top_k, spark, sf_dir, duck):
    from pyspark.sql import functions as F

    from bioclip_vector_db_spark.operators import quantization as pq

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq.pq_codebooks(emb)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    encoded = pq.pq_encode(
        emb.filter(F.col("vec_id") >= 5), cb, m=m, sub_dim=sub_dim
    ).select("vec_id", *[f"pq_code_{s}" for s in range(m)])
    got = pq.pq_adc_search(queries, encoded, cb, k=top_k, m=m, sub_dim=sub_dim)
    try:
        assert_matches_oracle(
            got, duck, pq.pq_adc_oracle_sql(m=m, sub_dim=sub_dim, k=top_k)
        )
    finally:
        _release()
