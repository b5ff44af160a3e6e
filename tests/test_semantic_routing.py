"""Two-tier routed centroid assignment (r10 verdict item 1).

SemDeDup's k = ceil(n/64) contract makes FLAT assignment — expr fold or
blocked GEMM alike — O(n^2 d / 64): the M=32 stress decade proved the
quadratic term dominates (SCALE_STRESS.json, 3.24s -> 10.01s for a 2x
input). knn_numpy._routed_best_centroid cuts it to O(n sqrt(k) d) by
grouping the centroid table into ~sqrt(8k) super-centroids and scoring
each vector only against its top-8 routed groups' members — the engine's
own O22 leader-routing idea applied to the centroid table itself.

The routed assignment is approximate in general, so these gates pin the
three claims the docstrings make:
- RECALL on structured inputs (centroids explain the data, SemDeDup's
  actual regime): routed winners match the flat exact argmax on planted
  clusters, >= 99% agreement, and every disagreement loses only a
  negligible amount of similarity;
- DETERMINISM: no RNG anywhere (strided k-means init), same input ->
  identical output, run to run;
- EXACT-PATH INTEGRITY: the flat kernel stays the default below
  ROUTED_K_THRESHOLD (every oracle-gated query's regime) and stays
  reachable at any k via routed=False; tie semantics (round-9 then
  smallest cid) hold across group boundaries in the routed kernel too.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from bioclip_vector_db_spark.operators.knn_numpy import (
    ROUTED_K_THRESHOLD,
    _super_centroids,
    argmax_centroid_numpy,
)


def _planted(spark, K=600, D=256, N=3000, noise=0.05, seed=0):
    """K unit centroids + N vectors each centroid-plus-noise — the
    structured regime SemDeDup actually runs in (its centroids are k-means
    means of the corpus being assigned). K > ROUTED_K_THRESHOLD so
    routed='auto' engages.

    D=256, not the 64-d test fixtures: mean-based routing reliability
    scales ~ sqrt(D / group_size) against the max of ~g noise scores, so
    64-d near-ORTHOGONAL centroid sets (no manifold structure — the worst
    case for any two-tier scheme) sit exactly at the reliability boundary
    (z ~ 2.7 vs the ~3.0 needed at g=70), while the reference's actual
    embedding space (BioCLIP ViT-B/16, 512-d) is deep inside it (z > 7).
    The gate therefore runs at a realistic dimension; the low-d
    unstructured regime is measured, not gated, by the stress instrument
    (SCALING.md adjudicates the recall trade there)."""
    assert K > ROUTED_K_THRESHOLD
    rng = np.random.RandomState(seed)
    C = rng.randn(K, D)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    owner = rng.randint(0, K, N)
    V = C[owner] + noise * rng.randn(N, D)
    cents = spark.createDataFrame(
        [(int(i), C[i].tolist()) for i in range(K)],
        "cid long, cvec array<double>",
    )
    vecs = spark.createDataFrame(
        [(int(i), V[i].tolist()) for i in range(N)],
        "vec_id long, embedding array<double>",
    )
    return cents, vecs


def _collect_assign(df):
    return {r["vec_id"]: (r["cid"], r["csim"]) for r in df.collect()}


def test_routed_assignment_recall_on_structured_data(spark):
    cents, vecs = _planted(spark)
    flat = _collect_assign(argmax_centroid_numpy(vecs, cents, routed=False))
    routed = _collect_assign(argmax_centroid_numpy(vecs, cents, routed="auto"))
    assert set(flat) == set(routed)
    n = len(flat)
    agree = sum(1 for k in flat if flat[k][0] == routed[k][0])
    assert agree / n >= 0.99, f"routing recall {agree}/{n} below gate"
    # A routing miss may land on a runner-up centroid, never a bad one:
    # the similarity loss must be negligible relative to the exact best.
    worst_loss = max(flat[k][1] - routed[k][1] for k in flat)
    assert worst_loss <= 0.02, f"routed csim degraded by {worst_loss}"
    # And on the agreeing rows the scores are IDENTICAL doubles (same
    # GEMM, same round-9) — routing changes which centroids are scored,
    # never how.
    assert all(
        flat[k][1] == routed[k][1] for k in flat if flat[k][0] == routed[k][0]
    )


def test_routed_assignment_is_deterministic(spark):
    cents, vecs = _planted(spark, K=520, N=1000)
    a = _collect_assign(argmax_centroid_numpy(vecs, cents, routed=True))
    b = _collect_assign(argmax_centroid_numpy(vecs, cents, routed=True))
    assert a == b


def test_super_centroids_partition_is_total_and_deterministic():
    rng = np.random.RandomState(7)
    C = rng.randn(700, 32)
    S1, m1 = _super_centroids(C)
    S2, m2 = _super_centroids(C)
    assert np.array_equal(S1, S2)
    assert all(np.array_equal(a, b) for a, b in zip(m1, m2))
    # Every centroid belongs to exactly one non-empty group, members
    # ascend (the smallest-cid within-group tiebreak depends on it).
    seen = np.concatenate(m1)
    assert sorted(seen.tolist()) == list(range(700))
    assert all(np.all(np.diff(m) > 0) for m in m1 if len(m) > 1)
    assert len(S1) == len(m1) and all(len(m) for m in m1)


def test_routed_cross_group_tie_breaks_to_smallest_cid(spark):
    """Duplicate centroids planted in DIFFERENT routing groups: the flat
    kernel's ascending-id blocks give the smallest-cid tie for free; the
    routed kernel must enforce it explicitly across probed groups."""
    D = 8
    base = np.eye(D)
    # Centroids 0..(2D-1): cid i and cid i+D are identical vectors, so
    # every query that lands on one ties with the other; groups are built
    # from the vectors so the twins may or may not share a group — the
    # winner must ALWAYS be the smaller cid regardless.
    rows = [(i, base[i % D].tolist()) for i in range(2 * D)]
    cents = spark.createDataFrame(rows, "cid long, cvec array<double>")
    vecs = spark.createDataFrame(
        [(int(i), base[i % D].tolist()) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    got = _collect_assign(argmax_centroid_numpy(vecs, cents, routed=True))
    for vid, (cid, csim) in got.items():
        assert cid == vid % D, f"vec {vid} tied to {cid}, not smallest twin"
        assert csim == 1.0


def test_routed_auto_threshold_and_flat_default(spark):
    """auto routes above ROUTED_K_THRESHOLD and stays flat at/below it —
    the oracle-gated regime never sees the approximate kernel."""
    cents, vecs = _planted(spark, K=ROUTED_K_THRESHOLD + 8, N=400)
    small = cents.limit(ROUTED_K_THRESHOLD)
    # Exact-regime check: auto == flat, bit-identical, at k <= threshold.
    a = _collect_assign(argmax_centroid_numpy(vecs, small, routed="auto"))
    b = _collect_assign(argmax_centroid_numpy(vecs, small, routed=False))
    assert a == b


def test_trained_centroid_drift_gate_on_real_fixture(spark, sf_dir, monkeypatch):
    """r11 verdict item 2: the >=99% recall gates run on planted
    synthetic clusters; the one real-data trained-centroid measurement
    (90% assignment agreement at k=520 over the sf0.1 64-d fixture)
    lived only as SCALING.md prose. This gate enforces the approximate
    path's contract on the third data regime — REAL fixture embeddings
    with TRAINED centroids at k > ROUTED_K_THRESHOLD — for BOTH
    approximate tiers (in-memory routed and distributed):

    Bounds are set from MEASURED values on this exact configuration
    (both tiers: drift 90/2000 = 4.5%, agreement 90.0%) — NOT from the
    0.16% adversarial-corpus figure, which this gate's first run proved
    does not transfer: at trained k=520 over n=2,000 the cells are ~3.8
    vectors deep (far off SemDeDup's n/k=64 contract depth), so a
    routing miss frequently lands a vector in a runner-up cluster with
    NO neighbor above tau — flipping kept False->True (79 of the 90
    flips are this conservative direction: extra data retained, no
    unique dropped). On the contract-depth corpora (stress M=32,
    clusters ~64 deep) the same miss still finds a dup partner and
    drift stays 0.16%. SCALING.md §2.1 adjudicates. The gates here
    bound regression, not re-derive the value:

    - keep/drop drift vs the flat exact kernel <= 6% (measured 4.5%);
    - assignment agreement >= 85% (measured 90.0%; 64-d shallow cells
      are the documented boundary regime — see _planted's docstring —
      far above the 48% adversarial floor, below the synthetic 99%).
    """
    import os

    from bioclip_vector_db_spark.operators.dedup import semantic_dedup
    from bioclip_vector_db_spark.operators.indexing import (
        train_kmeans_centroids,
    )
    from bioclip_vector_db_spark.sources.catalog import load_table

    # This gate specifically needs the 2,000-vector sf0.1 fixture
    # (k=520 > n at the sf0.001 test default); locate it beside the
    # suite's sf_dir instead of hard-coding the testdata root.
    sf01 = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.1")
    if not os.path.isdir(sf01):
        pytest.skip("sf0.1 fixture not present beside the test sf_dir")
    emb = load_table(spark, sf01, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    k = ROUTED_K_THRESHOLD + 8  # 520 > threshold on n=2,000 real vectors
    cents = (
        train_kmeans_centroids(emb, k, max_iter=8)
        .select(
            F.col("partition_id").cast("long").alias("cid"),
            F.col("centroid").alias("cvec"),
        )
        .localCheckpoint()  # pin ONE training result for all three runs
    )

    def decisions(routed):
        return {
            r.vec_id: (r.cluster_id, r.kept)
            for r in semantic_dedup(
                emb, centroids=cents, kernel="numpy", routed=routed
            ).collect()
        }

    flat = decisions(False)
    for tier in (True, "distributed"):
        approx = decisions(tier)
        assert set(flat) == set(approx)
        n = len(flat)
        drift = sum(1 for key in flat if flat[key][1] != approx[key][1])
        assert drift / n <= 0.06, (
            f"tier {tier}: keep/drop drift {drift}/{n} exceeds the 6% bound"
        )
        agree = sum(1 for key in flat if flat[key][0] == approx[key][0])
        assert agree / n >= 0.85, (
            f"tier {tier}: trained-centroid agreement {agree}/{n} below floor"
        )
        # Drift direction: the dominant flip must stay CONSERVATIVE
        # (kept where flat dropped) — a tier that started spuriously
        # DROPPING uniques would pass a symmetric drift bound while
        # silently destroying data.
        spurious_drop = sum(
            1 for key in flat if flat[key][1] and not approx[key][1]
        )
        assert spurious_drop / n <= 0.02, (
            f"tier {tier}: {spurious_drop}/{n} uniques spuriously dropped"
        )

    # r12 verdict item 3: the strided-anchor FALLBACK regime (engaged
    # past the router sample cap ~k=5e8 or the driver Lloyd budget) was
    # gated on AGREEMENT only, on planted data — gate the contract
    # quantity, end-to-end keep/drop drift, in this regime too. Bounds
    # are adjudicated from measurement on this exact fixture (the
    # 4.5%-not-1% episode's lesson: measure first). r13 verdict item 3
    # re-measured after the fallback gained its CONSTANT-budget
    # mini-batch Lloyd refine (knn_routed._build_router): at this
    # fixture's k=520 the 2e9-madd mini-budget covers the whole sample,
    # so the raw-strided regime's 17.6%/72.9%/1.7% figures collapsed to
    # drift 4.50%, agreement 90.25%, spurious 0.60% — the REFINED
    # router's own numbers (4.5%/90.0%). Bounds re-set from the new
    # measurement; the truly-uncovered regime (mini-batch << sample,
    # k >> 1e6) degrades toward the old figures by construction and is
    # documented in SCALING.md §2.1 rather than reachable at fixture
    # scale.
    from bioclip_vector_db_spark.operators import knn_routed

    monkeypatch.setattr(knn_routed, "_ROUTER_LLOYD_BUDGET", 0)
    fb = decisions("distributed")
    assert set(flat) == set(fb)
    drift = sum(1 for key in flat if flat[key][1] != fb[key][1])
    assert drift / n <= 0.06, (
        f"fallback keep/drop drift {drift}/{n} exceeds the measured-regime bound"
    )
    agree = sum(1 for key in flat if flat[key][0] == fb[key][0])
    assert agree / n >= 0.85, f"fallback agreement {agree}/{n} below floor"
    spurious_drop = sum(1 for key in flat if flat[key][1] and not fb[key][1])
    assert spurious_drop / n <= 0.02, (
        f"fallback: {spurious_drop}/{n} uniques spuriously dropped"
    )

    # r14 verdict item 5: the RAW router regime (BOTH budgets exhausted —
    # the k >> 1e8 extrapolation regime where the mini-batch refine
    # covers a negligible sample fraction) was gated only at the 0.80
    # planted-agreement floor; its real-fixture contract is pinned here
    # from measurement on THIS fixture (2026-08-16, deterministic):
    # drift 17.70% / agreement 72.50% / spurious 1.75% under the
    # calibrated-margin default (fixed probing reads 17.55%/72.90%/
    # 1.70% — the margin costs +0.15pp in this regime; raw-anchor
    # routing, not pruning, dominates the misses). Bounds set with
    # modest headroom; SCALING.md §2.1 adjudicates what this means for
    # the one extrapolated 100-TB regime.
    monkeypatch.setattr(knn_routed, "_ROUTER_FALLBACK_REFINE_MADDS", 0)
    raw = decisions("distributed")
    assert set(flat) == set(raw)
    drift_raw = sum(1 for key in flat if flat[key][1] != raw[key][1])
    assert drift_raw / n <= 0.20, (
        f"raw-router keep/drop drift {drift_raw}/{n} exceeds the measured bound"
    )
    agree_raw = sum(1 for key in flat if flat[key][0] == raw[key][0])
    assert agree_raw / n >= 0.70, (
        f"raw-router agreement {agree_raw}/{n} below the measured floor"
    )
    spurious_raw = sum(1 for key in flat if flat[key][1] and not raw[key][1])
    assert spurious_raw / n <= 0.025, (
        f"raw-router: {spurious_raw}/{n} uniques spuriously dropped"
    )


# ---------------------------------------------------------------------------
# Distributed bottom tier (r11 verdict item 1): same recall/determinism/tie
# contracts as the in-memory routed kernel, PLUS the no-O(k)-collect bound.
# ---------------------------------------------------------------------------


def test_distributed_routed_recall_on_structured_data(spark):
    """The distributed tier's recall gate, mirroring the in-memory one —
    split by probing mode since the r14-item-2 calibrated-margin default
    (the two modes have DIFFERENT miss profiles by design):

    - FIXED probing (probe_margin=None): >= 99% agreement with the exact
      flat argmax, max similarity loss on a miss <= 0.02 (the trailing
      insurance probes catch near-ties), IDENTICAL doubles on agreements.
    - CALIBRATED margin (the default): agreement still >= 99% and the
      miss RATE is bounded by ~the calibration target (0.5%, gated at
      2x), but a pruned-probe miss loses the insurance probes — on this
      fixture's near-ORTHOGONAL centroids a missed vector's runner-up
      assignment can be arbitrarily far in csim (measured mean miss loss
      0.62 — a planted-geometry artifact: real embedding manifolds keep
      runner-ups correlated), so the gated quantity is the MEAN loss
      over the corpus (measured 0.0031, gated <= 0.01) plus identical
      doubles on agreements. SemDeDup — the tier's consumer — is
      drift-gated end-to-end separately (the eval row + trained gate).
    """
    cents, vecs = _planted(spark)
    flat = _collect_assign(argmax_centroid_numpy(vecs, cents, routed=False))
    n = len(flat)

    # -- fixed probing: the strict per-miss contract --------------------
    dist = _collect_assign(
        argmax_centroid_numpy(
            vecs, cents, routed="distributed", routed_probe_margin=None
        )
    )
    assert set(flat) == set(dist)
    agree = sum(1 for k in flat if flat[k][0] == dist[k][0])
    assert agree / n >= 0.99, f"distributed routing recall {agree}/{n}"
    assert max(flat[k][1] - dist[k][1] for k in flat) <= 0.02
    assert all(
        flat[k][1] == dist[k][1] for k in flat if flat[k][0] == dist[k][0]
    )

    # -- calibrated margin (default): rate-bounded misses, mean loss ----
    auto = _collect_assign(
        argmax_centroid_numpy(vecs, cents, routed="distributed")
    )
    assert set(flat) == set(auto)
    agree_a = sum(1 for k in flat if flat[k][0] == auto[k][0])
    assert agree_a / n >= 0.99, f"calibrated-margin recall {agree_a}/{n}"
    assert (n - agree_a) / n <= 0.01, "miss rate above 2x calibration target"
    mean_loss = sum(flat[k][1] - auto[k][1] for k in flat) / n
    assert mean_loss <= 0.01, f"mean csim loss {mean_loss:.5f} above bound"
    assert all(
        flat[k][1] == auto[k][1] for k in flat if flat[k][0] == auto[k][0]
    )


def test_distributed_routed_is_deterministic_and_salt_invariant(spark):
    """Same input -> identical output, run to run (hash-strided sample,
    strided-init Lloyd, no RNG); and group_salts — the hot-group
    splitting knob for the 100-TB regime — must not change a single row
    (the per-group argbest is computed per salt and the global
    struct-merge is associative)."""
    from pyspark.sql import types as T

    from bioclip_vector_db_spark.operators.knn_routed import (
        routed_best_centroid_distributed,
    )

    cents, vecs = _planted(spark, K=520, N=800)

    def run(salts):
        return _collect_assign(
            routed_best_centroid_distributed(
                vecs,
                cents,
                id_col="cid",
                cvec_col="cvec",
                vec_col="embedding",
                similarity=True,
                out_field=T.StructField("cid", T.LongType()),
                score_field="csim",
                group_salts=salts,
            )
        )

    a, b, salted = run(1), run(1), run(3)
    assert a == b
    assert a == salted
    # A salt count larger than most groups' vector fan-in (some cogroup
    # keys see a handful of rows, many see none) must ALSO be a no-op —
    # the regime a 100-TB operator actually runs in is many salts, and
    # over-salting must never perturb the merge.
    assert a == run(16)
    # Data-sized salt counts (hundreds+ at the 100-TB point) must keep
    # the PLAN constant-size too: the member explode is sequence(), not
    # an array of one literal node per salt whose analysis cost grows
    # with n_salts (r13 review). 1024 salts would have been a
    # 1024-literal expression under the old form.
    assert a == run(1024)


def test_distributed_strided_anchor_fallback_keeps_recall(spark, monkeypatch):
    """Past the driver Lloyd budget the router falls back to strided
    sample rows as anchors (SCALING.md §2.1 boundary (a)). Force that
    branch and gate it: the pipeline must stay total/deterministic and
    keep useful recall on structured data — degraded gracefully, not
    broken. Raw strided anchors measured 85.5% on the planted corpus vs
    the refined router's >= 99%; after the fallback's constant-budget
    mini-batch Lloyd refine (r13 verdict item 3) the same forced branch
    measures 100.0% here — at planted scale (k=600) the 2e9-madd
    mini-budget covers the whole sample, so the fallback IS a two-pass
    refine. Floor re-set from that measurement with margin; the
    genuinely-uncovered regime (k >> 1e6) is documented, not reachable
    at fixture scale."""
    from bioclip_vector_db_spark.operators import knn_routed

    cents, vecs = _planted(spark)
    flat = _collect_assign(argmax_centroid_numpy(vecs, cents, routed=False))
    monkeypatch.setattr(knn_routed, "_ROUTER_LLOYD_BUDGET", 0)
    dist = _collect_assign(
        argmax_centroid_numpy(vecs, cents, routed="distributed")
    )
    assert set(flat) == set(dist)
    agree = sum(1 for k in flat if flat[k][0] == dist[k][0])
    assert agree / len(flat) >= 0.97, (
        f"strided-anchor recall {agree}/{len(flat)} below the refined-fallback floor"
    )
    # The RAW strided tier (mini-budget also exhausted — the k >> 1e6
    # regime where the subsample covers a negligible sample fraction)
    # must itself stay total and useful: the original coarse floor.
    monkeypatch.setattr(knn_routed, "_ROUTER_FALLBACK_REFINE_MADDS", 0)
    raw = _collect_assign(
        argmax_centroid_numpy(vecs, cents, routed="distributed")
    )
    assert set(flat) == set(raw)
    agree_raw = sum(1 for k in flat if flat[k][0] == raw[k][0])
    assert agree_raw / len(flat) >= 0.80, (
        f"raw strided-anchor recall {agree_raw}/{len(flat)} below the coarse floor"
    )
    # Agreements still score with identical doubles — the fallback
    # changes WHICH groups are probed, never how members are scored.
    assert all(
        flat[k][1] == dist[k][1] for k in flat if flat[k][0] == dist[k][0]
    )


def test_distributed_collects_only_a_capped_router_sample(spark, monkeypatch):
    """The tier's contract: the ONLY centroid-vector collect is the
    hash-strided router sample, bounded by _ROUTER_SAMPLE_CAP — never
    O(k). Pinned by (a) shrinking the cap far below k and asserting the
    collected sample honors it while the pipeline stays correct, and
    (b) asserting the full-table collect helper is never called."""
    from bioclip_vector_db_spark.operators import knn_numpy, knn_routed

    cents, vecs = _planted(spark, K=600, N=600)
    seen = {}
    real_sample = knn_routed._sample_router_matrix

    def spy(centroids, id_col, cvec_col, k):
        out = real_sample(centroids, id_col, cvec_col, k)
        seen["rows"] = len(out)
        return out

    def forbidden(*a, **kw):
        raise AssertionError(
            "distributed tier collected the full centroid table"
        )

    monkeypatch.setattr(knn_routed, "_ROUTER_SAMPLE_CAP", 96)
    monkeypatch.setattr(knn_routed, "_sample_router_matrix", spy)
    monkeypatch.setattr(knn_numpy, "_collect_centroids", forbidden)
    dist = _collect_assign(
        argmax_centroid_numpy(vecs, cents, routed="distributed")
    )
    assert seen["rows"] <= 96 < 600
    assert len(dist) == 600
    # A 6x-coarser router costs recall headroom, not correctness of the
    # probed-set argbest: every row still gets a real (cid, finite dot).
    assert all(
        isinstance(c, int) and math.isfinite(s) for c, s in dist.values()
    )


def test_distributed_cogroup_gemm_tiles_without_changing_results(
    spark, monkeypatch
):
    """Round-12 review finding: the cogroup argbest GEMM must tile over
    vector rows (bounded by _TILE_ELEMS like every kernel in the
    family) — untiled, |group-vectors| x |group-members| doubles is the
    allocation that OOMs a task at the design point. Shrinking the tile
    to a few rows must not change one output row (the tile size is
    captured at plan-build time precisely so this gate can reach the
    executor-side code path)."""
    from bioclip_vector_db_spark.operators import knn_numpy

    cents, vecs = _planted(spark, K=520, N=400)
    base = _collect_assign(
        argmax_centroid_numpy(vecs, cents, routed="distributed")
    )
    monkeypatch.setattr(knn_numpy, "_TILE_ELEMS", 48)  # a few rows/tile
    tiled = _collect_assign(
        argmax_centroid_numpy(vecs, cents, routed="distributed")
    )
    assert base == tiled


def test_distributed_cross_group_tie_breaks_to_smallest_cid(spark):
    """Twin centroids planted so ties can span cogroup keys: the
    smallest-cid rule must hold through the per-group argbest AND the
    global struct merge."""
    D = 8
    base = np.eye(D)
    rows = [(i, base[i % D].tolist()) for i in range(2 * D)]
    cents = spark.createDataFrame(rows, "cid long, cvec array<double>")
    vecs = spark.createDataFrame(
        [(int(i), base[i % D].tolist()) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    got = _collect_assign(
        argmax_centroid_numpy(vecs, cents, routed="distributed")
    )
    for vid, (cid, csim) in got.items():
        # Either twin's group may be the one probed; when BOTH are in the
        # probed union the winner must be the smaller cid, and the score
        # is exactly 1.0 regardless.
        assert csim == 1.0
        assert cid % D == vid % D
    # The twins are identical vectors, so their groups tie at every
    # stage; the probe set is the LIVE-group top-p which here covers all
    # groups (g <= probes) — the smaller twin must win everywhere.
    assert all(cid == vid % D for vid, (cid, _) in got.items())


@pytest.mark.parametrize(
    "seed,K,D,N,salts",
    [(21, 520, 8, 700, 1), (22, 700, 64, 900, 3), (23, 530, 256, 600, 2)],
)
def test_distributed_fuzz_internal_consistency(spark, seed, K, D, N, salts):
    """Seeded fuzz over (K, D, N, salts): agreement gates compare
    DECISIONS, but an id/score misalignment inside the cogroup gather
    (cids[out_j] vs out_v) could emit a real-looking score attached to
    the WRONG centroid and still pass decision-level stats on easy
    data. Pin internal consistency instead: every emitted row's csim
    must equal the independently recomputed round-9 dot of the CLAIMED
    centroid, every claimed cid must exist, every input vec_id must
    appear exactly once, and no probed candidate may beat the claimed
    winner by more than the documented routing-miss allowance (the
    winner must at least be the best WITHIN some probed set, which we
    can't see — but it must never lose to the claimed centroid's own
    recomputation)."""
    from pyspark.sql import types as T

    from bioclip_vector_db_spark.operators.knn_routed import (
        routed_best_centroid_distributed,
    )

    rng = np.random.RandomState(seed)
    C = rng.randn(K, D)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    V = rng.randn(N, D)
    cents = spark.createDataFrame(
        [(int(i), C[i].tolist()) for i in range(K)],
        "cid long, cvec array<double>",
    )
    vecs = spark.createDataFrame(
        [(int(i), V[i].tolist()) for i in range(N)],
        "vec_id long, embedding array<double>",
    )
    rows = routed_best_centroid_distributed(
        vecs,
        cents,
        id_col="cid",
        cvec_col="cvec",
        vec_col="embedding",
        similarity=True,
        out_field=T.StructField("cid", T.LongType()),
        score_field="csim",
        group_salts=salts,
    ).collect()
    assert sorted(r.vec_id for r in rows) == list(range(N)), "not total"
    for r in rows:
        assert 0 <= r.cid < K, f"unknown centroid {r.cid}"
        expect = float(np.round(np.dot(V[r.vec_id], C[r.cid]), 9))
        assert r.csim == expect, (
            f"vec {r.vec_id}: emitted csim {r.csim} != recomputed dot "
            f"{expect} of claimed centroid {r.cid} — id/score misaligned"
        )


def test_distributed_invariant_to_arrow_batch_shape(spark):
    """The tier has three Arrow-batched stages (centroid grouping,
    vector routing, cogroup argbest); forcing 7-row batches must not
    change one output row — batch boundaries are an execution detail,
    like the registered-query matrix leg pins for the oracle surface."""
    cents, vecs = _planted(spark, K=520, N=300)
    base = _collect_assign(
        argmax_centroid_numpy(vecs, cents, routed="distributed")
    )
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "7")
        tiny = _collect_assign(
            argmax_centroid_numpy(vecs, cents, routed="distributed")
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert base == tiny


def test_distributed_empty_inputs(spark):
    cents, vecs = _planted(spark, K=520, N=50)
    assert (
        argmax_centroid_numpy(
            vecs, cents.filter("cid < 0"), routed="distributed"
        ).count()
        == 0
    )
    assert (
        argmax_centroid_numpy(
            vecs.filter("vec_id < 0"), cents, routed="distributed"
        ).count()
        == 0
    )
    # A nonzero n_centroids HINT over an actually-empty table: the
    # router sample discovers the truth — empty-out, never a crash in
    # the router build (the hint sizes g, it is not trusted for
    # emptiness).
    assert (
        argmax_centroid_numpy(
            vecs, cents.filter("cid < 0"), routed="distributed",
            n_centroids=100,
        ).count()
        == 0
    )


def test_semantic_dedup_auto_escalates_to_distributed(spark, monkeypatch):
    """Wiring gate for the auto tier ladder: above DISTRIBUTED_K_THRESHOLD
    (unreachable at test scale, so the threshold is lowered) a
    seed-rule semantic_dedup must route through the DISTRIBUTED kernel
    — not the collect-based in-memory one — and still emit the
    exactness-downgrade warning. Pinned with a spy so a future refactor
    that silently reverts auto to the collecting tier fails here."""
    from bioclip_vector_db_spark.operators import knn_routed
    from bioclip_vector_db_spark.operators.dedup import semantic_dedup

    rng = np.random.RandomState(17)
    V = rng.randn(120, 16)
    emb = spark.createDataFrame(
        [(int(i), V[i].tolist()) for i in range(120)],
        "vec_id long, embedding array<double>",
    )
    called = {}
    real = knn_routed.routed_best_centroid_distributed

    def spy(*a, **kw):
        called["distributed"] = True
        return real(*a, **kw)

    monkeypatch.setattr(knn_routed, "DISTRIBUTED_K_THRESHOLD", 32)
    monkeypatch.setattr(knn_routed, "routed_best_centroid_distributed", spy)
    with pytest.warns(UserWarning, match="seed-rule centroids"):
        n = semantic_dedup(emb, k=40, kernel="numpy", routed="auto").count()
    assert n == 120
    assert called.get("distributed"), (
        "auto above DISTRIBUTED_K_THRESHOLD did not take the distributed tier"
    )


def test_semantic_dedup_distributed_matches_flat_on_structured_corpus(spark):
    """End-to-end SemDeDup keep/drop under the distributed tier vs the
    flat exact kernel on a structured corpus — the operator-level gate,
    mirroring the in-memory tier's, split by probing mode since the
    r14-item-2 calibrated-margin default:

    - FIXED probing (routed_probe_margin=None): keep/drop IDENTICAL (the
      insurance probes make every routing near-miss land in-cluster on
      this corpus);
    - CALIBRATED margin (the default): bounded drift — a pruned-probe
      miss strands a vector alone in a runner-up cluster, flipping its
      decision conservatively (kept). Bounds from measurement on this
      exact corpus, then margined."""
    from bioclip_vector_db_spark.operators.dedup import semantic_dedup

    rng = np.random.RandomState(3)
    K, D, per = 530, 128, 3
    C = rng.randn(K, D)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    rows = [(int(i), C[i].tolist()) for i in range(K)]
    vid = K
    for i in range(K):
        for _ in range(per - 1):
            rows.append((int(vid), (C[i] + 0.05 * rng.randn(D)).tolist()))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def decisions(**kw):
        return {
            r.vec_id: (r.cluster_id, r.kept)
            for r in semantic_dedup(emb, k=K, kernel="numpy", **kw).collect()
        }

    flat = decisions(routed=False)
    n = len(flat)

    dist_fixed = decisions(routed="distributed", routed_probe_margin=None)
    assert set(flat) == set(dist_fixed)
    assert all(flat[k][1] == dist_fixed[k][1] for k in flat), "keep/drop diverged"
    agree = sum(1 for k in flat if flat[k][0] == dist_fixed[k][0])
    assert agree / n >= 0.995

    dist_auto = decisions(routed="distributed")
    assert set(flat) == set(dist_auto)
    drift = sum(1 for k in flat if flat[k][1] != dist_auto[k][1])
    assert drift / n <= 0.02, f"calibrated-margin drift {drift}/{n}"
    spurious = sum(1 for k in flat if flat[k][1] and not dist_auto[k][1])
    assert spurious / n <= 0.01, f"spurious drops {spurious}/{n}"
    agree_a = sum(1 for k in flat if flat[k][0] == dist_auto[k][0])
    assert agree_a / n >= 0.99


def test_tiled_routing_matches_untiled_and_inversion_is_total():
    """r11 ADVICE: the routing GEMM is now tiled over super-centroid
    blocks and the top->rows inversion is one sorted pass. Pin (a) the
    tiled top-p candidate SET equals the untiled one score-wise on
    tie-free data, and (b) the inversion yields every (row, group)
    probe exactly once with ascending rows per group."""
    from bioclip_vector_db_spark.operators import knn_numpy as kn

    rng = np.random.RandomState(5)
    emb = rng.randn(64, 32)
    S = rng.randn(300, 32)
    S /= np.linalg.norm(S, axis=1, keepdims=True)
    p = 8
    untiled_scores = np.sort(
        np.take_along_axis(
            emb @ S.T,
            np.argpartition(emb @ S.T, 300 - p, axis=1)[:, 300 - p :],
            axis=1,
        ),
        axis=1,
    )
    old_tile = kn._TILE_ELEMS
    try:
        kn._TILE_ELEMS = 64 * 37  # force ~9 tiles at b=64
        top = kn._tiled_top_groups(emb, S, p)
    finally:
        kn._TILE_ELEMS = old_tile
    assert top.shape == (64, p)
    tiled_scores = np.sort(
        np.take_along_axis(emb @ S.T, top, axis=1), axis=1
    )
    assert np.array_equal(tiled_scores, untiled_scores)
    seen = set()
    for j, rows_idx in kn._invert_top_to_rows(top):
        assert np.all(np.diff(rows_idx) > 0) or len(rows_idx) == 1
        for r in rows_idx:
            seen.add((int(r), j))
    assert seen == {(r, int(gid)) for r in range(64) for gid in top[r]}


def test_semantic_dedup_warns_on_seedrule_auto_routing(spark):
    """r11 ADVICE: auto-routing over default seed-rule centroids is an
    exactness downgrade the caller must SEE — semantic_dedup emits a
    UserWarning naming the escape hatches; forcing routed=False stays
    silent (no downgrade happened)."""
    import warnings

    import pytest

    from bioclip_vector_db_spark.operators.dedup import semantic_dedup

    rng = np.random.RandomState(11)
    V = rng.randn(60, 16)
    emb = spark.createDataFrame(
        [(int(i), V[i].tolist()) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    with pytest.warns(UserWarning, match="seed-rule centroids"):
        semantic_dedup(
            emb, k=ROUTED_K_THRESHOLD + 8, kernel="numpy", routed="auto"
        ).count()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        semantic_dedup(
            emb, k=ROUTED_K_THRESHOLD + 8, kernel="numpy", routed=False
        ).count()


def test_routed_empty_centroids_empty_out(spark):
    cents, vecs = _planted(spark, K=520, N=50)
    empty = cents.filter("cid < 0")
    assert argmax_centroid_numpy(vecs, empty, routed=True).count() == 0


def test_semantic_dedup_routed_matches_flat_on_structured_corpus(spark):
    """End-to-end: semantic_dedup's full decision table (cluster, rank,
    kept) under routed assignment equals the flat exact kernel's on a
    structured corpus — the operator-level form of the recall gate.
    Seed-rule centroids (first k rows) ARE cluster exemplars here because
    the corpus is built as k planted blobs appearing exemplar-first."""
    from bioclip_vector_db_spark.operators.dedup import semantic_dedup

    rng = np.random.RandomState(3)
    K, D, per = 530, 128, 3
    C = rng.randn(K, D)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    rows = []
    # vec_ids 0..K-1 are the exemplars (the seed rule picks exactly them
    # as centroids); K.. are noisy copies.
    for i in range(K):
        rows.append((int(i), C[i].tolist()))
    vid = K
    for i in range(K):
        for _ in range(per - 1):
            v = C[i] + 0.05 * rng.randn(D)
            rows.append((int(vid), v.tolist()))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    flat = {
        r.vec_id: (r.cluster_id, r.kept)
        for r in semantic_dedup(emb, k=K, kernel="numpy", routed=False).collect()
    }
    routed = {
        r.vec_id: (r.cluster_id, r.kept)
        for r in semantic_dedup(emb, k=K, kernel="numpy", routed="auto").collect()
    }
    assert set(flat) == set(routed)
    n = len(flat)
    # The operator's OUTPUT is the keep/drop decision: it must be
    # identical row-for-row. Assignment itself is allowed the documented
    # sliver of routing misses (a missed vector lands in a runner-up
    # cluster; with noise sigma*sqrt(D) ~ 0.57 of a unit vector a handful
    # of planted rows sit genuinely between clusters).
    assert all(flat[k][1] == routed[k][1] for k in flat), "keep/drop diverged"
    agree = sum(1 for k in flat if flat[k][0] == routed[k][0])
    assert agree / n >= 0.995, f"cluster agreement {agree}/{n} below gate"


# ---------------------------------------------------------------------------
# Round 13: tie-stable routing selection + group_salts auto-sizing.
# ---------------------------------------------------------------------------


def test_tiled_top_groups_tie_selection_is_tiling_invariant():
    """r12 ADVICE: the previous argpartition selection resolved routing
    ties at the p-th boundary by tile layout, so the probed set could
    differ under different Arrow batch shapes on tie-bearing corpora
    (exact-duplicate embeddings are SemDeDup's normal input). The
    selection is now a total order (score desc, gid asc): pin that the
    returned set (a) matches a brute-force reference under that order
    and (b) is bit-identical across wildly different tile widths, on a
    corpus built to tie at every boundary."""
    from bioclip_vector_db_spark.operators import knn_numpy as kn

    rng = np.random.RandomState(9)
    # 12 distinct anchor directions, each repeated 25x -> 300 S rows
    # where every score ties 25-way; p=8 always straddles a tie class.
    A = rng.randn(12, 16)
    A /= np.linalg.norm(A, axis=1, keepdims=True)
    S = np.repeat(A, 25, axis=0)
    emb = np.concatenate([A[rng.randint(0, 12, 40)], rng.randn(7, 16)])
    p = 8
    # Brute-force reference: per row, lexicographic (round-9 score desc,
    # gid asc) — the 9-dp round is the family tie contract AND the only
    # thing that makes exact ties consistent across GEMM shapes (BLAS
    # summation order is shape-dependent in the last ulp).
    sup = np.round(emb @ S.T, 9)
    ref = np.lexsort((np.broadcast_to(np.arange(300), sup.shape), -sup), axis=1)[:, :p]
    old = kn._TILE_ELEMS
    try:
        outs = []
        for tile in (10_000_000, 47 * 31, 47 * 301, 47 * 13):
            kn._TILE_ELEMS = tile
            outs.append(kn._tiled_top_groups(emb, S, p))
    finally:
        kn._TILE_ELEMS = old
    for got in outs:
        assert np.array_equal(got, ref), "selection diverged from total order"
    for got in outs[1:]:
        assert np.array_equal(got, outs[0]), "selection depends on tile width"


def test_routed_batch_shape_invariant_on_duplicate_heavy_corpus(spark):
    """The in-memory routed tier under 7-row Arrow batches on a corpus of
    EXACT duplicates (every routing score ties): the r12 batch-shape gate
    passed only because its planted data was tie-free — this one makes
    the tie-stability fix harness-adjacent at the operator level."""
    D = 32
    rng = np.random.RandomState(31)
    A = rng.randn(20, D)
    A /= np.linalg.norm(A, axis=1, keepdims=True)
    # 540 centroids = 20 directions x 27 exact copies (k > threshold).
    cents = spark.createDataFrame(
        [(int(i), A[i % 20].tolist()) for i in range(540)],
        "cid long, cvec array<double>",
    )
    vecs = spark.createDataFrame(
        [(int(i), A[i % 20].tolist()) for i in range(120)],
        "vec_id long, embedding array<double>",
    )
    base = _collect_assign(argmax_centroid_numpy(vecs, cents, routed=True))
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "7")
        tiny = _collect_assign(argmax_centroid_numpy(vecs, cents, routed=True))
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert base == tiny
    # Duplicate centroids: every winner must be the smallest-cid twin.
    assert all(cid == vid % 20 for vid, (cid, _) in base.items())


def test_auto_salts_formula_and_default_is_auto():
    """group_salts auto-sizing (r12 verdict item 2): ceil(mean fan-in
    per live group / target) with the 100-TB contract point deriving
    ~123 salts — computed, not caller-guessed."""
    import math as m

    from bioclip_vector_db_spark.operators.knn_routed import (
        _TARGET_ROWS_PER_GROUP_TASK,
        _auto_salts,
    )

    # 100-TB contract point from the module docstring: n=1e11, probes=8,
    # g at the router sample cap.
    expect = m.ceil(1e11 * 8 / 65_536 / _TARGET_ROWS_PER_GROUP_TASK)
    assert _auto_salts(int(1e11), 8, 65_536) == expect == 123
    # Small regimes collapse to 1 (never 0), degenerate g guarded.
    assert _auto_salts(2_000, 8, 65) == 1
    assert _auto_salts(0, 8, 65) == 1
    assert _auto_salts(10, 8, 0) == 1


def test_auto_salts_engage_and_match_salts_one(spark, monkeypatch):
    """Auto-sized salts (group_salts=None, the new default) must be
    row-identical to the explicit salts=1 run. Shrinking the target
    forces the auto path to derive >1 salts at test scale — pinned with
    a spy so the gate proves salting genuinely engaged."""
    from pyspark.sql import types as T

    from bioclip_vector_db_spark.operators import knn_routed

    cents, vecs = _planted(spark, K=520, N=700)

    def run(salts):
        return _collect_assign(
            knn_routed.routed_best_centroid_distributed(
                vecs,
                cents,
                id_col="cid",
                cvec_col="cvec",
                vec_col="embedding",
                similarity=True,
                out_field=T.StructField("cid", T.LongType()),
                score_field="csim",
                group_salts=salts,
            )
        )

    derived = {}
    real = knn_routed._auto_salts

    def spy(n, p, g):
        derived["salts"] = real(n, p, g)
        return derived["salts"]

    monkeypatch.setattr(knn_routed, "_TARGET_ROWS_PER_GROUP_TASK", 50)
    monkeypatch.setattr(knn_routed, "_auto_salts", spy)
    auto = run(None)
    assert derived["salts"] > 1, "auto-sizing never engaged at forced target"
    assert auto == run(1)


# ---------------------------------------------------------------------------
# f32 payload encoding (r13 verdict item 4): the routed-explode shuffle is
# the tier's dominant cost and p x payload its information floor — but each
# element need not be 8 bytes. Opt-in float32 halves the shuffle bytes; the
# gates pin that the ~1e-7 dot perturbation stays behind round-9 in practice
# and that every structural invariant (salts, determinism) survives.
# ---------------------------------------------------------------------------


def test_distributed_f32_payload_parity(spark):
    """f32 payload vs the default f64 on the planted corpus: assignment
    agreement >= 99.9% (a flip needs two candidates within ~1e-7 of each
    other AFTER round-9 — a near-tie), scores within 1e-6, and the
    result is deterministic run-to-run (measured: identical on this
    fixture)."""
    from pyspark.sql import types as T

    from bioclip_vector_db_spark.operators import knn_routed

    cents, vecs = _planted(spark)
    f64 = _collect_assign(
        argmax_centroid_numpy(vecs, cents, routed="distributed")
    )
    f32 = _collect_assign(
        argmax_centroid_numpy(
            vecs, cents, routed="distributed", routed_payload="f32"
        )
    )
    assert set(f64) == set(f32)
    n = len(f64)
    agree = sum(1 for k in f64 if f64[k][0] == f32[k][0])
    assert agree / n >= 0.999, f"f32 payload agreement {agree}/{n}"
    assert max(abs(f64[k][1] - f32[k][1]) for k in f64) <= 1e-6
    again = _collect_assign(
        argmax_centroid_numpy(
            vecs, cents, routed="distributed", routed_payload="f32"
        )
    )
    assert f32 == again

    with pytest.raises(ValueError, match="payload"):
        knn_routed.routed_best_centroid_distributed(
            vecs,
            cents,
            id_col="cid",
            cvec_col="cvec",
            vec_col="embedding",
            similarity=True,
            out_field=T.StructField("cid", T.LongType()),
            payload="f16",
        )


def test_distributed_f32_payload_salt_invariance(spark):
    """The salt-invariance contract must hold under the narrowed payload
    too: per-group argbest is computed per salt and the struct-merge is
    associative — neither depends on element width, and the f32
    narrowing happens BEFORE salting (one cast per vector, not per
    replica), so salted and unsalted runs score identical float32
    payloads."""
    from pyspark.sql import types as T

    from bioclip_vector_db_spark.operators import knn_routed

    cents, vecs = _planted(spark, K=520, N=700)

    def run(salts):
        return _collect_assign(
            knn_routed.routed_best_centroid_distributed(
                vecs,
                cents,
                id_col="cid",
                cvec_col="cvec",
                vec_col="embedding",
                similarity=True,
                out_field=T.StructField("cid", T.LongType()),
                score_field="csim",
                group_salts=salts,
                payload="f32",
            )
        )

    a = run(1)
    assert a == run(8)


def test_semantic_dedup_f32_payload_end_to_end(spark):
    """semantic_dedup(routed='distributed', routed_payload='f32') end to
    end on the planted corpus: keep/drop decisions vs the f64 distributed
    run must stay inside a 0.5% drift bound (measured: identical on this
    fixture — planted dups dot at ~1.0 and uniques at ~noise, nowhere
    near the 9th decimal)."""
    from bioclip_vector_db_spark.operators.dedup import semantic_dedup

    cents, vecs = _planted(spark, K=520, N=1500)

    def decisions(payload):
        return {
            r.vec_id: r.kept
            for r in semantic_dedup(
                vecs,
                centroids=cents,
                kernel="numpy",
                routed="distributed",
                routed_payload=payload,
            ).collect()
        }

    f64 = decisions("f64")
    f32 = decisions("f32")
    assert set(f64) == set(f32)
    drift = sum(1 for k in f64 if f64[k] != f32[k])
    assert drift / len(f64) <= 0.005, f"f32 keep/drop drift {drift}/{len(f64)}"


# ---------------------------------------------------------------------------
# Adaptive probing (r13 verdict item 5): the dist_payload stress leg showed
# the cogroup term is ROW-boxing-bound on local[*] (f32 halves the bytes for
# a ~flat wall), so the lever that moves the wall is the replicated ROW
# count. probe_margin ships a vector only to probed groups within a round-9
# routing-score margin of its best. Bounds set from measurement
# (2026-08-16): planted corpus — margin=0.2 IDENTICAL to fixed probing at
# 3.42 vs 8.00 probes/vec, margin=0.1 agreement 99.90% at 1.41 probes/vec;
# real 64-d k=520 trained fixture (the boundary regime) — margin=0.2 drift
# 0.10% / spurious 0% at a 26% row cut, margin=0.1 drift 3.75% at 3.21
# probes/vec (recorded in SCALING.md §2.1, gated here on the planted
# regime).
# ---------------------------------------------------------------------------


def _run_margin(spark, vecs, cents, margin, salts=None):
    from pyspark.sql import types as T

    from bioclip_vector_db_spark.operators import knn_routed

    stage = {}
    knn_routed._INSTRUMENT = stage
    try:
        out = _collect_assign(
            knn_routed.routed_best_centroid_distributed(
                vecs,
                cents,
                id_col="cid",
                cvec_col="cvec",
                vec_col="embedding",
                similarity=True,
                out_field=T.StructField("cid", T.LongType()),
                score_field="csim",
                probe_margin=margin,
                group_salts=salts,
            )
        )
    finally:
        knn_routed._INSTRUMENT = None
    return out, stage["cand_rows"]


def test_distributed_adaptive_probing_row_cut_and_recall(spark):
    cents, vecs = _planted(spark)
    fixed, cand_fixed = _run_margin(spark, vecs, cents, None)
    n = len(fixed)
    assert cand_fixed == 8 * n  # the fixed fan-out this feature cuts

    # margin=0.2: measured IDENTICAL decisions at a >= 2x row cut.
    m02, cand02 = _run_margin(spark, vecs, cents, 0.2)
    assert m02 == fixed
    assert cand02 * 2 <= cand_fixed, f"row cut {cand_fixed}/{cand02} below 2x"

    # margin=0.1: >= 4x row cut (measured 5.7x) at >= 99% agreement
    # (measured 99.90%) — the aggressive end stays useful.
    m01, cand01 = _run_margin(spark, vecs, cents, 0.1)
    agree = sum(1 for k in fixed if fixed[k][0] == m01[k][0])
    assert agree / n >= 0.99, f"margin=0.1 agreement {agree}/{n}"
    assert cand01 * 4 <= cand_fixed, f"row cut {cand_fixed}/{cand01} below 4x"

    # A margin wider than any score spread must reproduce fixed probing
    # EXACTLY (the pruned set is a subset that converges to the full set).
    mbig, cand_big = _run_margin(spark, vecs, cents, 1e9)
    assert mbig == fixed and cand_big == cand_fixed


def test_distributed_adaptive_probing_salt_invariance_and_validation(spark):
    import pytest as _pytest

    from pyspark.sql import types as T

    from bioclip_vector_db_spark.operators import knn_routed

    cents, vecs = _planted(spark, K=520, N=700)
    a, _ = _run_margin(spark, vecs, cents, 0.1, salts=1)
    b, _ = _run_margin(spark, vecs, cents, 0.1, salts=4)
    assert a == b  # pruning happens BEFORE salting; argbest is per-salt

    with _pytest.raises(ValueError, match="probe_margin"):
        knn_routed.routed_best_centroid_distributed(
            vecs,
            cents,
            id_col="cid",
            cvec_col="cvec",
            vec_col="embedding",
            similarity=True,
            out_field=T.StructField("cid", T.LongType()),
            probe_margin=-0.1,
        )


def test_distributed_adaptive_probing_total_under_nan_embedding(spark):
    """r14 self-review: a NaN embedding scores NaN against every routing
    anchor, so the margin inequality reads False for ALL probes and the
    row would silently vanish from the output (the global merge
    inner-joins on surviving candidates) — where fixed probing still
    ships it. Column 0 of the probe set is kept unconditionally, so the
    margin path must emit the same vec_id set as fixed probing even with
    a NaN row planted."""
    import math as _math

    cents, vecs = _planted(spark, K=520, N=300)
    poisoned = vecs.union(
        spark.createDataFrame(
            [(999_999, [float("nan")] * 256)],
            "vec_id long, embedding array<double>",
        )
    )
    fixed, _ = _run_margin(spark, poisoned, cents, None)
    pruned, _ = _run_margin(spark, poisoned, cents, 0.1)
    assert set(pruned) == set(fixed)
    assert 999_999 in pruned


# ---------------------------------------------------------------------------
# Arrow-native engine (r14 verdict item 1): the dist_payload stress leg
# proved the cogroup term is Arrow<->pandas ROW-boxing-bound, so the three
# Python stages default to mapInArrow / applyInArrow reading the vector
# values buffer directly. The contract: the engines may differ only in HOW
# rows cross the JVM/Python boundary — results are byte-identical.
# ---------------------------------------------------------------------------


def _run_engine(spark, vecs, cents, engine, payload="f64", margin=None, salts=None):
    from pyspark.sql import types as T

    from bioclip_vector_db_spark.operators import knn_routed

    stage = {}
    knn_routed._INSTRUMENT = stage
    try:
        out = _collect_assign(
            knn_routed.routed_best_centroid_distributed(
                vecs,
                cents,
                id_col="cid",
                cvec_col="cvec",
                vec_col="embedding",
                similarity=True,
                out_field=T.StructField("cid", T.LongType()),
                score_field="csim",
                payload=payload,
                probe_margin=margin,
                group_salts=salts,
                engine=engine,
            )
        )
    finally:
        knn_routed._INSTRUMENT = None
    return out, stage


def test_distributed_arrow_engine_byte_identical_to_pandas(spark):
    """Default-engine change gate: every (payload, margin, salts) combo
    must produce byte-identical (cid, csim) maps under both engines —
    same float64 matrices, same tiled round-9 GEMMs, same total order;
    only the boundary transport differs."""
    cents, vecs = _planted(spark, K=520, N=700)
    for payload, margin, salts in [
        ("f64", None, None),
        ("f64", "auto", None),
        ("f64", 0.1, 3),
        ("f32", None, None),
        ("f32", 0.2, 4),
    ]:
        arrow, st_a = _run_engine(
            spark, vecs, cents, "arrow", payload=payload, margin=margin, salts=salts
        )
        pandas_, st_p = _run_engine(
            spark, vecs, cents, "pandas", payload=payload, margin=margin, salts=salts
        )
        assert arrow == pandas_, f"engine mismatch at {payload}/{margin}/{salts}"
        assert st_a["engine"] == "arrow" and st_p["engine"] == "pandas"


def test_distributed_arrow_engine_nan_totality_and_validation(spark):
    """The structural column-0 keep (NaN totality, r14 self-review) must
    hold through the Arrow route stage too; and an unknown engine is a
    loud error, not a silent fallback."""
    import pytest as _pytest

    from pyspark.sql import types as T

    from bioclip_vector_db_spark.operators import knn_routed

    cents, vecs = _planted(spark, K=520, N=300)
    poisoned = vecs.union(
        spark.createDataFrame(
            [(999_999, [float("nan")] * 256)],
            "vec_id long, embedding array<double>",
        )
    )
    pruned, _ = _run_engine(spark, poisoned, cents, "arrow", margin=0.1)
    assert 999_999 in pruned
    fixed, _ = _run_engine(spark, poisoned, cents, "arrow")
    assert set(pruned) == set(fixed)

    with _pytest.raises(ValueError, match="engine"):
        knn_routed.routed_best_centroid_distributed(
            vecs,
            cents,
            id_col="cid",
            cvec_col="cvec",
            vec_col="embedding",
            similarity=True,
            out_field=T.StructField("cid", T.LongType()),
            engine="polars",
        )


def test_distributed_probe_margin_auto_calibration(spark):
    """probe_margin='auto' (the default, r14 verdict item 2) calibrates
    from a capped strided sample of the WORKLOAD vectors: deterministic
    (same input -> same margin, run to run), regime-adaptive (the planted
    corpus's tight clusters calibrate a small margin and a large row cut
    — measured 0.034 / 7.4x), and always a genuine cut next to fixed
    probing while staying inside the recall gate above. None remains the
    opt-out (gated in the adaptive-probing tests: cand_rows == probes*n).
    """
    from bioclip_vector_db_spark.operators import knn_routed

    cents, vecs = _planted(spark)
    fixed, st_fixed = _run_engine(spark, vecs, cents, "arrow", margin=None)
    auto1, st1 = _run_engine(spark, vecs, cents, "arrow", margin="auto")
    auto2, st2 = _run_engine(spark, vecs, cents, "arrow", margin="auto")
    # Deterministic: identical calibrated value AND identical rows.
    assert st1["probe_margin"] == st2["probe_margin"]
    assert auto1 == auto2
    # The calibrated margin is a float inside the validation domain,
    # stamped in the instrument record for stress-leg attribution.
    assert isinstance(st1["probe_margin"], float)
    assert st1["probe_margin"] >= knn_routed._CALIBRATE_MARGIN_FLOOR
    # Regime-adaptive: tight planted clusters must earn a real row cut
    # (measured 7.4x; gated at 2x so day-to-day fixture tweaks don't
    # flake the gate).
    assert st1["cand_rows"] * 2 <= st_fixed["cand_rows"], (
        f"calibrated cut {st_fixed['cand_rows']}/{st1['cand_rows']} below 2x"
    )


def test_distributed_hot_group_max_fanin_bounded(spark, monkeypatch):
    """r14 verdict item 3: group_salts auto-sizing bounded the MEAN
    cogroup key; the per-task OOM bound is the MAX key. Plant the
    adversarial case — 80% of vectors near ONE centroid while the
    centroid table under-represents that region (k-means or seed-rule
    centroids would both spread with the data, so this is strictly
    worse than anything the auto paths produce) — and gate that the
    per-group salt escalation, sized from the sampled routing
    distribution, keeps the measured max (group, salt) fan-in within
    ~2.5x the per-task target, while results stay byte-identical to
    the uniform-salt plan (the argbest is per-key and the global merge
    associative, so salting can never change a row)."""
    from pyspark.sql import types as T

    from bioclip_vector_db_spark.operators import knn_routed

    target = 100
    monkeypatch.setattr(knn_routed, "_TARGET_ROWS_PER_GROUP_TASK", target)

    rng = np.random.RandomState(11)
    K, D, N = 520, 64, 2000
    C = rng.randn(K, D)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    hot = C[0]
    V = np.empty((N, D))
    n_hot = int(0.8 * N)
    V[:n_hot] = hot + 0.05 * rng.randn(n_hot, D)
    V[n_hot:] = C[rng.randint(1, K, N - n_hot)] + 0.05 * rng.randn(N - n_hot, D)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    cents = spark.createDataFrame(
        [(int(i), C[i].tolist()) for i in range(K)], "cid long, cvec array<double>"
    )
    vecs = spark.createDataFrame(
        [(int(i), V[i].tolist()) for i in range(N)],
        "vec_id long, embedding array<double>",
    )

    def run(salts):
        stage = {}
        knn_routed._INSTRUMENT = stage
        try:
            out = _collect_assign(
                knn_routed.routed_best_centroid_distributed(
                    vecs,
                    cents,
                    id_col="cid",
                    cvec_col="cvec",
                    vec_col="embedding",
                    similarity=True,
                    out_field=T.StructField("cid", T.LongType()),
                    score_field="csim",
                    probe_margin=None,  # fixed probing = max fan-in
                    group_salts=salts,
                )
            )
        finally:
            knn_routed._INSTRUMENT = None
        return out, stage

    auto, st_auto = run(None)
    # The escalation engaged (hot group raised above the uniform base)
    # and the MEASURED max key is bounded near the target.
    assert st_auto["max_group_salts"] > st_auto["salts"], st_auto
    assert st_auto["max_key_rows"] <= 2.5 * target, (
        f"max fan-in {st_auto['max_key_rows']} vs target {target} "
        f"(salts base {st_auto['salts']}, max {st_auto['max_group_salts']})"
    )
    # Salting never changes a row: byte-identical to the single-key plan.
    uniform, _ = run(1)
    assert auto == uniform
