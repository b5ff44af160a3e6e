"""Partition-invariance gate: distributed correctness under a different
physical data distribution.

On a real cluster nothing guarantees the scan split or row order the
local fixture happens to produce: a 1000-executor run re-splits every
file and shuffles place rows differently. Any operator whose answer
silently depends on row order within a partition (collect_list without
array_sort, first() without an ordering, prefix-sum block decomposition,
an LSH bucket fan-out keyed on physical order) is a bug the oracle
parity gate CANNOT catch when both runs see the same local layout.

This gate re-runs a representative, shape-diverse set of queries with
every table scan round-robin repartitioned to a prime partition count
(rows land in completely different partitions, in different orders) and
asserts the canonically-sorted result set is IDENTICAL to the default
run. Monkeypatching covers each operator module's imported load_table
symbol — the single scan entry point.
"""

from __future__ import annotations

import pytest

from bioclip_vector_db_spark.plans.registry import (
    QUERIES,
    load_all_plans,
    release_transient,
)
from bioclip_vector_db_spark.sources import catalog as _catalog

load_all_plans()

#: Modules whose `load_table` reference must be patched (they bind the
#: name at import).
_MODULES = [
    "bioclip_vector_db_spark.operators.dedup",
    "bioclip_vector_db_spark.operators.embedding",
    "bioclip_vector_db_spark.operators.indexing",
    "bioclip_vector_db_spark.operators.knn",
    "bioclip_vector_db_spark.operators.multimodal",
    "bioclip_vector_db_spark.operators.quantization",
    "bioclip_vector_db_spark.operators.relational",
    "bioclip_vector_db_spark.operators.temporal",
    "bioclip_vector_db_spark.operators.text",
    "bioclip_vector_db_spark.operators.tpch",
    "bioclip_vector_db_spark.sources.webdataset",
    "bioclip_vector_db_spark.streaming.events",
]

#: One query per at-risk shape (not the whole registry — the oracle gate
#: covers values; this gate covers DISTRIBUTION sensitivity, so one
#: representative per mechanism is the right coverage/cost point):
#: two-pass prefix sums, rank windows with tiebreaks, LSH banding,
#: connected components, iterative PageRank, degree-ordered triangles,
#: grouped top-k, as-of/range joins, greedy Arrow per-group loops,
#: survivorship argmin, Morton layout, SCD2 full-outer merge, exact
#: substring spans, token packing, stratified sampling, inverted index.
INVARIANCE_QUERIES = [
    "documents_pack_batches",
    "documents_compaction_plan",
    "documents_stratified_sample",
    "tpch_part_size_ranks",
    "dedup_near_minhash",
    "dedup_near_clusters",
    "dedup_pagerank",
    "dedup_near_triangles",
    "dedup_survivorship",
    "dedup_substring_spans",
    "documents_inverted_index",
    "knn_batch_join",
    "knn_mmr_rerank",
    "events_asof_join",
    "events_range_join",
    "events_zorder_layout",
    "customer_scd2_merge",
    "tpch_salted_skew_join",
    "partition_assignment",
    "text_lm_score",
]


def _canon(df):
    cols = sorted(df.columns)
    rows = [tuple(r[c] for c in cols) for r in df.collect()]
    return sorted(rows, key=lambda t: tuple(str(x) for x in t))


def _evict_deterministic_derived_caches():
    """Drop every memoized derived table EXCEPT trained_centroids so the
    scrambled run genuinely rebuilds them from the scrambled scans.

    Without this the gate is vacuous for exactly the shapes it targets:
    the baseline run memoizes LSH band keys / signatures / assigned
    corpus / near-dup pairs into knn._DERIVED_CACHE (keyed by session,
    never released by release_transient), and the scrambled run would
    get the identical cached DataFrame back. trained_centroids stays: a
    k-means|| fit is LEGITIMATELY layout-sensitive (its init samples per
    partition), and on a real deployment it is a prebuilt index artifact
    read by the serving path, not recomputed per query — the corpus side
    of every consumer still scrambles. Returns the evicted entries for
    restoration."""
    from bioclip_vector_db_spark.operators import knn as _knn

    evicted = {}
    for key, df in list(_knn._DERIVED_CACHE.items()):
        if key[2] != "trained_centroids":
            evicted[key] = df
            df.unpersist()
            del _knn._DERIVED_CACHE[key]
    return evicted


def _restore_derived_caches(saved):
    from bioclip_vector_db_spark.operators import knn as _knn

    for key, df in list(_knn._DERIVED_CACHE.items()):
        if key not in saved and key[2] != "trained_centroids":
            df.unpersist()  # scrambled-run rebuilds: drop, don't keep
            del _knn._DERIVED_CACHE[key]
    for key, df in saved.items():
        _knn._DERIVED_CACHE[key] = df
        try:
            df.persist()
        except Exception:
            pass


def _patch_scans(monkeypatch, n_parts: int):
    """Monkeypatch every module-bound load_table to repartition(n_parts)
    — round-robin, so rows land in different partitions in a different
    order than the default file split."""
    import importlib

    real_load = _catalog.load_table

    def perturbed(spark_, sf_dir_, table):
        return real_load(spark_, sf_dir_, table).repartition(n_parts)

    monkeypatch.setattr(_catalog, "load_table", perturbed)
    for mod_name in _MODULES:
        mod = importlib.import_module(mod_name)
        if hasattr(mod, "load_table"):
            monkeypatch.setattr(mod, "load_table", perturbed)


def _assert_layout_invariant(name, n_parts, spark, sf_dir, monkeypatch):
    baseline = _canon(QUERIES[name](spark, sf_dir))
    release_transient()
    _patch_scans(monkeypatch, n_parts)
    saved = _evict_deterministic_derived_caches()
    try:
        perturbed_result = _canon(QUERIES[name](spark, sf_dir))
    finally:
        release_transient()
        _restore_derived_caches(saved)
    assert perturbed_result == baseline, (
        f"{name}: result depends on the physical data distribution "
        f"(repartition({n_parts}): {len(baseline)} baseline rows vs "
        f"{len(perturbed_result)} perturbed)"
    )


@pytest.mark.parametrize("name", INVARIANCE_QUERIES)
def test_result_invariant_under_repartitioned_scans(name, spark, sf_dir, monkeypatch):
    _assert_layout_invariant(name, 11, spark, sf_dir, monkeypatch)


def test_scramble_mechanism_actually_perturbs(spark, sf_dir, monkeypatch):
    """Guard the gate itself: after patching, a module-level load_table
    really produces the 11-way round-robin layout (if an operator module
    ever re-imports the symbol differently, the invariance tests would
    silently test nothing)."""
    import importlib

    _patch_scans(monkeypatch, 11)
    text_mod = importlib.import_module("bioclip_vector_db_spark.operators.text")
    df = text_mod.load_table(spark, sf_dir, "documents")
    assert df.rdd.getNumPartitions() == 11


#: The opposite edge: EVERYTHING in one partition. Stresses the block
#: decompositions (prefix sums, local windows) where per-partition
#: boundaries vanish entirely rather than multiply.
SINGLE_PARTITION_QUERIES = [
    "documents_pack_batches",
    "documents_compaction_plan",
    "documents_chunk_overlap",
    "dedup_substring_spans",
    "events_asof_join",
]


@pytest.mark.parametrize("name", SINGLE_PARTITION_QUERIES)
def test_result_invariant_under_single_partition(name, spark, sf_dir, monkeypatch):
    _assert_layout_invariant(name, 1, spark, sf_dir, monkeypatch)
