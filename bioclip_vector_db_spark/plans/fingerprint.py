"""Physical-plan fingerprints: a query's plan reduced to an operator
multiset, the plan-shape analog of BENCH_REF.json.

The 27 hand-written guards in ``tests/test_plans.py`` pin the properties
that matter most (no all-pairs joins, group-limit pushdown, broadcast
dims), but only for the queries someone thought to guard. The committed
corpus ``PLAN_FINGERPRINTS.json`` extends regression detection to EVERY
registered query: a silent optimizer regression — a broadcast join
degrading to sort-merge, a WindowGroupLimit disappearing, an extra
Exchange — changes the operator multiset and fails the parity gate's
fingerprint check even where no hand-written guard exists.

Normalization: the physical tree is WALKED (node names counted into a
multiset; Exchange keeps its distribution kind; Project/Filter/
ColumnarToRow plumbing excluded; cached fragments traversed through
their own build plan). Everything argument-level (column ids, temp
paths, statistics) is discarded, so the fingerprint changes exactly when
the plan SHAPE changes.

Determinism caveat: plan shape is only reproducible under a FIXED
session protocol — fresh JVM, queries built in sorted order, nothing
executed — because materializing any session cache gives Spark accurate
sizeInBytes and legitimately flips join strategies (observed:
vector_ingest_pipeline 9 SMJ -> 3 SMJ + 6 BHJ after its inputs
materialized; dedup_pagerank lost 112 Exchanges). The corpus is
therefore recorded AND checked only by tools/plan_fingerprints.py's
protocol; tests/test_plan_fingerprints.py runs it as a subprocess.

Refresh after an intentional plan change:
    python tools/plan_fingerprints.py --write [names...]
"""

from __future__ import annotations

import json
import os
import re

#: Repo-root corpus file.
CORPUS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "PLAN_FINGERPRINTS.json",
)

#: Leading word of Partitioning.toString — the distribution kind is plan
#: shape (hashpartitioning vs rangepartitioning vs SinglePartition), its
#: keys are not.
_PARTITIONING_KIND_RE = re.compile(r"([A-Za-z]+)")


def _walk(node, counts: dict[str, int], seen_subqueries: set | None = None) -> None:
    """Count ``node`` and recurse into its physical children.

    The TREE walk (not toString parsing) is what makes the fingerprint
    cache-state independent: InMemoryTableScan is a LeafExecNode, so the
    cached fragment's historical build plan — whose toString rendering
    depends on which sibling caches existed/were materialized when it
    was first constructed — is never visited. (String parsing was tried
    first and broke: a materialized cache's embedded AdaptiveSparkPlan
    renders its `== Final Plan ==` section at SHALLOWER indentation than
    the InMemoryRelation line, defeating indent-based subtree skipping.)
    """
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        # LeafExecNode wrapper; fingerprint the deterministic INITIAL
        # plan — post-execution the current plan has QueryStage wrappers
        # and runtime join rewrites baked in.
        _walk(node.initialPlan(), counts, seen_subqueries)
        return
    if name == "InMemoryTableScan":
        # Cache substitution is SESSION-STATE: any persist() anywhere in
        # the session replaces matching analyzed subtrees everywhere
        # (observed: a build_index test persisting with_faiss_ids turned
        # a later query's Window fragment into this leaf). Descend into
        # the cached fragment's own physical plan and don't count the
        # scan node, so cached and inline renderings of the same
        # fragment fingerprint identically.
        _walk(node.relation().cachedPlan(), counts, seen_subqueries)
        return
    if name.startswith("Scan "):
        name = "FileScan"  # drop the relation identifier/path
    elif name == "Exchange":
        kind = _PARTITIONING_KIND_RE.search(node.outputPartitioning().toString())
        if kind:
            name = f"Exchange[{kind.group(1)}]"
    # Project/Filter/ColumnarToRow are narrow plumbing, not strategy,
    # and their counts shift with cache state (Catalyst collapses
    # adjacent Projects and re-sites Filters across an inline fragment
    # but not across a cache boundary) — excluded so the fingerprint
    # tracks plan SHAPE only.
    if name not in ("Project", "Filter", "ColumnarToRow"):
        counts[name] = counts.get(name, 0) + 1
    if seen_subqueries is None:
        seen_subqueries = set()
    children = node.children()
    for i in range(children.size()):
        _walk(children.apply(i), counts, seen_subqueries)
    # Expression-embedded subquery plans (ScalarSubquery / InSubquery /
    # DPP's SubqueryBroadcast) are NOT in children() — without this the
    # gate is blind to regressions inside them. The same subquery is
    # referenced from several tree nodes, so dedupe by plan id.
    try:
        subs = node.subqueries()
        for i in range(subs.size()):
            sub = subs.apply(i)
            sid = sub.id()
            if sid in seen_subqueries:
                continue
            seen_subqueries.add(sid)
            _walk(sub, counts, seen_subqueries)
    except Exception:
        pass  # node types without the accessor


def plan_fingerprint(df) -> dict[str, int]:
    """Operator-name multiset of ``df``'s physical plan (pre-execution
    initial plan — deterministic, no AQE runtime re-plan baked in)."""
    counts: dict[str, int] = {}
    _walk(df._jdf.queryExecution().executedPlan(), counts, set())
    return dict(sorted(counts.items()))


def load_corpus() -> dict[str, dict[str, int]]:
    if not os.path.exists(CORPUS_PATH):
        return {}
    with open(CORPUS_PATH) as fh:
        return json.load(fh)


def save_corpus(corpus: dict[str, dict[str, int]]) -> None:
    with open(CORPUS_PATH, "w") as fh:
        json.dump(dict(sorted(corpus.items())), fh, indent=1, sort_keys=True)
        fh.write("\n")
