"""Leiden refinement (plans/leiden.py): the connectivity guarantee that
is the operator's reason to exist (Traag, Waltman, van Eck 2019 — plain
Louvain can strand a DISCONNECTED community; Leiden's refinement phase
re-merges from singletons inside each phase-1 community, so every
refined community is internally connected by construction)."""

import collections

from conftest import edges_df
from oracles import random_graph

from metis_spark.plans.leiden import leiden_communities
from metis_spark.plans.louvain import louvain_local_moving

# deterministic fixture on which 2-round synchronous Louvain yields a
# disconnected community (found by exhaustive search over the repo's
# random_graph seeds; pinned so the defect this operator fixes is
# actually PRESENT in the test input)
FIXTURE = dict(n=20, p=0.12, seed=0, zipf_extra=10)


def _undirected_nbrs(edges):
    nbrs = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    return nbrs


def _disconnected_communities(edges, label):
    """Labels of communities whose induced subgraph is not connected."""
    nbrs = _undirected_nbrs(edges)
    comms = collections.defaultdict(set)
    for v, l in label.items():
        comms[l].add(v)
    bad = []
    for l, vs in comms.items():
        if len(vs) <= 1:
            continue
        start = next(iter(vs))
        seen, stack = {start}, [start]
        while stack:
            u = stack.pop()
            for w in nbrs[u]:
                if w in vs and w not in seen:
                    seen.add(w)
                    stack.append(w)
        if seen != vs:
            bad.append(l)
    return bad


def test_leiden_refined_communities_are_connected(spark, tmp_path):
    edges = random_graph(**FIXTURE)

    # 1. the defect exists on this fixture: plain Louvain local moving
    #    leaves at least one community disconnected
    l1, _ = louvain_local_moving(
        edges_df(spark, edges), rounds=2, checkpoint_dir=str(tmp_path / "lv")
    )
    louvain_label = {r["id"]: r["label"] for r in l1.collect()}
    assert _disconnected_communities(edges, louvain_label), (
        "fixture no longer reproduces the Louvain disconnect defect"
    )

    # 2. Leiden's refined partition on the same input: every community
    #    internally connected (the Traag et al. guarantee)
    out, info = leiden_communities(
        edges_df(spark, edges),
        rounds=2,
        refine_rounds=2,
        checkpoint_dir=str(tmp_path / "ld"),
    )
    refined = {r["id"]: r["rl"] for r in info["refined_labels"].collect()}
    assert refined, "refined_labels handle is empty"
    assert _disconnected_communities(edges, refined) == []

    # 3. refinement NESTS inside phase-1: every refined community's
    #    members share one Louvain label (refinement only splits, never
    #    crosses, phase-1 boundaries)
    by_rl = collections.defaultdict(set)
    for v, rl in refined.items():
        by_rl[rl].add(louvain_label[v])
    assert all(len(ls) == 1 for ls in by_rl.values())

    # 4. final level-2 labels cover every vertex exactly once
    final = {r["id"]: r["label"] for r in out.collect()}
    assert set(final) == set(refined) == set(louvain_label)
    assert info["iterations"] == 2 * 2 + 2
