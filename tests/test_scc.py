import sys

import pytest

from conftest import edges_df
from metis_spark.plans.scc import strongly_connected_components
from oracles import random_graph


def tarjan_scc(n, edges):
    """Iterative Tarjan — python oracle. Returns id → min-member-id."""
    adj = {}
    for s, t in edges:
        adj.setdefault(s, []).append(t)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comp = {}
    counter = [0]

    def strongconnect(root):
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            succs = adj.get(v, [])
            for i in range(pi, len(succs)):
                w = succs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
            work.pop()
            if work:
                pv, _ = work[-1]
                low[pv] = min(low[pv], low[v])

    for v in range(n):
        if v not in index:
            strongconnect(v)
    return comp


def test_scc_vs_tarjan_random(spark, tmp_path):
    edges = random_graph(n=60, p=0.06, seed=47, zipf_extra=40)
    want = tarjan_scc(60, edges)
    labels, info = strongly_connected_components(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path),
    )
    got = {r["id"]: r["scc"] for r in labels.collect()}
    # oracle covers all 60 ids; spark defaults to edge endpoints only
    want = {v: c for v, c in want.items() if v in got}
    assert info["converged"]
    assert got == want


def test_scc_cycles_and_chains(spark, tmp_path):
    # two 3-cycles joined by one-way bridges + a tail
    edges = [(0, 1), (1, 2), (2, 0),
             (2, 10), (10, 11), (11, 12), (12, 10),
             (12, 20), (20, 21)]
    labels, info = strongly_connected_components(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path),
    )
    got = {r["id"]: r["scc"] for r in labels.collect()}
    assert info["converged"]
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10, 20: 20, 21: 21}


def test_scc_resume_identical(spark, tmp_path):
    edges = random_graph(n=50, p=0.07, seed=53, zipf_extra=25)
    full, _ = strongly_connected_components(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "a"),
    )
    strongly_connected_components(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "b"), max_phases=1,
    )
    resumed, info = strongly_connected_components(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "b"),
    )
    a = {r["id"]: r["scc"] for r in full.collect()}
    b = {r["id"]: r["scc"] for r in resumed.collect()}
    assert a == b and info["converged"]


def test_condensation_levels_vs_python(spark, tmp_path):
    """Longest-path levels on the condensed DAG vs a python oracle."""
    from metis_spark.plans.scc import condensation_levels

    edges = random_graph(n=50, p=0.06, seed=59, zipf_extra=30)
    want_scc = tarjan_scc(50, edges)
    # python longest-path levels over the condensation
    cedges = {(want_scc[s], want_scc[t]) for s, t in edges if want_scc[s] != want_scc[t]}
    comps = set(want_scc.values())
    level = {c: 0 for c in comps}
    for _ in range(len(comps)):
        changed = False
        for cs, cd in cedges:
            if level[cs] + 1 > level[cd]:
                level[cd] = level[cs] + 1
                changed = True
        if not changed:
            break

    labels, _ = strongly_connected_components(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path),
    )
    rows = condensation_levels(edges_df(spark, edges), labels).collect()
    got = {r["id"]: (r["scc"], r["level"]) for r in rows}
    want = {v: (want_scc[v], level[want_scc[v]]) for v in got}
    assert got == want and len(got) > 0
    assert max(lv for _, lv in got.values()) >= 1
