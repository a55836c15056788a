"""Maximal independent set (plans/mis.py) vs a pure-Python Luby twin."""

import collections

from conftest import edges_df
from oracles import random_graph

from metis_spark.plans.mis import MIS_HASH_MOD, MIS_HASH_MULT, maximal_independent_set


def py_luby(edges):
    h = lambda v: (v * MIS_HASH_MULT) % MIS_HASH_MOD
    nbrs = collections.defaultdict(set)
    verts = set()
    for a, b in edges:
        verts.add(a)
        verts.add(b)
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    active = set(verts)
    mis = set()
    rounds = 0
    while active:
        rounds += 1
        win = {
            v
            for v in active
            if all(h(v) < h(u) for u in nbrs[v] if u in active)
        }
        mis |= win
        removed = set(win)
        for w in win:
            removed |= nbrs[w] & active
        active -= removed
    return mis, verts, rounds


def test_mis_matches_python_twin(spark, tmp_path):
    edges = random_graph(n=120, p=0.04, seed=101, zipf_extra=80)
    out, info = maximal_independent_set(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "m")
    )
    want, verts, rounds = py_luby(edges)
    got = {r["id"]: r["in_mis"] for r in out.collect()}
    assert set(got) == verts
    assert {v for v, m in got.items() if m} == want
    assert info["converged"]
    assert info["mis_size"] == len(want)
    assert info["iterations"] == rounds


def test_mis_is_independent_and_maximal(spark, tmp_path):
    edges = random_graph(n=90, p=0.07, seed=103, zipf_extra=60)
    out, info = maximal_independent_set(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "m")
    )
    got = {r["id"]: r["in_mis"] for r in out.collect()}
    mis = {v for v, m in got.items() if m}
    nbrs = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    # independent: no edge inside the set
    for v in mis:
        assert not (nbrs[v] & mis), v
    # maximal: every non-member has a member neighbour
    for v in got:
        if v not in mis:
            assert nbrs[v] & mis, v


def test_mis_resumes_identically(spark, tmp_path):
    edges = random_graph(n=80, p=0.05, seed=105, zipf_extra=50)
    full, _ = maximal_independent_set(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "a")
    )
    half, info_h = maximal_independent_set(
        edges_df(spark, edges), max_iter=1, checkpoint_dir=str(tmp_path / "b")
    )
    assert not info_h["converged"]
    rest, info_r = maximal_independent_set(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "b")
    )
    assert info_r["converged"]
    a = {r["id"]: r["in_mis"] for r in full.collect()}
    b = {r["id"]: r["in_mis"] for r in rest.collect()}
    assert a == b
