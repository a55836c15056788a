"""Jones–Plassmann coloring (plans/coloring.py) vs a pure-Python twin."""

import collections

from conftest import edges_df
from oracles import random_graph

from metis_spark.plans.coloring import greedy_coloring
from metis_spark.plans.mis import MIS_HASH_MOD, MIS_HASH_MULT


def py_greedy_h_order(edges):
    """Sequential greedy coloring in increasing-hash order — the exact
    coloring Jones–Plassmann produces (each vertex decides after all
    smaller-h neighbours)."""
    h = lambda v: (v * MIS_HASH_MULT) % MIS_HASH_MOD
    nbrs = collections.defaultdict(set)
    verts = set()
    for a, b in edges:
        verts.add(a)
        verts.add(b)
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    color = {}
    for v in sorted(verts, key=h):
        used = {color[u] for u in nbrs[v] if u in color}
        c = 0
        while c in used:
            c += 1
        color[v] = c
    return color


def test_coloring_matches_sequential_greedy(spark, tmp_path):
    edges = random_graph(n=120, p=0.04, seed=121, zipf_extra=80)
    out, info = greedy_coloring(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "c")
    )
    want = py_greedy_h_order(edges)
    got = {r["id"]: r["color"] for r in out.collect()}
    assert got == want
    assert info["converged"]
    assert info["n_colors"] == max(want.values()) + 1


def test_coloring_is_proper(spark, tmp_path):
    edges = random_graph(n=90, p=0.08, seed=123, zipf_extra=70)
    out, info = greedy_coloring(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "c")
    )
    got = {r["id"]: r["color"] for r in out.collect()}
    deg = collections.Counter()
    for a, b in edges:
        if a != b:
            assert got[a] != got[b], (a, b)
            deg[a] += 1
            deg[b] += 1
    # greedy bound: at most max-degree + 1 colors
    assert info["n_colors"] <= max(deg.values()) + 1


def test_coloring_resumes_identically(spark, tmp_path):
    edges = random_graph(n=80, p=0.05, seed=125, zipf_extra=40)
    full, _ = greedy_coloring(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "a")
    )
    _, info_h = greedy_coloring(
        edges_df(spark, edges), max_iter=1, checkpoint_dir=str(tmp_path / "b")
    )
    assert not info_h["converged"]
    rest, info_r = greedy_coloring(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "b")
    )
    assert info_r["converged"]
    a = {r["id"]: r["color"] for r in full.collect()}
    b = {r["id"]: r["color"] for r in rest.collect()}
    assert a == b


def test_speculative_valid_and_delta_bound(spark, tmp_path):
    """Trial-and-revoke: proper coloring, per-vertex color <= deg(v),
    and full convergence on a random graph + a dense clique."""
    import itertools

    from metis_spark.plans.coloring import speculative_coloring
    from pyspark.sql import functions as F

    k8 = [(a, b) for a, b in itertools.combinations(range(8), 2)]
    extra = random_graph(n=80, p=0.06, seed=5, zipf_extra=15)
    pairs = k8 + extra
    df = edges_df(spark, pairs)
    out, info = speculative_coloring(df, checkpoint_dir=str(tmp_path / "a"))
    assert info["converged"], info
    colors = {r["id"]: r["color"] for r in out.collect()}
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for a, b in und:
        assert colors[a] != colors[b], (a, b)
    for v, c in colors.items():
        assert 0 <= c <= deg[v], (v, c, deg[v])


def test_speculative_resume_identical(spark, tmp_path):
    from metis_spark.plans.coloring import speculative_coloring

    pairs = random_graph(n=60, p=0.05, seed=9, zipf_extra=10)
    d = str(tmp_path / "ck")
    a, info1 = speculative_coloring(edges_df(spark, pairs), checkpoint_dir=d)
    first = {r["id"]: r["color"] for r in a.collect()}
    b, info2 = speculative_coloring(edges_df(spark, pairs), checkpoint_dir=d)
    assert info2.get("resumed")
    assert {r["id"]: r["color"] for r in b.collect()} == first
