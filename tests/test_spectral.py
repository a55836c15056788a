"""Katz + eigenvector centrality (plans/spectral.py) vs pure-Python oracles."""

import collections
import math

import pytest

from conftest import edges_df
from oracles import random_graph

from metis_spark.plans.spectral import eigenvector_centrality, katz_centrality


def py_katz(edges, alpha, beta, iters):
    verts = sorted({v for e in edges for v in e})
    x = {v: beta for v in verts}
    in_edges = collections.defaultdict(list)
    for a, b in edges:
        in_edges[b].append(a)
    for _ in range(iters):
        x = {v: beta + alpha * sum(x[u] for u in in_edges[v]) for v in verts}
    return x


def py_eigen(edges, iters):
    und = set()
    for a, b in edges:
        if a != b:
            und.add((a, b))
            und.add((b, a))
    verts = sorted({v for e in und for v in e})
    nbrs = collections.defaultdict(list)
    for a, b in und:
        nbrs[b].append(a)
    x = {v: 1.0 / math.sqrt(len(verts)) for v in verts}
    for _ in range(iters):
        y = {v: sum(x[u] for u in nbrs[v]) for v in verts}
        nrm = math.sqrt(sum(t * t for t in y.values()))
        x = {v: y[v] / nrm for v in verts}
    return x


def test_katz_vs_oracle(spark, tmp_path):
    edges = random_graph(n=60, p=0.06, seed=91, zipf_extra=50)
    scores, info = katz_centrality(
        edges_df(spark, edges), alpha=0.01, beta=1.0, tol=0.0, max_iter=5,
        checkpoint_dir=str(tmp_path / "k"),
    )
    want = py_katz(edges, 0.01, 1.0, 5)
    got = {r["id"]: r["katz"] for r in scores.collect()}
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-10), v
    assert info["iterations"] == 5


def test_katz_converges_and_resumes(spark, tmp_path):
    edges = random_graph(n=50, p=0.08, seed=92, zipf_extra=30)
    full, info = katz_centrality(
        edges_df(spark, edges), alpha=0.01, tol=1e-12, max_iter=60,
        checkpoint_dir=str(tmp_path / "a"),
    )
    assert info["converged"]
    # resume from the midpoint of a second dir must land on identical state
    half, _ = katz_centrality(
        edges_df(spark, edges), alpha=0.01, tol=0.0,
        max_iter=max(2, info["iterations"] // 2),
        checkpoint_dir=str(tmp_path / "b"),
    )
    rest, info2 = katz_centrality(
        edges_df(spark, edges), alpha=0.01, tol=1e-12, max_iter=60,
        checkpoint_dir=str(tmp_path / "b"),
    )
    a = {r["id"]: r["katz"] for r in full.collect()}
    b = {r["id"]: r["katz"] for r in rest.collect()}
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-12), v


def test_eigenvector_vs_oracle(spark, tmp_path):
    edges = random_graph(n=60, p=0.06, seed=93, zipf_extra=50)
    scores, info = eigenvector_centrality(
        edges_df(spark, edges), tol=0.0, max_iter=5,
        checkpoint_dir=str(tmp_path / "e"),
    )
    want = py_eigen(edges, 5)
    got = {r["id"]: r["score"] for r in scores.collect()}
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-10), v
    nrm = math.sqrt(sum(t * t for t in got.values()))
    assert nrm == pytest.approx(1.0, abs=1e-9)


def test_eigenvector_converges_to_principal(spark, tmp_path):
    """Long power iteration matches a long python power iteration (the
    principal eigenvector) and the lagged delta actually triggers stop."""
    edges = random_graph(n=40, p=0.10, seed=94, zipf_extra=30)
    scores, info = eigenvector_centrality(
        edges_df(spark, edges), tol=1e-10, max_iter=300,
        checkpoint_dir=str(tmp_path / "c"),
    )
    assert info["converged"]
    assert info["iterations"] < 300
    want = py_eigen(edges, 400)
    got = {r["id"]: r["score"] for r in scores.collect()}
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6), v


def py_fiedler(pairs, n_iters=20, S=10_000):
    import hashlib

    nbrs = {}
    for a, b in pairs:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    c = max(deg.values()) + 1
    n = len(deg)

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def rha(x):  # round half away from zero (Spark/DuckDB ROUND)
        import math

        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    v = {i: h60(f"fv{i}") % (2 * S + 1) - S for i in nbrs}
    for _ in range(n_iters):
        w = {
            i: (c - deg[i]) * v[i] + sum(v[j] for j in nbrs[i]) for i in nbrs
        }
        mbar = rha(sum(w.values()) / n)
        u = {i: w[i] - mbar for i in nbrs}
        mx = max(max(u.values()), -min(u.values()))
        v = {i: (rha(u[i] * S / mx) if mx > 0 else 0) for i in nbrs}
    return {i: (v[i], 1 if v[i] > 0 else 0) for i in nbrs}


def test_fiedler_matches_python_replay(spark):
    from metis_spark.plans.spectral import fiedler_bipartition

    pairs = random_graph(n=60, p=0.07, seed=47, zipf_extra=40)
    out, info = fiedler_bipartition(edges_df(spark, pairs), n_iters=12)
    got = {r["id"]: (r["v"], r["side"]) for r in out.collect()}
    assert got == py_fiedler(pairs, n_iters=12)
    assert 0 < info["n_pos"] < info["n"]


def test_fiedler_separates_planted_cliques(spark):
    from metis_spark.plans.spectral import fiedler_bipartition

    from itertools import combinations

    k8a = list(combinations(range(8), 2))
    k8b = list(combinations(range(100, 108), 2))
    pairs = k8a + k8b + [(7, 100)]
    out, info = fiedler_bipartition(edges_df(spark, pairs), n_iters=20)
    side = {r["id"]: r["side"] for r in out.collect()}
    assert len({side[i] for i in range(8)}) == 1
    assert len({side[i] for i in range(100, 108)}) == 1
    assert side[0] != side[100]
