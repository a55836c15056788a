"""Synchronous Louvain local moving (plans/louvain.py) vs a Python twin."""

import collections
from decimal import ROUND_HALF_UP, Decimal

from conftest import edges_df
from oracles import random_graph

from metis_spark.plans.louvain import louvain_local_moving


def _g9(x: float) -> float:
    # Spark F.round semantics: exact binary double -> HALF_UP at 1e-9
    return float(Decimal(x).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP))


def py_local_moving(edges, rounds):
    nbrs = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    verts = sorted(nbrs)
    deg = {v: len(nbrs[v]) for v in verts}
    m = sum(deg.values()) / 2.0
    label = {v: v for v in verts}
    for _ in range(rounds):
        tot = collections.Counter()
        for v in verts:
            tot[label[v]] += deg[v]
        new = {}
        for v in verts:
            kvc = collections.Counter(label[u] for u in nbrs[v])
            kvc.setdefault(label[v], 0)
            best = None
            for c in kvc:
                tc = tot[c] - (deg[v] if c == label[v] else 0)
                g = _g9(kvc[c] / m - (deg[v] * tc) / (2.0 * m * m))
                key = (-g, c)
                if best is None or key < best[0]:
                    best = (key, c)
            new[v] = best[1]
        label = new
    return label


def test_louvain_matches_python_twin(spark, tmp_path):
    edges = random_graph(n=100, p=0.05, seed=131, zipf_extra=80)
    out, info = louvain_local_moving(
        edges_df(spark, edges), rounds=2, checkpoint_dir=str(tmp_path / "l")
    )
    want = py_local_moving(edges, 2)
    got = {r["id"]: r["label"] for r in out.collect()}
    assert got == want
    assert info["iterations"] == 2


def test_louvain_merges_cliques(spark, tmp_path):
    """Two 5-cliques joined by one bridge edge: after 2 rounds each
    clique shares one label and the two labels differ."""
    cl1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    cl2 = [(10 + i, 10 + j) for i in range(5) for j in range(i + 1, 5)]
    edges = cl1 + cl2 + [(0, 10)]
    out, _ = louvain_local_moving(
        edges_df(spark, edges), rounds=2, checkpoint_dir=str(tmp_path / "q")
    )
    got = {r["id"]: r["label"] for r in out.collect()}
    assert got == py_local_moving(edges, 2)
    labs1 = {got[v] for v in range(5)}
    labs2 = {got[v] for v in range(10, 15)}
    assert len(labs1) == 1 and len(labs2) == 1 and labs1 != labs2


def test_louvain_resumes_identically(spark, tmp_path):
    edges = random_graph(n=80, p=0.06, seed=133, zipf_extra=50)
    full, _ = louvain_local_moving(
        edges_df(spark, edges), rounds=3, checkpoint_dir=str(tmp_path / "a")
    )
    louvain_local_moving(
        edges_df(spark, edges), rounds=1, checkpoint_dir=str(tmp_path / "b")
    )
    rest, _ = louvain_local_moving(
        edges_df(spark, edges), rounds=3, checkpoint_dir=str(tmp_path / "b")
    )
    a = {r["id"]: r["label"] for r in full.collect()}
    b = {r["id"]: r["label"] for r in rest.collect()}
    assert a == b
