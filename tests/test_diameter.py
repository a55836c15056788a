"""Double-sweep diameter bound (plans/sssp.py) vs a pure-Python twin."""

import collections

from conftest import edges_df
from oracles import random_graph

from metis_spark.plans.sssp import diameter_double_sweep


def py_double_sweep(edges):
    nbrs = collections.defaultdict(set)
    deg = collections.Counter()
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    for v, s in nbrs.items():
        deg[v] = len(s)
    start = min(deg, key=lambda v: (-deg[v], v))

    def bfs(s):
        dist = {s: 0}
        dq = collections.deque([s])
        while dq:
            u = dq.popleft()
            for v in nbrs[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        return dist

    d1 = bfs(start)
    far = min(d1, key=lambda v: (-d1[v], v))
    d2 = bfs(far)
    return start, d1[far], far, max(d2.values())


def test_double_sweep_matches_python(spark, tmp_path):
    edges = random_graph(n=150, p=0.015, seed=111, zipf_extra=60)
    out, info = diameter_double_sweep(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "d")
    )
    row = out.collect()[0]
    start, ecc1, far, lb = py_double_sweep(edges)
    assert (row["start_id"], row["ecc_start"], row["far_id"], row["diameter_lb"]) == (
        start, ecc1, far, lb,
    )
    assert info["converged"]
    assert row["diameter_lb"] >= row["ecc_start"]


def test_double_sweep_path_graph_exact(spark, tmp_path):
    """On a path the bound is tight: start lands mid-path (max degree,
    min id tie-break), the far end is an endpoint, and the second sweep
    spans the whole path."""
    edges = [(i, i + 1) for i in range(10)]
    out, info = diameter_double_sweep(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "p")
    )
    row = out.collect()[0]
    assert row["diameter_lb"] == 10
    assert info["converged"]
