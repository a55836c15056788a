"""BFS hop distances vs a pure-Python oracle + resume."""

import collections

from conftest import edges_df
from metis_spark.plans.sssp import shortest_hops
from oracles import random_graph


def _bfs_oracle(edge_list, sources, directed=True):
    adj = collections.defaultdict(list)
    for s, d in edge_list:
        adj[s].append(d)
        if not directed:
            adj[d].append(s)
    dist = {s: 0 for s in sources}
    q = collections.deque(sources)
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_hops_match_bfs_oracle(spark, tmp_path):
    g = random_graph(n=60, p=0.05, seed=77)
    dists, info = shortest_hops(
        edges_df(spark, g), sources=[0], checkpoint_dir=str(tmp_path / "a")
    )
    assert info["converged"]
    got = {r["id"]: r["dist"] for r in dists.collect()}
    assert got == _bfs_oracle(g, [0])


def test_undirected_and_multi_source(spark, tmp_path):
    g = random_graph(n=50, p=0.04, seed=78)
    dists, info = shortest_hops(
        edges_df(spark, g), sources=[0, 7], directed=False,
        checkpoint_dir=str(tmp_path / "b"),
    )
    assert info["converged"]
    got = {r["id"]: r["dist"] for r in dists.collect()}
    assert got == _bfs_oracle(g, [0, 7], directed=False)


def test_sssp_resume(spark, tmp_path):
    g = random_graph(n=60, p=0.05, seed=79)
    e = edges_df(spark, g)
    full, _ = shortest_hops(e, sources=[0], checkpoint_dir=str(tmp_path / "f"))
    shortest_hops(e, sources=[0], checkpoint_dir=str(tmp_path / "p"), max_iter=2)
    resumed, info = shortest_hops(e, sources=[0], checkpoint_dir=str(tmp_path / "p"))
    assert info["converged"]
    a = {r["id"]: r["dist"] for r in full.collect()}
    b = {r["id"]: r["dist"] for r in resumed.collect()}
    assert a == b
