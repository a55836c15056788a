"""Brandes betweenness (plans/betweenness.py) vs a pure-Python oracle."""

import collections

import pytest

from conftest import edges_df
from oracles import random_graph

from metis_spark.plans.betweenness import betweenness_approx


def py_brandes(edges, sources, directed=True):
    """Textbook Brandes restricted to `sources` (directed). Returns
    {v: sum_of_deltas} over every vertex reached from >= 1 source."""
    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        if not directed:
            adj[b].append(a)
    bc = collections.defaultdict(float)
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        preds = collections.defaultdict(list)
        dq = collections.deque([s])
        while dq:
            u = dq.popleft()
            order.append(u)
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] = sigma.get(v, 0.0) + sigma[u]
                    preds[v].append(u)
        delta = collections.defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
            else:
                bc[w] += 0.0  # reached vertex, zero contribution row
    return dict(bc)


def _got(df):
    return {r["id"]: r["betweenness"] for r in df.collect()}


def test_path_graph_golden(spark):
    # directed path 0->1->2->3->4, all 5 sources: bc(v) = pairs through v
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    bc, info = betweenness_approx(edges_df(spark, edges), [0, 1, 2, 3, 4])
    assert _got(bc) == {1: 3.0, 2: 4.0, 3: 3.0, 4: 0.0}
    assert info["depth"] == 4


def test_diamond_splits_paths(spark):
    # 0->{1,2}->3: two shortest paths, each mid vertex gets 0.5 from s=0
    edges = [(0, 1), (0, 2), (1, 3), (2, 3)]
    bc, _ = betweenness_approx(edges_df(spark, edges), [0])
    assert _got(bc) == {1: 0.5, 2: 0.5, 3: 0.0}


def test_random_vs_python_oracle_all_sources(spark):
    edges = random_graph(n=40, p=0.08, seed=61, zipf_extra=30)
    sources = sorted({a for a, _ in edges} | {b for _, b in edges})
    bc, info = betweenness_approx(edges_df(spark, edges), sources)
    want = py_brandes(edges, sources)
    got = _got(bc)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(round(want[v], 6), abs=1e-6), v


def test_random_subset_sources(spark):
    edges = random_graph(n=60, p=0.06, seed=67, zipf_extra=40)
    sources = sorted({a for a, _ in edges})[:6]
    bc, _ = betweenness_approx(edges_df(spark, edges), sources)
    want = py_brandes(edges, sources)
    got = _got(bc)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(round(want[v], 6), abs=1e-6), v


def py_brandes_edges(edges, sources):
    """Edge-betweenness twin of py_brandes (directed DAG edges)."""
    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
    ebc = collections.defaultdict(float)
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        preds = collections.defaultdict(list)
        dq = collections.deque([s])
        while dq:
            u = dq.popleft()
            order.append(u)
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] = sigma.get(v, 0.0) + sigma[u]
                    preds[v].append(u)
        delta = collections.defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                c = sigma[v] / sigma[w] * (1.0 + delta[w])
                delta[v] += c
                ebc[(v, w)] += c
    return dict(ebc)


def test_edge_betweenness_path_golden(spark):
    """P5 from source 0: edge (i,i+1) carries the 4-i downstream targets."""
    from metis_spark.plans.betweenness import edge_betweenness_approx

    edges = [(i, i + 1) for i in range(4)]
    ebc, _ = edge_betweenness_approx(edges_df(spark, edges), [0])
    got = {(r["src"], r["dst"]): r["betweenness"] for r in ebc.collect()}
    assert got == {(0, 1): 4.0, (1, 2): 3.0, (2, 3): 2.0, (3, 4): 1.0}


def test_edge_betweenness_vs_python_oracle(spark):
    from metis_spark.plans.betweenness import edge_betweenness_approx

    edges = random_graph(n=40, p=0.08, seed=61, zipf_extra=30)
    sources = sorted({a for a, _ in edges})[:8]
    ebc, _ = edge_betweenness_approx(edges_df(spark, edges), sources)
    want = py_brandes_edges(edges, sources)
    got = {(r["src"], r["dst"]): r["betweenness"] for r in ebc.collect()}
    assert set(got) == set(want)
    for e in want:
        assert got[e] == pytest.approx(round(want[e], 6), abs=1e-6), e
    # multi-edge parity: duplicate raw edges must not double-count (the
    # DAG edge set is over the distinct derived edge table)


def test_shortest_path_counts_vs_bfs_oracle(spark):
    from metis_spark.plans.betweenness import shortest_path_counts

    edges = random_graph(n=40, p=0.08, seed=61, zipf_extra=30)
    sources = sorted({a for a, _ in edges})[:4]
    out, _ = shortest_path_counts(edges_df(spark, edges), sources)
    got = {(r["source"], r["id"]): (r["dist"], r["n_paths"]) for r in out.collect()}

    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
    want = {}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        dq = collections.deque([s])
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] = sigma.get(v, 0) + sigma[u]
        for v in dist:
            want[(s, v)] = (dist[v], sigma[v])
    assert got == want
