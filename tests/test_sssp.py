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


def _dijkstra_oracle(wedges, sources):
    import heapq

    adj = collections.defaultdict(list)
    for s, d, w in wedges:
        adj[s].append((d, w))
    dist = {s: 0 for s in sources}
    pq = [(0, s) for s in sources]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, float("inf")):
            continue
        for v, w in adj[u]:
            nd = du + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_weighted_matches_dijkstra_oracle(spark, tmp_path):
    from pyspark.sql import functions as F

    from metis_spark.plans.sssp import shortest_paths

    g = random_graph(n=60, p=0.05, seed=81)
    wedges = [(s, d, (s * 7 + d * 13) % 10 + 1) for s, d in g]
    e = spark.createDataFrame(wedges, "src long, dst long, w long")
    dists, info = shortest_paths(
        e, sources=[0], checkpoint_dir=str(tmp_path / "w"), weight_col="w"
    )
    assert info["converged"]
    got = {r["id"]: r["dist"] for r in dists.collect()}
    assert got == _dijkstra_oracle(wedges, [0])
    # a weighted geodesic that beats the hop-count geodesic must exist in a
    # graph with weight spread, otherwise this test proves nothing
    hops, _ = shortest_paths(e, sources=[0], checkpoint_dir=str(tmp_path / "h"))
    hop_d = {r["id"]: r["dist"] for r in hops.collect()}
    assert any(got[v] != hop_d[v] for v in got)


def test_weighted_resume(spark, tmp_path):
    from metis_spark.plans.sssp import shortest_paths

    g = random_graph(n=60, p=0.05, seed=82)
    wedges = [(s, d, (s * 5 + d * 3) % 7 + 1) for s, d in g]
    e = spark.createDataFrame(wedges, "src long, dst long, w long")
    full, _ = shortest_paths(e, sources=[0], checkpoint_dir=str(tmp_path / "f"), weight_col="w")
    shortest_paths(e, sources=[0], checkpoint_dir=str(tmp_path / "p"), weight_col="w", max_iter=2)
    resumed, info = shortest_paths(e, sources=[0], checkpoint_dir=str(tmp_path / "p"), weight_col="w")
    assert info["converged"]
    a = {r["id"]: r["dist"] for r in full.collect()}
    b = {r["id"]: r["dist"] for r in resumed.collect()}
    assert a == b


def test_landmark_distances_vs_python_bfs(spark, tmp_path):
    from collections import deque

    from metis_spark.plans.sssp import landmark_distances
    from oracles import random_graph

    edges = random_graph(n=60, p=0.05, seed=41, zipf_extra=30)
    adj = {}
    for s, t in edges:
        adj.setdefault(s, []).append(t)
    sources = [0, 1, 2]
    want = {}
    for s in sources:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        for v, d in dist.items():
            want[(v, s)] = d
    dists, info = landmark_distances(
        edges_df(spark, edges), sources, checkpoint_dir=str(tmp_path),
    )
    got = {(r["id"], r["source"]): r["dist"] for r in dists.collect()}
    assert got == want and info["converged"]


def test_landmark_resume_identical(spark, tmp_path):
    from metis_spark.plans.sssp import landmark_distances
    from oracles import random_graph

    edges = random_graph(n=40, p=0.07, seed=43, zipf_extra=20)
    full, _ = landmark_distances(
        edges_df(spark, edges), [0, 1], checkpoint_dir=str(tmp_path / "a"),
    )
    landmark_distances(
        edges_df(spark, edges), [0, 1], checkpoint_dir=str(tmp_path / "b"),
        max_iter=2,
    )
    resumed, _ = landmark_distances(
        edges_df(spark, edges), [0, 1], checkpoint_dir=str(tmp_path / "b"),
    )
    a = {(r["id"], r["source"]): r["dist"] for r in full.collect()}
    b = {(r["id"], r["source"]): r["dist"] for r in resumed.collect()}
    assert a == b


def test_center_landmarks_vs_python(spark, tmp_path):
    """Top-k center candidates = smallest max-landmark-distance among
    vertices reached by EVERY landmark, ties by id."""
    from collections import deque

    from metis_spark.plans.sssp import center_landmarks
    from oracles import random_graph

    edges = random_graph(n=60, p=0.06, seed=47, zipf_extra=30)
    adj = {}
    for s, t in edges:
        adj.setdefault(s, []).append(t)
    sources = [0, 1, 2]
    dist = {}
    for s in sources:
        d = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            for v in adj.get(u, []):
                if v not in d:
                    d[v] = d[u] + 1
                    dq.append(v)
        for v, dd in d.items():
            dist.setdefault(v, {})[s] = dd
    full = {v: max(ds.values()) for v, ds in dist.items() if len(ds) == 3}
    want = sorted(full.items(), key=lambda kv: (kv[1], kv[0]))[:5]
    out = center_landmarks(
        edges_df(spark, edges), sources, k=5, checkpoint_dir=str(tmp_path)
    )
    got = [(r["id"], r["ecc_lb"]) for r in out.orderBy("rn").collect()]
    assert got == want


def test_widest_paths_golden_and_oracle(spark, tmp_path):
    import heapq

    from metis_spark.plans.sssp import WIDEST_INF, widest_paths

    # golden: two routes 0->3, bottlenecks 2 (via 1) and 5 (via 4,5)
    golden = [(0, 1, 2), (1, 3, 9), (0, 4, 5), (4, 5, 7), (5, 3, 6)]
    e = spark.createDataFrame(golden, "src long, dst long, w long")
    caps, info = widest_paths(
        e, sources=[0], weight_col="w", checkpoint_dir=str(tmp_path / "g")
    )
    got = {r["id"]: r["cap"] for r in caps.collect()}
    assert info["converged"]
    assert got == {0: WIDEST_INF, 1: 2, 4: 5, 5: 5, 3: 5}

    # random graph vs max-min Dijkstra oracle
    g = random_graph(n=60, p=0.05, seed=81)
    wedges = [(s, d, (s * 7 + d * 13) % 10 + 1) for s, d in g]
    best = {0: WIDEST_INF}
    pq = [(-WIDEST_INF, 0)]
    adj = collections.defaultdict(list)
    for s, d, w in wedges:
        adj[s].append((d, w))
    while pq:
        ncap, u = heapq.heappop(pq)
        if -ncap < best.get(u, -1):
            continue
        for v, w in adj[u]:
            c = min(-ncap, w)
            if c > best.get(v, -1):
                best[v] = c
                heapq.heappush(pq, (-c, v))
    e = spark.createDataFrame(wedges, "src long, dst long, w long")
    caps, info = widest_paths(
        e, sources=[0], weight_col="w", checkpoint_dir=str(tmp_path / "r")
    )
    assert info["converged"]
    assert {r["id"]: r["cap"] for r in caps.collect()} == best
