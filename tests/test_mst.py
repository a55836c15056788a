"""Borůvka minimum spanning forest (plans/mst.py) vs sequential Kruskal.

With the strict total order (weight, s, d) the MSF is unique, so the
distributed Borůvka result must equal union-find Kruskal edge-for-edge.
"""

import pytest
from oracles import random_graph

from metis_spark.plans.mst import minimum_spanning_forest


@pytest.fixture(scope="module")
def spark():
    from metis_spark.session import get_spark

    return get_spark("test_mst", master="local[4]", shuffle_partitions=4)


def wedges_df(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, weight long")


def kruskal(rows):
    """Unique MSF under (w, s, d) order: canonicalize, min-weight per
    parallel pair, sort, union-find."""
    best = {}
    for s, d, w in rows:
        if s == d:
            continue
        a, b = (s, d) if s < d else (d, s)
        if (a, b) not in best or w < best[(a, b)]:
            best[(a, b)] = w
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for (a, b), w in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            forest.add((a, b, w))
    return forest


def hash_weight(a, b):
    import hashlib

    s, d = (a, b) if a < b else (b, a)
    return int(hashlib.md5(f"{s}_{d}".encode()).hexdigest()[:15], 16)


def run(spark, rows, **kw):
    out, info = minimum_spanning_forest(wedges_df(spark, rows), **kw)
    assert info["converged"], info
    got = {(r["src"], r["dst"], r["weight"]) for r in out.collect()}
    return got, info


def test_msf_matches_kruskal_random(spark):
    pairs = random_graph(n=80, p=0.07, seed=7, zipf_extra=40)
    rows = [(s, d, hash_weight(s, d)) for s, d in pairs]
    got, info = run(spark, rows)
    want = kruskal(rows)
    assert got == want
    assert info["msf_edges"] == len(want)
    verts = {v for s, d in pairs if s != d for v in (s, d)}
    assert info["components"] == len(verts) - len(want)


def test_msf_two_components_and_ties(spark):
    """Two disjoint cliques with ALL-EQUAL weights: the (s, d) tie-break
    still yields the unique lexicographic MSF; one tree per component."""
    import itertools

    k4a = [(a, b, 5) for a, b in itertools.combinations(range(4), 2)]
    k4b = [(a, b, 5) for a, b in itertools.combinations(range(10, 14), 2)]
    rows = k4a + k4b
    got, info = run(spark, rows)
    assert got == kruskal(rows)
    assert info["components"] == 2
    assert info["msf_edges"] == 6


def test_msf_parallel_edges_self_loops_directed_dupes(spark):
    """Parallel edges keep the min weight; self-loops are dropped;
    reverse duplicates canonicalize."""
    rows = [(0, 1, 9), (1, 0, 3), (1, 2, 4), (2, 2, 1), (0, 2, 8)]
    got, _ = run(spark, rows)
    assert got == kruskal(rows) == {(0, 1, 3), (1, 2, 4)}


def test_msf_resume_identical(spark, tmp_path):
    """A run resumed from a mid-algorithm checkpoint returns the same
    forest as the cold run."""
    pairs = random_graph(n=60, p=0.08, seed=21, zipf_extra=30)
    rows = [(s, d, hash_weight(s, d)) for s, d in pairs]
    cold, _ = run(spark, rows)
    d = str(tmp_path / "ck")
    partial, pinfo = minimum_spanning_forest(
        wedges_df(spark, rows), max_rounds=1, checkpoint_dir=d
    )
    assert not pinfo["converged"]
    rest, info = run(spark, rows, checkpoint_dir=d)
    assert rest == cold == kruskal(rows)


def test_affinity_clusters_levels(spark):
    """Level-1 affinity clusters = components of the min-incident-edge
    graph; a deep level saturates to the connected components."""
    from metis_spark.plans.mst import affinity_clusters

    pairs = random_graph(n=50, p=0.08, seed=37, zipf_extra=25)
    rows = [(s, d, hash_weight(s, d)) for s, d in pairs]
    df = wedges_df(spark, rows)

    # python twin: canonical min-weight edges, each vertex picks min
    best = {}
    for s, d, w in rows:
        if s == d:
            continue
        a, b = (s, d) if s < d else (d, s)
        if (a, b) not in best or w < best[(a, b)]:
            best[(a, b)] = w
    inc = {}
    for (a, b), w in best.items():
        for v, o in ((a, b), (b, a)):
            if v not in inc or (w, *sorted((v, o))) < inc[v][0]:
                inc[v] = ((w, min(v, o), max(v, o)), o)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for v, (_, o) in inc.items():
        ra, rb = find(v), find(o)
        if ra != rb:
            parent[ra] = rb
    verts = {v for a, b in best for v in (a, b)}
    want = {}
    comp = {}
    for v in sorted(verts):
        comp.setdefault(find(v), []).append(v)
    for members in comp.values():
        m = min(members)
        for v in members:
            want[v] = m

    out, _ = affinity_clusters(df, level=1)
    got = {r["id"]: r["cluster"] for r in out.collect()}
    assert got == want

    deep, _ = affinity_clusters(df, level=20)
    got_deep = {r["id"]: r["cluster"] for r in deep.collect()}
    n_clusters = len(set(got_deep.values()))
    # saturated clusters == connected components (via kruskal forest size)
    forest = kruskal(rows)
    assert n_clusters == len(verts) - len(forest)
