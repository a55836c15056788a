"""five_clique_profile (plans/triangles.py) vs an itertools brute force
over every 3/4/5-vertex subset — pins the kClist ordered enumeration one
level past the 4-clique test (each clique generated exactly once from
its lowest-order vertices)."""

import itertools
import random

from conftest import edges_df

from metis_spark.plans.triangles import five_clique_profile


def _brute(edges):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    verts = sorted(adj)

    def cliques(k):
        n = 0
        for sub in itertools.combinations(verts, k):
            if all(b in adj[a] for a, b in itertools.combinations(sub, 2)):
                n += 1
        return n

    return cliques(3), cliques(4), cliques(5)


def test_five_clique_known(spark):
    # K5 has C(5,3)=10 triangles, C(5,4)=5 4-cliques, 1 5-clique;
    # plus a disjoint K4 (4, 1, 0) and a triangle (1, 0, 0)
    k5 = list(itertools.combinations(range(5), 2))
    k4 = list(itertools.combinations(range(10, 14), 2))
    tri = [(20, 21), (21, 22), (20, 22)]
    row = five_clique_profile(edges_df(spark, k5 + k4 + tri)).collect()[0]
    assert (row["triangles"], row["four_cliques"], row["five_cliques"]) == (15, 6, 1)


def test_five_clique_matches_bruteforce_random(spark):
    rng = random.Random(7)
    n = 16
    edges = [
        (a, b)
        for a, b in itertools.combinations(range(n), 2)
        if rng.random() < 0.45
    ]
    row = five_clique_profile(edges_df(spark, edges)).collect()[0]
    assert (
        row["triangles"], row["four_cliques"], row["five_cliques"]
    ) == _brute(edges)
