"""collective_influence (plans/metrics.py) — CI_2 pins:

- bridged-triangles closed form (the bridge endpoints dominate);
- brute-force BFS agreement on a deterministic pseudo-random graph
  (cap chosen above the max degree so the wedge bound never bites);
- hub-cap semantics: a star center above the cap stops mediating
  distance-2 reachability, exactly as the declared-cap oracle does.
"""

from __future__ import annotations

from metis_spark.plans.metrics import collective_influence

from tests.conftest import edges_df


def _brute_ci(pairs, cap=10**9):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    out = {}
    for v in adj:
        ring = set()
        for w in adj[v]:
            if deg[w] > cap:
                continue
            for u in adj[w]:
                if u != v and u not in adj[v]:
                    ring.add(u)
        out[v] = (
            (deg[v] - 1) * sum(deg[u] - 1 for u in ring),
            len(ring),
        )
    return out


def test_bridged_triangles_closed_form(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    rows = {
        r["id"]: r
        for r in collective_influence(edges_df(spark, pairs), k=10).collect()
    }
    # deg(3) = 3, ring(3) = {5, 6} each deg 2 → CI = 2 · (1 + 1) = 4
    assert rows[3]["ci"] == 4 and rows[3]["n_ball2"] == 2
    # deg(1) = 2, ring(1) = {4} deg 3 → CI = 1 · 2 = 2
    assert rows[1]["ci"] == 2 and rows[1]["n_ball2"] == 1
    assert rows[3]["rn"] == 1  # bridge endpoints outrank everyone


def test_brute_force_agreement(spark):
    pairs = sorted({(i % 23, (i * 7 + 3) % 23) for i in range(60)} | {(i, i + 1) for i in range(0, 22, 3)})
    pairs = [(a, b) for a, b in pairs if a != b]
    want = _brute_ci(pairs)
    got = {
        r["id"]: r
        for r in collective_influence(edges_df(spark, pairs), k=1000).collect()
    }
    assert set(got) == set(want)
    for v, (ci, nring) in want.items():
        assert (got[v]["ci"], got[v]["n_ball2"]) == (ci, nring), v


def test_hub_cap_drops_center(spark):
    # star center 0 with 6 leaves, plus a tail 1-7-8; cap=5 < deg(0)=6
    pairs = [(0, i) for i in range(1, 7)] + [(1, 7), (7, 8)]
    want = _brute_ci(pairs, cap=5)
    got = {
        r["id"]: r
        for r in collective_influence(edges_df(spark, pairs), k=100, hub_cap=5).collect()
    }
    for v, (ci, nring) in want.items():
        assert (got[v]["ci"], got[v]["n_ball2"]) == (ci, nring), v
    # the star center mediates nothing: leaves see no other leaves
    assert got[2]["n_ball2"] == 0
