"""eccentricity_bounds (plans/sssp.py) — Takes-Kosters pins:

- a landmark's own bounds collapse to its exact eccentricity, and end
  landmarks pin the middle of a path exactly;
- bounds always bracket the true eccentricity (brute-force BFS check);
- other components are absent from the output.
"""

from __future__ import annotations

from collections import deque

from metis_spark.plans.sssp import eccentricity_bounds

from tests.conftest import edges_df


def _true_ecc(pairs):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for s in adj:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        out[s] = max(dist.values())
    return out


def test_landmarks_are_tight_and_path_bounds(spark, tmp_path):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]
    got = {
        r["id"]: r
        for r in eccentricity_bounds(
            edges_df(spark, pairs), [0, 4], checkpoint_dir=str(tmp_path / "a")
        ).collect()
    }
    true = _true_ecc(pairs)
    # a landmark's own bounds collapse (d=0 → lower = upper = ecc(L))
    for l in (0, 4):
        assert got[l]["tight"] and got[l]["ecc_lower"] == true[l] == 4
    # every bound brackets the truth; the end landmarks pin the lower
    # bound of the middle vertex exactly (max(d, ecc−d) = 2 at v=2)
    for v, e in true.items():
        assert got[v]["ecc_lower"] <= e <= got[v]["ecc_upper"], v
    assert got[2]["ecc_lower"] == 2


def test_bounds_bracket_truth(spark, tmp_path):
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (2, 6), (6, 7)]
    got = {
        r["id"]: r
        for r in eccentricity_bounds(
            edges_df(spark, pairs), [1, 4], checkpoint_dir=str(tmp_path / "b")
        ).collect()
    }
    true = _true_ecc(pairs)
    for v, e in true.items():
        assert got[v]["ecc_lower"] <= e <= got[v]["ecc_upper"], v


def test_other_component_absent(spark, tmp_path):
    pairs = [(1, 2), (2, 3), (10, 11)]
    got = {
        r["id"]
        for r in eccentricity_bounds(
            edges_df(spark, pairs), [1], checkpoint_dir=str(tmp_path / "c")
        ).collect()
    }
    assert got == {1, 2, 3}
