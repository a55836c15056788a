"""ANF neighborhood function: exact baseline semantics, FM-sketch
accuracy gate, determinism, and the effective-diameter contract."""

import pytest
from pyspark.sql import functions as F

from metis_spark.plans.anf import (
    anf_sketch,
    effective_diameter,
    neighborhood_function,
)
from tests.conftest import edges_df

# path graph 0→1→2→3 plus a disconnected edge 4→5
PATH = [(0, 1), (1, 2), (2, 3), (4, 5)]


def test_exact_path_graph(spark):
    nf = {
        r["t"]: r["pairs"]
        for r in neighborhood_function(edges_df(spark, PATH), rounds=3).collect()
    }
    # t=0: 6 self-pairs; each round extends every chain prefix by one hop
    assert nf[0] == 6
    assert nf[1] == 6 + 4  # 0→1,1→2,2→3,4→5
    assert nf[2] == 10 + 2  # 0⇒2, 1⇒3
    assert nf[3] == 12 + 1  # 0⇒3


def test_exact_matches_bruteforce_reach(spark):
    """N(t) on a small random-ish graph vs a python BFS oracle."""
    import itertools

    pairs = [((a * 7 + 3) % 23, (a * 11 + 5) % 23) for a in range(40)]
    pairs = [(s, d) for s, d in pairs if s != d]
    nf = {
        r["t"]: r["pairs"]
        for r in neighborhood_function(edges_df(spark, pairs), rounds=3).collect()
    }
    adj = {}
    verts = set(itertools.chain.from_iterable(pairs))
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
    for t in range(4):
        total = 0
        for v in verts:
            ball = {v}
            for _ in range(t):
                ball = ball | {w for u in ball for w in adj.get(u, ())}
            total += len(ball)
        assert nf[t] == total, t


def test_sketch_tracks_exact_within_20pct(spark):
    """The FM estimate follows the exact curve for t ≥ 1 (t=0 singleton
    balls are the documented small-range bias of raw FM)."""
    from __spark_entry__ import derived_edges_sparse

    e = derived_edges_sparse(spark, "/root/testdata/sf0.001")
    exact = {
        r["t"]: r["pairs"] for r in neighborhood_function(e, rounds=3).collect()
    }
    est = {
        r["t"]: r["nf"]
        for r in anf_sketch(e, rounds=3)
        .groupBy("t")
        .agg(F.sum("est").alias("nf"))
        .collect()
    }
    for t in range(1, 4):
        rel = abs(est[t] - exact[t]) / exact[t]
        assert rel < 0.20, (t, est[t], exact[t])


def test_sketch_deterministic_and_monotone(spark):
    e = edges_df(spark, PATH + [(5, 0), (3, 4)])
    a = sorted(map(tuple, anf_sketch(e, rounds=2, num_masks=8).collect()))
    b = sorted(map(tuple, anf_sketch(e, rounds=2, num_masks=8).collect()))
    assert a == b
    # sum_r per vertex never decreases with t (balls only grow)
    per_v = {}
    for t, vid, sum_r, _ in a:
        per_v.setdefault(vid, {})[t] = sum_r
    for vid, curve in per_v.items():
        assert curve[0] <= curve[1] <= curve[2], (vid, curve)


def test_effective_diameter_contract(spark):
    """On a path graph the sketch curve keeps growing through the
    horizon, so the effective diameter is the horizon itself; on a
    single edge it saturates at t=1."""
    out = effective_diameter(
        edges_df(spark, [(0, 1)]), rounds=3, num_masks=16
    ).collect()[0]
    assert out["eff_diameter"] in (0, 1)
    path = effective_diameter(
        edges_df(spark, [(i, i + 1) for i in range(8)]), rounds=3, num_masks=16
    ).collect()[0]
    assert path["eff_diameter"] >= 2
