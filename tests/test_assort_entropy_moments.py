"""directed_assortativity / walk_entropy_rate / spectral_moments
(plans/metrics.py) — hand-computed pins plus a numpy cross-check.

Directed triangle 1→2, 1→3, 2→3: per-edge degree tuples give
r(out_in) = −0.5, r(out_out) = r(in_in) = 0.5, r(in_out) = −0.5
(verified against numpy.corrcoef in-test).

Triangle {1,2,3} + pendant 3−4: degrees (2,2,3,1), m = 4 —
entropy rate = (2·2·ln2 + 3·ln3)/8 in micro-nat quantization;
trace(A²)=8, trace(A³)=6·1, trace(A⁴)= Σdeg² + Σ n_ij² = 18 + 10 = 28.
"""

from __future__ import annotations

import math

from metis_spark.plans.metrics import (
    directed_assortativity,
    spectral_moments,
    walk_entropy_rate,
)

from tests.conftest import edges_df


def test_directed_assortativity_hand_and_numpy(spark):
    edges = [(1, 2), (1, 3), (2, 3)]
    got = {r["mode"]: r for r in directed_assortativity(edges_df(spark, edges)).collect()}
    assert all(r["n_edges"] == 3 for r in got.values())
    assert got["out_in"]["r"] == -0.5
    assert got["out_out"]["r"] == 0.5
    assert got["in_in"]["r"] == 0.5
    assert got["in_out"]["r"] == -0.5
    # numpy cross-check of the same four correlations
    import numpy as np

    od = {1: 2, 2: 1, 3: 0}
    idg = {1: 0, 2: 1, 3: 2}
    cols = {
        "out_in": ([od[s] for s, _ in edges], [idg[t] for _, t in edges]),
        "out_out": ([od[s] for s, _ in edges], [od[t] for _, t in edges]),
        "in_in": ([idg[s] for s, _ in edges], [idg[t] for _, t in edges]),
        "in_out": ([idg[s] for s, _ in edges], [od[t] for _, t in edges]),
    }
    for mode, (x, y) in cols.items():
        assert abs(got[mode]["r"] - float(np.corrcoef(x, y)[0, 1])) < 1e-6


def test_walk_entropy_rate_hand(spark):
    out = walk_entropy_rate(
        edges_df(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    ).collect()[0]
    assert out["n_vertices"] == 4 and out["n_und_edges"] == 4
    s = 2 * 2 * round(math.log(2) * 1e6) + 3 * round(math.log(3) * 1e6)
    assert out["entropy_micro_sum"] == s
    assert out["entropy_rate"] == round(s / 8 / 1e6, 6)


def test_walk_entropy_regular_graph_is_log_d(spark):
    # on a d-regular graph the rate is exactly ln d (4-cycle: d = 2)
    out = walk_entropy_rate(
        edges_df(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    ).collect()[0]
    assert out["entropy_rate"] == round(round(math.log(2) * 1e6) / 1e6, 6)


def test_spectral_moments_triangle_pendant(spark):
    out = spectral_moments(
        edges_df(spark, [(1, 2), (2, 3), (3, 1), (3, 4)]), hub_cap=128
    ).collect()[0]
    assert out["n_vertices"] == 4 and out["n_edges"] == 4
    assert out["closed_walks_2"] == 8
    assert out["closed_walks_3"] == 6
    assert out["closed_walks_4"] == 28  # 18 (Σdeg²) + 10 (Σ n_ij²)


def test_spectral_moments_hub_cap_binds(spark):
    # cap 2 drops wedges through the deg-3 center: only the two
    # wedge pairs via centers 1 and 2 remain -> t4 = 18 + 2·2 = 22
    out = spectral_moments(
        edges_df(spark, [(1, 2), (2, 3), (3, 1), (3, 4)]), hub_cap=2
    ).collect()[0]
    assert out["closed_walks_4"] == 22
