"""core_periphery_blocks (plans/metrics.py) — Borgatti-Everett pins:

- K4-plus-pendants closed form (blocks, densities, ρ = 8/28);
- a degenerate all-core graph yields NULL density_cp / be_corr;
- a perfect star-of-cliques... kept simple: the ρ denominator guards.
"""

from __future__ import annotations

from metis_spark.plans.coreness import coreness
from metis_spark.plans.metrics import core_periphery_blocks

from tests.conftest import edges_df


def _run(spark, pairs, tmp_path):
    edges = edges_df(spark, pairs)
    cores, info = coreness(edges, checkpoint_dir=str(tmp_path / "cp"))
    assert info["converged"]
    return core_periphery_blocks(cores, edges).collect()[0]


def test_k4_with_pendants(spark, tmp_path):
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 1), (6, 2)]
    r = _run(spark, pairs, tmp_path)
    assert (r["kmax"], r["n_core"], r["n_periph"]) == (3, 4, 2)
    assert (r["e_cc"], r["e_cp"], r["e_pp"]) == (6, 2, 0)
    assert r["density_cc"] == 1.0
    assert r["density_cp"] == 0.25
    assert r["density_pp"] == 0.0
    # ρ = (m1·N − m·P1)/sqrt(m(N−m)·P1(N−P1)) = (8·15 − 8·14)/sqrt(8·7·14·1)
    assert r["be_corr"] == round(8 / 28, 6)


def test_all_core_degenerate(spark, tmp_path):
    # a triangle: every vertex in the max shell, no periphery
    r = _run(spark, [(1, 2), (2, 3), (1, 3)], tmp_path)
    assert (r["n_core"], r["n_periph"]) == (3, 0)
    assert r["density_cc"] == 1.0
    assert r["density_cp"] is None and r["density_pp"] is None
    assert r["be_corr"] is None  # P1 == N ⇒ zero-variance ideal pattern
