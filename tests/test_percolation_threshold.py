"""percolation_threshold (plans/metrics.py) — Molloy-Reed pins:

- a cycle sits exactly AT the κ = 2 critical point (not supercritical,
  f_c = 0: any finite failure rate kills the ring);
- a clique K5 gives κ = 4, f_c = 2/3;
- a star's hub drives κ above 2 even though most vertices are leaves.
"""

from __future__ import annotations

from metis_spark.plans.metrics import percolation_threshold

from tests.conftest import edges_df


def _run(spark, pairs):
    return percolation_threshold(edges_df(spark, pairs)).collect()[0]


def test_cycle_is_critical(spark):
    r = _run(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    assert (r["n"], r["m"], r["sum_d"], r["sum_d2"]) == (4, 4, 8, 16)
    assert r["kappa"] == 2.0
    assert r["f_c"] == 0.0
    assert not r["supercritical"]  # strict: κ > 2 fails at exactly 2


def test_clique_closed_form(spark):
    pairs = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    r = _run(spark, pairs)
    assert r["kappa"] == 4.0
    assert r["f_c"] == round(2 / 3, 6)
    assert r["supercritical"]


def test_star_hub_supercriticality(spark):
    r = _run(spark, [(0, i) for i in range(1, 8)])
    # degrees: 7, 1×7 → Σd = 14, Σd² = 49 + 7 = 56 → κ = 4
    assert (r["sum_d"], r["sum_d2"]) == (14, 56)
    assert r["kappa"] == 4.0 and r["supercritical"]
