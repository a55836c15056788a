"""spectral_radius_bounds (plans/metrics.py) — tight-bracket pins:

- star S5: lambda1 = sqrt(4) = 2 exactly, bracket collapses;
- cycle C5: lambda1 = 2 exactly, bracket collapses;
- K4: lambda1 = 3 exactly, bracket collapses;
- path P3: true lambda1 = sqrt(2) must sit inside the bracket.
"""

from __future__ import annotations

import math

from metis_spark.plans.metrics import spectral_radius_bounds

from tests.conftest import edges_df


def _run(spark, pairs):
    return spectral_radius_bounds(edges_df(spark, pairs)).collect()[0]


def test_star_tight(spark):
    r = _run(spark, [(0, i) for i in range(1, 5)])
    assert r["lam_lower"] == r["lam_upper"] == 2.0
    assert r["tau_lower"] == r["tau_upper"] == 0.5


def test_cycle_tight(spark):
    r = _run(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (1, 5)])
    assert r["lam_lower"] == r["lam_upper"] == 2.0


def test_k4_tight(spark):
    pairs = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    r = _run(spark, pairs)
    assert r["lam_lower"] == r["lam_upper"] == 3.0
    assert r["m"] == 6 and r["d_max"] == 3


def test_path_bracket_contains_truth(spark):
    r = _run(spark, [(1, 2), (2, 3)])
    lam = math.sqrt(2)
    # bounds are ROUND(...,6) displays; allow the quantization slack
    assert r["lam_lower"] - 1e-6 <= lam <= r["lam_upper"] + 1e-6
    assert r["max_deg_prod"] == 2
