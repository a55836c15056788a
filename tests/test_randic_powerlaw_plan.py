"""Pins for randic_index, degree_powerlaw_fit, betweenness_sample_plan."""

from __future__ import annotations

import math
import os

from metis_spark.plans.metrics import degree_powerlaw_fit, randic_index

from tests.conftest import edges_df

TESTDATA = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def test_randic_path(spark):
    # P3: degrees 1,2,1 — R = 2/√2
    row = randic_index(edges_df(spark, [(1, 2), (2, 3)])).collect()[0]
    assert row["n_vertices"] == 3 and row["n_edges"] == 2
    assert row["randic_micro"] == 2 * round(1e6 / math.sqrt(2.0))


def test_randic_regular_equality(spark):
    # triangle is 2-regular: R = n/2 exactly, norm_ratio = 1/2
    row = randic_index(edges_df(spark, [(1, 2), (2, 3), (1, 3)])).collect()[0]
    assert row["randic_micro"] == 1_500_000
    assert row["norm_ratio_micro"] == 500_000


def test_powerlaw_star_hand(spark):
    row = degree_powerlaw_fit(edges_df(spark, [(0, i) for i in range(1, 6)])).collect()[0]
    assert (row["n_vertices"], row["d_min"], row["d_max"]) == (6, 1, 5)
    sml = 5 * round(math.log(2.0) * 1e6) + round(math.log(10.0) * 1e6)
    assert row["alpha_micro"] == 1_000_000 + (10**12 * 6) // sml
    shl = 5 * round(math.log(5.0) * 1e6)  # hub class c=1 contributes ln1=0
    assert row["entropy_micro"] == round(math.log(6.0) * 1e6) - shl // 6


def test_powerlaw_hub_skew_orders_entropy(spark):
    # a hub-dominated graph has LOWER degree entropy than a ring
    hub = degree_powerlaw_fit(edges_df(spark, [(0, i) for i in range(1, 12)])).collect()[0]
    ring = degree_powerlaw_fit(
        edges_df(spark, [(i, (i + 1) % 12) for i in range(12)])
    ).collect()[0]
    assert ring["entropy_micro"] == 0  # 2-regular: one degree class
    assert hub["entropy_micro"] > 0


def test_betweenness_sample_plan_matches_closed_form(spark):
    from metis_spark.driver.common import BETW_PLAN_GRID
    from metis_spark.driver.queries_graph_iterative import (
        _q_betweenness_sample_plan,
    )

    rows = _q_betweenness_sample_plan(spark, TESTDATA).collect()
    assert len(rows) == len(BETW_PLAN_GRID)
    by_eps = {(r["eps_micro"], r["delta_micro"]): r for r in rows}
    for eps_m, del_m, a_m, lnd_m in BETW_PLAN_GRID:
        r = by_eps[(eps_m, del_m)]
        b = (r["floor_log2"] + 1) * 1_000_000 + lnd_m
        assert r["sample_size"] == -((-a_m * b) // 10**12)  # exact ceil
        # tighter ε / smaller δ must never shrink the sample
        assert r["sample_size"] >= 1
    # monotonicity across the grid: ε=0.05 rows dominate ε=0.1 rows
    assert (
        by_eps[(50_000, 100_000)]["sample_size"]
        > by_eps[(100_000, 100_000)]["sample_size"]
    )


def test_powerlaw_profile_generic_reuse(spark):
    # uniform sizes: one class ⇒ entropy 0; alpha reflects d_min
    from metis_spark.plans.metrics import powerlaw_profile

    eq = spark.createDataFrame([(i, 4) for i in range(6)], "id long, deg long")
    row = powerlaw_profile(eq).collect()[0]
    assert (row["n_vertices"], row["d_min"], row["d_max"]) == (6, 4, 4)
    assert row["entropy_micro"] == 0


def test_damping_sensitivity_bounds(spark):
    import os

    from metis_spark.driver.queries_graph_iterative import (
        _q_pagerank_damping_sensitivity,
    )

    d = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    row = _q_pagerank_damping_sensitivity(spark, d).collect()[0]
    assert row["k"] > 1
    # Spearman in [-1, 1] micro; on a real graph the two dampings
    # agree far better than chance
    assert -1_000_000 <= row["spearman_micro"] <= 1_000_000
    assert row["spearman_micro"] > 0


def test_pr_mass_concentration_monotone(spark):
    import os

    from metis_spark.driver.queries_graph_iterative import (
        _q_pagerank_mass_concentration,
    )

    d = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    rows = sorted(
        _q_pagerank_mass_concentration(spark, d).collect(), key=lambda r: r["k"]
    )
    assert [r["k"] for r in rows] == [10, 100]
    # k=100 mass strictly contains k=10 mass; both within [0, 1]
    assert rows[0]["mass_share_micro"] <= rows[1]["mass_share_micro"]
    assert 0 < rows[0]["mass_share_micro"] <= 1_000_000
    # the head holds more than a uniform share
    n = rows[0]["n_vertices"]
    assert rows[0]["mass_share_micro"] > (1_000_000 * 10) // n
