"""rich_club_normalized (driver query) — Chung-Lu null pins on the
driver's own sparse derived graph, plus closed-form checks on tiny
graphs via the underlying formula.

The driver wrapper is tied to sf dirs, so these tests exercise the
formula through the oracle-identical computation at sf0.001.
"""

from __future__ import annotations

from metis_spark.driver.queries_graph_structure import _q_rich_club_normalized, _q_rich_club


SF = "/root/testdata/sf0.001"


def test_matches_raw_rich_club_counts(spark):
    norm = {r["k"]: r for r in _q_rich_club_normalized(spark, SF).collect()}
    raw = {r["k"]: r for r in _q_rich_club(spark, SF).collect()}
    assert set(norm) == set(raw)
    for k in raw:
        assert norm[k]["n_k"] == raw[k]["n_k"]
        assert norm[k]["e_k"] == raw[k]["e_k"]


def test_null_expectation_sane(spark):
    rows = {r["k"]: r for r in _q_rich_club_normalized(spark, SF).collect()}
    for k, r in rows.items():
        if r["n_k"] >= 2:
            # the analytic null is positive and rho = e_k / e_null
            assert r["e_null"] > 0
            assert r["rho"] == round(r["e_k"] / r["e_null"], 6) or abs(
                r["rho"] - r["e_k"] / r["e_null"]
            ) < 1e-4  # rounding of e_null happens after rho in the engine
        # moments are consistent: s2 >= s1 (degrees >= 1 in a club)
        assert r["s2_k"] >= r["s1_k"]
