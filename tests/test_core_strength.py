"""core_strength (plans/coreness.py) — hand pins and the CS ≥ 1
invariant (a core-k vertex has ≥ k neighbours of core ≥ k)."""

from __future__ import annotations

import tempfile

from metis_spark.plans.coreness import core_strength, coreness

from tests.conftest import edges_df


def _cs(spark, pairs):
    e = edges_df(spark, pairs)
    cores, info = coreness(e, checkpoint_dir=tempfile.mkdtemp(prefix="cs_t_"))
    assert info["converged"]
    return {r["id"]: (r["core"], r["core_strength"]) for r in core_strength(e, cores).collect()}


def test_star_center_redundant_leaves_fragile(spark):
    # K1,5: every vertex core 1; the hub has 5 core-≥1 neighbours
    # (CS = 5 — can lose 4 before its core is at risk), leaves have 1
    got = _cs(spark, [(0, i) for i in range(1, 6)])
    assert got[0] == (1, 5)
    for leaf in range(1, 6):
        assert got[leaf] == (1, 1)


def test_triangle_with_pendant(spark):
    # triangle {1,2,3} (core 2) + pendant 4 on 1 (core 1): triangle
    # vertices sit at exactly minimum support (CS=1); the pendant's
    # single neighbour has higher core, also CS=1
    got = _cs(spark, [(1, 2), (2, 3), (1, 3), (1, 4)])
    assert got[1] == (2, 1) and got[2] == (2, 1) and got[3] == (2, 1)
    assert got[4] == (1, 1)


def test_cs_at_least_one_invariant(spark):
    pairs = [(i, (i * 7 + 3) % 23) for i in range(40)] + [(i, i + 1) for i in range(22)]
    pairs = [(a, b) for a, b in pairs if a != b]
    got = _cs(spark, pairs)
    assert got and all(cs >= 1 for _, cs in got.values())


def test_coreness_profile_invariants(spark):
    """Shell sizes, cumulative curve, and the degree proxy corr on a
    graph with known decomposition: K4 + pendant chain."""
    import os

    from metis_spark.driver.queries_graph_structure import _q_coreness_profile

    d = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    rows = _q_coreness_profile(spark, d).collect()
    assert rows
    by_core = sorted(rows, key=lambda r: -r["core"])
    # cumulative curve is the running sum of shell sizes from the top
    run = 0
    for r in by_core:
        run += r["n_vertices"]
        assert r["n_cum_ge"] == run
    # degree and coreness correlate positively on web-shaped graphs
    corr = rows[0]["deg_core_corr_micro"]
    assert corr is not None and 0 < corr <= 1_000_000


def test_graph_curation_funnel_monotone(spark):
    """Funnel stages only ever shrink, and stage arithmetic is
    consistent (directed ≥ canonical und; core ⊆ simple; giant ⊆
    simple)."""
    import os

    from metis_spark.driver.queries_graph_structure import (
        _q_graph_curation_funnel,
    )

    d = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    got = {r["stage"]: r for r in _q_graph_curation_funnel(spark, d).collect()}
    assert set(got) == {"1_directed", "2_simple_und", "3_core", "4_giant"}
    assert got["1_directed"]["n_edges"] >= got["2_simple_und"]["n_edges"]
    assert got["2_simple_und"]["n_edges"] >= got["3_core"]["n_edges"]
    assert got["2_simple_und"]["n_vertices"] >= got["3_core"]["n_vertices"]
    assert got["2_simple_und"]["n_vertices"] >= got["4_giant"]["n_vertices"]
    assert got["4_giant"]["n_vertices"] > 0
