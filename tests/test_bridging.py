"""bridging_coefficient_topk (plans/metrics.py) — hand pins."""

from __future__ import annotations

from metis_spark.plans.metrics import bridging_coefficient_topk

from tests.conftest import edges_df


def test_barbell_waist_tops(spark):
    # two triangles joined by a path through vertex 0: the waist (0)
    # has degree 2 with well-connected neighbours... actual bridge
    # vertices (low degree joining busy regions) must outrank
    # triangle members
    pairs = [
        (1, 2), (2, 3), (1, 3),      # left triangle
        (4, 5), (5, 6), (4, 6),      # right triangle
        (3, 0), (0, 4),              # waist through 0
    ]
    rows = bridging_coefficient_topk(edges_df(spark, pairs), k=10).collect()
    got = {r["id"]: r for r in rows}
    # vertex 0: d=2, neighbours 3 and 4 both d=3 ⇒ S = 2·(1e6 div 3),
    # bc = 1e12 div (2·S)
    s0 = 2 * (1_000_000 // 3)
    assert got[0]["s_micro"] == s0
    assert got[0]["bc_micro"] == 10**12 // (2 * s0)
    # the waist outranks every triangle-internal vertex
    internal = [got[i]["bc_micro"] for i in (1, 2, 5, 6)]
    assert all(got[0]["bc_micro"] > b for b in internal)
    assert rows[0]["rank"] == 1


def test_regular_graph_uniform_bc(spark):
    # C4 ring: every vertex identical ⇒ identical bc, ranks by id
    rows = bridging_coefficient_topk(
        edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)]), k=4
    ).collect()
    vals = {r["bc_micro"] for r in rows}
    assert len(vals) == 1
    assert [r["id"] for r in rows] == [0, 1, 2, 3]


def test_square_surplus_ring_vs_null(spark):
    """Invariants + the exact cross-ratio identity between the two
    integer-division outputs on the driver testdata."""
    import os

    from metis_spark.driver.queries_graph_structure import _q_square_surplus

    # engine-level check on testdata for invariants
    d = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    row = _q_square_surplus(spark, d).collect()[0]
    assert row["squares"] >= 0
    assert row["s2"] > row["s1"] > 0
    # exact integer-division identity between the two ratios:
    # surplus ≈ 1e12 · squares / null (both integer-derived)
    if row["null_micro"] > 0 and row["squares"] > 0:
        approx = (10**12 * row["squares"]) // row["null_micro"]
        assert abs(approx - row["surplus_micro"]) <= max(2, approx // 1000)
