"""butterfly_summary (plans/bipartite.py) — closed-form pins:

- K_{2,2}: 1 butterfly, 2 wedges, 4 caterpillars, cc = 1.0;
- K_{3,3}: C(3,2)^2 = 9 butterflies, 9 wedges... (see test), cc = 1.0
  (complete bipartite graphs close every caterpillar);
- a 3-path has wedges but zero butterflies and cc = 0;
- butterfly count is side-symmetric (swapping u/v changes nothing).
"""

from __future__ import annotations

from metis_spark.plans.bipartite import butterfly_summary


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "u long, v long"
    )


def _row(spark, pairs):
    return butterfly_summary(_edges(spark, pairs)).collect()[0]


def test_k22(spark):
    r = _row(spark, [(u, v) for u in (1, 2) for v in (1, 2)])
    assert (r["n_left"], r["n_right"], r["n_edges"]) == (2, 2, 4)
    assert r["n_butterflies"] == 1
    assert r["n_wedges"] == 2        # each right vertex: C(2,2) = 1
    assert r["n_caterpillars"] == 4  # 4 edges x (2-1)(2-1)
    assert r["bipartite_cc"] == 1.0  # 4*1/4


def test_k33(spark):
    r = _row(spark, [(u, v) for u in (1, 2, 3) for v in (1, 2, 3)])
    # left pairs: C(3,2)=3, each sharing 3 right vertices -> 3*C(3,2)=9
    assert r["n_butterflies"] == 9
    assert r["n_caterpillars"] == 9 * 2 * 2  # 9 edges x (3-1)(3-1)
    assert r["bipartite_cc"] == 1.0


def test_path_has_no_butterfly(spark):
    r = _row(spark, [(1, 1), (2, 1), (2, 2)])  # u1-v1-u2-v2 path
    assert r["n_butterflies"] == 0
    assert r["n_wedges"] == 1
    assert r["n_caterpillars"] == 1
    assert r["bipartite_cc"] == 0.0


def test_side_symmetry(spark):
    pairs = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 2), (3, 3), (1, 3)]
    a = _row(spark, pairs)
    b = _row(spark, [(v, u) for u, v in pairs])
    assert a["n_butterflies"] == b["n_butterflies"]
    assert a["n_caterpillars"] == b["n_caterpillars"]
    assert a["bipartite_cc"] == b["bipartite_cc"]


def test_per_vertex_topk_k33_plus_pendant(spark):
    from metis_spark.plans.bipartite import butterfly_per_vertex_topk

    pairs = [(u, v) for u in (1, 2, 3) for v in (1, 2, 3)] + [(9, 1)]
    rows = sorted(
        butterfly_per_vertex_topk(_edges(spark, pairs), k=10).collect(),
        key=lambda r: r["rn"],
    )
    # each K33 left vertex: 2 pairs x C(3,2)=3 butterflies = 6; the
    # pendant citer 9 shares only one part with anyone -> no butterflies
    assert [(r["u"], r["butterflies"]) for r in rows] == [(1, 6), (2, 6), (3, 6)]
