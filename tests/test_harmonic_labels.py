"""harmonic_label_scores (plans/sssp.py) — absorbing-chain pins:

- on a path pos-x-neg, the middle vertex converges to the average of
  its two absorbing ends (micro/2, up to floor);
- a vertex attached only to the positive seed scores micro, only to the
  negative scores 0;
- seeds stay pinned at their labels;
- scores are monotone non-decreasing in iteration count.
"""

from __future__ import annotations

from metis_spark.plans.sssp import harmonic_label_scores

MICRO = 1_000_000


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _ids(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "id long")


def test_middle_of_pos_neg_path_is_half(spark):
    out = harmonic_label_scores(
        _edges(spark, [(1, 2), (2, 3)]), _ids(spark, [1]), _ids(spark, [3]),
        iters=10,
    )
    rows = {r["id"]: r["p_micro"] for r in out.collect()}
    assert rows[1] == MICRO and rows[3] == 0
    assert abs(rows[2] - MICRO // 2) <= 2  # harmonic average, floor slack


def test_leaf_attachment_extremes(spark):
    # 4 hangs off the positive seed only, 5 off the negative only
    out = harmonic_label_scores(
        _edges(spark, [(1, 2), (2, 3), (1, 4), (3, 5)]),
        _ids(spark, [1]), _ids(spark, [3]), iters=10,
    )
    rows = {r["id"]: r["p_micro"] for r in out.collect()}
    assert rows[4] == MICRO  # deg-1 vertex = its only neighbor's value
    assert rows[5] == 0


def test_monotone_in_iters(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    p, n = _ids(spark, [1]), _ids(spark, [5])
    h3 = {r["id"]: r["p_micro"]
          for r in harmonic_label_scores(e, p, n, iters=3).collect()}
    h8 = {r["id"]: r["p_micro"]
          for r in harmonic_label_scores(e, p, n, iters=8).collect()}
    for v in h3:
        assert h8[v] >= h3[v]
