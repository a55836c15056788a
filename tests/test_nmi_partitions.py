"""partition_nmi (plans/metrics.py) — Danon NMI pins:

- identical partitions score 1.0 (2I = H_A + H_B);
- independent partitions score 0 (a 2×2 product design: MI = 0);
- trivial-vs-trivial yields NULL (zero total entropy);
- hand-computed asymmetric example matches the formula.
"""

from __future__ import annotations

import math

from metis_spark.plans.metrics import partition_nmi


def _labels(spark, pairs):
    return spark.createDataFrame(
        [(int(i), int(l)) for i, l in pairs], "id long, label long"
    )


def test_identical_is_one(spark):
    a = _labels(spark, [(1, 0), (2, 0), (3, 1), (4, 1)])
    r = partition_nmi(a, a).collect()[0]
    assert r["nmi"] == 1.0
    assert r["mi_micro"] == r["h_a_micro"] == r["h_b_micro"]


def test_independent_is_zero(spark):
    # A splits {1,2}|{3,4}; B splits {1,3}|{2,4}: every cell nij = 1,
    # ai = bj = 2, n = 4 → each MI term ln(4·1/4) = 0
    a = _labels(spark, [(1, 0), (2, 0), (3, 1), (4, 1)])
    b = _labels(spark, [(1, 0), (2, 1), (3, 0), (4, 1)])
    r = partition_nmi(a, b).collect()[0]
    assert r["mi_micro"] == 0 and r["nmi"] == 0.0


def test_trivial_is_null(spark):
    a = _labels(spark, [(1, 7), (2, 7), (3, 7)])
    r = partition_nmi(a, a).collect()[0]
    assert r["nmi"] is None and r["h_a_micro"] == 0


def test_hand_computed(spark):
    # n=4: A = {1,2,3}|{4}; B = {1,2}|{3,4}
    a = _labels(spark, [(1, 0), (2, 0), (3, 0), (4, 1)])
    b = _labels(spark, [(1, 0), (2, 0), (3, 1), (4, 1)])
    r = partition_nmi(a, b).collect()[0]
    h = lambda ps: sum(-p * math.log(p) for p in ps)
    mi = (
        0.5 * math.log(4 * 2 / (3 * 2))
        + 0.25 * math.log(4 * 1 / (3 * 2))
        + 0.25 * math.log(4 * 1 / (1 * 2))
    )
    want = 2 * mi / (h([0.75, 0.25]) + h([0.5, 0.5]))
    assert abs(r["nmi"] - want) < 1e-5
