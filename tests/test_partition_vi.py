"""partition_vi (plans/metrics.py) — metric pins:

- identical partitions: VI = 0;
- independent 2x2 partitions of 4 points: VI = 2 ln 2 (micro-nat
  quantized per term, so expectations replay the quantization);
- refinement: VI(A, refine(A)) = H(refine|A) = ln 2;
- VI symmetry.
"""

from __future__ import annotations

import math


from metis_spark.plans.metrics import partition_vi


def _labels(spark, pairs):
    return spark.createDataFrame(
        [(int(i), int(l)) for i, l in pairs], "id long, label long"
    )


def _run(spark, a, b):
    return partition_vi(_labels(spark, a), _labels(spark, b)).collect()[0]


def _h_micro(sizes, n):
    return sum(round(-(s / n) * math.log(s / n) * 1e6) for s in sizes)


def test_identical_zero(spark):
    a = [(1, 10), (2, 10), (3, 20), (4, 20)]
    r = _run(spark, a, a)
    assert r["vi_micro"] == 0 and r["vi"] == 0.0


def test_independent_two_by_two(spark):
    a = [(1, 0), (2, 0), (3, 1), (4, 1)]
    b = [(1, 0), (2, 1), (3, 0), (4, 1)]
    r = _run(spark, a, b)
    # uniform marginals, zero MI: VI = H_A + H_B, each 2 ln 2 / 2
    exp_micro = 2 * _h_micro([2, 2], 4)  # MI terms are exactly 0
    assert r["vi_micro"] == exp_micro
    assert r["vi"] == round(exp_micro / 1e6, 6)
    assert abs(r["vi"] - 2 * math.log(2)) < 1e-5
    assert abs(r["nvi"] - 1.0) < 1e-5


def test_refinement_conditional_entropy(spark):
    a = [(1, 0), (2, 0), (3, 0), (4, 0)]
    b = [(1, 0), (2, 0), (3, 1), (4, 1)]
    r = _run(spark, a, b)
    assert abs(r["vi"] - math.log(2)) < 1e-5


def test_symmetry(spark):
    a = [(1, 0), (2, 0), (3, 1), (4, 2)]
    b = [(1, 5), (2, 6), (3, 6), (4, 6)]
    assert _run(spark, a, b)["vi_micro"] == _run(spark, b, a)["vi_micro"]
