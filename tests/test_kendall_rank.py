"""kendall_rank_correlation (plans/metrics.py) — permutation pins:

- identical rankings: tau = 1;
- full reversal: tau = -1;
- one adjacent swap in n=4: tau = 1 - 2*1/6.
"""

from __future__ import annotations

from metis_spark.plans.metrics import kendall_rank_correlation


def _scores(spark, col, vals):
    return spark.createDataFrame(
        [(int(i), float(v)) for i, v in vals], f"id long, {col} double"
    )


def _run(spark, a_vals, b_vals, k=10):
    a = _scores(spark, "sa", a_vals)
    b = _scores(spark, "sb", b_vals)
    return kendall_rank_correlation(a, b, "sa", "sb", k=k).collect()[0]


def test_identical(spark):
    vals = [(1, 4.0), (2, 3.0), (3, 2.0), (4, 1.0)]
    r = _run(spark, vals, vals)
    assert r["n"] == 4 and r["discordant"] == 0 and r["kendall"] == 1.0


def test_reversed(spark):
    a = [(1, 4.0), (2, 3.0), (3, 2.0), (4, 1.0)]
    b = [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)]
    r = _run(spark, a, b)
    assert r["concordant"] == 0 and r["kendall"] == -1.0


def test_one_swap(spark):
    a = [(1, 4.0), (2, 3.0), (3, 2.0), (4, 1.0)]
    b = [(1, 4.0), (2, 3.0), (3, 1.0), (4, 2.0)]  # swap last two
    r = _run(spark, a, b)
    assert r["discordant"] == 1
    assert r["kendall"] == round(1 - 2 * 1 / 6, 6)
