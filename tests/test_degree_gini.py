"""degree_gini (plans/metrics.py) — closed-form pins:

- regular graph (cycle): gini 0, top share = k/n exactly;
- star S4: degrees [4,1,1,1,1] -> gini 0.3, top-1 share 0.5;
- two-block: hand-computed ranked sum.
"""

from __future__ import annotations

from metis_spark.plans.metrics import degree_gini

from tests.conftest import edges_df


def _run(spark, pairs):
    return degree_gini(edges_df(spark, pairs)).collect()[0]


def test_cycle_equal_degrees(spark):
    r = _run(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (1, 5)])
    assert r["n"] == 5 and r["sum_deg"] == 10
    assert r["gini"] == 0.0
    assert r["top1pct_k"] == 1 and r["top1pct_share"] == 0.2


def test_star(spark):
    r = _run(spark, [(0, i) for i in range(1, 5)])
    # ascending degrees 1,1,1,1,4: ranked = 1+2+3+4+20 = 30
    assert r["n"] == 5 and r["sum_deg"] == 8 and r["ranked_sum"] == 30
    assert r["gini"] == 0.3
    assert r["top1pct_share"] == 0.5


def test_two_block(spark):
    # path 1-2-3: degrees 1,2,1 -> ascending 1,1,2: ranked = 1+2+6 = 9
    r = _run(spark, [(1, 2), (2, 3)])
    assert r["ranked_sum"] == 9
    assert r["gini"] == round(2 * 9 / (3 * 4) - 4 / 3, 6)
