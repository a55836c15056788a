"""degree_discount_seeds (plans/metrics.py) — Chen et al. pins:

- round 1 always takes the max-degree vertex (t = 0 everywhere);
- the discount spreads seeds: on two disjoint stars the second seed is
  the other star's hub, never a discounted leaf of the first;
- the gain formula in tenths matches a hand-unrolled trace;
- k > n degrades gracefully (returns all vertices once).
"""

from __future__ import annotations

from metis_spark.plans.metrics import degree_discount_seeds

from tests.conftest import edges_df


def test_two_stars_spread(spark):
    pairs = [(0, i) for i in range(1, 6)] + [(10, i) for i in range(11, 15)]
    out = degree_discount_seeds(edges_df(spark, pairs), k=3).collect()
    picks = [(r["rank"], r["id"], r["gain10"]) for r in out]
    # hub 0 (deg 5) first, hub 10 (deg 4) second — not a leaf of star 0
    assert picks[0] == (1, 0, 50)
    assert picks[1] == (2, 10, 40)
    # third: leaves of star 0 have deg 1, t=1 → 10−20−0 = −10;
    # leaves of star 10: same. Hand trace says the best remaining is a
    # leaf with gain10 = 10·1 − 20·1 − (1−1)·1·1 = −10, lowest id = 1
    assert picks[2] == (3, 1, -10)


def test_triangle_trace(spark):
    pairs = [(1, 2), (2, 3), (1, 3)]
    out = degree_discount_seeds(edges_df(spark, pairs), k=2).collect()
    # all deg 2 → seed 1 (id tiebreak), gain 20;
    # then 2,3 have t=1: 10·2 − 20 − (2−1)·1·1 = −1 → pick id 2
    assert [(r["rank"], r["id"], r["gain10"]) for r in out] == [
        (1, 1, 20),
        (2, 2, -1),
    ]


def test_k_exceeds_n(spark):
    out = degree_discount_seeds(edges_df(spark, [(1, 2)]), k=5).collect()
    assert [r["id"] for r in out] == [1, 2]
    assert [r["rank"] for r in out] == [1, 2]
