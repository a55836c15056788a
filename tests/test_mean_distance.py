"""mean_distance_exact (plans/anf.py) — hand-counted pins on directed
reach (the operator uses the directed out-reach convention of the ANF
spine):

- directed path 1->2->3 with horizon 2: pairs (1,2),(2,3) at d1,
  (1,3) at d2 -> mean 4/3;
- horizon truncation drops the far pair;
- a cycle's ordered reachable pairs all count.
"""

from __future__ import annotations

from metis_spark.plans.anf import mean_distance_exact

from tests.conftest import edges_df


def _run(spark, pairs, rounds):
    return mean_distance_exact(edges_df(spark, pairs), rounds=rounds).collect()[0]


def test_directed_path(spark):
    r = _run(spark, [(1, 2), (2, 3)], rounds=2)
    assert r["n_vertices"] == 3
    assert r["reachable_pairs"] == 3 and r["sum_dist"] == 4
    assert r["mean_distance"] == round(4 / 3, 6)


def test_truncation(spark):
    r = _run(spark, [(1, 2), (2, 3)], rounds=1)
    assert r["reachable_pairs"] == 2 and r["sum_dist"] == 2
    assert r["mean_distance"] == 1.0


def test_directed_triangle(spark):
    r = _run(spark, [(1, 2), (2, 3), (3, 1)], rounds=2)
    # every ordered pair reachable: 3 at distance 1, 3 at distance 2
    assert r["reachable_pairs"] == 6 and r["sum_dist"] == 9
    assert r["mean_distance"] == 1.5
