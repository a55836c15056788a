"""global_efficiency (plans/anf.py) — hand-counted pins (directed
out-reach convention of the ANF spine):

- directed path 1->2->3, horizon 2: pairs at d1: 2, d2: 1 ->
  E = (2*1 + 1*0.5)/6 = 5/12;
- disconnection tolerated: reverse pairs just contribute 0;
- complete bidirectional pair: efficiency 1 on n=2.
"""

from __future__ import annotations

from metis_spark.plans.anf import global_efficiency

from tests.conftest import edges_df


def _run(spark, pairs, rounds):
    return global_efficiency(edges_df(spark, pairs), rounds=rounds).collect()[0]


def test_directed_path(spark):
    r = _run(spark, [(1, 2), (2, 3)], rounds=2)
    assert r["n_vertices"] == 3 and r["ordered_pairs"] == 6
    assert r["eff_micro"] == 2 * 1000000 + 500000
    assert r["efficiency"] == round((2 + 0.5) / 6, 6)


def test_two_cycle(spark):
    r = _run(spark, [(1, 2), (2, 1)], rounds=1)
    assert r["efficiency"] == 1.0


def test_truncation_drops_far_pairs(spark):
    r = _run(spark, [(1, 2), (2, 3)], rounds=1)
    assert r["eff_micro"] == 2 * 1000000  # the d=2 pair is out of horizon
