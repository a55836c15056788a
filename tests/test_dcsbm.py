"""dcsbm_likelihood (plans/metrics.py) — Karrer-Newman pins:

- two disjoint cliques with the true partition: hand-computed L;
- the true 2-block partition of a barbell scores ABOVE the random
  split (likelihood separates what modularity separates);
- one-block partition: L = 2m ln(1/2m).
"""

from __future__ import annotations

import math

from metis_spark.plans.metrics import dcsbm_likelihood

from tests.conftest import edges_df


def _labels(spark, pairs):
    return spark.createDataFrame(
        [(int(i), int(l)) for i, l in pairs], "id long, label long"
    )


def _run(spark, lab, pairs):
    return dcsbm_likelihood(_labels(spark, lab), edges_df(spark, pairs)).collect()[0]


def _expected(blocks):
    kap = {}
    for (r, s), m in blocks.items():
        kap[r] = kap.get(r, 0) + m
    micro = 0
    for (r, s), m in blocks.items():
        if m:
            micro += round(m * math.log(m / (kap[r] * kap[s])) * 1e6)
    return micro


def test_two_triangles_true_partition(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]
    lab = [(i, 0) for i in (1, 2, 3)] + [(i, 1) for i in (4, 5, 6)]
    r = _run(spark, lab, pairs)
    exp = _expected({(0, 0): 6, (1, 1): 6})
    assert r["ll_micro"] == exp and r["two_m"] == 12


def test_true_beats_scrambled_on_barbell(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    true = [(i, 0) for i in (1, 2, 3)] + [(i, 1) for i in (4, 5, 6)]
    scram = [(1, 0), (2, 1), (3, 0), (4, 1), (5, 0), (6, 1)]
    assert (
        _run(spark, true, pairs)["ll_micro"]
        > _run(spark, scram, pairs)["ll_micro"]
    )


def test_single_block(spark):
    pairs = [(1, 2), (2, 3)]
    r = _run(spark, [(1, 0), (2, 0), (3, 0)], pairs)
    assert r["ll_micro"] == round(4 * math.log(4 / 16) * 1e6)
