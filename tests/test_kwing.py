"""k_wing (plans/bipartite.py) — closed-form pins:

- in K_{3,3} every edge sits in exactly 4 butterflies (2 partners x
  (3-1) second-commons): k=4 keeps everything with support 4, k=5
  empties the graph;
- a pendant edge hanging off K_{3,3} carries 0 butterflies and peels
  while the block survives;
- peel cascades: removing a support-starved edge can demote another.
"""

from __future__ import annotations

from metis_spark.plans.bipartite import k_wing


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "u long, v long"
    )


_K33 = [(u, v) for u in (1, 2, 3) for v in (1, 2, 3)]


def test_k33_support_closed_form(spark):
    out, info = k_wing(_edges(spark, _K33), k=4)
    assert info["converged"]
    rows = out.collect()
    assert len(rows) == 9 and all(r["support"] == 4 for r in rows)
    out5, info5 = k_wing(_edges(spark, _K33), k=5)
    assert info5["converged"] and out5.count() == 0


def test_pendant_peels_block_survives(spark):
    out, info = k_wing(_edges(spark, _K33 + [(4, 1)]), k=4)
    assert info["converged"]
    got = sorted((r["u"], r["v"]) for r in out.collect())
    assert got == sorted(_K33)


def test_peel_cascade(spark):
    # K_{2,2} on u{1,2} x v{1,2} (1 butterfly, support 1 each) plus a
    # second butterfly {2,3} x {2,3}: edge (2,2) sits in both (support 2),
    # the others in one. k=2: round 1 keeps only (2,2); its support then
    # drops to 0 -> round 2 empties. The cascade needs >= 2 rounds.
    pairs = [(1, 1), (1, 2), (2, 1), (2, 2), (2, 3), (3, 2), (3, 3)]
    out, info = k_wing(_edges(spark, pairs), k=2)
    assert info["converged"] and info["rounds"] >= 2
    assert out.count() == 0
