"""Bipartite (α,β)-core (plans/bipartite.py:ab_core) — structural pins:

- a complete K_{3,3} block survives (2,2)-core intact while pendant
  edges hanging off it peel away, including the cascade (removing a
  pendant left vertex demotes the right vertex it propped up);
- an impossible threshold empties the graph and still converges;
- the fixpoint is idempotent: running ab_core on its own output changes
  nothing.
"""

from __future__ import annotations

from metis_spark.plans.bipartite import ab_core


def _bedges(spark, pairs):
    return spark.createDataFrame([(int(u), int(v)) for u, v in pairs], "u long, v long")


# K_{3,3} on u:1-3, v:1-3, plus a chain of props: u4 touches v1 and v4;
# v4 is touched only by u4 and u5; u5 touches only v4.
_PAIRS = [(u, v) for u in (1, 2, 3) for v in (1, 2, 3)] + [
    (4, 1),
    (4, 4),
    (5, 4),
]


def test_k33_survives_pendants_cascade(spark):
    out, info = ab_core(_bedges(spark, _PAIRS), alpha=2, beta=2)
    assert info["converged"]
    got = sorted(map(tuple, out.collect()))
    # u5 (deg 1) peels -> v4 drops to deg 1 -> peels -> u4 drops to deg 1
    # -> peels; the K_{3,3} block alone survives
    assert got == sorted((u, v) for u in (1, 2, 3) for v in (1, 2, 3))
    assert info["rounds"] >= 2  # the cascade needs more than one sweep


def test_impossible_threshold_empties(spark):
    out, info = ab_core(_bedges(spark, _PAIRS), alpha=10, beta=10)
    assert info["converged"]
    assert out.count() == 0


def test_fixpoint_idempotent(spark):
    out, info = ab_core(_bedges(spark, _PAIRS), alpha=2, beta=2)
    again, info2 = ab_core(out, alpha=2, beta=2)
    assert info2["converged"] and info2["rounds"] == 1
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))
