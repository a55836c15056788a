"""hitting_time_to_seeds (plans/sssp.py) — closed-form pins:

- path 1-2-3 with seed {1}: from 2 the walk steps to 1 or 3 with equal
  probability; the truncated iterate must land BETWEEN the 1-step lower
  bound and the cap, decrease as iters grow, and vertex 3 (two hops
  out) must sit strictly above vertex 2;
- a vertex disconnected from the seeds stays at the cap;
- seeds are exactly 0;
- closed form on the star K_{1,2} with the center as seed: leaves hit
  in exactly 1 step -> h = 1 micro-step.
"""

from __future__ import annotations

from metis_spark.plans.sssp import hitting_time_to_seeds

MICRO = 1_000_000


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _seeds(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "id long")


def test_star_leaves_one_step(spark):
    out = hitting_time_to_seeds(
        _edges(spark, [(0, 1), (0, 2)]), _seeds(spark, [0]), iters=6
    )
    rows = {r["id"]: r["h_micro"] for r in out.collect()}
    assert rows[0] == 0
    assert rows[1] == MICRO and rows[2] == MICRO


def test_path_ordering_and_disconnected_cap(spark):
    out = hitting_time_to_seeds(
        _edges(spark, [(1, 2), (2, 3), (8, 9)]), _seeds(spark, [1]),
        iters=8, cap_steps=50,
    )
    rows = {r["id"]: r["h_micro"] for r in out.collect()}
    assert rows[1] == 0
    assert 0 < rows[2] < rows[3] < 50 * MICRO  # farther -> larger
    assert rows[8] == rows[9] == 50 * MICRO    # unreachable stays capped


def test_monotone_in_iters(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    s = _seeds(spark, [1])
    h4 = {r["id"]: r["h_micro"]
          for r in hitting_time_to_seeds(e, s, iters=4).collect()}
    h8 = {r["id"]: r["h_micro"]
          for r in hitting_time_to_seeds(e, s, iters=8).collect()}
    for v in h4:
        assert h8[v] <= h4[v]  # the iterate decreases toward the fixpoint
