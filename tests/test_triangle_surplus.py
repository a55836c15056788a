"""triangle_surplus (plans/metrics.py) — Chung-Lu null pins:

- K4 closed form: 4 observed triangles, E = (S2³ − 3·S2·S4 + 2·S6)/(6·S1³)
  with all degrees 3 → E = 4·(27)³·.../… computed by hand below;
- a triangle-free star has surplus 0 with a positive expectation;
- a clique's surplus > 1 (more clustered than its degree sequence).
"""

from __future__ import annotations

from metis_spark.plans.metrics import triangle_surplus

from tests.conftest import edges_df


def _run(spark, pairs):
    return triangle_surplus(edges_df(spark, pairs)).collect()[0]


def _expected(degs):
    s1 = sum(degs)
    s2 = sum(d * d for d in degs)
    s4 = sum(d**4 for d in degs)
    s6 = sum(d**6 for d in degs)
    return (s2**3 - 3 * s2 * s4 + 2 * s6) / (6 * s1**3)


def test_k4_closed_form(spark):
    pairs = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    r = _run(spark, pairs)
    e = _expected([3, 3, 3, 3])
    assert r["triangles"] == 4
    assert r["expected_cl"] == round(e, 6)
    assert r["surplus"] == round(4 / e, 6)
    assert r["surplus"] > 1.0  # cliques out-cluster their null


def test_star_zero_surplus(spark):
    r = _run(spark, [(0, i) for i in range(1, 7)])
    assert r["triangles"] == 0
    assert r["expected_cl"] > 0  # the null EXPECTS some closure
    assert r["surplus"] == 0.0
