"""disparity_filter (plans/metrics.py) — Serrano backbone pins:

- the hub-and-heavy-edge closed form: a dominant edge at a high-degree
  hub passes, the uniform dross fails;
- degree-1 endpoints never reject the null (alpha = 1.0 on that side);
- alpha formula hand-check: (1 − w/s)^(k−1) in micro-units;
- uniform star: every edge has the SAME alpha — none singled out.

Weights here are the canonical pair weights w = (7a + 13b) % 10 + 1
(a < b) that the operator pins, so fixtures pick ids to shape them.
"""

from __future__ import annotations

from metis_spark.plans.metrics import disparity_filter

from tests.conftest import edges_df


def _rows(spark, pairs, **kw):
    return {
        (r["a"], r["b"]): r
        for r in disparity_filter(edges_df(spark, pairs), **kw).collect()
    }


def test_alpha_closed_form_and_leaf_convention(spark):
    # path 1-2-3: w(1,2) = 7+26 = 33 % 10 + 1 = 4; w(2,3) = 14+39 = 53 % 10 + 1 = 4
    got = _rows(spark, [(1, 2), (2, 3)])
    r = got[(1, 2)]
    # endpoint 1 has k=1 → alpha 1e6; endpoint 2: k=2, s=8, w=4 →
    # (1 − 4/8)^1 = 0.5 → 500000
    assert r["alpha_a_micro"] == 1_000_000
    assert r["alpha_b_micro"] == 500_000
    assert not r["kept"]  # 0.5 is not significant at 0.05


def test_dominant_edge_passes(spark):
    # hub 0 with 8 light leaves and one heavy partner; pick ids so the
    # heavy edge weight dwarfs the leaf weights:
    # w(0,6) = 13·6 % 10 + 1 = 9; leaves at ids 10,20,...: w(0,10j) = 130j %10 +1 = 1
    pairs = [(0, 6)] + [(0, 10 * j) for j in range(1, 9)]
    got = _rows(spark, pairs)
    heavy = got[(0, 6)]
    s = 9 + 8 * 1  # hub strength 17, k = 9
    expect = round((1 - 9 / s) ** 8 * 1e6)
    assert heavy["alpha_a_micro"] == expect  # ≈ 8691 < 50000
    assert heavy["kept"]
    light = got[(0, 10)]
    assert not light["kept"]  # (1 − 1/17)^8 ≈ 0.615


def test_uniform_star_keeps_nothing(spark):
    # all leaf ids ≡ same weight class: w(0,10j) = 1 for every leaf
    pairs = [(0, 10 * j) for j in range(1, 7)]
    got = _rows(spark, pairs)
    alphas = {r["alpha_a_micro"] for r in got.values()}
    assert len(alphas) == 1
    assert not any(r["kept"] for r in got.values())
