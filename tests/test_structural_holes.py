"""structural_holes (plans/metrics.py) — Burt closed-form pins:

- K3: eff = 1, efficiency = 0.5, constraint = (1/2 + 1/4)^2 * 2 = 1.125
  (exact under the micro quantization: s = 500000, x = 0.75);
- S3 star: center eff = 3, efficiency = 1, constraint = 3·floor((1/3)^2
  ·1e6)/1e6 = 0.333333; spokes are fully constrained (c = 1.0);
- hub_cap drops wedge centers: K3 with cap 1 has no q-terms, so
  constraint falls to 2·(1/2)^2 = 0.5.
"""

from __future__ import annotations

from metis_spark.plans.metrics import structural_holes


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def test_triangle_exact(spark):
    out = structural_holes(_edges(spark, [(1, 2), (2, 3), (1, 3)]))
    rows = {r["id"]: r for r in out.collect()}
    for v in (1, 2, 3):
        assert rows[v]["deg"] == 2
        assert rows[v]["eff_size"] == 1.0
        assert rows[v]["efficiency"] == 0.5
        assert rows[v]["burt_constraint"] == 1.125


def test_star_center_vs_spokes(spark):
    out = structural_holes(_edges(spark, [(1, 2), (1, 3), (1, 4)]))
    rows = {r["id"]: r for r in out.collect()}
    c = rows[1]
    assert (c["deg"], c["eff_size"], c["efficiency"]) == (3, 3.0, 1.0)
    assert c["burt_constraint"] == 0.333333  # 3·floor((1/3)²·1e6)/1e6
    for v in (2, 3, 4):
        assert rows[v]["eff_size"] == 1.0
        assert rows[v]["burt_constraint"] == 1.0


def test_hub_cap_drops_q_terms(spark):
    out = structural_holes(_edges(spark, [(1, 2), (2, 3), (1, 3)]), hub_cap=1)
    rows = {r["id"]: r for r in out.collect()}
    for v in (1, 2, 3):
        assert rows[v]["burt_constraint"] == 0.5
