"""forman_curvature (plans/metrics.py) — closed-form pins:

- triangle + pendant: intra-triangle edges carry F = 4 − d_u − d_v + 3,
  the bridge to the pendant F = 4 − d_u − d_v (support 0);
- K4: every edge has support 2 → F = 4 − 3 − 3 + 6 = 4;
- star S3: every spoke F = 4 − 3 − 1 = 0;
- ranking is curvature ASC with (a, b) tiebreak and dense 1..k rn.
"""

from __future__ import annotations

from itertools import combinations

from metis_spark.plans.metrics import forman_curvature


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def test_triangle_with_pendant(spark):
    # deg: 1:2 2:2 3:3 4:1
    out = forman_curvature(_edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)]), k=10)
    rows = {(r["a"], r["b"]): (r["support"], r["curvature"]) for r in out.collect()}
    assert rows == {
        (1, 2): (1, 3),   # 4-2-2+3
        (1, 3): (1, 2),   # 4-2-3+3
        (2, 3): (1, 2),
        (3, 4): (0, 0),   # bridge: 4-3-1
    }


def test_k4_uniform_positive(spark):
    out = forman_curvature(_edges(spark, combinations(range(1, 5), 2)), k=10)
    rows = out.collect()
    assert len(rows) == 6
    assert all(r["curvature"] == 4 and r["support"] == 2 for r in rows)


def test_star_spokes_zero_and_ranking(spark):
    # S3 star centered at 1 plus one K3 far away: spokes F=0, K3 edges F=3
    pairs = [(1, 2), (1, 3), (1, 4), (7, 8), (8, 9), (7, 9)]
    out = forman_curvature(_edges(spark, pairs), k=4)
    rows = out.orderBy("rn").collect()
    # bottom-4 = the three spokes (F=0) then the first K3 edge (F=3)
    assert [(r["a"], r["b"], r["curvature"], r["rn"]) for r in rows] == [
        (1, 2, 0, 1),
        (1, 3, 0, 2),
        (1, 4, 0, 3),
        (7, 8, 3, 4),
    ]
