"""edge_clustering_coefficient (plans/metrics.py) — Radicchi pins:

- K4: every edge has support 2, denom 2 -> C3 = 1.5;
- barbell: the connector has support 0, denom 2 -> C3 = 0.5, strictly
  below every triangle edge (the divisive-removal candidate);
- pendant edges (denom 0) emit NULL.
"""

from __future__ import annotations

from metis_spark.plans.metrics import edge_clustering_coefficient

from tests.conftest import edges_df


def _run(spark, pairs):
    rows = edge_clustering_coefficient(edges_df(spark, pairs)).collect()
    return {(r["src"], r["dst"]): (r["support"], r["denom"], r["ecc"]) for r in rows}


def test_k4(spark):
    pairs = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    out = _run(spark, pairs)
    assert len(out) == 6
    assert all(v == (2, 2, 1.5) for v in out.values())


def test_barbell_connector_lowest(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    out = _run(spark, pairs)
    assert out[(3, 4)] == (0, 2, 0.5)
    tri_vals = [v[2] for k, v in out.items() if k != (3, 4)]
    assert all(v > 0.5 for v in tri_vals)


def test_pendant_null(spark):
    out = _run(spark, [(1, 2), (2, 3)])
    assert out[(1, 2)] == (0, 0, None)
    assert out[(2, 3)] == (0, 0, None)
