"""edge_dispersion (plans/metrics.py) — Backstrom-Kleinberg pins:

- the canonical dispersion motif: edge (1,2) with two unlinked common
  neighbors -> disp 1, norm 0.5;
- linking the common neighbors kills the dispersion;
- K4: common neighbors of every edge are adjacent -> disp 0;
- edges with embeddedness < 2 emit no row.
"""

from __future__ import annotations

from metis_spark.plans.metrics import edge_dispersion

from tests.conftest import edges_df


def _run(spark, pairs):
    rows = edge_dispersion(edges_df(spark, pairs)).collect()
    return {(r["src"], r["dst"]): (r["emb"], r["dispersion"], r["norm_disp"]) for r in rows}


def test_dispersion_motif(spark):
    out = _run(spark, [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)])
    assert out[(1, 2)] == (2, 1, 0.5)


def test_linked_common_neighbors_zero(spark):
    out = _run(spark, [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (3, 4)])
    assert out[(1, 2)] == (2, 0, 0.0)


def test_k4_all_zero(spark):
    pairs = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    out = _run(spark, pairs)
    assert len(out) == 6
    assert all(v == (2, 0, 0.0) for v in out.values())


def test_low_embeddedness_filtered(spark):
    # single triangle: every edge has exactly one common neighbor
    assert _run(spark, [(1, 2), (2, 3), (1, 3)]) == {}


def test_three_way_dispersion(spark):
    # edge (1,2) with common neighbors {3,4,5}, none adjacent
    pairs = [(1, 2)] + [(1, s) for s in (3, 4, 5)] + [(2, s) for s in (3, 4, 5)]
    out = _run(spark, pairs)
    assert out[(1, 2)] == (3, 3, 1.0)
