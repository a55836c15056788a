"""community_conductance (plans/metrics.py) — hand-counted pins:

- barbell with the partition along the connector: each side has
  vol 7 (und rows), cut 1, phi = 1/7;
- whole-graph community: NULL conductance;
- singleton isolated in its own community inside a labeled graph.
"""

from __future__ import annotations

from metis_spark.plans.metrics import community_conductance

from tests.conftest import edges_df


def _labels(spark, pairs):
    return spark.createDataFrame(
        [(int(i), int(l)) for i, l in pairs], "id long, label long"
    )


def _run(spark, lab, pairs):
    out = community_conductance(_labels(spark, lab), edges_df(spark, pairs))
    return {r["community"]: r.asDict() for r in out.collect()}


def test_barbell_split(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    lab = [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1), (6, 1)]
    out = _run(spark, lab, pairs)
    for c in (0, 1):
        assert out[c]["n_vertices"] == 3
        assert out[c]["volume"] == 7  # 3 intra edges * 2 + 1 boundary
        assert out[c]["cut"] == 1
        assert out[c]["conductance"] == round(1 / 7, 6)


def test_whole_graph_null(spark):
    pairs = [(1, 2), (2, 3)]
    out = _run(spark, [(1, 0), (2, 0), (3, 0)], pairs)
    assert out[0]["conductance"] is None and out[0]["cut"] == 0


def test_split_path(spark):
    # path 1-2-3 with 3 alone: community 1 has vol 2, cut 1, phi 0.5
    out = _run(spark, [(1, 0), (2, 0), (3, 1)], [(1, 2), (2, 3)])
    assert out[1]["volume"] == 1 and out[1]["cut"] == 1
    assert out[1]["conductance"] == 1.0
    assert out[0]["conductance"] == round(1 / 1, 6) or out[0]["cut"] == 1
