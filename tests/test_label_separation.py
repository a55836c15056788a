"""label_centroid_separation (operators/similarity.py) — geometry pins:

- two labels on orthogonal axes: centroid cosine 0, cohesion 1;
- antipodal labels: centroid cosine -1;
- a label with internal spread has cohesion < 1.
"""

from __future__ import annotations

from metis_spark.operators.similarity import label_centroid_separation


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def _run(spark, rows):
    out = label_centroid_separation(_emb(spark, rows)).collect()
    return {(r["label_a"], r["label_b"]): r.asDict() for r in out}


def test_orthogonal_labels(spark):
    rows = [
        (1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0),
        (3, [0.0, 1.0], 1), (4, [0.0, 1.0], 1),
    ]
    r = _run(spark, rows)[(0, 1)]
    assert r["cos_centroids"] == 0.0
    assert r["cohesion_a"] == 1.0 and r["cohesion_b"] == 1.0
    assert r["n_a"] == 2 and r["n_b"] == 2


def test_antipodal(spark):
    rows = [(1, [1.0, 0.0], 0), (2, [-1.0, 0.0], 1)]
    r = _run(spark, rows)[(0, 1)]
    assert r["cos_centroids"] == -1.0


def test_spread_lowers_cohesion(spark):
    rows = [
        (1, [1.0, 0.0], 0), (2, [0.0, 1.0], 0),   # spread label
        (3, [1.0, 1.0], 1), (4, [1.0, 1.0], 1),
    ]
    r = _run(spark, rows)[(0, 1)]
    assert r["cohesion_a"] < 1.0
    assert r["cohesion_b"] == 1.0
