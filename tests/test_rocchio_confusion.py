"""nearest_centroid_confusion (operators/similarity.py) — hand pins."""

from __future__ import annotations

from metis_spark.operators.similarity import nearest_centroid_confusion


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_separable_classes_perfect_accuracy(spark):
    d = _emb(
        spark,
        [
            (1, [1.0, 0.0], 0),
            (2, [0.9, 0.1], 0),
            (3, [0.0, 1.0], 1),
            (4, [0.1, 0.9], 1),
        ],
    )
    rows = nearest_centroid_confusion(d).collect()
    conf = {(r["true_label"], r["pred_label"]): r["n"] for r in rows}
    assert conf == {(0, 0): 2, (1, 1): 2}
    assert rows[0]["accuracy_micro"] == 1_000_000


def test_mislabeled_point_lands_off_diagonal(spark):
    # vec 5 carries label 0 but sits in class 1's cone: with four clean
    # anchors per class the centroids stay put and 5 is predicted 1
    d = _emb(
        spark,
        [
            (1, [1.0, 0.0], 0),
            (2, [0.95, 0.05], 0),
            (3, [0.0, 1.0], 1),
            (4, [0.05, 0.95], 1),
            (5, [0.02, 0.98], 0),
        ],
    )
    rows = nearest_centroid_confusion(d).collect()
    conf = {(r["true_label"], r["pred_label"]): r["n"] for r in rows}
    assert conf[(0, 1)] == 1 and conf[(0, 0)] == 2 and conf[(1, 1)] == 2
    # 4 of 5 correct
    assert rows[0]["accuracy_micro"] == (1_000_000 * 4) // 5


def test_zero_vector_excluded(spark):
    d = _emb(
        spark,
        [
            (1, [1.0, 0.0], 0),
            (2, [0.0, 1.0], 1),
            (3, [0.0, 0.0], 0),  # zero vector: no cosine, excluded
        ],
    )
    rows = nearest_centroid_confusion(d).collect()
    assert sum(r["n"] for r in rows) == 2
    assert rows[0]["accuracy_micro"] == 1_000_000
