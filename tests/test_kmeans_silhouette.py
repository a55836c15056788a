"""kmeans_silhouette (operators/similarity.py) — geometry pins:

- two tight, well-separated blobs with k=2: silhouette near 1;
- overlapping points: silhouette collapses toward 0.
"""

from __future__ import annotations

from metis_spark.operators.similarity import kmeans_silhouette


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_separated_blobs(spark):
    rows = [
        (0, [0.0, 0.0], 0), (1, [0.001, 0.0], 0),
        (2, [10.0, 10.0], 1), (3, [10.001, 10.0], 1),
    ]
    out = kmeans_silhouette(_emb(spark, rows), k=2, iters=2).collect()
    assert len(out) == 2
    for r in out:
        assert r["n_members"] == 2
        assert r["mean_silhouette"] > 0.99


def test_overlapping_blobs_low_silhouette(spark):
    # interleaved points: both clusters live, but boundaries touch
    rows = [
        (0, [0.0, 0.0], 0), (1, [1.0, 0.0], 0),
        (2, [2.0, 0.0], 1), (3, [3.0, 0.0], 1),
    ]
    out = kmeans_silhouette(_emb(spark, rows), k=2, iters=2).collect()
    assert len(out) == 2
    for r in out:
        assert r["mean_silhouette"] < 0.99


def test_single_live_cluster_empty(spark):
    # identical points collapse Lloyd to one live cluster: silhouette
    # is undefined and the result is empty (documented contract)
    rows = [(i, [1.0, 1.0], 0) for i in range(4)]
    assert kmeans_silhouette(_emb(spark, rows), k=2, iters=1).collect() == []
