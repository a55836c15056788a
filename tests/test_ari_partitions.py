"""partition_agreement (plans/metrics.py) — Hubert-Arabie ARI pins:

- identical partitions score 1.0;
- the textbook 3v3-cluster example scores (2-1.2)/(4.5-1.2) = 0.242424;
- all-singletons vs all-one-cluster scores exactly 0 (chance level);
- two trivial one-cluster partitions yield NULL (denominator 0).
"""

from __future__ import annotations

from metis_spark.plans.metrics import partition_agreement


def _labels(spark, pairs):
    return spark.createDataFrame(
        [(int(i), int(l)) for i, l in pairs], "id long, label long"
    )


def test_identical_is_one(spark):
    a = _labels(spark, [(1, 10), (2, 10), (3, 20), (4, 20)])
    row = partition_agreement(a, a).collect()[0]
    assert row["ari"] == 1.0
    assert row["n"] == 4 and row["clusters_a"] == 2 == row["clusters_b"]


def test_textbook_example(spark):
    a = _labels(spark, [(i, 1 if i <= 3 else 2) for i in range(1, 7)])
    b = _labels(spark, [(1, 1), (2, 1), (3, 2), (4, 2), (5, 3), (6, 3)])
    row = partition_agreement(a, b).collect()[0]
    assert (row["sum_nij2"], row["sum_a2"], row["sum_b2"]) == (2, 6, 3)
    assert row["ari"] == 0.242424  # (2 - 1.2) / (4.5 - 1.2)


def test_singletons_vs_lump_is_zero(spark):
    a = _labels(spark, [(i, i) for i in range(1, 6)])
    b = _labels(spark, [(i, 99) for i in range(1, 6)])
    row = partition_agreement(a, b).collect()[0]
    assert row["ari"] == 0.0


def test_trivial_pair_is_null(spark):
    a = _labels(spark, [(i, 7) for i in range(1, 5)])
    row = partition_agreement(a, a).collect()[0]
    assert row["ari"] is None
