"""Matryoshka-truncation gate: on an MRL-structured fixture (energy
concentrated in the leading dims) the prefix index must reproduce the
full-dim top-k exactly — the property that justifies serving the
cheaper prefix; the near-gaussian driver fixture intentionally has no
such structure (recall there just measures, see similarity.py
fixture-honesty note)."""

import random

from pyspark.sql import functions as F

from metis_spark.operators.similarity import cosine_topk, topk_recall


def test_prefix_recall_perfect_on_mrl_fixture(spark):
    rng = random.Random(5)
    rows = []
    for i in range(60):
        head = [rng.uniform(-1, 1) for _ in range(8)]      # all the signal
        tail = [rng.uniform(-1e-4, 1e-4) for _ in range(24)]  # MRL-style residual
        rows.append((i, head + tail))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") < 3)
    exact = cosine_topk(emb, q, "vec_id", "embedding", k=5)
    se = emb.select("vec_id", F.slice("embedding", 1, 8).alias("embedding"))
    appr = cosine_topk(se, se.where(F.col("vec_id") < 3), "vec_id", "embedding", k=5)
    rec = topk_recall(exact, appr).collect()
    assert len(rec) == 3
    assert all(float(r["recall"]) == 1.0 for r in rec)
