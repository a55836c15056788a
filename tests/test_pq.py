"""pq_codes (operators/similarity.py) — contract pins:

- m=1 degenerates to kmeans_quantized exactly (same code, same dist2);
- duplicate vectors get identical codes and errors;
- total dist2 is the sum of the per-subspace errors (subspaces
  partition the dims), checked against per-slice kmeans runs.
"""

from __future__ import annotations

import random

from metis_spark.operators.similarity import kmeans_quantized, pq_codes

DIM = 8


def _vecs(spark, n=12, seed=7):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(DIM)]) for i in range(n)]
    rows.append((n, list(rows[0][1])))  # duplicate of vector 0
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_m1_is_kmeans(spark):
    df = _vecs(spark)
    pq = {r["id"]: r for r in pq_codes(df, m=1, k=3, iters=2, dim=DIM).collect()}
    km = {r["id"]: r for r in kmeans_quantized(df, k=3, iters=2).collect()}
    assert set(pq) == set(km)
    for i in pq:
        assert pq[i]["code_0"] == km[i]["cid"]
        assert pq[i]["dist2"] == km[i]["dist2"]


def test_duplicates_and_error_additivity(spark):
    df = _vecs(spark)
    out = {r["id"]: r for r in pq_codes(df, m=2, k=3, iters=2, dim=DIM).collect()}
    n_dup = max(out)
    assert tuple(out[n_dup])[1:] == tuple(out[0])[1:]  # same codes + dist2
    # additivity: each half's kmeans error sums to the PQ total
    import pyspark.sql.functions as F

    halves = []
    for s in (0, 1):
        sub = df.select(
            "vec_id", F.slice("embedding", s * 4 + 1, 4).alias("embedding")
        )
        halves.append(
            {r["id"]: r["dist2"] for r in kmeans_quantized(sub, k=3, iters=2).collect()}
        )
    for i in out:
        assert out[i]["dist2"] == halves[0][i] + halves[1][i]
