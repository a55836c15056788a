"""pq_ann_topk (operators/similarity.py) — ADC contract pins:

- a duplicate of the query vector carries the query's own codes, so its
  ADC distance equals the query's pq_codes quantization error exactly
  (table[s][code_s(q)] = d(q_s, centroid(code_s(q))));
- the result excludes the query itself, has k_top rows, and rn follows
  the (adc, id) order.
"""

from __future__ import annotations

import random

from metis_spark.operators.similarity import pq_ann_topk, pq_codes

DIM = 8


def _vecs(spark, n=14, seed=11):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(DIM)]) for i in range(n)]
    rows.append((n, list(rows[0][1])))  # duplicate of the query (min id = 0)
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_duplicate_adc_equals_query_quantization_error(spark):
    df = _vecs(spark)
    ann = {r["id"]: r for r in
           pq_ann_topk(df, k_top=50, m=2, k=3, iters=2, dim=DIM).collect()}
    codes = {r["id"]: r for r in
             pq_codes(df, m=2, k=3, iters=2, dim=DIM).collect()}
    dup = max(codes)
    assert 0 not in ann                      # the query is excluded
    assert ann[dup]["adc_dist2"] == codes[0]["dist2"]


def test_topk_shape_and_order(spark):
    df = _vecs(spark)
    rows = sorted(pq_ann_topk(df, k_top=5, m=2, k=3, iters=2, dim=DIM).collect(),
                  key=lambda r: r["rn"])
    assert len(rows) == 5 and [r["rn"] for r in rows] == [1, 2, 3, 4, 5]
    keys = [(r["adc_dist2"], r["id"]) for r in rows]
    assert keys == sorted(keys)
