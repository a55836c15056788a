"""pq_ann_recall (driver/queries_similarity.py) — gate pins at
sf0.001: the recall is measured, in [0,1], and n_exact = PQ_TOPK."""

from __future__ import annotations

from metis_spark.driver.common import PQ_TOPK
from metis_spark.driver.queries_similarity import _q_pq_ann_recall

SF = "/root/testdata/sf0.001"


def test_recall_measured(spark):
    r = _q_pq_ann_recall(spark, SF).collect()[0]
    assert r["n_exact"] == PQ_TOPK
    assert 0 <= r["n_overlap"] <= r["n_exact"]
    assert r["recall"] == round(r["n_overlap"] / r["n_exact"], 6)
    # ADC with m=4 subspaces on 64-dim should beat random guessing by far
    assert r["recall"] >= 0.3
