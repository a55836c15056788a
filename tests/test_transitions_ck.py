"""event_transitions + clustering_by_degree — hand-counted pins."""

from __future__ import annotations

import datetime as dt

from metis_spark.driver.queries_relational import _q_event_transitions
from metis_spark.driver.queries_graph_structure import _q_clustering_by_degree
from metis_spark.plans.metrics import local_clustering

from tests.conftest import edges_df


def test_transitions(spark, tmp_path):
    rows = [
        (1, 1, "view", 0), (2, 1, "click", 10), (3, 1, "view", 20),
        (4, 2, "view", 0), (5, 2, "click", 5),
    ]
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u, k, 0.0, "{}")
         for i, u, k, s in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {(r["prev_type"], r["next_type"]): r for r in _q_event_transitions(spark, str(tmp_path)).collect()}
    assert out[("view", "click")]["n"] == 2
    assert out[("click", "view")]["n"] == 1
    assert out[("view", "click")]["prob"] == 1.0
    assert out[("click", "view")]["prob"] == 1.0


def test_ck_consistency_with_lcc(spark):
    # barbell: degree-2 vertices (4 of them) have lcc 1; degree-3 (2) have lcc 1/3
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    lcc = {r["id"]: r for r in local_clustering(edges_df(spark, pairs)).collect()}
    assert lcc[1]["lcc"] == 1.0 and lcc[3]["lcc"] == round(1 / 3, 6)
