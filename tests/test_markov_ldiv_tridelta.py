"""Pins for markov_next_accuracy, l_diversity_audit,
triangle_delta_on_insert."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from metis_spark.plans.triangles import triangle_delta_on_insert

from tests.conftest import edges_df


def _write_events(tmp_path, spark, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_markov_accuracy_hand(spark, tmp_path):
    from metis_spark.driver.queries_relational import _q_markov_next_accuracy

    t0 = dt.datetime(2024, 1, 1)
    # user 1 sequence: a b a b a  — transitions a→b ×2, b→a ×2
    # user 2 sequence: a a a      — transitions a→a ×2
    seq = [("a", 1), ("b", 1), ("a", 1), ("b", 1), ("a", 1), ("a", 2), ("a", 2), ("a", 2)]
    rows = [
        (i, t0 + dt.timedelta(minutes=i), u, t, 0.0, "") for i, (t, u) in enumerate(seq)
    ]
    d = _write_events(tmp_path, spark, rows)
    got = {r["prev_type"]: r for r in _q_markov_next_accuracy(spark, d).collect()}
    # a→a ×2 vs a→b ×2: tie breaks to 'a'
    assert got["a"]["pred_type"] == "a" and got["a"]["c_pred"] == 2
    assert got["a"]["c_total"] == 4
    assert got["b"]["pred_type"] == "a" and got["b"]["c_total"] == 2
    # correct = 2 (a→a) + 2 (b→a) of 6 transitions
    assert got["a"]["accuracy_micro"] == (1_000_000 * 4) // 6


def test_l_diversity_hand(spark, tmp_path):
    from metis_spark.driver.queries_relational import _q_l_diversity_audit

    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    rows = [
        # class (x, 9): 3 rows, 3 distinct users — diverse at l=2,3
        (1, t0, 1, "x", 0.0, ""),
        (2, t0, 2, "x", 0.0, ""),
        (3, t0, 3, "x", 0.0, ""),
        # class (y, 9): 4 rows but ONE user — linkable for every l ≥ 2
        (4, t0, 7, "y", 0.0, ""),
        (5, t0, 7, "y", 0.0, ""),
        (6, t0, 7, "y", 0.0, ""),
        (7, t0, 7, "y", 0.0, ""),
    ]
    d = _write_events(tmp_path, spark, rows)
    got = {r["l_threshold"]: r for r in _q_l_diversity_audit(spark, d).collect()}
    assert got[2]["n_classes"] == 2
    assert got[2]["n_classes_below_l"] == 1 and got[2]["n_rows_at_risk"] == 4
    # at l=5 even the 3-user class is below threshold
    assert got[5]["n_classes_below_l"] == 2 and got[5]["n_rows_at_risk"] == 7


def _und(spark, pairs):
    e = edges_df(spark, pairs)
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def test_triangle_delta_hand(spark):
    # base: path 1-2-3 plus 3-4; inserting (1,3) closes ONE triangle
    # (via 2); inserting (1,4) closes none
    base = _und(spark, [(1, 2), (2, 3), (3, 4)])
    ins = spark.createDataFrame([(1, 3), (1, 4)], "src long, dst long")
    got = {
        (r["src"], r["dst"]): r["delta"]
        for r in triangle_delta_on_insert(base, ins).collect()
    }
    assert got == {(1, 3): 1, (1, 4): 0}


def test_triangle_delta_equals_common_neighbors(spark):
    # K4 base minus edge (1,2): inserting (1,2) closes |N(1)∩N(2)| = 2
    base = _und(spark, [(1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    ins = spark.createDataFrame([(1, 2)], "src long, dst long")
    rows = triangle_delta_on_insert(base, ins).collect()
    assert rows[0]["delta"] == 2


def test_transition_dwell_hand(spark, tmp_path):
    import datetime as dt

    from metis_spark.driver.queries_relational import _q_transition_dwell_stats

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        (1, t0, 1, "a", 0.0, ""),
        (2, t0 + 10 * s, 1, "b", 0.0, ""),   # a→b gap 10
        (3, t0 + 40 * s, 1, "a", 0.0, ""),   # b→a gap 30
        (4, t0 + 60 * s, 1, "b", 0.0, ""),   # a→b gap 20
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {
        (r["prev_type"], r["next_type"]): r
        for r in _q_transition_dwell_stats(spark, d).collect()
    }
    ab = got[("a", "b")]
    assert ab["n"] == 2 and ab["p50_gap_s"] == 15.0
    assert ab["mean_gap_s_micro"] == (1_000_000 * 30) // 2
    assert got[("b", "a")]["p50_gap_s"] == 30.0
