"""Pins for gini_profile (user-activity reuse) and hour_of_week_profile."""

from __future__ import annotations

import datetime as dt

from metis_spark.plans.metrics import gini_profile


def test_gini_profile_extremes(spark):
    # perfectly equal counts ⇒ Gini 0
    eq = spark.createDataFrame([(i, 5) for i in range(10)], "id long, deg long")
    row = gini_profile(eq).collect()[0]
    assert row["gini"] == 0.0
    assert row["top1pct_k"] == 1 and row["top1pct_share"] == 0.1
    # one holder owns everything (others hold 1): high Gini
    sk = spark.createDataFrame(
        [(0, 991)] + [(i, 1) for i in range(1, 10)], "id long, deg long"
    )
    row = gini_profile(sk).collect()[0]
    assert row["sum_deg"] == 1000
    assert row["gini"] > 0.85
    assert row["top1pct_share"] == 0.991


def _write_events(tmp_path, spark, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_hour_of_week_hand(spark, tmp_path):
    from metis_spark.driver.queries_relational import _q_hour_of_week_profile

    # 2024-01-07 was a Sunday (dow 0); 3 events Sunday 9h, 1 Monday 14h
    sun9 = dt.datetime(2024, 1, 7, 9, 30)
    mon14 = dt.datetime(2024, 1, 8, 14, 5)
    rows = [(i, sun9, 1, "x", 0.0, "") for i in range(3)] + [
        (9, mon14, 1, "x", 0.0, "")
    ]
    d = _write_events(tmp_path, spark, rows)
    got = {(r["dow"], r["hod"]): r for r in _q_hour_of_week_profile(spark, d).collect()}
    assert got[(0, 9)]["n"] == 3 and got[(1, 14)]["n"] == 1
    assert got[(0, 9)]["share_micro"] == 750_000
    # chi2 vs uniform over the 2 OBSERVED cells: exp=2 each,
    # cells (3-2)²/2 + (1-2)²/2 = 1.0
    assert got[(0, 9)]["chi2_total_micro"] == 1_000_000
