"""Pins for the r5 relational trio: TPC-H Q3 plan shape + hand values,
hourly Pearson on completed grids, session co-lift."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from metis_spark.driver.queries_relational import (
    _q_event_type_correlation,
    _q_session_colift,
    _q_tpch_q3_topk,
)

TESTDATA = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_plan_shape(spark):
    """Filters reach the scans, customer broadcasts, top-k is
    TakeOrderedAndProject — the 100 TB contract for the 3-way join."""
    plan = _executed(_q_tpch_q3_topk(spark, TESTDATA))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan


def test_q3_revenue_is_exact_cents(spark):
    rows = _q_tpch_q3_topk(spark, TESTDATA).collect()
    assert 0 < len(rows) <= 10
    assert rows[0]["rank"] == 1
    revs = [r["revenue_cents"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert all(isinstance(v, int) and v > 0 for v in revs)


def _write_events(tmp_path, spark, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_correlation_perfect_and_anti(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # type a: 1,2,3 events in hours 0,1,2 — type b identical (r=+1);
    # type c: 3,2,1 (r=−1 against both)
    for hour, (na, nb, nc) in enumerate([(1, 1, 3), (2, 2, 2), (3, 3, 1)]):
        for t, n in (("a", na), ("b", nb), ("c", nc)):
            for _ in range(n):
                eid += 1
                rows.append((eid, t0 + dt.timedelta(hours=hour), 1, t, 0.0, ""))
    d = _write_events(tmp_path, spark, rows)
    got = {
        (r["type_a"], r["type_b"]): r["r_micro"]
        for r in _q_event_type_correlation(spark, d).collect()
    }
    assert got[("a", "b")] == 1_000_000
    assert got[("a", "c")] == -1_000_000
    assert got[("b", "c")] == -1_000_000


def test_correlation_grid_completion(spark, tmp_path):
    # type b missing in hour 1 must count as 0, not be dropped: with
    # a = (1, 1, 1) constant and b = (1, 0, 1), a is degenerate ⇒ NULL
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "a", 0.0, ""),
        (2, t0 + dt.timedelta(hours=1), 1, "a", 0.0, ""),
        (3, t0 + dt.timedelta(hours=2), 1, "a", 0.0, ""),
        (4, t0, 1, "b", 0.0, ""),
        (5, t0 + dt.timedelta(hours=2), 1, "b", 0.0, ""),
    ]
    d = _write_events(tmp_path, spark, rows)
    rows_out = _q_event_type_correlation(spark, d).collect()
    assert len(rows_out) == 1
    assert rows_out[0]["n_hours"] == 3  # grid completed to all hours
    assert rows_out[0]["r_micro"] is None  # constant series ⇒ no r


def test_colift_coupled_vs_independent(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    h6 = dt.timedelta(hours=6)
    rows, eid = [], 0
    # users 1..4: sessions where x and y ALWAYS co-occur (2 sessions
    # each); z occurs alone in separate sessions of users 5..8
    for u in range(1, 5):
        for s in range(2):
            for t in ("x", "y"):
                eid += 1
                rows.append((eid, t0 + s * h6, u, t, 0.0, ""))
    for u in range(5, 9):
        eid += 1
        rows.append((eid, t0, u, "z", 0.0, ""))
    d = _write_events(tmp_path, spark, rows)
    got = {
        (r["type_a"], r["type_b"]): r for r in _q_session_colift(spark, d).collect()
    }
    xy = got[("x", "y")]
    # 12 sessions total, c_x = c_y = c_xy = 8 ⇒ lift = 12·8/64 = 1.5
    assert (xy["c_a"], xy["c_b"], xy["c_ab"]) == (8, 8, 8)
    assert xy["lift_micro"] == 1_500_000
    assert ("x", "z") not in got  # never co-occur ⇒ no pair row
