"""ordered_funnel + retention_cohorts (driver/queries_relational.py)
— strict-order and cohort pins on synthetic event tables.
"""

from __future__ import annotations

import datetime as dt

from metis_spark.driver.queries_relational import (
    _q_ordered_funnel,
    _q_retention_cohorts,
)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u, k, 0.0, "{}")
         for i, (u, k, s) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_funnel_strict_order(spark, tmp_path):
    rows = [
        # user 1 completes in order
        (1, "view", 0), (1, "click", 10), (1, "purchase", 20),
        # user 2 clicks BEFORE viewing: stalls at step 1
        (2, "click", 0), (2, "view", 10),
        # user 3 views and clicks, purchase tied with click: strict > drops it
        (3, "view", 0), (3, "click", 5), (3, "purchase", 5),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {r["step"]: r for r in _q_ordered_funnel(spark, sf).collect()}
    assert out[1]["n_users"] == 3
    assert out[2]["n_users"] == 2       # users 1 and 3
    assert out[3]["n_users"] == 1       # only user 1
    assert out[2]["conversion"] == round(2 / 3, 6)
    assert out[3]["conversion"] == 0.5


def test_retention_cohort_matrix(spark, tmp_path):
    wk = 7 * 86400
    rows = [
        (1, "view", 0), (1, "view", wk), (1, "view", 2 * wk),
        (2, "view", 0), (2, "view", 2 * wk),
        (3, "view", wk),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {(r["cohort_week"], r["week_offset"]): r for r in _q_retention_cohorts(spark, sf).collect()}
    c0 = [k for k in out if k[1] == 0]
    assert len(c0) == 2  # two cohorts
    base = min(k[0] for k in out)
    assert out[(base, 0)]["n_users"] == 2          # users 1, 2
    assert out[(base, 1)]["n_users"] == 1          # user 1 only
    assert out[(base, 2)]["n_users"] == 2          # users 1, 2
    assert out[(base, 1)]["retention"] == 0.5
    assert out[(base + 1, 0)]["n_users"] == 1      # user 3's cohort
