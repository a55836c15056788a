"""mad_outliers (driver/queries_relational.py) — robust-z pins."""

from __future__ import annotations

import datetime as dt

from metis_spark.driver.queries_relational import _q_mad_outliers


def _write(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1), 1, k, float(v), "{}")
         for i, (k, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_single_spike_flagged(spark, tmp_path):
    rows = [("view", v) for v in (1, 2, 3, 4, 5, 1000)]
    sf = _write(spark, tmp_path, rows)
    out = {r["event_type"]: r for r in _q_mad_outliers(spark, sf).collect()}
    r = out["view"]
    # med 3.5, adevs [2.5,1.5,.5,.5,1.5,996.5] -> mad 1.5; cutoff 5.25
    assert r["med"] == 3.5 and r["mad"] == 1.5
    assert r["n_outliers"] == 1
    assert r["outlier_rate"] == round(1 / 6, 6)


def test_degenerate_mad_null_rate(spark, tmp_path):
    rows = [("click", 7)] * 5
    sf = _write(spark, tmp_path, rows)
    r = _q_mad_outliers(spark, sf).collect()[0]
    assert r["mad"] == 0.0 and r["n_outliers"] == 0 and r["outlier_rate"] is None
