"""decayed_event_counts (__spark_entry__ relational family) — pins:

- an event AT the horizon weighs exactly 1.0, one half-life back
  exactly 0.5 (micro-quantized);
- recency beats volume: one fresh event outranks three ancient ones;
- per-user counts are exact.
"""

from __future__ import annotations

import datetime as dt

from metis_spark.driver.queries_relational import DECAY_HALF_LIFE_S, _q_decayed_counts


def _write(tmp_path, spark, rows):
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string")
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_half_life_and_recency(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 10, 0, 0, 0)
    day = dt.timedelta(seconds=DECAY_HALF_LIFE_S)
    rows = [
        (1, t0, 1, "x", 0.0, ""),              # fresh: weight 1.0
        (2, t0 - day, 2, "x", 0.0, ""),        # one half-life: 0.5
        (3, t0 - 10 * day, 3, "x", 0.0, ""),   # ancient ×3
        (4, t0 - 10 * day, 3, "x", 0.0, ""),
        (5, t0 - 10 * day, 3, "x", 0.0, ""),
    ]
    d = _write(tmp_path, spark, rows)
    got = {r["user_id"]: r for r in _q_decayed_counts(spark, d).collect()}
    assert got[1]["decayed_micro"] == 1_000_000
    assert got[2]["decayed_micro"] == 500_000
    assert got[3]["n_events"] == 3
    assert got[3]["decayed_micro"] == 3 * round(2 ** -10 * 1e6)
    assert got[1]["decayed"] > got[3]["decayed"]  # recency beats volume
