"""user_burstiness (driver/queries_relational.py) — Goh-Barabasi pins
on synthetic event tables:

- metronome gaps: sigma = 0 -> B = -1;
- one long + one short gap: hand-computed B;
- users with a single gap are dropped.
"""

from __future__ import annotations

import datetime as dt
import math

from metis_spark.driver.queries_relational import _q_burstiness


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u, "view", 0.0, "{}")
         for i, (u, s) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def _run(spark, tmp_path, rows):
    sf = _write_events(spark, tmp_path, rows)
    return {r["user_id"]: r.asDict() for r in _q_burstiness(spark, sf).collect()}


def test_metronome(spark, tmp_path):
    rows = [(1, 0), (1, 10), (1, 20), (1, 30)]
    out = _run(spark, tmp_path, rows)
    assert out[1]["n_gaps"] == 3 and out[1]["sum_gap"] == 30
    assert out[1]["burstiness"] == -1.0


def test_bursty_hand_computed(spark, tmp_path):
    rows = [(7, 0), (7, 1), (7, 101)]  # gaps 1, 100
    out = _run(spark, tmp_path, rows)
    n, s1, s2 = 2, 101, 1 + 100 * 100
    sig = math.sqrt(n * s2 - s1 * s1)
    assert out[7]["burstiness"] == round((sig - s1) / (sig + s1), 6)


def test_single_gap_dropped(spark, tmp_path):
    out = _run(spark, tmp_path, [(3, 0), (3, 5)])
    assert 3 not in out
