"""psi_value_drift hand pins: identical halves ⇒ PSI ≈ 0; a shifted
distribution ⇒ PSI far above the 0.25 drift line."""

from __future__ import annotations

import datetime as dt
import math


def _write_events(tmp_path, spark, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_psi_stable_vs_shifted(spark, tmp_path):
    from metis_spark.driver.queries_relational import _q_psi_value_drift

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows, eid = [], 0
    # type 'stable': the same values in both halves
    for half, base in ((0, t0), (1, t0 + 10 * h)):
        for v in (1.0, 2.0, 3.0, 4.0, 5.0) * 4:
            eid += 1
            rows.append((eid, base + (eid % 3) * h / 10, 1, "stable", v, ""))
    # type 'drift': low values early, high values late
    for v in (1.0,) * 20:
        eid += 1
        rows.append((eid, t0, 1, "drift", v, ""))
    for v in (9.0,) * 20:
        eid += 1
        rows.append((eid, t0 + 10 * h, 1, "drift", v, ""))
    d = _write_events(tmp_path, spark, rows)
    got = {r["event_type"]: r for r in _q_psi_value_drift(spark, d).collect()}
    stable = got["stable"]
    assert stable["n_first"] == 20 and stable["n_second"] == 20
    assert abs(stable["psi_micro"]) < 20_000  # ≈ 0 (smoothing residue)
    drift = got["drift"]
    assert drift["psi_micro"] > 250_000  # far above the 0.25 drift line


def test_psi_hand_value(spark, tmp_path):
    """Exact replay of the smoothed two-bin-occupied case."""
    from metis_spark.driver.queries_relational import _q_psi_value_drift

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        (1, t0, 1, "x", 0.0, ""),
        (2, t0, 1, "x", 0.0, ""),
        (3, t0 + 10 * h, 1, "x", 10.0, ""),
        (4, t0 + 10 * h, 1, "x", 10.0, ""),
    ]
    d = _write_events(tmp_path, spark, rows)
    row = _q_psi_value_drift(spark, d).collect()[0]
    # first half: 2 rows in bin 0; second half: 2 rows in bin 9
    # p smoothed: occupied = 3/12, empty = 1/12 on each side
    def term(c1, c2):
        p1, p2 = (c1 + 1) / 12.0, (c2 + 1) / 12.0
        return round((p2 - p1) * math.log(((c2 + 1) * 12.0) / ((c1 + 1) * 12.0)) * 1e6)

    expected = term(2, 0) + term(0, 2) + 8 * term(0, 0)
    assert row["psi_micro"] == expected
