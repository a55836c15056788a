"""Hand pins for the r5 event/relational trio:

- cusum_changepoints: a clean mean shift peaks at the shift point with
  the exact max|Σ(v−v̄)|/n magnitude; a constant series peaks at 0.
- max_concurrency: overlapping vs gap-separated sessions; the
  closed-open end convention never double-counts back-to-back
  sessions; peak_epoch is the earliest peak instant.
- benford_audit: digit extraction is the exact leading digit of
  FLOOR(price); a perfectly Benford-proportioned sample scores ~0
  chi-square, a single-digit column scores astronomically.
"""

from __future__ import annotations

import datetime as dt

from metis_spark.driver.queries_relational import (
    BENFORD_P_MICRO,
    _q_benford_audit,
    _q_cusum_changepoints,
    _q_max_concurrency,
)


def _write_events(tmp_path, spark, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def _write_lineitem(tmp_path, spark, prices):
    rows = [
        (i, 1, 1, 1, 1.0, float(p), 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1))
        for i, p in enumerate(prices)
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    return d


def test_cusum_clean_shift(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "x", v, "")
        for i, v in enumerate([0.0, 0.0, 0.0, 10.0, 10.0, 10.0])
    ]
    # constant control series: peak must be exactly 0
    rows += [
        (10 + i, t0 + dt.timedelta(minutes=i), 1, "y", 7.0, "") for i in range(4)
    ]
    d = _write_events(tmp_path, spark, rows)
    got = {r["event_type"]: r for r in _q_cusum_changepoints(spark, d).collect()}
    x = got["x"]
    # mean 5, deviations −5×3 then +5×3: the centered prefix sum peaks
    # at |−15| value units after the three pre-shift rows
    assert x["cusum_peak"] == 15.0
    assert x["peak_frac"] == 0.5  # argmax at row 3 of 6
    assert x["peak_epoch"] == int((t0 + dt.timedelta(minutes=2)).timestamp())
    y = got["y"]
    assert y["cusum_peak"] == 0.0


def test_max_concurrency_overlap_and_closed_open(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    h = dt.timedelta(hours=3)  # > 30-min gap → separate sessions
    rows = [
        # three users online simultaneously at t0 (sessions overlap)
        (1, t0, 1, "x", 0.0, ""),
        (2, t0 + dt.timedelta(minutes=5), 2, "x", 0.0, ""),
        (3, t0 + dt.timedelta(minutes=10), 3, "x", 0.0, ""),
        # user 1 again much later: second session, alone
        (4, t0 + h, 1, "x", 0.0, ""),
    ]
    d = _write_events(tmp_path, spark, rows)
    row = _q_max_concurrency(spark, d).collect()[0]
    assert row["n_sessions"] == 4
    assert row["peak_concurrency"] == 3
    # peak first attained when the third session opens
    assert row["peak_epoch"] == int((t0 + dt.timedelta(minutes=10)).timestamp())


def test_max_concurrency_back_to_back_no_double_count(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    # user 1's session ends exactly (last + 30min) when user 2's starts:
    # closed-open [s, e) ⇒ concurrency never reaches 2
    rows = [
        (1, t0, 1, "x", 0.0, ""),
        (2, t0 + dt.timedelta(minutes=30), 2, "x", 0.0, ""),
    ]
    d = _write_events(tmp_path, spark, rows)
    row = _q_max_concurrency(spark, d).collect()[0]
    assert row["n_sessions"] == 2
    assert row["peak_concurrency"] == 1
    assert row["peak_epoch"] == int(t0.timestamp())


def test_benford_extreme_and_proportioned(spark, tmp_path):
    # single-digit column: all prices lead with 9 → huge chi2, digit row
    d = _write_lineitem(tmp_path, spark, [900.5, 987.25, 9999.0, 91.75])
    rows = {r["digit"]: r for r in _q_benford_audit(spark, d).collect()}
    assert set(rows) == {9}
    r9 = rows[9]
    assert r9["n_obs"] == 4
    assert r9["exp_micro"] == 4 * BENFORD_P_MICRO[9]
    assert r9["chi2_micro"] == r9["chi2_total_micro"]
    # chi2 = (4 - 4*p9)^2 / (4*p9) ≈ 3.56 / 0.183 ≈ 19.5 — far above 0
    assert r9["chi2_total_micro"] > 15_000_000

    # a 100-row sample laid out in Benford proportions scores tiny chi2
    import math

    counts = {dd: round(math.log10(1 + 1 / dd) * 100) for dd in range(1, 10)}
    prices = [float(f"{dd}10.0") for dd, c in counts.items() for _ in range(c)]
    d2 = _write_lineitem(tmp_path, spark, prices)
    out = _q_benford_audit(spark, d2).collect()
    tot = out[0]["chi2_total_micro"]
    assert sum(r["n_obs"] for r in out) == sum(counts.values())
    assert tot < 1_000_000  # chi-square below 1 on 8 df ⇒ Benford-consistent


def test_heavy_hitter_stability_hand(spark, tmp_path):
    from metis_spark.driver.queries_relational import (
        HH_STAB_MIN,
        _q_heavy_hitter_stability,
    )

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows, eid = [], 0
    # user 1: heavy in BOTH halves; user 2: heavy only early;
    # user 3: heavy only late
    for u, (early, late) in ((1, (3, 3)), (2, (3, 0)), (3, (0, 3))):
        for _ in range(early):
            eid += 1
            rows.append((eid, t0, u, "x", 0.0, ""))
        for _ in range(late):
            eid += 1
            rows.append((eid, t0 + 10 * h, u, "x", 0.0, ""))
    assert HH_STAB_MIN == 3
    d = _write_events(tmp_path, spark, rows)
    row = _q_heavy_hitter_stability(spark, d).collect()[0]
    assert (row["n_first"], row["n_second"], row["n_both"]) == (2, 2, 1)
    assert row["jaccard_micro"] == (1_000_000 * 1) // 3
    # second-half heavy mass: u1=3 + u3=3; stable share = 3/6
    assert row["mass_overlap_micro"] == 500_000
