"""Pins for intrinsic_dimension, conversion_time_stats, dp_noise_plan."""

from __future__ import annotations

import datetime as dt
import math

from metis_spark.operators.similarity import intrinsic_dimension


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_intrinsic_dimension_line_is_1d(spark):
    # points on a 1-D line embedded in 3-D: μ ratios reflect the line
    # geometry; with equal spacing d2/d1 = 2 for interior points
    pts = [(8 * i, [float(i), 2.0 * i, 0.5 * i], 0) for i in range(8)]
    row = intrinsic_dimension(_emb(spark, pts), mod=8).collect()[0]
    assert row["n_slice"] == 8 and row["n_used"] == 8
    # equally spaced 1-D: every point's two NNs are at r and 2r (ends)
    # or r and r... exclude ties: interior points have d1=d2 ⇒ lnμ=0?
    # no: interior has BOTH neighbours at distance r ⇒ d1sq=d2sq tie is
    # kept (distinct pair, same distance) ⇒ lnμ=0; ends have (r, 2r) ⇒
    # lnμ = ½ln4 = ln2. Σlnμ = 2·ln2 ⇒ ID = 8/(2ln2) ≈ 5.77
    exp = (10**12 * 8) // (2 * round(0.5 * math.log(4.0) * 1e6))
    assert row["id_micro"] == exp


def test_intrinsic_dimension_duplicates_excluded(spark):
    # two exact duplicates: their d²=0 pair is excluded; each still
    # has a second distinct neighbour so the estimate exists
    pts = [
        (0, [0.0, 0.0], 0),
        (8, [0.0, 0.0], 0),  # duplicate of 0
        (16, [1.0, 0.0], 0),
        (24, [3.0, 0.0], 0),
    ]
    row = intrinsic_dimension(_emb(spark, pts), mod=8).collect()[0]
    assert row["n_slice"] == 4
    assert row["n_used"] == 4  # everyone has 2 non-zero-distance NNs
    assert row["id_micro"] is not None and row["id_micro"] > 0


def _write_events(tmp_path, spark, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_conversion_time_hand(spark, tmp_path):
    from metis_spark.driver.queries_relational import _q_conversion_time_stats

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: click at t0, purchase 10 min later → gap 600
        (1, t0, 1, "click", 0.0, ""),
        (2, t0 + 10 * m, 1, "purchase", 0.0, ""),
        # user 2: purchase BEFORE the click doesn't count; the one
        # after (20 min) does → gap 1200
        (3, t0 - 5 * m, 2, "purchase", 0.0, ""),
        (4, t0, 2, "click", 0.0, ""),
        (5, t0 + 20 * m, 2, "purchase", 0.0, ""),
        # user 3: click only → not converted
        (6, t0, 3, "click", 0.0, ""),
    ]
    d = _write_events(tmp_path, spark, rows)
    row = _q_conversion_time_stats(spark, d).collect()[0]
    assert row["n_converted"] == 2
    assert row["p50_s"] == 900.0  # interpolated median of {600, 1200}
    assert row["mean_s_micro"] == (1_000_000 * 1800) // 2


def test_dp_noise_plan_drowns_small_classes(spark, tmp_path):
    from metis_spark.driver.common import DP_PLAN_GRID
    from metis_spark.driver.queries_corpus import _q_dp_noise_plan

    docs = spark.createDataFrame(
        # class (en, A, 0): 40 rows — survives ε=0.1 (p95 ≈ 30);
        # class (de, B, 0): 3 rows — drowned at ε=0.1 (< 29.96), but
        # above the ε=1 p95 of ln20 ≈ 2.996
        [(i, "t", "en", "A", 10) for i in range(40)]
        + [(100 + j, "t", "de", "B", 10) for j in range(3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "sf")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r["eps_micro"]: r for r in _q_dp_noise_plan(spark, d).collect()}
    eps01 = int(round(0.1 * 1e6))
    eps1 = int(round(1.0 * 1e6))
    assert got[eps01]["n_classes"] == 2
    assert got[eps01]["n_classes_drowned"] == 1
    assert got[eps01]["rows_in_drowned"] == 3
    assert got[eps1]["n_classes_drowned"] == 0
    assert {g[0] for g in DP_PLAN_GRID} == set(got)
