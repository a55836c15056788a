"""Pins for watermark_lateness_audit and edge_hygiene_audit."""

from __future__ import annotations

import datetime as dt


def _write_events(tmp_path, spark, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_watermark_lateness_hand(spark, tmp_path):
    from metis_spark.driver.queries_relational import (
        _q_watermark_lateness_audit,
    )

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    # arrival order (event_id) vs event time: event 3 arrives 100s
    # late, event 5 arrives 30s late, the rest in order
    rows = [
        (1, t0, 1, "x", 0.0, ""),
        (2, t0 + 200 * s, 1, "x", 0.0, ""),
        (3, t0 + 100 * s, 1, "x", 0.0, ""),  # 100s behind the HWM (200)
        (4, t0 + 300 * s, 1, "x", 0.0, ""),
        (5, t0 + 270 * s, 1, "x", 0.0, ""),  # 30s behind the HWM (300)
        (6, t0 + 400 * s, 1, "x", 0.0, ""),
    ]
    d = _write_events(tmp_path, spark, rows)
    got = {r["delay_s"]: r for r in _q_watermark_lateness_audit(spark, d).collect()}
    assert got[0]["n_events"] == 6
    assert got[0]["n_late"] == 2  # any lateness > 0
    assert got[60]["n_late"] == 1  # only the 100s straggler
    assert got[600]["n_late"] == 0  # 10-min watermark loses nothing
    assert got[0]["late_rate_micro"] == (1_000_000 * 2) // 6


def test_edge_hygiene_on_testdata(spark):
    import os

    from metis_spark.driver.queries_graph_structure import (
        _q_edge_hygiene_audit,
    )

    d = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    row = _q_edge_hygiene_audit(spark, d).collect()[0]
    # structural invariants of the card itself
    assert row["n_raw"] == row["n_self_loops"] + row["n_dup_directed"] + row["n_distinct"]
    assert 0 <= row["reciprocity_micro"] <= 1_000_000
    assert row["n_sources_only"] >= 0 and row["n_sinks_only"] >= 0
    assert row["n_distinct"] > 0


def test_media_frame_plan_matches_sampler(spark):
    """The plan's n_frames must equal what sample_frames actually
    emits per item (the digests are pinned in test_multimodal)."""
    import os

    from metis_spark.driver.queries_similarity import _q_media_frame_plan
    from metis_spark.operators.multimodal import sample_frames, synthesize_media

    media = synthesize_media(spark, 30)
    frames = sample_frames(media, every_ms=500)
    emitted = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert emitted  # the sampler produced rows
    d = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    plan = {
        r["media_id"]: r["n_frames"] for r in _q_media_frame_plan(spark, d).collect()
    }
    shared = set(emitted) & set(plan)
    assert shared
    for mid in shared:
        assert plan[mid] == emitted[mid], (mid, plan[mid], emitted[mid])


def test_degree_drift_ks_bounds(spark):
    import os

    from metis_spark.driver.queries_misc import _q_degree_drift_ks

    d = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    row = _q_degree_drift_ks(spark, d).collect()[0]
    assert row["n1"] > 0 and row["n2"] > 0
    assert 0 <= row["ks_micro"] <= 1_000_000
    assert row["d_at"] >= 1
