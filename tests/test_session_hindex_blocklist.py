"""Pins for session_stats, graph_h_index, blocklist_rate."""

from __future__ import annotations

import datetime as dt

from metis_spark.plans.metrics import graph_h_index

from tests.conftest import edges_df


def _write_events(tmp_path, spark, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_session_stats_hand(spark, tmp_path):
    from metis_spark.driver.queries_relational import _q_session_stats

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    h6 = dt.timedelta(hours=6)
    rows = [
        # user 1: one 3-event session lasting 10 min
        (1, t0, 1, "x", 0.0, ""),
        (2, t0 + 4 * m, 1, "x", 0.0, ""),
        (3, t0 + 10 * m, 1, "x", 0.0, ""),
        # user 1 later: bounce (1 event)
        (4, t0 + h6, 1, "x", 0.0, ""),
        # user 2: bounce
        (5, t0, 2, "x", 0.0, ""),
    ]
    d = _write_events(tmp_path, spark, rows)
    row = _q_session_stats(spark, d).collect()[0]
    assert row["n_sessions"] == 3
    assert row["bounce_rate_micro"] == (1_000_000 * 2) // 3
    assert row["p50_events"] == 1.0  # {3,1,1} median
    assert row["p90_duration_s"] == 480.0  # interpolated over {600,0,0}
    assert row["mean_events_micro"] == (1_000_000 * 5) // 3


def test_graph_h_index_values(spark):
    # star K1,5: degrees {5,1×5} — h = 1? N≥(1)=6≥1, N≥(2)=1<2 ⇒ h=1
    row = graph_h_index(edges_df(spark, [(0, i) for i in range(1, 6)])).collect()[0]
    assert (row["n_vertices"], row["d_max"], row["h_index"]) == (6, 5, 1)
    # K4: degrees all 3 ⇒ h = 3
    row = graph_h_index(
        edges_df(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    ).collect()[0]
    assert row["h_index"] == 3
    # two degree-5 hubs sharing leaves: h = min(5, 2)? degrees 5,5,2×4:
    # N≥(2)=6≥2, N≥(3)=2<3 ⇒ h=2
    pairs = [(0, i) for i in range(2, 6)] + [(1, i) for i in range(2, 6)] + [(0, 1)]
    row = graph_h_index(edges_df(spark, pairs)).collect()[0]
    assert row["h_index"] == 2


def test_blocklist_rate_hand(spark, tmp_path):
    from metis_spark.driver.queries_corpus import _q_blocklist_rate

    docs = spark.createDataFrame(
        [
            (1, "click here to buy now", "en", "SPAM", 0),   # 2 hits / 5 toks
            (2, "free free free", "en", "SPAM", 0),          # 3 hits / 3 toks
            (3, "a quiet afternoon essay", "en", "CLEAN", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "sf")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r["source"]: r for r in _q_blocklist_rate(spark, d).collect()}
    assert got["SPAM"]["n_flagged_docs"] == 2
    assert got["SPAM"]["marker_rate_micro"] == (1_000_000 * 5) // 8
    assert got["CLEAN"]["n_flagged_docs"] == 0
    assert got["CLEAN"]["marker_rate_micro"] == 0
