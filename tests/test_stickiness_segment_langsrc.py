"""Pins for stickiness_card, segment_order_stats, lang_source_entropy."""

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


def test_stickiness_hand(spark, tmp_path):
    from metis_spark.driver.queries_relational import _q_stickiness_card

    d1 = dt.datetime(2024, 1, 1, 10)
    d2 = dt.datetime(2024, 1, 2, 10)
    rows = [
        (1, d1, 1, "x", 0.0, ""),
        (2, d2, 1, "x", 0.0, ""),   # user 1: two days
        (3, d1, 2, "x", 0.0, ""),   # user 2: one day (two events)
        (4, d1, 2, "x", 0.0, ""),
    ]
    d = _write_events(tmp_path, spark, rows)
    row = _q_stickiness_card(spark, d).collect()[0]
    assert (row["n_users"], row["n_days"], row["user_days"]) == (2, 2, 3)
    assert row["avg_dau_micro"] == (1_000_000 * 3) // 2
    assert row["multi_day_user_rate_micro"] == 500_000


def test_segment_order_stats_on_testdata(spark):
    import os

    from metis_spark.driver.queries_relational import _q_segment_order_stats

    d = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    rows = _q_segment_order_stats(spark, d).collect()
    assert len(rows) == 5  # the five TPC-H segments
    for r in rows:
        assert r["n_orders"] > 0
        assert r["p50_price"] <= r["p90_price"]
        # mean in cents consistent with the price scale
        assert r["mean_cents"] > 100 * 1


def test_lang_source_entropy_hand(spark, tmp_path):
    from metis_spark.driver.queries_corpus import _q_lang_source_entropy

    docs = spark.createDataFrame(
        # en: 2 docs from A + 2 from B → H = ln 4 − (4·ln2)/4 = ln 2;
        # de: all 3 from one source → H = 0, top share 1
        [
            (1, "t", "en", "A", 0), (2, "t", "en", "A", 0),
            (3, "t", "en", "B", 0), (4, "t", "en", "B", 0),
            (5, "t", "de", "C", 0), (6, "t", "de", "C", 0), (7, "t", "de", "C", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "sf")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r["lang"]: r for r in _q_lang_source_entropy(spark, d).collect()}
    en = got["en"]
    exp = round(math.log(4.0) * 1e6) - (4 * round(math.log(2.0) * 1e6)) // 4
    assert en["entropy_micro"] == exp  # = ln 2 in micro-nats
    assert en["top_source_share_micro"] == 500_000
    de = got["de"]
    assert de["entropy_micro"] == round(math.log(3.0) * 1e6) - (3 * round(math.log(3.0) * 1e6)) // 3
    assert de["top_source_share_micro"] == 1_000_000
