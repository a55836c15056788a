"""Pins for caps_profile and label_balance_card."""

from __future__ import annotations

import math


def test_caps_profile_hand(spark, tmp_path):
    from metis_spark.driver.queries_corpus import _q_caps_profile

    docs = spark.createDataFrame(
        [
            (1, "BUY NOW LIMITED", "en", "SPAM", 0),   # all caps: shouting
            (2, "Hello World", "en", "SPAM", 0),       # 2/10 caps
            (3, "quiet prose here", "en", "CLEAN", 0), # zero caps
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "sf")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r["source"]: r for r in _q_caps_profile(spark, d).collect()}
    spam = got["SPAM"]
    assert spam["n_shouting_docs"] == 1
    # caps: 13 of 13 + 2 of 10 → 15/23
    assert spam["caps_ratio_micro"] == (1_000_000 * 15) // 23
    assert got["CLEAN"]["caps_ratio_micro"] == 0
    assert got["CLEAN"]["n_shouting_docs"] == 0


def test_label_balance_hand(spark, tmp_path):
    from metis_spark.driver.queries_similarity import _q_label_balance_card

    emb = spark.createDataFrame(
        [(i, [1.0, 0.0], 0) for i in range(9)] + [(100, [0.0, 1.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    d = str(tmp_path / "sf")
    emb.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    row = _q_label_balance_card(spark, d).collect()[0]
    assert (row["n_labels"], row["n_vectors"]) == (2, 10)
    assert row["max_share_micro"] == 900_000
    assert row["imbalance_ratio_micro"] == 9_000_000
    exp = round(math.log(10.0) * 1e6) - (9 * round(math.log(9.0) * 1e6)) // 10
    assert row["balance_entropy_micro"] == exp


def test_simhash_sweep_cumulative_consistency(spark):
    import os

    from metis_spark.driver.queries_corpus import _q_simhash_threshold_sweep

    d = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    rows = sorted(
        _q_simhash_threshold_sweep(spark, d).collect(), key=lambda r: r["h_threshold"]
    )
    assert [r["h_threshold"] for r in rows] == [0, 1, 2, 3]
    # cumulative = running sum of at-h counts, non-decreasing
    run = 0
    for r in rows:
        run += r["n_pairs_at"]
        assert r["n_pairs_cum"] == run
