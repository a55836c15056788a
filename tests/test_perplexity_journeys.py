"""Pins for source_perplexity and top_user_journeys."""

from __future__ import annotations

import datetime as dt

from metis_spark.operators.corpus_stats import source_perplexity


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_source_perplexity_in_distribution_source(spark):
    # A and B share the same unigram distribution — each source's
    # cross-entropy equals the corpus entropy shape and KL ≈ 0
    d = _docs(
        spark,
        [(1, "a a b", "en", "A", 0), (2, "a a b", "en", "B", 0)],
    )
    got = {r["source"]: r for r in source_perplexity(d).collect()}
    for s in ("A", "B"):
        # p_s = p_corpus per token ⇒ KL = ln-quantization residue only
        assert abs(got[s]["kl_micro"]) <= 2
        assert got[s]["n_tokens"] == 3
        assert got[s]["cross_entropy_micro"] > 0


def test_source_perplexity_ood_source_high_kl(spark):
    # C's vocabulary is disjoint and rare in the corpus ⇒ its tokens
    # have low corpus probability ⇒ high cross-entropy and KL ≫ 0
    d = _docs(
        spark,
        [
            (1, "a a a a b b b b", "en", "A", 0),
            (2, "a a a b b b a b", "en", "B", 0),
            (3, "q r s t", "en", "C", 0),
        ],
    )
    got = {r["source"]: r for r in source_perplexity(d).collect()}
    assert got["C"]["kl_micro"] > got["A"]["kl_micro"]
    assert got["C"]["kl_micro"] > 1_000_000  # > 1 nat: clearly OOD
    assert got["A"]["kl_micro"] >= -2  # KL ≥ 0 up to ln rounding


def _write_events(tmp_path, spark, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_top_journeys_hand(spark, tmp_path):
    from metis_spark.driver.queries_relational import _q_top_user_journeys

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    h6 = dt.timedelta(hours=6)
    rows, eid = [], 0
    # three users run view>click>purchase; one runs view>view
    for u in (1, 2, 3):
        for i, t in enumerate(["view", "click", "purchase"]):
            eid += 1
            rows.append((eid, t0 + i * m, u, t, 0.0, ""))
    for i in range(2):
        eid += 1
        rows.append((eid, t0 + i * m, 9, "view", 0.0, ""))
    # user 1 returns 6h later (new session): click alone
    eid += 1
    rows.append((eid, t0 + h6, 1, "click", 0.0, ""))
    d = _write_events(tmp_path, spark, rows)
    got = _q_top_user_journeys(spark, d).collect()
    assert got[0]["journey"] == "view>click>purchase" and got[0]["n"] == 3
    assert got[0]["rank"] == 1
    names = {r["journey"]: r["n"] for r in got}
    assert names["view>view"] == 1 and names["click"] == 1


def test_journey_prefix_truncates_at_length(spark, tmp_path):
    from metis_spark.driver.queries_relational import (
        JOURNEY_LEN,
        _q_top_user_journeys,
    )

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=30)
    rows = [
        (i, t0 + i * s, 1, f"t{i}", 0.0, "") for i in range(JOURNEY_LEN + 3)
    ]
    d = _write_events(tmp_path, spark, rows)
    got = _q_top_user_journeys(spark, d).collect()
    assert len(got) == 1
    assert got[0]["journey"] == ">".join(f"t{i}" for i in range(JOURNEY_LEN))


def test_lang_source_mi_extremes(spark, tmp_path):
    from metis_spark.driver.queries_corpus import _q_lang_source_mi

    # perfectly dependent: each lang from exactly one source ⇒
    # MI = H(lang) (= H(source)); quantization residue ≤ a few micro
    docs = spark.createDataFrame(
        [(i, "t", "en", "A", 0) for i in range(4)]
        + [(10 + i, "t", "de", "B", 0) for i in range(4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "sf")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    row = _q_lang_source_mi(spark, d).collect()[0]
    assert abs(row["mi_micro"] - row["h_lang_micro"]) <= 3
    assert row["h_lang_micro"] > 600_000  # ≈ ln 2

    # independent: both sources carry both langs equally ⇒ MI ≈ 0
    docs2 = spark.createDataFrame(
        [(i, "t", lg, sc, 0) for i, (lg, sc) in enumerate(
            [(lg, sc) for lg in ("en", "de") for sc in ("A", "B")] * 3
        )],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d2 = str(tmp_path / "sf2")
    docs2.write.mode("overwrite").parquet(f"{d2}/documents.parquet")
    row2 = _q_lang_source_mi(spark, d2).collect()[0]
    assert abs(row2["mi_micro"]) <= 3


def test_value_autocorrelation_alternating(spark, tmp_path):
    import datetime as dt

    from metis_spark.driver.queries_relational import _q_value_autocorrelation

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    # alternating ±1 series: lag-1 r = −1 exactly
    rows = [
        (i, t0 + i * m, 1, "alt", float((-1) ** i), "") for i in range(10)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    row = _q_value_autocorrelation(spark, d).collect()[0]
    assert row["n_pairs"] == 9
    assert row["r_micro"] == -1_000_000
