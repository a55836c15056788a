"""gopher_rules (operators/corpus_stats.py) — rule-audit pins:

- a compliant 60-word doc passes every flag;
- each rule trips independently on a purpose-built violator;
- the mean-word-length bounds are integer cross-multiplied (edge-exact
  at exactly 3.0 and 10.0 chars/word).
"""

from __future__ import annotations

from metis_spark.operators.corpus_stats import gopher_rules


def _rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["doc_id"]: r for r in gopher_rules(df).collect()}


def test_compliant_doc_passes(spark):
    good = "the quick brown fox jumps over the lazy dog and runs off with glee " * 5
    r = _rows(spark, [good.strip()])[0]
    assert r["n_words"] == 70
    assert r["passes"] and all(
        r[f]
        for f in (
            "f_word_count",
            "f_mean_word_len",
            "f_alpha_ratio",
            "f_stopwords",
            "f_symbol_ratio",
        )
    )


def test_each_rule_trips(spark):
    too_short = "the cat and the hat"
    numbers = ("the of " + "12345 " * 58).strip()  # <80% alphabetic words
    no_stops = "lorem ipsum dolor sit amet " * 12  # zero stopword hits
    symbols = ("the of and " + "# " * 20 + "word " * 40).strip()
    rows = _rows(spark, [too_short, numbers, no_stops, symbols])
    assert not rows[0]["f_word_count"] and rows[0]["f_stopwords"]
    assert not rows[1]["f_alpha_ratio"] and rows[1]["f_word_count"]
    assert not rows[2]["f_stopwords"] and rows[2]["f_alpha_ratio"]
    assert not rows[3]["f_symbol_ratio"] and rows[3]["n_symbols"] == 20
    assert not any(rows[i]["passes"] for i in range(4))


def test_mean_word_len_edges(spark):
    # exactly 3.0 chars/word and exactly 10.0 chars/word both pass;
    # 2.98 and 10.02 fail — the integer cross-multiplication is exact
    ok3 = "the " * 60  # 180 nonspace / 60 words = 3.0
    ok10 = "abcdefghij " * 60  # 10.0
    low = ("the " * 59 + "of ").strip()  # (177+2)/60 < 3
    rows = _rows(spark, [ok3.strip(), ok10.strip(), low])
    assert rows[0]["f_mean_word_len"]
    assert rows[1]["f_mean_word_len"]
    assert not rows[2]["f_mean_word_len"]
