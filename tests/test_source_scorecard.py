"""source_scorecard (operators/corpus_stats.py) — pins:

- dup_docs counts exact normalized duplicates within a source (and
  whitespace-normalization folds trivial variants together);
- a two-language 50/50 source scores entropy ln 2; a monolingual
  source scores 0;
- avg_quality orders a wordy source above a punctuation-heavy one.
"""

from __future__ import annotations

import math

from metis_spark.operators.corpus_stats import source_scorecard


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )


def test_dup_and_entropy(spark):
    rows = [
        (1, "mirror", "en", "the same page here"),
        (2, "mirror", "en", "the  same   page here"),  # normalizes equal
        (3, "mirror", "de", "ganz anderer inhalt hier"),
        (4, "mirror", "de", "noch ein anderer text"),
        (5, "mono", "en", "unique text one"),
        (6, "mono", "en", "unique text two"),
    ]
    got = {r["source"]: r for r in source_scorecard(_df(spark, rows)).collect()}
    m = got["mirror"]
    assert (m["n_docs"], m["dup_docs"]) == (4, 1)
    assert m["lang_entropy"] == round(math.log(2), 6)  # 2/4·ln2 ×2
    assert got["mono"]["dup_docs"] == 0
    assert got["mono"]["lang_entropy"] == 0.0


def test_quality_ordering(spark):
    wordy = " ".join(["the quick brown fox jumps over a lazy dog"] * 12)
    noisy = "@@!! ## $$%% ^^&&" * 10
    rows = [(1, "good", "en", wordy), (2, "bad", "en", noisy)]
    got = {r["source"]: r for r in source_scorecard(_df(spark, rows)).collect()}
    assert got["good"]["avg_quality"] > got["bad"]["avg_quality"]
    assert got["good"]["quality_micro_sum"] > 0
