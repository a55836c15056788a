"""bpe_fertility (operators/bpe.py) — tokenizer-evaluation pins:

- the trained-on language compresses: its fertility drops below the
  untrained language's at the same mean word length;
- with zero merges fertility equals mean word length exactly
  (every char is a token) and chars_per_token is exactly 1;
- counts are exact integers (n_chars = Σ word lengths).
"""

from __future__ import annotations

from metis_spark.operators.bpe import bpe_fertility


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_trained_language_compresses(spark):
    # 'aa' dominates: merges learn (a,a) etc.; 'zy' never merges first
    rows = [(i, "hot", "abab abab abab") for i in range(10)] + [
        (100, "cold", "zyzy zqzq")
    ]
    out = {r["lang"]: r for r in bpe_fertility(_df(spark, rows), k=3).collect()}
    assert out["hot"]["fertility"] < out["cold"]["fertility"]
    assert out["hot"]["chars_per_token"] > out["cold"]["chars_per_token"]


def test_zero_merges_is_characters(spark):
    rows = [(1, "xx", "abc de")]
    r = bpe_fertility(_df(spark, rows), k=0).collect()[0]
    assert (r["n_words"], r["n_symbols"], r["n_chars"]) == (2, 5, 5)
    assert r["fertility"] == 2.5
    assert r["chars_per_token"] == 1.0
