"""vocab_coverage_curve (operators/corpus_stats.py) — hand-counted pin
on a tiny corpus, plus monotonicity at sf0.001."""

from __future__ import annotations

from metis_spark.operators.corpus_stats import vocab_coverage_curve


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_counted(spark):
    # freqs: a:4, b:2, c:1 -> top-1 covers 4/7, top-2 covers 6/7
    out = vocab_coverage_curve(
        _docs(spark, [(1, "a a a a b b c")]), ks=(1, 2)
    ).collect()
    r = {x["k"]: x for x in out}
    assert r[1]["covered_tokens"] == 4 and r[1]["coverage"] == round(4 / 7, 6)
    assert r[2]["covered_tokens"] == 6 and r[2]["vocab_size"] == 2


def test_exhausted_vocab(spark):
    out = vocab_coverage_curve(_docs(spark, [(1, "x y")]), ks=(10,)).collect()[0]
    assert out["vocab_size"] == 2 and out["coverage"] == 1.0


def test_monotone(spark):
    out = vocab_coverage_curve(
        _docs(spark, [(1, "a a b c d e f g h i j k")]), ks=(1, 3, 10)
    ).collect()
    cov = [r["coverage"] for r in sorted(out, key=lambda r: r["k"])]
    assert cov == sorted(cov)
