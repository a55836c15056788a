"""vocab_cover_seeds (operators/sampling.py) — greedy max-cover pins:

- the textbook greedy trace: biggest doc first, then best MARGINAL
  gain (not the second-biggest doc);
- early stop once coverage is complete;
- covered_total telescopes to the union size.
"""

from __future__ import annotations

from metis_spark.operators.sampling import vocab_cover_seeds


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_marginal_gain_beats_raw_size(spark):
    texts = [
        "a b c d e",      # doc 0: 5 terms — picked first
        "a b c d x",      # doc 1: 5 terms but only 1 new after doc 0
        "p q r",          # doc 2: 3 terms, all new → better marginal
    ]
    rows = vocab_cover_seeds(_docs(spark, texts), k=3).collect()
    got = [(r["rank"], r["doc_id"], r["gain"], r["covered_total"]) for r in rows]
    assert got == [(1, 0, 5, 5), (2, 2, 3, 8), (3, 1, 1, 9)]


def test_early_stop_when_covered(spark):
    texts = ["a b c", "a b", "c a"]
    rows = vocab_cover_seeds(_docs(spark, texts), k=5).collect()
    # doc 0 covers everything; docs 1,2 add nothing → single row
    assert [(r["rank"], r["doc_id"], r["gain"]) for r in rows] == [(1, 0, 3)]


def test_tie_breaks_by_doc_id(spark):
    texts = ["m n", "x y"]
    rows = vocab_cover_seeds(_docs(spark, texts), k=2).collect()
    assert [r["doc_id"] for r in rows] == [0, 1]
