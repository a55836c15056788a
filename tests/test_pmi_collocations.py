"""pmi_collocations (operators/corpus_stats.py) — Church & Hanks pins:

- a fused pair that always co-occurs beats a promiscuous pair in PMI
  even at equal frequency;
- the micro-nat value matches the hand formula ln(c12·N/(c1·c2));
- min_count suppresses singleton noise;
- ranking ties break lexicographically.
"""

from __future__ import annotations

import math

from metis_spark.operators.corpus_stats import pmi_collocations


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_fused_beats_promiscuous_and_formula(spark):
    # "alpha beta" always together (5×); "the end"/"the way" split "the"
    texts = ["alpha beta"] * 5 + ["the end"] * 5 + ["the way"] * 5
    rows = pmi_collocations(_docs(spark, texts), min_count=5, k=10).collect()
    by = {r["bigram"]: r for r in rows}
    n = 15
    fused = by["alpha beta"]
    assert fused["c12"] == 5
    assert fused["pmi_micro"] == round(math.log(5 * n / (5 * 5)) * 1e6)
    the_end = by["the end"]
    assert the_end["pmi_micro"] == round(math.log(5 * n / (10 * 5)) * 1e6)
    assert fused["pmi_micro"] > the_end["pmi_micro"]
    assert rows[0]["bigram"] == "alpha beta" and rows[0]["rank"] == 1


def test_min_count_floor(spark):
    texts = ["rare pair"] + ["common duo"] * 5
    rows = pmi_collocations(_docs(spark, texts), min_count=5, k=10).collect()
    assert [r["bigram"] for r in rows] == ["common duo"]


def test_tie_breaks_lexicographic(spark):
    texts = ["aa bb"] * 5 + ["cc dd"] * 5
    rows = pmi_collocations(_docs(spark, texts), min_count=5, k=10).collect()
    assert [r["bigram"] for r in rows] == ["aa bb", "cc dd"]
    assert rows[0]["pmi_micro"] == rows[1]["pmi_micro"]
