"""distinct_ngram_diversity (operators/corpus_stats.py) — pins:

- hand-counted unigram/bigram totals and distincts per lang slice;
- a repeated-template slice scores strictly lower distinct-2 than a
  diverse slice of the same token volume;
- single-token docs contribute unigrams but no bigrams (no NULL leak).
"""

from __future__ import annotations

from metis_spark.operators.corpus_stats import distinct_ngram_diversity


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_hand_counts(spark):
    df = _df(
        spark,
        [
            (1, "en", "a b a b"),
            (2, "en", "a c"),
        ],
    )
    r = {x["lang"]: x for x in distinct_ngram_diversity(df).collect()}["en"]
    # unigrams: a b a b a c → 6 total, {a,b,c} = 3 distinct
    assert (r["n_unigrams"], r["distinct_unigrams"]) == (6, 3)
    assert r["distinct_1"] == 0.5
    # bigrams: "a b","b a","a b" + "a c" → 4 total, {a b, b a, a c} = 3
    assert (r["n_bigrams"], r["distinct_bigrams"]) == (4, 3)
    assert r["distinct_2"] == 0.75


def test_template_collapse(spark):
    template = [(i, "tpl", "click here to subscribe now") for i in range(20)]
    diverse = [
        (100 + i, "div", f"word{i} term{i} token{i} item{i} unit{i}")
        for i in range(20)
    ]
    out = {
        x["lang"]: x
        for x in distinct_ngram_diversity(_df(spark, template + diverse)).collect()
    }
    assert out["tpl"]["n_unigrams"] == out["div"]["n_unigrams"] == 100
    assert out["tpl"]["distinct_2"] < out["div"]["distinct_2"]
    assert out["div"]["distinct_2"] == 1.0


def test_single_token_docs(spark):
    df = _df(spark, [(1, "xx", "solo"), (2, "xx", "solo")])
    r = distinct_ngram_diversity(df).collect()[0]
    assert (r["n_unigrams"], r["distinct_unigrams"]) == (2, 1)
    assert (r["n_bigrams"], r["distinct_bigrams"], r["distinct_2"]) == (0, 0, 0.0)
