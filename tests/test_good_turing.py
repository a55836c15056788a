"""good_turing_richness (operators/corpus_stats.py) — hand-counted pins.

Corpus "a a b c" (one lang): N=4, V=3, n1=2 (b,c), n2=1 (a):
p_unseen = 0.5, chao1 = 3 + 2*1/(2*2) = 3.5.
"""

from __future__ import annotations

from metis_spark.operators.corpus_stats import good_turing_richness


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_hand_counted(spark):
    out = good_turing_richness(
        _docs(spark, [(1, "a a b", "en"), (2, "c", "en")])
    ).collect()
    r = {x["lang"]: x for x in out}["en"]
    assert (r["n_tokens"], r["n_types"], r["n1"], r["n2"]) == (4, 3, 2, 1)
    assert r["p_unseen"] == 0.5
    assert r["chao1"] == 3.5


def test_no_singletons(spark):
    out = good_turing_richness(_docs(spark, [(1, "x x y y", "de")])).collect()[0]
    assert out["n1"] == 0 and out["p_unseen"] == 0.0
    assert out["chao1"] == 2.0  # estimator collapses to observed V


def test_all_singletons_n2_zero(spark):
    out = good_turing_richness(_docs(spark, [(1, "p q r", "fr")])).collect()[0]
    # bias-corrected Chao1 stays finite with n2 = 0
    assert out["chao1"] == 3 + 3 * 2 / 2.0
