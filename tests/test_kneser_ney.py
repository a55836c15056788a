"""kneser_ney_topk (operators/corpus_stats.py) — hand-computed pins.

Corpus: "a b a b c" + "b c" → bigram counts (a,b):2 (b,c):2 (b,a):1,
B = 3 types; contexts a: c1=2 n_fwd=1, b: c1=3 n_fwd=2; continuation
counts n_bwd(a)=n_bwd(b)=n_bwd(c)=1. With D = 3/4:

    P_KN(b|a) = (1.25 + 0.75·1·(1/3)) / 2 = 0.75
    P_KN(a|b) = (0.25 + 0.75·2·(1/3)) / 3 = 0.25
    P_KN(c|b) = (1.25 + 0.75·2·(1/3)) / 3 = 21/36

Mass conservation for context b over the full vocab {a,b,c}: observed
0.25 + 21/36 plus the backoff-only (b,b) term 0.75·2·(1/3)/3 = 1/6
sums to exactly 1 — the property interpolated KN exists to guarantee.
"""

from __future__ import annotations

from metis_spark.operators.corpus_stats import kneser_ney_topk


def _rows(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "b c")], "doc_id long, text string"
    )
    return {
        (r["w1"], r["w2"]): r for r in kneser_ney_topk(docs, topk=10).collect()
    }


def test_hand_computed_probabilities(spark):
    m = _rows(spark)
    assert len(m) == 3
    ab = m[("a", "b")]
    assert ab["c12"] == 2 and ab["c1"] == 2 and ab["n_fwd"] == 1 and ab["n_bwd"] == 1
    assert ab["p_kn"] == 0.75 and ab["p_mle"] == 1.0
    assert m[("b", "a")]["p_kn"] == 0.25
    assert m[("b", "c")]["p_kn"] == round(21 / 36, 6)


def test_ranking_and_mass(spark):
    m = _rows(spark)
    assert m[("a", "b")]["rn"] == 1  # c12 ties broken by (w1, w2) asc
    assert m[("b", "c")]["rn"] == 2
    assert m[("b", "a")]["rn"] == 3
    # context b: observed p_kn mass + the unseen (b,b) backoff term
    unseen_bb = 0.75 * 2 * (1 / 3) / 3
    total = m[("b", "a")]["p_kn"] + m[("b", "c")]["p_kn"] + unseen_bb
    assert abs(total - 1.0) < 2e-6  # p_kn rounded to 6dp per row


def test_every_observed_bigram_keeps_positive_mass(spark):
    # discounting never zeroes an observed bigram: the continuation
    # term is > 0 whenever n_fwd, n_bwd ≥ 1, which holds by definition
    m = _rows(spark)
    assert all(r["p_kn"] > 0 for r in m.values())
    # and on this corpus every discount is a strict net loss vs MLE
    # (n_fwd·n_bwd < B for every row), so p_kn < p_mle throughout
    assert all(r["p_kn"] < r["p_mle"] for r in m.values())
