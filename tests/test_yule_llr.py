"""Hand pins for Yule's K and Dunning G² collocations."""

from __future__ import annotations

import math

from metis_spark.operators.corpus_stats import llr_collocations, yule_k


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_yule_k_hand(spark):
    d = _docs(
        spark,
        [
            (1, "a a a b", "en", "s", 7),
            (2, "p q r s", "de", "s", 7),  # all-distinct: S2 = N ⇒ K = 0
        ],
    )
    got = {r["lang"]: r for r in yule_k(d).collect()}
    en = got["en"]
    # spectrum m = {a:3, b:1}: N=4, V=2, Σm² = 10 ⇒ K = 1e4·(10−4)/16
    assert (en["n_tokens"], en["n_types"]) == (4, 2)
    assert en["yule_k"] == 3750.0
    de = got["de"]
    assert (de["n_tokens"], de["n_types"]) == (4, 4)
    assert de["yule_k"] == 0.0


def test_yule_k_repeat_rate_orders_correctly(spark):
    # heavier repetition ⇒ strictly larger K at equal token counts
    d = _docs(
        spark,
        [
            (1, "x x x x x x x x", "rep", "s", 0),
            (2, "a a b b c c d d", "mix", "s", 0),
        ],
    )
    got = {r["lang"]: r["yule_k"] for r in yule_k(d).collect()}
    assert got["rep"] > got["mix"] > 0.0


def test_llr_hand_contingency(spark):
    # "x y" ×5, "y x" ×4 from one alternating doc: only "x y" clears
    # min_count=5; its G² has O12 = O21 = 0 (those cells contribute 0)
    d = _docs(spark, [(1, "x y x y x y x y x y", "en", "s", 0)])
    rows = llr_collocations(d, min_count=5, k=10).collect()
    assert [r["bigram"] for r in rows] == ["x y"]
    r = rows[0]
    assert r["c12"] == 5 and r["rank"] == 1
    # O11=5 R1=5 C1=5, O22=4 R2=4 C2=4, N=9 — replay the exact
    # double chain the engines share
    g2 = 2.0 * (
        5.0 * math.log((5.0 * 9.0) / (5.0 * 5.0))
        + 4.0 * math.log((4.0 * 9.0) / (4.0 * 4.0))
    )
    assert r["llr_micro"] == round(g2 * 1e6)


def test_llr_count_weighting_beats_pmi_rarity(spark):
    # two perfect collocations, one ×5 and one ×6, separated by an
    # unrelated filler bigram pool: same PMI shape, but G² must rank
    # the higher-count pair first
    text_small = " ".join(["aa bb"] * 5)
    text_big = " ".join(["cc dd"] * 6)
    filler = " ".join(f"f{i} g{i}" for i in range(30))
    d = _docs(
        spark,
        [(1, text_small, "en", "s", 0), (2, text_big, "en", "s", 0), (3, filler, "en", "s", 0)],
    )
    rows = llr_collocations(d, min_count=5, k=4).collect()
    assert rows[0]["bigram"] == "cc dd" and rows[0]["c12"] == 6
    assert rows[1]["bigram"] == "aa bb" and rows[1]["c12"] == 5
    assert rows[0]["llr_micro"] > rows[1]["llr_micro"] > 0
