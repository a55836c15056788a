"""bpe_merges (operators/bpe.py) — Sennrich BPE pins:

- the full hand-traced merge sequence on a two-word corpus, including
  the in-run greedy (aaaa → aa+aa, never aaa+a), frequency weighting,
  and the lexicographic tie;
- merged symbols participate in later rounds (aa+aa → aaaa);
- a single-char vocabulary exhausts early and returns fewer rows.
"""

from __future__ import annotations

from metis_spark.operators.bpe import bpe_merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_hand_traced_sequence(spark):
    docs = _docs(spark, ["aaaa aaaa abab", "aaaa abab abab"])
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in bpe_merges(docs, k=4).collect()
    ]
    # aaaa×3: greedy in-run (a,a) fires at offsets 0 and 2 → 3 pairs/word… 9
    # round 2: (a,b) in abab×3 → 6; round 3 tie (aa,aa)=3 vs (ab,ab)=3 → aa first
    assert got == [
        (1, "a", "a", "aa", 9),
        (2, "a", "b", "ab", 6),
        (3, "aa", "aa", "aaaa", 3),
        (4, "ab", "ab", "abab", 3),
    ]


def test_odd_run_leftover(spark):
    # "aaaaa": 4 OVERLAPPING (a,a) candidates counted (textbook pair
    # statistics), greedy fires at pos 1 and 3 → [aa, aa, a]; round 2
    # ties (aa,aa) vs (aa,a) at count 1 → right-symbol 'a' sorts first
    # → [aa, aaa]; round 3 fuses the word
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in bpe_merges(_docs(spark, ["aaaaa"]), k=3).collect()
    ]
    assert got == [
        (1, "a", "a", "aa", 4),
        (2, "aa", "a", "aaa", 1),
        (3, "aa", "aaa", "aaaaa", 1),
    ]


def test_exhaustion_returns_fewer_rows(spark):
    got = bpe_merges(_docs(spark, ["x y z"]), k=5).collect()
    assert got == []  # every word is a single symbol — nothing to merge
