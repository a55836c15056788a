"""winnowing_matches (operators/dedup.py) — MOSS pins:

- the detection guarantee: two docs sharing a substring of length
  ≥ w+k−1 ALWAYS share a fingerprint (score > 0), even embedded in
  unrelated text;
- unrelated docs share nothing;
- identical docs score 1.0 with fp_a == fp_b;
- the df cap drops a fingerprint present in every doc.
"""

from __future__ import annotations

from metis_spark.operators.dedup import winnowing_matches


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _pairs(spark, texts, **kw):
    return {
        (r["doc_a"], r["doc_b"]): r
        for r in winnowing_matches(_docs(spark, texts), **kw).collect()
    }


def test_shared_substring_guarantee(spark):
    # k=5, w=4 → any shared substring of length ≥ 8 must be caught
    quote = "the quick brown fox jumps"
    a = "xxxxxx " + quote + " yyyyyyyy"
    b = "zzzz qqqq " + quote + " wwww"
    c = "completely different content here"
    got = _pairs(spark, [a, b, c])
    assert (0, 1) in got and got[(0, 1)]["shared"] >= 1
    assert (0, 2) not in got and (1, 2) not in got


def test_identical_docs_score_one(spark):
    t = "some long enough identical document body"
    got = _pairs(spark, [t, t])
    r = got[(0, 1)]
    assert r["score"] == 1.0 and r["fp_a"] == r["fp_b"] == r["shared"]


def test_df_cap_drops_boilerplate(spark):
    boiler = "subscribe to our newsletter today"
    texts = [boiler + f" unique tail number {i}" for i in range(6)]
    capped = _pairs(spark, texts, df_cap=3)
    # every shared fingerprint comes from the boilerplate prefix, which
    # appears in all 6 docs > cap → dropped → no pairs at all
    assert capped == {}
    uncapped = _pairs(spark, texts, df_cap=100)
    assert len(uncapped) > 0
