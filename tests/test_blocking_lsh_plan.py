"""blocking_quality + lsh_parameter_plan (operators/dedup.py) — pins.

Corpus of three near-identical docs (true dups) and two unrelated:
truth = the 3 dup pairs; LSH with 4 bands of 2 rows must catch
identical docs (every band key equal), so pair completeness = 1 for
the exact-duplicate pairs and reduction ratio reflects the pruned
quadratic space. The planner's S-curve pins: more bands of shorter
rows catch more (expected_recall monotone in b at fixed r·b), and
s50(1 band of 8 rows) ≈ 0.917 closed-form.
"""

from __future__ import annotations

from metis_spark.operators.dedup import blocking_quality, lsh_parameter_plan

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),
    (3, "the quick brown fox jumps over the lazy dog again and again"),
    (4, "completely different content about spark shuffles and joins"),
    (5, "yet another unrelated document concerning parquet readers"),
]


def test_blocking_quality_on_exact_dups(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    r = blocking_quality(df, "doc_id", "text").collect()[0]
    assert r["n_docs"] == 5 and r["total_pairs"] == 10
    assert r["n_truth"] == 3  # the three dup pairs among docs 1,2,3
    # identical docs share every band key: all 3 pairs are candidates
    assert r["n_caught"] == 3 and r["pair_completeness"] == 1.0
    assert r["n_candidates"] >= 3
    assert 0.0 <= r["reduction_ratio"] <= 1.0
    assert r["candidate_precision"] <= 1.0


def test_lsh_plan_scurve_shape(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {r["rows_per_band"]: r for r in lsh_parameter_plan(df, "doc_id", "text").collect()}
    assert set(rows) == {1, 2, 4, 8}
    # truth pairs here have j = 1.0: every banding catches them fully
    assert all(r["expected_recall"] == 1.0 for r in rows.values())
    assert all(r["n_truth_pairs"] == 3 for r in rows.values())
    # s50 closed form: (1 - 2^(-1/b))^(1/r)
    assert rows[8]["s50"] == round((1 - 0.5 ** (1 / 1)) ** (1 / 8), 6)
    assert rows[1]["s50"] == round((1 - 0.5 ** (1 / 8)) ** (1 / 1), 6)
    # shorter rows -> lower catch threshold (easier to catch)
    s50s = [rows[r]["s50"] for r in (1, 2, 4, 8)]
    assert s50s == sorted(s50s)
    assert rows[2]["is_shipped"] and not rows[4]["is_shipped"]
