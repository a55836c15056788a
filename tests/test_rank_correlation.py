"""centrality_rank_correlation (plans/metrics.py) — Spearman pins:

- identical rankings score exactly 1.0 with Σd² = 0;
- a full reversal scores exactly −1.0 (closed form 6Σd² = 2n(n²−1));
- a hand-computed permutation matches the textbook value;
- k caps the head (only top-k of ranking A enter).
"""

from __future__ import annotations

from metis_spark.plans.metrics import centrality_rank_correlation


def _scores(spark, col, vals):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in vals.items()], f"id long, {col} double"
    )


def test_identity_and_reversal(spark):
    a = _scores(spark, "sa", {1: 5.0, 2: 4.0, 3: 3.0, 4: 2.0, 5: 1.0})
    same = _scores(spark, "sb", {1: 50.0, 2: 40.0, 3: 30.0, 4: 20.0, 5: 10.0})
    rev = _scores(spark, "sb", {1: 1.0, 2: 2.0, 3: 3.0, 4: 4.0, 5: 5.0})
    r1 = centrality_rank_correlation(a, same, "sa", "sb", k=10).collect()[0]
    assert (r1["n"], r1["sum_d2"], r1["spearman"]) == (5, 0, 1.0)
    r2 = centrality_rank_correlation(a, rev, "sa", "sb", k=10).collect()[0]
    assert r2["spearman"] == -1.0


def test_textbook_permutation(spark):
    # ranks a: 1,2,3,4; ranks b: 2,1,4,3 → Σd² = 4 → ρ = 1 − 24/60 = 0.6
    a = _scores(spark, "sa", {1: 4.0, 2: 3.0, 3: 2.0, 4: 1.0})
    b = _scores(spark, "sb", {1: 3.0, 2: 4.0, 3: 1.0, 4: 2.0})
    r = centrality_rank_correlation(a, b, "sa", "sb", k=10).collect()[0]
    assert (r["sum_d2"], r["spearman"]) == (4, 0.6)


def test_head_cap(spark):
    vals_a = {i: 100.0 - i for i in range(1, 21)}
    a = _scores(spark, "sa", vals_a)
    b = _scores(spark, "sb", vals_a)
    r = centrality_rank_correlation(a, b, "sa", "sb", k=8).collect()[0]
    assert (r["n"], r["spearman"]) == (8, 1.0)
