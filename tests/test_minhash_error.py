"""minhash_estimate_error (operators/dedup.py) — calibration pins:

- identical docs: candidates collide on every band, matching 8/8,
  exact jaccard 1, abs_err 0;
- the estimator and exact value are consistent with the emitted
  integer triple on every surfaced pair.
"""

from __future__ import annotations

from metis_spark.operators.dedup import minhash_estimate_error


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_identical_docs(spark):
    t = "alpha beta gamma delta epsilon zeta"
    out = minhash_estimate_error(
        _docs(spark, [(1, t), (2, t)]), "doc_id", "text"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["matching_seeds"] == 8 and r["est"] == 1.0
    assert r["jaccard"] == 1.0 and r["abs_err"] == 0.0


def test_triple_consistency(spark):
    t = "w1 w2 w3 w4 w5 w6 w7 w8"
    u = "w1 w2 w3 w4 w5 w6 w7 zz"
    out = minhash_estimate_error(
        _docs(spark, [(1, t), (2, u), (3, t)]), "doc_id", "text"
    ).collect()
    for r in out:
        assert 0 <= r["matching_seeds"] <= 8
        assert r["n_inter"] <= r["n_union"]
        assert r["jaccard"] == round(r["n_inter"] / r["n_union"], 6)
        assert r["est"] == round(r["matching_seeds"] / 8, 6)
