"""ngram_containment_pairs (operators/dedup.py) — subset-dup pins:

- a short doc embedded verbatim in a long one: cont_short = 1.0 even
  though Jaccard is low;
- disjoint docs emit nothing;
- the threshold is the integer cross-multiplied 0.8.
"""

from __future__ import annotations

from metis_spark.operators.dedup import ngram_containment_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, rows, **kw):
    out = ngram_containment_pairs(_docs(spark, rows), "doc_id", "text", **kw)
    return {(r["doc_a"], r["doc_b"]): r.asDict() for r in out.collect()}


def test_subset_detected_despite_low_jaccard(spark):
    short = "alpha beta gamma delta"
    long = short + " " + " ".join(f"tok{i}" for i in range(40))
    out = _run(spark, [(1, short), (2, long)])
    r = out[(1, 2)]
    assert r["cont_a"] == 1.0  # every shingle of the short doc is shared
    assert r["n_b"] > 4 * r["n_a"]  # jaccard would be far below 0.8


def test_disjoint_no_rows(spark):
    out = _run(spark, [(1, "aa bb cc dd ee"), (2, "ff gg hh ii jj")])
    assert out == {}


def test_threshold_integer_exact(spark):
    # doc 1 has 5 shingles, 4 shared -> max containment exactly 0.8: kept
    base = "t1 t2 t3 t4 t5 t6"          # shingles: 4
    ext = base + " zz"                   # shingles: 5, shares 4
    out = _run(spark, [(1, ext), (2, base)])
    assert out[(1, 2)]["cont_b"] == 1.0 and out[(1, 2)]["cont_a"] == 0.8
