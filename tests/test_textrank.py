"""textrank_top_sentences (operators/corpus_stats.py) — hand pins.

doc 2 = "a b. a b. c": sentences 0 and 1 share {a, b} (w = 2 ≥
min_shared), sentence 2 is isolated. With scale 1000, d = 17/20:
the connected pair holds rank 1000 (mass-preserving fixpoint), the
isolate decays to 150 = (3·1000)//20 — so the top pick is sidx 0 at
score 1000. doc 1's only shared token is below min_shared, so every
sentence is isolated and the argmax falls to the min index at 150.
Empty docs produce no sentences and drop out.
"""

from __future__ import annotations

from metis_spark.operators.corpus_stats import textrank_top_sentences


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r
        for r in textrank_top_sentences(df, **kw).collect()
    }


def test_hand_computed_two_docs(spark):
    m = _run(
        spark,
        [
            (1, "spark runs fast. spark scales well. cats sleep."),
            (2, "a b. a b. c"),
            (3, ""),
        ],
        min_shared=2, n_iters=2, scale=1000,
    )
    assert set(m) == {1, 2}  # the empty doc drops out
    assert m[2]["best_sidx"] == 0 and m[2]["score_scaled"] == 1000
    assert m[2]["n_sentences"] == 3
    # doc 1: all isolated (shared = 1 < 2) -> uniform 150, min-idx tie
    assert m[1]["best_sidx"] == 0 and m[1]["score_scaled"] == 150
    assert m[1]["n_sentences"] == 3


def test_connected_sentence_beats_isolate(spark):
    # with min_shared=1 doc 1's pair {spark} connects s0-s1: they keep
    # rank 1000 while the cats sentence decays -> hub sentences win
    m = _run(
        spark,
        [(1, "spark runs fast. spark scales well. cats sleep.")],
        min_shared=1, n_iters=3, scale=1000,
    )
    assert m[1]["best_sidx"] == 0 and m[1]["score_scaled"] == 1000


def test_sentence_indices_count_raw_fragments(spark):
    # leading terminator creates an empty fragment 0; the real sentence
    # is fragment 1 in BOTH engines' numbering
    m = _run(spark, [(1, "! only sentence here")], n_iters=1)
    assert m[1]["best_sidx"] == 1 and m[1]["n_sentences"] == 1
