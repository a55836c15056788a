"""readability (operators/corpus_stats.py) — Flesch / FK pins:

- hand-computed closed forms on known sentences;
- the degenerate guards (no terminator, empty-ish text) clamp to 1;
- monotonicity: more syllables per word strictly lowers reading ease.
"""

from __future__ import annotations

from metis_spark.operators.corpus_stats import readability


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _rows(spark, texts):
    return {
        r["doc_id"]: r for r in readability(_docs(spark, texts)).collect()
    }


def test_closed_form(spark):
    # "The cat sat." → W=3, S=1, Y=3 (e, a, a)
    r = _rows(spark, ["The cat sat."])[0]
    assert (r["n_words"], r["n_sents"], r["n_syllables"]) == (3, 1, 3)
    assert r["flesch"] == round(206.835 - 1.015 * 3.0 - 84.6 * 1.0, 6)
    assert r["fk_grade"] == round(0.39 * 3.0 + 11.8 * 1.0 - 15.59, 6)


def test_degenerate_guards(spark):
    # no sentence terminator and no vowels: every denominator clamps to 1
    r = _rows(spark, ["zzz zzz"])[0]
    assert (r["n_words"], r["n_sents"], r["n_syllables"]) == (2, 1, 1)


def test_terminator_runs_collapse(spark):
    # "Wait... what?! No." → the run "..." is ONE boundary, "?!" is one
    r = _rows(spark, ["Wait... what?! No."])[0]
    assert r["n_sents"] == 3


def test_polysyllabic_reads_harder(spark):
    rows = _rows(
        spark,
        ["The dog ran to the park.", "Incomprehensible pharmaceutical bureaucracies."],
    )
    assert rows[0]["flesch"] > rows[1]["flesch"]
    assert rows[0]["fk_grade"] < rows[1]["fk_grade"]
