"""burrows_delta (operators/corpus_stats.py) — hand pins: symmetry of
the completed grid, style-twin sources score below a style-outlier
pair, and the σ=0 constant-feature convention."""

from __future__ import annotations

from metis_spark.operators.corpus_stats import burrows_delta


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_style_twins_beat_outlier(spark):
    # A and B share the article-heavy profile; C is verb-heavy.
    twin = "the of the and the of to the and of"
    outl = "run jump swim run jump fly run leap dive soar"
    d = _docs(
        spark,
        [
            (1, twin, "en", "A", 0),
            (2, twin + " the of", "en", "B", 0),
            (3, outl, "en", "C", 0),
        ],
    )
    got = {
        (r["source_a"], r["source_b"]): r["delta_micro"]
        for r in burrows_delta(d, n_features=8).collect()
    }
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert got[("A", "B")] < got[("A", "C")]
    assert got[("A", "B")] < got[("B", "C")]


def test_identical_profiles_zero_delta(spark):
    same = "alpha beta alpha gamma beta alpha"
    d = _docs(spark, [(1, same, "en", "A", 0), (2, same, "en", "B", 0)])
    rows = burrows_delta(d, n_features=5).collect()
    assert len(rows) == 1
    # identical relative frequencies on every feature; with S=2 every
    # non-constant feature has dev_a = -dev_b = 0 ⇒ Delta exactly 0
    assert rows[0]["delta_micro"] == 0


def test_constant_feature_contributes_zero(spark):
    # 'x' has identical rf in both sources (σ=0) and is the only
    # feature: Delta must be 0, not NULL/crash
    d = _docs(spark, [(1, "x x x", "en", "A", 0), (2, "x x x", "en", "B", 0)])
    rows = burrows_delta(d, n_features=1).collect()
    assert rows[0]["delta_micro"] == 0
