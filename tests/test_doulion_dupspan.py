"""DOULION sampled triangles + duplicated-span coverage — algorithmic
pins independent of the DuckDB oracle:

- DOULION with keep_mod=1 (p=1) degenerates to the exact triangle count
  scaled by 1 (the estimator is exact at p=1, KDD'09 Lemma 1);
- the sample is a deterministic md5-coin subset: n_sampled <= n_und and
  re-running yields the identical row (engine-replayable coin);
- dup_span_coverage bounds: 0 <= n_dup_tokens <= n_tokens, and a corpus
  of mutually-disjoint-vocabulary single-shot docs has zero coverage
  while a corpus of two identical docs has full coverage of every
  shingled position.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metis_spark.operators.corpus_stats import dup_span_coverage
from metis_spark.plans.triangles import doulion_triangle_estimate, triangle_count

from tests.conftest import edges_df

# two triangles sharing an edge + a pendant: 2 triangles exactly
_PAIRS = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4), (4, 5)]


def test_doulion_p1_is_exact(spark):
    e = edges_df(spark, _PAIRS)
    row = doulion_triangle_estimate(e, keep_mod=1).collect()[0]
    assert row["n_sampled"] == row["n_und_edges"] == 6
    assert row["sampled_triangles"] == row["triangle_estimate"] == 2
    assert triangle_count(e) == 2


def test_doulion_deterministic_subset(spark):
    e = edges_df(spark, _PAIRS)
    a = doulion_triangle_estimate(e, keep_mod=4).collect()[0]
    b = doulion_triangle_estimate(e, keep_mod=4).collect()[0]
    assert a == b
    assert 0 <= a["n_sampled"] <= a["n_und_edges"]
    assert a["triangle_estimate"] == a["sampled_triangles"] * 64


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dup_span_zero_on_disjoint_docs(spark):
    docs = _docs(
        spark,
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
    )
    out = {r["doc_id"]: r for r in dup_span_coverage(docs, k=3).collect()}
    assert all(r["n_dup_tokens"] == 0 and r["dup_frac"] == 0.0 for r in out.values())
    assert out[1]["n_tokens"] == 4


def test_dup_span_full_on_identical_docs(spark):
    docs = _docs(spark, [(1, "a b c d e"), (2, "a b c d e")])
    out = {r["doc_id"]: r for r in dup_span_coverage(docs, k=3).collect()}
    # every 3-gram occurs twice corpus-wide -> every position covered
    assert all(
        r["n_dup_tokens"] == r["n_tokens"] == 5 and r["dup_frac"] == 1.0
        for r in out.values()
    )


def test_dup_span_intra_doc_repetition_counts(spark):
    # one doc, one repeated 3-gram ("x y z" at pos 0 and pos 3):
    # positions 0..5 covered, trailing "w" (pos 6) not
    docs = _docs(spark, [(1, "x y z x y z w")])
    row = dup_span_coverage(docs, k=3).collect()[0]
    assert row["n_tokens"] == 7
    assert row["n_dup_tokens"] == 6
    assert abs(row["dup_frac"] - round(6 / 7, 6)) < 1e-9


def test_dup_span_bounds_on_corpus(spark):
    import os

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    out = dup_span_coverage(docs, k=3)
    bad = out.where(
        (F.col("n_dup_tokens") < 0) | (F.col("n_dup_tokens") > F.col("n_tokens"))
    ).count()
    assert bad == 0
