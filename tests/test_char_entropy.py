"""char_bigram_entropy (operators/corpus_stats.py) — analytic pins:

- a single repeated bigram ("aaaa" -> 3x "aa") has entropy exactly 0;
- a string whose bigrams are all distinct has entropy ln(n) (uniform
  distribution maximum);
- entropy is non-negative and bounded by ln(n_bigrams) on the corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from metis_spark.operators.corpus_stats import char_bigram_entropy


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_zero_entropy_on_constant_string(spark):
    row = char_bigram_entropy(_docs(spark, [(1, "aaaa")])).collect()[0]
    assert row["n_bigrams"] == 3
    assert row["entropy_micro"] == 0
    assert row["entropy"] == 0.0


def test_uniform_bigrams_hit_ln_n(spark):
    # "abcd" -> bigrams ab, bc, cd, all distinct: H = ln(3)
    row = char_bigram_entropy(_docs(spark, [(1, "abcd")])).collect()[0]
    assert row["n_bigrams"] == 3
    assert abs(row["entropy"] - round(math.log(3), 6)) < 2e-6


def test_entropy_bounds_on_corpus(spark):
    import os

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    out = char_bigram_entropy(docs)
    bad = out.where(
        (F.col("entropy") < 0) | (F.col("entropy") > F.log(F.col("n_bigrams") + F.lit(0.001)))
    ).count()
    assert bad == 0
