"""Bloom semi-join pruning contracts: no false negatives ever, bounded
words table, fp rate within a sane multiple of the (1-e^{-kn/m})^k
theory — the gates that make bloom_probe safe to put in front of a
100 TB shuffle (a false negative would silently drop join matches)."""

import math
import random

from pyspark.sql import functions as F

from metis_spark.operators.sketches import bloom_probe, bloom_words


def _keys_df(spark, n, seed=11):
    rng = random.Random(seed)
    vals = rng.sample(range(1, 1_000_000), n)
    return spark.createDataFrame([(v,) for v in vals], "key long"), set(vals)


def test_bloom_no_false_negatives_and_bounded_words(spark):
    m, k = 2048, 3
    build, bset = _keys_df(spark, 300)
    words = bloom_words(build, "key", m=m, k=k)
    nw = words.count()
    assert nw <= m // 32  # packed: never more rows than words
    probe = spark.createDataFrame(
        [(v,) for v in range(1, 5001)], "key long"
    )
    got = bloom_probe(probe, "key", words, m=m, k=k)
    # every true member MUST pass — the non-negotiable bloom contract
    missed = got.where(
        F.col("key").isin([v for v in bset if v <= 5000]) & ~F.col("bloom_pass")
    ).count()
    assert missed == 0


def test_bloom_fp_rate_near_theory(spark):
    m, k, n = 4096, 3, 300
    build, bset = _keys_df(spark, n, seed=23)
    words = bloom_words(build, "key", m=m, k=k)
    probe = spark.createDataFrame(
        [(v,) for v in range(2_000_000, 2_020_000)], "key long"
    )  # disjoint from build by construction
    fp = bloom_probe(probe, "key", words, m=m, k=k).where("bloom_pass").count()
    rate = fp / 20_000
    theory = (1.0 - math.exp(-k * n / m)) ** k
    assert rate <= 5 * theory + 1e-4  # generous: hash variance, small m
    # and it actually prunes: the audit is pointless if nothing is dropped
    assert rate < 0.10
