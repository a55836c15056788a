"""Sketch-operator gates: heavy-hitter exactness/completeness under
adversarial partitioning, HLL relative-error contract."""

import random

from pyspark.sql import functions as F

from metis_spark.operators.sketches import approx_distinct, exact_heavy_hitters


def _skewed_df(spark, parts):
    """100k rows: a few heavy values + a long tail, spread over ``parts``
    partitions so per-partition candidate pruning actually prunes."""
    rng = random.Random(7)
    rows = []
    for heavy, n in [(1, 5000), (2, 3000), (3, 800)]:
        rows += [(heavy,)] * n
    rows += [(rng.randrange(10_000, 90_000),) for _ in range(91_200)]
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "user_id long").repartition(parts)


def test_heavy_hitters_exact_vs_groupby(spark):
    df = _skewed_df(spark, parts=16).persist()
    try:
        got = {
            r["user_id"]: r["cnt"]
            for r in exact_heavy_hitters(df, "user_id", 500).collect()
        }
        want = {
            r["user_id"]: r["cnt"]
            for r in df.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") >= 500)
            .collect()
        }
        assert got == want and set(got) == {1, 2, 3}
    finally:
        df.unpersist()


def test_heavy_hitters_partition_invariant(spark):
    """Completeness guarantee holds at any partitioning — the candidate
    bar ceil(T/P) adapts to P."""
    a = _skewed_df(spark, parts=2)
    b = _skewed_df(spark, parts=32)
    ra = {r["user_id"]: r["cnt"] for r in exact_heavy_hitters(a, "user_id", 700).collect()}
    rb = {r["user_id"]: r["cnt"] for r in exact_heavy_hitters(b, "user_id", 700).collect()}
    assert ra == rb and len(ra) >= 2


def test_approx_distinct_error_bound(spark):
    df = spark.range(0, 50_000).select(
        (F.col("id") % 5).alias("g"), (F.col("id") % 9173).alias("v")
    )
    rows = approx_distinct(df, ["g"], "v", rsd=0.02).collect()
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert len(rows) == 5
    for r in rows:
        rel = abs(r["approx_distinct"] - exact[r["g"]]) / exact[r["g"]]
        assert rel < 0.05, (r["g"], r["approx_distinct"], exact[r["g"]])


def test_misra_gries_error_contract(spark):
    """The ε = 1/(k+1) deficiency contract: ≤ k rows, no overcount,
    undercount ≤ N/(k+1), and every value with true count > N/(k+1)
    present — across partitionings (merge order must not matter for the
    guarantee)."""
    from metis_spark.operators.sketches import misra_gries_summary

    for parts, k in [(4, 8), (16, 8), (16, 32)]:
        df = _skewed_df(spark, parts=parts).persist()
        try:
            n = df.count()
            true = {
                r["user_id"]: r["cnt"]
                for r in df.groupBy("user_id")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .collect()
            }
            got = {
                r["user_id"]: r["est"]
                for r in misra_gries_summary(df, "user_id", k).collect()
            }
            eps_n = n / (k + 1)
            assert len(got) <= k
            for v, est in got.items():
                assert 0 < est <= true[v]
                assert true[v] - est <= eps_n
            for v, t in true.items():
                if t > eps_n:
                    assert v in got, (v, t, eps_n, k, parts)
        finally:
            df.unpersist()


def test_sketch_heavy_hitters_matches_groupby(spark):
    """Sketch-candidates + exact recount == GROUP BY ... HAVING, at any
    partitioning (the property that makes the sketch path
    oracle-checkable)."""
    from metis_spark.operators.sketches import sketch_heavy_hitters

    for parts in (2, 16):
        df = _skewed_df(spark, parts=parts).persist()
        try:
            got = {
                r["user_id"]: r["cnt"]
                for r in sketch_heavy_hitters(df, "user_id", 500).collect()
            }
            want = {
                r["user_id"]: r["cnt"]
                for r in df.groupBy("user_id")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .where(F.col("cnt") >= 500)
                .collect()
            }
            assert got == want and set(got) == {1, 2, 3}
        finally:
            df.unpersist()
