"""Sketch-flavored operators for 100 TB profiling: communication-efficient
exact heavy hitters and approximate-distinct wrappers.

exact_heavy_hitters is the pattern that matters at scale: a naive
``groupBy(col).count()`` over a 100 TB column shuffles EVERY distinct
value; when you only want items above a frequency floor, the two-pass
candidate-pruned plan shuffles almost nothing:

  pass 1 (narrow, no shuffle): per-partition counting inside an
    Arrow-batched mapInPandas kernel emits only values whose LOCAL count
    reaches ceil(min_count / P) — by pigeonhole, any value with global
    count ≥ min_count must clear that bar in at least one of the P
    partitions, so the candidate set provably contains every true heavy
    hitter (no false negatives; false positives are filtered next);
  pass 2: broadcast the (small) candidate set, semi-join, exact
    groupBy count of candidates only, filter ≥ min_count.

The output is EXACT and deterministic — unlike count-min/space-saving
output it is independent of partitioning — which is what makes it
driver-oracle-checkable against a plain GROUP BY ... HAVING.

approx_distinct wraps Spark's HyperLogLog++ (approx_count_distinct) —
the O(1)-memory distinct profile; its relative-error contract is pinned
by pytest (sketches cannot hash-match a SQL oracle, so the quality gate
lives in the test suite, the same policy as the ANN recall gates).
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_heavy_hitters(df: DataFrame, col: str, min_count: int) -> DataFrame:
    """→ (col, cnt) for every value with global count ≥ min_count.

    NULL semantics: NULL values are excluded up front (``WHERE col IS NOT
    NULL``). A plain ``GROUP BY col HAVING count(*) >= t`` would keep a
    NULL group; this operator intentionally does not — pandas value_counts
    drops NaN in pass 1 and the semi equi-join drops null keys in pass 2,
    so the explicit filter makes the contract uniform instead of silently
    diverging when a column has ≥ min_count NULLs.
    """
    if min_count < 1:
        raise ValueError("min_count must be ≥ 1")
    df = df.where(F.col(col).isNotNull())
    num_parts = df.rdd.getNumPartitions()
    local_t = max(1, math.ceil(min_count / max(1, num_parts)))
    dtype = dict(df.dtypes)[col]

    pd_dtype = {"bigint": "int64", "int": "int32", "double": "float64"}.get(
        dtype, "object"
    )

    def _candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: Counter = Counter()
        for pdf in batches:
            counts.update(pdf[col].value_counts().to_dict())
        vals = [k for k, v in counts.items() if v >= local_t]
        yield pd.DataFrame({col: pd.Series(vals, dtype=pd_dtype)})

    cand = (
        df.select(col)
        .mapInPandas(_candidates, schema=f"{col} {dtype}")
        .distinct()
    )
    return (
        df.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )


def _mg_reduce(summ: Counter, k: int) -> Counter:
    """Misra-Gries reduction to ≤ k counters: subtract the (k+1)-th
    largest count from every counter and drop the non-positive ones.
    This is the mergeable-summaries form (Agarwal et al., PODS 2012):
    each reduction subtracts δ from ≤ len(summ) counters while
    discarding ≥ (k+1)·δ total mass, so across any merge tree the total
    undercount of any single value is ≤ N/(k+1)."""
    if len(summ) <= k:
        return summ
    d = sorted(summ.values(), reverse=True)[k]
    return Counter({v: c - d for v, c in summ.items() if c > d})


def misra_gries_summary(df: DataFrame, col: str, k: int) -> DataFrame:
    """→ (col, est): a ≤ k-row Misra-Gries frequency summary of ``col``
    with the classic deficiency contract

        true_count − N/(k+1)  ≤  est  ≤  true_count

    (ε = 1/(k+1); every value with true count > εN is guaranteed a row —
    contract pinned in tests/test_sketches.py, the same policy as the
    HLL++ wrapper above, because an underestimate cannot hash-match a
    SQL oracle).

    100 TB shape: pass 1 is a narrow, shuffle-free mapInPandas — each
    partition folds its Arrow batches into a local ≤ k-counter summary
    (memory O(k + batch), never O(distinct)); pass 2 merges the ≤ P·k
    partial rows with one map-side-combined groupBy-sum, then one final
    reduction (TakeOrdered k+1 → 1-row offset broadcast back). Nothing
    ever shuffles the full key space — that is the whole point versus
    ``groupBy(col).count()`` at 100 TB."""
    if k < 1:
        raise ValueError("k must be ≥ 1")
    df = df.where(F.col(col).isNotNull())
    dtype = dict(df.dtypes)[col]

    def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summ: Counter = Counter()
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                summ[v] += int(c)
            summ = _mg_reduce(summ, k)
        yield pd.DataFrame({col: list(summ.keys()), "est": list(summ.values())})

    cand = (
        df.select(col)
        .mapInPandas(_partials, schema=f"{col} {dtype}, est long")
        .groupBy(col)
        .agg(F.sum("est").alias("est"))
    )
    # final reduction: subtract the (k+1)-th largest merged estimate
    # (0 if fewer than k+1 candidates survive) — 1-row broadcast, no
    # driver collect
    kth = (
        cand.orderBy(F.desc("est"), F.asc(col))
        .limit(k + 1)
        .agg(
            F.min("est").alias("kth"),
            F.count(F.lit(1)).alias("nk"),
        )
    )
    return (
        cand.crossJoin(F.broadcast(kth))
        .select(
            col,
            (
                F.col("est")
                - F.when(F.col("nk") == k + 1, F.col("kth")).otherwise(F.lit(0))
            ).alias("est"),
        )
        .where(F.col("est") > 0)
    )


def sketch_heavy_hitters(df: DataFrame, col: str, min_count: int) -> DataFrame:
    """→ (col, cnt): EXACT global heavy hitters through the Misra-Gries
    candidate path — sketch for completeness, recount for exactness.

    k is sized so the sketch's worst-case undercount N/(k+1) is strictly
    below ``min_count``: every true heavy hitter then survives the
    merged summary with est > 0 (no false negatives), and the exact
    broadcast-semi-join recount removes the false positives. Output is
    therefore identical to ``GROUP BY col HAVING count ≥ min_count``
    (minus NULLs, same contract as exact_heavy_hitters) — which is what
    makes this sketch path driver-oracle-checkable while
    misra_gries_summary itself stays pytest-pinned.

    vs exact_heavy_hitters: that one prunes with a per-partition
    pigeonhole bar ceil(T/P) (candidate count data-dependent); this one
    bounds the candidate set at ≤ P·k rows REGARDLESS of skew shape —
    the trade a 100 TB/day abuse pipeline picks when the tail is
    adversarial."""
    if min_count < 1:
        raise ValueError("min_count must be ≥ 1")
    df = df.where(F.col(col).isNotNull())
    n = df.count()
    if n == 0:
        return df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt")).limit(0)
    k = max(1, math.ceil(n / min_count))  # N/(k+1) < min_count
    dtype = dict(df.dtypes)[col]

    def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summ: Counter = Counter()
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                summ[v] += int(c)
            summ = _mg_reduce(summ, k)
        yield pd.DataFrame({col: list(summ.keys())})

    cand = df.select(col).mapInPandas(_partials, schema=f"{col} {dtype}").distinct()
    return (
        df.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )


def approx_distinct(
    df: DataFrame, group_cols: list[str], col: str, rsd: float = 0.02
) -> DataFrame:
    """→ group_cols + (approx_distinct): HyperLogLog++ distinct count per
    group at ``rsd`` relative standard deviation — constant memory per
    group regardless of cardinality (the 100 TB distinct profile).
    Relative-error contract pinned in tests/test_sketches.py."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(col, rsd).alias("approx_distinct")
    )


def bloom_words(keys: DataFrame, key_col: str, m: int = 4096, k: int = 3) -> DataFrame:
    """Build an m-bit Bloom filter over ``keys`` as a (word_idx, word)
    table of ceil(m/32) packed 32-bit words — the deterministic,
    engine-replayable form of the broadcast bitmask a runtime
    row-level-filter join uses at 100 TB (Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter`` is this plan shape:
    aggregate the small side into a fixed-size bitset, broadcast it,
    and prune the big side BEFORE its shuffle).

    Hash family: position_j(key) = md5-60bit(salt="bloom{j}" || key) % m
    (operators/sampling.hash_bucket — the corpus-wide hash idiom), so
    DuckDB reproduces every bit. Words stay < 2^32 so all shifts are
    safe in signed 64-bit on both engines.

    Scale: the output is ≤ ceil(m/32) rows regardless of input size —
    one map-side-combined groupBy; always broadcastable.
    """
    from metis_spark.operators.sampling import hash_bucket

    if m % 32 != 0:
        raise ValueError("m must be a multiple of 32")
    cols = [
        F.pmod(hash_bucket(F.col(key_col), f"bloom{j}"), F.lit(m)).alias(f"pos{j}")
        for j in range(k)
    ]
    exploded = keys.select(F.explode(F.array(*cols)).alias("pos"))
    return (
        exploded.select(
            F.expr("cast(pos div 32 as long)").alias("word_idx"),
            # SQL expr: the Python F.shiftleft only takes a literal shift
            F.expr("shiftleft(1L, cast(pos % 32 as int))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_probe(
    df: DataFrame, probe_col: str, words: DataFrame, m: int = 4096, k: int = 3
) -> DataFrame:
    """df + ``bloom_pass`` (boolean): probe each row's key against the
    packed Bloom words via k broadcast joins (≤ m/32 rows each) — zero
    shuffle on the probed side, which is the whole point: the pruned
    stream enters the real join's exchange with the definite
    non-matches already dropped. No false negatives (pytest-pinned);
    false-positive rate ≈ (1 - e^{-kn/m})^k."""
    from metis_spark.operators.sampling import hash_bucket

    out = df
    conds = []
    for j in range(k):
        pj = F.pmod(hash_bucket(F.col(probe_col), f"bloom{j}"), F.lit(m))
        out = out.withColumn(f"_bw{j}", (pj / F.lit(32)).cast("long")).withColumn(
            f"_bb{j}", F.pmod(pj, F.lit(32)).cast("int")
        )
        wj = words.select(
            F.col("word_idx").alias(f"_bw{j}"), F.col("word").alias(f"_w{j}")
        )
        out = out.join(F.broadcast(wj), f"_bw{j}", "left")
        # SQL expr: the Python F.shiftright only takes a literal shift
        conds.append(
            F.expr(f"(shiftright(coalesce(_w{j}, 0L), _bb{j}) & 1) = 1")
        )
    passed = conds[0]
    for c in conds[1:]:
        passed = passed & c
    drop = [f"_bw{j}" for j in range(k)] + [f"_bb{j}" for j in range(k)] + [f"_w{j}" for j in range(k)]
    return out.withColumn("bloom_pass", passed).drop(*drop)
