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
