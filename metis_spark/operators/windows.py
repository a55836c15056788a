"""Sequence-state operators (reference §2.5): sessionization + forward-fill.

The reference maintains this state imperatively inside a single-threaded
scan (part_index counter /root/reference/Metis/tools/stdf2ph5.py:316,409-423;
BPS/EPS forward-fill :317,393-399; last-WIR state :341-345). Spark has no
arrival order, so the total order is explicit (order_cols) and the state
machines become window frames:

- sessionize: running count of *preceding* delimiter rows — the part-open
  semantics of PIR…PRR sessions (index increments after each PRR);
- forward_fill: LAST_VALUE(ignore nulls) over an unbounded-preceding frame;
- last_event_fallback: keyed forward-fill with a scoped last-event fallback
  (the wafer-id fallback of issue #26, stdf2ph5.py:341-345,548-553).

All are Window specs partitioned by the session key — embarrassingly
parallel across keys at any scale. The fallback in
``last_event_fallback`` REQUIRES an explicit scope (``fallback_scope_cols``)
— the reference's fallback is scoped per STDF file, this engine's per
lot/repo/shard — so no shipped plan ever contains an unpartitioned
Window.orderBy (which would drag the entire table through one task).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    delimiter: Column,
    out_col: str = "part_index",
) -> DataFrame:
    """part_index = number of preceding rows where ``delimiter`` holds."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return df.withColumn(
        out_col,
        F.coalesce(F.sum(delimiter.cast("long")).over(w), F.lit(0)).cast("long"),
    )


def forward_fill(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    value: Column,
    out_col: str,
) -> DataFrame:
    """Carry the last non-null ``value`` forward within each partition."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.last(value, ignorenulls=True).over(w))


def last_event_fallback(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    value: Column,
    out_col: str,
    fallback_scope_cols: list,
) -> DataFrame:
    """Keyed forward-fill, falling back to the most recent value in scope.

    coalesce(last value within key, last value within fallback scope) —
    the reference's "use the latest WIR if this wafer never got one",
    whose fallback scope is the STDF file (stdf2ph5.py:341-345,548-553).
    ``fallback_scope_cols`` must be a coarsening of ``partition_cols``
    (file/lot/repo/shard) and is REQUIRED: an unscoped fallback would be
    a single-partition window over the whole table — the one plan shape
    this engine refuses to ship. Expressions (e.g. ``user_id % 16``) are
    accepted alongside column names.
    """
    if not fallback_scope_cols:
        raise ValueError(
            "last_event_fallback requires fallback_scope_cols (file/lot/shard); "
            "an unscoped global fallback would funnel the table through one task"
        )
    w_key = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_scope = (
        Window.partitionBy(*fallback_scope_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        out_col,
        F.coalesce(
            F.last(value, ignorenulls=True).over(w_key),
            F.last(value, ignorenulls=True).over(w_scope),
        ),
    )


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "t_start",
    end_col: str = "t_end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Containment join (event ts ∈ [start, end]) as an EQUI-join.

    The naive `e.ts BETWEEN i.start AND i.end` predicate has no equi-key,
    so Spark compiles it to BroadcastNestedLoopJoin — O(|events|·|intervals|)
    and a driver OOM once the interval side outgrows broadcast. Instead,
    each interval is exploded to the time buckets it covers and each event
    keys into its single bucket: the join becomes a shuffle equi-join on
    the bucket id, then the exact containment predicate filters within
    buckets. Cost O(|events| + Σ interval_len/bucket) — pick
    ``bucket_seconds`` near the median interval length so the explode
    factor stays small. Each qualifying (event, interval) pair emerges
    exactly once (an event has one bucket; interval bucket rows are
    distinct)."""
    # ANSI mode forbids timestamp→long casts; unix_timestamp handles
    # timestamp/timestamp_ntz (session TZ is pinned UTC)
    b = bucket_seconds
    iv = intervals.withColumn(
        "_bk",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b).cast("long"),
                F.floor(F.unix_timestamp(F.col(end_col)) / b).cast("long"),
            )
        ),
    )
    ev = events.withColumn(
        "_bk", F.floor(F.unix_timestamp(F.col(ts_col)) / b).cast("long")
    )
    return (
        ev.join(iv, "_bk")
        .where((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)))
        .drop("_bk")
    )
