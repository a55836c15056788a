"""Sequence-state operators (reference §2.5): sessionization + forward-fill.

The reference maintains this state imperatively inside a single-threaded
scan (part_index counter /root/reference/Metis/tools/stdf2ph5.py:316,409-423;
BPS/EPS forward-fill :317,393-399; last-WIR state :341-345). Spark has no
arrival order, so the total order is explicit (order_cols) and the state
machines become window frames:

- sessionize: running count of *preceding* delimiter rows — the part-open
  semantics of PIR…PRR sessions (index increments after each PRR);
- forward_fill: LAST_VALUE(ignore nulls) over an unbounded-preceding frame;
- last_event_fallback: keyed forward-fill with a global last-event fallback
  (the wafer-id fallback of issue #26, stdf2ph5.py:341-345,548-553).

All are Window specs partitioned by the session key — embarrassingly
parallel across keys at any scale. The global fallback in
``last_event_fallback`` is the one deliberate single-partition window
(matching the reference's strictly-serial semantics); callers at 100 TB
scope it per lot/repo partition exactly as the reference scopes it per
STDF file.
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
) -> DataFrame:
    """Keyed forward-fill, falling back to the most recent value globally.

    coalesce(last value within key, last value over all rows) — the
    reference's "use the latest WIR if this wafer never got one".
    """
    w_key = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(
        out_col,
        F.coalesce(
            F.last(value, ignorenulls=True).over(w_key),
            F.last(value, ignorenulls=True).over(w_all),
        ),
    )
