"""Training-shard sequence packing — deterministic concat-and-split
assignment of documents to fixed-token-budget shards.

The standard LLM pre-tokenization step: documents are laid out in a
deterministic order (``order_col``), their token counts concatenated,
and the stream split every ``budget`` tokens; a document belongs to the
shard its FIRST token lands in (concat-and-split semantics — a long
document may straddle into the next shard, exactly like sequence packing
before chunking into context windows).

The naive plan is a GLOBAL running sum — ``Window.orderBy(order_col)``
with no partition key, which Spark executes on a single task (the
WindowExec "no partition defined" scale-killer). This operator uses the
same two-phase prefix-offset scheme as the dictionary encoder
(operators/encode.py): buckets of the order key get per-bucket token
sums (one map-side-combining groupBy, tiny result), the driver folds
them into cumulative bucket offsets (O(#buckets) scalars), and a
broadcast join + per-bucket window finishes the global running sum with
full parallelism. No global sort, no single-partition window; each
bucket's window sorts only its own rows.

The result is bit-identical to the single-window formulation (pinned by
tests), so the DuckDB twin is a plain ``SUM(...) OVER (ORDER BY ...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    budget: int,
    bucket_size: int = 100_000,
) -> DataFrame:
    """(order_col, weight_col, …) → (order_col, weight_col, start_off,
    shard): ``start_off`` is the running token offset where the row
    begins, ``shard = start_off // budget``. Rows are packed in
    ascending ``order_col`` (must be non-negative and unique — doc ids
    from the dictionary encoder are). ``bucket_size`` controls phase-1
    granularity: ~rows/bucket_size buckets of driver-side scalars."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    spark = df.sparkSession
    b = df.select(
        F.col(order_col).cast("long").alias("_ord"),
        F.col(weight_col).cast("long").alias("_w"),
    ).withColumn("_bucket", F.floor(F.col("_ord") / bucket_size).cast("long"))

    # phase 1: per-bucket totals → driver-side cumulative offsets.
    # O(#buckets) rows — with bucket_size 1e5 that is 10k scalars per 1e9
    # docs; never proportional to the data.
    parts = b.groupBy("_bucket").agg(F.sum("_w").alias("_sum")).orderBy("_bucket").collect()
    run = 0
    offsets = []
    for r in parts:
        offsets.append((int(r["_bucket"]), run))
        run += int(r["_sum"] or 0)
    if not offsets:
        return spark.createDataFrame(
            [], f"{order_col} long, {weight_col} long, start_off long, shard long"
        )
    odf = spark.createDataFrame(offsets, "_bucket long, _off long")

    # phase 2: per-bucket running sum + broadcast offset = global prefix
    w = Window.partitionBy("_bucket").orderBy("_ord")
    return (
        b.join(F.broadcast(odf), "_bucket")
        .withColumn(
            "start_off", (F.sum("_w").over(w) - F.col("_w") + F.col("_off")).cast("long")
        )
        .select(
            F.col("_ord").alias(order_col),
            F.col("_w").alias(weight_col),
            "start_off",
            F.floor(F.col("start_off") / budget).cast("long").alias("shard"),
        )
    )
