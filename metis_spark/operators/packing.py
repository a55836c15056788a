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


def chunk_plan(
    df: DataFrame,
    id_col: str,
    tokens_col,
    chunk: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window chunk plan per document → one row per chunk
    (id, chunk_idx, start_tok, end_tok, chunk_tokens) — the
    context-window slicing step of a pretraining/RAG pipeline, as a
    PLAN over token offsets (the text itself never rides the explode).

    Starts at 0, stride, 2·stride, …; n_chunks = 1 for docs that fit,
    else ceil((n − chunk)/stride) + 1 so the final window always covers
    the tail (it may overlap more). Zero-token docs emit no chunks.
    Integer arithmetic only — engine-exact. ``tokens_col`` is a Column
    (e.g. functions.text.whitespace_token_count) so callers pin the
    same token definition their other corpus queries use.

    Shape: narrow select + explode(sequence) — map-only, no shuffle;
    chunk row count is data-bounded (Σ n_chunks), never |docs|·const.
    """
    if chunk <= 0 or stride <= 0 or stride > chunk:
        raise ValueError("need 0 < stride <= chunk")
    base = df.select(F.col(id_col), tokens_col.cast("long").alias("_n"))
    n_chunks = (
        F.when(F.col("_n") <= 0, F.lit(0))
        .when(F.col("_n") <= chunk, F.lit(1))
        .otherwise(F.expr(f"(_n - {chunk} + {stride} - 1) DIV {stride} + 1"))
    )
    return base.select(id_col, "_n", n_chunks.cast("long").alias("_k")).where(
        F.col("_k") > 0
    ).select(
        id_col,
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("_k") - 1)).alias("chunk_idx"),
        "_n",
    ).select(
        id_col,
        "chunk_idx",
        (F.col("chunk_idx") * stride).cast("long").alias("start_tok"),
        F.least(F.col("chunk_idx") * stride + chunk, F.col("_n")).cast("long").alias("end_tok"),
        (
            F.least(F.col("chunk_idx") * stride + chunk, F.col("_n"))
            - F.col("chunk_idx") * stride
        ).cast("long").alias("chunk_tokens"),
    )
