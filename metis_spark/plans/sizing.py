"""Data-volume-driven partition sizing for the iterative plans.

Per-iteration cost has a fixed per-task component (scheduling, codegen
dispatch, shuffle-file handling); on a small graph, core-count-many
near-empty partitions make that fixed cost dominate (measured: the
1.1M-edge bench PageRank runs ~25% faster warm — and ~2× faster cold —
at 8 partitions than at 32 on local[32]), while at 50M+ edges the same
core-count setting under-splits. This is the local analog of sizing
``spark.sql.shuffle.partitions`` to the stage's input bytes, which is
what AQE coalescing does for non-iterative stages — the iterative plans
pin their partitioning up front (so every iteration reuses one exchange
layout) and therefore size it explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

EDGES_PER_PARTITION = 250_000


def auto_partitions(edges: DataFrame) -> int:
    """Target ~250k edges/partition, floor 8, cap 4× scheduler parallelism.
    Costs one count job over the (columnar, pruned) edge input."""
    dp = edges.sparkSession.sparkContext.defaultParallelism
    n_e = edges.count()
    by_data = (n_e + EDGES_PER_PARTITION - 1) // EDGES_PER_PARTITION
    return max(8, min(4 * dp, int(by_data) or 1))


def skew_salt_advisor(
    edges, key_col: str = "src", parallelism: int = 32
):
    """Shuffle-skew audit + salt recommendation → one row (n_keys,
    n_edges, top_key, top_count, median_count, p99_count,
    top_share_micro, skew_ratio_milli, recommended_salt).

    The planning query behind the north-rule's "explicit salting of hub
    vertices": measure the join-key histogram BEFORE the big shuffle
    and derive the salt factor S that splits the hottest key across S
    sub-keys so no task exceeds an average partition's share —
    S = clamp(ceil(top_count·P / m), 1, P). All statistics are exact
    integers (shares via integer DIV — no float enters at all); the
    median/p99 rank selection runs over the DISTINCT-count histogram
    (power-law-collapsed, O(100) rows at any scale), never a global
    per-key window.
    """
    from pyspark.sql import Window, functions as F

    kc = edges.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    hist = kc.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    w = Window.orderBy(F.asc("c")).rowsBetween(Window.unboundedPreceding, 0)
    hist_cum = hist.withColumn("cum", F.sum("freq").over(w).cast("long"))
    stats = hist.agg(
        F.sum("freq").cast("long").alias("n_keys"),
        F.sum(F.col("c") * F.col("freq")).cast("long").alias("m"),
    )
    top = kc.orderBy(F.desc("c"), F.asc("k")).limit(1).select(
        F.col("k").alias("top_key"), F.col("c").alias("top_count")
    )
    ranked = hist_cum.crossJoin(F.broadcast(stats.select("n_keys")))
    med = ranked.where(
        F.col("cum") >= F.expr("(n_keys + 1) div 2")
    ).agg(F.min("c").cast("long").alias("median_count"))
    p99 = ranked.where(
        F.col("cum") >= F.expr("(99 * n_keys + 99) div 100")
    ).agg(F.min("c").cast("long").alias("p99_count"))
    return (
        stats.crossJoin(F.broadcast(top))
        .crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(p99))
        .select(
            "n_keys",
            F.col("m").alias("n_edges"),
            "top_key", "top_count", "median_count", "p99_count",
            F.expr("(1000000 * top_count) div m").cast("long").alias("top_share_micro"),
            F.expr("(1000 * top_count * n_keys) div m").cast("long").alias("skew_ratio_milli"),
            F.expr(
                f"least(cast({parallelism} as bigint), greatest(cast(1 as bigint), "
                f"(top_count * {parallelism} + m - 1) div m))"
            ).cast("long").alias("recommended_salt"),
        )
    )
