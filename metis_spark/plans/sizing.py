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
