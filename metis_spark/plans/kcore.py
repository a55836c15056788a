"""k-core decomposition by iterative peeling, on the shared checkpoint spine.

The standard "which part of the dependency graph is structurally dense"
question: the k-core is the maximal subgraph in which every vertex has
undirected degree ≥ k, computed by repeatedly deleting vertices whose
degree drops below k until a fixpoint.

Distributed shape (same contract as pagerank/components/sssp):
- the symmetric edge table is hash-partitioned by src ONCE and persisted;
  every round filters the ORIGINAL edge table against the current alive
  set with two semi-joins (src, dst) — no growing filter lineage, and the
  src-side semi-join reuses the edge partitioning (no edge re-shuffle).
- per-round state (id, deg) commits through CheckpointManager: parquet +
  per-partition lineage + metrics, resume mid-peel.
- the alive set only shrinks, so fixpoint detection is a row-count
  equality — it folds into the commit's single lineage pass (no extra
  job, no joins against the previous round).

Rounds are bounded by the peel depth (longest removal cascade). On
power-law dependency graphs this is small (hubs survive, leaf chains are
shallow); the DuckDB oracle unrolls KCORE_ORACLE_ROUNDS rounds, which the
driver query asserts is ≥ the measured fixpoint at test scale.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager


def k_core(
    edges: DataFrame,
    k: int,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
    retain: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → ((id, deg) of the k-core subgraph, info).

    ``deg`` is the vertex's degree WITHIN the k-core (≥ k for every
    surviving vertex at fixpoint). Directed input is symmetrized and
    dedup'd; self-loops are dropped.

    ``checkpoint_every=k`` / ``retain``: the shared durability dial
    (plans/checkpoint.py:step) — durable commit every k-th peel round and
    at fixpoint, one localCheckpoint job otherwise; resume lands on the
    last COMMITTED round; the core is identical for every setting.
    """
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_kcore_")
    cm = CheckpointManager(checkpoint_dir, f"kcore{k}", retain=retain)

    fwd = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    e = und.repartition(num_partitions, "src").persist()
    e.count()

    # round 0: full degrees, first cut at deg >= k
    alive = (
        e.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .where(F.col("deg") >= k)
    )
    prev_rows = -1
    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            state, meta = cm.load(spark, k0)
            alive = state.select("id", "deg")
            start_iter = k0
            prev_rows = int(meta.get("rows_committed", -1))
            if meta.get("converged"):
                e.unpersist()
                return alive, {
                    "iterations": k0, "converged": True, "seconds": 0.0, "resumed": True,
                }

    t0 = time.monotonic()
    converged = False
    r = start_iter
    for r in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        sa = alive.select(F.col("id").alias("src"))
        sd = alive.select(F.col("id").alias("dst"))
        nxt = (
            e.join(sa.hint("shuffle_hash"), "src", "left_semi")
            .join(sd.hint("shuffle_hash"), "dst", "left_semi")
            .groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= k)
        )
        durable = checkpoint_every <= 1 or r % checkpoint_every == 0 or r == max_iter
        state, totals = cm.step(r, nxt, {}, durable=durable)
        rows = int(totals["rows"] or 0)
        converged = rows == prev_rows or rows == 0
        if converged and not durable:
            state, totals = cm.commit(r, state, {})
            durable = True
        if durable:
            cm.update_meta(r, {"converged": converged, "rows_committed": rows})
        cm.append_metrics(
            {"iter": r, "delta": float(-1 if prev_rows < 0 else prev_rows - rows),
             "seconds": time.monotonic() - it_t0, "rows": rows,
             "committed": durable}
        )
        alive = state.select("id", "deg")
        prev_rows = rows
        if converged:
            break

    e.unpersist()
    return alive, {
        "iterations": r, "converged": converged, "seconds": time.monotonic() - t0,
    }
