"""k-truss decomposition by iterative support peeling, on the shared
checkpoint spine.

The k-truss is the maximal subgraph in which every edge participates in
≥ k-2 triangles (its *support*) — the edge-cohesion analog of the k-core
(plans/kcore.py peels vertices by degree; this peels edges by support).
It reuses the degree-oriented sorted-adjacency intersection machinery of
plans/triangles.py:_per_edge_commons: each round,

  1. per-edge support = |Γ(u) ∩ Γ(v)| over the SURVIVING edge set,
     computed with the oriented intersection (each triangle counted once
     per edge it contains, adjacency rows bounded O(√m));
  2. edges with support < k-2 are deleted;
  3. fixpoint when no edge is deleted — row-count equality, folded into
     the commit's single lineage pass (no extra job).

Distributed shape (same contract as the other plans/):
- the surviving edge set is the per-round state, committed through
  CheckpointManager (parquet + per-partition lineage + metrics) so a
  mid-peel crash resumes from the last round;
- every round rebuilds orientation + adjacency over the CURRENT edge
  set — support must be recomputed anyway after deletions invalidate
  triangles, and recomputation over a shrinking set beats maintaining
  per-triangle delta state at 10^12-edge scale;
- rounds are bounded by the peel-cascade depth; on power-law graphs the
  cascade is shallow (dense cores stabilize fast), mirroring the k-core
  argument in plans/kcore.py.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager
from metis_spark.plans.triangles import _per_edge_commons


def _edge_support(cur: DataFrame) -> DataFrame:
    """Canonical edges → (src, dst, support) with support = #triangles
    CONTAINING the edge. _per_edge_commons counts each triangle only on
    its lowest-order pair (right for counting each triangle once); here
    every w ∈ common fans the count out to the other two edges (u,w) and
    (v,w) too — the same redistribution triangle_count_per_vertex does
    for vertices. Edges in no triangle are absent (support 0)."""
    per = _per_edge_commons(cur).where(F.col("n_common") > 0)
    base = per.select(
        F.col("src").alias("a"), F.col("dst").alias("b"),
        F.col("n_common").cast("long").alias("c"),
    )
    w1 = per.select(
        F.col("src").alias("a"), F.explode("common").alias("b")
    ).withColumn("c", F.lit(1).cast("long"))
    w2 = per.select(
        F.col("dst").alias("a"), F.explode("common").alias("b")
    ).withColumn("c", F.lit(1).cast("long"))
    return (
        base.unionByName(w1)
        .unionByName(w2)
        .select(
            F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst"), "c"
        )
        .groupBy("src", "dst")
        .agg(F.sum("c").cast("long").alias("support"))
    )


def k_truss(
    edges: DataFrame,
    k: int,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    checkpoint_every: int = 1,
    retain: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → ((src, dst, support) of the k-truss subgraph, info).

    Output edges are canonical (src < dst, undirected dedup'd); ``support``
    is the edge's triangle count WITHIN the k-truss (≥ k-2 at fixpoint).
    Directed input is symmetrized; self-loops dropped.

    ``checkpoint_every=k`` / ``retain``: the shared durability dial
    (plans/checkpoint.py:step) — durable commit every k-th peel round and
    at fixpoint; resume lands on the last COMMITTED round.
    """
    if k < 3:
        raise ValueError("k-truss needs k ≥ 3 (k-2 ≥ 1 triangle per edge)")
    spark = edges.sparkSession
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_ktruss_")
    cm = CheckpointManager(checkpoint_dir, f"ktruss{k}", retain=retain)

    cur = (
        edges.select(
            F.least("src", "dst").cast("long").alias("src"),
            F.greatest("src", "dst").cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    prev_rows = -1
    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            state, meta = cm.load(spark, k0)
            cur = state.select("src", "dst")
            start_iter = k0
            prev_rows = int(meta.get("rows_committed", -1))
            if meta.get("converged"):
                return _edge_support(cur), {
                    "iterations": k0, "converged": True, "seconds": 0.0, "resumed": True,
                }

    t0 = time.monotonic()
    converged = False
    r = start_iter
    for r in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        # support over the CURRENT edge set; _per_edge_commons re-orients by
        # (degree, id) internally, so its (src,dst) is orientation order —
        # canonicalize back before committing
        nxt = (
            _edge_support(cur)
            .where(F.col("support") >= k - 2)
            .select("src", "dst")
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
        cur = state.select("src", "dst")
        prev_rows = rows
        if converged:
            break

    return _edge_support(cur), {
        "iterations": r, "converged": converged, "seconds": time.monotonic() - t0,
    }
