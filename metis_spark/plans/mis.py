"""Maximal independent set (deterministic Luby) as iterative DataFrame
joins on the shared checkpoint spine.

Luby's algorithm with a FIXED injective hash priority instead of fresh
per-round randomness (the determinism discipline every iterative plan in
this repo follows — cf. plans/walks.py's arithmetic-hash arg-min):

    h(v) = (v · 2654435761) mod 2³²          (Knuth multiplicative hash;
                                              odd multiplier ⇒ bijective
                                              on [0, 2³²), so NO ties)

round k over the active vertex set A_k (A_0 = all vertices of the
undirected view):

    W_k  = { v ∈ A_k : h(v) < min{ h(u) : u ∈ A_k, {u,v} ∈ E } }
           (local minima join the MIS; vertices with no active
            neighbour win unconditionally)
    A_k+1 = A_k − W_k − N(W_k)

Every vertex is removed after O(log n) rounds in expectation for random
priorities; a fixed hash behaves the same on non-adversarial graphs and
makes the run REPLAYABLE — the DuckDB oracle unrolls the identical
arithmetic and reaches the identical set.

Correctness: W_k is independent (two adjacent winners would each need
the smaller hash), W_i ∪ W_j stay independent (N(W_i) is removed before
round j), and the final set is maximal (a vertex leaves A only by
winning or by gaining a MIS neighbour).

Scale shape (same contract as the other plans/):
- the symmetric edge table is hash-partitioned by ``src`` ONCE and
  persisted; each round is one SHJ join active⋈edges + a min-fold
  groupBy with map-side partial min (hub degrees absorbed before the
  exchange) + one SHJ winner-neighbourhood join;
- per-round state (id, status ∈ {0 active, 1 mis, 2 removed}) commits
  through CheckpointManager (parquet + per-partition lineage + metrics)
  and resumes mid-algorithm; the remaining-active count folds into the
  commit's single lineage scan (``extra_aggs``) — fixpoint detection
  costs no extra job.

Ids must fit in 31 bits (|id| < 2³¹) so the hash product stays inside
BIGINT under ANSI arithmetic; dictionary-encoded vertex ids
(operators/encode.py) always satisfy this at any corpus size that fits
one Spark cluster's vertex space.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager

MIS_HASH_MULT = 2654435761
MIS_HASH_MOD = 4294967296


def _h(col):
    return (F.col(col) * F.lit(MIS_HASH_MULT)) % F.lit(MIS_HASH_MOD)


def maximal_independent_set(
    edges: DataFrame,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
    retain: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → (membership(id, in_mis), info{iterations,
    converged, mis_size, seconds, n}). Input is symmetrized; self-loops
    dropped (a self-looped vertex is just a normal vertex here).

    ``checkpoint_every=k`` / ``retain``: the shared durability dial
    (plans/checkpoint.py:step) — durable commit every k-th round and at
    convergence, one localCheckpoint job otherwise; resume lands on the
    last COMMITTED round; the set is identical for every k (fixed-hash
    priorities make every round deterministic)."""
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_mis_")

    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    e = und.repartition(num_partitions, "src").persist()
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(num_partitions, "id")
    )

    cm = CheckpointManager(checkpoint_dir, "mis", retain=retain)
    state = verts.select("id", F.lit(0).cast("int").alias("status"))
    start_iter = 0
    n_active = None
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, meta = cm.load(spark, k0)
            state = st.select("id", "status")
            start_iter = k0
            n_active = int(meta.get("active", 1))
            if n_active == 0:
                out = state.select("id", (F.col("status") == 1).alias("in_mis"))
                mis_size = out.where("in_mis").count()
                e.unpersist()
                return out, {
                    "iterations": k0,
                    "converged": True,
                    "mis_size": mis_size,
                    "seconds": 0.0,
                    "n": state.count(),
                    "resumed": True,
                }

    t0 = time.monotonic()
    converged = False
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        active = state.where(F.col("status") == 0).select("id")
        # min active-neighbour hash per active vertex (map-side partial min)
        nm = (
            e.join(active.hint("shuffle_hash"), e["src"] == active["id"])
            .select(F.col("dst").alias("id"), _h("src").alias("nh"))
            .groupBy("id")
            .agg(F.min("nh").alias("minh"))
        )
        scored = active.join(nm.hint("shuffle_hash"), "id", "left").select(
            "id",
            (F.col("minh").isNull() | (_h("id") < F.col("minh"))).alias("win"),
        )
        winners = scored.where("win").select("id")
        # neighbours of this round's winners (to be removed)
        nbrs = (
            e.join(
                winners.select(F.col("id").alias("src")).hint("shuffle_hash"), "src"
            )
            .select(F.col("dst").alias("id"))
            .distinct()
            .select("id", F.lit(True).alias("rm"))
        )
        active_next = scored.join(nbrs.hint("shuffle_hash"), "id", "left").select(
            "id",
            F.when(F.col("win"), F.lit(1))
            .when(F.col("rm").isNotNull(), F.lit(2))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("status"),
        )
        nxt = state.where(F.col("status") != 0).unionByName(active_next)
        aggs = {
            "active": F.sum((F.col("status") == 0).cast("long")),
            "mis": F.sum((F.col("status") == 1).cast("long")),
        }
        durable = checkpoint_every <= 1 or k % checkpoint_every == 0 or k == max_iter
        st, totals = cm.step(k, nxt, {}, extra_aggs=aggs, durable=durable)
        n_active = int(totals["active"] or 0)
        converged = n_active == 0
        if converged and not durable:
            st, totals = cm.commit(k, st, {}, extra_aggs=aggs)
            durable = True
        if durable:
            cm.update_meta(k, {"converged": converged, "active": n_active})
        cm.append_metrics(
            {"iter": k, "delta": float(n_active),
             "seconds": time.monotonic() - it_t0, "rows": int(totals["rows"]),
             "committed": durable}
        )
        state = st.select("id", "status")
        if converged:
            mis_size = int(totals["mis"] or 0)
            break
    else:
        mis_size = state.where(F.col("status") == 1).count()

    out = state.select("id", (F.col("status") == 1).alias("in_mis"))
    n = state.count()
    e.unpersist()
    return out, {
        "iterations": k,
        "converged": converged,
        "mis_size": mis_size,
        "seconds": time.monotonic() - t0,
        "n": n,
    }
