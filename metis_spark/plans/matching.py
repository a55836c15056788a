"""Maximal matching by locally-dominant (mutual-minimum) edge rounds.

Preis' locally-dominant matching with a FIXED strict edge priority
instead of randomness (the determinism discipline of plans/mis.py):
order edges by (p, s, d) where p is the 60-bit md5 hash of the
canonical pair — a strict total order. Round k over the active edge set
(both endpoints free):

    W_k = { e : e is the minimum-priority active edge incident to BOTH
           of its endpoints }           (locally dominant ⇒ vertex-disjoint)
    match W_k's endpoint pairs, drop them from the free set

The global minimum active edge is always locally dominant, so every
round makes progress; the result is exactly the SEQUENTIAL greedy
matching by ascending (p, s, d) — unique for a strict order — which is
what the pytest twin computes and the unrolled DuckDB twin replays.
Maximality: an edge with both endpoints free would still be active.
Expected rounds O(log n) on hash-random priorities (Preis / the
Israeli–Itai family; greedy is also a 1/2-approximation to maximum
weight matching when p is a weight rank).

Scale shape (same contract as the other plans/):
- canonical edge table hash-partitioned and persisted ONCE; each round
  is two SHJ free-vertex joins, one map-side-partial ``min_by`` groupBy
  per endpoint fan, and the mutual-min check is a COUNT(*) = 2 groupBy
  on (s, d) — no window over |E|;
- vertex state (id, mate; -1 = free) commits through CheckpointManager
  (parquet + per-partition lineage + metrics) and resumes mid-run; the
  newly-matched count folds into the commit's lineage scan.

Reference parity: /root/reference/Metis has no matching operator; this
completes the symmetry-breaking family next to plans/mis.py (MIS) and
plans/coloring.py.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager


def maximal_matching(
    edges: DataFrame,
    priority_col: str | None = None,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
    retain: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst[,priority]) → (matching(src, dst) with src < dst,
    info{iterations, converged, matched_edges, seconds, n}).

    Undirected view (canonicalized, self-loops dropped). ``priority_col``
    supplies the edge order (ties broken by (s, d)); when None the
    60-bit md5 hash of "m_s_d" is used — deterministic and replayable
    in any engine.

    ``checkpoint_every=k`` / ``retain``: the shared durability dial
    (plans/checkpoint.py:step) — durable commit every k-th round and at
    convergence, one localCheckpoint job otherwise; resume lands on the
    last COMMITTED round; the matching is identical for every k."""
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_matching_")
    cm = CheckpointManager(checkpoint_dir, "matching", retain=retain)

    base = edges.select(
        F.least("src", "dst").cast("long").alias("s"),
        F.greatest("src", "dst").cast("long").alias("d"),
        *([F.col(priority_col).cast("long").alias("p")] if priority_col else []),
    ).where(F.col("s") != F.col("d"))
    if priority_col is None:
        pair = F.concat_ws("_", F.lit("m"), F.col("s").cast("string"), F.col("d").cast("string"))
        base = base.withColumn(
            "p", F.conv(F.substring(F.md5(pair), 1, 15), 16, 10).cast("long")
        )
    ce = (
        base.groupBy("s", "d")
        .agg(F.min("p").alias("p"))
        .repartition(num_partitions, "s")
        .persist()
    )
    verts = (
        ce.select(F.col("s").alias("id"))
        .unionByName(ce.select(F.col("d").alias("id")))
        .distinct()
    )
    state = verts.select("id", F.lit(-1).cast("long").alias("mate"))
    n = verts.count()

    start_iter = 0
    done = False
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, meta = cm.load(spark, k0)
            state = st.select("id", "mate")
            start_iter = k0
            done = bool(meta.get("converged"))

    t0 = time.monotonic()
    converged = done
    k = start_iter
    while not done and k < max_iter:
        k += 1
        it_t0 = time.monotonic()
        free = state.where(F.col("mate") == -1).select("id")
        ae = (
            ce.join(free.select(F.col("id").alias("s")).hint("shuffle_hash"), "s")
            .join(free.select(F.col("id").alias("d")).hint("shuffle_hash"), "d")
            .select("s", "d", "p")
        )
        fan = ae.select(F.col("s").alias("id"), "s", "d", "p").unionByName(
            ae.select(F.col("d").alias("id"), "s", "d", "p")
        )
        mn = (
            fan.groupBy("id")
            .agg(F.min_by(F.struct("s", "d"), F.struct("p", "s", "d")).alias("e"))
            .select(F.col("e.s").alias("s"), F.col("e.d").alias("d"))
        )
        win = (
            mn.groupBy("s", "d")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") == 2)
            .select("s", "d")
        )
        nxt = (
            state.select("id", F.col("mate").alias("old"))
            .join(
                win.select(F.col("s").alias("id"), F.col("d").alias("m1"))
                .hint("shuffle_hash"),
                "id", "left",
            )
            .join(
                win.select(F.col("d").alias("id"), F.col("s").alias("m2"))
                .hint("shuffle_hash"),
                "id", "left",
            )
            .select(
                "id",
                F.coalesce("m1", "m2", "old").cast("long").alias("mate"),
                "old",
            )
        )
        aggs = {
            "newly": F.sum((F.col("mate") != F.col("old")).cast("long")),
            "matched": F.sum((F.col("mate") >= 0).cast("long")),
        }
        durable = checkpoint_every <= 1 or k % checkpoint_every == 0 or k == max_iter
        st, totals = cm.step(k, nxt, {}, extra_aggs=aggs, durable=durable)
        newly = int(totals["newly"] or 0)
        converged = newly == 0
        if converged and not durable:
            st, totals = cm.commit(k, st, {}, extra_aggs=aggs)
            durable = True
        if durable:
            cm.update_meta(k, {"converged": converged, "newly": newly})
        cm.append_metrics(
            {"iter": k, "delta": float(newly),
             "seconds": time.monotonic() - it_t0, "rows": int(totals["rows"]),
             "committed": durable}
        )
        state = st.select("id", "mate")
        if converged:
            break

    out = state.where(F.col("mate") > F.col("id")).select(
        F.col("id").alias("src"), F.col("mate").alias("dst")
    )
    n_matched = out.count()
    ce.unpersist()
    return out, {
        "iterations": k,
        "converged": converged,
        "matched_edges": n_matched,
        "seconds": time.monotonic() - t0,
        "n": n,
    }
