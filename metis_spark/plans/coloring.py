"""Greedy graph coloring (Jones–Plassmann) as iterative DataFrame joins
on the shared checkpoint spine.

Jones–Plassmann with the repo's fixed injective hash priority
(plans/mis.py's h(v) = v·2654435761 mod 2³² — bijective, so no ties):

round k: every uncolored vertex whose uncolored neighbours ALL have
larger h picks its color NOW — the smallest non-negative integer absent
from its already-colored neighbourhood. Rounds needed = the length of
the longest h-decreasing path, O(log n / log log n) w.h.p. for random
priorities and small in practice on web-shaped graphs.

The result is the SAME coloring a sequential greedy pass in h-order
would produce (each vertex decides only after every smaller-h neighbour
has decided), so the color count obeys the greedy bound Δ+1 and the
run is engine-replayable — the DuckDB oracle unrolls the identical
rounds and reaches the identical colors.

Scale shape (same contract as the other plans/):
- the symmetric edge table is hash-partitioned by ``src`` ONCE and
  persisted; each round is one SHJ join to find ready vertices (min
  uncolored-neighbour hash, map-side partial min) + one SHJ gather of
  neighbour colors;
- the smallest-absent-color pick is pure codegen: collect_set of
  neighbour colors (bounded by degree), then the first gap in
  sequence(0, size) via array_except — no UDF, no explode;
- per-round state (id, color NULL until decided) commits through
  CheckpointManager (parquet + per-partition lineage + metrics) and
  resumes mid-coloring; the remaining-uncolored count folds into the
  commit's single lineage scan — fixpoint detection costs no extra job.

Like MIS, ids must fit in 31 bits so the hash product stays in BIGINT
under ANSI arithmetic (dictionary-encoded ids always do).
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager
from metis_spark.plans.mis import _h


def _h_round(col, k: int):
    """Round-salted injective priority: (v·2654435761 + k·40503) mod 2³².
    Affine with an odd multiplier — bijective in v for every fixed round
    k (no ties), different vertex ORDER every round. Deterministic, so
    the DuckDB twin replays it."""
    return (
        F.col(col) * F.lit(2654435761) + F.lit(k * 40503)
    ) % F.lit(4294967296)


def greedy_coloring(
    edges: DataFrame,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
    retain: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → (coloring(id, color), info{iterations, converged,
    n_colors, seconds, n}). Undirected view (symmetrized, self-loops
    dropped); adjacent vertices always get different colors.

    Rounds = the longest h-decreasing path, which GROWS with graph
    density (measured >100 on the densified sf0.1 graph even thinned) —
    the price of exact sequential-greedy parity. The O(log n)-round
    scale path is ``speculative_coloring`` below (trial-and-revoke);
    this operator remains the parity/oracle mode."""
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_color_")

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

    cm = CheckpointManager(checkpoint_dir, "coloring", retain=retain)
    state = verts.select("id", F.lit(None).cast("long").alias("color"))
    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, meta = cm.load(spark, k0)
            state = st.select("id", "color")
            start_iter = k0
            if int(meta.get("uncolored", 1)) == 0:
                n_colors = state.agg(
                    (F.max("color") + 1).alias("c")
                ).collect()[0]["c"]
                e.unpersist()
                return state, {
                    "iterations": k0,
                    "converged": True,
                    "n_colors": int(n_colors),
                    "seconds": 0.0,
                    "n": state.count(),
                    "resumed": True,
                }

    t0 = time.monotonic()
    converged = False
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        pending = state.where(F.col("color").isNull()).select("id")
        # min hash among UNCOLORED neighbours (map-side partial min)
        nm = (
            e.join(pending.hint("shuffle_hash"), e["src"] == pending["id"])
            .select(F.col("dst").alias("id"), _h("src").alias("nh"))
            .groupBy("id")
            .agg(F.min("nh").alias("minh"))
        )
        ready = (
            pending.join(nm.hint("shuffle_hash"), "id", "left")
            .where(F.col("minh").isNull() | (_h("id") < F.col("minh")))
            .select("id")
        )
        # colors already taken in each ready vertex's neighbourhood
        taken = (
            e.join(
                ready.select(F.col("id").alias("dst")).hint("shuffle_hash"), "dst"
            )
            .join(
                state.where(F.col("color").isNotNull())
                .select(F.col("id").alias("src"), "color")
                .hint("shuffle_hash"),
                "src",
            )
            .groupBy("dst")
            .agg(F.collect_set("color").alias("used"))
        )
        # smallest non-negative integer absent from `used`: the first
        # element of [0..|used|] \ used (always non-empty by pigeonhole)
        picked = (
            ready.join(taken.withColumnRenamed("dst", "id").hint("shuffle_hash"),
                       "id", "left")
            .select(
                "id",
                F.when(F.col("used").isNull(), F.lit(0).cast("long"))
                .otherwise(
                    F.array_min(
                        F.array_except(
                            F.sequence(
                                F.lit(0).cast("long"),
                                F.size("used").cast("long"),
                            ),
                            F.col("used"),
                        )
                    )
                )
                .alias("new_color"),
            )
        )
        nxt = state.join(picked.hint("shuffle_hash"), "id", "left").select(
            "id", F.coalesce("color", "new_color").alias("color")
        )
        aggs = {"uncolored": F.sum(F.col("color").isNull().cast("long"))}
        durable = checkpoint_every <= 1 or k % checkpoint_every == 0 or k == max_iter
        st, totals = cm.step(k, nxt, {}, extra_aggs=aggs, durable=durable)
        uncolored = int(totals["uncolored"] or 0)
        converged = uncolored == 0
        if converged and not durable:
            st, totals = cm.commit(k, st, {}, extra_aggs=aggs)
            durable = True
        if durable:
            cm.update_meta(k, {"converged": converged, "uncolored": uncolored})
        cm.append_metrics(
            {"iter": k, "delta": float(uncolored),
             "seconds": time.monotonic() - it_t0, "rows": int(totals["rows"]),
             "committed": durable}
        )
        state = st.select("id", "color")
        if converged:
            break

    if converged:
        n_colors = int(
            state.agg((F.max("color") + 1).alias("c")).collect()[0]["c"]
        )
    else:
        n_colors = -1
    n = state.count()
    e.unpersist()
    return state, {
        "iterations": k,
        "converged": converged,
        "n_colors": n_colors,
        "seconds": time.monotonic() - t0,
        "n": n,
    }


def speculative_coloring(
    edges: DataFrame,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
    retain: int | None = None,
) -> tuple[DataFrame, dict]:
    """Trial-and-revoke (Δ+1) coloring — the O(log n)-round scale path.

    Johansson's randomized scheme, made engine-replayable with the
    round-salted hash: each round every uncolored vertex SPECULATES a
    color from its currently-available palette,

        avail(v)     = [0 .. deg(v)] minus colored-neighbour colors
        candidate(v) = avail[ h_k(v) mod |avail| ]   (h_k injective/round)

    and KEEPS it unless an uncolored neighbour speculated the SAME color
    with a smaller h_k (exactly one side of every conflicting edge
    revokes). Adjacent keepers always differ (equal candidates conflict,
    different candidates are fine), and per-vertex colors never exceed
    deg(v), so the Δ+1 greedy bound holds. Every uncolored vertex
    succeeds with constant probability per round under the hash's
    uniformity (collision chance with each neighbour ≈ 1/|avail|), so
    rounds are O(log n) on ANY density — unlike Jones–Plassmann, whose
    rounds track the longest priority-decreasing path and blow up on
    dense graphs (measured: JP >100 rounds on the sf0.1 graph where this
    scheme needs O(10)).

    Plan per round: one colored-neighbour gather (map-side
    collect_set), one palette pick in pure codegen (sequence /
    array_except / element_at — no UDF), one same-color conflict
    equi-join on the edge table. State commits/resumes through
    CheckpointManager like every other plan; the uncolored count rides
    the commit's lineage scan.
    """
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_speccolor_")

    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    e = und.repartition(num_partitions, "src").persist()
    deg = (
        e.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .persist()
    )

    cm = CheckpointManager(checkpoint_dir, "speccolor", retain=retain)
    state = deg.select("id", F.lit(None).cast("long").alias("color"))
    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, meta = cm.load(spark, k0)
            state = st.select("id", "color")
            start_iter = k0
            if int(meta.get("uncolored", 1)) == 0:
                n_colors = state.agg((F.max("color") + 1).alias("c")).collect()[0]["c"]
                n = state.count()
                e.unpersist(); deg.unpersist()
                return state, {
                    "iterations": k0, "converged": True, "n_colors": int(n_colors),
                    "seconds": 0.0, "n": n, "resumed": True,
                }

    t0 = time.monotonic()
    converged = False
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        pending = state.where(F.col("color").isNull()).select("id")
        # colors taken in each pending vertex's neighbourhood
        used = (
            e.join(pending.select(F.col("id").alias("dst")).hint("shuffle_hash"), "dst")
            .join(
                state.where(F.col("color").isNotNull())
                .select(F.col("id").alias("src"), "color").hint("shuffle_hash"),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sort_array(F.collect_set("color")).alias("used"))
        )
        # speculate: avail = [0..deg] \ used (sorted), pick h_k mod |avail|
        cand = (
            pending.join(used.hint("shuffle_hash"), "id", "left")
            .join(deg.hint("shuffle_hash"), "id")
            .select(
                "id",
                F.sort_array(
                    F.array_except(
                        F.sequence(F.lit(0).cast("long"), F.col("deg")),
                        F.coalesce("used", F.array().cast("array<long>")),
                    )
                ).alias("avail"),
                _h_round("id", k).alias("hk"),
            )
            .select(
                "id",
                "hk",
                F.element_at(
                    "avail", (F.col("hk") % F.size("avail") + 1).cast("int")
                ).alias("cand"),
            )
        )
        # revoke the larger-h side of every same-candidate edge
        ca = cand.select(F.col("id").alias("src"), F.col("cand").alias("c_s"),
                         F.col("hk").alias("h_s"))
        cb = cand.select(F.col("id").alias("dst"), F.col("cand").alias("c_d"),
                         F.col("hk").alias("h_d"))
        blocked = (
            e.join(ca.hint("shuffle_hash"), "src")
            .join(cb.hint("shuffle_hash"), "dst")
            .where((F.col("c_s") == F.col("c_d")) & (F.col("h_s") < F.col("h_d")))
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        winners = cand.join(blocked, "id", "left_anti").select("id", F.col("cand"))
        nxt = state.join(winners.hint("shuffle_hash"), "id", "left").select(
            "id", F.coalesce("color", "cand").alias("color")
        )
        aggs = {"uncolored": F.sum(F.col("color").isNull().cast("long"))}
        durable = checkpoint_every <= 1 or k % checkpoint_every == 0 or k == max_iter
        st, totals = cm.step(k, nxt, {}, extra_aggs=aggs, durable=durable)
        uncolored = int(totals["uncolored"] or 0)
        converged = uncolored == 0
        if converged and not durable:
            st, totals = cm.commit(k, st, {}, extra_aggs=aggs)
            durable = True
        if durable:
            cm.update_meta(k, {"converged": converged, "uncolored": uncolored})
        cm.append_metrics(
            {"iter": k, "delta": float(uncolored),
             "seconds": time.monotonic() - it_t0, "rows": int(totals["rows"]),
             "committed": durable}
        )
        state = st.select("id", "color")
        if converged:
            break

    n_colors = (
        int(state.agg((F.max("color") + 1).alias("c")).collect()[0]["c"])
        if converged else -1
    )
    n = state.count()
    e.unpersist(); deg.unpersist()
    return state, {
        "iterations": k, "converged": converged, "n_colors": n_colors,
        "seconds": time.monotonic() - t0, "n": n,
    }
