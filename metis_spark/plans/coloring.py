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


def greedy_coloring(
    edges: DataFrame,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → (coloring(id, color), info{iterations, converged,
    n_colors, seconds, n}). Undirected view (symmetrized, self-loops
    dropped); adjacent vertices always get different colors."""
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

    cm = CheckpointManager(checkpoint_dir, "coloring")
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
        st, totals = cm.commit(
            k,
            nxt,
            {},
            extra_aggs={
                "uncolored": F.sum(F.col("color").isNull().cast("long")),
            },
        )
        uncolored = int(totals["uncolored"] or 0)
        converged = uncolored == 0
        cm.update_meta(k, {"converged": converged, "uncolored": uncolored})
        cm.append_metrics(
            {"iter": k, "delta": float(uncolored),
             "seconds": time.monotonic() - it_t0, "rows": int(totals["rows"])}
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
