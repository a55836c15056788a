"""Leiden-style community detection: Louvain local moving + a
REFINEMENT phase (Traag, Waltman, van Eck, "From Louvain to Leiden:
guaranteeing well-connected communities", Sci. Rep. 2019) + coarsening
and a constrained second level, all on the shared checkpoint spine.

Why refinement exists: Louvain's local moving can leave a community
DISCONNECTED — a bridge vertex moves away and strands the two halves it
connected (Traag et al. fig. 2). Leiden repairs this between moving and
coarsening: inside each phase-1 community, restart from singletons and
re-merge bottom-up, so every refined community is internally connected
by construction; coarsening then aggregates the refined partition while
the phase-1 communities seed the next level's initial labels.

Deterministic synchronous adaptation (the repo's engine-replayable
discipline — the original uses randomized sequential merges):

  per refinement round, a vertex may move only if it is a SINGLETON in
  the refined partition; its candidates are the refined communities of
  its neighbours INSIDE its own phase-1 community with the standard
  modularity gain, ROUND(gain, 9) > 0 required, argmax ties to the
  smallest label. A proposal v→c is ACCEPTED iff the target community c
  is not itself a moving singleton — or the move is MUTUAL (v and c
  target each other) and v > c, in which case the larger id moves and
  the smaller stays. Non-singletons never move.

Connectivity proof sketch (pinned by pytest): communities only ever
grow; every accepted join attaches the mover by ≥1 edge (gain > 0 needs
k_{v,c} ≥ 1) to a community none of whose members departs that round
(departing singletons are never valid targets; the mutual rule keeps
the smaller endpoint in place). Induction from singletons ⇒ every
refined community induces a connected subgraph.

Level 2 then runs the existing weighted local moving on the
refined-partition quotient, INITIALIZED with the phase-1 community of
each quotient node (the Leiden aggregation rule — phase-1 communities
constrain the starting point instead of being thrown away).

Scale shape: refinement adds, per round, one intra-community edge join
+ k_{v,c} groupBy (map-side combined), one size/strength groupBy pair,
one per-vertex argmax window over ≤deg(v) candidate rows, and one
self-join of the (small) proposal set — same partitioning and cost
class as a Louvain sweep; no all-pairs, no driver collect. State
commits through CheckpointManager with the shared durability dial.

Reference parity: /root/reference/Metis has no graph operators; this
extends the Louvain family (plans/louvain.py) the reference-independent
§2.10 surface documents.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager
from metis_spark.plans.louvain import _weighted_moving_rounds


def leiden_communities(
    edges: DataFrame,
    rounds: int = 2,
    refine_rounds: int = 2,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → (labels(id, label), info{iterations, moved, n, m,
    refined_communities, seconds, refined_labels}). ``label`` is the
    level-2 community of each ORIGINAL vertex; ``refined_labels`` (a
    parquet-backed handle in info) is the post-refinement partition whose
    communities are guaranteed connected.

    Iteration numbering on the checkpoint spine: level-1 sweeps are
    1..rounds, refinement rounds are rounds+1..rounds+refine_rounds,
    level-2 sweeps follow. Resume re-enters mid-phase from the last
    committed iteration (each phase's final round always commits)."""
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_leiden_")
    cm = CheckpointManager(checkpoint_dir, "leiden")

    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    e = und.repartition(num_partitions, "src").persist()
    deg = (
        e.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("s"))
        .persist()
    )
    two_m = e.count()
    m = two_m / 2.0
    n = deg.count()

    r1_end = rounds
    rf_end = rounds + refine_rounds

    t0 = time.monotonic()
    start_iter = 0
    l1 = deg.select("id", F.col("id").alias("label"))
    rl = None
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            start_iter = k0
            if k0 <= r1_end:  # mid level 1
                st, _ = cm.load(spark, k0)
                l1 = st.select("id", "label")
            else:
                st1, _ = cm.load(spark, r1_end)
                l1 = st1.select("id", "label")
                if k0 <= rf_end:  # mid refinement
                    st, _ = cm.load(spark, k0)
                    rl = st.select("id", "rl")
                else:
                    strf, _ = cm.load(spark, rf_end)
                    rl = strf.select("id", "rl")

    # ---- level 1: unweighted local moving (shared Louvain loop) -------
    if start_iter < r1_end:
        e_w1 = e.withColumn("w", F.lit(1).cast("long"))
        l1, _ = _weighted_moving_rounds(
            spark, e_w1, deg, m, r1_end - start_iter, cm, start_iter, l1,
            level=1, checkpoint_every=checkpoint_every,
        )

    # ---- refinement: singleton re-merge INSIDE phase-1 communities ----
    # intra-community edge view (both endpoints share a phase-1 label)
    ec = (
        e.join(l1.select(F.col("id").alias("src"), F.col("label").alias("cs"))
               .hint("shuffle_hash"), "src")
        .join(l1.select(F.col("id").alias("dst"), F.col("label").alias("cd"))
              .hint("shuffle_hash"), "dst")
        .where(F.col("cs") == F.col("cd"))
        .select("src", "dst")
        .persist()
    )
    if rl is None:
        rl = deg.select("id", F.col("id").alias("rl"))
    rf_start = max(start_iter, r1_end)
    for k in range(rf_start + 1, rf_end + 1):
        it_t0 = time.monotonic()
        sz = rl.groupBy("rl").agg(F.count(F.lit(1)).alias("nn"))
        rtot = (
            rl.join(deg.hint("shuffle_hash"), "id")
            .groupBy("rl")
            .agg(F.sum("s").alias("tot"))
        )
        rkvc = (
            ec.join(
                rl.select(F.col("id").alias("dst"), F.col("rl").alias("c"))
                .hint("shuffle_hash"),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), "c")
            .agg(F.count(F.lit(1)).cast("long").alias("kvc"))
        )
        scored = (
            rkvc.join(rl.hint("shuffle_hash"), "id")
            .where(F.col("c") != F.col("rl"))
            .join(sz.hint("shuffle_hash"), "rl")
            .where(F.col("nn") == 1)  # only singletons propose
            .join(deg.hint("shuffle_hash"), "id")
            .join(rtot.withColumnRenamed("rl", "c").hint("shuffle_hash"), "c")
            .select(
                "id",
                "c",
                F.round(
                    F.col("kvc") / F.lit(m)
                    - (F.col("s") * F.col("tot")) / F.lit(2.0 * m * m),
                    9,
                ).alias("g9"),
            )
            .where(F.col("g9") > 0)
        )
        w = Window.partitionBy("id").orderBy(F.desc("g9"), F.asc("c"))
        prop = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("id", "c")
        )
        # accept v→c iff c is not a moving singleton, or the move is
        # mutual and v is the larger endpoint (the smaller stays put)
        p, q = prop.alias("p"), prop.alias("q")
        acc = (
            p.join(q, F.col("p.c") == F.col("q.id"), "left")
            .where(
                F.col("q.id").isNull()
                | ((F.col("q.c") == F.col("p.id")) & (F.col("p.id") > F.col("q.id")))
            )
            .select(F.col("p.id").alias("id"), F.col("p.c").alias("newl"))
        )
        nxt = (
            rl.join(acc.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.coalesce("newl", F.col("rl")).alias("rl"),
                (F.col("newl").isNotNull()).cast("long").alias("mv"),
            )
        )
        aggs = {"moved": F.sum("mv")}
        durable = (
            checkpoint_every <= 1 or k % checkpoint_every == 0 or k == rf_end
        )
        st, totals = cm.step(
            k, nxt.select("id", "rl", "mv"), {}, extra_aggs=aggs, durable=durable
        )
        if durable:
            cm.update_meta(k, {"moved": int(totals["moved"] or 0), "phase": "refine"})
        cm.append_metrics(
            {"iter": k, "delta": float(totals["moved"] or 0),
             "seconds": time.monotonic() - it_t0, "rows": int(totals["rows"]),
             "committed": durable}
        )
        rl = st.select("id", "rl")

    # ---- coarsen on the REFINED partition ------------------------------
    qe = (
        e.join(rl.select(F.col("id").alias("src"), F.col("rl").alias("rs"))
               .hint("shuffle_hash"), "src")
        .join(rl.select(F.col("id").alias("dst"), F.col("rl").alias("rd"))
              .hint("shuffle_hash"), "dst")
        .groupBy(F.col("rs").alias("src"), F.col("rd").alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .persist()
    )
    qstr = qe.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("s")).persist()
    qeo = qe.where(F.col("src") != F.col("dst"))

    # ---- level 2: weighted moving, INITIALIZED with phase-1 labels ----
    # (each refined community's label is its founder vertex id, so one
    # join against l1 recovers its phase-1 community — the Leiden
    # aggregation rule)
    l2_start = max(start_iter - rf_end, 0)
    if resume and start_iter > rf_end:
        st, _ = cm.load(spark, start_iter)
        l2 = st.select("id", "label")
    else:
        l2 = qstr.select("id").join(l1.hint("shuffle_hash"), "id").select("id", "label")
    l2, moved = _weighted_moving_rounds(
        spark, qeo, qstr, m, rounds - l2_start, cm, rf_end + l2_start, l2,
        level=2, checkpoint_every=checkpoint_every,
    )

    out = rl.join(
        l2.select(F.col("id").alias("rl"), F.col("label").alias("label2")),
        "rl",
    ).select("id", F.col("label2").alias("label"))

    n_refined = qstr.count()
    e.unpersist(); deg.unpersist(); ec.unpersist(); qe.unpersist(); qstr.unpersist()
    return out, {
        "iterations": rf_end + rounds,
        "moved": moved,
        "seconds": time.monotonic() - t0,
        "n": n,
        "m": m,
        "refined_communities": n_refined,
        # parquet-backed by the refinement's final commit: the partition
        # whose communities are connected by construction
        "refined_labels": rl,
    }
