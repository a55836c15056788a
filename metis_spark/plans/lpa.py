"""Synchronous label propagation with pinned deterministic tie-break.

Semantics (pinned so tests are exact — FIXTURES.md G5/G6):

- undirected message passing: each vertex receives every neighbor's
  current label, PLUS its own current label (own-label inclusion avoids
  the classic 2-node synchronous oscillation);
- new label = most frequent label in that multiset; ties broken by the
  SMALLEST label (the same determinism discipline the reference teaches
  via its dual part-index conventions, SURVEY.md §7);
- synchronous rounds: all vertices update from the same snapshot.

Plan shape per round: edges⋈labels (message gather) → groupBy(id,label)
count (partial agg absorbs hub fan-in) → per-id argmax via max_by on the
orderable (count, -label) pair — one wide shuffle per round, no window
sort. Rounds are checkpointed/resumable like the other algorithms.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager


def label_propagation(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 10,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    stop_when_stable: bool = True,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) [+ vertices(id)] → (labels(id, label), info)."""
    spark = edges.sparkSession
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_lpa_")
    cm = CheckpointManager(checkpoint_dir, "lpa")

    from metis_spark.plans.sizing import auto_partitions

    num_partitions = auto_partitions(edges)
    # hash-partition the (static) undirected edge list by src once; every
    # round's gather join then reuses it exchange-free, and the SHJ hint
    # keeps the big edge side from being re-sorted each round
    und = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .unionByName(
            edges.select(F.col("dst").cast("long").alias("src"), F.col("src").cast("long").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(num_partitions, "src")
        .persist()
    )
    if vertices is None:
        vertices = und.select(F.col("src").alias("id")).distinct()
    vertices = vertices.select(F.col("id").cast("long")).persist()

    labels = vertices.select("id", F.col("id").alias("label"))
    start_iter = 0
    if resume:
        k = cm.latest()
        if k is not None:
            state, meta = cm.load(spark, k)
            labels = state.select("id", "label")
            start_iter = k
            if meta.get("converged"):
                und.unpersist()
                return labels, {"iterations": k, "converged": True, "seconds": 0.0, "resumed": True}

    t0 = time.monotonic()
    converged = False
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        incoming = und.join(labels.hint("shuffle_hash"), und["src"] == labels["id"]).select(
            F.col("dst").alias("id"), "label"
        )
        candidates = incoming.unionByName(labels.select("id", "label"))
        counts = candidates.groupBy("id", "label").agg(F.count(F.lit(1)).alias("cnt"))
        # argmax by (cnt desc, label asc): max_by over struct(cnt, -label)
        new_labels = counts.groupBy("id").agg(
            F.max_by("label", F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("label")
        )
        # carry the previous label through the shuffle so the change count
        # folds into the commit's single lineage/agg pass (no extra join)
        with_old = new_labels.join(
            labels.withColumnRenamed("label", "old_label").hint("shuffle_hash"), "id"
        )
        state_full, totals = cm.commit(
            k,
            with_old,
            {},
            extra_aggs={
                "changed": F.sum((F.col("label") != F.col("old_label")).cast("long"))
            },
        )
        state = state_full.select("id", "label")
        changed = int(totals["changed"] or 0)
        converged = changed == 0
        cm.update_meta(k, {"converged": converged, "changed": changed})
        cm.append_metrics(
            {"iter": k, "delta": float(changed), "seconds": time.monotonic() - it_t0,
             "rows": int(totals["rows"])}
        )
        labels = state
        if stop_when_stable and converged:
            break

    und.unpersist()
    vertices.unpersist()
    return labels, {"iterations": k, "converged": converged, "seconds": time.monotonic() - t0}


def seeded_label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    max_iter: int = 10,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    stop_when_stable: bool = True,
) -> tuple[DataFrame, dict]:
    """Semi-supervised LPA: ``seeds(id, label)`` hold FIXED ground-truth
    labels; every other vertex starts unlabeled (NULL) and adopts the
    most frequent NON-NULL label among its neighbours plus its own
    current label (same own-label inclusion + smallest-label tie-break
    as the unsupervised variant, so rounds are engine-replayable).
    Unreached vertices stay NULL — honest "no information yet", never a
    made-up label.

    The label-spreading workhorse for "propagate the known licenses /
    owners / topics across the dependency graph". Plan shape per round
    is identical to label_propagation (the NULL filter prunes the gather
    before the exchange); seeds are re-pinned with one coalesce against
    the broadcast-size seed table, never rewritten.
    """
    spark = edges.sparkSession
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_slpa_")
    cm = CheckpointManager(checkpoint_dir, "seeded_lpa")

    from metis_spark.plans.sizing import auto_partitions

    num_partitions = auto_partitions(edges)
    und = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .unionByName(
            edges.select(F.col("dst").cast("long").alias("src"), F.col("src").cast("long").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(num_partitions, "src")
        .persist()
    )
    vertices = und.select(F.col("src").alias("id")).distinct().persist()
    seed_df = (
        seeds.select(F.col("id").cast("long"), F.col("label").cast("long").alias("slabel"))
        .persist()
    )

    labels = vertices.join(seed_df.hint("shuffle_hash"), "id", "left").select(
        "id", F.col("slabel").alias("label")
    )
    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            state, meta = cm.load(spark, k0)
            labels = state.select("id", "label")
            start_iter = k0
            if meta.get("converged"):
                und.unpersist(); vertices.unpersist(); seed_df.unpersist()
                return labels, {"iterations": k0, "converged": True,
                                "seconds": 0.0, "resumed": True}

    t0 = time.monotonic()
    converged = False
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        labeled = labels.where(F.col("label").isNotNull())
        incoming = und.join(
            labeled.hint("shuffle_hash"), und["src"] == labeled["id"]
        ).select(F.col("dst").alias("id"), "label")
        candidates = incoming.unionByName(labeled.select("id", "label"))
        counts = candidates.groupBy("id", "label").agg(F.count(F.lit(1)).alias("cnt"))
        new_labels = counts.groupBy("id").agg(
            F.max_by("label", F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("nl")
        )
        nxt = (
            labels.withColumnRenamed("label", "old_label")
            .join(new_labels.hint("shuffle_hash"), "id", "left")
            .join(seed_df.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                # seeds are immutable; others adopt the argmax, else keep
                F.coalesce("slabel", "nl", "old_label").alias("label"),
                "old_label",
            )
        )
        state_full, totals = cm.commit(
            k,
            nxt,
            {},
            extra_aggs={
                "changed": F.sum(
                    (
                        ~(
                            F.col("label").eqNullSafe(F.col("old_label"))
                        )
                    ).cast("long")
                )
            },
        )
        state = state_full.select("id", "label")
        changed = int(totals["changed"] or 0)
        converged = changed == 0
        cm.update_meta(k, {"converged": converged, "changed": changed})
        cm.append_metrics(
            {"iter": k, "delta": float(changed), "seconds": time.monotonic() - it_t0,
             "rows": int(totals["rows"])}
        )
        labels = state
        if stop_when_stable and converged:
            break

    und.unpersist(); vertices.unpersist(); seed_df.unpersist()
    return labels, {"iterations": k, "converged": converged,
                    "seconds": time.monotonic() - t0}
