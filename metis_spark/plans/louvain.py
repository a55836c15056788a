"""Louvain-style local moving (synchronous, deterministic) as iterative
DataFrame joins on the shared checkpoint spine.

One round of Blondel et al.'s phase-1 local moving, evaluated
SYNCHRONOUSLY for every vertex (the standard distributed adaptation —
sequential vertex-at-a-time scans don't exist on a cluster):

    candidates(v) = { labels of v's neighbours } ∪ { label(v) }
    gain(v→c)    = k_{v,c}/m − deg(v)·tot'_c/(2m²)
                   (modularity gain of placing v in c after removing it
                    from its own community: tot'_c = Σ_{u∈c} deg(u),
                    minus deg(v) when c is v's current label)
    label'(v)    = argmax_c ( ROUND(gain, 9) DESC, c ASC )

The ROUND(·, 9) before ranking is the repo's float-tie discipline:
gains are O(1e-3) rationals of integer counts, cross-engine ulp noise
is ≤1e-15, so rounding at 1e-9 makes the argmax deterministic and
bit-reproducible in DuckDB — every move is engine-replayable.

Synchronous moving can oscillate on adversarial symmetric graphs (two
adjacent singletons swapping forever); the operator therefore runs a
FIXED number of rounds (the phase-1 sweep budget — Louvain
implementations cap this anyway) and reports the modularity trajectory
so callers see whether moves stopped improving. Aggregation/coarsening
(phase 2) composes on top: group by the returned label and feed the
quotient multigraph back in.

Scale shape (same contract as the other plans/):
- the symmetric edge table is hash-partitioned by ``src`` ONCE and
  persisted; per round: one groupBy for community degree totals, one
  SHJ edge⋈label join + (src, c) groupBy for k_{v,c} (map-side partial
  count absorbs hubs), one window over each vertex's ≤deg(v) candidate
  rows — no all-pairs, no collect;
- per-round state (id, label) commits through CheckpointManager
  (parquet + per-partition lineage + metrics) and resumes
  mid-algorithm; the moved-vertex count folds into the commit's single
  lineage scan (``extra_aggs``).
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager


def louvain_local_moving(
    edges: DataFrame,
    rounds: int = 2,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
    retain: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → (labels(id, label), info{iterations, moved,
    seconds, n, m}). Undirected view (symmetrized, self-loops dropped);
    labels start as vertex ids; exactly ``rounds`` synchronous sweeps.

    ``checkpoint_every=k`` / ``retain``: the shared durability dial
    (plans/checkpoint.py:step) — durable commit every k-th sweep and
    always on the final sweep; resume lands on the last COMMITTED sweep;
    labels are identical for every setting."""
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_louvain_")

    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    e = und.repartition(num_partitions, "src").persist()
    deg = (
        e.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    two_m = e.count()  # und holds both directions: 2m rows
    m = two_m / 2.0
    n = deg.count()

    cm = CheckpointManager(checkpoint_dir, "louvain", retain=retain)
    labels = deg.select("id", F.col("id").alias("label"))
    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, _ = cm.load(spark, k0)
            labels = st.select("id", "label")
            start_iter = k0

    t0 = time.monotonic()
    moved = -1
    k = start_iter
    for k in range(start_iter + 1, rounds + 1):
        it_t0 = time.monotonic()
        # community degree totals on current labels
        tot = (
            labels.join(deg.hint("shuffle_hash"), "id")
            .groupBy("label")
            .agg(F.sum("deg").alias("tot"))
        )
        # k_{v,c}: edges from v into community c (map-side partial count)
        kvc = (
            e.join(
                labels.select(F.col("id").alias("dst"), F.col("label").alias("c"))
                .hint("shuffle_hash"),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), "c")
            .agg(F.count(F.lit(1)).alias("kvc"))
        )
        # candidate set: neighbour communities ∪ own (kvc=0 when absent)
        own = labels.select("id", F.col("label").alias("c"), F.lit(0).cast("long").alias("kvc"))
        cand = (
            kvc.unionByName(own)
            .groupBy("id", "c")
            .agg(F.max("kvc").alias("kvc"))
        )
        scored = (
            cand.join(labels.hint("shuffle_hash"), "id")
            .join(deg.hint("shuffle_hash"), "id")
            .join(
                tot.withColumnRenamed("label", "c").hint("shuffle_hash"), "c"
            )
            .select(
                "id",
                "c",
                "label",
                F.round(
                    F.col("kvc") / F.lit(m)
                    - (
                        F.col("deg")
                        * (
                            F.col("tot")
                            - F.when(F.col("c") == F.col("label"), F.col("deg"))
                            .otherwise(F.lit(0))
                        )
                    )
                    / F.lit(2.0 * m * m),
                    9,
                ).alias("g9"),
            )
        )
        w = Window.partitionBy("id").orderBy(F.desc("g9"), F.asc("c"))
        nxt = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("id", F.col("c").alias("label"), F.col("label").alias("old"))
        )
        aggs = {"moved": F.sum((F.col("label") != F.col("old")).cast("long"))}
        durable = checkpoint_every <= 1 or k % checkpoint_every == 0 or k == rounds
        st, totals = cm.step(k, nxt, {}, extra_aggs=aggs, durable=durable)
        moved = int(totals["moved"] or 0)
        if durable:
            cm.update_meta(k, {"moved": moved})
        cm.append_metrics(
            {"iter": k, "delta": float(moved),
             "seconds": time.monotonic() - it_t0, "rows": int(totals["rows"]),
             "committed": durable}
        )
        labels = st.select("id", "label")

    out = labels
    e.unpersist()
    deg.unpersist()
    return out, {
        "iterations": k,
        "moved": moved,
        "seconds": time.monotonic() - t0,
        "n": n,
        "m": m,
    }


def _weighted_moving_rounds(
    spark,
    e_w: DataFrame,
    strength: DataFrame,
    m: float,
    rounds: int,
    cm: CheckpointManager,
    start_iter: int,
    labels: DataFrame,
    level: int,
    checkpoint_every: int = 1,
):
    """Shared synchronous local-moving loop on a WEIGHTED inter-community
    edge table e_w(src, dst, w) with per-vertex strength s (includes
    2·self-loop weight). Level-1 unweighted moving is the w≡1, s≡deg
    special case; level-2 runs it on the quotient multigraph. Same gain
    formula with k_{v,c} = Σw and deg → s:

        gain(v→c) = Σw_{v,c}/m − s_v·(tot'_c)/(2m²),  ROUND(·,9) argmax
    """
    moved = -1
    k = start_iter
    for k in range(start_iter + 1, start_iter + rounds + 1):
        it_t0 = time.monotonic()
        tot = (
            labels.join(strength.hint("shuffle_hash"), "id")
            .groupBy("label")
            .agg(F.sum("s").alias("tot"))
        )
        kvc = (
            e_w.join(
                labels.select(F.col("id").alias("dst"), F.col("label").alias("c"))
                .hint("shuffle_hash"),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), "c")
            .agg(F.sum("w").alias("kvc"))
        )
        own = labels.select(
            "id", F.col("label").alias("c"), F.lit(0).cast("long").alias("kvc")
        )
        cand = kvc.unionByName(own).groupBy("id", "c").agg(F.max("kvc").alias("kvc"))
        scored = (
            cand.join(labels.hint("shuffle_hash"), "id")
            .join(strength.hint("shuffle_hash"), "id")
            .join(tot.withColumnRenamed("label", "c").hint("shuffle_hash"), "c")
            .select(
                "id",
                "c",
                "label",
                F.round(
                    F.col("kvc") / F.lit(m)
                    - (
                        F.col("s")
                        * (
                            F.col("tot")
                            - F.when(F.col("c") == F.col("label"), F.col("s"))
                            .otherwise(F.lit(0))
                        )
                    )
                    / F.lit(2.0 * m * m),
                    9,
                ).alias("g9"),
            )
        )
        w = Window.partitionBy("id").orderBy(F.desc("g9"), F.asc("c"))
        nxt = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("id", F.col("c").alias("label"), F.col("label").alias("old"))
        )
        aggs = {"moved": F.sum((F.col("label") != F.col("old")).cast("long"))}
        # the level's FINAL sweep is always durable: louvain_multilevel's
        # resume (and its level1_labels handle) reloads that exact iteration
        durable = (
            checkpoint_every <= 1
            or k % checkpoint_every == 0
            or k == start_iter + rounds
        )
        st, totals = cm.step(k, nxt, {}, extra_aggs=aggs, durable=durable)
        moved = int(totals["moved"] or 0)
        if durable:
            cm.update_meta(k, {"moved": moved, "level": level})
        cm.append_metrics(
            {"iter": k, "delta": float(moved),
             "seconds": time.monotonic() - it_t0, "rows": int(totals["rows"]),
             "committed": durable}
        )
        labels = st.select("id", "label")
    return labels, moved


def louvain_multilevel(
    edges: DataFrame,
    rounds: int = 2,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, dict]:
    """Two-level Louvain: phase-1 local moving, phase-2 COARSENING into
    the quotient multigraph (communities → supernodes, inter-community
    edge weights summed, intra-community mass → self-loop strength),
    then a second weighted local-moving pass on the quotient — the
    actual Blondel et al. pipeline, not just its first sweep.

    Returns (labels(id, label), info): ``label`` is the LEVEL-2
    community of each ORIGINAL vertex (one mapping join at the end).

    Scale shape: the quotient graph is built with one groupBy over the
    label-joined edge table (map-side partials — inter-community edge
    multiplicities collapse before the exchange) and is strictly smaller
    than the input, so level 2 costs less than another level-1 round.
    Weights stay INTEGER (und-row counts), so the gain discipline
    (ROUND 1e-9, min-label ties) remains engine-replayable and the whole
    two-level pipeline has a bit-exact DuckDB twin. All rounds commit
    (state + lineage + metrics) with a ``level`` tag; resume re-enters
    mid-level (the quotient rebuild is deterministic from the last
    committed level-1 state).
    """
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_louvain_ml_")
    cm = CheckpointManager(checkpoint_dir, "louvain_ml")

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

    t0 = time.monotonic()
    start_iter = 0
    l1 = deg.select("id", F.col("id").alias("label"))
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            start_iter = k0
            if k0 > rounds:  # mid-level-2: reload level-1 final too
                st1, _ = cm.load(spark, rounds)
                l1 = st1.select("id", "label")
            else:
                st, _ = cm.load(spark, k0)
                l1 = st.select("id", "label")

    # ---- level 1: unweighted moving (w ≡ 1 rows of und, s ≡ deg) -----
    if start_iter < rounds:
        e_w1 = e.withColumn("w", F.lit(1).cast("long"))
        l1, _ = _weighted_moving_rounds(
            spark, e_w1, deg, m, rounds - start_iter, cm, start_iter, l1, level=1,
            checkpoint_every=checkpoint_every,
        )
    # l1 is parquet-backed by its last commit — no persist needed for the
    # two label joins below (and nothing leaks past the lazy return)

    # ---- coarsen: quotient multigraph in und-row space ----------------
    qe = (
        e.join(l1.select(F.col("id").alias("src"), F.col("label").alias("ls"))
               .hint("shuffle_hash"), "src")
        .join(l1.select(F.col("id").alias("dst"), F.col("label").alias("ld"))
              .hint("shuffle_hash"), "dst")
        .groupBy(F.col("ls").alias("src"), F.col("ld").alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .persist()
    )
    # strength = Σ all incident und rows (intra rows ARE 2·w_self)
    qstr = (
        qe.groupBy(F.col("src").alias("id"))
        .agg(F.sum("w").alias("s"))
        .persist()
    )
    qeo = qe.where(F.col("src") != F.col("dst"))

    # ---- level 2: weighted moving on the quotient ---------------------
    l2_start = max(start_iter - rounds, 0)
    l2 = qstr.select("id", F.col("id").alias("label"))
    if resume and start_iter > rounds:
        st, _ = cm.load(spark, start_iter)
        l2 = st.select("id", "label")
    l2, moved = _weighted_moving_rounds(
        spark, qeo, qstr, m, rounds - l2_start, cm, rounds + l2_start, l2, level=2,
        checkpoint_every=checkpoint_every,
    )

    out = l1.join(
        l2.select(F.col("id").alias("label"), F.col("label").alias("label2")),
        "label",
    ).select("id", F.col("label2").alias("label"))

    n_comm1 = qstr.count()
    e.unpersist(); deg.unpersist(); qe.unpersist(); qstr.unpersist()
    return out, {
        "iterations": 2 * rounds,
        "moved": moved,
        "seconds": time.monotonic() - t0,
        "n": n,
        "m": m,
        "level1_communities": n_comm1,
        # parquet-backed by its last commit — free to expose; lets callers
        # (e.g. the modularity-trajectory query) score intermediate levels
        # without re-running the level-1 sweeps
        "level1_labels": l1,
    }
