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
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → (labels(id, label), info{iterations, moved,
    seconds, n, m}). Undirected view (symmetrized, self-loops dropped);
    labels start as vertex ids; exactly ``rounds`` synchronous sweeps."""
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

    cm = CheckpointManager(checkpoint_dir, "louvain")
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
        st, totals = cm.commit(
            k,
            nxt,
            {},
            extra_aggs={
                "moved": F.sum((F.col("label") != F.col("old")).cast("long"))
            },
        )
        moved = int(totals["moved"] or 0)
        cm.update_meta(k, {"moved": moved})
        cm.append_metrics(
            {"iter": k, "delta": float(moved),
             "seconds": time.monotonic() - it_t0, "rows": int(totals["rows"])}
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
