"""Single-source shortest hops (BFS) — bonus algorithm on the same spine.

Not mandated by the north rule, but a link-graph engine user expects it;
it reuses the exact machinery the mandated algorithms pin down: iterative
DataFrame join+agg with the edge side hash-partitioned once, shuffle-hash
joins (never re-sort the edge side), per-iteration checkpoint +
per-partition lineage through CheckpointManager, and mid-algorithm
resume.

State: (id, dist) with dist = hop count from the source set (long,
unreachable vertices absent until reached). Per round:

    relax = edges ⋈ frontier → (dst, dist+1)
    next  = min(old dist, relaxed dist) per vertex
    stop when no vertex improved (changed == 0)

Rounds are bounded by the graph diameter; each round is two Spark jobs
(commit write + lineage scan), exactly like PageRank.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager


def shortest_hops(
    edges: DataFrame,
    sources: list[int],
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    directed: bool = True,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) + source ids → (dists(id, dist), info). BFS hop counts."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_sssp_")
    cm = CheckpointManager(checkpoint_dir, "sssp")

    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    if not directed:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.repartition(num_partitions, "src").persist()
    e.count()

    dists = spark.createDataFrame([(int(s), 0) for s in sources], "id long, dist long")
    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            state, meta = cm.load(spark, k0)
            dists = state.select("id", "dist")
            start_iter = k0
            if meta.get("converged"):
                e.unpersist()
                return dists, {"iterations": k0, "converged": True, "seconds": 0.0, "resumed": True}

    t0 = time.monotonic()
    converged = False
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        relaxed = (
            e.join(dists.hint("shuffle_hash"), e["src"] == dists["id"])
            .select(F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist"))
        )
        nxt = (
            dists.unionByName(relaxed)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )
        # carry the previous dist through the commit so the improvement
        # count folds into the single lineage pass (null = newly reached)
        with_old = nxt.join(
            dists.select("id", F.col("dist").alias("old_dist")).hint("shuffle_hash"),
            "id",
            "left",
        )
        state, totals = cm.commit(
            k,
            with_old,
            {},
            extra_aggs={
                "changed": F.sum(
                    (F.col("old_dist").isNull() | (F.col("dist") < F.col("old_dist"))).cast("long")
                )
            },
        )
        changed = int(totals["changed"] or 0)
        converged = changed == 0
        cm.update_meta(k, {"converged": converged, "changed": changed})
        cm.append_metrics(
            {"iter": k, "delta": float(changed), "seconds": time.monotonic() - it_t0,
             "rows": int(totals["rows"])}
        )
        dists = state.select("id", "dist")
        if converged:
            break

    e.unpersist()
    return dists, {"iterations": k, "converged": converged, "seconds": time.monotonic() - t0}
