"""PageRank: power iteration as iterative DataFrame join+agg (north_rule).

Per iteration (damping d, N vertices, dangling mass dm):

    rank'(v) = (1-d)/N + d * Σ_{u→v} rank(u)/outdeg(u) + d * dm / N

Implementation notes (scale-first — two Spark jobs per iteration):

- the edge side is pre-joined once with outdegree weights
  (w = 1/outdeg), hash-partitioned by ``src`` and persisted, so every
  iteration's rank⋈edge join reuses one side's partitioning; when the
  rank state is small AQE upgrades the join to broadcast automatically;
- dangling mass is tracked incrementally, not recomputed with a per-
  iteration anti-join: the state carries a static ``dangling`` flag and
  the checkpoint's single lineage scan also folds Σ rank over dangling
  vertices, so iteration k's uniform term c_k = d·dm_{k-1}/N is a
  driver-side constant known BEFORE the state build — the checkpoint
  therefore stores final ranks directly;
- the L1 convergence delta folds into the same scan (state carries
  old_rank), so each iteration is exactly: job A = join+agg+checkpoint
  write, job B = one pass over the written state computing per-partition
  lineage + delta + dangling mass + Σrank;
- in-degree hubs are absorbed by partial (map-side) aggregation in the
  groupBy(dst) sum; out-degree hubs skew the src join — handled by AQE
  skew-join by default, or explicitly with ``salt=S`` which splits each
  hot src's edges across S sub-keys (salt = hash(dst) % S) and
  replicates the rank row S ways — the north_rule's "explicit salting
  of hub vertices";
- every iteration commits (state, per-partition lineage, metrics)
  through CheckpointManager and resumes mid-algorithm from the last
  committed iteration.

Convergence: L1 delta = Σ|rank'(v) − rank(v)| < tol (default 1e-9).
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager


def _vertices_of(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    d: float = 0.85,
    tol: float = 1e-9,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    salt: int | None = None,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """Returns (ranks(id, rank), info{iterations, delta, seconds, converged}).

    ``vertices`` (id long) may include isolated vertices; defaults to edge
    endpoints. Ranks sum to 1 over all vertices.
    """
    spark = edges.sparkSession
    if vertices is None:
        vertices = _vertices_of(edges)
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_pr_")
    cm = CheckpointManager(checkpoint_dir, "pagerank")

    vertices = vertices.select(F.col("id").cast("long")).persist()
    n = vertices.count()
    if n == 0:
        return spark.createDataFrame([], "id long, rank double"), {
            "iterations": 0, "delta": 0.0, "seconds": 0.0, "converged": True, "n": 0,
        }

    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ew = (
        edges.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
    )
    if salt and salt > 1:
        ew = ew.withColumn("_salt", F.pmod(F.xxhash64("dst"), F.lit(salt)).cast("int"))
        ew = ew.repartition(num_partitions, "src", "_salt").persist()
    else:
        ew = ew.repartition(num_partitions, "src").persist()
    ew.count()  # materialize once; reused every iteration

    # state: (id, dangling, rank, old_rank); dangling is static per vertex
    state0 = (
        vertices.join(outdeg.select(F.col("src").alias("id")).distinct(), "id", "left_anti")
        .select("id", F.lit(True).alias("dangling"))
        .unionByName(
            vertices.join(outdeg.select(F.col("src").alias("id")).distinct(), "id", "left_semi")
            .select("id", F.lit(False).alias("dangling"))
        )
        .select("id", "dangling", F.lit(1.0 / n).alias("rank"))
    )

    start_iter = 0
    t0 = time.monotonic()
    ranks = state0
    dm_prev: float | None = None  # Σ rank over dangling vertices, from last commit
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            state, meta = cm.load(spark, k0)
            ranks = state.select("id", "dangling", "rank")
            dm_prev = meta.get("totals", {}).get("dm")
            start_iter = k0
            if meta.get("converged"):
                return ranks.select("id", "rank"), {
                    "iterations": k0, "delta": meta.get("delta"), "seconds": 0.0,
                    "converged": True, "n": n, "resumed": True,
                }
    if dm_prev is None:
        dm_prev = float(
            ranks.where(F.col("dangling")).agg(F.coalesce(F.sum("rank"), F.lit(0.0))).collect()[0][0]
        )

    delta = float("inf")
    k = start_iter
    converged = False
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        c_k = d * dm_prev / n
        if salt and salt > 1:
            r = ranks.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
            joined = ew.join(r, (ew["src"] == r["id"]) & (ew["_salt"] == r["_salt"]))
        else:
            joined = ew.join(ranks, ew["src"] == ranks["id"])
        contribs = joined.groupBy("dst").agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        new_state = (
            ranks.join(contribs, ranks["id"] == contribs["dst"], "left")
            .select(
                "id",
                "dangling",
                (
                    F.lit((1.0 - d) / n + c_k)
                    + F.lit(d) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
                F.col("rank").alias("old_rank"),
            )
        )
        state, totals = cm.commit(
            k,
            new_state,
            {"converged": False, "c": c_k},
            extra_aggs={
                "delta": F.sum(F.abs(F.col("rank") - F.col("old_rank"))),
                "dm": F.sum(F.when(F.col("dangling"), F.col("rank")).otherwise(F.lit(0.0))),
                "mass": F.sum("rank"),
            },
        )
        delta = float(totals["delta"])
        dm_prev = float(totals["dm"])
        converged = delta < tol
        cm.update_meta(k, {"converged": converged, "delta": delta})
        cm.append_metrics(
            {
                "iter": k,
                "delta": delta,
                "seconds": time.monotonic() - it_t0,
                "rows": n,
                "mass": float(totals["mass"]),
                "dm": dm_prev,
            }
        )
        ranks = state.select("id", "dangling", "rank")
        if converged:
            break

    ew.unpersist()
    vertices.unpersist()
    return ranks.select("id", "rank"), {
        "iterations": k,
        "delta": float(delta),
        "seconds": time.monotonic() - t0,
        "converged": converged,
        "n": n,
    }
