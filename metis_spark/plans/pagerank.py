"""PageRank: power iteration as iterative DataFrame join+agg (north_rule).

Per iteration (damping d, N vertices, dangling mass dm):

    rank'(v) = (1-d)/N + d * Σ_{u→v} rank(u)/outdeg(u) + d * dm / N

Implementation notes (scale-first):

- the edge side is pre-joined once with outdegree weights and
  hash-partitioned by ``src`` + persisted, so every iteration's
  rank⋈edge join reuses one side's partitioning;
- dangling mass needs no anti-join per iteration: with Σrank = 1,
  Σ over the raw update (1-d)/N + d·contrib is exactly 1 - d·dm, so the
  uniform dangling term is the deficit (1 - Σraw)/N added as a constant —
  one scalar agg over the (already checkpointed) state instead of a
  second join;
- in-degree hubs are absorbed by partial (map-side) aggregation in the
  groupBy(dst) sum; out-degree hubs skew the src join — handled by AQE
  skew-join by default, or explicitly with ``salt=S`` which splits each
  hot src's edges across S sub-keys (salt = hash(dst) % S) and replicates
  the rank row S ways (explode) — the north_rule's "explicit salting of
  hub vertices";
- every iteration commits (state, per-partition lineage, metrics) through
  CheckpointManager and is resumable mid-algorithm: state schema is
  (id, rank_raw, old_rank) with the deficit constant in meta.json, so a
  resumed run reconstructs rank = rank_raw + c exactly.

Convergence: L1 delta = Σ|rank'(v) - rank(v)| < tol (default 1e-9).
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

    start_iter = 0
    c_prev = 0.0
    t0 = time.monotonic()
    ranks = vertices.select("id", (F.lit(1.0) / n).alias("rank"))
    if resume:
        k = cm.latest()
        if k is not None:
            state, meta = cm.load(spark, k)
            # derive the dangling constant from the data itself — meta's copy
            # may predate update_meta if the previous run died mid-iteration
            total_raw = state.agg(F.sum("rank_raw")).collect()[0][0]
            c_prev = (1.0 - total_raw) / n
            ranks = state.select("id", (F.col("rank_raw") + F.lit(c_prev)).alias("rank"))
            start_iter = k
            if meta.get("converged"):
                return ranks, {
                    "iterations": k, "delta": meta["delta"], "seconds": 0.0,
                    "converged": True, "n": n, "resumed": True,
                }

    delta = float("inf")
    k = start_iter
    converged = False
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
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
                (F.lit((1.0 - d) / n) + F.lit(d) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank_raw"),
                F.col("rank").alias("old_rank"),
            )
        )
        # one write + one agg job: lineage scan also folds Σ rank_raw
        state, totals = cm.commit(
            k, new_state, {"converged": False}, extra_aggs={"sum_raw": F.sum("rank_raw")}
        )
        c = (1.0 - float(totals["sum_raw"])) / n  # uniform dangling redistribution
        delta = state.agg(
            F.sum(F.abs(F.col("rank_raw") + F.lit(c) - F.col("old_rank")))
        ).collect()[0][0]
        converged = delta < tol
        # patch the commit marker with the real constant/delta (data is on disk)
        cm.update_meta(k, {"extra_c": c, "delta": delta, "converged": converged})
        cm.append_metrics(
            {
                "iter": k,
                "delta": float(delta),
                "seconds": time.monotonic() - it_t0,
                "rows": n,
                "c": c,
            }
        )
        ranks = state.select("id", (F.col("rank_raw") + F.lit(c)).alias("rank"))
        c_prev = c
        if converged:
            break

    ew.unpersist()
    vertices.unpersist()
    return ranks, {
        "iterations": k,
        "delta": float(delta),
        "seconds": time.monotonic() - t0,
        "converged": converged,
        "n": n,
    }
