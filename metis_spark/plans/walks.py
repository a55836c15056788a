"""Deterministic random-walk sampling over the edge table.

Walk corpora are the classic graph-to-training-data bridge (DeepWalk /
node2vec feed walks to a skip-gram model), so a link-graph engine that
produces LLM training data needs a walk sampler. The reference has no
analog (its data model is flat streams); this is a from-scratch Spark
design on the same join spine as plans/sssp.py.

Determinism: the next hop from vertex v at step t of walk w is the
out-neighbor u minimizing

    h(w, t, u) = (w*1000003 + t*10007 + u*31337) mod 1000000007

with ties broken by smallest u. The mix is plain 64-bit arithmetic, so
any engine (here: the DuckDB oracle) reproduces the exact walks —
pseudo-random per (walk, step) yet seedable and replayable, which is
what a training-data pipeline wants from its samplers.

Scale shape: the frontier is O(#walks) rows regardless of |E|; each
step is one shuffle-hash join against the edge table (partitioned by
src ONCE and persisted, never re-sorted) plus a map-side-combinable
min aggregation per walk. Horizon is a short fixed constant (walk
length), so no checkpoint spine is needed — recompute-from-start is
cheaper than per-step commit. Walks that reach a sink vertex (no
out-neighbors) terminate; their rows simply stop at that step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M1, _M2, _M3, _MOD = 1000003, 10007, 31337, 1000000007


def random_walks(
    edges: DataFrame,
    starts: DataFrame,
    length: int = 8,
    num_partitions: int | None = None,
    directed: bool = True,
) -> DataFrame:
    """edges(src, dst) + starts(id) → (walk_id, step, v).

    One walk per start vertex, walk_id = the start id, step 0..length.
    """
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)

    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    if not directed:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.repartition(num_partitions, "src").persist()
    e.count()

    frontier = starts.select(
        F.col("id").cast("long").alias("walk_id"), F.col("id").cast("long").alias("v")
    ).persist()
    steps = [frontier.withColumn("step", F.lit(0).cast("long"))]
    live = [frontier]
    for t in range(1, length + 1):
        h = (
            F.col("walk_id") * _M1 + F.lit(t).cast("long") * _M2 + F.col("dst") * _M3
        ) % _MOD
        nxt = (
            e.join(frontier.hint("shuffle_hash"), e["src"] == frontier["v"])
            .select("walk_id", "dst", h.alias("h"))
            .groupBy("walk_id")
            .agg(F.min(F.struct("h", "dst")).alias("m"))
            .select("walk_id", F.col("m.dst").alias("v"))
            .persist()
        )
        nxt.count()  # materialize so the loop's lineage stays one step deep
        steps.append(nxt.withColumn("step", F.lit(t).cast("long")))
        frontier = nxt
        live.append(nxt)

    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    out = out.select("walk_id", "step", "v").persist()
    out.count()  # materialize BEFORE releasing the per-step caches below,
    # else evaluating the result would recompute the whole chain uncached
    e.unpersist()
    for f in live:
        f.unpersist()
    return out  # caller owns out.unpersist()


def walk_sentences(walks: DataFrame) -> DataFrame:
    """(walk_id, step, v) → (walk_id, length, sentence).

    Renders each walk as the space-joined vertex-id string a skip-gram
    trainer (word2vec over DeepWalk corpora) consumes. One shuffle on
    walk_id; sentences are bounded by walk length, so collect_list per
    group is O(length), never a skew risk.
    """
    return (
        walks.groupBy("walk_id")
        .agg(
            F.count(F.lit(1)).alias("length"),
            F.array_sort(F.collect_list(F.struct("step", "v"))).alias("path"),
        )
        .select(
            "walk_id",
            "length",
            F.concat_ws(
                " ", F.transform(F.col("path"), lambda s: s["v"].cast("string"))
            ).alias("sentence"),
        )
    )
