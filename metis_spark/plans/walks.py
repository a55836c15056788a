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


def node2vec_walks(
    edges: DataFrame,
    starts: DataFrame,
    length: int = 8,
    p: int = 3,
    q: int = 2,
    num_partitions: int | None = None,
    directed: bool = True,
) -> DataFrame:
    """Second-order (node2vec-style) biased walks → (walk_id, step, v).

    node2vec (Grover & Leskovec, KDD 2016) biases the next hop by where
    the candidate u sits relative to the PREVIOUS vertex `prev`:
    return (u = prev) weighted 1/p, common-neighbor (u ∈ Γ(prev))
    weighted 1, outward weighted 1/q. The deterministic analog keeps the
    arithmetic-hash arg-min of random_walks and folds the bias into an
    INTEGER key multiplier — next hop = arg-min over out-neighbors u of

        h(w, t, u) · mult(u),   mult = p | 1 | q  (return | common | out)

    so smaller multipliers win more often in exact inverse proportion on
    average, and the whole walk stays engine-replayable with pure 64-bit
    integer arithmetic (the DuckDB oracle reproduces it bit-exactly; no
    float sampling keys, no transcendental functions). Step 1 has no
    `prev` yet and falls back to the unbiased first-order rule.

    Scale shape: identical to random_walks (frontier O(#walks), edge
    table partitioned by src once) plus ONE extra persisted table — the
    out-adjacency CSR rows (operators/csr.py's sorted collect_list
    shape), partitioned by src so the per-step membership lookup
    Γ(prev) ∋ u joins without re-shuffling the adjacency side; only the
    O(#walks) frontier moves, carrying one adjacency array per walk row.
    """
    if p < 1 or q < 1:
        raise ValueError("p and q must be positive integers (key multipliers)")
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)

    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    if not directed:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.repartition(num_partitions, "src").persist()
    e.count()
    # sorted out-adjacency rows (CSR shape, cf. operators/csr.py) for the
    # Γ(prev) membership test — partitioned by src like e, built once
    adj = (
        e.groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
        .repartition(num_partitions, "src")
        .persist()
    )
    adj.count()

    frontier = starts.select(
        F.col("id").cast("long").alias("walk_id"),
        F.col("id").cast("long").alias("v"),
        F.lit(None).cast("long").alias("prev"),
    ).persist()
    steps = [frontier.select("walk_id", "v").withColumn("step", F.lit(0).cast("long"))]
    live = [frontier]
    for t in range(1, length + 1):
        # attach Γ(prev) to each walk row (left: step 1 has prev = null)
        fr = frontier.join(
            adj.select(F.col("src").alias("prev"), F.col("nbrs").alias("nbrs_prev")),
            "prev",
            "left",
        )
        h = (
            F.col("walk_id") * _M1 + F.lit(t).cast("long") * _M2 + F.col("dst") * _M3
        ) % _MOD
        mult = (
            F.when(F.col("prev").isNull(), F.lit(1))
            .when(F.col("dst") == F.col("prev"), F.lit(p))
            .when(F.array_contains(F.col("nbrs_prev"), F.col("dst")), F.lit(1))
            .otherwise(F.lit(q))
        ).cast("long")
        nxt = (
            e.join(fr.hint("shuffle_hash"), e["src"] == fr["v"])
            .select("walk_id", "v", "dst", (h * mult).alias("key"))
            .groupBy("walk_id")
            .agg(F.min(F.struct("key", "dst", "v")).alias("m"))
            .select(
                "walk_id",
                F.col("m.dst").alias("v"),
                F.col("m.v").alias("prev"),
            )
            .persist()
        )
        nxt.count()  # materialize: keeps lineage one step deep
        steps.append(nxt.select("walk_id", "v").withColumn("step", F.lit(t).cast("long")))
        frontier = nxt
        live.append(nxt)

    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    out = out.select("walk_id", "step", "v").persist()
    out.count()  # materialize BEFORE dropping the per-step caches
    e.unpersist()
    adj.unpersist()
    for f in live:
        f.unpersist()
    return out  # caller owns out.unpersist()
