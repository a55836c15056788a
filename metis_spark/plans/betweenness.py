"""Approximate betweenness centrality: Brandes restricted to a sampled
source set, as level-synchronous DataFrame joins.

Brandes (2001) computes betweenness from per-source shortest-path DAGs:

  forward:  BFS levels d(s,v) and path counts σ(s,v) = Σ_{u∈pred(v)} σ(s,u)
  backward: dependencies δ(s,v) = Σ_{w: v∈pred(w)} σ(s,v)/σ(s,w) · (1+δ(s,w)),
            accumulated from the deepest level upward
  bc(v)    = Σ_s δ(s,v)   (exact when s ranges over all vertices;
            restricting to a uniform sample S gives the standard unbiased
            estimator after scaling by n/|S| — the raw sum over the fixed
            landmark set is returned so results stay deterministic and
            engine-comparable, like harmonic/closeness_landmarks)

Distributed shape (extends the landmark BFS of plans/sssp.py with path
counts — state keyed (id, source), so |S| multiplies every shuffle; keep
|S| at 16-64 landmarks at 10^12-file scale):

- the edge table is hash-partitioned by src once for the forward gathers
  and by dst once for the backward gathers (the two join directions),
  both persisted — per level, only O(frontier·|S|) rows move;
- forward is frontier-based: each level joins ONLY the newly-discovered
  rows against the edge table (σ of a vertex is complete the first level
  it is reached, because all its predecessors sit exactly one level up),
  then anti-joins the accumulated state to keep first discoveries;
- backward walks levels deepest→1; each level is one edge⋈level join,
  one predecessor equi-join (dist pinned to level-1) and one sum;
- every level materializes via eager localCheckpoint (lineage stays one
  level deep). The horizon is the source eccentricity — a small constant
  on web-shaped graphs — so recompute-from-start beats a durable commit
  per level (same reasoning as plans/walks.py); the expensive durable
  artifact, if wanted, is the forward state, which callers can persist
  via landmark machinery instead.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _forward_sigma(spark, e_src: DataFrame, sources: list[int], max_depth: int):
    """Shared Brandes forward pass → (state(id, source, dist, sigma), depth)."""
    seeds = spark.createDataFrame(
        [(int(s), int(s), 0, 1.0) for s in sources],
        "id long, source long, dist long, sigma double",
    )
    state = seeds.localCheckpoint(eager=True)
    frontier = state
    depth = 0
    for t in range(1, max_depth + 1):
        msgs = (
            e_src.join(frontier.hint("shuffle_hash"), e_src["src"] == frontier["id"])
            .groupBy(F.col("dst").alias("nid"), "source")
            .agg(F.sum("sigma").alias("sigma"))
        )
        new = (
            msgs.join(
                state.select(F.col("id").alias("nid"), "source"),
                ["nid", "source"],
                "left_anti",
            )
            .select(
                F.col("nid").alias("id"),
                "source",
                F.lit(t).cast("long").alias("dist"),
                "sigma",
            )
            .localCheckpoint(eager=True)
        )
        if new.isEmpty():
            break
        depth = t
        state = state.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    return state, depth


def _edge_tables(edges: DataFrame, directed: bool, num_partitions: int):
    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    if not directed:
        e0 = e0.unionByName(
            e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e_src = e0.repartition(num_partitions, "src").persist()
    e_dst = e0.repartition(num_partitions, "dst").persist()
    e_src.count()
    return e_src, e_dst


def betweenness_approx(
    edges: DataFrame,
    sources: list[int],
    max_depth: int = 32,
    num_partitions: int | None = None,
    directed: bool = True,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) + sources → ((id, betweenness), info{depth, ...}).

    Exact Brandes restricted to ``sources`` (directed shortest paths).
    Output has one row per vertex reached from ≥1 source, including 0.0
    scores; betweenness = Σ_s δ(s, id) over source-pair rows with id≠s.
    """
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)

    t0 = time.monotonic()
    e_src, e_dst = _edge_tables(edges, directed, num_partitions)
    state, depth = _forward_sigma(spark, e_src, sources, max_depth)

    # backward: deepest level first; delta starts at 0 everywhere
    deltas = state.withColumn("delta", F.lit(0.0)).localCheckpoint(eager=True)
    for t in range(depth, 0, -1):
        w = deltas.where(F.col("dist") == t).select(
            F.col("id").alias("wid"),
            "source",
            F.col("sigma").alias("sigma_w"),
            F.col("delta").alias("delta_w"),
        )
        msgs = e_dst.join(w.hint("shuffle_hash"), e_dst["dst"] == w["wid"]).select(
            F.col("src").alias("pid"), "source", "sigma_w", "delta_w"
        )
        contrib = (
            msgs.join(
                deltas.where(F.col("dist") == t - 1)
                .select(F.col("id").alias("pid"), "source", F.col("sigma").alias("sigma_v"))
                .hint("shuffle_hash"),
                ["pid", "source"],
            )
            .groupBy(F.col("pid").alias("id"), "source")
            .agg(
                F.sum(
                    F.col("sigma_v") / F.col("sigma_w") * (F.lit(1.0) + F.col("delta_w"))
                ).alias("c")
            )
        )
        deltas = (
            deltas.join(contrib.hint("shuffle_hash"), ["id", "source"], "left")
            .withColumn("delta", F.col("delta") + F.coalesce("c", F.lit(0.0)))
            .drop("c")
            .localCheckpoint(eager=True)
        )

    bc = (
        deltas.where(F.col("id") != F.col("source"))
        .groupBy("id")
        .agg(F.round(F.sum("delta"), 6).alias("betweenness"))
    )
    e_src.unpersist()
    e_dst.unpersist()
    return bc, {
        "depth": depth,
        "n_sources": len(sources),
        "seconds": time.monotonic() - t0,
    }


def edge_betweenness_approx(
    edges: DataFrame,
    sources: list[int],
    max_depth: int = 32,
    num_partitions: int | None = None,
    directed: bool = True,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) + sources → ((src, dst, betweenness), info).

    Edge betweenness restricted to ``sources`` — the Girvan–Newman edge
    score. In Brandes' backward recursion the per-edge dependency is the
    summand BEFORE the predecessor groupBy: for each shortest-path-DAG
    edge (v, w) with dist(w) = dist(v)+1,
    ebc(v,w) = Σ_s σ(s,v)/σ(s,w) · (1+δ(s,w)). Each DAG edge contributes
    at exactly one level per source (dist(w) is fixed given s), so the
    union of per-level contributions grouped by (src, dst) is exact.
    Only DAG edges (reached, level-adjacent for ≥1 source) appear in the
    output; scores are the raw sums over the fixed source set, rounded
    at 6 — deterministic and engine-comparable, like the vertex variant.

    Shares the forward σ/level pass and both persisted edge partitions
    with betweenness_approx; the backward adds one projected column
    (the successor id kept through the dependency join) and one extra
    map-side-combined groupBy over the same joined rows.
    """
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)

    t0 = time.monotonic()
    e_src, e_dst = _edge_tables(edges, directed, num_partitions)
    state, depth = _forward_sigma(spark, e_src, sources, max_depth)

    deltas = state.withColumn("delta", F.lit(0.0)).localCheckpoint(eager=True)
    edge_parts: list[DataFrame] = []
    for t in range(depth, 0, -1):
        w = deltas.where(F.col("dist") == t).select(
            F.col("id").alias("wid"),
            "source",
            F.col("sigma").alias("sigma_w"),
            F.col("delta").alias("delta_w"),
        )
        msgs = e_dst.join(w.hint("shuffle_hash"), e_dst["dst"] == w["wid"]).select(
            F.col("src").alias("pid"), "wid", "source", "sigma_w", "delta_w"
        )
        joined = msgs.join(
            deltas.where(F.col("dist") == t - 1)
            .select(F.col("id").alias("pid"), "source", F.col("sigma").alias("sigma_v"))
            .hint("shuffle_hash"),
            ["pid", "source"],
        ).withColumn(
            "c", F.col("sigma_v") / F.col("sigma_w") * (F.lit(1.0) + F.col("delta_w"))
        )
        edge_parts.append(
            joined.select(
                F.col("pid").alias("src"), F.col("wid").alias("dst"), "source", "c"
            ).localCheckpoint(eager=True)
        )
        contrib = joined.groupBy(F.col("pid").alias("id"), "source").agg(
            F.sum("c").alias("c")
        )
        deltas = (
            deltas.join(contrib.hint("shuffle_hash"), ["id", "source"], "left")
            .withColumn("delta", F.col("delta") + F.coalesce("c", F.lit(0.0)))
            .drop("c")
            .localCheckpoint(eager=True)
        )

    if edge_parts:
        acc = edge_parts[0]
        for p in edge_parts[1:]:
            acc = acc.unionByName(p)
        ebc = acc.groupBy("src", "dst").agg(F.round(F.sum("c"), 6).alias("betweenness"))
    else:
        ebc = spark.createDataFrame([], "src long, dst long, betweenness double")
    e_src.unpersist()
    e_dst.unpersist()
    return ebc, {
        "depth": depth,
        "n_sources": len(sources),
        "seconds": time.monotonic() - t0,
    }


def shortest_path_counts(
    edges: DataFrame,
    sources: list[int],
    max_depth: int = 32,
    num_partitions: int | None = None,
    directed: bool = True,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) + sources → ((id, source, dist, n_paths), info).

    Shortest-path multiplicities: σ(s, v) = the number of distinct
    geodesics s→v, straight from the shared Brandes forward pass (σ of a
    vertex is complete the first level it is reached because every
    predecessor sits exactly one level up). The counts are exact
    integers carried in doubles (exact below 2^53); ``n_paths`` is the
    BIGINT cast. Uses: path-diversity / redundancy audits (an (s,v) pair
    with n_paths = 1 has a single point of failure on its geodesic),
    and the σ table IS the forward half of betweenness — exposed so
    users can materialize it once and reuse it.
    """
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    t0 = time.monotonic()
    e_src, e_dst = _edge_tables(edges, directed, num_partitions)
    state, depth = _forward_sigma(spark, e_src, sources, max_depth)
    out = state.select(
        "id", "source", "dist", F.col("sigma").cast("long").alias("n_paths")
    )
    e_src.unpersist()
    e_dst.unpersist()
    return out, {
        "depth": depth,
        "n_sources": len(sources),
        "seconds": time.monotonic() - t0,
    }
