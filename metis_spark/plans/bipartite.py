"""Bipartiteness / odd-cycle check on the CC + BFS spines.

A graph (equivalently: each connected component) is bipartite iff it has
no odd cycle. The distributed test is the classic 2-coloring-by-BFS:

  1. connected components → every vertex's component root (= min id
     reachable, from plans/components.py);
  2. multi-source BFS from ALL roots at once: dist(v) = hops from v's
     own root (components are disjoint, so one min-folded dist field
     suffices — no per-source keying, unlike landmark_distances);
  3. an undirected edge whose endpoints have EQUAL dist parity lies
     inside a BFS level → odd cycle → that component is not bipartite.
     (In an undirected BFS an edge spans at most one level, so equal
     parity ⟺ same level.)

Scale shape (same contract as the other plans/):
- the symmetric edge table is hash-partitioned by src ONCE and
  persisted; each BFS round is one SHJ relax join + a min-fold groupBy
  with map-side partial min;
- per-round state (id, dist) commits through CheckpointManager
  (parquet + per-partition lineage + metrics) and resumes mid-BFS;
- the improved-row count folds into the commit's single lineage scan
  (``extra_aggs``) — fixpoint detection costs no extra job;
- the final parity audit is one edge⋈state join + one aggregation.

This is a graph-sanity gate the reference lacks (its data model is flat
streams); useful before any algorithm that assumes 2-colorability
(conflict-free scheduling, dependency layering).
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager
from metis_spark.plans.components import connected_components


def bipartite_check(
    edges: DataFrame,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → (per_component(component, n_vertices, n_odd_edges,
    is_bipartite), info{converged, bfs_iterations, ...}).

    ``n_odd_edges`` counts canonical (src<dst) undirected edges whose
    endpoints share dist parity; ``is_bipartite`` ⟺ that count is 0.
    Directed input is symmetrized; self-loops are dropped by the CC step
    (a self-loop is an odd cycle of length 1, but the canonical edge set
    excludes them — matching connected_components' graph view).
    """
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_bip_")

    t0 = time.monotonic()
    labels, cc_info = connected_components(
        edges, checkpoint_dir=checkpoint_dir + "/cc", resume=resume
    )
    labels = labels.persist()

    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    e = und.repartition(num_partitions, "src").persist()
    e.count()

    cm = CheckpointManager(checkpoint_dir, "bipartite_bfs")
    # seeds: every component root at dist 0 — a DataFrame, never collected
    dists = labels.select(F.col("component").alias("id")).distinct().select(
        "id", F.lit(0).cast("long").alias("dist")
    )
    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            state, meta = cm.load(spark, k0)
            dists = state.select("id", "dist")
            start_iter = k0

    converged = False
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        relaxed = e.join(dists.hint("shuffle_hash"), e["src"] == dists["id"]).select(
            F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist")
        )
        nxt = (
            dists.unionByName(relaxed)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )
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
                    (
                        F.col("old_dist").isNull()
                        | (F.col("dist") < F.col("old_dist"))
                    ).cast("long")
                )
            },
        )
        changed = int(totals["changed"] or 0)
        converged = changed == 0
        cm.update_meta(k, {"converged": converged, "changed": changed})
        cm.append_metrics(
            {"iter": k, "delta": float(changed),
             "seconds": time.monotonic() - it_t0, "rows": int(totals["rows"])}
        )
        dists = state.select("id", "dist")
        if converged:
            break

    # parity audit: canonical orientation so each undirected edge counts once
    du = dists.select(F.col("id").alias("src"), (F.col("dist") % 2).alias("p_src"))
    dv = dists.select(F.col("id").alias("dst"), (F.col("dist") % 2).alias("p_dst"))
    odd_edges = (
        e.where(F.col("src") < F.col("dst"))
        .join(du.hint("shuffle_hash"), "src")
        .join(dv.hint("shuffle_hash"), "dst")
        .where(F.col("p_src") == F.col("p_dst"))
        .select("src")
    )
    odd_by_comp = (
        odd_edges.join(
            labels.select(F.col("id").alias("src"), "component").hint("shuffle_hash"),
            "src",
        )
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_odd_edges"))
    )
    per_component = (
        labels.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
        .join(odd_by_comp, "component", "left")
        .select(
            "component",
            "n_vertices",
            F.coalesce("n_odd_edges", F.lit(0)).cast("long").alias("n_odd_edges"),
            (F.coalesce("n_odd_edges", F.lit(0)) == 0).alias("is_bipartite"),
        )
    )
    labels.unpersist()
    e.unpersist()
    return per_component, {
        "converged": converged and cc_info["converged"],
        "bfs_iterations": k,
        "cc_iterations": cc_info["iterations"],
        "seconds": time.monotonic() - t0,
    }


def ab_core(
    edges: DataFrame,
    alpha: int,
    beta: int,
    u_col: str = "u",
    v_col: str = "v",
    max_rounds: int = 8,
) -> tuple[DataFrame, dict]:
    """(α,β)-core of a bipartite graph → (surviving (u, v) edges, info):
    the maximal bi-subgraph where every left vertex keeps degree ≥ α and
    every right vertex degree ≥ β (Ahmed et al. / Liu et al.,
    "Efficient (α,β)-core computation in bipartite graphs", VLDBJ 2020)
    — the bipartite analog of k-core, the standard cohesion filter for
    user-item / order-part interaction curation (drop drive-by users AND
    barely-interacted items, iterating because each removal can demote
    the other side).

    Plan: alternate half-steps — a map-side-combined degree groupBy on
    the surviving edges, then one semi-join per side — the kcore peel
    spine with the two sides taking turns. Lineage is truncated every
    round (localCheckpoint); the loop stops at the exact fixpoint (edge
    count stable) and asserts rounds ≤ max_rounds so a fixed-unroll SQL
    twin can replay it. Rounds are O(peel depth), not O(n): each round
    either removes an edge or terminates.

    Reference parity: /root/reference/Metis has no bipartite-cohesion
    operator; this extends the §2.10 cohesion family (kcore, coreness,
    trussness, onion) to two-mode graphs.
    """
    cur = edges.select(
        F.col(u_col).cast("long").alias("u"), F.col(v_col).cast("long").alias("v")
    ).distinct().persist()
    n_prev = cur.count()
    rounds = 0
    converged = n_prev == 0
    while not converged and rounds < max_rounds:
        rounds += 1
        keep_u = (
            cur.groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= alpha)
            .select("u")
        )
        half = cur.join(keep_u.hint("shuffle_hash"), "u", "left_semi")
        keep_v = (
            half.groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= beta)
            .select("v")
        )
        nxt = half.join(keep_v.hint("shuffle_hash"), "v", "left_semi").localCheckpoint()
        n = nxt.count()
        cur.unpersist()
        cur = nxt
        if n == n_prev:
            converged = True
        n_prev = n
    return cur.select("u", "v"), {
        "rounds": rounds,
        "converged": converged,
        "edges": n_prev,
    }
