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

from pyspark.sql import DataFrame, Window
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


def butterfly_summary(
    edges: DataFrame,
    u_col: str = "u",
    v_col: str = "v",
) -> DataFrame:
    """Exact butterfly (2x2-biclique) census of a bipartite graph → one
    summary row (n_left, n_right, n_edges, n_wedges, n_butterflies,
    n_caterpillars, bipartite_cc).

    The butterfly is the bipartite analog of the triangle (a two-mode
    graph has none): its density is THE two-mode cohesion/spam signal
    (Sanei-Mehri et al., "Butterfly Counting in Bipartite Networks",
    KDD'18), and the Robins-Alexander bipartite clustering coefficient
    cc = 4·B / #caterpillars (caterpillar = 3-path) is the closed-ratio
    analog of transitivity.

    Plan (all-integer, three shuffles):
    - wedges through the right side: one self-join of (v, u) on v with
      u1 < u2 — the standard per-side wedge generation; per-pair common
      count c → butterflies Σ C(c,2) via a map-side-combined groupBy.
      Work is Σ_v C(d(v),2): at web scale pick the lower-Σd² side as
      wedge centers (here the part side, whose degrees are testdata-
      bounded); the count is EXACT, so there is no hub cap — a skewed
      center fans out through AQE skew-split, not silent truncation.
    - caterpillars are a closed form over the degree tables:
      P3 = Σ_edges (d(u)−1)(d(v)−1) — zero enumeration (the ESCAPE
      discipline of graphlet4_census).
    - cc = ROUND(4B/P3, 6) is the only float, one division at the end.

    Reference parity: no bipartite motif operator in /root/reference
    (Metis has no graph surface); extends §2.10's motif family
    (triangles, 4/5-cliques, graphlet census) to two-mode graphs.
    """
    be = (
        edges.select(
            F.col(u_col).cast("long").alias("u"), F.col(v_col).cast("long").alias("v")
        )
        .distinct()
        .persist()
    )
    degu = be.groupBy("u").agg(F.count(F.lit(1)).alias("du"))
    degv = be.groupBy("v").agg(F.count(F.lit(1)).alias("dv"))

    left = be.select("v", F.col("u").alias("u1"))
    right = be.select("v", F.col("u").alias("u2"))
    pairs = (
        left.join(right, "v")
        .where(F.col("u1") < F.col("u2"))
        .groupBy("u1", "u2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bfly = pairs.agg(
        F.coalesce(
            F.sum((F.col("c") * (F.col("c") - 1) / 2).cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("b")
    )
    wedge = degv.agg(
        F.coalesce(
            F.sum((F.col("dv") * (F.col("dv") - 1) / 2).cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("w")
    )
    cat = (
        be.join(degu.hint("shuffle_hash"), "u")
        .join(degv.hint("shuffle_hash"), "v")
        .agg(
            F.coalesce(
                F.sum(((F.col("du") - 1) * (F.col("dv") - 1)).cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("p3")
        )
    )
    counts = be.agg(
        F.countDistinct("u").alias("n_left"),
        F.countDistinct("v").alias("n_right"),
        F.count(F.lit(1)).alias("n_edges"),
    )
    out = (
        counts.crossJoin(F.broadcast(wedge))
        .crossJoin(F.broadcast(bfly))
        .crossJoin(F.broadcast(cat))
        .select(
            "n_left",
            "n_right",
            "n_edges",
            F.col("w").cast("long").alias("n_wedges"),
            F.col("b").cast("long").alias("n_butterflies"),
            F.col("p3").cast("long").alias("n_caterpillars"),
            F.when(
                F.col("p3") > 0,
                F.round(
                    4.0 * F.col("b").cast("double") / F.col("p3").cast("double"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("bipartite_cc"),
        )
    )
    rows = out.collect()
    be.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame(
        rows,
        "n_left long, n_right long, n_edges long, n_wedges long, "
        "n_butterflies long, n_caterpillars long, bipartite_cc double",
    )


def k_wing(
    edges: DataFrame,
    k: int,
    u_col: str = "u",
    v_col: str = "v",
    max_rounds: int = 12,
) -> tuple[DataFrame, dict]:
    """k-wing (k-bitruss) filter of a bipartite graph → (surviving
    (u, v, support) edges, info): the maximal sub-bigraph where every
    edge is contained in ≥ k butterflies (Sarıyüce & Pinar, "Peeling
    bipartite networks for dense subgraph discovery", WSDM'18) — the
    bipartite analog of k-truss (edge peel by butterfly support instead
    of triangle support), one cohesion level past the degree-based
    (α,β)-core: a drive-by edge between two otherwise-dense vertices
    survives the ab_core but carries no butterflies and peels here.

    Per round (all-integer, the ktruss peel pattern):
    - wedges through the right side: self-join of (v, u) on v, u1 < u2;
    - per-pair common count c — then every wedge (u1, u2, v) donates
      (c − 1) butterflies to BOTH its edges (fix partner u2: choosing
      the second right vertex among the remaining c − 1 commons), so
      per-edge support is one explode + map-side-combined groupBy, never
      a per-butterfly enumeration;
    - edges keep support ≥ k; repeat — each removal can demote others.

    Lineage truncates per round (localCheckpoint); the loop stops at the
    exact fixpoint (stable edge count) and asserts rounds ≤ max_rounds
    so the fixed-unroll SQL twin replays it. The returned support is the
    fixpoint subgraph's own (≥ k by construction).

    Reference parity: no bipartite operators in /root/reference; extends
    the §2.10 cohesion family (ktruss/trussness → two-mode).
    """
    cur = edges.select(
        F.col(u_col).cast("long").alias("u"), F.col(v_col).cast("long").alias("v")
    ).distinct().localCheckpoint()
    n_prev = cur.count()

    def _support(be: DataFrame) -> DataFrame:
        l1 = be.select("v", F.col("u").alias("u1"))
        l2 = be.select("v", F.col("u").alias("u2"))
        w = l1.join(l2, "v").where(F.col("u1") < F.col("u2"))
        pc = w.groupBy("u1", "u2").agg(F.count(F.lit(1)).alias("c"))
        ww = w.join(pc.hint("shuffle_hash"), ["u1", "u2"]).where(F.col("c") > 1)
        contrib = ww.select(
            F.col("u1").alias("u"), "v", (F.col("c") - 1).alias("s")
        ).unionByName(
            ww.select(F.col("u2").alias("u"), "v", (F.col("c") - 1).alias("s"))
        )
        sup = contrib.groupBy("u", "v").agg(
            F.sum("s").cast("long").alias("support")
        )
        return be.join(sup, ["u", "v"], "left").select(
            "u", "v", F.coalesce("support", F.lit(0)).alias("support")
        )

    rounds = 0
    converged = n_prev == 0
    while not converged and rounds < max_rounds:
        rounds += 1
        nxt = (
            _support(cur)
            .where(F.col("support") >= k)
            .select("u", "v")
            .localCheckpoint()
        )
        n = nxt.count()
        cur = nxt
        if n == n_prev:
            converged = True
        n_prev = n
    return _support(cur), {
        "rounds": rounds,
        "converged": converged,
        "edges": n_prev,
    }


def butterfly_per_vertex_topk(
    edges: DataFrame,
    k: int = 50,
    u_col: str = "u",
    v_col: str = "v",
) -> DataFrame:
    """Per-LEFT-vertex butterfly counts → top-k (u, butterflies, rn):
    b(u) = # butterflies containing u — the tip-decomposition support
    (Sarıyüce & Pinar WSDM'18 peel vertices by exactly this count) and
    the two-mode hub/spam ranking signal (an order that co-buys the same
    part pairs as many other orders tops the list).

    From the same per-pair wedge counts as ``butterfly_summary``: a left
    pair (u1, u2) with c common right vertices carries C(c, 2)
    butterflies, each containing BOTH u1 and u2 — so b(u) is one explode
    of the pair table + a map-side-combined groupBy; no per-butterfly
    enumeration ever happens. Ranking is all-integer (count desc, u).
    """
    be = edges.select(
        F.col(u_col).cast("long").alias("u"), F.col(v_col).cast("long").alias("v")
    ).distinct()
    l1 = be.select("v", F.col("u").alias("u1"))
    l2 = be.select("v", F.col("u").alias("u2"))
    pairs = (
        l1.join(l2, "v")
        .where(F.col("u1") < F.col("u2"))
        .groupBy("u1", "u2")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .withColumn("b", (F.col("c") * (F.col("c") - 1) / 2).cast("long"))
    )
    per_v = (
        pairs.select(F.col("u1").alias("u"), "b")
        .unionByName(pairs.select(F.col("u2").alias("u"), "b"))
        .groupBy("u")
        .agg(F.sum("b").cast("long").alias("butterflies"))
    )
    order = [F.desc("butterflies"), F.asc("u")]
    top = per_v.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rn", F.row_number().over(w).cast("long"))
