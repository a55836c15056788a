"""Single-source shortest paths (hop-count BFS and weighted Bellman-Ford)
— bonus algorithms on the same spine.

Not mandated by the north rule, but a link-graph engine user expects
them; they reuse the exact machinery the mandated algorithms pin down:
iterative DataFrame join+agg with the edge side hash-partitioned once,
shuffle-hash joins (never re-sort the edge side), per-iteration
checkpoint + per-partition lineage through CheckpointManager, and
mid-algorithm resume.

State: (id, dist) with dist = distance from the source set (long,
unreachable vertices absent until reached). Per round:

    relax = edges ⋈ state → (dst, dist + w)     (w ≡ 1 for hop BFS)
    next  = min(old dist, relaxed dist) per vertex
    stop when no vertex improved (changed == 0)

Relaxing the FULL state each round (not just the frontier) is the
Bellman-Ford shape: with weights, a vertex can improve again after it
was first reached, so hop-frontier pruning would be wrong. Rounds are
bounded by the longest shortest path's hop count (graph diameter for
w≡1); each round is two Spark jobs (commit write + lineage scan),
exactly like PageRank.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager


def shortest_paths(
    edges: DataFrame,
    sources: list[int],
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    directed: bool = True,
    weight_col: str | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst[,weight]) + source ids → (dists(id, dist), info).

    ``weight_col=None`` → hop counts (BFS); a long-typed column name →
    weighted shortest distances (Bellman-Ford relaxation; weights must be
    non-negative for the min-fold to converge to true distances).
    """
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_sssp_")
    cm = CheckpointManager(checkpoint_dir, "sssp")

    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"), w.alias("w"))
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("w"))
        )
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
            .select(F.col("dst").alias("id"), (F.col("dist") + F.col("w")).alias("dist"))
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


def shortest_hops(
    edges: DataFrame,
    sources: list[int],
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    directed: bool = True,
) -> tuple[DataFrame, dict]:
    """BFS hop counts — shortest_paths with unit weights (kept as the
    stable name the round-1 API shipped)."""
    return shortest_paths(
        edges, sources, max_iter=max_iter, checkpoint_dir=checkpoint_dir,
        resume=resume, num_partitions=num_partitions, directed=directed,
        weight_col=None,
    )


def landmark_distances(
    edges: DataFrame,
    sources: list[int],
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    directed: bool = True,
) -> tuple[DataFrame, dict]:
    """Per-source BFS from a landmark set → (dists(id, source, dist), info).

    Unlike shortest_paths (which min-folds the sources into ONE distance
    field), the state is keyed (id, source): each landmark's distance
    field propagates independently in the same relax join — the standard
    landmark/sketch construction behind approximate closeness/harmonic
    centrality and distance oracles. State size is O(|V|·|S|); keep the
    landmark set small (it multiplies every shuffle) — at 10^12 files
    you run 16-64 landmarks, not thousands.

    Same spine as shortest_paths: edge side partitioned once, SHJ relax
    join, per-round commit + lineage + mid-algorithm resume, fixpoint
    when no (id, source) pair improves.
    """
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_lmd_")
    cm = CheckpointManager(checkpoint_dir, "landmarks")

    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    if not directed:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.repartition(num_partitions, "src").persist()
    e.count()

    dists = spark.createDataFrame(
        [(int(s), int(s), 0) for s in sources], "id long, source long, dist long"
    )
    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            state, meta = cm.load(spark, k0)
            dists = state.select("id", "source", "dist")
            start_iter = k0
            if meta.get("converged"):
                e.unpersist()
                return dists, {"iterations": k0, "converged": True, "seconds": 0.0,
                               "resumed": True}

    t0 = time.monotonic()
    converged = False
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        relaxed = (
            e.join(dists.hint("shuffle_hash"), e["src"] == dists["id"])
            .select(
                F.col("dst").alias("id"), "source", (F.col("dist") + 1).alias("dist")
            )
        )
        nxt = (
            dists.unionByName(relaxed)
            .groupBy("id", "source")
            .agg(F.min("dist").alias("dist"))
        )
        with_old = nxt.join(
            dists.select("id", "source", F.col("dist").alias("old_dist")).hint("shuffle_hash"),
            ["id", "source"],
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
        dists = state.select("id", "source", "dist")
        if converged:
            break

    e.unpersist()
    return dists, {"iterations": k, "converged": converged,
                   "seconds": time.monotonic() - t0}


def center_landmarks(
    edges: DataFrame,
    sources: list[int],
    k: int = 5,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    directed: bool = True,
) -> DataFrame:
    """Landmark estimate of the graph CENTER → the k vertices with the
    smallest eccentricity LOWER bound ecc_lb(v) = max_{s∈S} d(s, v)
    (true eccentricity ≥ the max over any landmark subset; with
    double-sweep-style landmarks the bound is tight in practice —
    Magnien/Latapy/Habib's BFS-bound framework). Only vertices reached
    by EVERY landmark compete (a partially-reached vertex's max is not
    comparable). Ties broken by id; output (id, ecc_lb, rn).

    Shape: the landmark table is O(|V|·|S|); the top-k is a global
    orderBy().limit(k) (TakeOrdered — no single-partition window) and
    the rank window runs over the k collected rows only."""
    from pyspark.sql import Window

    dists, _ = landmark_distances(
        edges, sources, max_iter=max_iter, checkpoint_dir=checkpoint_dir,
        directed=directed,
    )
    ecc = (
        dists.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.max("dist").cast("long").alias("ecc_lb"),
        )
        .where(F.col("n_sources") == len(sources))
    )
    topk = ecc.orderBy("ecc_lb", "id").limit(k)
    w = Window.orderBy("ecc_lb", "id")
    return topk.select(
        "id", "ecc_lb", F.row_number().over(w).cast("long").alias("rn")
    )


def closeness_landmarks(
    edges: DataFrame,
    sources: list[int],
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    directed: bool = True,
) -> DataFrame:
    """Landmark estimate of closeness centrality → (id, n_sources,
    sum_dist, closeness): c(v) = r / Σ_{s∈S reached, d>0} d(s,v), with
    r = the reached-count correction (landmarks that actually reach v) —
    the Σd twin of harmonic_landmarks, robust to partially-reachable
    vertices: a vertex seen by fewer landmarks is scored on ITS reached
    set instead of inheriting 0-distance holes. Scaling by |S|/n gives
    the standard unbiased sampled-closeness estimate; the raw ratio is
    returned so the result stays deterministic and engine-comparable."""
    dists, _ = landmark_distances(
        edges, sources, max_iter=max_iter, checkpoint_dir=checkpoint_dir,
        directed=directed,
    )
    return (
        dists.where(F.col("dist") > 0)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.sum("dist").cast("long").alias("sum_dist"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.sum("dist").cast("double"), 6
            ).alias("closeness"),
        )
    )


def harmonic_landmarks(
    edges: DataFrame,
    sources: list[int],
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    directed: bool = True,
) -> DataFrame:
    """Landmark estimate of harmonic centrality → (id, n_sources, h):
    h(v) = Σ_{s∈S, d(s,v)>0} 1/d(s,v). Scaling by n/|S| gives the
    standard unbiased estimate of Σ_u 1/d(u,v) when S is a uniform
    sample; the raw sum is returned so the estimate stays deterministic
    and engine-comparable."""
    dists, _ = landmark_distances(
        edges, sources, max_iter=max_iter, checkpoint_dir=checkpoint_dir,
        directed=directed,
    )
    return (
        dists.where(F.col("dist") > 0)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.round(F.sum(F.lit(1.0) / F.col("dist")), 6).alias("h"),
        )
    )


def diameter_double_sweep(
    edges: DataFrame,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """Double-sweep diameter lower bound over the undirected view →
    (one-row DataFrame(start_id, ecc_start, far_id, diameter_lb), info).

    The classic 2-BFS heuristic (Magnien/Latapy/Habib's double sweep):
    BFS from the max-degree vertex (tie → min id), pick the farthest
    vertex reached (tie → min id), BFS again from it; that second
    eccentricity is the bound. On web-shaped graphs it is usually the
    exact diameter; it is always ≥ half of it. Both sweeps reuse
    shortest_hops — same persisted edge partitioning, per-round commit +
    lineage + resume, fixpoint via the commit scan. Driver-side data
    movement is two ONE-ROW collects (the argmax picks), independent of
    graph size; an iFUB-style exact refinement would iterate more sweeps
    on the same spine.

    Unreachable-from-start vertices don't contribute (the bound is for
    the start vertex's component — on a disconnected graph run once per
    giant component root from connected_components).
    """
    import tempfile as _tempfile

    if checkpoint_dir is None:
        checkpoint_dir = _tempfile.mkdtemp(prefix="metis_diam_")
    spark = edges.sparkSession
    t0 = time.monotonic()
    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    start = (
        und.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .orderBy(F.desc("deg"), F.asc("src"))
        .limit(1)
        .collect()[0]["src"]
    )
    d1, i1 = shortest_hops(
        edges, [int(start)], max_iter=max_iter, resume=resume,
        checkpoint_dir=checkpoint_dir + "/sweep1",
        num_partitions=num_partitions, directed=False,
    )
    far = d1.orderBy(F.desc("dist"), F.asc("id")).limit(1).collect()[0]
    d2, i2 = shortest_hops(
        edges, [int(far["id"])], max_iter=max_iter, resume=resume,
        checkpoint_dir=checkpoint_dir + "/sweep2",
        num_partitions=num_partitions, directed=False,
    )
    ecc2 = d2.agg(F.max("dist").alias("m")).collect()[0]["m"]
    out = spark.createDataFrame(
        [(int(start), int(far["dist"]), int(far["id"]), int(ecc2))],
        "start_id long, ecc_start long, far_id long, diameter_lb long",
    )
    return out, {
        "converged": i1["converged"] and i2["converged"],
        "sweep1_iterations": i1["iterations"],
        "sweep2_iterations": i2["iterations"],
        "ecc_start": int(far["dist"]),
        "diameter_lb": int(ecc2),
        "seconds": time.monotonic() - t0,
    }


WIDEST_INF = 1 << 60  # integer +inf sentinel (the temporal.py convention)


def widest_paths(
    edges: DataFrame,
    sources: list[int],
    weight_col: str,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    directed: bool = True,
) -> tuple[DataFrame, dict]:
    """edges(src,dst,weight) + source ids → (caps(id, cap), info).

    Maximum-bottleneck (widest) paths: cap(v) = max over paths s→v of
    the minimum edge weight along the path — the max–min semiring dual
    of weighted shortest paths (network reliability / maximum-capacity
    routing). Same Bellman-Ford-shaped spine as shortest_paths with the
    fold flipped: candidate = LEAST(cap(u), w), combine = MAX; the
    iteration is a monotone ascending fixpoint on integer weights, so
    the unrolled twin replays it exactly (rounds past convergence are
    no-ops). Source rows carry the integer +inf sentinel 2^60 (the
    plans/temporal.py convention — avoids tri-valued NULL logic in both
    engines).
    """
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_widest_")
    cm = CheckpointManager(checkpoint_dir, "widest")

    e = edges.select(
        F.col("src").cast("long"),
        F.col("dst").cast("long"),
        F.col(weight_col).cast("long").alias("w"),
    )
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("w"))
        )
    e = e.repartition(num_partitions, "src").persist()
    e.count()

    caps = spark.createDataFrame(
        [(int(s), WIDEST_INF) for s in sources], "id long, cap long"
    )
    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            state, meta = cm.load(spark, k0)
            caps = state.select("id", "cap")
            start_iter = k0
            if meta.get("converged"):
                e.unpersist()
                return caps, {"iterations": k0, "converged": True, "seconds": 0.0,
                              "resumed": True}

    t0 = time.monotonic()
    converged = False
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        relaxed = e.join(caps.hint("shuffle_hash"), e["src"] == caps["id"]).select(
            F.col("dst").alias("id"), F.least("cap", "w").alias("cap")
        )
        nxt = caps.unionByName(relaxed).groupBy("id").agg(F.max("cap").alias("cap"))
        with_old = nxt.join(
            caps.select("id", F.col("cap").alias("old_cap")).hint("shuffle_hash"),
            "id",
            "left",
        )
        state, totals = cm.commit(
            k,
            with_old,
            {},
            extra_aggs={
                "changed": F.sum(
                    (F.col("old_cap").isNull() | (F.col("cap") > F.col("old_cap"))).cast("long")
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
        caps = state.select("id", "cap")
        if converged:
            break

    e.unpersist()
    return caps, {"iterations": k, "converged": converged, "seconds": time.monotonic() - t0}


def hitting_time_to_seeds(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 8,
    cap_steps: int = 50,
    micro: int = 1_000_000,
) -> DataFrame:
    """Truncated expected hitting time of the simple random walk to a
    seed set → (id, h_micro): h(v) = expected #steps for a walk started
    at v to first reach S, the classic random-walk distance (commute /
    hitting times — Lovász's random-walk survey; the diffusion analog of
    SSSP that weighs ALL paths, not just the shortest: many parallel
    routes pull h down even when the shortest hop count is equal).

    Value iteration on the absorbing system, everything exact integers
    in micro-steps (the simrank/fiedler quantized discipline):

        h_0(v)   = 0 if v ∈ S else cap_steps·micro
        h_t(v)   = 0 if v ∈ S else
                   min(cap, micro + FLOOR(Σ_{n∈N(v)} h_{t-1}(n) / deg(v)))

    The iterate decreases monotonically toward the truncated fixpoint,
    so a fixed ``iters`` unroll is engine-exact and twin-replayable; the
    cap keeps vertices that can't reach S (or only through long tails)
    finite. h_t is exact for vertices whose optimal absorption happens
    within t steps — the standard truncated-hitting-time estimator
    (Sarkar & Moore UAI'07 use exactly this truncation for proximity
    search at scale).

    Per round: ONE gather join on the persisted symmetric edge list +
    one map-side-combined groupBy + the seed overwrite — the
    SSSP/pagerank cost class; lineage truncated per round.
    """
    und = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    und = (
        und.unionByName(
            und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .persist()
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    sd = seeds.select(F.col("id").cast("long")).distinct()
    cap = cap_steps * micro
    state = deg.join(sd.withColumn("is_seed", F.lit(True)), "id", "left").select(
        "id",
        "deg",
        F.coalesce("is_seed", F.lit(False)).alias("is_seed"),
        F.when(F.coalesce("is_seed", F.lit(False)), F.lit(0))
        .otherwise(F.lit(cap))
        .cast("long")
        .alias("h"),
    ).localCheckpoint()

    for _ in range(iters):
        gathered = (
            und.join(
                state.select(F.col("id").alias("src"), F.col("h")), "src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("h").cast("decimal(38,0)")).alias("hs"))
        )
        state = (
            state.join(gathered, "id")
            .select(
                "id",
                "deg",
                "is_seed",
                F.when(F.col("is_seed"), F.lit(0).cast("long"))
                .otherwise(
                    F.least(
                        F.lit(cap).cast("long"),
                        (
                            F.lit(micro)
                            + F.floor(
                                F.col("hs").cast("double") / F.col("deg")
                            )
                        ).cast("long"),
                    )
                )
                .alias("h"),
            )
            .localCheckpoint()
        )
    und.unpersist()
    return state.select("id", F.col("h").alias("h_micro"))


def harmonic_label_scores(
    edges: DataFrame,
    pos_seeds: DataFrame,
    neg_seeds: DataFrame,
    iters: int = 8,
    micro: int = 1_000_000,
) -> DataFrame:
    """Semi-supervised harmonic-function scores (Zhu, Ghahramani &
    Lafferty, "Semi-supervised learning using Gaussian fields and
    harmonic functions", ICML'03) → (id, p_micro): p(v) = probability
    that the simple random walk from v is absorbed at a POSITIVE seed
    before a negative one — the classic two-class node classifier from
    a handful of labels (spam/ham from a small curated seed set, on the
    same graph trustrank ranks).

    Value iteration on the absorbing chain, integers in micro-units
    (the hitting-time discipline one function up):

        p_0 = micro on S+, 0 on S−, 0 elsewhere
        p_t(v) = clamped seed values on S+ ∪ S−, else
                 FLOOR(Σ_{n∈N(v)} p_{t-1}(n) / deg(v))

    The un-truncated fixpoint is the unique harmonic extension; the
    fixed ``iters`` unroll is monotone non-decreasing from the zero
    init, so both engines replay the identical trajectory. Per round
    one gather join + map-side-combined groupBy (pagerank cost class).
    """
    und = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    und = (
        und.unionByName(
            und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .persist()
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    pos = pos_seeds.select(F.col("id").cast("long")).distinct().withColumn(
        "cls", F.lit(1)
    )
    neg = neg_seeds.select(F.col("id").cast("long")).distinct().withColumn(
        "cls", F.lit(0)
    )
    seeds = pos.unionByName(neg)
    state = (
        deg.join(seeds, "id", "left")
        .select(
            "id",
            "deg",
            F.col("cls").isNotNull().alias("is_seed"),
            F.when(F.col("cls") == 1, F.lit(micro))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("p"),
        )
        .localCheckpoint()
    )
    for _ in range(iters):
        gathered = (
            und.join(state.select(F.col("id").alias("src"), F.col("p")), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("p").cast("decimal(38,0)")).alias("ps"))
        )
        state = (
            state.join(gathered, "id")
            .select(
                "id",
                "deg",
                "is_seed",
                F.when(F.col("is_seed"), F.col("p"))
                .otherwise(
                    F.floor(F.col("ps").cast("double") / F.col("deg")).cast("long")
                )
                .alias("p"),
            )
            .localCheckpoint()
        )
    und.unpersist()
    return state.select("id", F.col("p").alias("p_micro"))


def eccentricity_bounds(
    edges: DataFrame,
    sources: list[int],
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Takes–Kosters landmark eccentricity bounds (Algorithms 2013) →
    per-vertex (id, ecc_lower, ecc_upper, tight). From a handful of
    exact landmark BFS runs on the undirected view, every vertex gets
    provable bounds on its own eccentricity:

        ecc(v) ≥ max_L max(d(v,L), ecc(L) − d(v,L))
        ecc(v) ≤ min_L (d(v,L) + ecc(L))

    (triangle inequality both ways). ``tight`` marks vertices whose
    eccentricity is already EXACT from |L| BFS runs — the engine of the
    BoundingDiameters method that computes exact diameters of
    billion-edge graphs with a few dozen traversals instead of |V|.
    Complements `diameter_double_sweep` (one lower bound) and
    `closeness_landmarks` (centrality estimates) on the same landmark
    spine.

    All-integer: hop distances and the max/min folds; no float
    anywhere. Vertices unreached by every landmark (other components)
    are absent — their eccentricity w.r.t. this component is undefined.

    Scale shape: |L| synchronous BFS frontiers (one shuffle each per
    round, state keyed (id, source)), then two map-side-combined
    groupBys. ecc(L) is a |L|-row aggregate joined back broadcast.
    """
    dists, info = landmark_distances(
        edges,
        sources,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        directed=False,
    )
    assert info["converged"], info
    ecc = dists.groupBy("source").agg(F.max("dist").cast("long").alias("eccl"))
    j = dists.join(F.broadcast(ecc), "source").select(
        "id",
        F.greatest(F.col("dist"), F.col("eccl") - F.col("dist")).alias("lo"),
        (F.col("dist") + F.col("eccl")).alias("hi"),
    )
    return (
        j.groupBy("id")
        .agg(
            F.max("lo").cast("long").alias("ecc_lower"),
            F.min("hi").cast("long").alias("ecc_upper"),
        )
        .select(
            "id",
            "ecc_lower",
            "ecc_upper",
            (F.col("ecc_lower") == F.col("ecc_upper")).alias("tight"),
        )
    )


def reachability_masks(
    edges: DataFrame,
    roots: list[int],
    max_iter: int = 60,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """Bit-parallel multi-source reachability → (masks(id, mask), info).

    One LONG bitmask per reached vertex: bit r set ⟺ id is reachable
    from roots[r] (following src→dst; a root reaches itself). All
    |roots| ≤ 63 BFS frontiers advance in ONE iterative loop — the
    PEGASUS-style trick that answers "transitive dependency closure of
    the top-k hub packages" without a per-root pass: per round one
    shuffle-hash join + one map-side-combined bit_or groupBy, state
    only holds vertices already reached (monotone, so rounds are
    bounded by the root set's forward eccentricity). Same commit /
    lineage / resume spine as shortest_paths above.

    100 TB shape: state rows ≤ |V|, mask is 8 bytes regardless of k;
    compare one-root-at-a-time BFS (k full traversals) or a reach(root,
    v) pair table (k·|V| rows shuffled every round — what the DuckDB
    recursive-CTE twin does, fine at oracle scale, wrong at cluster
    scale).
    """
    spark = edges.sparkSession
    if len(roots) > 63:
        raise ValueError("mask is one signed long: at most 63 roots")
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_reach_")
    cm = CheckpointManager(checkpoint_dir, "reach")

    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    e = e.repartition(num_partitions, "src").persist()
    e.count()

    masks = spark.createDataFrame(
        [(int(v), 1 << r) for r, v in enumerate(roots)], "id long, mask long"
    )
    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            state, meta = cm.load(spark, k0)
            masks = state.select("id", "mask")
            start_iter = k0
            if meta.get("converged"):
                e.unpersist()
                return masks, {
                    "iterations": k0, "converged": True, "seconds": 0.0,
                    "resumed": True,
                }

    t0 = time.monotonic()
    converged = False
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        prop = (
            e.join(masks.hint("shuffle_hash"), e["src"] == masks["id"])
            .select(F.col("dst").alias("id"), F.col("mask"))
        )
        nxt = (
            masks.unionByName(prop)
            .groupBy("id")
            .agg(F.bit_or("mask").alias("mask"))
        )
        with_old = nxt.join(
            masks.select("id", F.col("mask").alias("old_mask")).hint("shuffle_hash"),
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
                        F.col("old_mask").isNull()
                        | (F.col("mask") != F.col("old_mask"))
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
        masks = state.select("id", "mask")
        if converged:
            break

    e.unpersist()
    return masks, {
        "iterations": k, "converged": converged,
        "seconds": time.monotonic() - t0,
    }


def ic_live_edge_spread(
    edges: DataFrame,
    seeds: list[int],
    n_trials: int = 48,
    p_pct: int = 20,
    max_iter: int = 60,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    per_bit_roots: list[int] | None = None,
    salt: str = "ic",
) -> tuple[DataFrame, dict]:
    """Independent-cascade influence spread by bit-parallel live-edge
    Monte Carlo → (masks(id, mask), info): bit t of a vertex's mask is
    set ⟺ the seed set reaches it in trial t, where an edge is "live"
    in trial t ⟺ md5-60bit("ic" ‖ t ‖ src ‖ dst) % 100 < p_pct — the
    classic live-edge coupling (Kempe-Kleinberg-Tardos), derandomized
    through the corpus-wide md5 hash family so a recursive-CTE twin
    replays every trial exactly.

    All n_trials ≤ 63 cascades advance in ONE loop: each edge carries a
    precomputed 8-byte liveness mask, propagation is (vertex mask AND
    edge mask) folded with a map-side-combined bit_or — versus the
    textbook approach of n_trials independent traversals (or an
    (trial, v) pair table shuffling n_trials·|V| rows per round, which
    is what the oracle does and what does NOT scale). Monotone state ⇒
    rounds bounded by the live-subgraph eccentricity; same
    commit/lineage/resume spine as shortest_paths."""
    from metis_spark.operators.sampling import hash_bucket

    spark = edges.sparkSession
    if per_bit_roots is not None:
        # RR-set mode (reverse influence sampling): trial t starts from
        # its OWN root with only bit t — pass pre-reversed edges to get
        # reverse-reachable sets. Coin flips stay per-(salt, t, edge).
        n_trials = len(per_bit_roots)
    if n_trials > 63:
        raise ValueError("mask is one signed long: at most 63 trials")
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_ic_")
    cm = CheckpointManager(checkpoint_dir, "ic")

    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    emask = None
    for t in range(n_trials):
        key = F.concat_ws("_", F.lit(str(t)), F.col("src"), F.col("dst"))
        alive = (
            F.pmod(hash_bucket(key, salt), F.lit(100)) < F.lit(p_pct)
        ).cast("long") * F.lit(1 << t).cast("long")
        emask = alive if emask is None else emask + alive
    e = (
        e.withColumn("emask", emask)
        .where(F.col("emask") != 0)  # dead-in-every-trial edges drop out
        .repartition(num_partitions, "src")
        .persist()
    )
    e.count()

    if per_bit_roots is not None:
        init = {}
        for t, v in enumerate(per_bit_roots):
            init[int(v)] = init.get(int(v), 0) | (1 << t)
        masks = spark.createDataFrame(
            sorted(init.items()), "id long, mask long"
        )
    else:
        full = (1 << n_trials) - 1
        masks = spark.createDataFrame(
            [(int(s), full) for s in seeds], "id long, mask long"
        )
    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            state, meta = cm.load(spark, k0)
            masks = state.select("id", "mask")
            start_iter = k0
            if meta.get("converged"):
                e.unpersist()
                return masks, {
                    "iterations": k0, "converged": True, "seconds": 0.0,
                    "resumed": True,
                }

    t0 = time.monotonic()
    converged = False
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        prop = (
            e.join(masks.hint("shuffle_hash"), e["src"] == masks["id"])
            .select(
                F.col("dst").alias("id"),
                F.col("mask").bitwiseAND(F.col("emask")).alias("mask"),
            )
            .where(F.col("mask") != 0)
        )
        nxt = (
            masks.unionByName(prop)
            .groupBy("id")
            .agg(F.bit_or("mask").alias("mask"))
        )
        with_old = nxt.join(
            masks.select("id", F.col("mask").alias("old_mask")).hint("shuffle_hash"),
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
                        F.col("old_mask").isNull()
                        | (F.col("mask") != F.col("old_mask"))
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
        masks = state.select("id", "mask")
        if converged:
            break

    e.unpersist()
    return masks, {
        "iterations": k, "converged": converged,
        "seconds": time.monotonic() - t0,
    }
