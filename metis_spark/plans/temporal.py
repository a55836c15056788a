"""Time-respecting earliest-arrival reachability on a temporal graph.

A temporal path traverses edges in non-decreasing timestamp order
(Wu et al., "Path Problems in Temporal Graphs", VLDB 2014 — the
one-pass/iterative earliest-arrival semantics). The earliest arrival
map is the least fixpoint of

    arr(v) = 0                                  for seed vertices
    arr(v) = min{ ts : (u, v, ts) ∈ E, ts ≥ arr(u) }   otherwise

iterated Bellman-Ford style from arr = 0 on seeds / +∞ elsewhere. Each
round relaxes every edge once: as arr(u) values fall, more edges become
eligible (ts ≥ arr(u)), so the sequence is monotone non-increasing and
converges in ≤ (max hop count of an optimal temporal path) rounds —
induction on hops: after k rounds every vertex whose optimal temporal
path has ≤ k edges holds its final arrival.

Shape per round (design-for-100×): ONE shuffle-hash join of the |V|
arrival state onto the persisted src-partitioned edge table, a map-side
partial min groupBy on dst, and a left join back to the state — the
same single-exchange discipline as plans/sssp.py's hop BFS, with the
eligibility predicate (ts ≥ arr) folded into the join filter. The
changed-vertex count rides the commit's lineage scan; every round
commits (state + per-partition lineage + metrics) through
CheckpointManager and resumes mid-algorithm.

Arrivals use an integer +∞ sentinel (2^60) rather than NULL so the
state stays a plain BIGINT column — exact in parquet, exact in the
DuckDB twin, no tri-valued-logic edge cases in the min.

Reference parity: /root/reference/Metis has no temporal operator; this
extends the BFS/SSSP family (plans/sssp.py) with the time-respecting
constraint a link-graph-over-commits user needs (edges timestamped by
commit time).
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager

INF = 1 << 60  # integer +infinity sentinel for unreached vertices


def temporal_reachability(
    edges_ts: DataFrame,
    seeds: DataFrame,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
    retain: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges_ts(src, dst, ts) directed + seeds(id) →
    (arrivals(id, arrival) for REACHED vertices only, info{iterations,
    changed, converged, seconds, reached, n}). ``arrival`` is the
    earliest time-respecting arrival (0 for seeds); unreached vertices
    are omitted from the output."""
    spark = edges_ts.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges_ts)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_temporal_")
    cm = CheckpointManager(checkpoint_dir, "temporal", retain=retain)

    te = (
        edges_ts.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col("ts").cast("long"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(num_partitions, "src")
        .persist()
    )
    verts = (
        te.select(F.col("src").alias("id"))
        .unionByName(te.select(F.col("dst").alias("id")))
        .distinct()
    )
    sd = seeds.select(F.col("id").cast("long"), F.lit(0).cast("long").alias("z"))
    state = (
        verts.join(sd.hint("shuffle_hash"), "id", "left")
        .select("id", F.coalesce("z", F.lit(INF)).cast("long").alias("arr"))
    )
    n = verts.count()

    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, meta = cm.load(spark, k0)
            state = st.select("id", "arr")
            start_iter = k0
            if meta.get("converged"):
                reached = state.where(F.col("arr") < INF)
                out = reached.select("id", F.col("arr").alias("arrival"))
                te.unpersist()
                return out, {
                    "iterations": k0, "changed": 0, "converged": True,
                    "seconds": 0.0, "reached": reached.count(), "n": n,
                    "resumed": True,
                }

    t0 = time.monotonic()
    converged = False
    changed = -1
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        relax = (
            te.join(
                state.select(F.col("id").alias("src"), F.col("arr").alias("au"))
                .hint("shuffle_hash"),
                "src",
            )
            .where(F.col("ts") >= F.col("au"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("ts").alias("m"))
        )
        nxt = (
            state.select("id", F.col("arr").alias("old"))
            .join(relax.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.least(F.col("old"), F.coalesce("m", F.lit(INF)))
                .cast("long").alias("arr"),
                "old",
            )
        )
        aggs = {"changed": F.sum((F.col("arr") != F.col("old")).cast("long"))}
        durable = checkpoint_every <= 1 or k % checkpoint_every == 0 or k == max_iter
        st, totals = cm.step(k, nxt, {}, extra_aggs=aggs, durable=durable)
        changed = int(totals["changed"] or 0)
        converged = changed == 0
        if converged and not durable:
            st, totals = cm.commit(k, st, {}, extra_aggs=aggs)
            durable = True
        if durable:
            cm.update_meta(k, {"converged": converged, "changed": changed})
        cm.append_metrics(
            {"iter": k, "delta": float(changed),
             "seconds": time.monotonic() - it_t0, "rows": int(totals["rows"]),
             "committed": durable}
        )
        state = st.select("id", "arr")
        if converged:
            break

    reached = state.where(F.col("arr") < INF)
    out = reached.select("id", F.col("arr").alias("arrival"))
    n_reached = reached.count()
    te.unpersist()
    return out, {
        "iterations": k,
        "changed": changed,
        "converged": converged,
        "seconds": time.monotonic() - t0,
        "reached": n_reached,
        "n": n,
    }


def temporal_latest_departure(
    edges_ts: DataFrame,
    seeds: DataFrame,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
    retain: int | None = None,
) -> tuple[DataFrame, dict]:
    """The backward dual of earliest arrival: ld(v) = the LATEST time
    one can leave v and still reach a seed along a time-respecting path
    (Wu et al.'s latest-departure problem). Greatest fixpoint of

        ld(v) = +∞                                  for seeds
        ld(v) = max{ ts : (v, u, ts) ∈ E, ts ≤ ld(u) }   otherwise

    iterated from +∞ on seeds / −1 elsewhere — monotone non-decreasing,
    converges in ≤ max-hop rounds (mirror argument of
    temporal_reachability; as ld(u) rises, more out-edges qualify and
    ld(v) only rises). Output lists vertices that CAN reach a seed
    (the influence/audience set) with their departure deadline;
    integer 2^60 marks the seeds themselves.

    Same single-exchange shape per round: one SHJ join of the arrival
    state onto the dst-keyed persisted edge table, map-side partial max,
    one left join back — commit/lineage/resume identical to the forward
    pass."""
    spark = edges_ts.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges_ts)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_temporal_ld_")
    cm = CheckpointManager(checkpoint_dir, "temporal_ld", retain=retain)

    te = (
        edges_ts.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col("ts").cast("long"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(num_partitions, "dst")
        .persist()
    )
    verts = (
        te.select(F.col("src").alias("id"))
        .unionByName(te.select(F.col("dst").alias("id")))
        .distinct()
    )
    sd = seeds.select(F.col("id").cast("long"), F.lit(INF).cast("long").alias("z"))
    state = (
        verts.join(sd.hint("shuffle_hash"), "id", "left")
        .select("id", F.coalesce("z", F.lit(-1)).cast("long").alias("ld"))
    )
    n = verts.count()

    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, meta = cm.load(spark, k0)
            state = st.select("id", "ld")
            start_iter = k0
            if meta.get("converged"):
                reach = state.where(F.col("ld") >= 0)
                out = reach.select("id", F.col("ld").alias("latest_departure"))
                te.unpersist()
                return out, {
                    "iterations": k0, "changed": 0, "converged": True,
                    "seconds": 0.0, "reached": reach.count(), "n": n,
                    "resumed": True,
                }

    t0 = time.monotonic()
    converged = False
    changed = -1
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        relax = (
            te.join(
                state.select(F.col("id").alias("dst"), F.col("ld").alias("lu"))
                .hint("shuffle_hash"),
                "dst",
            )
            .where(F.col("ts") <= F.col("lu"))
            .groupBy(F.col("src").alias("id"))
            .agg(F.max("ts").alias("m"))
        )
        nxt = (
            state.select("id", F.col("ld").alias("old"))
            .join(relax.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.greatest(F.col("old"), F.coalesce("m", F.lit(-1)))
                .cast("long").alias("ld"),
                "old",
            )
        )
        aggs = {"changed": F.sum((F.col("ld") != F.col("old")).cast("long"))}
        durable = checkpoint_every <= 1 or k % checkpoint_every == 0 or k == max_iter
        st, totals = cm.step(k, nxt, {}, extra_aggs=aggs, durable=durable)
        changed = int(totals["changed"] or 0)
        converged = changed == 0
        if converged and not durable:
            st, totals = cm.commit(k, st, {}, extra_aggs=aggs)
            durable = True
        if durable:
            cm.update_meta(k, {"converged": converged, "changed": changed})
        cm.append_metrics(
            {"iter": k, "delta": float(changed),
             "seconds": time.monotonic() - it_t0, "rows": int(totals["rows"]),
             "committed": durable}
        )
        state = st.select("id", "ld")
        if converged:
            break

    reach = state.where(F.col("ld") >= 0)
    out = reach.select("id", F.col("ld").alias("latest_departure"))
    n_reached = reach.count()
    te.unpersist()
    return out, {
        "iterations": k,
        "changed": changed,
        "converged": converged,
        "seconds": time.monotonic() - t0,
        "reached": n_reached,
        "n": n,
    }


def temporal_fastest_path(
    edges_ts: DataFrame,
    seeds: DataFrame,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
    retain: int | None = None,
) -> tuple[DataFrame, dict]:
    """Minimum ELAPSED duration — the third of Wu et al.'s temporal-path
    duals (VLDB 2014) next to earliest-arrival and latest-departure:
    fastest(v) = min over time-respecting seed→v paths of
    (arrival − departure of the path's FIRST edge); 0 for seeds.

    Unlike earliest arrival, a single scalar per vertex cannot be
    relaxed (a later-departing path may be slower now but enable a
    faster continuation), so the state is each vertex's PARETO FRONTIER
    of (start, arrival) pairs — pair A dominates B iff A starts no
    earlier... precisely: st_A ≥ st_B AND ar_A ≤ ar_B (A departs later
    yet arrives no later, so every continuation of B is matched or
    beaten by A). The pruning rule that keeps state bounded: after each
    relaxation, only non-dominated pairs survive, so a vertex holds at
    most one pair per distinct start time, and start times are drawn
    from the seed out-edge timestamps — |frontier(v)| ≤ |distinct first-
    hop timestamps|, independent of path count or graph size. The prune
    is relational and hub-safe: sort the vertex's pairs by
    (start DESC, arrival ASC) and keep a row iff its arrival beats the
    running MIN(arrival) of all later-starting rows — one window over
    frontier-sized state, no collect.

    Iteration (monotone: frontiers only gain dominating pairs):

        state_0   = { (dst, ts, ts) : (s, dst, ts) ∈ E, s ∈ seeds }
        state_k+1 = prune( state_k ∪ { (dst, st, ts) :
                       (u, dst, ts) ∈ E, (u, st, ar) ∈ state_k, ts ≥ ar } )

    converging in ≤ max-hop rounds (induction as in
    temporal_reachability). Output: (id, fastest) for reached vertices
    and seeds (0); a converged run is unique, so a fixed-round unrolled
    SQL twin replays the identical frontier set.

    Shape per round: one SHJ state⋈edge join with the eligibility
    predicate folded in, one frontier-sized window prune, one left-anti
    join for the changed count; state commits through CheckpointManager
    with the shared ``checkpoint_every``/``retain`` durability dial.
    """
    from pyspark.sql import Window

    spark = edges_ts.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges_ts)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_temporal_fp_")
    cm = CheckpointManager(checkpoint_dir, "temporal_fp", retain=retain)

    te = (
        edges_ts.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col("ts").cast("long"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(num_partitions, "src")
        .persist()
    )
    sd = seeds.select(F.col("id").cast("long")).distinct()
    n_seeds = sd.count()

    def _prune(pairs: DataFrame) -> DataFrame:
        w = (
            Window.partitionBy("id")
            .orderBy(F.desc("st"), F.asc("ar"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            pairs.select("id", "st", "ar")
            .distinct()
            .withColumn("_rm", F.min("ar").over(w))
            .where(F.col("_rm").isNull() | (F.col("ar") < F.col("_rm")))
            .select("id", "st", "ar")
        )

    state = _prune(
        te.join(sd.select(F.col("id").alias("src")).hint("shuffle_hash"), "src")
        .select(F.col("dst").alias("id"), F.col("ts").alias("st"), F.col("ts").alias("ar"))
    )

    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st0, meta = cm.load(spark, k0)
            state = st0.select("id", "st", "ar")
            start_iter = k0
            if meta.get("converged"):
                out = _fastest_out(spark, state, sd)
                te.unpersist()
                return out, {
                    "iterations": k0, "changed": 0, "converged": True,
                    "seconds": 0.0, "n_seeds": n_seeds, "resumed": True,
                }

    t0 = time.monotonic()
    converged = False
    changed = -1
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        relax = (
            te.join(
                state.select(
                    F.col("id").alias("src"), F.col("st").alias("st"),
                    F.col("ar").alias("au"),
                ).hint("shuffle_hash"),
                "src",
            )
            .where(F.col("ts") >= F.col("au"))
            .select(F.col("dst").alias("id"), "st", F.col("ts").alias("ar"))
        )
        nxt = _prune(state.unionByName(relax)).join(
            state.withColumn("_old", F.lit(True)).hint("shuffle_hash"),
            ["id", "st", "ar"],
            "left",
        )
        aggs = {"changed": F.sum(F.col("_old").isNull().cast("long"))}
        durable = checkpoint_every <= 1 or k % checkpoint_every == 0 or k == max_iter
        st, totals = cm.step(k, nxt, {}, extra_aggs=aggs, durable=durable)
        changed = int(totals["changed"] or 0)
        converged = changed == 0
        if converged and not durable:
            st, totals = cm.commit(k, st, {}, extra_aggs=aggs)
            durable = True
        if durable:
            cm.update_meta(k, {"converged": converged, "changed": changed})
        cm.append_metrics(
            {"iter": k, "delta": float(changed),
             "seconds": time.monotonic() - it_t0, "rows": int(totals["rows"]),
             "committed": durable}
        )
        state = st.select("id", "st", "ar")
        if converged:
            break

    out = _fastest_out(spark, state, sd)
    te.unpersist()
    return out, {
        "iterations": k,
        "changed": changed,
        "converged": converged,
        "seconds": time.monotonic() - t0,
        "n_seeds": n_seeds,
    }


def _fastest_out(spark, state: DataFrame, sd: DataFrame) -> DataFrame:
    """(id, fastest): min(ar − st) per reached vertex; seeds pinned to 0
    (the zero-length path) whether or not a cycle also reaches them."""
    best = state.groupBy("id").agg(F.min(F.col("ar") - F.col("st")).alias("dur"))
    seeds0 = sd.select("id", F.lit(0).cast("long").alias("fastest"))
    nonseed = (
        best.join(sd.withColumn("_s", F.lit(True)), "id", "left")
        .where(F.col("_s").isNull())
        .select("id", F.col("dur").cast("long").alias("fastest"))
    )
    return seeds0.unionByName(nonseed)


def temporal_shortest_path(
    edges_ts: DataFrame,
    seeds: DataFrame,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
    retain: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges_ts(src, dst, ts) + seeds(id) → (out(id, hops, arrival) for
    REACHED vertices, info) — the minimum NUMBER OF EDGES of any
    time-respecting path (Wu et al. VLDB 2014 "shortest" dual, next to
    earliest-arrival / latest-departure / fastest).

    Identity making one pass suffice: after k rounds of the
    earliest-arrival relaxation, arr_k(v) is the earliest arrival over
    time-respecting paths of ≤ k edges, and the earliest-arrival
    frontier is reachability-SUFFICIENT (an edge usable after a later
    arrival is usable after an earlier one), so the first round at
    which arr(v) becomes finite IS the minimum hop count. The loop is
    temporal_reachability's with one extra integer column recording
    that first round; ``arrival`` is the converged earliest arrival.
    """
    spark = edges_ts.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges_ts)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_tshort_")
    cm = CheckpointManager(checkpoint_dir, "tshortest", retain=retain)

    te = (
        edges_ts.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col("ts").cast("long"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(num_partitions, "src")
        .persist()
    )
    verts = (
        te.select(F.col("src").alias("id"))
        .unionByName(te.select(F.col("dst").alias("id")))
        .distinct()
    )
    sd = seeds.select(F.col("id").cast("long"), F.lit(0).cast("long").alias("z"))
    state = verts.join(sd.hint("shuffle_hash"), "id", "left").select(
        "id",
        F.coalesce("z", F.lit(INF)).cast("long").alias("arr"),
        F.when(F.col("z").isNotNull(), F.lit(0)).cast("long").alias("hops"),
    )
    n = verts.count()

    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, meta = cm.load(spark, k0)
            state = st.select("id", "arr", "hops")
            start_iter = k0
            if meta.get("converged"):
                out = state.where(F.col("arr") < INF).select(
                    "id", "hops", F.col("arr").alias("arrival")
                )
                te.unpersist()
                return out, {
                    "iterations": k0, "changed": 0, "converged": True,
                    "seconds": 0.0, "n": n, "resumed": True,
                }

    t0 = time.monotonic()
    converged = False
    changed = -1
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        relax = (
            te.join(
                state.select(F.col("id").alias("src"), F.col("arr").alias("au"))
                .hint("shuffle_hash"),
                "src",
            )
            .where(F.col("ts") >= F.col("au"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("ts").alias("m"))
        )
        nxt = (
            state.select("id", F.col("arr").alias("old"), "hops")
            .join(relax.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.least(F.col("old"), F.coalesce("m", F.lit(INF)))
                .cast("long").alias("arr"),
                "old",
                F.coalesce(
                    "hops",
                    F.when(
                        F.least(F.col("old"), F.coalesce("m", F.lit(INF))) < INF,
                        F.lit(k),
                    ),
                ).cast("long").alias("hops"),
            )
        )
        aggs = {"changed": F.sum((F.col("arr") != F.col("old")).cast("long"))}
        durable = checkpoint_every <= 1 or k % checkpoint_every == 0 or k == max_iter
        st, totals = cm.step(k, nxt, {}, extra_aggs=aggs, durable=durable)
        changed = int(totals["changed"] or 0)
        converged = changed == 0
        if converged and not durable:
            st, totals = cm.commit(k, st, {}, extra_aggs=aggs)
            durable = True
        if durable:
            cm.update_meta(k, {"converged": converged, "changed": changed})
        cm.append_metrics(
            {"iter": k, "delta": float(changed),
             "seconds": time.monotonic() - it_t0, "rows": int(totals["rows"]),
             "committed": durable}
        )
        state = st.select("id", "arr", "hops")
        if converged:
            break

    out = state.where(F.col("arr") < INF).select(
        "id", "hops", F.col("arr").alias("arrival")
    )
    te.unpersist()
    return out, {
        "iterations": k,
        "changed": changed,
        "converged": converged,
        "seconds": time.monotonic() - t0,
        "n": n,
    }


def temporal_pagerank(
    edges_ts: DataFrame,
    n_epochs: int = 8,
    ts_max: int = 1000,
    beta: float = 0.5,
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> tuple[DataFrame, dict]:
    """Epoch-bucketed temporal PageRank → ((id, rank), info). The
    time-respecting importance measure of Rozenshtein & Gionis
    (ECML-PKDD 2016), discretized to epochs for batch execution: edges
    are bucketed by timestamp into ``n_epochs`` ordered epochs
    (epoch = ts·n_epochs // ts_max) and the walk advances one epoch per
    round —

        r_t(v) = r_{t−1}(v)·(1 − β·has_out_t(v))
                 + β·Σ_{(u,v) ∈ E_t} r_{t−1}(u) / outdeg_t(u)

    Mass only ever moves along edges of the CURRENT epoch, so influence
    flows forward in time (an edge at t=100 cannot launder rank arriving
    via an edge at t=900) — the property static PageRank fundamentally
    cannot express on commit-timestamped dependency edges. Vertices
    with no out-edges in an epoch hold their mass (no dangling leak:
    Σ_v r_t(v) = 1 exactly at every epoch).

    Float discipline: pagerank's (float state, ROUND 6 at the end) —
    the per-epoch fold is one gather + map-side-combined groupBy.
    Epochs checkpoint/resume through CheckpointManager like every
    iterative plan. At 100 TB the epoch filter is a partition-pruned
    scan when the edge table is date-partitioned — the natural layout
    for commit-history corpora.
    """
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_tpr_")
    spark = edges_ts.sparkSession
    e = (
        edges_ts.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            (F.col("ts").cast("long") * n_epochs / F.lit(ts_max))
            .cast("long")
            .alias("epoch"),
        )
        .repartition(spark.sparkContext.defaultParallelism, "src")
        .persist()
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = verts.count()
    if n == 0:
        e.unpersist()
        verts.unpersist()
        return (
            spark.createDataFrame([], "id long, rank double"),
            {"epochs": 0, "n": 0, "converged": True},
        )
    cm = CheckpointManager(checkpoint_dir, "temporal_pagerank")
    state = verts.select("id", F.lit(1.0 / n).alias("rank"))
    start = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, _meta = cm.load(spark, k0)
            state = st.select("id", "rank")
            start = k0
    t0 = time.monotonic()
    for t in range(start, n_epochs):
        et = e.where(F.col("epoch") == t)
        od = et.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).cast("long").alias("od")
        )
        send = state.join(od.hint("shuffle_hash"), "id").select(
            F.col("id").alias("src"),
            (F.lit(float(beta)) * F.col("rank") / F.col("od")).alias("w"),
        )
        inflow = (
            et.join(send.hint("shuffle_hash"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("w").alias("inflow"))
        )
        nxt = (
            state.join(od.hint("shuffle_hash"), "id", "left")
            .join(inflow.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                (
                    F.col("rank")
                    * (
                        F.lit(1.0)
                        - F.when(F.col("od").isNotNull(), F.lit(float(beta))).otherwise(
                            F.lit(0.0)
                        )
                    )
                    + F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
        )
        st, _tot = cm.commit(t + 1, nxt, {})
        state = st.select("id", "rank")
    e.unpersist()
    verts.unpersist()
    return state, {
        "epochs": n_epochs,
        "n": n,
        "converged": True,
        "seconds": time.monotonic() - t0,
    }


def temporal_triangle_count(tedges: DataFrame, delta: int) -> DataFrame:
    """δ-windowed time-respecting triangle motif count (Paranjape,
    Benson & Leskovec, WSDM'17 "Motifs in temporal networks") → one
    row (n_temporal_edges, delta, two_paths, cyc_triangles, closure).

    Input: directed temporal edges (src, dst, ts). Counted motifs:

        two_paths      u→v→w  with t₁ < t₂ ≤ t₁+δ, w ≠ u
        cyc_triangles  u→v→w→u with t₁ < t₂ < t₃ ≤ t₁+δ

    Strict < between timestamps means ties never form a motif — the
    one deterministic convention both engines share (WSDM'17 assumes
    distinct stamps). A cyclic triangle has exactly one rotation whose
    stamps ascend, so each is counted once, no /3. closure =
    cyc_triangles / two_paths (NULL when no 2-paths) — the temporal
    clustering signal: how often a time-respecting forward path closes
    back within the window.

    Exactness: integer timestamps, integer counts, one trailing ROUND.

    Scale shape: two hash joins keyed on the shared vertex with the
    δ-window predicate applied AS the join progresses (each stage
    filters before the next fan-out); counts are single scalar
    aggregates. Σ d_in·d_out wedge budget — same envelope as the
    static triangle counter; at 100 TB partition te by ts-bucket and
    run per-bucket with a δ overlap pane (the standard motif-sharding
    trick), which this plan composes with trivially.
    """
    te = tedges.select(
        F.col("src").cast("long"),
        F.col("dst").cast("long"),
        F.col("ts").cast("long"),
    )
    m = te.count()
    p2 = (
        te.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("ts").alias("t1"))
        .join(
            te.select(F.col("src").alias("v"), F.col("dst").alias("w"), F.col("ts").alias("t2")),
            "v",
        )
        .where(
            (F.col("t2") > F.col("t1"))
            & (F.col("t2") <= F.col("t1") + F.lit(delta))
            & (F.col("w") != F.col("u"))
        )
    )
    p2 = p2.persist()
    two_paths = p2.count()
    tri = (
        p2.join(
            te.select(F.col("src").alias("w"), F.col("dst").alias("u"), F.col("ts").alias("t3")),
            ["w", "u"],
        )
        .where(
            (F.col("t3") > F.col("t2"))
            & (F.col("t3") <= F.col("t1") + F.lit(delta))
        )
    )
    cyc = tri.count()
    p2.unpersist()
    spark = tedges.sparkSession
    row = [(int(m), int(delta), int(two_paths), int(cyc),
            round(cyc / two_paths, 6) if two_paths else None)]
    return spark.createDataFrame(
        row,
        "n_temporal_edges long, delta long, two_paths long, "
        "cyc_triangles long, closure double",
    )
