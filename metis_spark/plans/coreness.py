"""Full k-core DECOMPOSITION (per-vertex core numbers) by distributed
h-index iteration — the whole coreness profile in one run, where
plans/kcore.py peels a single fixed k.

Algorithm (Lü/Zhou/Zhang/Stanley 2016; Montresor et al.'s distributed
k-core is the message-passing variant): start from c_0(v) = deg(v) and
repeat

    c_{t+1}(v) = H( { c_t(u) : u ∈ N(v) } )

where H is the h-index (the largest h such that ≥ h neighbours have
value ≥ h). The sequence is monotone non-increasing, bounded below by
the core number, and its fixpoint IS the core number of every vertex
(ibid., theorem 1) — typically reached in a few dozen rounds on web
graphs, NOT the degeneracy-many peeling sweeps of the naive approach.

Relational h-index, hub-safe: per vertex, rank neighbour values
descending (rn = 1, 2, …) and take max(least(value, rn)) — no
collect_list, no per-vertex arrays, so a 10M-degree hub costs one
window sort over its partition-local rows instead of one driver-sized
list. Plan per round: one SHJ gather join on the persisted
src-partitioned edge table, one window, one groupBy (map-side partial
max). The changed-vertex count folds into the commit's single lineage
scan; every round commits (state + per-partition lineage + metrics)
through CheckpointManager and resumes mid-algorithm.

The h-value of a tied-order ranking is tie-order invariant (equal
values give equal least(value, rn) maxima), so the unrolled DuckDB twin
replays every round bit-exactly without a tie-break column.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager


def coreness(
    edges: DataFrame,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    init_cores: DataFrame | None = None,
    checkpoint_every: int = 1,
    retain: int | None = None,
    weight_col: str | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → (cores(id, core), info{iterations, changed,
    converged, seconds, n}). Undirected view (symmetrized, self-loops
    dropped). Stops when no vertex changes (the fixpoint = core
    numbers); ``converged`` False only if max_iter ran out first.

    ``init_cores`` (id, core) warm-starts the h-index iteration. The
    iteration converges from ANY per-vertex UPPER bound on the true core
    number (the h-index map is monotone and its fixpoint from above is
    the core number — same theorem as the degree start, which is just
    the trivial upper bound). The canonical use is DECREMENTAL
    maintenance: after edge deletions, the old core numbers are still
    upper bounds (coreness is monotone in the edge set), so seeding with
    them converges in O(1) rounds of delta-local repair instead of a
    full from-degrees run. (After edge ADDITIONS old cores are NOT upper
    bounds — use the cold start.) Each supplied value is clamped to the
    new degree (also an upper bound, and it restores exactness if a
    caller passes stale values for vertices whose degree dropped below
    them); vertices absent from ``init_cores`` start at their degree.

    ``checkpoint_every=k`` / ``retain``: the durability dial shared with
    plans/pagerank.py — commit durable state+lineage every k-th round (and
    always at convergence); intermediate rounds are one localCheckpoint job
    with the changed-count folded in (CheckpointManager.step). Resume lands
    on the last COMMITTED round; the fixpoint is identical for every k.
    ``retain`` keeps only the newest N committed rounds (resume only ever
    reads latest()).

    ``weight_col``: WEIGHTED s-core decomposition. Positive integer
    weights are parallel-edge multiplicities, so the weighted core
    number is the core number of the expanded multigraph and the same
    h-index theorem applies verbatim (a multigraph is a graph to the
    theorem; the start value is the weighted degree — the strength —
    which is the trivial upper bound). The relational h-index of the
    weighted multiset { val(u) × w(u,v) } is

        max over neighbours, ranked by val DESC, of least(val, cw)

    with cw the running weight sum — the block-maximum of least(val, cw)
    sits at each tie-block's last row where cw is order-invariant, so
    the twin replays it without a tie-break column, exactly like the
    unweighted rn form (which is the w ≡ 1 special case). Parallel input
    edges and both orientations of a pair are combined by SUMMING their
    weights on the canonical (min, max) pair before mirroring. Running
    sums ride decimal(38,0) — ANSI mode raises on a long-sum overflow of
    60-bit weights otherwise (the heavy_edge_coarsen lesson) — and only
    the final h (≤ the long-ranged strength) is cast back. Unit weights
    on a one-row-per-undirected-pair input reproduce the unweighted
    decomposition bit-for-bit (pinned by pytest; note the combine rules
    differ on duplicated pairs — unweighted DEDUPS them, weighted SUMS
    them, the multigraph reading of a repeated edge)."""
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_coreness_")
    cm = CheckpointManager(checkpoint_dir, "coreness", retain=retain)

    if weight_col is None:
        e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        und = (
            e0.unionByName(
                e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .repartition(num_partitions, "src")
            .persist()
        )
        state = und.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).cast("long").alias("core")
        )
    else:
        canon = (
            edges.select(
                F.least(F.col("src").cast("long"), F.col("dst").cast("long")).alias("a"),
                F.greatest(
                    F.col("src").cast("long"), F.col("dst").cast("long")
                ).alias("b"),
                F.col(weight_col).cast("decimal(38,0)").alias("w"),
            )
            .where(F.col("a") != F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum("w").alias("w"))
        )
        und = (
            canon.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w")
            .unionByName(
                canon.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
            )
            .repartition(num_partitions, "src")
            .persist()
        )
        state = und.groupBy(F.col("src").alias("id")).agg(
            F.sum("w").cast("long").alias("core")
        )
    if init_cores is not None:
        state = (
            state.withColumnRenamed("core", "deg")
            .join(
                init_cores.select(
                    F.col("id").cast("long"), F.col("core").cast("long").alias("ic")
                ).hint("shuffle_hash"),
                "id",
                "left",
            )
            .select("id", F.least(F.coalesce("ic", "deg"), F.col("deg")).alias("core"))
        )
    n = state.count()

    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, meta = cm.load(spark, k0)
            state = st.select("id", "core")
            start_iter = k0
            if meta.get("converged"):
                und.unpersist()
                return state, {
                    "iterations": k0, "changed": 0, "converged": True,
                    "seconds": 0.0, "n": n, "resumed": True,
                }

    t0 = time.monotonic()
    converged = False
    changed = -1
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        if weight_col is None:
            nv = und.join(
                state.select(F.col("id").alias("dst"), F.col("core").alias("val"))
                .hint("shuffle_hash"),
                "dst",
            ).select(F.col("src").alias("id"), "val")
            w = Window.partitionBy("id").orderBy(F.desc("val"))
            h = (
                nv.withColumn("rn", F.row_number().over(w))
                .groupBy("id")
                .agg(
                    F.max(F.least(F.col("val"), F.col("rn")))
                    .cast("long")
                    .alias("core")
                )
            )
        else:
            nv = und.join(
                state.select(F.col("id").alias("dst"), F.col("core").alias("val"))
                .hint("shuffle_hash"),
                "dst",
            ).select(F.col("src").alias("id"), "val", "w")
            w = (
                Window.partitionBy("id")
                .orderBy(F.desc("val"))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            h = (
                nv.withColumn("cw", F.sum("w").over(w))
                .groupBy("id")
                .agg(
                    F.max(F.least(F.col("val").cast("decimal(38,0)"), F.col("cw")))
                    .cast("long")
                    .alias("core")
                )
            )
        nxt = h.join(
            state.select("id", F.col("core").alias("old")).hint("shuffle_hash"),
            "id",
        )
        aggs = {"changed": F.sum((F.col("core") != F.col("old")).cast("long"))}
        durable = checkpoint_every <= 1 or k % checkpoint_every == 0 or k == max_iter
        st, totals = cm.step(k, nxt, {}, extra_aggs=aggs, durable=durable)
        changed = int(totals["changed"] or 0)
        converged = changed == 0
        if converged and not durable:
            # always durable at convergence (resume must see the fixpoint)
            st, totals = cm.commit(k, st, {}, extra_aggs=aggs)
            durable = True
        if durable:
            cm.update_meta(k, {"converged": converged, "changed": changed})
        cm.append_metrics(
            {"iter": k, "delta": float(changed),
             "seconds": time.monotonic() - it_t0, "rows": int(totals["rows"]),
             "committed": durable}
        )
        state = st.select("id", "core")
        if converged:
            break

    und.unpersist()
    return state, {
        "iterations": k,
        "changed": changed,
        "converged": converged,
        "seconds": time.monotonic() - t0,
        "n": n,
    }


def core_strength(edges: DataFrame, cores: DataFrame) -> DataFrame:
    """Per-vertex core strength → (id, core, core_strength): CS(u) =
    |{v ∈ N(u): core(v) ≥ core(u)}| − core(u) + 1 (Laishram et al.,
    WWW'18 "core resilience") — how many same-or-higher-core neighbours
    u can LOSE before its own core number must drop. CS = 1 marks the
    fragile vertices whose coreness rests on exactly the minimum
    support (the first to cascade under edge removal / crawl loss);
    high CS marks redundantly-supported vertices. The decremental
    maintenance story (coreness init_cores=) tells you how to repair
    after a deletion; this tells you WHERE repairs will be needed.

    ``cores`` is the (id, core) fixpoint from coreness() — computed
    once, composed here without re-running the decomposition. CS ≥ 1
    always (a vertex of core k has ≥ k neighbours of core ≥ k — the
    defining property of the k-core).

    Scale shape: one symmetrized edge pass joined twice against the
    vertex-sized core table (shuffle-hash on src/dst), one map-side-
    combined count — same shape as a single h-index round, so anywhere
    coreness() runs, this runs too."""
    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    cu = cores.select(F.col("id").alias("src"), F.col("core").alias("cu"))
    cv = cores.select(F.col("id").alias("dst"), F.col("core").alias("cv"))
    n_ge = (
        und.join(cu.hint("shuffle_hash"), "src")
        .join(cv.hint("shuffle_hash"), "dst")
        .where(F.col("cv") >= F.col("cu"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_ge"))
    )
    return cores.join(n_ge, "id", "left").select(
        "id",
        "core",
        (F.coalesce("n_ge", F.lit(0)) - F.col("core") + F.lit(1))
        .cast("long")
        .alias("core_strength"),
    )
