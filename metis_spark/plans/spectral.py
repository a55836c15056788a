"""Katz and eigenvector centrality as iterative DataFrame joins on the
shared checkpoint spine.

Katz (directed, attenuation α, base weight β):

    x_k(v) = β + α · Σ_{u→v} x_{k-1}(u),      x_0 = β

i.e. β · Σ_j α^j (#walks of length j ending at v) truncated at k — the
classic walk-counting centrality (Katz 1953). Converges for
α < 1/λ_max; with ``tol=0`` it runs exactly ``max_iter`` power steps,
which is the oracle-friendly fixed-iteration mode the driver gate uses.

Eigenvector centrality (undirected power iteration):

    y_k = A · x̂_{k-1},   x̂_k = y_k / ‖y_k‖₂,   x̂_0 = 1/√n · 1

Scale design (same contract as plans/pagerank.py / plans/hits.py — the
reference analog is the iterative kernel family of SURVEY.md §2.10,
/root/reference/Metis/README.md's query loop re-expressed as Spark
lineage):

- the gather-side edge table is hash-partitioned by ``src`` ONCE and
  persisted; each iteration is one shuffle-hash relax join + one
  contribution groupBy that partial-aggregates map-side (hub in-degrees
  absorbed before the exchange);
- eigenvector normalization is deferred exactly like HITS: the state
  stores the RAW gather sums, the squared L2 norm folds into the same
  single-pass lineage scan the checkpoint commit already runs
  (``extra_aggs``), and the 1/‖·‖ factor is a driver-side constant
  applied to the NEXT gather — per-iteration normalization costs zero
  extra jobs and zero extra shuffles;
- the L1 convergence delta is LAGGED one step (state carries the
  previous normalized vector), so ``tol > 0`` also rides the commit
  scan — the loop stops one iteration after the fixpoint, which is far
  cheaper than an extra full-state scan every iteration;
- every iteration commits (state + per-partition lineage + metrics)
  through CheckpointManager and resumes mid-algorithm; the eigenvector
  norm constant is persisted in the iteration's meta so a resumed run
  re-enters with the identical scaling factor.
"""

from __future__ import annotations

import math
import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager


def _prep(edges: DataFrame, num_partitions: int | None, symmetrize: bool):
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    if symmetrize:
        e0 = (
            e0.unionByName(
                e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
    e = e0.repartition(num_partitions, "src").persist()
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(num_partitions, "id")
        .persist()
    )
    n = verts.count()
    return spark, e, verts, n


def katz_centrality(
    edges: DataFrame,
    alpha: float = 0.01,
    beta: float = 1.0,
    tol: float = 0.0,
    max_iter: int = 5,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → (scores(id, katz), info{iterations, delta,
    converged, seconds, n}). Directed gather over in-edges; ``tol=0``
    runs exactly ``max_iter`` iterations (driver-gate mode)."""
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_katz_")
    spark, e, verts, n = _prep(edges, num_partitions, symmetrize=False)
    if n == 0:
        e.unpersist()
        verts.unpersist()
        return (
            spark.createDataFrame([], "id long, katz double"),
            {"iterations": 0, "delta": 0.0, "converged": True, "seconds": 0.0, "n": 0},
        )

    cm = CheckpointManager(checkpoint_dir, "katz")
    state = verts.select("id", F.lit(float(beta)).alias("katz"))
    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, meta = cm.load(spark, k0)
            state = st.select("id", "katz")
            start_iter = k0
            if meta.get("converged") and tol > 0:
                e.unpersist()
                verts.unpersist()
                return state, {
                    "iterations": k0,
                    "delta": float(meta.get("delta", 0.0)),
                    "converged": True,
                    "seconds": 0.0,
                    "n": n,
                    "resumed": True,
                }

    t0 = time.monotonic()
    delta = float("inf")
    converged = tol == 0.0 and start_iter >= max_iter
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        contrib = (
            e.join(state.hint("shuffle_hash"), e["src"] == state["id"])
            .groupBy("dst")
            .agg(F.sum("katz").alias("c"))
        )
        nxt = verts.join(
            contrib.withColumnRenamed("dst", "id").hint("shuffle_hash"), "id", "left"
        ).select(
            "id",
            (F.lit(float(beta)) + F.lit(float(alpha)) * F.coalesce("c", F.lit(0.0))).alias(
                "katz"
            ),
        )
        with_old = nxt.join(
            state.select("id", F.col("katz").alias("old")).hint("shuffle_hash"),
            "id",
            "left",
        )
        st, totals = cm.commit(
            k,
            with_old,
            {},
            extra_aggs={"dsum": F.sum(F.abs(F.col("katz") - F.coalesce("old", F.lit(0.0))))},
        )
        delta = float(totals["dsum"] or 0.0)
        converged = tol > 0 and delta < tol
        cm.update_meta(k, {"converged": converged, "delta": delta})
        cm.append_metrics(
            {"iter": k, "delta": delta, "seconds": time.monotonic() - it_t0,
             "rows": int(totals["rows"])}
        )
        state = st.select("id", "katz")
        if converged:
            break
    e.unpersist()
    verts.unpersist()
    return state, {
        "iterations": k,
        "delta": delta,
        "converged": converged or tol == 0.0,
        "seconds": time.monotonic() - t0,
        "n": n,
    }


_EIG_COLS = ["id", "raw", "old"]  # raw_k, normalized x̂_{k-1}


def eigenvector_centrality(
    edges: DataFrame,
    tol: float = 0.0,
    max_iter: int = 5,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → (scores(id, score), info{iterations, delta,
    converged, seconds, n}). Undirected (input symmetrized, self-loops
    dropped); ``score`` is L2-normalized. Isolated-in-the-und-view
    vertices score 0. ``tol=0`` runs exactly ``max_iter`` power steps.

    Per-iteration normalization is algebraically folded into the next
    gather as a driver-side constant divisor (see module docstring):
    each contribution is computed as raw/‖y‖ — the exact double op the
    SQL oracle's per-vertex normalization performs, so the two engines
    agree up to summation order.
    """
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_eig_")
    spark, e, verts, n = _prep(edges, num_partitions, symmetrize=True)
    if n == 0:
        e.unpersist()
        verts.unpersist()
        return (
            spark.createDataFrame([], "id long, score double"),
            {"iterations": 0, "delta": 0.0, "converged": True, "seconds": 0.0, "n": 0},
        )

    cm = CheckpointManager(checkpoint_dir, "eigenvector")
    x0 = 1.0 / math.sqrt(float(n))
    # raw_0 is already normalized (‖x̂_0‖₂ = 1) so norm_0 = 1. The state
    # carries the NORM (divisor), not its reciprocal: x̂ = raw / norm is
    # the exact double op the SQL oracle performs (y/nrm), keeping the two
    # engines bit-aligned up to summation order.
    state = verts.select(
        "id", F.lit(x0).alias("raw"), F.lit(x0).alias("old")
    )
    norm_prev = 1.0
    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, meta = cm.load(spark, k0)
            state = st.select(*_EIG_COLS)
            if "norm" in meta:
                norm_prev = float(meta["norm"])
            else:
                # kill landed between cm.commit(k0) and update_meta(k0):
                # the commit is valid but carries no norm yet — recompute
                # ‖raw_k0‖₂ from the loaded state (one agg) instead of
                # crashing with KeyError (katz's resume tolerates the same
                # window via .get; this is the eigenvector analog)
                sumsq0 = float(
                    state.agg(F.sum(F.col("raw") * F.col("raw"))).collect()[0][0]
                    or 0.0
                )
                norm_prev = math.sqrt(sumsq0) if sumsq0 > 0.0 else float("inf")
            start_iter = k0
            if meta.get("converged") and tol > 0:
                out = state.select(
                    "id", (F.col("raw") / F.lit(norm_prev)).alias("score")
                )
                e.unpersist()
                verts.unpersist()
                return out, {
                    "iterations": k0,
                    "delta": float(meta.get("delta", 0.0)),
                    "converged": True,
                    "seconds": 0.0,
                    "n": n,
                    "resumed": True,
                }

    t0 = time.monotonic()
    delta = float("inf")
    converged = False
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        # x̂_{k-1} materialized as raw/norm_prev inside the gather select —
        # same doubles the oracle's per-vertex normalization produces
        xhat = state.select(
            "id", (F.col("raw") / F.lit(norm_prev)).alias("x"), "old"
        )
        contrib = (
            e.join(
                xhat.select("id", "x").hint("shuffle_hash"), e["src"] == F.col("id")
            )
            .groupBy("dst")
            .agg(F.sum("x").alias("c"))
        )
        nxt = verts.join(
            contrib.withColumnRenamed("dst", "id").hint("shuffle_hash"), "id", "left"
        ).select("id", F.coalesce("c", F.lit(0.0)).alias("raw"))
        # new state: raw_k + x̂_{k-1}; lagged L1 delta |x̂_{k-1} − x̂_{k-2}|
        # rides the same commit scan as the norm — zero extra jobs
        condensed = nxt.join(
            xhat.select(
                "id", F.col("x").alias("old"), F.col("old").alias("old2")
            ).hint("shuffle_hash"),
            "id",
            "left",
        ).select(
            "id", "raw",
            F.coalesce("old", F.lit(0.0)).alias("old"),
            F.coalesce("old2", F.lit(0.0)).alias("old2"),
        )
        st, totals = cm.commit(
            k,
            condensed.select(*_EIG_COLS, "old2"),
            {},
            extra_aggs={
                "sumsq": F.sum(F.col("raw") * F.col("raw")),
                "dsum": F.sum(F.abs(F.col("old") - F.col("old2"))),
            },
        )
        sumsq = float(totals["sumsq"] or 0.0)
        # a graph with edges always has positive gather mass; guard anyway
        norm_prev = math.sqrt(sumsq) if sumsq > 0.0 else float("inf")
        delta = float(totals["dsum"] or 0.0)
        converged = tol > 0 and k > start_iter + 1 and delta < tol
        cm.update_meta(
            k, {"converged": converged, "delta": delta, "norm": norm_prev}
        )
        cm.append_metrics(
            {"iter": k, "delta": delta, "seconds": time.monotonic() - it_t0,
             "rows": int(totals["rows"])}
        )
        state = st.select(*_EIG_COLS)
        if converged:
            break
    out = state.select("id", (F.col("raw") / F.lit(norm_prev)).alias("score"))
    e.unpersist()
    verts.unpersist()
    return out, {
        "iterations": k,
        "delta": delta,
        "converged": converged or tol == 0.0,
        "seconds": time.monotonic() - t0,
        "n": n,
    }


def fiedler_bipartition(
    edges: DataFrame,
    n_iters: int = 20,
    scale: int = 10_000,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) undirected → ((id, v, side), info{shift, maxu,
    n_pos, iterations, seconds}) — an approximate Fiedler vector and the
    spectral bipartition its sign structure induces (Fiedler 1973;
    the classic spectral-partitioning first cut).

    Power iteration on the SHIFTED Laplacian M = cI − L (c = deg_max+1,
    so L's second-smallest eigenvalue becomes M's dominant one once the
    all-ones kernel is removed): per round
        w_i  = (c − deg_i)·v_i + Σ_{j∈N(i)} v_j          (integers)
        u_i  = w_i − ROUND(Σw / n)                        (deflation)
        v'_i = ROUND(u_i · S / max|u|)                    (renormalize)

    ENGINE-EXACT BY CONSTRUCTION: the state re-quantizes to integers in
    [−S, S] every round, all intermediate products stay below 2^53
    (|w| ≤ c·S, |u·S| ≤ 2c·S², with c bounded by the max degree), so
    the two divisions per round are correctly-rounded doubles of exact
    integer operands and DuckDB replays the whole trajectory
    bit-for-bit — the resolution of the float-sum problem that blocks a
    naive L2-normalized power iteration. Deflating with the ROUNDED
    mean leaves ≤ 0.5 per-entry kernel residue per round — irrelevant
    to the sign structure and fully deterministic.

    Init is hash-derived (md5 60-bit per id, folded into [−S, S]) —
    non-constant, deterministic, shared with the twin. Scale shape: one
    hash-partitioned persisted edge table; per round one SHJ gather +
    map-side-combined groupBy + two 1-row aggregates broadcast back via
    crossJoin (no driver collect in the loop); localCheckpoint keeps
    lineage one round deep (fixed small horizon, walks.py reasoning).
    """
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    t0 = time.monotonic()
    fwd = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(num_partitions, "src")
        .persist()
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    ).persist()
    c = int(deg.agg(F.max("deg")).collect()[0][0]) + 1
    n = deg.count()

    s_lit = F.lit(scale)
    v0 = deg.select(
        "id",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("fv"), F.col("id").cast("string"))), 1, 15),
                16, 10,
            ).cast("long")
            % (2 * scale + 1)
            - scale
        ).alias("v"),
    )

    def _step(vcur: DataFrame) -> DataFrame:
        gathered = (
            und.join(
                vcur.select(F.col("id").alias("dst"), F.col("v").alias("vj")).hint("shuffle_hash"),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("vj").cast("long").alias("g"))
        )
        w = (
            deg.join(vcur, "id")
            .join(gathered, "id", "left")
            .select(
                "id",
                (
                    (F.lit(c) - F.col("deg")) * F.col("v")
                    + F.coalesce("g", F.lit(0))
                ).cast("long").alias("w"),
            )
        )
        stats = w.agg(
            F.round(F.sum("w") / F.lit(n)).cast("long").alias("mbar")
        )
        u = w.crossJoin(F.broadcast(stats)).select(
            "id", (F.col("w") - F.col("mbar")).cast("long").alias("u")
        )
        mx = u.agg(F.greatest(F.max("u"), -F.min("u")).cast("long").alias("maxu"))
        return (
            u.crossJoin(F.broadcast(mx))
            .select(
                "id",
                F.when(F.col("maxu") > 0, F.round(F.col("u") * s_lit / F.col("maxu")))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("v"),
            )
            .localCheckpoint(eager=True)
        )

    v = _step(v0)  # round 1 also normalizes/deflates the raw init
    for _ in range(n_iters - 1):
        v = _step(v)

    out = v.select(
        "id", "v", F.when(F.col("v") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("side")
    ).localCheckpoint(eager=True)
    n_pos = out.agg(F.sum("side")).collect()[0][0]
    und.unpersist()
    deg.unpersist()
    return out, {
        "shift": c,
        "n_pos": int(n_pos or 0),
        "iterations": n_iters,
        "seconds": time.monotonic() - t0,
        "n": n,
    }


def leaderrank(
    edges: DataFrame,
    max_iter: int = 5,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """LeaderRank (Lü et al., PLoS ONE 2011) → (scores(id, score,
    leaderrank), info). The parameter-free PageRank alternative: add a
    GROUND node bidirectionally linked to every vertex, run the plain
    random walk s_v ← Σ_{u∈N(v)} s_u/deg(u) on the augmented graph
    (the ground links make it strongly connected and aperiodic — no
    damping factor to tune, no dangling-mass correction), then refund
    the ground node's mass evenly: leaderrank(v) = s_v + s_g/n. More
    noise-tolerant than PageRank for leader/spammer ranking (the
    original paper's result) and the natural twin to trustrank's
    seeded variant on this spine.

    Fixed ``max_iter`` sweeps (driver-gate mode, oracle-unrollable);
    per-iteration state checkpoints via the shared CheckpointManager
    so long runs resume mid-algorithm like the rest of the iterative
    family.

    Scale shape: the augmented edge list adds 2n rows and ONE hub (the
    ground node, deg = n). Per round: one shuffle-hash gather join +
    one map-side-combined groupBy — pagerank's cost class. The ground
    hub's fan-in is a single reducer key at 10^12 scale; AQE skew-split
    handles it (same treatment as any power-law hub, documented in
    plans/pagerank.py's salting notes). The final refund is a
    crossJoin(broadcast(1-row)) — no driver collect in the loop.
    """
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_leaderrank_")
    spark, e, verts, n = _prep(edges, num_partitions, symmetrize=True)
    if n == 0:
        e.unpersist()
        verts.unpersist()
        return (
            spark.createDataFrame([], "id long, score double, leaderrank double"),
            {"iterations": 0, "converged": True, "seconds": 0.0, "n": 0},
        )
    g = F.lit(-1).cast("long")
    ground = spark.range(1).select(g.alias("id"))
    degp = (
        e.groupBy(F.col("src").alias("id"))
        .agg((F.count(F.lit(1)) + F.lit(1)).cast("long").alias("deg"))
        .unionByName(ground.select("id", F.lit(int(n)).cast("long").alias("deg")))
        .persist()
    )
    aug = (
        e.unionByName(verts.select(F.col("id").alias("src"), g.alias("dst")))
        .unionByName(verts.select(g.alias("src"), F.col("id").alias("dst")))
        .repartition(degp.sparkSession.sparkContext.defaultParallelism, "src")
        .persist()
    )
    cm = CheckpointManager(checkpoint_dir, "leaderrank")
    state = verts.select(
        "id", F.lit(1.0).alias("score")
    ).unionByName(ground.select("id", F.lit(0.0).alias("score")))
    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, _meta = cm.load(spark, k0)
            state = st.select("id", "score")
            start_iter = k0

    t0 = time.monotonic()
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        w = state.join(degp.hint("shuffle_hash"), "id").select(
            F.col("id").alias("src"), (F.col("score") / F.col("deg")).alias("w")
        )
        nxt = (
            aug.join(w.hint("shuffle_hash"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("w").alias("score"))
        )
        st, totals = cm.commit(k, nxt, {})
        cm.append_metrics(
            {"iter": k, "seconds": time.monotonic() - it_t0, "rows": int(totals["rows"])}
        )
        state = st.select("id", "score")
    sg = state.where(F.col("id") == -1).select(F.col("score").alias("sg"))
    out = (
        state.where(F.col("id") != -1)
        .crossJoin(F.broadcast(sg))
        .select(
            "id",
            "score",
            (F.col("score") + F.col("sg") / F.lit(float(n))).alias("leaderrank"),
        )
    )
    e.unpersist()
    verts.unpersist()
    degp.unpersist()
    aug.unpersist()
    return out, {
        "iterations": k,
        "converged": True,
        "seconds": time.monotonic() - t0,
        "n": n,
    }
