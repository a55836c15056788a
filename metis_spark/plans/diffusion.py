"""Integer-quantized graph diffusion: heat-kernel PPR and the PageRank
convergence trajectory.

Both operators follow the engine-exact quantized-integer discipline of
plans/spectral.py:fiedler_bipartition — every round's state is a column
of BIGINTs produced only by integer +, *, and truncating division of
non-negative operands (Spark ``DIV`` ≡ DuckDB ``//`` there), so the
DuckDB oracle replays the whole trajectory bit-for-bit and the driver
gate hash-matches without any float-summation-order caveat.

heat_kernel_ppr — truncated-Taylor heat-kernel diffusion (Chung 2007;
Kloster & Gleich KDD'14 hk-relax is the sequential reference point):

    hk = Σ_{k=0..K} (t^k / k!) · (P^T)^k · s      (e^{-t} folded into
                                                   the final norm)

as the integer recurrence (x_0 = SCALE on seeds)

    share_k(u) = x_k(u) DIV outdeg(u)
    x_{k+1}(v) = (T_NUM · Σ_{u→v} share_k(u)) DIV (T_DEN · (k+1))

i.e. one extra multiply-divide per term relative to plain PPR — the
1/k! damping is what makes heat kernel favor *short* paths more
aggressively than PageRank's geometric damping, the property local
community detection papers exploit. K is fixed and small (t^k/k! decays
super-geometrically past k≈t), so lineage is bounded without
checkpointing; each term is one SHJ gather + map-side-combined groupBy.

pagerank_delta_curve — the convergence trajectory of the quantized
power iteration: per iteration the exact integer L1 and L∞ deltas
(Σ|r_k − r_{k-1}|, max|·|). The north-star metric is "iterations to
L1 < 1e-9 convergence" (BASELINE.json); this operator puts the
iteration-by-iteration decay itself behind the oracle gate instead of
only the converged fixpoint. State is "rank · N · SCALE" (uniform init
= SCALE everywhere), one SHJ gather + groupBy + a 1-row dangling-mass
aggregate per round:

    r'(v) = ((DEN−NUM)·SCALE + NUM·(gather(v) + dm DIV n)) DIV DEN

with d = NUM/DEN = 17/20 = 0.85 exactly. Overflow headroom: Σr stays
≈ n·SCALE (damping is mass-preserving up to truncation), so the widest
product NUM·Σr ≤ 17·n·1e12 stays far below 2^63 for n ≤ 10^5 test
graphs; at 100 TB scale SCALE drops to 10^9 and the same bound holds
to n ≤ 10^8 per the sizing note in plans/sizing.py.

Reference semantics anchor: /root/reference — PageRank-style iterative
propagation is SURVEY.md §2 J4/A5; these are the convergence-diagnostic
and heat-kernel members of that family.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _out_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )


def hk_scores(
    edges: DataFrame,
    seed_mod: int = 10,
    t_num: int = 3,
    t_den: int = 1,
    n_terms: int = 6,
    scale: int = 10**12,
    num_partitions: int | None = None,
) -> DataFrame:
    """The full (id, hk) integer heat-kernel state — the shared spine
    behind heat_kernel_ppr (top-k view) and hk_sweep_cut (local
    community endgame). See module docstring for the recurrence."""
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    fwd = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .repartition(num_partitions, "src")
        .persist()
    )
    outdeg = _out_degrees(fwd).persist()
    verts = (
        fwd.select(F.col("src").alias("id"))
        .unionByName(fwd.select(F.col("dst").alias("id")))
        .distinct()
    )
    # x_0: SCALE on each seed; hk accumulator starts at x_0
    x = verts.select(
        "id",
        F.when(F.col("id") % seed_mod == 0, F.lit(scale))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("x"),
    ).localCheckpoint(eager=True)
    hk = x.select("id", F.col("x").alias("hk"))
    for k in range(1, n_terms + 1):
        shares = x.join(outdeg, "id").select(
            F.col("id").alias("src"),
            F.expr("x div deg").cast("long").alias("share"),
        )
        gathered = (
            fwd.join(shares.hint("shuffle_hash"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("share").cast("long").alias("g"))
        )
        x = (
            verts.join(gathered, "id", "left")
            .select(
                "id",
                F.expr(
                    f"({t_num} * coalesce(g, 0)) div {t_den * k}"
                ).cast("long").alias("x"),
            )
            .localCheckpoint(eager=True)
        )
        hk = (
            hk.join(x, "id", "left")
            .select(
                "id",
                (F.col("hk") + F.coalesce("x", F.lit(0))).cast("long").alias("hk"),
            )
            .localCheckpoint(eager=True)
        )
    fwd.unpersist()
    outdeg.unpersist()
    return hk


def heat_kernel_ppr(
    edges: DataFrame,
    seed_mod: int = 10,
    t_num: int = 3,
    t_den: int = 1,
    n_terms: int = 6,
    scale: int = 10**12,
    topk: int = 20,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) directed → ((id, hk_scaled, hk_norm, rn), info).

    Seeds are the deterministic set id % seed_mod == 0 (the same
    distributed-seed-predicate convention as seeded PageRank — the seed
    set never touches the driver). hk_scaled is the exact integer
    Σ_k x_k(v); hk_norm divides by the exact integer total (one
    correctly-rounded double division per emitted row, rounded to 6).
    Only the top-k rows by (hk_scaled desc, id asc) are emitted — the
    distributed sort+limit runs FIRST, the rank window sees ≤ topk rows.
    """
    t0 = time.monotonic()
    hk = hk_scores(
        edges, seed_mod=seed_mod, t_num=t_num, t_den=t_den,
        n_terms=n_terms, scale=scale, num_partitions=num_partitions,
    )
    total = int(hk.agg(F.sum("hk")).collect()[0][0] or 0)
    top = (
        hk.where(F.col("hk") > 0)
        .orderBy(F.desc("hk"), F.asc("id"))
        .limit(topk)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("hk"), F.asc("id"))  # bounded: ≤ topk rows
    out = (
        top.withColumn("rn", F.row_number().over(w).cast("long"))
        .select(
            "id",
            F.col("hk").alias("hk_scaled"),
            F.round(F.col("hk") / F.lit(total), 6).alias("hk_norm"),
            "rn",
        )
    )
    return out, {
        "terms": n_terms,
        "total_scaled": total,
        "seconds": time.monotonic() - t0,
    }


def pagerank_delta_curve(
    edges: DataFrame,
    n_iters: int = 8,
    scale: int = 10**12,
    d_num: int = 17,
    d_den: int = 20,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) directed → ((iter, l1_delta, linf_delta,
    moved_vertices), info) — the exact integer convergence trajectory
    of the quantized power iteration (state = rank·N·SCALE).

    The per-iteration deltas are exact BIGINT aggregates of the integer
    state (order-free), collected as O(n_iters) driver scalars and
    re-emitted as the result table — the same bounded-trajectory shape
    as louvain's modularity trajectory.
    """
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    t0 = time.monotonic()
    fwd = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .repartition(num_partitions, "src")
        .persist()
    )
    outdeg = _out_degrees(fwd)
    verts = (
        fwd.select(F.col("src").alias("id"))
        .unionByName(fwd.select(F.col("dst").alias("id")))
        .distinct()
    )
    # static per-vertex frame: outdeg (0 ⇒ dangling)
    base = (
        verts.join(outdeg, "id", "left")
        .select("id", F.coalesce("deg", F.lit(0)).cast("long").alias("deg"))
        .repartition(num_partitions, "id")
        .persist()
    )
    n = base.count()
    r = base.select("id", F.lit(scale).cast("long").alias("r")).localCheckpoint(
        eager=True
    )
    rows = []
    for it in range(1, n_iters + 1):
        dm = int(
            base.where(F.col("deg") == 0)
            .join(r, "id")
            .agg(F.coalesce(F.sum("r"), F.lit(0)))
            .collect()[0][0]
        )
        dmper = dm // n
        shares = (
            base.where(F.col("deg") > 0)
            .join(r, "id")
            .select(
                F.col("id").alias("src"),
                F.expr("r div deg").cast("long").alias("share"),
            )
        )
        gathered = (
            fwd.join(shares.hint("shuffle_hash"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("share").cast("long").alias("g"))
        )
        r_next = (
            base.join(gathered, "id", "left")
            .select(
                "id",
                F.expr(
                    f"(({d_den - d_num}) * cast({scale} as bigint)"
                    f" + {d_num} * (coalesce(g, 0) + {dmper})) div {d_den}"
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
        stats = (
            r.select("id", F.col("r").alias("r_old"))
            .join(r_next, "id")
            .select(F.abs(F.col("r") - F.col("r_old")).alias("d"))
            .agg(
                F.sum("d").cast("long").alias("l1"),
                F.max("d").cast("long").alias("linf"),
                F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).cast("long").alias("mv"),
            )
            .collect()[0]
        )
        rows.append((it, int(stats["l1"]), int(stats["linf"]), int(stats["mv"])))
        r = r_next
    fwd.unpersist()
    base.unpersist()
    schema = T.StructType(
        [
            T.StructField("iter", T.LongType()),
            T.StructField("l1_delta", T.LongType()),
            T.StructField("linf_delta", T.LongType()),
            T.StructField("moved_vertices", T.LongType()),
        ]
    )
    out = spark.createDataFrame(
        [(int(a), int(b), int(c), int(d)) for a, b, c, d in rows], schema
    )
    return out, {
        "iterations": n_iters,
        "n": n,
        "final_l1": rows[-1][1] if rows else None,
        "seconds": time.monotonic() - t0,
    }
