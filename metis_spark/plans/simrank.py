"""SimRank structural-context similarity (Jeh & Widom, KDD 2002) over a
BOUNDED eval-pair set, engine-exact through the quantized-integer
iteration discipline (plans/spectral.py fiedler_bipartition is the
pattern source: re-quantize state to integers every round so both
engines' float ops are correctly-rounded functions of exact integers).

Recurrence (undirected form, the link-prediction setting):

    s_0(a,b) = [a = b]
    s_t(a,b) = C / (|N(a)|·|N(b)|) · Σ_{u∈N(a), v∈N(b)} s_{t-1}(u,v)

Two ideas make this Spark-tractable and oracle-checkable:

1. **Bounded pair state** (the VERDICT r4 #5 requirement). Exact
   SimRank needs O(n²) pair state; here scores are computed only for a
   caller-supplied pair set plus its ≤(iters−1)-step closure in the
   pair graph, on a DEGREE-CAPPED view of the graph (edges whose both
   endpoints have degree ≤ deg_cap — hubs contribute near-zero SimRank
   mass anyway since the recurrence divides by |N(a)|·|N(b)|, and
   dropping them deterministically is what bounds closure growth at
   |pairs|·cap² per level instead of |pairs|·deg_max²). State is
   O(|pairs|·cap^{2(iters-1)}) worst case, independent of n² — at
   100 TB the caller sizes |pairs| (a vertex-sample cross or a
   candidate top-k set), never all-pairs.

2. **Integer micro-unit quantization.** Scores live as LONG
   micro-units q = ROUND(1e6·s). Level 1 is closed-form
   (q₁ = ROUND(C·(scale·|N(a)∩N(b)|)/(n_a·n_b))); each later level
   gathers Σq over neighbor pairs (exact integer sum ≤ cap²·scale,
   far below 2^53, with the diagonal contributing `scale` — s(u,u)=1)
   and re-rounds after the one division. Every float op both engines
   perform is the correctly-rounded product/quotient of exact
   integers, so the unrolled DuckDB twin replays the trajectory
   bit-for-bit — the same resolution of the float-fixpoint problem
   that made Fiedler oracle-checkable.

Scale shape: per level one pair→adjacency double hash join + one
map-side-combined groupBy; capped adjacency and nd are small persisted
tables; no driver collect anywhere; the only window downstream is the
driver's top-k over an already-limited set.

Reference parity: /root/reference/Metis has no graph operators; this
extends the §2.10 similarity family (adamic_adar/jaccard in
plans/metrics.py) with the recursive structural-context metric.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simrank_pairs(
    edges: DataFrame,
    pairs: DataFrame,
    c: float = 0.8,
    iters: int = 2,
    deg_cap: int = 24,
    scale: int = 1_000_000,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) + pairs(a,b) with a<b → ((a, b, q), info).
    ``q`` = SimRank after ``iters`` levels in integer micro-units
    (q = quantized 1e6·s on the deg_cap-restricted graph); pairs whose
    endpoints have no capped neighbours score 0."""
    if iters < 1:
        raise ValueError("iters must be ≥ 1")
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    t0 = time.monotonic()

    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    # capped view: both endpoints ≤ deg_cap ⇒ every vertex present in ge
    # has capped degree nd ≤ deg_cap (the closure-growth bound)
    ge = (
        und.join(
            deg.where(F.col("deg") <= deg_cap).select("id").withColumnRenamed("id", "src"),
            "src",
            "left_semi",
        )
        .join(
            deg.where(F.col("deg") <= deg_cap).select("id").withColumnRenamed("id", "dst"),
            "dst",
            "left_semi",
        )
        .repartition(num_partitions, "src")
        .persist()
    )
    nd = (
        ge.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("nd"))
        .persist()
    )

    p0 = pairs.select(F.col("a").cast("long"), F.col("b").cast("long")).distinct()
    ga = ge.select(F.col("src").alias("a"), F.col("dst").alias("u"))
    gb = ge.select(F.col("src").alias("b"), F.col("dst").alias("v"))

    # pair-graph closure levels 0..iters-1 (level t feeds the gather
    # that produces q_{t'} with t' = iters - t)
    levels = [p0.persist()]
    for _ in range(iters - 1):
        nxt = (
            levels[-1]
            .join(ga, "a")
            .join(gb, "b")
            .where(F.col("u") != F.col("v"))
            .select(
                F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
            )
            .distinct()
            .persist()
        )
        levels.append(nxt)

    def _dom(upto: int) -> DataFrame:
        d = levels[0]
        for lv in levels[1 : upto + 1]:
            d = d.unionByName(lv)
        return d.distinct()

    # level 1 closed form on the full closure: q1 = ROUND(C·(scale·cn)/(na·nb))
    pall = _dom(iters - 1)
    cn = (
        pall.join(ga, "a")
        .join(gb.withColumnRenamed("v", "u"), ["b", "u"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cn"))
    )
    na = nd.select(F.col("id").alias("a"), F.col("nd").alias("na"))
    nb = nd.select(F.col("id").alias("b"), F.col("nd").alias("nb"))
    q = (
        cn.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.lit(c) * (F.lit(float(scale)) * F.col("cn"))
                / (F.col("na") * F.col("nb"))
            )
            .cast("long")
            .alias("q"),
        )
    )

    for t in range(2, iters + 1):
        dom = _dom(iters - t)
        prev = q.select(
            F.col("a").alias("qa"), F.col("b").alias("qb"), F.col("q").alias("qq")
        )
        gat = (
            dom.join(ga, "a")
            .join(gb, "b")
            .join(
                prev,
                (F.least("u", "v") == F.col("qa"))
                & (F.greatest("u", "v") == F.col("qb")),
                "left",
            )
            .groupBy("a", "b")
            .agg(
                F.sum(
                    F.when(F.col("u") == F.col("v"), F.lit(scale))
                    .otherwise(F.coalesce("qq", F.lit(0)))
                )
                .cast("long")
                .alias("s")
            )
        )
        q = (
            gat.join(na, "a")
            .join(nb, "b")
            .select(
                "a",
                "b",
                F.round(F.lit(c) * F.col("s") / (F.col("na") * F.col("nb")))
                .cast("long")
                .alias("q"),
            )
        )

    # materialize before releasing the cached inputs: the result is
    # |pairs|-bounded, so pinning it is cheap and the caller's collect
    # never re-runs the closure joins
    out = (
        p0.join(q, ["a", "b"], "left")
        .select("a", "b", F.coalesce("q", F.lit(0)).alias("q"))
        .localCheckpoint()
    )
    info = {
        "iterations": iters,
        "deg_cap": deg_cap,
        "scale": scale,
        "levels": [lv.count() for lv in levels],
        "seconds": time.monotonic() - t0,
    }
    for lv in levels:
        lv.unpersist()
    ge.unpersist()
    nd.unpersist()
    return out, info
