"""PPR sweep cut: local community detection by conductance sweep.

Andersen, Chung & Lang, "Local Graph Partitioning using PageRank
Vectors" (FOCS 2006): run personalized PageRank from a seed set,
order vertices by degree-normalized score rank(v)/deg(v), and sweep
prefixes S_1 ⊂ S_2 ⊂ … of that order, measuring the conductance
φ(S_k) = cut(S_k) / min(vol(S_k), 2m − vol(S_k)); the minimizing
prefix is the seed's local community with a provable quality bound.

Distributed shape:
- the PPR vector comes from the verified plans/pagerank.py seeded mode
  on the SYMMETRIC edge table (an undirected walk; no dangling mass by
  construction, so the engine-exact twin needs no dangling terms);
- the sweep is truncated to the top-L candidates (L = 64 default): the
  global order is taken with orderBy+limit (TakeOrderedAndProject, a
  per-partition heap — never a full |V| sort), and every later stage is
  bounded by L, not |V|;
- cut(S_k) for ALL prefixes at once via a difference histogram: each
  edge joins the broadcast L-row rank table on both endpoints and emits
  +1 at its earlier sweep position and −1 at its later one (absent →
  never closes); one map-side-combined groupBy to ≤L+1 buckets, then a
  running sum over the L-row axis — the only window in the plan runs
  over exactly L rows;
- vol(S_k) is the running degree sum over the same L rows; 2m is one
  scalar count.

Determinism: the sweep order is round-before-rank (score quantized to
9 decimals before ordering, ties to the lower id); cut/vol/2m are exact
integers, so φ is one correctly-rounded division per prefix.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metis_spark.plans.pagerank import pagerank


def ppr_sweep_cut(
    edges: DataFrame,
    seeds: DataFrame,
    n_iters: int = 5,
    sweep_l: int = 64,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) undirected + seeds(id) →
    ((k, id, deg, vol, cut, phi) for k = 1..sweep_l, info{best_k,
    best_phi, m}).

    ``phi`` is the conductance of the first k vertices of the
    degree-normalized PPR sweep order; the row minimizing phi (ties to
    the smaller k) is the ACL local community around the seeds.
    """
    t0 = time.monotonic()
    spark = edges.sparkSession
    fwd = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    m2 = und.count()  # = 2m: symmetric rows

    ranks, _ = pagerank(
        und,
        checkpoint_dir=checkpoint_dir,
        tol=0.0,
        max_iter=n_iters,
        seeds=seeds,
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    score = ranks.join(deg, "id").select(
        "id",
        "deg",
        F.round(F.round("rank", 6) / F.col("deg"), 9).alias("s"),
    )
    top = score.orderBy(F.desc("s"), F.asc("id")).limit(sweep_l)
    wk = Window.orderBy(F.desc("s"), F.asc("id"))
    ranked = top.select(
        "id", "deg", F.row_number().over(wk).cast("long").alias("k")
    ).localCheckpoint(eager=True)

    out, best = _conductance_sweep(und, ranked, m2, sweep_l)
    und.unpersist()
    return out, {
        "best_k": int(best["k"]),
        "best_phi": float(best["phi"]),
        "m": m2 // 2,
        "seconds": time.monotonic() - t0,
    }


def _conductance_sweep(und: DataFrame, ranked: DataFrame, m2: int, sweep_l: int):
    """Shared sweep kernel: ranked(id, deg, k) for k = 1..sweep_l →
    ((k, id, deg, vol, cut, phi), best-row) via the ±1 difference
    histogram — one broadcast join + groupBy to ≤ sweep_l+1 buckets."""
    big = F.lit(sweep_l + 1)
    ra = ranked.select(F.col("id").alias("src"), F.col("k").alias("ka"))
    rb = ranked.select(F.col("id").alias("dst"), F.col("k").alias("kb"))
    u = und.where(F.col("src") < F.col("dst"))  # each undirected edge once
    er = (
        u.join(F.broadcast(ra), "src", "left")
        .join(F.broadcast(rb), "dst", "left")
        .select(
            F.least(F.coalesce("ka", big), F.coalesce("kb", big)).alias("lo"),
            F.greatest(F.coalesce("ka", big), F.coalesce("kb", big)).alias("hi"),
        )
        .where(F.col("lo") <= sweep_l)
    )
    starts = er.groupBy(F.col("lo").alias("k")).agg(F.count(F.lit(1)).alias("n_open"))
    ends = (
        er.where(F.col("hi") <= sweep_l)
        .groupBy(F.col("hi").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_close"))
    )
    wcum = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    out = (
        ranked.join(starts, "k", "left")
        .join(ends, "k", "left")
        .select(
            "k",
            "id",
            "deg",
            F.coalesce("n_open", F.lit(0)).alias("n_open"),
            F.coalesce("n_close", F.lit(0)).alias("n_close"),
        )
        .withColumn("vol", F.sum("deg").over(wcum).cast("long"))
        .withColumn(
            "cut", F.sum(F.col("n_open") - F.col("n_close")).over(wcum).cast("long")
        )
        .withColumn(
            "phi",
            # a prefix covering the whole graph has min(vol, 2m-vol) = 0:
            # conductance is undefined there -> NULL, same as the SQL twin
            F.when(
                F.least(F.col("vol"), F.lit(m2) - F.col("vol")) > 0,
                F.round(
                    F.col("cut") / F.least(F.col("vol"), F.lit(m2) - F.col("vol")), 6
                ),
            ),
        )
        .select("k", "id", "deg", "vol", "cut", "phi")
        .localCheckpoint(eager=True)
    )
    best = out.orderBy(F.asc_nulls_last("phi"), F.asc("k")).limit(1).collect()[0]
    return out, best


def fiedler_sweep_cut(
    edges: DataFrame,
    n_iters: int = 16,
    scale: int = 10_000,
    sweep_l: int = 64,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) undirected → ((k, id, deg, vol, cut, phi), info)
    — the CLASSIC spectral-partitioning pipeline (Fiedler vector →
    value-sorted sweep → conductance-minimizing prefix), composing the
    engine-exact quantized Fiedler iteration with the same
    difference-histogram sweep kernel the ACL cut uses. Sweep order is
    all-integer (quantized Fiedler value asc, id asc) — no rounding
    discipline needed at all; truncated to the first ``sweep_l``
    positions like the PPR sweep."""
    from metis_spark.plans.spectral import fiedler_bipartition

    t0 = time.monotonic()
    spark = edges.sparkSession
    fwd = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    m2 = und.count()
    vec, _ = fiedler_bipartition(und, n_iters=n_iters, scale=scale)
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    top = (
        vec.join(deg, "id")
        .select("id", "deg", "v")
        .orderBy(F.asc("v"), F.asc("id"))
        .limit(sweep_l)
    )
    wk = Window.orderBy(F.asc("v"), F.asc("id"))
    ranked = top.select(
        "id", "deg", F.row_number().over(wk).cast("long").alias("k")
    ).localCheckpoint(eager=True)
    out, best = _conductance_sweep(und, ranked, m2, sweep_l)
    und.unpersist()
    return out, {
        "best_k": int(best["k"]),
        "best_phi": float(best["phi"]),
        "m": m2 // 2,
        "seconds": time.monotonic() - t0,
    }


def hk_sweep_cut(
    edges: DataFrame,
    seed_mod: int = 10,
    t_num: int = 3,
    t_den: int = 1,
    n_terms: int = 6,
    scale: int = 10**12,
    sweep_l: int = 64,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) undirected-ized + hash seeds → the heat-kernel
    local community: ((k, id, deg, vol, cut, phi), info) — the hk-relax
    endgame (Kloster & Gleich KDD'14): heat-kernel diffusion's 1/k!
    damping concentrates mass on SHORT paths from the seed, which the
    paper shows yields lower-conductance sweep cuts than ACL/PPR on the
    same seeds. Scores are the exact integer hk state degree-normalized
    by integer division (hk DIV deg — deterministic rank order in both
    engines); the sweep reuses the shared ±1 difference-histogram
    kernel of ppr_sweep_cut.
    """
    from metis_spark.plans.diffusion import hk_scores

    t0 = time.monotonic()
    fwd = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    m2 = und.count()
    hk = hk_scores(
        und, seed_mod=seed_mod, t_num=t_num, t_den=t_den,
        n_terms=n_terms, scale=scale,
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    score = hk.join(deg, "id").select(
        "id", "deg", F.expr("hk div deg").cast("long").alias("s")
    )
    top = score.orderBy(F.desc("s"), F.asc("id")).limit(sweep_l)
    wk = Window.orderBy(F.desc("s"), F.asc("id"))
    ranked = top.select(
        "id", "deg", F.row_number().over(wk).cast("long").alias("k")
    ).localCheckpoint(eager=True)
    out, best = _conductance_sweep(und, ranked, m2, sweep_l)
    und.unpersist()
    return out, {
        "best_k": int(best["k"]),
        "best_phi": float(best["phi"]) if best["phi"] is not None else None,
        "m": m2 // 2,
        "seconds": time.monotonic() - t0,
    }
