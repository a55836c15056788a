"""Balanced k-way graph partitioning: one multilevel V-cycle.

The METIS recipe (Karypis & Kumar, SIAM J. Sci. Comput. 1998) re-expressed
as three relational stages:

1. **Coarsen** — heavy-edge maximal matching (plans/matching.py with the
   inverted 2^60 - w priority, exactly the `heavy_edge_coarsen` step) and
   contract each matched pair to its min vertex. Heavy edges become
   intra-vertex, so whatever cut the coarse partition has, the projected
   fine partition inherits it with the matched (heaviest) edges already
   uncut.
2. **Initial partition** — deterministic md5-hash assignment of the
   COARSE vertices to k parts. Hashing the quotient instead of the fine
   graph is already strictly better than fine-level hash partitioning in
   expectation: each matched pair contributes 0 cut edges instead of
   (k-1)/k.
3. **Uncoarsen + refine** — project labels to the fine graph, then
   greedy boundary refinement: every vertex computes its neighbor-part
   histogram and bids to move to the majority part (deterministic
   tie-break: higher count, then smaller part id); a move is applied only
   if its gain is strictly positive AND the destination part stays under
   the hard balance cap floor((1+eps)*n/k). Moves are staged by a
   deterministic vertex-hash parity (two sub-rounds per pass) so adjacent
   vertices do not all swap simultaneously — the relational stand-in for
   KL/FM's sequential scan order.

Determinism: every random choice (edge weight, part assignment, move
parity) is the 60-bit md5 trick both engines replay bit-for-bit, so the
unrolled DuckDB twin hash-matches the full per-vertex assignment.

Scale shape:
- the canonical edge table is persisted once; each refinement sub-round
  is one SHJ gather (adjacency x parts), one map-side-combined groupBy
  for the histograms, one map-side ``max_by`` argmax — no window over
  |E|;
- the single rank window (the balance arbiter) is partitioned by
  DESTINATION part — k partitions over only the positive-gain boundary
  candidates, the classic serialization point of parallel FM refinement,
  bounded far below |V|;
- coarsening inherits plans/matching.py's checkpoint/resume contract and
  durability dial; refinement is a fixed 2*refine_passes sub-rounds over
  persisted state.

Reference parity: /root/reference/Metis (the namesake) motivates the
operator family; the reference repo itself has no partitioner — this
completes the multilevel pipeline `heavy_edge_coarsen` was built to feed
(VERDICT r3 item 5).
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HEC_MAXP = 1 << 60  # heavy-edge priority inversion: p = 2^60 - weight


def _h60(prefix: str, col: F.Column) -> F.Column:
    """60-bit md5 hash both engines replay (`('0x'||substr(md5(..),1,15))`
    in DuckDB)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def edge_cut(edges: DataFrame, parts: DataFrame) -> DataFrame:
    """Number of canonical undirected edges whose endpoints land in
    different parts — one row ``(cut)``. Two SHJ label joins, one count."""
    ce = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    pa = parts.select(F.col("id").alias("a"), F.col("part").alias("part_a"))
    pb = parts.select(F.col("id").alias("b"), F.col("part").alias("part_b"))
    return (
        ce.join(pa, "a")
        .join(pb, "b")
        .where(F.col("part_a") != F.col("part_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("cut"))
    )


def hash_partition(edges: DataFrame, k: int) -> DataFrame:
    """The baseline the V-cycle must beat: md5-hash each FINE vertex to a
    part. Same hash family as the coarse initial assignment, so the two
    are comparable like-for-like."""
    verts = (
        edges.select(F.least("src", "dst").alias("id"))
        .unionByName(edges.select(F.greatest("src", "dst").alias("id")))
        .where(F.col("id").isNotNull())
        .distinct()
    )
    return verts.select(
        "id", (_h60("part_", F.col("id")) % k).cast("long").alias("part")
    )


def kway_partition(
    edges: DataFrame,
    k: int = 8,
    eps: float = 0.1,
    refine_passes: int = 1,
    checkpoint_dir: str | None = None,
    max_match_iter: int = 50,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) -> (parts(id, part), info).

    info: {n, k, cap, match_iterations, match_converged, moves (list per
    sub-round), seconds}. ``cap`` is the hard balance bound
    floor((1+eps)*n/k) computed integer-exactly as (n*(10+10*eps))//(10*k)
    with eps quantized to tenths (so DuckDB replays it as integer
    division)."""
    from metis_spark.plans.matching import maximal_matching

    t0 = time.monotonic()
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_partition_")
    spark = edges.sparkSession

    ce = (
        edges.select(
            F.least("src", "dst").cast("long").alias("a"),
            F.greatest("src", "dst").cast("long").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    # heavy-edge coarsening: same weight + inverted priority as
    # heavy_edge_coarsen (md5 of the canonical "a_b" pair)
    w = F.conv(
        F.substring(
            F.md5(
                F.concat_ws("_", F.col("a").cast("string"), F.col("b").cast("string"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    prio = ce.select(
        F.col("a").alias("src"), F.col("b").alias("dst"),
        (F.lit(HEC_MAXP) - w).alias("p"),
    )
    match, minfo = maximal_matching(
        prio, priority_col="p", max_iter=max_match_iter,
        checkpoint_dir=checkpoint_dir, checkpoint_every=5, retain=2,
    )
    lab = match.select(
        F.col("src").alias("id"), F.col("src").alias("lab")
    ).unionByName(match.select(F.col("dst").alias("id"), F.col("src").alias("lab")))

    verts = (
        ce.select(F.col("a").alias("id"))
        .unionByName(ce.select(F.col("b").alias("id")))
        .distinct()
    )
    n = verts.count()
    eps10 = int(round(eps * 10))
    cap = (n * (10 + eps10)) // (10 * k)

    # initial partition: hash the COARSE label, projected to fine vertices
    parts = verts.join(lab, "id", "left").select(
        "id",
        (_h60("part_", F.coalesce("lab", "id")) % k).cast("long").alias("part"),
    ).persist()
    parts.count()

    adj = ce.select(F.col("a").alias("v"), F.col("b").alias("u")).unionByName(
        ce.select(F.col("b").alias("v"), F.col("a").alias("u"))
    ).persist()

    moves = []
    for _ in range(refine_passes):
        for parity in (0, 1):
            hist = (
                adj.join(
                    parts.select(F.col("id").alias("u"), F.col("part").alias("pu")),
                    "u",
                )
                .groupBy("v", "pu")
                .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            )
            best = hist.groupBy("v").agg(
                F.max("cnt").alias("best_cnt"),
                F.max_by(
                    F.col("pu"), F.struct(F.col("cnt"), (-F.col("pu")).alias("np"))
                ).alias("best_pu"),
            )
            cur = parts.select(F.col("id").alias("v"), F.col("part").alias("cur"))
            own = hist.join(
                cur.withColumnRenamed("cur", "pu"), ["v", "pu"]
            ).select("v", F.col("cnt").alias("own_cnt"))
            cand = (
                best.join(cur, "v")
                .join(own, "v", "left")
                .select(
                    "v",
                    F.col("best_pu").alias("dest"),
                    (F.col("best_cnt") - F.coalesce("own_cnt", F.lit(0))).alias(
                        "gain"
                    ),
                    "cur",
                )
                .where(
                    (F.col("dest") != F.col("cur"))
                    & (F.col("gain") > 0)
                    & (_h60("mv_", F.col("v")) % 2 == parity)
                )
            )
            sizes = parts.groupBy(F.col("part").alias("dest")).agg(
                F.count(F.lit(1)).cast("long").alias("sz")
            )
            rank_w = Window.partitionBy("dest").orderBy(
                F.desc("gain"), F.asc("v")
            )
            acc = (
                cand.join(sizes, "dest", "left")
                .withColumn("rn", F.row_number().over(rank_w))
                .where(F.col("rn") <= F.lit(cap) - F.coalesce("sz", F.lit(0)))
                .select(F.col("v").alias("id"), F.col("dest"))
            )
            nxt = (
                parts.join(acc, "id", "left")
                .select("id", F.coalesce("dest", "part").cast("long").alias("part"))
                .persist()
            )
            n_moved = nxt.join(
                parts.withColumnRenamed("part", "old"), "id"
            ).where(F.col("part") != F.col("old")).count()
            moves.append(int(n_moved))
            parts.unpersist()
            parts = nxt

    ce.unpersist()
    adj.unpersist()
    return parts, {
        "n": n,
        "k": k,
        "cap": cap,
        "match_iterations": minfo["iterations"],
        "match_converged": minfo["converged"],
        "moves": moves,
        "seconds": time.monotonic() - t0,
    }
