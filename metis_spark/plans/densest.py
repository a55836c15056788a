"""Densest subgraph by greedy threshold peeling (MapReduce-style).

Bahmani, Kumar & Vassilvitskii, "Densest Subgraph in Streaming and
MapReduce" (PVLDB 2012): repeatedly delete every vertex whose degree is
below 2(1+eps) times the current density rho = |E|/|V|, snapshotting the
density each round; the densest snapshot is a 2(1+eps)-approximation of
the densest subgraph, reached in O(log_{1+eps} n) rounds — the
MapReduce-friendly replacement for Charikar's one-at-a-time peel.

Distributed shape (the plans/kcore.py spine):
- the symmetric edge table is hash-partitioned by src ONCE and
  persisted; every round filters the ORIGINAL edge table against the
  current alive set with two semi-joins — no growing filter lineage;
- per-round state (id, deg) commits through CheckpointManager under the
  shared durability dial; BOTH trajectory scalars ride the commit scan
  (n = the committed row count, |E| = sum(deg)/2 via extra_aggs) — zero
  extra jobs per round;
- the removal threshold is computed DRIVER-side as the exact integer
  ceil(2*(10+eps_tenths)*e / (10*n)) — Python bigint, no overflow at any
  scale — so the executor-side predicate is a plain `deg >= thr` filter;
- progress is guaranteed: keeping every vertex would need
  sum(deg) = 2e >= 2(1+eps)e, impossible for e > 0, so each round
  removes at least one vertex and the eps-fraction argument bounds
  rounds by log_{1+eps} n.

Determinism: the trajectory (round, n, e) is integer-exact and the
threshold rule is rational arithmetic — any engine replays it
bit-for-bit, which is what the unrolled DuckDB twin does.

Reference parity: /root/reference/Metis has no densest-subgraph
operator; this extends the cohesion family (k_core/coreness/trussness/
onion) with the density objective those decompositions approximate.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager


def densest_subgraph(
    edges: DataFrame,
    eps_tenths: int = 5,
    max_iter: int = 60,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
    retain: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → (trajectory(peel_round, n_vertices, n_edges, density),
    info{rounds, converged, best_round, best_n, best_e, seconds}).

    ``eps_tenths`` is eps quantized to tenths (5 → eps=0.5, the standard
    (2+2*eps)=3-approx setting); the removal rule `deg < 2(1+eps)*e/n`
    is evaluated as the exact integer `deg < ceil(2*(10+eps_tenths)*e /
    (10*n))`. ``round`` 0 is the input graph; densities are ROUND(e/n,6).
    Vertex set = endpoints of the current edge set (isolated vertices
    never raise density and would be peeled next round anyway).

    best_round maximizes e/n by exact cross-multiplication (never float),
    ties to the earliest round."""
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_densest_")
    cm = CheckpointManager(checkpoint_dir, f"densest{eps_tenths}", retain=retain)
    thr_mult = 2 * (10 + eps_tenths)  # deg*10*n < thr_mult*e  <=>  remove

    fwd = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    e = und.repartition(num_partitions, "src").persist()
    e.count()

    def degrees(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).cast("long").alias("deg")
        )

    trajectory: list[tuple[int, int, int]] = []  # (round, n, e)
    nxt = degrees(e)
    start_iter = -1
    done = False
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            state, meta = cm.load(spark, k0)
            nxt = None
            alive_state = state.select("id", "deg")
            start_iter = k0
            done = bool(meta.get("converged"))
            # rebuild the committed prefix of the trajectory from the
            # metrics journal (driver-side JSONL; last line per round wins
            # so re-run rounds after an earlier kill don't duplicate)
            mpath = os.path.join(cm.dir, "metrics.jsonl")
            seen: dict[int, tuple[int, int]] = {}
            if os.path.exists(mpath):
                with open(mpath) as f:
                    for line in f:
                        row = json.loads(line)
                        if "n" in row and row["iter"] < k0 and row["n"] > 0:
                            seen[int(row["iter"])] = (int(row["n"]), int(row["e"]))
            trajectory = [(r, v[0], v[1]) for r, v in sorted(seen.items())]
            # the resumed threshold comes from the COMMITTED state, never
            # the journal: a kill between cm.commit(k0) and append_metrics
            # leaves the journal one round behind (or empty), and a stale
            # (n, e) would fork the peel from the DuckDB twin. One agg
            # over the loaded state recomputes round k0's exact snapshot;
            # the journal only reconstructs the k0-exclusive prefix above.
            snap = alive_state.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("deg").cast("decimal(38,0)")).alias("sd"),
            ).collect()[0]
            n0 = int(snap["n"] or 0)
            e0 = int(snap["sd"] or 0) // 2
            if n0 == 0:
                # loaded commit IS the converged round (kill landed before
                # the converged marker reached meta.json)
                done = True
                cm.update_meta(k0, {"converged": True, "n": 0, "e": 0})
            else:
                trajectory.append((k0, n0, e0))

    t0 = time.monotonic()
    converged = done
    r = start_iter
    while not done and r < max_iter:
        r += 1
        it_t0 = time.monotonic()
        if nxt is None:  # resumed: peel from the loaded committed state
            n_prev, e_prev = trajectory[-1][1], trajectory[-1][2]
            thr = -(-thr_mult * e_prev // (10 * n_prev))  # exact ceil
            alive = alive_state.where(F.col("deg") >= thr).select("id")
            nxt = degrees(
                e.join(
                    alive.select(F.col("id").alias("src")).hint("shuffle_hash"),
                    "src", "left_semi",
                ).join(
                    alive.select(F.col("id").alias("dst")).hint("shuffle_hash"),
                    "dst", "left_semi",
                )
            )
        durable = checkpoint_every <= 1 or r % checkpoint_every == 0 or r == max_iter
        state, totals = cm.step(
            r, nxt, {},
            extra_aggs={"sumdeg": F.sum(F.col("deg").cast("decimal(38,0)"))},
            durable=durable,
        )
        n_r = int(totals["rows"] or 0)
        e_r = int(totals["sumdeg"] or 0) // 2
        converged = n_r == 0
        if converged and not durable:
            state, totals = cm.commit(r, state, {})
            durable = True
        if durable:
            cm.update_meta(r, {"converged": converged, "n": n_r, "e": e_r})
        cm.append_metrics(
            {"iter": r, "delta": float(n_r), "seconds": time.monotonic() - it_t0,
             "rows": n_r, "committed": durable, "n": n_r, "e": e_r}
        )
        if converged:
            break
        trajectory.append((r, n_r, e_r))
        thr = -(-thr_mult * e_r // (10 * n_r))  # exact ceil(thr_mult*e/(10n))
        alive = state.where(F.col("deg") >= thr).select("id")
        nxt = degrees(
            e.join(
                alive.select(F.col("id").alias("src")).hint("shuffle_hash"),
                "src", "left_semi",
            ).join(
                alive.select(F.col("id").alias("dst")).hint("shuffle_hash"),
                "dst", "left_semi",
            )
        )

    e.unpersist()
    # argmax of e/n by cross-multiplication: e1/n1 > e2/n2 <=> e1*n2 > e2*n1
    best = trajectory[0] if trajectory else (0, 0, 0)
    for snap in trajectory[1:]:
        if snap[2] * best[1] > best[2] * snap[1]:
            best = snap
    out = spark.createDataFrame(
        [(t[0], t[1], t[2]) for t in trajectory],
        "peel_round long, n_vertices long, n_edges long",
    ).withColumn("density", F.round(F.col("n_edges") / F.col("n_vertices"), 6))
    return out, {
        "rounds": r,
        "converged": converged,
        "best_round": best[0],
        "best_n": best[1],
        "best_e": best[2],
        "seconds": time.monotonic() - t0,
    }
