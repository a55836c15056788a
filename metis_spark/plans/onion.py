"""Onion decomposition — the multi-scale refinement of k-core peeling
(Hébert-Dufresne, Allard, Young, "Multi-scale structure and topological
anomaly detection via a new network statistic: the onion decomposition",
Sci. Rep. 2016). Each synchronous peeling SWEEP is one layer: with the
running threshold k (never decreasing), remove ALL vertices of current
degree ≤ k simultaneously; when nothing qualifies, k rises to the new
minimum degree. A vertex's layer is the sweep that removed it and its
core number is k at removal — so the output refines coreness
(plans/coreness.py computes the same ``core`` by h-index fixpoint,
pinned equal in tests) while ``layer`` adds the within-core depth the
h-index view cannot see.

This plan is deliberately the SWEEP formulation (layers are its
output); the round count is the layer count, not degeneracy-many peels
per k. Shape per round: one map-side-partial degree groupBy over the
shrinking live edge set, one scalar min (rides the same agg), one
anti-join removal — edge set halves fast on web-shaped graphs, and
every round commits (state + lineage + metrics) through
CheckpointManager with mid-algorithm resume.

Reference parity: /root/reference/Metis has no decomposition operators;
this completes the family next to kcore/coreness/trussness.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager


def onion_decomposition(
    edges: DataFrame,
    max_layers: int = 200,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
    retain: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → (out(id, layer, core), info{layers, converged,
    seconds, n}). Undirected view (symmetrized, self-loops dropped);
    isolated-by-peeling vertices keep degree 0 and are removed at the
    current k.

    ``checkpoint_every=k`` / ``retain``: the shared durability dial
    (plans/checkpoint.py:step) — durable commit (carrying the running
    threshold ``k_cur`` for resume) every k-th sweep and at convergence,
    one localCheckpoint job otherwise; layers are identical for every k."""
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_onion_")
    cm = CheckpointManager(checkpoint_dir, "onion", retain=retain)

    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(num_partitions, "src")
    )
    # materialize the symmetrized view once: re-used as the re-root base
    # of the live_edges chain every durable round (fixed, honest stats)
    und = und.localCheckpoint(eager=True)
    verts = und.select(F.col("src").alias("id")).distinct()
    n = verts.count()

    # state: (id, layer, core) — layer NULL (-1) while still live
    state = verts.select(
        "id", F.lit(-1).cast("long").alias("layer"), F.lit(-1).cast("long").alias("core")
    )
    live_edges = und
    k_cur = 0

    start = 0
    done = False
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, meta = cm.load(spark, k0)
            state = st.select("id", "layer", "core")
            start = k0
            k_cur = int(meta.get("k_cur", 0))
            done = bool(meta.get("converged"))
            if not done:
                live = state.where(F.col("layer") < 0).select("id")
                live_edges = (
                    und.join(live.select(F.col("id").alias("src")), "src")
                    .join(live.select(F.col("id").alias("dst")), "dst")
                    .select("src", "dst")
                    .localCheckpoint(eager=True)
                )

    t0 = time.monotonic()
    converged = done
    r = start
    while not done and r < max_layers:
        r += 1
        it_t0 = time.monotonic()
        live = state.where(F.col("layer") < 0).select("id")
        if live.isEmpty():  # empty graph / everything already assigned
            converged = True
            r -= 1
            break
        deg = (
            live_edges.groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        )
        dl = live.join(deg.hint("shuffle_hash"), "id", "left").select(
            "id", F.coalesce("deg", F.lit(0)).cast("long").alias("deg")
        )
        mind = dl.agg(F.min("deg")).collect()[0][0]
        k_cur = max(k_cur, int(mind))
        rm = dl.where(F.col("deg") <= k_cur).select("id")
        nxt = (
            state.select("id", F.col("layer").alias("ol"), F.col("core").alias("oc"))
            .join(rm.select("id", F.lit(True).alias("hit")).hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.when(F.col("hit") & (F.col("ol") < 0), F.lit(r))
                .otherwise(F.col("ol")).cast("long").alias("layer"),
                F.when(F.col("hit") & (F.col("ol") < 0), F.lit(k_cur))
                .otherwise(F.col("oc")).cast("long").alias("core"),
            )
        )
        aggs = {"live": F.sum((F.col("layer") < 0).cast("long"))}
        durable = checkpoint_every <= 1 or r % checkpoint_every == 0 or r == max_layers
        st, totals = cm.step(r, nxt, {"k_cur": k_cur}, extra_aggs=aggs, durable=durable)
        n_live = int(totals["live"] or 0)
        converged = n_live == 0
        if converged and not durable:
            st, totals = cm.commit(r, st, {"k_cur": k_cur}, extra_aggs=aggs)
            durable = True
        if durable:
            cm.update_meta(r, {"converged": converged, "live": n_live})
        cm.append_metrics(
            {"iter": r, "delta": float(n_live), "k": k_cur,
             "seconds": time.monotonic() - it_t0, "rows": int(totals["rows"]),
             "committed": durable}
        )
        state = st.select("id", "layer", "core")
        if converged:
            break
        keep = state.where(F.col("layer") < 0).select("id")
        # Spark 4's localCheckpoint re-attaches the truncated plan's
        # sizeInBytes estimate to the new LogicalRDD, and join stats
        # MULTIPLY — chaining live_edges(k) = live_edges(k-1) ⋈ state(k)
        # where state(k) itself derives from live_edges(k-1) SQUARES the
        # BigInt estimate every sweep (digits double; by sweep ~17
        # Catalyst spends minutes in BigInteger.multiplyToomCook3 — the
        # r4 0.6s→80s spike). Durable rounds re-read state from parquet
        # (honest stats), so re-rooting the chain off `und` there resets
        # the estimate; between commits digit growth is bounded by
        # 2^checkpoint_every of the base. Execution cost: one full-|und|
        # join per durable round instead of the shrunk chain — amortized,
        # and exact (und ⋈ live vertices IS the live edge set).
        chain_base = und if durable else live_edges
        live_edges = (
            chain_base.join(keep.select(F.col("id").alias("src")).hint("shuffle_hash"), "src")
            .join(keep.select(F.col("id").alias("dst")).hint("shuffle_hash"), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )

    return state.select("id", "layer", "core"), {
        "layers": r,
        "converged": converged,
        "seconds": time.monotonic() - t0,
        "n": n,
    }
