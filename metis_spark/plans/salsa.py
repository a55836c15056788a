"""SALSA (Stochastic Approach for Link-Structure Analysis, Lempel &
Moran 2000) — the third classic link-analysis ranking next to PageRank
and HITS, and the one the reference's iterative kernel family
(SURVEY.md §2.10) is missing: HITS's mutual reinforcement with the
adjacency matrix replaced by RANDOM-WALK (degree-normalized) transitions,

    a_k(j) = Σ_{i→j} h_{k-1}(i) / outdeg(i)
    h_k(i) = Σ_{i→j} a_k(j)     / indeg(j)

i.e. a forward step of the hub chain then a backward step of the
authority chain on the bipartite support graph. Both transition
matrices are column-stochastic, so mass is conserved — UNLIKE HITS
there is NO normalization pass at all: no extra scan, no deferred
constant, nothing. Σ a_k = Σ h_k = 1 every iteration (pinned by test).

Scale design (same contract as plans/hits.py, whose dual-partitioned
edge layout this reuses):

- the edge table is pre-joined ONCE with 1/outdeg(src) and
  1/indeg(dst) weights, then persisted twice — hash-partitioned by
  ``src`` for the hub gather and by ``dst`` for the authority gather —
  so BOTH per-iteration joins are exchange-free on the edge side;
- each gather partial-aggregates map-side (hub in/out-degrees absorbed
  before the exchange); per iteration: two SHJ joins + two groupBys,
  zero driver-side data movement;
- every iteration commits (state + per-partition lineage + metrics)
  through CheckpointManager and resumes mid-algorithm; the L1 hub
  delta rides the commit's single lineage scan (``extra_aggs``).
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager


def salsa(
    edges: DataFrame,
    tol: float = 0.0,
    max_iter: int = 3,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    seeds: DataFrame | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → (scores(id, hub, auth), info{iterations, delta,
    converged, seconds, n}). ``tol=0`` runs exactly ``max_iter``
    iterations (the driver-gate / unrolled-oracle mode); ``tol>0`` stops
    when the L1 hub delta drops below it. Vertices with no out-edges
    have hub = 0; with no in-edges, auth = 0.

    ``seeds`` (optional, one ``id`` column) personalizes the walk the
    way Twitter's WTF recommender seeds SALSA with the user's circle of
    trust: the initial hub mass is uniform over ``seeds ∩ hubs`` instead
    of all hubs, so authority mass concentrates in the seeds'
    neighborhood. The transition operators are unchanged (still
    column-stochastic — mass stays 1.0 every iteration); only h₀
    moves. Raises ``ValueError`` if no seed has an out-edge (the walk
    would start with zero mass)."""
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_salsa_")
    cm = CheckpointManager(checkpoint_dir, "salsa")

    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long")).distinct()
    outdeg = e0.groupBy("src").agg((1.0 / F.count(F.lit(1))).alias("wout"))
    indeg = e0.groupBy("dst").agg((1.0 / F.count(F.lit(1))).alias("win"))
    ew = e0.join(outdeg, "src").join(indeg, "dst")
    e_src = ew.repartition(num_partitions, "src").persist()
    e_dst = ew.repartition(num_partitions, "dst").persist()

    verts = (
        e0.select(F.col("src").alias("id"))
        .unionByName(e0.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(num_partitions, "id")
        .persist()
    )
    n = verts.count()
    hubs = e_src.select(F.col("src").alias("id")).distinct()
    if seeds is not None:
        # restrict the initial mass to seed hubs (left_semi: ids only
        # cross the join — the seed set is never widened or shuffled
        # with payload)
        hubs = hubs.join(
            seeds.select(F.col("id").cast("long")).distinct(), "id", "left_semi"
        )
    nh = hubs.count()
    if seeds is not None and nh == 0:
        e_src.unpersist(); e_dst.unpersist(); verts.unpersist()
        raise ValueError("salsa(seeds=): no seed vertex has an out-edge")
    if n == 0:
        e_src.unpersist(); e_dst.unpersist(); verts.unpersist()
        return spark.createDataFrame([], "id long, hub double, auth double"), {
            "iterations": 0, "delta": 0.0, "converged": True, "seconds": 0.0, "n": 0,
        }

    # state over ALL vertices: hub (0 for non-hubs), auth (0 until k≥1)
    state = verts.join(
        hubs.select("id", F.lit(1.0 / nh).alias("h0")), "id", "left"
    ).select(
        "id",
        F.coalesce("h0", F.lit(0.0)).alias("hub"),
        F.lit(0.0).alias("auth"),
    )
    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, meta = cm.load(spark, k0)
            state = st.select("id", "hub", "auth")
            start_iter = k0
            if meta.get("converged") and tol > 0:
                e_src.unpersist(); e_dst.unpersist(); verts.unpersist()
                return state, {
                    "iterations": k0, "delta": float(meta.get("delta", 0.0)),
                    "converged": True, "seconds": 0.0, "n": n, "resumed": True,
                }

    t0 = time.monotonic()
    delta = float("inf")
    converged = tol == 0.0 and start_iter >= max_iter
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        # forward: authorities gather normalized hub mass over in-edges
        a = (
            e_src.join(
                state.select(F.col("id").alias("src"), "hub").hint("shuffle_hash"),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum(F.col("hub") * F.col("wout")).alias("auth"))
            .withColumnRenamed("dst", "id")
        )
        # backward: hubs gather normalized authority mass over out-edges
        h = (
            e_dst.join(
                a.select(F.col("id").alias("dst"), "auth").hint("shuffle_hash"),
                "dst",
            )
            .groupBy("src")
            .agg(F.sum(F.col("auth") * F.col("win")).alias("hub"))
            .withColumnRenamed("src", "id")
        )
        nxt = (
            verts.join(h.hint("shuffle_hash"), "id", "left")
            .join(a.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.coalesce("hub", F.lit(0.0)).alias("hub"),
                F.coalesce("auth", F.lit(0.0)).alias("auth"),
            )
        )
        with_old = nxt.join(
            state.select("id", F.col("hub").alias("old_hub")).hint("shuffle_hash"),
            "id",
            "left",
        )
        st, totals = cm.commit(
            k,
            with_old,
            {},
            extra_aggs={
                "dsum": F.sum(F.abs(F.col("hub") - F.coalesce("old_hub", F.lit(0.0))))
            },
        )
        delta = float(totals["dsum"] or 0.0)
        converged = tol > 0 and delta < tol
        cm.update_meta(k, {"converged": converged, "delta": delta})
        cm.append_metrics(
            {"iter": k, "delta": delta, "seconds": time.monotonic() - it_t0,
             "rows": int(totals["rows"])}
        )
        state = st.select("id", "hub", "auth")
        if converged:
            break
    e_src.unpersist()
    e_dst.unpersist()
    verts.unpersist()
    return state, {
        "iterations": k,
        "delta": delta,
        "converged": converged or tol == 0.0,
        "seconds": time.monotonic() - t0,
        "n": n,
    }
