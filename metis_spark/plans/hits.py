"""HITS (hubs & authorities) as iterative DataFrame joins on the shared
checkpoint spine.

Kleinberg's algorithm per iteration k (adjacency A, vertices V):

    a_raw(v) = Σ_{u→v} h_{k-1}(u)          (authority gather)
    h_raw(u) = Σ_{u→v} a_raw(v)            (hub gather — uses the NEW,
                                            un-normalized authorities)
    a_k = a_raw / ‖a_raw‖₂ ,  h_k = h_raw / ‖h_raw‖₂

Scale design (mirrors plans/pagerank.py — the reference analog is the
iterative kernel family of SURVEY.md §2.10):

- TWO persisted copies of the edge list, hash-partitioned by ``src`` and
  by ``dst`` respectively: the hub-side gather joins exchange-free on
  ``src``, the authority-side gather exchange-free on ``dst``; each
  iteration's only wide shuffles are the two contribution groupBys, which
  partial-aggregate map-side (in/out-degree hubs absorbed before the
  exchange);
- normalization is deferred: the state stores RAW sums (uhub, uauth) and
  the two squared norms fold into the same single-pass lineage scan the
  checkpoint commit already runs (``extra_aggs``), so the 1/‖·‖ factors
  are driver-side constants applied to the NEXT gather — no extra jobs,
  no normalization shuffle;
- the intermediate authority aggregation feeds two consumers (the final
  state and the hub gather); it is persisted for the iteration and
  dropped right after the state materializes, so it is computed once;
- every k-th iteration commits (state, per-partition lineage, metrics)
  through CheckpointManager and resumes mid-algorithm, identical to the
  PageRank contract; non-commit iterations truncate lineage with an
  eager localCheckpoint + Observation (one Spark job).

Convergence: L1 delta over the NORMALIZED hub+auth vectors, folded into
the SAME single commit/observe scan as the norms — the chicken-and-egg
(delta needs this iteration's norm, the norm comes out of the scan) is
broken by lagging one step, like pagerank.py carries the previous
dangling constant: during iteration k the constants 1/‖h_{k-1}‖ and
1/‖a_{k-1}‖ are already known, and the state still holds both raw_{k-1}
(uhub/uauth) and normalized_{k-2} (old_hub/old_auth), so
delta_{k-1} = Σ|raw_{k-1}·inv − old| rides iteration k's lineage scan as
one extra sum — tol>0 costs ZERO extra Spark jobs per iteration. The
loop therefore stops one iteration after the fixpoint (and `info`
reports the delta of the last MEASURED iteration); one extra converged
iteration is far cheaper than one extra full-state scan per iteration.
"""

from __future__ import annotations

import math
import tempfile
import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager

_STATE_COLS = ["id", "uhub", "uauth", "old_hub", "old_auth"]


def hits(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    tol: float = 1e-9,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → (scores(id, hub, auth), info{iterations, delta,
    seconds, converged, n}). hub/auth are L2-normalized."""
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_hits_")
    cm = CheckpointManager(checkpoint_dir, "hits")

    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    e_src = e.repartition(num_partitions, "src").persist()
    e_dst = e.repartition(num_partitions, "dst").persist()

    if vertices is None:
        verts = (
            e_src.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    else:
        verts = vertices.select(F.col("id").cast("long"))
    verts = verts.persist()
    n = verts.count()
    if n == 0:
        e_src.unpersist(); e_dst.unpersist(); verts.unpersist()
        return spark.createDataFrame([], "id long, hub double, auth double"), {
            "iterations": 0, "delta": 0.0, "seconds": 0.0, "converged": True, "n": 0,
        }

    # raw-carry init: uhub = uauth = 1 ⇒ ‖·‖² = n for both
    state = verts.select(
        "id",
        F.lit(1.0).alias("uhub"),
        F.lit(1.0).alias("uauth"),
        (F.lit(1.0) / math.sqrt(n)).alias("old_hub"),
        (F.lit(1.0) / math.sqrt(n)).alias("old_auth"),
    )
    sh2, sa2 = float(n), float(n)

    start_iter = 0
    t0 = time.monotonic()
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, meta = cm.load(spark, k0)
            state = st.select(*_STATE_COLS)
            totals = meta.get("totals", {})
            sh2 = float(totals.get("sh2", n))
            sa2 = float(totals.get("sa2", n))
            start_iter = k0
            if meta.get("converged"):
                out = _normalized(state, sh2, sa2)
                e_src.unpersist(); e_dst.unpersist(); verts.unpersist()
                return out, {
                    "iterations": k0, "delta": meta.get("delta"), "seconds": 0.0,
                    "converged": True, "n": n, "resumed": True,
                }

    delta = float("inf")
    k = start_iter
    converged = False
    compute_delta = tol > 0.0
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        inv_h = 1.0 / math.sqrt(sh2)  # normalizes the PREVIOUS raw hubs
        inv_a_prev = 1.0 / math.sqrt(sa2)
        # authority gather: Σ over in-edges of normalized prev hub
        hubs = state.select("id", (F.col("uhub") * inv_h).alias("h"))
        ua = (
            e_src.join(hubs.hint("shuffle_hash"), e_src["src"] == hubs["id"])
            .groupBy("dst")
            .agg(F.sum("h").alias("ua"))
            .select(F.col("dst").alias("aid"), "ua")
            .persist()  # two consumers: hub gather + final state
        )
        # hub gather: Σ over out-edges of the RAW new authorities
        uh = (
            e_dst.join(ua.hint("shuffle_hash"), e_dst["dst"] == ua["aid"])
            .groupBy("src")
            .agg(F.sum("ua").alias("uh"))
            .select(F.col("src").alias("hid"), "uh")
        )
        # dlt = per-vertex L1 delta of ITERATION k-1, computable right now
        # because inv_h/inv_a_prev are known constants — it rides the state
        # joins (+8 bytes/row) and folds into the one commit/observe scan.
        dlt_cols = (
            [
                (
                    F.abs(F.col("uhub") * inv_h - F.col("old_hub"))
                    + F.abs(F.col("uauth") * inv_a_prev - F.col("old_auth"))
                ).alias("dlt")
            ]
            if compute_delta
            else []
        )
        new_state = (
            state.select(
                "id",
                (F.col("uhub") * inv_h).alias("old_hub"),
                (F.col("uauth") * inv_a_prev).alias("old_auth"),
                *dlt_cols,
            )
            .join(ua.hint("shuffle_hash"), F.col("id") == ua["aid"], "left")
            .drop("aid")
            .join(uh.hint("shuffle_hash"), F.col("id") == uh["hid"], "left")
            .drop("hid")
            .select(
                "id",
                F.coalesce("uh", F.lit(0.0)).alias("uhub"),
                F.coalesce("ua", F.lit(0.0)).alias("uauth"),
                "old_hub",
                "old_auth",
                *(["dlt"] if compute_delta else []),
            )
        )
        extra_aggs = {
            "sh2": F.sum(F.col("uhub") * F.col("uhub")),
            "sa2": F.sum(F.col("uauth") * F.col("uauth")),
        }
        if compute_delta:
            extra_aggs["dsum"] = F.sum("dlt")
        committed = checkpoint_every <= 1 or k % checkpoint_every == 0 or k == max_iter
        if committed:
            condensed = new_state.repartition(max(8, num_partitions // 8))
            st, totals = cm.commit(k, condensed, {"converged": False}, extra_aggs=extra_aggs)
        else:
            obs = Observation(f"hits_iter_{k}")
            st = new_state.observe(
                obs, *[c.alias(name) for name, c in extra_aggs.items()]
            ).localCheckpoint(eager=True)
            totals = obs.get
        ua.unpersist()
        sh2 = float(totals["sh2"])
        sa2 = float(totals["sa2"])
        state = st.select(*_STATE_COLS)
        if compute_delta and (k > start_iter + 1 or start_iter > 0):
            # lagged fold: totals["dsum"] is the L1 delta of iteration k-1
            # (zero extra jobs). The cold-start first loop pass is skipped —
            # its old_* columns are the synthetic init, so dsum would be a
            # spurious 0. On resume (start_iter > 0) the checkpointed old_*
            # are genuine, so the first pass already measures correctly.
            delta = float(totals["dsum"])
            converged = delta < tol
        if converged and not committed:
            st, totals = cm.commit(
                k,
                state,
                {"converged": False},
                extra_aggs={k2: v for k2, v in extra_aggs.items() if k2 != "dsum"},
            )
            state = st.select(*_STATE_COLS)
            committed = True
        if committed:
            cm.update_meta(k, {"converged": converged, "delta": delta if tol > 0 else None})
        cm.append_metrics(
            {
                "iter": k,
                "delta": delta if tol > 0 else None,
                "seconds": time.monotonic() - it_t0,
                "rows": n,
                "sh2": sh2,
                "sa2": sa2,
                "committed": committed,
            }
        )
        if converged:
            break

    out = _normalized(state, sh2, sa2)
    e_src.unpersist(); e_dst.unpersist(); verts.unpersist()
    return out, {
        "iterations": k,
        "delta": float(delta),
        "seconds": time.monotonic() - t0,
        "converged": converged,
        "n": n,
    }


def _normalized(state: DataFrame, sh2: float, sa2: float) -> DataFrame:
    inv_h = 1.0 / math.sqrt(sh2) if sh2 > 0 else 0.0
    inv_a = 1.0 / math.sqrt(sa2) if sa2 > 0 else 0.0
    return state.select(
        "id",
        (F.col("uhub") * inv_h).alias("hub"),
        (F.col("uauth") * inv_a).alias("auth"),
    )
