"""Strongly connected components (directed) — min-label FW-BW phases.

The undirected CC plan (components.py) cannot see edge direction; a
link-graph user asking "which modules form import cycles?" needs SCC.
Distributed algorithm (the min-label variant of FW-BW peeling):

  phase over the ACTIVE subgraph:
    fwd(v) = min active id that can REACH v   (min-propagation along edges)
    bwd(v) = min active id REACHABLE FROM v   (min-propagation along
                                               reversed edges)
    fwd(v) == bwd(v) == m  ⟺  v and m are mutually reachable, so the
    equality set is a union of complete SCCs (every vertex of SCC(m)
    shares both labels); settle those, remove them, repeat.

Each phase settles at least the SCC of the smallest active id, so the
phase count is bounded by the graph's "SCC peeling depth" — small on
web-shaped graphs (one giant SCC + shallow tail), O(#SCC) only on
adversarial chains. Each propagation round is the same join+agg shape
as connected_components: edge side hash-partitioned once per phase and
reused, SHJ hints, min-fold with map-side partial aggregation absorbing
hubs, fixpoint by zero-changed count folded into an Observation.

Checkpoint contract: one durable commit per PHASE (state = settled
assignments ∪ active labels); resume restarts at the last completed
phase — the mid-algorithm resume granularity that matters here, since
phases, not rounds, are the expensive unit.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager


def _min_propagate(e: DataFrame, labels: DataFrame, max_rounds: int) -> DataFrame:
    """Fixpoint of label(v) = min(label(v), min over e-incoming labels).
    ``e`` is (src, dst) — propagation flows src→dst."""
    for r in range(max_rounds):
        obs = Observation(f"scc_prop_{id(e)}_{r}")
        incoming = (
            e.join(labels.hint("shuffle_hash"), e["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("label").alias("minl"))
        )
        nxt = (
            labels.join(incoming.hint("shuffle_hash"), labels["id"] == incoming["dst"], "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("minl"), F.col("label"))).alias("label"),
                F.col("label").alias("old"),
            )
        )
        nxt = nxt.observe(
            obs, F.sum((F.col("label") < F.col("old")).cast("long")).alias("changed")
        ).select("id", "label").localCheckpoint(eager=True)
        labels = nxt
        if int(obs.get["changed"] or 0) == 0:
            break
    return labels


def strongly_connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_phases: int = 30,
    max_rounds: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
    retain: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → (labels(id, scc), info). scc = min vertex id of
    the component; single vertices (no cycle through them) settle as
    their own SCC.

    ``checkpoint_every=k`` / ``retain``: the shared durability dial
    (plans/checkpoint.py:step), here at PHASE granularity (inner
    propagation rounds are already localCheckpoint-truncated) — durable
    commit every k-th phase and at convergence; resume lands on the last
    COMMITTED phase; labels are identical for every setting."""
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_scc_")
    cm = CheckpointManager(checkpoint_dir, "scc", retain=retain)

    e_all = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(num_partitions, "src")
        .persist()
    )
    if vertices is None:
        verts = (
            e_all.select(F.col("src").alias("id"))
            .unionByName(e_all.select(F.col("dst").alias("id")))
            .distinct()
        )
    else:
        verts = vertices.select(F.col("id").cast("long"))

    # state rows: (id, scc, settled); active vertices carry scc = NULL
    state = verts.select("id", F.lit(None).cast("long").alias("scc"))
    start_phase = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, meta = cm.load(spark, k0)
            state = st.select("id", "scc")
            start_phase = k0
            if meta.get("converged"):
                e_all.unpersist()
                return state.select("id", "scc"), {
                    "phases": k0, "converged": True, "seconds": 0.0, "resumed": True,
                }

    t0 = time.monotonic()
    converged = False
    k = start_phase
    for k in range(start_phase + 1, max_phases + 1):
        ph_t0 = time.monotonic()
        active = state.where(F.col("scc").isNull()).select("id").persist()
        n_active = active.count()
        if n_active == 0:
            converged = True
            active.unpersist()
            break
        # active-induced edge subset, partitioned by the propagation key
        # (fwd flows src→dst; the reversed copy is built from the same rows)
        e_act = (
            e_all.join(active.hint("shuffle_hash"), e_all["src"] == active["id"])
            .select("src", "dst")
            .join(
                active.select(F.col("id").alias("_d")).hint("shuffle_hash"),
                F.col("dst") == F.col("_d"),
            )
            .select("src", "dst")
            .repartition(num_partitions, "src")
            .persist()
        )
        e_rev = (
            e_act.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            .repartition(num_partitions, "src")
            .persist()
        )
        init = active.select("id", F.col("id").alias("label")).localCheckpoint(eager=True)
        fwd = _min_propagate(e_act, init, max_rounds)
        bwd = _min_propagate(e_rev, init, max_rounds)
        settled = (
            fwd.select("id", F.col("label").alias("f"))
            .join(bwd.select("id", F.col("label").alias("b")).hint("shuffle_hash"), "id")
            .where(F.col("f") == F.col("b"))
            .select("id", F.col("f").alias("new_scc"))
        )
        new_state = (
            state.join(settled.hint("shuffle_hash"), "id", "left")
            .select("id", F.coalesce("scc", "new_scc").alias("scc"))
        )
        aggs = {"remaining": F.sum(F.col("scc").isNull().cast("long"))}
        durable = checkpoint_every <= 1 or k % checkpoint_every == 0 or k == max_phases
        if durable:
            new_state = new_state.repartition(max(8, num_partitions // 8))
        st, totals = cm.step(k, new_state, {"converged": False}, extra_aggs=aggs,
                             durable=durable)
        remaining = int(totals["remaining"] or 0)
        converged = remaining == 0
        if converged and not durable:
            st, totals = cm.commit(k, st, {"converged": False}, extra_aggs=aggs)
            durable = True
        if durable:
            cm.update_meta(k, {"converged": converged, "remaining": remaining})
        cm.append_metrics(
            {"iter": k, "delta": float(remaining), "seconds": time.monotonic() - ph_t0,
             "rows": n_active, "committed": durable}
        )
        state = st.select("id", "scc")
        active.unpersist()
        e_act.unpersist()
        e_rev.unpersist()
        if converged:
            break

    e_all.unpersist()
    return state.select("id", "scc"), {
        "phases": k, "converged": converged, "seconds": time.monotonic() - t0,
    }


def condensation_levels(
    edges: DataFrame,
    labels: DataFrame,
    max_rounds: int = 100,
) -> DataFrame:
    """Longest-path levels of the SCC condensation DAG → (id, scc, level).

    THE dependency-graph scheduling query: contract each SCC (cycle
    group) to one node, then level(c) = longest path from any root —
    everything at level k can build once levels < k are done. ``labels``
    is the (id, scc) output of strongly_connected_components (already
    checkpointed/resumable there; this derivation converges in
    DAG-depth rounds of one join+agg each — max-fold propagation,
    map-side combining, plan truncated per round).
    """
    lab = labels.select("id", "scc")
    ls = lab.select(F.col("id").alias("src"), F.col("scc").alias("cs"))
    ld = lab.select(F.col("id").alias("dst"), F.col("scc").alias("cd"))
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    num_partitions = max(8, e.sparkSession.sparkContext.defaultParallelism)
    ec = (
        e.join(ls.hint("shuffle_hash"), "src")
        .join(ld.hint("shuffle_hash"), "dst")
        .where(F.col("cs") != F.col("cd"))
        .select("cs", "cd")
        .distinct()
        .repartition(num_partitions, "cs")
        .persist()
    )
    lv = lab.select(F.col("scc").alias("c")).distinct().select(
        "c", F.lit(0).cast("long").alias("level")
    ).localCheckpoint(eager=True)
    for r in range(max_rounds):
        obs = Observation(f"dag_lv_{r}")
        incoming = (
            ec.join(lv.hint("shuffle_hash"), ec["cs"] == lv["c"])
            .groupBy("cd")
            .agg((F.max("level") + 1).alias("in_lv"))
        )
        nxt = (
            lv.join(incoming.hint("shuffle_hash"), lv["c"] == incoming["cd"], "left")
            .select(
                "c",
                F.greatest(F.col("level"), F.coalesce(F.col("in_lv"), F.col("level"))).alias("level"),
                F.col("level").alias("old"),
            )
            .observe(obs, F.sum((F.col("level") > F.col("old")).cast("long")).alias("changed"))
            .select("c", "level")
            .localCheckpoint(eager=True)
        )
        lv = nxt
        if int(obs.get["changed"] or 0) == 0:
            break
    ec.unpersist()
    return (
        lab.join(lv.hint("shuffle_hash"), lab["scc"] == lv["c"])
        .select("id", "scc", "level")
    )


def condensation_critical_path(
    edges: DataFrame,
    labels: DataFrame,
    max_rounds: int = 100,
) -> DataFrame:
    """Weighted critical path of the SCC condensation DAG → (step, scc,
    scc_size, ef) — THE build-scheduling query one level past
    condensation_levels: with node cost = SCC size (a cycle tangle
    builds as one unit, so its cost is its member count), earliest
    finish is

        ef(c) = size(c) + max(ef(pred), 0)

    and the critical path (the chain that lower-bounds any parallel
    build's makespan) is the backtrace from the argmax-ef sink, at each
    hop to the max-ef predecessor. Rows are emitted in build order
    (step 1 = root); ef is strictly increasing along the path (size ≥ 1),
    so (step ↔ ef asc) is a total order any engine replays.

    Scale shape: the quotient DAG is |SCC-classes| nodes — the fixpoint
    is one join+max-agg per round for DAG-depth rounds (Observation
    early-exit, localCheckpoint truncation, as condensation_levels);
    the backtrace is ≤ depth driver steps of orderBy().limit(1) on the
    quotient, each a TakeOrdered over one vertex's predecessor set.
    """
    lab = labels.select("id", "scc")
    ls = lab.select(F.col("id").alias("src"), F.col("scc").alias("cs"))
    ld = lab.select(F.col("id").alias("dst"), F.col("scc").alias("cd"))
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    num_partitions = max(8, e.sparkSession.sparkContext.defaultParallelism)
    ec = (
        e.join(ls.hint("shuffle_hash"), "src")
        .join(ld.hint("shuffle_hash"), "dst")
        .where(F.col("cs") != F.col("cd"))
        .select("cs", "cd")
        .distinct()
        .repartition(num_partitions, "cs")
        .persist()
    )
    sizes = (
        lab.groupBy(F.col("scc").alias("c"))
        .agg(F.count(F.lit(1)).cast("long").alias("sz"))
        .persist()
    )
    ef = sizes.select("c", "sz", F.col("sz").alias("ef")).localCheckpoint(eager=True)
    for r in range(max_rounds):
        obs = Observation(f"dag_cp_{r}")
        incoming = (
            ec.join(ef.hint("shuffle_hash"), ec["cs"] == ef["c"])
            .groupBy("cd")
            .agg(F.max("ef").alias("pef"))
        )
        nxt = (
            sizes.join(incoming.hint("shuffle_hash"), sizes["c"] == incoming["cd"], "left")
            .select(
                "c", "sz",
                (F.col("sz") + F.coalesce(F.col("pef"), F.lit(0))).cast("long").alias("ef"),
                )
            .join(ef.select(F.col("c").alias("c2"), F.col("ef").alias("old")),
                  F.col("c") == F.col("c2"))
            .observe(obs, F.sum((F.col("ef") > F.col("old")).cast("long")).alias("changed"))
            .select("c", "sz", "ef")
            .localCheckpoint(eager=True)
        )
        ef = nxt
        if int(obs.get["changed"] or 0) == 0:
            break
    # backtrace: argmax-ef sink, then max-ef predecessor per hop
    path = []
    cur = ef.orderBy(F.desc("ef"), F.asc("c")).limit(1).collect()
    while cur:
        row = cur[0]
        path.append((int(row["c"]), int(row["sz"]), int(row["ef"])))
        cur = (
            ec.where(F.col("cd") == int(row["c"]))
            .join(ef, ec["cs"] == ef["c"])
            .orderBy(F.desc("ef"), F.asc("c"))
            .limit(1)
            .collect()
        )
    ec.unpersist()
    sizes.unpersist()
    path.reverse()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(i + 1, c, sz, e_) for i, (c, sz, e_) in enumerate(path)],
        "step long, scc long, scc_size long, ef long",
    )


def dag_width_profile(levels: DataFrame) -> DataFrame:
    """(scc, level) rows → per-level build-parallelism profile (level,
    width, n_tasks, critical_path, makespan_p8, makespan_p32). Each
    distinct SCC is one composite build task; width(k) is the
    parallelism level k admits, and the makespan columns are Brent's
    bound max(⌈n/p⌉, depth) — the wall-clock floor for a p-worker
    build farm. All-integer; the per-level groupBy is histogram-sized
    and the one-row summary broadcasts back."""
    comps = levels.select("scc", "level").distinct()
    width = comps.groupBy("level").agg(F.count(F.lit(1)).cast("long").alias("width"))
    summary = comps.agg(
        F.count(F.lit(1)).cast("long").alias("n_tasks"),
        (F.max("level") + 1).cast("long").alias("critical_path"),
    ).select(
        "n_tasks",
        "critical_path",
        F.greatest(
            F.expr("(n_tasks + 7) div 8"), F.col("critical_path")
        ).cast("long").alias("makespan_p8"),
        F.greatest(
            F.expr("(n_tasks + 31) div 32"), F.col("critical_path")
        ).cast("long").alias("makespan_p32"),
    )
    return width.crossJoin(F.broadcast(summary)).select(
        "level", "width", "n_tasks", "critical_path", "makespan_p8", "makespan_p32"
    )
