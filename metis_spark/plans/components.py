"""Connected components via alternating large-star / small-star hash-min.

DataFrame re-expression of the two-phase algorithm from "Connected
Components in MapReduce and Beyond" (Kiveris et al., SoCC 2014) — the
algorithm BASELINE.json's north_rule names explicitly:

  large-star(E): for each u over the undirected neighborhood Γ(u),
      m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u) with v > u
  small-star(E): orient edges large→small (u > v); for each u,
      m = min(Γ⁻(u) ∪ {u}); emit (v, m) for v ∈ Γ⁻(u) ∪ {u}, v ≠ m

Both steps are groupBy-min + join — pure shuffles with map-side partial
min, so hub vertices cost O(1) combiner state per mapper. Convergence in
O(log² n) rounds; each round's edge set is checkpointed (plan truncation
+ resume), and the fixpoint test is (count, order-insensitive checksum)
equality between consecutive rounds.

Output: labels(id, component) where component = min vertex id reachable —
exact, deterministic.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager


def _min_star(edges: DataFrame, large: bool, dedup: bool = True) -> DataFrame:
    """One star operation over canonical directed edges (src > dst kept).

    ``dedup=False`` skips the trailing distinct when the caller's next step
    dedups anyway (the canonicalize+distinct after small-star) — one full
    shuffle saved per round.
    """
    if large:
        # undirected neighborhoods
        nbrs = edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    else:
        nbrs = edges  # already oriented large → small by the caller
    m = (
        nbrs.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select("src", F.least("_mn", F.col("src")).alias("m"))
    )
    # SHJ: m is one row per src (|V|-bounded) — never re-sort the edge side
    joined = nbrs.join(m.hint("shuffle_hash"), "src")
    if large:
        out = joined.where(F.col("dst") > F.col("src")).select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    else:
        out = (
            joined.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .unionByName(m.select(F.col("src"), F.col("m").alias("dst")))
        )
    out = out.where(F.col("src") != F.col("dst"))
    return out.distinct() if dedup else out


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) [+ vertices(id)] → (labels(id, component), info)."""
    spark = edges.sparkSession
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_cc_")
    cm = CheckpointManager(checkpoint_dir, "cc")

    # canonical: undirected, large → small, no self-loops
    cur = (
        edges.select(
            F.greatest("src", "dst").cast("long").alias("src"),
            F.least("src", "dst").cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )

    start_iter = 0
    if resume:
        k = cm.latest()
        if k is not None:
            state, meta = cm.load(spark, k)
            cur = state
            start_iter = k

    def _edge_hash() -> dict:
        return {"h": F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)"))}

    t0 = time.monotonic()
    sig_row = cur.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    sig = (int(sig_row["n"]), int(sig_row["h"] or 0))
    converged = False
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        # no distinct after either star: duplicate edges don't change the
        # min aggregations (map-side partial min absorbs multiplicity), and
        # the single canonicalize distinct below dedups the round's output —
        # one full-width exchange per round instead of two (plan pinned by
        # test_plan_shape.test_cc_round_single_dedup_exchange)
        after_large = _min_star(cur, large=True, dedup=False)
        after_small = _min_star(after_large, large=False, dedup=False)
        # canonicalize orientation for the next round / fixpoint test
        nxt = (
            after_small.select(
                F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        cur, totals = cm.commit(k, nxt, {"phase": "round"}, extra_aggs=_edge_hash())
        new_sig = (int(totals["rows"]), int(totals["h"] or 0))
        converged = new_sig == sig
        cm.update_meta(k, {"converged": converged})
        cm.append_metrics(
            {"iter": k, "delta": float(abs(new_sig[0] - sig[0])),
             "seconds": time.monotonic() - it_t0, "rows": new_sig[0]}
        )
        sig = new_sig
        if converged:
            break

    # at fixpoint every edge is (member, root); labels = root per member + roots
    labels = (
        cur.select(F.col("src").alias("id"), F.col("dst").alias("component"))
        .unionByName(cur.select(F.col("dst").alias("id"), F.col("dst").alias("component")))
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )
    if vertices is not None:
        labels = (
            vertices.select(F.col("id").cast("long"))
            .join(labels, "id", "left")
            .select("id", F.coalesce("component", "id").alias("component"))
        )
    return labels, {"iterations": k, "converged": converged, "seconds": time.monotonic() - t0}


def connected_components_incremental(
    base_labels: DataFrame,
    added_edges: DataFrame,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, dict]:
    """Maintain converged CC labels under an edge-ADDITION delta —
    work proportional to the delta, never a rescan of the full graph.

    ``base_labels(id, component)`` is the converged output of
    ``connected_components`` on snapshot T (component = min member id,
    the canonical min-label fixpoint). ``added_edges(src, dst)`` is the
    T→T+1 addition delta (operators/edge_maintenance.py edge_diff rows
    with change='added'). Additions only MERGE components, so the update
    is pure label algebra:

      1. contract every added edge to its endpoint COMPONENTS (new
         vertices contract to themselves) — a quotient graph with
         ≤ |delta| edges;
      2. run the ordinary large-star/small-star CC on that quotient
         (delta-sized input, O(log |delta|) rounds);
      3. compose: final(v) = quotient_label(base(v)), identity where the
         quotient didn't touch base(v).

    Because quotient labels are minima over member components — which
    are themselves minima over member vertices — the composition equals
    the cold min-label fixpoint on (T ∪ delta) bit-for-bit: the oracle
    for the incremental path IS the cold CC, a strict check.
    (Edge REMOVALS can split components and need a recompute of the
    affected components; that path is the cold rerun, same as the
    reference's re-import flow.)

    Plan shape: two SHJ label joins sized by the delta, the quotient CC
    rounds (delta-sized state through CheckpointManager — resumable),
    and ONE final |V|-sized broadcast-able join to re-map base labels.
    """
    spark = base_labels.sparkSession
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_ccinc_")
    t0 = time.monotonic()

    added = (
        added_edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    base = base_labels.select(
        F.col("id").cast("long"), F.col("component").cast("long")
    )
    # endpoints the base has never seen label themselves
    dverts = (
        added.select(F.col("src").alias("id"))
        .unionByName(added.select(F.col("dst").alias("id")))
        .distinct()
        .join(base, "id", "left_anti")
        .select("id", F.col("id").alias("component"))
    )
    full = base.unionByName(dverts)

    la = full.select(F.col("id").alias("src"), F.col("component").alias("ca"))
    lb = full.select(F.col("id").alias("dst"), F.col("component").alias("cb"))
    contracted = (
        added.join(la.hint("shuffle_hash"), "src")
        .join(lb.hint("shuffle_hash"), "dst")
        .select(F.col("ca").alias("src"), F.col("cb").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    n_contracted = contracted.count()
    if n_contracted == 0:
        return full, {
            "iterations": 0, "converged": True,
            "seconds": time.monotonic() - t0, "quotient_edges": 0,
        }

    qlab, info = connected_components(
        contracted, checkpoint_dir=checkpoint_dir
    )
    out = (
        full.withColumnRenamed("component", "base_c")
        .join(
            qlab.select(
                F.col("id").alias("base_c"), F.col("component").alias("qc")
            ).hint("shuffle_hash"),
            "base_c",
            "left",
        )
        .select("id", F.coalesce("qc", "base_c").alias("component"))
    )
    return out, {
        "iterations": info["iterations"],
        "converged": info["converged"],
        "seconds": time.monotonic() - t0,
        "quotient_edges": n_contracted,
    }
