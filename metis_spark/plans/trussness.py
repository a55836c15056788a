"""Full k-truss DECOMPOSITION (per-edge truss numbers) by distributed
edge-h-index iteration — the whole trussness profile in one run, where
plans/ktruss.py peels a single fixed k.

Algorithm (the edge analog of the coreness h-index iteration in
plans/coreness.py; Sariyüce/Seshadhri/Pinar's local nucleus-decomposition
family): let t(e) = truss(e) − 2 (the edge's triangle-cohesion level).
Materialize the triangle list ONCE over the original graph, initialize
t_0(e) = support(e) = #triangles containing e, and repeat

    t_{k+1}(e) = H( { min(t_k(f), t_k(g)) : {e, f, g} a triangle } )

where H is the h-index. The sequence is monotone non-increasing (H over
a size-s multiset is ≤ s, so t_1 ≤ support; monotonicity of H and min
carries it down), bounded below by truss(e) − 2, and its fixpoint IS the
truss number: at fixpoint every edge has ≥ t(e) triangles whose other
two edges both sit at level ≥ t(e), which is exactly membership in the
(t+2)-truss. Edges in no triangle hold t = 0 (truss 2: every edge is in
the 2-truss) — the conventional floor.

Why this shape at 10^12-edge scale (vs. level-by-level support peeling):

- the triangle table is enumerated ONCE via the degree-oriented sorted-
  adjacency intersection (plans/triangles.py:_per_edge_commons, rows
  bounded O(√m)) and persisted fanned-out to 3 rows per triangle —
  (edge, other1, other2) — pre-partitioned by edge key; peeling instead
  re-intersects adjacency every round over the shrinking edge set and
  needs truss-many outer levels;
- each round is two SHJ gather joins (state onto other1/other2 key),
  one window + map-side-partial max groupBy (the relational hub-safe
  h-index of plans/coreness.py — no collect_list, no driver arrays),
  one left join back to the edge spine;
- rounds to fixpoint are few on web-shaped graphs (same empirical
  argument as coreness: h-index iteration converges in O(10) rounds
  where peeling needs degeneracy-many sweeps);
- the changed-edge count folds into the commit's single lineage scan;
  every round commits (state + per-partition lineage + metrics) through
  CheckpointManager and resumes mid-algorithm.

The h-index of a tied-order ranking is tie-order invariant, so the
unrolled DuckDB twin replays every round bit-exactly without a
tie-break column (same argument as plans/coreness.py).

Reference parity: /root/reference/Metis has no truss decomposition;
this extends the k-truss subgraph query (plans/ktruss.py) to the full
profile, the standard next ask after per-vertex coreness.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager
from metis_spark.plans.triangles import _per_edge_commons


def _triangle_edge_rows(edges: DataFrame) -> DataFrame:
    """Canonical triangle list fanned out to one row per (edge, other
    edge 1, other edge 2): for triangle {e1,e2,e3} emit (e1;e2,e3),
    (e2;e1,e3), (e3;e1,e2). Edge keys are canonical (s < d) pairs.
    Each triangle appears exactly once in the source enumeration
    (lowest-order oriented pair, plans/triangles.py:59)."""
    tri = (
        _per_edge_commons(edges)
        .where(F.col("n_common") > 0)
        .select("src", "dst", F.explode("common").alias("w"))
        .select(
            F.least("src", "dst").alias("e1s"),
            F.greatest("src", "dst").alias("e1d"),
            F.least("src", "w").alias("e2s"),
            F.greatest("src", "w").alias("e2d"),
            F.least("dst", "w").alias("e3s"),
            F.greatest("dst", "w").alias("e3d"),
        )
    )
    perms = [("e1", "e2", "e3"), ("e2", "e1", "e3"), ("e3", "e1", "e2")]
    parts = [
        tri.select(
            F.col(f"{e}s").alias("s"), F.col(f"{e}d").alias("d"),
            F.col(f"{o1}s").alias("s1"), F.col(f"{o1}d").alias("d1"),
            F.col(f"{o2}s").alias("s2"), F.col(f"{o2}d").alias("d2"),
        )
        for e, o1, o2 in perms
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def trussness(
    edges: DataFrame,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    init_truss: DataFrame | None = None,
    checkpoint_every: int = 1,
    retain: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → (truss(src, dst, truss), info{iterations, changed,
    converged, seconds, triangles}). Output edges are canonical
    (src < dst, undirected dedup'd, self-loops dropped); ``truss`` is the
    edge's truss number (max k with the edge in the k-truss; 2 for edges
    in no triangle). Stops when no edge changes; ``converged`` False only
    if max_iter ran out first.

    ``init_truss`` (src, dst, truss) warm-starts the edge-h-index
    iteration — the edge analog of plans/coreness.py's ``init_cores``.
    The iteration converges from ANY per-edge UPPER bound on the true
    truss number (the update map is monotone and explicitly clamped by
    ``least(old, h)``, so the sequence decreases from the start values to
    the unique fixpoint, which is the truss number — support start is
    just the trivial upper bound). Canonical use is DECREMENTAL
    maintenance: after edge DELETIONS the old truss numbers of surviving
    edges are still upper bounds (trussness is monotone in the edge set),
    so seeding with them repairs only the triangles the deletions
    touched instead of re-descending from raw support. (After edge
    ADDITIONS old values are NOT upper bounds — use the cold start.)
    Supplied values are clamped to the reduced graph's support (also an
    upper bound); surviving edges absent from ``init_truss`` start at
    support.

    ``checkpoint_every=k`` / ``retain``: the shared durability dial
    (plans/checkpoint.py:step) — durable commit every k-th round and at
    convergence, one localCheckpoint job otherwise; resume lands on the
    last COMMITTED round; fixpoint identical for every k."""
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_trussness_")
    cm = CheckpointManager(checkpoint_dir, "trussness", retain=retain)

    cedges = (
        edges.select(
            F.least("src", "dst").cast("long").alias("s"),
            F.greatest("src", "dst").cast("long").alias("d"),
        )
        .where(F.col("s") != F.col("d"))
        .distinct()
    )
    te = (
        _triangle_edge_rows(edges)
        .repartition(num_partitions, "s1", "d1")
        .persist()
    )
    n_tri_rows = te.count()  # materialize; 3 rows per triangle

    # t_0 = support (triangle rows per edge; 0 for triangle-free edges)
    support = te.groupBy("s", "d").agg(F.count(F.lit(1)).cast("long").alias("t"))
    state = (
        cedges.join(support, ["s", "d"], "left")
        .select("s", "d", F.coalesce("t", F.lit(0)).cast("long").alias("t"))
    )
    if init_truss is not None:
        seed = init_truss.select(
            F.least("src", "dst").cast("long").alias("s"),
            F.greatest("src", "dst").cast("long").alias("d"),
            (F.col("truss").cast("long") - 2).alias("it"),
        )
        state = (
            state.withColumnRenamed("t", "sup")
            .join(seed.hint("shuffle_hash"), ["s", "d"], "left")
            .select(
                "s", "d",
                F.least(F.coalesce("it", "sup"), F.col("sup")).cast("long").alias("t"),
            )
        )

    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, meta = cm.load(spark, k0)
            state = st.select("s", "d", "t")
            start_iter = k0
            if meta.get("converged"):
                te.unpersist()
                return state.select(
                    F.col("s").alias("src"), F.col("d").alias("dst"),
                    (F.col("t") + 2).cast("long").alias("truss"),
                ), {
                    "iterations": k0, "changed": 0, "converged": True,
                    "seconds": 0.0, "triangles": n_tri_rows // 3, "resumed": True,
                }

    t0 = time.monotonic()
    converged = False
    changed = -1
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        st1 = state.select(
            F.col("s").alias("s1"), F.col("d").alias("d1"), F.col("t").alias("t1")
        )
        st2 = state.select(
            F.col("s").alias("s2"), F.col("d").alias("d2"), F.col("t").alias("t2")
        )
        m = (
            te.join(st1.hint("shuffle_hash"), ["s1", "d1"])
            .join(st2.hint("shuffle_hash"), ["s2", "d2"])
            .select("s", "d", F.least("t1", "t2").alias("m"))
        )
        w = Window.partitionBy("s", "d").orderBy(F.desc("m"))
        h = (
            m.withColumn("rn", F.row_number().over(w))
            .groupBy("s", "d")
            .agg(F.max(F.least(F.col("m"), F.col("rn"))).cast("long").alias("h"))
        )
        nxt = (
            state.select("s", "d", F.col("t").alias("old"))
            .join(h.hint("shuffle_hash"), ["s", "d"], "left")
            .select(
                "s", "d",
                F.least(F.col("old"), F.coalesce(F.col("h"), F.lit(0)))
                .cast("long").alias("t"),
                "old",
            )
        )
        aggs = {"changed": F.sum((F.col("t") != F.col("old")).cast("long"))}
        durable = checkpoint_every <= 1 or k % checkpoint_every == 0 or k == max_iter
        st, totals = cm.step(k, nxt, {}, extra_aggs=aggs, durable=durable)
        changed = int(totals["changed"] or 0)
        converged = changed == 0
        if converged and not durable:
            st, totals = cm.commit(k, st, {}, extra_aggs=aggs)
            durable = True
        if durable:
            cm.update_meta(k, {"converged": converged, "changed": changed})
        cm.append_metrics(
            {"iter": k, "delta": float(changed),
             "seconds": time.monotonic() - it_t0, "rows": int(totals["rows"]),
             "committed": durable}
        )
        state = st.select("s", "d", "t")
        if converged:
            break

    te.unpersist()
    return state.select(
        F.col("s").alias("src"), F.col("d").alias("dst"),
        (F.col("t") + 2).cast("long").alias("truss"),
    ), {
        "iterations": k,
        "changed": changed,
        "converged": converged,
        "seconds": time.monotonic() - t0,
        "triangles": n_tri_rows // 3,
    }
