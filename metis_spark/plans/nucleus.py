"""(3,4)-nucleus decomposition: per-TRIANGLE nucleus numbers by
triangle-h-index iteration over the 4-clique incidence — one step past
k-truss in the Sariyüce/Seshadhri/Pinar/Çatalyürek nucleus hierarchy
(k-core = (1,2), k-truss = (2,3), this = (3,4)).

Definition: the k-(3,4)-nucleus is a maximal union of triangles in
which every triangle participates in ≥ k 4-cliques whose four
triangles all stay inside the nucleus; ν(T) is the largest such k for
triangle T. The local fixpoint form (the same theorem family that
backs plans/coreness.py and plans/trussness.py): materialize the
4-clique list once, fan each 4-clique {p,q,r,s} to its 4 triangles
(each row carrying the OTHER THREE triangles' keys), initialize
t₀(T) = #4-cliques containing T, and repeat

    t_{i+1}(T) = min( t_i(T),
                      H({ min(t_i(O₁), t_i(O₂), t_i(O₃)) : quads ∋ T }) )

The sequence is monotone non-increasing and its fixpoint is ν(T)
(triangles in no 4-clique hold 0). The h-index of a tied-order ranking
is tie-order invariant, so the unrolled DuckDB twin replays every
round bit-exactly — the trussness argument one level up.

Scale shape (10^12-edge design):

- 4-cliques enumerated ONCE kClist-style on the degree-oriented DAG
  (plans/triangles.py four_clique_count: base edge = two lowest-order
  vertices, w ∈ C_uv, x ∈ C_uv ∩ N⁺(w)); every array carried is
  bounded by the O(√m) oriented out-degree;
- the fan-out is 4 rows per 4-clique pre-partitioned by the O₁
  triangle key; per round three SHJ state gathers + the relational
  hub-safe h-index (window + map-side max groupBy — no collect_list),
  one left join back to the triangle spine;
- rounds to fixpoint are few (same empirical h-index argument as
  coreness/trussness); every round can commit through
  CheckpointManager with the shared durability dial.

Consistency contract (pinned in tests/test_nucleus.py): every edge of
a triangle with ν(T) ≥ k has truss ≥ k + 3 — each of the k 4-cliques
Q = T ∪ {x} contributes a distinct in-nucleus triangle {e, x} on every
edge e of T, plus T itself, so e carries ≥ k+1 triangles inside the
nucleus edge set.

Reference parity: /root/reference/Metis has no dense-subgraph
operators; this extends the §2.10 decomposition family
(coreness/trussness/onion) one nucleus level up.
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager
from metis_spark.plans.triangles import (
    _oriented,
    _oriented_adj,
    _per_edge_commons,
)

_TRI_KEY = ["x", "y", "z"]


def _quad_triangle_rows(edges: DataFrame) -> DataFrame:
    """4-clique list fanned to one row per (triangle; other1, other2,
    other3): for quad {p<q<r<s} emit each of its 4 triangles with the
    other three as gather keys. Enumeration is the kClist DAG order
    (each quad generated exactly once); keys are id-sorted triples."""
    per_edge = _per_edge_commons(edges).where(F.col("n_common") > 0)
    tris = per_edge.select("src", "dst", "common", F.explode("common").alias("w"))
    adj = _oriented_adj(_oriented(edges)).select(
        F.col("src").alias("w"), F.col("nbrs").alias("nbrs_w")
    )
    quads = (
        tris.join(adj, "w")
        .select(
            "src", "dst", "w",
            F.explode(F.array_intersect("common", "nbrs_w")).alias("fourth"),
        )
        .select(F.array_sort(F.array("src", "dst", "w", "fourth")).alias("q"))
        .select(
            F.element_at("q", 1).alias("p"),
            F.element_at("q", 2).alias("qq"),
            F.element_at("q", 3).alias("r"),
            F.element_at("q", 4).alias("s"),
        )
    )
    # the 4 triangles of {p<q<r<s}; triples stay sorted by construction
    combos = [
        (("p", "qq", "r"), ("p", "qq", "s"), ("p", "r", "s"), ("qq", "r", "s")),
        (("p", "qq", "s"), ("p", "qq", "r"), ("p", "r", "s"), ("qq", "r", "s")),
        (("p", "r", "s"), ("p", "qq", "r"), ("p", "qq", "s"), ("qq", "r", "s")),
        (("qq", "r", "s"), ("p", "qq", "r"), ("p", "qq", "s"), ("p", "r", "s")),
    ]
    parts = []
    for own, o1, o2, o3 in combos:
        parts.append(
            quads.select(
                F.col(own[0]).alias("x"), F.col(own[1]).alias("y"), F.col(own[2]).alias("z"),
                F.col(o1[0]).alias("x1"), F.col(o1[1]).alias("y1"), F.col(o1[2]).alias("z1"),
                F.col(o2[0]).alias("x2"), F.col(o2[1]).alias("y2"), F.col(o2[2]).alias("z2"),
                F.col(o3[0]).alias("x3"), F.col(o3[1]).alias("y3"), F.col(o3[2]).alias("z3"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def nucleus_34(
    edges: DataFrame,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
    retain: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → (nuc(x, y, z, nucleus), info{iterations,
    changed, converged, seconds, quads}). One row per triangle
    (id-sorted key x < y < z); ``nucleus`` = ν(T), the largest k with T
    inside the k-(3,4)-nucleus (0 for triangles in no 4-clique)."""
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_nucleus_")
    cm = CheckpointManager(checkpoint_dir, "nucleus34", retain=retain)

    # triangle spine: every triangle, id-sorted key
    per_edge = _per_edge_commons(edges).where(F.col("n_common") > 0)
    tri = (
        per_edge.select("src", "dst", F.explode("common").alias("w"))
        .select(F.array_sort(F.array("src", "dst", "w")).alias("t"))
        .select(
            F.element_at("t", 1).alias("x"),
            F.element_at("t", 2).alias("y"),
            F.element_at("t", 3).alias("z"),
        )
    )
    tq = (
        _quad_triangle_rows(edges)
        .repartition(num_partitions, "x1", "y1", "z1")
        .persist()
    )
    n_quad_rows = tq.count()  # 4 rows per 4-clique

    support = tq.groupBy(*_TRI_KEY).agg(F.count(F.lit(1)).cast("long").alias("t"))
    state = (
        tri.join(support, _TRI_KEY, "left")
        .select("x", "y", "z", F.coalesce("t", F.lit(0)).cast("long").alias("t"))
    )

    start_iter = 0
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, meta = cm.load(spark, k0)
            state = st.select("x", "y", "z", "t")
            start_iter = k0
            if meta.get("converged"):
                tq.unpersist()
                return state.select(
                    "x", "y", "z", F.col("t").alias("nucleus")
                ), {
                    "iterations": k0, "changed": 0, "converged": True,
                    "seconds": 0.0, "quads": n_quad_rows // 4, "resumed": True,
                }

    t0 = time.monotonic()
    converged = False
    changed = -1
    k = start_iter
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        gathers = state
        m = tq
        for i in (1, 2, 3):
            sti = state.select(
                F.col("x").alias(f"x{i}"), F.col("y").alias(f"y{i}"),
                F.col("z").alias(f"z{i}"), F.col("t").alias(f"t{i}"),
            )
            m = m.join(sti.hint("shuffle_hash"), [f"x{i}", f"y{i}", f"z{i}"])
        m = m.select(*_TRI_KEY, F.least("t1", "t2", "t3").alias("m"))
        w = Window.partitionBy(*_TRI_KEY).orderBy(F.desc("m"))
        h = (
            m.withColumn("rn", F.row_number().over(w))
            .groupBy(*_TRI_KEY)
            .agg(F.max(F.least(F.col("m"), F.col("rn"))).cast("long").alias("h"))
        )
        nxt = (
            gathers.select(*_TRI_KEY, F.col("t").alias("old"))
            .join(h.hint("shuffle_hash"), _TRI_KEY, "left")
            .select(
                *_TRI_KEY,
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
            cm.update_meta(k, {"changed": changed, "converged": converged})
        cm.append_metrics(
            {"iter": k, "delta": float(changed),
             "seconds": time.monotonic() - it_t0, "rows": int(totals["rows"]),
             "committed": durable}
        )
        state = st.select("x", "y", "z", "t")
        if converged:
            break

    out = state.select("x", "y", "z", F.col("t").alias("nucleus"))
    tq.unpersist()
    return out, {
        "iterations": k,
        "changed": changed,
        "converged": converged,
        "seconds": time.monotonic() - t0,
        "quads": n_quad_rows // 4,
    }
