"""Clique percolation communities, k = 3 (Palla, Derényi, Farkas &
Vicsek, "Uncovering the overlapping community structure of complex
networks in nature and society", Nature 2005).

A k=3 CPM community is a connected component of the triangle-overlap
graph: two triangles are adjacent iff they share an edge; a community is
the vertex union of one component's triangles. Unlike Louvain/Leiden/LPA
(partitions), CPM communities OVERLAP — a broker vertex belongs to every
clique chain passing through it — which is exactly the shape of
interleaved link rings sharing rented hub pages.

Plan (all on verified spines):
- triangles from the degree-oriented kClist enumerator
  (plans/triangles.py _per_edge_commons → explode) — each listed once;
- triangle ids PACKED a·2^42 + b·2^21 + c (a<b<c; ids asserted < 2^21)
  so the min-label community id is replayable integer arithmetic;
- the overlap graph is never materialized all-pairs: per shared edge
  only the STAR (min-tid ↔ tid) rows are emitted — same components,
  |star| ≤ 3·|triangles| instead of Σ C(share,2);
- components via the verified CC spine (convergence asserted; its
  pointer-jumping iterations are FEWER than plain-flood rounds, so the
  DuckDB twin's flood unroll depth is measured per gate dataset and
  kept with margin in CPM_CC_ROUNDS — 38 needed at sf0.01, 48 shipped);
- community profile = one explode + two map-side-combined groupBys.

Scale shape at 100 TB: triangle enumeration is the measured kClist pass;
everything downstream is linear in #triangles. Hub edges shared by many
triangles fan out through the star trick (one groupBy min + one join),
not a pairwise self-join.

Reference parity: /root/reference/Metis has no community operators; this
extends §2.10's community family (louvain, leiden, lpa, scan, truss
communities) with the overlapping-communities variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from metis_spark.plans.components import connected_components
from metis_spark.plans.triangles import _per_edge_commons

_PACK = 1 << 21  # vertex-id radix of the packed triangle id (3·21 = 63 bits)


def clique_percolation_k3(
    edges: DataFrame,
    max_cc_rounds: int = 16,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """edges(src,dst) → (community, n_vertices, n_triangles), one row per
    k=3 CPM community; ``community`` is the min packed triangle id of the
    component (pure integer, twin-replayable)."""
    spark = edges.sparkSession

    tri = _per_edge_commons(edges).select(
        "src", "dst", F.explode("common").alias("w")
    )
    srt = F.array_sort(F.array("src", "dst", "w"))
    tris = tri.select(
        srt[0].cast("long").alias("a"),
        srt[1].cast("long").alias("b"),
        srt[2].cast("long").alias("c"),
    ).persist()

    mx = tris.agg(F.max("c").alias("m")).collect()[0]["m"]
    if mx is None:  # triangle-free graph: no communities
        tris.unpersist()
        return spark.createDataFrame(
            [], "community long, n_vertices long, n_triangles long"
        )
    assert mx < _PACK, f"vertex id {mx} overflows the packed triangle id"

    tid = (
        F.col("a") * F.lit(_PACK * _PACK) + F.col("b") * F.lit(_PACK) + F.col("c")
    ).alias("tid")
    tt = tris.select("a", "b", "c", tid).persist()

    # the three edge keys per triangle; star rows per shared edge
    ek = lambda x, y: (F.col(x) * F.lit(_PACK) + F.col(y)).alias("ek")  # noqa: E731
    inc = (
        tt.select(ek("a", "b"), "tid")
        .unionByName(tt.select(ek("a", "c"), "tid"))
        .unionByName(tt.select(ek("b", "c"), "tid"))
    )
    mins = inc.groupBy("ek").agg(F.min("tid").alias("m"))
    star = (
        inc.join(mins.hint("shuffle_hash"), "ek")
        .where(F.col("tid") != F.col("m"))
        .select(F.col("m").alias("src"), F.col("tid").alias("dst"))
        .distinct()
    )

    labels, info = connected_components(
        star,
        vertices=tt.select(F.col("tid").alias("id")),
        checkpoint_dir=checkpoint_dir,
    )
    assert info["converged"] and info["iterations"] < max_cc_rounds, (
        f"CPM component labeling did not converge inside the bound: {info}"
    )

    member = tt.join(
        labels.select(F.col("id").alias("tid"), F.col("component")), "tid"
    )
    verts = (
        member.select("component", F.col("a").alias("v"))
        .unionByName(member.select("component", F.col("b").alias("v")))
        .unionByName(member.select("component", F.col("c").alias("v")))
        .distinct()
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )
    ntri = member.groupBy("component").agg(F.count(F.lit(1)).alias("n_triangles"))
    out = (
        verts.join(ntri, "component")
        .select(
            F.col("component").alias("community"), "n_vertices", "n_triangles"
        )
    )
    rows = out.collect()
    tris.unpersist()
    tt.unpersist()
    return spark.createDataFrame(
        rows, "community long, n_vertices long, n_triangles long"
    )
