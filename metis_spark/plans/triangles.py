"""Triangle counting via degree-oriented sorted-adjacency intersection.

The classic compact-forward / MapReduce "node-iterator++" scheme the
north_rule names: orient every undirected edge from the lower-order to
the higher-order endpoint, where order = (degree, id) — so each triangle
{u,v,w} is counted exactly once, and adjacency lists are bounded by
O(√m), which caps the intersection cost on power-law hubs.

Plan: degrees (groupBy) → oriented edges (join×2 + filter) → sorted
adjacency arrays (collect_list + sort_array = the CSR rows) → edge⋈adjacency
join and ``size(array_intersect(nbrs(u), nbrs(v)))`` — everything JVM-side,
one pandas-free pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented(edges: DataFrame) -> DataFrame:
    """Undirected dedup → edges oriented by (degree, id) order."""
    und = (
        edges.select(
            F.least("src", "dst").cast("long").alias("a"),
            F.greatest("src", "dst").cast("long").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v")).unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    withdeg = und.join(da.hint("shuffle_hash"), "a").join(db.hint("shuffle_hash"), "b")
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return withdeg.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )


def _oriented_adj(oriented: DataFrame) -> DataFrame:
    return oriented.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))


def triangle_count(edges: DataFrame) -> int:
    """Global triangle count (exact)."""
    per_edge = _per_edge_commons(edges)
    row = per_edge.agg(F.coalesce(F.sum("n_common"), F.lit(0)).alias("t")).collect()[0]
    return int(row["t"])


def _per_edge_commons(edges: DataFrame) -> DataFrame:
    oriented = _oriented(edges)
    adj = _oriented_adj(oriented)
    a_u = adj.select(F.col("src").alias("u"), F.col("nbrs").alias("nbrs_u"))
    a_v = adj.select(F.col("src").alias("v"), F.col("nbrs").alias("nbrs_v"))
    # no shuffle_hash hint here: the adjacency sides carry O(sqrt(m)) neighbor
    # arrays per row, and an SHJ build map cannot spill — on a skewed graph a
    # partition of fat adjacency rows would OOM where sort-merge spills. The
    # scalar-row joins (deg in _oriented) keep the hint; these let AQE choose.
    return (
        oriented.join(a_u, oriented["src"] == a_u["u"])
        .join(a_v, oriented["dst"] == a_v["v"])
        .select(
            "src",
            "dst",
            F.array_intersect("nbrs_u", "nbrs_v").alias("common"),
        )
        .withColumn("n_common", F.size("common"))
    )


def triangle_count_per_vertex(edges: DataFrame, vertices: DataFrame | None = None) -> DataFrame:
    """Per-vertex triangle participation counts → (id, triangles)."""
    per_edge = _per_edge_commons(edges).where(F.col("n_common") > 0)
    thirds = per_edge.select(F.explode("common").alias("id"))
    firsts = per_edge.select(F.col("src").alias("id"), "n_common")
    seconds = per_edge.select(F.col("dst").alias("id"), "n_common")
    counts = (
        thirds.withColumn("n_common", F.lit(1))
        .unionByName(firsts)
        .unionByName(seconds)
        .groupBy("id")
        .agg(F.sum("n_common").cast("long").alias("triangles"))
    )
    if vertices is not None:
        counts = (
            vertices.select(F.col("id").cast("long"))
            .join(counts, "id", "left")
            .select("id", F.coalesce("triangles", F.lit(0)).alias("triangles"))
        )
    return counts


def directed_triad_census(edges: DataFrame) -> DataFrame:
    """Directed 3-node motif counts over the closed triads → one row
    (n_cyclic, n_feedforward): cyclic = u→v→w→u (counted once via the
    min-vertex anchor u < v AND u < w), feed-forward = the transitive
    triad u→v, v→w, u→w (counted once per role assignment, which is
    unique given the edge directions). The cyclic/FFL ratio is the
    classic motif signature separating feedback-heavy graphs from
    hierarchies (Milo et al., "Network Motifs", Science 2002).

    Plan: two self-join chains on the deduped directed edge table —
    each a pair of SHJ equi-joins; Catalyst reuses the exchange of the
    shared join key. At 10^12-edge scale the standard refinement is to
    orient each chain hop low-degree-first (the same √m bound as
    plans/triangles.py:_oriented) — at the gate scales the plain chain
    is already exchange-minimal.
    """
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    e1 = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    e3c = e.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    cyc = (
        e1.join(e2, "v")
        .join(e3c, ["w", "u"])
        .where((F.col("u") < F.col("v")) & (F.col("u") < F.col("w")))
        .agg(F.count(F.lit(1)).cast("long").alias("n_cyclic"))
    )
    e3f = e.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    ffl = (
        e1.join(e2, "v")
        .where(F.col("u") != F.col("w"))
        .join(e3f, ["u", "w"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_feedforward"))
    )
    return cyc.crossJoin(ffl)


def four_clique_count(edges: DataFrame) -> DataFrame:
    """Global exact 4-clique count → one row (triangles, four_cliques).

    kClist-style ordered enumeration (Danisch, Balalau & Sozio, WWW
    2018) on the same degree-oriented DAG the triangle counter uses:
    orient by (degree, id), so each 4-clique {u,v,w,x} with DAG order
    u→v→w→x is generated exactly once — base edge (u,v) (its two
    lowest-order vertices), third vertex w ∈ C_uv = N+(u) ∩ N+(v),
    fourth x ∈ C_uv ∩ N+(w). No other base edge regenerates it: for any
    later pair the intersection of OUT-neighborhoods excludes the
    earlier vertices by construction.

    Scale shape: reuses the per-edge common-neighbor arrays (O(√m)
    oriented out-degree bound holds for every array carried, including
    the C_uv copy each exploded triangle row keeps for the final
    intersection), one extra adjacency join past the triangle plan —
    total work Σ_triangles |C_uv|, the sequential kClist bound.
    4-clique density vs the triangle count is the next motif signature
    past transitivity (spam-farm / link-ring neighborhoods are
    4-clique-dense long before they dominate triangles)."""
    per_edge = _per_edge_commons(edges).persist()
    tri_total = per_edge.agg(
        F.coalesce(F.sum("n_common"), F.lit(0)).cast("long").alias("t")
    )
    tris = per_edge.where(F.col("n_common") > 0).select(
        "common", F.explode("common").alias("w")
    )
    adj = _oriented_adj(_oriented(edges)).select(
        F.col("src").alias("w"), F.col("nbrs").alias("nbrs_w")
    )
    # sort-merge friendly: both sides carry arrays, same rationale as
    # _per_edge_commons for omitting the shuffle_hash hint
    quads = tris.join(adj, "w").select(
        F.size(F.array_intersect("common", "nbrs_w")).alias("q")
    )
    quad_total = quads.agg(F.coalesce(F.sum("q"), F.lit(0)).cast("long").alias("fc"))
    out = tri_total.join(quad_total).select(
        F.col("t").alias("triangles"), F.col("fc").alias("four_cliques")
    )
    rows = out.collect()
    per_edge.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame(rows, "triangles long, four_cliques long")


def five_clique_profile(edges: DataFrame) -> DataFrame:
    """Global exact clique profile → one row (triangles, four_cliques,
    five_cliques) — the k=3,4,5 clique-density signature.

    One more kClist level past four_clique_count (same citation,
    Danisch/Balalau/Sozio WWW'18): every (k+1)-clique extends a k-clique
    whose candidate set C is intersected one adjacency deeper — the
    5-clique row count is Σ_{4-cliques} |C_uvw ∩ N+(x)| with total work
    Σ_{4-cliques} |C_uvw|, the sequential kClist bound. The candidate
    arrays stay bounded by the O(√m) oriented out-degree, so no stage
    carries more than the triangle plan already does per row; each
    explode level multiplies rows by the (sparse-graph-small) clique
    count, not the vertex count.

    Why it earns a slot next to graphlet4_census: the census's closed
    forms stop at 4 vertices; the 5-clique count is the first motif that
    REQUIRES deep enumeration, and the clique-profile slope
    (t → fc → qc) is the standard link-farm/spam-ring escalation signal
    (rings densify top-down: 5-cliques explode orders of magnitude
    before triangles look anomalous)."""
    per_edge = _per_edge_commons(edges).persist()
    tri_total = per_edge.agg(
        F.coalesce(F.sum("n_common"), F.lit(0)).cast("long").alias("t")
    )
    tris = per_edge.where(F.col("n_common") > 0).select(
        "common", F.explode("common").alias("w")
    )
    adj_w = _oriented_adj(_oriented(edges)).select(
        F.col("src").alias("w"), F.col("nbrs").alias("nbrs_w")
    )
    # array-carrying joins stay hint-free (sort-merge can spill; an SHJ
    # build map of fat adjacency rows cannot) — _per_edge_commons rationale
    quads = (
        tris.join(adj_w, "w")
        .select(F.array_intersect("common", "nbrs_w").alias("c2"))
        .persist()
    )
    quad_total = quads.agg(
        F.coalesce(F.sum(F.size("c2")), F.lit(0)).cast("long").alias("fc")
    )
    adj_x = adj_w.select(F.col("w").alias("x"), F.col("nbrs_w").alias("nbrs_x"))
    quints = (
        quads.where(F.size("c2") > 0)
        .select("c2", F.explode("c2").alias("x"))
        .join(adj_x, "x")
        .select(F.size(F.array_intersect("c2", "nbrs_x")).alias("p"))
    )
    quint_total = quints.agg(
        F.coalesce(F.sum("p"), F.lit(0)).cast("long").alias("qc")
    )
    out = (
        tri_total.join(quad_total)
        .join(quint_total)
        .select(
            F.col("t").alias("triangles"),
            F.col("fc").alias("four_cliques"),
            F.col("qc").alias("five_cliques"),
        )
    )
    rows = out.collect()
    per_edge.unpersist()
    quads.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame(
        rows, "triangles long, four_cliques long, five_cliques long"
    )


def doulion_triangle_estimate(
    edges: DataFrame, keep_mod: int = 4, salt: str = "doulion"
) -> DataFrame:
    """DOULION sampled triangle estimate → one row
    (n_und_edges, n_sampled, sampled_triangles, triangle_estimate).

    Tsourakakis, Kang, Miller & Faloutsos, "DOULION: Counting Triangles
    in Massive Graphs with a Coin" (KDD 2009): keep each undirected edge
    independently with probability p, count triangles EXACTLY on the
    sparsified graph, and scale by 1/p^3 — an unbiased estimator whose
    variance vanishes on graphs with many triangles. At 100 TB this is
    the screening pass: the intersection join's input shrinks by p and
    its work by ~p^1.5..p^3 BEFORE any shuffle, so a p=1/4 coin turns an
    exact count that needs the full edge table into one reading a
    quarter of it — run the estimate first, pay for exact only where the
    estimate says the graph is interesting.

    Determinism (the engine-replayable coin): the "flip" for edge {a,b}
    is the corpus-wide md5→60-bit trick — keep iff
    conv(substr(md5('<salt>' || a || ':' || b), 1, 15), 16, 10) %
    keep_mod == 0, i.e. p = 1/keep_mod — bit-identical in DuckDB as
    ('0x' || substr(md5(...), 1, 15))::BIGINT, so the oracle replays the
    exact sample, not a distribution. The estimate is the exact integer
    sampled_triangles * keep_mod^3 (no float anywhere).

    Reference parity: /root/reference/Metis has no sampled-triangle
    operator; this is the approximate twin of triangle_count() the same
    way anf_sketch twins the exact neighborhood function.
    """
    und = (
        edges.select(
            F.least("src", "dst").cast("long").alias("a"),
            F.greatest("src", "dst").cast("long").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    coin = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt),
                        F.col("a").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % keep_mod
        == 0
    )
    flagged = und.withColumn("keep", coin).persist()
    stats = flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_und"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
    ).collect()[0]
    sampled = flagged.where("keep").select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    t = triangle_count(sampled)
    flagged.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [
            (
                int(stats["n_und"] or 0),
                int(stats["n_kept"] or 0),
                t,
                t * keep_mod**3,
            )
        ],
        "n_und_edges long, n_sampled long, sampled_triangles long, triangle_estimate long",
    )


def triangle_delta_on_insert(base_und: DataFrame, inserts: DataFrame) -> DataFrame:
    """Per-edge triangle delta for a batch of inserted edges →
    (src, dst, delta): for each inserted canonical pair (a < b), the
    number of triangles it closes against the BASE graph —
    |N_base(a) ∩ N_base(b)|, the O(d_a + d_b) primitive every
    streaming-triangle maintainer (and the incremental twin of
    trussness support) is built from. Deltas are measured edge-by-edge
    against the base alone (the sequential-application contract:
    new-new wedges count when the earlier insert has already been
    folded into the base — fold and re-call per batch round).

    Scale shape: two shuffle-hash joins of the insert batch against
    the base adjacency (the exact intersection-by-join triangle shape,
    restricted to the batch), one map-side-combined count; zero-delta
    inserts are kept via the left join."""
    ins = inserts.select("src", "dst")
    n1 = base_und.select(F.col("src").alias("a_id"), F.col("dst").alias("x"))
    n2 = base_und.select(F.col("src").alias("b_id"), F.col("dst").alias("y"))
    closed = (
        ins.join(
            n1.hint("shuffle_hash"), ins.src == n1.a_id
        )
        .join(
            n2.hint("shuffle_hash"),
            (F.col("dst") == F.col("b_id")) & (F.col("x") == F.col("y")),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("delta"))
    )
    return ins.join(closed, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("delta", F.lit(0)).cast("long").alias("delta")
    )
