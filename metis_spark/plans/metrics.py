"""Link-graph analytics metrics: clustering coefficient, assortativity,
and neighborhood-overlap link prediction (Adamic-Adar, vertex Jaccard).

These are the next queries a link-graph user runs after the core four
(pagerank / components / labels / triangles) — "how clustered is the
dependency graph", "which files are likely to co-import next". The
reference's analytics layer exposes the analogous per-group descriptive
statistics over its result tables (Metis/metis/PandasHelpers.py:21-40);
here each metric is a first-class distributed plan.

Scale design (the part that matters at 10^12 files):
- Every metric is built from the undirected degree table and at most one
  *wedge join* (adjacency ⋈ adjacency on the wedge center w). The wedge
  join fans out deg(w)^2 pairs per center — on a power-law graph the
  hubs dominate, so both prediction operators take a ``hub_cap`` and
  drop wedge centers with deg(w) > hub_cap. This is the standard
  web-scale bound (hubs contribute ~1/log(deg) ≈ 0 to Adamic-Adar and
  connect everything to everything in Jaccard, so capping loses almost
  no signal while turning O(Σ deg²) into O(Σ min(deg, cap)²)).
  The cap is part of the operator's declared semantics — the DuckDB
  oracles apply the identical cap, so correctness is pinned WITH the
  bound, not on an uncapped toy variant.
- No crossJoin / CartesianProduct anywhere; candidate pairs only ever
  materialize through the band-limited wedge equi-join.
- Clustering coefficient reuses the degree-oriented triangle counts
  (plans/triangles.py) — O(m^1.5) bound, adjacency rows ≤ O(√m).
- Assortativity is two scalar shuffles (degree groupBy + one corr agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metis_spark.plans.triangles import triangle_count_per_vertex


def _und(edges: DataFrame) -> DataFrame:
    """Symmetric (src, dst) view of the undirected simple graph."""
    fwd = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    rev = edges.select(
        F.col("dst").cast("long").alias("src"), F.col("src").cast("long").alias("dst")
    )
    return fwd.unionByName(rev).where(F.col("src") != F.col("dst")).distinct()


def _und_degrees(und: DataFrame) -> DataFrame:
    return und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )


def local_clustering(edges: DataFrame) -> DataFrame:
    """Per-vertex local clustering coefficient → (id, deg, triangles, lcc).

    lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1)), 0 when deg < 2. T(v) comes from
    the degree-oriented exact triangle counter, deg from the undirected
    simple graph — both single-shuffle aggregates over the same edge set.
    """
    und = _und(edges)
    deg = _und_degrees(und)
    tri = triangle_count_per_vertex(edges, vertices=deg.select("id"))
    lcc = F.when(
        F.col("deg") >= 2,
        F.round(
            2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - F.lit(1))), 6
        ),
    ).otherwise(F.lit(0.0))
    return (
        deg.join(tri, "id")
        .select("id", "deg", "triangles", lcc.alias("lcc"))
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity → one row (n_edges, assortativity).

    Pearson correlation of (deg(u), deg(v)) over the directed symmetric
    edge list — Newman's r. Negative on dependency graphs (hubs link to
    leaves). Two shuffles total: the degree groupBy and the corr agg; the
    degree re-attachment joins are broadcast-able (|V| scalars).
    """
    und = _und(edges)
    deg = _und_degrees(und)
    ds = deg.select(F.col("id").alias("src"), F.col("deg").alias("deg_src"))
    dd = deg.select(F.col("id").alias("dst"), F.col("deg").alias("deg_dst"))
    return (
        und.join(ds.hint("shuffle_hash"), "src")
        .join(dd.hint("shuffle_hash"), "dst")
        .agg(
            (F.count(F.lit(1)) / 2).cast("long").alias("n_edges"),
            F.round(F.corr("deg_src", "deg_dst"), 6).alias("assortativity"),
        )
    )


def _wedges(und: DataFrame, hub_cap: int) -> DataFrame:
    """Candidate pairs (u < v) through shared neighbor w, with deg(w) and
    the adjacency flag needed by both predictors.

    One equi-join on the wedge center; hub centers (deg > hub_cap) are
    dropped BEFORE the join so the fan-out bound holds in the plan, not
    just in the result.
    """
    deg = _und_degrees(und)
    centers = deg.where(F.col("deg") <= hub_cap)
    half = und.select(F.col("src").alias("w"), F.col("dst").alias("n"))
    capped = half.join(
        centers.select(F.col("id").alias("w"), "deg").hint("shuffle_hash"), "w"
    )
    left = capped.select("w", F.col("n").alias("u"), F.col("deg").alias("deg_w"))
    right = capped.select("w", F.col("n").alias("v"))
    return (
        left.join(right, "w")
        .where(F.col("u") < F.col("v"))
        .select("u", "v", "w", "deg_w")
    )


def adamic_adar_topk(edges: DataFrame, k: int = 50, hub_cap: int = 128) -> DataFrame:
    """Adamic-Adar link prediction → top-k (u, v, score, rn) NON-adjacent
    pairs, score = Σ_w 1/ln(deg(w)) over shared neighbors w, deg(w) ≤ hub_cap.

    Wedge centers with deg ≤ 1 can't occur (a wedge needs two neighbors)
    but deg(w) = 1 rows are filtered anyway so ln() is never ≤ 0. The
    global top-k is a distributed sort-limit over the (already small)
    scored-pair aggregate — the ranking window only sees k rows.
    """
    und = _und(edges)
    scores = (
        _wedges(und, hub_cap)
        .where(F.col("deg_w") >= 2)
        .groupBy("u", "v")
        .agg(F.sum(1.0 / F.log(F.col("deg_w").cast("double"))).alias("raw"))
    )
    adj = und.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    nonadj = scores.join(adj, ["u", "v"], "left_anti").select(
        "u", "v", F.round("raw", 6).alias("score")
    )
    top = nonadj.orderBy(F.desc("score"), F.asc("u"), F.asc("v")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("u"), F.asc("v"))
    return top.withColumn("rn", F.row_number().over(w).cast("long"))


def vertex_jaccard_topk(edges: DataFrame, k: int = 50, hub_cap: int = 128) -> DataFrame:
    """Neighborhood Jaccard similarity → top-k (u, v, n_common, jaccard, rn)
    non-adjacent pairs: |N(u)∩N(v)| / |N(u)∪N(v)|, wedge centers capped.

    The intersection count is the capped wedge count per pair; the union
    uses FULL degrees (the cap bounds candidate generation, not the
    denominator), so scores stay comparable across runs with different caps.
    """
    und = _und(edges)
    deg = _und_degrees(und)
    common = (
        _wedges(und, hub_cap)
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("deg_v"))
    adj = und.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    scored = (
        common.join(adj, ["u", "v"], "left_anti")
        .join(du.hint("shuffle_hash"), "u")
        .join(dv.hint("shuffle_hash"), "v")
        .select(
            "u",
            "v",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("deg_u") + F.col("deg_v") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    top = scored.orderBy(
        F.desc("jaccard"), F.asc("u"), F.asc("v")
    ).limit(k)
    w = Window.orderBy(F.desc("jaccard"), F.asc("u"), F.asc("v"))
    return top.withColumn("rn", F.row_number().over(w).cast("long"))


def resource_allocation_topk(
    edges: DataFrame, k: int = 50, hub_cap: int = 128
) -> DataFrame:
    """Resource-allocation link prediction (Zhou/Lü/Zhang 2009) → top-k
    non-adjacent (u, v, score, rn), score = Σ_w 1/deg(w) over shared
    neighbors — Adamic-Adar with the logarithm dropped, the strongest
    simple predictor on dense-community graphs. Same capped-wedge
    candidate plan as adamic_adar_topk (one equi-join, hub centers
    dropped BEFORE the join)."""
    und = _und(edges)
    scores = (
        _wedges(und, hub_cap)
        .groupBy("u", "v")
        .agg(F.sum(1.0 / F.col("deg_w").cast("double")).alias("raw"))
    )
    adj = und.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    nonadj = scores.join(adj, ["u", "v"], "left_anti").select(
        "u", "v", F.round("raw", 6).alias("score")
    )
    top = nonadj.orderBy(F.desc("score"), F.asc("u"), F.asc("v")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("u"), F.asc("v"))
    return top.withColumn("rn", F.row_number().over(w).cast("long"))


def preferential_attachment_topk(
    edges: DataFrame, k: int = 50, hub_cap: int = 128
) -> DataFrame:
    """Preferential-attachment link prediction → top-k non-adjacent 2-hop
    pairs (u, v, score, rn), score = deg(u)·deg(v) with FULL degrees
    (the wedge cap bounds candidate generation only, like
    vertex_jaccard_topk's denominator). Candidates are restricted to
    pairs sharing a neighbor — all-pairs PA is O(n²) and adds nothing: a
    disconnected high-degree pair is never a useful link suggestion."""
    und = _und(edges)
    deg = _und_degrees(und)
    cand = _wedges(und, hub_cap).select("u", "v").distinct()
    adj = und.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("deg_v"))
    scored = (
        cand.join(adj, ["u", "v"], "left_anti")
        .join(du.hint("shuffle_hash"), "u")
        .join(dv.hint("shuffle_hash"), "v")
        .select("u", "v", (F.col("deg_u") * F.col("deg_v")).cast("long").alias("score"))
    )
    top = scored.orderBy(F.desc("score"), F.asc("u"), F.asc("v")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("u"), F.asc("v"))
    return top.withColumn("rn", F.row_number().over(w).cast("long"))


def community_modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-community Newman modularity contributions for a vertex
    partition → (label, n_vertices, intra_edges, deg_sum, contribution).

    Q = Σ_c [ e_c/m − (D_c/(2m))² ] over the undirected simple graph
    (m = undirected edge count, e_c = intra-community edges, D_c = summed
    degree). Σ contribution = Q — the standard quality gate for label
    propagation / community detection output.

    Plan: one labels⋈edges join per endpoint (labels is the small side —
    broadcast/SHJ by AQE), two map-side-combining groupBys, and m as a
    driver scalar. No wedge joins; cost is O(m) with one shuffle keyed by
    community — hub communities partial-aggregate before the exchange.
    """
    und = _und(edges).where(F.col("src") < F.col("dst")).persist()
    m = und.count()
    lab = labels.select(F.col("id").cast("long"), F.col("label").cast("long"))
    la = lab.select(F.col("id").alias("src"), F.col("label").alias("la"))
    lb = lab.select(F.col("id").alias("dst"), F.col("label").alias("lb"))
    intra = (
        und.join(la.hint("shuffle_hash"), "src")
        .join(lb.hint("shuffle_hash"), "dst")
        .where(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count(F.lit(1)).alias("intra_edges"))
    )
    deg = _und_degrees(_und(edges))
    comm = (
        lab.join(deg.hint("shuffle_hash"), lab["id"] == deg["id"], "left")
        .select(lab["id"], "label", F.coalesce("deg", F.lit(0)).alias("deg"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.sum("deg").alias("deg_sum"),
        )
    )
    out = (
        comm.join(intra, "label", "left")
        .select(
            "label",
            F.col("n_vertices").cast("long").alias("n_vertices"),
            F.coalesce("intra_edges", F.lit(0)).cast("long").alias("intra_edges"),
            F.col("deg_sum").cast("long").alias("deg_sum"),
            F.round(
                F.coalesce("intra_edges", F.lit(0)) / F.lit(float(m))
                - F.pow(F.col("deg_sum") / F.lit(2.0 * m), F.lit(2.0)),
                6,
            ).alias("contribution"),
        )
    )
    und.unpersist()
    return out


def square_count(edges: DataFrame, hub_cap: int = 128) -> DataFrame:
    """Global 4-cycle (square) count → one row (pairs_common, squares).

    A square is determined by an opposite-corner pair {u,v} plus two of
    their common neighbors, and each square has two opposite pairs, so

        #C4 = ½ · Σ_{u<v} C(c_uv, 2),   c_uv = |Γ(u) ∩ Γ(v)|

    computed off the SAME capped wedge plan as the link predictors
    (deg(center) ≤ hub_cap dropped before the self-join — the declared
    web-scale fan-out bound; the SQL twin applies the identical cap).
    Squares through a hub center are excluded by that cap, exactly like
    AA/RA/PA candidates. All-integer arithmetic: c·(c−1) is even and the
    pair-sum counts every square twice, so both halvings are exact
    shifts. ``pairs_common`` = #pairs with ≥1 (capped) common neighbor —
    the candidate-table size the predictors also see.
    """
    und = _und(edges)
    c = (
        _wedges(und, hub_cap)
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return c.agg(
        F.count(F.lit(1)).cast("long").alias("pairs_common"),
        F.shiftright(
            F.sum(F.shiftright(F.col("c") * (F.col("c") - 1), 1)), 1
        ).cast("long").alias("squares"),
    )


def scan_statistic(edges: DataFrame, k: int = 100) -> DataFrame:
    """Top-k vertices by scan statistic → (id, deg, triangles, scan_stat, rn).

    Λ(v) = |E(N[v])|, the edge count of the CLOSED 1-hop neighborhood
    (Priebe et al., "Scan Statistics on Enron Graphs", Comput. Math.
    Organ. Theory 2005) — the locality statistic whose outliers flag
    anomalously dense neighborhoods (spam farms / link rings in a web
    corpus). Exactly Λ(v) = deg(v) + T(v): the deg(v) edges incident to
    v plus the T(v) edges among its neighbors (each neighbor-neighbor
    edge closes one triangle through v, bijectively).

    Scale shape: composes the two verified single-shuffle aggregates
    (undirected degree + degree-oriented triangle counts, O(m^1.5) with
    O(√m) adjacency rows) and takes the global top-k via orderBy+limit —
    Spark plans TakeOrderedAndProject (per-partition heaps + driver
    merge of k rows), never a single-partition window over |V|. The
    ranking key is all-integer, so the rank is engine-exact with no
    rounding discipline needed; rn is assigned on the k collected rows.
    """
    und = _und(edges)
    deg = _und_degrees(und)
    tri = triangle_count_per_vertex(edges, vertices=deg.select("id"))
    scored = deg.join(tri, "id").select(
        "id",
        F.col("deg").cast("long").alias("deg"),
        "triangles",
        (F.col("deg") + F.col("triangles")).cast("long").alias("scan_stat"),
    )
    top = scored.orderBy(F.desc("scan_stat"), F.asc("id")).limit(k)
    w = Window.orderBy(F.desc("scan_stat"), F.asc("id"))
    return top.withColumn("rn", F.row_number().over(w).cast("long"))


def attribute_assortativity(
    edges: DataFrame, labels: DataFrame, default: str = "none"
) -> DataFrame:
    """edges(src,dst) + labels(id, lab) → one row (n_pairs, n_labels,
    sum_diag, sum_prod, assortativity).

    Newman's nominal (categorical) assortativity — the homophily
    coefficient (Newman, "Mixing patterns in networks", PRE 2003):
    r = (Σ_i e_ii − Σ_i a_i b_i) / (1 − Σ_i a_i b_i) over the label
    mixing matrix. Computed integer-exactly from raw counts: with n_ij
    the directed-symmetric pair counts, n = Σ n_ij, row/col marginals
    r_i/c_i, the identity r = (n·Σ n_ii − Σ r_i c_i)/(n² − Σ r_i c_i)
    makes the single final division the only float (Python-bigint safe
    at any scale). r = 1 is perfect homophily, 0 random mixing, < 0
    disassortative; NULL when one label covers the graph (undefined).

    Scale shape: the label table broadcasts to both endpoints, one
    map-side-combined groupBy to the ≤k² mixing matrix (k = label
    domain), and the O(k²) finish runs driver-side on those counts —
    the same bounded-collect pattern as the sketch operators. Vertices
    without a label take ``default``.
    """
    und = _und(edges)
    la = labels.select(F.col("id").alias("src"), F.col("lab").alias("la"))
    lb = labels.select(F.col("id").alias("dst"), F.col("lab").alias("lb"))
    mix = (
        und.join(F.broadcast(la), "src", "left")
        .join(F.broadcast(lb), "dst", "left")
        .select(
            F.coalesce("la", F.lit(default)).alias("la"),
            F.coalesce("lb", F.lit(default)).alias("lb"),
        )
        .groupBy("la", "lb")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )
    n = sum(r["n"] for r in mix)
    labs = sorted({r["la"] for r in mix} | {r["lb"] for r in mix})
    cnt = {(r["la"], r["lb"]): r["n"] for r in mix}
    row = {l: sum(v for (a, _), v in cnt.items() if a == l) for l in labs}
    col = {l: sum(v for (_, b), v in cnt.items() if b == l) for l in labs}
    diag = sum(cnt.get((l, l), 0) for l in labs)
    prod = sum(row[l] * col[l] for l in labs)
    denom = n * n - prod
    if denom:
        # half-away-from-zero, matching DuckDB ROUND (python round() is
        # banker's and would diverge on exact .5 boundaries)
        import math

        x = (n * diag - prod) / denom
        r_val = math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6
    else:
        r_val = None
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(n, len(labs), diag, prod, r_val)],
        "n_pairs long, n_labels long, sum_diag long, sum_prod long, assortativity double",
    )


def edge_embeddedness(edges: DataFrame, k: int = 100) -> DataFrame:
    """Top-k edges by embeddedness → (a, b, emb, jaccard, rn).

    Embeddedness of an edge = |N(a) ∩ N(b)|, its triangle support — the
    classic tie-strength / strong-triadic-closure signal (Granovetter;
    Easley & Kleinberg ch. 3): high-embeddedness edges are intra-
    community, embeddedness-0 edges are bridges (and exactly the k-truss
    peel candidates). ``jaccard`` = emb / (deg(a)+deg(b)−emb−2), the
    edge-neighborhood overlap with the endpoints excluded (NULL for a
    bridge between two pendant vertices where the union is empty).

    Scale shape: each triangle from the degree-oriented counter is
    redistributed to its three edges via one explode + map-side-combined
    groupBy (the per-EDGE twin of triangle_count_per_vertex); degrees
    broadcast-join onto the ≤|E| support rows; the all-integer ranking
    key (emb desc, a, b) is taken with TakeOrderedAndProject and rn is
    assigned on the k collected rows."""
    from metis_spark.plans.triangles import _per_edge_commons

    und = _und(edges)
    deg = _und_degrees(und)
    per = _per_edge_commons(edges).where(F.col("n_common") > 0)
    tri = per.select("src", "dst", F.explode("common").alias("w"))
    sides = (
        tri.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .unionByName(
            tri.select(F.least("src", "w").alias("a"), F.greatest("src", "w").alias("b"))
        )
        .unionByName(
            tri.select(F.least("dst", "w").alias("a"), F.greatest("dst", "w").alias("b"))
        )
    )
    emb = sides.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("emb"))
    u = und.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("degb"))
    scored = (
        u.join(emb, ["a", "b"], "left")
        .select("a", "b", F.coalesce("emb", F.lit(0)).alias("emb"))
        .join(da.hint("shuffle_hash"), "a")
        .join(db.hint("shuffle_hash"), "b")
        .select(
            "a",
            "b",
            "emb",
            F.when(
                (F.col("dega") + F.col("degb") - F.col("emb") - 2) > 0,
                F.round(
                    F.col("emb") / (F.col("dega") + F.col("degb") - F.col("emb") - 2), 6
                ),
            ).alias("jaccard"),
        )
    )
    top = scored.orderBy(F.desc("emb"), F.asc("a"), F.asc("b")).limit(k)
    w = Window.orderBy(F.desc("emb"), F.asc("a"), F.asc("b"))
    return top.withColumn("rn", F.row_number().over(w).cast("long"))


def forman_curvature(edges: DataFrame, k: int = 100) -> DataFrame:
    """Bottom-k edges by augmented Forman-Ricci curvature →
    (a, b, support, curvature, rn) — the discrete network-geometry
    boundary detector (Sreejith et al. JSTAT 2016; Samal et al.
    Sci. Rep. 2018: curvature separates intra- from inter-community
    edges and correlates with edge betweenness at a fraction of the
    cost). For an unweighted graph the triangle-augmented form is
    all-integer:

        F#(u,v) = 4 − deg(u) − deg(v) + 3·|N(u) ∩ N(v)|

    The most NEGATIVE edges (two hubs joined by a thinly-supported tie)
    are the community boundaries / bottlenecks — exactly the edges a
    partitioner wants to cut and a cascade model watches — so the
    ranking is curvature ASC. Ties break (a, b) for determinism.

    Scale shape: identical cost class to edge_embeddedness (one
    triangle-redistribution explode + map-side-combined groupBy for the
    support table, two shuffle-hash degree joins onto ≤|E| rows); the
    ranking key is all-integer so TakeOrderedAndProject streams the
    bottom-k without a global sort. No new machinery at 10^12 edges —
    this is a constant-cost reinterpretation of the truss/embeddedness
    support table the engine already maintains.

    Mirrors the reference's per-edge analytics surface (per-row derived
    metrics over the edge table, Metis/metis/PandasHelpers.py:21-40)
    re-expressed as one declarative plan.
    """
    from metis_spark.plans.triangles import _per_edge_commons

    und = _und(edges)
    deg = _und_degrees(und)
    per = _per_edge_commons(edges).where(F.col("n_common") > 0)
    tri = per.select("src", "dst", F.explode("common").alias("w"))
    sides = (
        tri.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .unionByName(
            tri.select(F.least("src", "w").alias("a"), F.greatest("src", "w").alias("b"))
        )
        .unionByName(
            tri.select(F.least("dst", "w").alias("a"), F.greatest("dst", "w").alias("b"))
        )
    )
    sup = sides.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("support"))
    u = und.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("degb"))
    scored = (
        u.join(sup, ["a", "b"], "left")
        .select("a", "b", F.coalesce("support", F.lit(0)).alias("support"))
        .join(da.hint("shuffle_hash"), "a")
        .join(db.hint("shuffle_hash"), "b")
        .select(
            "a",
            "b",
            "support",
            (
                F.lit(4) - F.col("dega") - F.col("degb") + F.lit(3) * F.col("support")
            )
            .cast("long")
            .alias("curvature"),
        )
    )
    top = scored.orderBy(F.asc("curvature"), F.asc("a"), F.asc("b")).limit(k)
    w = Window.orderBy(F.asc("curvature"), F.asc("a"), F.asc("b"))
    return top.withColumn("rn", F.row_number().over(w).cast("long"))


def structural_holes(
    edges: DataFrame, hub_cap: int = 128, micro: int = 1_000_000
) -> DataFrame:
    """Burt's structural-hole profile per vertex →
    (id, deg, eff_size, efficiency, constraint) — the brokerage /
    redundancy measures from "Structural Holes" (Burt 1992; unweighted
    simplifications per Borgatti, Connections 1997): a vertex whose
    neighbors don't know each other brokers information; one embedded in
    a clique is constrained.

      eff_size(i)  = d_i − 2·t_i/d_i   (t_i = ties among N(i) = triangles
                     at i; each redundant tie eats 2/d of the ego net)
      efficiency   = eff_size / d_i
      constraint(i)= Σ_{j∈N(i)} (p_ij + Σ_q p_iq·p_qj)²,  p_xy = 1/d_x,
                     q ranging over shared neighbors of i and j

    Float discipline: the q-sum and the j-sum are ORDER-DEPENDENT float
    folds, so both are quantized to integers before summing — the q-sum
    as Σ FLOOR(micro/d_q) (exact in both engines), the j-sum as
    Σ FLOOR(micro·c_ij) where c_ij is the identical IEEE-double square —
    making the operator engine-exact; only the final /micro display
    division is float. Wedge centers q with deg > hub_cap are dropped
    (declared semantics, shared with the link predictors: a hub center
    contributes ≤ 1/(d_i·cap) ≈ 0 per term while fanning deg² wedge
    rows; the oracle applies the identical cap).

    Scale shape: one capped wedge join (the adamic-adar plan shape)
    semi-joined against adjacency, one triangle-per-vertex aggregate,
    two map-side-combined integer groupBys — nothing new at 10^12 edges.
    """
    und = _und(edges)
    deg = _und_degrees(und)
    adj = und.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    # q-sums over shared neighbors of ADJACENT pairs only (the c_ij set);
    # the q-set of (i,j) equals that of (j,i) so the u<v wedge mirrors
    closed = _wedges(und, hub_cap).join(adj, ["u", "v"], "left_semi")
    s_uv = closed.groupBy("u", "v").agg(
        F.sum(F.floor(F.lit(micro) / F.col("deg_w"))).cast("long").alias("s")
    )
    s_dir = s_uv.unionByName(
        s_uv.select(F.col("v").alias("u"), F.col("u").alias("v"), "s")
    )
    pairs = adj.join(s_dir, ["u", "v"], "left").select(
        "u", F.coalesce("s", F.lit(0)).alias("s")
    )
    di = deg.select(F.col("id").alias("u"), F.col("deg").alias("deg_u"))
    x = 1.0 / F.col("deg_u") + F.col("s") / (float(micro) * F.col("deg_u"))
    cons = (
        pairs.join(di.hint("shuffle_hash"), "u")
        .select("u", F.floor(x * x * float(micro)).cast("long").alias("c_micro"))
        .groupBy("u")
        .agg(F.sum("c_micro").cast("long").alias("cons_micro"))
    )
    tri = triangle_count_per_vertex(edges, vertices=deg.select("id"))
    eff_raw = F.col("deg") - 2.0 * F.col("triangles") / F.col("deg")
    return (
        deg.join(tri, "id")
        .join(cons.select(F.col("u").alias("id"), "cons_micro"), "id")
        .select(
            "id",
            "deg",
            F.round(eff_raw, 6).alias("eff_size"),
            F.round(eff_raw / F.col("deg"), 6).alias("efficiency"),
            F.round(F.col("cons_micro") / float(micro), 6).alias("burt_constraint"),
        )
    )


def partition_agreement(labels_a: DataFrame, labels_b: DataFrame) -> DataFrame:
    """Adjusted Rand Index between two vertex partitions → one row
    (n, clusters_a, clusters_b, sum_nij2, sum_a2, sum_b2, ari) — the
    standard chance-corrected agreement score (Hubert & Arabie, J.
    Classification 1985) every community-detection paper reports when
    comparing two clusterings of the same graph:

        ARI = (I − A·B/T) / ((A+B)/2 − A·B/T)
        I = Σ_ij C(n_ij,2),  A = Σ_i C(a_i,2),  B = Σ_j C(b_j,2),
        T = C(n,2)

    Everything up to the final division is integer (C(x,2) via the even
    product x(x−1) shifted right — exact in both engines, no float
    folds), so the two engines agree bit-for-bit; only the one closed-
    form double expression at the end is float, rounded to 6. ``ari``
    is NULL when both partitions are trivial (denominator 0).

    Scale shape: the contingency table is ONE shuffle (groupBy on the
    label pair, map-side combined); its marginals re-aggregate rows
    bounded by the number of cluster PAIRS, not vertices, and the three
    1-row aggregates cross-join driver-side. Inputs are any (id, label)
    frames — Louvain vs LPA, Leiden vs SCAN, a snapshot vs a re-run.
    """
    a = labels_a.select(F.col("id").cast("long"), F.col("label").alias("la"))
    b = labels_b.select(F.col("id").cast("long"), F.col("label").alias("lb"))
    cont = (
        a.join(b, "id")
        .groupBy("la", "lb")
        .agg(F.count(F.lit(1)).cast("long").alias("nij"))
    )

    def c2(c):
        return F.shiftright(F.col(c) * (F.col(c) - F.lit(1)), 1)

    tot = cont.agg(
        F.sum("nij").cast("long").alias("n"),
        F.sum(c2("nij")).cast("long").alias("sum_nij2"),
    )
    am = (
        cont.groupBy("la")
        .agg(F.sum("nij").cast("long").alias("ai"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("clusters_a"),
            F.sum(c2("ai")).cast("long").alias("sum_a2"),
        )
    )
    bm = (
        cont.groupBy("lb")
        .agg(F.sum("nij").cast("long").alias("bj"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("clusters_b"),
            F.sum(c2("bj")).cast("long").alias("sum_b2"),
        )
    )
    t2 = F.shiftright(F.col("n") * (F.col("n") - F.lit(1)), 1)
    expected = F.col("sum_a2") * F.col("sum_b2") / t2
    denom = (F.col("sum_a2") + F.col("sum_b2")) / F.lit(2.0) - expected
    ari = F.when(
        denom != F.lit(0.0),
        F.round((F.col("sum_nij2") - expected) / denom, 6),
    )
    return (
        tot.crossJoin(am)
        .crossJoin(bm)
        .select(
            "n", "clusters_a", "clusters_b", "sum_nij2", "sum_a2", "sum_b2",
            ari.alias("ari"),
        )
    )


def graphlet4_census(edges: DataFrame, hub_cap: int = 128) -> DataFrame:
    """Non-induced census of all six connected 4-vertex graphlets →
    six rows (graphlet, cnt): ``c4_cycle``, ``diamond``, ``k4_clique``,
    ``p4_path``, ``s3_star``, ``tailed_triangle`` — the full motif
    signature one step past the triangle (ESCAPE, Pinar/Seshadhri/Vishal
    WWW'17: count 4-patterns from CLOSED FORMS over smaller-pattern
    aggregates instead of enumerating them).

    Only the two clique-like patterns are enumerated (both already
    verified operators); everything else is integer arithmetic over the
    degree / per-vertex-triangle / per-edge-support tables:

      s3_star   = Σ_v C(d_v, 3)                (pendant trio at a center)
      p4_path   = Σ_{(a,b)∈E} (d_a−1)(d_b−1) − 3T   (central-edge count;
                  the −3T removes the closed w=z walks, one per
                  triangle-edge incidence)
      tailed    = Σ_v t_v · (d_v − 2)          (triangle vertex + pendant)
      diamond   = Σ_e C(sup_e, 2)              (two triangles sharing the
                  chord e — each diamond counted once by its unique chord)
      c4_cycle  = ½ Σ_{u<v} C(c_uv, 2)         (square_count above — the
                  wedge term shares the link-predictor family's declared
                  hub cap; exact when max degree ≤ hub_cap, which the
                  pytest fixture and the driver graph both satisfy)
      k4_clique = kClist ordered enumeration (plans/triangles.py)

    Induced counts follow by the standard inclusion-exclusion on these
    six numbers (ESCAPE Table 1) and are deliberately not materialized:
    the non-induced (subgraph) counts are the mergeable quantities — at
    100 TB each term is a map-side-combined aggregate over tables the
    triangle/clique spine already builds, and no stage here adds a
    shuffle beyond those verified plans. All arithmetic is exact
    integers: d(d−1)(d−2) is divisible by 6 and sup(sup−1), c(c−1) by 2
    TERM-WISE, so both engines floor-divide exactly.
    """
    from metis_spark.plans.triangles import (
        _per_edge_commons,
        four_clique_count,
        triangle_count_per_vertex,
    )

    und = _und(edges)
    deg = _und_degrees(und).persist()

    s3 = deg.select(
        F.expr("deg * (deg - 1) * (deg - 2) div 6").alias("x")
    ).agg(F.coalesce(F.sum("x"), F.lit(0)).cast("long").alias("cnt"))

    canon = und.where(F.col("src") < F.col("dst"))
    da = deg.select(F.col("id").alias("src"), F.col("deg").alias("da"))
    db = deg.select(F.col("id").alias("dst"), F.col("deg").alias("db"))
    kc = four_clique_count(edges).persist()  # (triangles, four_cliques)
    p4_base = (
        canon.join(da.hint("shuffle_hash"), "src")
        .join(db.hint("shuffle_hash"), "dst")
        .agg(
            F.coalesce(
                F.sum((F.col("da") - 1) * (F.col("db") - 1)), F.lit(0)
            ).cast("long").alias("walks")
        )
    )
    p4 = p4_base.crossJoin(F.broadcast(kc)).select(
        (F.col("walks") - 3 * F.col("triangles")).cast("long").alias("cnt")
    )

    tv = triangle_count_per_vertex(edges, vertices=deg.select("id"))
    tailed = (
        tv.join(deg.hint("shuffle_hash"), "id")
        .select((F.col("triangles") * (F.col("deg") - 2)).alias("x"))
        .agg(F.coalesce(F.sum("x"), F.lit(0)).cast("long").alias("cnt"))
    )

    per = _per_edge_commons(edges).where(F.col("n_common") > 0)
    tri = per.select("src", "dst", F.explode("common").alias("w"))
    sides = (
        tri.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .unionByName(
            tri.select(F.least("src", "w").alias("a"), F.greatest("src", "w").alias("b"))
        )
        .unionByName(
            tri.select(F.least("dst", "w").alias("a"), F.greatest("dst", "w").alias("b"))
        )
    )
    sup = sides.groupBy("a", "b").agg(F.count(F.lit(1)).alias("s"))
    diamond = sup.select(
        F.shiftright(F.col("s") * (F.col("s") - 1), 1).alias("x")
    ).agg(F.coalesce(F.sum("x"), F.lit(0)).cast("long").alias("cnt"))

    c4 = square_count(edges, hub_cap=hub_cap).select(
        F.col("squares").alias("cnt")
    )
    k4 = kc.select(F.col("four_cliques").cast("long").alias("cnt"))

    def tag(df: DataFrame, name: str) -> DataFrame:
        return df.select(F.lit(name).alias("graphlet"), F.col("cnt"))

    return (
        tag(c4, "c4_cycle")
        .unionByName(tag(diamond, "diamond"))
        .unionByName(tag(k4, "k4_clique"))
        .unionByName(tag(p4, "p4_path"))
        .unionByName(tag(s3, "s3_star"))
        .unionByName(tag(tailed, "tailed_triangle"))
    )


def cocitation_coupling_topk(
    edges: DataFrame, k: int = 50, hub_cap: int = 128
) -> DataFrame:
    """Co-citation (Small, JASIS 1973) + bibliographic coupling (Kessler,
    American Documentation 1963) → top-k (u, v, cocitation, coupling, rn)
    pairs of the DIRECTED link graph — the two classic citation-analysis
    similarities the undirected predictors (adamic_adar, vertex_jaccard)
    cannot express: cocitation(a,b) = |{w : w→a ∧ w→b}| (how often the
    pair is cited TOGETHER), coupling(a,b) = |{w : a→w ∧ b→w}| (how much
    the pair cites the SAME sources). On a package/file import graph:
    co-cited = substitutable providers, coupled = same-stack consumers.

    Plan: two capped directed-wedge generations (the _wedges discipline —
    hub centers dropped BEFORE the self-join so the fan-out bound
    out-deg ≤ hub_cap / in-deg ≤ hub_cap holds in the plan), each one
    map-side-combined pair count, then a full-outer pair merge and a
    distributed sort-limit; the ranking window sees only k rows. The cap
    bounds candidate generation at Σ_w C(deg_w≤cap, 2) — linear in |E|
    times cap, never all-pairs.

    Reference parity: extends §2.10's link-prediction family to the
    directed two-sided similarities; no reference twin (Metis has no
    graph operators — see SURVEY §2.10 preamble).
    """
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )

    def _pairs(half: DataFrame, name: str) -> DataFrame:
        # half: (w, n) — n's sharing a center w, center fan-out pre-capped
        left = half.select("w", F.col("n").alias("u"))
        right = half.select("w", F.col("n").alias("v"))
        return (
            left.join(right, "w")
            .where(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias(name))
        )

    citers = (
        e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        .where(F.col("d") <= hub_cap).select("src")
    )
    cocit = _pairs(
        e.join(citers.hint("shuffle_hash"), "src")
        .select(F.col("src").alias("w"), F.col("dst").alias("n")),
        "cocitation",
    )
    cited = (
        e.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
        .where(F.col("d") <= hub_cap).select("dst")
    )
    coup = _pairs(
        e.join(cited.hint("shuffle_hash"), "dst")
        .select(F.col("dst").alias("w"), F.col("src").alias("n")),
        "coupling",
    )
    merged = (
        cocit.join(coup, ["u", "v"], "full_outer")
        .select(
            "u", "v",
            F.coalesce("cocitation", F.lit(0)).alias("cocitation"),
            F.coalesce("coupling", F.lit(0)).alias("coupling"),
        )
    )
    order = [F.desc("cocitation"), F.desc("coupling"), F.asc("u"), F.asc("v")]
    top = merged.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rn", F.row_number().over(w).cast("long"))


def refex_features(edges: DataFrame, rounds: int = 2) -> DataFrame:
    """ReFeX recursive structural features (Henderson et al., "It's who
    you know: graph mining using recursive structural features",
    KDD'11) → per-vertex integer feature vector for role discovery /
    graph-ML pipelines: the base feature (degree) recursively aggregated
    over neighborhoods, so vertices get comparable structural signatures
    WITHOUT any global embedding (hubs look like hubs, bridges like
    bridges, whatever component they sit in).

    Feature set (all exact integers — ReFeX's mean aggregator is
    replaced by the (sum, max) pair so the DuckDB twin replays without a
    float discipline; the mean is recoverable as sum/deg downstream):

        round 0: deg(v)
        round r: for every round-(r−1) feature f: Σ_{n∈N(v)} f(n) and
                 max_{n∈N(v)} f(n)

    With rounds = 2 that is (id, deg, s1, m1, ss2, sm2, ms2, mm2) —
    ss2 = Σ of neighbor Σs, sm2 = Σ of neighbor maxes, ms2/mm2 the max
    counterparts. Per round: ONE adjacency gather join + one map-side-
    combined groupBy computing every (sum, max) pair in the same
    aggregation — feature count doubles per round but the shuffle count
    stays one, so 100 TB cost is `rounds` gathers of the WL/LPA class.
    Sums are decimal(38,0): a hub's sum-of-sums reaches deg² · max-deg.

    Reference parity: no reference analog (Metis has no graph surface);
    the role-feature complement to the WL color family (plans/wl.py).
    """
    und = _und(edges)
    deg = _und_degrees(und)
    state = deg.select("id", F.col("deg").cast("decimal(38,0)").alias("deg"))
    feats = ["deg"]
    for r in range(1, rounds + 1):
        gathered = und.join(
            state.withColumnRenamed("id", "src"), "src"
        ).groupBy(F.col("dst").alias("id")).agg(
            *[
                a
                for f in feats
                for a in (
                    F.sum(f).alias(f"s_{f}"),
                    F.max(f).alias(f"m_{f}"),
                )
            ]
        )
        state = state.join(gathered, "id")  # every vertex has >=1 neighbor
        feats = [p + f for f in feats for p in ("s_", "m_")]
        state = state.localCheckpoint()
    # outputs cast to long: bounded by deg^rounds * max_deg < 2^53 on any
    # graph this runs against (asserted by the decimal accumulators
    # upstream — an overflow would fail the cast loudly under ANSI)
    names = {"s_deg": "s1", "m_deg": "m1", "s_s_deg": "ss2", "s_m_deg": "sm2",
             "m_s_deg": "ms2", "m_m_deg": "mm2"}
    cols = [F.col("id"), F.col("deg").cast("long").alias("deg")]
    order = ["s_deg", "m_deg", "s_s_deg", "s_m_deg", "m_s_deg", "m_m_deg"]
    for f in order:
        if rounds >= f.count("_"):
            cols.append(F.col(f).cast("long").alias(names[f]))
    return state.select(*cols)


def vertex_mirror_topk(
    edges: DataFrame,
    k: int = 50,
    num_hashes: int = 4,
    bands: int = 2,
) -> DataFrame:
    """Structural mirror detection → top-k (u, v, n_common, jaccard, rn)
    candidate pairs of vertices with near-identical OUT-neighborhoods —
    the link-farm mirror / template-clone signal (two pages linking to
    the same target set are one "page" for ranking purposes; Broder's
    shingling argument applied to adjacency sets instead of text).

    MinHash-LSH over neighborhoods, the dedup discipline verbatim
    (operators/dedup.py): h_i(n) = md5(i ∥ '|' ∥ n), signature = string
    min per seed (portable across engines), seeds split into ``bands``
    bands of ``num_hashes/bands`` rows, band key = '#'-joined in-band
    minima; ONLY vertices sharing a full band key become candidates —
    the corpus never self-joins. Candidates verify with the exact
    neighborhood Jaccard via one co-grouped common count; ranking is
    (ROUND(jaccard,6) desc, u, v) so the twin replays it.

    100 TB shape: signatures are one explode(seq) + map-side-combined
    min per (vertex, seed); candidate volume is controlled by the band
    parameters exactly like document LSH — mirrors collide with
    probability 1-(1-J^r)^b, unrelated vertices almost never.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    nbr = (
        edges.select(F.col("src").cast("long").alias("u"), F.col("dst").cast("long").alias("n"))
        .where(F.col("u") != F.col("n"))
        .distinct()
        .persist()
    )
    deg = nbr.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    sigs = (
        nbr.select("u", "n", seeds)
        .groupBy("u", "seed")
        .agg(F.min(F.md5(F.concat_ws("|", F.col("seed"), F.col("n")))).alias("mh"))
    )
    bandkeys = (
        sigs.withColumn("band", (F.col("seed") / rows).cast("int"))
        .groupBy("u", "band")
        .agg(F.concat_ws("#", F.array_sort(F.collect_list("mh"))).alias("bk"))
    )
    cand = (
        bandkeys.alias("a")
        .join(bandkeys.alias("b"), ["band", "bk"])
        .where(F.col("a.u") < F.col("b.u"))
        .select(F.col("a.u").alias("u"), F.col("b.u").alias("v"))
        .distinct()
    )
    common = (
        cand.join(nbr.select(F.col("u"), F.col("n")), "u")
        .join(
            nbr.select(F.col("u").alias("v"), F.col("n")),
            ["v", "n"],
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    du = deg.select(F.col("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("u").alias("v"), F.col("d").alias("dv"))
    scored = (
        cand.join(common, ["u", "v"], "left")
        .join(du.hint("shuffle_hash"), "u")
        .join(dv.hint("shuffle_hash"), "v")
        .select(
            "u",
            "v",
            F.coalesce("n_common", F.lit(0)).alias("n_common"),
            F.round(
                F.coalesce("n_common", F.lit(0))
                / (F.col("du") + F.col("dv") - F.coalesce("n_common", F.lit(0))).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )
    order = [F.desc("jaccard"), F.asc("u"), F.asc("v")]
    top = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    out = top.withColumn("rn", F.row_number().over(w).cast("long"))
    rows_out = out.collect()
    nbr.unpersist()
    return edges.sparkSession.createDataFrame(
        rows_out, "u long, v long, n_common long, jaccard double, rn long"
    )


def collective_influence(
    edges: DataFrame, k: int = 100, hub_cap: int = 128
) -> DataFrame:
    """Collective influence at radius 2 → top-k rows
    (id, deg, n_ball2, ci, rn) by CI descending.

        CI_2(v) = (deg(v) − 1) · Σ_{u ∈ ∂B(v,2)} (deg(u) − 1)

    Morone & Makse (Nature 2015): the optimal-percolation influencer
    score — the vertices whose removal most quickly fragments the giant
    component, and the standard seed ranking for influence maximization
    that degree alone gets wrong (a mid-degree vertex wired to hubs
    outranks an isolated hub). ∂B(v,2) is the set of vertices at exact
    distance 2 from v. All-integer, so both engines fold identically.

    Scale shape: one capped wedge equi-join (the Adamic-Adar bound —
    centers with deg > hub_cap are dropped BEFORE the join, and the cap
    is part of the declared semantics, mirrored by the oracle), one
    distinct, one anti-join against adjacency for the exact-distance-2
    test, then a single map-side-combined groupBy over the symmetrized
    ring pairs. Top-k via distributed sort + limit; the ranking window
    only ever sees the surviving ≤ k rows.
    """
    und = _und(edges)
    deg = _und_degrees(und)
    ring_pairs = (
        _wedges(und, hub_cap)
        .select("u", "v")
        .distinct()
        .join(und, [und.src == F.col("u"), und.dst == F.col("v")], "left_anti")
    )
    sym = ring_pairs.select(F.col("u").alias("id"), F.col("v").alias("nbr")).unionByName(
        ring_pairs.select(F.col("v").alias("id"), F.col("u").alias("nbr"))
    )
    ring_mass = (
        sym.join(
            deg.select(F.col("id").alias("nbr"), F.col("deg").alias("deg_nbr")).hint(
                "shuffle_hash"
            ),
            "nbr",
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ball2"),
            F.sum(F.col("deg_nbr") - F.lit(1)).cast("long").alias("mass"),
        )
    )
    scored = deg.join(ring_mass, "id", "left").select(
        "id",
        "deg",
        F.coalesce("n_ball2", F.lit(0)).alias("n_ball2"),
        ((F.col("deg") - F.lit(1)) * F.coalesce("mass", F.lit(0)))
        .cast("long")
        .alias("ci"),
    )
    order = [F.desc("ci"), F.asc("id")]
    top = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rn", F.row_number().over(w).cast("long"))


def core_periphery_blocks(cores: DataFrame, edges: DataFrame) -> DataFrame:
    """Borgatti–Everett core–periphery block profile → one row
    (kmax, n_core, n_periph, e_cc, e_cp, e_pp, density_cc, density_cp,
    density_pp, be_corr).

    Given per-vertex core numbers (the verified coreness spine), the
    CORE is the degeneracy shell (core == kmax) and everything else is
    periphery. The three dyad blocks are counted exactly, densities are
    block count / block capacity, and ``be_corr`` is Borgatti & Everett
    (Social Networks 1999)'s pattern-matrix fit — the Pearson
    correlation between the adjacency and the ideal image matrix
    (Δ = 1 unless both endpoints are periphery) — in the closed
    integer form

        ρ = (m1·N − m·P1) / sqrt(m·(N−m) · P1·(N−P1))

    with N total dyads, P1 ideal-one dyads, m edges, m1 edges on
    ideal-one dyads. Every input to the two float folds (densities,
    ρ) is an exact integer, so both engines agree.

    Scale shape: one max-aggregate broadcast back (crossJoin of a 1-row
    frame — no driver collect), two shuffle-hash flag joins on the
    a<b pair list, one conditional-sum aggregate. The coreness input is
    the already-checkpointed fixpoint; this adds a single pass over the
    edge list.
    """
    und = _und(edges)
    pairs = und.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    km = cores.agg(F.max("core").alias("kmax"))
    flags = cores.crossJoin(F.broadcast(km)).select(
        "id", "kmax", (F.col("core") == F.col("kmax")).alias("is_core")
    )
    fa = flags.select(F.col("id").alias("a"), F.col("is_core").alias("ca"))
    fb = flags.select(F.col("id").alias("b"), F.col("is_core").alias("cb"))
    blk = (
        pairs.join(fa.hint("shuffle_hash"), "a")
        .join(fb.hint("shuffle_hash"), "b")
        .agg(
            F.sum((F.col("ca") & F.col("cb")).cast("long")).alias("e_cc"),
            F.sum((F.col("ca") != F.col("cb")).cast("long")).alias("e_cp"),
            F.sum((~F.col("ca") & ~F.col("cb")).cast("long")).alias("e_pp"),
        )
    )
    cnt = flags.agg(
        F.max("kmax").cast("long").alias("kmax"),
        F.sum(F.col("is_core").cast("long")).cast("long").alias("n_core"),
        F.sum((~F.col("is_core")).cast("long")).cast("long").alias("n_periph"),
    )
    nc = F.col("n_core")
    np_ = F.col("n_periph")
    n = nc + np_
    cap_cc = F.shiftright(nc * (nc - F.lit(1)), 1)
    cap_cp = nc * np_
    cap_pp = F.shiftright(np_ * (np_ - F.lit(1)), 1)
    n_dyads = F.shiftright(n * (n - F.lit(1)), 1)
    p1 = cap_cc + cap_cp
    m = F.col("e_cc") + F.col("e_cp") + F.col("e_pp")
    m1 = F.col("e_cc") + F.col("e_cp")

    def _dens(e, cap):
        return F.when(
            cap > 0, F.round(e.cast("double") / cap.cast("double"), 6)
        )

    denom = (
        m.cast("double")
        * (n_dyads - m).cast("double")
        * p1.cast("double")
        * (n_dyads - p1).cast("double")
    )
    rho = F.when(
        denom > 0,
        F.round(
            (m1 * n_dyads - m * p1).cast("double") / F.sqrt(denom),
            6,
        ),
    )
    return cnt.crossJoin(F.broadcast(blk)).select(
        "kmax",
        "n_core",
        "n_periph",
        "e_cc",
        "e_cp",
        "e_pp",
        _dens(F.col("e_cc"), cap_cc).alias("density_cc"),
        _dens(F.col("e_cp"), cap_cp).alias("density_cp"),
        _dens(F.col("e_pp"), cap_pp).alias("density_pp"),
        rho.alias("be_corr"),
    )


def map_equation(labels: DataFrame, edges: DataFrame) -> DataFrame:
    """Rosvall–Bergstrom map equation (PNAS 2008) of a vertex partition
    → one row (n_modules, two_m, q_num, index_micro, modules_micro,
    codelength) — the information-theoretic quality every flow-based
    community method (Infomap) optimizes: the expected bits per step to
    describe an infinite random walk under a two-level codebook. Lower
    is better; it is the flow-centric complement to modularity (which
    counts edges, not walk time) for evaluating Louvain/Leiden/LPA
    output.

        L(M) = plogp(q) − 2·Σ_m plogp(q_m) + Σ_m plogp(p∘_m)
               − Σ_v plogp(p_v),   plogp(x) = x·log2(x)

    On an undirected unweighted graph the walk's stationary visit rate
    is EXACTLY p_v = deg(v)/2m and the module exit rate q_m = cut_m/2m
    (cut_m = directed edge endpoints leaving m) — every plogp argument
    is a ratio of two integers. Each plogp term is quantized to integer
    MICRO-BITS as a pure function of its integer pair (the
    char_bigram_entropy discipline), so the cross-module and
    cross-degree sums are exact integer additions in any order; the
    single trailing float is ROUND(sum/1e6, 6).

    Scale shape: one label-gather join on the symmetric edge list, one
    map-side-combined per-module groupBy, one per-degree groupBy for
    the vertex term (rows bounded by #distinct degrees), and the 2m
    scalar broadcast back via crossJoin(1-row) — no driver collect.
    """
    und = _und(edges)
    deg = _und_degrees(und)
    lab = labels.select(F.col("id").cast("long"), F.col("label").alias("module"))
    two_m = deg.agg(F.sum("deg").cast("long").alias("two_m"))

    ls = lab.select(F.col("id").alias("src"), F.col("module").alias("ms"))
    ld = lab.select(F.col("id").alias("dst"), F.col("module").alias("md"))
    cut = (
        und.join(ls.hint("shuffle_hash"), "src")
        .join(ld.hint("shuffle_hash"), "dst")
        .where(F.col("ms") != F.col("md"))
        .groupBy(F.col("ms").alias("module"))
        .agg(F.count(F.lit(1)).cast("long").alias("cut"))
    )
    vol = (
        deg.join(lab.hint("shuffle_hash"), "id")
        .groupBy("module")
        .agg(F.sum("deg").cast("long").alias("vol"))
    )
    mods = vol.join(cut, "module", "left").select(
        "module", "vol", F.coalesce("cut", F.lit(0)).alias("cut")
    )

    def plogp_micro(a):
        x = a.cast("double") / F.col("two_m").cast("double")
        return (
            F.when(a > 0, F.round(x * F.log2(x) * F.lit(1e6)).cast("long"))
            .otherwise(F.lit(0))
            .cast("long")
        )

    mod_terms = mods.crossJoin(F.broadcast(two_m)).select(
        F.col("cut").alias("cut"),
        plogp_micro(F.col("cut")).alias("t_cut"),
        plogp_micro(F.col("cut") + F.col("vol")).alias("t_circ"),
    )
    mod_agg = mod_terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_modules"),
        F.sum("cut").cast("long").alias("q_num"),
        F.sum("t_cut").cast("long").alias("sum_t_cut"),
        F.sum("t_circ").cast("long").alias("sum_t_circ"),
    )
    vert = (
        deg.groupBy("deg")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .crossJoin(F.broadcast(two_m))
        .select((F.col("cnt") * plogp_micro(F.col("deg"))).alias("t"))
        .agg(F.sum("t").cast("long").alias("sum_t_vert"))
    )
    folded = (
        mod_agg.crossJoin(F.broadcast(two_m))
        .crossJoin(F.broadcast(vert))
        .select(
            "n_modules",
            "two_m",
            "q_num",
            plogp_micro(F.col("q_num")).alias("t_q"),
            "sum_t_cut",
            "sum_t_circ",
            "sum_t_vert",
        )
    )
    index_micro = F.col("t_q") - F.col("sum_t_cut")
    modules_micro = (
        F.col("sum_t_circ") - F.col("sum_t_cut") - F.col("sum_t_vert")
    )
    return folded.select(
        "n_modules",
        "two_m",
        "q_num",
        index_micro.cast("long").alias("index_micro"),
        modules_micro.cast("long").alias("modules_micro"),
        F.round((index_micro + modules_micro).cast("double") / F.lit(1e6), 6).alias(
            "codelength"
        ),
    )


def degree_discount_seeds(
    edges: DataFrame, k: int = 16, p_tenths: int = 1
) -> DataFrame:
    """Degree-discount influence maximization (Chen, Wang & Yang, KDD
    2009) → k rows (rank, id, gain10): the classic near-greedy seed set
    for the independent-cascade model at propagation probability
    p = p_tenths/10 — within a hair of full greedy IC simulation at a
    millionth of its cost, and the standard baseline every influence-
    maximization paper reports. Complements `collective_influence`
    (static score) with an adaptive, overlap-aware seed SET: once a hub
    is chosen, its neighbors' discounted degrees drop, so the k seeds
    spread out instead of clustering in one community.

        dd(v) = d_v − 2·t_v − (d_v − t_v)·t_v·p,   t_v = |N(v) ∩ seeds|

    Everything is kept in integer TENTHS (gain10 = 10·d − 20·t −
    (d−t)·t·p_tenths), so selection order is bit-identical in both
    engines; ties break by ascending id.

    Scale shape: k rounds, each ONE broadcast-filtered neighbor count
    (the ≤k seed ids ride the closure — no shuffle of the seed side),
    one left join onto the degree table and a TakeOrdered argmax
    (orderBy().limit(1)); the driver holds exactly k rows (the
    kcenter_seeds discipline). State is recomputed from the seed list
    each round — nothing iterative persists, so no lineage growth.
    """
    und = _und(edges).persist()
    deg = _und_degrees(und).persist()
    deg.count()
    seeds: list[tuple[int, int, int]] = []
    for rn in range(1, k + 1):
        if seeds:
            sel = [s[1] for s in seeds]
            t = (
                und.where(F.col("src").isin(sel))
                .groupBy(F.col("dst").alias("id"))
                .agg(F.count(F.lit(1)).cast("long").alias("t"))
            )
            cand = (
                deg.where(~F.col("id").isin(sel))
                .join(t.hint("shuffle_hash"), "id", "left")
                .select("id", "deg", F.coalesce("t", F.lit(0)).alias("t"))
            )
        else:
            cand = deg.select("id", "deg", F.lit(0).alias("t"))
        gain10 = (
            F.lit(10) * F.col("deg")
            - F.lit(20) * F.col("t")
            - (F.col("deg") - F.col("t")) * F.col("t") * F.lit(p_tenths)
        ).cast("long")
        top = (
            cand.select("id", gain10.alias("gain10"))
            .orderBy(F.desc("gain10"), F.asc("id"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        seeds.append((rn, int(top[0]["id"]), int(top[0]["gain10"])))
    out = edges.sparkSession.createDataFrame(
        seeds, "rank long, id long, gain10 long"
    )
    und.unpersist()
    deg.unpersist()
    return out


def disparity_filter(edges: DataFrame, alpha_micro: int = 50_000) -> DataFrame:
    """Serrano–Boguñá–Vespignani multiscale backbone (PNAS 2009) →
    per-edge rows (a, b, w, alpha_a_micro, alpha_b_micro, kept): the
    statistically-principled graph sparsifier. A global weight
    threshold destroys all local structure on heavy-tailed graphs; the
    disparity filter instead keeps an edge iff its weight is
    significant against the null that its endpoint spreads strength
    uniformly:

        α_ij = (1 − w_ij/s_i)^(k_i − 1) < α

    evaluated from BOTH endpoints (kept if either side rejects the
    null). Edges at degree-1 endpoints have α = 1 on that side (the
    null is untestable with one sample — Serrano's convention).

    Exactness: canonical per-pair integer weights (w = (a·7+b·13)%10+1
    on the a<b pair — both directions share one weight), integer
    strengths/degrees, and α quantized to MICRO-units as a pure double
    function of the integer triple (s−w, s, k−1) — identical in both
    engines; the kept flag is an integer comparison against
    ``alpha_micro``.

    Scale shape: one degree/strength groupBy and two shuffle-hash
    stat-attachment joins over the symmetric edge list — the same two
    passes degree_assortativity makes; map-only math after that. The
    backbone output feeds any downstream operator in place of the raw
    edge list (the 100 TB pattern: filter once, reuse everywhere).
    """
    und = _und(edges)
    w = (
        F.least(F.col("src"), F.col("dst")) * 7
        + F.greatest(F.col("src"), F.col("dst")) * 13
    ) % 10 + 1
    wund = und.select("src", "dst", w.cast("long").alias("w"))
    stats = wund.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("w").cast("long").alias("s"),
    )

    def am(s, k, wc):
        # round(1e6 · ((s−w)/s)^(k−1)); degree-1 endpoints never reject
        return F.when(k <= 1, F.lit(1_000_000)).otherwise(
            F.round(
                F.pow(
                    (s - wc).cast("double") / s.cast("double"),
                    (k - F.lit(1)).cast("double"),
                )
                * F.lit(1e6)
            ).cast("long")
        )

    half = wund.where(F.col("src") < F.col("dst"))
    sa = stats.select(
        F.col("id").alias("src"), F.col("k").alias("ka"), F.col("s").alias("sa")
    )
    sb = stats.select(
        F.col("id").alias("dst"), F.col("k").alias("kb"), F.col("s").alias("sb")
    )
    scored = (
        half.join(sa.hint("shuffle_hash"), "src")
        .join(sb.hint("shuffle_hash"), "dst")
        .select(
            F.col("src").alias("a"),
            F.col("dst").alias("b"),
            "w",
            am(F.col("sa"), F.col("ka"), F.col("w")).alias("alpha_a_micro"),
            am(F.col("sb"), F.col("kb"), F.col("w")).alias("alpha_b_micro"),
        )
    )
    return scored.select(
        "a",
        "b",
        "w",
        "alpha_a_micro",
        "alpha_b_micro",
        (
            F.least("alpha_a_micro", "alpha_b_micro") < F.lit(alpha_micro)
        ).alias("kept"),
    )


def centrality_rank_correlation(
    scores_a: DataFrame,
    scores_b: DataFrame,
    col_a: str,
    col_b: str,
    k: int = 256,
) -> DataFrame:
    """Spearman rank agreement between two centrality rankings over the
    top-k head → one row (n, sum_d2, spearman). The standard question
    after computing a second centrality ("does eigenvector agree with
    PageRank here, or does this graph have hub/authority structure the
    walk misses?"), answered on the head that matters for ranking use.

        ρ = 1 − 6·Σd² / (n(n²−1)),   d = rank_a − rank_b

    The head set is the top-k of ranking A (distributed TakeOrdered —
    never a global window over |V|); both within-set rank permutations
    come from row_number over ≤ k rows (bounded-input invariant) with
    (score DESC, id ASC) tie-breaks, so the permutations — and the
    integer Σd² — are identical in both engines; ρ is one float fold.
    """
    a = scores_a.select(F.col("id").cast("long"), F.col(col_a).alias("sa"))
    b = scores_b.select(F.col("id").cast("long"), F.col(col_b).alias("sb"))
    top = a.orderBy(F.desc("sa"), F.asc("id")).limit(k)
    j = top.join(b.hint("shuffle_hash"), "id")
    wa = Window.orderBy(F.desc("sa"), F.asc("id"))
    wb = Window.orderBy(F.desc("sb"), F.asc("id"))
    rk = j.select(
        "id",
        F.row_number().over(wa).cast("long").alias("ra"),
        F.row_number().over(wb).cast("long").alias("rb"),
    )
    d2 = (F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb"))
    n = F.count(F.lit(1)).cast("long")
    return rk.agg(
        n.alias("n"),
        F.sum(d2).cast("long").alias("sum_d2"),
    ).select(
        "n",
        "sum_d2",
        F.when(
            F.col("n") > 1,
            F.round(
                F.lit(1.0)
                - F.lit(6.0)
                * F.col("sum_d2").cast("double")
                / (
                    F.col("n").cast("double")
                    * (F.col("n") * F.col("n") - F.lit(1)).cast("double")
                ),
                6,
            ),
        ).alias("spearman"),
    )


def percolation_threshold(edges: DataFrame) -> DataFrame:
    """Molloy–Reed / Cohen random-failure percolation analysis → one
    row (n, m, sum_d, sum_d2, kappa, f_c, supercritical). The analytic
    partner to the empirical `robustness_random` curve:

        κ = ⟨k²⟩/⟨k⟩ = Σd² / Σd            (Molloy & Reed 1995)
        giant component exists  ⇔  κ > 2
        f_c = 1 − 1/(κ − 1) = (Σd² − 2Σd)/(Σd² − Σd)
                                            (Cohen et al. PRL 2000)

    f_c is the fraction of RANDOM vertex failures the giant component
    survives — the number a reliability review asks for before anyone
    runs a removal sweep, and the quantity that explains why
    heavy-tailed dependency graphs are failure-tolerant (κ → ∞ ⇒
    f_c → 1) yet hub-attack fragile.

    Exactness: Σd and Σd² are exact integers off one degree groupBy;
    κ and f_c are each ONE float fold of an integer ratio, ROUND 6;
    ``supercritical`` is the integer comparison Σd² > 2·Σd. NULL f_c
    when κ ≤ 1 (the formula's pole — no giant regime at all).

    Scale shape: one map-side-combined degree groupBy + one scalar
    aggregate. The cheapest query in the robustness family.
    """
    und = _und(edges)
    deg = _und_degrees(und)
    return deg.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.shiftright(F.sum("deg"), 1).cast("long").alias("m"),
        F.sum("deg").cast("long").alias("sum_d"),
        F.sum(F.col("deg") * F.col("deg")).cast("long").alias("sum_d2"),
    ).select(
        "n",
        "m",
        "sum_d",
        "sum_d2",
        F.round(F.col("sum_d2").cast("double") / F.col("sum_d").cast("double"), 6).alias(
            "kappa"
        ),
        F.when(
            F.col("sum_d2") > F.col("sum_d"),
            F.round(
                (F.col("sum_d2") - 2 * F.col("sum_d")).cast("double")
                / (F.col("sum_d2") - F.col("sum_d")).cast("double"),
                6,
            ),
        ).alias("f_c"),
        (F.col("sum_d2") > 2 * F.col("sum_d")).alias("supercritical"),
    )


def triangle_surplus(edges: DataFrame) -> DataFrame:
    """Observed triangles vs the Chung–Lu degree-preserving null → one
    row (n, triangles, s1, s2, expected_cl, surplus). The motif-
    significance question behind every "is this graph clustered?"
    claim: a raw triangle count means nothing until compared with what
    the degree sequence ALONE would produce. Under Chung–Lu
    (P(i~j) = d_i·d_j/S1) the exact expectation is the elementary
    symmetric polynomial over a_i = d_i²:

        E[Δ] = (S2³ − 3·S2·S4 + 2·S6) / (6·S1³),   Sk = Σ d^k

    (the usual (S2−S1)³/(6S1³) folklore formula is the asymptotic
    version of this; here the exclusion terms are kept, so the value
    is exact, not approximate). surplus = observed/expected > 1 means
    genuine transitivity beyond degree effects — the Chung–Lu hub
    caveat (p can exceed 1) is inherited and declared.

    Exactness: every moment accumulates in decimal(38,0) (HUGEINT in
    the twin — d⁶ overflows a 64-bit long at deg ≳ 1300, so the cast
    happens BEFORE the powers); the two outputs are single float folds
    of exact big integers. Observed triangles come from the verified
    degree-oriented counter.

    Scale shape: one degree groupBy + one scalar moment aggregate on
    top of the O(m^1.5) triangle count already in the engine.
    """
    from metis_spark.plans.triangles import triangle_count

    und = _und(edges)
    deg = _und_degrees(und)
    dec = "decimal(38,0)"
    c = F.col("deg").cast(dec)
    mom = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(c).alias("s1"),
        F.sum(c * c).alias("s2"),
        F.sum(c * c * c * c).alias("s4"),
        F.sum(c * c * c * c * c * c).alias("s6"),
    )
    t = int(triangle_count(edges))  # verified counter returns the scalar
    num = (
        F.col("s2") * F.col("s2") * F.col("s2")
        - F.lit(3).cast(dec) * F.col("s2") * F.col("s4")
        + F.lit(2).cast(dec) * F.col("s6")
    )
    den = F.lit(6).cast(dec) * F.col("s1") * F.col("s1") * F.col("s1")
    return mom.select(
        "n",
        F.lit(t).cast("long").alias("triangles"),
        F.col("s1").cast("long").alias("s1"),
        F.col("s2").cast("long").alias("s2"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("expected_cl"),
        F.when(
            num > 0,
            F.round(
                (F.lit(t).cast(dec) * den).cast("double")
                / num.cast("double"),
                6,
            ),
        ).alias("surplus"),
    )


def partition_nmi(labels_a: DataFrame, labels_b: DataFrame) -> DataFrame:
    """Normalized mutual information between two vertex partitions →
    one row (n, clusters_a, clusters_b, h_a_micro, h_b_micro, mi_micro,
    nmi) — the other clustering-agreement score every community paper
    reports next to ARI (Danon et al. 2005 convention: NMI =
    2·I(A;B)/(H(A)+H(B))). ARI is chance-corrected pair counting; NMI
    is information-theoretic — the two disagree exactly when cluster
    size skew matters, which is why reviewers ask for both.

    Exactness: the contingency table and marginals are integers; every
    entropy/MI term is micro-nat quantized as a pure double function of
    its integer tuple (the map_equation discipline), so the sums are
    order-free integer additions; NMI is one trailing float fold.
    NULL when both partitions are trivial (H_A + H_B = 0).

    Scale shape: identical to partition_agreement — ONE map-side
    contingency shuffle, marginals bounded by cluster-pair counts,
    three 1-row aggregates crossJoined.
    """
    a = labels_a.select(F.col("id").cast("long"), F.col("label").alias("la"))
    b = labels_b.select(F.col("id").cast("long"), F.col("label").alias("lb"))
    cont = (
        a.join(b, "id")
        .groupBy("la", "lb")
        .agg(F.count(F.lit(1)).cast("long").alias("nij"))
    ).persist()
    tot = cont.agg(F.sum("nij").cast("long").alias("n"))
    am = cont.groupBy("la").agg(F.sum("nij").cast("long").alias("ai"))
    bm = cont.groupBy("lb").agg(F.sum("nij").cast("long").alias("bj"))

    def h_term(c):
        x = c.cast("double") / F.col("n").cast("double")
        return (
            F.when(c > 0, F.round(-x * F.log(x) * F.lit(1e6)).cast("long"))
            .otherwise(F.lit(0))
            .cast("long")
        )

    ha = (
        am.crossJoin(F.broadcast(tot))
        .select(h_term(F.col("ai")).alias("t"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("clusters_a"),
            F.sum("t").cast("long").alias("h_a_micro"),
        )
    )
    hb = (
        bm.crossJoin(F.broadcast(tot))
        .select(h_term(F.col("bj")).alias("t"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("clusters_b"),
            F.sum("t").cast("long").alias("h_b_micro"),
        )
    )
    mi_t = (
        cont.join(am.hint("shuffle_hash"), "la")
        .join(bm.hint("shuffle_hash"), "lb")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                (F.col("nij").cast("double") / F.col("n").cast("double"))
                * F.log(
                    F.col("n").cast("double")
                    * F.col("nij").cast("double")
                    / (F.col("ai").cast("double") * F.col("bj").cast("double"))
                )
                * F.lit(1e6)
            )
            .cast("long")
            .alias("t")
        )
        .agg(F.sum("t").cast("long").alias("mi_micro"))
    )
    out = (
        tot.crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
        .crossJoin(F.broadcast(mi_t))
        .select(
            "n",
            "clusters_a",
            "clusters_b",
            "h_a_micro",
            "h_b_micro",
            "mi_micro",
            F.when(
                F.col("h_a_micro") + F.col("h_b_micro") > 0,
                F.round(
                    F.lit(2.0)
                    * F.col("mi_micro").cast("double")
                    / (F.col("h_a_micro") + F.col("h_b_micro")).cast("double"),
                    6,
                ),
            ).alias("nmi"),
        )
    )
    return out


def local_bridges(edges: DataFrame) -> DataFrame:
    r"""Local bridges (Granovetter weak ties / Easley–Kleinberg ch. 3)
    with a span lower bound → (src, dst, span_lb), src < dst, one row
    per edge whose endpoints share NO common neighbor.

    span(e) = distance(u, v) in G − e. An edge with a common neighbor
    has span 2 and is NOT a local bridge (those rows are filtered
    out; `edge_embeddedness` already reports their support). For a
    local bridge the span is ≥ 3; we resolve exactly one more level:

        span_lb = 3  iff ∃ a ∈ N(u)\{v}, b ∈ N(v)\{u} with (a,b) ∈ E
                      (a u–a–b–v detour of length 3)
        span_lb = 4  otherwise (true span ≥ 4, possibly ∞ — a real
                      bridge whose removal disconnects; reported as
                      the lower bound 4, declared not exact)

    In a dependency graph these are the edges whose removal forces the
    longest re-route — the classic "weak tie" signal: local bridges
    carry information between otherwise-distant regions.

    Exactness: pure set logic on integer ids — existence joins only,
    no floats anywhere; the DuckDB twin replays the same three-hop
    existence test verbatim.

    Scale shape: bridge candidates come from ONE wedge-closure
    left_anti (the same Σ d_e cost as the triangle counter); the
    3-hop existence test runs ONLY on surviving bridges
    (bridges × d² intermediate, all left_semi so nothing fans out
    past the distinct). No windows, no driver collect.
    """
    und = _und(edges)
    e = und.where(F.col("src") < F.col("dst"))
    # (u,v,w) where (u,w) is an edge; closed iff (v,w) is also an edge
    ew = e.join(
        und.select(F.col("src").alias("src"), F.col("dst").alias("w")), "src"
    )
    closed = (
        ew.join(
            und.select(F.col("src").alias("dst"), F.col("dst").alias("w")),
            ["dst", "w"],
            "left_semi",
        )
        .select("src", "dst")
        .distinct()
    )
    bridges = e.join(closed, ["src", "dst"], "left_anti")
    # u–a–b–v detour: a ∈ N(u)\{v}, (a,b) edge, b ∈ N(v)\{u}
    ba = bridges.join(
        und.select(F.col("src").alias("src"), F.col("dst").alias("a")), "src"
    ).where(F.col("a") != F.col("dst"))
    bab = ba.join(
        und.select(F.col("src").alias("a"), F.col("dst").alias("b")), "a"
    ).where(F.col("b") != F.col("src"))
    span3 = (
        bab.join(
            und.select(F.col("src").alias("dst"), F.col("dst").alias("b")),
            ["dst", "b"],
            "left_semi",
        )
        .select("src", "dst")
        .distinct()
        .withColumn("has3", F.lit(True))
    )
    return bridges.join(span3, ["src", "dst"], "left").select(
        "src",
        "dst",
        F.when(F.col("has3"), F.lit(3)).otherwise(F.lit(4)).cast("long").alias("span_lb"),
    )


def edge_dispersion(edges: DataFrame) -> DataFrame:
    """Absolute dispersion per edge (Backstrom–Kleinberg, WWW'14
    "Romantic partnerships and the dispersion of social ties") →
    (src, dst, emb, dispersion, norm_disp), src < dst, one row per
    edge with embeddedness ≥ 2 (below that dispersion is trivially 0).

    disp(u,v) = #{ {s,t} ⊆ C_uv : (s,t) ∉ E } — pairs of common
    neighbors of the edge that are NOT themselves connected. High
    dispersion means u and v co-occur across OTHERWISE-UNLINKED
    contexts: in a dependency graph, an edge bridging modules that
    share the pair but nothing else. This is the paper's base (non-
    recursive) dispersion; norm_disp = disp/emb is its embeddedness-
    normalized form (the paper's best single predictor family).

    Exactness: integer pair counting end-to-end — common neighbors by
    two-hop join, pair enumeration by self-join with s < t, adjacency
    removal by left_anti; norm_disp is the single trailing ROUND(…, 6)
    both engines apply to the same integer ratio.

    Scale shape: the (edge, s) incidence is the triangle counter's
    Σ d_e intermediate; the pair self-join costs Σ_e emb_e² — the
    diamond (two-triangles-sharing-an-edge) budget, bounded by the
    same degree-oriented skew the triangle family already handles.
    Group-bys are map-side combined; no windows, no driver collect.
    """
    und = _und(edges)
    e = und.where(F.col("src") < F.col("dst"))
    # (src, dst, s): s is a common neighbor of the edge
    cn = e.join(
        und.select(F.col("src").alias("src"), F.col("dst").alias("s")), "src"
    ).join(
        und.select(F.col("src").alias("dst"), F.col("dst").alias("s")),
        ["dst", "s"],
        "left_semi",
    )
    emb = cn.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("emb")
    ).where(F.col("emb") >= 2)
    pairs = cn.join(
        cn.select("src", "dst", F.col("s").alias("t")), ["src", "dst"]
    ).where(F.col("s") < F.col("t"))
    far = pairs.join(
        und.select(F.col("src").alias("s"), F.col("dst").alias("t")),
        ["s", "t"],
        "left_anti",
    )
    disp = far.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("dispersion")
    )
    return (
        emb.join(disp, ["src", "dst"], "left")
        .select(
            "src",
            "dst",
            "emb",
            F.coalesce(F.col("dispersion"), F.lit(0)).cast("long").alias("dispersion"),
            F.round(
                F.coalesce(F.col("dispersion"), F.lit(0)).cast("double")
                / F.col("emb").cast("double"),
                6,
            ).alias("norm_disp"),
        )
    )


def katz_index_topk(
    edges: DataFrame, k: int = 100, beta_den: int = 8
) -> DataFrame:
    """Truncated Katz index (Katz 1953; the path-counting member of
    the classic link-prediction trio next to Adamic-Adar and Jaccard)
    → top-k NON-adjacent pairs (u, v, paths2, paths3, katz_scaled, rn),
    u < v.

    Katz(u,v) = Σ_l β^l · walks_l(u,v), truncated at l = 3. For a
    non-adjacent pair walks_1 = 0 and every length-2/3 walk is a
    simple path (a revisit would need the forbidden (u,v) edge), so
    with β = 1/beta_den the score is proportional to the exact integer

        katz_scaled = beta_den · paths2 + paths3

    — both engines rank by the same integer, no float anywhere. Ties
    broken by (u, v) ascending, so the cut at k is deterministic.

    Scale shape: A² arrives pre-aggregated ((u, w2) multiplicity
    groupBy, map-side combined) BEFORE the third hop joins it against
    the adjacency — the classic semiring two-step that keeps the
    widest intermediate at distance-2-pairs, not raw 3-walks. The
    final ranking window runs over the k surviving rows only. Hub
    skew inflates A² around big vertices; at 100 TB the same
    hub-salting the triangle family uses applies (document-level cap
    deliberately NOT applied here — Katz is exact by definition).
    """
    und = _und(edges)
    a2 = (
        und.select(F.col("src").alias("u"), F.col("dst").alias("w"))
        .join(und.select(F.col("src").alias("w"), F.col("dst").alias("w2")), "w")
        .groupBy("u", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
    )
    p2 = (
        a2.where((F.col("u") < F.col("w2")))
        .select(F.col("u"), F.col("w2").alias("v"), F.col("c2").alias("paths2"))
    )
    p3 = (
        a2.join(und.select(F.col("src").alias("w2"), F.col("dst").alias("v")), "w2")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum("c2").cast("long").alias("paths3"))
    )
    both = (
        p2.join(p3, ["u", "v"], "full_outer")
        .select(
            "u",
            "v",
            F.coalesce(F.col("paths2"), F.lit(0)).cast("long").alias("paths2"),
            F.coalesce(F.col("paths3"), F.lit(0)).cast("long").alias("paths3"),
        )
    )
    adj = und.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    nonadj = both.join(adj, ["u", "v"], "left_anti").select(
        "u",
        "v",
        "paths2",
        "paths3",
        (F.lit(beta_den).cast("long") * F.col("paths2") + F.col("paths3"))
        .cast("long")
        .alias("katz_scaled"),
    )
    top = nonadj.orderBy(
        F.desc("katz_scaled"), F.asc("u"), F.asc("v")
    ).limit(k)
    w = Window.orderBy(F.desc("katz_scaled"), F.asc("u"), F.asc("v"))
    return top.withColumn("rn", F.row_number().over(w).cast("long"))


def partition_vi(labels_a: DataFrame, labels_b: DataFrame) -> DataFrame:
    """Variation of Information between two vertex partitions (Meilă,
    JMLR 2007) → one row (n, clusters_a, clusters_b, vi_micro, vi,
    nvi). VI = H(A) + H(B) − 2·I(A;B) — the only clustering-agreement
    score in the trio that is a TRUE METRIC (triangle inequality
    holds), which is why it composes across refinement chains where
    ARI and NMI don't.

    vi_micro folds the three micro-nat integers the NMI computation
    already produces — H_A + H_B − 2·MI stays exact integer
    arithmetic; vi is its single float unquantization and nvi divides
    by ln(n) (the VI upper bound), NULL for n ≤ 1.

    Scale shape: identical to partition_nmi (one contingency shuffle);
    this is a projection over its one-row output.
    """
    base = partition_nmi(labels_a, labels_b)
    vim = (
        F.col("h_a_micro") + F.col("h_b_micro") - F.lit(2) * F.col("mi_micro")
    ).cast("long")
    return base.select(
        "n",
        "clusters_a",
        "clusters_b",
        vim.alias("vi_micro"),
        F.round(vim.cast("double") / F.lit(1e6), 6).alias("vi"),
        F.when(
            F.col("n") > 1,
            F.round(
                vim.cast("double") / F.lit(1e6) / F.log(F.col("n").cast("double")),
                6,
            ),
        ).alias("nvi"),
    )


def degree_gini(edges: DataFrame) -> DataFrame:
    """Degree-inequality profile → one row (n, sum_deg, ranked_sum,
    gini, top1pct_k, top1pct_share). Gini coefficient of the degree
    distribution plus the degree-mass share of the top-1% vertices —
    the two numbers that decide whether a graph needs hub salting
    before its joins (gini ≳ 0.6 / top-1% share ≳ 0.2 means the
    heaviest reducers own the stage).

    For degrees sorted ascending with ranks 1..n,
        G = 2·Σ_i i·d_i / (n·Σd) − (n+1)/n,
    computed from the DEGREE HISTOGRAM, not the degree list: a block
    of c vertices of equal degree v whose ascending ranks start after
    cum-count r contributes v·(c·r + c(c+1)/2) — exact integers all
    the way; gini and the share are trailing float folds. top1pct_k =
    ceil(n/100) (at least 1); its share overlaps the descending
    prefix against each histogram block, again integer-exact.

    Scale shape: one degree groupBy, one histogram groupBy, then a
    single-partition window over DISTINCT DEGREE VALUES only — the
    histogram is ≤ max-degree rows regardless of graph size (the same
    bounded-input invariant as degree_histogram), so the unpartitioned
    window is safe at any scale.
    """
    und = _und(edges)
    deg = _und_degrees(und)
    return gini_profile(deg)


def gini_profile(deg: DataFrame) -> DataFrame:
    """Generic Gini + top-1%-share profile of any positive integer
    count column named ``deg`` (one row per holder) — the histogram
    block arithmetic degree_gini documents, shared so the same exact
    machinery audits OTHER count inequalities (events per user, bytes
    per source, ...). Output columns as degree_gini."""
    hist = deg.groupBy("deg").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.orderBy("deg").rowsBetween(Window.unboundedPreceding, 0)
    dec = "decimal(38,0)"
    cum = hist.withColumn("cum", F.sum("c").over(w).cast("long"))
    blocks = cum.select(
        "deg",
        "c",
        "cum",
        (F.col("cum") - F.col("c")).alias("r"),
        (
            F.col("deg").cast(dec)
            * (
                F.col("c").cast(dec) * (F.col("cum") - F.col("c")).cast(dec)
                + (F.col("c").cast(dec) * (F.col("c") + 1).cast(dec))
                / F.lit(2).cast(dec)
            )
        ).alias("rsum"),
    )
    tot = blocks.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("deg").cast(dec) * F.col("c").cast(dec)).alias("sd"),
        F.sum("rsum").alias("ranked"),
    )
    base = tot.select(
        F.col("n"),
        F.col("sd").cast("long").alias("sum_deg"),
        F.col("ranked").cast("long").alias("ranked_sum"),
        F.greatest(F.lit(1), F.floor((F.col("n") + 99) / 100)).cast("long").alias("k"),
    )
    # top-k overlap per block: ranks above n - k, ascending cum space
    topk = (
        blocks.crossJoin(F.broadcast(base.select("n", "k")))
        .select(
            (
                F.greatest(
                    F.lit(0).cast("long"),
                    F.least(F.col("cum"), F.col("n"))
                    - F.greatest(F.col("r"), F.col("n") - F.col("k")),
                )
                * F.col("deg")
            ).cast(dec).alias("t")
        )
        .agg(F.sum("t").cast("long").alias("top_mass"))
    )
    return (
        base.crossJoin(F.broadcast(topk))
        .select(
            "n",
            "sum_deg",
            "ranked_sum",
            F.round(
                F.lit(2.0) * F.col("ranked_sum").cast("double")
                / (F.col("n").cast("double") * F.col("sum_deg").cast("double"))
                - (F.col("n") + 1).cast("double") / F.col("n").cast("double"),
                6,
            ).alias("gini"),
            F.col("k").alias("top1pct_k"),
            F.round(
                F.col("top_mass").cast("double") / F.col("sum_deg").cast("double"), 6
            ).alias("top1pct_share"),
        )
    )


def edge_clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Radicchi edge clustering coefficient (Radicchi et al., PNAS
    2004, "Defining and identifying communities in networks") →
    (src, dst, support, denom, ecc_milli, ecc), src < dst, one row
    per edge.

        C3(e=(u,v)) = (z_e + 1) / min(deg u − 1, deg v − 1)

    where z_e is the triangle support of the edge. Radicchi's divisive
    method removes the LOWEST-C3 edge repeatedly — the local,
    O(m)-computable stand-in for edge betweenness in Girvan–Newman.
    The +1 in the numerator is the paper's smoothing so zero-support
    inter-community edges still rank below intra-community ones with
    the same denominator. denom = 0 (an endpoint is a pendant) emits
    NULL ecc — the paper skips those edges.

    Exactness: support and denom are integers; ecc_milli quantizes the
    ratio at 1e3 (CAST(ROUND(x·1000))) so the hash-compare never
    touches a raw float division; ecc is its display unquantization.

    Scale shape: piggybacks the verified degree-oriented triangle
    redistribution (one explode + map-side groupBy, ≤ |E| rows), one
    broadcast-degree join — identical budget to edge_embeddedness, no
    windows.
    """
    und = _und(edges)
    deg = _und_degrees(und)
    e = und.where(F.col("src") < F.col("dst"))
    from metis_spark.plans.triangles import _per_edge_commons

    per = _per_edge_commons(edges).where(F.col("n_common") > 0)
    tri = per.select("src", "dst", F.explode("common").alias("w"))
    sides = (
        tri.select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .unionByName(
            tri.select(F.least("src", "w").alias("src"), F.greatest("src", "w").alias("dst"))
        )
        .unionByName(
            tri.select(F.least("dst", "w").alias("src"), F.greatest("dst", "w").alias("dst"))
        )
    )
    sup = sides.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
    du = deg.select(F.col("id").alias("src"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("id").alias("dst"), F.col("deg").alias("deg_v"))
    denom = F.least(F.col("deg_u") - 1, F.col("deg_v") - 1)
    milli = F.when(
        denom > 0,
        F.round(
            (F.col("support") + 1).cast("double") / denom.cast("double") * F.lit(1e3)
        ).cast("long"),
    )
    return (
        e.join(sup, ["src", "dst"], "left")
        .select("src", "dst", F.coalesce("support", F.lit(0)).cast("long").alias("support"))
        .join(du.hint("shuffle_hash"), "src")
        .join(dv.hint("shuffle_hash"), "dst")
        .select(
            "src",
            "dst",
            "support",
            denom.cast("long").alias("denom"),
            milli.alias("ecc_milli"),
            F.round(milli.cast("double") / F.lit(1e3), 6).alias("ecc"),
        )
    )


def spectral_radius_bounds(edges: DataFrame) -> DataFrame:
    """Analytic bracket on the adjacency spectral radius λ₁ → one row
    (n, m, d_max, s1, s2, max_deg_prod, lam_lower, lam_upper,
    tau_lower, tau_upper). λ₁ controls the SIS epidemic threshold
    τ_c = 1/λ₁ (Wang et al. 2003 / Van Mieghem 2009) — for a link
    graph, how aggressively an update/worm/meme cascades. The exact
    eigenvalue needs the power iteration (eigencentrality_5iter); this
    is its free closed-form bracket from degree statistics alone:

        λ₁ ≥ max( 2m/n,  √d_max,  √(S₂/n) )   (Rayleigh quotient at 𝟙,
                                     at e_max, and ‖A·𝟙‖/‖𝟙‖ — the
                                     moment ratio S₂/S₁ is NOT a lower
                                     bound; a star refutes it)
        λ₁ ≤ min( d_max,  max_{(u,v)∈E} √(d_u·d_v) )

    (both uppers hold for arbitrary graphs; Hong's √(2m−n+1) is
    deliberately omitted — it needs per-component n, m). The bracket
    is TIGHT on stars, cycles and cliques, and at scale it tells you
    whether the expensive iteration is even needed.

    Exactness: n, m, d_max, S₁, S₂ and the max degree product are
    exact integers (decimal(38,0) sums); the four bound columns are
    trailing double folds rounded at 6.

    Scale shape: one degree groupBy, one scalar moment aggregate, one
    broadcast-degree edge join + max — no iteration, no window.
    """
    und = _und(edges)
    deg = _und_degrees(und)
    dec = "decimal(38,0)"
    mom = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("deg").cast("long").alias("d_max"),
        F.sum(F.col("deg").cast(dec)).alias("s1d"),
        F.sum(F.col("deg").cast(dec) * F.col("deg").cast(dec)).alias("s2d"),
    )
    e = und.where(F.col("src") < F.col("dst"))
    prod = (
        e.join(deg.select(F.col("id").alias("src"), F.col("deg").alias("du")).hint("shuffle_hash"), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("deg").alias("dv")).hint("shuffle_hash"), "dst")
        .agg(F.max(F.col("du").cast(dec) * F.col("dv").cast(dec)).alias("mp"))
    )
    lam_lo = F.greatest(
        F.col("s1").cast("double") / F.col("n").cast("double"),
        F.sqrt(F.col("d_max").cast("double")),
        F.sqrt(F.col("s2").cast("double") / F.col("n").cast("double")),
    )
    lam_hi = F.least(
        F.col("d_max").cast("double"),
        F.sqrt(F.col("max_deg_prod").cast("double")),
    )
    return (
        mom.crossJoin(F.broadcast(prod))
        .select(
            "n",
            (F.col("s1d") / F.lit(2).cast(dec)).cast("long").alias("m"),
            "d_max",
            F.col("s1d").cast("long").alias("s1"),
            F.col("s2d").cast("long").alias("s2"),
            F.col("mp").cast("long").alias("max_deg_prod"),
        )
        .select(
            "n",
            "m",
            "d_max",
            "s1",
            "s2",
            "max_deg_prod",
            F.round(lam_lo, 6).alias("lam_lower"),
            F.round(lam_hi, 6).alias("lam_upper"),
            F.round(F.lit(1.0) / lam_hi, 6).alias("tau_lower"),
            F.round(F.lit(1.0) / lam_lo, 6).alias("tau_upper"),
        )
    )


def community_conductance(labels: DataFrame, edges: DataFrame) -> DataFrame:
    """Per-community conductance profile → (community, n_vertices,
    volume, cut, conductance). φ(C) = cut(C) / min(vol(C), 2m−vol(C))
    — the standard community-quality detail (Leskovec et al.'s NCP
    plots are exactly this, per size): a community with high φ leaks;
    the global partition scores (modularity / map equation) can hide
    one bad community inside a good average, which is why the per-row
    detail exists. NULL φ for a community that IS the whole graph
    (min = 0).

    Exactness: volume and cut are integer counts in und-row space —
    every boundary edge contributes exactly 1 to EACH side's cut
    (one und row per direction) and each intra edge 2 to its
    community's volume; φ is one trailing ROUND(…, 6).

    Scale shape: one label broadcast/shuffle join per edge endpoint
    + two map-side-combined groupBys; output is ≤ #communities rows.
    """
    und = _und(edges)
    lab = labels.select(F.col("id").cast("long"), F.col("label").cast("long"))
    la = lab.select(F.col("id").alias("src"), F.col("label").alias("lu"))
    lb = lab.select(F.col("id").alias("dst"), F.col("label").alias("lv"))
    tagged = und.join(la.hint("shuffle_hash"), "src").join(
        lb.hint("shuffle_hash"), "dst"
    )
    per = tagged.groupBy(F.col("lu").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("volume"),
        F.sum((F.col("lu") != F.col("lv")).cast("long")).cast("long").alias("cut"),
    )
    nv = lab.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices")
    )
    tot = und.agg(F.count(F.lit(1)).cast("long").alias("vol2m"))
    return (
        nv.join(per, "community", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "community",
            "n_vertices",
            F.coalesce("volume", F.lit(0)).cast("long").alias("volume"),
            F.coalesce("cut", F.lit(0)).cast("long").alias("cut"),
            F.when(
                F.least(
                    F.coalesce(F.col("volume"), F.lit(0)),
                    F.col("vol2m") - F.coalesce(F.col("volume"), F.lit(0)),
                )
                > 0,
                F.round(
                    F.coalesce(F.col("cut"), F.lit(0)).cast("double")
                    / F.least(
                        F.coalesce(F.col("volume"), F.lit(0)),
                        F.col("vol2m") - F.coalesce(F.col("volume"), F.lit(0)),
                    ).cast("double"),
                    6,
                ),
            ).alias("conductance"),
        )
    )


def kendall_rank_correlation(
    scores_a: DataFrame,
    scores_b: DataFrame,
    col_a: str,
    col_b: str,
    k: int = 256,
) -> DataFrame:
    """Kendall τ rank agreement between two centrality rankings over
    the top-k head → one row (n, concordant, discordant, kendall).
    The pair-level partner of centrality_rank_correlation: Spearman
    weights big displacements quadratically, Kendall counts INVERTED
    PAIRS — the bubble-sort distance — which is what "how many
    swapped decisions would this ranking change" actually asks.

        τ = (C − D) / (n(n−1)/2)

    Head extraction, tie-breaks and the within-set row_number
    permutations are IDENTICAL to the Spearman operator (same top-k of
    ranking A, same (score DESC, id ASC) order), so the two queries
    are comparable by construction; within a permutation there are no
    rank ties, so τ-a = τ-b.

    Exactness: C and D are integer pair counts; τ is one float fold.

    Scale shape: the only quadratic step is the k×k pair self-join —
    BOUNDED-INPUT by the same ≤ k-row invariant as the ranking
    windows (k = 256 → 32k pairs), never |V|².
    """
    a = scores_a.select(F.col("id").cast("long"), F.col(col_a).alias("sa"))
    b = scores_b.select(F.col("id").cast("long"), F.col(col_b).alias("sb"))
    top = a.orderBy(F.desc("sa"), F.asc("id")).limit(k)
    j = top.join(b.hint("shuffle_hash"), "id")
    wa = Window.orderBy(F.desc("sa"), F.asc("id"))
    wb = Window.orderBy(F.desc("sb"), F.asc("id"))
    rk = j.select(
        "id",
        F.row_number().over(wa).cast("long").alias("ra"),
        F.row_number().over(wb).cast("long").alias("rb"),
    )
    p = rk.select(F.col("ra").alias("ra1"), F.col("rb").alias("rb1")).join(
        rk.select(F.col("ra").alias("ra2"), F.col("rb").alias("rb2")),
        F.col("ra1") < F.col("ra2"),
    )
    disc = (F.col("rb1") > F.col("rb2")).cast("long")
    return p.agg(
        F.count(F.lit(1)).cast("long").alias("pairs"),
        F.sum(disc).cast("long").alias("discordant"),
    ).select(
        F.round((F.lit(1) + F.sqrt(F.lit(1) + F.lit(8.0) * F.col("pairs"))) / 2)
        .cast("long")
        .alias("n"),
        (F.col("pairs") - F.col("discordant")).cast("long").alias("concordant"),
        "discordant",
        F.when(
            F.col("pairs") > 0,
            F.round(
                (F.col("pairs") - F.lit(2) * F.col("discordant")).cast("double")
                / F.col("pairs").cast("double"),
                6,
            ),
        ).alias("kendall"),
    )


def dcsbm_likelihood(labels: DataFrame, edges: DataFrame) -> DataFrame:
    """Degree-corrected SBM profile log-likelihood of a partition
    (Karrer & Newman, PRE 2011) → one row (n_groups, two_m, ll_micro,
    ll, ll_per_edge). The model-based partition score next to
    modularity / map_equation / conductance:

        L = Σ_{rs} m_rs · ln( m_rs / (κ_r·κ_s) )

    in the doubled-endpoint convention (m_rs = und rows from group r
    to group s, so m_rr is twice the intra-edge count; κ_r = Σ_s m_rs
    = total degree of r). Maximizing L is exactly what a DC-SBM fit
    does, so comparing two partitions' L is the likelihood-ratio test
    modularity only approximates (Newman 2016 shows modularity is a
    special case with a fixed resolution).

    Exactness: every m_rs, κ_r is an integer; each term quantizes to
    integer micro-nats as a pure function of its integer triple
    (map_equation discipline), so the block sum is order-free; ll and
    ll_per_edge are trailing float folds. Zero blocks contribute 0.

    Scale shape: one two-sided label join over und, one groupBy to
    ≤ groups² block rows, one marginal groupBy — same budget as the
    community quotient.
    """
    und = _und(edges)
    lab = labels.select(F.col("id").cast("long"), F.col("label").cast("long"))
    la = lab.select(F.col("id").alias("src"), F.col("label").alias("lr"))
    lb = lab.select(F.col("id").alias("dst"), F.col("label").alias("ls"))
    blocks = (
        und.join(la.hint("shuffle_hash"), "src")
        .join(lb.hint("shuffle_hash"), "dst")
        .groupBy("lr", "ls")
        .agg(F.count(F.lit(1)).cast("long").alias("mrs"))
    )
    # deliberately NOT persisted: the returned frame is lazy, so a
    # persist here would outlive the query (the ngram_jaccard_pairs
    # rationale); the block table is ≤ groups² rows and cheap to
    # recompute for its three consumers.
    kap = blocks.groupBy("lr").agg(F.sum("mrs").cast("long").alias("kr"))
    ka = kap.select(F.col("lr"), F.col("kr"))
    kb = kap.select(F.col("lr").alias("ls"), F.col("kr").alias("ks"))
    terms = (
        blocks.join(ka.hint("shuffle_hash"), "lr")
        .join(kb.hint("shuffle_hash"), "ls")
        .select(
            F.round(
                F.col("mrs").cast("double")
                * F.log(
                    F.col("mrs").cast("double")
                    / (F.col("kr").cast("double") * F.col("ks").cast("double"))
                )
                * F.lit(1e6)
            )
            .cast("long")
            .alias("t")
        )
        .agg(F.sum("t").cast("long").alias("ll_micro"))
    )
    two_m = und.agg(F.count(F.lit(1)).cast("long").alias("two_m"))
    ng = lab.select("label").distinct().agg(F.count(F.lit(1)).cast("long").alias("n_groups"))
    return (
        ng.crossJoin(F.broadcast(two_m))
        .crossJoin(F.broadcast(terms))
        .select(
            "n_groups",
            "two_m",
            "ll_micro",
            F.round(F.col("ll_micro").cast("double") / F.lit(1e6), 6).alias("ll"),
            F.round(
                F.col("ll_micro").cast("double") / F.lit(1e6) / F.col("two_m").cast("double"),
                6,
            ).alias("ll_per_edge"),
        )
    )


def directed_assortativity(edges: DataFrame) -> DataFrame:
    """Four-mode directed degree assortativity (Foster, Foster, Grassberger
    & Paczuski, PNAS 2010) → (mode, n_edges, r) for mode ∈ {out_in,
    out_out, in_in, in_out}: the Pearson correlation of (x-degree of
    source, y-degree of target) over directed edges — the directed
    refinement of degree_assortativity, which collapses the four
    hub-wiring signatures (e.g. a dependency graph can be out_in
    disassortative yet in_in assortative) into one number.

    ENGINE-EXACT: every moment (Σx, Σx², Σxy per mode) is an exact
    decimal(38,0) sum of BIGINT products; the four r values are derived
    as one double expression per mode over exact integers —
    (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²)·(n·Σy² − Σy²)) — so both
    engines evaluate identical correctly-rounded IEEE doubles. Shape:
    one degree groupBy per direction, two broadcast-able joins, one
    map-side-combined moment agg; the 4-row result is an explode of
    one aggregate row.
    """
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    outd = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("od")
    )
    ind = e.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("idg")
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    deg = (
        verts.join(outd, "id", "left")
        .join(ind, "id", "left")
        .select(
            "id",
            F.coalesce("od", F.lit(0)).cast("long").alias("od"),
            F.coalesce("idg", F.lit(0)).cast("long").alias("idg"),
        )
    )
    ds = deg.select(F.col("id").alias("src"), F.col("od").alias("so"), F.col("idg").alias("si"))
    dd = deg.select(F.col("id").alias("dst"), F.col("od").alias("to"), F.col("idg").alias("ti"))
    j = e.join(ds.hint("shuffle_hash"), "src").join(dd.hint("shuffle_hash"), "dst")

    def dec(c):
        return c.cast("decimal(38,0)")

    m = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[F.sum(dec(F.col(c))).alias("s_" + c) for c in ("so", "si", "to", "ti")],
        *[F.sum(dec(F.col(c) * F.col(c))).alias("q_" + c) for c in ("so", "si", "to", "ti")],
        F.sum(dec(F.col("so") * F.col("ti"))).alias("x_oi"),
        F.sum(dec(F.col("so") * F.col("to"))).alias("x_oo"),
        F.sum(dec(F.col("si") * F.col("ti"))).alias("x_ii"),
        F.sum(dec(F.col("si") * F.col("to"))).alias("x_io"),
    )
    modes = [
        ("out_in", "so", "ti", "x_oi"),
        ("out_out", "so", "to", "x_oo"),
        ("in_in", "si", "ti", "x_ii"),
        ("in_out", "si", "to", "x_io"),
    ]
    structs = [
        F.struct(
            F.lit(name).alias("mode"),
            F.round(
                (F.col("n") * F.col(xs) - F.col("s_" + sx) * F.col("s_" + sy)).cast("double")
                / F.sqrt(
                    (
                        (F.col("n") * F.col("q_" + sx) - F.col("s_" + sx) * F.col("s_" + sx))
                        * (F.col("n") * F.col("q_" + sy) - F.col("s_" + sy) * F.col("s_" + sy))
                    ).cast("double")
                ),
                6,
            ).alias("r"),
        )
        for name, sx, sy, xs in modes
    ]
    return (
        m.select(F.col("n").alias("n_edges"), F.explode(F.array(*structs)).alias("s"))
        .select(F.col("s.mode").alias("mode"), "n_edges", F.col("s.r").alias("r"))
    )


def walk_entropy_rate(edges: DataFrame) -> DataFrame:
    """Entropy rate of the unbiased random walk → one row (n_vertices,
    n_und_edges, entropy_micro_sum, entropy_rate).

    For an undirected graph the walk's stationary distribution is
    EXACTLY π(v) = deg(v)/2m (no power iteration needed), and each
    step's conditional entropy is ln deg(v), so the rate is the closed
    form h = Σ_v deg(v)·ln deg(v) / 2m nats/step (Burda et al., PRL
    2009 — the ceiling maximal-entropy walks are measured against).

    Integer discipline: ln(d) is quantized to micro-nats once per
    DISTINCT degree value (a |distinct-degrees|-sized table — O(100)
    rows even at 100 TB by power-law collapse), the weighted sum is
    exact BIGINT arithmetic, and the two final divisions are the only
    float ops.
    """
    und = _und(edges)
    deg = _und_degrees(und)
    dl = deg.groupBy("deg").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    scored = dl.select(
        "deg", "cnt",
        F.round(F.log(F.col("deg").cast("double")) * F.lit(1000000.0))
        .cast("long").alias("ln_micro"),
    )
    return (
        scored.agg(
            F.sum("cnt").cast("long").alias("n_vertices"),
            (F.sum(F.col("deg") * F.col("cnt")) / F.lit(2)).cast("long").alias("m"),
            F.sum(F.col("cnt") * F.col("deg") * F.col("ln_micro"))
            .cast("long").alias("entropy_micro_sum"),
        )
        .select(
            "n_vertices",
            F.col("m").alias("n_und_edges"),
            "entropy_micro_sum",
            F.round(
                F.col("entropy_micro_sum") / (F.lit(2) * F.col("m")) / F.lit(1000000.0),
                6,
            ).alias("entropy_rate"),
        )
    )


def spectral_moments(edges: DataFrame, hub_cap: int = 128) -> DataFrame:
    """Exact low-order spectral moments of the adjacency matrix → one
    row (n_vertices, n_edges, closed_walks_2, closed_walks_3,
    closed_walks_4) — trace(A^k) = Σ λ_i^k, the motif↔spectrum bridge:

        trace(A²) = 2m,  trace(A³) = 6·triangles,
        trace(A⁴) = Σ deg² + Σ_{i≠j} n_ij²   (n_ij = common neighbors)

    so the same counting spines that power triangle_count and
    square_count pin the spectrum's power sums (the first Lanczos/
    kernel-polynomial checkpoints, and together with spectral_radius
    _bounds a bracket any estimated spectrum must satisfy).

    The Σ n_ij² term reuses the HUB-CAPPED wedge plan of square_count
    (deg(center) ≤ hub_cap before the self-join — the declared fan-out
    bound; exact whenever the cap exceeds the max degree, as on the
    sparse driver graph, and the twin applies the identical cap).
    """
    from metis_spark.plans.triangles import triangle_count

    und = _und(edges).persist()
    deg = _und_degrees(und)
    tri = triangle_count(edges)
    dm = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        (F.sum("deg") / F.lit(2)).cast("long").alias("n_edges"),
        F.sum(F.col("deg") * F.col("deg")).cast("long").alias("sum_deg2"),
    )
    pair2 = (
        _wedges(und, hub_cap)
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(F.coalesce(F.sum(F.col("c") * F.col("c")), F.lit(0)).cast("long").alias("sum_c2"))
    )
    out = dm.crossJoin(F.broadcast(pair2)).select(
        "n_vertices",
        "n_edges",
        (F.lit(2) * F.col("n_edges")).cast("long").alias("closed_walks_2"),
        F.lit(6 * tri).cast("long").alias("closed_walks_3"),
        (F.col("sum_deg2") + F.lit(2) * F.col("sum_c2")).cast("long").alias("closed_walks_4"),
    )
    und.unpersist()
    return out


def package_instability(edges: DataFrame, n_packages: int = 16) -> DataFrame:
    """Martin coupling metrics over the package-grouped dependency graph
    → (package, n_vertices, internal_edges, ca, ce, instability_micro,
    fan_ratio_micro): afferent coupling Ca (cross-package in-edges),
    efferent coupling Ce (cross-package out-edges), and instability
    I = Ce/(Ca+Ce) (Martin, "Agile Software Development" — I→1 depends
    on everyone, I→0 everyone depends on it; stable-dependencies
    violations are edges from low-I to high-I packages).

    Packages are the deterministic grouping id % n_packages — the same
    quotient-graph move as community_quotient, standing in for the
    repo/module column a real code corpus carries. All counts exact;
    the two ratios are integer micro DIVisions.
    """
    e = edges.select(
        (F.col("src") % n_packages).cast("long").alias("ps"),
        (F.col("dst") % n_packages).cast("long").alias("pd"),
        F.col("src").cast("long"),
    )
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .select((F.col("id") % n_packages).cast("long").alias("package"))
        .groupBy("package")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
    )
    internal = (
        e.where(F.col("ps") == F.col("pd"))
        .groupBy(F.col("ps").alias("package"))
        .agg(F.count(F.lit(1)).cast("long").alias("internal_edges"))
    )
    ce = (
        e.where(F.col("ps") != F.col("pd"))
        .groupBy(F.col("ps").alias("package"))
        .agg(F.count(F.lit(1)).cast("long").alias("ce"))
    )
    ca = (
        e.where(F.col("ps") != F.col("pd"))
        .groupBy(F.col("pd").alias("package"))
        .agg(F.count(F.lit(1)).cast("long").alias("ca"))
    )
    return (
        verts.join(internal, "package", "left")
        .join(ce, "package", "left")
        .join(ca, "package", "left")
        .select(
            "package", "n_vertices",
            F.coalesce("internal_edges", F.lit(0)).cast("long").alias("internal_edges"),
            F.coalesce("ca", F.lit(0)).cast("long").alias("ca"),
            F.coalesce("ce", F.lit(0)).cast("long").alias("ce"),
        )
        .select(
            "package", "n_vertices", "internal_edges", "ca", "ce",
            F.when(
                F.col("ca") + F.col("ce") > 0,
                F.expr("(1000000 * ce) div (ca + ce)"),
            ).cast("long").alias("instability_micro"),
            F.when(
                F.col("internal_edges") + F.col("ca") + F.col("ce") > 0,
                F.expr("(1000000 * (ca + ce)) div (internal_edges + ca + ce)"),
            ).cast("long").alias("fan_ratio_micro"),
        )
    )


def kdegree_anonymity(edges: DataFrame, ks=(2, 5, 10, 25, 50)) -> DataFrame:
    """k-degree anonymity cost profile (Liu & Terzi, SIGMOD 2008,
    blocked-grouping variant) → one row per k:
    (k_target, n_groups, last_group_size, degree_increment).

    A graph is k-degree anonymous when every degree value is shared by
    ≥ k vertices, so an attacker who knows a target's degree cannot
    narrow it below k candidates — the release screen run on a link
    graph before publishing it, the structural twin of the
    quasi-identifier k-anonymity audit on the corpus side. The blocked
    grouping assigns ranks 0..n-1 of the DESC-sorted degree sequence to
    G = max(n div k, 1) consecutive groups (each of size k, the last
    absorbing the remainder so every group keeps ≥ k members) and
    raises each member to its group maximum; degree_increment is the
    total number of degree raises Σ (groupmax − deg) — 2× the edge
    additions an anonymizer would have to realize.

    Scale shape: everything is computed from the DEGREE HISTOGRAM
    (≤ max-degree rows, the same bounded-input invariant as
    degree_gini's window), never the n-row rank sequence: a degree run
    occupying ranks [start, end) contributes deg·k·m where m counts the
    group starts (multiples of k ≤ the last group's start) inside the
    run — closed form per (run, k) — plus one correction for the
    oversized last group, whose start rank lands in exactly one run.
    Groups interior to a run raise nothing and are never enumerated, so
    the per-k cost is O(#distinct degrees) rows regardless of n. All
    arithmetic is exact integers; the DuckDB twin replays the naive
    rank-window definition and must match bit-for-bit.
    """
    und = _und(edges)
    deg = _und_degrees(und)
    hist = deg.groupBy("deg").agg(F.count(F.lit(1)).cast("long").alias("c"))
    # bounded-input window: ≤ max-degree rows (degree_gini invariant)
    w = Window.orderBy(F.col("deg").desc()).rowsBetween(Window.unboundedPreceding, 0)
    runs = hist.withColumn("end_", F.sum("c").over(w).cast("long")).withColumn(
        "start_", (F.col("end_") - F.col("c")).cast("long")
    )
    dec = "decimal(38,0)"
    tot = hist.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("deg").cast(dec) * F.col("c").cast(dec))
        .cast("long")
        .alias("sum_deg"),
    )
    kdf = deg.sparkSession.createDataFrame(
        [(int(k),) for k in ks], "k_target long"
    )
    per = (
        runs.crossJoin(F.broadcast(kdf))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "g_cnt", F.greatest(F.expr("n div k_target"), F.lit(1)).cast("long")
        )
        .withColumn("last_start", (F.col("g_cnt") - 1) * F.col("k_target"))
        # group starts inside this run: multiples of k_target in
        # [start_, end_) clipped to ≤ last_start
        .withColumn("hi", F.least(F.col("end_") - 1, F.col("last_start")))
        .withColumn(
            "m",
            F.when(
                F.col("hi") >= F.col("start_"),
                F.expr("hi div k_target")
                - F.expr("(start_ + k_target - 1) div k_target")
                + F.lit(1),
            ).otherwise(F.lit(0)).cast("long"),
        )
        .withColumn("m", F.greatest(F.col("m"), F.lit(0)))
        # the run holding the last group's start also pays the size
        # correction (last group has n - last_start members, not k)
        .withColumn(
            "last_corr",
            F.when(
                (F.col("start_") <= F.col("last_start"))
                & (F.col("last_start") < F.col("end_")),
                F.col("deg").cast(dec)
                * (F.col("n") - F.col("last_start") - F.col("k_target")).cast(dec),
            ).otherwise(F.lit(0).cast(dec)),
        )
    )
    return (
        per.groupBy("k_target")
        .agg(
            F.max("g_cnt").cast("long").alias("n_groups"),
            F.max(F.col("n") - F.col("last_start")).cast("long").alias("last_group_size"),
            (
                F.sum(
                    F.col("deg").cast(dec)
                    * F.col("k_target").cast(dec)
                    * F.col("m").cast(dec)
                    + F.col("last_corr")
                )
                - F.max("sum_deg").cast(dec)
            )
            .cast("long")
            .alias("degree_increment"),
        )
        .select("k_target", "n_groups", "last_group_size", "degree_increment")
    )


def small_world_sigma(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Small-world coefficient σ = (C/C_rand)/(L/L_rand) (Watts &
    Strogatz 1998; Humphries & Gurney 2008) → one row (n_vertices,
    two_m, wedges, triangles, c_micro, c_rand_micro, l_micro,
    l_rand_micro, sigma_micro). σ ≫ 1 means clustered like a lattice
    with the short paths of a random graph — the one-number structural
    verdict on a dependency graph.

    Composes three VERIFIED spines: global transitivity C = 3T/W
    (degree-oriented triangle counter + wedge moment), the truncated
    exact mean distance L (the N(t) neighborhood-function fold,
    pairs beyond the horizon excluded — the same declared truncation
    as mean_distance), and the Erdős–Rényi analytic nulls
    C_rand = ⟨k⟩/n, L_rand = ln n / ln⟨k⟩ — closed forms, no rewiring
    sampler (the rich_club_normalized / triangle_surplus discipline).

    Integer discipline: every ratio is micro-quantized BIGINT; ln is
    quantized once via ROUND(ln·1e6) on an exact rational (the
    walk_entropy_rate pattern); σ is a div chain of those — the DuckDB
    twin replays it bit-for-bit. NULL where a denominator vanishes
    (no wedges / nothing reachable / ⟨k⟩ ≤ 1).

    Scale shape: one degree aggregate + the two existing spines,
    output 1 row; at 100 TB the exact N(t) member swaps for the ANF
    sketch exactly as mean_distance declares.
    """
    from metis_spark.plans.anf import mean_distance_exact
    from metis_spark.plans.triangles import triangle_count

    und = _und(edges)
    tri = int(triangle_count(edges))
    base = (
        _und_degrees(und)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("deg").cast("long").alias("two_m"),
            F.sum(F.col("deg") * (F.col("deg") - 1)).cast("long").alias("w2"),
        )
        .withColumn("wedges", F.expr("w2 div 2").cast("long"))
    )
    md = mean_distance_exact(edges, rounds=rounds).select(
        F.col("sum_dist"), F.col("reachable_pairs").alias("rp")
    )
    j = (
        base.crossJoin(md)
        .withColumn("triangles", F.lit(tri).cast("long"))
        .withColumn(
            "c_micro",
            F.when(
                F.col("wedges") > 0, F.expr("(1000000 * 3 * triangles) div wedges")
            ).cast("long"),
        )
        .withColumn("c_rand_micro", F.expr("(1000000 * two_m) div (n * n)").cast("long"))
        .withColumn(
            "l_micro",
            F.when(F.col("rp") > 0, F.expr("(1000000 * sum_dist) div rp")).cast("long"),
        )
        .withColumn("k_milli", F.expr("(1000 * two_m) div n").cast("long"))
        .withColumn(
            "ln_n_micro",
            F.round(F.log(F.col("n").cast("double")) * F.lit(1000000.0)).cast("long"),
        )
        .withColumn(
            "ln_k_micro",
            F.round(
                F.log(F.col("k_milli").cast("double") / F.lit(1000.0))
                * F.lit(1000000.0)
            ).cast("long"),
        )
        .withColumn(
            "l_rand_micro",
            F.when(
                F.col("ln_k_micro") > 0, F.expr("(1000000 * ln_n_micro) div ln_k_micro")
            ).cast("long"),
        )
        .withColumn(
            "ratio_c_micro",
            F.when(
                (F.col("c_rand_micro") > 0) & F.col("c_micro").isNotNull(),
                F.expr("(1000000 * c_micro) div c_rand_micro"),
            ).cast("long"),
        )
        .withColumn(
            "ratio_l_micro",
            F.when(
                F.col("l_rand_micro").isNotNull()
                & (F.col("l_rand_micro") > 0)
                & F.col("l_micro").isNotNull(),
                F.expr("(1000000 * l_micro) div l_rand_micro"),
            ).cast("long"),
        )
    )
    return j.select(
        F.col("n").alias("n_vertices"),
        "two_m",
        "wedges",
        "triangles",
        "c_micro",
        "c_rand_micro",
        "l_micro",
        "l_rand_micro",
        F.when(
            (F.col("ratio_l_micro") > 0) & F.col("ratio_c_micro").isNotNull(),
            F.expr("(1000000 * ratio_c_micro) div ratio_l_micro"),
        )
        .cast("long")
        .alias("sigma_micro"),
    )


def knn_degree_correlation(edges: DataFrame) -> DataFrame:
    """Degree-correlation spectrum k_nn(k) (Pastor-Satorras, Vázquez &
    Vespignani, PRL 2001) → one row per degree class (k, n_vertices,
    knn_micro): the mean over vertices of degree k of their neighbors'
    mean degree. The CURVE behind the assortativity scalar — a rising
    k_nn(k) is assortative hub-hub wiring, a falling one the
    disassortative hub-leaf profile typical of dependency graphs;
    degree_assortativity collapses this to one Pearson number and
    avg_neighbor_degree is its per-vertex detail.

    Exactness: per vertex the neighbor-degree SUM is an exact BIGINT;
    the class mean folds as knn_micro = (1e6·Σ_v sum_nb) div (k·|class|)
    — one integer expression, no per-vertex float means averaged.

    Scale shape: one degree groupBy, one degree-annotated edge join
    (shuffle-hash, map-side-combined per-src sum), one histogram-sized
    groupBy — ≤ max-degree output rows at any graph size.
    """
    und = _und(edges)
    deg = _und_degrees(und)
    nb = (
        und.join(
            deg.select(F.col("id").alias("dst"), F.col("deg").alias("nb_deg")).hint(
                "shuffle_hash"
            ),
            "dst",
        )
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum("nb_deg").cast("long").alias("sum_nb"),
        )
    )
    return (
        nb.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vertices"),
            F.sum("sum_nb").cast("long").alias("class_sum_nb"),
        )
        .select(
            "k",
            "n_vertices",
            F.expr("(1000000 * class_sum_nb) div (k * n_vertices)")
            .cast("long")
            .alias("knn_micro"),
        )
    )


def randic_index(edges: DataFrame) -> DataFrame:
    """Randić connectivity index → one row (n_vertices, n_edges,
    randic_micro, norm_ratio_micro): R = Σ_{(u,v)∈E} 1/√(d_u·d_v) over
    the undirected simple graph (Randić JACS 1975). R is exactly the
    total entry mass of the GCN-style symmetric-normalized adjacency
    D^{-1/2}AD^{-1/2} — so norm_ratio = R/m says how much signal a
    mean-aggregating graph conv keeps relative to an unnormalized sum
    (1 for a regular graph, → 0 under extreme hub skew: the SAME skew
    degree_gini dials for salting shows up here as feature-wash).
    R ≤ n/2 always, with equality iff every component is regular.

    Exactness: each edge term 1/√(d_u·d_v) is one double of two exact
    integer degrees, micro-quantized BEFORE the sum, so the fold is an
    exact integer sum; the ratio is one integer division.

    Scale shape: one degree groupBy + two shuffle-hash degree
    annotations + a scalar agg — a triangle-count-lite pass."""
    und = _und(edges)
    deg = _und_degrees(und)
    canon = und.where(F.col("src") < F.col("dst"))
    terms = (
        canon.join(
            deg.select(F.col("id").alias("src"), F.col("deg").alias("da")).hint("shuffle_hash"),
            "src",
        )
        .join(
            deg.select(F.col("id").alias("dst"), F.col("deg").alias("db")).hint("shuffle_hash"),
            "dst",
        )
        .select(
            F.round(
                F.lit(1e6)
                / F.sqrt(F.col("da").cast("double") * F.col("db").cast("double"))
            ).cast("long").alias("tm")
        )
    )
    n = deg.agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
    return (
        terms.agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.sum("tm").cast("long").alias("randic_micro"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "n_vertices",
            "n_edges",
            "randic_micro",
            F.expr("randic_micro div n_edges").cast("long").alias("norm_ratio_micro"),
        )
    )


def degree_powerlaw_fit(edges: DataFrame) -> DataFrame:
    """Degree-distribution shape card → one row (n_vertices, d_min,
    d_max, alpha_micro, entropy_micro): the continuous-MLE power-law
    exponent α = 1 + n/Σᵢ ln(dᵢ/(d_min − ½)) (Clauset–Shalizi–Newman
    SIAM Rev 2009) plus the Shannon entropy of the degree histogram —
    together the "how heavy is the tail really" dial that decides
    whether hub salting and AQE skew handling are mandatory (α ≤ 2.5,
    low entropy = a few hubs own the graph) or cosmetic. Complements
    degree_gini (inequality) and spectral_radius_bounds (λ₁ ≥ √d_max).

    Exactness: the MLE folds over DISTINCT degrees — per degree class
    ln(2k/(2·d_min−1)) is micro-quantized once and multiplied by the
    exact class count, so the sum is an exact integer regardless of
    row order; entropy uses H = ln n − (Σ c_k·ln c_k)/n with the same
    per-class quantization. Final divisions are integer div.

    Scale shape: one degree groupBy to the histogram (≤ max-degree
    rows), everything after is histogram-sized."""
    und = _und(edges)
    deg = _und_degrees(und)
    return powerlaw_profile(deg)


def powerlaw_profile(deg: DataFrame) -> DataFrame:
    """Generic CSN continuous-MLE exponent + histogram entropy of any
    positive integer count column named ``deg`` — the
    degree_powerlaw_fit machinery shared so the same exact fold
    audits OTHER heavy-tailed size distributions (community sizes,
    component sizes, session lengths). Output columns as
    degree_powerlaw_fit."""
    hist = deg.groupBy("deg").agg(F.count(F.lit(1)).cast("long").alias("c"))
    base = hist.agg(
        F.sum("c").cast("long").alias("n"),
        F.min("deg").cast("long").alias("d_min"),
        F.max("deg").cast("long").alias("d_max"),
    )
    # per-class micro terms: c·ROUND(1e6·ln(2k/(2·d_min−1))) and
    # c·ROUND(1e6·ln c) — exact integer sums
    terms = hist.crossJoin(F.broadcast(base)).select(
        "n", "d_min", "d_max",
        (
            F.col("c")
            * F.round(
                F.log(
                    (F.lit(2.0) * F.col("deg").cast("double"))
                    / (F.lit(2.0) * F.col("d_min").cast("double") - F.lit(1.0))
                )
                * F.lit(1e6)
            ).cast("long")
        ).alias("ml"),
        (
            F.col("c")
            * F.round(F.log(F.col("c").cast("double")) * F.lit(1e6)).cast("long")
        ).alias("hl"),
    )
    return (
        terms.groupBy("n", "d_min", "d_max")
        .agg(
            F.sum("ml").cast("long").alias("sml"),
            F.sum("hl").cast("long").alias("shl"),
        )
        .select(
            F.col("n").alias("n_vertices"),
            "d_min",
            "d_max",
            F.when(
                F.col("sml") > 0,
                F.lit(1_000_000)
                + F.expr(
                    "(cast(1000000000000 as decimal(38,0)) * n) div sml"
                ).cast("long"),
            ).cast("long").alias("alpha_micro"),
            (
                F.round(F.log(F.col("n").cast("double")) * F.lit(1e6)).cast("long")
                - F.expr("shl div n")
            ).cast("long").alias("entropy_micro"),
        )
    )


def graph_h_index(edges: DataFrame) -> DataFrame:
    """Graph h-index → one row (n_vertices, d_max, h_index): the
    largest h such that ≥ h vertices have degree ≥ h (the Hirsch
    index of the degree sequence) — a one-number hub-richness scalar
    that upper-bounds the densest fully-mutual hub club and seeds the
    h-index iteration coreness starts from. Computed in closed form
    from the degree HISTOGRAM: h = max over realized degrees d of
    min(d, N≥(d)) — exact integers, no iteration.

    Scale shape: one degree groupBy to ≤ max-degree histogram rows;
    the cumulative N≥ window runs over the histogram, not vertices."""
    und = _und(edges)
    deg = _und_degrees(und)
    hist = deg.groupBy("deg").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.orderBy(F.desc("deg")).rowsBetween(Window.unboundedPreceding, 0)
    cand = hist.select(
        "deg",
        F.least(F.col("deg"), F.sum("c").over(w)).alias("h_cand"),
    )
    base = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        F.max("deg").cast("long").alias("d_max"),
    )
    h = cand.agg(F.max("h_cand").cast("long").alias("h_index"))
    return base.crossJoin(F.broadcast(h))


def bridging_coefficient_topk(edges: DataFrame, k: int = 50) -> DataFrame:
    """Top-k bridging coefficient → (id, deg, s_micro, bc_micro,
    rank): BC(v) = (1/d_v) / Σ_{u∈N(v)} 1/d_u (Hwang et al., the
    bridging-centrality local factor) — high BC marks LOW-degree
    vertices whose neighbours are themselves poorly connected
    elsewhere: the thin waists between regions, invisible to degree
    and complementary to local bridges (span) and structural holes
    (constraint). Betweenness × BC is Hwang's full bridging
    centrality; both factors ship here (betweenness_approx).

    Exactness: per-neighbour reciprocals quantize to micro BEFORE the
    sum (exact integer S_micro), then bc_micro = 10¹² div (d_v·S_micro)
    — no doubles anywhere in the score. Ranking ties break on id.

    Scale shape: one degree groupBy + one degree-annotated edge pass
    (shuffle-hash, map-side-combined per-src sum) + TakeOrdered."""
    und = _und(edges)
    deg = _und_degrees(und)
    s = (
        und.join(
            deg.select(F.col("id").alias("dst"), F.col("deg").alias("nd")).hint(
                "shuffle_hash"
            ),
            "dst",
        )
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum(F.expr("1000000 div nd")).cast("long").alias("s_micro"))
    )
    scored = deg.join(s.hint("shuffle_hash"), "id").select(
        "id",
        "deg",
        "s_micro",
        F.expr("1000000000000 div (deg * s_micro)").cast("long").alias("bc_micro"),
    )
    order = [F.desc("bc_micro"), F.asc("id")]
    top = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "id", "deg", "s_micro", "bc_micro", "rank"
    )
