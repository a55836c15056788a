"""Auto-split from __spark_entry__.py (driver contract facade keeps
entry/queries/oracle_sql). Family module of the metis_spark.driver
package — see tools/split_entry.py for the classification rules."""

from __future__ import annotations
import atexit
import os
import shutil
import sys
import tempfile
from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from metis_spark.functions import text as TX  # noqa: E402
from metis_spark.operators import corpus_stats as CS  # noqa: E402
from metis_spark.operators import dedup as DD  # noqa: E402
from metis_spark.operators import sampling as SAMP  # noqa: E402
from metis_spark.operators import similarity as SIM  # noqa: E402
from metis_spark.operators.windows import (  # noqa: E402
    forward_fill,
    last_event_fallback,
    sessionize,
)
from metis_spark.plans.components import connected_components  # noqa: E402
from metis_spark.plans.lpa import label_propagation  # noqa: E402
from metis_spark.plans.metrics import (  # noqa: E402
    adamic_adar_topk,
    degree_assortativity,
    local_clustering,
    vertex_jaccard_topk,
)
from metis_spark.plans.kcore import k_core  # noqa: E402
from metis_spark.plans.pagerank import pagerank  # noqa: E402
from metis_spark.plans.triangles import (  # noqa: E402
    doulion_triangle_estimate,
    triangle_count,
    triangle_count_per_vertex,
)

from metis_spark.driver.common import ANF_ROUNDS, ABCORE_ALPHA, ABCORE_BETA, ABCORE_MOD, ABCORE_ROUNDS, SWEEP_L, AFFINITY_LEVEL, BETW_ROUNDS, COLOR_ORACLE_ROUNDS, CORENESS_DEC_MOD, CORENESS_ORACLE_ROUNDS, DEG_PCTS, DENSEST_EPS_TENTHS, DENSEST_ORACLE_ROUNDS, HUB_CAP, KCORE_K, KCORE_ORACLE_ROUNDS, KTRUSS_K, KTRUSS_ORACLE_ROUNDS, LEIDEN_REFINE_ROUNDS, LINKPRED_K, LOUVAIN_ROUNDS, LPA_ROUNDS, LP_EVAL_K, LP_HOLD_MOD, LP_NEG_VSAMP_MOD, MATCHING_ORACLE_ROUNDS, MIS_ORACLE_ROUNDS, MSF_INNER_J, NUCLEUS_ORACLE_ROUNDS, N2V_P, N2V_Q, N_BETW_SOURCES, N_WALKS, ONION_ROUNDS, PARTITION_EPS10, PARTITION_K, PR_ITERS, RICH_CLUB_KS, SCANSTAT_K, SIMRANK_CAP, SIMRANK_ITERS, SIMRANK_K, SIMRANK_VSAMP_MOD, SSSP_ROUNDS, TRUSSNESS_ORACLE_ROUNDS, TRUSS_DEC_MOD, WALK_LEN, WCORENESS_ORACLE_ROUNDS, WCORE_W_MOD, WL_ROUNDS, _coloring_edges, _msf_weight_col, _round_half_away, _t, _tmpdir, derived_edges, derived_edges_sparse, derived_und  # noqa: E501,F401


def _q_graph_edges(spark, sf_dir):
    return derived_edges(spark, sf_dir)

def _q_component_profile(spark, sf_dir):
    """Per-component profile: size, intra-edge count, density — the
    partition-sizing numbers for per-component downstream work (which
    components broadcast, which need salting). Spark side reuses the
    converged star CC (fixpoint = min member id); the oracle replays a
    fixed-depth min-label flood, which reaches the same fixpoint on
    this graph's diameter."""
    edges = derived_edges(spark, sf_dir)
    labels, _ = connected_components(edges, checkpoint_dir=_tmpdir("metis_qcp_"))
    und = derived_und(spark, sf_dir).where(F.col("src") < F.col("dst"))
    sizes = labels.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices")
    )
    # both endpoints share a component by definition — one join suffices
    intra = (
        und.join(
            labels.select(F.col("id").alias("src"), "component").hint("shuffle_hash"),
            "src",
        )
        .groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("intra_edges"))
    )
    return (
        sizes.join(intra, "component", "left")
        .select(
            "component",
            "n_vertices",
            F.coalesce("intra_edges", F.lit(0)).cast("long").alias("intra_edges"),
            F.when(
                F.col("n_vertices") >= 2,
                F.round(
                    F.coalesce("intra_edges", F.lit(0))
                    / (F.col("n_vertices") * (F.col("n_vertices") - 1) / 2.0),
                    6,
                ),
            ).alias("density"),
        )
    )

def _q_triangles(spark, sf_dir):
    n = triangle_count(derived_edges(spark, sf_dir))
    return spark.createDataFrame([(n,)], "triangles long")

def _q_triangles_per_vertex(spark, sf_dir):
    edges = derived_edges(spark, sf_dir)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return triangle_count_per_vertex(edges, vertices=verts)

def _q_bipartite(spark, sf_dir):
    """Bipartiteness / odd-cycle audit per component (plans/bipartite.py):
    CC roots → multi-source BFS parity → same-parity edge count. One
    summary row: component count, bipartite count, odd-edge total."""
    from metis_spark.plans.bipartite import bipartite_check

    per_comp, info = bipartite_check(
        derived_edges(spark, sf_dir),
        checkpoint_dir=_tmpdir("metis_qbip_"), max_iter=SSSP_ROUNDS + 2,
    )
    assert info["converged"], info
    return per_comp.agg(
        F.count(F.lit(1)).cast("long").alias("n_components"),
        F.sum(F.col("is_bipartite").cast("long")).cast("long").alias("n_bipartite"),
        F.sum("n_odd_edges").cast("long").alias("n_odd_edges"),
    )

def _q_node2vec(spark, sf_dir):
    """Second-order node2vec-style walks (plans/walks.py:node2vec_walks):
    deterministic hash-arg-min with integer p/q key multipliers — return
    ×3, common-neighbor ×1, outward ×2 — replayable bit-exactly by the
    unrolled SQL twin."""
    from metis_spark.plans.walks import node2vec_walks

    edges = derived_edges(spark, sf_dir)
    starts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .orderBy("id")
        .limit(N_WALKS)
    )
    return node2vec_walks(edges, starts, length=WALK_LEN, p=N2V_P, q=N2V_Q)

def _q_csr(spark, sf_dir):
    """Bucketed sorted CSR adjacency (north_rule), rendered comparable:
    neighbor arrays as comma-joined strings so DuckDB string_agg matches."""
    from metis_spark.operators.csr import build_csr

    csr = build_csr(derived_edges(spark, sf_dir), num_buckets=8)
    return csr.select(
        "src",
        F.col("deg").cast("long").alias("deg"),
        F.concat_ws(",", F.transform(F.col("nbrs"), lambda x: x.cast("string"))).alias("nbrs"),
    )

def _q_linkpred_eval(spark, sf_dir):
    """Link-prediction EVALUATION harness: hold out ~25% of the sparse
    graph's canonical edges by hash, score the remaining (train) graph
    with Adamic-Adar (plans/metrics.py, the verified capped-wedge
    plan), and report precision@200 against the held-out set — the
    measurement loop a link-prediction user actually runs. One row
    (k, n_holdout, n_hits, precision); integer counts + one rounded
    ratio. NOTE the synthetic modular-arithmetic graph is near-random,
    so the measured precision is honestly low (0.01 / 0.0 at the gate
    scales) — the harness, not the number, is the deliverable."""
    from metis_spark.plans.metrics import adamic_adar_topk

    e = derived_edges_sparse(spark, sf_dir)
    cp = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    hmod = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "_", F.lit("h"), F.col("a").cast("string"),
                        F.col("b").cast("string"),
                    )
                ),
                1, 15,
            ),
            16, 10,
        ).cast("long") % LP_HOLD_MOD
    )
    cp = cp.withColumn("held", hmod == 0)
    hold = cp.where("held").select("a", "b")
    train = cp.where(~F.col("held")).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    top = adamic_adar_topk(train, k=LP_EVAL_K, hub_cap=HUB_CAP)
    hits = top.join(
        hold.select(F.col("a").alias("u"), F.col("b").alias("v")), ["u", "v"]
    )
    return (
        hits.agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        .crossJoin(hold.agg(F.count(F.lit(1)).cast("long").alias("n_holdout")))
        .select(
            F.lit(LP_EVAL_K).cast("long").alias("k"),
            "n_holdout",
            "n_hits",
            F.round(F.col("n_hits") / F.lit(float(LP_EVAL_K)), 6).alias("precision"),
        )
    )

def _q_linkpred_auc(spark, sf_dir):
    """Link-prediction AUC (Mann-Whitney rank-sum) — the discriminative
    twin of `linkpred_eval` (VERDICT r3 item 4): precision@k on the
    near-random synthetic graph is honestly ~0, so AUC over held-out
    positives vs sampled non-edge negatives is the metric that makes the
    harness informative. Positives = the same hash-held ~25% of canonical
    sparse-graph pairs; negatives = all non-edge pairs inside a
    deterministic md5-sampled vertex subset (1/16 of vertices), so both
    sides are engine-replayable with no RNG. Scores = Adamic-Adar over the
    TRAIN graph computed per eval pair (two adjacency joins + hub-capped
    1/ln(deg) sum — never materializing all-pairs). AUC is tie-aware and
    integer-exact until the final division: rank2 = 2*RANK + |tie block|-1
    doubles the average rank, U2 = sum(rank2 over positives) -
    n_pos*(n_pos+1), AUC = U2 / (2*n_pos*n_neg). The single global rank
    window runs over the BOUNDED eval set (holdout + sampled-subset
    non-edges, ~1e4 rows by construction) — an eval harness, not a
    data-path shuffle. Scores rounded to 6dp in both engines BEFORE
    ranking (round-before-rank discipline)."""
    e = derived_edges_sparse(spark, sf_dir)
    cp = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )

    def _h60(prefix, *cols):
        return F.conv(
            F.substring(F.md5(F.concat_ws("_", F.lit(prefix), *cols)), 1, 15), 16, 10
        ).cast("long")

    cp = cp.withColumn(
        "held",
        _h60("h", F.col("a").cast("string"), F.col("b").cast("string"))
        % LP_HOLD_MOD == 0,
    ).persist()
    hold = cp.where("held").select("a", "b")
    train = cp.where(~F.col("held")).select("a", "b")
    und2 = train.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        train.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = und2.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )

    verts = (
        cp.select(F.col("a").alias("v"))
        .unionByName(cp.select(F.col("b").alias("v")))
        .distinct()
    )
    vsamp = verts.where(
        _h60("nv", F.col("v").cast("string")) % LP_NEG_VSAMP_MOD == 0
    )
    negs = (
        vsamp.alias("x")
        .crossJoin(F.broadcast(vsamp.alias("y")))
        .where(F.col("x.v") < F.col("y.v"))
        .select(F.col("x.v").alias("a"), F.col("y.v").alias("b"))
        .join(cp.select("a", "b"), ["a", "b"], "left_anti")
    )
    ev = hold.withColumn("is_pos", F.lit(1)).unionByName(
        negs.withColumn("is_pos", F.lit(0))
    )

    # Adamic-Adar per eval pair: wedge via two adjacency joins, hub-capped
    t1 = und2.select(F.col("src").alias("a"), F.col("dst").alias("w"))
    t2 = und2.select(F.col("src").alias("b"), F.col("dst").alias("w"))
    wed = (
        ev.select("a", "b")
        .join(t1, "a")
        .join(t2, ["b", "w"])
        .join(deg.where(F.col("deg") <= HUB_CAP).withColumnRenamed("id", "w"), "w")
    )
    sc = wed.groupBy("a", "b").agg(
        F.round(F.sum(1.0 / F.log(F.col("deg"))), 6).alias("score")
    )
    scored = ev.join(sc, ["a", "b"], "left").select(
        "is_pos", F.coalesce(F.col("score"), F.lit(0.0)).alias("score")
    )
    rank2 = (
        2 * F.rank().over(Window.orderBy("score"))
        + F.count(F.lit(1)).over(Window.partitionBy("score"))
        - 1
    ).cast("long")
    ranked = scored.select("is_pos", rank2.alias("rank2"))
    agg = ranked.agg(
        F.sum(F.when(F.col("is_pos") == 1, F.col("rank2")).otherwise(0))
        .cast("long").alias("s2"),
        F.sum(F.col("is_pos")).cast("long").alias("n_pos"),
        F.sum(1 - F.col("is_pos")).cast("long").alias("n_neg"),
    )
    out = agg.select(
        "n_pos",
        "n_neg",
        (F.col("s2") - F.col("n_pos") * (F.col("n_pos") + 1)).alias("u2"),
        F.round(
            (F.col("s2") - F.col("n_pos") * (F.col("n_pos") + 1))
            / (2.0 * F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )
    cp.unpersist()
    return out

def _q_csr_gap_histogram(spark, sf_dir):
    """Adjacency-gap histogram over the sorted sparse CSR rows: count of
    neighbor-id deltas per floor(log2(gap)) bucket — the WebGraph/BV
    compressibility profile (small gaps ⇒ the 100 TB adjacency encodes
    in a few bits/edge). Integer-exact bucketing via binary-string
    length (length(conv(gap, 10, 2)) − 1), never float log2. One
    src-partitioned LAG window — the same partitioning the CSR build
    itself uses, so no extra exchange shape at scale."""
    e = derived_edges_sparse(spark, sf_dir)
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).where(F.col("src") != F.col("dst")).distinct()
    w = Window.partitionBy("src").orderBy("dst")
    gaps = und.select(
        "src", (F.col("dst") - F.lag("dst").over(w)).alias("gap")
    ).where(F.col("gap").isNotNull())
    return (
        gaps.select(
            (F.length(F.conv(F.col("gap").cast("string"), 10, 2)) - 1)
            .cast("long").alias("gap_bucket")
        )
        .groupBy("gap_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_gaps"))
    )

def _q_directed_triads(spark, sf_dir):
    """Directed 3-node motif census on the sparse import graph
    (plans/triangles.py:directed_triad_census): cyclic u→v→w→u vs
    feed-forward u→v→w, u→w — the Milo-style motif signature."""
    from metis_spark.plans.triangles import directed_triad_census

    return directed_triad_census(derived_edges_sparse(spark, sf_dir))

def _q_assortativity(spark, sf_dir):
    return degree_assortativity(derived_edges_sparse(spark, sf_dir))

def _q_adamic_adar(spark, sf_dir):
    return adamic_adar_topk(
        derived_edges_sparse(spark, sf_dir), k=LINKPRED_K, hub_cap=HUB_CAP
    )

def _q_square_count(spark, sf_dir):
    """Global 4-cycle count (plans/metrics.py square_count): the motif
    one step past triangles — ½ Σ C(c_uv, 2) over the SAME hub-capped
    wedge plan the link predictors use (identical cap in the oracle)."""
    from metis_spark.plans.metrics import square_count

    return square_count(derived_edges_sparse(spark, sf_dir), hub_cap=HUB_CAP)

def _q_graphlet4_census(spark, sf_dir):
    """Non-induced census of all six connected 4-vertex graphlets
    (plans/metrics.py:graphlet4_census, ESCAPE-style closed forms):
    stars/paths/tailed/diamonds from integer identities over the
    degree, per-vertex-triangle and per-edge-support tables; only the
    4-cycle (capped wedge pairs) and 4-clique (kClist) are enumerated,
    both already verified operators. The six counts together are the
    motif signature that separates link rings (clique-heavy) from
    hierarchies (star/path-heavy) at a glance."""
    from metis_spark.plans.metrics import graphlet4_census

    return graphlet4_census(derived_edges_sparse(spark, sf_dir), hub_cap=HUB_CAP)

def _q_four_cliques(spark, sf_dir):
    """Exact global 4-clique count next to the triangle count
    (plans/triangles.py:four_clique_count, kClist ordered enumeration on
    the degree-oriented DAG — every clique generated exactly once from
    its two lowest-order vertices). The 4-clique/triangle ratio is the
    motif signature that flags link-ring neighborhoods before they
    dominate triangles."""
    from metis_spark.plans.triangles import four_clique_count

    return four_clique_count(derived_edges_sparse(spark, sf_dir))

def _q_scan_statistic(spark, sf_dir):
    """Top-k scan statistic Λ(v) = deg(v) + triangles(v) = |E(N[v])|
    (plans/metrics.py scan_statistic, Priebe et al. 2005): the
    locality statistic whose outliers flag anomalously dense
    neighborhoods. All-integer ranking key — engine-exact with no
    rounding discipline; top-k is TakeOrderedAndProject, never a
    single-partition window over |V|."""
    from metis_spark.plans.metrics import scan_statistic

    return scan_statistic(derived_edges_sparse(spark, sf_dir), k=SCANSTAT_K)

def _q_resource_alloc(spark, sf_dir):
    """Resource-allocation link predictor (plans/metrics.py): Adamic-Adar
    with the log dropped — completes the classic predictor quartet."""
    from metis_spark.plans.metrics import resource_allocation_topk

    return resource_allocation_topk(
        derived_edges_sparse(spark, sf_dir), k=LINKPRED_K, hub_cap=HUB_CAP
    )

def _q_avg_neighbor_degree(spark, sf_dir):
    """Degree-correlation curve knn(k): for each degree k, the mean over
    degree-k vertices of their mean neighbor degree — the standard
    assortativity PROFILE (the scalar Pearson version is
    ``degree_assortativity``); rising knn(k) = assortative, falling =
    hubs attach to leaves. Two O(m) joins + two map-side-combining
    groupBys on the sparse und graph."""
    e = derived_edges_sparse(spark, sf_dir)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    und = e.unionByName(rev).distinct()
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    per_vertex = (
        und.join(
            deg.select(F.col("id").alias("dst"), F.col("deg").alias("nd"))
            .hint("shuffle_hash"),
            "dst",
        )
        .groupBy(F.col("src").alias("id"))
        # round-before-aggregate discipline: the inner per-vertex mean is
        # pinned at 1e-9 in BOTH twins so the outer mean-of-means cannot
        # flip a 6th-decimal boundary on engine summation-order noise
        .agg(F.round(F.avg("nd"), 9).alias("mean_nbr_deg"))
    )
    return (
        per_vertex.join(deg.hint("shuffle_hash"), "id")
        .groupBy("deg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vertices"),
            F.round(F.avg("mean_nbr_deg"), 6).alias("knn"),
        )
    )

def _q_degree_percentiles(spark, sf_dir):
    """Exact interpolated degree quantiles (p50/p90/p99/max) of the und
    graph — the tail-shape numbers that set salting thresholds and skew
    budgets. One O(|V|) agg (Spark's exact `percentile`, linear
    interpolation at rank p·(n−1) — the same definition as DuckDB's
    quantile_cont), then a 4-row posexplode. Where approximate tails
    suffice at extreme scale, swap in percentile_approx — same plan."""
    und = derived_und(spark, sf_dir)
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    qs = deg.agg(
        F.percentile("deg", F.array(*[F.lit(p) for p in DEG_PCTS])).alias("qs")
    )
    spine = F.array(*[F.lit(p) for p in DEG_PCTS])
    return qs.select(
        F.posexplode("qs").alias("i", "v")
    ).select(
        F.element_at(spine, F.col("i") + 1).alias("pct"),
        F.round("v", 6).alias("deg"),
    )

def _q_degree_histogram(spark, sf_dir):
    """Log2-binned undirected degree distribution — the first descriptive
    query on any web-scale graph (power-law check, skew sizing for salt
    decisions). Two map-side-combining aggs, O(|V|) shuffle."""
    und = derived_und(spark, sf_dir)
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    return (
        deg.select(F.floor(F.log2("deg")).cast("long").alias("bin"), "deg")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.min("deg").cast("long").alias("min_deg"),
            F.max("deg").cast("long").alias("max_deg"),
        )
    )

def _q_graph_summary(spark, sf_dir):
    """One-row global profile: sizes, degree extremes, density — the
    numbers that size every downstream decision (salting, partitions,
    broadcast thresholds). Two aggs, no joins."""
    e = derived_edges(spark, sf_dir)
    und = derived_und(spark, sf_dir)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n_v = verts.count()
    n_e = e.count()
    n_und = und.count() // 2
    row = deg.agg(
        F.max("d").alias("max_out_deg"), F.avg("d").alias("avg_out")
    ).collect()[0]
    return spark.createDataFrame(
        [(n_v, n_e, n_und, int(row["max_out_deg"]))],
        "n_vertices long, n_edges long, n_und_edges long, max_out_deg long",
    ).select(
        "*",
        F.round(F.col("n_edges") / F.col("n_vertices"), 6).alias("avg_out_deg"),
        F.round(
            F.col("n_und_edges")
            / (F.col("n_vertices") * (F.col("n_vertices") - 1) / F.lit(2.0)),
            6,
        ).alias("density"),
    )

def _q_reciprocity(spark, sf_dir):
    """Directed-edge reciprocity: the share of edges whose reverse also
    exists — one self-equi-join on the reversed key."""
    e = derived_edges(spark, sf_dir).select("src", "dst").distinct()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n = e.count()
    n_recip = e.join(rev.hint("shuffle_hash"), ["src", "dst"]).count()
    return spark.createDataFrame(
        [(n, n_recip)], "n_edges long, n_reciprocated long"
    ).select(
        "n_edges",
        "n_reciprocated",
        # rounded in-engine (HALF_UP, matching the SQL twin) — not python
        F.round(F.col("n_reciprocated") / F.col("n_edges"), 6).alias("reciprocity"),
    )

def _q_modularity(spark, sf_dir):
    """Newman modularity contributions of the 2-round LPA partition —
    the quality gate a community-detection user runs next
    (plans/metrics.py:community_modularity)."""
    from metis_spark.plans.metrics import community_modularity

    edges = derived_edges(spark, sf_dir)
    labels, _ = label_propagation(
        edges,
        checkpoint_dir=_tmpdir("metis_qmod_"),
        max_iter=LPA_ROUNDS,
        stop_when_stable=False,
    )
    return community_modularity(edges, labels)

def _q_transitivity(spark, sf_dir):
    """Global transitivity C = 3·triangles / wedges over the sparse und
    graph — the one-number clustering profile (``local_clustering`` is
    the per-vertex variant; this is its graph-level ratio-of-sums, NOT
    the average of the per-vertex coefficients). Wedges come straight
    off the degree table (no join); triangles reuse the degree-oriented
    sorted-adjacency intersection (plans/triangles.py:52)."""
    from metis_spark.plans.triangles import triangle_count

    e = derived_edges_sparse(spark, sf_dir)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    und = e.unionByName(rev).distinct()
    wedges2 = und.groupBy("src").agg(F.count(F.lit(1)).alias("d")).agg(
        F.sum(F.col("d") * (F.col("d") - 1)).alias("w2")
    ).collect()[0]["w2"]
    wedges = int(wedges2) // 2
    tri = triangle_count(e)
    return spark.createDataFrame(
        [(wedges, tri)], "wedges long, triangles long"
    ).select(
        "wedges",
        "triangles",
        F.round(F.lit(3.0) * F.col("triangles") / F.col("wedges"), 6).alias(
            "transitivity"
        ),
    )

def _q_rich_club(spark, sf_dir):
    """Rich-club coefficient φ(k) = 2·E_k / (N_k·(N_k−1)) on the sparse
    und graph: the edge density among vertices of degree > k, for each
    threshold in RICH_CLUB_KS — the standard 'do hubs stick together'
    profile (Colizza et al. 2006, unnormalized φ).

    Plan shape: ONE degree table, one endpoint-join pass over the
    canonical (src<dst) edge set, then both the N_k and E_k counts fan
    out over a 4-row literal threshold spine (explode of a lit array —
    no per-k rescan of the graph). NULL φ where N_k < 2."""
    e = derived_edges_sparse(spark, sf_dir)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    und = e.unionByName(rev).distinct()
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    ks = F.array([F.lit(k) for k in RICH_CLUB_KS])
    spine = spark.createDataFrame([(k,) for k in RICH_CLUB_KS], "k long")
    nk = (
        deg.select(F.explode(ks).alias("k"), "d")
        .withColumn("k", F.col("k").cast("long"))
        .where(F.col("d") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_k"))
    )
    pairs = (
        und.where(F.col("src") < F.col("dst"))
        .join(deg.select(F.col("id").alias("src"), F.col("d").alias("da")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("db")), "dst")
    )
    ek = (
        pairs.select(F.explode(ks).alias("k"), "da", "db")
        .withColumn("k", F.col("k").cast("long"))
        .where((F.col("da") > F.col("k")) & (F.col("db") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("e_k"))
    )
    return (
        spine.join(nk, "k", "left")
        .join(ek, "k", "left")
        .select(
            "k",
            F.coalesce("n_k", F.lit(0)).cast("long").alias("n_k"),
            F.coalesce("e_k", F.lit(0)).cast("long").alias("e_k"),
            F.when(
                F.coalesce(F.col("n_k"), F.lit(0)) >= 2,
                F.round(
                    2.0 * F.coalesce(F.col("e_k"), F.lit(0))
                    / (F.col("n_k") * (F.col("n_k") - 1)),
                    6,
                ),
            ).alias("phi"),
        )
    )

def _q_coreness(spark, sf_dir):
    """Full k-core decomposition (plans/coreness.py): per-vertex core
    numbers by distributed h-index iteration — fixpoint in O(10) rounds,
    not degeneracy-many peels."""
    from metis_spark.plans.coreness import coreness

    out, info = coreness(
        derived_edges_sparse(spark, sf_dir),
        checkpoint_dir=_tmpdir("metis_qcoreness_"),
        checkpoint_every=5,
        retain=2,
    )
    assert info["converged"] and info["iterations"] <= CORENESS_ORACLE_ROUNDS, info
    return out

def _q_score_weighted(spark, sf_dir):
    """WEIGHTED s-core decomposition (plans/coreness.py weight_col=):
    integer weights are parallel-edge multiplicities, the fixpoint is
    the multigraph core number, reached by the same h-index iteration
    over the running-weight rank (max(least(val, cw))). Weights are
    md5-derived per canonical undirected pair so both engines replay
    them bit-exactly."""
    from metis_spark.plans.coreness import coreness

    edges = derived_edges_sparse(spark, sf_dir)
    canon = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    wedges = canon.select(
        F.col("a").alias("src"),
        F.col("b").alias("dst"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "_",
                            F.lit("w"),
                            F.col("a").cast("string"),
                            F.col("b").cast("string"),
                        )
                    ),
                    1, 15,
                ),
                16, 10,
            ).cast("long")
            % WCORE_W_MOD
            + 1
        ).alias("weight"),
    )
    out, info = coreness(
        wedges,
        weight_col="weight",
        checkpoint_dir=_tmpdir("metis_qwcore_"),
        checkpoint_every=5,
        retain=2,
    )
    assert info["converged"] and info["iterations"] <= WCORENESS_ORACLE_ROUNDS, info
    return out

def _q_coreness_decremental(spark, sf_dir):
    """Decremental core maintenance: old core numbers stay UPPER bounds
    after edge deletions (coreness is monotone in the edge set), so the
    h-index iteration warm-started from them repairs only the
    neighbourhoods the deletions touched — same unique fixpoint as a
    cold run (the oracle), a fraction of the rounds."""
    from metis_spark.plans.coreness import coreness

    full = derived_edges_sparse(spark, sf_dir)
    reduced = full.where(
        (F.col("src") * 31 + F.col("dst")) % CORENESS_DEC_MOD != 0
    )
    base, info0 = coreness(
        full, checkpoint_dir=_tmpdir("metis_qcoredec_a_"), checkpoint_every=5, retain=2
    )
    assert info0["converged"], info0
    out, info = coreness(
        reduced, init_cores=base, checkpoint_dir=_tmpdir("metis_qcoredec_b_"),
        checkpoint_every=5, retain=2,
    )
    # converged is the only contract here: the warm-start round count is
    # unrelated to the ORACLE's unroll depth (the oracle runs COLD rounds
    # on the reduced graph and only needs to reach ITS fixpoint — h-index
    # fixpoints are unique, so any converged run hash-matches it)
    assert info["converged"], info
    return out

def _q_kcore(spark, sf_dir):
    core, info = k_core(
        derived_edges_sparse(spark, sf_dir),
        k=KCORE_K,
        checkpoint_dir=_tmpdir("metis_qkcore_"),
        checkpoint_every=5,
        retain=2,
    )
    assert info["iterations"] <= KCORE_ORACLE_ROUNDS, info
    return core

def _q_densest(spark, sf_dir):
    """Densest subgraph by greedy threshold peeling (plans/densest.py,
    Bahmani et al. PVLDB'12): per round drop vertices with
    deg < 2(1+eps)*|E|/|V|, emit the integer-exact density trajectory —
    its running max is the 2(1+eps)-approx densest subgraph. Trajectory
    scalars ride the commit scan (n = rows, e = sum(deg)/2)."""
    from metis_spark.plans.densest import densest_subgraph

    traj, info = densest_subgraph(
        derived_edges_sparse(spark, sf_dir),
        eps_tenths=DENSEST_EPS_TENTHS,
        checkpoint_dir=_tmpdir("metis_qdensest_"),
        checkpoint_every=5,
        retain=2,
    )
    assert info["converged"] and info["rounds"] <= DENSEST_ORACLE_ROUNDS, info
    return traj

def _q_wl_colors(spark, sf_dir):
    """Weisfeiler-Lehman color refinement, 3 rounds (plans/wl.py):
    order-independent hash-WL — the neighbor multiset enters as an exact
    integer SUM(rehash(color)) mod 2^60, so the per-round aggregation
    map-side-combines and the colors are bit-identical across engines
    and cluster sizes."""
    from metis_spark.plans.wl import wl_colors

    colors, info = wl_colors(derived_edges_sparse(spark, sf_dir), rounds=WL_ROUNDS)
    assert info["rounds"] == WL_ROUNDS and len(info["n_colors_per_round"]) == WL_ROUNDS + 1
    return colors

def _q_wl_class_histogram(spark, sf_dir):
    """WL color-class size distribution — the graph's structural
    fingerprint signature (two graphs with different histograms are
    provably non-isomorphic): (class_size, n_classes) from the round-3
    colors."""
    from metis_spark.plans.wl import wl_colors

    colors, _ = wl_colors(derived_edges_sparse(spark, sf_dir), rounds=WL_ROUNDS)
    cls = colors.groupBy("color").agg(F.count(F.lit(1)).cast("long").alias("class_size"))
    return cls.groupBy("class_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes")
    )

def _q_betweenness(spark, sf_dir):
    """Approximate betweenness: exact Brandes restricted to the 8
    smallest-id sources of the sparse graph (plans/betweenness.py) —
    forward σ/level BFS + backward dependency accumulation."""
    from metis_spark.plans.betweenness import betweenness_approx

    edges = derived_edges_sparse(spark, sf_dir)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    srcs = [r["id"] for r in verts.orderBy("id").limit(N_BETW_SOURCES).collect()]
    bc, info = betweenness_approx(edges, srcs, max_depth=BETW_ROUNDS + 2)
    assert info["depth"] <= BETW_ROUNDS, info
    return bc

def _q_edge_betweenness(spark, sf_dir):
    """Girvan–Newman edge betweenness restricted to the same 8 landmark
    sources (plans/betweenness.py:edge_betweenness_approx): the backward
    dependency summands grouped by DAG edge instead of predecessor —
    shares the forward σ pass and edge partitions with the vertex
    variant."""
    from metis_spark.plans.betweenness import edge_betweenness_approx

    edges = derived_edges_sparse(spark, sf_dir)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    srcs = [r["id"] for r in verts.orderBy("id").limit(N_BETW_SOURCES).collect()]
    ebc, info = edge_betweenness_approx(edges, srcs, max_depth=BETW_ROUNDS + 2)
    assert info["depth"] <= BETW_ROUNDS, info
    return ebc

def _q_louvain(spark, sf_dir):
    """Two synchronous Louvain local-moving sweeps on the sparse graph
    (plans/louvain.py): per-vertex modularity-gain argmax with the
    ROUND(gain,9)+min-label tie discipline, so the unrolled oracle
    replays every move."""
    from metis_spark.plans.louvain import louvain_local_moving

    labels, info = louvain_local_moving(
        derived_edges_sparse(spark, sf_dir),
        rounds=LOUVAIN_ROUNDS,
        checkpoint_dir=_tmpdir("metis_qlouvain_"),
    )
    assert info["iterations"] == LOUVAIN_ROUNDS, info
    return labels

def _q_louvain_multilevel(spark, sf_dir):
    """Full two-level Louvain (plans/louvain.py louvain_multilevel):
    local moving, quotient-multigraph coarsening (integer und-row
    weights), then a second WEIGHTED moving pass — every move at both
    levels replayed bit-exactly by the unrolled oracle."""
    from metis_spark.plans.louvain import louvain_multilevel

    labels, info = louvain_multilevel(
        derived_edges_sparse(spark, sf_dir),
        rounds=LOUVAIN_ROUNDS,
        checkpoint_dir=_tmpdir("metis_qlouvain2_"),
    )
    assert info["iterations"] == 2 * LOUVAIN_ROUNDS, info
    return labels

def _q_nucleus(spark, sf_dir):
    """(3,4)-nucleus decomposition (plans/nucleus.py): per-triangle
    nucleus numbers by h-index iteration over the once-enumerated
    4-clique incidence — the decomposition one level past trussness
    (same spine, triangles peel by 4-clique support instead of edges
    by triangle support). Converges in ≤ NUCLEUS_ORACLE_ROUNDS on this
    graph, so the fixed-round oracle replays the exact fixpoint."""
    from metis_spark.plans.nucleus import nucleus_34

    out, info = nucleus_34(
        derived_edges_sparse(spark, sf_dir),
        checkpoint_dir=_tmpdir("metis_qnuc_"),
    )
    assert info["converged"] and info["iterations"] <= NUCLEUS_ORACLE_ROUNDS, info
    return out

def _q_simrank(spark, sf_dir):
    """SimRank top-k over a bounded eval-pair set (plans/simrank.py):
    the recursive structural-context metric, quantized to integer
    micro-units each level so the unrolled oracle replays the
    trajectory bit-for-bit. Pairs = md5-sampled vertex subset crossed
    (a<b), ~|V|²/MOD² rows — bounded by construction, never all-pairs;
    the degree cap bounds the pair-closure at |pairs|·cap² per level
    (hubs carry near-zero SimRank mass: the recurrence divides by
    |N(a)|·|N(b)|). Global top-k is TakeOrdered-then-rank over the
    already-limited set."""
    from metis_spark.plans.simrank import simrank_pairs

    e = derived_edges_sparse(spark, sf_dir)
    verts = derived_und(spark, sf_dir).select(F.col("src").alias("id")).distinct()
    vs = verts.where(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("_", F.lit("sr"), F.col("id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % SIMRANK_VSAMP_MOD
        == 0
    )
    pairs = (
        vs.select(F.col("id").alias("a"))
        .crossJoin(F.broadcast(vs.select(F.col("id").alias("b"))))
        .where(F.col("a") < F.col("b"))
    )
    scores, info = simrank_pairs(
        e, pairs, c=0.8, iters=SIMRANK_ITERS, deg_cap=SIMRANK_CAP
    )
    assert info["iterations"] == SIMRANK_ITERS, info
    top = (
        scores.where(F.col("q") > 0)
        .orderBy(F.desc("q"), F.asc("a"), F.asc("b"))
        .limit(SIMRANK_K)
    )
    w = Window.orderBy(F.desc("q"), F.asc("a"), F.asc("b"))
    return top.withColumn("rn", F.row_number().over(w).cast("long"))

def _q_leiden(spark, sf_dir):
    """Leiden community detection (plans/leiden.py): Louvain local
    moving + the Traag et al. REFINEMENT phase (singleton re-merge
    inside phase-1 communities, so every refined community is
    internally connected by construction), then a level-2 weighted
    sweep on the refined quotient initialized with phase-1 labels.
    Every move at all three phases is replayed bit-exactly by the
    unrolled oracle (ROUND(gain,9)+min-label + deterministic
    mutual-move arbitration)."""
    from metis_spark.plans.leiden import leiden_communities

    labels, info = leiden_communities(
        derived_edges_sparse(spark, sf_dir),
        rounds=LOUVAIN_ROUNDS,
        refine_rounds=LEIDEN_REFINE_ROUNDS,
        checkpoint_dir=_tmpdir("metis_qleiden_"),
    )
    assert info["iterations"] == 2 * LOUVAIN_ROUNDS + LEIDEN_REFINE_ROUNDS, info
    return labels

def _q_community_quotient(spark, sf_dir):
    """Community quotient graph: weighted inter-community edges after
    the level-1 Louvain sweeps — the coarsened graph a multilevel run
    feeds forward, exposed as a queryable table (who talks to whom, and
    how much, at community granularity). One map-side-combined groupBy
    over the label-joined und edges; self-loops = intra-community mass
    (2·w_self in und-row space)."""
    from metis_spark.plans.louvain import louvain_local_moving

    edges = derived_edges_sparse(spark, sf_dir)
    labels, info = louvain_local_moving(
        edges, rounds=LOUVAIN_ROUNDS, checkpoint_dir=_tmpdir("metis_qcq_")
    )
    assert info["iterations"] == LOUVAIN_ROUNDS, info
    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return (
        und.join(
            labels.select(F.col("id").alias("src"), F.col("label").alias("ca"))
            .hint("shuffle_hash"),
            "src",
        )
        .join(
            labels.select(F.col("id").alias("dst"), F.col("label").alias("cb"))
            .hint("shuffle_hash"),
            "dst",
        )
        .groupBy(F.col("ca").alias("c_src"), F.col("cb").alias("c_dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )

def _q_community_pagerank(spark, sf_dir):
    """Community-level PageRank: weighted power iteration over the
    Louvain quotient graph — 'which communities matter', the two-scale
    composition a link-graph user runs after community detection. Both
    stages are independently verified operators (louvain_local_moving +
    pagerank(weight_col=)); the quotient has |communities| vertices, so
    the iteration runs on a graph orders of magnitude smaller than the
    input."""
    from metis_spark.plans.louvain import louvain_local_moving

    edges = derived_edges_sparse(spark, sf_dir)
    labels, info = louvain_local_moving(
        edges, rounds=LOUVAIN_ROUNDS, checkpoint_dir=_tmpdir("metis_qcpr_a_")
    )
    assert info["iterations"] == LOUVAIN_ROUNDS, info
    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    q_edges = (
        und.join(
            labels.select(F.col("id").alias("src"), F.col("label").alias("ca"))
            .hint("shuffle_hash"),
            "src",
        )
        .join(
            labels.select(F.col("id").alias("dst"), F.col("label").alias("cb"))
            .hint("shuffle_hash"),
            "dst",
        )
        .where(F.col("ca") != F.col("cb"))
        .groupBy(F.col("ca").alias("src"), F.col("cb").alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    ranks, _ = pagerank(
        q_edges,
        tol=0.0,
        max_iter=PR_ITERS,
        weight_col="w",
        checkpoint_dir=_tmpdir("metis_qcpr_b_"),
    )
    return ranks.select("id", F.round("rank", 6).alias("rank"))

def _q_louvain_trajectory(spark, sf_dir):
    """Per-level modularity trajectory of two-level Louvain: one row per
    level (0 = singletons, 1 = after local moving, 2 = after the
    quotient sweep) with community count and total Newman modularity
    Q = intra/m − Σ_c (D_c/(2m))² — the quality curve users eyeball to
    decide whether another level is worth it. Level-1 labels come free
    from the multilevel run (parquet-backed commit); each level's score
    is two SHJ label joins + two map-side-combining groupBys, scalars
    only at the driver."""
    from metis_spark.plans.louvain import louvain_multilevel

    edges = derived_edges_sparse(spark, sf_dir)
    l2, info = louvain_multilevel(
        edges,
        rounds=LOUVAIN_ROUNDS,
        checkpoint_dir=_tmpdir("metis_qlouvtraj_"),
    )
    assert info["iterations"] == 2 * LOUVAIN_ROUNDS, info
    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    m = und.count() / 2.0
    canon = und.where(F.col("src") < F.col("dst"))

    def _score(labels):
        la = labels.select(F.col("id").alias("src"), F.col("label").alias("la"))
        lb = labels.select(F.col("id").alias("dst"), F.col("label").alias("lb"))
        intra = (
            canon.join(la.hint("shuffle_hash"), "src")
            .join(lb.hint("shuffle_hash"), "dst")
            .where(F.col("la") == F.col("lb"))
            .count()
        )
        agg = (
            labels.join(deg.hint("shuffle_hash"), "id")
            .groupBy("label")
            .agg(F.sum("deg").alias("D"))
            .agg(
                F.count(F.lit(1)).alias("ncomm"),
                F.sum(F.pow(F.col("D") / F.lit(2.0 * m), F.lit(2.0))).alias("ss"),
            )
            .collect()[0]
        )
        q = _round_half_away(intra / m - float(agg["ss"]), 6)
        return int(agg["ncomm"]), q

    l0 = deg.select("id", F.col("id").alias("label"))
    rows = []
    for lvl, labels in ((0, l0), (1, info["level1_labels"]), (2, l2)):
        ncomm, q = _score(labels)
        rows.append((lvl, ncomm, q))
    und.unpersist()
    return spark.createDataFrame(
        rows, "level long, communities long, modularity double"
    )

def _q_coloring(spark, sf_dir):
    """Jones–Plassmann greedy coloring (plans/coloring.py): equals the
    sequential greedy pass in hash-priority order, so the unrolled
    oracle reproduces it exactly. Fixed-priority JP rounds = the longest
    h-decreasing path, which grows with density — 9/20 rounds at the
    oracle-gate scales but >100 at sf0.1 even thinned, hence the raised
    budget and the gate-scale-only round assert (the scale-right
    O(log n)-round variant is ``coloring_luby``)."""
    from metis_spark.plans.coloring import greedy_coloring

    out, info = greedy_coloring(
        _coloring_edges(spark, sf_dir),
        max_iter=500,
        checkpoint_dir=_tmpdir("metis_qcolor_"),
        checkpoint_every=5,
        retain=2,
    )
    assert info["converged"] and info["n_colors"] <= 64, info
    if os.path.basename(sf_dir.rstrip("/")) in ("sf0.001", "sf0.01"):
        # the unrolled oracle only runs at the gate scales; its depth
        # must cover the fixpoint there
        assert info["iterations"] <= COLOR_ORACLE_ROUNDS, info
    return out

def _q_mis(spark, sf_dir):
    """Deterministic-Luby maximal independent set of the sparse graph
    (plans/mis.py) — fixed injective hash priorities make the round
    sequence engine-replayable, so the unrolled oracle reaches the
    identical set."""
    from metis_spark.plans.mis import maximal_independent_set

    out, info = maximal_independent_set(
        derived_edges_sparse(spark, sf_dir),
        checkpoint_dir=_tmpdir("metis_qmis_"),
        checkpoint_every=5,
        retain=2,
    )
    assert info["converged"] and info["iterations"] <= MIS_ORACLE_ROUNDS, info
    return out

def _q_ktruss(spark, sf_dir):
    """4-truss of the sparse graph: edges in ≥2 triangles after cascade
    peeling (plans/ktruss.py — edge-support twin of k-core)."""
    from metis_spark.plans.ktruss import k_truss

    sup, info = k_truss(
        derived_edges_sparse(spark, sf_dir),
        k=KTRUSS_K,
        checkpoint_dir=_tmpdir("metis_qktruss_"),
        checkpoint_every=5,
        retain=2,
    )
    assert info["converged"] and info["iterations"] <= KTRUSS_ORACLE_ROUNDS, info
    return sup

def _q_trussness(spark, sf_dir):
    """Full truss decomposition (plans/trussness.py): per-edge truss
    numbers by distributed edge-h-index iteration over a
    once-materialized triangle table — fixpoint in O(1) rounds here,
    never truss-many peeling levels."""
    from metis_spark.plans.trussness import trussness

    out, info = trussness(
        derived_edges_sparse(spark, sf_dir),
        checkpoint_dir=_tmpdir("metis_qtrussness_"),
        checkpoint_every=5,
        retain=2,
    )
    assert info["converged"] and info["iterations"] <= TRUSSNESS_ORACLE_ROUNDS, info
    return out

def _q_onion(spark, sf_dir):
    """Onion decomposition (plans/onion.py): per-vertex (layer, core) by
    synchronous peeling sweeps — the multi-scale refinement of coreness
    (core column pinned equal to the h-index result by pytest)."""
    from metis_spark.plans.onion import onion_decomposition

    out, info = onion_decomposition(
        derived_edges_sparse(spark, sf_dir),
        checkpoint_dir=_tmpdir("metis_qonion_"),
        checkpoint_every=5,
        retain=2,
    )
    assert info["converged"] and info["layers"] <= ONION_ROUNDS, info
    return out

def _q_trussness_decremental(spark, sf_dir):
    """Decremental truss maintenance: old truss numbers of surviving
    edges stay UPPER bounds after edge deletions (trussness is monotone
    in the edge set), so the edge-h-index iteration warm-started from
    them repairs only the triangle neighbourhoods the deletions touched
    — same unique fixpoint as a cold run (the oracle), in a fraction of
    the descent rounds (plans/trussness.py init_truss)."""
    from metis_spark.plans.trussness import trussness

    full = derived_edges_sparse(spark, sf_dir)
    reduced = full.where((F.col("src") * 31 + F.col("dst")) % TRUSS_DEC_MOD != 0)
    base, info0 = trussness(
        full, checkpoint_dir=_tmpdir("metis_qtrussdec_a_"), checkpoint_every=5, retain=2
    )
    assert info0["converged"], info0
    out, info = trussness(
        reduced, init_truss=base, checkpoint_dir=_tmpdir("metis_qtrussdec_b_"),
        checkpoint_every=5, retain=2,
    )
    # converged is the only contract: h-index fixpoints are unique, so any
    # converged run hash-matches the oracle's cold fixed-round unroll
    assert info["converged"], info
    return out

def _q_partition_assignment(spark, sf_dir):
    """Balanced k-way partition (plans/partition.py): one multilevel
    V-cycle — heavy-edge coarsen (the heavy_edge_coarsen matching),
    md5-hash initial partition of the QUOTIENT, project, then one greedy
    boundary-refinement pass (two parity-staged sub-rounds, moves to the
    neighbor-majority part under the hard cap floor(1.1*n/k),
    deterministic tie-breaks). Per-vertex (id, part) — the full
    assignment hash-matches the unrolled twin."""
    from metis_spark.plans.partition import kway_partition

    parts, info = kway_partition(
        derived_edges_sparse(spark, sf_dir),
        k=PARTITION_K,
        eps=PARTITION_EPS10 / 10.0,
        checkpoint_dir=_tmpdir("metis_qpart_"),
    )
    assert (
        info["match_converged"]
        and info["match_iterations"] <= MATCHING_ORACLE_ROUNDS
    ), info
    return parts

def _q_partition_quality(spark, sf_dir):
    """Partition quality report (VERDICT r3 item 5 'reported edge-cut'):
    the refined V-cycle cut vs the fine-level hash-partition baseline
    (SAME md5 hash family, so like-for-like), plus balance extrema vs
    the cap. Asserts the multilevel cut strictly beats hash
    partitioning at the gate scales."""
    from metis_spark.plans.partition import edge_cut, hash_partition, kway_partition

    e = derived_edges_sparse(spark, sf_dir)
    parts, info = kway_partition(
        e, k=PARTITION_K, eps=PARTITION_EPS10 / 10.0,
        checkpoint_dir=_tmpdir("metis_qpartq_"),
    )
    assert (
        info["match_converged"]
        and info["match_iterations"] <= MATCHING_ORACLE_ROUNDS
    ), info
    sz = parts.groupBy("part").agg(F.count(F.lit(1)).alias("c")).agg(
        F.max("c").cast("long").alias("max_part"),
        F.min("c").cast("long").alias("min_part"),
    )
    out = (
        sz.crossJoin(
            edge_cut(e, hash_partition(e, PARTITION_K)).select(
                F.col("cut").alias("cut_hash")
            )
        )
        .crossJoin(edge_cut(e, parts).select(F.col("cut").alias("cut_refined")))
        .select(
            F.lit(PARTITION_K).cast("long").alias("k"),
            F.lit(info["n"]).cast("long").alias("n_vertices"),
            F.lit(info["cap"]).cast("long").alias("cap"),
            "max_part",
            "min_part",
            "cut_hash",
            "cut_refined",
        )
    )
    row = out.first()
    assert row.cut_refined < row.cut_hash, (row.cut_refined, row.cut_hash)
    return out

def _q_affinity_clusters(spark, sf_dir):
    """Affinity clustering level-2 (plans/mst.py:affinity_clusters —
    Bateni et al. NeurIPS'17): clusters are the Borůvka fragments after
    2 min-edge merge rounds over the hash-weighted sparse graph."""
    from metis_spark.plans.mst import affinity_clusters

    weighted = derived_edges_sparse(spark, sf_dir).select(
        "src", "dst", _msf_weight_col().alias("weight")
    )
    out, info = affinity_clusters(
        weighted, level=AFFINITY_LEVEL,
        checkpoint_dir=_tmpdir("metis_qaffinity_"),
    )
    assert info["inner_steps_max"] <= MSF_INNER_J, info
    return out


FIEDLER_ITERS = 16
FIEDLER_SCALE = 10_000


def _q_fiedler(spark, sf_dir):
    """Approximate Fiedler vector + spectral bipartition
    (plans/spectral.py:fiedler_bipartition): power iteration on the
    shifted Laplacian cI − L with the state re-quantized to integers in
    [−S, S] EVERY round — the construction that makes a spectral method
    engine-exact (all products < 2^53, two correctly-rounded divisions
    per round), where a naive L2-normalized iteration could never
    hash-match across engines."""
    from metis_spark.plans.spectral import fiedler_bipartition

    out, info = fiedler_bipartition(
        derived_edges_sparse(spark, sf_dir),
        n_iters=FIEDLER_ITERS,
        scale=FIEDLER_SCALE,
    )
    assert 0 < info["n_pos"] < info["n"], info
    return out


def _q_fiedler_sweep(spark, sf_dir):
    """Classic spectral partitioning end-to-end (plans/sweep.py:
    fiedler_sweep_cut): the quantized Fiedler vector, value-sorted
    sweep order (all-integer — no rounding discipline needed), and the
    conductance of every prefix S_1..S_64 via the shared
    difference-histogram kernel."""
    from metis_spark.plans.sweep import fiedler_sweep_cut

    out, info = fiedler_sweep_cut(
        derived_edges_sparse(spark, sf_dir),
        n_iters=FIEDLER_ITERS,
        scale=FIEDLER_SCALE,
        sweep_l=SWEEP_L,
    )
    assert info["best_phi"] <= 1.0 and 1 <= info["best_k"] <= SWEEP_L, info
    return out

def _q_scan(spark, sf_dir):
    """SCAN structural clustering (plans/scan.py:scan_clusters) over the
    sparse graph — per-vertex (cluster, role) with the four-way
    core/border/hub/outlier decomposition. sigma >= eps never touches
    floats (squared-integer test), the cluster CC runs on the verified
    min-star spine with a rounds assert mirroring the oracle's fixed
    SCAN_CC_ROUNDS unroll."""
    from metis_spark.driver.common import SCAN_CC_ROUNDS, SCAN_EPS_DEN, SCAN_EPS_NUM, SCAN_MU
    from metis_spark.plans.scan import scan_clusters

    e = derived_edges_sparse(spark, sf_dir)
    return scan_clusters(
        e, eps_num=SCAN_EPS_NUM, eps_den=SCAN_EPS_DEN, mu=SCAN_MU,
        max_cc_rounds=SCAN_CC_ROUNDS, checkpoint_dir=_tmpdir("metis_qscan_"),
    )

def _q_five_cliques(spark, sf_dir):
    """Exact k=3,4,5 clique profile (plans/triangles.py:
    five_clique_profile) — one kClist level past four_clique_count;
    the profile's slope is the link-farm escalation signal (rings
    densify top-down: 5-cliques explode before triangles move)."""
    from metis_spark.plans.triangles import five_clique_profile

    return five_clique_profile(derived_edges_sparse(spark, sf_dir))

def _q_doulion_triangles(spark, sf_dir):
    """DOULION coin-flip triangle estimate (plans/triangles.py:
    doulion_triangle_estimate) — deterministic md5-coin p=1/4 edge
    sparsification, exact count on the kept quarter, scaled by 4^3;
    the screening pass that prices the exact triangle_count at scale."""
    return doulion_triangle_estimate(derived_edges(spark, sf_dir))

def _q_truss_communities(spark, sf_dir):
    """Seedless k-truss community search (Huang et al. SIGMOD'14): the
    4-truss fixpoint (plans/ktruss.py) partitioned into its connected
    components (plans/components.py) — each component is a k-truss
    community (every edge inside sits in >= k-2 intra-community
    triangles); community id = min member vertex. The composition a
    community-search user runs batch-side before serving seed queries."""
    from metis_spark.plans.components import connected_components
    from metis_spark.plans.ktruss import k_truss

    sup, info = k_truss(
        derived_edges_sparse(spark, sf_dir),
        k=KTRUSS_K,
        checkpoint_dir=_tmpdir("metis_qtrusscomm_"),
        checkpoint_every=5,
        retain=2,
    )
    assert info["converged"] and info["iterations"] <= KTRUSS_ORACLE_ROUNDS, info
    truss_edges = sup.select("src", "dst").persist()
    labels, cinfo = connected_components(
        truss_edges, checkpoint_dir=_tmpdir("metis_qtrusscomm_cc_")
    )
    assert cinfo["converged"] and cinfo["iterations"] <= 12, cinfo
    nv = labels.groupBy(F.col("component").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices")
    )
    ne = (
        truss_edges.join(
            labels.select(F.col("id").alias("src"), "component").hint("shuffle_hash"),
            "src",
        )
        .groupBy(F.col("component").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )
    out = nv.join(ne, "community").select("community", "n_vertices", "n_edges")
    rows = out.collect()
    truss_edges.unpersist()
    return spark.createDataFrame(rows, "community long, n_vertices long, n_edges long")

def _q_ab_core(spark, sf_dir):
    """Bipartite (α,β)-core (plans/bipartite.py:ab_core) on the
    order→part interaction graph: drop sparse orders (deg < α) and
    barely-touched parts (deg < β) to the mutual fixpoint — the
    two-mode cohesion filter."""
    from metis_spark.plans.bipartite import ab_core

    li = _t(spark, sf_dir, "lineitem")
    be = li.select(
        (F.col("l_orderkey") % ABCORE_MOD).alias("u"),
        (F.col("l_partkey") % ABCORE_MOD).alias("v"),
    )
    out, info = ab_core(be, alpha=ABCORE_ALPHA, beta=ABCORE_BETA, max_rounds=ABCORE_ROUNDS)
    assert info["converged"] and info["rounds"] <= ABCORE_ROUNDS, info
    return out

def _q_butterflies(spark, sf_dir):
    """Exact butterfly census + Robins-Alexander bipartite clustering
    coefficient (plans/bipartite.py:butterfly_summary) of the order-part
    two-mode graph — the bipartite motif signal next to bipartite_ab_core."""
    from metis_spark.plans.bipartite import butterfly_summary

    li = _t(spark, sf_dir, "lineitem")
    be = li.select(
        (F.col("l_orderkey") % ABCORE_MOD).alias("u"),
        (F.col("l_partkey") % ABCORE_MOD).alias("v"),
    )
    return butterfly_summary(be)

def _q_cpm(spark, sf_dir):
    """k=3 clique-percolation communities (plans/cpm.py, Palla et al.
    Nature 2005) on the sparse graph — OVERLAPPING communities as
    connected components of the triangle-overlap graph."""
    from metis_spark.driver.common import CPM_CC_ROUNDS
    from metis_spark.plans.cpm import clique_percolation_k3

    edges = derived_edges_sparse(spark, sf_dir)
    return clique_percolation_k3(
        edges, max_cc_rounds=CPM_CC_ROUNDS, checkpoint_dir=_tmpdir("metis_qcpm_")
    )

def _q_kwing(spark, sf_dir):
    """k-wing (k-bitruss) filter (plans/bipartite.py:k_wing, Sarıyüce &
    Pinar WSDM'18) on the order-part graph — edges kept only while they
    sit in >= WING_K butterflies, peeled to the mutual fixpoint."""
    from metis_spark.driver.common import WING_K, WING_MOD, WING_ROUNDS
    from metis_spark.plans.bipartite import k_wing

    li = _t(spark, sf_dir, "lineitem")
    be = li.select(
        (F.col("l_orderkey") % WING_MOD).alias("u"),
        (F.col("l_partkey") % WING_MOD).alias("v"),
    )
    out, info = k_wing(be, k=WING_K, max_rounds=WING_ROUNDS)
    assert info["converged"] and info["rounds"] <= WING_ROUNDS, info
    return out

def _q_tip(spark, sf_dir):
    """Per-vertex butterfly counts, top-k (plans/bipartite.py:
    butterfly_per_vertex_topk) — the tip-decomposition support / two-mode
    hub ranking on the order-part graph."""
    from metis_spark.driver.common import TIP_K
    from metis_spark.plans.bipartite import butterfly_per_vertex_topk

    li = _t(spark, sf_dir, "lineitem")
    be = li.select(
        (F.col("l_orderkey") % ABCORE_MOD).alias("u"),
        (F.col("l_partkey") % ABCORE_MOD).alias("v"),
    )
    return butterfly_per_vertex_topk(be, k=TIP_K)

def _q_core_periphery(spark, sf_dir):
    """Borgatti–Everett core–periphery block profile on the coreness
    fixpoint (plans/metrics.py:core_periphery_blocks): degeneracy shell
    = core, exact dyad-block counts, closed-form pattern correlation."""
    from metis_spark.plans.coreness import coreness
    from metis_spark.plans.metrics import core_periphery_blocks

    edges = derived_edges_sparse(spark, sf_dir)
    cores, info = coreness(
        edges,
        checkpoint_dir=_tmpdir("metis_qcp_core_"),
        checkpoint_every=5,
        retain=2,
    )
    assert info["converged"], info
    return core_periphery_blocks(cores, edges)

def _q_map_equation(spark, sf_dir):
    """Map-equation codelength (Rosvall–Bergstrom PNAS 2008) of the
    Louvain level-1 partition (plans/metrics.py:map_equation) — the
    flow-based quality score next to modularity; exact deg/2m visit
    rates, micro-bit quantized plogp sums."""
    from metis_spark.plans.louvain import louvain_local_moving
    from metis_spark.plans.metrics import map_equation

    edges = derived_edges_sparse(spark, sf_dir)
    lab, _ = louvain_local_moving(
        edges, rounds=LOUVAIN_ROUNDS, checkpoint_dir=_tmpdir("metis_qmapeq_")
    )
    return map_equation(lab, edges)

def _q_kpeak(spark, sf_dir):
    """k-peak decomposition (Govindan et al. WWW'17): mountain-by-
    mountain coreness peel (plans/kpeak.py) — per-region density
    numbers that one globally dense region can't shadow."""
    from metis_spark.plans.kpeak import k_peak
    from metis_spark.driver.common import KPEAK_ROUNDS

    out, info = k_peak(
        derived_edges_sparse(spark, sf_dir),
        checkpoint_dir=_tmpdir("metis_qkpeak_"),
        max_contours=KPEAK_ROUNDS,
    )
    assert info["contours"] <= KPEAK_ROUNDS, info
    return out

def _q_percolation_threshold(spark, sf_dir):
    """Molloy–Reed criterion + Cohen random-failure threshold
    (plans/metrics.py:percolation_threshold) — the analytic partner to
    robustness_random; one degree groupBy, two integer-ratio folds."""
    from metis_spark.plans.metrics import percolation_threshold

    return percolation_threshold(derived_edges_sparse(spark, sf_dir))

def _q_triangle_surplus(spark, sf_dir):
    """Triangle count vs the exact Chung–Lu expectation
    (plans/metrics.py:triangle_surplus) — motif significance beyond
    degree effects; decimal-exact moment sums."""
    from metis_spark.plans.metrics import triangle_surplus

    return triangle_surplus(derived_edges_sparse(spark, sf_dir))

def _q_katz_index(spark, sf_dir):
    """Truncated Katz index top-k (plans/metrics.py:katz_index_topk) —
    the walk-counting link predictor next to adamic_adar_topk /
    vertex_jaccard_topk; integer-exact beta = 1/KATZI_BETA_DEN."""
    from metis_spark.plans.metrics import katz_index_topk
    from metis_spark.driver.common import KATZI_BETA_DEN, KATZI_K

    return katz_index_topk(
        derived_edges_sparse(spark, sf_dir), k=KATZI_K, beta_den=KATZI_BETA_DEN
    )

def _q_degree_gini(spark, sf_dir):
    """Degree Gini + top-1% degree-mass share (plans/metrics.py:
    degree_gini) — the skew dial read before choosing hub salting."""
    from metis_spark.plans.metrics import degree_gini

    return degree_gini(derived_edges_sparse(spark, sf_dir))

def _q_edge_clustering(spark, sf_dir):
    """Radicchi edge clustering coefficient (plans/metrics.py:
    edge_clustering_coefficient) — the local Girvan–Newman stand-in:
    low-C3 edges are the divisive-removal candidates."""
    from metis_spark.plans.metrics import edge_clustering_coefficient

    return edge_clustering_coefficient(derived_edges_sparse(spark, sf_dir))

def _q_spectral_radius(spark, sf_dir):
    """Closed-form λ₁ bracket + SIS epidemic threshold bounds
    (plans/metrics.py:spectral_radius_bounds) — the analytic partner
    to eigencentrality_5iter and percolation_threshold."""
    from metis_spark.plans.metrics import spectral_radius_bounds

    return spectral_radius_bounds(derived_edges_sparse(spark, sf_dir))

def _q_community_conductance(spark, sf_dir):
    """Per-community conductance (plans/metrics.py:
    community_conductance) over the Louvain level-1 partition — the
    NCP-style per-row quality detail behind the global scores."""
    from metis_spark.plans.louvain import louvain_local_moving
    from metis_spark.plans.metrics import community_conductance

    edges = derived_edges_sparse(spark, sf_dir)
    labels, _ = louvain_local_moving(
        edges, rounds=LOUVAIN_ROUNDS, checkpoint_dir=_tmpdir("metis_qccond_")
    )
    return community_conductance(labels, edges)

def _q_rich_club_normalized(spark, sf_dir):
    """Chung–Lu-normalized rich-club profile ρ(k) = E_k / E_null(k)
    with E_null = (S₁ₖ² − S₂ₖ)/(4m) — the analytic degree-preserving
    null (p_ij = d_i·d_j/2m, hub cap p>1 inherited and declared) that
    answers what raw φ(k) can't: do hubs interconnect MORE than their
    degrees force? (Colizza et al. 2006 normalize by sampled rewirings;
    the closed form replaces the sampler exactly the way
    triangle_surplus replaces a rewired triangle null.)

    Plan shape: the rich_club spine plus one degree-moment aggregate
    per threshold over the SAME 4-row literal explode — no per-k
    rescan; moments in decimal(38,0)."""
    e = derived_edges_sparse(spark, sf_dir)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    und = e.unionByName(rev).distinct()
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    dec = "decimal(38,0)"
    ks = F.array([F.lit(k) for k in RICH_CLUB_KS])
    spine = spark.createDataFrame([(k,) for k in RICH_CLUB_KS], "k long")
    two_m = und.agg(F.count(F.lit(1)).cast("long").alias("two_m"))
    club = (
        deg.select(F.explode(ks).alias("k"), "d")
        .withColumn("k", F.col("k").cast("long"))
        .where(F.col("d") > F.col("k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_k"),
            F.sum(F.col("d").cast(dec)).alias("s1k"),
            F.sum(F.col("d").cast(dec) * F.col("d").cast(dec)).alias("s2k"),
        )
    )
    pairs = (
        und.where(F.col("src") < F.col("dst"))
        .join(deg.select(F.col("id").alias("src"), F.col("d").alias("da")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("db")), "dst")
    )
    ek = (
        pairs.select(F.explode(ks).alias("k"), "da", "db")
        .withColumn("k", F.col("k").cast("long"))
        .where((F.col("da") > F.col("k")) & (F.col("db") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("e_k"))
    )
    e_null = (
        F.col("s1k").cast("double") * F.col("s1k").cast("double")
        - F.col("s2k").cast("double")
    ) / (F.lit(2.0) * F.col("two_m").cast("double"))
    return (
        spine.join(club, "k", "left")
        .join(ek, "k", "left")
        .crossJoin(F.broadcast(two_m))
        .select(
            "k",
            F.coalesce("n_k", F.lit(0)).cast("long").alias("n_k"),
            F.coalesce("e_k", F.lit(0)).cast("long").alias("e_k"),
            F.coalesce(F.col("s1k").cast("long"), F.lit(0)).alias("s1_k"),
            F.coalesce(F.col("s2k").cast("long"), F.lit(0)).alias("s2_k"),
            F.when(F.coalesce(F.col("n_k"), F.lit(0)) >= 2, F.round(e_null, 6)).alias("e_null"),
            F.when(
                (F.coalesce(F.col("n_k"), F.lit(0)) >= 2) & (e_null > 0),
                F.round(F.coalesce(F.col("e_k"), F.lit(0)).cast("double") / e_null, 6),
            ).alias("rho"),
        )
    )

def _q_dcsbm(spark, sf_dir):
    """DC-SBM profile log-likelihood of the Louvain level-1 partition
    (plans/metrics.py:dcsbm_likelihood) — the model-based partition
    score next to modularity and map_equation."""
    from metis_spark.plans.louvain import louvain_local_moving
    from metis_spark.plans.metrics import dcsbm_likelihood

    edges = derived_edges_sparse(spark, sf_dir)
    lab, _ = louvain_local_moving(
        edges, rounds=LOUVAIN_ROUNDS, checkpoint_dir=_tmpdir("metis_qdcsbm_")
    )
    return dcsbm_likelihood(lab, edges)

def _q_clustering_by_degree(spark, sf_dir):
    """C(k): mean local clustering per degree → (deg, n_vertices,
    sum_lcc_micro, mean_lcc). The standard hierarchical-structure plot
    (Ravasz & Barabási 2003): C(k) ~ k^-1 signals modules nested under
    hubs; flat C(k) signals none. Per-vertex lcc = 2T/(d(d−1)) is a
    pure function of the integer pair (T, d), quantized to micro units
    BEFORE the per-degree mean so the sum is order-free; deg < 2
    vertices report lcc 0 (same convention as local_clustering)."""
    from metis_spark.plans.metrics import local_clustering

    lcc = local_clustering(derived_edges_sparse(spark, sf_dir))
    micro = F.when(
        F.col("deg") >= 2,
        F.round(
            F.lit(2e6) * F.col("triangles").cast("double")
            / (F.col("deg").cast("double") * (F.col("deg") - 1).cast("double"))
        ).cast("long"),
    ).otherwise(F.lit(0))
    return (
        lcc.select("deg", micro.alias("m"))
        .groupBy("deg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vertices"),
            F.sum("m").cast("long").alias("sum_lcc_micro"),
        )
        .select(
            "deg",
            "n_vertices",
            "sum_lcc_micro",
            F.round(
                F.col("sum_lcc_micro").cast("double")
                / F.col("n_vertices").cast("double")
                / F.lit(1e6),
                6,
            ).alias("mean_lcc"),
        )
    )

def _q_directed_assortativity(spark, sf_dir):
    """Foster et al. four-mode directed assortativity
    (plans/metrics.py:directed_assortativity) — the directed
    refinement of the scalar degree_assortativity; exact decimal
    moments, one double expression per mode."""
    from metis_spark.plans.metrics import directed_assortativity

    return directed_assortativity(derived_edges(spark, sf_dir))

def _q_walk_entropy(spark, sf_dir):
    """Closed-form random-walk entropy rate h = Σ deg·ln(deg)/2m
    (plans/metrics.py:walk_entropy_rate) — stationary distribution is
    exactly deg/2m on an undirected graph, no iteration needed."""
    from metis_spark.plans.metrics import walk_entropy_rate

    return walk_entropy_rate(derived_edges_sparse(spark, sf_dir))

def _q_spectral_moments(spark, sf_dir):
    """Exact trace(A^2..A^4) from the motif spines
    (plans/metrics.py:spectral_moments) — the power-sum checkpoints an
    estimated spectrum must satisfy; hub-capped wedge discipline."""
    from metis_spark.driver.common import HUB_CAP
    from metis_spark.plans.metrics import spectral_moments

    return spectral_moments(derived_edges_sparse(spark, sf_dir), hub_cap=HUB_CAP)

def _q_skew_salt_advisor(spark, sf_dir):
    """Join-key skew audit + salt recommendation
    (plans/sizing.py:skew_salt_advisor) — the pre-shuffle planning
    query behind the north-rule's explicit hub salting; all-integer."""
    from metis_spark.plans.sizing import skew_salt_advisor

    return skew_salt_advisor(derived_edges(spark, sf_dir), parallelism=32)

def _q_hk_sweep_cut(spark, sf_dir):
    """Heat-kernel local community (plans/sweep.py:hk_sweep_cut) — the
    hk-relax sweep endgame next to ppr_sweep_cut on the same seeds;
    integer hk scores, shared conductance-sweep kernel."""
    from metis_spark.driver.common import (
        HK_SCALE, HK_T_DEN, HK_T_NUM, HK_TERMS, SWEEP_SEED_MOD,
    )
    from metis_spark.plans.sweep import hk_sweep_cut

    out, _ = hk_sweep_cut(
        derived_edges_sparse(spark, sf_dir),
        seed_mod=SWEEP_SEED_MOD, t_num=HK_T_NUM, t_den=HK_T_DEN,
        n_terms=HK_TERMS, scale=HK_SCALE, sweep_l=SWEEP_L,
    )
    return out

def _q_package_instability(spark, sf_dir):
    """Martin afferent/efferent coupling + instability per package
    (plans/metrics.py:package_instability) — the stable-dependencies
    dashboard over the quotient dependency graph."""
    from metis_spark.plans.metrics import package_instability

    return package_instability(derived_edges(spark, sf_dir), n_packages=16)

def _q_rrf_fusion(spark, sf_dir):
    """Reciprocal rank fusion (Cormack et al., SIGIR 2009) of the degree
    and triangles-per-vertex heads: rrf(v) = Σ_r 1e6 // (60 + rank_r(v))
    over the two top-64 rankings — the hybrid-ranking combiner retrieval
    stacks use, here fusing two exact structural signals. All integer;
    the only windows run over TakeOrdered 64-row heads."""
    from pyspark.sql import Window
    from metis_spark.plans.triangles import triangle_count_per_vertex

    K = 64
    e = derived_edges(spark, sf_dir)
    und = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    dtop = deg.orderBy(F.desc("deg"), F.asc("id")).limit(K)
    wd = Window.orderBy(F.desc("deg"), F.asc("id"))  # ≤ K rows
    dr = dtop.withColumn("rd", F.row_number().over(wd).cast("long")).select("id", "rd")
    tri = triangle_count_per_vertex(e)
    ttop = tri.orderBy(F.desc("triangles"), F.asc("id")).limit(K)
    wt = Window.orderBy(F.desc("triangles"), F.asc("id"))  # ≤ K rows
    tr = ttop.withColumn("rt", F.row_number().over(wt).cast("long")).select("id", "rt")
    fused = (
        dr.join(tr, "id", "full")
        .select(
            "id",
            (
                F.coalesce(F.expr("1000000 div (60 + rd)"), F.lit(0))
                + F.coalesce(F.expr("1000000 div (60 + rt)"), F.lit(0))
            ).cast("long").alias("rrf_micro"),
        )
    )
    top = fused.orderBy(F.desc("rrf_micro"), F.asc("id")).limit(20)
    wf = Window.orderBy(F.desc("rrf_micro"), F.asc("id"))  # ≤ 20 rows
    return top.withColumn("rn", F.row_number().over(wf).cast("long"))

def _q_zorder_locality(spark, sf_dir):
    """Z-order (Morton) clustering audit: interleave the 12-bit
    (src, dst) coordinates and count how many 256-cell storage blocks a
    square range query touches under z-order vs row-major layout — the
    measured justification for OPTIMIZE ZORDER-style clustering before
    a multi-column-filtered 100 TB scan (fewer touched blocks ⇒ more
    files pruned by min/max stats). All bit ops, integer-exact."""
    e = derived_edges(spark, sf_dir).select(
        F.col("src").cast("long").alias("x"), F.col("dst").cast("long").alias("y")
    )
    z = F.lit(0).cast("long")
    for i in range(12):
        z = (
            z
            + F.shiftleft(F.shiftright(F.col("x"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(F.col("y"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    zb = e.select(
        "x", "y",
        F.shiftright(z.cast("long"), 8).alias("zblock"),
        F.shiftright((F.shiftleft(F.col("x"), 12) + F.col("y")).cast("long"), 8).alias("rblock"),
    )
    box = zb.where(
        (F.col("x") >= 64) & (F.col("x") < 128) & (F.col("y") >= 64) & (F.col("y") < 128)
    )
    return box.agg(
        F.count(F.lit(1)).cast("long").alias("rows_in_box"),
        F.countDistinct("zblock").cast("long").alias("zorder_blocks"),
        F.countDistinct("rblock").cast("long").alias("rowmajor_blocks"),
    ).select(
        "rows_in_box", "zorder_blocks", "rowmajor_blocks",
        F.expr("(1000000 * zorder_blocks) div rowmajor_blocks")
        .cast("long").alias("block_ratio_micro"),
    )

def _q_kdegree_anonymity(spark, sf_dir):
    """k-degree anonymity cost curve (plans/metrics.py:
    kdegree_anonymity) — the structural privacy-release screen next to
    the corpus-side k_anonymity_audit: for each k, the exact integer
    degree-increment cost of the Liu–Terzi blocked grouping, computed
    from the degree histogram (never the n-row rank sequence)."""
    from metis_spark.plans.metrics import kdegree_anonymity

    return kdegree_anonymity(derived_edges_sparse(spark, sf_dir))

def _q_small_world_sigma(spark, sf_dir):
    """Small-world coefficient sigma = (C/C_rand)/(L/L_rand)
    (plans/metrics.py:small_world_sigma) — Watts–Strogatz clustering
    + truncated mean distance vs the Erdős–Rényi analytic nulls, all
    micro-quantized BIGINT (ln via ROUND(ln·1e6))."""
    from metis_spark.plans.metrics import small_world_sigma

    return small_world_sigma(derived_edges_sparse(spark, sf_dir), rounds=ANF_ROUNDS)

def _q_knn_degree_correlation(spark, sf_dir):
    """k_nn(k) degree-correlation spectrum (plans/metrics.py:
    knn_degree_correlation) — the per-degree-class curve behind the
    degree_assortativity scalar; exact-integer class means."""
    from metis_spark.plans.metrics import knn_degree_correlation

    return knn_degree_correlation(derived_edges_sparse(spark, sf_dir))

def _q_core_strength(spark, sf_dir):
    """Core strength / resilience (plans/coreness.py:core_strength):
    which vertices' core numbers rest on minimum support — composed on
    the coreness fixpoint with one extra neighbour-count pass."""
    from metis_spark.plans.coreness import core_strength, coreness

    edges = derived_edges_sparse(spark, sf_dir)
    cores, info = coreness(
        edges,
        checkpoint_dir=_tmpdir("metis_qcstrength_"),
        checkpoint_every=5,
        retain=2,
    )
    assert info["converged"], info
    return core_strength(edges, cores)

def _q_randic_index(spark, sf_dir):
    """Randić connectivity index / GCN normalized-mass ratio
    (plans/metrics.py:randic_index) — per-edge 1/sqrt(d_u d_v)
    micro-quantized before the exact integer sum."""
    from metis_spark.plans.metrics import randic_index

    return randic_index(derived_edges_sparse(spark, sf_dir))

def _q_degree_powerlaw_fit(spark, sf_dir):
    """Clauset-Shalizi-Newman continuous-MLE power-law exponent +
    degree-histogram entropy (plans/metrics.py:degree_powerlaw_fit) —
    the tail-heaviness dial behind salting decisions."""
    from metis_spark.plans.metrics import degree_powerlaw_fit

    return degree_powerlaw_fit(derived_edges_sparse(spark, sf_dir))

def _q_triangle_delta_insert(spark, sf_dir):
    """Incremental triangle maintenance (plans/triangles.py:
    triangle_delta_on_insert): a deterministic 1/TRI_INS_MOD slice of
    the canonical edges plays the insert batch; each edge's delta is
    its common-neighbour count in the remaining base graph."""
    from metis_spark.driver.common import TRI_INS_MOD
    from metis_spark.plans.triangles import triangle_delta_on_insert

    e0 = derived_edges_sparse(spark, sf_dir).select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    )
    und = (
        e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    canon = und.where(F.col("src") < F.col("dst"))
    sel = (F.col("src") * 31 + F.col("dst")) % TRI_INS_MOD == 0
    inserts = canon.where(sel)
    base_canon = canon.where(~sel)
    base_und = base_canon.unionByName(
        base_canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return triangle_delta_on_insert(base_und, inserts)

def _q_graph_h_index(spark, sf_dir):
    """Hirsch index of the degree sequence (plans/metrics.py:
    graph_h_index) — closed-form from the degree histogram; the
    scalar the coreness h-iteration starts from."""
    from metis_spark.plans.metrics import graph_h_index

    return graph_h_index(derived_edges_sparse(spark, sf_dir))

def _q_community_size_fit(spark, sf_dir):
    """CSN power-law fit + entropy of the Louvain level-1 community
    SIZE distribution (plans/metrics.py:powerlaw_profile on the
    louvain_local_moving labels) — real modular structure shows
    heavy-tailed community sizes (alpha ~ 2-3); a near-uniform size
    histogram (high entropy, huge alpha) says the partition is
    slicing noise, the distributional companion to
    community_modularity's single score."""
    from metis_spark.plans.louvain import louvain_local_moving
    from metis_spark.plans.metrics import powerlaw_profile

    labels, _ = louvain_local_moving(
        derived_edges_sparse(spark, sf_dir),
        rounds=LOUVAIN_ROUNDS,
        checkpoint_dir=_tmpdir("metis_qcsfit_"),
    )
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    return powerlaw_profile(sizes)

def _q_edge_hygiene_audit(spark, sf_dir):
    """Ingest hygiene card for the derived edge table → one row
    (n_raw, n_self_loops, n_dup_directed, n_distinct, n_sources_only,
    n_sinks_only, reciprocity_micro): what the edge-extraction
    pipeline silently normalizes away — self-loops and duplicate
    directed pairs dropped by the canonical view, pure-source /
    pure-sink vertex counts (the dangling set PageRank redistributes),
    and the share of directed pairs that are mutual. The audit a data
    engineer reads BEFORE trusting any downstream graph number.

    All integers; reciprocity is one integer division. Every count is
    a 1-row aggregate crossJoin-broadcast back together — no driver
    collects, one composable plan."""
    raw = derived_edges(spark, sf_dir).select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    )
    base = raw.agg(
        F.count(F.lit(1)).cast("long").alias("n_raw"),
        F.sum((F.col("src") == F.col("dst")).cast("long")).cast("long").alias("n_self_loops"),
    )
    dedup = raw.where(F.col("src") != F.col("dst")).distinct()
    nd = dedup.agg(F.count(F.lit(1)).cast("long").alias("n_distinct"))
    rev = dedup.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    nm = dedup.intersect(rev).agg(F.count(F.lit(1)).cast("long").alias("n_mutual"))
    srcs = dedup.select(F.col("src").alias("id")).distinct()
    dsts = dedup.select(F.col("dst").alias("id")).distinct()
    nso = srcs.exceptAll(dsts).agg(F.count(F.lit(1)).cast("long").alias("n_sources_only"))
    nsi = dsts.exceptAll(srcs).agg(F.count(F.lit(1)).cast("long").alias("n_sinks_only"))
    return (
        base.crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(nm))
        .crossJoin(F.broadcast(nso))
        .crossJoin(F.broadcast(nsi))
        .select(
            "n_raw",
            "n_self_loops",
            (F.col("n_raw") - F.col("n_self_loops") - F.col("n_distinct"))
            .cast("long").alias("n_dup_directed"),
            "n_distinct",
            "n_sources_only",
            "n_sinks_only",
            F.when(
                F.col("n_distinct") > 0,
                F.expr("(1000000 * n_mutual) div n_distinct"),
            ).otherwise(F.lit(0)).cast("long").alias("reciprocity_micro"),
        )
    )

def _q_bridging_coefficient(spark, sf_dir):
    """Hwang bridging coefficient top-50 (plans/metrics.py:
    bridging_coefficient_topk) — the thin-waist detector; all-integer
    scoring, zero doubles."""
    from metis_spark.plans.metrics import bridging_coefficient_topk

    return bridging_coefficient_topk(derived_edges_sparse(spark, sf_dir), k=50)

def _q_coreness_profile(spark, sf_dir):
    """Core-decomposition profile → one row per core value (core,
    n_vertices, n_cum_ge, deg_core_corr_micro): the size of each
    k-shell, the cumulative ≥-k core sizes (the curve behind "which
    k keeps X% of the graph" curation cuts), and — broadcast onto
    every row — the exact Pearson correlation between degree and core
    number (how safe degree is as a cheap coreness proxy: high corr
    ⇒ degree-threshold prefiltering approximates the k-core cut).

    Exactness: Pearson moments are exact decimal integers (the
    event_type_correlation discipline); the cumulative window runs
    over distinct CORE values only (histogram-bounded, the
    degree_gini invariant)."""
    from metis_spark.plans.coreness import coreness

    edges = derived_edges_sparse(spark, sf_dir)
    cores, info = coreness(
        edges,
        checkpoint_dir=_tmpdir("metis_qcprof_"),
        checkpoint_every=5,
        retain=2,
    )
    assert info["converged"], info
    e0 = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        e0.unionByName(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    joined = cores.join(deg.hint("shuffle_hash"), "id")
    dec = "decimal(38,0)"
    mom = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("deg").cast(dec).alias("sx"),
        F.sum("core").cast(dec).alias("sy"),
        F.sum(F.col("deg").cast(dec) * F.col("deg")).alias("sxx"),
        F.sum(F.col("core").cast(dec) * F.col("core")).alias("syy"),
        F.sum(F.col("deg").cast(dec) * F.col("core")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = mom.select(
        F.when(
            (vx > 0) & (vy > 0),
            F.round(
                num.cast("double") / F.sqrt(vx.cast("double") * vy.cast("double"))
                * F.lit(1e6)
            ).cast("long"),
        ).alias("deg_core_corr_micro")
    )
    hist = cores.groupBy("core").agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
    w = Window.orderBy(F.desc("core")).rowsBetween(Window.unboundedPreceding, 0)
    prof = hist.select(
        "core", "n_vertices", F.sum("n_vertices").over(w).cast("long").alias("n_cum_ge")
    )
    return prof.crossJoin(F.broadcast(corr)).select(
        "core", "n_vertices", "n_cum_ge", "deg_core_corr_micro"
    )

def _q_square_surplus(spark, sf_dir):
    """4-cycle significance → one row (squares, s1, s2, null_micro,
    surplus_micro): observed C4 (the hub-capped square_count plan)
    against the configuration-model expectation E[#C4] → λ⁴/8 with
    λ = (S₂−S₁)/S₁ (Bollobás' cycle-count limit — the same
    analytic-null discipline as triangle_surplus and
    rich_club_normalized, two motifs up). surplus ≫ 1 means square
    structure beyond what the degree sequence forces — bipartite-ish
    cores and co-citation patterns; the hub cap biases OBSERVED
    downward and is declared (same cap both engines).

    Exactness: ZERO doubles — both ratios are exact integer divisions
    of decimal(38,0) products ((S₂−S₁)⁴ and 8·S₁⁴ stay under 38
    digits at any bench scale)."""
    from metis_spark.plans.metrics import _und, _und_degrees, square_count

    edges = derived_edges_sparse(spark, sf_dir)
    sq = square_count(edges, hub_cap=HUB_CAP).select("squares")
    deg = _und_degrees(_und(edges))
    dec = "decimal(38,0)"
    mom = deg.agg(
        F.sum("deg").cast(dec).alias("s1"),
        F.sum(F.col("deg").cast(dec) * F.col("deg")).alias("s2"),
    )
    return sq.crossJoin(F.broadcast(mom)).select(
        "squares",
        F.col("s1").cast("long").alias("s1"),
        F.col("s2").cast("long").alias("s2"),
        F.expr(
            "cast((cast(1000000 as decimal(38,0)) * (s2 - s1) * (s2 - s1) "
            "* (s2 - s1) * (s2 - s1)) div (8 * s1 * s1 * s1 * s1) as long)"
        ).alias("null_micro"),
        F.expr(
            "cast((cast(8000000 as decimal(38,0)) * squares * s1 * s1 * s1 * s1) "
            "div ((s2 - s1) * (s2 - s1) * (s2 - s1) * (s2 - s1)) as long)"
        ).alias("surplus_micro"),
    )

def _q_graph_curation_funnel(spark, sf_dir):
    """Link-graph curation funnel → one row per stage (stage,
    n_vertices, n_edges): directed canonical edges → simple
    undirected view → KCORE_K-core → giant component — the graph
    analog of corpus_curation's filter funnel: what each cleaning
    stage of a crawl graph keeps, on the verified k-core and CC
    spines. Edges counted canonically (src < dst) from stage 2 on;
    counts are exact integers."""
    from metis_spark.plans.components import connected_components
    from metis_spark.plans.kcore import k_core

    e = derived_edges_sparse(spark, sf_dir).select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    )
    und = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    canon = und.where(F.col("src") < F.col("dst")).persist()
    verts = und.select(F.col("src").alias("id")).distinct()

    s1 = e.agg(
        F.lit("1_directed").alias("stage"),
        F.count(F.lit(1)).cast("long").alias("n_edges"),
    ).crossJoin(
        F.broadcast(verts.agg(F.count(F.lit(1)).cast("long").alias("n_vertices")))
    ).select("stage", "n_vertices", "n_edges")

    s2 = canon.agg(
        F.lit("2_simple_und").alias("stage"),
        F.count(F.lit(1)).cast("long").alias("n_edges"),
    ).crossJoin(
        F.broadcast(verts.agg(F.count(F.lit(1)).cast("long").alias("n_vertices")))
    ).select("stage", "n_vertices", "n_edges")

    core_df, _kinfo = k_core(e, k=KCORE_K)
    core = core_df.select("id").persist()
    core_edges = (
        canon.join(core.select(F.col("id").alias("src")).hint("shuffle_hash"), "src")
        .join(core.select(F.col("id").alias("dst")).hint("shuffle_hash"), "dst")
    )
    s3 = core_edges.agg(
        F.lit("3_core").alias("stage"),
        F.count(F.lit(1)).cast("long").alias("n_edges"),
    ).crossJoin(
        F.broadcast(core.agg(F.count(F.lit(1)).cast("long").alias("n_vertices")))
    ).select("stage", "n_vertices", "n_edges")

    labels, info = connected_components(
        e, max_iter=20, checkpoint_dir=_tmpdir("metis_qfunnel_")
    )
    assert info["converged"], info
    sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    giant = sizes.orderBy(F.desc("sz"), F.asc("component")).limit(1)
    gverts = labels.join(
        F.broadcast(giant.select("component")), "component"
    ).select("id").persist()
    gedges = (
        canon.join(gverts.select(F.col("id").alias("src")).hint("shuffle_hash"), "src")
        .join(gverts.select(F.col("id").alias("dst")).hint("shuffle_hash"), "dst")
    )
    s4 = gedges.agg(
        F.lit("4_giant").alias("stage"),
        F.count(F.lit(1)).cast("long").alias("n_edges"),
    ).crossJoin(
        F.broadcast(gverts.agg(F.count(F.lit(1)).cast("long").alias("n_vertices")))
    ).select("stage", "n_vertices", "n_edges")

    return s1.unionByName(s2).unionByName(s3).unionByName(s4)
