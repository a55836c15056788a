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
    triangle_count,
    triangle_count_per_vertex,
)

from metis_spark.driver.common import CENTER_K, CONTAM_BENCH_MOD, CONTAM_BENCH_REM, CONTAM_K, COOC_CAP, COOC_K, EMB_K, FUNNEL_MIN_QUALITY, FUNNEL_MIN_TOKENS, GRAPH_MOD, HEC_MAXP, HH_MIN_COUNT, HUB_CAP, LINKPRED_K, MATCHING_ORACLE_ROUNDS, MSF_INNER_J, MSF_ORACLE_ROUNDS, N_WALKS, SPARSE_MOD, SPEC_COLOR_ORACLE_ROUNDS, SSSP_ROUNDS, WALK_LEN, WS_K, _landmark_sources, _msf_weight_col, _t, _tmpdir, derived_edges, derived_edges_sparse  # noqa: E501,F401


def _q_asof_fallback(spark, sf_dir):
    """Keyed forward-fill with a SCOPED fallback: a purchase with no prior
    signup for its user anchors to the latest signup in the user's shard
    (user_id % 16 — the engine's analog of the reference's per-file scope).
    No unpartitioned window anywhere in the plan."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "shard", (F.col("user_id") % 16).cast("long")
    )
    filled = last_event_fallback(
        ev,
        ["user_id"],
        ["ts", "event_id"],
        F.when(F.col("event_type") == "signup", F.col("event_id")),
        "anchor_event_id",
        fallback_scope_cols=["shard"],
    )
    return filled.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "anchor_event_id"
    )

def _q_anti_join(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_anti").select("o_orderkey")

def _q_running_total(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("running_value")
    )

def _q_graph_degrees(spark, sf_dir):
    return (
        derived_edges(spark, sf_dir)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("out_deg"))
    )

def _q_edge_diff(spark, sf_dir):
    """Snapshot audit (operators/edge_maintenance.py edge_diff): the
    symmetric difference between the edge tables two corpus snapshots
    derive — here two deterministic lineitem slices (even line numbers
    vs quantity ≤ 40) standing in for crawl T and crawl T+1."""
    from metis_spark.operators.edge_maintenance import edge_diff

    li = _t(spark, sf_dir, "lineitem")

    def snap(cond):
        return (
            li.where(cond)
            .select(
                (F.col("l_orderkey") % GRAPH_MOD).alias("src"),
                (F.col("l_partkey") % GRAPH_MOD).alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )

    old = snap(F.col("l_linenumber") % 2 == 0)
    new = snap(F.col("l_quantity") <= 40)
    return edge_diff(old, new)

def _q_center(spark, sf_dir):
    """Landmark graph-center estimate: the 5 vertices minimizing the
    eccentricity lower bound max_s d(s, v) over the 3 landmarks
    (plans/sssp.py:center_landmarks); only fully-reached vertices
    compete, ties by id."""
    from metis_spark.plans.sssp import center_landmarks

    edges = derived_edges(spark, sf_dir)
    return center_landmarks(
        edges, _landmark_sources(spark, sf_dir), k=CENTER_K,
        checkpoint_dir=_tmpdir("metis_qcenter_"), max_iter=SSSP_ROUNDS,
    )

def _q_random_walks(spark, sf_dir):
    """Deterministic random-walk corpus (plans/walks.py): one walk from
    each of the 64 smallest vertices, next hop = arg-min of an arithmetic
    hash over out-neighbors — replayable DeepWalk-style sampling for
    graph-to-training-data pipelines."""
    from metis_spark.plans.walks import random_walks

    edges = derived_edges(spark, sf_dir)
    starts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .orderBy("id")
        .limit(N_WALKS)
    )
    return random_walks(edges, starts, length=WALK_LEN)

def _q_walk_sentences(spark, sf_dir):
    """Walk corpus rendered as skip-gram training sentences: space-joined
    vertex ids per walk (plans/walks.py:walk_sentences)."""
    from metis_spark.plans.walks import random_walks, walk_sentences

    edges = derived_edges(spark, sf_dir)
    starts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .orderBy("id")
        .limit(N_WALKS)
    )
    return walk_sentences(random_walks(edges, starts, length=WALK_LEN))

def _q_weighted_sample(spark, sf_dir):
    """Deterministic Efraimidis–Spirakis weighted sample (top-100 by
    ln(u)/w priority, w = doc length) — inclusion ∝ n_chars,
    reproducible across engines/cluster sizes
    (operators/sampling.py:weighted_sample_topk)."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "w", F.greatest(F.col("n_chars"), F.lit(1))
    )
    return SAMP.weighted_sample_topk(docs, "doc_id", "w", k=WS_K)

def _q_heavy_hitter_users(spark, sf_dir):
    """Exact heavy hitters via the candidate-pruned two-pass plan
    (operators/sketches.py): per-partition Arrow counting emits provably
    complete candidates; only candidates are shuffled and recounted.
    Output is exact, so the plain GROUP BY/HAVING oracle pins it."""
    from metis_spark.operators.sketches import exact_heavy_hitters

    events = _t(spark, sf_dir, "events")
    return exact_heavy_hitters(events, "user_id", HH_MIN_COUNT)

def _q_global_hh_sketch(spark, sf_dir):
    """Global heavy hitters through the MISRA-GRIES candidate path
    (operators/sketches.py sketch_heavy_hitters): per-partition ≤ k
    mergeable summaries bound the candidate set at P·k rows regardless
    of skew shape, then the exact broadcast recount removes false
    positives. k is sized so the sketch's ε·N undercount is strictly
    below the threshold — no false negatives — so the output is exactly
    GROUP BY/HAVING and the plain oracle pins the whole sketch path."""
    from metis_spark.operators.sketches import sketch_heavy_hitters

    events = _t(spark, sf_dir, "events")
    return sketch_heavy_hitters(events, "user_id", HH_MIN_COUNT)

def _q_dataset_splits(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment — documents never
    migrate between splits as the corpus grows (operators/sampling.py)."""
    docs = _t(spark, sf_dir, "documents")
    out = SAMP.split_assign(
        docs, "doc_id", [("train", 80), ("val", 10), ("test", 10)]
    )
    return out.select("doc_id", "lang", "split")

def _q_benchmark_contamination(spark, sf_dir):
    """Train/eval n-gram decontamination audit
    (operators/corpus_stats.py benchmark_contamination): fraction of each
    non-benchmark document's distinct 5-grams that appear in the
    benchmark slice — broadcast-semi shape, the corpus side never
    shuffles except the final per-doc groupBy."""
    docs = _t(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % CONTAM_BENCH_MOD == CONTAM_BENCH_REM
    return CS.benchmark_contamination(
        docs.where(~is_bench), docs.where(is_bench), k=CONTAM_K
    )

def _q_filter_funnel(spark, sf_dir):
    """Quality-filter funnel: ordered stages (too_short → low_quality →
    exact_dup), each applied to the previous stage's survivors — the
    drop-off audit every corpus-curation run reports. Stage flags are
    per-row expressions; the dup stage is one window over the
    fingerprints of stage-2 survivors (min-doc_id representative kept).
    Output: one row per stage with docs dropped there + running
    survivors, all integers."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        TX.whitespace_token_count(F.col("text")).alias("n_tok"),
        F.round(TX.quality_score(F.col("text")), 6).alias("score"),
        TX.fingerprint(F.col("text")).alias("fp"),
    )
    flagged = (
        docs.withColumn("s1", F.col("n_tok") < FUNNEL_MIN_TOKENS)
        .withColumn("s2", ~F.col("s1") & (F.col("score") < FUNNEL_MIN_QUALITY))
        .withColumn("keep12", ~F.col("s1") & ~F.col("s2"))
    )
    # rank only stage-1/2 survivors within each fingerprint: survivors
    # sort first, so a survivor's row_number counts prior survivors only
    w = Window.partitionBy("fp").orderBy(F.desc("keep12"), F.asc("doc_id"))
    staged = (
        flagged.withColumn(
            "rn", F.when(F.col("keep12"), F.row_number().over(w))
        )
        .select(
            F.when(F.col("s1"), F.lit(1))
            .when(F.col("s2"), F.lit(2))
            .when(F.col("rn") > 1, F.lit(3))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("stage")
        )
    )
    counts = {
        int(r["stage"]): int(r["n"])
        for r in staged.groupBy("stage").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(counts.values())
    rows, surviving = [], total
    for stage, name in ((1, "too_short"), (2, "low_quality"), (3, "exact_dup")):
        dropped = counts.get(stage, 0)
        surviving -= dropped
        rows.append((stage, name, dropped, surviving))
    return spark.createDataFrame(
        rows, "stage long, stage_name string, dropped long, surviving long"
    )

def _q_local_clustering(spark, sf_dir):
    return local_clustering(derived_edges_sparse(spark, sf_dir))

def _q_vertex_jaccard(spark, sf_dir):
    return vertex_jaccard_topk(
        derived_edges_sparse(spark, sf_dir), k=LINKPRED_K, hub_cap=HUB_CAP
    )

def _q_attr_assortativity(spark, sf_dir):
    """Newman's nominal assortativity (homophily coefficient) on the
    sparse graph with brand labels from the part dimension — "do parts
    of the same brand co-purchase?" (plans/metrics.py:
    attribute_assortativity). Vertex label = MIN(p_brand) over the parts
    folding onto the vertex id (deterministic), 'none' for pure
    order-side vertices. Integer-exact mixing-matrix identity; the one
    float is the final division."""
    from metis_spark.plans.metrics import attribute_assortativity

    edges = derived_edges_sparse(spark, sf_dir)
    part = _t(spark, sf_dir, "part")
    labels = (
        part.select(
            (F.col("p_partkey") % SPARSE_MOD).alias("id"), F.col("p_brand").alias("lab")
        )
        .groupBy("id")
        .agg(F.min("lab").alias("lab"))
    )
    return attribute_assortativity(edges, labels)

def _q_edge_embeddedness(spark, sf_dir):
    """Top-100 edges by embeddedness |N(a) ∩ N(b)| with neighborhood
    Jaccard (plans/metrics.py:edge_embeddedness) — the tie-strength /
    strong-triadic-closure signal; all-integer ranking key."""
    from metis_spark.plans.metrics import edge_embeddedness

    return edge_embeddedness(derived_edges_sparse(spark, sf_dir), k=EMB_K)

def _q_forman_curvature(spark, sf_dir):
    """Bottom-100 edges by augmented Forman-Ricci curvature
    4 − deg(a) − deg(b) + 3·support (plans/metrics.py:forman_curvature)
    — the all-integer network-geometry community-boundary signal."""
    from metis_spark.plans.metrics import forman_curvature

    return forman_curvature(derived_edges_sparse(spark, sf_dir), k=EMB_K)

def _q_structural_holes(spark, sf_dir):
    """Burt structural-hole profile — effective size / efficiency /
    constraint per vertex (plans/metrics.py:structural_holes); q- and
    j-sums integer-quantized so both engines fold identically."""
    from metis_spark.plans.metrics import structural_holes

    return structural_holes(derived_edges_sparse(spark, sf_dir), hub_cap=HUB_CAP)

def _q_ari_partitions(spark, sf_dir):
    """Adjusted Rand Index between the Louvain level-1 and LPA
    partitions of the sparse graph (plans/metrics.py:
    partition_agreement) — the chance-corrected clustering-agreement
    evaluation; both partitions recomputed fresh on the same vertex
    set with the engines' pinned round counts."""
    from metis_spark.plans.lpa import label_propagation
    from metis_spark.plans.louvain import louvain_local_moving
    from metis_spark.plans.metrics import partition_agreement
    from metis_spark.driver.common import LOUVAIN_ROUNDS, LPA_ROUNDS

    edges = derived_edges_sparse(spark, sf_dir)
    lou, _ = louvain_local_moving(
        edges, rounds=LOUVAIN_ROUNDS, checkpoint_dir=_tmpdir("metis_qari_lou_")
    )
    lpa, _ = label_propagation(
        edges,
        checkpoint_dir=_tmpdir("metis_qari_lpa_"),
        max_iter=LPA_ROUNDS,
        stop_when_stable=False,
    )
    return partition_agreement(lou, lpa)

def _q_pref_attach(spark, sf_dir):
    """Preferential-attachment predictor over non-adjacent 2-hop pairs
    (full degrees; wedge cap bounds candidate generation only)."""
    from metis_spark.plans.metrics import preferential_attachment_topk

    return preferential_attachment_topk(
        derived_edges_sparse(spark, sf_dir), k=LINKPRED_K, hub_cap=HUB_CAP
    )

def _q_copart_topk(spark, sf_dir):
    """Top-50 part pairs co-occurring in orders — the bipartite projection
    a recommender/co-import analysis starts from
    (operators/corpus_stats.py:cooccurrence_topk, capped wedge join)."""
    li = _t(spark, sf_dir, "lineitem")
    return CS.cooccurrence_topk(
        li, "l_orderkey", "l_partkey", k=COOC_K, group_cap=COOC_CAP
    )

def _q_spec_coloring(spark, sf_dir):
    """Trial-and-revoke Δ+1 coloring (plans/coloring.py
    speculative_coloring) on the FULL sparse graph — the O(log n)-round
    scale path (measured 3-4 rounds at every sf where Jones–Plassmann
    needs 9/79/>200): speculate a palette color by round-salted hash,
    revoke the larger-hash side of same-color edges."""
    from metis_spark.plans.coloring import speculative_coloring

    out, info = speculative_coloring(
        derived_edges_sparse(spark, sf_dir),
        checkpoint_dir=_tmpdir("metis_qspeccolor_"),
        checkpoint_every=5,
        retain=2,
    )
    assert info["converged"] and info["iterations"] <= SPEC_COLOR_ORACLE_ROUNDS, info
    return out

def _q_msf(spark, sf_dir):
    """Minimum spanning forest by distributed Borůvka rounds
    (plans/mst.py): per-fragment min-edge selection under the total
    order (weight, s, d) + hash-min quotient contraction. Hash-derived
    distinct weights make the MSF unique, so the unrolled oracle
    hash-matches regardless of contraction implementation."""
    from metis_spark.plans.mst import minimum_spanning_forest

    weighted = derived_edges_sparse(spark, sf_dir).select(
        "src", "dst", _msf_weight_col().alias("weight")
    )
    msf, info = minimum_spanning_forest(
        weighted, checkpoint_dir=_tmpdir("metis_qmsf_"),
        checkpoint_every=2, retain=2,
    )
    assert (
        info["converged"]
        and info["rounds"] <= MSF_ORACLE_ROUNDS
        and info["inner_steps_max"] <= MSF_INNER_J
    ), info
    return msf

def _q_maximal_matching(spark, sf_dir):
    """Maximal matching (plans/matching.py): deterministic locally-
    dominant (mutual-minimum) edge rounds under the strict (hash, s, d)
    priority order — equals THE sequential greedy matching for that
    order, so the unrolled oracle hash-matches any converged run."""
    from metis_spark.plans.matching import maximal_matching

    out, info = maximal_matching(
        derived_edges_sparse(spark, sf_dir),
        checkpoint_dir=_tmpdir("metis_qmatching_"),
        checkpoint_every=5,
        retain=2,
    )
    assert info["converged"] and info["iterations"] <= MATCHING_ORACLE_ROUNDS, info
    return out

def _q_heavy_edge_coarsen(spark, sf_dir):
    """One METIS-style multilevel-coarsening step: maximal matching
    under MAX-weight-first priority (heavy-edge matching — the same
    locally-dominant rounds with inverted priority), then contract each
    matched pair to its min vertex and aggregate the weighted quotient
    graph → (qa, qb, total_w, n_edges). The coarse graph a multilevel
    partitioner/Louvain feeds forward."""
    from metis_spark.plans.matching import maximal_matching

    weighted = derived_edges_sparse(spark, sf_dir).select(
        "src", "dst", _msf_weight_col().alias("weight")
    )
    prio = weighted.withColumn("p", F.lit(HEC_MAXP) - F.col("weight"))
    match, info = maximal_matching(
        prio, priority_col="p",
        checkpoint_dir=_tmpdir("metis_qhec_"),
    )
    assert info["converged"] and info["iterations"] <= MATCHING_ORACLE_ROUNDS, info
    # label: matched vertices -> min of the pair; others -> self
    lab = match.select(F.col("src").alias("id"), F.col("src").alias("lab")).unionByName(
        match.select(F.col("dst").alias("id"), F.col("src").alias("lab"))
    )
    ce = weighted.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"),
        "weight",
    ).where(F.col("a") != F.col("b")).groupBy("a", "b").agg(
        F.min("weight").alias("w")
    )
    rel = (
        ce.join(lab.select(F.col("id").alias("a"), F.col("lab").alias("la")), "a", "left")
        .join(lab.select(F.col("id").alias("b"), F.col("lab").alias("lb")), "b", "left")
        .select(
            F.coalesce("la", F.col("a")).alias("ca"),
            F.coalesce("lb", F.col("b")).alias("cb"),
            "w",
        )
        .where(F.col("ca") != F.col("cb"))
    )
    return (
        rel.select(
            F.least("ca", "cb").alias("qa"), F.greatest("ca", "cb").alias("qb"), "w"
        )
        .groupBy("qa", "qb")
        .agg(
            # decimal BEFORE the sum: 60-bit weights overflow BIGINT after
            # ~8 rows under ANSI; HUGEINT/decimal renders as plain digits
            F.sum(F.col("w").cast("decimal(38,0)")).cast("string").alias("total_w"),
            F.count(F.lit(1)).cast("long").alias("n_edges"),
        )
    )


def _q_label_mixing_matrix(spark, sf_dir):
    """The brand mixing matrix behind attribute_assortativity: directed-
    symmetric pair counts per (label_a, label_b) with the share of all
    pairs — the per-cell detail the homophily scalar summarizes (which
    brand pairs actually co-purchase). All-integer counts, one
    map-side-combined groupBy over broadcast label joins; pct is one
    rounded division per cell."""
    edges = derived_edges_sparse(spark, sf_dir)
    part = _t(spark, sf_dir, "part")
    labels = (
        part.select(
            (F.col("p_partkey") % SPARSE_MOD).alias("id"), F.col("p_brand").alias("lab")
        )
        .groupBy("id")
        .agg(F.min("lab").alias("lab"))
    )
    fwd = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    la = labels.select(F.col("id").alias("src"), F.col("lab").alias("la"))
    lb = labels.select(F.col("id").alias("dst"), F.col("lab").alias("lb"))
    mix = (
        und.join(F.broadcast(la), "src", "left")
        .join(F.broadcast(lb), "dst", "left")
        .select(
            F.coalesce("la", F.lit("none")).alias("label_a"),
            F.coalesce("lb", F.lit("none")).alias("label_b"),
        )
        .groupBy("label_a", "label_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    total = und.count()
    return mix.select(
        "label_a", "label_b", "n", F.round(F.col("n") / F.lit(total), 6).alias("pct")
    )

def _q_cocitation(spark, sf_dir):
    """Co-citation + bibliographic coupling top-k
    (plans/metrics.py:cocitation_coupling_topk) on the sparse directed
    graph — the two classic directed link-similarities (Small 1973 /
    Kessler 1963): co-cited = substitutable providers, coupled =
    same-stack consumers."""
    from metis_spark.driver.common import COCIT_CAP, COCIT_K
    from metis_spark.plans.metrics import cocitation_coupling_topk

    edges = derived_edges_sparse(spark, sf_dir)
    return cocitation_coupling_topk(edges, k=COCIT_K, hub_cap=COCIT_CAP)

def _q_refex(spark, sf_dir):
    """ReFeX recursive structural features (plans/metrics.py:
    refex_features, Henderson et al. KDD'11) on the sparse graph —
    integer (sum, max) neighbor aggregations of degree, 2 rounds."""
    from metis_spark.plans.metrics import refex_features

    return refex_features(derived_edges_sparse(spark, sf_dir), rounds=2)

def _q_mirrors(spark, sf_dir):
    """Structural mirror detection (plans/metrics.py:vertex_mirror_topk)
    on the mod-512 directed graph — MinHash-LSH over OUT-neighborhoods,
    exact-Jaccard-verified candidates, the link-farm mirror signal."""
    from metis_spark.driver.common import MIRROR_BANDS, MIRROR_HASHES, MIRROR_K, WING_MOD
    from metis_spark.plans.metrics import vertex_mirror_topk

    li = _t(spark, sf_dir, "lineitem")
    edges = (
        li.select(
            (F.col("l_orderkey") % WING_MOD).alias("src"),
            (F.col("l_partkey") % WING_MOD).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return vertex_mirror_topk(
        edges, k=MIRROR_K, num_hashes=MIRROR_HASHES, bands=MIRROR_BANDS
    )

def _q_collective_influence(spark, sf_dir):
    """Collective influence at radius 2 (Morone & Makse, Nature 2015) —
    the optimal-percolation influencer ranking CI_2(v) = (deg−1)·Σ
    (deg−1) over the exact-distance-2 ring (plans/metrics.py:
    collective_influence); capped wedge candidates, all-integer scores."""
    from metis_spark.plans.metrics import collective_influence
    from metis_spark.driver.common import CI_K, HUB_CAP

    return collective_influence(
        derived_edges_sparse(spark, sf_dir), k=CI_K, hub_cap=HUB_CAP
    )

def _q_degree_discount(spark, sf_dir):
    """Degree-discount IC seed set (Chen et al. KDD'09) at p = 0.1
    (plans/metrics.py:degree_discount_seeds) — integer-tenths gains,
    k broadcast-filtered rounds, driver holds k rows."""
    from metis_spark.plans.metrics import degree_discount_seeds
    from metis_spark.driver.common import DDIC_K, DDIC_P_TENTHS

    return degree_discount_seeds(
        derived_edges_sparse(spark, sf_dir), k=DDIC_K, p_tenths=DDIC_P_TENTHS
    )

def _q_disparity(spark, sf_dir):
    """Serrano disparity-filter backbone (PNAS 2009) at alpha = 0.05
    (plans/metrics.py:disparity_filter) — micro-quantized per-edge
    significance from both endpoints, degree-1 null untestable."""
    from metis_spark.plans.metrics import disparity_filter
    from metis_spark.driver.common import DISPARITY_ALPHA_MICRO

    return disparity_filter(
        derived_edges_sparse(spark, sf_dir), alpha_micro=DISPARITY_ALPHA_MICRO
    )

def _q_nmi_partitions(spark, sf_dir):
    """Normalized mutual information between the Louvain level-1 and
    LPA partitions (plans/metrics.py:partition_nmi) — the information-
    theoretic twin of ari_partitions on the same two clusterings."""
    from metis_spark.plans.lpa import label_propagation
    from metis_spark.plans.louvain import louvain_local_moving
    from metis_spark.plans.metrics import partition_nmi
    from metis_spark.driver.common import LOUVAIN_ROUNDS, LPA_ROUNDS

    edges = derived_edges_sparse(spark, sf_dir)
    lou, _ = louvain_local_moving(
        edges, rounds=LOUVAIN_ROUNDS, checkpoint_dir=_tmpdir("metis_qnmi_lou_")
    )
    lpa, _ = label_propagation(
        edges,
        checkpoint_dir=_tmpdir("metis_qnmi_lpa_"),
        max_iter=LPA_ROUNDS,
        stop_when_stable=False,
    )
    return partition_nmi(lou, lpa)

def _q_local_bridges(spark, sf_dir):
    """Local bridges with span lower bound (plans/metrics.py:
    local_bridges) — Granovetter weak ties: edges with zero
    embeddedness plus a one-level span resolution (3 vs ≥4)."""
    from metis_spark.plans.metrics import local_bridges

    return local_bridges(derived_edges_sparse(spark, sf_dir))

def _q_edge_dispersion(spark, sf_dir):
    """Backstrom–Kleinberg absolute dispersion per edge
    (plans/metrics.py:edge_dispersion) — the tie-strength signal that
    separates bridging edges from embedded ones."""
    from metis_spark.plans.metrics import edge_dispersion

    return edge_dispersion(derived_edges_sparse(spark, sf_dir))

def _q_vi_partitions(spark, sf_dir):
    """Variation of Information between the Louvain level-1 and LPA
    partitions (plans/metrics.py:partition_vi) — the metric-space
    member of the ARI/NMI/VI agreement trio, on the same clusterings."""
    from metis_spark.plans.lpa import label_propagation
    from metis_spark.plans.louvain import louvain_local_moving
    from metis_spark.plans.metrics import partition_vi
    from metis_spark.driver.common import LOUVAIN_ROUNDS, LPA_ROUNDS

    edges = derived_edges_sparse(spark, sf_dir)
    lou, _ = louvain_local_moving(
        edges, rounds=LOUVAIN_ROUNDS, checkpoint_dir=_tmpdir("metis_qvi_lou_")
    )
    lpa, _ = label_propagation(
        edges,
        checkpoint_dir=_tmpdir("metis_qvi_lpa_"),
        max_iter=LPA_ROUNDS,
        stop_when_stable=False,
    )
    return partition_vi(lou, lpa)

def _q_degree_drift_ks(spark, sf_dir):
    """Structural drift between crawl snapshots → one row (n1, n2,
    ks_micro, d_at): the exact Kolmogorov–Smirnov distance between
    the undirected DEGREE DISTRIBUTIONS of the two deterministic
    snapshot slices edge_snapshot_diff audits — edge churn
    (edge_snapshot_diff) says WHICH edges moved; this says whether
    the SHAPE of the graph moved (a large KS with small churn means
    the changes concentrated on hubs — PSI's graph sibling).

    Exactness: CDFs compare on the common denominator n₁·n₂, so
    max|F₁−F₂| is an exact integer max over the union of distinct
    degree values (histogram-bounded windows only); one integer
    division to micro. d_at = the smallest degree attaining the max."""
    li = _t(spark, sf_dir, "lineitem")

    def snap(cond):
        e = (
            li.where(cond)
            .select(
                (F.col("l_orderkey") % GRAPH_MOD).alias("src"),
                (F.col("l_partkey") % GRAPH_MOD).alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        und = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
        return und.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))

    d1 = snap(F.col("l_linenumber") % 2 == 0)
    d2 = snap(F.col("l_quantity") <= 40)
    h1 = d1.groupBy("deg").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    h2 = d2.groupBy("deg").agg(F.count(F.lit(1)).cast("long").alias("c2"))
    grid = (
        h1.join(h2, "deg", "full")
        .select(
            "deg",
            F.coalesce("c1", F.lit(0)).cast("long").alias("c1"),
            F.coalesce("c2", F.lit(0)).cast("long").alias("c2"),
        )
    )
    w = Window.orderBy("deg").rowsBetween(Window.unboundedPreceding, 0)
    n1 = d1.agg(F.count(F.lit(1)).cast("long").alias("n1"))
    n2 = d2.agg(F.count(F.lit(1)).cast("long").alias("n2"))
    cum = (
        grid.select(
            "deg",
            F.sum("c1").over(w).cast("long").alias("f1"),
            F.sum("c2").over(w).cast("long").alias("f2"),
        )
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "deg", "n1", "n2",
            F.abs(
                F.col("f1").cast("decimal(38,0)") * F.col("n2")
                - F.col("f2").cast("decimal(38,0)") * F.col("n1")
            ).alias("gap"),
        )
    )
    wr = Window.orderBy(F.desc("gap"), F.asc("deg"))
    return (
        cum.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "n1", "n2",
            F.expr(
                "cast((cast(1000000 as decimal(38,0)) * gap) div (cast(n1 as decimal(38,0)) * n2) as long)"
            ).alias("ks_micro"),
            F.col("deg").cast("long").alias("d_at"),
        )
    )
