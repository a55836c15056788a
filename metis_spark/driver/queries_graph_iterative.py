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

from metis_spark.driver.common import ANF_MASKS, BETW_ROUNDS, N_BETW_SOURCES, _edge_percolation, ANF_ROUNDS, BOWTIE_REACH_ROUNDS, DAG_ROUNDS, DIAM_ROUNDS, GRAPH_MOD, HITS_ITERS, KATZ_ALPHA, KATZ_ITERS, LPA_ROUNDS, PR_CONV_ORACLE_ITERS, PR_CONV_TOL, PR_ITERS, PSALSA_SEED_MOD, SALSA_ITERS, SCC_PHASES, SCC_ROUNDS, SLPA_ROUNDS, SLPA_SEED_MOD, SSSP_ROUNDS, SSSP_W_ROUNDS, SWEEP_ITERS, SWEEP_L, SWEEP_SEED_MOD, TEMPORAL_ORACLE_ROUNDS, TEMPORAL_SEED_MOD, TEMPORAL_TS_MOD, WIDEST_ROUNDS, _W_EXPR, _landmark_sources, _robustness, _t, _tmpdir, derived_edges, derived_edges_sparse  # noqa: E501,F401


def _q_pagerank(spark, sf_dir):
    edges = derived_edges(spark, sf_dir)
    ranks, _ = pagerank(
        edges,
        checkpoint_dir=_tmpdir("metis_qpr_"),
        tol=0.0,  # run exactly PR_ITERS iterations to mirror the unrolled SQL
        max_iter=PR_ITERS,
    )
    return ranks.select("id", F.round("rank", 6).alias("rank"))

def _q_pagerank_incremental(spark, sf_dir):
    """Incremental re-rank after a corpus drain — the full maintenance
    story end-to-end: snapshot T's edge table is patched to snapshot T+1
    by applying the ``edge_diff`` delta (never rebuilt from content), and
    PageRank warm-starts from T's scores (``init_ranks``) instead of
    uniform. The fixpoint is unique, so the result is bit-independent of
    the warm start — the oracle runs a COLD unrolled power iteration on
    the T+1 table and must agree; the warm start only buys iterations
    (asserted below: strictly fewer than the cold oracle budget).
    Mirrors the reference's re-import-then-recompute flow
    (/root/reference/Metis/python/metis_sink.py:163-166) with
    increment-scoped work."""
    from metis_spark.operators.edge_maintenance import edge_diff

    li = _t(spark, sf_dir, "lineitem")
    old = (
        li.where(F.col("l_linenumber") % 2 == 0)
        .select(
            (F.col("l_orderkey") % GRAPH_MOD).alias("src"),
            (F.col("l_partkey") % GRAPH_MOD).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    new = derived_edges(spark, sf_dir)
    diff = edge_diff(old, new)
    removed = diff.where(F.col("change") == "removed").select("src", "dst")
    added = diff.where(F.col("change") == "added").select("src", "dst")
    patched = old.join(removed, ["src", "dst"], "left_anti").unionByName(added)

    # cheap warm-start vector: snapshot T's 5-iteration scores
    ranks_old, _ = pagerank(
        old, checkpoint_dir=_tmpdir("metis_qpri_a_"), tol=0.0, max_iter=PR_ITERS
    )
    ranks, info = pagerank(
        patched,
        checkpoint_dir=_tmpdir("metis_qpri_b_"),
        tol=PR_CONV_TOL,
        max_iter=100,
        init_ranks=ranks_old,
    )
    assert info["converged"], info
    assert info["iterations"] <= PR_CONV_ORACLE_ITERS, info
    return ranks.select("id", F.round("rank", 6).alias("rank"))

def _q_connected_components(spark, sf_dir):
    edges = derived_edges(spark, sf_dir)
    labels, _ = connected_components(
        edges, checkpoint_dir=_tmpdir("metis_qcc_")
    )
    return labels

def _q_robustness_curve(spark, sf_dir):
    """Targeted-attack robustness (Albert/Jeong/Barabási, Nature 2000):
    component structure after removing the top-k highest-degree hubs —
    compare against `robustness_random` (the random-failure control) to
    read the scale-free fragile-to-attack signature."""
    return _robustness(spark, sf_dir, "attack")

def _q_robustness_random(spark, sf_dir):
    """Random-failure control: the same curve with a deterministic
    degree-blind hash-k removal — robust where the attack curve
    fragments."""
    return _robustness(spark, sf_dir, "failure")

def _q_cc_incremental(spark, sf_dir):
    """Incremental CC maintenance (plans/components.py
    connected_components_incremental): snapshot T = the even-(src+dst)
    subset of the derived edges, delta = the rest. Added edges contract
    to their endpoint components, the delta-sized quotient runs ordinary
    star CC, one |V| re-map join composes — no full-graph rescan. The
    min-label fixpoint is unique, so the oracle is the COLD cc on the
    full table: a strict equality check of the incremental path."""
    from metis_spark.plans.components import connected_components_incremental

    new = derived_edges(spark, sf_dir)
    old = new.where((F.col("src") + F.col("dst")) % 2 == 0)
    added = new.join(old, ["src", "dst"], "left_anti")
    base, _ = connected_components(old, checkpoint_dir=_tmpdir("metis_qcci_a_"))
    labels, info = connected_components_incremental(
        base, added, checkpoint_dir=_tmpdir("metis_qcci_b_")
    )
    assert info["converged"], info
    return labels

def _q_seeded_lpa(spark, sf_dir):
    """Semi-supervised label spreading (plans/lpa.py
    seeded_label_propagation): seeds id%97==0 pin label=id, everyone
    else adopts the most frequent non-null neighbour label (smallest-
    label ties); unreached vertices stay NULL."""
    from metis_spark.plans.lpa import seeded_label_propagation

    edges = derived_edges_sparse(spark, sf_dir)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    seeds = verts.where(F.col("id") % SLPA_SEED_MOD == 0).select(
        "id", F.col("id").alias("label")
    )
    labels, info = seeded_label_propagation(
        edges,
        seeds,
        max_iter=SLPA_ROUNDS,
        checkpoint_dir=_tmpdir("metis_qslpa_"),
        stop_when_stable=False,
    )
    assert info["iterations"] == SLPA_ROUNDS, info
    return labels

def _q_lpa(spark, sf_dir):
    edges = derived_edges(spark, sf_dir)
    labels, _ = label_propagation(
        edges,
        checkpoint_dir=_tmpdir("metis_qlpa_"),
        max_iter=LPA_ROUNDS,
        stop_when_stable=False,
    )
    return labels

def _q_sssp(spark, sf_dir):
    from metis_spark.plans.sssp import shortest_hops

    edges = derived_edges(spark, sf_dir)
    src = edges.selectExpr("least(min(src), min(dst)) AS s").collect()[0]["s"]
    dists, _ = shortest_hops(
        edges, sources=[int(src)],
        checkpoint_dir=_tmpdir("metis_qsssp_"),
        max_iter=SSSP_ROUNDS,
    )
    return dists

def _q_sssp_weighted(spark, sf_dir):
    """Weighted single-source shortest paths (Bellman-Ford relaxation on
    the shared checkpoint spine); weights derived deterministically so the
    unrolled-CTE DuckDB twin reproduces them."""
    from metis_spark.plans.sssp import shortest_paths

    edges = derived_edges(spark, sf_dir).withColumn("w", F.expr(_W_EXPR))
    src = edges.selectExpr("least(min(src), min(dst)) AS s").collect()[0]["s"]
    dists, _ = shortest_paths(
        edges, sources=[int(src)],
        checkpoint_dir=_tmpdir("metis_qssspw_"),
        max_iter=SSSP_W_ROUNDS,
        weight_col="w",
    )
    return dists

def _q_widest_path(spark, sf_dir):
    """Maximum-bottleneck (widest) paths from the least vertex
    (plans/sssp.py:widest_paths): the max-min semiring dual of
    sssp_weighted on the identical deterministic weights — integer-exact
    monotone fixpoint, source carries the 2^60 sentinel."""
    from metis_spark.plans.sssp import widest_paths

    edges = derived_edges(spark, sf_dir).withColumn("w", F.expr(_W_EXPR))
    src = edges.selectExpr("least(min(src), min(dst)) AS s").collect()[0]["s"]
    caps, info = widest_paths(
        edges, sources=[int(src)],
        weight_col="w",
        checkpoint_dir=_tmpdir("metis_qwidest_"),
        max_iter=WIDEST_ROUNDS,
    )
    assert info["converged"] and info["iterations"] <= WIDEST_ROUNDS, info
    return caps

def _q_landmark_distances(spark, sf_dir):
    """Per-source BFS from the 3 smallest vertex ids — the landmark
    sketch behind approximate centrality (plans/sssp.py)."""
    from metis_spark.plans.sssp import landmark_distances

    edges = derived_edges(spark, sf_dir)
    dists, _ = landmark_distances(
        edges, _landmark_sources(spark, sf_dir),
        checkpoint_dir=_tmpdir("metis_qlmd_"), max_iter=SSSP_ROUNDS,
    )
    return dists

def _q_harmonic(spark, sf_dir):
    """Landmark harmonic-centrality estimate h(v) = Σ 1/d(s,v)."""
    from metis_spark.plans.sssp import harmonic_landmarks

    edges = derived_edges(spark, sf_dir)
    return harmonic_landmarks(
        edges, _landmark_sources(spark, sf_dir),
        checkpoint_dir=_tmpdir("metis_qharm_"), max_iter=SSSP_ROUNDS,
    )

def _q_closeness(spark, sf_dir):
    """Landmark closeness-centrality estimate c(v) = r/Σd(s,v) with the
    reached-count correction r (plans/sssp.py:closeness_landmarks)."""
    from metis_spark.plans.sssp import closeness_landmarks

    edges = derived_edges(spark, sf_dir)
    return closeness_landmarks(
        edges, _landmark_sources(spark, sf_dir),
        checkpoint_dir=_tmpdir("metis_qclo_"), max_iter=SSSP_ROUNDS,
    )

def _q_ppr_sweep_cut(spark, sf_dir):
    """ACL local community detection (plans/sweep.py): personalized
    PageRank from the deterministic seed set id % 97 == 0 on the
    symmetric sparse graph, degree-normalized sweep order
    (round-before-rank at 9 decimals), conductance of every prefix
    S_1..S_64 via the difference-histogram cut — the only window in the
    plan runs over exactly 64 rows."""
    from metis_spark.plans.sweep import ppr_sweep_cut

    edges = derived_edges_sparse(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .where(F.col("id") % SWEEP_SEED_MOD == 0)
    )
    out, info = ppr_sweep_cut(
        edges,
        seeds,
        n_iters=SWEEP_ITERS,
        sweep_l=SWEEP_L,
        checkpoint_dir=_tmpdir("metis_qsweep_"),
    )
    assert info["best_phi"] <= 1.0 and 1 <= info["best_k"] <= SWEEP_L, info
    return out

def _q_ppr(spark, sf_dir):
    """Personalized PageRank from the deterministic seed set id % 10 == 0.

    Seeds are passed as a DataFrame — the distributed path: the seed set
    never touches the driver, so "rank relative to MY packages" works
    even when MY packages is a 10M-row predicate at 100 TB scale."""
    edges = derived_edges(spark, sf_dir)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    ranks, _ = pagerank(
        edges,
        checkpoint_dir=_tmpdir("metis_qppr_"),
        tol=0.0,
        max_iter=PR_ITERS,
        seeds=verts.where(F.col("id") % 10 == 0),
    )
    return ranks.select("id", F.round("rank", 6).alias("rank"))

def _q_scc(spark, sf_dir):
    """Directed strongly connected components (import cycles) via
    min-label FW-BW phases (plans/scc.py)."""
    from metis_spark.plans.scc import strongly_connected_components

    edges = derived_edges(spark, sf_dir)
    labels, info = strongly_connected_components(
        edges, checkpoint_dir=_tmpdir("metis_qscc_"),
        max_phases=SCC_PHASES, max_rounds=SCC_ROUNDS,
        checkpoint_every=2, retain=2,
    )
    assert info["converged"], info  # else NULL scc rows would shadow an oracle diff
    return labels

def _q_bowtie(spark, sf_dir):
    """Broder bow-tie macro-structure of the directed import graph
    (plans/bowtie.py): CORE / IN / OUT / TUBE / TENDRIL / OTHER /
    DISCONNECTED region sizes, composed from the SCC spine + five
    monotone reach fixpoints."""
    from metis_spark.plans.bowtie import bowtie_decomposition

    out, info = bowtie_decomposition(
        derived_edges(spark, sf_dir),
        max_phases=SCC_PHASES, max_rounds=SCC_ROUNDS,
        reach_rounds=BOWTIE_REACH_ROUNDS,
        checkpoint_dir=_tmpdir("metis_qbowtie_"),
    )
    # strictly less ⇒ every reach hit its fixpoint before the cap, so the
    # fixed-round oracle unroll is complete too
    assert info["reach_rounds_max"] < BOWTIE_REACH_ROUNDS, info
    return out

def _q_dag_levels(spark, sf_dir):
    """Build-order levels of the SCC condensation DAG: level(v) = longest
    path from any root — everything at level k can build once levels < k
    are done (plans/scc.py:condensation_levels)."""
    from metis_spark.plans.scc import (
        condensation_levels,
        strongly_connected_components,
    )

    edges = derived_edges(spark, sf_dir)
    labels, info = strongly_connected_components(
        edges, checkpoint_dir=_tmpdir("metis_qdag_"),
        max_phases=SCC_PHASES, max_rounds=SCC_ROUNDS,
    )
    assert info["converged"], info  # else NULL scc rows would shadow an oracle diff
    return condensation_levels(edges, labels, max_rounds=DAG_ROUNDS)

def _q_katz(spark, sf_dir):
    """Katz centrality, KATZ_ITERS fixed power steps (plans/spectral.py)
    — walk-counting centrality over the directed derived graph."""
    from metis_spark.plans.spectral import katz_centrality

    scores, _ = katz_centrality(
        derived_edges(spark, sf_dir),
        alpha=KATZ_ALPHA,
        beta=1.0,
        tol=0.0,
        max_iter=KATZ_ITERS,
        checkpoint_dir=_tmpdir("metis_qkatz_"),
    )
    return scores.select("id", F.round("katz", 6).alias("katz"))

def _q_eigen(spark, sf_dir):
    """Eigenvector centrality, PR_ITERS normalized power steps over the
    undirected view (plans/spectral.py)."""
    from metis_spark.plans.spectral import eigenvector_centrality

    scores, _ = eigenvector_centrality(
        derived_edges(spark, sf_dir),
        tol=0.0,
        max_iter=PR_ITERS,
        checkpoint_dir=_tmpdir("metis_qeig_"),
    )
    return scores.select("id", F.round("score", 6).alias("score"))

def _q_pagerank_weighted(spark, sf_dir):
    """Weighted PageRank: rank distributes over out-edges proportionally
    to the deterministic per-edge weight (_W_EXPR, shared with
    sssp_weighted so both engines reproduce it)."""
    edges = derived_edges(spark, sf_dir).withColumn("w", F.expr(_W_EXPR))
    ranks, _ = pagerank(
        edges,
        checkpoint_dir=_tmpdir("metis_qprw_"),
        tol=0.0,
        max_iter=PR_ITERS,
        weight_col="w",
    )
    return ranks.select("id", F.round("rank", 6).alias("rank"))

def _q_salsa(spark, sf_dir):
    """SALSA hubs & authorities (plans/salsa.py): HITS with random-walk
    (degree-normalized) transitions — stochastic updates conserve mass,
    so unlike HITS there is no normalization pass at all."""
    from metis_spark.plans.salsa import salsa

    scores, info = salsa(
        derived_edges(spark, sf_dir),
        checkpoint_dir=_tmpdir("metis_qsalsa_"),
        tol=0.0,
        max_iter=SALSA_ITERS,
    )
    assert info["converged"], info
    return scores.select(
        "id", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth")
    )

def _q_salsa_personalized(spark, sf_dir):
    """Personalized SALSA (plans/salsa.py salsa(seeds=)): initial hub
    mass uniform over the SEED hubs only (id % 10 == 0 — the same seed
    rule as ppr_5iter), the WTF-recommender variant; the transition
    operators are unchanged so mass is still conserved."""
    from metis_spark.plans.salsa import salsa

    edges = derived_edges(spark, sf_dir)
    seeds = edges.select(F.col("src").alias("id")).where(
        F.col("id") % PSALSA_SEED_MOD == 0
    )
    scores, info = salsa(
        edges,
        checkpoint_dir=_tmpdir("metis_qpsalsa_"),
        tol=0.0,
        max_iter=SALSA_ITERS,
        seeds=seeds,
    )
    assert info["converged"], info
    return scores.select(
        "id", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth")
    )

def _q_hits(spark, sf_dir):
    """HITS hubs & authorities, fixed 3 iterations, L2-normalized each
    round (plans/hits.py — unrolled-CTE DuckDB twin)."""
    from metis_spark.plans.hits import hits

    edges = derived_edges(spark, sf_dir)
    scores, _ = hits(
        edges,
        checkpoint_dir=_tmpdir("metis_qhits_"),
        tol=0.0,
        max_iter=HITS_ITERS,
    )
    return scores.select(
        "id", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth")
    )

def _q_neighborhood_function(spark, sf_dir):
    """EXACT neighborhood function N(t) on the sparse directed graph
    (plans/anf.py) — the quadratic-state baseline/oracle twin of the
    ANF sketch, same contract as ngram_jaccard_dedup vs MinHash."""
    from metis_spark.plans.anf import neighborhood_function

    return neighborhood_function(
        derived_edges_sparse(spark, sf_dir), rounds=ANF_ROUNDS
    )

def _q_anf_sketch(spark, sf_dir):
    """Flajolet-Martin ANF ball sketches per vertex (plans/anf.py — the
    100 TB path: 256 B/vertex state, one PageRank-shaped join+bit_or
    groupBy per round). md5-seeded masks are reproduced bit-exactly in
    DuckDB, so sum_r hash-matches as an exact integer."""
    from metis_spark.plans.anf import anf_sketch

    return anf_sketch(
        derived_edges_sparse(spark, sf_dir), rounds=ANF_ROUNDS, num_masks=ANF_MASKS
    )

def _q_anf_effective_diameter(spark, sf_dir):
    """Effective diameter (smallest t with N̂(t) ≥ 0.9·N̂(horizon)) off
    the sketch curve — the one-row graph-profile summary a web-graph
    operator actually reads."""
    from metis_spark.plans.anf import effective_diameter

    return effective_diameter(
        derived_edges_sparse(spark, sf_dir), rounds=ANF_ROUNDS, num_masks=ANF_MASKS
    )

def _q_diameter(spark, sf_dir):
    """Double-sweep diameter lower bound of the sparse graph
    (plans/sssp.py): BFS from the max-degree vertex, BFS again from the
    farthest vertex reached — usually the exact diameter on web-shaped
    graphs, always ≥ half of it."""
    from metis_spark.plans.sssp import diameter_double_sweep

    out, info = diameter_double_sweep(
        derived_edges_sparse(spark, sf_dir),
        checkpoint_dir=_tmpdir("metis_qdiam_"),
    )
    assert info["converged"] and info["diameter_lb"] <= DIAM_ROUNDS, info
    return out

def _q_temporal_reachability(spark, sf_dir):
    """Time-respecting earliest-arrival reachability (plans/temporal.py):
    directed sparse edges carry hash-derived timestamps; seeds (id %
    512 == 0) start at t=0; a path may only traverse edges in
    non-decreasing timestamp order. Iterated edge relaxation — the
    monotone least fixpoint, so the fixed-round oracle hash-matches any
    converged run."""
    from metis_spark.plans.temporal import temporal_reachability

    edges = derived_edges_sparse(spark, sf_dir)
    ets = edges.select(
        "src", "dst",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "_",
                            F.lit("t"),
                            F.col("src").cast("string"),
                            F.col("dst").cast("string"),
                        )
                    ),
                    1, 15,
                ),
                16, 10,
            ).cast("long")
            % TEMPORAL_TS_MOD
        ).alias("ts"),
    )
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    seeds = verts.where(F.col("id") % TEMPORAL_SEED_MOD == 0)
    out, info = temporal_reachability(
        ets, seeds, checkpoint_dir=_tmpdir("metis_qtemporal_"),
        checkpoint_every=5, retain=2,
    )
    assert info["converged"] and info["iterations"] <= TEMPORAL_ORACLE_ROUNDS, info
    return out

def _q_temporal_shortest(spark, sf_dir):
    """Minimum-hop time-respecting paths (plans/temporal.py:
    temporal_shortest_path — the Wu et al. "shortest" dual completing
    the quartet): the first earliest-arrival round at which a vertex
    becomes finite IS its minimum hop count, so the operator is the
    reachability loop with one extra first-reached-round column."""
    from metis_spark.plans.temporal import temporal_shortest_path

    edges = derived_edges_sparse(spark, sf_dir)
    ets = edges.select(
        "src", "dst",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "_",
                            F.lit("t"),
                            F.col("src").cast("string"),
                            F.col("dst").cast("string"),
                        )
                    ),
                    1, 15,
                ),
                16, 10,
            ).cast("long")
            % TEMPORAL_TS_MOD
        ).alias("ts"),
    )
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    seeds = verts.where(F.col("id") % TEMPORAL_SEED_MOD == 0)
    out, info = temporal_shortest_path(
        ets, seeds, checkpoint_dir=_tmpdir("metis_qtshort_"),
        checkpoint_every=5, retain=2,
    )
    assert info["converged"] and info["iterations"] <= TEMPORAL_ORACLE_ROUNDS, info
    return out

def _q_temporal_latest_departure(spark, sf_dir):
    """Backward temporal dual (plans/temporal.py:temporal_latest_
    departure): the latest time each vertex can leave and still reach a
    seed time-respectingly — the influence/audience set of the seeds,
    same hash timestamps and seed rule as temporal_reachability."""
    from metis_spark.plans.temporal import temporal_latest_departure

    edges = derived_edges_sparse(spark, sf_dir)
    ets = edges.select(
        "src", "dst",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "_",
                            F.lit("t"),
                            F.col("src").cast("string"),
                            F.col("dst").cast("string"),
                        )
                    ),
                    1, 15,
                ),
                16, 10,
            ).cast("long")
            % TEMPORAL_TS_MOD
        ).alias("ts"),
    )
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    seeds = verts.where(F.col("id") % TEMPORAL_SEED_MOD == 0)
    out, info = temporal_latest_departure(
        ets, seeds, checkpoint_dir=_tmpdir("metis_qtemporal_ld_"),
        checkpoint_every=5, retain=2,
    )
    assert info["converged"] and info["iterations"] <= TEMPORAL_ORACLE_ROUNDS, info
    return out

def _q_temporal_fastest(spark, sf_dir):
    """Temporal FASTEST path (plans/temporal.py:temporal_fastest_path):
    minimum elapsed duration over time-respecting seed paths — the third
    Wu et al. (VLDB 2014) dual next to earliest-arrival and
    latest-departure, same hash timestamps and seed rule. State is each
    vertex's Pareto frontier of (start, arrival) pairs; the converged
    frontier is unique, so the fixed-round unrolled twin hash-matches."""
    from metis_spark.plans.temporal import temporal_fastest_path

    edges = derived_edges_sparse(spark, sf_dir)
    ets = edges.select(
        "src", "dst",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "_",
                            F.lit("t"),
                            F.col("src").cast("string"),
                            F.col("dst").cast("string"),
                        )
                    ),
                    1, 15,
                ),
                16, 10,
            ).cast("long")
            % TEMPORAL_TS_MOD
        ).alias("ts"),
    )
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    seeds = verts.where(F.col("id") % TEMPORAL_SEED_MOD == 0)
    out, info = temporal_fastest_path(
        ets, seeds, checkpoint_dir=_tmpdir("metis_qtemporal_fp_"),
        checkpoint_every=5, retain=2,
    )
    assert info["converged"] and info["iterations"] <= TEMPORAL_ORACLE_ROUNDS, info
    return out


def _q_edge_percolation(spark, sf_dir):
    """Bond-percolation curve (driver/common.py:_edge_percolation):
    deterministic hash-p% edge removal per point, surviving component
    structure with isolated-singleton correction — the edge-failure
    complement to robustness_curve/robustness_random."""
    return _edge_percolation(spark, sf_dir)


def _q_path_counts(spark, sf_dir):
    """Shortest-path multiplicities sigma(s, v) from the 8 landmark
    sources (plans/betweenness.py:shortest_path_counts — the shared
    Brandes forward pass exposed): n_paths = 1 rows have a single point
    of failure on their geodesic."""
    from metis_spark.plans.betweenness import shortest_path_counts

    edges = derived_edges_sparse(spark, sf_dir)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    srcs = [r["id"] for r in verts.orderBy("id").limit(N_BETW_SOURCES).collect()]
    out, info = shortest_path_counts(edges, srcs, max_depth=BETW_ROUNDS + 2)
    assert info["depth"] <= BETW_ROUNDS, info
    return out

def _q_trustrank(spark, sf_dir):
    """TrustRank + spam mass (Gyongyi, Garcia-Molina & Pedersen,
    "Combating Web Spam with TrustRank", VLDB'04): run PageRank twice on
    the verified spine (plans/pagerank.py) — once plain, once with the
    teleport restricted to a deterministic trusted seed set (TrustRank
    IS seeded PageRank) — then spam mass m(v) = (pr - tr)/pr: the
    fraction of v's rank NOT attributable to trusted pages, the classic
    link-farm flag (m -> 1 means every path of support avoids the seed
    set). Both ranks ROUND(.,6) before the division so the DuckDB twin
    replays the arithmetic bit-for-bit; pr >= (1-d)/N > 0 guards the
    division. Two-run cost, shared pre-joined edge side; each run is the
    checkpoint/resume PageRank already measured at scale."""
    from metis_spark.driver.common import TRUST_MOD, TRUST_REM

    edges = derived_edges(spark, sf_dir)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    pr, _ = pagerank(
        edges, checkpoint_dir=_tmpdir("metis_qtrpr_"), tol=0.0, max_iter=PR_ITERS
    )
    tr, _ = pagerank(
        edges,
        checkpoint_dir=_tmpdir("metis_qtrtr_"),
        tol=0.0,
        max_iter=PR_ITERS,
        seeds=verts.where(F.col("id") % TRUST_MOD == TRUST_REM),
    )
    j = pr.select("id", F.round("rank", 6).alias("pr")).join(
        tr.select("id", F.round("rank", 6).alias("tr")), "id"
    )
    return j.select(
        "id", "pr", "tr",
        F.round((F.col("pr") - F.col("tr")) / F.col("pr"), 6).alias("spam_mass"),
    )

def _q_hitting_time(spark, sf_dir):
    """Truncated expected hitting time to the trusted seed set
    (plans/sssp.py:hitting_time_to_seeds, Sarkar & Moore UAI'07
    truncation) — the random-walk distance that weighs ALL paths, the
    diffusion complement to trustrank_spam_mass's rank split."""
    from metis_spark.driver.common import HT_CAP_STEPS, HT_ITERS, HT_MICRO, TRUST_MOD, TRUST_REM
    from metis_spark.plans.sssp import hitting_time_to_seeds

    edges = derived_edges(spark, sf_dir)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    seeds = verts.where(F.col("id") % TRUST_MOD == TRUST_REM)
    return hitting_time_to_seeds(
        edges, seeds, iters=HT_ITERS, cap_steps=HT_CAP_STEPS, micro=HT_MICRO
    )

def _q_harmonic_labels(spark, sf_dir):
    """Harmonic-function two-class node scores (plans/sssp.py:
    harmonic_label_scores, Zhu et al. ICML'03) — trusted seeds positive,
    a disjoint hash class negative; the semi-supervised spam/ham
    classifier on the import graph."""
    from metis_spark.driver.common import HL_ITERS, HL_NEG_REM, HT_MICRO, TRUST_MOD, TRUST_REM
    from metis_spark.plans.sssp import harmonic_label_scores

    edges = derived_edges(spark, sf_dir)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return harmonic_label_scores(
        edges,
        pos_seeds=verts.where(F.col("id") % TRUST_MOD == TRUST_REM),
        neg_seeds=verts.where(F.col("id") % TRUST_MOD == HL_NEG_REM),
        iters=HL_ITERS,
        micro=HT_MICRO,
    )

def _q_leaderrank(spark, sf_dir):
    """LeaderRank (Lü et al. 2011) on the sparse graph: ground-node
    random walk, no damping parameter, ground mass refunded evenly
    (plans/spectral.py:leaderrank); fixed 5 sweeps, oracle-unrolled."""
    from metis_spark.plans.spectral import leaderrank
    from metis_spark.driver.common import LEADERRANK_ITERS

    out, info = leaderrank(
        derived_edges_sparse(spark, sf_dir),
        max_iter=LEADERRANK_ITERS,
        checkpoint_dir=_tmpdir("metis_qlr_"),
    )
    return out.select(
        "id", F.round("score", 6).alias("score"),
        F.round("leaderrank", 6).alias("leaderrank"),
    )

def _q_rank_correlation(spark, sf_dir):
    """Spearman rank agreement between the PageRank and eigenvector-
    centrality rankings on the top-SPEAR_K head (plans/metrics.py:
    centrality_rank_correlation) — both centralities recomputed with
    the gate-pinned round counts and ROUND-6 score discipline."""
    from metis_spark.plans.pagerank import pagerank
    from metis_spark.plans.spectral import eigenvector_centrality
    from metis_spark.plans.metrics import centrality_rank_correlation
    from metis_spark.driver.common import SPEAR_K

    edges = derived_edges(spark, sf_dir)
    pr, _ = pagerank(
        edges, checkpoint_dir=_tmpdir("metis_qrc_pr_"), tol=0.0, max_iter=PR_ITERS
    )
    ei, _ = eigenvector_centrality(
        edges, tol=0.0, max_iter=PR_ITERS, checkpoint_dir=_tmpdir("metis_qrc_ei_")
    )
    pr6 = pr.select("id", F.round("rank", 6).alias("pr"))
    ei6 = ei.select("id", F.round("score", 6).alias("ei"))
    return centrality_rank_correlation(pr6, ei6, "pr", "ei", k=SPEAR_K)

def _q_temporal_pagerank(spark, sf_dir):
    """Epoch-bucketed temporal PageRank (Rozenshtein–Gionis semantics,
    plans/temporal.py:temporal_pagerank) on the hash-timestamped sparse
    edges — influence flows forward in time only; mass-conserving."""
    from metis_spark.plans.temporal import temporal_pagerank
    from metis_spark.driver.common import TPR_BETA, TPR_EPOCHS

    edges = derived_edges_sparse(spark, sf_dir)
    ets = edges.select(
        "src",
        "dst",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "_",
                            F.lit("t"),
                            F.col("src").cast("string"),
                            F.col("dst").cast("string"),
                        )
                    ),
                    1, 15,
                ),
                16, 10,
            ).cast("long")
            % TEMPORAL_TS_MOD
        ).alias("ts"),
    )
    out, info = temporal_pagerank(
        ets,
        n_epochs=TPR_EPOCHS,
        ts_max=TEMPORAL_TS_MOD,
        beta=TPR_BETA,
        checkpoint_dir=_tmpdir("metis_qtpr_"),
    )
    return out.select("id", F.round("rank", 6).alias("rank"))

def _q_eccentricity_bounds(spark, sf_dir):
    """Takes–Kosters per-vertex eccentricity bounds from the landmark
    BFS spine (plans/sssp.py:eccentricity_bounds) — all-integer,
    undirected view, 3 landmarks."""
    from metis_spark.plans.sssp import eccentricity_bounds

    return eccentricity_bounds(
        derived_edges(spark, sf_dir),
        _landmark_sources(spark, sf_dir),
        max_iter=SSSP_ROUNDS,
        checkpoint_dir=_tmpdir("metis_qecc_"),
    )

def _q_temporal_triangles(spark, sf_dir):
    """δ-windowed temporal triangle motifs (plans/temporal.py:
    temporal_triangle_count) on the shared hash-timestamped edges —
    the motif-level summary next to temporal_reachability."""
    from metis_spark.plans.temporal import temporal_triangle_count
    from metis_spark.driver.common import TT_DELTA, temporal_edges_sparse

    return temporal_triangle_count(temporal_edges_sparse(spark, sf_dir), TT_DELTA)

def _q_kendall_rank(spark, sf_dir):
    """Kendall τ between the PageRank and eigenvector rankings on the
    same SPEAR_K head as centrality_rank_corr (plans/metrics.py:
    kendall_rank_correlation) — inverted-pair agreement next to the
    displacement-weighted Spearman."""
    from metis_spark.plans.pagerank import pagerank
    from metis_spark.plans.spectral import eigenvector_centrality
    from metis_spark.plans.metrics import kendall_rank_correlation
    from metis_spark.driver.common import SPEAR_K

    edges = derived_edges(spark, sf_dir)
    pr, _ = pagerank(
        edges, checkpoint_dir=_tmpdir("metis_qkt_pr_"), tol=0.0, max_iter=PR_ITERS
    )
    ei, _ = eigenvector_centrality(
        edges, tol=0.0, max_iter=PR_ITERS, checkpoint_dir=_tmpdir("metis_qkt_ei_")
    )
    pr6 = pr.select("id", F.round("rank", 6).alias("pr"))
    ei6 = ei.select("id", F.round("score", 6).alias("ei"))
    return kendall_rank_correlation(pr6, ei6, "pr", "ei", k=SPEAR_K)

def _q_mean_distance(spark, sf_dir):
    """Truncated exact mean shortest-path length (plans/anf.py:
    mean_distance_exact) — the average-path-length headline stat on
    the same exact N(t) spine as neighborhood_function."""
    from metis_spark.plans.anf import mean_distance_exact

    return mean_distance_exact(derived_edges_sparse(spark, sf_dir), rounds=ANF_ROUNDS)

def _q_scc_condensation(spark, sf_dir):
    """Condensation-DAG summary of the directed graph → one row
    (n_vertices, n_sccs, largest_scc, nontrivial_sccs, vertices_in_cycles,
    condensed_edges, edge_reduction). The cycle-structure dashboard of a
    dependency graph: how much of it is cyclically tangled (SCCs > 1),
    and how small the quotient DAG is that layering/topo-sort actually
    has to process. Runs on the CONVERGED SCC labels (plans/scc.py);
    condensed_edges counts distinct inter-SCC label pairs — the edges
    of the condensation, whose acyclicity dag_levels exploits.

    Exactness: pure integer counts + one trailing ROUND ratio.
    Scale shape: two label joins onto the edge list + distinct + three
    map-side aggregates; output is 1 row.
    """
    from metis_spark.plans.scc import strongly_connected_components

    edges = derived_edges(spark, sf_dir)
    labels, info = strongly_connected_components(
        edges, checkpoint_dir=_tmpdir("metis_qscccond_"),
        max_phases=SCC_PHASES, max_rounds=SCC_ROUNDS,
        checkpoint_every=2, retain=2,
    )
    assert info["converged"], info
    lab = labels.select(F.col("id").cast("long"), F.col("scc").cast("long"))
    sizes = lab.groupBy("scc").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    stats = sizes.agg(
        F.sum("sz").cast("long").alias("n_vertices"),
        F.count(F.lit(1)).cast("long").alias("n_sccs"),
        F.max("sz").cast("long").alias("largest_scc"),
        F.sum((F.col("sz") > 1).cast("long")).cast("long").alias("nontrivial_sccs"),
        F.sum(F.when(F.col("sz") > 1, F.col("sz")).otherwise(F.lit(0)))
        .cast("long")
        .alias("vertices_in_cycles"),
    )
    la = lab.select(F.col("id").alias("src"), F.col("scc").alias("la"))
    lb = lab.select(F.col("id").alias("dst"), F.col("scc").alias("lb"))
    ce = (
        edges.join(la.hint("shuffle_hash"), "src")
        .join(lb.hint("shuffle_hash"), "dst")
        .where(F.col("la") != F.col("lb"))
        .select("la", "lb")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("condensed_edges"))
    )
    m = edges.agg(F.count(F.lit(1)).cast("long").alias("m"))
    return (
        stats.crossJoin(F.broadcast(ce))
        .crossJoin(F.broadcast(m))
        .select(
            "n_vertices",
            "n_sccs",
            "largest_scc",
            "nontrivial_sccs",
            "vertices_in_cycles",
            "condensed_edges",
            F.round(
                F.lit(1.0) - F.col("condensed_edges").cast("double") / F.col("m").cast("double"),
                6,
            ).alias("edge_reduction"),
        )
    )

def _q_global_efficiency(spark, sf_dir):
    """Truncated global efficiency (plans/anf.py:global_efficiency) —
    the disconnection-proof average-connectivity scalar on the exact
    N(t) spine."""
    from metis_spark.plans.anf import global_efficiency

    return global_efficiency(derived_edges_sparse(spark, sf_dir), rounds=ANF_ROUNDS)

def _q_heat_kernel(spark, sf_dir):
    """Truncated-Taylor heat-kernel PPR from the id % HK_SEED_MOD seed
    set (plans/diffusion.py:heat_kernel_ppr) — the 1/k!-damped member
    of the diffusion family next to ppr_5iter / katz_5iter. Exact
    integer trajectory: the DuckDB twin replays every term bit-for-bit."""
    from metis_spark.driver.common import (
        HK_SCALE, HK_SEED_MOD, HK_T_DEN, HK_T_NUM, HK_TERMS, HK_TOPK,
    )
    from metis_spark.plans.diffusion import heat_kernel_ppr

    out, _ = heat_kernel_ppr(
        derived_edges(spark, sf_dir),
        seed_mod=HK_SEED_MOD, t_num=HK_T_NUM, t_den=HK_T_DEN,
        n_terms=HK_TERMS, scale=HK_SCALE, topk=HK_TOPK,
    )
    return out

def _q_pagerank_delta_curve(spark, sf_dir):
    """Exact integer convergence trajectory of the quantized power
    iteration (plans/diffusion.py:pagerank_delta_curve) — the
    iteration-by-iteration L1/L∞ decay behind the north-rule
    "iterations to L1 < 1e-9" criterion, behind the oracle gate."""
    from metis_spark.driver.common import PRDC_ITERS, PRDC_SCALE
    from metis_spark.plans.diffusion import pagerank_delta_curve

    out, _ = pagerank_delta_curve(
        derived_edges(spark, sf_dir), n_iters=PRDC_ITERS, scale=PRDC_SCALE,
    )
    return out

def _q_dag_critical_path(spark, sf_dir):
    """Weighted critical path of the SCC condensation DAG
    (plans/scc.py:condensation_critical_path) — the makespan-bounding
    build chain with node cost = SCC size, one level past dag_levels."""
    from metis_spark.plans.scc import (
        condensation_critical_path,
        strongly_connected_components,
    )

    edges = derived_edges(spark, sf_dir)
    labels, info = strongly_connected_components(
        edges, checkpoint_dir=_tmpdir("metis_qdcp_"),
        max_phases=SCC_PHASES, max_rounds=SCC_ROUNDS,
    )
    assert info["converged"], info
    return condensation_critical_path(edges, labels, max_rounds=DAG_ROUNDS + 1)

def _q_sssp_parents(spark, sf_dir):
    """BFS shortest-path TREE from the min vertex: (id, dist, parent)
    with parent = min-id predecessor on a shortest path — the path-
    reconstruction companion to sssp_hops (at scale, routing/provenance
    queries walk parent pointers instead of re-running BFS per query)."""
    from metis_spark.plans.sssp import shortest_hops

    edges = derived_edges(spark, sf_dir)
    src = edges.selectExpr("least(min(src), min(dst)) AS s").collect()[0]["s"]
    dists, _ = shortest_hops(
        edges, sources=[int(src)],
        checkpoint_dir=_tmpdir("metis_qssspp_"),
        max_iter=SSSP_ROUNDS,
    )
    du = dists.select(F.col("id").alias("src"), F.col("dist").alias("du"))
    dv = dists.select(F.col("id").alias("dst"), F.col("dist").alias("dv"))
    parents = (
        edges.join(du.hint("shuffle_hash"), "src")
        .join(dv.hint("shuffle_hash"), "dst")
        .where(F.col("du") + 1 == F.col("dv"))
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min("src").cast("long").alias("parent"))
    )
    return dists.join(parents, "id", "left").select("id", "dist", "parent")

def _q_cyclomatic_number(spark, sf_dir):
    """Cycle rank of the undirected dependency graph: r = m − n + c
    (the graph-level McCabe cyclomatic number) — how many independent
    cycles the corpus carries; r = 0 ⇔ forest."""
    from metis_spark.plans.components import connected_components

    edges = derived_edges(spark, sf_dir)
    und = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    labels, info = connected_components(
        edges, max_iter=30, checkpoint_dir=_tmpdir("metis_qcyc_")
    )
    assert info["converged"], info
    nc = labels.agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        F.countDistinct("component").cast("long").alias("n_components"),
    )
    me = und.agg((F.count(F.lit(1)) / F.lit(2)).cast("long").alias("n_und_edges"))
    return nc.crossJoin(F.broadcast(me)).select(
        "n_vertices", "n_und_edges", "n_components",
        (F.col("n_und_edges") - F.col("n_vertices") + F.col("n_components"))
        .cast("long").alias("cycle_rank"),
    )

def _q_transitive_deps(spark, sf_dir):
    """Transitive dependency closure of the top-12 hub vertices via
    bit-parallel multi-source reachability (plans/sssp.py
    reachability_masks): all 12 BFS frontiers advance in one iterative
    loop carrying a single 8-byte bitmask per reached vertex — the
    answer to "how many files does each hub package transitively pull
    in", the package-manager question a per-root BFS would pay 12
    traversals for. Roots = top out-degree, ties → min id (the same
    ordering the twin's window replays); converged asserted, so the
    recursive-CTE oracle sees the exact fixpoint."""
    from metis_spark.plans.sssp import reachability_masks

    edges = derived_edges(spark, sf_dir)
    roots = [
        int(r["src"])
        for r in edges.groupBy("src").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("src")).limit(12).collect()
    ]
    masks, info = reachability_masks(
        edges, roots, checkpoint_dir=_tmpdir("metis_reach_"), max_iter=40
    )
    assert info["converged"], f"reachability did not converge: {info}"
    rdf = spark.createDataFrame(
        [(int(v), r) for r, v in enumerate(roots)], "root long, bit int"
    )
    return (
        masks.join(F.broadcast(rdf), F.expr("(shiftright(mask, bit) & 1) = 1"))
        .groupBy("root")
        .agg(F.count(F.lit(1)).cast("long").alias("n_reachable"))
    )

def _q_influence_spread(spark, sf_dir):
    """Independent-cascade influence spread of the top-4 hub seed set:
    48 deterministic live-edge Monte Carlo trials advance in ONE
    bit-parallel loop (plans/sssp.py ic_live_edge_spread — per-edge
    8-byte liveness mask, vertex-mask AND edge-mask propagation,
    map-side bit_or), the evaluation kernel of influence maximization
    (Kempe et al.) that the per-trial-traversal textbook form pays 48
    passes for. md5-derandomized coins, converged asserted → the
    recursive-CTE twin replays every trial; 48 rows (trial,
    n_reached), the spread estimate's full distribution rather than
    just its mean."""
    from metis_spark.plans.sssp import ic_live_edge_spread

    edges = derived_edges(spark, sf_dir)
    seeds = [
        int(r["src"])
        for r in edges.groupBy("src").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("src")).limit(4).collect()
    ]
    masks, info = ic_live_edge_spread(
        edges, seeds, n_trials=48, p_pct=20,
        checkpoint_dir=_tmpdir("metis_ic_"), max_iter=40,
    )
    assert info["converged"], f"IC cascades did not converge: {info}"
    tdf = spark.createDataFrame(
        [(t, t) for t in range(48)], "trial long, bit int"
    )
    return (
        masks.join(F.broadcast(tdf), F.expr("(shiftright(mask, bit) & 1) = 1"))
        .groupBy("trial")
        .agg(F.count(F.lit(1)).cast("long").alias("n_reached"))
    )

def _q_ris_seeds(spark, sf_dir):
    """Influence maximization by reverse influence sampling (Borgs et
    al. / TIM / IMM — the algorithm that made influence-max tractable
    at scale): sample 48 reverse-reachable sets (random hash-chosen
    roots, live-edge coupling on REVERSED edges, all 48 in one
    bit-parallel loop via plans/sssp.py ic_live_edge_spread in
    per_bit_roots mode), then greedy max-coverage picks 3 seeds — the
    vertex in the most RR sets is exactly the one with the highest
    estimated spread. Everything is md5-derandomized (root choice =
    argmin hash per trial, coins per (trial, edge)), so the
    recursive-CTE + unrolled-greedy twin replays seed-for-seed.
    Output ≤ 3 rows: (round, seed, marginal_covered, cum_covered);
    rounds stop early iff every RR set is already covered (both
    engines construct this identically)."""
    from metis_spark.operators.sampling import hash_bucket
    from metis_spark.plans.sssp import ic_live_edge_spread

    R, K, P = 48, 3, 10
    edges = derived_edges(spark, sf_dir)
    verts = edges.select(F.col("src").alias("id")).union(
        edges.select(F.col("dst").alias("id"))
    ).distinct()
    tdf = spark.createDataFrame([(t,) for t in range(R)], "t long")
    rkey = F.concat_ws("_", F.col("t"), F.col("id"))
    roots_rows = (
        verts.crossJoin(F.broadcast(tdf))
        .select("t", "id", hash_bucket(rkey, "rrroot").alias("h"))
        .groupBy("t")
        .agg(F.min(F.struct("h", "id")).getField("id").alias("root"))
        .collect()
    )
    roots = [int(r["root"]) for r in sorted(roots_rows, key=lambda r: r["t"])]
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    masks, info = ic_live_edge_spread(
        rev, seeds=[], p_pct=P, per_bit_roots=roots, salt="rr",
        checkpoint_dir=_tmpdir("metis_rr_"), max_iter=40,
    )
    assert info["converged"], f"RR sets did not converge: {info}"
    bits = spark.createDataFrame([(t, t) for t in range(R)], "trial long, bit int")
    member = (
        masks.join(F.broadcast(bits), F.expr("(shiftright(mask, bit) & 1) = 1"))
        .select("trial", "id")
        .persist()
    )
    member.count()
    out, covered, cum = [], set(), 0
    for rnd in range(1, K + 1):
        remaining = member.where(~F.col("trial").isin(sorted(covered))) if covered else member
        top = (
            remaining.groupBy("id").agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc("id")).limit(1).collect()
        )
        if not top:
            break
        seed = int(top[0]["id"])
        newly = {
            int(r["trial"])
            for r in remaining.where(F.col("id") == seed).select("trial").collect()
        }
        covered |= newly
        cum += len(newly)
        out.append((rnd, seed, len(newly), cum))
    member.unpersist()
    return spark.createDataFrame(
        out, "round long, seed long, marginal_covered long, cum_covered long"
    )

def _q_dag_width_profile(spark, sf_dir):
    """Build-parallelism profile of the condensation DAG → one row per
    level (level, width, n_tasks, critical_path, makespan_p8,
    makespan_p32). Treating each SCC as one composite build task (a
    cyclic clump can only build together), width(k) = how many tasks
    level k admits in parallel; the two makespan columns are Brent's
    bound max(⌈n/p⌉, critical_path) — the floor on wall-clock for a
    p-worker build farm, and the number that says when adding workers
    stops helping (p where ⌈n/p⌉ < depth). All-integer arithmetic on
    the verified SCC + longest-path-levels spine; the per-level
    groupBy is histogram-sized and the scalar summary broadcasts
    back."""
    from metis_spark.plans.scc import (
        condensation_levels,
        strongly_connected_components,
    )

    edges = derived_edges(spark, sf_dir)
    labels, info = strongly_connected_components(
        edges, checkpoint_dir=_tmpdir("metis_qdagw_"),
        max_phases=SCC_PHASES, max_rounds=SCC_ROUNDS,
    )
    assert info["converged"], info
    from metis_spark.plans.scc import dag_width_profile

    return dag_width_profile(
        condensation_levels(edges, labels, max_rounds=DAG_ROUNDS)
    )

def _q_betweenness_sample_plan(spark, sf_dir):
    """Riondato–Kornaropoulos betweenness sample-size planner → one
    row per (ε, δ): r = ⌈(c/ε²)(⌊log₂(VD−2)⌋ + 1 + ln(1/δ))⌉ with the
    vertex-diameter VD = double-sweep bound + 1 — the THEORY column
    next to betweenness_approx's N_BETW_SOURCES practice: how many
    source BFS trees buy (ε, δ)-approximation of EVERY vertex's
    betweenness (VC dimension of shortest-path ranges, SDM'16).
    ⌊log₂⌋ is computed exactly from the binary-string length and the
    transcendental factors are Python micro-literals, so the ceiling
    is one exact integer expression.

    Scale: the double sweep is two BFS runs on the verified
    shortest_hops spine; the planner grid is 4 literal rows."""
    from metis_spark.driver.common import BETW_PLAN_GRID
    from metis_spark.plans.sssp import diameter_double_sweep

    out, info = diameter_double_sweep(
        derived_edges_sparse(spark, sf_dir),
        checkpoint_dir=_tmpdir("metis_qbetwplan_"),
    )
    assert info["converged"], info
    vd = out.select((F.col("diameter_lb") + 1).cast("long").alias("vd"))
    grid = out.sparkSession.createDataFrame(
        BETW_PLAN_GRID, "eps_micro long, delta_micro long, a_micro long, lnd_micro long"
    )
    # floor(log2(vd-2)) = len(bin(vd-2)) - 1 exactly; vd <= 2 -> 0
    flog = F.when(
        F.col("vd") > 2,
        F.length(F.conv((F.col("vd") - 2).cast("string"), 10, 2)) - 1,
    ).otherwise(0).cast("long")
    return (
        grid.crossJoin(F.broadcast(vd))
        .select(
            "eps_micro", "delta_micro", "vd",
            flog.alias("floor_log2"),
            "a_micro", "lnd_micro",
        )
        .select(
            "eps_micro", "delta_micro", "vd", "floor_log2",
            F.expr(
                "(a_micro * ((floor_log2 + 1) * 1000000 + lnd_micro) "
                "+ 999999999999) div 1000000000000"
            ).cast("long").alias("sample_size"),
            F.lit(N_BETW_SOURCES).cast("long").alias("current_sources"),
        )
    )

def _q_pagerank_damping_sensitivity(spark, sf_dir):
    """Damping sensitivity → one row (k, sum_d2, spearman_micro): the
    exact Spearman rank correlation between 5-iteration PageRank at
    d = 0.5 and d = 0.85 over the d=0.85 top-SPEAR_K head — how much
    the ranking you ship actually depends on the teleport parameter
    (ρ near 1: robust; low ρ: the damping choice IS the ranking, tune
    it deliberately). Same head-restricted discipline as
    centrality_rank_corr, pointed at parameter robustness instead of
    measure agreement.

    Exactness: both rankings order by (ROUND(rank,6) DESC, id ASC);
    ρ = 1 − 6Σδ²/(k(k²−1)) is all-integer up to one micro rounding."""
    from metis_spark.driver.common import SPEAR_K
    from metis_spark.plans.pagerank import pagerank

    edges = derived_edges(spark, sf_dir)
    r85, _ = pagerank(
        edges, d=0.85, tol=0.0, max_iter=PR_ITERS,
        checkpoint_dir=_tmpdir("metis_qpds85_"),
    )
    r50, _ = pagerank(
        edges, d=0.5, tol=0.0, max_iter=PR_ITERS,
        checkpoint_dir=_tmpdir("metis_qpds50_"),
    )
    head = (
        r85.select("id", F.round("rank", 6).alias("ra"))
        .orderBy(F.desc("ra"), F.asc("id"))
        .limit(SPEAR_K)
    )
    joined = head.join(
        r50.select("id", F.round("rank", 6).alias("rb")).hint("shuffle_hash"), "id"
    )
    wa = Window.orderBy(F.desc("ra"), F.asc("id"))
    wb = Window.orderBy(F.desc("rb"), F.asc("id"))
    ranked = joined.select(
        "id",
        F.row_number().over(wa).cast("long").alias("pa"),
        F.row_number().over(wb).cast("long").alias("pb"),
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            (F.col("pa") - F.col("pb")) * (F.col("pa") - F.col("pb"))
        ).cast("long").alias("sum_d2"),
    ).select(
        "k",
        "sum_d2",
        (
            F.lit(1_000_000)
            - F.expr("(6000000 * sum_d2) div (k * (k * k - 1))")
        ).cast("long").alias("spearman_micro"),
    )

def _q_pagerank_mass_concentration(spark, sf_dir):
    """Attention concentration → one row per k ∈ {10, 100}: (k,
    mass_share_micro, n_vertices): the share of total PageRank mass
    the top-k vertices hold — the "how top-heavy is the ranking"
    scalar behind cache sizing (serve the head from memory) and crawl
    prioritization; the rank-mass sibling of degree_gini's edge-mass
    view. Ranks quantize to nano-units per vertex BEFORE the sums, so
    both shares are exact integer ratios."""
    from metis_spark.plans.pagerank import pagerank

    r, _ = pagerank(
        derived_edges(spark, sf_dir), tol=0.0, max_iter=PR_ITERS,
        checkpoint_dir=_tmpdir("metis_qpmc_"),
    )
    q = r.select(
        "id", F.round(F.col("rank") * F.lit(1e9)).cast("long").alias("r9")
    ).persist()
    tot = q.agg(
        F.sum("r9").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
    )
    out = None
    for k in (10, 100):
        topk = (
            q.orderBy(F.desc("r9"), F.asc("id"))
            .limit(k)
            .agg(F.sum("r9").cast("long").alias("mass"))
        )
        row = (
            topk.crossJoin(F.broadcast(tot))
            .select(
                F.lit(k).cast("long").alias("k"),
                F.expr("(1000000 * mass) div total").cast("long").alias("mass_share_micro"),
                "n_vertices",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
