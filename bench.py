"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:  {"metric": ..., "value": total_sec, "unit": "sec",
        "queries": {name: sec, ...}, "sf": ..., ...extras}

The flagship metric is PageRank on the G-BENCH corpus-derived edge
table (FIXTURES.md): the corpus is generated distributed + extracted
once and cached under .bench_cache/, then PageRank runs to convergence
with the resume machinery on — durable checkpoint+lineage every 16th
iteration (checkpoint_every=16) and at convergence, plan-truncating
localCheckpoints in between. Extras report edges/sec-per-iteration,
the north-rule throughput metric.
"""

from __future__ import annotations

import atexit
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from metis_spark.operators.csr import build_csr  # noqa: E402
from metis_spark.operators.edges import resolve_edges  # noqa: E402
from metis_spark.operators.encode import encode_edges, encode_vertices  # noqa: E402
from metis_spark.plans.components import connected_components  # noqa: E402
from metis_spark.plans.pagerank import pagerank  # noqa: E402
from metis_spark.session import get_spark  # noqa: E402
from metis_spark.sources.corpus import generate_corpus  # noqa: E402

CACHE = os.path.join(REPO, ".bench_cache")


def _tmpdir(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d

# G-BENCH corpus size per sf dir (FIXTURES.md: bench ⇒ ~1-5M raw imports)
N_FILES = {"sf0.001": 5_000, "sf0.01": 40_000, "sf0.1": 250_000}
N_REPOS = {"sf0.001": 20, "sf0.01": 80, "sf0.1": 200}
EXTRACT_FILES = 20_000  # per-run extraction timing slice (always cold)


def bench_edges(spark, sf_name: str):
    """Cached corpus-derived encoded edge table for the flagship runs."""
    nf = N_FILES.get(sf_name, 40_000)
    nr = N_REPOS.get(sf_name, 80)
    path = os.path.join(CACHE, f"edges_nf{nf}")
    if not os.path.isdir(path):
        sources = generate_corpus(spark, nf, nr)
        raw = resolve_edges(sources)
        vertices = encode_vertices(raw)
        edges = encode_edges(raw, vertices)
        edges.repartition(spark.sparkContext.defaultParallelism, "src").write.mode(
            "overwrite"
        ).parquet(path)
    return spark.read.parquet(path)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    sf = float(sf_name.replace("sf", "")) if sf_name.startswith("sf") else 0.1
    spark = get_spark("metis_bench")

    timings: dict[str, float] = {}
    extras: dict[str, object] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    # flagship: corpus pipeline (extraction slice, always cold)
    def _extract():
        src = generate_corpus(spark, EXTRACT_FILES, 50)
        raw = resolve_edges(src)
        v = encode_vertices(raw)
        return encode_edges(raw, v).count()

    extras["extract_edges_rows"] = timed("extract_encode_20k_files", _extract)

    # flagship: PageRank to 1e-9 on the G-BENCH edge table (checkpointing on)
    edges = bench_edges(spark, sf_name).persist()
    n_edges = edges.count()
    extras["bench_edges"] = n_edges

    def _pr():
        # checkpoint_every=16: durable lineage every 16th iteration (and at
        # convergence) — the resume contract holds (≤15 iterations redone
        # after a kill) while the per-iteration commit protocol amortizes
        ranks, info = pagerank(
            edges, tol=1e-9, max_iter=100, checkpoint_dir=_tmpdir("bench_pr_"),
            checkpoint_every=16,
        )
        ranks.select(F.sum("rank")).collect()
        return info

    info = timed("pagerank_converge", _pr)
    extras["pagerank_iterations"] = info["iterations"]
    extras["pagerank_converged"] = info["converged"]
    extras["pagerank_edges_per_sec_per_iter"] = round(
        n_edges * info["iterations"] / timings["pagerank_converge"], 1
    )

    def _cc():
        labels, cinfo = connected_components(
            edges, max_iter=30, checkpoint_dir=_tmpdir("bench_cc_")
        )
        n = labels.select(F.countDistinct("component")).collect()[0][0]
        return cinfo["iterations"], n

    extras["cc_rounds"], extras["cc_components"] = timed("connected_components", _cc)

    def _csr():
        return build_csr(edges, num_buckets=64).agg(F.sum("deg")).collect()[0][0]

    timed("build_csr", _csr)

    # operator-pack headliners on the driver testdata.
    # SHARED = the r4 basis, pinned so round-over-round like-for-like
    # stays computable (VERDICT r4 item 9); adds go in NEW below and
    # graduate into SHARED the round after.
    qs = E.queries()
    SHARED = (
        "tpch_q1_agg",
        "sessionize_part_index",
        "minhash_lsh_candidates",
        "ann_cosine_topk",
        "ann_ivf_topk",
        "triangle_count",
        "pagerank_5iter",
        "hits_3iter",
        "strongly_connected_components",
        "tfidf_top3",
        "node2vec_walks",
        "betweenness_approx",
        "louvain_2round",
        "eigencentrality_5iter",
        "salsa_3iter",
        "coreness",
        "anf_sketch",
        "training_shards",
        "speculative_coloring",
        "maximal_matching",
        "temporal_reachability",
        "minimum_spanning_forest",
        # round-4 families
        "partition_assignment",
        "densest_subgraph",
        "wl_colors_3",
        "unigram_surprisal",
        "ppr_sweep_cut",
        "edge_betweenness",
        "corpus_js_divergence",
    )
    NEW = (  # round-5 additions — reported separately, not in the basis
        "leiden_communities",
        "simrank_topk",
        "global_heavy_hitters_sketch",
        "kmeans_embeddings",
        "dsir_importance",
        "semdedup",
        "bipartite_ab_core",
        "trustrank_spam_mass",
        "butterfly_census",
        "refex_features",
        "pq_codes",
        # round-5 late additions (this session)
        "collective_influence",
        "map_equation",
        "leaderrank",
        "degree_discount_seeds",
        "disparity_backbone",
        "pmi_collocations",
        "gopher_rules",
        "readability_flesch",
        "distinct_ngrams",
        "heaps_fit",
        "source_scorecard",
        "bpe_merges",
        "bpe_fertility",
        "centrality_rank_corr",
        "percolation_threshold",
        "triangle_surplus",
        "temporal_pagerank",
        "winnowing_matches",
        "vocab_cover_seeds",
        "nmi_partitions",
        "eccentricity_bounds",
        "decayed_event_counts",
        # round-5 final batch
        "degree_gini",
        "ngram_containment",
        "edge_clustering_coeff",
        "user_burstiness",
        "spectral_radius_bounds",
        "temporal_triangles",
        "community_conductance",
        "rich_club_normalized",
        "retention_cohorts",
        "ordered_funnel",
        "embedding_cos_histogram",
        "scc_condensation",
        "good_turing_richness",
        "label_centroid_separation",
        "event_transitions",
        "kmeans_silhouette",
        "mad_outliers",
        "pq_ann_recall",
        "vocab_coverage_curve",
        # round-5 closing batch
        "heat_kernel_ppr",
        "pagerank_delta_curve",
        "mmr_diverse_topk",
        "kneser_ney_bigrams",
        "dag_critical_path",
        "directed_assortativity",
        "walk_entropy_rate",
        "spectral_moments",
        "textrank_top_sentences",
        "kleinberg_bursts",
        "cdc_chunk_dedup",
        "facility_location_seeds",
        "blocking_quality",
        "lsh_parameter_plan",
        "skew_salt_advisor",
        "hk_sweep_cut",
        "script_histogram",
        "package_instability",
        "table_profile",
        "sssp_parents",
        "cyclomatic_number",
        "code_switching_score",
        "rrf_centrality_fusion",
        "persistent_heavy_hitters",
        "negative_sampling_table",
        "kaplan_meier_churn",
        "user_behavior_entropy",
        "hash_uniformity_chi2",
        "quality_dup_correlation",
        "zorder_locality",
        "split_leakage_check",
        "bloom_semijoin_audit",
        "transitive_deps_topk",
        "truncation_recall_curve",
        "k_anonymity_audit",
        "kdegree_anonymity",
        "knn_degree_correlation",
        "term_burstiness",
        "cusum_changepoints",
        "max_concurrency",
        "benford_audit",
        "yule_k",
        "llr_collocations",
        "rocchio_confusion",
        "ann_hubness",
        "burrows_delta",
        "tpch_q3_topk",
        "event_type_correlation",
        "session_colift",
        "randic_index",
        "degree_powerlaw_fit",
        "markov_next_accuracy",
        "l_diversity_audit",
        "triangle_delta_insert",
        "intrinsic_dimension",
        "conversion_time_stats",
        "dp_noise_plan",
        "source_perplexity",
        "top_user_journeys",
        "session_stats",
        "graph_h_index",
        "blocklist_rate",
        "user_activity_gini",
        "hour_of_week_profile",
        "watermark_lateness_audit",
        "edge_hygiene_audit",
        "bridging_coefficient",
        "embedding_norm_profile",
        "doc_length_powerlaw",
        "order_priority_semijoin",
        "tpch_q5_lite",
        "brand_return_rates",
        "stickiness_card",
        "segment_order_stats",
        "lang_source_entropy",
        "caps_profile",
        "label_balance_card",
        "revenue_hhi",
        "digit_token_share",
        "psi_value_drift",
        "region_revenue_rollup",
        "seasonal_anomaly_hours",
        "order_backlog_card",
        "acctbal_health_card",
        "part_type_revenue_topk",
        "square_surplus",
        "transition_dwell_stats",
        "basket_size_profile",
        "discount_elasticity",
        "repeat_revenue_share",
        "ivf_nprobe_curve",
        "simhash_threshold_sweep",
        "pagerank_damping_sensitivity",
        "lsh_tables_curve",
        "degree_drift_ks",
        "lang_source_mi",
        "value_autocorrelation",
        "heavy_hitter_stability",
        "pagerank_mass_concentration",
    )
    # Heavy tier: correct and oracle-checked, but individually > ~20s at
    # sf0.1 (N(t)-exact members, overlapping-community floods, A^3
    # twins' engine sides, 48-trial RIS) — excluded from the default
    # bench wall so the per-round run stays inside the driver budget
    # (the r4 gate-timeout lesson). NOT a silent cap: the names are
    # reported in the JSON, the full-tier solo measurement lives in
    # BENCH/NOISE.md, and BENCH_HEAVY=1 times them all.
    HEAVY = (
        "mean_distance",
        "global_efficiency",
        "ris_seed_selection",
        "katz_index_topk",
        "influence_spread_ic",
        "cpm_communities",
        "scan_clusters",
        "nucleus_34",
        "graphlet4_census",
        "centrality_kendall",
        "k_peak",
        "local_bridge_span",
        "dcsbm_likelihood",
        "core_periphery",
        "minhash_estimate_error",
        "clustering_by_degree",
        "edge_dispersion",
        "vi_partitions",
        "small_world_sigma",
    )
    run_heavy = os.environ.get("BENCH_HEAVY", "") == "1"
    basis = SHARED + NEW + (HEAVY if run_heavy else ())
    for name in basis:
        timed(name, lambda n=name: qs[n](spark, sf_dir).count())

    new_t = {n: timings[n] for n in NEW if n in timings}
    heavy_t = {n: timings[n] for n in HEAVY if n in timings}
    shared_t = {
        n: t for n, t in timings.items() if n not in new_t and n not in heavy_t
    }
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "shared": shared_t,
                "new": new_t,
                "shared_total": round(sum(shared_t.values()), 3),
                "new_total": round(sum(new_t.values()), 3),
                "heavy": heavy_t,
                "heavy_skipped": [n for n in HEAVY if n not in timings],
                "sf": sf,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
