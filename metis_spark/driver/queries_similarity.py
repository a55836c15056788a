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

from metis_spark.driver.common import ANN_PLANES, ANN_TABLES, DEDUP_CC_ROUNDS, HARDNEG_K, IVF_NPROBE, IVF_STRIDE, KCENTER_K, NEARDUP_PLANES, NEARDUP_TABLES, N_MEDIA, _t, _tmpdir  # noqa: E501,F401


def _q_media_decode(spark, sf_dir):
    """Multimodal: REAL binary decode (PNG IHDR+IDAT inflate, WAV fmt/data,
    MP4 ftyp/mvhd) via Arrow-batched mapInPandas. The oracle recomputes every
    decoded field from the synthesis recipe's closed form — a full round-trip
    check of the byte parser. (digest is sha256 of the payload — pinned by
    pytest against a JVM-side sha2, not SQL-expressible, so excluded here.)"""
    from metis_spark.operators.multimodal import decode_media, synthesize_media

    media = synthesize_media(spark, N_MEDIA)
    dec = decode_media(media)
    # inapplicable fields (e.g. width of a WAV) are null in the API; the gate
    # compares them as -1 so both engines hash identical non-null longs
    n1 = lambda c: F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)  # noqa: E731
    return dec.select(
        "media_id", "kind", "ok", "format", n1("n_bytes"),
        n1("width"), n1("height"), n1("bit_depth"), n1("pixel_sum"),
        n1("channels"), n1("sample_rate"), n1("n_samples"), n1("sample_sum"),
        n1("duration_ms"),
    )

def _q_media_features(spark, sf_dir):
    """Multimodal: fixed-dim feature vectors from binary payloads."""
    from metis_spark.operators.multimodal import extract_features, synthesize_media

    media = synthesize_media(spark, N_MEDIA)
    feats = extract_features(media)
    return feats.select("media_id", "kind", F.size("feature").cast("long").alias("dim"))

def _q_ann_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5)
    return SIM.cosine_topk(emb, queries_df, "vec_id", "embedding", k=5)

def _q_kcenter(spark, sf_dir):
    """Greedy k-center / farthest-first seeds over the embedding corpus
    (operators/similarity.py:kcenter_seeds) — the deterministic
    2-approx diversity seeder; round-before-rank cosine distance."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.kcenter_seeds(emb, "vec_id", "embedding", k=KCENTER_K)

def _q_kmeans(spark, sf_dir):
    """Quantized-integer Lloyd k-means over the embedding corpus
    (operators/similarity.py:kmeans_quantized) — per-cluster size + exact
    integer within-cluster squared distance after KMEANS_ITERS rounds.
    Every round is a function of exact integers (floor-quantized dims,
    integer distance sums, floor-divided centroid means), so the unrolled
    DuckDB twin replays the whole trajectory bit-for-bit."""
    from metis_spark.driver.common import KMEANS_ITERS, KMEANS_K, KMEANS_SCALE

    emb = _t(spark, sf_dir, "embeddings")
    asg = SIM.kmeans_quantized(
        emb, k=KMEANS_K, iters=KMEANS_ITERS, scale=KMEANS_SCALE
    )
    return (
        asg.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("dist2").alias("wss"),
        )
        .orderBy("cid")
    )

def _q_hard_negatives(spark, sf_dir):
    """Contrastive hard-negative mining: for the 5 smallest vec_ids, the
    top-3 most-cosine-similar vectors with a DIFFERENT label — the
    standard batch-mining step for contrastive/embedding training.
    Broadcast-query crossJoin, round-before-rank (same discipline as
    cosine_topk)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    scored = (
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_vec"),
            F.col("label").alias("c_label"),
        )
        .crossJoin(F.broadcast(q))
        .where(F.col("c_label") != F.col("q_label"))
        .select(
            "query_id", "neighbor_id",
            F.round(SIM.cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= HARDNEG_K)
        .select("query_id", "neighbor_id", "sim", F.col("rn").cast("long").alias("rn"))
    )

def _q_sq8_codes(spark, sf_dir):
    """SQ8 scalar-quantized embedding codes (operators/similarity.py:
    scalar_quantize_codes): per-dim min/max scale, floor-coded —
    integer-exact across engines because nothing sums floats."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.scalar_quantize_codes(emb, "vec_id", "embedding")

def _q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (sim ≥ 0.40, a < b).

    Shipped plan is LSH-bucketed candidates + exact verification — NO
    CartesianProduct (pinned by test_plan_shape). The DuckDB oracle is the
    all-pairs scan, so candidate coverage of every true pair is part of
    the correctness gate. Threshold sits at the ~99.95th percentile of the
    synthetic similarity distribution (max ≈ 0.51) so the set is non-trivial.
    """
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.lsh_neardup_pairs(
        emb, "vec_id", "embedding", threshold=0.40,
        dim=64, num_tables=NEARDUP_TABLES, num_planes=NEARDUP_PLANES,
    )

def _q_ann_lsh(spark, sf_dir):
    """Approximate ANN via hyperplane-LSH buckets (the scale path). Fully
    oracle-checked: the md5-derived hyperplanes are reproduced bit-exactly
    in DuckDB (60-bit construction, similarity.py:_hyperplane), so the
    bucket assignment, candidate set, and ranking all hash-match."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5)
    return SIM.lsh_bucket_topk(
        emb, queries_df, "vec_id", "embedding", k=5, dim=64,
        num_tables=ANN_TABLES, num_planes=ANN_PLANES,
    )

def _q_ann_lsh_recall(spark, sf_dir):
    """ANN quality gate: per-query recall of the LSH path vs exact top-k.
    A bucketing regression (wrong planes, dropped tables) shows up here as
    recall < 1 even though ann_lsh_bucketed alone would still 'run'."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5)
    exact = SIM.cosine_topk(emb, queries_df, "vec_id", "embedding", k=5)
    approx = SIM.lsh_bucket_topk(
        emb, queries_df, "vec_id", "embedding", k=5, dim=64,
        num_tables=ANN_TABLES, num_planes=ANN_PLANES,
    )
    return SIM.topk_recall(exact, approx)

def _q_ann_ivf(spark, sf_dir):
    """IVF-flat approximate top-k (the second ANN scale path, next to LSH).

    Coarse quantizer = deterministic stride sample (vec_id % 25), so the
    DuckDB oracle reproduces the centroid set, the argmax-cosine list
    assignment, the nprobe probe set, and the ranking bit-exactly. The
    Lloyd-trained quantizer (ivf_fit) is pinned by pytest on a clustered
    fixture instead — training in unrolled SQL would be unreadable."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5)
    cent = SIM.ivf_centroids_stride(emb, IVF_STRIDE)
    return SIM.ivf_topk(
        emb, queries_df, cent, "vec_id", "embedding", k=5, nprobe=IVF_NPROBE
    )

def _q_embedding_cluster_sizes(spark, sf_dir):
    """Coarse-quantizer cluster-size histogram: how the corpus
    distributes over the IVF inverted lists — the skew check run before
    trusting nprobe search (one fat list = one slow probe; the same
    argmax-cosine assignment as ann_ivf_topk, so the oracle reproduces
    it bit-exactly). One broadcast against L centroids + one
    map-side-combining groupBy; the cluster table is L rows."""
    emb = _t(spark, sf_dir, "embeddings")
    cent = SIM.ivf_centroids_stride(emb, IVF_STRIDE)
    asg = SIM.ivf_assign(emb, cent, "vec_id", "embedding")
    return asg.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors")
    )

def _q_ann_ivf_recall(spark, sf_dir):
    """Quality gate for the IVF path: per-query recall vs exact top-k.
    On the near-gaussian fixture recall reflects nprobe/L (no cluster
    structure to exploit — see similarity.py fixture-honesty note); the
    gate's job is to keep the number measured and oracle-checked."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5)
    exact = SIM.cosine_topk(emb, queries_df, "vec_id", "embedding", k=5)
    cent = SIM.ivf_centroids_stride(emb, IVF_STRIDE)
    approx = SIM.ivf_topk(
        emb, queries_df, cent, "vec_id", "embedding", k=5, nprobe=IVF_NPROBE
    )
    return SIM.topk_recall(exact, approx)

def _q_embedding_dedup_clusters(spark, sf_dir):
    """Embedding-space dedup endgame: LSH-banded near-dup pairs
    (sim ≥ 0.40, no CartesianProduct) become an undirected similarity
    graph; connected components assigns each vector its cluster id
    (min vec_id) + cluster size — the vector twin of the MinHash-text
    `dedup_clusters`. Vectors in no near-dup pair are omitted (they
    self-represent). Composition of two verified operators."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = SIM.lsh_neardup_pairs(
        emb, "vec_id", "embedding", threshold=0.40,
        dim=64, num_tables=NEARDUP_TABLES, num_planes=NEARDUP_PLANES,
    )
    edges = pairs.select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"))
    labels, _ = connected_components(
        edges, max_iter=DEDUP_CC_ROUNDS, checkpoint_dir=_tmpdir("metis_qedclus_")
    )
    sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "component").select(
        F.col("id").alias("vec_id"),
        F.col("component").alias("cluster"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )

def _q_semdedup(spark, sf_dir):
    """SemDeDup semantic dedup (operators/similarity.py:semdedup):
    kmeans-cluster-scoped cosine near-dup removal, keep-most-central
    policy — per-cluster member/removed counts. The cluster stage bounds
    the pairwise stage (Σ nᵢ², never n²); the only float is the rounded
    pairwise cosine, so the DuckDB twin replays the whole trajectory."""
    from metis_spark.driver.common import (
        KMEANS_ITERS, KMEANS_K, KMEANS_SCALE, SEMDEDUP_TAU,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return SIM.semdedup(
        emb, k=KMEANS_K, iters=KMEANS_ITERS, scale=KMEANS_SCALE,
        tau=SEMDEDUP_TAU,
    )

def _q_pca_top(spark, sf_dir):
    """Dominant embedding direction (operators/similarity.py:
    pca_top_component): engine-exact quantized power iteration on the
    integer second-moment matrix — the All-but-the-Top whitening
    direction, oracle-replayable via truncating integer renorm."""
    from metis_spark.operators.similarity import pca_top_component

    return pca_top_component(_t(spark, sf_dir, "embeddings"))

def _q_pq_codes(spark, sf_dir):
    """Product-quantization codes over the embedding corpus
    (operators/similarity.py:pq_codes, Jégou et al. TPAMI 2011) — the
    m=4 × k=16 sub-codebook compression behind 100 TB ANN."""
    from metis_spark.driver.common import PQ_ITERS, PQ_K, PQ_M
    from metis_spark.operators.similarity import pq_codes

    emb = _t(spark, sf_dir, "embeddings")
    return pq_codes(emb, m=PQ_M, k=PQ_K, iters=PQ_ITERS)

def _q_pq_ann(spark, sf_dir):
    """PQ asymmetric-distance ANN top-k for the min-id self-query
    (operators/similarity.py:pq_ann_topk) — the search half of product
    quantization: m table lookups per vector, no raw-vector I/O."""
    from metis_spark.driver.common import PQ_ITERS, PQ_K, PQ_M, PQ_TOPK
    from metis_spark.operators.similarity import pq_ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    return pq_ann_topk(emb, k_top=PQ_TOPK, m=PQ_M, k=PQ_K, iters=PQ_ITERS)

def _q_embedding_cos_histogram(spark, sf_dir):
    """Pairwise-cosine distribution over two disjoint hash-sampled
    embedding slices → (bin, lo, n_pairs). THE calibration read before
    choosing any near-dup / semdedup / ANN threshold: where the
    similarity mass actually sits (a threshold at 0.9 means nothing
    until you see whether the background mode is at 0.2 or 0.7).

    Sampling is deterministic and bounded: slices vec_id % EDH_MOD ∈
    {0, 1} cross-joined — pair count is (n/M)², fixed by the mod, never
    n²; disjoint residues exclude self-pairs. Cosines are the same
    sequential-fold doubles the ANN family hash-matches, rounded at 6
    BEFORE binning (bin = floor((cos+1)·10), clamped to 19), so bin
    edges are engine-stable. 20 bins over [−1, 1].
    """
    from metis_spark.driver.common import EDH_MOD

    emb = _t(spark, sf_dir, "embeddings")
    a = emb.where(F.col("vec_id") % EDH_MOD == 0).select(
        F.col("vec_id").alias("ia"), F.col("embedding").alias("ea")
    )
    b = emb.where(F.col("vec_id") % EDH_MOD == 1).select(
        F.col("vec_id").alias("ib"), F.col("embedding").alias("eb")
    )
    cos = F.round(SIM.cosine(F.col("ea"), F.col("eb")), 6)
    binc = F.least(F.lit(19), F.floor((cos + F.lit(1.0)) * F.lit(10.0))).cast("long")
    return (
        a.crossJoin(b)
        .select(binc.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .select(
            "bin",
            F.round(F.col("bin").cast("double") / 10.0 - 1.0, 6).alias("lo"),
            "n_pairs",
        )
    )

def _q_label_separation(spark, sf_dir):
    """Between-class centroid cosine vs within-class cohesion per label
    pair (operators/similarity.py:label_centroid_separation) — the
    class-geometry audit of the embedding table."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.label_centroid_separation(emb)

def _q_kmeans_silhouette(spark, sf_dir):
    """Simplified silhouette per cluster on the engine-exact k-means
    model (operators/similarity.py:kmeans_silhouette) — the k-quality
    gate next to the wss report."""
    from metis_spark.driver.common import KMEANS_ITERS, KMEANS_K, KMEANS_SCALE

    emb = _t(spark, sf_dir, "embeddings")
    return SIM.kmeans_silhouette(emb, k=KMEANS_K, iters=KMEANS_ITERS, scale=KMEANS_SCALE)

def _q_pq_ann_recall(spark, sf_dir):
    """Quality gate for the PQ/ADC path → one row (n_exact, n_overlap,
    recall): overlap between pq_ann_topk's ADC ranking and the exact
    quantized-L2 top-k for the same self-query — the measured recall
    gate the LSH and IVF paths already carry (ann_lsh_recall /
    ann_ivf_recall), closing the trio. Exact side uses the IDENTICAL
    floor-quantization, so the comparison isolates exactly the PQ
    approximation (sub-space independence), not float noise."""
    from metis_spark.driver.common import PQ_ITERS, PQ_K, PQ_M, PQ_TOPK
    from metis_spark.operators.similarity import pq_ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    approx = pq_ann_topk(emb, k_top=PQ_TOPK, m=PQ_M, k=PQ_K, iters=PQ_ITERS)
    qrow = (
        emb.orderBy(F.col("vec_id").asc()).select("vec_id", "embedding").limit(1).collect()[0]
    )
    qid = int(qrow["vec_id"])
    import math

    qdf = spark.createDataFrame(
        [(p, int(math.floor(float(v) * 1000.0))) for p, v in enumerate(qrow["embedding"])],
        "pos int, qq long",
    )
    pts = emb.select(
        F.col("vec_id").alias("id"), F.posexplode("embedding").alias("pos", "val")
    ).select(
        "id", "pos", F.floor(F.col("val").cast("double") * F.lit(1000.0)).cast("long").alias("q")
    )
    exact = (
        pts.where(F.col("id") != qid)
        .join(F.broadcast(qdf), "pos")
        .groupBy("id")
        .agg(F.sum((F.col("q") - F.col("qq")) * (F.col("q") - F.col("qq"))).cast("long").alias("d2"))
        .orderBy("d2", "id")
        .limit(PQ_TOPK)
    )
    hits = exact.join(approx.select("id"), "id", "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap")
    )
    ne = exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    return ne.crossJoin(F.broadcast(hits)).select(
        "n_exact",
        "n_overlap",
        F.round(F.col("n_overlap").cast("double") / F.col("n_exact").cast("double"), 6).alias("recall"),
    )

def _q_mmr(spark, sf_dir):
    """Maximal Marginal Relevance diverse top-k for the min-id
    self-query (operators/similarity.py:mmr_topk) — the λ-mixed
    relevance/diversity selector between cosine_topk (pure relevance)
    and kcenter_seeds (pure diversity); RAG context packing's default."""
    from metis_spark.driver.common import MMR_K, MMR_POOL
    from metis_spark.operators.similarity import mmr_topk

    emb = _t(spark, sf_dir, "embeddings")
    return mmr_topk(emb, k=MMR_K, pool=MMR_POOL)

def _q_facility_location(spark, sf_dir):
    """Greedy facility-location coreset seeds
    (operators/similarity.py:facility_location_seeds) — submodular
    coverage maximization over the embedding corpus; integer-micro
    exact marginals."""
    from metis_spark.driver.common import FL_K, FL_POOL
    from metis_spark.operators.similarity import facility_location_seeds

    emb = _t(spark, sf_dir, "embeddings")
    return facility_location_seeds(emb, k=FL_K, pool=FL_POOL)

def _q_truncation_recall(spark, sf_dir):
    """Matryoshka-truncation recall curve: exact top-5 by FULL-dim cosine
    vs top-5 by prefix dims 8/16/32 per query — the measured decision
    for MRL-style dimension truncation (serve a 4-8× cheaper prefix
    index if recall holds; at 100 TB the prefix index is proportionally
    smaller in RAM and shuffle). Same round-before-rank cosine and
    (sim desc, id asc) tie-break as every ANN gate, so the twin replays
    the ranking exactly; 15 rows (3 dims × 5 queries)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    exact = SIM.cosine_topk(emb, q, "vec_id", "embedding", k=5)
    out = None
    for d in (8, 16, 32):
        se = emb.select("vec_id", F.slice("embedding", 1, d).alias("embedding"))
        sq = se.where(F.col("vec_id") < 5)
        appr = SIM.cosine_topk(se, sq, "vec_id", "embedding", k=5)
        r = SIM.topk_recall(exact, appr).withColumn("dim", F.lit(d).cast("long"))
        out = r if out is None else out.unionByName(r)
    return out.select(
        "dim", "query_id", F.col("n_exact").cast("long").alias("n_exact"),
        "n_overlap", "recall",
    )

def _q_rocchio_confusion(spark, sf_dir):
    """Nearest-centroid confusion matrix (operators/similarity.py:
    nearest_centroid_confusion) — the is-it-linearly-classifiable
    eval on the labeled embedding table; quantized-integer cosines,
    deterministic argmax."""
    return SIM.nearest_centroid_confusion(_t(spark, sf_dir, "embeddings"))

def _q_ann_hubness(spark, sf_dir):
    """k-occurrence hubness audit (operators/similarity.py:
    knn_hubness) — is the cosine k-NN digraph hub-distorted; exact
    quantized top-k on the deterministic 1/8 slice, zero-occurrence
    vectors included in the skew."""
    from metis_spark.driver.common import HUBNESS_K, HUBNESS_MOD

    return SIM.knn_hubness(
        _t(spark, sf_dir, "embeddings"), mod=HUBNESS_MOD, k=HUBNESS_K
    )

def _q_intrinsic_dimension(spark, sf_dir):
    """Two-NN intrinsic-dimension estimate (operators/similarity.py:
    intrinsic_dimension) — predicts how hard the embedding can be
    truncated/quantized; exact-integer distance ratios on the 1/8
    slice."""
    from metis_spark.driver.common import HUBNESS_MOD

    return SIM.intrinsic_dimension(_t(spark, sf_dir, "embeddings"), mod=HUBNESS_MOD)

def _q_embedding_norm_profile(spark, sf_dir):
    """Embedding norm-geometry card → one row (n_vectors, min_nsq,
    max_nsq, mean_nsq_micro, cv2_micro, frac_unit_micro): moments of
    the exact quantized squared L2 norm plus the share of vectors
    within ±2% of unit norm — the precondition audit for every
    cosine-vs-dot choice downstream (a normalized table makes dot ≡
    cosine and SQ8/PQ error isotropic; a wide norm spread says
    normalize first or switch metrics). Complements
    embedding_cos_histogram (angles) with the radial axis.

    Exactness: nsq = Σ floor(v·1000)² is an exact integer; moments
    ride decimal/HUGEINT; cv² = n·Σnsq²/(Σnsq)² − 1 is the single
    double; the unit band compare is integer vs literal bounds."""
    pts = _t(spark, sf_dir, "embeddings").select(
        F.aggregate(
            F.transform(
                F.col("embedding"),
                lambda v: F.floor(v.cast("double") * F.lit(1000.0)).cast("long"),
            ),
            F.lit(0).cast("decimal(38,0)"),
            lambda acc, q: acc + q * q,
        ).alias("nsq")
    )
    dec = "decimal(38,0)"
    lo, hi = 960_400, 1_040_400  # (0.98·1000)², (1.02·1000)²
    return pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.min("nsq").cast("long").alias("min_nsq"),
        F.max("nsq").cast("long").alias("max_nsq"),
        F.sum("nsq").cast(dec).alias("s1"),
        F.sum(F.col("nsq") * F.col("nsq")).cast(dec).alias("s2"),
        F.sum(
            ((F.col("nsq") >= lo) & (F.col("nsq") <= hi)).cast("long")
        ).cast("long").alias("n_unit"),
    ).select(
        "n_vectors",
        "min_nsq",
        "max_nsq",
        F.expr("(cast(1000000 as decimal(38,0)) * s1) div n_vectors")
        .cast("long").alias("mean_nsq_micro"),
        F.round(
            (
                F.col("n_vectors").cast(dec) * F.col("s2")
            ).cast("double")
            / (F.col("s1") * F.col("s1")).cast("double")
            * F.lit(1e6)
            - F.lit(1e6)
        ).cast("long").alias("cv2_micro"),
        F.expr("(1000000 * n_unit) div n_vectors").cast("long").alias("frac_unit_micro"),
    )

def _q_media_frame_plan(spark, sf_dir):
    """Multimodal: the frame/window sampling PLAN sample_frames
    executes — per audio/video item (media_id, kind, duration_ms,
    n_frames, stride): n_frames = max(1, duration div 500ms), stride
    the byte step between slice reads. Computed off the REAL binary
    decode (durations parsed from WAV/MP4 bytes), so the closed-form
    oracle round-trips the parser again through different arithmetic;
    the per-frame digests themselves are pytest-pinned (sha256 not
    SQL-expressible)."""
    from metis_spark.operators.multimodal import decode_media, synthesize_media

    dec = decode_media(synthesize_media(spark, N_MEDIA))
    av = dec.where(F.col("kind").isin("audio", "video")).select(
        "media_id",
        "kind",
        F.coalesce("duration_ms", F.lit(0)).cast("long").alias("duration_ms"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
    )
    nf = F.greatest(F.lit(1).cast("long"), F.expr("duration_ms div 500"))
    return av.select(
        "media_id",
        "kind",
        "duration_ms",
        nf.alias("n_frames"),
        F.expr(
            "n_bytes div greatest(cast(1 as bigint), duration_ms div 500)"
        ).cast("long").alias("stride"),
    )

def _q_label_balance_card(spark, sf_dir):
    """Label-balance card for the embedding table → one row
    (n_labels, n_vectors, max_share_micro, balance_entropy_micro,
    imbalance_ratio_micro): majority-class share, label entropy, and
    max/min class ratio — the check that contextualizes every
    classifier number downstream (rocchio_confusion's accuracy means
    nothing against a 90% majority class). Integer-exact entropy via
    the per-class c·ln c micro fold."""
    emb = _t(spark, sf_dir, "embeddings")
    cnt = emb.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("c"))
    return cnt.agg(
        F.count(F.lit(1)).cast("long").alias("n_labels"),
        F.sum("c").cast("long").alias("n_vectors"),
        F.max("c").cast("long").alias("cmax"),
        F.min("c").cast("long").alias("cmin"),
        F.sum(
            F.col("c") * F.round(F.log(F.col("c").cast("double")) * F.lit(1e6)).cast("long")
        ).cast("long").alias("so"),
    ).select(
        "n_labels",
        "n_vectors",
        F.expr("(1000000 * cmax) div n_vectors").cast("long").alias("max_share_micro"),
        (
            F.round(F.log(F.col("n_vectors").cast("double")) * F.lit(1e6)).cast("long")
            - F.expr("so div n_vectors")
        ).cast("long").alias("balance_entropy_micro"),
        F.expr("(1000000 * cmax) div cmin").cast("long").alias("imbalance_ratio_micro"),
    )

def _q_ivf_nprobe_curve(spark, sf_dir):
    """IVF tuning curve → one row per nprobe ∈ {1, 2, 4}: (nprobe,
    n_queries, sum_exact, sum_overlap, mean_recall_micro) — the
    recall-vs-probe-cost trade an ANN operator actually reads before
    picking nprobe (ann_ivf_recall pins the single shipped point;
    this sweeps the dial on the same verified probe chain). The
    exact top-k is computed ONCE and reused across the sweep; recall
    aggregates to an exact integer ratio."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5)
    exact = SIM.cosine_topk(emb, queries_df, "vec_id", "embedding", k=5).select(
        "query_id", "neighbor_id"
    ).persist()
    cent = SIM.ivf_centroids_stride(emb, IVF_STRIDE)
    out = None
    for p in (1, 2, 4):
        approx = SIM.ivf_topk(
            emb, queries_df, cent, "vec_id", "embedding", k=5, nprobe=p
        ).select("query_id", "neighbor_id")
        row = (
            exact.join(approx.withColumn("hit", F.lit(1)), ["query_id", "neighbor_id"], "left")
            .agg(
                F.lit(p).cast("long").alias("nprobe"),
                F.countDistinct("query_id").cast("long").alias("n_queries"),
                F.count(F.lit(1)).cast("long").alias("sum_exact"),
                F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("sum_overlap"),
            )
            .select(
                "nprobe", "n_queries", "sum_exact", "sum_overlap",
                F.expr("(1000000 * sum_overlap) div sum_exact").cast("long")
                .alias("mean_recall_micro"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out

def _q_lsh_tables_curve(spark, sf_dir):
    """Hyperplane-LSH tuning curve → one row per num_tables ∈
    {2, 4, 16}: (num_tables, n_queries, sum_exact, sum_overlap,
    mean_recall_micro) — recall vs candidate-generation cost for the
    LSH path, the measured companion to lsh_parameter_plan's analytic
    banding curve and the LSH twin of ivf_nprobe_curve. Exact top-k
    computed once; recall is an exact integer ratio."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5)
    exact = SIM.cosine_topk(emb, queries_df, "vec_id", "embedding", k=5).select(
        "query_id", "neighbor_id"
    ).persist()
    out = None
    for t in (2, 4, 16):
        approx = SIM.lsh_bucket_topk(
            emb, queries_df, "vec_id", "embedding", k=5, dim=64,
            num_tables=t, num_planes=ANN_PLANES,
        ).select("query_id", "neighbor_id")
        row = (
            exact.join(
                approx.withColumn("hit", F.lit(1)), ["query_id", "neighbor_id"], "left"
            )
            .agg(
                F.lit(t).cast("long").alias("num_tables"),
                F.countDistinct("query_id").cast("long").alias("n_queries"),
                F.count(F.lit(1)).cast("long").alias("sum_exact"),
                F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("sum_overlap"),
            )
            .select(
                "num_tables", "n_queries", "sum_exact", "sum_overlap",
                F.expr("(1000000 * sum_overlap) div sum_exact").cast("long")
                .alias("mean_recall_micro"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
