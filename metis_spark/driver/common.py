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


GRAPH_MOD = 301  # vertex-space size of the testdata-derived graph

PR_ITERS = 5

CC_ROUNDS = 8  # graph diameter at every sf is ≤ 4; min-propagation needs ≤ diameter+1

LPA_ROUNDS = 2

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

def _round_half_away(x: float, digits: int) -> float:
    """Half-away-from-zero rounding — the DuckDB ROUND / Spark F.round
    convention. Python's built-in round() is banker's (half-to-even), so
    any DRIVER-side rounding of a value the oracle replays must use this
    instead (a mean landing exactly on a .5 boundary would otherwise
    diverge between engines)."""
    import math

    p = 10.0 ** digits
    return math.copysign(math.floor(abs(x) * p + 0.5), x) / p

def _tmpdir(prefix: str) -> str:
    """Checkpoint scratch dir removed at interpreter exit (the driver gate
    runs 40+ queries in one process — unbounded /tmp growth otherwise)."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d

def derived_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dependency-style edge table from lineitem (both the
    Spark queries and the DuckDB oracles derive the identical graph)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            (F.col("l_orderkey") % GRAPH_MOD).alias("src"),
            (F.col("l_partkey") % GRAPH_MOD).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )

_EDGES_SQL = f"""
edges AS MATERIALIZED (
  SELECT DISTINCT l_orderkey % {GRAPH_MOD} AS src, l_partkey % {GRAPH_MOD} AS dst
  FROM lineitem WHERE l_orderkey % {GRAPH_MOD} <> l_partkey % {GRAPH_MOD}
),
verts AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
  ) WHERE src <> dst
)
"""

SPARSE_MOD = 4096  # metrics-pack graph: avg degree ~15 at sf0.01, so the

def derived_und(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric distinct view of derived_edges — the twin of the
    _EDGES_SQL ``und`` CTE."""
    e = derived_edges(spark, sf_dir)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return e.unionByName(rev).where(F.col("src") != F.col("dst")).distinct()

def derived_edges_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            (F.col("l_orderkey") % SPARSE_MOD).alias("src"),
            (F.col("l_partkey") % SPARSE_MOD).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )

_EDGES_SPARSE_SQL = f"""
edges AS MATERIALIZED (
  SELECT DISTINCT l_orderkey % {SPARSE_MOD} AS src, l_partkey % {SPARSE_MOD} AS dst
  FROM lineitem WHERE l_orderkey % {SPARSE_MOD} <> l_partkey % {SPARSE_MOD}
),
und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
  ) WHERE src <> dst
)
"""

SESSION_GAP_MIN = 30  # session-window inactivity gap (minutes)

PR_CONV_TOL = 1e-12  # both engines land within ~1e-12 L1 of the unique

PR_CONV_ORACLE_ITERS = 30  # cold power iteration needs ≤18 at either sf

# heat-kernel PPR (plans/diffusion.py): t = HK_T_NUM/HK_T_DEN, truncated
# at HK_TERMS Taylor terms (t^k/k! < 1% of peak past k=6 for t=3)
HK_SEED_MOD = 10
HK_T_NUM, HK_T_DEN = 3, 1
HK_TERMS = 6
HK_SCALE = 10**12
HK_TOPK = 20

# quantized PageRank convergence trajectory (plans/diffusion.py)
PRDC_ITERS = 8
PRDC_SCALE = 10**12

ROB_KS = (0, 8, 64)  # hubs removed per robustness point

ROB_ROUNDS = 24  # min-label flood unroll for the REDUCED graphs (hub

def _robustness(spark, sf_dir, mode: str):
    """Shared robustness engine: remove k vertices per point — the top-k
    by degree (``attack``) or a deterministic hash-k-subset
    (``failure``, the random-removal control) — and report the
    surviving component structure. The attack/failure CONTRAST is the
    Albert/Jeong/Barabási analysis."""
    e = derived_edges_sparse(spark, sf_dir)
    und = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    n_all = deg.count()
    out_rows = []
    for k in ROB_KS:
        if mode == "attack":
            ranked = deg.orderBy(F.desc("deg"), F.asc("id"))
        else:  # failure: uniform-by-hash removal, degree-blind
            ranked = deg.orderBy(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit("rf"), F.col("id").cast("string"))), 1, 15),
                    16, 10,
                ).cast("long").asc(),
                F.asc("id"),
            )
        hubs = [r["id"] for r in ranked.limit(k).collect()]
        red = und.where(~F.col("src").isin(hubs) & ~F.col("dst").isin(hubs))
        if red.isEmpty():
            out_rows.append((k, n_all - k, n_all - k, 1 if n_all > k else 0))
            continue
        labels, info = connected_components(
            red, checkpoint_dir=_tmpdir(f"metis_qrob{k}_")
        )
        # the oracle floods a FIXED ROB_ROUNDS; if hub removal stretched a
        # component's min-label eccentricity past that, fail HERE with a
        # clear message instead of an opaque hash mismatch (bowtie pattern)
        assert info["converged"] and info["iterations"] < ROB_ROUNDS, (
            f"robustness k={k}: CC took {info['iterations']} rounds; "
            f"raise ROB_ROUNDS (> {ROB_ROUNDS}) so the SQL twin's unroll "
            "covers the reduced graph's diameter"
        )
        agg = labels.groupBy("component").agg(F.count(F.lit(1)).alias("n"))
        row = agg.agg(
            F.count(F.lit(1)).cast("long").alias("nc"),
            F.max("n").cast("long").alias("big"),
            F.sum("n").cast("long").alias("nv"),
        ).collect()[0]
        n_left = n_all - k
        singles = n_left - int(row["nv"])
        out_rows.append((k, n_left, int(row["nc"]) + singles, int(row["big"])))
    return spark.createDataFrame(
        out_rows, "k_removed long, n_left long, n_components long, largest_cc long"
    )

SCAN_EPS_NUM, SCAN_EPS_DEN, SCAN_MU = 3, 20, 3  # sigma >= 0.15, core needs
# mu-sized eps-neighborhood: all four roles populated at sf0.01 (38
# clusters), three at sf0.001 (probed over the sparse graph's sigma
# distribution; a denser threshold empties sf0.01, a looser one merges
# sf0.001 into one blob)

SCAN_CC_ROUNDS = 12  # min-label unroll depth over the core-core similar
# subgraph; measured convergence by round 8 at both SFs, asserted
# engine-side (plans/scan.py) like ROB_ROUNDS

COMPONENT_PROFILE_ROUNDS = 12  # min-label unroll depth for the oracle;

SLPA_ROUNDS = 4  # fixed sweeps (oracle-unrollable); unreached stay NULL

SLPA_SEED_MOD = 97  # deterministic seed set: id % 97 == 0, label = id

SSSP_ROUNDS = 6  # ≥ graph diameter (≤4 at every sf) so BFS has converged

SSSP_W_ROUNDS = 8  # weighted relaxation converges in ≤6 rounds at every sf

_W_EXPR = "(src * 7 + dst * 13) % 10 + 1"

WIDEST_ROUNDS = 12  # max-min fixpoint horizon; the query asserts the

N_LANDMARKS = 3

def _landmark_sources(spark, sf_dir) -> list[int]:
    edges = derived_edges(spark, sf_dir)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return [
        r["id"] for r in verts.orderBy("id").limit(N_LANDMARKS).collect()
    ]

CENTER_K = 5

N_WALKS = 64

WALK_LEN = 8

def _walks_ctes() -> str:
    ctes = [
        _EDGES_SQL.strip(),
        f"w0 AS MATERIALIZED (SELECT id AS walk_id, 0::BIGINT AS step, id AS v "
        f"FROM (SELECT id FROM verts ORDER BY id LIMIT {N_WALKS}))",
    ]
    for t in range(1, WALK_LEN + 1):
        ctes.append(
            f"w{t} AS MATERIALIZED (SELECT walk_id, {t}::BIGINT AS step, dst AS v FROM ("
            f"SELECT w.walk_id, e.dst, ROW_NUMBER() OVER (PARTITION BY w.walk_id "
            f"ORDER BY (w.walk_id*1000003 + {t}*10007 + e.dst*31337) % 1000000007, e.dst"
            f") AS rn FROM w{t - 1} w JOIN edges e ON e.src = w.v) WHERE rn = 1)"
        )
    return ",\n".join(ctes)

N2V_P, N2V_Q = 3, 2  # integer bias multipliers (return / outward)

def _landmark_ctes() -> str:
    ctes = [
        _EDGES_SQL.strip(),
        f"srcs AS (SELECT id FROM verts ORDER BY id LIMIT {N_LANDMARKS})",
        "d0 AS (SELECT id, id AS source, 0::BIGINT AS dist FROM srcs)",
    ]
    for i in range(1, SSSP_ROUNDS + 1):
        p = i - 1
        ctes.append(
            f"d{i} AS (SELECT id, source, MIN(dist)::BIGINT AS dist FROM ("
            f"SELECT e.dst AS id, d.source, d.dist + 1 AS dist "
            f"FROM edges e JOIN d{p} d ON e.src = d.id "
            f"UNION ALL SELECT id, source, dist FROM d{p}) GROUP BY id, source)"
        )
    return ",\n".join(ctes)

WS_K = 100

LP_EVAL_K = 200  # precision@k cutoff

LP_HOLD_MOD = 4  # hold out ~25% of canonical und pairs by hash

LP_NEG_VSAMP_MOD = 16  # vertex-sample modulus for negative-pair generation

_CSR_GAP_SQL_TMPL = """
WITH {edges},
gaps AS (SELECT src, dst - LAG(dst) OVER (PARTITION BY src ORDER BY dst) AS gap
         FROM und)
SELECT (length(bin(gap)) - 1)::BIGINT AS gap_bucket, COUNT(*)::BIGINT AS n_gaps
FROM gaps WHERE gap IS NOT NULL GROUP BY 1
"""

N_MEDIA = 200

KCENTER_K = 4

# Kneser-Ney bigram smoothing (operators/corpus_stats.py:kneser_ney_topk)
KN_TOPK = 30

# Content-defined chunking (operators/dedup.py:cdc_chunk_dedup)
CDC_DIV = 64
CDC_MIN_LEN = 8
CDC_TOPK = 20

# TextRank (operators/corpus_stats.py:textrank_top_sentences)
TR_MIN_SHARED = 2
TR_ITERS = 3
TR_SCALE = 10**9

# Facility-location greedy (operators/similarity.py:facility_location_seeds)
FL_K = 4
FL_POOL = 32

# MMR diverse selection (operators/similarity.py:mmr_topk): k greedy
# picks from a relevance-pruned pool (λ = 7/10 as integer literals)
MMR_K = 8
MMR_POOL = 64

def _kcenter_cos(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)) "
        f"/ (sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE))) "
        f"* sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE))))"
    )

HARDNEG_K = 3

LVO_K = 200  # per-language vocabulary head size

ANN_TABLES, ANN_PLANES = 16, 3       # lsh_bucket_topk / recall-gate params

NEARDUP_TABLES, NEARDUP_PLANES = 24, 3  # sized so every ≥0.4 pair collides

IVF_STRIDE, IVF_NPROBE = 25, 4  # 20 lists at sf≤0.01 (80 at sf0.1), probe 4

# quantized Lloyd k-means (operators/similarity.py kmeans_quantized)
KMEANS_K, KMEANS_ITERS, KMEANS_SCALE = 8, 3, 1000
SEMDEDUP_TAU = 0.40  # ~99.95th pct of the synthetic cosine distribution

# DSIR importance scoring (operators/corpus_stats.py dsir_logratio)
DSIR_BUCKETS, DSIR_TARGET = 1024, "en"

HH_MIN_COUNT = 60

CONTAM_K = 5  # decontamination gram width (distinct 5-grams per doc)

CONTAM_BENCH_MOD, CONTAM_BENCH_REM = 11, 3  # deterministic "benchmark" slice

BOILER_MIN_DOCS = 4  # 3-grams in ≥4 docs are corpus-boilerplate (measured:

CHUNK_TOK, CHUNK_STRIDE = 64, 48  # context-window slicing: 64-token

ZIPF_TOPN = 100  # fit over the vocab head (the tail is count-quantized)

SHARD_BUDGET = 2048  # tokens per training shard

SHARD_BUCKET = 64  # prefix-sum bucket granularity (doc_id range per bucket)

FUNNEL_MIN_TOKENS = 10

FUNNEL_MIN_QUALITY = 0.5

_PII_SUFFIX_SPARK = lambda: F.concat(  # noqa: E731
    F.col("text"),
    F.lit(" contact user"),
    F.col("doc_id").cast("string"),
    F.lit("@example.com ip 10.0."),
    (F.col("doc_id") % 256).cast("string"),
    F.lit(".1"),
)

_LANG_MARKERS = {
    "de": r"\b(der|die|das|und|ist)\b",
    "en": r"\b(the|and|of|to|is)\b",
    "es": r"\b(el|la|y|los|es)\b",
    "fr": r"\b(le|la|et|les|est)\b",
}

OOV_VOCAB_K = 100  # head-vocabulary size for the coverage audit

LINKPRED_K = 50

HUB_CAP = 128  # wedge-center degree bound for the link predictors

CI_K = 100  # collective-influence top-k report size

LEADERRANK_ITERS = 5  # fixed ground-walk sweeps (oracle-unrollable)

DDIC_K = 16  # degree-discount seed-set size

KPEAK_ROUNDS = 5  # contour unroll bound (measured 3 at sf0.001 / 3 at sf0.01)

DISPARITY_ALPHA_MICRO = 50_000  # backbone significance level (alpha = 0.05)

PMI_MIN_COUNT = 5  # collocation noise floor

BPE_K = 8  # BPE merge steps trained by the driver query

SPEAR_K = 256  # rank-correlation head size

TPR_EPOCHS = 8  # temporal-pagerank epoch buckets

WINNOW_K = 5  # winnowing k-gram length
WINNOW_W = 4  # winnowing window
WINNOW_DF_CAP = 64  # boilerplate-fingerprint df bound
WINNOW_TOP = 50

COVER_K = 8  # greedy max-cover seed count
TPR_BETA = 0.5  # per-epoch transfer fraction
PMI_K = 50  # collocation report size
DDIC_P_TENTHS = 1  # IC propagation probability in tenths (p = 0.1)

SWEEP_L = 64

SWEEP_SEED_MOD = 97

SWEEP_ITERS = 5

EMB_K = 100

SCANSTAT_K = 100

COOC_K, COOC_CAP = 50, 100

SCC_PHASES, SCC_ROUNDS = 3, 10  # measured: 2 phases at sf0.001, 1 at sf0.01;

BOWTIE_REACH_ROUNDS = 24  # reach-fixpoint unroll for the bow-tie BFS

DAG_ROUNDS = 6  # ≥ condensation-DAG longest path at every sf (measured ≤ 1)

DEG_PCTS = [0.5, 0.9, 0.99, 1.0]

CROSS_N = 5  # threshold-crosser count

DEDUP_CC_ROUNDS = 8  # candidate-graph diameter bound for the unrolled oracle

KATZ_ALPHA = 0.01

KATZ_ITERS = 5

HITS_ITERS = 3

SALSA_ITERS = 3

PSALSA_SEED_MOD = 10  # personalized-SALSA seed rule, same as ppr_5iter

RICH_CLUB_KS = [4, 8, 16, 32]  # degree thresholds; spine rows survive n_k=0

KCORE_K = 3

KCORE_ORACLE_ROUNDS = 12  # oracle unroll depth; fixpoint is idempotent so

CORENESS_ORACLE_ROUNDS = 18  # measured h-index fixpoint: 8 / 14 rounds

WCORE_W_MOD = 7  # md5-hash edge weights in 1..7 — small integer

WCORENESS_ORACLE_ROUNDS = 32  # measured weighted fixpoint: 27 / 23

CORENESS_DEC_MOD = 5  # deletion rule: drop sparse edges with

DENSEST_EPS_TENTHS = 5  # eps=0.5: the standard 3-approx threshold 3e/n

DENSEST_ORACLE_ROUNDS = 26  # >= log_{1.5}(n) at the gate scales (each

WL_ROUNDS = 3

N_BETW_SOURCES = 8

BETW_ROUNDS = 10  # ≥ measured source eccentricity on the sparse graph

KTRUSS_K = 4

KTRUSS_ORACLE_ROUNDS = 10  # oracle unroll depth; peeling fixpoint is

ANF_ROUNDS = 3  # out-reach horizon: exact pair table stays feasible (≤7M

ANF_MASKS = 32  # FM sketches per vertex: 256 B state, ~10% curve error

def _anf_masks_ctes() -> list:
    """Shared CTE chain reproducing plans/anf.py's FM masks bit-exactly:
    per (id, m) 60-bit md5 hash → trailing-zero bit, then per-round
    self ∪ out-neighbor bit_or folds (identical recurrence)."""
    ctes = [
        _EDGES_SPARSE_SQL.strip().rstrip(),
        "averts AS MATERIALIZED (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges))",
        f"msel AS MATERIALIZED (SELECT m FROM range(0, {ANF_MASKS}) t(m))",
        "mk0 AS MATERIALIZED (SELECT id, m, CASE WHEN h = 0 THEN (2**59)::BIGINT "
        "ELSE (2**bit_count((h & -h) - 1))::BIGINT END AS mask FROM ("
        "SELECT v.id, s.m, ('0x' || substr(md5('anf:' || s.m || ':' || v.id), 1, 15))::BIGINT AS h "
        "FROM averts v CROSS JOIN msel s))",
    ]
    for i in range(1, ANF_ROUNDS + 1):
        p = i - 1
        ctes.append(
            f"mk{i} AS MATERIALIZED (SELECT id, m, bit_or(mask) AS mask FROM ("
            f"SELECT id, m, mask FROM mk{p} UNION ALL "
            f"SELECT e.src AS id, k.m, k.mask FROM edges e JOIN mk{p} k ON e.dst = k.id"
            f") GROUP BY id, m)"
        )
    return ctes

DIAM_ROUNDS = 16  # ≥ measured double-sweep eccentricities on the sparse graph

LOUVAIN_ROUNDS = 2

def _louvain_level2_ctes(
    rounds: int, member: str | None = None, member_col: str = "label",
    init_sql: str | None = None,
) -> list:
    """The unrolled level-2 CTE chain on top of a membership CTE
    (default l{rounds}): quotient multigraph (qe/qstr/qeo) + ``rounds``
    weighted sweeps → q{rounds}. ``member``/``member_col`` select the
    partition to coarsen on; ``init_sql`` overrides the q0 starting
    labels (default: identity) — Leiden coarsens on the REFINED
    partition and seeds q0 with phase-1 labels."""
    r = rounds
    mem = member or f"l{r}"
    mc = member_col
    ctes = [
        f"qe AS MATERIALIZED (SELECT la.{mc} AS src, lb.{mc} AS dst, "
        f"COUNT(*)::BIGINT AS w FROM und e JOIN {mem} la ON e.src = la.id "
        f"JOIN {mem} lb ON e.dst = lb.id GROUP BY la.{mc}, lb.{mc})",
        "qstr AS MATERIALIZED (SELECT src AS id, SUM(w)::BIGINT AS s "
        "FROM qe GROUP BY src)",
        "qeo AS MATERIALIZED (SELECT src, dst, w FROM qe WHERE src <> dst)",
        "q0 AS MATERIALIZED ("
        + (init_sql or "SELECT id, id AS label FROM qstr")
        + ")",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"qtot{i} AS MATERIALIZED (SELECT l.label, SUM(d.s)::BIGINT AS tot "
            f"FROM q{p} l JOIN qstr d ON l.id = d.id GROUP BY l.label)"
        )
        ctes.append(
            f"qkvc{i} AS MATERIALIZED (SELECT e.src AS id, l.label AS c, "
            f"SUM(e.w)::BIGINT AS kvc FROM qeo e JOIN q{p} l ON e.dst = l.id "
            f"GROUP BY e.src, l.label)"
        )
        ctes.append(
            f"qcand{i} AS MATERIALIZED (SELECT id, c, MAX(kvc)::BIGINT AS kvc FROM ("
            f"SELECT id, c, kvc FROM qkvc{i} UNION ALL "
            f"SELECT id, label AS c, 0::BIGINT AS kvc FROM q{p}) GROUP BY id, c)"
        )
        ctes.append(
            f"qsc{i} AS MATERIALIZED (SELECT x.id, x.c, "
            f"ROUND(x.kvc / (SELECT m FROM mm) - (d.s * (t.tot - "
            f"CASE WHEN x.c = l.label THEN d.s ELSE 0 END)) "
            f"/ (2.0 * (SELECT m FROM mm) * (SELECT m FROM mm)), 9) AS g9 "
            f"FROM qcand{i} x JOIN q{p} l ON x.id = l.id "
            f"JOIN qstr d ON x.id = d.id JOIN qtot{i} t ON x.c = t.label)"
        )
        ctes.append(
            f"q{i} AS MATERIALIZED (SELECT id, c AS label FROM ("
            f"SELECT id, c, ROW_NUMBER() OVER (PARTITION BY id "
            f"ORDER BY g9 DESC, c ASC) AS rn FROM qsc{i}) WHERE rn = 1)"
        )
    return ctes

def _louvain_level1_ctes(rounds: int) -> list:
    """The shared unrolled level-1 CTE chain (ends at l{rounds})."""
    ctes = [
        _EDGES_SPARSE_SQL.strip().rstrip(),
        "ldeg AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS deg "
        "FROM und GROUP BY src)",
        "mm AS (SELECT COUNT(*)/2.0 AS m FROM und)",
        "l0 AS MATERIALIZED (SELECT id, id AS label FROM ldeg)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"tot{i} AS MATERIALIZED (SELECT l.label, SUM(d.deg)::BIGINT AS tot "
            f"FROM l{p} l JOIN ldeg d ON l.id = d.id GROUP BY l.label)"
        )
        ctes.append(
            f"kvc{i} AS MATERIALIZED (SELECT e.src AS id, l.label AS c, "
            f"COUNT(*)::BIGINT AS kvc FROM und e JOIN l{p} l ON e.dst = l.id "
            f"GROUP BY e.src, l.label)"
        )
        ctes.append(
            f"cand{i} AS MATERIALIZED (SELECT id, c, MAX(kvc)::BIGINT AS kvc FROM ("
            f"SELECT id, c, kvc FROM kvc{i} UNION ALL "
            f"SELECT id, label AS c, 0::BIGINT AS kvc FROM l{p}) GROUP BY id, c)"
        )
        ctes.append(
            f"sc{i} AS MATERIALIZED (SELECT x.id, x.c, "
            f"ROUND(x.kvc / (SELECT m FROM mm) - (d.deg * (t.tot - "
            f"CASE WHEN x.c = l.label THEN d.deg ELSE 0 END)) "
            f"/ (2.0 * (SELECT m FROM mm) * (SELECT m FROM mm)), 9) AS g9 "
            f"FROM cand{i} x JOIN l{p} l ON x.id = l.id "
            f"JOIN ldeg d ON x.id = d.id JOIN tot{i} t ON x.c = t.label)"
        )
        ctes.append(
            f"l{i} AS MATERIALIZED (SELECT id, c AS label FROM ("
            f"SELECT id, c, ROW_NUMBER() OVER (PARTITION BY id "
            f"ORDER BY g9 DESC, c ASC) AS rn FROM sc{i}) WHERE rn = 1)"
        )
    return ctes

LEIDEN_REFINE_ROUNDS = 2  # deterministic singleton-merge refinement sweeps

NUCLEUS_ORACLE_ROUNDS = 6  # ≥ measured triangle-h-index fixpoint (1 at
# sf0.001/sf0.01, 5 at the sf0.1 bench graph); extra unrolled rounds
# past the fixpoint are no-ops for the monotone h-index, so the oracle
# only pays two more cheap joins at gate scales

SIMRANK_CAP = 24  # degree cap bounding pair-closure growth at |pairs|·cap²/level
SIMRANK_VSAMP_MOD = 32  # vertex-sample modulus for the bounded eval-pair set
SIMRANK_ITERS = 2  # SimRank levels (s_2 needs a 1-level pair closure)
SIMRANK_K = 64  # top-k pairs emitted

def _leiden_refine_ctes(rounds: int, refine_rounds: int) -> list:
    """Unrolled Leiden refinement twin on top of l{rounds}
    (plans/leiden.py): per round, singleton vertices propose the
    max-gain refined community among neighbours INSIDE their phase-1
    community (ROUND(gain,9) > 0, ties to smallest label); a proposal
    is accepted iff the target is not itself moving, or the move is
    mutual and the proposer has the larger id. Ends at r{refine_rounds}
    (id, rl)."""
    r = rounds
    ctes = [
        f"ec AS MATERIALIZED (SELECT e.src, e.dst FROM und e "
        f"JOIN l{r} a ON e.src = a.id JOIN l{r} b ON e.dst = b.id "
        f"AND a.label = b.label)",
        "r0 AS MATERIALIZED (SELECT id, id AS rl FROM ldeg)",
    ]
    for i in range(1, refine_rounds + 1):
        p = i - 1
        ctes.append(
            f"rsz{i} AS MATERIALIZED (SELECT rl, COUNT(*)::BIGINT AS nn "
            f"FROM r{p} GROUP BY rl)"
        )
        ctes.append(
            f"rtot{i} AS MATERIALIZED (SELECT x.rl, SUM(d.deg)::BIGINT AS tot "
            f"FROM r{p} x JOIN ldeg d ON x.id = d.id GROUP BY x.rl)"
        )
        ctes.append(
            f"rkvc{i} AS MATERIALIZED (SELECT e.src AS id, t.rl AS c, "
            f"COUNT(*)::BIGINT AS kvc FROM ec e JOIN r{p} t ON e.dst = t.id "
            f"GROUP BY e.src, t.rl)"
        )
        ctes.append(
            f"rprop{i} AS MATERIALIZED (SELECT id, c FROM ("
            f"SELECT s.id, s.c, ROW_NUMBER() OVER (PARTITION BY s.id "
            f"ORDER BY s.g9 DESC, s.c ASC) AS rn FROM ("
            f"SELECT k.id, k.c, ROUND(k.kvc / (SELECT m FROM mm) - "
            f"(d.deg * t.tot) / (2.0 * (SELECT m FROM mm) * (SELECT m FROM mm)), 9) AS g9 "
            f"FROM rkvc{i} k JOIN r{p} own ON k.id = own.id "
            f"JOIN rsz{i} sz ON own.rl = sz.rl AND sz.nn = 1 "
            f"JOIN ldeg d ON k.id = d.id JOIN rtot{i} t ON k.c = t.rl "
            f"WHERE k.c <> own.rl) s WHERE s.g9 > 0) WHERE rn = 1)"
        )
        ctes.append(
            f"racc{i} AS MATERIALIZED (SELECT p.id, p.c FROM rprop{i} p "
            f"LEFT JOIN rprop{i} q ON p.c = q.id "
            f"WHERE q.id IS NULL OR (q.c = p.id AND p.id > q.id))"
        )
        ctes.append(
            f"r{i} AS MATERIALIZED (SELECT x.id, COALESCE(a.c, x.rl) AS rl "
            f"FROM r{p} x LEFT JOIN racc{i} a ON x.id = a.id)"
        )
    return ctes

COLOR_THIN = 5  # thin the sparse graph so the JP round count stays unrollable

COLOR_ORACLE_ROUNDS = 26  # ≥ measured JP rounds on the thinned graph (9 / 20)

def _coloring_edges(spark, sf_dir):
    """Thinned sparse graph for greedy_coloring: Jones–Plassmann rounds =
    longest priority-decreasing path, which on the full sparse graph
    exceeds what an unrolled oracle can express (79 rounds at sf0.01);
    keeping edges with (src+dst) % COLOR_THIN == 0 bounds it at ~20."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            (F.col("l_orderkey") % SPARSE_MOD).alias("src"),
            (F.col("l_partkey") % SPARSE_MOD).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .where((F.col("src") + F.col("dst")) % COLOR_THIN == 0)
        .distinct()
    )

SPEC_COLOR_ORACLE_ROUNDS = 10  # measured trial-and-revoke fixpoint:

MIS_ORACLE_ROUNDS = 12  # ≥ measured Luby rounds on the sparse graph at all sf

TRUSSNESS_ORACLE_ROUNDS = 40  # measured edge-h-index fixpoint: 3 / 3 / 35

ONION_ROUNDS = 80  # onion layer-count unroll bound (measured 16 / 46 / 57

TRUSS_DEC_MOD = 7  # deletion rule: drop sparse edges with

MSF_ORACLE_ROUNDS = 8  # Borůvka outer unroll: fragments at least halve

MSF_INNER_J = 12  # hash-min contraction unroll per round: ≥ the longest

def _msf_weight_col() -> F.Column:
    """Deterministic distinct edge weight both engines can replay: the
    md5→60-bit trick on the canonical "s_d" pair string."""
    pair = F.concat_ws(
        "_",
        F.least("src", "dst").cast("string"),
        F.greatest("src", "dst").cast("string"),
    )
    return F.conv(F.substring(F.md5(pair), 1, 15), 16, 10).cast("long")

MATCHING_ORACLE_ROUNDS = 12  # locally-dominant rounds unroll: measured

HEC_MAXP = 1 << 60  # heavy-edge priority inversion: p = 2^60 − weight

PARTITION_K = 8  # balanced k-way partition fan-out

PARTITION_EPS10 = 1  # balance slack in tenths: cap = floor(1.1 * n / k)

TEMPORAL_SEED_MOD = 512  # seeds: vertices with id % 512 == 0

TEMPORAL_TS_MOD = 1000  # hash-derived edge timestamps in [0, 1000)

TEMPORAL_ORACLE_ROUNDS = 24  # Bellman-Ford unroll ≥ max hop count of an

TEMPORAL_INF = 1 << 60

AFFINITY_LEVEL = 2  # affinity clustering level: fragments after 2

_TOKS_SQL = (
    "toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
    "x -> x <> '') AS t FROM documents)"
)

_SHINGLES_SQL = (
    "sh AS (SELECT doc_id, CASE WHEN len(t) >= 3 THEN list_distinct(list_transform("
    "range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) "
    "ELSE []::VARCHAR[] END AS s FROM toks)"
)

_MINHASH_CTES = (
    _TOKS_SQL + ", " + _SHINGLES_SQL + ", "
    "ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh), "
    "mh AS (SELECT doc_id, seed, MIN(md5(seed::VARCHAR || '|' || shingle)) AS minhash "
    "FROM ex CROSS JOIN (SELECT unnest(range(0, 8)) AS seed) GROUP BY doc_id, seed), "
    "bands AS (SELECT doc_id, (seed // 2)::INT AS band, "
    "string_agg(minhash, '#' ORDER BY minhash) AS band_key FROM mh GROUP BY doc_id, (seed // 2)::INT), "
    "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a "
    "JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)"
)

_SIMHASH_CTE = (
    _TOKS_SQL + ", "
    "tok_ex AS (SELECT doc_id, unnest(t) AS tok FROM toks), "
    "votes AS (SELECT doc_id, j, SUM(((('0x' || substr(md5(tok), 1, 15))::BIGINT >> j) & 1) * 2 - 1) AS v "
    "FROM tok_ex CROSS JOIN (SELECT unnest(range(0, 60)) AS j) GROUP BY doc_id, j), "
    "sh60 AS (SELECT d.doc_id, COALESCE(s.simhash, 0)::BIGINT AS simhash FROM documents d LEFT JOIN "
    "(SELECT doc_id, SUM(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS simhash "
    "FROM votes GROUP BY doc_id) s ON d.doc_id = s.doc_id)"
)

def _lsh_bucket_expr(t: int, emb: str, num_planes: int = 6, dim: int = 64) -> str:
    """DuckDB twin of similarity.lsh_signature for hash table ``t``: the
    sign-bit string of ``emb`` against md5-derived hyperplanes. Coefficients
    are bit-exact vs the Spark side (60-bit int scaled by 2^-60: exact in
    IEEE754 on both engines)."""
    bits = []
    for p in range(num_planes):
        coef = (
            f"(('0x' || substr(md5('{t}:{p}:' || d::VARCHAR), 1, 15))::BIGINT"
            " / 1152921504606846976.0 * 2.0 - 1.0)"
        )
        dot = f"list_sum(list_transform(range(0, {dim}), d -> {emb}[d + 1]::DOUBLE * {coef}))"
        bits.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
    return " || ".join(bits)

_PAIR_COS_SQL = (
    "list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i]::DOUBLE * cv[i]::DOUBLE)) "
    "/ (sqrt(list_sum(list_transform(qv, x -> x::DOUBLE * x::DOUBLE))) "
    "* sqrt(list_sum(list_transform(cv, x -> x::DOUBLE * x::DOUBLE))))"
)

def _cos_expr(a: str, b: str) -> str:
    """DuckDB cosine(a, b) for arbitrary list-typed SQL expressions."""
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)) "
        f"/ (sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE))) "
        f"* sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE))))"
    )

def _ann_ivf_ctes(stride: int = IVF_STRIDE, nprobe: int = IVF_NPROBE) -> str:
    """CTE chain ending in ``ivf_topk`` = the DuckDB twin of similarity.ivf_topk
    with the stride-sampled coarse quantizer: centroid set, argmax-cosine
    list assignment (ties → min cid), nprobe probe set, final ranking."""
    return f"""
cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % {stride} = 0),
casg AS (
  SELECT vec_id AS neighbor_id, embedding AS cv2, cid FROM (
    SELECT e.vec_id, e.embedding, ct.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY ROUND({_cos_expr('e.embedding', 'ct.cv')}, 6) DESC, ct.cid ASC) AS arn
    FROM embeddings e CROSS JOIN cent ct) WHERE arn = 1),
qprobe AS (
  SELECT query_id, qv, cid FROM (
    SELECT q.vec_id AS query_id, q.embedding AS qv, ct.cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY ROUND({_cos_expr('q.embedding', 'ct.cv')}, 6) DESC, ct.cid ASC) AS prn
    FROM embeddings q CROSS JOIN cent ct WHERE q.vec_id < 5) WHERE prn <= {nprobe}),
ivf_scored AS (
  SELECT p.query_id, a.neighbor_id, ROUND({_cos_expr('p.qv', 'a.cv2')}, 6) AS sim
  FROM qprobe p JOIN casg a ON a.cid = p.cid WHERE a.neighbor_id <> p.query_id),
ivf_topk AS (
  SELECT query_id, neighbor_id, sim, rn FROM (
    SELECT query_id, neighbor_id, sim,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn
    FROM ivf_scored) WHERE rn <= 5)"""

def _ann_lsh_ctes(num_tables: int = ANN_TABLES, num_planes: int = ANN_PLANES) -> str:
    """CTE chain ending in ``lsh_topk`` = the DuckDB twin of lsh_bucket_topk."""
    sig_cols = ", ".join(
        f"{_lsh_bucket_expr(t, 'embedding', num_planes)} AS b{t}" for t in range(num_tables)
    )
    any_band = " OR ".join(f"q.b{t} = c.b{t}" for t in range(num_tables))
    return f"""
sigs AS (SELECT vec_id, embedding, {sig_cols} FROM embeddings),
sq AS (SELECT * FROM sigs WHERE vec_id < 5),
cands AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         q.embedding AS qv, c.embedding AS cv
  FROM sq q JOIN sigs c ON ({any_band})
  WHERE c.vec_id <> q.vec_id
),
lsh_scored AS (SELECT query_id, neighbor_id, ROUND({_PAIR_COS_SQL}, 6) AS sim FROM cands),
lsh_topk AS (
  SELECT query_id, neighbor_id, sim, rn FROM (
    SELECT query_id, neighbor_id, sim,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn
    FROM lsh_scored) WHERE rn <= 5
)"""


EP_PS = (0, 30, 60, 90)  # percent of edges removed per percolation point
EP_ROUNDS = 24  # min-label flood unroll for the percolated graphs (the
# sparser the surviving graph, the longer its min-label eccentricity can
# get; the query asserts the measured CC rounds fit, bowtie pattern)


def _edge_percolation(spark, sf_dir):
    """Bond-percolation curve: remove a deterministic hash-p% of the
    UNDIRECTED edges per point and report surviving component structure
    — the edge-failure complement to the vertex robustness curves
    (attack/failure). The md5-per-canonical-edge selection is shared
    verbatim with the SQL twin."""
    from metis_spark.plans.components import connected_components

    e = derived_edges_sparse(spark, sf_dir)
    und = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    n_all = (
        und.select(F.col("src").alias("id")).distinct().count()
    )
    u = und.where(F.col("src") < F.col("dst"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("ep"),
                    F.col("src").cast("string"),
                    F.lit("_"),
                    F.col("dst").cast("string"),
                )
            ),
            1, 15,
        ),
        16, 10,
    ).cast("long") % 100
    out_rows = []
    for p in EP_PS:
        kept = u.where(h >= p)
        n_kept = kept.count()
        if n_kept == 0:
            out_rows.append((p, 0, n_all, 1 if n_all else 0))
            continue
        red = kept.unionByName(
            kept.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        labels, info = connected_components(
            red, checkpoint_dir=_tmpdir(f"metis_qep{p}_")
        )
        assert info["converged"] and info["iterations"] < EP_ROUNDS, (
            f"edge_percolation p={p}: CC took {info['iterations']} rounds; "
            f"raise EP_ROUNDS (> {EP_ROUNDS}) so the SQL twin covers it"
        )
        agg = labels.groupBy("component").agg(F.count(F.lit(1)).alias("n"))
        row = agg.agg(
            F.count(F.lit(1)).cast("long").alias("nc"),
            F.max("n").cast("long").alias("big"),
            F.sum("n").cast("long").alias("nv"),
        ).collect()[0]
        singles = n_all - int(row["nv"])
        out_rows.append((p, n_kept, int(row["nc"]) + singles, int(row["big"])))
    return spark.createDataFrame(
        out_rows,
        "p_removed_pct long, n_edges_kept long, n_components long, largest_cc long",
    )

ABCORE_ALPHA = 6  # left (order-side) minimum degree of the (α,β)-core
ABCORE_BETA = 5   # right (part-side) minimum degree
ABCORE_MOD = 4096  # bipartite vertex-space mod (the SPARSE_MOD density)
ABCORE_ROUNDS = 8  # oracle unroll; measured fixpoint ≤3 at both SFs

TRUST_MOD = 7  # TrustRank seed rule: id % TRUST_MOD == TRUST_REM is "trusted"
TRUST_REM = 3  # (deterministic stand-in for the human-curated seed list)

COCIT_K = 50    # co-citation/coupling top-k
COCIT_CAP = 64  # directed wedge-center fan-out cap (the _wedges discipline)

CPM_CC_ROUNDS = 48  # CPM star-graph min-label flood unroll: must cover the
# star-graph eccentricity (measured 38 at sf0.01); the engine spine
# pointer-jumps so its iteration count is smaller — its assert is a
# sanity bound, not the depth guard
CPM_PACK = 1 << 21  # packed-triangle-id radix (must match plans/cpm.py)

PQ_M = 4      # product-quantization subspaces (64 dims -> 4 x 16)
PQ_K = 16     # sub-codebook size
PQ_ITERS = 2  # Lloyd rounds per subspace (engine-exact, twin-unrolled)

PQ_TOPK = 20  # ADC self-query neighbor count

WING_MOD = 512   # denser bipartite mod so butterflies exist at sf0.001
WING_K = 4       # k-wing: every edge in >= 4 butterflies
WING_ROUNDS = 12 # oracle unroll; engine asserts fixpoint <= this

HT_ITERS = 8        # truncated hitting-time value-iteration rounds
HT_CAP_STEPS = 50   # truncation cap (steps)
HT_MICRO = 1_000_000

TIP_K = 50  # per-vertex butterfly top-k

MIRROR_K = 50      # mirror-pair top-k
MIRROR_HASHES = 4  # minhash functions over out-neighborhoods
MIRROR_BANDS = 2   # LSH bands (rows = hashes/bands)

HL_ITERS = 8   # harmonic-function value-iteration rounds
HL_NEG_REM = 5 # negative seeds: id % TRUST_MOD == HL_NEG_REM

KATZI_K = 100  # truncated-Katz link-prediction report size

KATZI_BETA_DEN = 8  # Katz beta = 1/8: katz_scaled = 8*paths2 + paths3

TT_DELTA = 100  # temporal-triangle motif window (of the TEMPORAL_TS_MOD range)

def temporal_edges_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed sparse edges with the hash-derived timestamps the whole
    temporal family shares (twin of the oracle `te` CTE)."""
    e = derived_edges_sparse(spark, sf_dir)
    return e.select(
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

EDH_MOD = 8  # cosine-histogram vertex sample: two disjoint 1/8 slices

HUBNESS_MOD = 8  # hubness slice: one 1/8 residue class (cos-histogram discipline)
HUBNESS_K = 5  # neighbour-list size for the k-occurrence counts
BURROWS_F = 30  # Burrows' Delta feature count (top-F corpus tokens)

# Riondato–Kornaropoulos sample-size planner grid: (ε, δ) with the
# c/ε² factor and ln(1/δ) Python-computed to integer micro LITERALS
# shared by both engines (the Benford discipline — no query-time
# transcendentals). c = 0.5, the universal VC constant.
BETW_PLAN_GRID = [
    (
        int(round(eps * 1e6)),
        int(round(delta * 1e6)),
        int(round(0.5 / (eps * eps) * 1e6)),
        int(round(__import__("math").log(1.0 / delta) * 1e6)),
    )
    for eps in (0.05, 0.1)
    for delta in (0.1, 0.01)
]
TRI_INS_MOD = 7  # triangle-maintenance pseudo-insert batch selector

# DP-release noise planner grid: (ε, Laplace scale b = 1/ε, p95 |noise|
# = b·ln 20) as Python-computed micro literals (Benford discipline)
DP_PLAN_GRID = [
    (
        int(round(eps * 1e6)),
        int(round(1e6 / eps)),
        int(round(__import__("math").log(20.0) * 1e6 / eps)),
    )
    for eps in (0.1, 1.0)
]
# spam-marker blocklist for the rate filter (generic markers, shared
# verbatim by engine and twin)
BLOCKLIST_TERMS = ("buy", "free", "click", "subscribe", "winner")
