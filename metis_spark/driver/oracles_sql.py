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

from metis_spark.driver.common import IVF_STRIDE, _SIMHASH_CTE, _ann_ivf_ctes, _ann_lsh_ctes, ABCORE_ALPHA, ABCORE_BETA, ABCORE_MOD, ABCORE_ROUNDS, ANF_MASKS, EP_PS, EP_ROUNDS, ANF_ROUNDS, BETW_ROUNDS, BOILER_MIN_DOCS, BOWTIE_REACH_ROUNDS, CC_ROUNDS, CHUNK_STRIDE, CHUNK_TOK, COLOR_ORACLE_ROUNDS, COLOR_THIN, COMPONENT_PROFILE_ROUNDS, CONTAM_BENCH_MOD, CONTAM_BENCH_REM, CONTAM_K, CORENESS_DEC_MOD, CORENESS_ORACLE_ROUNDS, DAG_ROUNDS, DEDUP_CC_ROUNDS, DENSEST_EPS_TENTHS, DENSEST_ORACLE_ROUNDS, DIAM_ROUNDS, EMB_K, GRAPH_MOD, HEC_MAXP, HITS_ITERS, HUB_CAP, KATZ_ALPHA, KATZ_ITERS, KCENTER_K, KCORE_K, KMEANS_ITERS, KMEANS_K, KMEANS_SCALE, SEMDEDUP_TAU, _cos_expr, DSIR_BUCKETS, DSIR_TARGET, KCORE_ORACLE_ROUNDS, KTRUSS_K, KTRUSS_ORACLE_ROUNDS, BPE_K, COVER_K, DDIC_K, DDIC_P_TENTHS, KPEAK_ROUNDS, LEADERRANK_ITERS, LOUVAIN_ROUNDS, LPA_ROUNDS, LP_EVAL_K, LP_HOLD_MOD, LP_NEG_VSAMP_MOD, LVO_K, MATCHING_ORACLE_ROUNDS, MIS_ORACLE_ROUNDS, MSF_INNER_J, MSF_ORACLE_ROUNDS, N2V_P, N2V_Q, N_BETW_SOURCES, N_MEDIA, N_WALKS, ONION_ROUNDS, PARTITION_EPS10, PARTITION_K, PR_ITERS, RICH_CLUB_KS, ROB_KS, ROB_ROUNDS, SALSA_ITERS, SCAN_CC_ROUNDS, SCAN_EPS_DEN, SCAN_EPS_NUM, SCAN_MU, SCC_PHASES, SCC_ROUNDS, SLPA_ROUNDS, SLPA_SEED_MOD, SPARSE_MOD, SPEAR_K, N_LANDMARKS, SPEC_COLOR_ORACLE_ROUNDS, SSSP_ROUNDS, SSSP_W_ROUNDS, SWEEP_ITERS, SWEEP_L, SWEEP_SEED_MOD, TEMPORAL_INF, TEMPORAL_ORACLE_ROUNDS, TEMPORAL_SEED_MOD, TEMPORAL_TS_MOD, TPR_BETA, TPR_EPOCHS, TRUSSNESS_ORACLE_ROUNDS, TRUSS_DEC_MOD, WALK_LEN, WCORENESS_ORACLE_ROUNDS, WCORE_W_MOD, WIDEST_ROUNDS, WL_ROUNDS, WS_K, _EDGES_SPARSE_SQL, _EDGES_SQL, _MINHASH_CTES, _SHINGLES_SQL, _TOKS_SQL, _W_EXPR, _anf_masks_ctes, _kcenter_cos, _louvain_level1_ctes, _louvain_level2_ctes, _walks_ctes  # noqa: E501,F401


_EDGE_DIFF_SQL = f"""
WITH olde AS MATERIALIZED (
  SELECT DISTINCT l_orderkey % {GRAPH_MOD} AS src, l_partkey % {GRAPH_MOD} AS dst
  FROM lineitem WHERE l_linenumber % 2 = 0
    AND l_orderkey % {GRAPH_MOD} <> l_partkey % {GRAPH_MOD}
),
newe AS MATERIALIZED (
  SELECT DISTINCT l_orderkey % {GRAPH_MOD} AS src, l_partkey % {GRAPH_MOD} AS dst
  FROM lineitem WHERE l_quantity <= 40
    AND l_orderkey % {GRAPH_MOD} <> l_partkey % {GRAPH_MOD}
)
SELECT n.src, n.dst, 'added' AS change FROM newe n
WHERE NOT EXISTS (SELECT 1 FROM olde o WHERE o.src = n.src AND o.dst = n.dst)
UNION ALL
SELECT o.src, o.dst, 'removed' AS change FROM olde o
WHERE NOT EXISTS (SELECT 1 FROM newe n WHERE n.src = o.src AND n.dst = o.dst)
"""

def _robustness_sql(rounds: int = ROB_ROUNDS, mode: str = "attack") -> str:
    """Per k: removal top-k (by (deg DESC, id ASC) or by hash), reduced
    symmetric edges, fixed-round min-label flood, component sizes +
    isolated singletons."""
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        "dg AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS deg "
        "FROM und GROUP BY src)",
        "nall AS (SELECT COUNT(*)::BIGINT AS n FROM dg)",
    ]
    if mode == "attack":
        order = "deg DESC, id ASC"
    else:
        order = (
            "('0x' || substr(md5('rf' || id::VARCHAR), 1, 15))::BIGINT ASC, id ASC"
        )
    selects = []
    for k in ROB_KS:
        ctes.append(
            f"h{k} AS MATERIALIZED (SELECT id FROM (SELECT id, "
            f"ROW_NUMBER() OVER (ORDER BY {order}) AS rn FROM dg) "
            f"WHERE rn <= {k})"
        )
        ctes.append(
            f"r{k}e AS MATERIALIZED (SELECT src, dst FROM und "
            f"WHERE src NOT IN (SELECT id FROM h{k}) "
            f"AND dst NOT IN (SELECT id FROM h{k}))"
        )
        ctes.append(
            f"r{k}l0 AS (SELECT DISTINCT src AS id, src AS label FROM r{k}e)"
        )
        for i in range(1, rounds + 1):
            p = i - 1
            ctes.append(
                f"r{k}l{i} AS MATERIALIZED (SELECT v.id, "
                f"LEAST(v.label, COALESCE(m.minl, v.label)) AS label "
                f"FROM r{k}l{p} v LEFT JOIN (SELECT u.dst AS id, "
                f"MIN(l.label) AS minl FROM r{k}e u "
                f"JOIN r{k}l{p} l ON u.src = l.id GROUP BY u.dst) m "
                f"ON v.id = m.id)"
            )
        ctes.append(
            f"r{k}s AS (SELECT label, COUNT(*)::BIGINT AS n FROM r{k}l{rounds} "
            f"GROUP BY label)"
        )
        selects.append(
            f"SELECT {k}::BIGINT AS k_removed, "
            f"((SELECT n FROM nall) - {k})::BIGINT AS n_left, "
            f"(COALESCE((SELECT COUNT(*) FROM r{k}s), 0) "
            f"+ ((SELECT n FROM nall) - {k} "
            f"- COALESCE((SELECT SUM(n) FROM r{k}s), 0)))::BIGINT AS n_components, "
            f"COALESCE((SELECT MAX(n) FROM r{k}s), "
            f"CASE WHEN (SELECT n FROM nall) > {k} THEN 1 ELSE 0 END)::BIGINT "
            f"AS largest_cc"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + " UNION ALL ".join(selects)

def _component_profile_sql(rounds: int = COMPONENT_PROFILE_ROUNDS) -> str:
    """Min-label flood to the fixpoint, then per-component aggregation."""
    ctes = [
        _EDGES_SQL.strip().rstrip(),
        "c0 AS MATERIALIZED (SELECT id, id AS lab FROM verts)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT id, MIN(lab)::BIGINT AS lab FROM ("
            f"SELECT id, lab FROM c{p} UNION ALL "
            f"SELECT e.src AS id, c.lab FROM und e JOIN c{p} c ON e.dst = c.id"
            f") GROUP BY id)"
        )
    return (
        "WITH " + ",\n".join(ctes) + ",\n"
        "cedges AS (SELECT src, dst FROM und WHERE src < dst),\n"
        f"sizes AS (SELECT lab, COUNT(*)::BIGINT AS n FROM c{rounds} GROUP BY lab),\n"
        f"ie AS (SELECT c.lab, COUNT(*)::BIGINT AS e FROM cedges x "
        f"JOIN c{rounds} c ON x.src = c.id GROUP BY c.lab)\n"
        "SELECT s.lab AS component, s.n AS n_vertices, "
        "COALESCE(ie.e, 0)::BIGINT AS intra_edges, "
        "CASE WHEN s.n >= 2 THEN ROUND(COALESCE(ie.e, 0) / (s.n * (s.n - 1) / 2.0), 6) END AS density "
        "FROM sizes s LEFT JOIN ie ON s.lab = ie.lab"
    )

def _seeded_lpa_sql(rounds: int = SLPA_ROUNDS) -> str:
    """Unrolled twin of seeded_label_propagation on the sparse und graph."""
    ctes = [
        _EDGES_SPARSE_SQL.strip().rstrip(),
        "sverts AS MATERIALIZED (SELECT DISTINCT src AS id FROM und)",
        f"sd AS MATERIALIZED (SELECT id, id AS slabel FROM sverts "
        f"WHERE id % {SLPA_SEED_MOD} = 0)",
        "s0 AS MATERIALIZED (SELECT v.id, sd.slabel AS label FROM sverts v "
        "LEFT JOIN sd ON v.id = sd.id)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"lab{i} AS MATERIALIZED (SELECT id, label FROM s{p} "
            f"WHERE label IS NOT NULL)"
        )
        ctes.append(
            f"cnt{i} AS MATERIALIZED (SELECT id, label, COUNT(*)::BIGINT AS cnt FROM ("
            f"SELECT u.dst AS id, l.label FROM und u JOIN lab{i} l ON u.src = l.id "
            f"UNION ALL SELECT id, label FROM lab{i}) GROUP BY id, label)"
        )
        ctes.append(
            f"nl{i} AS MATERIALIZED (SELECT id, label AS nl FROM ("
            f"SELECT id, label, ROW_NUMBER() OVER (PARTITION BY id "
            f"ORDER BY cnt DESC, label ASC) AS rn FROM cnt{i}) WHERE rn = 1)"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT s.id, "
            f"COALESCE(sd.slabel, n.nl, s.label) AS label FROM s{p} s "
            f"LEFT JOIN nl{i} n ON s.id = n.id LEFT JOIN sd ON s.id = sd.id)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, label FROM s{rounds}"

def _widest_sql(rounds: int = WIDEST_ROUNDS) -> str:
    """Unrolled max-min twin of _q_widest_path."""
    inf = 1 << 60
    relax_w = _W_EXPR.replace("src", "e.src").replace("dst", "e.dst")
    ctes = [_EDGES_SQL.strip(),
            "srcv AS (SELECT LEAST(MIN(src), MIN(dst)) AS s FROM edges)",
            f"b0 AS (SELECT (SELECT s FROM srcv) AS id, {inf}::BIGINT AS cap)"]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"b{i} AS MATERIALIZED (SELECT id, MAX(cap)::BIGINT AS cap FROM ("
            f"SELECT id, cap FROM b{p} UNION ALL "
            f"SELECT e.dst AS id, LEAST(d.cap, ({relax_w})) AS cap "
            f"FROM edges e JOIN b{p} d ON e.src = d.id"
            f") GROUP BY id)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, cap FROM b{rounds}"

def _walks_sql() -> str:
    union = " UNION ALL ".join(
        f"SELECT walk_id, step, v FROM w{t}" for t in range(WALK_LEN + 1)
    )
    return f"WITH {_walks_ctes()} {union}"

def _walk_sentences_sql() -> str:
    union = " UNION ALL ".join(
        f"SELECT walk_id, step, v FROM w{t}" for t in range(WALK_LEN + 1)
    )
    return (
        f"WITH {_walks_ctes()}, allsteps AS ({union}) "
        f"SELECT walk_id, COUNT(*)::BIGINT AS length, "
        f"string_agg(v::VARCHAR, ' ' ORDER BY step) AS sentence "
        f"FROM allsteps GROUP BY walk_id"
    )

def _node2vec_sql() -> str:
    ctes = [
        _EDGES_SQL.strip(),
        f"n0 AS MATERIALIZED (SELECT id AS walk_id, 0::BIGINT AS step, id AS v, "
        f"NULL::BIGINT AS prev FROM (SELECT id FROM verts ORDER BY id LIMIT {N_WALKS}))",
    ]
    for t in range(1, WALK_LEN + 1):
        ctes.append(
            f"n{t} AS MATERIALIZED (SELECT walk_id, {t}::BIGINT AS step, dst AS v, v AS prev FROM ("
            f"SELECT w.walk_id, e.dst, w.v, ROW_NUMBER() OVER (PARTITION BY w.walk_id "
            f"ORDER BY ((w.walk_id*1000003 + {t}*10007 + e.dst*31337) % 1000000007) * "
            f"(CASE WHEN w.prev IS NULL THEN 1 WHEN e.dst = w.prev THEN {N2V_P} "
            f"WHEN e2.src IS NOT NULL THEN 1 ELSE {N2V_Q} END), e.dst) AS rn "
            f"FROM n{t - 1} w JOIN edges e ON e.src = w.v "
            f"LEFT JOIN edges e2 ON e2.src = w.prev AND e2.dst = e.dst"
            f") WHERE rn = 1)"
        )
    union = " UNION ALL ".join(
        f"SELECT walk_id, step, v FROM n{t}" for t in range(WALK_LEN + 1)
    )
    return "WITH " + ",\n".join(ctes) + f" {union}"

def _bipartite_sql() -> str:
    """DuckDB twin of _q_bipartite: min-label CC (CC_ROUNDS unroll) →
    BFS dist from each component root → same-parity canonical-edge audit."""
    ctes = [_EDGES_SQL.strip(), "l0 AS (SELECT id, id AS label FROM verts)"]
    for i in range(1, CC_ROUNDS + 1):
        p = i - 1
        ctes.append(
            f"l{i} AS MATERIALIZED (SELECT v.id, LEAST(v.label, COALESCE(m.minl, v.label)) AS label "
            f"FROM l{p} v LEFT JOIN (SELECT u.dst AS id, MIN(l.label) AS minl FROM und u "
            f"JOIN l{p} l ON u.src = l.id GROUP BY u.dst) m ON v.id = m.id)"
        )
    ctes.append(f"lab AS MATERIALIZED (SELECT id, label FROM l{CC_ROUNDS})")
    bfs_rounds = SSSP_ROUNDS + 2  # matches the Spark query's max_iter
    ctes.append("bd0 AS (SELECT DISTINCT label AS id, 0::BIGINT AS dist FROM lab)")
    for i in range(1, bfs_rounds + 1):
        p = i - 1
        ctes.append(
            f"bd{i} AS MATERIALIZED (SELECT id, MIN(dist)::BIGINT AS dist FROM ("
            f"SELECT id, dist FROM bd{p} UNION ALL "
            f"SELECT u.dst AS id, d.dist + 1 AS dist FROM und u JOIN bd{p} d ON u.src = d.id"
            f") GROUP BY id)"
        )
    last = f"bd{bfs_rounds}"
    ctes.append(
        "cu AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM und)"
    )
    ctes.append(
        f"odd AS (SELECT l.label AS component, COUNT(*)::BIGINT AS n_odd FROM cu "
        f"JOIN {last} da ON cu.a = da.id JOIN {last} db ON cu.b = db.id "
        f"JOIN lab l ON l.id = cu.a WHERE da.dist % 2 = db.dist % 2 GROUP BY l.label)"
    )
    ctes.append(
        "percomp AS (SELECT l.label AS component, COUNT(*)::BIGINT AS n_vertices, "
        "COALESCE(MAX(o.n_odd), 0)::BIGINT AS n_odd FROM lab l "
        "LEFT JOIN odd o ON o.component = l.label GROUP BY l.label)"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + " SELECT COUNT(*)::BIGINT AS n_components, "
        "SUM(CASE WHEN n_odd = 0 THEN 1 ELSE 0 END)::BIGINT AS n_bipartite, "
        "SUM(n_odd)::BIGINT AS n_odd_edges FROM percomp"
    )

_WEIGHTED_SAMPLE_SQL = f"""
WITH scored AS (
  SELECT doc_id, GREATEST(n_chars, 1)::BIGINT AS weight,
    ROUND(ln((('0x' || substr(md5('ws' || doc_id::VARCHAR), 1, 15))::BIGINT + 1)
      / 1152921504606846976.0) / GREATEST(n_chars, 1)::DOUBLE, 6) AS priority
  FROM documents)
SELECT doc_id, weight, priority, rn FROM (
  SELECT doc_id, weight, priority,
    ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id ASC) AS rn FROM scored)
WHERE rn <= {WS_K}
"""

def _linkpred_eval_sql() -> str:
    return (
        f"WITH {_EDGES_SPARSE_SQL.strip()}, "
        "cp AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM und), "
        "marked AS (SELECT a, b, "
        "(('0x' || substr(md5('h_' || a::VARCHAR || '_' || b::VARCHAR), 1, 15))"
        f"::BIGINT % {LP_HOLD_MOD} = 0) AS held FROM cp), "
        "hold AS MATERIALIZED (SELECT a, b FROM marked WHERE held), "
        "und2 AS MATERIALIZED (SELECT a AS src, b AS dst FROM marked WHERE NOT held "
        "UNION ALL SELECT b, a FROM marked WHERE NOT held), "
        "deg2 AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und2 GROUP BY src), "
        "wedge2 AS (SELECT h1.dst AS u, h2.dst AS v, h1.src AS w, d.deg AS deg_w "
        "FROM und2 h1 JOIN und2 h2 ON h1.src = h2.src AND h1.dst < h2.dst "
        f"JOIN deg2 d ON d.id = h1.src WHERE d.deg <= {HUB_CAP}), "
        "sc AS (SELECT u, v, ROUND(SUM(1.0 / ln(deg_w)), 6) AS score "
        "FROM wedge2 GROUP BY u, v), "
        "na AS (SELECT s.u, s.v, s.score FROM sc s "
        "WHERE NOT EXISTS (SELECT 1 FROM und2 e WHERE e.src = s.u AND e.dst = s.v)), "
        "topk AS (SELECT u, v FROM (SELECT u, v, "
        "ROW_NUMBER() OVER (ORDER BY score DESC, u ASC, v ASC) AS rn FROM na) "
        f"WHERE rn <= {LP_EVAL_K}), "
        "h AS (SELECT COUNT(*)::BIGINT AS n_hits FROM topk t "
        "JOIN hold d ON t.u = d.a AND t.v = d.b), "
        "nh AS (SELECT COUNT(*)::BIGINT AS n_holdout FROM hold) "
        f"SELECT {LP_EVAL_K}::BIGINT AS k, nh.n_holdout, h.n_hits, "
        f"ROUND(h.n_hits / {LP_EVAL_K}.0, 6) AS precision FROM h CROSS JOIN nh"
    )

def _linkpred_auc_sql() -> str:
    return (
        f"WITH {_EDGES_SPARSE_SQL.strip()}, "
        "cp AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM und), "
        "marked AS MATERIALIZED (SELECT a, b, "
        "(('0x' || substr(md5('h_' || a::VARCHAR || '_' || b::VARCHAR), 1, 15))"
        f"::BIGINT % {LP_HOLD_MOD} = 0) AS held FROM cp), "
        "hold AS MATERIALIZED (SELECT a, b FROM marked WHERE held), "
        "und2 AS MATERIALIZED (SELECT a AS src, b AS dst FROM marked WHERE NOT held "
        "UNION ALL SELECT b, a FROM marked WHERE NOT held), "
        "deg2 AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und2 GROUP BY src), "
        "verts AS (SELECT a AS v FROM marked UNION SELECT b FROM marked), "
        "vsamp AS MATERIALIZED (SELECT v FROM verts WHERE "
        "('0x' || substr(md5('nv_' || v::VARCHAR), 1, 15))::BIGINT "
        f"% {LP_NEG_VSAMP_MOD} = 0), "
        "negs AS (SELECT x.v AS a, y.v AS b FROM vsamp x JOIN vsamp y ON x.v < y.v "
        "WHERE NOT EXISTS (SELECT 1 FROM marked m WHERE m.a = x.v AND m.b = y.v)), "
        "ev AS MATERIALIZED (SELECT a, b, 1 AS is_pos FROM hold "
        "UNION ALL SELECT a, b, 0 FROM negs), "
        "sc AS (SELECT e.a, e.b, ROUND(SUM(1.0 / ln(d.deg)), 6) AS score "
        "FROM ev e JOIN und2 t1 ON t1.src = e.a JOIN und2 t2 "
        "ON t2.src = e.b AND t2.dst = t1.dst "
        f"JOIN deg2 d ON d.id = t1.dst AND d.deg <= {HUB_CAP} GROUP BY e.a, e.b), "
        "scored AS (SELECT e.is_pos, COALESCE(s.score, 0.0) AS score "
        "FROM ev e LEFT JOIN sc s ON s.a = e.a AND s.b = e.b), "
        "ranked AS (SELECT is_pos, 2 * RANK() OVER (ORDER BY score) "
        "+ COUNT(*) OVER (PARTITION BY score) - 1 AS rank2 FROM scored), "
        "agg AS (SELECT SUM(CASE WHEN is_pos = 1 THEN rank2 ELSE 0 END)::BIGINT AS s2, "
        "SUM(is_pos)::BIGINT AS n_pos, SUM(1 - is_pos)::BIGINT AS n_neg FROM ranked) "
        "SELECT n_pos, n_neg, (s2 - n_pos * (n_pos + 1))::BIGINT AS u2, "
        "ROUND((s2 - n_pos * (n_pos + 1)) / (2.0 * n_pos * n_neg), 6) AS auc FROM agg"
    )

def _dsir_sql(b: int = DSIR_BUCKETS, target: str = DSIR_TARGET) -> str:
    """Twin of operators/corpus_stats.py dsir_logratio: hashed
    unigram+bigram buckets (md5-60-bit, the shared hash), add-1
    smoothed target-vs-raw log ratio quantized to micro-nats per
    bucket, one constant micro-nat scalar for the totals term."""
    return f"""
WITH dt AS MATERIALIZED (SELECT doc_id, lang,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '') AS t FROM documents),
feats AS MATERIALIZED (SELECT doc_id, lang, unnest(
    t || CASE WHEN len(t) >= 2
         THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
         ELSE []::VARCHAR[] END) AS f FROM dt),
bk AS MATERIALIZED (SELECT doc_id, lang,
    ('0x' || substr(md5('dsir_' || f), 1, 15))::BIGINT % {b} AS bucket
    FROM feats),
cnt AS MATERIALIZED (SELECT bucket, COUNT(*)::BIGINT AS cr,
    (COUNT(*) FILTER (WHERE lang = '{target}'))::BIGINT AS ct
    FROM bk GROUP BY bucket),
lam AS (SELECT bucket,
    CAST(ROUND(ln((ct + 1)::DOUBLE / (cr + 1)) * 1000000.0) AS BIGINT) AS lam
    FROM cnt),
km AS (SELECT CAST(ROUND(ln((SUM(cr)::BIGINT + {b})::DOUBLE /
                            (SUM(ct)::BIGINT + {b})) * 1000000.0) AS BIGINT)
              AS km FROM cnt)
SELECT s.doc_id, COUNT(*)::BIGINT AS n_feats,
       (SUM(l.lam)::BIGINT + COUNT(*) * MAX(km.km))::BIGINT AS score_micro,
       ROUND((SUM(l.lam)::BIGINT + COUNT(*) * MAX(km.km))::BIGINT
             / COUNT(*) / 1000000.0, 6) AS avg_logratio
FROM bk s JOIN lam l USING (bucket) CROSS JOIN km GROUP BY s.doc_id
"""


def _kmeans_chain(
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    scale: int = KMEANS_SCALE,
    dim: int = 64,
) -> str:
    """Shared CTE chain (WITH ... through `afin`) replaying
    kmeans_quantized's trajectory — consumed by `_kmeans_sql` and
    `_semdedup_sql`, which append their own final SELECTs."""
    parts = [
        f"""WITH pts AS MATERIALIZED (
  SELECT vec_id AS id, ix.i AS pos,
         CAST(FLOOR(embedding[ix.i + 1]::DOUBLE * {scale}.0) AS BIGINT) AS q
  FROM embeddings, (SELECT unnest(range(0, {dim})) AS i) ix),
c0 AS MATERIALIZED (
  SELECT id AS cid, pos, q AS cq FROM pts
  WHERE id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k}))"""
    ]
    prev = "c0"
    for r in range(1, iters + 1):
        parts.append(
            f"""d{r} AS MATERIALIZED (
  SELECT p.id, c.cid, CAST(SUM((p.q - c.cq) * (p.q - c.cq)) AS BIGINT) AS dist2
  FROM pts p JOIN {prev} c ON p.pos = c.pos GROUP BY p.id, c.cid),
a{r} AS MATERIALIZED (
  SELECT id, cid FROM (
    SELECT id, cid,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist2, cid) AS rn
    FROM d{r}) WHERE rn = 1),
c{r} AS MATERIALIZED (
  SELECT a.cid, p.pos,
         CAST(FLOOR(SUM(p.q)::DOUBLE / COUNT(*)) AS BIGINT) AS cq
  FROM pts p JOIN a{r} a ON p.id = a.id GROUP BY a.cid, p.pos)"""
        )
        prev = f"c{r}"
    parts.append(
        f"""dfin AS MATERIALIZED (
  SELECT p.id, c.cid, CAST(SUM((p.q - c.cq) * (p.q - c.cq)) AS BIGINT) AS dist2
  FROM pts p JOIN {prev} c ON p.pos = c.pos GROUP BY p.id, c.cid),
afin AS MATERIALIZED (
  SELECT id, cid, dist2 FROM (
    SELECT id, cid, dist2,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist2, cid) AS rn
    FROM dfin) WHERE rn = 1)"""
    )
    return ",\n".join(parts)


def _kmeans_sql(
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    scale: int = KMEANS_SCALE,
    dim: int = 64,
) -> str:
    """Unrolled DuckDB twin of operators/similarity.py kmeans_quantized:
    floor-quantized dims, exact integer distances, ROW_NUMBER(dist2, cid)
    assignment, floor-divided centroid update — every round replays the
    Spark trajectory bit-for-bit (the fiedler/simrank quantized-integer
    argument)."""
    return (
        _kmeans_chain(k, iters, scale, dim)
        + """
SELECT cid, COUNT(*)::BIGINT AS n_members, CAST(SUM(dist2) AS BIGINT) AS wss
FROM afin GROUP BY cid ORDER BY cid"""
    )


def _semdedup_sql(
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    scale: int = KMEANS_SCALE,
    dim: int = 64,
    tau: float = SEMDEDUP_TAU,
) -> str:
    """Twin of operators/similarity.py semdedup: the shared kmeans chain
    supplies the cluster assignment + exact integer dist2; a vector is
    removed iff a same-cluster partner with (dist2, id) lexicographically
    smaller has ROUND(cosine, 6) >= tau."""
    cos = _cos_expr("a.v", "b.v")
    return (
        _kmeans_chain(k, iters, scale, dim)
        + f""",
member AS MATERIALIZED (
  SELECT f.id, f.cid, f.dist2, e.embedding AS v
  FROM afin f JOIN embeddings e ON f.id = e.vec_id),
removed AS (
  SELECT DISTINCT b.cid, b.id
  FROM member b JOIN member a ON a.cid = b.cid
  WHERE (a.dist2 < b.dist2 OR (a.dist2 = b.dist2 AND a.id < b.id))
    AND ROUND({cos}, 6) >= {tau})
SELECT f.cid, COUNT(*)::BIGINT AS n_members,
       COALESCE(MAX(r.nrem), 0)::BIGINT AS n_removed
FROM afin f LEFT JOIN (
  SELECT cid, COUNT(*)::BIGINT AS nrem FROM removed GROUP BY cid) r
  ON f.cid = r.cid
GROUP BY f.cid ORDER BY f.cid"""
    )


def _kcenter_sql(k: int = KCENTER_K) -> str:
    """Unrolled farthest-first twin: per step, fold the new center's
    rounded cosine distance into the running min, then argmax by
    (dist DESC, vec_id ASC)."""
    ctes = [
        "p0 AS MATERIALIZED (SELECT vec_id, embedding AS v FROM embeddings)",
        "c1 AS MATERIALIZED (SELECT vec_id, v, 2.0::DOUBLE AS dist FROM p0 "
        "WHERE vec_id = (SELECT MIN(vec_id) FROM p0))",
    ]
    for i in range(2, k + 1):
        p = "p0 p" if i == 2 else f"d{i-2} p"
        prev_dist = "2.0::DOUBLE" if i == 2 else "p.dist"
        ctes.append(
            f"d{i-1} AS MATERIALIZED (SELECT p.vec_id, p.v, "
            f"LEAST({prev_dist}, ROUND(1.0 - {_kcenter_cos('p.v', 'c.v')}, 6)) AS dist "
            f"FROM {p} CROSS JOIN c{i-1} c WHERE p.vec_id <> c.vec_id)"
        )
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT vec_id, v, dist FROM ("
            f"SELECT vec_id, v, dist, ROW_NUMBER() OVER "
            f"(ORDER BY dist DESC, vec_id ASC) AS rn FROM d{i-1}) WHERE rn = 1)"
        )
    union = " UNION ALL ".join(
        f"SELECT {i}::BIGINT AS rn, vec_id, dist FROM c{i}" for i in range(1, k + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\n{union}"

_LANG_VOCAB_OVERLAP_SQL = f"""
WITH toks2 AS (SELECT lang, unnest(list_filter(
    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok
  FROM documents),
freq AS (SELECT lang, tok, COUNT(*)::BIGINT AS f FROM toks2 GROUP BY lang, tok),
head AS (SELECT lang, tok FROM (SELECT lang, tok,
    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY f DESC, tok ASC) AS rn
  FROM freq) WHERE rn <= {LVO_K}),
sizes AS (SELECT lang, COUNT(*)::BIGINT AS sz FROM head GROUP BY lang),
common AS (SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*)::BIGINT AS n_common
  FROM head a JOIN head b ON a.tok = b.tok AND a.lang < b.lang
  GROUP BY a.lang, b.lang)
SELECT c.lang_a, c.lang_b, c.n_common,
  ROUND(c.n_common / (sa.sz + sb.sz - c.n_common)::DOUBLE, 6) AS jaccard
FROM common c JOIN sizes sa ON c.lang_a = sa.lang
JOIN sizes sb ON c.lang_b = sb.lang
"""

_SQ8_SQL = """
WITH ex AS MATERIALIZED (
  SELECT vec_id, ix.i AS dim, embedding[ix.i + 1]::DOUBLE AS val
  FROM embeddings, (SELECT unnest(range(0, 64)) AS i) ix
),
stats AS (SELECT dim, MIN(val) AS mn, MAX(val) AS mx FROM ex GROUP BY dim)
SELECT e.vec_id, e.dim::BIGINT AS dim,
  CASE WHEN s.mx = s.mn THEN 0
       ELSE LEAST(255, FLOOR((e.val - s.mn) / (s.mx - s.mn) * 256)) END::BIGINT AS code
FROM ex e JOIN stats s ON e.dim = s.dim
"""

_TEMPERATURE_MIX_SQL = """
WITH counts AS (SELECT lang, COUNT(*)::BIGINT AS n FROM documents GROUP BY lang),
w AS (SELECT lang, n, FLOOR(SQRT(n))::BIGINT AS wt FROM counts),
tot AS (SELECT SUM(n)::BIGINT AS nn, SUM(wt)::BIGINT AS s FROM w),
plan AS (SELECT lang, LEAST(n, ((nn * 1 // 2) * wt) // s)::BIGINT AS target
         FROM w, tot),
ranked AS (SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
  ('0x' || substr(md5('mix_' || doc_id::VARCHAR), 1, 15))::BIGINT, doc_id) AS rn
  FROM documents)
SELECT r.doc_id, r.lang FROM ranked r JOIN plan p ON r.lang = p.lang
WHERE r.rn <= p.target
"""

def _kgram_sql(toks_cte: str, k: int) -> str:
    """DuckDB distinct-k-gram list from a toks CTE (twin of
    functions/text.py shingles(k))."""
    joined = " || ' ' || ".join(f"t[i+{j}]" if j else "t[i]" for j in range(k))
    return (
        f"CASE WHEN len(t) >= {k} THEN list_distinct(list_transform("
        f"range(1, len(t) - {k - 2}), i -> {joined})) ELSE []::VARCHAR[] END"
    )

def _contamination_sql() -> str:
    bench = f"doc_id % {CONTAM_BENCH_MOD} = {CONTAM_BENCH_REM}"
    g = _kgram_sql("t", CONTAM_K)
    return (
        "WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
        "'[^a-z0-9]+'), x -> x <> '') AS t FROM documents), "
        f"sh AS (SELECT doc_id, {g} AS s FROM toks), "
        f"bg AS (SELECT DISTINCT unnest(s) AS gram FROM sh WHERE {bench}), "
        f"ex AS (SELECT doc_id, unnest(s) AS gram FROM sh WHERE NOT ({bench})) "
        "SELECT doc_id, COUNT(*)::BIGINT AS n_grams, "
        "SUM(CASE WHEN bg.gram IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit, "
        "ROUND(SUM(CASE WHEN bg.gram IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE "
        "/ COUNT(*)::DOUBLE, 6) AS contamination "
        "FROM ex LEFT JOIN bg USING (gram) GROUP BY doc_id"
    )

def _boilerplate_sql() -> str:
    return (
        f"WITH {_TOKS_SQL}, {_SHINGLES_SQL}, "
        "ex AS (SELECT doc_id, unnest(s) AS gram FROM sh), "
        "boiler AS (SELECT gram FROM (SELECT gram, COUNT(*) AS df FROM ex "
        f"GROUP BY gram) WHERE df >= {BOILER_MIN_DOCS}) "
        "SELECT doc_id, COUNT(*)::BIGINT AS n_grams, "
        "SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_boiler, "
        "ROUND(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE "
        "/ COUNT(*)::DOUBLE, 6) AS boilerplate_frac "
        "FROM ex LEFT JOIN boiler b USING (gram) GROUP BY doc_id"
    )

_CORPUS_DIVERGENCE_SQL = """
WITH stok AS MATERIALIZED (SELECT lang AS s,
    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS term FROM documents),
cnt AS MATERIALIZED (SELECT s, term, COUNT(*)::BIGINT AS n FROM stok GROUP BY s, term),
tot AS (SELECT s, SUM(n)::BIGINT AS t FROM cnt GROUP BY s),
pr AS (SELECT ta.s AS sa, tb.s AS sb, ta.t AS ta, tb.t AS tb
       FROM tot ta JOIN tot tb ON ta.s < tb.s),
u AS (SELECT p.sa, p.sb, c.term FROM pr p JOIN cnt c ON c.s = p.sa OR c.s = p.sb
      GROUP BY p.sa, p.sb, c.term),
m AS (SELECT u.sa, u.sb, u.term, COALESCE(ca.n, 0) AS a, COALESCE(cb.n, 0) AS b,
             p.ta, p.tb
      FROM u JOIN pr p ON u.sa = p.sa AND u.sb = p.sb
      LEFT JOIN cnt ca ON ca.s = u.sa AND ca.term = u.term
      LEFT JOIN cnt cb ON cb.s = u.sb AND cb.term = u.term),
lam AS (SELECT sa, sb, ta, tb,
  CASE WHEN a > 0 THEN a * CAST(ROUND(ln(2.0 * a * tb /
       CAST(a * tb + b * ta AS DOUBLE)) * 1000000.0) AS BIGINT) ELSE 0 END AS ap,
  CASE WHEN b > 0 THEN b * CAST(ROUND(ln(2.0 * b * ta /
       CAST(a * tb + b * ta AS DOUBLE)) * 1000000.0) AS BIGINT) ELSE 0 END AS bq
  FROM m)
SELECT sa AS slice_a, sb AS slice_b, COUNT(*)::BIGINT AS n_terms,
  ROUND(SUM(ap)::DOUBLE / ANY_VALUE(ta) / 1000000.0, 6) AS kl_pm,
  ROUND(SUM(bq)::DOUBLE / ANY_VALUE(tb) / 1000000.0, 6) AS kl_qm,
  ROUND((SUM(ap)::DOUBLE / ANY_VALUE(ta) / 1000000.0
       + SUM(bq)::DOUBLE / ANY_VALUE(tb) / 1000000.0) / 2.0, 6) AS js
FROM lam GROUP BY sa, sb
"""

_BIGRAM_SURPRISAL_SQL = """
WITH btoks AS MATERIALIZED (SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '') AS t FROM documents),
bgs AS MATERIALIZED (SELECT doc_id,
    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bg
    FROM btoks WHERE len(t) >= 2),
c2 AS MATERIALIZED (SELECT bg, COUNT(*)::BIGINT AS c2 FROM bgs GROUP BY bg),
c1 AS MATERIALIZED (SELECT term, COUNT(*)::BIGINT AS c1 FROM
    (SELECT unnest(t) AS term FROM btoks) GROUP BY term),
lp AS (SELECT c2.bg,
       CAST(ROUND(ln(c1.c1 / c2.c2) * 1000000.0) AS BIGINT) AS lp
       FROM c2 JOIN c1 ON split_part(c2.bg, ' ', 1) = c1.term)
SELECT s.doc_id, COUNT(*)::BIGINT AS n_bigrams,
       SUM(l.lp)::BIGINT AS surprisal_micro,
       ROUND(SUM(l.lp)::BIGINT / COUNT(*) / 1000000.0, 6) AS avg_surprisal
FROM bgs s JOIN lp l ON s.bg = l.bg GROUP BY s.doc_id
"""

_UNIGRAM_SURPRISAL_SQL = """
WITH toks AS MATERIALIZED (SELECT doc_id,
    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS term FROM documents),
freq AS MATERIALIZED (SELECT term, COUNT(*)::BIGINT AS freq FROM toks GROUP BY term),
tot AS (SELECT SUM(freq)::BIGINT AS t FROM freq),
lp AS (SELECT f.term,
       CAST(ROUND(ln(t.t * 1.0 / f.freq) * 1000000.0) AS BIGINT) AS lp
       FROM freq f CROSS JOIN tot t)
SELECT s.doc_id, COUNT(*)::BIGINT AS n_tokens,
       SUM(l.lp)::BIGINT AS surprisal_micro,
       ROUND(SUM(l.lp)::BIGINT / COUNT(*) / 1000000.0, 6) AS avg_surprisal
FROM toks s JOIN lp l ON s.term = l.term GROUP BY s.doc_id
"""

_CHUNK_PLAN_SQL = f"""
WITH t AS (SELECT doc_id,
  len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::BIGINT AS n
  FROM documents),
k AS (SELECT doc_id, n, CASE WHEN n <= 0 THEN 0 WHEN n <= {CHUNK_TOK} THEN 1
  ELSE (n - {CHUNK_TOK} + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE} + 1 END AS nk
  FROM t)
SELECT doc_id, unnest(range(0, nk))::BIGINT AS chunk_idx,
  (unnest(range(0, nk)) * {CHUNK_STRIDE})::BIGINT AS start_tok,
  LEAST(unnest(range(0, nk)) * {CHUNK_STRIDE} + {CHUNK_TOK}, n)::BIGINT AS end_tok,
  (LEAST(unnest(range(0, nk)) * {CHUNK_STRIDE} + {CHUNK_TOK}, n)
   - unnest(range(0, nk)) * {CHUNK_STRIDE})::BIGINT AS chunk_tokens
FROM k WHERE nk > 0
"""

_PII_SUFFIX_SQL = (
    "text || ' contact user' || doc_id || '@example.com ip 10.0.' || (doc_id % 256) || '.1'"
)

def _pii_scrub_sql() -> str:
    """DuckDB twin built from the SAME TX.PII_PATTERNS constants — one
    source of truth for the regexes (RE2-safe by construction)."""
    counts = ", ".join(
        f"len(regexp_extract_all(t, '{pat}'))::BIGINT AS {name}_hits"
        for name, pat in TX.PII_PATTERNS
    )
    redacted = "t"
    for _, pat in TX.PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{pat}', '{TX.PII_TOKEN}', 'g')"
    return (
        f"WITH aug AS (SELECT doc_id, {_PII_SUFFIX_SQL} AS t FROM documents) "
        f"SELECT doc_id, {counts}, length({redacted})::BIGINT AS clean_len FROM aug"
    )

_FOUR_CLIQUE_SQL = f"""
WITH {_EDGES_SPARSE_SQL.strip()},
u AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges),
tri AS (SELECT COUNT(*)::BIGINT AS t FROM u e1
  JOIN u e2 ON e1.b = e2.a JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b),
quad AS (SELECT COUNT(*)::BIGINT AS fc FROM u ab
  JOIN u ac ON ac.a = ab.a AND ac.b > ab.b
  JOIN u ad ON ad.a = ab.a AND ad.b > ac.b
  JOIN u bc ON bc.a = ab.b AND bc.b = ac.b
  JOIN u bd ON bd.a = ab.b AND bd.b = ad.b
  JOIN u cd ON cd.a = ac.b AND cd.b = ad.b)
SELECT tri.t AS triangles, quad.fc AS four_cliques FROM tri, quad
"""

_FIVE_CLIQUE_SQL = f"""
WITH {_EDGES_SPARSE_SQL.strip()},
u AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges),
tri AS (SELECT COUNT(*)::BIGINT AS t FROM u e1
  JOIN u e2 ON e1.b = e2.a JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b),
quad AS (SELECT COUNT(*)::BIGINT AS fc FROM u ab
  JOIN u ac ON ac.a = ab.a AND ac.b > ab.b
  JOIN u ad ON ad.a = ab.a AND ad.b > ac.b
  JOIN u bc ON bc.a = ab.b AND bc.b = ac.b
  JOIN u bd ON bd.a = ab.b AND bd.b = ad.b
  JOIN u cd ON cd.a = ac.b AND cd.b = ad.b),
quint AS (SELECT COUNT(*)::BIGINT AS qc FROM u ab
  JOIN u ac ON ac.a = ab.a AND ac.b > ab.b
  JOIN u ad ON ad.a = ab.a AND ad.b > ac.b
  JOIN u ae ON ae.a = ab.a AND ae.b > ad.b
  JOIN u bc ON bc.a = ab.b AND bc.b = ac.b
  JOIN u bd ON bd.a = ab.b AND bd.b = ad.b
  JOIN u be ON be.a = ab.b AND be.b = ae.b
  JOIN u cd ON cd.a = ac.b AND cd.b = ad.b
  JOIN u ce ON ce.a = ac.b AND ce.b = ae.b
  JOIN u de ON de.a = ad.b AND de.b = ae.b)
SELECT tri.t AS triangles, quad.fc AS four_cliques, quint.qc AS five_cliques
FROM tri, quad, quint
"""

def _ppr_sweep_sql() -> str:
    """Unrolled twin of _q_ppr_sweep_cut: seeded PageRank on the
    symmetric sparse graph (no dangling mass by construction — the dm
    terms are kept and evaluate to 0), then the sweep with the identical
    round-before-rank discipline and integer cut/vol arithmetic."""
    d = 0.85
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        "sverts AS MATERIALIZED (SELECT DISTINCT src AS id FROM und)",
        f"ns AS (SELECT COUNT(*)::DOUBLE AS s FROM sverts WHERE id % {SWEEP_SEED_MOD} = 0)",
        f"p AS MATERIALIZED (SELECT id, CASE WHEN id % {SWEEP_SEED_MOD} = 0 "
        "THEN 1.0/(SELECT s FROM ns) ELSE 0.0 END AS pm FROM sverts)",
        "outdeg AS MATERIALIZED (SELECT src, COUNT(*)::DOUBLE AS deg FROM und GROUP BY src)",
        "r0 AS (SELECT id, pm AS rank FROM p)",
    ]
    for i in range(1, SWEEP_ITERS + 1):
        pv = i - 1
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT u.dst AS id, SUM(r.rank/o.deg) AS contrib "
            f"FROM und u JOIN r{pv} r ON u.src = r.id JOIN outdeg o ON u.src = o.src GROUP BY u.dst)"
        )
        ctes.append(
            f"dm{i} AS (SELECT COALESCE(SUM(rank),0) AS dm FROM r{pv} r "
            f"WHERE NOT EXISTS (SELECT 1 FROM outdeg o WHERE o.src = r.id))"
        )
        ctes.append(
            f"r{i} AS MATERIALIZED (SELECT p.id, p.pm*((1-{d}) + {d}*(SELECT dm FROM dm{i})) "
            f"+ {d}*COALESCE(c.contrib,0) AS rank FROM p LEFT JOIN c{i} c ON p.id = c.id)"
        )
    ctes += [
        f"score AS (SELECT r.id, CAST(o.deg AS BIGINT) AS deg, "
        f"ROUND(ROUND(r.rank, 6) / CAST(o.deg AS BIGINT), 9) AS s "
        f"FROM r{SWEEP_ITERS} r JOIN outdeg o ON r.id = o.src)",
        "tk AS MATERIALIZED (SELECT id, deg, k FROM (SELECT id, deg, "
        "ROW_NUMBER() OVER (ORDER BY s DESC, id ASC)::BIGINT AS k FROM score) "
        f"WHERE k <= {SWEEP_L})",
        "m2 AS (SELECT COUNT(*)::BIGINT AS c2 FROM und)",
        "uu AS (SELECT src AS a, dst AS b FROM und WHERE src < dst)",
        f"er AS (SELECT LEAST(COALESCE(ta.k, {SWEEP_L + 1}), COALESCE(tb.k, {SWEEP_L + 1})) AS lo, "
        f"GREATEST(COALESCE(ta.k, {SWEEP_L + 1}), COALESCE(tb.k, {SWEEP_L + 1})) AS hi "
        "FROM uu LEFT JOIN tk ta ON uu.a = ta.id LEFT JOIN tk tb ON uu.b = tb.id)",
        f"st AS (SELECT lo AS k, COUNT(*)::BIGINT AS n_open FROM er WHERE lo <= {SWEEP_L} GROUP BY lo)",
        f"en AS (SELECT hi AS k, COUNT(*)::BIGINT AS n_close FROM er WHERE hi <= {SWEEP_L} GROUP BY hi)",
        "ax AS (SELECT t.k, t.id, t.deg, COALESCE(st.n_open, 0) AS o, "
        "COALESCE(en.n_close, 0) AS c FROM tk t "
        "LEFT JOIN st ON st.k = t.k LEFT JOIN en ON en.k = t.k)",
        "fin AS (SELECT k, id, deg, CAST(SUM(deg) OVER (ORDER BY k) AS BIGINT) AS vol, "
        "CAST(SUM(o - c) OVER (ORDER BY k) AS BIGINT) AS cut FROM ax)",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT k, id, deg, vol, cut, "
        "CASE WHEN LEAST(vol, (SELECT c2 FROM m2) - vol) > 0 THEN "
        "ROUND(cut / LEAST(vol, (SELECT c2 FROM m2) - vol), 6) END AS phi FROM fin"
    )

_ATTR_ASSORT_SQL = f"""
WITH {_EDGES_SPARSE_SQL.strip()},
attr AS MATERIALIZED (SELECT p_partkey % {SPARSE_MOD} AS id, MIN(p_brand) AS lab
    FROM part GROUP BY 1),
pairs AS (SELECT COALESCE(la.lab, 'none') AS la, COALESCE(lb.lab, 'none') AS lb
    FROM und u LEFT JOIN attr la ON u.src = la.id LEFT JOIN attr lb ON u.dst = lb.id),
mix AS (SELECT la, lb, COUNT(*)::BIGINT AS n FROM pairs GROUP BY la, lb),
tot AS (SELECT SUM(n)::BIGINT AS n FROM mix),
rows_m AS (SELECT la AS lab, SUM(n)::BIGINT AS r FROM mix GROUP BY la),
cols_m AS (SELECT lb AS lab, SUM(n)::BIGINT AS c FROM mix GROUP BY lb),
labs AS (SELECT lab FROM rows_m UNION SELECT lab FROM cols_m),
marg AS (SELECT l.lab, COALESCE(r.r, 0) AS r, COALESCE(c.c, 0) AS c FROM labs l
    LEFT JOIN rows_m r ON l.lab = r.lab LEFT JOIN cols_m c ON l.lab = c.lab),
sums AS (SELECT (SELECT COUNT(*)::BIGINT FROM labs) AS n_labels,
    (SELECT COALESCE(SUM(n), 0)::BIGINT FROM mix WHERE la = lb) AS diag,
    SUM(r::HUGEINT * c::HUGEINT) AS prod FROM marg)
SELECT t.n AS n_pairs, s.n_labels, s.diag AS sum_diag, s.prod::BIGINT AS sum_prod,
    CASE WHEN t.n::HUGEINT * t.n::HUGEINT - s.prod <> 0 THEN
        ROUND((t.n::HUGEINT * s.diag::HUGEINT - s.prod) /
              (t.n::HUGEINT * t.n::HUGEINT - s.prod), 6) END AS assortativity
FROM tot t, sums s
"""

_EDGE_EMB_SQL = f"""
WITH {_EDGES_SPARSE_SQL.strip()},
deg AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src),
u AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM u e1
  JOIN u e2 ON e1.b = e2.a JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b),
sides AS (SELECT x AS a, y AS b FROM tri UNION ALL
          SELECT x, z FROM tri UNION ALL SELECT y, z FROM tri),
emb AS (SELECT a, b, COUNT(*)::BIGINT AS emb FROM sides GROUP BY a, b),
scored AS (SELECT u.a, u.b, COALESCE(e.emb, 0)::BIGINT AS emb,
  CASE WHEN da.deg + db.deg - COALESCE(e.emb, 0) - 2 > 0 THEN
    ROUND(COALESCE(e.emb, 0) / (da.deg + db.deg - COALESCE(e.emb, 0) - 2), 6)
  END AS jaccard
  FROM u LEFT JOIN emb e ON u.a = e.a AND u.b = e.b
  JOIN deg da ON u.a = da.id JOIN deg db ON u.b = db.id)
SELECT a, b, emb, jaccard, rn FROM (SELECT a, b, emb, jaccard,
  ROW_NUMBER() OVER (ORDER BY emb DESC, a ASC, b ASC)::BIGINT AS rn FROM scored)
WHERE rn <= {EMB_K}
"""

_FORMAN_SQL = f"""
WITH {_EDGES_SPARSE_SQL.strip()},
deg AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src),
u AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM u e1
  JOIN u e2 ON e1.b = e2.a JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b),
sides AS (SELECT x AS a, y AS b FROM tri UNION ALL
          SELECT x, z FROM tri UNION ALL SELECT y, z FROM tri),
sup AS (SELECT a, b, COUNT(*)::BIGINT AS support FROM sides GROUP BY a, b),
scored AS (SELECT u.a, u.b, COALESCE(s.support, 0)::BIGINT AS support,
  (4 - da.deg - db.deg + 3 * COALESCE(s.support, 0))::BIGINT AS curvature
  FROM u LEFT JOIN sup s ON u.a = s.a AND u.b = s.b
  JOIN deg da ON u.a = da.id JOIN deg db ON u.b = db.id)
SELECT a, b, support, curvature, rn FROM (SELECT a, b, support, curvature,
  ROW_NUMBER() OVER (ORDER BY curvature ASC, a ASC, b ASC)::BIGINT AS rn FROM scored)
WHERE rn <= {EMB_K}
"""

def _graphlet4_sql() -> str:
    """Twin of plans/metrics.py graphlet4_census: the four closed-form
    terms recomputed from the same degree/triangle/support CTEs, the
    same capped wedge pairs for c4, the same ordered quad join for k4
    (deferred to call time because _WEDGE_SQL is defined below)."""
    return f"""
WITH {_EDGES_SPARSE_SQL.strip()},
deg AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src),
u AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges),
tri AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM u e1
  JOIN u e2 ON e1.b = e2.a JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b),
tc AS (SELECT COUNT(*)::BIGINT AS t FROM tri),
tv AS (SELECT v, COUNT(*)::BIGINT AS tv FROM (SELECT x AS v FROM tri
  UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri) GROUP BY v),
sides AS (SELECT x AS a, y AS b FROM tri UNION ALL SELECT x, z FROM tri
  UNION ALL SELECT y, z FROM tri),
sup AS (SELECT a, b, COUNT(*)::BIGINT AS s FROM sides GROUP BY a, b),
{_WEDGE_SQL},
cw AS (SELECT u, v, COUNT(*)::BIGINT AS c FROM wedge GROUP BY u, v),
quad AS (SELECT COUNT(*)::BIGINT AS fc FROM u ab
  JOIN u ac ON ac.a = ab.a AND ac.b > ab.b
  JOIN u ad ON ad.a = ab.a AND ad.b > ac.b
  JOIN u bc ON bc.a = ab.b AND bc.b = ac.b
  JOIN u bd ON bd.a = ab.b AND bd.b = ad.b
  JOIN u cd ON cd.a = ac.b AND cd.b = ad.b)
SELECT 'c4_cycle' AS graphlet,
       COALESCE((SUM(c * (c - 1) // 2) // 2), 0)::BIGINT AS cnt FROM cw
UNION ALL SELECT 'diamond', COALESCE(SUM(s * (s - 1) // 2), 0)::BIGINT FROM sup
UNION ALL SELECT 'k4_clique', fc::BIGINT FROM quad
UNION ALL SELECT 'p4_path',
  ((SELECT COALESCE(SUM((da.deg - 1) * (db.deg - 1)), 0)::BIGINT FROM u
    JOIN deg da ON u.a = da.id JOIN deg db ON u.b = db.id)
   - 3 * (SELECT t FROM tc))::BIGINT
UNION ALL SELECT 's3_star',
  COALESCE(SUM(deg * (deg - 1) * (deg - 2) // 6), 0)::BIGINT FROM deg
UNION ALL SELECT 'tailed_triangle',
  COALESCE(SUM(tv.tv * (d.deg - 2)), 0)::BIGINT
  FROM tv JOIN deg d ON tv.v = d.id
"""


def _scc_sql() -> str:
    """Unrolled FW-BW phases: per phase, fwd/bwd min propagation over the
    active-induced edge subset; settle fwd==bwd; shrink the active set."""
    ctes = [_EDGES_SQL.strip(), "a1 AS MATERIALIZED (SELECT id FROM verts)"]
    for p in range(1, SCC_PHASES + 1):
        ctes.append(
            f"ea{p} AS MATERIALIZED (SELECT e.src, e.dst FROM edges e "
            f"JOIN a{p} x ON e.src = x.id JOIN a{p} y ON e.dst = y.id)"
        )
        ctes.append(f"f{p}_0 AS (SELECT id, id AS label FROM a{p})")
        ctes.append(f"b{p}_0 AS (SELECT id, id AS label FROM a{p})")
        for r in range(1, SCC_ROUNDS + 1):
            ctes.append(
                f"f{p}_{r} AS MATERIALIZED (SELECT v.id, LEAST(v.label, COALESCE(m.minl, v.label)) AS label "
                f"FROM f{p}_{r-1} v LEFT JOIN (SELECT e.dst AS id, MIN(l.label) AS minl "
                f"FROM ea{p} e JOIN f{p}_{r-1} l ON e.src = l.id GROUP BY e.dst) m ON v.id = m.id)"
            )
            ctes.append(
                f"b{p}_{r} AS MATERIALIZED (SELECT v.id, LEAST(v.label, COALESCE(m.minl, v.label)) AS label "
                f"FROM b{p}_{r-1} v LEFT JOIN (SELECT e.src AS id, MIN(l.label) AS minl "
                f"FROM ea{p} e JOIN b{p}_{r-1} l ON e.dst = l.id GROUP BY e.src) m ON v.id = m.id)"
            )
        ctes.append(
            f"s{p} AS MATERIALIZED (SELECT f.id, f.label AS scc "
            f"FROM f{p}_{SCC_ROUNDS} f JOIN b{p}_{SCC_ROUNDS} b "
            f"ON f.id = b.id AND f.label = b.label)"
        )
        ctes.append(
            f"a{p+1} AS MATERIALIZED (SELECT id FROM a{p} EXCEPT SELECT id FROM s{p})"
        )
    union = " UNION ALL ".join(
        f"SELECT id, scc FROM s{p}" for p in range(1, SCC_PHASES + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\n{union}"

def _bowtie_sql(rr: int = BOWTIE_REACH_ROUNDS) -> str:
    """SCC twin + five unrolled reach fixpoints + the CASE ladder."""
    scc = _scc_sql()
    head, union = scc.rsplit("\n", 1)
    ctes = [head[len("WITH "):]]
    ctes.append(f"sccall AS MATERIALIZED ({union})")
    ctes.append(
        "corelab AS MATERIALIZED (SELECT scc FROM (SELECT scc, COUNT(*) AS n "
        "FROM sccall GROUP BY scc ORDER BY n DESC, scc ASC LIMIT 1))"
    )
    ctes.append(
        "cv AS MATERIALIZED (SELECT id FROM sccall "
        "WHERE scc = (SELECT scc FROM corelab))"
    )

    def reach(name, seed_sql, step_sql):
        ctes.append(f"{name}0 AS ({seed_sql})")
        for r in range(1, rr + 1):
            ctes.append(
                f"{name}{r} AS MATERIALIZED (SELECT id FROM {name}{r-1} "
                f"UNION {step_sql.format(prev=f'{name}{r-1}')})"
            )

    reach("f", "SELECT id FROM cv",
          "SELECT e.dst FROM edges e JOIN {prev} x ON e.src = x.id")
    reach("b", "SELECT id FROM cv",
          "SELECT e.src FROM edges e JOIN {prev} x ON e.dst = x.id")
    ctes.append(
        f"outs AS MATERIALIZED (SELECT id FROM f{rr} EXCEPT SELECT id FROM cv)"
    )
    ctes.append(
        f"ins AS MATERIALIZED (SELECT id FROM b{rr} EXCEPT SELECT id FROM cv)"
    )
    ctes.append(
        "e2 AS MATERIALIZED (SELECT src, dst FROM edges "
        "WHERE src NOT IN (SELECT id FROM cv) AND dst NOT IN (SELECT id FROM cv))"
    )
    reach("tf", "SELECT id FROM ins",
          "SELECT e.dst FROM e2 e JOIN {prev} x ON e.src = x.id")
    reach("tb", "SELECT id FROM outs",
          "SELECT e.src FROM e2 e JOIN {prev} x ON e.dst = x.id")
    ctes.append(
        "und2 AS MATERIALIZED (SELECT src, dst FROM edges "
        "UNION SELECT dst, src FROM edges)"
    )
    reach("w", "SELECT id FROM cv",
          "SELECT e.dst FROM und2 e JOIN {prev} x ON e.src = x.id")
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT region, COUNT(*)::BIGINT AS n_vertices FROM (
  SELECT CASE
    WHEN id IN (SELECT id FROM cv) THEN 'CORE'
    WHEN id IN (SELECT id FROM ins) THEN 'IN'
    WHEN id IN (SELECT id FROM outs) THEN 'OUT'
    WHEN id IN (SELECT id FROM tf{rr}) AND id IN (SELECT id FROM tb{rr}) THEN 'TUBE'
    WHEN id IN (SELECT id FROM tf{rr}) OR id IN (SELECT id FROM tb{rr}) THEN 'TENDRIL'
    WHEN id IN (SELECT id FROM w{rr}) THEN 'OTHER'
    ELSE 'DISCONNECTED' END AS region
  FROM verts) GROUP BY region"""
    )

def _dag_levels_sql() -> str:
    scc = _scc_sql()
    head, union = scc.rsplit("\n", 1)
    ctes = [head[len("WITH "):]]
    ctes.append(f"sccall AS MATERIALIZED ({union})")
    ctes.append(
        "cedges AS MATERIALIZED (SELECT DISTINCT a.scc AS cs, b.scc AS cd "
        "FROM edges e JOIN sccall a ON e.src = a.id JOIN sccall b ON e.dst = b.id "
        "WHERE a.scc <> b.scc)"
    )
    ctes.append("v0 AS (SELECT DISTINCT scc AS c, 0::BIGINT AS level FROM sccall)")
    for r in range(1, DAG_ROUNDS + 1):
        ctes.append(
            f"v{r} AS MATERIALIZED (SELECT v.c, GREATEST(v.level, COALESCE(m.il, v.level))::BIGINT AS level "
            f"FROM v{r-1} v LEFT JOIN (SELECT e.cd AS c, MAX(l.level) + 1 AS il "
            f"FROM cedges e JOIN v{r-1} l ON e.cs = l.c GROUP BY e.cd) m ON v.c = m.c)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT s.id, s.scc, v.level FROM sccall s JOIN v{DAG_ROUNDS} v ON s.scc = v.c"
    )

def _dedup_clusters_sql() -> str:
    ctes = [
        _MINHASH_CTES,
        # MATERIALIZED: cund feeds every propagation round — without it the
        # whole minhash pipeline re-inlines per round
        "cvert AS MATERIALIZED (SELECT doc_a AS id FROM cand UNION SELECT doc_b FROM cand)",
        "cund AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM cand "
        "UNION ALL SELECT doc_b, doc_a FROM cand)",
        "k0 AS (SELECT id, id AS label FROM cvert)",
    ]
    for i in range(1, DEDUP_CC_ROUNDS + 1):
        p = i - 1
        ctes.append(
            f"k{i} AS (SELECT v.id, LEAST(v.label, COALESCE(m.minl, v.label)) AS label "
            f"FROM k{p} v LEFT JOIN (SELECT u.dst AS id, MIN(l.label) AS minl FROM cund u "
            f"JOIN k{p} l ON u.src = l.id GROUP BY u.dst) m ON v.id = m.id)"
        )
    last = f"k{DEDUP_CC_ROUNDS}"
    return (
        "WITH " + ",\n".join(ctes)
        + f",\nsizes AS (SELECT label, COUNT(*)::BIGINT AS cluster_size FROM {last} GROUP BY label)\n"
        f"SELECT k.id AS doc_id, k.label AS cluster, s.cluster_size "
        f"FROM {last} k JOIN sizes s ON k.label = s.label"
    )

def _embedding_dedup_clusters_sql() -> str:
    """All-pairs threshold oracle (candidate completeness is part of the
    gate, as for embedding_neardup) + unrolled min-label CC + sizes."""
    ctes = [
        "q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings)",
        "cand AS MATERIALIZED (SELECT qid AS a, vec_id AS b FROM ("
        f"SELECT q.qid, c.vec_id, ROUND({_COS_SQL}, 6) AS sim "
        "FROM embeddings c JOIN q ON q.qid < c.vec_id) WHERE sim >= 0.40)",
        "cvert AS MATERIALIZED (SELECT a AS id FROM cand UNION SELECT b FROM cand)",
        "cund AS MATERIALIZED (SELECT a AS src, b AS dst FROM cand "
        "UNION ALL SELECT b, a FROM cand)",
        "k0 AS (SELECT id, id AS label FROM cvert)",
    ]
    for i in range(1, DEDUP_CC_ROUNDS + 1):
        p = i - 1
        ctes.append(
            f"k{i} AS (SELECT v.id, LEAST(v.label, COALESCE(m.minl, v.label)) AS label "
            f"FROM k{p} v LEFT JOIN (SELECT u.dst AS id, MIN(l.label) AS minl FROM cund u "
            f"JOIN k{p} l ON u.src = l.id GROUP BY u.dst) m ON v.id = m.id)"
        )
    last = f"k{DEDUP_CC_ROUNDS}"
    return (
        "WITH " + ",\n".join(ctes)
        + f",\nsizes AS (SELECT label, COUNT(*)::BIGINT AS cluster_size FROM {last} GROUP BY label)\n"
        f"SELECT k.id AS vec_id, k.label AS cluster, s.cluster_size "
        f"FROM {last} k JOIN sizes s ON k.label = s.label"
    )

def _neardup_keep_best_sql() -> str:
    """dedup_clusters' CTE chain + the quality formula + per-cluster
    argmax — the oracle composes the same two verified pieces."""
    dc = _dedup_clusters_sql()
    ctes = dc[len("WITH "): dc.rindex("\nSELECT")].rstrip().rstrip(",")
    last = f"k{DEDUP_CC_ROUNDS}"
    return (
        "WITH " + ctes + ",\n"
        "qsc AS (SELECT doc_id, ROUND("
        "0.4 * least(n_tok / 100.0, 1.0) + 0.3 * (1.0 - n_punct / greatest(n_chars2, 1.0)) "
        "+ 0.2 * least((n_stop / greatest(n_tok, 1.0)) * 5.0, 1.0) + 0.1 * least(n_chars2 / 500.0, 1.0)"
        ", 6) AS score FROM (SELECT doc_id, "
        "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::DOUBLE AS n_tok, "
        "length(text)::DOUBLE AS n_chars2, "
        "len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE AS n_punct, "
        "len(regexp_extract_all(lower(text), '\\b(the|a|and|of|to|in|is|for|on|with)\\b'))::DOUBLE AS n_stop "
        "FROM documents)),\n"
        f"wcl AS (SELECT q.doc_id, COALESCE(k.label, q.doc_id) AS cluster, q.score "
        f"FROM qsc q LEFT JOIN {last} k ON q.doc_id = k.id)\n"
        "SELECT doc_id, cluster, score FROM (SELECT doc_id, cluster, score, "
        "ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY score DESC, doc_id ASC) AS rn "
        "FROM wcl) WHERE rn = 1"
    )

def _modularity_sql() -> str:
    """LPA label CTEs + per-community modularity arithmetic."""
    lpa = _lpa_sql()
    ctes = lpa[len("WITH "): lpa.rindex("\nSELECT")]
    return (
        "WITH " + ctes + ",\n"
        "und2 AS (SELECT src, dst FROM und WHERE src < dst),\n"
        "mm AS (SELECT COUNT(*)::DOUBLE AS m FROM und2),\n"
        "mdeg AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src),\n"
        f"lab AS (SELECT id, label FROM l{LPA_ROUNDS}),\n"
        "intra AS (SELECT a.label AS label, COUNT(*)::BIGINT AS intra_edges "
        "FROM und2 u JOIN lab a ON u.src = a.id JOIN lab b ON u.dst = b.id "
        "WHERE a.label = b.label GROUP BY a.label),\n"
        "comm AS (SELECT l.label, COUNT(*)::BIGINT AS n_vertices, "
        "SUM(COALESCE(d.deg, 0))::BIGINT AS deg_sum "
        "FROM lab l LEFT JOIN mdeg d ON l.id = d.id GROUP BY l.label)\n"
        "SELECT c.label, c.n_vertices, COALESCE(i.intra_edges, 0)::BIGINT AS intra_edges, "
        "c.deg_sum, ROUND(COALESCE(i.intra_edges, 0) / (SELECT m FROM mm) "
        "- pow(c.deg_sum / (2 * (SELECT m FROM mm)), 2), 6) AS contribution "
        "FROM comm c LEFT JOIN intra i ON c.label = i.label"
    )

_RICH_CLUB_SQL = f"""
WITH {{edges}},
degs AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS d FROM und GROUP BY src),
cpairs AS MATERIALIZED (
  SELECT u.src, u.dst, a.d AS da, b.d AS db FROM und u
  JOIN degs a ON u.src = a.id JOIN degs b ON u.dst = b.id WHERE u.src < u.dst
),
spine(k) AS (VALUES {", ".join(f"({k}::BIGINT)" for k in RICH_CLUB_KS)}),
nk AS (SELECT s.k, COUNT(*)::BIGINT AS n_k FROM spine s JOIN degs d ON d.d > s.k GROUP BY s.k),
ek AS (SELECT s.k, COUNT(*)::BIGINT AS e_k FROM spine s JOIN cpairs p
       ON p.da > s.k AND p.db > s.k GROUP BY s.k)
SELECT s.k, COALESCE(n.n_k, 0)::BIGINT AS n_k, COALESCE(e.e_k, 0)::BIGINT AS e_k,
       CASE WHEN COALESCE(n.n_k, 0) >= 2
            THEN ROUND(2.0 * COALESCE(e.e_k, 0) / (n.n_k * (n.n_k - 1)), 6) END AS phi
FROM spine s LEFT JOIN nk n ON s.k = n.k LEFT JOIN ek e ON s.k = e.k
"""

def _salsa_sql(seed_mod: int | None = None) -> str:
    """Unrolled SALSA twin: a = Σ h/outdeg over in-edges, then
    h = Σ a/indeg over out-edges, h_0 uniform over hub vertices
    (or over seed hubs ``src % seed_mod == 0`` in personalized mode)."""
    seed_where = f" WHERE src % {seed_mod} = 0" if seed_mod is not None else ""
    ctes = [
        _EDGES_SQL.strip().rstrip(),
        "outdeg AS MATERIALIZED (SELECT src, COUNT(*)::DOUBLE AS od FROM edges GROUP BY src)",
        "indeg AS MATERIALIZED (SELECT dst, COUNT(*)::DOUBLE AS idg FROM edges GROUP BY dst)",
        f"nh AS (SELECT COUNT(*)::DOUBLE AS c FROM outdeg{seed_where})",
        f"sh0 AS MATERIALIZED (SELECT src AS id, 1.0/(SELECT c FROM nh) AS hub FROM outdeg{seed_where})",
    ]
    for i in range(1, SALSA_ITERS + 1):
        p = i - 1
        ctes.append(
            f"sa{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(h.hub / o.od) AS auth "
            f"FROM edges e JOIN sh{p} h ON e.src = h.id "
            f"JOIN outdeg o ON e.src = o.src GROUP BY e.dst)"
        )
        ctes.append(
            f"sh{i} AS MATERIALIZED (SELECT e.src AS id, SUM(a.auth / d.idg) AS hub "
            f"FROM edges e JOIN sa{i} a ON e.dst = a.id "
            f"JOIN indeg d ON e.dst = d.dst GROUP BY e.src)"
        )
    k = SALSA_ITERS
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT v.id, ROUND(COALESCE(h.hub, 0), 6) AS hub, "
        f"ROUND(COALESCE(a.auth, 0), 6) AS auth FROM verts v "
        f"LEFT JOIN sh{k} h ON v.id = h.id LEFT JOIN sa{k} a ON v.id = a.id"
    )

def _hits_sql() -> str:
    """Unrolled HITS twin: a_raw = Aᵀh_prev ; h_raw = A·a_raw ; L2-normalize."""
    n_iters = HITS_ITERS
    ctes = [
        _EDGES_SQL.strip().rstrip(),
        "h0 AS (SELECT id, 1.0 AS h FROM verts)",
    ]
    for i in range(1, n_iters + 1):
        pv = i - 1
        ctes.append(
            f"ar{i} AS (SELECT v.id, COALESCE(s.ar, 0) AS ar FROM verts v LEFT JOIN "
            f"(SELECT e.dst AS id, SUM(h.h) AS ar FROM edges e JOIN h{pv} h ON e.src = h.id "
            f"GROUP BY e.dst) s ON v.id = s.id)"
        )
        ctes.append(
            f"hr{i} AS (SELECT v.id, COALESCE(s.hr, 0) AS hr FROM verts v LEFT JOIN "
            f"(SELECT e.src AS id, SUM(a.ar) AS hr FROM edges e JOIN ar{i} a ON e.dst = a.id "
            f"GROUP BY e.src) s ON v.id = s.id)"
        )
        ctes.append(f"na{i} AS (SELECT sqrt(SUM(ar*ar)) AS s FROM ar{i})")
        ctes.append(f"nh{i} AS (SELECT sqrt(SUM(hr*hr)) AS s FROM hr{i})")
        ctes.append(
            f"a{i} AS (SELECT id, ar / (SELECT s FROM na{i}) AS a FROM ar{i})"
        )
        ctes.append(
            f"h{i} AS (SELECT id, hr / (SELECT s FROM nh{i}) AS h FROM hr{i})"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT h.id, ROUND(h.h, 6) AS hub, ROUND(a.a, 6) AS auth "
        f"FROM h{n_iters} h JOIN a{n_iters} a ON h.id = a.id"
    )

def _coreness_ctes(rounds: int = CORENESS_ORACLE_ROUNDS, und: str = "und") -> list:
    """CTE chain of the unrolled h-index iteration on the sparse und
    graph (c_{t+1}(v) = max over desc-ranked neighbour values of
    least(value, rank)), ending at c{rounds} — shared by the coreness
    twin and every composition on top of the fixpoint."""
    ctes = [
        _EDGES_SPARSE_SQL.strip().rstrip(),
        f"c0 AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS core "
        f"FROM {und} GROUP BY src)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT id, MAX(LEAST(val, rn))::BIGINT AS core "
            f"FROM (SELECT u.src AS id, s.core AS val, "
            f"ROW_NUMBER() OVER (PARTITION BY u.src ORDER BY s.core DESC) AS rn "
            f"FROM {und} u JOIN c{p} s ON u.dst = s.id) GROUP BY id)"
        )
    return ctes


def _coreness_sql(rounds: int = CORENESS_ORACLE_ROUNDS, und: str = "und") -> str:
    """Unrolled h-index iteration twin on the sparse und graph; ``und``
    names the symmetric edge CTE so the decremental twin can run the
    identical rounds on a reduced set."""
    ctes = _coreness_ctes(rounds, und)
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, core FROM c{rounds}"

def _score_weighted_sql(rounds: int = WCORENESS_ORACLE_ROUNDS) -> str:
    """Unrolled weighted h-index twin: per round rank neighbour values
    DESC, running-sum the edge weights, keep MAX(LEAST(val, cw)) — the
    block maximum sits at each tie-block's last row where the running
    sum is order-invariant, so no tie-break column is needed (same
    argument as the unweighted rn form)."""
    ctes = [
        _EDGES_SPARSE_SQL.strip().rstrip(),
        "cpair AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM edges)",
        "wedges AS MATERIALIZED (SELECT a, b, "
        "('0x' || substr(md5('w_' || a::VARCHAR || '_' || b::VARCHAR), 1, 15))"
        f"::BIGINT % {WCORE_W_MOD} + 1 AS w FROM cpair)",
        "wund AS MATERIALIZED (SELECT a AS src, b AS dst, w FROM wedges "
        "UNION ALL SELECT b AS src, a AS dst, w FROM wedges)",
        "w0 AS MATERIALIZED (SELECT src AS id, SUM(w)::BIGINT AS core "
        "FROM wund GROUP BY src)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"w{i} AS MATERIALIZED (SELECT id, MAX(LEAST(val, cw))::BIGINT AS core "
            f"FROM (SELECT u.src AS id, s.core AS val, "
            f"SUM(u.w) OVER (PARTITION BY u.src ORDER BY s.core DESC "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw "
            f"FROM wund u JOIN w{p} s ON u.dst = s.id) GROUP BY id)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, core FROM w{rounds}"

def _coreness_dec_sql(rounds: int = CORENESS_ORACLE_ROUNDS) -> str:
    """Cold unrolled twin on the REDUCED graph (the decremental path's
    unique fixpoint): the same deletion rule applied to the canonical
    directed sparse edges, re-symmetrized."""
    base = _coreness_sql(rounds, und="und2")
    extra = (
        f"edges2 AS MATERIALIZED (SELECT src, dst FROM edges "
        f"WHERE (src * 31 + dst) % {CORENESS_DEC_MOD} <> 0),\n"
        "und2 AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM edges2 UNION ALL "
        "SELECT dst AS src, src AS dst FROM edges2) WHERE src <> dst),\n"
        "c0 AS"
    )
    return base.replace("c0 AS", extra, 1)

def _densest_sql(rounds: int = DENSEST_ORACLE_ROUNDS) -> str:
    """Unrolled peeling twin: per round the degree table, the (n, e)
    snapshot, the integer threshold keep-set (deg*10*n >= C*e avoids
    rational division), and the induced edge set. Snapshots with n = 0
    (past the fixpoint) are filtered — identical to the Spark loop's
    stop condition."""
    c = 2 * (10 + DENSEST_EPS_TENTHS)
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        "e0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM und)",
    ]
    sel = []
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"d{r} AS MATERIALIZED (SELECT id, COUNT(*)::BIGINT AS deg FROM ("
            f"SELECT a AS id FROM e{p} UNION ALL SELECT b FROM e{p}) GROUP BY id)"
        )
        ctes.append(
            f"s{r} AS (SELECT (SELECT COUNT(*) FROM d{r})::BIGINT AS n, "
            f"(SELECT COUNT(*) FROM e{p})::BIGINT AS e)"
        )
        ctes.append(
            f"k{r} AS (SELECT d.id FROM d{r} d, s{r} s "
            f"WHERE d.deg * 10 * s.n >= {c} * s.e)"
        )
        ctes.append(
            f"e{r} AS MATERIALIZED (SELECT e.a, e.b FROM e{p} e "
            f"JOIN k{r} ka ON e.a = ka.id JOIN k{r} kb ON e.b = kb.id)"
        )
        sel.append(
            f"SELECT {p}::BIGINT AS peel_round, n AS n_vertices, e AS n_edges, "
            f"ROUND(e * 1.0 / n, 6) AS density FROM s{r} WHERE n > 0"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + " UNION ALL ".join(sel)

def _wl_sql(out: str = "colors", rounds: int = WL_ROUNDS) -> str:
    """Unrolled hash-WL twin: degree colors, then per round the exact
    HUGEINT neighbor-sum mod 2^60 and the md5 recombination."""
    mod = 1 << 60
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        "wdeg AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src)",
        "c0 AS MATERIALIZED (SELECT id, "
        "('0x' || substr(md5('wl0_' || deg::VARCHAR), 1, 15))::BIGINT AS color "
        "FROM wdeg)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"wm{r} AS (SELECT e.src AS id, CAST(SUM("
            "('0x' || substr(md5('wlh_' || c.color::VARCHAR), 1, 15))::BIGINT) "
            f"% {mod} AS BIGINT) AS m "
            f"FROM und e JOIN c{p} c ON e.dst = c.id GROUP BY e.src)"
        )
        ctes.append(
            f"c{r} AS MATERIALIZED (SELECT c.id, ('0x' || substr(md5("
            "'wl_' || c.color::VARCHAR || '_' || m.m::VARCHAR), 1, 15))::BIGINT "
            f"AS color FROM c{p} c JOIN wm{r} m ON c.id = m.id)"
        )
    if out == "colors":
        final = f"SELECT id, color FROM c{rounds}"
    else:
        final = (
            "SELECT class_size, COUNT(*)::BIGINT AS n_classes FROM ("
            f"SELECT color, COUNT(*)::BIGINT AS class_size FROM c{rounds} "
            "GROUP BY color) GROUP BY class_size"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + final

def _betweenness_sql(rounds: int = BETW_ROUNDS, out: str = "vertices") -> str:
    """Unrolled Brandes twin: forward BFS with σ accumulation (first
    discovery via NOT EXISTS), backward per-level dependency fold.
    ``out='edges'`` emits the Girvan–Newman edge scores instead: the
    per-level dependency summands (the rows BEFORE the predecessor
    groupBy) unioned across levels and grouped by (src, dst) — the same
    set of doubles the Spark edge variant sums."""
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        f"srcs AS (SELECT id FROM (SELECT src AS id FROM edges UNION SELECT dst FROM edges) "
        f"ORDER BY id LIMIT {N_BETW_SOURCES})",
        "f0 AS (SELECT id, id AS source, 0::BIGINT AS dist, 1.0::DOUBLE AS sigma FROM srcs)",
    ]
    for t in range(1, rounds + 1):
        p = t - 1
        ctes.append(
            f"f{t} AS MATERIALIZED (SELECT id, source, dist, sigma FROM f{p} "
            f"UNION ALL SELECT n.id, n.source, {t}::BIGINT AS dist, n.sigma FROM ("
            f"SELECT e.dst AS id, d.source, SUM(d.sigma) AS sigma FROM edges e "
            f"JOIN f{p} d ON e.src = d.id AND d.dist = {p} GROUP BY e.dst, d.source) n "
            f"WHERE NOT EXISTS (SELECT 1 FROM f{p} x WHERE x.id = n.id AND x.source = n.source))"
        )
    ctes.append(
        f"dl{rounds} AS MATERIALIZED (SELECT id, source, dist, sigma, 0.0::DOUBLE AS delta FROM f{rounds})"
    )
    for t in range(rounds, 0, -1):
        ctes.append(
            f"dl{t - 1} AS MATERIALIZED (SELECT v.id, v.source, v.dist, v.sigma, "
            f"v.delta + COALESCE(c.c, 0.0) AS delta FROM dl{t} v LEFT JOIN ("
            f"SELECT pv.id, pv.source, SUM(pv.sigma / pw.sigma * (1.0 + pw.delta)) AS c "
            f"FROM edges e JOIN dl{t} pw ON pw.id = e.dst AND pw.dist = {t} "
            f"JOIN dl{t} pv ON pv.id = e.src AND pv.source = pw.source AND pv.dist = {t - 1} "
            f"GROUP BY pv.id, pv.source) c ON c.id = v.id AND c.source = v.source)"
        )
    if out == "edges":
        parts = [
            f"SELECT e.src, e.dst, pv.sigma / pw.sigma * (1.0 + pw.delta) AS c "
            f"FROM edges e JOIN dl{t} pw ON pw.id = e.dst AND pw.dist = {t} "
            f"JOIN dl{t} pv ON pv.id = e.src AND pv.source = pw.source AND pv.dist = {t - 1}"
            for t in range(rounds, 0, -1)
        ]
        return (
            "WITH " + ",\n".join(ctes)
            + ", eb AS (" + " UNION ALL ".join(parts) + ") "
            "SELECT src, dst, ROUND(SUM(c), 6) AS betweenness FROM eb GROUP BY src, dst"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + " SELECT id, ROUND(SUM(delta), 6) AS betweenness FROM dl0 "
        "WHERE id <> source GROUP BY id"
    )

def _anf_sketch_out_sql() -> str:
    """UNION ALL of the per-horizon (t, id, sum_r, est) projections."""
    sels = []
    for t in range(ANF_ROUNDS + 1):
        sels.append(
            f"SELECT {t}::BIGINT AS t, id, "
            f"SUM(bit_count(xor(mask, mask + 1)) - 1)::BIGINT AS sum_r, "
            f"ROUND(2 ** (SUM(bit_count(xor(mask, mask + 1)) - 1)::DOUBLE / {ANF_MASKS}) "
            f"/ 0.77351, 4) AS est FROM mk{t} GROUP BY id"
        )
    return " UNION ALL ".join(sels)

def _anf_sketch_sql() -> str:
    return "WITH " + ",\n".join(_anf_masks_ctes()) + "\n" + _anf_sketch_out_sql()

def _anf_eff_diam_sql() -> str:
    ctes = _anf_masks_ctes()
    ctes.append("sk AS MATERIALIZED (" + _anf_sketch_out_sql() + ")")
    ctes.append("curve AS MATERIALIZED (SELECT t, SUM(est) AS nf FROM sk GROUP BY t)")
    ctes.append(
        f"fin AS (SELECT nf AS f FROM curve WHERE t = {ANF_ROUNDS})"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT MIN(t)::BIGINT AS eff_diameter, "
        "ROUND((SELECT f FROM fin), 1) AS nf_final_est "
        "FROM curve WHERE nf >= 0.9 * (SELECT f FROM fin)"
    )

def _anf_exact_sql() -> str:
    """Unrolled distinct reach-pair counts — the twin of plans/anf.py
    neighborhood_function."""
    ctes = [
        _EDGES_SPARSE_SQL.strip().rstrip(),
        "averts AS MATERIALIZED (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges))",
        "re0 AS MATERIALIZED (SELECT id, id AS v FROM averts)",
    ]
    for i in range(1, ANF_ROUNDS + 1):
        p = i - 1
        ctes.append(
            f"re{i} AS MATERIALIZED (SELECT DISTINCT id, v FROM ("
            f"SELECT id, v FROM re{p} UNION ALL "
            f"SELECT e.src AS id, r.v FROM edges e JOIN re{p} r ON e.dst = r.id))"
        )
    sels = [
        f"SELECT {t}::BIGINT AS t, COUNT(*)::BIGINT AS pairs FROM re{t}"
        for t in range(ANF_ROUNDS + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + " UNION ALL ".join(sels)

def _diameter_sql(rounds: int = DIAM_ROUNDS) -> str:
    """Unrolled double-sweep twin of plans/sssp.py diameter_double_sweep
    on the sparse und graph: two min-folded BFS chains, the second's
    source picked from the first's argmax (dist DESC, id ASC)."""
    ctes = [
        _EDGES_SPARSE_SQL.strip().rstrip(),
        "sdeg AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS deg "
        "FROM und GROUP BY src)",
        "s0 AS (SELECT id FROM sdeg ORDER BY deg DESC, id LIMIT 1)",
        "b0 AS (SELECT (SELECT id FROM s0) AS id, 0::BIGINT AS dist)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"b{i} AS MATERIALIZED (SELECT id, MIN(dist)::BIGINT AS dist FROM ("
            f"SELECT id, dist FROM b{p} UNION ALL "
            f"SELECT e.dst AS id, d.dist + 1 AS dist FROM und e JOIN b{p} d ON e.src = d.id"
            f") GROUP BY id)"
        )
    ctes.append(
        f"far AS (SELECT id, dist FROM b{rounds} ORDER BY dist DESC, id LIMIT 1)"
    )
    ctes.append("c0 AS (SELECT (SELECT id FROM far) AS id, 0::BIGINT AS dist)")
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT id, MIN(dist)::BIGINT AS dist FROM ("
            f"SELECT id, dist FROM c{p} UNION ALL "
            f"SELECT e.dst AS id, d.dist + 1 AS dist FROM und e JOIN c{p} d ON e.src = d.id"
            f") GROUP BY id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT (SELECT id FROM s0) AS start_id, "
        f"(SELECT dist FROM far) AS ecc_start, "
        f"(SELECT id FROM far) AS far_id, "
        f"(SELECT MAX(dist) FROM c{rounds}) AS diameter_lb"
    )

def _community_pagerank_sql(n_iters: int = PR_ITERS) -> str:
    """Quotient-weighted PR twin: louvain level-1 CTEs → qeo edges with
    integer weights → unrolled weighted power iteration (dangling mass
    redistributed uniformly, d=0.85), same shape as _pagerank_sql."""
    d = 0.85
    ctes = _louvain_level1_ctes(LOUVAIN_ROUNDS)
    r = LOUVAIN_ROUNDS
    ctes += [
        f"qe AS MATERIALIZED (SELECT la.label AS src, lb.label AS dst, "
        f"COUNT(*)::BIGINT AS w FROM und e JOIN l{r} la ON e.src = la.id "
        f"JOIN l{r} lb ON e.dst = lb.id WHERE la.label <> lb.label "
        f"GROUP BY la.label, lb.label)",
        "qverts AS MATERIALIZED (SELECT src AS id FROM qe UNION SELECT dst FROM qe)",
        "qn AS (SELECT COUNT(*)::DOUBLE AS n FROM qverts)",
        "qoutdeg AS MATERIALIZED (SELECT src, SUM(w)::DOUBLE AS deg FROM qe GROUP BY src)",
        "p0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM qn) AS rank FROM qverts)",
    ]
    for i in range(1, n_iters + 1):
        p = i - 1
        ctes.append(
            f"pc{i} AS MATERIALIZED (SELECT e.dst AS id, "
            f"SUM(x.rank * e.w / o.deg) AS contrib FROM qe e "
            f"JOIN p{p} x ON e.src = x.id JOIN qoutdeg o ON e.src = o.src "
            f"GROUP BY e.dst)"
        )
        ctes.append(
            f"pdm{i} AS MATERIALIZED (SELECT COALESCE(SUM(rank),0) AS dm FROM p{p} x "
            f"WHERE NOT EXISTS (SELECT 1 FROM qoutdeg o WHERE o.src = x.id))"
        )
        ctes.append(
            f"p{i} AS MATERIALIZED (SELECT v.id, (1-{d})/(SELECT n FROM qn) "
            f"+ {d}*(COALESCE(c.contrib,0) + (SELECT dm FROM pdm{i})/(SELECT n FROM qn)) AS rank "
            f"FROM qverts v LEFT JOIN pc{i} c ON v.id = c.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(rank, 6) AS rank FROM p{n_iters}"
    )

def _louvain_trajectory_sql(rounds: int = LOUVAIN_ROUNDS) -> str:
    """Trajectory twin: the shared level-1 + level-2 CTE chains, then
    Q(labels) = intra/m − Σ_c (D_c/(2m))² per level over a 3-row union."""
    r = rounds
    ctes = _louvain_level1_ctes(rounds) + _louvain_level2_ctes(rounds)
    ctes.append(
        f"lev2 AS MATERIALIZED (SELECT a.id, q.label "
        f"FROM l{r} a JOIN q{r} q ON a.label = q.id)"
    )

    def _q(lab: str, lvl: int) -> str:
        return (
            f"SELECT {lvl}::BIGINT AS level, "
            f"(SELECT COUNT(DISTINCT label) FROM {lab})::BIGINT AS communities, "
            f"ROUND((SELECT COUNT(*) FROM und e JOIN {lab} a ON e.src = a.id "
            f"JOIN {lab} b ON e.dst = b.id "
            f"WHERE a.label = b.label AND e.src < e.dst) / (SELECT m FROM mm) - "
            f"(SELECT SUM(POWER(t.tot / (2.0 * (SELECT m FROM mm)), 2)) FROM "
            f"(SELECT label, SUM(d.deg) AS tot FROM {lab} l "
            f"JOIN ldeg d ON l.id = d.id GROUP BY label) t), 6) AS modularity"
        )

    return (
        "WITH " + ",\n".join(ctes)
        + f"\n{_q('l0', 0)} UNION ALL {_q(f'l{r}', 1)} UNION ALL {_q('lev2', 2)}"
    )

def _louvain2_sql(rounds: int = LOUVAIN_ROUNDS) -> str:
    """Unrolled TWO-LEVEL twin: level-1 chain, quotient multigraph in
    integer und-row space (strength = Σ all incident rows, self rows are
    2·w_self), then ``rounds`` weighted sweeps on the quotient."""
    r = rounds
    ctes = _louvain_level1_ctes(rounds) + _louvain_level2_ctes(rounds)
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT a.id, q.label FROM l{r} a JOIN q{r} q ON a.label = q.id"
    )

def _nucleus_sql(rounds: int | None = None) -> str:
    """Unrolled (3,4)-nucleus twin (plans/nucleus.py): 4-cliques
    p<q<r<s enumerated once via the 6-edge join, fanned to 4
    (triangle; other×3) rows; per round
    t(T) = least(t(T), H({min(t(O₁),t(O₂),t(O₃))})) with the same
    relational h-index as the trussness twin."""
    from metis_spark.driver.common import NUCLEUS_ORACLE_ROUNDS

    if rounds is None:
        rounds = NUCLEUS_ORACLE_ROUNDS
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        "ce AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM und)",
        "tri AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
        "FROM ce e1 JOIN ce e2 ON e1.b = e2.a "
        "JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b)",
        "quad AS MATERIALIZED (SELECT ab.a AS p, ab.b AS q, ac.b AS r, ad.b AS s "
        "FROM ce ab JOIN ce ac ON ac.a = ab.a AND ac.b > ab.b "
        "JOIN ce ad ON ad.a = ab.a AND ad.b > ac.b "
        "JOIN ce bc ON bc.a = ab.b AND bc.b = ac.b "
        "JOIN ce bd ON bd.a = ab.b AND bd.b = ad.b "
        "JOIN ce cd ON cd.a = ac.b AND cd.b = ad.b)",
        "tq AS MATERIALIZED ("
        "SELECT p AS x, q AS y, r AS z, p AS x1, q AS y1, s AS z1, "
        "p AS x2, r AS y2, s AS z2, q AS x3, r AS y3, s AS z3 FROM quad "
        "UNION ALL SELECT p, q, s, p, q, r, p, r, s, q, r, s FROM quad "
        "UNION ALL SELECT p, r, s, p, q, r, p, q, s, q, r, s FROM quad "
        "UNION ALL SELECT q, r, s, p, q, r, p, q, s, p, r, s FROM quad)",
        "n0 AS MATERIALIZED (SELECT t.x, t.y, t.z, "
        "COALESCE(c.c, 0)::BIGINT AS t FROM tri t LEFT JOIN "
        "(SELECT x, y, z, COUNT(*)::BIGINT AS c FROM tq GROUP BY x, y, z) c "
        "ON c.x = t.x AND c.y = t.y AND c.z = t.z)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"n{i} AS MATERIALIZED (SELECT e.x, e.y, e.z, "
            f"LEAST(e.t, COALESCE(h.h, 0))::BIGINT AS t FROM n{p} e LEFT JOIN ("
            f"SELECT x, y, z, MAX(LEAST(m, rn))::BIGINT AS h FROM ("
            f"SELECT tq.x, tq.y, tq.z, LEAST(a.t, b.t, c.t) AS m, "
            f"ROW_NUMBER() OVER (PARTITION BY tq.x, tq.y, tq.z "
            f"ORDER BY LEAST(a.t, b.t, c.t) DESC) AS rn "
            f"FROM tq JOIN n{p} a ON tq.x1 = a.x AND tq.y1 = a.y AND tq.z1 = a.z "
            f"JOIN n{p} b ON tq.x2 = b.x AND tq.y2 = b.y AND tq.z2 = b.z "
            f"JOIN n{p} c ON tq.x3 = c.x AND tq.y3 = c.y AND tq.z3 = c.z) "
            f"GROUP BY x, y, z) h "
            f"ON e.x = h.x AND e.y = h.y AND e.z = h.z)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT x, y, z, t AS nucleus FROM n{rounds}"
    )

def _simrank_sql() -> str:
    """Unrolled SimRank twin (plans/simrank.py, iters=2): capped graph,
    md5-sampled pair set, level-1 closed form on the 1-step pair
    closure, one quantized gather level, top-k. Every float op is the
    correctly-rounded product/quotient of exact integers (micro-unit
    discipline), so the replay is bit-exact."""
    from metis_spark.driver.common import (
        SIMRANK_CAP,
        SIMRANK_K,
        SIMRANK_VSAMP_MOD,
    )

    return (
        f"WITH {_EDGES_SPARSE_SQL.strip()}, "
        "sdeg AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS deg "
        "FROM und GROUP BY src), "
        "ge AS MATERIALIZED (SELECT u.src, u.dst FROM und u "
        "JOIN sdeg a ON u.src = a.id JOIN sdeg b ON u.dst = b.id "
        f"WHERE a.deg <= {SIMRANK_CAP} AND b.deg <= {SIMRANK_CAP}), "
        "nd AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS nd "
        "FROM ge GROUP BY src), "
        "vs AS MATERIALIZED (SELECT id FROM sdeg WHERE "
        "('0x' || substr(md5('sr_' || id::VARCHAR), 1, 15))::BIGINT "
        f"% {SIMRANK_VSAMP_MOD} = 0), "
        "p0 AS MATERIALIZED (SELECT x.id AS a, y.id AS b FROM vs x "
        "JOIN vs y ON x.id < y.id), "
        "p1 AS MATERIALIZED (SELECT DISTINCT LEAST(ea.dst, eb.dst) AS a, "
        "GREATEST(ea.dst, eb.dst) AS b FROM p0 p "
        "JOIN ge ea ON p.a = ea.src JOIN ge eb ON p.b = eb.src "
        "WHERE ea.dst <> eb.dst), "
        "pall AS MATERIALIZED (SELECT a, b FROM p0 UNION SELECT a, b FROM p1), "
        "cn AS MATERIALIZED (SELECT p.a, p.b, COUNT(*)::BIGINT AS cn "
        "FROM pall p JOIN ge ea ON p.a = ea.src "
        "JOIN ge eb ON p.b = eb.src AND ea.dst = eb.dst GROUP BY p.a, p.b), "
        "q1 AS MATERIALIZED (SELECT c.a, c.b, "
        "ROUND(0.8 * (1000000.0 * c.cn) / (na.nd * nb.nd))::BIGINT AS q "
        "FROM cn c JOIN nd na ON c.a = na.id JOIN nd nb ON c.b = nb.id), "
        "gat AS MATERIALIZED (SELECT p.a, p.b, "
        "SUM(CASE WHEN ea.dst = eb.dst THEN 1000000 "
        "ELSE COALESCE(q1.q, 0) END)::BIGINT AS s FROM p0 p "
        "JOIN ge ea ON p.a = ea.src JOIN ge eb ON p.b = eb.src "
        "LEFT JOIN q1 ON q1.a = LEAST(ea.dst, eb.dst) "
        "AND q1.b = GREATEST(ea.dst, eb.dst) GROUP BY p.a, p.b), "
        "q2 AS (SELECT g.a, g.b, "
        "ROUND(0.8 * g.s / (na.nd * nb.nd))::BIGINT AS q FROM gat g "
        "JOIN nd na ON g.a = na.id JOIN nd nb ON g.b = nb.id) "
        "SELECT a, b, q, rn FROM (SELECT a, b, q, "
        "ROW_NUMBER() OVER (ORDER BY q DESC, a ASC, b ASC)::BIGINT AS rn "
        f"FROM q2 WHERE q > 0) WHERE rn <= {SIMRANK_K}"
    )

def _leiden_sql(
    rounds: int = LOUVAIN_ROUNDS, refine_rounds: int | None = None,
) -> str:
    """Unrolled Leiden twin (plans/leiden.py): level-1 local-moving
    chain, deterministic singleton-merge refinement inside phase-1
    communities, quotient on the REFINED partition, level-2 weighted
    sweeps initialized with phase-1 labels, final mapping."""
    from metis_spark.driver.common import (
        LEIDEN_REFINE_ROUNDS,
        _leiden_refine_ctes,
    )

    rf = LEIDEN_REFINE_ROUNDS if refine_rounds is None else refine_rounds
    r = rounds
    ctes = (
        _louvain_level1_ctes(rounds)
        + _leiden_refine_ctes(rounds, rf)
        + _louvain_level2_ctes(
            rounds,
            member=f"r{rf}",
            member_col="rl",
            init_sql=(
                f"SELECT q.id, l.label FROM qstr q JOIN l{r} l ON q.id = l.id"
            ),
        )
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT a.id, q.label FROM r{rf} a JOIN q{r} q ON a.rl = q.id"
    )

def _louvain_sql(rounds: int = LOUVAIN_ROUNDS) -> str:
    """Unrolled synchronous local-moving twin of plans/louvain.py on the
    sparse und graph."""
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
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, label FROM l{rounds}"

def _spec_coloring_sql(rounds: int = SPEC_COLOR_ORACLE_ROUNDS) -> str:
    """Unrolled trial-and-revoke twin on the full sparse und graph:
    avail = sorted [0..deg] minus colored-neighbour colors, candidate =
    avail[h_k mod |avail|], keep unless a same-candidate neighbour has
    smaller h_k."""
    ctes = [
        _EDGES_SPARSE_SQL.strip().rstrip(),
        "cdeg AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS deg "
        "FROM und GROUP BY src)",
        "s0 AS MATERIALIZED (SELECT id, CAST(NULL AS BIGINT) AS color FROM cdeg)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        hk = f"((v.id * 2654435761 + {i * 40503}) % 4294967296)"
        ctes.append(
            f"u{i} AS MATERIALIZED (SELECT e.dst AS id, "
            f"list_sort(list_distinct(list(s.color))) AS used FROM und e "
            f"JOIN s{p} s ON e.src = s.id AND s.color IS NOT NULL "
            f"JOIN s{p} v ON e.dst = v.id AND v.color IS NULL GROUP BY e.dst)"
        )
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT id, hk, "
            f"avail[(hk % len(avail))::INT + 1] AS cand FROM ("
            f"SELECT v.id, {hk} AS hk, "
            f"list_sort(list_filter(range(0, d.deg + 1), "
            f"x -> NOT list_contains(COALESCE(u.used, []), x))) AS avail "
            f"FROM s{p} v JOIN cdeg d ON v.id = d.id "
            f"LEFT JOIN u{i} u ON v.id = u.id WHERE v.color IS NULL))"
        )
        ctes.append(
            f"b{i} AS MATERIALIZED (SELECT DISTINCT e.dst AS id FROM und e "
            f"JOIN c{i} a ON e.src = a.id JOIN c{i} b ON e.dst = b.id "
            f"WHERE a.cand = b.cand AND a.hk < b.hk)"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT s.id, COALESCE(s.color, "
            f"CASE WHEN bl.id IS NULL THEN c.cand END)::BIGINT AS color "
            f"FROM s{p} s LEFT JOIN c{i} c ON s.id = c.id "
            f"LEFT JOIN b{i} bl ON s.id = bl.id)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, color FROM s{rounds}"

def _coloring_sql(rounds: int = COLOR_ORACLE_ROUNDS) -> str:
    """Unrolled Jones–Plassmann twin of plans/coloring.py on the thinned
    sparse und graph. Per round: ready = uncolored vertices whose
    uncolored neighbours all hash larger; each picks the smallest color
    absent from its colored neighbourhood (MIN over range(0,64) minus
    used — 64 > the asserted color bound)."""
    hv = "((({v}) * 2654435761) % 4294967296)"
    m, t = SPARSE_MOD, COLOR_THIN
    ctes = [
        f"cedges AS MATERIALIZED (SELECT DISTINCT l_orderkey % {m} AS src, "
        f"l_partkey % {m} AS dst FROM lineitem "
        f"WHERE l_orderkey % {m} <> l_partkey % {m} "
        f"AND (l_orderkey % {m} + l_partkey % {m}) % {t} = 0)",
        "cund AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM cedges UNION ALL SELECT dst AS src, src AS dst "
        "FROM cedges) WHERE src <> dst)",
        "s0 AS MATERIALIZED (SELECT src AS id, CAST(NULL AS BIGINT) AS color "
        "FROM cund GROUP BY src)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"r{i} AS MATERIALIZED (SELECT v.id FROM s{p} v WHERE v.color IS NULL "
            f"AND NOT EXISTS (SELECT 1 FROM cund e JOIN s{p} u ON e.src = u.id "
            f"WHERE e.dst = v.id AND u.color IS NULL "
            f"AND {hv.format(v='u.id')} < {hv.format(v='v.id')}))"
        )
        ctes.append(
            f"u{i} AS MATERIALIZED (SELECT e.dst AS id, s.color FROM cund e "
            f"JOIN s{p} s ON e.src = s.id AND s.color IS NOT NULL "
            f"JOIN r{i} r ON e.dst = r.id GROUP BY e.dst, s.color)"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT s.id, COALESCE(s.color, "
            f"CASE WHEN r.id IS NULL THEN NULL ELSE ("
            f"SELECT MIN(g.c) FROM (SELECT UNNEST(range(0, 64)) AS c) g "
            f"WHERE g.c NOT IN (SELECT u.color FROM u{i} u WHERE u.id = s.id)"
            f") END) AS color FROM s{p} s LEFT JOIN r{i} r ON s.id = r.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, color FROM s{rounds}"
    )

def _mis_sql(rounds: int = MIS_ORACLE_ROUNDS) -> str:
    """Unrolled Luby twin of plans/mis.py on the sparse und graph."""
    hv = "((({v}) * 2654435761) % 4294967296)"
    ctes = [
        _EDGES_SPARSE_SQL.strip().rstrip(),
        "sverts AS MATERIALIZED (SELECT src AS id FROM und GROUP BY src)",
        "a0 AS MATERIALIZED (SELECT id FROM sverts)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"w{i} AS MATERIALIZED (SELECT v.id FROM a{p} v WHERE NOT EXISTS ("
            f"SELECT 1 FROM und e JOIN a{p} u ON e.src = u.id "
            f"WHERE e.dst = v.id AND {hv.format(v='u.id')} < {hv.format(v='v.id')}))"
        )
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT id FROM a{p} WHERE id NOT IN "
            f"(SELECT id FROM w{i}) AND id NOT IN "
            f"(SELECT e.dst FROM und e JOIN w{i} w ON e.src = w.id))"
        )
    mis_union = " UNION ALL ".join(f"SELECT id FROM w{i}" for i in range(1, rounds + 1))
    return (
        "WITH " + ",\n".join(ctes)
        + f",\nmis AS MATERIALIZED ({mis_union})\n"
        "SELECT v.id, v.id IN (SELECT id FROM mis) AS in_mis FROM sverts v"
    )

def _ktruss_sql(k: int = KTRUSS_K, rounds: int = KTRUSS_ORACLE_ROUNDS) -> str:
    """Unrolled support peeling: per round, enumerate triangles x<y<z over
    the canonical surviving edges, per-edge support = triangles containing
    it, keep support ≥ k-2. Final select recomputes support on the fixpoint
    set (matching plans/ktruss.py's returned ``support`` column)."""
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        "t0 AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM und)",
    ]

    def _sup(r: int) -> str:
        return (
            f"(SELECT a, b, COUNT(*)::BIGINT AS s FROM ("
            f"SELECT tr.x AS a, tr.y AS b FROM tri{r} tr "
            f"UNION ALL SELECT tr.y, tr.z FROM tri{r} tr "
            f"UNION ALL SELECT tr.x, tr.z FROM tri{r} tr) GROUP BY a, b)"
        )

    for r in range(rounds):
        ctes.append(
            f"tri{r} AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
            f"FROM t{r} e1 JOIN t{r} e2 ON e1.b = e2.a "
            f"JOIN t{r} e3 ON e3.a = e1.a AND e3.b = e2.b)"
        )
        ctes.append(
            f"t{r + 1} AS MATERIALIZED (SELECT t.a, t.b FROM t{r} t "
            f"JOIN {_sup(r)} s ON s.a = t.a AND s.b = t.b WHERE s.s >= {k - 2})"
        )
    ctes.append(
        f"trif AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
        f"FROM t{rounds} e1 JOIN t{rounds} e2 ON e1.b = e2.a "
        f"JOIN t{rounds} e3 ON e3.a = e1.a AND e3.b = e2.b)"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f" SELECT t.a AS src, t.b AS dst, COUNT(*)::BIGINT AS support FROM t{rounds} t "
        "JOIN (SELECT x AS a, y AS b FROM trif UNION ALL SELECT y, z FROM trif "
        "UNION ALL SELECT x, z FROM trif) s ON s.a = t.a AND s.b = t.b "
        "GROUP BY t.a, t.b"
    )

def _trussness_sql(rounds: int = TRUSSNESS_ORACLE_ROUNDS, und: str = "und") -> str:
    """Unrolled edge-h-index twin: triangles x<y<z enumerated once,
    fanned to (edge, other1, other2) rows; per round
    t(e) = least(t(e), H({min(t(o1), t(o2))})) with the same relational
    h-index (desc rank, max(least(value, rank))) as plans/trussness.py.
    ``und`` names the symmetric edge CTE so the decremental twin can run
    the identical rounds on a reduced set."""
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        "ce AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        f"GREATEST(src, dst) AS b FROM {und})",
        "tri AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
        "FROM ce e1 JOIN ce e2 ON e1.b = e2.a "
        "JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b)",
        "te AS MATERIALIZED ("
        "SELECT x AS s, y AS d, x AS s1, z AS d1, y AS s2, z AS d2 FROM tri "
        "UNION ALL SELECT x, z, x, y, y, z FROM tri "
        "UNION ALL SELECT y, z, x, y, x, z FROM tri)",
        "t0 AS MATERIALIZED (SELECT e.a AS s, e.b AS d, "
        "COALESCE(c.c, 0)::BIGINT AS t FROM ce e LEFT JOIN "
        "(SELECT s, d, COUNT(*)::BIGINT AS c FROM te GROUP BY s, d) c "
        "ON c.s = e.a AND c.d = e.b)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"t{i} AS MATERIALIZED (SELECT e.s, e.d, "
            f"LEAST(e.t, COALESCE(h.h, 0))::BIGINT AS t FROM t{p} e LEFT JOIN ("
            f"SELECT s, d, MAX(LEAST(m, rn))::BIGINT AS h FROM ("
            f"SELECT te.s, te.d, LEAST(a.t, b.t) AS m, "
            f"ROW_NUMBER() OVER (PARTITION BY te.s, te.d "
            f"ORDER BY LEAST(a.t, b.t) DESC) AS rn "
            f"FROM te JOIN t{p} a ON te.s1 = a.s AND te.d1 = a.d "
            f"JOIN t{p} b ON te.s2 = b.s AND te.d2 = b.d) GROUP BY s, d) h "
            f"ON e.s = h.s AND e.d = h.d)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT s AS src, d AS dst, (t + 2)::BIGINT AS truss FROM t{rounds}"
    )

def _onion_sql(rounds: int = ONION_ROUNDS) -> str:
    """Unrolled peeling-sweep twin: per round, live degrees (0 for
    peeled-isolated vertices), threshold k = max(k_prev, min live deg)
    carried as a 1-row CTE, simultaneous removal at deg ≤ k."""
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        "v0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM und)",
        "g0 AS MATERIALIZED (SELECT src, dst FROM und)",
        "kk0 AS (SELECT 0::BIGINT AS k)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"d{r} AS MATERIALIZED (SELECT v.id, COALESCE(c.d, 0)::BIGINT AS deg "
            f"FROM v{p} v LEFT JOIN (SELECT src AS id, COUNT(*)::BIGINT AS d "
            f"FROM g{p} GROUP BY src) c ON v.id = c.id)"
        )
        ctes.append(
            # MATERIALIZED is load-bearing: kk references its predecessor
            # twice, so an inlined chain expands 2^rounds
            f"kk{r} AS MATERIALIZED (SELECT GREATEST((SELECT k FROM kk{p}), "
            f"COALESCE((SELECT MIN(deg) FROM d{r}), (SELECT k FROM kk{p})))"
            f"::BIGINT AS k)"
        )
        ctes.append(
            f"rm{r} AS MATERIALIZED (SELECT id FROM d{r} "
            f"WHERE deg <= (SELECT k FROM kk{r}))"
        )
        ctes.append(
            f"o{r} AS (SELECT id, {r}::BIGINT AS layer, "
            f"(SELECT k FROM kk{r})::BIGINT AS core FROM rm{r})"
        )
        ctes.append(
            f"v{r} AS MATERIALIZED (SELECT id FROM v{p} "
            f"EXCEPT SELECT id FROM rm{r})"
        )
        ctes.append(
            f"g{r} AS MATERIALIZED (SELECT e.src, e.dst FROM g{p} e "
            f"JOIN v{r} a ON e.src = a.id JOIN v{r} b ON e.dst = b.id)"
        )
    union = " UNION ALL ".join(f"SELECT * FROM o{r}" for r in range(1, rounds + 1))
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, layer, core FROM ({union})"

def _msf_sql(
    rounds: int = MSF_ORACLE_ROUNDS, inner: int = MSF_INNER_J,
    out: str = "forest",
) -> str:
    """Unrolled Borůvka twin: per round, min cross edge per fragment
    label (ROW_NUMBER over (w, s, d) — the same total order as Spark's
    min_by struct), then ``inner`` hash-min steps on the chosen-edge
    quotient graph (q(c) ← least(q, min over projected neighbours),
    re-projected each step — fixpoint is the fragment-min label), then
    one vertex relabel. Rounds past convergence are no-ops.
    ``out="forest"`` emits the chosen edges (the MSF); ``out="clusters"``
    emits the round-``rounds`` fragment labels (affinity clustering)."""
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        "ce AS MATERIALIZED (SELECT a, b, "
        "('0x' || substr(md5(a::VARCHAR || '_' || b::VARCHAR), 1, 15))::BIGINT AS w "
        "FROM (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b "
        "FROM und))",
        "l0 AS MATERIALIZED (SELECT id, id AS lab FROM (SELECT DISTINCT a AS id "
        "FROM ce UNION SELECT b FROM ce))",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"cand{r} AS MATERIALIZED (SELECT la.lab AS c, e.a AS s, e.b AS d, e.w, "
            f"la.lab AS ls, lb.lab AS ld "
            f"FROM ce e JOIN l{p} la ON e.a = la.id JOIN l{p} lb ON e.b = lb.id "
            f"WHERE la.lab <> lb.lab "
            f"UNION ALL SELECT lb.lab, e.a, e.b, e.w, la.lab, lb.lab "
            f"FROM ce e JOIN l{p} la ON e.a = la.id JOIN l{p} lb ON e.b = lb.id "
            f"WHERE la.lab <> lb.lab)"
        )
        ctes.append(
            f"chosen{r} AS MATERIALIZED (SELECT DISTINCT s, d, w, ls, ld FROM ("
            f"SELECT s, d, w, ls, ld, "
            f"ROW_NUMBER() OVER (PARTITION BY c ORDER BY w, s, d) AS rn "
            f"FROM cand{r}) WHERE rn = 1)"
        )
        ctes.append(
            f"qe{r} AS MATERIALIZED (SELECT DISTINCT a, b FROM ("
            f"SELECT ls AS a, ld AS b FROM chosen{r} "
            f"UNION ALL SELECT ld, ls FROM chosen{r}))"
        )
        ctes.append(
            f"q{r}_0 AS MATERIALIZED (SELECT DISTINCT a AS c, a AS q FROM qe{r})"
        )
        for j in range(1, inner + 1):
            jp = j - 1
            ctes.append(
                f"m{r}_{j} AS MATERIALIZED (SELECT x, LEAST(x, MIN(y)) AS m FROM ("
                f"SELECT DISTINCT qa.q AS x, qb.q AS y "
                f"FROM qe{r} e JOIN q{r}_{jp} qa ON e.a = qa.c "
                f"JOIN q{r}_{jp} qb ON e.b = qb.c WHERE qa.q <> qb.q) GROUP BY x)"
            )
            ctes.append(
                f"q{r}_{j} AS MATERIALIZED (SELECT qq.c, COALESCE(m.m, qq.q) AS q "
                f"FROM q{r}_{jp} qq LEFT JOIN m{r}_{j} m ON qq.q = m.x)"
            )
        ctes.append(
            f"l{r} AS MATERIALIZED (SELECT l.id, COALESCE(q.q, l.lab) AS lab "
            f"FROM l{p} l LEFT JOIN q{r}_{inner} q ON l.lab = q.c)"
        )
    if out == "clusters":
        return (
            "WITH " + ",\n".join(ctes)
            + f"\nSELECT id, lab AS cluster FROM l{rounds}"
        )
    union = " UNION ALL ".join(
        f"SELECT s, d, w FROM chosen{r}" for r in range(1, rounds + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT DISTINCT s AS src, d AS dst, w AS weight FROM ({union})"
    )

def _matching_sql(
    rounds: int = MATCHING_ORACLE_ROUNDS, prio_sql: str | None = None,
    final: str | None = None,
) -> str:
    """Unrolled mutual-min twin: per round, each free vertex's min
    active incident edge by (p, s, d); an edge chosen by BOTH endpoints
    (COUNT(*) = 2 over the per-vertex argmin fan) joins the matching.
    ``prio_sql`` overrides the priority expression (over columns a, b);
    ``final`` overrides the closing SELECT (sees s{rounds} and ce)."""
    if prio_sql is None:
        prio_sql = (
            "('0x' || substr(md5('m_' || a::VARCHAR || '_' || b::VARCHAR), 1, 15))"
            "::BIGINT"
        )
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        f"ce AS MATERIALIZED (SELECT a, b, {prio_sql} AS p "
        "FROM (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM und))",
        "s0 AS MATERIALIZED (SELECT id, -1::BIGINT AS mate FROM ("
        "SELECT DISTINCT a AS id FROM ce UNION SELECT b FROM ce))",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"mn{i} AS MATERIALIZED (SELECT s, d FROM ("
            f"SELECT id, s, d, ROW_NUMBER() OVER (PARTITION BY id "
            f"ORDER BY p, s, d) AS rn FROM ("
            f"SELECT e.a AS id, e.a AS s, e.b AS d, e.p FROM ce e "
            f"JOIN s{p} x ON e.a = x.id AND x.mate = -1 "
            f"JOIN s{p} y ON e.b = y.id AND y.mate = -1 "
            f"UNION ALL "
            f"SELECT e.b, e.a, e.b, e.p FROM ce e "
            f"JOIN s{p} x ON e.a = x.id AND x.mate = -1 "
            f"JOIN s{p} y ON e.b = y.id AND y.mate = -1)) WHERE rn = 1)"
        )
        ctes.append(
            f"w{i} AS MATERIALIZED (SELECT s, d FROM mn{i} "
            f"GROUP BY s, d HAVING COUNT(*) = 2)"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT st.id, "
            f"COALESCE(w1.d, w2.s, st.mate)::BIGINT AS mate FROM s{p} st "
            f"LEFT JOIN w{i} w1 ON st.id = w1.s LEFT JOIN w{i} w2 ON st.id = w2.d)"
        )
    if final is None:
        final = f"SELECT id AS src, mate AS dst FROM s{rounds} WHERE mate > id"
    return "WITH " + ",\n".join(ctes) + "\n" + final

def _hec_sql() -> str:
    w_sql = (
        "('0x' || substr(md5(a::VARCHAR || '_' || b::VARCHAR), 1, 15))::BIGINT"
    )
    final = (
        f", lab AS (SELECT s AS id, s AS lab FROM w_match UNION ALL "
        f"SELECT d, s FROM w_match), "
        "rel AS (SELECT COALESCE(la.lab, e.a) AS ca, COALESCE(lb.lab, e.b) AS cb, "
        f"{HEC_MAXP} - e.p AS w "
        "FROM ce e LEFT JOIN lab la ON e.a = la.id LEFT JOIN lab lb ON e.b = lb.id "
        "WHERE COALESCE(la.lab, e.a) <> COALESCE(lb.lab, e.b)) "
        "SELECT LEAST(ca, cb) AS qa, GREATEST(ca, cb) AS qb, "
        "SUM(w)::VARCHAR AS total_w, COUNT(*)::BIGINT AS n_edges "
        "FROM rel GROUP BY 1, 2"
    )
    rounds = MATCHING_ORACLE_ROUNDS
    final = (
        f"w_match AS (SELECT id AS s, mate AS d FROM s{rounds} WHERE mate > id)"
        + final
    )
    return _matching_sql(prio_sql=f"{HEC_MAXP} - ({w_sql})", final="," + final)

def _partition_sql(out: str = "assign") -> str:
    """Unrolled twin of kway_partition: _matching_sql coarsening under
    the heavy-edge priority, md5 quotient init, two parity sub-rounds of
    capped majority moves. ``out='assign'`` emits (id, part);
    ``out='quality'`` the one-row cut/balance report."""
    k = PARTITION_K
    w_sql = "('0x' || substr(md5(a::VARCHAR || '_' || b::VARCHAR), 1, 15))::BIGINT"
    cap_sql = f"(n * {10 + PARTITION_EPS10}) // {10 * k}"
    ctes = [
        f"w_match AS (SELECT id AS s, mate AS d FROM s{MATCHING_ORACLE_ROUNDS} "
        "WHERE mate > id)",
        "lab AS (SELECT s AS id, s AS lab FROM w_match UNION ALL "
        "SELECT d, s FROM w_match)",
        "vv AS MATERIALIZED (SELECT id FROM s0)",
        "nn AS (SELECT COUNT(*)::BIGINT AS n FROM vv)",
        "p0 AS MATERIALIZED (SELECT v.id, "
        "('0x' || substr(md5('part_' || COALESCE(l.lab, v.id)::VARCHAR), 1, 15))"
        f"::BIGINT % {k} AS part FROM vv v LEFT JOIN lab l ON v.id = l.id)",
    ]
    for r in (1, 2):
        p, parity = r - 1, r - 1
        ctes.append(
            f"hist{r} AS MATERIALIZED (SELECT e.src AS v, p.part AS pu, "
            f"COUNT(*)::BIGINT AS cnt FROM und e JOIN p{p} p ON e.dst = p.id "
            "GROUP BY 1, 2)"
        )
        ctes.append(
            f"best{r} AS (SELECT v, pu AS dest, cnt AS best_cnt FROM ("
            "SELECT v, pu, cnt, ROW_NUMBER() OVER (PARTITION BY v "
            f"ORDER BY cnt DESC, pu ASC) AS rn FROM hist{r}) WHERE rn = 1)"
        )
        ctes.append(
            f"cand{r} AS (SELECT b.v, b.dest, "
            "b.best_cnt - COALESCE(o.cnt, 0) AS gain "
            f"FROM best{r} b JOIN p{p} c ON c.id = b.v "
            f"LEFT JOIN hist{r} o ON o.v = b.v AND o.pu = c.part "
            "WHERE b.dest <> c.part AND b.best_cnt - COALESCE(o.cnt, 0) > 0 "
            "AND ('0x' || substr(md5('mv_' || b.v::VARCHAR), 1, 15))::BIGINT % 2 "
            f"= {parity})"
        )
        ctes.append(
            f"size{r} AS (SELECT part AS dest, COUNT(*)::BIGINT AS sz "
            f"FROM p{p} GROUP BY part)"
        )
        ctes.append(
            f"acc{r} AS (SELECT v, dest FROM (SELECT c.v, c.dest, "
            "ROW_NUMBER() OVER (PARTITION BY c.dest "
            "ORDER BY c.gain DESC, c.v ASC) AS rn, "
            f"(SELECT {cap_sql} FROM nn) - COALESCE(s.sz, 0) AS slots "
            f"FROM cand{r} c LEFT JOIN size{r} s ON s.dest = c.dest) "
            "WHERE rn <= slots)"
        )
        ctes.append(
            f"p{r} AS MATERIALIZED (SELECT p.id, "
            "COALESCE(a.dest, p.part)::BIGINT AS part "
            f"FROM p{p} p LEFT JOIN acc{r} a ON a.v = p.id)"
        )
    if out == "assign":
        final_sel = "SELECT id, part FROM p2"
    else:
        ctes.append(
            "ph AS (SELECT id, "
            "('0x' || substr(md5('part_' || id::VARCHAR), 1, 15))::BIGINT "
            f"% {k} AS part FROM vv)"
        )
        ctes.append(
            "qh AS (SELECT COUNT(*)::BIGINT AS cut_hash FROM ce e "
            "JOIN ph x ON e.a = x.id JOIN ph y ON e.b = y.id "
            "WHERE x.part <> y.part)"
        )
        ctes.append(
            "qr AS (SELECT COUNT(*)::BIGINT AS cut_refined FROM ce e "
            "JOIN p2 x ON e.a = x.id JOIN p2 y ON e.b = y.id "
            "WHERE x.part <> y.part)"
        )
        ctes.append(
            "szq AS (SELECT MAX(c)::BIGINT AS max_part, MIN(c)::BIGINT AS min_part "
            "FROM (SELECT COUNT(*) AS c FROM p2 GROUP BY part))"
        )
        final_sel = (
            f"SELECT {k}::BIGINT AS k, nn.n AS n_vertices, "
            f"({cap_sql})::BIGINT AS cap, szq.max_part, szq.min_part, "
            "qh.cut_hash, qr.cut_refined FROM nn, szq, qh, qr"
        )
    return _matching_sql(
        prio_sql=f"{HEC_MAXP} - ({w_sql})",
        final="," + ",\n".join(ctes) + "\n" + final_sel,
    )

def _temporal_sql(rounds: int = TEMPORAL_ORACLE_ROUNDS, out: str = "arrival") -> str:
    """Unrolled relaxation twin: a_{k+1}(v) = least(a_k(v), min ts over
    in-edges (u, v, ts) with ts >= a_k(u)); integer 2^60 = unreached.
    ``out='shortest'`` additionally reports hops = the first round with
    a finite arrival (MIN over the per-round finite snapshots)."""
    inf = TEMPORAL_INF
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        "te AS MATERIALIZED (SELECT src, dst, "
        "('0x' || substr(md5('t_' || src::VARCHAR || '_' || dst::VARCHAR), 1, 15))"
        f"::BIGINT % {TEMPORAL_TS_MOD} AS ts FROM edges)",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges "
        "UNION SELECT dst FROM edges)",
        f"a0 AS MATERIALIZED (SELECT id, CASE WHEN id % {TEMPORAL_SEED_MOD} = 0 "
        f"THEN 0 ELSE {inf} END::BIGINT AS arr FROM verts)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT v.id, "
            f"LEAST(v.arr, COALESCE(r.m, {inf}))::BIGINT AS arr FROM a{p} v "
            f"LEFT JOIN (SELECT e.dst AS id, MIN(e.ts) AS m FROM te e "
            f"JOIN a{p} u ON e.src = u.id WHERE e.ts >= u.arr GROUP BY e.dst) r "
            f"ON v.id = r.id)"
        )
    if out == "shortest":
        parts = " UNION ALL ".join(
            f"SELECT id, {i}::BIGINT AS r FROM a{i} WHERE arr < {inf}"
            for i in range(rounds + 1)
        )
        return (
            "WITH " + ",\n".join(ctes)
            + f", h AS (SELECT id, MIN(r) AS hops FROM ({parts}) GROUP BY id)"
            + f"\nSELECT a.id, h.hops, a.arr AS arrival FROM a{rounds} a "
            f"JOIN h ON a.id = h.id WHERE a.arr < {inf}"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, arr AS arrival FROM a{rounds} WHERE arr < {inf}"
    )

def _temporal_ld_sql(rounds: int = TEMPORAL_ORACLE_ROUNDS) -> str:
    """Unrolled greatest-fixpoint twin: l_{k+1}(v) = greatest(l_k(v),
    max ts over out-edges (v, u, ts) with ts <= l_k(u)); −1 = cannot
    reach a seed, 2^60 = seed."""
    inf = TEMPORAL_INF
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        "te AS MATERIALIZED (SELECT src, dst, "
        "('0x' || substr(md5('t_' || src::VARCHAR || '_' || dst::VARCHAR), 1, 15))"
        f"::BIGINT % {TEMPORAL_TS_MOD} AS ts FROM edges)",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges "
        "UNION SELECT dst FROM edges)",
        f"a0 AS MATERIALIZED (SELECT id, CASE WHEN id % {TEMPORAL_SEED_MOD} = 0 "
        f"THEN {inf} ELSE -1 END::BIGINT AS ld FROM verts)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT v.id, "
            f"GREATEST(v.ld, COALESCE(r.m, -1))::BIGINT AS ld FROM a{p} v "
            f"LEFT JOIN (SELECT e.src AS id, MAX(e.ts) AS m FROM te e "
            f"JOIN a{p} u ON e.dst = u.id WHERE e.ts <= u.ld GROUP BY e.src) r "
            f"ON v.id = r.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ld AS latest_departure FROM a{rounds} WHERE ld >= 0"
    )

def _temporal_fp_sql(rounds: int = TEMPORAL_ORACLE_ROUNDS) -> str:
    """Unrolled Pareto-frontier twin of temporal_fastest_path: per round
    the frontier is (old pairs UNION eligible relaxations), pruned by the
    identical dominance window — keep (st, ar) iff ar < MIN(ar) over
    later-starting pairs (st DESC, ar ASC). Rounds past the fixpoint are
    no-ops; the converged frontier is unique, so set equality holds."""
    prune = (
        "SELECT id, st, ar FROM ("
        "SELECT id, st, ar, MIN(ar) OVER (PARTITION BY id "
        "ORDER BY st DESC, ar ASC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm "
        "FROM ({inner})) WHERE rm IS NULL OR ar < rm"
    )
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        "te AS MATERIALIZED (SELECT src, dst, "
        "('0x' || substr(md5('t_' || src::VARCHAR || '_' || dst::VARCHAR), 1, 15))"
        f"::BIGINT % {TEMPORAL_TS_MOD} AS ts FROM edges)",
        "fverts AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges "
        "UNION SELECT dst FROM edges)",
        "s0 AS MATERIALIZED (SELECT DISTINCT dst AS id, ts AS st, ts AS ar "
        f"FROM te WHERE src % {TEMPORAL_SEED_MOD} = 0)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        inner = (
            f"SELECT DISTINCT id, st, ar FROM ("
            f"SELECT id, st, ar FROM s{p} "
            f"UNION ALL "
            f"SELECT e.dst AS id, u.st, e.ts AS ar FROM te e "
            f"JOIN s{p} u ON e.src = u.id AND e.ts >= u.ar)"
        )
        ctes.append(f"s{i} AS MATERIALIZED ({prune.format(inner=inner)})")
    return (
        "WITH " + ",\n".join(ctes)
        + f",\nbase AS (SELECT id, MIN(ar - st)::BIGINT AS dur "
        + f"FROM s{rounds} GROUP BY id)\n"
        + f"SELECT id, 0::BIGINT AS fastest FROM fverts "
        + f"WHERE id % {TEMPORAL_SEED_MOD} = 0 "
        + f"UNION ALL SELECT id, dur AS fastest FROM base "
        + f"WHERE id % {TEMPORAL_SEED_MOD} <> 0"
    )

def _trussness_dec_sql(rounds: int = TRUSSNESS_ORACLE_ROUNDS) -> str:
    """Cold unrolled twin on the REDUCED graph (the decremental path's
    unique fixpoint): the same deletion rule applied to the canonical
    directed sparse edges, re-symmetrized."""
    base = _trussness_sql(rounds, und="und2")
    extra = (
        f"edges2 AS MATERIALIZED (SELECT src, dst FROM edges "
        f"WHERE (src * 31 + dst) % {TRUSS_DEC_MOD} <> 0),\n"
        "und2 AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM edges2 UNION ALL "
        "SELECT dst AS src, src AS dst FROM edges2) WHERE src <> dst),\n"
        "ce AS"
    )
    return base.replace("ce AS", extra, 1)

_DEG_SQL = "deg AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src)"

_WEDGE_SQL = (
    "wedge AS (SELECT h1.dst AS u, h2.dst AS v, h1.src AS w, d.deg AS deg_w "
    "FROM und h1 JOIN und h2 ON h1.src = h2.src AND h1.dst < h2.dst "
    "JOIN deg d ON d.id = h1.src WHERE d.deg <= {cap})"
).format(cap=HUB_CAP)

def _structural_holes_sql() -> str:
    """Twin of plans/metrics.py structural_holes: identical capped wedge
    set, identical integer quantizations (FLOOR(1e6/deg_w) q-terms,
    FLOOR(1e6·c_ij) j-terms), identical IEEE-double c_ij expression."""
    return f"""
WITH {_EDGES_SPARSE_SQL.strip()},
deg AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src),
{_WEDGE_SQL},
closed AS (SELECT w.u, w.v, w.deg_w FROM wedge w
  JOIN und a ON a.src = w.u AND a.dst = w.v),
s_uv AS MATERIALIZED (SELECT u, v,
  SUM(FLOOR(1000000.0 / deg_w))::BIGINT AS s FROM closed GROUP BY u, v),
s_dir AS (SELECT u, v, s FROM s_uv UNION ALL SELECT v AS u, u AS v, s FROM s_uv),
pairs AS (SELECT a.src AS u, COALESCE(sd.s, 0)::BIGINT AS s
  FROM und a LEFT JOIN s_dir sd ON sd.u = a.src AND sd.v = a.dst),
cons AS (SELECT pairs.u, SUM(FLOOR(
    (1.0 / d.deg + s / (1000000.0 * d.deg))
    * (1.0 / d.deg + s / (1000000.0 * d.deg)) * 1000000.0))::BIGINT AS cons_micro
  FROM pairs JOIN deg d ON d.id = pairs.u GROUP BY pairs.u),
utab AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM utab e1
  JOIN utab e2 ON e1.b = e2.a JOIN utab e3 ON e3.a = e1.a AND e3.b = e2.b),
tv AS (SELECT v, COUNT(*)::BIGINT AS t FROM (SELECT x AS v FROM tri
  UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri) GROUP BY v)
SELECT d.id, d.deg,
  ROUND(d.deg - 2.0 * COALESCE(tv.t, 0) / d.deg, 6) AS eff_size,
  ROUND((d.deg - 2.0 * COALESCE(tv.t, 0) / d.deg) / d.deg, 6) AS efficiency,
  ROUND(c.cons_micro / 1000000.0, 6) AS burt_constraint
FROM deg d LEFT JOIN tv ON tv.v = d.id JOIN cons c ON c.u = d.id
"""

def _ari_partitions_sql() -> str:
    """Twin of the ARI evaluation: the unrolled Louvain level-1 chain
    (common.py:_louvain_level1_ctes) and the sparse-graph LPA unroll
    (same argmax discipline as _lpa_sql) feed the integer contingency /
    C(x,2) identity of plans/metrics.py:partition_agreement."""
    ctes = _louvain_level1_ctes(LOUVAIN_ROUNDS)
    ctes.append("lp0 AS (SELECT id, id AS label FROM ldeg)")
    for i in range(1, LPA_ROUNDS + 1):
        p = i - 1
        ctes.append(
            f"lpc{i} AS (SELECT u.dst AS id, l.label FROM und u "
            f"JOIN lp{p} l ON u.src = l.id UNION ALL SELECT id, label FROM lp{p})"
        )
        ctes.append(
            f"lpn{i} AS (SELECT id, label, COUNT(*) AS c FROM lpc{i} GROUP BY id, label)"
        )
        ctes.append(
            f"lp{i} AS (SELECT id, label FROM (SELECT id, label, "
            f"ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, label ASC) AS rn "
            f"FROM lpn{i}) WHERE rn = 1)"
        )
    ctes.append(
        f"cont AS MATERIALIZED (SELECT a.label AS la, b.label AS lb, "
        f"COUNT(*)::BIGINT AS nij FROM l{LOUVAIN_ROUNDS} a "
        f"JOIN lp{LPA_ROUNDS} b ON a.id = b.id GROUP BY a.label, b.label)"
    )
    ctes.append(
        "tot AS (SELECT SUM(nij)::BIGINT AS n, "
        "SUM(nij * (nij - 1) // 2)::BIGINT AS sum_nij2 FROM cont)"
    )
    ctes.append(
        "am AS (SELECT COUNT(*)::BIGINT AS clusters_a, "
        "SUM(ai * (ai - 1) // 2)::BIGINT AS sum_a2 FROM "
        "(SELECT la, SUM(nij)::BIGINT AS ai FROM cont GROUP BY la))"
    )
    ctes.append(
        "bm AS (SELECT COUNT(*)::BIGINT AS clusters_b, "
        "SUM(bj * (bj - 1) // 2)::BIGINT AS sum_b2 FROM "
        "(SELECT lb, SUM(nij)::BIGINT AS bj FROM cont GROUP BY lb))"
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT n, clusters_a, clusters_b, sum_nij2, sum_a2, sum_b2, "
        "CASE WHEN (sum_a2 + sum_b2) / 2.0 "
        "  - sum_a2 * sum_b2 / (n * (n - 1) // 2) <> 0.0 THEN "
        "ROUND((sum_nij2 - sum_a2 * sum_b2 / (n * (n - 1) // 2)) "
        "/ ((sum_a2 + sum_b2) / 2.0 - sum_a2 * sum_b2 / (n * (n - 1) // 2)), 6) "
        "END AS ari FROM tot, am, bm"
    )

def _kcore_sql(k: int = KCORE_K, rounds: int = KCORE_ORACLE_ROUNDS) -> str:
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        f"a0 AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und "
        f"GROUP BY src HAVING COUNT(*) >= {k})",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"a{i} AS (SELECT e.src AS id, COUNT(*)::BIGINT AS deg FROM und e "
            f"JOIN a{p} x ON e.src = x.id JOIN a{p} y ON e.dst = y.id "
            f"GROUP BY e.src HAVING COUNT(*) >= {k})"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, deg FROM a{rounds}"

def _pagerank_ctes(weighted: bool = False, n_iters: int = PR_ITERS) -> list:
    d = 0.85
    w_expr = "((e.src * 7 + e.dst * 13) % 10 + 1)"  # _W_EXPR on aliased edges
    deg_expr = (
        "SUM((src * 7 + dst * 13) % 10 + 1)::DOUBLE" if weighted else "COUNT(*)::DOUBLE"
    )
    contrib_expr = f"SUM(r.rank * {w_expr} / o.deg)" if weighted else "SUM(r.rank/o.deg)"
    ctes = [_EDGES_SQL.strip().rstrip(),
            "nn AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS n FROM verts)",
            f"outdeg AS MATERIALIZED (SELECT src, {deg_expr} AS deg FROM edges GROUP BY src)",
            "r0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM nn) AS rank FROM verts)"]
    for i in range(1, n_iters + 1):
        p = i - 1
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT e.dst AS id, {contrib_expr} AS contrib "
            f"FROM edges e JOIN r{p} r ON e.src = r.id JOIN outdeg o ON e.src = o.src GROUP BY e.dst)"
        )
        ctes.append(
            f"dm{i} AS MATERIALIZED (SELECT COALESCE(SUM(rank),0) AS dm FROM r{p} r "
            f"WHERE NOT EXISTS (SELECT 1 FROM outdeg o WHERE o.src = r.id))"
        )
        ctes.append(
            f"r{i} AS MATERIALIZED (SELECT v.id, (1-{d})/(SELECT n FROM nn) + {d}*(COALESCE(c.contrib,0) "
            f"+ (SELECT dm FROM dm{i})/(SELECT n FROM nn)) AS rank "
            f"FROM verts v LEFT JOIN c{i} c ON v.id = c.id)"
        )
    return ctes


def _pagerank_sql(weighted: bool = False, n_iters: int = PR_ITERS) -> str:
    ctes = _pagerank_ctes(weighted, n_iters)
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, ROUND(rank, 6) AS rank FROM r{n_iters}"

def _katz_sql() -> str:
    """Unrolled Katz twin of plans/spectral.py: x_k = β + α·Σ_in x_{k-1},
    x_0 = β."""
    a, b, n_iters = KATZ_ALPHA, 1.0, KATZ_ITERS
    ctes = [
        _EDGES_SQL.strip().rstrip(),
        f"x0 AS MATERIALIZED (SELECT id, {b} AS katz FROM verts)",
    ]
    for i in range(1, n_iters + 1):
        p = i - 1
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(x.katz) AS c "
            f"FROM edges e JOIN x{p} x ON e.src = x.id GROUP BY e.dst)"
        )
        ctes.append(
            f"x{i} AS MATERIALIZED (SELECT v.id, {b} + {a}*COALESCE(c.c, 0) AS katz "
            f"FROM verts v LEFT JOIN c{i} c ON v.id = c.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(katz, 6) AS katz FROM x{n_iters}"
    )

def _eigen_ctes(n_iters: int = PR_ITERS) -> list:
    """CTE chain of the unrolled eigenvector-centrality twin:
    y_k = A·x̂_{k-1} over und, x̂_k = y_k/‖y_k‖₂, x̂_0 = 1/√n."""
    ctes = [
        _EDGES_SQL.strip().rstrip(),
        "nn AS (SELECT COUNT(*)::DOUBLE AS n FROM verts)",
        "x0 AS MATERIALIZED (SELECT id, 1.0/SQRT((SELECT n FROM nn)) AS x FROM verts)",
    ]
    for i in range(1, n_iters + 1):
        p = i - 1
        ctes.append(
            f"y{i} AS MATERIALIZED (SELECT v.id, COALESCE(c.c, 0) AS y FROM verts v "
            f"LEFT JOIN (SELECT u.dst AS id, SUM(x.x) AS c FROM und u "
            f"JOIN x{p} x ON u.src = x.id GROUP BY u.dst) c ON v.id = c.id)"
        )
        ctes.append(
            f"n{i} AS (SELECT SQRT(SUM(y*y)) AS nrm FROM y{i})"
        )
        ctes.append(
            f"x{i} AS MATERIALIZED (SELECT id, y/(SELECT nrm FROM n{i}) AS x FROM y{i})"
        )
    return ctes


def _eigen_sql() -> str:
    n_iters = PR_ITERS
    ctes = _eigen_ctes(n_iters)
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(x, 6) AS score FROM x{n_iters}"
    )

def _ppr_sql() -> str:
    """Unrolled personalized PageRank twin of plans/pagerank.py seeded mode:
    rank'(v) = p(v)·((1−d) + d·dm) + d·Σ contribs, p = uniform over seeds."""
    d, n_iters = 0.85, PR_ITERS
    ctes = [
        _EDGES_SQL.strip().rstrip(),
        "ns AS (SELECT COUNT(*)::DOUBLE AS s FROM verts WHERE id % 10 = 0)",
        "p AS (SELECT id, CASE WHEN id % 10 = 0 THEN 1.0/(SELECT s FROM ns) "
        "ELSE 0.0 END AS pm FROM verts)",
        "outdeg AS (SELECT src, COUNT(*)::DOUBLE AS deg FROM edges GROUP BY src)",
        "r0 AS (SELECT id, pm AS rank FROM p)",
    ]
    for i in range(1, n_iters + 1):
        pv = i - 1
        ctes.append(
            f"c{i} AS (SELECT e.dst AS id, SUM(r.rank/o.deg) AS contrib "
            f"FROM edges e JOIN r{pv} r ON e.src = r.id JOIN outdeg o ON e.src = o.src GROUP BY e.dst)"
        )
        ctes.append(
            f"dm{i} AS (SELECT COALESCE(SUM(rank),0) AS dm FROM r{pv} r "
            f"WHERE NOT EXISTS (SELECT 1 FROM outdeg o WHERE o.src = r.id))"
        )
        ctes.append(
            f"r{i} AS (SELECT p.id, p.pm*((1-{d}) + {d}*(SELECT dm FROM dm{i})) "
            f"+ {d}*COALESCE(c.contrib,0) AS rank FROM p LEFT JOIN c{i} c ON p.id = c.id)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, ROUND(rank, 6) AS rank FROM r{n_iters}"

def _scan_sql(
    num: int = SCAN_EPS_NUM,
    den: int = SCAN_EPS_DEN,
    mu: int = SCAN_MU,
    rounds: int = SCAN_CC_ROUNDS,
) -> str:
    """Twin of plans/scan.py scan_clusters over the sparse graph: the
    sigma >= eps test squared into pure integers, core test on the
    eps-neighborhood size, fixed-round min-label CC over core-core
    similar edges (convergence measured <= 8 rounds both SFs, asserted
    engine-side), border/hub/outlier classification."""
    ctes = [
        f"""{_EDGES_SPARSE_SQL.strip()},
verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM und),
degs AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src),
spairs AS MATERIALIZED (SELECT src AS a, dst AS b FROM und WHERE src < dst),
comm AS MATERIALIZED (SELECT p.a, p.b, COUNT(*)::BIGINT AS c
  FROM spairs p JOIN und x ON x.src = p.a JOIN und y ON y.src = p.b AND y.dst = x.dst
  GROUP BY p.a, p.b),
sim AS MATERIALIZED (SELECT p.a, p.b FROM spairs p
  LEFT JOIN comm c ON p.a = c.a AND p.b = c.b
  JOIN degs da ON da.id = p.a JOIN degs db ON db.id = p.b
  WHERE (COALESCE(c.c, 0) + 2) * (COALESCE(c.c, 0) + 2) * {den * den}
        >= {num * num} * (da.deg + 1) * (db.deg + 1)),
simn AS (SELECT id, COUNT(*)::BIGINT AS nsim
  FROM (SELECT a AS id FROM sim UNION ALL SELECT b FROM sim) GROUP BY id),
cores AS MATERIALIZED (SELECT v.id FROM verts v LEFT JOIN simn s ON v.id = s.id
  WHERE COALESCE(s.nsim, 0) + 1 >= {mu}),
csim AS MATERIALIZED (SELECT s.a, s.b FROM sim s
  JOIN cores ca ON s.a = ca.id JOIN cores cb ON s.b = cb.id),
csimu AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM csim UNION ALL SELECT b AS src, a AS dst FROM csim),
l0 AS (SELECT id, id AS label FROM cores)"""
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"l{i} AS (SELECT v.id, LEAST(v.label, COALESCE(m.minl, v.label)) AS label "
            f"FROM l{p} v LEFT JOIN (SELECT u.dst AS id, MIN(l.label) AS minl FROM csimu u "
            f"JOIN l{p} l ON u.src = l.id GROUP BY u.dst) m ON v.id = m.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f""",
corelab AS MATERIALIZED (SELECT id, label AS cluster FROM l{rounds}),
border AS MATERIALIZED (SELECT sb.u AS id, MIN(cl.cluster) AS cluster
  FROM (SELECT a AS u, b AS v FROM sim UNION ALL SELECT b AS u, a AS v FROM sim) sb
  JOIN corelab cl ON sb.v = cl.id
  WHERE sb.u NOT IN (SELECT id FROM cores) GROUP BY sb.u),
members AS MATERIALIZED (SELECT id, cluster, 'core' AS role FROM corelab
  UNION ALL SELECT id, cluster, 'border' AS role FROM border),
hubs AS MATERIALIZED (SELECT u.src AS id FROM und u JOIN members m ON u.dst = m.id
  WHERE u.src NOT IN (SELECT id FROM members)
  GROUP BY u.src HAVING COUNT(DISTINCT m.cluster) >= 2)
SELECT id, cluster::BIGINT AS cluster, role FROM members
UNION ALL SELECT id, NULL::BIGINT AS cluster, 'hub' AS role FROM hubs
UNION ALL SELECT v.id, NULL::BIGINT AS cluster, 'outlier' AS role FROM verts v
  WHERE v.id NOT IN (SELECT id FROM members) AND v.id NOT IN (SELECT id FROM hubs)
ORDER BY id"""
    )


def _cc_sql() -> str:
    ctes = [_EDGES_SQL.strip(), "l0 AS (SELECT id, id AS label FROM verts)"]
    for i in range(1, CC_ROUNDS + 1):
        p = i - 1
        ctes.append(
            f"l{i} AS (SELECT v.id, LEAST(v.label, COALESCE(m.minl, v.label)) AS label "
            f"FROM l{p} v LEFT JOIN (SELECT u.dst AS id, MIN(l.label) AS minl FROM und u "
            f"JOIN l{p} l ON u.src = l.id GROUP BY u.dst) m ON v.id = m.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, label AS component FROM l{CC_ROUNDS}"
    )

def _sssp_sql(weighted: bool = False) -> str:
    rounds = SSSP_W_ROUNDS if weighted else SSSP_ROUNDS
    relax_w = _W_EXPR.replace("src", "e.src").replace("dst", "e.dst") if weighted else "1"
    ctes = [_EDGES_SQL.strip(),
            "srcv AS (SELECT LEAST(MIN(src), MIN(dst)) AS s FROM edges)",
            "d0 AS (SELECT (SELECT s FROM srcv) AS id, 0::BIGINT AS dist)"]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"d{i} AS (SELECT id, MIN(dist)::BIGINT AS dist FROM ("
            f"SELECT id, dist FROM d{p} UNION ALL "
            f"SELECT e.dst AS id, d.dist + ({relax_w}) AS dist FROM edges e JOIN d{p} d ON e.src = d.id"
            f") GROUP BY id)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, dist FROM d{rounds}"

def _lpa_sql() -> str:
    ctes = [_EDGES_SQL.strip(), "l0 AS (SELECT id, id AS label FROM verts)"]
    for i in range(1, LPA_ROUNDS + 1):
        p = i - 1
        ctes.append(
            f"cand{i} AS (SELECT u.dst AS id, l.label FROM und u JOIN l{p} l ON u.src = l.id "
            f"UNION ALL SELECT id, label FROM l{p})"
        )
        ctes.append(
            f"cnt{i} AS (SELECT id, label, COUNT(*) AS c FROM cand{i} GROUP BY id, label)"
        )
        ctes.append(
            f"l{i} AS (SELECT id, label FROM (SELECT id, label, "
            f"ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, label ASC) AS rn FROM cnt{i}) "
            f"WHERE rn = 1)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, label FROM l{LPA_ROUNDS}"

def _media_decode_sql() -> str:
    """Closed-form ground truth of the media synthesis recipe (multimodal.py):
    the Spark side parses actual PNG/WAV/MP4 bytes; this recomputes what the
    parse must return per media_id — a full round-trip decode oracle."""
    return f"""
WITH m AS (SELECT unnest(range(0, {N_MEDIA})) AS mid),
img AS (SELECT mid, 8 + mid % 24 AS w, 8 + (7*mid) % 24 AS h FROM m WHERE mid % 3 = 0),
aud AS (SELECT mid, 1 + mid % 2 AS ch, 8000*(1 + mid % 4) AS rate, 50 + mid % 200 AS frames
        FROM m WHERE mid % 3 = 1)
SELECT mid::BIGINT AS media_id, 'image' AS kind, TRUE AS ok, 'png' AS format,
  (68 + h*(3*w+1))::BIGINT AS n_bytes, w::BIGINT AS width, h::BIGINT AS height,
  8::BIGINT AS bit_depth,
  list_sum(list_transform(range(0, w*h*3), i -> (mid + i) % 256))::BIGINT AS pixel_sum,
  -1::BIGINT AS channels, -1::BIGINT AS sample_rate, -1::BIGINT AS n_samples,
  -1::BIGINT AS sample_sum, -1::BIGINT AS duration_ms
FROM img
UNION ALL
SELECT mid::BIGINT, 'audio', TRUE, 'wav', (44 + 2*frames*ch)::BIGINT,
  -1::BIGINT, -1::BIGINT, -1::BIGINT, -1::BIGINT,
  ch::BIGINT, rate::BIGINT, (frames*ch)::BIGINT,
  list_sum(list_transform(range(0, frames*ch), i -> (31*mid + 17*i) % 4096 - 2048))::BIGINT,
  (frames*1000 // rate)::BIGINT
FROM aud
UNION ALL
SELECT mid::BIGINT, 'video', TRUE, 'mp4', (208 + mid % 256)::BIGINT,
  -1::BIGINT, -1::BIGINT, -1::BIGINT, -1::BIGINT, -1::BIGINT, -1::BIGINT,
  -1::BIGINT, -1::BIGINT, (1000 + (13*mid) % 5000)::BIGINT
FROM m WHERE mid % 3 = 2
"""

_COS_SQL = (
    "list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i]::DOUBLE * c.embedding[i]::DOUBLE)) "
    "/ (sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE))) "
    "* sqrt(list_sum(list_transform(c.embedding, x -> x::DOUBLE * x::DOUBLE))))"
)


def _edge_percolation_sql(rounds: int = EP_ROUNDS) -> str:
    """Per p: deterministic md5-per-canonical-edge keep set, fixed-round
    min-label flood, component sizes + isolated singletons — mirrors
    _robustness_sql with edges removed instead of vertices."""
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        "nall AS (SELECT COUNT(DISTINCT src)::BIGINT AS n FROM und)",
        "uu AS MATERIALIZED (SELECT src AS a, dst AS b, "
        "('0x' || substr(md5('ep' || src::VARCHAR || '_' || dst::VARCHAR), 1, 15))"
        "::BIGINT % 100 AS h FROM und WHERE src < dst)",
    ]
    selects = []
    for p in EP_PS:
        ctes.append(
            f"k{p}e AS MATERIALIZED (SELECT a AS src, b AS dst FROM uu WHERE h >= {p} "
            f"UNION ALL SELECT b, a FROM uu WHERE h >= {p})"
        )
        ctes.append(f"k{p}l0 AS (SELECT DISTINCT src AS id, src AS label FROM k{p}e)")
        for i in range(1, rounds + 1):
            q = i - 1
            ctes.append(
                f"k{p}l{i} AS MATERIALIZED (SELECT v.id, "
                f"LEAST(v.label, COALESCE(m.minl, v.label)) AS label "
                f"FROM k{p}l{q} v LEFT JOIN (SELECT u.dst AS id, "
                f"MIN(l.label) AS minl FROM k{p}e u "
                f"JOIN k{p}l{q} l ON u.src = l.id GROUP BY u.dst) m "
                f"ON v.id = m.id)"
            )
        ctes.append(
            f"k{p}s AS (SELECT label, COUNT(*)::BIGINT AS n FROM k{p}l{rounds} "
            f"GROUP BY label)"
        )
        selects.append(
            f"SELECT {p}::BIGINT AS p_removed_pct, "
            f"(SELECT COUNT(*)::BIGINT FROM uu WHERE h >= {p}) AS n_edges_kept, "
            f"((SELECT COUNT(*)::BIGINT FROM k{p}s) + (SELECT n FROM nall) "
            f"- (SELECT COALESCE(SUM(n), 0)::BIGINT FROM k{p}s)) AS n_components, "
            f"(SELECT COALESCE(MAX(n), 1)::BIGINT FROM k{p}s) AS largest_cc"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + " UNION ALL ".join(selects)


def _path_counts_sql(rounds: int = BETW_ROUNDS) -> str:
    """Forward-sigma twin (the f{t} chain of _betweenness_sql) exposed as
    the path-multiplicity table."""
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        f"srcs AS (SELECT id FROM (SELECT src AS id FROM edges UNION SELECT dst FROM edges) "
        f"ORDER BY id LIMIT {N_BETW_SOURCES})",
        "f0 AS (SELECT id, id AS source, 0::BIGINT AS dist, 1.0::DOUBLE AS sigma FROM srcs)",
    ]
    for t in range(1, rounds + 1):
        q = t - 1
        ctes.append(
            f"f{t} AS MATERIALIZED (SELECT id, source, dist, sigma FROM f{q} "
            f"UNION ALL SELECT n.id, n.source, {t}::BIGINT AS dist, n.sigma FROM ("
            f"SELECT e.dst AS id, d.source, SUM(d.sigma) AS sigma FROM edges e "
            f"JOIN f{q} d ON e.src = d.id AND d.dist = {q} GROUP BY e.dst, d.source) n "
            f"WHERE NOT EXISTS (SELECT 1 FROM f{q} x WHERE x.id = n.id AND x.source = n.source))"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, source, dist, CAST(sigma AS BIGINT) AS n_paths FROM f{rounds}"
    )


def _bm25_sql(n_query_terms: int = 4, k: int = 20) -> str:
    """Twin of CS.bm25_topk: identical expression tree with float
    literals emitted via repr() of the SAME python-computed doubles the
    Spark side uses, so both engines parse bit-identical constants."""
    k1, b = 12 / 10.0, 75 / 100.0
    k1p1, omb = repr(k1 + 1.0), repr(1.0 - b)
    k1r, br = repr(k1), repr(b)
    return f"""
WITH btf AS MATERIALIZED (SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM
    (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
     x -> x <> '')) AS term FROM documents) GROUP BY doc_id, term),
dlen AS MATERIALIZED (SELECT doc_id, SUM(tf)::BIGINT AS dl FROM btf GROUP BY doc_id),
st AS (SELECT COUNT(*)::BIGINT AS n, SUM(dl)::BIGINT AS tot FROM dlen),
cf AS (SELECT term, SUM(tf)::BIGINT AS cf, COUNT(*)::BIGINT AS df FROM btf GROUP BY term),
qt AS (SELECT term, df FROM (SELECT term, df,
    ROW_NUMBER() OVER (ORDER BY cf DESC, term ASC) AS rn FROM cf) WHERE rn <= {n_query_terms}),
sc AS (SELECT t.doc_id, CAST(ROUND(
    ln((CAST((SELECT n FROM st) AS DOUBLE) - q.df + 0.5) / (q.df + 0.5) + 1.0)
    * t.tf * {k1p1}
    / (t.tf + {k1r} * ({omb} + {br} * d.dl * CAST((SELECT n FROM st) AS DOUBLE)
       / CAST((SELECT tot FROM st) AS DOUBLE)))
    * 1000000.0) AS BIGINT) AS c
    FROM btf t JOIN qt q ON t.term = q.term JOIN dlen d ON t.doc_id = d.doc_id),
ag AS (SELECT doc_id, COUNT(*)::BIGINT AS n_match, SUM(c)::BIGINT AS score_micro
       FROM sc GROUP BY doc_id)
SELECT doc_id, n_match, score_micro, ROUND(score_micro / 1000000.0, 6) AS score, rn
FROM (SELECT doc_id, n_match, score_micro,
      ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id ASC)::BIGINT AS rn FROM ag)
WHERE rn <= {k}
"""


def _fiedler_ctes(n_iters: int = 16, S: int = 10_000) -> list:
    """Shared CTE chain of the quantized Fiedler iteration (integer
    state each round; the two divisions are correctly-rounded doubles
    of exact-integer operands — replays the Spark trajectory
    bit-for-bit)."""
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        "fdeg AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src)",
        "fc AS (SELECT (MAX(deg) + 1)::BIGINT AS c FROM fdeg)",
        "fn AS (SELECT COUNT(*)::BIGINT AS n FROM fdeg)",
        f"x0 AS MATERIALIZED (SELECT id, "
        f"((('0x' || substr(md5('fv' || id::VARCHAR), 1, 15))::BIGINT % (2*{S}+1)) - {S})::BIGINT AS v "
        "FROM fdeg)",
    ]
    for r in range(1, n_iters + 1):
        p = r - 1
        ctes.append(
            f"fg{r} AS (SELECT u.src AS id, SUM(x.v)::BIGINT AS g FROM und u "
            f"JOIN x{p} x ON u.dst = x.id GROUP BY u.src)"
        )
        ctes.append(
            f"fw{r} AS MATERIALIZED (SELECT d.id, "
            f"(((SELECT c FROM fc) - d.deg) * x.v + COALESCE(g.g, 0))::BIGINT AS w "
            f"FROM fdeg d JOIN x{p} x ON d.id = x.id LEFT JOIN fg{r} g ON d.id = g.id)"
        )
        ctes.append(
            f"fm{r} AS (SELECT CAST(ROUND(SUM(w) / (SELECT n FROM fn)) AS BIGINT) AS mbar FROM fw{r})"
        )
        ctes.append(
            f"fu{r} AS MATERIALIZED (SELECT id, (w - (SELECT mbar FROM fm{r}))::BIGINT AS u FROM fw{r})"
        )
        ctes.append(
            f"fx{r} AS (SELECT GREATEST(MAX(u), -MIN(u))::BIGINT AS mx FROM fu{r})"
        )
        ctes.append(
            f"x{r} AS MATERIALIZED (SELECT id, CASE WHEN (SELECT mx FROM fx{r}) > 0 "
            f"THEN CAST(ROUND(u * {S} / (SELECT mx FROM fx{r})) AS BIGINT) "
            f"ELSE 0 END AS v FROM fu{r})"
        )
    return ctes


def _fiedler_sql(n_iters: int = 16, S: int = 10_000) -> str:
    return (
        "WITH " + ",\n".join(_fiedler_ctes(n_iters, S))
        + f"\nSELECT id, v, CASE WHEN v > 0 THEN 1 ELSE 0 END::BIGINT AS side FROM x{n_iters}"
    )


def _fiedler_sweep_sql(n_iters: int = 16, S: int = 10_000, sweep_l: int = 64) -> str:
    """Spectral sweep twin: Fiedler CTE chain, value-sorted all-integer
    rank (v asc, id asc) truncated to sweep_l, then the identical
    difference-histogram conductance tail the PPR sweep twin uses."""
    ctes = _fiedler_ctes(n_iters, S) + [
        f"tk AS MATERIALIZED (SELECT id, deg, k FROM (SELECT x.id, d.deg, "
        f"ROW_NUMBER() OVER (ORDER BY x.v ASC, x.id ASC)::BIGINT AS k "
        f"FROM x{n_iters} x JOIN fdeg d ON x.id = d.id) WHERE k <= {sweep_l})",
        "m2 AS (SELECT COUNT(*)::BIGINT AS c2 FROM und)",
        "uu AS (SELECT src AS a, dst AS b FROM und WHERE src < dst)",
        f"er AS (SELECT LEAST(COALESCE(ta.k, {sweep_l + 1}), COALESCE(tb.k, {sweep_l + 1})) AS lo, "
        f"GREATEST(COALESCE(ta.k, {sweep_l + 1}), COALESCE(tb.k, {sweep_l + 1})) AS hi "
        "FROM uu LEFT JOIN tk ta ON uu.a = ta.id LEFT JOIN tk tb ON uu.b = tb.id)",
        f"st AS (SELECT lo AS k, COUNT(*)::BIGINT AS n_open FROM er WHERE lo <= {sweep_l} GROUP BY lo)",
        f"en AS (SELECT hi AS k, COUNT(*)::BIGINT AS n_close FROM er WHERE hi <= {sweep_l} GROUP BY hi)",
        "ax AS (SELECT t.k, t.id, t.deg, COALESCE(st.n_open, 0) AS o, "
        "COALESCE(en.n_close, 0) AS c FROM tk t "
        "LEFT JOIN st ON st.k = t.k LEFT JOIN en ON en.k = t.k)",
        "fin AS (SELECT k, id, deg, CAST(SUM(deg) OVER (ORDER BY k) AS BIGINT) AS vol, "
        "CAST(SUM(o - c) OVER (ORDER BY k) AS BIGINT) AS cut FROM ax)",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT k, id, deg, vol, cut, "
        "CASE WHEN LEAST(vol, (SELECT c2 FROM m2) - vol) > 0 THEN "
        "ROUND(cut / LEAST(vol, (SELECT c2 FROM m2) - vol), 6) END AS phi FROM fin"
    )


def _pca_sql(rounds: int = 8, dim: int = 64, scale: int = 1000, norm_scale: int = 10**6) -> str:
    """Unrolled twin of operators/similarity.py:pca_top_component — same
    FLOOR quantizer, same exact-integer Gram, same TRUNCATING (`//`)
    renormalization per round, same largest-|loading| sign convention."""
    ctes = [
        "ex AS MATERIALIZED (SELECT vec_id, ix.i AS pos, "
        f"embedding[ix.i + 1]::DOUBLE AS val FROM embeddings, "
        f"(SELECT unnest(range(0, {dim})) AS i) ix)",
        f"pts AS MATERIALIZED (SELECT vec_id, pos, FLOOR(val * {scale})::BIGINT AS q FROM ex)",
        "g AS MATERIALIZED (SELECT a.pos AS i, b.pos AS j, SUM(a.q * b.q) AS gv "
        "FROM pts a JOIN pts b ON a.vec_id = b.vec_id GROUP BY 1, 2)",
        f"v0 AS MATERIALIZED (SELECT unnest(range(0, {dim})) AS pos, 1::HUGEINT AS v)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"u{r} AS MATERIALIZED (SELECT g.i AS pos, SUM(g.gv * v.v) AS u "
            f"FROM g JOIN v{r - 1} v ON g.j = v.pos GROUP BY g.i)"
        )
        ctes.append(
            f"v{r} AS MATERIALIZED (SELECT pos, (u * {norm_scale}) // "
            f"GREATEST((SELECT MAX(ABS(u)) FROM u{r}), 1) AS v FROM u{r})"
        )
    last = f"v{rounds}"
    return (
        "WITH " + ", ".join(ctes) + ", "
        f"sg AS (SELECT CASE WHEN (SELECT v FROM {last} ORDER BY ABS(v) DESC, pos ASC LIMIT 1) < 0 "
        "THEN -1 ELSE 1 END AS s) "
        f"SELECT pos::BIGINT AS pos, (v * sg.s)::BIGINT AS loading_q FROM {last}, sg"
    )


def _truss_communities_sql(
    k: int = KTRUSS_K, rounds: int = KTRUSS_ORACLE_ROUNDS, cc_rounds: int = 12
) -> str:
    """Truss-community search twin (Huang et al., "Querying k-truss
    community in large and dynamic graphs", SIGMOD 2014, seedless batch
    form): the _ktruss_sql peel to fixpoint, then a min-label flood
    restricted to the surviving edge set; community id = min member
    vertex, one row per community with vertex/edge counts."""
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        "t0 AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM und)",
    ]

    def _sup(r: int) -> str:
        return (
            f"(SELECT a, b, COUNT(*)::BIGINT AS s FROM ("
            f"SELECT tr.x AS a, tr.y AS b FROM tri{r} tr "
            f"UNION ALL SELECT tr.y, tr.z FROM tri{r} tr "
            f"UNION ALL SELECT tr.x, tr.z FROM tri{r} tr) GROUP BY a, b)"
        )

    for r in range(rounds):
        ctes.append(
            f"tri{r} AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
            f"FROM t{r} e1 JOIN t{r} e2 ON e1.b = e2.a "
            f"JOIN t{r} e3 ON e3.a = e1.a AND e3.b = e2.b)"
        )
        ctes.append(
            f"t{r + 1} AS MATERIALIZED (SELECT t.a, t.b FROM t{r} t "
            f"JOIN {_sup(r)} s ON s.a = t.a AND s.b = t.b WHERE s.s >= {k - 2})"
        )
    ctes.append(
        f"tu AS MATERIALIZED (SELECT a AS s, b AS d FROM t{rounds} "
        f"UNION ALL SELECT b, a FROM t{rounds})"
    )
    ctes.append(
        "nb AS MATERIALIZED (SELECT s AS id, d AS nb FROM tu "
        "UNION ALL SELECT DISTINCT s, s FROM tu)"
    )
    ctes.append("l0 AS MATERIALIZED (SELECT DISTINCT s AS id, s AS lbl FROM tu)")
    for i in range(1, cc_rounds + 1):
        ctes.append(
            f"l{i} AS MATERIALIZED (SELECT v.id, MIN(l.lbl)::BIGINT AS lbl "
            f"FROM nb v JOIN l{i - 1} l ON l.id = v.nb GROUP BY v.id)"
        )
    last = f"l{cc_rounds}"
    return (
        "WITH " + ",\n".join(ctes) + ", "
        f"nv AS (SELECT lbl AS community, COUNT(*)::BIGINT AS n_vertices FROM {last} GROUP BY lbl), "
        f"ne AS (SELECT la.lbl AS community, COUNT(*)::BIGINT AS n_edges "
        f"FROM t{rounds} e JOIN {last} la ON la.id = e.a GROUP BY la.lbl) "
        "SELECT nv.community, nv.n_vertices, ne.n_edges FROM nv JOIN ne USING (community)"
    )


def _ab_core_sql(
    alpha: int = ABCORE_ALPHA,
    beta: int = ABCORE_BETA,
    mod: int = ABCORE_MOD,
    rounds: int = ABCORE_ROUNDS,
) -> str:
    """Fixed-unroll twin of plans/bipartite.py:ab_core — alternate
    degree-threshold half-steps on the order→part bipartite graph;
    rounds past the fixpoint are no-ops, so a deep-enough unroll equals
    the engine's exact fixpoint (asserted engine-side)."""
    ctes = [
        f"e0 AS MATERIALIZED (SELECT DISTINCT l_orderkey % {mod} AS u, "
        f"l_partkey % {mod} AS v FROM lineitem)"
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"h{r} AS MATERIALIZED (SELECT u, v FROM e{p} WHERE u IN "
            f"(SELECT u FROM e{p} GROUP BY u HAVING COUNT(*) >= {alpha}))"
        )
        ctes.append(
            f"e{r} AS MATERIALIZED (SELECT u, v FROM h{r} WHERE v IN "
            f"(SELECT v FROM h{r} GROUP BY v HAVING COUNT(*) >= {beta}))"
        )
    return "WITH " + ",\n".join(ctes) + f" SELECT u, v FROM e{rounds}"


def _trustrank_sql(n_iters: int = PR_ITERS) -> str:
    """Twin of _q_trustrank: the plain-PageRank unroll (r-chain) and the
    seeded TrustRank unroll (t-chain, teleport + dangling mass to the
    id % TRUST_MOD == TRUST_REM seeds) side by side in one WITH; spam
    mass divides the two ROUND(.,6) doubles exactly as the engine does."""
    from metis_spark.driver.common import TRUST_MOD, TRUST_REM

    d = 0.85
    ctes = [
        _EDGES_SQL.strip().rstrip(),
        "nn AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS n FROM verts)",
        "outdeg AS MATERIALIZED (SELECT src, COUNT(*)::DOUBLE AS deg FROM edges GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM nn) AS rank FROM verts)",
        f"ns AS (SELECT COUNT(*)::DOUBLE AS s FROM verts WHERE id % {TRUST_MOD} = {TRUST_REM})",
        f"p AS MATERIALIZED (SELECT id, CASE WHEN id % {TRUST_MOD} = {TRUST_REM} "
        "THEN 1.0/(SELECT s FROM ns) ELSE 0.0 END AS pm FROM verts)",
        "t0 AS MATERIALIZED (SELECT id, pm AS rank FROM p)",
    ]
    for i in range(1, n_iters + 1):
        pv = i - 1
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(r.rank/o.deg) AS contrib "
            f"FROM edges e JOIN r{pv} r ON e.src = r.id JOIN outdeg o ON e.src = o.src GROUP BY e.dst)"
        )
        ctes.append(
            f"dm{i} AS (SELECT COALESCE(SUM(rank),0) AS dm FROM r{pv} r "
            f"WHERE NOT EXISTS (SELECT 1 FROM outdeg o WHERE o.src = r.id))"
        )
        ctes.append(
            f"r{i} AS MATERIALIZED (SELECT v.id, (1-{d})/(SELECT n FROM nn) + {d}*(COALESCE(c.contrib,0) "
            f"+ (SELECT dm FROM dm{i})/(SELECT n FROM nn)) AS rank "
            f"FROM verts v LEFT JOIN c{i} c ON v.id = c.id)"
        )
        ctes.append(
            f"tc{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(t.rank/o.deg) AS contrib "
            f"FROM edges e JOIN t{pv} t ON e.src = t.id JOIN outdeg o ON e.src = o.src GROUP BY e.dst)"
        )
        ctes.append(
            f"tdm{i} AS (SELECT COALESCE(SUM(rank),0) AS dm FROM t{pv} t "
            f"WHERE NOT EXISTS (SELECT 1 FROM outdeg o WHERE o.src = t.id))"
        )
        ctes.append(
            f"t{i} AS MATERIALIZED (SELECT p.id, p.pm*((1-{d}) + {d}*(SELECT dm FROM tdm{i})) "
            f"+ {d}*COALESCE(c.contrib,0) AS rank FROM p LEFT JOIN tc{i} c ON p.id = c.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f",\nfin AS (SELECT r.id, ROUND(r.rank, 6) AS pr, ROUND(t.rank, 6) AS tr "
        f"FROM r{n_iters} r JOIN t{n_iters} t ON r.id = t.id)\n"
        "SELECT id, pr, tr, ROUND((pr - tr)/pr, 6) AS spam_mass FROM fin"
    )


def _cocitation_sql() -> str:
    """Twin of plans/metrics.py:cocitation_coupling_topk on the sparse
    directed graph: both wedge generations apply the identical fan-out
    cap BEFORE the self-join; full-outer pair merge; all-integer
    deterministic ranking."""
    from metis_spark.driver.common import COCIT_CAP, COCIT_K

    return f"""WITH {_EDGES_SPARSE_SQL.strip()},
citers AS MATERIALIZED (SELECT src FROM edges GROUP BY src HAVING COUNT(*) <= {COCIT_CAP}),
cw AS MATERIALIZED (SELECT e.src AS w, e.dst AS n FROM edges e JOIN citers c ON e.src = c.src),
cocit AS MATERIALIZED (SELECT a.n AS u, b.n AS v, COUNT(*)::BIGINT AS cocitation
  FROM cw a JOIN cw b ON a.w = b.w AND a.n < b.n GROUP BY a.n, b.n),
cited AS MATERIALIZED (SELECT dst FROM edges GROUP BY dst HAVING COUNT(*) <= {COCIT_CAP}),
pw AS MATERIALIZED (SELECT e.dst AS w, e.src AS n FROM edges e JOIN cited c ON e.dst = c.dst),
coup AS MATERIALIZED (SELECT a.n AS u, b.n AS v, COUNT(*)::BIGINT AS coupling
  FROM pw a JOIN pw b ON a.w = b.w AND a.n < b.n GROUP BY a.n, b.n),
merged AS (SELECT COALESCE(c.u, p.u) AS u, COALESCE(c.v, p.v) AS v,
  COALESCE(c.cocitation, 0)::BIGINT AS cocitation, COALESCE(p.coupling, 0)::BIGINT AS coupling
  FROM cocit c FULL OUTER JOIN coup p ON c.u = p.u AND c.v = p.v)
SELECT u, v, cocitation, coupling,
  ROW_NUMBER() OVER (ORDER BY cocitation DESC, coupling DESC, u, v)::BIGINT AS rn
FROM merged ORDER BY cocitation DESC, coupling DESC, u, v LIMIT {COCIT_K}"""


def _butterfly_sql(mod: int = ABCORE_MOD) -> str:
    """Twin of plans/bipartite.py:butterfly_summary on the order-part
    graph: same right-side wedge self-join, same closed-form caterpillar
    count, all-integer until the single cc division."""
    return f"""WITH be AS MATERIALIZED (
  SELECT DISTINCT l_orderkey % {mod} AS u, l_partkey % {mod} AS v FROM lineitem),
degu AS MATERIALIZED (SELECT u, COUNT(*)::BIGINT AS du FROM be GROUP BY u),
degv AS MATERIALIZED (SELECT v, COUNT(*)::BIGINT AS dv FROM be GROUP BY v),
pairs AS MATERIALIZED (SELECT a.u AS u1, b.u AS u2, COUNT(*)::BIGINT AS c
  FROM be a JOIN be b ON a.v = b.v AND a.u < b.u GROUP BY a.u, b.u),
bf AS (SELECT COALESCE(SUM(c*(c-1)//2), 0)::BIGINT AS b FROM pairs),
wg AS (SELECT COALESCE(SUM(dv*(dv-1)//2), 0)::BIGINT AS w FROM degv),
ct AS (SELECT COALESCE(SUM((du-1)*(dv-1)), 0)::BIGINT AS p3
  FROM be JOIN degu USING (u) JOIN degv USING (v)),
cn AS (SELECT COUNT(DISTINCT u)::BIGINT AS n_left, COUNT(DISTINCT v)::BIGINT AS n_right,
  COUNT(*)::BIGINT AS n_edges FROM be)
SELECT n_left, n_right, n_edges, w AS n_wedges, b AS n_butterflies,
  p3 AS n_caterpillars,
  CASE WHEN p3 > 0 THEN ROUND(4.0*b::DOUBLE/p3::DOUBLE, 6) ELSE 0.0 END AS bipartite_cc
FROM cn, wg, bf, ct"""


def _cpm_sql() -> str:
    """Twin of plans/cpm.py:clique_percolation_k3 on the sparse graph:
    ordered triangle enumeration, packed ids, per-shared-edge star rows,
    fixed-round min-label flood (engine asserts convergence < rounds),
    community profile."""
    from metis_spark.driver.common import CPM_CC_ROUNDS, CPM_PACK

    P = CPM_PACK
    ctes = [
        f"""{_EDGES_SPARSE_SQL.strip()},
tris AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM und e1 JOIN und e2 ON e2.src = e1.dst AND e2.dst > e1.dst
  JOIN und e3 ON e3.src = e1.src AND e3.dst = e2.dst
  WHERE e1.src < e1.dst),
tt AS MATERIALIZED (SELECT a, b, c,
  a*{P}::BIGINT*{P}::BIGINT + b*{P}::BIGINT + c AS tid FROM tris),
inc AS MATERIALIZED (
  SELECT a*{P}::BIGINT + b AS ek, tid FROM tt
  UNION ALL SELECT a*{P}::BIGINT + c, tid FROM tt
  UNION ALL SELECT b*{P}::BIGINT + c, tid FROM tt),
mins AS MATERIALIZED (SELECT ek, MIN(tid) AS m FROM inc GROUP BY ek),
star AS MATERIALIZED (
  SELECT DISTINCT i.tid AS src, n.m AS dst FROM inc i JOIN mins n ON i.ek = n.ek
  WHERE i.tid <> n.m),
staru AS MATERIALIZED (
  SELECT src, dst FROM star UNION ALL SELECT dst AS src, src AS dst FROM star),
l0 AS (SELECT tid AS id, tid AS label FROM tt)"""
    ]
    for i in range(1, CPM_CC_ROUNDS + 1):
        p = i - 1
        # MATERIALIZED is load-bearing: l{p} is referenced twice per
        # round, and an inlined chain re-executes 2^rounds times. Plain
        # min-label flood: rounds must cover the star-graph eccentricity
        # from each component's min (measured 38 at sf0.01, <=16 at
        # sf0.001; CPM_CC_ROUNDS = 48 keeps a margin) — a label-of-label
        # pointer jump does NOT reliably accelerate min-label flooding
        # (the local min's own label can stall), so depth is explicit.
        ctes.append(
            f"l{i} AS MATERIALIZED (SELECT v.id, LEAST(v.label, COALESCE(m.minl, v.label)) AS label "
            f"FROM l{p} v LEFT JOIN (SELECT u.dst AS id, MIN(l.label) AS minl FROM staru u "
            f"JOIN l{p} l ON u.src = l.id GROUP BY u.dst) m ON v.id = m.id)"
        )
    last = f"l{CPM_CC_ROUNDS}"
    return (
        "WITH " + ",\n".join(ctes)
        + f""",
member AS MATERIALIZED (SELECT t.a, t.b, t.c, la.label AS community
  FROM tt t JOIN {last} la ON la.id = t.tid),
nv AS (SELECT community, COUNT(*)::BIGINT AS n_vertices FROM (
  SELECT DISTINCT community, v FROM (
    SELECT community, a AS v FROM member
    UNION ALL SELECT community, b FROM member
    UNION ALL SELECT community, c FROM member))
  GROUP BY community),
nt AS (SELECT community, COUNT(*)::BIGINT AS n_triangles FROM member GROUP BY community)
SELECT nv.community, nv.n_vertices, nt.n_triangles
FROM nv JOIN nt USING (community)"""
    )


def _refex_sql() -> str:
    """Twin of plans/metrics.py:refex_features (rounds=2) on the sparse
    graph: same one-gather-per-round (sum, max) recursion, all-integer."""
    return f"""WITH {_EDGES_SPARSE_SQL.strip()},
deg AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src),
r1 AS MATERIALIZED (SELECT u.dst AS id, SUM(d.deg)::BIGINT AS s1, MAX(d.deg)::BIGINT AS m1
  FROM und u JOIN deg d ON u.src = d.id GROUP BY u.dst),
r2 AS MATERIALIZED (SELECT u.dst AS id,
  SUM(r.s1)::BIGINT AS ss2, SUM(r.m1)::BIGINT AS sm2,
  MAX(r.s1)::BIGINT AS ms2, MAX(r.m1)::BIGINT AS mm2
  FROM und u JOIN r1 r ON u.src = r.id GROUP BY u.dst)
SELECT d.id, d.deg, r1.s1, r1.m1, r2.ss2, r2.sm2, r2.ms2, r2.mm2
FROM deg d JOIN r1 ON d.id = r1.id JOIN r2 ON d.id = r2.id"""


def _pq_chain(sub: int, lo: int, dsub: int, k: int, iters: int, scale: int) -> str:
    """One subspace's kmeans chain for _pq_sql — the _kmeans_chain
    recursion with every CTE suffixed _{sub} and positions re-based to
    the slice [lo, lo+dsub)."""
    sx = f"_{sub}"
    parts = [
        f"""pts{sx} AS MATERIALIZED (
  SELECT vec_id AS id, ix.i AS pos,
         CAST(FLOOR(embedding[{lo} + ix.i + 1]::DOUBLE * {scale}.0) AS BIGINT) AS q
  FROM embeddings, (SELECT unnest(range(0, {dsub})) AS i) ix),
c0{sx} AS MATERIALIZED (
  SELECT id AS cid, pos, q AS cq FROM pts{sx}
  WHERE id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k}))"""
    ]
    prev = f"c0{sx}"
    for r in range(1, iters + 1):
        parts.append(
            f"""d{r}{sx} AS MATERIALIZED (
  SELECT p.id, c.cid, CAST(SUM((p.q - c.cq) * (p.q - c.cq)) AS BIGINT) AS dist2
  FROM pts{sx} p JOIN {prev} c ON p.pos = c.pos GROUP BY p.id, c.cid),
a{r}{sx} AS MATERIALIZED (
  SELECT id, cid FROM (
    SELECT id, cid,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist2, cid) AS rn
    FROM d{r}{sx}) WHERE rn = 1),
c{r}{sx} AS MATERIALIZED (
  SELECT a.cid, p.pos,
         CAST(FLOOR(SUM(p.q)::DOUBLE / COUNT(*)) AS BIGINT) AS cq
  FROM pts{sx} p JOIN a{r}{sx} a ON p.id = a.id GROUP BY a.cid, p.pos)"""
        )
        prev = f"c{r}{sx}"
    parts.append(
        f"""dfin{sx} AS MATERIALIZED (
  SELECT p.id, c.cid, CAST(SUM((p.q - c.cq) * (p.q - c.cq)) AS BIGINT) AS dist2
  FROM pts{sx} p JOIN {prev} c ON p.pos = c.pos GROUP BY p.id, c.cid),
afin{sx} AS MATERIALIZED (
  SELECT id, cid, dist2 FROM (
    SELECT id, cid, dist2,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist2, cid) AS rn
    FROM dfin{sx}) WHERE rn = 1)"""
    )
    return ",\n".join(parts)


def _pq_sql(
    m: int | None = None,
    k: int | None = None,
    iters: int | None = None,
    scale: int = KMEANS_SCALE,
    dim: int = 64,
) -> str:
    """Twin of operators/similarity.py pq_codes: m independent kmeans
    chains over the contiguous dim/m slices, joined on id; total dist2
    is the exact integer sum of the sub-errors."""
    from metis_spark.driver.common import PQ_ITERS, PQ_K, PQ_M

    m = PQ_M if m is None else m
    k = PQ_K if k is None else k
    iters = PQ_ITERS if iters is None else iters
    dsub = dim // m
    chains = ",\n".join(
        _pq_chain(s, s * dsub, dsub, k, iters, scale) for s in range(m)
    )
    cols = ", ".join(f"afin_{s}.cid AS code_{s}" for s in range(m))
    tot = " + ".join(f"afin_{s}.dist2" for s in range(m))
    joins = " ".join(
        f"JOIN afin_{s} ON afin_{s}.id = afin_0.id" for s in range(1, m)
    )
    return (
        "WITH " + chains
        + f"\nSELECT afin_0.id, {cols}, ({tot})::BIGINT AS dist2 FROM afin_0 {joins}"
    )


def _pq_ann_sql(
    m: int | None = None,
    k: int | None = None,
    iters: int | None = None,
    scale: int = KMEANS_SCALE,
    dim: int = 64,
    k_top: int | None = None,
) -> str:
    """Twin of operators/similarity.py pq_ann_topk: the shared PQ
    chains plus per-subspace query distance tables (exact integers),
    ADC sum, deterministic (adc, id) ranking."""
    from metis_spark.driver.common import PQ_ITERS, PQ_K, PQ_M, PQ_TOPK

    m = PQ_M if m is None else m
    k = PQ_K if k is None else k
    iters = PQ_ITERS if iters is None else iters
    k_top = PQ_TOPK if k_top is None else k_top
    dsub = dim // m
    chains = ",\n".join(
        _pq_chain(s, s * dsub, dsub, k, iters, scale) for s in range(m)
    )
    qparts = ["qid AS (SELECT MIN(vec_id) AS id FROM embeddings)"]
    for s in range(m):
        qparts.append(
            f"""qp_{s} AS MATERIALIZED (
  SELECT ix.i AS pos,
         CAST(FLOOR(e.embedding[{s * dsub} + ix.i + 1]::DOUBLE * {scale}.0) AS BIGINT) AS q
  FROM embeddings e, (SELECT unnest(range(0, {dsub})) AS i) ix
  WHERE e.vec_id = (SELECT id FROM qid)),
qd_{s} AS MATERIALIZED (
  SELECT c.cid, CAST(SUM((p.q - c.cq) * (p.q - c.cq)) AS BIGINT) AS qd
  FROM c{iters}_{s} c JOIN qp_{s} p ON c.pos = p.pos GROUP BY c.cid)"""
        )
    tot = " + ".join(f"q{s}.qd" for s in range(1, m))
    joins = " ".join(
        f"JOIN afin_{s} ON afin_{s}.id = afin_0.id "
        f"JOIN qd_{s} q{s} ON q{s}.cid = afin_{s}.cid"
        for s in range(1, m)
    )
    return (
        "WITH " + chains + ",\n" + ",\n".join(qparts)
        + f""",
scored AS (SELECT afin_0.id, ({tot} + q0.qd)::BIGINT AS adc_dist2
  FROM afin_0 JOIN qd_0 q0 ON q0.cid = afin_0.cid {joins}
  WHERE afin_0.id <> (SELECT id FROM qid))
SELECT id, adc_dist2,
  ROW_NUMBER() OVER (ORDER BY adc_dist2, id)::BIGINT AS rn
FROM scored ORDER BY adc_dist2, id LIMIT {k_top}"""
    )


def _kwing_sql() -> str:
    """Fixed-unroll twin of plans/bipartite.py:k_wing on the order-part
    graph: per round wedges -> pair counts -> (c-1) support explode ->
    keep support >= k; rounds past the fixpoint are no-ops; the final
    SELECT recomputes support on the surviving subgraph."""
    from metis_spark.driver.common import WING_K, WING_MOD, WING_ROUNDS

    def _sup(src: str, out: str) -> str:
        return f"""w_{out} AS MATERIALIZED (
  SELECT a.u AS u1, b.u AS u2, a.v FROM {src} a JOIN {src} b
  ON a.v = b.v AND a.u < b.u),
pc_{out} AS MATERIALIZED (
  SELECT u1, u2, COUNT(*)::BIGINT AS c FROM w_{out} GROUP BY u1, u2),
sup_{out} AS MATERIALIZED (
  SELECT u, v, SUM(s)::BIGINT AS support FROM (
    SELECT w.u1 AS u, w.v, p.c - 1 AS s FROM w_{out} w
      JOIN pc_{out} p ON w.u1 = p.u1 AND w.u2 = p.u2 WHERE p.c > 1
    UNION ALL
    SELECT w.u2, w.v, p.c - 1 FROM w_{out} w
      JOIN pc_{out} p ON w.u1 = p.u1 AND w.u2 = p.u2 WHERE p.c > 1)
  GROUP BY u, v)"""

    ctes = [
        f"e0 AS MATERIALIZED (SELECT DISTINCT l_orderkey % {WING_MOD} AS u, "
        f"l_partkey % {WING_MOD} AS v FROM lineitem)"
    ]
    for r in range(1, WING_ROUNDS + 1):
        p = r - 1
        ctes.append(_sup(f"e{p}", f"r{r}"))
        ctes.append(
            f"e{r} AS MATERIALIZED (SELECT e.u, e.v FROM e{p} e "
            f"JOIN sup_r{r} s ON e.u = s.u AND e.v = s.v WHERE s.support >= {WING_K})"
        )
    ctes.append(_sup(f"e{WING_ROUNDS}", "fin"))
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT e.u, e.v, COALESCE(s.support, 0)::BIGINT AS support
FROM e{WING_ROUNDS} e LEFT JOIN sup_fin s ON e.u = s.u AND e.v = s.v"""
    )


def _hitting_time_sql() -> str:
    """Unrolled twin of plans/sssp.py:hitting_time_to_seeds on the
    standard graph, trusted seeds id % TRUST_MOD = TRUST_REM: all
    integer micro-steps, FLOOR integer division per vertex."""
    from metis_spark.driver.common import HT_CAP_STEPS, HT_ITERS, HT_MICRO, TRUST_MOD, TRUST_REM

    cap = HT_CAP_STEPS * HT_MICRO
    seed = f"id % {TRUST_MOD} = {TRUST_REM}"
    ctes = [
        _EDGES_SQL.strip().rstrip(),
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src)",
        f"h0 AS MATERIALIZED (SELECT id, deg, CASE WHEN {seed} THEN 0 ELSE {cap} END::BIGINT AS h FROM deg)",
    ]
    for i in range(1, HT_ITERS + 1):
        p = i - 1
        ctes.append(
            f"g{i} AS MATERIALIZED (SELECT u.dst AS id, SUM(x.h) AS hs "
            f"FROM und u JOIN h{p} x ON u.src = x.id GROUP BY u.dst)"
        )
        ctes.append(
            f"h{i} AS MATERIALIZED (SELECT v.id, v.deg, "
            f"CASE WHEN v.{seed.replace('id %', 'id %')} THEN 0 "
            f"ELSE LEAST({cap}, {HT_MICRO} + g.hs // v.deg) END::BIGINT AS h "
            f"FROM h{p} v JOIN g{i} g ON v.id = g.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, h AS h_micro FROM h{HT_ITERS}"
    )


def _tip_sql(mod: int = ABCORE_MOD) -> str:
    """Twin of plans/bipartite.py:butterfly_per_vertex_topk on the
    order-part graph — pair counts, C(c,2) explode to both members,
    all-integer deterministic top-k."""
    from metis_spark.driver.common import TIP_K

    return f"""WITH be AS MATERIALIZED (
  SELECT DISTINCT l_orderkey % {mod} AS u, l_partkey % {mod} AS v FROM lineitem),
pairs AS MATERIALIZED (
  SELECT a.u AS u1, b.u AS u2, COUNT(*)::BIGINT AS c
  FROM be a JOIN be b ON a.v = b.v AND a.u < b.u GROUP BY a.u, b.u HAVING COUNT(*) > 1),
pv AS (SELECT u, SUM(b)::BIGINT AS butterflies FROM (
  SELECT u1 AS u, c*(c-1)//2 AS b FROM pairs
  UNION ALL SELECT u2, c*(c-1)//2 FROM pairs) GROUP BY u)
SELECT u, butterflies,
  ROW_NUMBER() OVER (ORDER BY butterflies DESC, u)::BIGINT AS rn
FROM pv ORDER BY butterflies DESC, u LIMIT {TIP_K}"""


def _mirror_sql() -> str:
    """Twin of plans/metrics.py:vertex_mirror_topk on the mod-WING_MOD
    directed graph: same md5 string-min signatures, band keys, candidate
    equi-join, exact-Jaccard verification, (jaccard, u, v) ranking."""
    from metis_spark.driver.common import MIRROR_BANDS, MIRROR_HASHES, MIRROR_K, WING_MOD

    rows = MIRROR_HASHES // MIRROR_BANDS
    return f"""WITH nbr AS MATERIALIZED (
  SELECT DISTINCT l_orderkey % {WING_MOD} AS u, l_partkey % {WING_MOD} AS n
  FROM lineitem WHERE l_orderkey % {WING_MOD} <> l_partkey % {WING_MOD}),
deg AS MATERIALIZED (SELECT u, COUNT(*)::BIGINT AS d FROM nbr GROUP BY u),
sigs AS MATERIALIZED (
  SELECT u, s.seed, MIN(md5(s.seed::VARCHAR || '|' || n::VARCHAR)) AS mh
  FROM nbr, (SELECT unnest(range(0, {MIRROR_HASHES})) AS seed) s
  GROUP BY u, s.seed),
bk AS MATERIALIZED (
  SELECT u, (seed // {rows})::INT AS band,
         string_agg(mh, '#' ORDER BY mh) AS bk
  FROM sigs GROUP BY u, (seed // {rows})::INT),
cand AS MATERIALIZED (
  SELECT DISTINCT a.u AS u, b.u AS v FROM bk a
  JOIN bk b ON a.band = b.band AND a.bk = b.bk AND a.u < b.u),
com AS MATERIALIZED (
  SELECT c.u, c.v, COUNT(*)::BIGINT AS n_common
  FROM cand c JOIN nbr x ON x.u = c.u JOIN nbr y ON y.u = c.v AND y.n = x.n
  GROUP BY c.u, c.v),
scored AS (
  SELECT c.u, c.v, COALESCE(m.n_common, 0)::BIGINT AS n_common,
         ROUND(COALESCE(m.n_common, 0)::DOUBLE
               / (du.d + dv.d - COALESCE(m.n_common, 0)), 6) AS jaccard
  FROM cand c LEFT JOIN com m ON c.u = m.u AND c.v = m.v
  JOIN deg du ON du.u = c.u JOIN deg dv ON dv.u = c.v)
SELECT u, v, n_common, jaccard,
  ROW_NUMBER() OVER (ORDER BY jaccard DESC, u, v)::BIGINT AS rn
FROM scored ORDER BY jaccard DESC, u, v LIMIT {MIRROR_K}"""


def _harmonic_labels_sql() -> str:
    """Unrolled twin of plans/sssp.py:harmonic_label_scores — positive
    seeds id%TRUST_MOD=TRUST_REM at micro, negative at HL_NEG_REM pinned
    0, everyone else FLOOR-averages their neighbors."""
    from metis_spark.driver.common import HL_ITERS, HL_NEG_REM, HT_MICRO, TRUST_MOD, TRUST_REM

    pos = f"id % {TRUST_MOD} = {TRUST_REM}"
    neg = f"id % {TRUST_MOD} = {HL_NEG_REM}"
    ctes = [
        _EDGES_SQL.strip().rstrip(),
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src)",
        f"p0 AS MATERIALIZED (SELECT id, deg, CASE WHEN {pos} THEN {HT_MICRO} ELSE 0 END::BIGINT AS p FROM deg)",
    ]
    for i in range(1, HL_ITERS + 1):
        pv = i - 1
        ctes.append(
            f"g{i} AS MATERIALIZED (SELECT u.dst AS id, SUM(x.p) AS ps "
            f"FROM und u JOIN p{pv} x ON u.src = x.id GROUP BY u.dst)"
        )
        ctes.append(
            f"p{i} AS MATERIALIZED (SELECT v.id, v.deg, "
            f"CASE WHEN v.{pos} THEN {HT_MICRO} WHEN v.{neg} THEN 0 "
            f"ELSE g.ps // v.deg END::BIGINT AS p "
            f"FROM p{pv} v JOIN g{i} g ON v.id = g.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, p AS p_micro FROM p{HL_ITERS}"
    )

def _core_periphery_sql() -> str:
    """Twin of plans/metrics.py:core_periphery_blocks — the inner WITH is
    the verified coreness h-index unroll (engine fixpoint ≡ unroll,
    asserted converged in the driver query); block counts, densities and
    the Borgatti-Everett pattern correlation are closed integer forms on
    top of it."""
    ctes = _coreness_ctes()
    chain = ",\n".join(ctes)
    return f"""
WITH {chain},
cor AS MATERIALIZED (SELECT id, core FROM c{CORENESS_ORACLE_ROUNDS}),
km AS (SELECT MAX(core)::BIGINT AS kmax FROM cor),
flags AS (SELECT id, (core = (SELECT kmax FROM km)) AS is_core FROM cor),
pairs AS (SELECT src AS a, dst AS b FROM und WHERE src < dst),
blk AS (SELECT
  SUM(CASE WHEN fa.is_core AND fb.is_core THEN 1 ELSE 0 END)::BIGINT AS e_cc,
  SUM(CASE WHEN fa.is_core <> fb.is_core THEN 1 ELSE 0 END)::BIGINT AS e_cp,
  SUM(CASE WHEN NOT fa.is_core AND NOT fb.is_core THEN 1 ELSE 0 END)::BIGINT AS e_pp
  FROM pairs p JOIN flags fa ON p.a = fa.id JOIN flags fb ON p.b = fb.id),
cnt AS (SELECT (SELECT kmax FROM km) AS kmax,
  SUM(CASE WHEN is_core THEN 1 ELSE 0 END)::BIGINT AS n_core,
  SUM(CASE WHEN NOT is_core THEN 1 ELSE 0 END)::BIGINT AS n_periph FROM flags),
fold AS (SELECT kmax, n_core, n_periph, e_cc, e_cp, e_pp,
  (n_core * (n_core - 1) // 2)::BIGINT AS cap_cc,
  (n_core * n_periph)::BIGINT AS cap_cp,
  (n_periph * (n_periph - 1) // 2)::BIGINT AS cap_pp,
  ((n_core + n_periph) * (n_core + n_periph - 1) // 2)::BIGINT AS n_dyads,
  (e_cc + e_cp + e_pp)::BIGINT AS m,
  (e_cc + e_cp)::BIGINT AS m1
  FROM cnt, blk)
SELECT kmax, n_core, n_periph, e_cc, e_cp, e_pp,
  CASE WHEN cap_cc > 0 THEN ROUND(e_cc::DOUBLE / cap_cc, 6) END AS density_cc,
  CASE WHEN cap_cp > 0 THEN ROUND(e_cp::DOUBLE / cap_cp, 6) END AS density_cp,
  CASE WHEN cap_pp > 0 THEN ROUND(e_pp::DOUBLE / cap_pp, 6) END AS density_pp,
  CASE WHEN m::DOUBLE * (n_dyads - m) * (cap_cc + cap_cp) * (n_dyads - cap_cc - cap_cp) > 0
    THEN ROUND((m1 * n_dyads - m * (cap_cc + cap_cp))::DOUBLE
      / sqrt(m::DOUBLE * (n_dyads - m) * (cap_cc + cap_cp) * (n_dyads - cap_cc - cap_cp)), 6)
  END AS be_corr
FROM fold
"""

def _map_equation_sql() -> str:
    """Twin of plans/metrics.py:map_equation over the unrolled Louvain
    level-1 chain (common.py:_louvain_level1_ctes — the same labels the
    ari twin replays): p_v = deg/2m and q_m = cut_m/2m exactly, each
    plogp term micro-bit quantized from its integer pair before any
    summation."""

    def plp(a: str) -> str:
        return (
            f"CASE WHEN {a} > 0 THEN CAST(ROUND(({a}::DOUBLE / t.two_m) "
            f"* log2({a}::DOUBLE / t.two_m) * 1000000.0) AS BIGINT) ELSE 0 END"
        )

    ctes = _louvain_level1_ctes(LOUVAIN_ROUNDS)
    ctes += [
        "tm AS (SELECT COUNT(*)::BIGINT AS two_m FROM und)",
        f"lab AS MATERIALIZED (SELECT id, label AS module FROM l{LOUVAIN_ROUNDS})",
        "cutc AS (SELECT a.module AS module, COUNT(*)::BIGINT AS cut "
        "FROM und u JOIN lab a ON u.src = a.id JOIN lab b ON u.dst = b.id "
        "WHERE a.module <> b.module GROUP BY a.module)",
        "vol AS (SELECT a.module, SUM(d.deg)::BIGINT AS vol "
        "FROM ldeg d JOIN lab a ON d.id = a.id GROUP BY a.module)",
        "mods AS (SELECT v.module, v.vol, COALESCE(c.cut, 0)::BIGINT AS cut "
        "FROM vol v LEFT JOIN cutc c ON v.module = c.module)",
        f"mt AS (SELECT cut, {plp('cut')} AS t_cut, "
        f"{plp('(cut + vol)')} AS t_circ FROM mods, tm t)",
        "ma AS (SELECT COUNT(*)::BIGINT AS n_modules, SUM(cut)::BIGINT AS q_num, "
        "SUM(t_cut)::BIGINT AS sum_t_cut, SUM(t_circ)::BIGINT AS sum_t_circ FROM mt)",
        f"vt AS (SELECT SUM(cnt * {plp('deg')})::BIGINT AS sum_t_vert FROM "
        "(SELECT deg, COUNT(*)::BIGINT AS cnt FROM ldeg GROUP BY deg), tm t)",
        f"fold AS (SELECT ma.*, t.two_m, vt.sum_t_vert, {plp('q_num')} AS t_q "
        "FROM ma, tm t, vt)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT n_modules, two_m, q_num, "
        "(t_q - sum_t_cut)::BIGINT AS index_micro, "
        "(sum_t_circ - sum_t_cut - sum_t_vert)::BIGINT AS modules_micro, "
        "ROUND((t_q - 2 * sum_t_cut + sum_t_circ - sum_t_vert)::DOUBLE "
        "/ 1000000.0, 6) AS codelength FROM fold"
    )

def _leaderrank_sql(n_iters: int = LEADERRANK_ITERS) -> str:
    """Unrolled LeaderRank twin on the sparse und graph: ground node -1
    bidirectionally linked to every vertex, s ← Σ s_u/deg'(u) per sweep
    (deg' = deg+1 for real vertices, n for the ground), ground mass
    refunded evenly at the end — pagerank's float-fold discipline
    (ROUND 6 at the very end only)."""
    ctes = [
        _EDGES_SPARSE_SQL.strip().rstrip(),
        "lverts AS MATERIALIZED (SELECT DISTINCT src AS id FROM und)",
        "lnn AS (SELECT COUNT(*)::BIGINT AS n FROM lverts)",
        "ldegp AS MATERIALIZED (SELECT src AS id, (COUNT(*) + 1)::BIGINT AS deg "
        "FROM und GROUP BY src "
        "UNION ALL SELECT -1::BIGINT, (SELECT n FROM lnn))",
        "laug AS MATERIALIZED (SELECT src, dst FROM und "
        "UNION ALL SELECT id AS src, -1::BIGINT AS dst FROM lverts "
        "UNION ALL SELECT -1::BIGINT AS src, id AS dst FROM lverts)",
        "ls0 AS MATERIALIZED (SELECT id, 1.0 AS score FROM lverts "
        "UNION ALL SELECT -1::BIGINT, 0.0)",
    ]
    for i in range(1, n_iters + 1):
        p = i - 1
        ctes.append(
            f"ls{i} AS MATERIALIZED (SELECT a.dst AS id, "
            f"SUM(s.score / d.deg) AS score "
            f"FROM laug a JOIN ls{p} s ON a.src = s.id "
            f"JOIN ldegp d ON a.src = d.id GROUP BY a.dst)"
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        f"SELECT id, ROUND(score, 6) AS score, "
        f"ROUND(score + (SELECT score FROM ls{n_iters} WHERE id = -1) "
        f"/ (SELECT n FROM lnn), 6) AS leaderrank "
        f"FROM ls{n_iters} WHERE id <> -1"
    )

def _degree_discount_sql(k: int = DDIC_K, p_tenths: int = DDIC_P_TENTHS) -> str:
    """Unrolled degree-discount twin: k rounds, each recomputing the
    selected-neighbor count from the seed set so far, the integer-tenths
    gain, and the (gain DESC, id ASC) argmax — selection order is
    bit-identical to the engine's."""
    ctes = [
        _EDGES_SPARSE_SQL.strip().rstrip(),
        "dddeg AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS deg "
        "FROM und GROUP BY src)",
        "ddp1 AS (SELECT id, (10 * deg)::BIGINT AS gain10 FROM dddeg "
        "ORDER BY 10 * deg DESC, id ASC LIMIT 1)",
        "dds1 AS (SELECT 1::BIGINT AS rank, id, gain10 FROM ddp1)",
    ]
    for i in range(2, k + 1):
        p = i - 1
        ctes.append(
            f"ddt{i} AS MATERIALIZED (SELECT e.dst AS id, COUNT(*)::BIGINT AS t "
            f"FROM und e JOIN dds{p} s ON e.src = s.id GROUP BY e.dst)"
        )
        ctes.append(
            f"ddc{i} AS MATERIALIZED (SELECT d.id, "
            f"(10 * d.deg - 20 * COALESCE(t.t, 0) "
            f"- (d.deg - COALESCE(t.t, 0)) * COALESCE(t.t, 0) * {p_tenths})::BIGINT AS gain10 "
            f"FROM dddeg d LEFT JOIN ddt{i} t ON d.id = t.id "
            f"WHERE NOT EXISTS (SELECT 1 FROM dds{p} s WHERE s.id = d.id))"
        )
        ctes.append(
            f"ddp{i} AS MATERIALIZED (SELECT id, gain10 FROM ddc{i} "
            f"ORDER BY gain10 DESC, id ASC LIMIT 1)"
        )
        ctes.append(
            f"dds{i} AS MATERIALIZED (SELECT * FROM dds{p} "
            f"UNION ALL SELECT {i}::BIGINT, id, gain10 FROM ddp{i})"
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        f"SELECT rank, id, gain10 FROM dds{k}"
    )

def _k_peak_sql(
    contours: int = KPEAK_ROUNDS, inner: int = CORENESS_ORACLE_ROUNDS
) -> str:
    """Unrolled k-peak twin: ``contours`` mountain rounds, each an
    ``inner``-round h-index coreness chain (the _coreness_ctes
    discipline, renamed per round) + degeneracy-contour extraction +
    edge shrink. Rounds past the measured contour count run on an
    empty remainder and contribute nothing in either engine."""
    ctes = [
        _EDGES_SPARSE_SQL.strip().rstrip(),
        "kp_verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM und)",
    ]
    prev = "und"
    for j in range(1, contours + 1):
        ctes.append(
            f"kp{j}_c0 AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS core "
            f"FROM {prev} GROUP BY src)"
        )
        for i in range(1, inner + 1):
            p = i - 1
            ctes.append(
                f"kp{j}_c{i} AS MATERIALIZED (SELECT id, "
                f"MAX(LEAST(val, rn))::BIGINT AS core "
                f"FROM (SELECT u.src AS id, s.core AS val, "
                f"ROW_NUMBER() OVER (PARTITION BY u.src ORDER BY s.core DESC) AS rn "
                f"FROM {prev} u JOIN kp{j}_c{p} s ON u.dst = s.id) GROUP BY id)"
            )
        ctes.append(
            f"kp{j}_top AS MATERIALIZED (SELECT id, "
            f"(SELECT MAX(core) FROM kp{j}_c{inner})::BIGINT AS peak "
            f"FROM kp{j}_c{inner} "
            f"WHERE core = (SELECT MAX(core) FROM kp{j}_c{inner}))"
        )
        ctes.append(
            f"kp{j}_und AS MATERIALIZED (SELECT u.src, u.dst FROM {prev} u "
            f"WHERE NOT EXISTS (SELECT 1 FROM kp{j}_top t WHERE t.id = u.src) "
            f"AND NOT EXISTS (SELECT 1 FROM kp{j}_top t WHERE t.id = u.dst))"
        )
        prev = f"kp{j}_und"
    union = " UNION ALL ".join(
        f"SELECT id, peak FROM kp{j}_top" for j in range(1, contours + 1)
    )
    return (
        "WITH " + ",\n".join(ctes) + f",\nkp_all AS ({union})\n"
        "SELECT v.id, COALESCE(p.peak, 0)::BIGINT AS peak "
        "FROM kp_verts v LEFT JOIN kp_all p ON v.id = p.id"
    )

def _bpe_ctes(k: int = BPE_K) -> list:
    """CTE chain of the unrolled BPE twin: k merge rounds over the
    (word, freq) symbol table — lead() pair counts, (count DESC, pair
    ASC) argmax, the pos − row_number() run-grouping for textbook
    greedy application, and a reindex window per round; ends at s{k}.
    Exhausted rounds produce empty t{r} CTEs and contribute nothing
    (same as the engine's break)."""
    ctes = [
        "bw AS MATERIALIZED (SELECT word, COUNT(*)::BIGINT AS freq FROM "
        "(SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
        "x -> x <> '')) AS word FROM documents) GROUP BY word)",
        "bs0 AS MATERIALIZED (SELECT word, freq, "
        "unnest(range(1, length(word) + 1))::BIGINT AS pos FROM bw)",
        "s0 AS MATERIALIZED (SELECT word, freq, pos, "
        "substring(word, pos::INT, 1) AS sym FROM bs0)",
    ]
    for r in range(1, k + 1):
        p = r - 1
        ctes.append(
            f"p{r} AS MATERIALIZED (SELECT word, freq, pos, sym, "
            f"lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM s{p})"
        )
        ctes.append(
            f"t{r} AS MATERIALIZED (SELECT sym, nxt, SUM(freq)::BIGINT AS c "
            f"FROM p{r} WHERE nxt IS NOT NULL GROUP BY sym, nxt "
            f"ORDER BY c DESC, sym ASC, nxt ASC LIMIT 1)"
        )
        ctes.append(
            f"runs{r} AS MATERIALIZED (SELECT word, pos, "
            f"pos - ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS run "
            f"FROM p{r} WHERE sym = (SELECT sym FROM t{r}) "
            f"AND nxt = (SELECT nxt FROM t{r}))"
        )
        ctes.append(
            f"fired{r} AS MATERIALIZED (SELECT word, pos FROM "
            f"(SELECT word, pos, ROW_NUMBER() OVER "
            f"(PARTITION BY word, run ORDER BY pos) AS rn FROM runs{r}) "
            f"WHERE (rn - 1) % 2 = 0)"
        )
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT word, freq, "
            f"ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos)::BIGINT AS pos, "
            f"CASE WHEN EXISTS (SELECT 1 FROM fired{r} f "
            f"WHERE f.word = m.word AND f.pos = m.pos) "
            f"THEN (SELECT sym || nxt FROM t{r}) ELSE sym END AS sym "
            f"FROM p{r} m WHERE NOT EXISTS (SELECT 1 FROM fired{r} f "
            f"WHERE f.word = m.word AND f.pos + 1 = m.pos))"
        )
    return ctes


def _bpe_sql(k: int = BPE_K) -> str:
    ctes = _bpe_ctes(k)
    union = " UNION ALL ".join(
        f"SELECT {r}::BIGINT AS step, sym AS left_sym, nxt AS right_sym, "
        f"sym || nxt AS merged, c AS pair_count FROM t{r}"
        for r in range(1, k + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM ({union})"


def _bpe_fertility_sql(k: int = BPE_K) -> str:
    """Twin of operators/bpe.py:bpe_fertility — the identical merge
    unroll, then the per-word symbol counts of the final state applied
    to the (lang, word) counts of the token stream."""
    ctes = _bpe_ctes(k)
    ctes += [
        f"spw AS (SELECT word, COUNT(*)::BIGINT AS n_sym FROM s{k} GROUP BY word)",
        "blw AS (SELECT lang, word, COUNT(*)::BIGINT AS c FROM "
        "(SELECT lang, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
        "x -> x <> '')) AS word FROM documents) GROUP BY lang, word)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT l.lang, SUM(l.c)::BIGINT AS n_words, "
        "SUM(l.c * p.n_sym)::BIGINT AS n_symbols, "
        "SUM(l.c * length(l.word))::BIGINT AS n_chars, "
        "ROUND(SUM(l.c * p.n_sym)::DOUBLE / SUM(l.c), 6) AS fertility, "
        "ROUND(SUM(l.c * length(l.word))::DOUBLE / SUM(l.c * p.n_sym), 6) AS chars_per_token "
        "FROM blw l JOIN spw p ON l.word = p.word GROUP BY l.lang"
    )

def _rank_correlation_sql(k: int = SPEAR_K) -> str:
    """Twin of the centrality rank-agreement query: the shared
    _pagerank_ctes and _eigen_ctes chains (deduped common prefix), the
    same ROUND-6 scores, the same top-k head and (score DESC, id ASC)
    row_number permutations, the same closed-form Spearman fold."""
    pr = _pagerank_ctes()
    ei = _eigen_ctes()
    seen = set()
    ctes = []
    for c in pr + ei:
        key = c.split(" AS ")[0].strip()
        if key in seen:
            continue
        seen.add(key)
        ctes.append(c)
    ctes += [
        f"rcp AS (SELECT id, ROUND(rank, 6) AS sa FROM r{PR_ITERS})",
        f"rce AS (SELECT id, ROUND(x, 6) AS sb FROM x{PR_ITERS})",
        f"rct AS (SELECT id, sa FROM rcp ORDER BY sa DESC, id ASC LIMIT {k})",
        "rcj AS (SELECT t.id, t.sa, e.sb FROM rct t JOIN rce e ON t.id = e.id)",
        "rcr AS (SELECT id, "
        "ROW_NUMBER() OVER (ORDER BY sa DESC, id ASC)::BIGINT AS ra, "
        "ROW_NUMBER() OVER (ORDER BY sb DESC, id ASC)::BIGINT AS rb FROM rcj)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT COUNT(*)::BIGINT AS n, "
        "SUM((ra - rb) * (ra - rb))::BIGINT AS sum_d2, "
        "CASE WHEN COUNT(*) > 1 THEN ROUND(1.0 - 6.0 * SUM((ra - rb) * (ra - rb))::DOUBLE "
        "/ (COUNT(*)::DOUBLE * (COUNT(*) * COUNT(*) - 1)), 6) END AS spearman "
        "FROM rcr"
    )

def _temporal_pagerank_sql(
    n_epochs: int = TPR_EPOCHS, beta: float = TPR_BETA
) -> str:
    """Unrolled epoch-bucketed temporal-pagerank twin: one CTE pair per
    epoch (per-epoch out-degrees, gather, mass-conserving fold) over
    the same hash-derived timestamps as the reachability twins."""
    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        "tpe AS MATERIALIZED (SELECT src, dst, "
        "(('0x' || substr(md5('t_' || src::VARCHAR || '_' || dst::VARCHAR), 1, 15))"
        f"::BIGINT % {TEMPORAL_TS_MOD}) * {n_epochs} // {TEMPORAL_TS_MOD} AS epoch "
        "FROM edges)",
        "tpv AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges "
        "UNION SELECT dst FROM edges)",
        "tpn AS (SELECT COUNT(*)::DOUBLE AS n FROM tpv)",
        "tp0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM tpn) AS rank FROM tpv)",
    ]
    for t in range(n_epochs):
        i = t + 1
        ctes.append(
            f"tpo{i} AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS od "
            f"FROM tpe WHERE epoch = {t} GROUP BY src)"
        )
        ctes.append(
            f"tpi{i} AS MATERIALIZED (SELECT e.dst AS id, "
            f"SUM({beta} * r.rank / o.od) AS inflow "
            f"FROM tpe e JOIN tp{t} r ON e.src = r.id "
            f"JOIN tpo{i} o ON e.src = o.id "
            f"WHERE e.epoch = {t} GROUP BY e.dst)"
        )
        ctes.append(
            f"tp{i} AS MATERIALIZED (SELECT v.id, "
            f"v.rank * (1.0 - CASE WHEN o.id IS NOT NULL THEN {beta} ELSE 0.0 END) "
            f"+ COALESCE(c.inflow, 0.0) AS rank "
            f"FROM tp{t} v LEFT JOIN tpo{i} o ON v.id = o.id "
            f"LEFT JOIN tpi{i} c ON v.id = c.id)"
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        f"SELECT id, ROUND(rank, 6) AS rank FROM tp{n_epochs}"
    )

def _vocab_cover_sql(k: int = COVER_K) -> str:
    """Unrolled greedy max-cover twin: k rounds of uncovered-gain count
    + (gain DESC, doc ASC) argmax + covered-set union, with the same
    gain ≥ 1 stopping rule (an exhausted round's pick CTE is empty and
    contributes nothing, matching the engine's break)."""
    ctes = [
        "vcdt AS MATERIALIZED (SELECT DISTINCT doc_id AS doc, term FROM "
        "(SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), "
        "'[^a-z0-9]+'), x -> x <> '')) AS term FROM documents))",
        "vcg1 AS (SELECT doc, COUNT(*)::BIGINT AS gain FROM vcdt GROUP BY doc)",
        "vcp1 AS MATERIALIZED (SELECT doc, gain FROM vcg1 WHERE gain >= 1 "
        "ORDER BY gain DESC, doc ASC LIMIT 1)",
        "vcs1 AS (SELECT 1::BIGINT AS rank, doc, gain FROM vcp1)",
        "vcc1 AS MATERIALIZED (SELECT DISTINCT term FROM vcdt "
        "WHERE doc = (SELECT doc FROM vcp1))",
    ]
    for i in range(2, k + 1):
        p = i - 1
        ctes.append(
            f"vcg{i} AS (SELECT d.doc, COUNT(*)::BIGINT AS gain FROM vcdt d "
            f"WHERE NOT EXISTS (SELECT 1 FROM vcc{p} c WHERE c.term = d.term) "
            f"AND NOT EXISTS (SELECT 1 FROM vcs{p} s WHERE s.doc = d.doc) "
            f"GROUP BY d.doc)"
        )
        ctes.append(
            f"vcp{i} AS MATERIALIZED (SELECT doc, gain FROM vcg{i} "
            f"WHERE gain >= 1 ORDER BY gain DESC, doc ASC LIMIT 1)"
        )
        ctes.append(
            f"vcs{i} AS (SELECT * FROM vcs{p} "
            f"UNION ALL SELECT {i}::BIGINT, doc, gain FROM vcp{i})"
        )
        ctes.append(
            f"vcc{i} AS MATERIALIZED (SELECT term FROM vcc{p} "
            f"UNION SELECT term FROM vcdt WHERE doc = (SELECT doc FROM vcp{i}))"
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        f"SELECT rank, doc AS doc_id, gain, "
        f"SUM(gain) OVER (ORDER BY rank)::BIGINT AS covered_total FROM vcs{k}"
    )

def _nmi_partitions_sql() -> str:
    """Twin of partition_nmi on the same unrolled Louvain/LPA chains as
    the ARI twin; every entropy/MI term micro-nat quantized from its
    integer tuple before the order-free sums."""
    ctes = _louvain_level1_ctes(LOUVAIN_ROUNDS)
    ctes.append("nlp0 AS (SELECT id, id AS label FROM ldeg)")
    for i in range(1, LPA_ROUNDS + 1):
        p = i - 1
        ctes.append(
            f"nlpc{i} AS (SELECT u.dst AS id, l.label FROM und u "
            f"JOIN nlp{p} l ON u.src = l.id UNION ALL SELECT id, label FROM nlp{p})"
        )
        ctes.append(
            f"nlpn{i} AS (SELECT id, label, COUNT(*) AS c FROM nlpc{i} GROUP BY id, label)"
        )
        ctes.append(
            f"nlp{i} AS (SELECT id, label FROM (SELECT id, label, "
            f"ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, label ASC) AS rn "
            f"FROM nlpn{i}) WHERE rn = 1)"
        )
    ctes += [
        f"ncont AS MATERIALIZED (SELECT a.label AS la, b.label AS lb, "
        f"COUNT(*)::BIGINT AS nij FROM l{LOUVAIN_ROUNDS} a "
        f"JOIN nlp{LPA_ROUNDS} b ON a.id = b.id GROUP BY a.label, b.label)",
        "ntot AS (SELECT SUM(nij)::BIGINT AS n FROM ncont)",
        "nam AS MATERIALIZED (SELECT la, SUM(nij)::BIGINT AS ai FROM ncont GROUP BY la)",
        "nbm AS MATERIALIZED (SELECT lb, SUM(nij)::BIGINT AS bj FROM ncont GROUP BY lb)",
        "nha AS (SELECT COUNT(*)::BIGINT AS clusters_a, SUM(CASE WHEN ai > 0 THEN "
        "CAST(ROUND(-(ai::DOUBLE / t.n) * ln(ai::DOUBLE / t.n) * 1000000.0) AS BIGINT) "
        "ELSE 0 END)::BIGINT AS h_a_micro FROM nam, ntot t)",
        "nhb AS (SELECT COUNT(*)::BIGINT AS clusters_b, SUM(CASE WHEN bj > 0 THEN "
        "CAST(ROUND(-(bj::DOUBLE / t.n) * ln(bj::DOUBLE / t.n) * 1000000.0) AS BIGINT) "
        "ELSE 0 END)::BIGINT AS h_b_micro FROM nbm, ntot t)",
        "nmi_t AS (SELECT SUM(CAST(ROUND((c.nij::DOUBLE / t.n) "
        "* ln(t.n::DOUBLE * c.nij / (a.ai::DOUBLE * b.bj)) * 1000000.0) AS BIGINT))::BIGINT "
        "AS mi_micro FROM ncont c JOIN nam a ON c.la = a.la "
        "JOIN nbm b ON c.lb = b.lb, ntot t)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT n, clusters_a, clusters_b, h_a_micro, h_b_micro, mi_micro, "
        "CASE WHEN h_a_micro + h_b_micro > 0 THEN "
        "ROUND(2.0 * mi_micro::DOUBLE / (h_a_micro + h_b_micro), 6) END AS nmi "
        "FROM ntot, nha, nhb, nmi_t"
    )

def _ecc_bounds_sql(rounds: int = SSSP_ROUNDS) -> str:
    """Twin of eccentricity_bounds: the landmark BFS unroll over the
    UNDIRECTED view (und), then the two triangle-inequality folds —
    all-integer."""
    ctes = [
        _EDGES_SQL.strip(),
        f"esrc AS (SELECT id FROM verts ORDER BY id LIMIT {N_LANDMARKS})",
        "ed0 AS MATERIALIZED (SELECT id, id AS source, 0::BIGINT AS dist FROM esrc)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"ed{i} AS MATERIALIZED (SELECT id, source, MIN(dist)::BIGINT AS dist FROM ("
            f"SELECT e.dst AS id, d.source, d.dist + 1 AS dist "
            f"FROM und e JOIN ed{p} d ON e.src = d.id "
            f"UNION ALL SELECT id, source, dist FROM ed{p}) GROUP BY id, source)"
        )
    ctes += [
        f"eecc AS (SELECT source, MAX(dist)::BIGINT AS eccl FROM ed{rounds} GROUP BY source)",
        f"ej AS (SELECT d.id, GREATEST(d.dist, c.eccl - d.dist)::BIGINT AS lo, "
        f"(d.dist + c.eccl)::BIGINT AS hi FROM ed{rounds} d JOIN eecc c ON d.source = c.source)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT id, MAX(lo)::BIGINT AS ecc_lower, MIN(hi)::BIGINT AS ecc_upper, "
        "(MAX(lo) = MIN(hi)) AS tight FROM ej GROUP BY id"
    )


_LOCAL_BRIDGE_SQL = (
    f"WITH {_EDGES_SPARSE_SQL.strip()},\n"
    "e AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst),\n"
    "closed AS (SELECT DISTINCT e.src, e.dst FROM e "
    "JOIN und w1 ON e.src = w1.src JOIN und w2 ON e.dst = w2.src "
    "AND w1.dst = w2.dst),\n"
    "bridges AS MATERIALIZED (SELECT e.src, e.dst FROM e "
    "ANTI JOIN closed c ON e.src = c.src AND e.dst = c.dst),\n"
    "span3 AS (SELECT DISTINCT b.src, b.dst FROM bridges b "
    "JOIN und ua ON b.src = ua.src AND ua.dst <> b.dst "
    "JOIN und ab ON ua.dst = ab.src AND ab.dst <> b.src "
    "JOIN und bv ON b.dst = bv.src AND bv.dst = ab.dst)\n"
    "SELECT b.src, b.dst, "
    "(CASE WHEN s.src IS NOT NULL THEN 3 ELSE 4 END)::BIGINT AS span_lb "
    "FROM bridges b LEFT JOIN span3 s ON b.src = s.src AND b.dst = s.dst"
)


_EDGE_DISPERSION_SQL = (
    f"WITH {_EDGES_SPARSE_SQL.strip()},\n"
    "e AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst),\n"
    "cn AS MATERIALIZED (SELECT e.src, e.dst, u1.dst AS s FROM e "
    "JOIN und u1 ON e.src = u1.src "
    "JOIN und u2 ON e.dst = u2.src AND u2.dst = u1.dst),\n"
    "emb AS (SELECT src, dst, COUNT(*)::BIGINT AS emb FROM cn "
    "GROUP BY src, dst HAVING COUNT(*) >= 2),\n"
    "pr AS (SELECT a.src, a.dst, a.s, b.s AS t FROM cn a "
    "JOIN cn b ON a.src = b.src AND a.dst = b.dst AND a.s < b.s),\n"
    "far AS (SELECT src, dst, s, t FROM pr "
    "ANTI JOIN und x ON pr.s = x.src AND pr.t = x.dst),\n"
    "d AS (SELECT src, dst, COUNT(*)::BIGINT AS dispersion FROM far "
    "GROUP BY src, dst)\n"
    "SELECT emb.src, emb.dst, emb.emb, "
    "COALESCE(d.dispersion, 0)::BIGINT AS dispersion, "
    "ROUND(COALESCE(d.dispersion, 0)::DOUBLE / emb.emb, 6) AS norm_disp "
    "FROM emb LEFT JOIN d ON emb.src = d.src AND emb.dst = d.dst"
)


def _katz_index_sql() -> str:
    """Twin of katz_index_topk: pre-aggregated A² joined once more
    against the adjacency, the same integer katz_scaled ranking."""
    from metis_spark.driver.common import KATZI_BETA_DEN, KATZI_K

    return (
        f"WITH {_EDGES_SPARSE_SQL.strip()},\n"
        "a2 AS MATERIALIZED (SELECT x.src AS u, y.dst AS w2, COUNT(*)::BIGINT AS c2 "
        "FROM und x JOIN und y ON x.dst = y.src GROUP BY x.src, y.dst),\n"
        "p2 AS (SELECT u, w2 AS v, c2 AS paths2 FROM a2 WHERE u < w2),\n"
        "p3 AS (SELECT a2.u, z.dst AS v, SUM(c2)::BIGINT AS paths3 FROM a2 "
        "JOIN und z ON a2.w2 = z.src WHERE a2.u < z.dst GROUP BY a2.u, z.dst),\n"
        "kboth AS (SELECT COALESCE(p2.u, p3.u) AS u, COALESCE(p2.v, p3.v) AS v, "
        "COALESCE(paths2, 0)::BIGINT AS paths2, COALESCE(paths3, 0)::BIGINT AS paths3 "
        "FROM p2 FULL OUTER JOIN p3 ON p2.u = p3.u AND p2.v = p3.v),\n"
        "nonadj AS (SELECT b.u, b.v, paths2, paths3, "
        f"({KATZI_BETA_DEN} * paths2 + paths3)::BIGINT AS katz_scaled "
        "FROM kboth b ANTI JOIN und a ON b.u = a.src AND b.v = a.dst)\n"
        "SELECT u, v, paths2, paths3, katz_scaled, "
        "ROW_NUMBER() OVER (ORDER BY katz_scaled DESC, u ASC, v ASC)::BIGINT AS rn "
        f"FROM nonadj ORDER BY katz_scaled DESC, u ASC, v ASC LIMIT {KATZI_K}"
    )


def _vi_partitions_sql() -> str:
    """Twin of partition_vi: a projection over the NMI twin's one-row
    output — VI folds the same micro-nat integers."""
    return (
        "SELECT n, clusters_a, clusters_b, "
        "(h_a_micro + h_b_micro - 2 * mi_micro)::BIGINT AS vi_micro, "
        "ROUND((h_a_micro + h_b_micro - 2 * mi_micro)::DOUBLE / 1000000.0, 6) AS vi, "
        "CASE WHEN n > 1 THEN ROUND((h_a_micro + h_b_micro - 2 * mi_micro)::DOUBLE "
        "/ 1000000.0 / ln(n::DOUBLE), 6) END AS nvi "
        f"FROM ({_nmi_partitions_sql()})"
    )


_DEGREE_GINI_SQL = (
    f"WITH {_EDGES_SPARSE_SQL.strip()},\n"
    "gdeg AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src),\n"
    "h AS (SELECT deg, COUNT(*)::BIGINT AS c FROM gdeg GROUP BY deg),\n"
    "cumh AS (SELECT deg, c, SUM(c) OVER (ORDER BY deg)::BIGINT AS cum FROM h),\n"
    "blocks AS (SELECT deg, c, cum, cum - c AS r, "
    "deg::HUGEINT * (c::HUGEINT * (cum - c) + (c::HUGEINT * (c + 1)) // 2) AS rsum "
    "FROM cumh),\n"
    "tot AS (SELECT SUM(c)::BIGINT AS n, SUM(deg::HUGEINT * c)::BIGINT AS sum_deg, "
    "SUM(rsum)::BIGINT AS ranked_sum FROM blocks),\n"
    "kk AS (SELECT n, sum_deg, ranked_sum, "
    "GREATEST(1, (n + 99) // 100)::BIGINT AS k FROM tot),\n"
    "tm AS (SELECT SUM(GREATEST(0, LEAST(b.cum, kk.n) - GREATEST(b.r, kk.n - kk.k)) "
    "* b.deg)::BIGINT AS top_mass FROM blocks b, kk)\n"
    "SELECT n, sum_deg, ranked_sum, "
    "ROUND(2.0 * ranked_sum / (n::DOUBLE * sum_deg) - (n + 1)::DOUBLE / n, 6) AS gini, "
    "k AS top1pct_k, "
    "ROUND(top_mass::DOUBLE / sum_deg, 6) AS top1pct_share "
    "FROM kk, tm"
)


_NGRAM_CONTAINMENT_SQL = (
    f"WITH {_TOKS_SQL}, {_SHINGLES_SQL}, "
    "cex AS (SELECT doc_id, unnest(s) AS shingle FROM sh), "
    "csizes AS (SELECT doc_id, len(s)::BIGINT AS n FROM sh WHERE len(s) > 0), "
    "cshared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*)::BIGINT AS shared "
    "FROM cex a JOIN cex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2) "
    "SELECT doc_a, doc_b, shared, sa.n AS n_a, sb.n AS n_b, "
    "ROUND(shared::DOUBLE / sa.n, 6) AS cont_a, "
    "ROUND(shared::DOUBLE / sb.n, 6) AS cont_b "
    "FROM cshared JOIN csizes sa ON sa.doc_id = doc_a "
    "JOIN csizes sb ON sb.doc_id = doc_b "
    "WHERE shared * 10 >= 8 * LEAST(sa.n, sb.n)"
)


_EDGE_CLUSTERING_SQL = (
    f"WITH {_EDGES_SPARSE_SQL.strip()},\n"
    "rdeg AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src),\n"
    "re AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst),\n"
    "rsup AS (SELECT e.src, e.dst, COUNT(*)::BIGINT AS support FROM re e "
    "JOIN und u1 ON e.src = u1.src JOIN und u2 ON e.dst = u2.src "
    "AND u2.dst = u1.dst GROUP BY e.src, e.dst)\n"
    "SELECT re.src, re.dst, COALESCE(rsup.support, 0)::BIGINT AS support, "
    "LEAST(a.deg - 1, b.deg - 1)::BIGINT AS denom, "
    "CASE WHEN LEAST(a.deg - 1, b.deg - 1) > 0 THEN "
    "CAST(ROUND((COALESCE(rsup.support, 0) + 1)::DOUBLE "
    "/ LEAST(a.deg - 1, b.deg - 1) * 1000.0) AS BIGINT) END AS ecc_milli, "
    "CASE WHEN LEAST(a.deg - 1, b.deg - 1) > 0 THEN "
    "ROUND(CAST(ROUND((COALESCE(rsup.support, 0) + 1)::DOUBLE "
    "/ LEAST(a.deg - 1, b.deg - 1) * 1000.0) AS BIGINT)::DOUBLE / 1000.0, 6) END AS ecc "
    "FROM re LEFT JOIN rsup ON re.src = rsup.src AND re.dst = rsup.dst "
    "JOIN rdeg a ON re.src = a.id JOIN rdeg b ON re.dst = b.id"
)


_BURSTINESS_SQL = (
    "WITH bev AS (SELECT user_id, floor(epoch(ts))::BIGINT AS es, event_id FROM events),\n"
    "bg AS (SELECT user_id, es - LAG(es) OVER "
    "(PARTITION BY user_id ORDER BY es, event_id) AS gap FROM bev),\n"
    "ba AS (SELECT user_id, COUNT(*)::BIGINT AS n_gaps, "
    "SUM(gap::HUGEINT)::BIGINT AS sum_gap, "
    "SUM(gap::HUGEINT * gap)::BIGINT AS sum_gap_sq "
    "FROM bg WHERE gap IS NOT NULL GROUP BY user_id HAVING COUNT(*) >= 2)\n"
    "SELECT user_id, n_gaps, sum_gap, sum_gap_sq, "
    "CASE WHEN sqrt(n_gaps::DOUBLE * sum_gap_sq - sum_gap::DOUBLE * sum_gap) + sum_gap > 0 "
    "THEN ROUND((sqrt(n_gaps::DOUBLE * sum_gap_sq - sum_gap::DOUBLE * sum_gap) - sum_gap) "
    "/ (sqrt(n_gaps::DOUBLE * sum_gap_sq - sum_gap::DOUBLE * sum_gap) + sum_gap), 6) END "
    "AS burstiness FROM ba"
)


_SPECTRAL_RADIUS_SQL = (
    f"WITH {_EDGES_SPARSE_SQL.strip()},\n"
    "srdeg AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src),\n"
    "srm AS (SELECT COUNT(*)::BIGINT AS n, MAX(deg)::BIGINT AS d_max, "
    "SUM(deg::HUGEINT)::BIGINT AS s1, SUM(deg::HUGEINT * deg)::BIGINT AS s2 FROM srdeg),\n"
    "srp AS (SELECT MAX(a.deg::HUGEINT * b.deg)::BIGINT AS max_deg_prod "
    "FROM und e JOIN srdeg a ON e.src = a.id JOIN srdeg b ON e.dst = b.id "
    "WHERE e.src < e.dst)\n"
    "SELECT n, (s1 // 2)::BIGINT AS m, d_max, s1, s2, max_deg_prod, "
    "ROUND(GREATEST(s1::DOUBLE / n, sqrt(d_max::DOUBLE), sqrt(s2::DOUBLE / n)), 6) AS lam_lower, "
    "ROUND(LEAST(d_max::DOUBLE, sqrt(max_deg_prod::DOUBLE)), 6) AS lam_upper, "
    "ROUND(1.0 / LEAST(d_max::DOUBLE, sqrt(max_deg_prod::DOUBLE)), 6) AS tau_lower, "
    "ROUND(1.0 / GREATEST(s1::DOUBLE / n, sqrt(d_max::DOUBLE), sqrt(s2::DOUBLE / n)), 6) AS tau_upper "
    "FROM srm, srp"
)


def _temporal_triangles_sql() -> str:
    """Twin of temporal_triangle_count on the shared `te` stamps."""
    from metis_spark.driver.common import TT_DELTA

    d = TT_DELTA
    return (
        f"WITH {_EDGES_SPARSE_SQL.strip()},\n"
        "te AS MATERIALIZED (SELECT src, dst, "
        "('0x' || substr(md5('t_' || src::VARCHAR || '_' || dst::VARCHAR), 1, 15))"
        f"::BIGINT % {TEMPORAL_TS_MOD} AS ts FROM edges),\n"
        "tp AS MATERIALIZED (SELECT a.src AS u, a.dst AS v, b.dst AS w, "
        "a.ts AS t1, b.ts AS t2 FROM te a JOIN te b ON a.dst = b.src "
        f"WHERE b.ts > a.ts AND b.ts <= a.ts + {d} AND b.dst <> a.src),\n"
        "tpc AS (SELECT COUNT(*)::BIGINT AS two_paths FROM tp),\n"
        "tric AS (SELECT COUNT(*)::BIGINT AS cyc FROM tp "
        "JOIN te c ON tp.w = c.src AND tp.u = c.dst "
        f"WHERE c.ts > tp.t2 AND c.ts <= tp.t1 + {d})\n"
        "SELECT (SELECT COUNT(*) FROM te)::BIGINT AS n_temporal_edges, "
        f"{d}::BIGINT AS delta, two_paths, cyc AS cyc_triangles, "
        "CASE WHEN two_paths > 0 THEN ROUND(cyc::DOUBLE / two_paths, 6) END AS closure "
        "FROM tpc, tric"
    )


def _community_conductance_sql() -> str:
    """Twin of community_conductance on the unrolled Louvain chain."""
    ctes = _louvain_level1_ctes(LOUVAIN_ROUNDS)
    r = LOUVAIN_ROUNDS
    ctes += [
        f"cct AS MATERIALIZED (SELECT la.label AS lu, lb.label AS lv FROM und e "
        f"JOIN l{r} la ON e.src = la.id JOIN l{r} lb ON e.dst = lb.id)",
        "ccp AS (SELECT lu AS community, COUNT(*)::BIGINT AS volume, "
        "SUM(CASE WHEN lu <> lv THEN 1 ELSE 0 END)::BIGINT AS cut FROM cct GROUP BY lu)",
        f"ccn AS (SELECT label AS community, COUNT(*)::BIGINT AS n_vertices "
        f"FROM l{r} GROUP BY label)",
        "cc2m AS (SELECT COUNT(*)::BIGINT AS vol2m FROM und)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT ccn.community, ccn.n_vertices, "
        "COALESCE(ccp.volume, 0)::BIGINT AS volume, "
        "COALESCE(ccp.cut, 0)::BIGINT AS cut, "
        "CASE WHEN LEAST(COALESCE(ccp.volume, 0), vol2m - COALESCE(ccp.volume, 0)) > 0 "
        "THEN ROUND(COALESCE(ccp.cut, 0)::DOUBLE / "
        "LEAST(COALESCE(ccp.volume, 0), vol2m - COALESCE(ccp.volume, 0)), 6) END "
        "AS conductance "
        "FROM ccn LEFT JOIN ccp ON ccn.community = ccp.community, cc2m"
    )


def _kendall_rank_sql(k: int = SPEAR_K) -> str:
    """Twin of the Kendall rank-agreement query: identical CTE chain
    to _rank_correlation_sql up to the permutation, then the bounded
    k×k pair join and the (C−D)/pairs fold."""
    pr = _pagerank_ctes()
    ei = _eigen_ctes()
    seen = set()
    ctes = []
    for c in pr + ei:
        key = c.split(" AS ")[0].strip()
        if key in seen:
            continue
        seen.add(key)
        ctes.append(c)
    ctes += [
        f"ktp AS (SELECT id, ROUND(rank, 6) AS sa FROM r{PR_ITERS})",
        f"kte AS (SELECT id, ROUND(x, 6) AS sb FROM x{PR_ITERS})",
        f"ktt AS (SELECT id, sa FROM ktp ORDER BY sa DESC, id ASC LIMIT {k})",
        "ktj AS (SELECT t.id, t.sa, e.sb FROM ktt t JOIN kte e ON t.id = e.id)",
        "ktr AS MATERIALIZED (SELECT id, "
        "ROW_NUMBER() OVER (ORDER BY sa DESC, id ASC)::BIGINT AS ra, "
        "ROW_NUMBER() OVER (ORDER BY sb DESC, id ASC)::BIGINT AS rb FROM ktj)",
        "ktpair AS (SELECT COUNT(*)::BIGINT AS pairs, "
        "SUM(CASE WHEN a.rb > b.rb THEN 1 ELSE 0 END)::BIGINT AS discordant "
        "FROM ktr a JOIN ktr b ON a.ra < b.ra)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT CAST(ROUND((1 + sqrt(1 + 8.0 * pairs)) / 2) AS BIGINT) AS n, "
        "(pairs - discordant)::BIGINT AS concordant, discordant, "
        "CASE WHEN pairs > 0 THEN ROUND((pairs - 2 * discordant)::DOUBLE / pairs, 6) END "
        "AS kendall FROM ktpair"
    )


_RICH_CLUB_NORM_SQL = f"""
WITH {{edges}},
ndegs AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS d FROM und GROUP BY src),
n2m AS (SELECT COUNT(*)::BIGINT AS two_m FROM und),
npairs AS MATERIALIZED (
  SELECT u.src, u.dst, a.d AS da, b.d AS db FROM und u
  JOIN ndegs a ON u.src = a.id JOIN ndegs b ON u.dst = b.id WHERE u.src < u.dst
),
nspine(k) AS (VALUES {", ".join(f"({k}::BIGINT)" for k in RICH_CLUB_KS)}),
nclub AS (SELECT s.k, COUNT(*)::BIGINT AS n_k, SUM(d.d::HUGEINT)::BIGINT AS s1_k,
       SUM(d.d::HUGEINT * d.d)::BIGINT AS s2_k
       FROM nspine s JOIN ndegs d ON d.d > s.k GROUP BY s.k),
nek AS (SELECT s.k, COUNT(*)::BIGINT AS e_k FROM nspine s JOIN npairs p
       ON p.da > s.k AND p.db > s.k GROUP BY s.k)
SELECT s.k, COALESCE(c.n_k, 0)::BIGINT AS n_k, COALESCE(e.e_k, 0)::BIGINT AS e_k,
       COALESCE(c.s1_k, 0)::BIGINT AS s1_k, COALESCE(c.s2_k, 0)::BIGINT AS s2_k,
       CASE WHEN COALESCE(c.n_k, 0) >= 2 THEN
         ROUND((c.s1_k::DOUBLE * c.s1_k - c.s2_k) / (2.0 * m.two_m), 6) END AS e_null,
       CASE WHEN COALESCE(c.n_k, 0) >= 2
            AND (c.s1_k::DOUBLE * c.s1_k - c.s2_k) / (2.0 * m.two_m) > 0 THEN
         ROUND(COALESCE(e.e_k, 0)::DOUBLE /
               ((c.s1_k::DOUBLE * c.s1_k - c.s2_k) / (2.0 * m.two_m)), 6) END AS rho
FROM nspine s LEFT JOIN nclub c ON s.k = c.k LEFT JOIN nek e ON s.k = e.k, n2m m
"""


def _mean_distance_sql() -> str:
    """Twin of mean_distance_exact: the _anf_exact_sql N(t) chain, then
    the bounded diff-and-fold over h+1 rows."""
    base = _anf_exact_sql()
    return (
        f"WITH mdnf AS MATERIALIZED ({base}),\n"
        "mdd AS (SELECT t, pairs, pairs - LAG(pairs) OVER (ORDER BY t) AS new_pairs "
        "FROM mdnf),\n"
        "mda AS (SELECT MAX(t)::BIGINT AS horizon, MIN(pairs)::BIGINT AS n0, "
        "MAX(pairs)::BIGINT AS nh, "
        "COALESCE(SUM(t::HUGEINT * new_pairs), 0)::BIGINT AS sum_dist FROM mdd)\n"
        "SELECT horizon, n0 AS n_vertices, (nh - n0)::BIGINT AS reachable_pairs, "
        "sum_dist, CASE WHEN nh > n0 THEN ROUND(sum_dist::DOUBLE / (nh - n0), 6) END "
        "AS mean_distance FROM mda"
    )


_MINHASH_ERROR_SQL = (
    f"WITH {_MINHASH_CTES}, "
    "mem AS (SELECT c.doc_a, c.doc_b, "
    "SUM(CASE WHEN a.minhash = b.minhash THEN 1 ELSE 0 END)::BIGINT AS matching_seeds "
    "FROM cand c JOIN mh a ON a.doc_id = c.doc_a JOIN mh b ON b.doc_id = c.doc_b "
    "AND a.seed = b.seed GROUP BY c.doc_a, c.doc_b), "
    "msets AS (SELECT doc_id, s FROM sh WHERE len(s) > 0), "
    "mej AS (SELECT m.doc_a, m.doc_b, m.matching_seeds, "
    "len(list_intersect(x.s, y.s))::BIGINT AS n_inter, "
    "(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)))::BIGINT AS n_union "
    "FROM mem m JOIN msets x ON x.doc_id = m.doc_a JOIN msets y ON y.doc_id = m.doc_b) "
    "SELECT doc_a, doc_b, matching_seeds, n_inter, n_union, "
    "ROUND(matching_seeds::DOUBLE / 8.0, 6) AS est, "
    "ROUND(n_inter::DOUBLE / n_union, 6) AS jaccard, "
    "ROUND(ABS(matching_seeds::DOUBLE / 8.0 - n_inter::DOUBLE / n_union), 6) AS abs_err "
    "FROM mej"
)


_RETENTION_SQL = (
    "WITH rtev AS (SELECT user_id, "
    "(floor(epoch(ts) / 86400)::BIGINT // 7)::BIGINT AS week FROM events),\n"
    "rtf AS (SELECT user_id, MIN(week)::BIGINT AS cohort_week FROM rtev GROUP BY user_id),\n"
    "rta AS (SELECT DISTINCT user_id, week FROM rtev),\n"
    "rtc AS (SELECT f.cohort_week, (a.week - f.cohort_week)::BIGINT AS week_offset, "
    "COUNT(*)::BIGINT AS n_users FROM rta a JOIN rtf f ON a.user_id = f.user_id "
    "GROUP BY f.cohort_week, a.week - f.cohort_week),\n"
    "rtb AS (SELECT cohort_week, n_users AS cohort_size FROM rtc WHERE week_offset = 0)\n"
    "SELECT c.cohort_week, c.week_offset, c.n_users, "
    "ROUND(c.n_users::DOUBLE / b.cohort_size, 6) AS retention "
    "FROM rtc c JOIN rtb b ON c.cohort_week = b.cohort_week"
)

_FUNNEL_SQL = (
    "WITH fev AS (SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS es FROM events),\n"
    "f1 AS (SELECT user_id, MIN(es)::BIGINT AS t1 FROM fev WHERE event_type = 'view' "
    "GROUP BY user_id),\n"
    "f2 AS (SELECT e.user_id, MIN(e.es)::BIGINT AS t2 FROM fev e JOIN f1 ON "
    "e.user_id = f1.user_id WHERE e.event_type = 'click' AND e.es > f1.t1 "
    "GROUP BY e.user_id),\n"
    "f3 AS (SELECT e.user_id, MIN(e.es)::BIGINT AS t3 FROM fev e JOIN f2 ON "
    "e.user_id = f2.user_id WHERE e.event_type = 'purchase' AND e.es > f2.t2 "
    "GROUP BY e.user_id),\n"
    "fc AS (SELECT (SELECT COUNT(*) FROM f1)::BIGINT AS n1, "
    "(SELECT COUNT(*) FROM f2)::BIGINT AS n2, (SELECT COUNT(*) FROM f3)::BIGINT AS n3)\n"
    "SELECT 1::BIGINT AS step, 'view' AS event_type, n1 AS n_users, "
    "NULL::DOUBLE AS conversion FROM fc "
    "UNION ALL SELECT 2, 'click', n2, CASE WHEN n1 > 0 THEN ROUND(n2::DOUBLE / n1, 6) END FROM fc "
    "UNION ALL SELECT 3, 'purchase', n3, CASE WHEN n2 > 0 THEN ROUND(n3::DOUBLE / n2, 6) END FROM fc"
)


def _embedding_cos_histogram_sql() -> str:
    """Twin of the cosine-histogram calibration query."""
    from metis_spark.driver.common import EDH_MOD

    cos = _cos_expr("a.ea", "b.eb")
    return (
        f"WITH eha AS (SELECT vec_id AS ia, embedding AS ea FROM embeddings "
        f"WHERE vec_id % {EDH_MOD} = 0),\n"
        f"ehb AS (SELECT vec_id AS ib, embedding AS eb FROM embeddings "
        f"WHERE vec_id % {EDH_MOD} = 1),\n"
        f"ehc AS (SELECT LEAST(19, floor((ROUND({cos}, 6) + 1.0) * 10.0))::BIGINT AS bin "
        "FROM eha a CROSS JOIN ehb b)\n"
        "SELECT bin, ROUND(bin::DOUBLE / 10.0 - 1.0, 6) AS lo, "
        "COUNT(*)::BIGINT AS n_pairs FROM ehc GROUP BY bin"
    )


def _scc_condensation_sql() -> str:
    """Twin of scc_condensation: the _scc_sql label chain + size and
    quotient-edge folds."""
    scc = _scc_sql()
    head, union = scc.rsplit("\n", 1)
    ctes = [head[len("WITH "):]]
    ctes += [
        f"sccl AS MATERIALIZED ({union})",
        "scsz AS (SELECT scc, COUNT(*)::BIGINT AS sz FROM sccl GROUP BY scc)",
        "scst AS (SELECT SUM(sz)::BIGINT AS n_vertices, COUNT(*)::BIGINT AS n_sccs, "
        "MAX(sz)::BIGINT AS largest_scc, "
        "SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END)::BIGINT AS nontrivial_sccs, "
        "SUM(CASE WHEN sz > 1 THEN sz ELSE 0 END)::BIGINT AS vertices_in_cycles FROM scsz)",
        "scce AS (SELECT COUNT(*)::BIGINT AS condensed_edges FROM "
        "(SELECT DISTINCT a.scc AS la, b.scc AS lb FROM edges e "
        "JOIN sccl a ON e.src = a.id JOIN sccl b ON e.dst = b.id "
        "WHERE a.scc <> b.scc))",
        "scm AS (SELECT COUNT(*)::BIGINT AS m FROM edges)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT n_vertices, n_sccs, largest_scc, nontrivial_sccs, "
        "vertices_in_cycles, condensed_edges, "
        "ROUND(1.0 - condensed_edges::DOUBLE / m, 6) AS edge_reduction "
        "FROM scst, scce, scm"
    )


_GOOD_TURING_SQL = (
    "WITH gtt AS (SELECT lang, unnest(list_filter(string_split_regex(lower(text), "
    "'[^a-z0-9]+'), x -> x <> '')) AS term FROM documents),\n"
    "gtf AS (SELECT lang, term, COUNT(*)::BIGINT AS c FROM gtt GROUP BY lang, term),\n"
    "gta AS (SELECT lang, SUM(c)::BIGINT AS n_tokens, COUNT(*)::BIGINT AS n_types, "
    "SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n1, "
    "SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS n2 FROM gtf GROUP BY lang)\n"
    "SELECT lang, n_tokens, n_types, n1, n2, "
    "ROUND(n1::DOUBLE / n_tokens, 6) AS p_unseen, "
    "ROUND(n_types::DOUBLE + n1::DOUBLE * (n1 - 1) / (2.0 * (n2 + 1)), 6) AS chao1 "
    "FROM gta"
)


_LABEL_SEP_SQL = (
    "WITH lsp AS MATERIALIZED (SELECT label::BIGINT AS lab, vec_id AS id, "
    "i - 1 AS pos, floor(embedding[i]::DOUBLE * 1000.0)::BIGINT AS q "
    "FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),\n"
    "lsv AS MATERIALIZED (SELECT lab, pos, SUM(q)::BIGINT AS sv FROM lsp "
    "GROUP BY lab, pos),\n"
    "lsn AS (SELECT lab, SUM(sv::HUGEINT * sv) AS nrm FROM lsv GROUP BY lab),\n"
    "lsc AS (SELECT lab, COUNT(DISTINCT id)::BIGINT AS n FROM lsp GROUP BY lab),\n"
    "lsd AS (SELECT a.lab AS la, b.lab AS lb, SUM(a.sv::HUGEINT * b.sv) AS dot "
    "FROM lsv a JOIN lsv b ON a.pos = b.pos AND a.lab < b.lab GROUP BY a.lab, b.lab),\n"
    "lsm AS (SELECT p.lab, p.id, SUM(p.q::HUGEINT * v.sv) AS dv, "
    "SUM(p.q::HUGEINT * p.q) AS nq FROM lsp p JOIN lsv v ON p.lab = v.lab "
    "AND p.pos = v.pos GROUP BY p.lab, p.id),\n"
    "lsh2 AS (SELECT m.lab, CAST(ROUND(m.dv::DOUBLE / "
    "sqrt(m.nq::DOUBLE * n.nrm::DOUBLE) * 1000000.0) AS BIGINT) AS cm "
    "FROM lsm m JOIN lsn n ON m.lab = n.lab),\n"
    "lsco AS (SELECT lab, ROUND(SUM(cm)::DOUBLE / COUNT(*) / 1000000.0, 6) AS cohesion "
    "FROM lsh2 GROUP BY lab)\n"
    "SELECT d.la AS label_a, d.lb AS label_b, ca.n AS n_a, cb.n AS n_b, "
    "ROUND(d.dot::DOUBLE / sqrt(na.nrm::DOUBLE * nb.nrm::DOUBLE), 6) AS cos_centroids, "
    "coa.cohesion AS cohesion_a, cob.cohesion AS cohesion_b "
    "FROM lsd d JOIN lsc ca ON d.la = ca.lab JOIN lsc cb ON d.lb = cb.lab "
    "JOIN lsn na ON d.la = na.lab JOIN lsn nb ON d.lb = nb.lab "
    "JOIN lsco coa ON d.la = coa.lab JOIN lsco cob ON d.lb = cob.lab"
)


def _dcsbm_sql() -> str:
    """Twin of dcsbm_likelihood on the unrolled Louvain chain."""
    ctes = _louvain_level1_ctes(LOUVAIN_ROUNDS)
    r = LOUVAIN_ROUNDS
    ctes += [
        f"dcb AS MATERIALIZED (SELECT la.label AS lr, lb.label AS ls, "
        f"COUNT(*)::BIGINT AS mrs FROM und e JOIN l{r} la ON e.src = la.id "
        f"JOIN l{r} lb ON e.dst = lb.id GROUP BY la.label, lb.label)",
        "dck AS (SELECT lr, SUM(mrs)::BIGINT AS kr FROM dcb GROUP BY lr)",
        "dct AS (SELECT SUM(CAST(ROUND(b.mrs::DOUBLE * ln(b.mrs::DOUBLE "
        "/ (a.kr::DOUBLE * c.kr)) * 1000000.0) AS BIGINT))::BIGINT AS ll_micro "
        "FROM dcb b JOIN dck a ON b.lr = a.lr JOIN dck c ON b.ls = c.lr)",
        "dcm AS (SELECT COUNT(*)::BIGINT AS two_m FROM und)",
        f"dcg AS (SELECT COUNT(DISTINCT label)::BIGINT AS n_groups FROM l{r})",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT n_groups, two_m, ll_micro, "
        "ROUND(ll_micro::DOUBLE / 1000000.0, 6) AS ll, "
        "ROUND(ll_micro::DOUBLE / 1000000.0 / two_m, 6) AS ll_per_edge "
        "FROM dcg, dcm, dct"
    )


_EVENT_TRANSITIONS_SQL = (
    "WITH etp AS (SELECT LAG(event_type) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id) AS prev_type, "
    "event_type AS next_type FROM events),\n"
    "etc AS (SELECT prev_type, next_type, COUNT(*)::BIGINT AS n FROM etp "
    "WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type),\n"
    "ett AS (SELECT prev_type, SUM(n)::BIGINT AS row_n FROM etc GROUP BY prev_type)\n"
    "SELECT c.prev_type, c.next_type, c.n, "
    "ROUND(c.n::DOUBLE / t.row_n, 6) AS prob "
    "FROM etc c JOIN ett t ON c.prev_type = t.prev_type"
)

_CLUSTERING_BY_DEGREE_SQL = (
    f"WITH {_EDGES_SPARSE_SQL.strip()}, "
    "cbdeg AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src), "
    "cbu AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges), "
    "cbtri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM cbu e1 "
    "JOIN cbu e2 ON e1.b = e2.a JOIN cbu e3 ON e3.a = e1.a AND e3.b = e2.b), "
    "cbm AS (SELECT x AS id FROM cbtri UNION ALL SELECT y FROM cbtri "
    "UNION ALL SELECT z FROM cbtri), "
    "cbc AS (SELECT id, COUNT(*)::BIGINT AS t FROM cbm GROUP BY id), "
    "cbv AS (SELECT d.deg, CASE WHEN d.deg >= 2 THEN "
    "CAST(ROUND(2000000.0 * COALESCE(c.t, 0) / (d.deg::DOUBLE * (d.deg - 1))) AS BIGINT) "
    "ELSE 0 END AS m FROM cbdeg d LEFT JOIN cbc c ON d.id = c.id)\n"
    "SELECT deg, COUNT(*)::BIGINT AS n_vertices, SUM(m)::BIGINT AS sum_lcc_micro, "
    "ROUND(SUM(m)::DOUBLE / COUNT(*) / 1000000.0, 6) AS mean_lcc FROM cbv GROUP BY deg"
)


def _kmeans_silhouette_sql(
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    scale: int = KMEANS_SCALE,
    dim: int = 64,
) -> str:
    """Twin of kmeans_silhouette: the shared kmeans chain's dfin holds
    every point-to-centroid dist2; fold (a2, b2) -> micro silhouette."""
    return (
        _kmeans_chain(k, iters, scale, dim)
        + """,
silb AS (SELECT d.id, MIN(d.dist2)::BIGINT AS b2
  FROM dfin d JOIN afin a ON d.id = a.id AND d.cid <> a.cid GROUP BY d.id),
sils AS (SELECT a.cid, CASE WHEN GREATEST(a.dist2, b.b2) > 0 THEN
  CAST(ROUND((sqrt(b.b2::DOUBLE) - sqrt(a.dist2::DOUBLE))
       / GREATEST(sqrt(a.dist2::DOUBLE), sqrt(b.b2::DOUBLE)) * 1000000.0) AS BIGINT)
  ELSE 0 END AS sm
  FROM afin a JOIN silb b ON a.id = b.id)
SELECT cid, COUNT(*)::BIGINT AS n_members,
       ROUND(SUM(sm)::DOUBLE / COUNT(*) / 1000000.0, 6) AS mean_silhouette
FROM sils GROUP BY cid"""
    )


_MAD_OUTLIERS_SQL = (
    "WITH mde AS (SELECT event_type, value FROM events),\n"
    "mdm AS (SELECT event_type, quantile_cont(value, 0.5) AS med, "
    "COUNT(*)::BIGINT AS n FROM mde GROUP BY event_type),\n"
    "mdd AS (SELECT e.event_type, m.n, m.med, ABS(e.value - m.med) AS adev "
    "FROM mde e JOIN mdm m ON e.event_type = m.event_type),\n"
    "mda AS (SELECT event_type, MAX(n)::BIGINT AS n, MAX(med) AS med, "
    "quantile_cont(adev, 0.5) AS mad FROM mdd GROUP BY event_type),\n"
    "mdf AS (SELECT e.event_type, SUM(CASE WHEN ABS(e.value - a.med) > 3.5 * a.mad "
    "THEN 1 ELSE 0 END)::BIGINT AS n_outliers FROM mde e JOIN mda a "
    "ON e.event_type = a.event_type WHERE a.mad > 0 GROUP BY e.event_type)\n"
    "SELECT a.event_type, a.n, ROUND(a.med, 6) AS med, ROUND(a.mad, 6) AS mad, "
    "COALESCE(f.n_outliers, 0)::BIGINT AS n_outliers, "
    "CASE WHEN a.mad > 0 THEN ROUND(COALESCE(f.n_outliers, 0)::DOUBLE / a.n, 6) END "
    "AS outlier_rate "
    "FROM mda a LEFT JOIN mdf f ON a.event_type = f.event_type"
)


def _global_efficiency_sql() -> str:
    """Twin of global_efficiency on the _anf_exact_sql chain."""
    base = _anf_exact_sql()
    return (
        f"WITH genf AS MATERIALIZED ({base}),\n"
        "ged AS (SELECT t, pairs, pairs - LAG(pairs) OVER (ORDER BY t) AS new_pairs "
        "FROM genf),\n"
        "gea AS (SELECT MAX(t)::BIGINT AS horizon, MIN(pairs)::BIGINT AS n0, "
        "COALESCE(SUM(CASE WHEN t > 0 THEN "
        "CAST(ROUND(1000000.0 / t) AS HUGEINT) * new_pairs END), 0)::BIGINT AS eff_micro "
        "FROM ged)\n"
        "SELECT horizon, n0 AS n_vertices, (n0::HUGEINT * (n0 - 1))::BIGINT AS ordered_pairs, "
        "eff_micro, CASE WHEN n0 > 1 THEN "
        "ROUND(eff_micro::DOUBLE / 1000000.0 / (n0::DOUBLE * (n0 - 1)), 6) END AS efficiency "
        "FROM gea"
    )


def _pq_ann_recall_sql() -> str:
    """Twin of the PQ recall gate: the full _pq_ann_sql ranking as a
    subquery vs an exact quantized-L2 top-k on the same floor-quantized
    points."""
    from metis_spark.driver.common import PQ_TOPK

    pq = _pq_ann_sql()
    return (
        f"WITH pqr AS MATERIALIZED ({pq}),\n"
        "prqid AS (SELECT MIN(vec_id)::BIGINT AS id FROM embeddings),\n"
        "prpts AS MATERIALIZED (SELECT vec_id AS id, ix.i AS pos, "
        "floor(embedding[ix.i + 1]::DOUBLE * 1000.0)::BIGINT AS q "
        "FROM embeddings, (SELECT unnest(range(0, 64)) AS i) ix),\n"
        "prq AS (SELECT pos, q AS qq FROM prpts WHERE id = (SELECT id FROM prqid)),\n"
        "prd AS (SELECT p.id, SUM((p.q - e.qq) * (p.q - e.qq))::BIGINT AS d2 "
        "FROM prpts p JOIN prq e ON p.pos = e.pos "
        "WHERE p.id <> (SELECT id FROM prqid) GROUP BY p.id),\n"
        "prtop AS (SELECT id FROM (SELECT id, ROW_NUMBER() OVER (ORDER BY d2, id) AS rn "
        f"FROM prd) WHERE rn <= {PQ_TOPK}),\n"
        "prh AS (SELECT COUNT(*)::BIGINT AS n_overlap FROM prtop t "
        "JOIN pqr ON t.id = pqr.id),\n"
        "prn AS (SELECT COUNT(*)::BIGINT AS n_exact FROM prtop)\n"
        "SELECT n_exact, n_overlap, ROUND(n_overlap::DOUBLE / n_exact, 6) AS recall "
        "FROM prn, prh"
    )


_VOCAB_COVERAGE_SQL = (
    f"WITH {_TOKS_SQL},\n"
    "vce AS (SELECT unnest(t) AS term FROM toks),\n"
    "vcf AS (SELECT term, COUNT(*)::BIGINT AS c FROM vce GROUP BY term),\n"
    "vct AS (SELECT SUM(c)::BIGINT AS total_tokens FROM vcf),\n"
    "vch AS (SELECT term, c, ROW_NUMBER() OVER (ORDER BY c DESC, term ASC)::BIGINT AS rn "
    "FROM vcf ORDER BY c DESC, term ASC LIMIT 10000),\n"
    "vcs(k) AS (VALUES (100::BIGINT), (1000::BIGINT), (10000::BIGINT)),\n"
    "vcp AS (SELECT s.k, COUNT(*)::BIGINT AS vocab_size, SUM(h.c)::BIGINT AS covered_tokens "
    "FROM vcs s JOIN vch h ON h.rn <= s.k GROUP BY s.k)\n"
    "SELECT p.k, p.vocab_size, p.covered_tokens, t.total_tokens, "
    "ROUND(p.covered_tokens::DOUBLE / t.total_tokens, 6) AS coverage "
    "FROM vcp p, vct t"
)

def _heat_kernel_sql() -> str:
    """Twin of plans/diffusion.py:heat_kernel_ppr — the unrolled integer
    Taylor recurrence (share = x // outdeg, x_k = (T·gather) // (T_den·k)),
    truncating division of non-negative BIGINTs matching Spark DIV."""
    from metis_spark.driver.common import (
        HK_SCALE, HK_SEED_MOD, HK_T_DEN, HK_T_NUM, HK_TERMS, HK_TOPK,
    )

    ctes = [
        _EDGES_SQL.strip().rstrip(),
        "hkdeg AS (SELECT src, COUNT(*)::BIGINT AS deg FROM edges GROUP BY src)",
        f"hx0 AS MATERIALIZED (SELECT id, CASE WHEN id % {HK_SEED_MOD} = 0 "
        f"THEN {HK_SCALE} ELSE 0 END::BIGINT AS x FROM verts)",
        "hh0 AS (SELECT id, x AS hk FROM hx0)",
    ]
    for k in range(1, HK_TERMS + 1):
        pv = k - 1
        ctes.append(
            f"hs{k} AS (SELECT x.id AS src, (x.x // o.deg)::BIGINT AS share "
            f"FROM hx{pv} x JOIN hkdeg o ON x.id = o.src)"
        )
        ctes.append(
            f"hg{k} AS (SELECT e.dst AS id, SUM(s.share)::BIGINT AS g "
            f"FROM edges e JOIN hs{k} s ON e.src = s.src GROUP BY e.dst)"
        )
        ctes.append(
            f"hx{k} AS MATERIALIZED (SELECT v.id, (({HK_T_NUM} * COALESCE(g.g, 0)) "
            f"// {HK_T_DEN * k})::BIGINT AS x "
            f"FROM verts v LEFT JOIN hg{k} g ON v.id = g.id)"
        )
        ctes.append(
            f"hh{k} AS MATERIALIZED (SELECT h.id, (h.hk + COALESCE(x.x, 0))::BIGINT AS hk "
            f"FROM hh{pv} h LEFT JOIN hx{k} x ON h.id = x.id)"
        )
    ctes.append(f"hkt AS (SELECT SUM(hk)::BIGINT AS t FROM hh{HK_TERMS})")
    ctes.append(
        f"hktop AS (SELECT id, hk, ROW_NUMBER() OVER (ORDER BY hk DESC, id ASC) AS rn "
        f"FROM hh{HK_TERMS} WHERE hk > 0)"
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT id, hk::BIGINT AS hk_scaled, "
        "ROUND(hk::DOUBLE / (SELECT t FROM hkt), 6) AS hk_norm, rn::BIGINT AS rn "
        f"FROM hktop WHERE rn <= {HK_TOPK}"
    )


def _pagerank_delta_curve_sql() -> str:
    """Twin of plans/diffusion.py:pagerank_delta_curve — the unrolled
    quantized power iteration with exact integer L1/L∞ deltas per round
    (d = 17/20, dangling mass folded via dm // n, all ops on BIGINTs)."""
    from metis_spark.driver.common import PRDC_ITERS, PRDC_SCALE

    num, den = 17, 20
    ctes = [
        _EDGES_SQL.strip().rstrip(),
        "pdeg AS (SELECT src, COUNT(*)::BIGINT AS deg FROM edges GROUP BY src)",
        "pbase AS (SELECT v.id, COALESCE(o.deg, 0)::BIGINT AS deg "
        "FROM verts v LEFT JOIN pdeg o ON v.id = o.src)",
        "pnn AS (SELECT COUNT(*)::BIGINT AS n FROM pbase)",
        f"pr0 AS MATERIALIZED (SELECT id, {PRDC_SCALE}::BIGINT AS r FROM pbase)",
    ]
    for i in range(1, PRDC_ITERS + 1):
        pv = i - 1
        ctes.append(
            f"pdm{i} AS (SELECT (COALESCE(SUM(r.r), 0)::BIGINT "
            f"// (SELECT n FROM pnn))::BIGINT AS dmper "
            f"FROM pr{pv} r JOIN pbase b ON r.id = b.id WHERE b.deg = 0)"
        )
        ctes.append(
            f"ps{i} AS (SELECT b.id AS src, (r.r // b.deg)::BIGINT AS share "
            f"FROM pbase b JOIN pr{pv} r ON b.id = r.id WHERE b.deg > 0)"
        )
        ctes.append(
            f"pg{i} AS (SELECT e.dst AS id, SUM(s.share)::BIGINT AS g "
            f"FROM edges e JOIN ps{i} s ON e.src = s.src GROUP BY e.dst)"
        )
        ctes.append(
            f"pr{i} AS MATERIALIZED (SELECT b.id, ((({den - num})::BIGINT * {PRDC_SCALE} "
            f"+ {num} * (COALESCE(g.g, 0) + (SELECT dmper FROM pdm{i}))) "
            f"// {den})::BIGINT AS r "
            f"FROM pbase b LEFT JOIN pg{i} g ON b.id = g.id)"
        )
        ctes.append(
            f"pd{i} AS (SELECT {i}::BIGINT AS iter, "
            "SUM(ABS(a.r - b.r))::BIGINT AS l1_delta, "
            "MAX(ABS(a.r - b.r))::BIGINT AS linf_delta, "
            "SUM(CASE WHEN a.r <> b.r THEN 1 ELSE 0 END)::BIGINT AS moved_vertices "
            f"FROM pr{i} a JOIN pr{pv} b ON a.id = b.id)"
        )
    union = " UNION ALL ".join(f"SELECT * FROM pd{i}" for i in range(1, PRDC_ITERS + 1))
    return "WITH " + ",\n".join(ctes) + f"\n{union} ORDER BY iter"

def _mmr_sql() -> str:
    """Twin of operators/similarity.py:mmr_topk — relevance pool prune
    then MMR_K unrolled greedy rounds; per-round state MATERIALIZED
    (referenced by both the selection and the next round — the CTE
    inlining blowup the delta-curve twin hit). λ mix = (7·rel −
    3·maxsim)/10 with integer literals on already-rounded doubles."""
    from metis_spark.driver.common import MMR_K, MMR_POOL

    ctes = [
        "mq AS (SELECT MIN(vec_id)::BIGINT AS qid FROM embeddings)",
        "mqv AS (SELECT embedding AS qv FROM embeddings "
        "WHERE vec_id = (SELECT qid FROM mq))",
        "mc0 AS MATERIALIZED (SELECT vec_id, v, rel, CAST(-1.0 AS DOUBLE) AS maxsim "
        "FROM (SELECT e.vec_id::BIGINT AS vec_id, e.embedding AS v, "
        f"ROUND({_cos_expr('e.embedding', 'q.qv')}, 6) AS rel, "
        "ROW_NUMBER() OVER (ORDER BY "
        f"ROUND({_cos_expr('e.embedding', 'q.qv')}, 6) DESC, e.vec_id ASC) AS prn "
        "FROM embeddings e, mqv q WHERE e.vec_id <> (SELECT qid FROM mq)) "
        f"WHERE prn <= {MMR_POOL})",
    ]
    for i in range(1, MMR_K + 1):
        pv = i - 1
        ctes.append(
            f"mp{i} AS MATERIALIZED (SELECT vec_id, v, rel, maxsim, "
            "ROUND((7 * rel - 3 * maxsim) / 10, 6) AS mmr, "
            "ROW_NUMBER() OVER (ORDER BY "
            "ROUND((7 * rel - 3 * maxsim) / 10, 6) DESC, vec_id ASC) AS srn "
            f"FROM mc{pv})"
        )
        ctes.append(
            f"msel{i} AS (SELECT {i}::BIGINT AS rn, vec_id, v, "
            f"rel AS relevance, maxsim AS max_sim, mmr FROM mp{i} WHERE srn = 1)"
        )
        if i < MMR_K:
            ctes.append(
                f"mc{i} AS MATERIALIZED (SELECT c.vec_id, c.v, c.rel, "
                f"GREATEST(c.maxsim, ROUND({_cos_expr('c.v', 's.v')}, 6)) AS maxsim "
                f"FROM mp{i} c, msel{i} s WHERE c.srn > 1)"
            )
    union = " UNION ALL ".join(
        f"SELECT rn, vec_id, relevance, max_sim, mmr FROM msel{i}"
        for i in range(1, MMR_K + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\n{union} ORDER BY rn"

def _kneser_ney_sql() -> str:
    """Twin of corpus_stats.kneser_ney_topk (D = 3/4 as in the Spark
    default): all stats integer-exact, one double division per row of
    exactly-representable BIGINTs (num ≤ ~1e12, den ≤ ~1e13 < 2^53)."""
    from metis_spark.driver.common import KN_TOPK

    return (
        f"WITH {_TOKS_SQL},\n"
        "knp AS MATERIALIZED (SELECT unnest(list_transform(range(1, len(t)), "
        "i -> t[i] || ' ' || t[i+1])) AS bg FROM toks WHERE len(t) >= 2),\n"
        "knc AS MATERIALIZED (SELECT split_part(bg, ' ', 1) AS w1, "
        "split_part(bg, ' ', 2) AS w2, COUNT(*)::BIGINT AS c12 "
        "FROM knp GROUP BY bg),\n"
        "knx AS (SELECT w1, SUM(c12)::BIGINT AS c1, COUNT(*)::BIGINT AS n_fwd "
        "FROM knc GROUP BY w1),\n"
        "knb AS (SELECT w2, COUNT(*)::BIGINT AS n_bwd FROM knc GROUP BY w2),\n"
        "knt AS (SELECT COUNT(*)::BIGINT AS b FROM knc),\n"
        "kns AS (SELECT c.w1, c.w2, c.c12, x.c1, x.n_fwd, b.n_bwd, "
        "ROUND(c.c12::DOUBLE / x.c1, 6) AS p_mle, "
        "ROUND((GREATEST(4 * c.c12 - 3, 0)::BIGINT * (SELECT b FROM knt) "
        "+ 3 * x.n_fwd * b.n_bwd)::DOUBLE "
        "/ (4 * x.c1 * (SELECT b FROM knt))::DOUBLE, 6) AS p_kn "
        "FROM knc c JOIN knx x ON c.w1 = x.w1 JOIN knb b ON c.w2 = b.w2)\n"
        "SELECT w1, w2, c12, c1, n_fwd, n_bwd, p_mle, p_kn, "
        "ROW_NUMBER() OVER (ORDER BY c12 DESC, w1 ASC, w2 ASC)::BIGINT AS rn "
        f"FROM kns ORDER BY c12 DESC, w1 ASC, w2 ASC LIMIT {KN_TOPK}"
    )

def _dag_critical_path_sql() -> str:
    """Twin of plans/scc.py:condensation_critical_path on the _scc_sql
    spine: ef fixpoint unrolled DAG_ROUNDS+1 rounds, backtrace unrolled
    DAG_ROUNDS+1 hops (each LIMIT 1 by ef desc, c asc), path re-ranked
    by ef asc — strictly increasing along the path, so the order is
    total and engine-replayable."""
    scc = _scc_sql()
    head, union = scc.rsplit("\n", 1)
    rounds = DAG_ROUNDS + 1
    ctes = [head[len("WITH "):]]
    ctes.append(f"sccall AS MATERIALIZED ({union})")
    ctes.append(
        "cedges AS MATERIALIZED (SELECT DISTINCT a.scc AS cs, b.scc AS cd "
        "FROM edges e JOIN sccall a ON e.src = a.id JOIN sccall b ON e.dst = b.id "
        "WHERE a.scc <> b.scc)"
    )
    ctes.append(
        "csz AS MATERIALIZED (SELECT scc AS c, COUNT(*)::BIGINT AS sz "
        "FROM sccall GROUP BY scc)"
    )
    ctes.append("cef0 AS (SELECT c, sz, sz AS ef FROM csz)")
    for r in range(1, rounds + 1):
        ctes.append(
            f"cef{r} AS MATERIALIZED (SELECT s.c, s.sz, "
            f"(s.sz + COALESCE(m.pef, 0))::BIGINT AS ef "
            f"FROM csz s LEFT JOIN (SELECT e.cd AS c, MAX(l.ef) AS pef "
            f"FROM cedges e JOIN cef{r-1} l ON e.cs = l.c GROUP BY e.cd) m "
            f"ON s.c = m.c)"
        )
    last = f"cef{rounds}"
    ctes.append(
        f"cbt0 AS (SELECT c, sz, ef FROM {last} ORDER BY ef DESC, c ASC LIMIT 1)"
    )
    for s in range(1, rounds + 1):
        ctes.append(
            f"cbt{s} AS (SELECT f.c, f.sz, f.ef FROM cbt{s-1} p "
            f"JOIN cedges e ON e.cd = p.c JOIN {last} f ON e.cs = f.c "
            f"ORDER BY f.ef DESC, f.c ASC LIMIT 1)"
        )
    union_bt = " UNION ALL ".join(f"SELECT * FROM cbt{s}" for s in range(rounds + 1))
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT ROW_NUMBER() OVER (ORDER BY ef ASC)::BIGINT AS step, "
        "c AS scc, sz AS scc_size, ef FROM (" + union_bt + ") ORDER BY step"
    )

def _directed_assortativity_sql() -> str:
    """Twin of plans/metrics.py:directed_assortativity — HUGEINT moment
    sums, identical IEEE-double Pearson expression per mode."""
    modes = [
        ("out_in", "so", "tin", "x_oi"),
        ("out_out", "so", "tout", "x_oo"),
        ("in_in", "si", "tin", "x_ii"),
        ("in_out", "si", "tout", "x_io"),
    ]
    rows = " UNION ALL ".join(
        f"SELECT '{name}' AS mode, n::BIGINT AS n_edges, "
        f"ROUND((n * {xs} - s_{sx} * s_{sy})::DOUBLE "
        f"/ sqrt(((n * q_{sx} - s_{sx} * s_{sx}) "
        f"* (n * q_{sy} - s_{sy} * s_{sy}))::DOUBLE), 6) AS r FROM dm"
        for name, sx, sy, xs in modes
    )
    return (
        f"WITH {_EDGES_SQL.strip()},\n"
        "dout AS (SELECT src AS id, COUNT(*)::BIGINT AS od FROM edges GROUP BY src),\n"
        "din AS (SELECT dst AS id, COUNT(*)::BIGINT AS idg FROM edges GROUP BY dst),\n"
        "ddeg AS MATERIALIZED (SELECT v.id, COALESCE(o.od, 0)::BIGINT AS od, "
        "COALESCE(i.idg, 0)::BIGINT AS idg "
        "FROM verts v LEFT JOIN dout o ON v.id = o.id LEFT JOIN din i ON v.id = i.id),\n"
        "dj AS MATERIALIZED (SELECT s.od AS so, s.idg AS si, t.od AS tout, t.idg AS tin "
        "FROM edges e JOIN ddeg s ON e.src = s.id JOIN ddeg t ON e.dst = t.id),\n"
        "dm AS MATERIALIZED (SELECT COUNT(*)::BIGINT AS n, "
        "SUM(so::HUGEINT) AS s_so, SUM(si::HUGEINT) AS s_si, "
        "SUM(tout::HUGEINT) AS s_tout, SUM(tin::HUGEINT) AS s_tin, "
        "SUM((so * so)::HUGEINT) AS q_so, SUM((si * si)::HUGEINT) AS q_si, "
        "SUM((tout * tout)::HUGEINT) AS q_tout, SUM((tin * tin)::HUGEINT) AS q_tin, "
        "SUM((so * tin)::HUGEINT) AS x_oi, SUM((so * tout)::HUGEINT) AS x_oo, "
        "SUM((si * tin)::HUGEINT) AS x_ii, SUM((si * tout)::HUGEINT) AS x_io FROM dj)\n"
        + rows
    )


_WALK_ENTROPY_SQL = (
    f"WITH {_EDGES_SPARSE_SQL.strip()},\n"
    "wdeg AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src),\n"
    "wdl AS (SELECT deg, COUNT(*)::BIGINT AS cnt FROM wdeg GROUP BY deg),\n"
    "wsc AS (SELECT deg, cnt, CAST(ROUND(ln(deg::DOUBLE) * 1000000.0) AS BIGINT) "
    "AS ln_micro FROM wdl),\n"
    "wag AS (SELECT SUM(cnt)::BIGINT AS n_vertices, (SUM(deg * cnt) // 2)::BIGINT AS m, "
    "SUM(cnt * deg * ln_micro)::BIGINT AS entropy_micro_sum FROM wsc)\n"
    "SELECT n_vertices, m AS n_und_edges, entropy_micro_sum, "
    "ROUND(entropy_micro_sum / (2 * m) / 1000000.0, 6) AS entropy_rate FROM wag"
)


def _spectral_moments_sql() -> str:
    """Twin of plans/metrics.py:spectral_moments on the sparse graph:
    identical hub-capped wedge set for the Σ n_ij² term, the
    once-per-triangle ordered join for trace(A³)."""
    return (
        f"WITH {_EDGES_SPARSE_SQL.strip()},\n"
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS deg "
        "FROM und GROUP BY src),\n"
        f"{_WEDGE_SQL},\n"
        "smc AS (SELECT u, v, COUNT(*)::BIGINT AS c FROM wedge GROUP BY u, v),\n"
        "smp AS (SELECT COALESCE(SUM((c * c)::HUGEINT), 0)::BIGINT AS sum_c2 FROM smc),\n"
        "smd AS (SELECT COUNT(*)::BIGINT AS n_vertices, (SUM(deg) // 2)::BIGINT AS m, "
        "SUM((deg * deg)::HUGEINT)::BIGINT AS sum_deg2 FROM deg),\n"
        "smu AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM edges),\n"
        "smt AS (SELECT COUNT(*)::BIGINT AS t FROM smu e1 "
        "JOIN smu e2 ON e1.b = e2.a JOIN smu e3 ON e3.a = e1.a AND e3.b = e2.b)\n"
        "SELECT d.n_vertices, d.m AS n_edges, (2 * d.m)::BIGINT AS closed_walks_2, "
        "(6 * t.t)::BIGINT AS closed_walks_3, "
        "(d.sum_deg2 + 2 * p.sum_c2)::BIGINT AS closed_walks_4 "
        "FROM smd d, smp p, smt t"
    )

def _textrank_sql() -> str:
    """Twin of corpus_stats.textrank_top_sentences: identical sentence
    numbering over the raw `[.!?]+` split, identical integer PageRank
    recurrence per doc; per-round state MATERIALIZED."""
    from metis_spark.driver.common import TR_ITERS, TR_MIN_SHARED, TR_SCALE

    ctes = [
        "trsl AS (SELECT doc_id, string_split_regex(text, '[.!?]+') AS sl "
        "FROM documents)",
        "trse AS (SELECT doc_id, unnest(list_transform(range(1, len(sl) + 1), "
        "i -> struct_pack(sidx := i - 1, s := sl[i]))) AS u FROM trsl)",
        "trto AS (SELECT doc_id, u.sidx::BIGINT AS sidx, "
        "list_filter(string_split_regex(lower(u.s), '[^a-z0-9]+'), x -> x <> '') AS t "
        "FROM trse)",
        "trv AS MATERIALIZED (SELECT doc_id, sidx FROM trto WHERE len(t) >= 1)",
        "trst AS MATERIALIZED (SELECT DISTINCT doc_id, sidx, tok FROM "
        "(SELECT doc_id, sidx, unnest(t) AS tok FROM trto WHERE len(t) >= 1))",
        "trh AS MATERIALIZED (SELECT a.doc_id, a.sidx AS u, b.sidx AS v, "
        "COUNT(*)::BIGINT AS w FROM trst a JOIN trst b "
        "ON a.doc_id = b.doc_id AND a.tok = b.tok AND a.sidx < b.sidx "
        f"GROUP BY a.doc_id, a.sidx, b.sidx HAVING COUNT(*) >= {TR_MIN_SHARED})",
        "tru AS MATERIALIZED (SELECT doc_id, u, v, w FROM trh "
        "UNION ALL SELECT doc_id, v, u, w FROM trh)",
        "trwu AS MATERIALIZED (SELECT doc_id, u, SUM(w)::BIGINT AS wu "
        "FROM tru GROUP BY doc_id, u)",
        f"trr0 AS MATERIALIZED (SELECT doc_id, sidx, {TR_SCALE}::BIGINT AS r FROM trv)",
    ]
    for i in range(1, TR_ITERS + 1):
        pv = i - 1
        ctes.append(
            f"trg{i} AS (SELECT e.doc_id, e.v AS sidx, "
            f"SUM((r.r * e.w) // u.wu)::BIGINT AS g "
            f"FROM tru e JOIN trr{pv} r ON e.doc_id = r.doc_id AND e.u = r.sidx "
            f"JOIN trwu u ON e.doc_id = u.doc_id AND e.u = u.u "
            f"GROUP BY e.doc_id, e.v)"
        )
        ctes.append(
            f"trr{i} AS MATERIALIZED (SELECT v.doc_id, v.sidx, "
            f"((3 * {TR_SCALE}::BIGINT + 17 * COALESCE(g.g, 0)) // 20)::BIGINT AS r "
            f"FROM trv v LEFT JOIN trg{i} g "
            f"ON v.doc_id = g.doc_id AND v.sidx = g.sidx)"
        )
    return (
        "WITH " + ",\n".join(ctes) + ",\n"
        "trn AS (SELECT doc_id, COUNT(*)::BIGINT AS n_sentences FROM trv GROUP BY doc_id),\n"
        f"trb AS (SELECT doc_id, sidx, r FROM (SELECT doc_id, sidx, r, "
        "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY r DESC, sidx ASC) AS rn "
        f"FROM trr{TR_ITERS}) WHERE rn = 1)\n"
        "SELECT b.doc_id, b.sidx AS best_sidx, b.r AS score_scaled, n.n_sentences "
        "FROM trb b JOIN trn n ON b.doc_id = n.doc_id"
    )

def _kleinberg_sql() -> str:
    """Twin of operators/bursts.py:kleinberg_bursts — per-user constants
    quantized by the identical double expressions, then the integer
    Viterbi replayed as a linear recursive CTE with the same pinned
    tie-breaks (arrive-at-0 prefers from-0 on ties; arrive-at-1 prefers
    staying). SCALE literals cast ::BIGINT (INT32 overflow trap)."""
    from metis_spark.operators.bursts import INF, SCALE

    return (
        "WITH RECURSIVE "
        "kbe AS (SELECT user_id, floor(epoch(ts))::BIGINT AS es FROM events),\n"
        "kbr AS (SELECT user_id, es, "
        "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY es) AS rid, "
        "LEAD(es) OVER (PARTITION BY user_id ORDER BY es) AS nxt FROM kbe),\n"
        "kuc AS MATERIALIZED (SELECT user_id, COUNT(*)::BIGINT AS n, "
        "(MAX(es) - MIN(es))::BIGINT AS t_span, "
        "CAST(ROUND(1000000.0 * (MAX(es) - MIN(es)) "
        "* ln((COUNT(*) - 1)::DOUBLE / (MAX(es) - MIN(es)))) AS BIGINT) AS l0, "
        "CAST(ROUND(1000000.0 * (MAX(es) - MIN(es)) "
        "* ln(2.0 * (COUNT(*) - 1) / (MAX(es) - MIN(es)))) AS BIGINT) AS l1, "
        "CAST(ROUND(1000000.0 * (MAX(es) - MIN(es)) "
        "* ln(COUNT(*)::DOUBLE)) AS BIGINT) AS tr "
        "FROM kbe GROUP BY user_id "
        "HAVING COUNT(*) >= 3 AND MAX(es) - MIN(es) >= 1),\n"
        "kgap AS MATERIALIZED (SELECT r.user_id, r.rid AS idx, "
        "(r.nxt - r.es)::BIGINT AS gap FROM kbr r "
        "JOIN kuc u ON r.user_id = u.user_id WHERE r.rid < u.n),\n"
        "kdp AS (\n"
        "  SELECT user_id, 0::BIGINT AS idx, 0::BIGINT AS c0, "
        f"{INF}::BIGINT AS c1, 0::BIGINT AS nb0, 0::BIGINT AS nb1, "
        "0::BIGINT AS kg0, 0::BIGINT AS kg1 FROM kuc\n"
        "  UNION ALL\n"
        "  SELECT d.user_id, d.idx + 1,\n"
        "    (CASE WHEN d.c0 <= d.c1 THEN d.c0 ELSE d.c1 END) "
        f"+ {SCALE}::BIGINT * (u.n - 1) * g.gap - u.l0,\n"
        "    (CASE WHEN d.c0 + u.tr < d.c1 THEN d.c0 + u.tr ELSE d.c1 END) "
        f"+ 2 * {SCALE}::BIGINT * (u.n - 1) * g.gap - u.l1,\n"
        "    CASE WHEN d.c0 <= d.c1 THEN d.nb0 ELSE d.nb1 END,\n"
        "    CASE WHEN d.c0 + u.tr < d.c1 THEN d.nb0 + 1 ELSE d.nb1 END,\n"
        "    CASE WHEN d.c0 <= d.c1 THEN d.kg0 ELSE d.kg1 END,\n"
        "    (CASE WHEN d.c0 + u.tr < d.c1 THEN d.kg0 ELSE d.kg1 END) + 1\n"
        "  FROM kdp d JOIN kuc u ON d.user_id = u.user_id\n"
        "  JOIN kgap g ON g.user_id = d.user_id AND g.idx = d.idx + 1\n"
        ")\n"
        "SELECT u.user_id, u.n AS n_events, u.t_span AS span_seconds, "
        "(CASE WHEN d.c0 <= d.c1 THEN d.nb0 ELSE d.nb1 END)::BIGINT AS n_bursts, "
        "(CASE WHEN d.c0 <= d.c1 THEN d.kg0 ELSE d.kg1 END)::BIGINT AS burst_gaps, "
        "LEAST(d.c0, d.c1)::BIGINT AS total_cost_scaled "
        "FROM kdp d JOIN kuc u ON d.user_id = u.user_id AND d.idx = u.n - 1"
    )

def _cdc_chunks_sql() -> str:
    """Twin of operators/dedup.py:cdc_chunk_dedup — identical 60-bit
    md5 anchor predicate, identical start/end slicing, identical
    min-length and top-k discipline."""
    from metis_spark.driver.common import CDC_DIV, CDC_MIN_LEN, CDC_TOPK

    return (
        "WITH cdb AS (SELECT doc_id, text, length(text) AS ln, "
        "list_filter(range(4, length(text) + 1), "
        f"i -> ('0x' || substr(md5(substr(text, i - 3, 4)), 1, 15))::BIGINT "
        f"% {CDC_DIV} = 0) AS bpos FROM documents),\n"
        "cds AS (SELECT doc_id, text, "
        "list_concat([1], list_transform(bpos, b -> b + 1)) AS starts, "
        "list_concat(bpos, [ln]) AS ends FROM cdb),\n"
        "cdc AS (SELECT doc_id, unnest(list_filter(list_transform("
        "range(1, len(starts) + 1), "
        "k -> substr(text, starts[k], ends[k] - starts[k] + 1)), "
        f"c -> length(c) >= {CDC_MIN_LEN})) AS chunk FROM cds),\n"
        "cdh AS MATERIALIZED (SELECT doc_id, md5(chunk) AS chunk_hash, "
        "length(chunk)::BIGINT AS clen FROM cdc),\n"
        "cda AS (SELECT chunk_hash, MAX(clen)::BIGINT AS chunk_len, "
        "COUNT(DISTINCT doc_id)::BIGINT AS n_docs, COUNT(*)::BIGINT AS n_occurrences "
        "FROM cdh GROUP BY chunk_hash HAVING COUNT(*) >= 2)\n"
        "SELECT chunk_hash, chunk_len, n_docs, n_occurrences, "
        "ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, chunk_hash ASC)::BIGINT AS rn "
        f"FROM cda ORDER BY n_occurrences DESC, chunk_hash ASC LIMIT {CDC_TOPK}"
    )

def _facility_location_sql() -> str:
    """Twin of similarity.facility_location_seeds — identical hash
    pool, one micro-quantized pool×N similarity table, k unrolled
    greedy rounds with MATERIALIZED state."""
    from metis_spark.driver.common import FL_K, FL_POOL

    ctes = [
        "flh AS MATERIALIZED (SELECT vec_id::BIGINT AS pid, embedding AS v, "
        "('0x' || substr(md5('fl' || vec_id::VARCHAR), 1, 15))::BIGINT AS h "
        "FROM embeddings)",
        "flc AS MATERIALIZED (SELECT pid AS cid, v AS cv FROM "
        "(SELECT pid, v, ROW_NUMBER() OVER (ORDER BY h ASC, pid ASC) AS hr FROM flh) "
        f"WHERE hr <= {FL_POOL})",
        "fls AS MATERIALIZED (SELECT p.pid, c.cid, "
        f"CAST(ROUND(({_cos_expr('p.v', 'c.cv')}) * 1000000.0) AS BIGINT) AS sim_micro "
        "FROM flh p CROSS JOIN flc c)",
        "flb0 AS MATERIALIZED (SELECT pid, 0::BIGINT AS b FROM flh)",
    ]
    for r in range(1, FL_K + 1):
        pv = r - 1
        prior = (
            " AND s.cid NOT IN (" + " UNION ALL ".join(
                f"SELECT cid FROM flsel{j}" for j in range(1, r)
            ) + ")"
        ) if r > 1 else ""
        ctes.append(
            f"flm{r} AS (SELECT s.cid, "
            "SUM(GREATEST(s.sim_micro - b.b, 0))::BIGINT AS marginal "
            f"FROM fls s JOIN flb{pv} b ON s.pid = b.pid WHERE TRUE{prior} "
            "GROUP BY s.cid)"
        )
        ctes.append(
            f"flsel{r} AS (SELECT {r}::BIGINT AS rn, cid, marginal "
            f"FROM flm{r} ORDER BY marginal DESC, cid ASC LIMIT 1)"
        )
        ctes.append(
            f"flb{r} AS MATERIALIZED (SELECT b.pid, "
            "GREATEST(b.b, COALESCE(s.sim_micro, 0))::BIGINT AS b "
            f"FROM flb{pv} b LEFT JOIN (SELECT pid, sim_micro FROM fls "
            f"WHERE cid = (SELECT cid FROM flsel{r})) s ON b.pid = s.pid)"
        )
    union = " UNION ALL ".join(f"SELECT * FROM flsel{r}" for r in range(1, FL_K + 1))
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT rn, cid AS vec_id, marginal AS marginal_micro, "
        "SUM(marginal) OVER (ORDER BY rn)::BIGINT AS coverage_micro "
        f"FROM ({union}) ORDER BY rn"
    )

_BLOCKING_QUALITY_SQL = (
    f"WITH {_MINHASH_CTES},\n"
    "bqs AS (SELECT doc_id, len(s) AS n FROM sh WHERE len(s) > 0),\n"
    "bqh AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared "
    "FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
    "GROUP BY 1, 2),\n"
    "bqt AS MATERIALIZED (SELECT doc_a, doc_b FROM bqh "
    "JOIN bqs sa ON sa.doc_id = doc_a JOIN bqs sb ON sb.doc_id = doc_b "
    "WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.8),\n"
    "bqn AS (SELECT COUNT(*)::BIGINT AS nd FROM bqs),\n"
    "bqnt AS (SELECT COUNT(*)::BIGINT AS n_truth FROM bqt),\n"
    "bqnc AS (SELECT COUNT(*)::BIGINT AS n_candidates FROM cand),\n"
    "bqnj AS (SELECT COUNT(*)::BIGINT AS n_caught FROM bqt t "
    "JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)\n"
    "SELECT nd AS n_docs, (nd * (nd - 1) // 2)::BIGINT AS total_pairs, "
    "n_candidates, n_truth, n_caught, "
    "ROUND(n_caught::DOUBLE / n_truth, 6) AS pair_completeness, "
    "ROUND(1.0 - n_candidates::DOUBLE / (nd * (nd - 1) // 2), 6) AS reduction_ratio, "
    "ROUND(n_caught::DOUBLE / n_candidates, 6) AS candidate_precision "
    "FROM bqn, bqnt, bqnc, bqnj"
)

_LSH_PLAN_SQL = (
    f"WITH {_TOKS_SQL}, {_SHINGLES_SQL},\n"
    "lpe AS (SELECT doc_id, unnest(s) AS shingle FROM sh),\n"
    "lps AS (SELECT doc_id, len(s) AS n FROM sh WHERE len(s) > 0),\n"
    "lph AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared "
    "FROM lpe a JOIN lpe b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
    "GROUP BY 1, 2),\n"
    "lpt AS MATERIALIZED (SELECT "
    "ROUND(shared::DOUBLE / (sa.n + sb.n - shared), 6) AS j FROM lph "
    "JOIN lps sa ON sa.doc_id = doc_a JOIN lps sb ON sb.doc_id = doc_b "
    "WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.8),\n"
    "lpg(rows_per_band, n_bands) AS (VALUES (1::BIGINT, 8::BIGINT), "
    "(2::BIGINT, 4::BIGINT), (4::BIGINT, 2::BIGINT), (8::BIGINT, 1::BIGINT)),\n"
    "lpsc AS (SELECT rows_per_band, n_bands, "
    "CAST(ROUND((1.0 - pow(1.0 - pow(j, rows_per_band), n_bands)) * 1000000.0) "
    "AS BIGINT) AS p_micro FROM lpt, lpg)\n"
    "SELECT rows_per_band, n_bands, "
    "ROUND(pow(1.0 - pow(0.5, 1.0 / n_bands), 1.0 / rows_per_band), 6) AS s50, "
    "ROUND(SUM(p_micro)::BIGINT / COUNT(*)::BIGINT / 1000000.0, 6) AS expected_recall, "
    "COUNT(*)::BIGINT AS n_truth_pairs, "
    "(rows_per_band = 2) AS is_shipped "
    "FROM lpsc GROUP BY rows_per_band, n_bands"
)

_SKEW_SALT_SQL = (
    f"WITH {_EDGES_SQL.strip()},\n"
    "ssk AS MATERIALIZED (SELECT src AS k, COUNT(*)::BIGINT AS c "
    "FROM edges GROUP BY src),\n"
    "ssh AS (SELECT c, COUNT(*)::BIGINT AS freq FROM ssk GROUP BY c),\n"
    "sshc AS (SELECT c, freq, SUM(freq) OVER (ORDER BY c ASC "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum FROM ssh),\n"
    "sss AS (SELECT SUM(freq)::BIGINT AS n_keys, SUM(c * freq)::BIGINT AS m FROM ssh),\n"
    "sst AS (SELECT k AS top_key, c AS top_count FROM ssk "
    "ORDER BY c DESC, k ASC LIMIT 1),\n"
    "ssm AS (SELECT MIN(c)::BIGINT AS median_count FROM sshc, sss "
    "WHERE cum >= (n_keys + 1) // 2),\n"
    "ssp AS (SELECT MIN(c)::BIGINT AS p99_count FROM sshc, sss "
    "WHERE cum >= (99 * n_keys + 99) // 100)\n"
    "SELECT n_keys, m AS n_edges, top_key, top_count, median_count, p99_count, "
    "((1000000 * top_count) // m)::BIGINT AS top_share_micro, "
    "((1000 * top_count * n_keys) // m)::BIGINT AS skew_ratio_milli, "
    "LEAST(32::BIGINT, GREATEST(1::BIGINT, "
    "(top_count * 32 + m - 1) // m))::BIGINT AS recommended_salt "
    "FROM sss, sst, ssm, ssp"
)

def _hk_sweep_sql() -> str:
    """Twin of plans/sweep.py:hk_sweep_cut — the unrolled integer
    heat-kernel chain over the symmetric sparse graph, s = hk // deg,
    then the identical sweep tail as _ppr_sweep_sql."""
    from metis_spark.driver.common import (
        HK_SCALE, HK_T_DEN, HK_T_NUM, HK_TERMS,
    )

    ctes = [
        _EDGES_SPARSE_SQL.strip(),
        "hsv AS MATERIALIZED (SELECT DISTINCT src AS id FROM und)",
        "hsd AS MATERIALIZED (SELECT src, COUNT(*)::BIGINT AS deg "
        "FROM und GROUP BY src)",
        f"hsx0 AS MATERIALIZED (SELECT id, CASE WHEN id % {SWEEP_SEED_MOD} = 0 "
        f"THEN {HK_SCALE} ELSE 0 END::BIGINT AS x FROM hsv)",
        "hsh0 AS (SELECT id, x AS hk FROM hsx0)",
    ]
    for k in range(1, HK_TERMS + 1):
        pv = k - 1
        ctes.append(
            f"hss{k} AS (SELECT x.id AS src, (x.x // o.deg)::BIGINT AS share "
            f"FROM hsx{pv} x JOIN hsd o ON x.id = o.src)"
        )
        ctes.append(
            f"hsg{k} AS (SELECT u.dst AS id, SUM(s.share)::BIGINT AS g "
            f"FROM und u JOIN hss{k} s ON u.src = s.src GROUP BY u.dst)"
        )
        ctes.append(
            f"hsx{k} AS MATERIALIZED (SELECT v.id, (({HK_T_NUM} * COALESCE(g.g, 0)) "
            f"// {HK_T_DEN * k})::BIGINT AS x "
            f"FROM hsv v LEFT JOIN hsg{k} g ON v.id = g.id)"
        )
        ctes.append(
            f"hsh{k} AS MATERIALIZED (SELECT h.id, (h.hk + COALESCE(x.x, 0))::BIGINT AS hk "
            f"FROM hsh{pv} h LEFT JOIN hsx{k} x ON h.id = x.id)"
        )
    ctes += [
        f"hsc AS (SELECT h.id, d.deg, (h.hk // d.deg)::BIGINT AS s "
        f"FROM hsh{HK_TERMS} h JOIN hsd d ON h.id = d.src)",
        "htk AS MATERIALIZED (SELECT id, deg, k FROM (SELECT id, deg, "
        "ROW_NUMBER() OVER (ORDER BY s DESC, id ASC)::BIGINT AS k FROM hsc) "
        f"WHERE k <= {SWEEP_L})",
        "hm2 AS (SELECT COUNT(*)::BIGINT AS c2 FROM und)",
        "huu AS (SELECT src AS a, dst AS b FROM und WHERE src < dst)",
        f"her AS (SELECT LEAST(COALESCE(ta.k, {SWEEP_L + 1}), COALESCE(tb.k, {SWEEP_L + 1})) AS lo, "
        f"GREATEST(COALESCE(ta.k, {SWEEP_L + 1}), COALESCE(tb.k, {SWEEP_L + 1})) AS hi "
        "FROM huu LEFT JOIN htk ta ON huu.a = ta.id LEFT JOIN htk tb ON huu.b = tb.id)",
        f"hst AS (SELECT lo AS k, COUNT(*)::BIGINT AS n_open FROM her WHERE lo <= {SWEEP_L} GROUP BY lo)",
        f"hen AS (SELECT hi AS k, COUNT(*)::BIGINT AS n_close FROM her WHERE hi <= {SWEEP_L} GROUP BY hi)",
        "hax AS (SELECT t.k, t.id, t.deg, COALESCE(hst.n_open, 0) AS o, "
        "COALESCE(hen.n_close, 0) AS c FROM htk t "
        "LEFT JOIN hst ON hst.k = t.k LEFT JOIN hen ON hen.k = t.k)",
        "hfin AS (SELECT k, id, deg, CAST(SUM(deg) OVER (ORDER BY k) AS BIGINT) AS vol, "
        "CAST(SUM(o - c) OVER (ORDER BY k) AS BIGINT) AS cut FROM hax)",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT k, id, deg, vol, cut, "
        "CASE WHEN LEAST(vol, (SELECT c2 FROM hm2) - vol) > 0 THEN "
        "ROUND(cut / LEAST(vol, (SELECT c2 FROM hm2) - vol), 6) END AS phi FROM hfin"
    )

_SCRIPT_HISTOGRAM_SQL = (
    "WITH shc AS (SELECT lang, length(text)::BIGINT AS total, "
    "len(regexp_extract_all(text, '[A-Za-z]'))::BIGINT AS alpha, "
    "len(regexp_extract_all(text, '[0-9]'))::BIGINT AS digit, "
    "len(regexp_extract_all(text, '\\s'))::BIGINT AS space, "
    "len(regexp_extract_all(text, '[^\\x00-\\x7f]'))::BIGINT AS nonascii FROM documents),\n"
    "sha AS (SELECT lang, COUNT(*)::BIGINT AS n_docs, SUM(total)::BIGINT AS n_chars, "
    "SUM(alpha)::BIGINT AS a, SUM(digit)::BIGINT AS d, SUM(space)::BIGINT AS s, "
    "SUM(nonascii)::BIGINT AS na FROM shc GROUP BY lang)\n"
    "SELECT lang, n_docs, n_chars, "
    "((1000000 * a) // n_chars)::BIGINT AS alpha_micro, "
    "((1000000 * d) // n_chars)::BIGINT AS digit_micro, "
    "((1000000 * s) // n_chars)::BIGINT AS space_micro, "
    "((1000000 * na) // n_chars)::BIGINT AS nonascii_micro, "
    "((1000000 * (n_chars - a - d - s - na)) // n_chars)::BIGINT AS other_micro "
    "FROM sha WHERE n_chars > 0"
)

_PACKAGE_INSTABILITY_SQL = (
    f"WITH {_EDGES_SQL.strip()},\n"
    "pie AS (SELECT src % 16 AS ps, dst % 16 AS pd FROM edges),\n"
    "piv AS (SELECT id % 16 AS package, COUNT(*)::BIGINT AS n_vertices "
    "FROM verts GROUP BY 1),\n"
    "pii AS (SELECT ps AS package, COUNT(*)::BIGINT AS internal_edges "
    "FROM pie WHERE ps = pd GROUP BY ps),\n"
    "pic AS (SELECT ps AS package, COUNT(*)::BIGINT AS ce "
    "FROM pie WHERE ps <> pd GROUP BY ps),\n"
    "pia AS (SELECT pd AS package, COUNT(*)::BIGINT AS ca "
    "FROM pie WHERE ps <> pd GROUP BY pd)\n"
    "SELECT v.package, v.n_vertices, "
    "COALESCE(i.internal_edges, 0)::BIGINT AS internal_edges, "
    "COALESCE(a.ca, 0)::BIGINT AS ca, COALESCE(c.ce, 0)::BIGINT AS ce, "
    "CASE WHEN COALESCE(a.ca, 0) + COALESCE(c.ce, 0) > 0 THEN "
    "(1000000 * COALESCE(c.ce, 0)) // (COALESCE(a.ca, 0) + COALESCE(c.ce, 0)) "
    "END::BIGINT AS instability_micro, "
    "CASE WHEN COALESCE(i.internal_edges, 0) + COALESCE(a.ca, 0) + COALESCE(c.ce, 0) > 0 THEN "
    "(1000000 * (COALESCE(a.ca, 0) + COALESCE(c.ce, 0))) "
    "// (COALESCE(i.internal_edges, 0) + COALESCE(a.ca, 0) + COALESCE(c.ce, 0)) "
    "END::BIGINT AS fan_ratio_micro "
    "FROM piv v LEFT JOIN pii i ON v.package = i.package "
    "LEFT JOIN pic c ON v.package = c.package "
    "LEFT JOIN pia a ON v.package = a.package"
)

_TABLE_PROFILE_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS column, COUNT(*)::BIGINT AS n_rows, "
    f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null, "
    f"COUNT(DISTINCT {c})::BIGINT AS n_distinct FROM orders"
    for c in (
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    )
)

def _sssp_parents_sql() -> str:
    """Twin of _q_sssp_parents: the _sssp_sql distance chain + the
    min-id shortest-path-tree parent per reached vertex."""
    base = _sssp_sql()
    head, final = base.rsplit("\n", 1)
    last = final.split("FROM ")[1].strip()
    return (
        head + ",\n"
        f"sspd AS MATERIALIZED (SELECT id, dist FROM {last}),\n"
        "sspp AS (SELECT e.dst AS id, MIN(e.src)::BIGINT AS parent "
        "FROM edges e JOIN sspd a ON e.src = a.id JOIN sspd b ON e.dst = b.id "
        "WHERE a.dist + 1 = b.dist GROUP BY e.dst)\n"
        "SELECT d.id, d.dist, p.parent FROM sspd d LEFT JOIN sspp p ON d.id = p.id"
    )


def _cyclomatic_sql() -> str:
    """Twin of _q_cyclomatic_number on the _cc_sql component chain."""
    return (
        f"WITH ccq AS MATERIALIZED ({_cc_sql()}),\n"
        f"{_EDGES_SQL.strip()},\n"
        "cyn AS (SELECT COUNT(*)::BIGINT AS n_vertices, "
        "COUNT(DISTINCT component)::BIGINT AS n_components FROM ccq),\n"
        "cym AS (SELECT (COUNT(*) // 2)::BIGINT AS n_und_edges FROM und)\n"
        "SELECT n_vertices, n_und_edges, n_components, "
        "(n_und_edges - n_vertices + n_components)::BIGINT AS cycle_rank "
        "FROM cyn, cym"
    )

def _code_switching_sql() -> str:
    """Twin of corpus_stats.code_switching_score — identical sentence
    split, identical integer marker-hit argmax (alphabetical ties,
    'und' on zero), identical (n·L(n) − Σ c·L(c)) // n entropy."""
    from metis_spark.driver.common import _LANG_MARKERS

    langs = sorted(_LANG_MARKERS)
    hit_cols = ", ".join(
        f"len(regexp_extract_all(lower(s), '{_LANG_MARKERS[lg]}'))::BIGINT AS h_{lg}"
        for lg in langs
    )
    m_expr = "GREATEST(" + ", ".join(f"h_{lg}" for lg in langs) + ")"
    lang_case = "CASE WHEN " + m_expr + " = 0 THEN 'und' " + " ".join(
        f"WHEN h_{lg} = {m_expr} THEN '{lg}'" for lg in langs
    ) + " END"
    return (
        "WITH csx AS (SELECT doc_id, unnest(string_split_regex(text, '[.!?]+')) AS s "
        "FROM documents),\n"
        f"csh AS (SELECT doc_id, {hit_cols} FROM csx WHERE trim(s) <> ''),\n"
        f"csl AS (SELECT doc_id, {lang_case} AS lang FROM csh),\n"
        "csc AS MATERIALIZED (SELECT doc_id, lang, COUNT(*)::BIGINT AS c "
        "FROM csl GROUP BY doc_id, lang),\n"
        "csa AS (SELECT doc_id, SUM(c)::BIGINT AS n_sents, COUNT(*)::BIGINT AS n_langs, "
        "MAX(c)::BIGINT AS cmax, "
        "SUM(c * CAST(ROUND(ln(c::DOUBLE) * 1000000.0) AS BIGINT))::BIGINT AS clnc "
        "FROM csc GROUP BY doc_id),\n"
        "csm AS (SELECT doc_id, lang AS majority_lang FROM (SELECT doc_id, lang, "
        "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, lang ASC) AS rn "
        "FROM csc) WHERE rn = 1)\n"
        "SELECT a.doc_id, a.n_sents, a.n_langs, m.majority_lang, "
        "((1000000 * a.cmax) // a.n_sents)::BIGINT AS majority_micro, "
        "((a.n_sents * CAST(ROUND(ln(a.n_sents::DOUBLE) * 1000000.0) AS BIGINT) "
        "- a.clnc) // a.n_sents)::BIGINT AS switch_entropy_micro "
        "FROM csa a JOIN csm m ON a.doc_id = m.doc_id"
    )

_RRF_FUSION_SQL = (
    f"WITH {_EDGES_SQL.strip()},\n"
    "rfd AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src),\n"
    "rfdr AS (SELECT id, rd FROM (SELECT id, "
    "ROW_NUMBER() OVER (ORDER BY deg DESC, id ASC)::BIGINT AS rd FROM rfd) "
    "WHERE rd <= 64),\n"
    "rfu AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges),\n"
    "rft AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM rfu e1 "
    "JOIN rfu e2 ON e1.b = e2.a JOIN rfu e3 ON e3.a = e1.a AND e3.b = e2.b),\n"
    "rfm AS (SELECT x AS id FROM rft UNION ALL SELECT y FROM rft "
    "UNION ALL SELECT z FROM rft),\n"
    "rfc AS (SELECT v.id, COALESCE(c.n, 0)::BIGINT AS triangles FROM verts v "
    "LEFT JOIN (SELECT id, COUNT(*)::BIGINT AS n FROM rfm GROUP BY id) c "
    "ON v.id = c.id),\n"
    "rftr AS (SELECT id, rt FROM (SELECT id, "
    "ROW_NUMBER() OVER (ORDER BY triangles DESC, id ASC)::BIGINT AS rt FROM rfc) "
    "WHERE rt <= 64),\n"
    "rff AS (SELECT COALESCE(d.id, t.id) AS id, "
    "(COALESCE(1000000 // (60 + d.rd), 0) + COALESCE(1000000 // (60 + t.rt), 0))"
    "::BIGINT AS rrf_micro FROM rfdr d FULL OUTER JOIN rftr t ON d.id = t.id)\n"
    "SELECT id, rrf_micro, "
    "ROW_NUMBER() OVER (ORDER BY rrf_micro DESC, id ASC)::BIGINT AS rn "
    "FROM rff ORDER BY rrf_micro DESC, id ASC LIMIT 20"
)

_PERSISTENT_HH_SQL = (
    "WITH phw AS (SELECT user_id, "
    "(floor(epoch(ts))::BIGINT // 3600)::BIGINT AS w FROM events),\n"
    "phc AS (SELECT user_id, w, COUNT(*)::BIGINT AS c FROM phw "
    "GROUP BY user_id, w HAVING COUNT(*) >= 3)\n"
    "SELECT user_id, COUNT(*)::BIGINT AS n_heavy_windows, "
    "SUM(c)::BIGINT AS events_in_heavy, MAX(c)::BIGINT AS peak_window "
    "FROM phc GROUP BY user_id HAVING COUNT(*) >= 2"
)

_NEG_SAMPLING_SQL = (
    "WITH nst AS (SELECT unnest(list_filter("
    "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term "
    "FROM documents),\n"
    "nsf AS (SELECT term, COUNT(*)::BIGINT AS c FROM nst GROUP BY term),\n"
    "nsh AS MATERIALIZED (SELECT term, c, rn FROM (SELECT term, c, "
    "ROW_NUMBER() OVER (ORDER BY c DESC, term ASC)::BIGINT AS rn FROM nsf) "
    "WHERE rn <= 50),\n"
    "nsw AS MATERIALIZED (SELECT term, c, rn, "
    "CAST(ROUND(pow(c::DOUBLE, 0.75) * 1000000.0) AS BIGINT) AS w_micro FROM nsh),\n"
    "nstot AS (SELECT SUM(w_micro)::BIGINT AS tw FROM nsw)\n"
    "SELECT term, c, rn, w_micro, "
    "((1000000 * w_micro) // (SELECT tw FROM nstot))::BIGINT AS share_micro FROM nsw"
)

_KAPLAN_MEIER_SQL = (
    "WITH kme AS (SELECT user_id, floor(epoch(ts))::BIGINT AS es FROM events),\n"
    "kmp AS (SELECT user_id, MIN(es)::BIGINT AS first_es, MAX(es)::BIGINT AS last_es "
    "FROM kme GROUP BY user_id),\n"
    "kmc AS (SELECT MAX(last_es)::BIGINT AS cut FROM kmp),\n"
    "kmb AS (SELECT user_id, ((last_es - first_es) // 86400)::BIGINT AS day, "
    "(last_es >= (SELECT cut FROM kmc) - 86400) AS censored FROM kmp),\n"
    "kmn AS (SELECT COUNT(*)::BIGINT AS n_total FROM kmb),\n"
    "kmh AS (SELECT day, SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END)::BIGINT AS d, "
    "COUNT(*)::BIGINT AS a FROM kmb GROUP BY day),\n"
    "kmr AS (SELECT day, d, ((SELECT n_total FROM kmn) - COALESCE(SUM(a) OVER "
    "(ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT "
    "AS n_risk FROM kmh),\n"
    "kmf AS (SELECT day, n_risk, d, ln(1.0 - d / n_risk) AS lnterm "
    "FROM kmr WHERE d > 0)\n"
    "SELECT day, n_risk, d AS n_events, "
    "ROUND(exp(SUM(lnterm) OVER (ORDER BY day "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS survival FROM kmf"
)

_USER_ENTROPY_SQL = (
    "WITH ube AS (SELECT user_id, event_type, COUNT(*)::BIGINT AS c "
    "FROM events GROUP BY user_id, event_type),\n"
    "uba AS (SELECT user_id, SUM(c)::BIGINT AS n_events, COUNT(*)::BIGINT AS n_types, "
    "SUM(c * CAST(ROUND(ln(c::DOUBLE) * 1000000.0) AS BIGINT))::BIGINT AS clnc "
    "FROM ube GROUP BY user_id)\n"
    "SELECT user_id, n_events, n_types, "
    "((n_events * CAST(ROUND(ln(n_events::DOUBLE) * 1000000.0) AS BIGINT) - clnc) "
    "// n_events)::BIGINT AS entropy_micro FROM uba"
)

_HASH_UNIFORMITY_SQL = (
    "WITH hub AS (SELECT ('0x' || substr(md5(text), 1, 15))::BIGINT % 64 AS bucket "
    "FROM documents),\n"
    "huo AS (SELECT bucket, COUNT(*)::BIGINT AS o FROM hub GROUP BY bucket),\n"
    "hua AS (SELECT SUM(o)::BIGINT AS n, COUNT(*)::BIGINT AS n_buckets_hit, "
    "MAX(o)::BIGINT AS max_bucket, MIN(o)::BIGINT AS min_bucket, "
    "SUM(o * o)::BIGINT AS so2 FROM huo)\n"
    "SELECT n, n_buckets_hit, max_bucket, min_bucket, "
    "((1000000 * (64 * so2 - n * n)) // n)::BIGINT AS chi2_micro FROM hua"
)

_QUALITY_DUP_CORR_SQL = (
    "WITH qdq AS (SELECT doc_id, md5(text) AS content_hash, "
    "CAST(ROUND((0.4 * least(n_tok / 100.0, 1.0) "
    "+ 0.3 * (1.0 - n_punct / greatest(n_chars2, 1.0)) "
    "+ 0.2 * least((n_stop / greatest(n_tok, 1.0)) * 5.0, 1.0) "
    "+ 0.1 * least(n_chars2 / 500.0, 1.0)) * 1000.0) AS BIGINT) AS qm "
    "FROM (SELECT doc_id, text, "
    "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::DOUBLE AS n_tok, "
    "length(text)::DOUBLE AS n_chars2, "
    "len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE AS n_punct, "
    "len(regexp_extract_all(lower(text), "
    "'\\b(the|a|and|of|to|in|is|for|on|with)\\b'))::DOUBLE AS n_stop "
    "FROM documents)),\n"
    "qdg AS (SELECT md5(text) AS content_hash, COUNT(*)::BIGINT AS dupc "
    "FROM documents GROUP BY md5(text)),\n"
    "qdj AS MATERIALIZED (SELECT q.qm, g.dupc FROM qdq q "
    "JOIN qdg g ON q.content_hash = g.content_hash),\n"
    "qdm AS (SELECT COUNT(*)::BIGINT AS n, SUM(qm::HUGEINT) AS sx, "
    "SUM(dupc::HUGEINT) AS sy, SUM((qm * qm)::HUGEINT) AS qx, "
    "SUM((dupc * dupc)::HUGEINT) AS qy, SUM((qm * dupc)::HUGEINT) AS xy, "
    "SUM(CASE WHEN dupc >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup, "
    "SUM(CASE WHEN dupc >= 2 THEN qm ELSE 0 END)::BIGINT AS q_dup, "
    "SUM(CASE WHEN dupc = 1 THEN qm ELSE 0 END)::BIGINT AS q_uni FROM qdj)\n"
    "SELECT n AS n_docs, n_dup AS n_dup_docs, "
    "CASE WHEN n_dup > 0 THEN (1000 * q_dup) // n_dup END::BIGINT AS mean_q_dup_micro, "
    "CASE WHEN n - n_dup > 0 THEN (1000 * q_uni) // (n - n_dup) END::BIGINT "
    "AS mean_q_unique_micro, "
    "CASE WHEN n * qx - sx * sx > 0 AND n * qy - sy * sy > 0 THEN "
    "ROUND((n * xy - sx * sy)::DOUBLE / sqrt(((n * qx - sx * sx) "
    "* (n * qy - sy * sy))::DOUBLE), 6) END AS pearson_r FROM qdm"
)

def _zorder_locality_sql() -> str:
    """Twin of _q_zorder_locality — identical 12-bit Morton interleave
    and block arithmetic."""
    z_terms = " + ".join(
        f"((((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1}))"
        for i in range(12)
    )
    return (
        f"WITH {_EDGES_SQL.strip()},\n"
        "zoe AS (SELECT src AS x, dst AS y FROM edges),\n"
        f"zob AS (SELECT x, y, (({z_terms}) >> 8)::BIGINT AS zblock, "
        "((((x << 12) + y)) >> 8)::BIGINT AS rblock FROM zoe),\n"
        "zbox AS (SELECT * FROM zob WHERE x >= 64 AND x < 128 "
        "AND y >= 64 AND y < 128)\n"
        "SELECT COUNT(*)::BIGINT AS rows_in_box, "
        "COUNT(DISTINCT zblock)::BIGINT AS zorder_blocks, "
        "COUNT(DISTINCT rblock)::BIGINT AS rowmajor_blocks, "
        "((1000000 * COUNT(DISTINCT zblock)) // COUNT(DISTINCT rblock))::BIGINT "
        "AS block_ratio_micro FROM zbox"
    )

_SPLIT_LEAKAGE_SQL = (
    f"WITH {_MINHASH_CTES},\n"
    "slsp AS (SELECT doc_id, CASE "
    "WHEN ('0x' || substr(md5('split' || doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 80 "
    "THEN 'train' "
    "WHEN ('0x' || substr(md5('split' || doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 90 "
    "THEN 'val' ELSE 'test' END AS split FROM documents),\n"
    "slj AS (SELECT LEAST(a.split, b.split) AS split_lo, "
    "GREATEST(a.split, b.split) AS split_hi FROM cand c "
    "JOIN slsp a ON c.doc_a = a.doc_id JOIN slsp b ON c.doc_b = b.doc_id)\n"
    "SELECT split_lo, split_hi, COUNT(*)::BIGINT AS n_candidate_pairs, "
    "(split_lo <> split_hi) AS crosses_boundary "
    "FROM slj GROUP BY split_lo, split_hi"
)

def _bloom_hash_sql(salt: str, key: str, m: int) -> str:
    """DuckDB twin of sampling.hash_bucket(key, salt) % m."""
    return f"(('0x' || substr(md5('{salt}' || {key}::VARCHAR), 1, 15))::BIGINT % {m})"

def _bloom_semijoin_sql(m: int = 4096, k: int = 3) -> str:
    """Twin of _q_bloom_semijoin — identical md5-60bit hash family, packed
    32-bit words, k broadcast probes, and fp accounting."""
    pos_union = " UNION ALL ".join(
        f"SELECT {_bloom_hash_sql(f'bloom{j}', 'key', m)} AS pos FROM blk"
        for j in range(k)
    )
    probe_pos = ", ".join(
        f"{_bloom_hash_sql(f'bloom{j}', 'o_custkey', m)} AS p{j}" for j in range(k)
    )
    joins = " ".join(
        f"LEFT JOIN blw w{j} ON w{j}.word_idx = p.p{j} // 32" for j in range(k)
    )
    passed = " AND ".join(
        f"(((COALESCE(w{j}.word, 0) >> CAST(p.p{j} % 32 AS INT)) & 1) = 1)"
        for j in range(k)
    )
    return (
        "WITH blk AS (SELECT DISTINCT c_custkey::BIGINT AS key FROM customer "
        "WHERE c_mktsegment = 'BUILDING'),\n"
        f"blp AS ({pos_union}),\n"
        "blw AS (SELECT pos // 32 AS word_idx, "
        "bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS word FROM blp GROUP BY 1),\n"
        f"blpr AS (SELECT o_orderkey, o_custkey::BIGINT AS o_custkey, {probe_pos} FROM orders),\n"
        f"blf AS (SELECT ({passed}) AS bloom_pass, "
        "(p.o_custkey IN (SELECT key FROM blk)) AS is_match "
        f"FROM blpr p {joins})\n"
        "SELECT COUNT(*)::BIGINT AS n_probe_rows, "
        "(SELECT COUNT(*) FROM blk)::BIGINT AS n_build_keys, "
        "SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END)::BIGINT AS n_pass_bloom, "
        "SUM(CASE WHEN is_match THEN 1 ELSE 0 END)::BIGINT AS n_true_match, "
        "SUM(CASE WHEN bloom_pass AND NOT is_match THEN 1 ELSE 0 END)::BIGINT AS n_false_positive, "
        "((1000000 * SUM(CASE WHEN bloom_pass AND NOT is_match THEN 1 ELSE 0 END)) "
        "// (COUNT(*) - SUM(CASE WHEN is_match THEN 1 ELSE 0 END)))::BIGINT AS fp_rate_micro "
        "FROM blf"
    )

_TRANSITIVE_DEPS_SQL = (
    f"WITH RECURSIVE {_EDGES_SQL.strip().rstrip(',')},\n"
    "tdroots AS (SELECT src AS root FROM ("
    "SELECT src, COUNT(*) AS c FROM edges GROUP BY src "
    "ORDER BY c DESC, src ASC LIMIT 12)),\n"
    "tdreach(root, v) AS ("
    "SELECT root, root FROM tdroots "
    "UNION "
    "SELECT r.root, e.dst FROM tdreach r JOIN edges e ON e.src = r.v)\n"
    "SELECT root, COUNT(*)::BIGINT AS n_reachable FROM tdreach GROUP BY root"
)

def _truncation_recall_sql(dims=(8, 16, 32), k=5) -> str:
    """Twin of _q_truncation_recall — identical round-before-rank cosine,
    (sim desc, id asc) tie-break, and prefix-slice semantics."""
    ctes = [
        "trq AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5)",
        "trex AS (SELECT qid, neighbor_id FROM ("
        "SELECT q.qid, c.vec_id AS neighbor_id, ROW_NUMBER() OVER ("
        f"PARTITION BY q.qid ORDER BY ROUND({_cos_expr('q.qv', 'c.embedding')}, 6) DESC, c.vec_id ASC) AS rn "
        f"FROM embeddings c CROSS JOIN trq q WHERE c.vec_id <> q.qid) WHERE rn <= {k})",
        "trne AS (SELECT qid, COUNT(*)::BIGINT AS n_exact FROM trex GROUP BY qid)",
    ]
    selects = []
    for d in dims:
        a, b = f"(q.qv[1:{d}])", f"(c.embedding[1:{d}])"
        ctes.append(
            f"trd{d} AS (SELECT qid, neighbor_id FROM ("
            "SELECT q.qid, c.vec_id AS neighbor_id, ROW_NUMBER() OVER ("
            f"PARTITION BY q.qid ORDER BY ROUND({_cos_expr(a, b)}, 6) DESC, c.vec_id ASC) AS rn "
            f"FROM embeddings c CROSS JOIN trq q WHERE c.vec_id <> q.qid) WHERE rn <= {k})"
        )
        ctes.append(
            f"trh{d} AS (SELECT e.qid, COUNT(*)::BIGINT AS n_overlap FROM trex e "
            f"JOIN trd{d} a ON a.qid = e.qid AND a.neighbor_id = e.neighbor_id GROUP BY e.qid)"
        )
        selects.append(
            f"SELECT {d}::BIGINT AS dim, n.qid AS query_id, n.n_exact, "
            f"COALESCE(h.n_overlap, 0)::BIGINT AS n_overlap, "
            f"ROUND(COALESCE(h.n_overlap, 0) / n.n_exact::DOUBLE, 6) AS recall "
            f"FROM trne n LEFT JOIN trh{d} h ON h.qid = n.qid"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + " UNION ALL ".join(selects)

_INFLUENCE_SPREAD_SQL = (
    f"WITH RECURSIVE {_EDGES_SQL.strip().rstrip(',')},\n"
    "icseed AS (SELECT src AS seed FROM ("
    "SELECT src, COUNT(*) AS c FROM edges GROUP BY src "
    "ORDER BY c DESC, src ASC LIMIT 4)),\n"
    "icreach(t, v) AS ("
    "SELECT r.t, s.seed FROM range(48) r(t) CROSS JOIN icseed s "
    "UNION "
    "SELECT r.t, e.dst FROM icreach r JOIN edges e ON e.src = r.v "
    "WHERE ('0x' || substr(md5('ic' || r.t::VARCHAR || '_' || "
    "e.src::VARCHAR || '_' || e.dst::VARCHAR), 1, 15))::BIGINT % 100 < 20)\n"
    "SELECT t::BIGINT AS trial, COUNT(*)::BIGINT AS n_reached "
    "FROM icreach GROUP BY t"
)

_K_ANONYMITY_SQL = (
    "WITH kacls AS (SELECT lang, source, n_chars // 500 AS len_bucket, "
    "COUNT(*)::BIGINT AS class_size FROM documents GROUP BY 1, 2, 3),\n"
    "kat AS (SELECT unnest([2, 5, 10])::BIGINT AS k_threshold)\n"
    "SELECT k_threshold, COUNT(*)::BIGINT AS n_classes, "
    "SUM(CASE WHEN class_size < k_threshold THEN 1 ELSE 0 END)::BIGINT AS n_classes_below_k, "
    "SUM(CASE WHEN class_size < k_threshold THEN class_size ELSE 0 END)::BIGINT AS n_rows_at_risk "
    "FROM kacls CROSS JOIN kat GROUP BY k_threshold"
)

def _ris_seeds_sql(R: int = 48, K: int = 3, P: int = 10) -> str:
    """Twin of _q_ris_seeds — same hash-chosen roots, live-edge RR sets
    on reversed edges, and unrolled greedy max-coverage."""
    ctes = [
        f"rrt AS (SELECT unnest(range({R}))::BIGINT AS t)",
        "rrroot AS (SELECT t, id AS v FROM ("
        "SELECT rrt.t, verts.id, ROW_NUMBER() OVER (PARTITION BY rrt.t ORDER BY "
        "('0x' || substr(md5('rrroot' || rrt.t::VARCHAR || '_' || verts.id::VARCHAR), 1, 15))::BIGINT ASC, "
        "verts.id ASC) AS rn FROM rrt CROSS JOIN verts) WHERE rn = 1)",
        "rrrev AS (SELECT dst AS src, src AS dst FROM edges)",
        "rr(t, v) AS (SELECT t, v FROM rrroot UNION "
        "SELECT r.t, e.dst FROM rr r JOIN rrrev e ON e.src = r.v "
        "WHERE ('0x' || substr(md5('rr' || r.t::VARCHAR || '_' || e.src::VARCHAR || '_' || e.dst::VARCHAR), 1, 15))::BIGINT "
        f"% 100 < {P})",
    ]
    prev = "rr"
    selects = []
    cum_terms = []
    for i in range(1, K + 1):
        ctes.append(
            f"rg{i} AS (SELECT v, COUNT(*) AS c FROM {prev} GROUP BY v)"
        )
        ctes.append(f"rp{i} AS (SELECT v FROM rg{i} ORDER BY c DESC, v ASC LIMIT 1)")
        ctes.append(
            f"rc{i} AS (SELECT DISTINCT t FROM {prev} WHERE v = (SELECT v FROM rp{i}))"
        )
        cum_terms.append(f"(SELECT COUNT(*) FROM rc{i})")
        cum = " + ".join(cum_terms)
        selects.append(
            f"SELECT {i}::BIGINT AS round, (SELECT v FROM rp{i}) AS seed, "
            f"(SELECT COUNT(*) FROM rc{i})::BIGINT AS marginal_covered, "
            f"({cum})::BIGINT AS cum_covered "
            f"WHERE EXISTS (SELECT 1 FROM rp{i})"
        )
        nxt = f"rr{i + 1}"
        ctes.append(
            f"{nxt} AS (SELECT * FROM {prev} WHERE t NOT IN (SELECT t FROM rc{i}))"
        )
        prev = nxt
    return (
        f"WITH RECURSIVE {_EDGES_SQL.strip().rstrip(',')},\n"
        + ",\n".join(ctes)
        + "\n"
        + " UNION ALL ".join(selects)
    )


def _kdegree_anonymity_sql() -> str:
    """Twin of _q_kdegree_anonymity: naive rank-window replay of the
    blocked Liu–Terzi grouping (the engine computes the same totals in
    closed form from the degree histogram — cost is tie-independent, so
    the arbitrary tie-break inside equal degrees cannot diverge)."""
    return (
        f"WITH {_EDGES_SPARSE_SQL.strip()},\n"
        "kdeg AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src),\n"
        "kdtot AS (SELECT COUNT(*)::BIGINT AS n, SUM(deg)::BIGINT AS sum_deg FROM kdeg),\n"
        "kdrank AS (SELECT deg, ROW_NUMBER() OVER (ORDER BY deg DESC, id) - 1 AS r FROM kdeg),\n"
        "kdk AS (SELECT unnest([2, 5, 10, 25, 50])::BIGINT AS k_target),\n"
        "kdrows AS (SELECT kdk.k_target, GREATEST(kdtot.n // kdk.k_target, 1) AS g_cnt, "
        "kdtot.sum_deg AS sum_deg, "
        "LEAST(kdrank.r // kdk.k_target, GREATEST(kdtot.n // kdk.k_target, 1) - 1) AS grp, "
        "kdrank.deg AS deg FROM kdrank CROSS JOIN kdk CROSS JOIN kdtot),\n"
        "kdgrp AS (SELECT k_target, grp, ANY_VALUE(g_cnt) AS g_cnt, "
        "MAX(deg) AS gmax, COUNT(*)::BIGINT AS sz, SUM(deg)::BIGINT AS sd "
        "FROM kdrows GROUP BY 1, 2)\n"
        "SELECT k_target, COUNT(*)::BIGINT AS n_groups, "
        "MAX(CASE WHEN grp = g_cnt - 1 THEN sz END)::BIGINT AS last_group_size, "
        "SUM(gmax * sz - sd)::BIGINT AS degree_increment "
        "FROM kdgrp GROUP BY k_target"
    )


def _small_world_sql() -> str:
    """Twin of _q_small_world_sigma: the transitivity twin's wedge/
    triangle CTEs + the mean-distance N(t) fold + the identical
    micro-quantized div chain (ln via ROUND(ln·1e6), both engines'
    libm on the same IEEE doubles — the walk_entropy_rate precedent)."""
    base = _anf_exact_sql()
    return (
        # own CTE names: the nested N(t) subquery re-binds edges/und
        f"WITH swe AS MATERIALIZED (SELECT DISTINCT l_orderkey % {SPARSE_MOD} AS src, "
        f"l_partkey % {SPARSE_MOD} AS dst FROM lineitem "
        f"WHERE l_orderkey % {SPARSE_MOD} <> l_partkey % {SPARSE_MOD}),\n"
        "swund AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT src, dst FROM swe UNION ALL SELECT dst AS src, src AS dst FROM swe"
        ") WHERE src <> dst),\n"
        "swu AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM swe),\n"
        "swdeg AS (SELECT src, COUNT(*)::BIGINT AS d FROM swund GROUP BY src),\n"
        "swbase AS (SELECT COUNT(*)::BIGINT AS n, SUM(d)::BIGINT AS two_m, "
        "(SUM(d * (d - 1)) // 2)::BIGINT AS wedges FROM swdeg),\n"
        "swtri AS (SELECT COUNT(*)::BIGINT AS triangles FROM swu e1 "
        "JOIN swu e2 ON e1.b = e2.a JOIN swu e3 ON e3.a = e1.a AND e3.b = e2.b),\n"
        f"swnf AS MATERIALIZED ({base}),\n"
        "swd AS (SELECT t, pairs, pairs - LAG(pairs) OVER (ORDER BY t) AS new_pairs FROM swnf),\n"
        "swa AS (SELECT COALESCE(SUM(t::HUGEINT * new_pairs), 0)::BIGINT AS sum_dist, "
        "(MAX(pairs) - MIN(pairs))::BIGINT AS rp FROM swd),\n"
        "swv AS (SELECT n, two_m, wedges, triangles, sum_dist, rp, "
        "CASE WHEN wedges > 0 THEN (1000000 * 3 * triangles) // wedges END AS c_micro, "
        "(1000000 * two_m) // (n * n) AS c_rand_micro, "
        "CASE WHEN rp > 0 THEN (1000000 * sum_dist) // rp END AS l_micro, "
        "(1000 * two_m) // n AS k_milli FROM swbase, swtri, swa),\n"
        "swl AS (SELECT *, ROUND(ln(n::DOUBLE) * 1000000)::BIGINT AS ln_n_micro, "
        "ROUND(ln(k_milli::DOUBLE / 1000.0) * 1000000)::BIGINT AS ln_k_micro FROM swv),\n"
        "swr AS (SELECT *, CASE WHEN ln_k_micro > 0 "
        "THEN (1000000 * ln_n_micro) // ln_k_micro END AS l_rand_micro FROM swl),\n"
        "swf AS (SELECT *, CASE WHEN c_rand_micro > 0 AND c_micro IS NOT NULL "
        "THEN (1000000 * c_micro) // c_rand_micro END AS ratio_c_micro, "
        "CASE WHEN l_rand_micro IS NOT NULL AND l_rand_micro > 0 AND l_micro IS NOT NULL "
        "THEN (1000000 * l_micro) // l_rand_micro END AS ratio_l_micro FROM swr)\n"
        "SELECT n AS n_vertices, two_m, wedges, triangles, c_micro::BIGINT AS c_micro, "
        "c_rand_micro::BIGINT AS c_rand_micro, l_micro::BIGINT AS l_micro, "
        "l_rand_micro::BIGINT AS l_rand_micro, "
        "(CASE WHEN ratio_l_micro > 0 AND ratio_c_micro IS NOT NULL "
        "THEN (1000000 * ratio_c_micro) // ratio_l_micro END)::BIGINT AS sigma_micro "
        "FROM swf"
    )


_KNN_CORRELATION_SQL = (
    f"WITH {_EDGES_SPARSE_SQL.strip()},\n"
    "knd AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src),\n"
    "knb AS (SELECT u.src, COUNT(*)::BIGINT AS k, SUM(d.deg)::BIGINT AS sum_nb "
    "FROM und u JOIN knd d ON d.id = u.dst GROUP BY u.src)\n"
    "SELECT k, COUNT(*)::BIGINT AS n_vertices, "
    "((1000000 * SUM(sum_nb)) // (k * COUNT(*)))::BIGINT AS knn_micro "
    "FROM knb GROUP BY k"
)


_TERM_BURSTINESS_SQL = (
    f"WITH {_TOKS_SQL},\n"
    "tbtf AS (SELECT doc_id, u AS term, COUNT(*)::BIGINT AS tf FROM "
    "(SELECT doc_id, unnest(t) AS u FROM toks) GROUP BY 1, 2),\n"
    "tbst AS (SELECT term, COUNT(*)::BIGINT AS n_docs, SUM(tf)::BIGINT AS total_tf, "
    "SUM(tf * tf)::BIGINT AS s2 FROM tbtf GROUP BY term HAVING COUNT(*) >= 5),\n"
    "tbtop AS (SELECT * FROM tbst ORDER BY total_tf DESC, term ASC LIMIT 100)\n"
    "SELECT term, n_docs, total_tf, "
    "((1000000::HUGEINT * (n_docs::HUGEINT * s2::HUGEINT - total_tf::HUGEINT * total_tf::HUGEINT)) "
    "// (n_docs::HUGEINT * total_tf::HUGEINT))::BIGINT AS vmr_micro "
    "FROM tbtop"
)


_CUSUM_SQL = (
    # twin of cusum_changepoints: centered-prefix-sum argmax per type;
    # d_i = v_i·n − Σv keeps every prefix an exact HUGEINT (mirrors
    # Spark's decimal(38,0) discipline); only the two reporting
    # divisions are doubles
    "WITH cse AS (SELECT event_type, ts, event_id, "
    "CAST(ROUND(value * 1000000) AS BIGINT) AS vm FROM events),\n"
    "css AS (SELECT event_type, COUNT(*)::BIGINT AS n, SUM(vm)::HUGEINT AS s "
    "FROM cse GROUP BY event_type),\n"
    "csd AS (SELECT e.event_type, e.ts, e.event_id, t.n, "
    "e.vm::HUGEINT * t.n - t.s AS d FROM cse e JOIN css t USING (event_type)),\n"
    "csp AS (SELECT event_type, ts, event_id, n, "
    "ABS(SUM(d) OVER (PARTITION BY event_type ORDER BY ts, event_id "
    "ROWS UNBOUNDED PRECEDING)) AS ap, "
    "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS idx "
    "FROM csd),\n"
    "csr AS (SELECT event_type, n, ap, idx, floor(epoch(ts))::BIGINT AS pe, "
    "ROW_NUMBER() OVER (PARTITION BY event_type "
    "ORDER BY ap DESC, ts, event_id) AS rn FROM csp)\n"
    "SELECT event_type, n, ROUND(ap::DOUBLE / n::DOUBLE / 1000000.0, 6) AS cusum_peak, "
    "pe AS peak_epoch, ROUND(idx::DOUBLE / n::DOUBLE, 6) AS peak_frac "
    "FROM csr WHERE rn = 1"
)


_MAX_CONCURRENCY_SQL = (
    # twin of max_concurrency: same integer-microsecond gap sessions,
    # then the +1/−1 sweep as one global window (the oracle needn't be
    # scale-shaped; the engine runs the two-level per-hour variant)
    "WITH mce AS (SELECT user_id, epoch_us(ts) AS m FROM events),\n"
    "mcb AS (SELECT user_id, m, CASE WHEN LAG(m) OVER "
    "(PARTITION BY user_id ORDER BY m) IS NULL OR "
    "m - LAG(m) OVER (PARTITION BY user_id ORDER BY m) >= 1800000000 "
    "THEN 1 ELSE 0 END AS brk FROM mce),\n"
    "mcs AS (SELECT user_id, m, SUM(brk) OVER (PARTITION BY user_id "
    "ORDER BY m ROWS UNBOUNDED PRECEDING) AS sess FROM mcb),\n"
    "mcg AS (SELECT user_id, sess, MIN(m) AS s_us, MAX(m) + 1800000000 AS e_us "
    "FROM mcs GROUP BY user_id, sess),\n"
    "mcd AS (SELECT s_us AS t, 1 AS d FROM mcg "
    "UNION ALL SELECT e_us AS t, -1 AS d FROM mcg),\n"
    "mcr AS (SELECT t, SUM(d) OVER (ORDER BY t, d "
    "ROWS UNBOUNDED PRECEDING)::BIGINT AS c FROM mcd),\n"
    "mcp AS (SELECT MAX(c)::BIGINT AS peak FROM mcr)\n"
    "SELECT (SELECT COUNT(*)::BIGINT FROM mcg) AS n_sessions, "
    "p.peak AS peak_concurrency, "
    "(MIN(r.t) // 1000000)::BIGINT AS peak_epoch "
    "FROM mcr r JOIN mcp p ON r.c = p.peak GROUP BY p.peak"
)


def _benford_sql(p_micro: dict[int, int]) -> str:
    """Twin of benford_audit: the same nine Python-computed micro-digit
    probabilities are injected as a VALUES literal (no query-time
    log10); chi-square contributions quantize to integer micro-units
    before the 9-row total so the sum is exact."""
    vals = ", ".join(f"({d}, {p})" for d, p in sorted(p_micro.items()))
    return (
        f"WITH bfp(digit, p_micro) AS (VALUES {vals}),\n"
        "bfd AS (SELECT CAST(substr(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) "
        "AS VARCHAR), 1, 1) AS INTEGER) AS digit FROM lineitem "
        "WHERE l_extendedprice > 0),\n"
        "bfo AS (SELECT digit, COUNT(*)::BIGINT AS n_obs FROM bfd GROUP BY digit),\n"
        "bfn AS (SELECT SUM(n_obs)::BIGINT AS n FROM bfo),\n"
        "bfv AS (SELECT o.digit, o.n_obs, (p.p_micro * t.n)::BIGINT AS exp_micro, "
        "o.n_obs::HUGEINT * 1000000 - p.p_micro::HUGEINT * t.n AS dev "
        "FROM bfo o JOIN bfp p USING (digit) CROSS JOIN bfn t),\n"
        "bfc AS (SELECT digit, n_obs, exp_micro, "
        "CAST(ROUND((dev * dev)::DOUBLE "
        "/ (exp_micro::DOUBLE * 1000000.0) * 1000000.0) AS BIGINT) AS chi2_micro "
        "FROM bfv)\n"
        "SELECT digit, n_obs, exp_micro, chi2_micro, "
        "(SELECT SUM(chi2_micro)::BIGINT FROM bfc) AS chi2_total_micro FROM bfc"
    )


_YULE_K_SQL = (
    # twin of yule_k: the same frequency-spectrum fold per language;
    # Σm² rides HUGEINT, the single K division is the one double step
    "WITH yktf AS (SELECT lang, u AS tok, COUNT(*)::BIGINT AS m FROM "
    "(SELECT lang, unnest(list_filter(string_split_regex(lower(text), "
    "'[^a-z0-9]+'), x -> x <> '')) AS u FROM documents) GROUP BY 1, 2)\n"
    "SELECT lang, SUM(m)::BIGINT AS n_tokens, COUNT(*)::BIGINT AS n_types, "
    "ROUND(10000.0 * (SUM(m::HUGEINT * m) - SUM(m))::DOUBLE "
    "/ (SUM(m)::DOUBLE * SUM(m)::DOUBLE), 6) AS yule_k "
    "FROM yktf GROUP BY lang"
)


def _llr_collocations_sql(min_count: int, k: int) -> str:
    """Twin of llr_collocations: the pmi_collocations contingency CTEs,
    scored with Dunning G² — four O·ln(O·N/(R·C)) terms summed in the
    same left-associative order as the Spark expression."""
    term = (
        "CASE WHEN {o} > 0 THEN ({o})::DOUBLE * "
        "ln((({o})::DOUBLE * nn.n::DOUBLE) / (({r})::DOUBLE * ({c})::DOUBLE)) "
        "ELSE 0.0 END"
    )
    t11 = term.format(o="c.c12", r="a.c1", c="b.c2")
    t12 = term.format(o="a.c1 - c.c12", r="a.c1", c="nn.n - b.c2")
    t21 = term.format(o="b.c2 - c.c12", r="nn.n - a.c1", c="b.c2")
    t22 = term.format(o="nn.n - a.c1 - b.c2 + c.c12", r="nn.n - a.c1", c="nn.n - b.c2")
    return (
        "WITH ltoks AS MATERIALIZED (SELECT doc_id, "
        "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t "
        "FROM documents),\n"
        "lbgs AS MATERIALIZED (SELECT unnest(list_transform(range(1, len(t)), "
        "i -> t[i] || ' ' || t[i + 1])) AS bg FROM ltoks WHERE len(t) >= 2),\n"
        "lc12 AS MATERIALIZED (SELECT bg, COUNT(*)::BIGINT AS c12 FROM lbgs GROUP BY bg),\n"
        "lnn AS (SELECT SUM(c12)::BIGINT AS n FROM lc12),\n"
        "lw1 AS (SELECT split_part(bg, ' ', 1) AS w1, SUM(c12)::BIGINT AS c1 FROM lc12 GROUP BY 1),\n"
        "lw2 AS (SELECT split_part(bg, ' ', 2) AS w2, SUM(c12)::BIGINT AS c2 FROM lc12 GROUP BY 1),\n"
        "lsc AS (SELECT c.bg, c.c12, CAST(ROUND(2.0 * "
        f"(({t11}) + ({t12}) + ({t21}) + ({t22})) * 1000000.0) AS BIGINT) AS llr_micro "
        "FROM lc12 c JOIN lw1 a ON split_part(c.bg, ' ', 1) = a.w1 "
        "JOIN lw2 b ON split_part(c.bg, ' ', 2) = b.w2 CROSS JOIN lnn nn "
        f"WHERE c.c12 >= {min_count})\n"
        "SELECT bg AS bigram, c12, llr_micro, rank FROM "
        "(SELECT bg, c12, llr_micro, ROW_NUMBER() OVER "
        "(ORDER BY llr_micro DESC, bg ASC)::BIGINT AS rank FROM lsc) "
        f"WHERE rank <= {k}"
    )


def _core_strength_sql(rounds: int = CORENESS_ORACLE_ROUNDS) -> str:
    """Twin of core_strength: the unrolled coreness chain, then one
    neighbour-count pass CS(u) = |{v: core(v) ≥ core(u)}| − core(u) + 1
    on the same und edges."""
    ctes = _coreness_ctes(rounds)
    ctes.append(
        f"csg AS (SELECT u.src AS id, COUNT(*)::BIGINT AS n_ge "
        f"FROM und u JOIN c{rounds} a ON u.src = a.id "
        f"JOIN c{rounds} b ON u.dst = b.id "
        f"WHERE b.core >= a.core GROUP BY u.src)"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT c.id, c.core, "
        "(COALESCE(g.n_ge, 0) - c.core + 1)::BIGINT AS core_strength "
        f"FROM c{rounds} c LEFT JOIN csg g ON c.id = g.id"
    )


def _dag_width_sql() -> str:
    """Twin of dag_width_profile on the _dag_levels_sql chain: distinct
    (scc, level) tasks, histogram width per level, Brent's
    max(⌈n/p⌉, depth) makespan floors — all integers."""
    base = _dag_levels_sql()
    return (
        f"WITH dwbase AS MATERIALIZED ({base}),\n"
        "dwc AS (SELECT DISTINCT scc, level FROM dwbase),\n"
        "dww AS (SELECT level, COUNT(*)::BIGINT AS width FROM dwc GROUP BY level),\n"
        "dws AS (SELECT COUNT(*)::BIGINT AS n_tasks, "
        "(MAX(level) + 1)::BIGINT AS critical_path FROM dwc)\n"
        "SELECT w.level, w.width, s.n_tasks, s.critical_path, "
        "GREATEST((s.n_tasks + 7) // 8, s.critical_path)::BIGINT AS makespan_p8, "
        "GREATEST((s.n_tasks + 31) // 32, s.critical_path)::BIGINT AS makespan_p32 "
        "FROM dww w CROSS JOIN dws s"
    )


_ROCCHIO_SQL = (
    # twin of nearest_centroid_confusion on the _LABEL_SEP_SQL point/
    # model CTE shapes: per-point best-cosine centroid, cross-tab,
    # exact integer accuracy
    "WITH rcp AS MATERIALIZED (SELECT label::BIGINT AS lab, vec_id AS id, "
    "i - 1 AS pos, floor(embedding[i]::DOUBLE * 1000.0)::BIGINT AS q "
    "FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),\n"
    "rcv AS MATERIALIZED (SELECT lab, pos, SUM(q)::BIGINT AS sv FROM rcp "
    "GROUP BY lab, pos),\n"
    "rcn AS (SELECT lab, SUM(sv::HUGEINT * sv) AS nrm FROM rcv GROUP BY lab),\n"
    "rcd AS (SELECT p.id, p.lab, v.lab AS cand, SUM(p.q::HUGEINT * v.sv) AS dot "
    "FROM rcp p JOIN rcv v ON p.pos = v.pos GROUP BY p.id, p.lab, v.lab),\n"
    "rcq AS (SELECT id, SUM(q::HUGEINT * q) AS nq FROM rcp GROUP BY id),\n"
    "rcs AS (SELECT d.id, d.lab, d.cand, CAST(ROUND(d.dot::DOUBLE / "
    "sqrt(q.nq::DOUBLE * n.nrm::DOUBLE) * 1000000.0) AS BIGINT) AS cos_micro "
    "FROM rcd d JOIN rcq q ON d.id = q.id JOIN rcn n ON d.cand = n.lab "
    "WHERE q.nq > 0),\n"
    "rcpred AS (SELECT lab AS true_label, cand AS pred_label FROM "
    "(SELECT lab, cand, ROW_NUMBER() OVER (PARTITION BY id "
    "ORDER BY cos_micro DESC, cand ASC) AS rn FROM rcs) WHERE rn = 1),\n"
    "rcc AS (SELECT true_label, pred_label, COUNT(*)::BIGINT AS n "
    "FROM rcpred GROUP BY 1, 2),\n"
    "rct AS (SELECT ((1000000 * SUM(CASE WHEN true_label = pred_label "
    "THEN n ELSE 0 END)) // SUM(n))::BIGINT AS accuracy_micro FROM rcc)\n"
    "SELECT c.true_label, c.pred_label, c.n, t.accuracy_micro "
    "FROM rcc c CROSS JOIN rct t"
)


def _ann_hubness_sql(mod: int, k: int) -> str:
    """Twin of knn_hubness: exact cosine top-k within the residue
    slice, k-occurrence counts with zero-occurrence members kept, the
    integer moment sums, and the pinned-shape skew division chain."""
    cos = _cos_expr("a.embedding", "b.embedding")
    return (
        f"WITH hsl AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings "
        f"WHERE vec_id % {mod} = 0),\n"
        "hpk AS (SELECT ia, ib FROM (SELECT a.vec_id AS ia, b.vec_id AS ib, "
        f"ROW_NUMBER() OVER (PARTITION BY a.vec_id "
        f"ORDER BY ROUND({cos}, 6) DESC, b.vec_id ASC) AS rn "
        "FROM hsl a CROSS JOIN hsl b WHERE a.vec_id <> b.vec_id) "
        f"WHERE rn <= {k}),\n"
        "hoc AS (SELECT s.vec_id, COALESCE(o.occ, 0)::BIGINT AS occ FROM hsl s "
        "LEFT JOIN (SELECT ib, COUNT(*)::BIGINT AS occ FROM hpk GROUP BY ib) o "
        "ON s.vec_id = o.ib),\n"
        "hmm AS (SELECT COUNT(*)::BIGINT AS n, SUM(occ)::HUGEINT AS s1, "
        "SUM(occ::HUGEINT * occ) AS s2, SUM(occ::HUGEINT * occ * occ) AS s3 "
        "FROM hoc),\n"
        "hsk AS (SELECT n AS n_slice, CASE WHEN n::HUGEINT * s2 - s1 * s1 > 0 THEN "
        "CAST(ROUND(((n::HUGEINT * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1)::DOUBLE "
        "/ (n::HUGEINT * n * n)::DOUBLE) "
        "/ pow((n::HUGEINT * s2 - s1 * s1)::DOUBLE / (n::HUGEINT * n)::DOUBLE, 1.5) "
        "* 1000000.0) AS BIGINT) END AS skew_micro FROM hmm)\n"
        "SELECT h.occ AS k_occurrence, COUNT(*)::BIGINT AS n_vectors, "
        "s.n_slice, s.skew_micro "
        "FROM hoc h CROSS JOIN hsk s GROUP BY h.occ, s.n_slice, s.skew_micro"
    )


def _burrows_delta_sql(n_features: int) -> str:
    """Twin of burrows_delta: completed source×feature grid, exact
    integer dev/cvar pair, per-term micro quantization before the
    F-term sum, integer-division mean."""
    return (
        f"WITH bdt AS MATERIALIZED (SELECT source AS src_name, u AS tok, "
        "COUNT(*)::BIGINT AS c FROM (SELECT source, "
        "unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
        "x -> x <> '')) AS u FROM documents) GROUP BY 1, 2),\n"
        "bdn AS (SELECT src_name, SUM(c)::BIGINT AS n FROM bdt GROUP BY src_name),\n"
        "bdf AS (SELECT tok FROM (SELECT tok, SUM(c)::BIGINT AS ct FROM bdt "
        f"GROUP BY tok ORDER BY ct DESC, tok ASC LIMIT {n_features})),\n"
        "bdg AS MATERIALIZED (SELECT t.src_name, f.tok, "
        "((1000000 * COALESCE(c.c, 0)) // t.n)::BIGINT AS rf "
        "FROM bdn t CROSS JOIN bdf f LEFT JOIN bdt c "
        "ON c.src_name = t.src_name AND c.tok = f.tok),\n"
        "bdm AS (SELECT tok, COUNT(*)::BIGINT AS s, SUM(rf)::HUGEINT AS srf, "
        "SUM(rf::HUGEINT * rf) AS srf2 FROM bdg GROUP BY tok),\n"
        "bdd AS (SELECT g.tok, g.src_name, m.s::HUGEINT * g.rf - m.srf AS dev, "
        "m.s::HUGEINT * m.srf2 - m.srf * m.srf AS cvar "
        "FROM bdg g JOIN bdm m ON g.tok = m.tok),\n"
        "bdp AS (SELECT a.src_name AS source_a, b.src_name AS source_b, "
        "CASE WHEN a.cvar > 0 THEN CAST(ROUND(ABS((a.dev - b.dev)::DOUBLE) "
        "/ sqrt(a.cvar::DOUBLE) * 1000000.0) AS BIGINT) ELSE 0 END AS tm "
        "FROM bdd a JOIN bdd b ON a.tok = b.tok AND a.src_name < b.src_name)\n"
        "SELECT source_a, source_b, "
        f"(SUM(tm) // {n_features})::BIGINT AS delta_micro "
        "FROM bdp GROUP BY source_a, source_b"
    )


def _tpch_q3_sql(date: str, k: int) -> str:
    """Twin of tpch_q3_topk: same pushed filters, per-row cent
    quantization before the per-order sum, rank ties on l_orderkey."""
    return (
        f"WITH q3l AS (SELECT l_orderkey, CAST(ROUND(l_extendedprice * "
        "(1.0 - l_discount) * 100) AS BIGINT) AS rev_cents FROM lineitem "
        f"WHERE l_shipdate > TIMESTAMP '{date}'),\n"
        "q3o AS (SELECT o_orderkey, o_orderdate, o_orderpriority FROM orders o "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        f"WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '{date}'),\n"
        "q3a AS (SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority, "
        "SUM(rev_cents)::BIGINT AS revenue_cents FROM q3l l "
        "JOIN q3o o ON l.l_orderkey = o.o_orderkey GROUP BY 1, 2, 3)\n"
        "SELECT l_orderkey, floor(epoch(o_orderdate))::BIGINT AS odate_epoch, "
        "o_orderpriority, revenue_cents, rank FROM (SELECT l_orderkey, "
        "o_orderdate, o_orderpriority, revenue_cents, ROW_NUMBER() OVER "
        "(ORDER BY revenue_cents DESC, l_orderkey ASC)::BIGINT AS rank FROM q3a) "
        f"WHERE rank <= {k}"
    )


_EVENT_CORR_SQL = (
    # twin of event_type_correlation: completed hour×type grid, exact
    # integer Pearson numerator/variances, one double division
    "WITH ecc AS (SELECT event_type AS t, "
    "floor(epoch(date_trunc('hour', ts)))::BIGINT AS h, COUNT(*)::BIGINT AS c "
    "FROM events GROUP BY 1, 2),\n"
    "ech AS (SELECT DISTINCT h FROM ecc),\n"
    "ect AS (SELECT DISTINCT t FROM ecc),\n"
    "ecg AS MATERIALIZED (SELECT t.t, h.h, COALESCE(c.c, 0)::BIGINT AS c "
    "FROM ech h CROSS JOIN ect t LEFT JOIN ecc c ON c.t = t.t AND c.h = h.h),\n"
    "ecm AS (SELECT a.t AS type_a, b.t AS type_b, COUNT(*)::BIGINT AS n_hours, "
    "SUM(a.c)::HUGEINT AS sx, SUM(b.c)::HUGEINT AS sy, "
    "SUM(a.c::HUGEINT * a.c) AS sxx, SUM(b.c::HUGEINT * b.c) AS syy, "
    "SUM(a.c::HUGEINT * b.c) AS sxy "
    "FROM ecg a JOIN ecg b ON a.h = b.h AND a.t < b.t GROUP BY 1, 2)\n"
    "SELECT type_a, type_b, n_hours, "
    "CASE WHEN n_hours * sxx - sx * sx > 0 AND n_hours * syy - sy * sy > 0 THEN "
    "CAST(ROUND((n_hours * sxy - sx * sy)::DOUBLE "
    "/ sqrt((n_hours * sxx - sx * sx)::DOUBLE * (n_hours * syy - sy * sy)::DOUBLE) "
    "* 1000000.0) AS BIGINT) END AS r_micro FROM ecm"
)


_SESSION_COLIFT_SQL = (
    # twin of session_colift: identical integer-microsecond gap
    # sessions, distinct per-session item sets, all-integer lift
    "WITH sle AS (SELECT user_id, epoch_us(ts) AS m, event_type AS t FROM events),\n"
    "slb AS (SELECT user_id, m, t, CASE WHEN LAG(m) OVER "
    "(PARTITION BY user_id ORDER BY m) IS NULL OR "
    "m - LAG(m) OVER (PARTITION BY user_id ORDER BY m) >= 1800000000 "
    "THEN 1 ELSE 0 END AS brk FROM sle),\n"
    "sls AS (SELECT user_id, t, SUM(brk) OVER (PARTITION BY user_id "
    "ORDER BY m ROWS UNBOUNDED PRECEDING) AS sess FROM slb),\n"
    "sli AS MATERIALIZED (SELECT DISTINCT user_id, sess, t FROM sls),\n"
    "sln AS (SELECT COUNT(*)::BIGINT AS n FROM "
    "(SELECT DISTINCT user_id, sess FROM sli)),\n"
    "slc AS (SELECT t, COUNT(*)::BIGINT AS c FROM sli GROUP BY t),\n"
    "slp AS (SELECT a.t AS type_a, b.t AS type_b, COUNT(*)::BIGINT AS c_ab "
    "FROM sli a JOIN sli b ON a.user_id = b.user_id AND a.sess = b.sess "
    "AND a.t < b.t GROUP BY 1, 2)\n"
    "SELECT p.type_a, p.type_b, ca.c AS c_a, cb.c AS c_b, p.c_ab, "
    "((1000000 * n.n * p.c_ab) // (ca.c * cb.c))::BIGINT AS lift_micro "
    "FROM slp p JOIN slc ca ON p.type_a = ca.t "
    "JOIN slc cb ON p.type_b = cb.t CROSS JOIN sln n"
)


_RANDIC_SQL = (
    f"WITH {_EDGES_SPARSE_SQL.strip()},\n"
    "rdg AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src),\n"
    "rdt AS (SELECT CAST(ROUND(1000000.0 / sqrt(a.deg::DOUBLE * b.deg::DOUBLE)) "
    "AS BIGINT) AS tm FROM und u JOIN rdg a ON u.src = a.id "
    "JOIN rdg b ON u.dst = b.id WHERE u.src < u.dst),\n"
    "rds AS (SELECT COUNT(*)::BIGINT AS n_edges, SUM(tm)::BIGINT AS randic_micro FROM rdt)\n"
    "SELECT (SELECT COUNT(*)::BIGINT FROM rdg) AS n_vertices, n_edges, randic_micro, "
    "(randic_micro // n_edges)::BIGINT AS norm_ratio_micro FROM rds"
)


_POWERLAW_SQL = (
    f"WITH {_EDGES_SPARSE_SQL.strip()},\n"
    "pldeg AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src),\n"
    "plh AS (SELECT deg, COUNT(*)::BIGINT AS c FROM pldeg GROUP BY deg),\n"
    "plb AS (SELECT SUM(c)::BIGINT AS n, MIN(deg)::BIGINT AS d_min, "
    "MAX(deg)::BIGINT AS d_max FROM plh),\n"
    "plt AS (SELECT b.n, b.d_min, b.d_max, "
    "SUM(h.c * CAST(ROUND(ln((2.0 * h.deg) / (2.0 * b.d_min - 1.0)) "
    "* 1000000.0) AS BIGINT))::BIGINT AS sml, "
    "SUM(h.c * CAST(ROUND(ln(h.c::DOUBLE) * 1000000.0) AS BIGINT))::BIGINT AS shl "
    "FROM plh h CROSS JOIN plb b GROUP BY b.n, b.d_min, b.d_max)\n"
    "SELECT n AS n_vertices, d_min, d_max, "
    "CASE WHEN sml > 0 THEN 1000000 + "
    "((1000000000000::HUGEINT * n) // sml)::BIGINT END AS alpha_micro, "
    "(CAST(ROUND(ln(n::DOUBLE) * 1000000.0) AS BIGINT) - shl // n)::BIGINT "
    "AS entropy_micro FROM plt"
)


def _betw_plan_sql(grid: list, n_sources: int) -> str:
    """Twin of betweenness_sample_plan: the _diameter_sql chain feeds
    VD; the (ε, δ) grid and its transcendental factors are the same
    Python micro-literals; ⌊log₂⌋ via binary-string length; ceiling by
    exact integer division."""
    base = _diameter_sql()
    vals = ", ".join(f"({e}, {d}, {a}, {l})" for e, d, a, l in grid)
    return (
        f"WITH bpbase AS MATERIALIZED ({base}),\n"
        f"bpgrid(eps_micro, delta_micro, a_micro, lnd_micro) AS (VALUES {vals}),\n"
        "bpvd AS (SELECT (diameter_lb + 1)::BIGINT AS vd FROM bpbase),\n"
        "bpf AS (SELECT vd, CASE WHEN vd > 2 THEN length(bin(vd - 2)) - 1 "
        "ELSE 0 END::BIGINT AS floor_log2 FROM bpvd)\n"
        "SELECT g.eps_micro::BIGINT AS eps_micro, g.delta_micro::BIGINT AS delta_micro, "
        "f.vd, f.floor_log2, "
        "((g.a_micro::HUGEINT * ((f.floor_log2 + 1) * 1000000 + g.lnd_micro) "
        "+ 999999999999) // 1000000000000)::BIGINT AS sample_size, "
        f"{n_sources}::BIGINT AS current_sources "
        "FROM bpgrid g CROSS JOIN bpf f"
    )


_MARKOV_ACC_SQL = (
    # twin of markov_next_accuracy on the event_transitions pair window
    "WITH map_ AS (SELECT prev_type, next_type, COUNT(*)::BIGINT AS n FROM "
    "(SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "AS prev_type, event_type AS next_type FROM events) "
    "WHERE prev_type IS NOT NULL GROUP BY 1, 2),\n"
    "mapred AS (SELECT prev_type, next_type AS pred_type, n AS c_pred FROM "
    "(SELECT prev_type, next_type, n, ROW_NUMBER() OVER (PARTITION BY prev_type "
    "ORDER BY n DESC, next_type ASC) AS rn FROM map_) WHERE rn = 1),\n"
    "matot AS (SELECT prev_type, SUM(n)::BIGINT AS c_total FROM map_ GROUP BY 1),\n"
    "maper AS (SELECT p.prev_type, p.pred_type, p.c_pred, t.c_total "
    "FROM mapred p JOIN matot t ON p.prev_type = t.prev_type),\n"
    "maacc AS (SELECT ((1000000 * SUM(c_pred)) // SUM(c_total))::BIGINT "
    "AS accuracy_micro FROM maper)\n"
    "SELECT m.prev_type, m.pred_type, m.c_pred, m.c_total, "
    "((1000000 * m.c_pred) // m.c_total)::BIGINT AS hit_rate_micro, "
    "a.accuracy_micro FROM maper m CROSS JOIN maacc a"
)


_L_DIVERSITY_SQL = (
    # twin of l_diversity_audit: distinct-secret counts per
    # (event_type, hour-of-day) class, 3-row threshold explode
    "WITH ldc AS (SELECT event_type, hour(ts)::BIGINT AS hod, "
    "COUNT(*)::BIGINT AS class_rows, "
    "COUNT(DISTINCT user_id)::BIGINT AS n_secrets "
    "FROM events GROUP BY 1, 2),\n"
    "ldl(l_threshold) AS (VALUES (2), (5), (10))\n"
    "SELECT l_threshold::BIGINT AS l_threshold, COUNT(*)::BIGINT AS n_classes, "
    "SUM(CASE WHEN n_secrets < l_threshold THEN 1 ELSE 0 END)::BIGINT "
    "AS n_classes_below_l, "
    "SUM(CASE WHEN n_secrets < l_threshold THEN class_rows ELSE 0 END)::BIGINT "
    "AS n_rows_at_risk "
    "FROM ldc CROSS JOIN ldl GROUP BY l_threshold"
)


def _triangle_delta_sql(mod: int) -> str:
    """Twin of triangle_delta_insert: the same canonical slice plays
    the inserts; delta = common-neighbour count in the base graph."""
    return (
        f"WITH {_EDGES_SPARSE_SQL.strip()},\n"
        "tdc AS (SELECT src, dst FROM und WHERE src < dst),\n"
        f"tdi AS MATERIALIZED (SELECT src, dst FROM tdc WHERE (src * 31 + dst) % {mod} = 0),\n"
        f"tdbc AS (SELECT src, dst FROM tdc WHERE (src * 31 + dst) % {mod} <> 0),\n"
        "tdb AS MATERIALIZED (SELECT src, dst FROM tdbc "
        "UNION ALL SELECT dst AS src, src AS dst FROM tdbc),\n"
        "tdd AS (SELECT i.src, i.dst, COUNT(*)::BIGINT AS delta FROM tdi i "
        "JOIN tdb a ON a.src = i.src JOIN tdb b ON b.src = i.dst AND b.dst = a.dst "
        "GROUP BY i.src, i.dst)\n"
        "SELECT i.src, i.dst, COALESCE(d.delta, 0)::BIGINT AS delta "
        "FROM tdi i LEFT JOIN tdd d ON i.src = d.src AND i.dst = d.dst"
    )


def _intrinsic_dim_sql(mod: int, scale: int = 1000) -> str:
    """Twin of intrinsic_dimension: exact integer squared distances,
    per-point ln-ratio micro-quantized before the sum."""
    return (
        f"WITH idp AS MATERIALIZED (SELECT vec_id AS id, "
        f"list_transform(embedding, x -> floor(x::DOUBLE * {scale}.0)::BIGINT) AS q "
        f"FROM embeddings WHERE vec_id % {mod} = 0),\n"
        "idd AS (SELECT a.id AS ia, b.id AS ib, "
        "list_sum(list_transform(range(1, len(a.q) + 1), "
        "i -> (a.q[i] - b.q[i]) * (a.q[i] - b.q[i])))::BIGINT AS d2 "
        "FROM idp a CROSS JOIN idp b WHERE a.id <> b.id),\n"
        "idr AS (SELECT ia, d2, rn FROM (SELECT ia, d2, ROW_NUMBER() OVER "
        "(PARTITION BY ia ORDER BY d2 ASC, ib ASC) AS rn FROM idd WHERE d2 > 0) "
        "WHERE rn <= 2),\n"
        "idt AS (SELECT ia, COUNT(*)::BIGINT AS k, "
        "MIN(CASE WHEN rn = 1 THEN d2 END) AS d1sq, "
        "MIN(CASE WHEN rn = 2 THEN d2 END) AS d2sq FROM idr GROUP BY ia),\n"
        "idl AS (SELECT CAST(ROUND((ln(d2sq::DOUBLE) - ln(d1sq::DOUBLE)) / 2.0 "
        "* 1000000.0) AS BIGINT) AS lnmu FROM idt WHERE k = 2),\n"
        "ids AS (SELECT COUNT(*)::BIGINT AS n_used, SUM(lnmu)::BIGINT AS slm FROM idl)\n"
        "SELECT (SELECT COUNT(*)::BIGINT FROM idp) AS n_slice, n_used, "
        "CASE WHEN slm > 0 THEN ((1000000000000::HUGEINT * n_used) // slm)::BIGINT END "
        "AS id_micro FROM ids"
    )


_CONVERSION_TIME_SQL = (
    "WITH cte AS (SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS es "
    "FROM events),\n"
    "ctc AS (SELECT user_id, MIN(es) AS t_click FROM cte "
    "WHERE event_type = 'click' GROUP BY 1),\n"
    "ctg AS (SELECT p.user_id, (MIN(p.es) - MAX(c.t_click))::BIGINT AS gap_s "
    "FROM cte p JOIN ctc c ON p.user_id = c.user_id "
    "AND p.event_type = 'purchase' AND p.es > c.t_click GROUP BY p.user_id)\n"
    "SELECT COUNT(*)::BIGINT AS n_converted, "
    "ROUND(quantile_cont(gap_s, 0.5), 4) AS p50_s, "
    "ROUND(quantile_cont(gap_s, 0.9), 4) AS p90_s, "
    "CASE WHEN COUNT(*) > 0 THEN ((1000000 * SUM(gap_s)) // COUNT(*))::BIGINT END "
    "AS mean_s_micro FROM ctg"
)


def _dp_plan_sql(grid: list) -> str:
    """Twin of dp_noise_plan on the k-anonymity class histogram with
    the same Python micro-literal (ε, b, p95) grid."""
    vals = ", ".join(f"({e}, {s}, {p})" for e, s, p in grid)
    return (
        "WITH dpc AS (SELECT lang, source, n_chars // 500 AS len_bucket, "
        "COUNT(*)::BIGINT AS class_size FROM documents GROUP BY 1, 2, 3),\n"
        f"dpg(eps_micro, scale_micro, p95_noise_micro) AS (VALUES {vals})\n"
        "SELECT eps_micro::BIGINT AS eps_micro, scale_micro::BIGINT AS scale_micro, "
        "p95_noise_micro::BIGINT AS p95_noise_micro, COUNT(*)::BIGINT AS n_classes, "
        "SUM(CASE WHEN class_size * 1000000 < p95_noise_micro THEN 1 ELSE 0 END)::BIGINT "
        "AS n_classes_drowned, "
        "SUM(CASE WHEN class_size * 1000000 < p95_noise_micro THEN class_size ELSE 0 END)::BIGINT "
        "AS rows_in_drowned "
        "FROM dpc CROSS JOIN dpg GROUP BY 1, 2, 3"
    )


_SOURCE_PERPLEXITY_SQL = (
    # twin of source_perplexity: per-vocabulary-row micro ln's × exact
    # counts, order-free integer entropy sums, integer-div endings
    "WITH sptf AS MATERIALIZED (SELECT source AS src_name, u AS tok, "
    "COUNT(*)::BIGINT AS c FROM (SELECT source, "
    "unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
    "x -> x <> '')) AS u FROM documents) GROUP BY 1, 2),\n"
    "spcw AS (SELECT tok, SUM(c)::BIGINT AS cw FROM sptf GROUP BY tok),\n"
    "spn AS (SELECT SUM(cw)::BIGINT AS nn FROM spcw),\n"
    "splc AS (SELECT tok, CAST(ROUND(ln(cw::DOUBLE) * 1000000.0) AS BIGINT) "
    "AS lncw FROM spcw),\n"
    "spt AS (SELECT f.src_name, SUM(f.c)::BIGINT AS n_tokens, "
    "SUM(f.c * (l.lncw - CAST(ROUND(ln(n.nn::DOUBLE) * 1000000.0) AS BIGINT)))::BIGINT AS sx, "
    "SUM(f.c * CAST(ROUND(ln(f.c::DOUBLE) * 1000000.0) AS BIGINT))::BIGINT AS so "
    "FROM sptf f JOIN splc l ON f.tok = l.tok CROSS JOIN spn n GROUP BY f.src_name),\n"
    "spo AS (SELECT src_name AS source, n_tokens, "
    "-(sx // n_tokens)::BIGINT AS cross_entropy_micro, "
    "(CAST(ROUND(ln(n_tokens::DOUBLE) * 1000000.0) AS BIGINT) - so // n_tokens)::BIGINT "
    "AS entropy_micro FROM spt)\n"
    "SELECT source, n_tokens, cross_entropy_micro, entropy_micro, "
    "(cross_entropy_micro - entropy_micro)::BIGINT AS kl_micro FROM spo"
)


def _journeys_sql(length: int, k: int) -> str:
    """Twin of top_user_journeys: the pinned microsecond gap sessions,
    ordered prefix string_agg, deterministic top-k."""
    return (
        "WITH jse AS (SELECT user_id, epoch_us(ts) AS m, event_id, "
        "event_type AS t FROM events),\n"
        "jsb AS (SELECT user_id, m, event_id, t, CASE WHEN LAG(m) OVER "
        "(PARTITION BY user_id ORDER BY m, event_id) IS NULL OR "
        "m - LAG(m) OVER (PARTITION BY user_id ORDER BY m, event_id) >= 1800000000 "
        "THEN 1 ELSE 0 END AS brk FROM jse),\n"
        "jss AS (SELECT user_id, m, event_id, t, SUM(brk) OVER "
        "(PARTITION BY user_id ORDER BY m, event_id ROWS UNBOUNDED PRECEDING) "
        "AS sess FROM jsb),\n"
        "jsp AS (SELECT user_id, sess, t, rn FROM (SELECT user_id, sess, t, "
        "ROW_NUMBER() OVER (PARTITION BY user_id, sess ORDER BY m, event_id) AS rn "
        f"FROM jss) WHERE rn <= {length}),\n"
        "jsj AS (SELECT string_agg(t, '>' ORDER BY rn) AS journey "
        "FROM jsp GROUP BY user_id, sess),\n"
        "jsc AS (SELECT journey, COUNT(*)::BIGINT AS n FROM jsj GROUP BY journey)\n"
        "SELECT journey, n, rank FROM (SELECT journey, n, ROW_NUMBER() OVER "
        "(ORDER BY n DESC, journey ASC)::BIGINT AS rank FROM jsc) "
        f"WHERE rank <= {k}"
    )


_SESSION_STATS_SQL = (
    "WITH sse AS (SELECT user_id, epoch_us(ts) AS m FROM events),\n"
    "ssb AS (SELECT user_id, m, CASE WHEN LAG(m) OVER "
    "(PARTITION BY user_id ORDER BY m) IS NULL OR "
    "m - LAG(m) OVER (PARTITION BY user_id ORDER BY m) >= 1800000000 "
    "THEN 1 ELSE 0 END AS brk FROM sse),\n"
    "sss AS (SELECT user_id, m, SUM(brk) OVER (PARTITION BY user_id "
    "ORDER BY m ROWS UNBOUNDED PRECEDING) AS sess FROM ssb),\n"
    "ssg AS (SELECT user_id, sess, COUNT(*)::BIGINT AS n_events, "
    "((MAX(m) - MIN(m)) // 1000000)::BIGINT AS dur_s "
    "FROM sss GROUP BY user_id, sess),\n"
    "ssa AS (SELECT COUNT(*)::BIGINT AS n_sessions, "
    "SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounce, "
    "ROUND(quantile_cont(n_events, 0.5), 4) AS p50_events, "
    "ROUND(quantile_cont(n_events, 0.9), 4) AS p90_events, "
    "ROUND(quantile_cont(dur_s, 0.5), 4) AS p50_duration_s, "
    "ROUND(quantile_cont(dur_s, 0.9), 4) AS p90_duration_s, "
    "SUM(n_events)::BIGINT AS sum_events FROM ssg)\n"
    "SELECT n_sessions, ((1000000 * n_bounce) // n_sessions)::BIGINT "
    "AS bounce_rate_micro, p50_events, p90_events, p50_duration_s, "
    "p90_duration_s, ((1000000 * sum_events) // n_sessions)::BIGINT "
    "AS mean_events_micro FROM ssa"
)


_GRAPH_H_INDEX_SQL = (
    f"WITH {_EDGES_SPARSE_SQL.strip()},\n"
    "ghd AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src),\n"
    "ghh AS (SELECT deg, COUNT(*)::BIGINT AS c FROM ghd GROUP BY deg),\n"
    "ghc AS (SELECT deg, LEAST(deg, SUM(c) OVER (ORDER BY deg DESC "
    "ROWS UNBOUNDED PRECEDING)) AS h_cand FROM ghh)\n"
    "SELECT (SELECT COUNT(*)::BIGINT FROM ghd) AS n_vertices, "
    "(SELECT MAX(deg)::BIGINT FROM ghd) AS d_max, "
    "MAX(h_cand)::BIGINT AS h_index FROM ghc"
)


def _blocklist_sql(terms: tuple) -> str:
    lst = ", ".join(f"'{t}'" for t in terms)
    return (
        "WITH blr AS (SELECT source, "
        "len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
        "x -> x <> ''))::BIGINT AS n_toks, "
        "len(list_filter(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
        f"x -> x <> ''), x -> x IN ({lst})))::BIGINT AS n_hits FROM documents),\n"
        "bla AS (SELECT source, COUNT(*)::BIGINT AS n_docs, "
        "SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END)::BIGINT AS n_flagged_docs, "
        "SUM(n_toks)::BIGINT AS st, SUM(n_hits)::BIGINT AS sh "
        "FROM blr GROUP BY source)\n"
        "SELECT source, n_docs, n_flagged_docs, "
        "CASE WHEN st > 0 THEN ((1000000 * sh) // st)::BIGINT ELSE 0 END "
        "AS marker_rate_micro FROM bla"
    )


_USER_GINI_SQL = (
    # twin of user_activity_gini: the _DEGREE_GINI_SQL block
    # arithmetic with events-per-user counts as the value column
    "WITH gdeg AS (SELECT user_id AS id, COUNT(*)::BIGINT AS deg "
    "FROM events GROUP BY user_id),\n"
    "h AS (SELECT deg, COUNT(*)::BIGINT AS c FROM gdeg GROUP BY deg),\n"
    "cumh AS (SELECT deg, c, SUM(c) OVER (ORDER BY deg)::BIGINT AS cum FROM h),\n"
    "blocks AS (SELECT deg, c, cum, cum - c AS r, "
    "deg::HUGEINT * (c::HUGEINT * (cum - c) + (c::HUGEINT * (c + 1)) // 2) AS rsum "
    "FROM cumh),\n"
    "tot AS (SELECT SUM(c)::BIGINT AS n, SUM(deg::HUGEINT * c)::BIGINT AS sum_deg, "
    "SUM(rsum)::BIGINT AS ranked_sum FROM blocks),\n"
    "kk AS (SELECT n, sum_deg, ranked_sum, "
    "GREATEST(1, (n + 99) // 100)::BIGINT AS k FROM tot),\n"
    "tm AS (SELECT SUM(GREATEST(0, LEAST(b.cum, kk.n) - GREATEST(b.r, kk.n - kk.k)) "
    "* b.deg)::BIGINT AS top_mass FROM blocks b, kk)\n"
    "SELECT n, sum_deg, ranked_sum, "
    "ROUND(2.0 * ranked_sum / (n::DOUBLE * sum_deg) - (n + 1)::DOUBLE / n, 6) AS gini, "
    "k AS top1pct_k, "
    "ROUND(top_mass::DOUBLE / sum_deg, 6) AS top1pct_share "
    "FROM kk, tm"
)


_HOUR_OF_WEEK_SQL = (
    "WITH hwc AS (SELECT dayofweek(ts)::BIGINT AS dow, hour(ts)::BIGINT AS hod, "
    "COUNT(*)::BIGINT AS n FROM events GROUP BY 1, 2),\n"
    "hwt AS (SELECT SUM(n)::BIGINT AS nt, COUNT(*)::BIGINT AS n_cells FROM hwc),\n"
    "hwp AS (SELECT c.dow, c.hod, c.n, "
    "((1000000 * c.n) // t.nt)::BIGINT AS share_micro, "
    "CAST(ROUND(((c.n::HUGEINT * t.n_cells - t.nt) * (c.n::HUGEINT * t.n_cells - t.nt))::DOUBLE "
    "/ (t.nt::DOUBLE * t.n_cells::DOUBLE) * 1000000.0) AS BIGINT) AS chi2_micro "
    "FROM hwc c CROSS JOIN hwt t)\n"
    "SELECT dow, hod, n, share_micro, "
    "(SELECT SUM(chi2_micro)::BIGINT FROM hwp) AS chi2_total_micro FROM hwp"
)


def _community_size_fit_sql() -> str:
    """Twin of community_size_fit: Louvain level-1 sizes through the
    _POWERLAW_SQL histogram fold."""
    ctes = _louvain_level1_ctes(LOUVAIN_ROUNDS)
    r = LOUVAIN_ROUNDS
    ctes += [
        f"pldeg AS (SELECT label, COUNT(*)::BIGINT AS deg FROM l{r} GROUP BY label)",
        "plh AS (SELECT deg, COUNT(*)::BIGINT AS c FROM pldeg GROUP BY deg)",
        "plb AS (SELECT SUM(c)::BIGINT AS n, MIN(deg)::BIGINT AS d_min, "
        "MAX(deg)::BIGINT AS d_max FROM plh)",
        "plt AS (SELECT b.n, b.d_min, b.d_max, "
        "SUM(h.c * CAST(ROUND(ln((2.0 * h.deg) / (2.0 * b.d_min - 1.0)) "
        "* 1000000.0) AS BIGINT))::BIGINT AS sml, "
        "SUM(h.c * CAST(ROUND(ln(h.c::DOUBLE) * 1000000.0) AS BIGINT))::BIGINT AS shl "
        "FROM plh h CROSS JOIN plb b GROUP BY b.n, b.d_min, b.d_max)",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT n AS n_vertices, d_min, d_max, "
        "CASE WHEN sml > 0 THEN 1000000 + "
        "((1000000000000::HUGEINT * n) // sml)::BIGINT END AS alpha_micro, "
        "(CAST(ROUND(ln(n::DOUBLE) * 1000000.0) AS BIGINT) - shl // n)::BIGINT "
        "AS entropy_micro FROM plt"
    )


def _watermark_sql(delays: tuple) -> str:
    """Twin of watermark_lateness_audit: single global prefix-max by
    arrival order (the oracle needn't be scale-shaped), same integer
    lateness and grid."""
    vals = ", ".join(f"({d})" for d in delays)
    return (
        "WITH wme AS (SELECT event_id, floor(epoch(ts))::BIGINT AS es FROM events),\n"
        "wml AS (SELECT GREATEST(0, COALESCE(MAX(es) OVER "
        "(ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), es) "
        "- es)::BIGINT AS late_s FROM wme),\n"
        "wms AS (SELECT COUNT(*)::BIGINT AS n_events, "
        "ROUND(quantile_cont(late_s, 0.99), 4) AS p99_late_s FROM wml),\n"
        f"wmg(delay_s) AS (VALUES {vals}),\n"
        "wmp AS (SELECT g.delay_s::BIGINT AS delay_s, "
        "SUM(CASE WHEN l.late_s > g.delay_s THEN 1 ELSE 0 END)::BIGINT AS n_late "
        "FROM wml l CROSS JOIN wmg g GROUP BY g.delay_s)\n"
        "SELECT p.delay_s, s.n_events, p.n_late, "
        "((1000000 * p.n_late) // s.n_events)::BIGINT AS late_rate_micro, "
        "s.p99_late_s FROM wmp p CROSS JOIN wms s"
    )


_EDGE_HYGIENE_SQL = (
    # twin of edge_hygiene_audit on the RAW derived edges CTE
    f"WITH {_EDGES_SQL.strip()},\n"
    "ehb AS (SELECT COUNT(*)::BIGINT AS n_raw, "
    "SUM(CASE WHEN src = dst THEN 1 ELSE 0 END)::BIGINT AS n_self_loops FROM edges),\n"
    "ehd AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),\n"
    "ehn AS (SELECT COUNT(*)::BIGINT AS n_distinct FROM ehd),\n"
    "ehm AS (SELECT COUNT(*)::BIGINT AS n_mutual FROM ehd a "
    "JOIN ehd b ON a.src = b.dst AND a.dst = b.src),\n"
    "ehs AS (SELECT COUNT(*)::BIGINT AS n_sources_only FROM "
    "(SELECT DISTINCT src FROM ehd) s WHERE src NOT IN (SELECT dst FROM ehd)),\n"
    "ehk AS (SELECT COUNT(*)::BIGINT AS n_sinks_only FROM "
    "(SELECT DISTINCT dst FROM ehd) t WHERE dst NOT IN (SELECT src FROM ehd))\n"
    "SELECT b.n_raw, b.n_self_loops, "
    "(b.n_raw - b.n_self_loops - n.n_distinct)::BIGINT AS n_dup_directed, "
    "n.n_distinct, s.n_sources_only, k.n_sinks_only, "
    "CASE WHEN n.n_distinct > 0 THEN ((1000000 * m.n_mutual) // n.n_distinct)::BIGINT "
    "ELSE 0 END AS reciprocity_micro "
    "FROM ehb b, ehn n, ehm m, ehs s, ehk k"
)


def _bridging_sql(k: int) -> str:
    """Twin of bridging_coefficient_topk: micro reciprocals summed as
    exact integers, integer-division score, (bc DESC, id ASC) rank."""
    return (
        f"WITH {_EDGES_SPARSE_SQL.strip()},\n"
        "bgd AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src),\n"
        "bgs AS (SELECT u.src AS id, SUM(1000000 // d.deg)::BIGINT AS s_micro "
        "FROM und u JOIN bgd d ON u.dst = d.id GROUP BY u.src),\n"
        "bgc AS (SELECT g.id, g.deg, s.s_micro, "
        "(1000000000000 // (g.deg * s.s_micro))::BIGINT AS bc_micro "
        "FROM bgd g JOIN bgs s ON g.id = s.id)\n"
        "SELECT id, deg, s_micro, bc_micro, rank FROM (SELECT id, deg, s_micro, "
        "bc_micro, ROW_NUMBER() OVER (ORDER BY bc_micro DESC, id ASC)::BIGINT AS rank "
        f"FROM bgc) WHERE rank <= {k}"
    )


_EMB_NORM_SQL = (
    "WITH enp AS (SELECT list_sum(list_transform(embedding, "
    "x -> floor(x::DOUBLE * 1000.0)::BIGINT * floor(x::DOUBLE * 1000.0)::BIGINT"
    "))::HUGEINT AS nsq FROM embeddings),\n"
    "ena AS (SELECT COUNT(*)::BIGINT AS n_vectors, MIN(nsq)::BIGINT AS min_nsq, "
    "MAX(nsq)::BIGINT AS max_nsq, SUM(nsq)::HUGEINT AS s1, "
    "SUM(nsq * nsq)::HUGEINT AS s2, "
    "SUM(CASE WHEN nsq BETWEEN 960400 AND 1040400 THEN 1 ELSE 0 END)::BIGINT "
    "AS n_unit FROM enp)\n"
    "SELECT n_vectors, min_nsq, max_nsq, "
    "((1000000::HUGEINT * s1) // n_vectors)::BIGINT AS mean_nsq_micro, "
    "CAST(ROUND((n_vectors::HUGEINT * s2)::DOUBLE / (s1 * s1)::DOUBLE "
    "* 1000000.0 - 1000000.0) AS BIGINT) AS cv2_micro, "
    "((1000000 * n_unit) // n_vectors)::BIGINT AS frac_unit_micro FROM ena"
)


_DOC_LENGTH_POWERLAW_SQL = (
    "WITH pldeg AS (SELECT len(list_filter(string_split_regex(text, '\\s+'), "
    "x -> x <> ''))::BIGINT AS deg FROM documents),\n"
    "plf AS (SELECT deg FROM pldeg WHERE deg >= 1),\n"
    "plh AS (SELECT deg, COUNT(*)::BIGINT AS c FROM plf GROUP BY deg),\n"
    "plb AS (SELECT SUM(c)::BIGINT AS n, MIN(deg)::BIGINT AS d_min, "
    "MAX(deg)::BIGINT AS d_max FROM plh),\n"
    "plt AS (SELECT b.n, b.d_min, b.d_max, "
    "SUM(h.c * CAST(ROUND(ln((2.0 * h.deg) / (2.0 * b.d_min - 1.0)) "
    "* 1000000.0) AS BIGINT))::BIGINT AS sml, "
    "SUM(h.c * CAST(ROUND(ln(h.c::DOUBLE) * 1000000.0) AS BIGINT))::BIGINT AS shl "
    "FROM plh h CROSS JOIN plb b GROUP BY b.n, b.d_min, b.d_max)\n"
    "SELECT n AS n_vertices, d_min, d_max, "
    "CASE WHEN sml > 0 THEN 1000000 + "
    "((1000000000000::HUGEINT * n) // sml)::BIGINT END AS alpha_micro, "
    "(CAST(ROUND(ln(n::DOUBLE) * 1000000.0) AS BIGINT) - shl // n)::BIGINT "
    "AS entropy_micro FROM plt"
)


def _dup_cluster_size_fit_sql() -> str:
    """Twin of dup_cluster_size_fit: the _dedup_clusters_sql chain's
    cluster sizes through the powerlaw histogram fold."""
    base = _dedup_clusters_sql()
    return (
        f"WITH dcbase AS MATERIALIZED ({base}),\n"
        "pldeg AS (SELECT cluster, MAX(cluster_size)::BIGINT AS deg "
        "FROM dcbase GROUP BY cluster),\n"
        "plh AS (SELECT deg, COUNT(*)::BIGINT AS c FROM pldeg GROUP BY deg),\n"
        "plb AS (SELECT SUM(c)::BIGINT AS n, MIN(deg)::BIGINT AS d_min, "
        "MAX(deg)::BIGINT AS d_max FROM plh),\n"
        "plt AS (SELECT b.n, b.d_min, b.d_max, "
        "SUM(h.c * CAST(ROUND(ln((2.0 * h.deg) / (2.0 * b.d_min - 1.0)) "
        "* 1000000.0) AS BIGINT))::BIGINT AS sml, "
        "SUM(h.c * CAST(ROUND(ln(h.c::DOUBLE) * 1000000.0) AS BIGINT))::BIGINT AS shl "
        "FROM plh h CROSS JOIN plb b GROUP BY b.n, b.d_min, b.d_max)\n"
        "SELECT n AS n_vertices, d_min, d_max, "
        "CASE WHEN sml > 0 THEN 1000000 + "
        "((1000000000000::HUGEINT * n) // sml)::BIGINT END AS alpha_micro, "
        "(CAST(ROUND(ln(n::DOUBLE) * 1000000.0) AS BIGINT) - shl // n)::BIGINT "
        "AS entropy_micro FROM plt"
    )


_Q4_SEMIJOIN_SQL = (
    "SELECT o_orderpriority, COUNT(*)::BIGINT AS order_count FROM orders o "
    "WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
    "AND l.l_shipdate > o.o_orderdate) GROUP BY o_orderpriority"
)


_Q5_LITE_SQL = (
    "WITH q5l AS (SELECT l_suppkey, CAST(ROUND(l_extendedprice * "
    "(1.0 - l_discount) * 100) AS BIGINT) AS rev_cents FROM lineitem)\n"
    "SELECT n.n_name, COUNT(*)::BIGINT AS n_items, "
    "SUM(l.rev_cents)::BIGINT AS revenue_cents "
    "FROM q5l l JOIN supplier s ON l.l_suppkey = s.s_suppkey "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey GROUP BY n.n_name"
)


_BRAND_RETURNS_SQL = (
    "WITH brp AS (SELECT p.p_brand, COUNT(*)::BIGINT AS n_items, "
    "SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT AS n_returned "
    "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey GROUP BY p.p_brand),\n"
    "brt AS (SELECT ((1000000 * SUM(n_returned)) // SUM(n_items))::BIGINT "
    "AS overall_rate_micro FROM brp)\n"
    "SELECT p.p_brand, p.n_items, p.n_returned, "
    "((1000000 * p.n_returned) // p.n_items)::BIGINT AS return_rate_micro, "
    "t.overall_rate_micro FROM brp p CROSS JOIN brt t"
)


def _media_frame_plan_sql() -> str:
    """Twin of media_frame_plan from the synthesis closed form."""
    return f"""
WITH m AS (SELECT unnest(range(0, {N_MEDIA})) AS mid),
fpa AS (SELECT mid, 1 + mid % 2 AS ch, 8000*(1 + mid % 4) AS rate, 50 + mid % 200 AS frames
        FROM m WHERE mid % 3 = 1),
fpv AS (SELECT mid, 208 + mid % 256 AS n_bytes, 1000 + (13*mid) % 5000 AS dur
        FROM m WHERE mid % 3 = 2),
fpu AS (
  SELECT mid::BIGINT AS media_id, 'audio' AS kind,
         (frames*1000 // rate)::BIGINT AS duration_ms,
         (44 + 2*frames*ch)::BIGINT AS n_bytes FROM fpa
  UNION ALL
  SELECT mid::BIGINT, 'video', dur::BIGINT, n_bytes::BIGINT FROM fpv)
SELECT media_id, kind, duration_ms,
  GREATEST(1, duration_ms // 500)::BIGINT AS n_frames,
  (n_bytes // GREATEST(1, duration_ms // 500))::BIGINT AS stride
FROM fpu"""


_STICKINESS_SQL = (
    "WITH ste AS (SELECT DISTINCT user_id, "
    "floor(epoch(date_trunc('day', ts)))::BIGINT AS d FROM events),\n"
    "stu AS (SELECT user_id, COUNT(*)::BIGINT AS nd FROM ste GROUP BY user_id),\n"
    "std_ AS (SELECT COUNT(DISTINCT d)::BIGINT AS n_days FROM ste),\n"
    "stb AS (SELECT COUNT(*)::BIGINT AS n_users, SUM(nd)::BIGINT AS user_days, "
    "SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_multi FROM stu)\n"
    "SELECT b.n_users, d.n_days, b.user_days, "
    "((1000000 * b.user_days) // d.n_days)::BIGINT AS avg_dau_micro, "
    "((1000000 * b.n_multi) // b.n_users)::BIGINT AS multi_day_user_rate_micro "
    "FROM stb b CROSS JOIN std_ d"
)


_SEGMENT_ORDER_SQL = (
    "WITH soj AS (SELECT c.c_mktsegment, o.o_totalprice, "
    "CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents FROM orders o "
    "JOIN customer c ON o.o_custkey = c.c_custkey)\n"
    "SELECT c_mktsegment, COUNT(*)::BIGINT AS n_orders, "
    "ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50_price, "
    "ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price, "
    "(SUM(cents) // COUNT(*))::BIGINT AS mean_cents "
    "FROM soj GROUP BY c_mktsegment"
)


_LANG_SOURCE_ENTROPY_SQL = (
    "WITH lsc AS (SELECT lang, source, COUNT(*)::BIGINT AS c FROM documents "
    "GROUP BY 1, 2),\n"
    "lsa AS (SELECT lang, SUM(c)::BIGINT AS n_docs, COUNT(*)::BIGINT AS n_sources, "
    "SUM(c * CAST(ROUND(ln(c::DOUBLE) * 1000000.0) AS BIGINT))::BIGINT AS so, "
    "MAX(c)::BIGINT AS cmax FROM lsc GROUP BY lang)\n"
    "SELECT lang, n_docs, n_sources, "
    "(CAST(ROUND(ln(n_docs::DOUBLE) * 1000000.0) AS BIGINT) - so // n_docs)::BIGINT "
    "AS entropy_micro, "
    "((1000000 * cmax) // n_docs)::BIGINT AS top_source_share_micro FROM lsa"
)


def _coreness_profile_sql(rounds: int = CORENESS_ORACLE_ROUNDS) -> str:
    """Twin of coreness_profile on the unrolled coreness chain: shell
    histogram + cumulative ≥-k sizes + exact-integer Pearson of
    (degree, core)."""
    ctes = _coreness_ctes(rounds)
    last = f"c{rounds}"
    ctes += [
        "cpd AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src)",
        f"cpj AS (SELECT c.core, d.deg FROM {last} c JOIN cpd d ON c.id = d.id)",
        "cpm AS (SELECT COUNT(*)::BIGINT AS n, SUM(deg)::HUGEINT AS sx, "
        "SUM(core)::HUGEINT AS sy, SUM(deg::HUGEINT * deg) AS sxx, "
        "SUM(core::HUGEINT * core) AS syy, SUM(deg::HUGEINT * core) AS sxy FROM cpj)",
        "cpc AS (SELECT CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 "
        "THEN CAST(ROUND((n * sxy - sx * sy)::DOUBLE "
        "/ sqrt((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE) "
        "* 1000000.0) AS BIGINT) END AS deg_core_corr_micro FROM cpm)",
        f"cph AS (SELECT core, COUNT(*)::BIGINT AS n_vertices FROM {last} GROUP BY core)",
        "cpp AS (SELECT core, n_vertices, SUM(n_vertices) OVER "
        "(ORDER BY core DESC ROWS UNBOUNDED PRECEDING)::BIGINT AS n_cum_ge FROM cph)",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT p.core, p.n_vertices, p.n_cum_ge, c.deg_core_corr_micro "
        "FROM cpp p CROSS JOIN cpc c"
    )


_CAPS_PROFILE_SQL = (
    "WITH cpr AS (SELECT source, "
    "len(regexp_extract_all(text, '[A-Z]'))::BIGINT AS u, "
    "len(regexp_extract_all(text, '[A-Za-z]'))::BIGINT AS a FROM documents),\n"
    "cps AS (SELECT source, u, a, CASE WHEN u * 10 > a * 3 AND a > 0 "
    "THEN 1 ELSE 0 END AS shout FROM cpr),\n"
    "cpa AS (SELECT source, COUNT(*)::BIGINT AS n_docs, SUM(u)::BIGINT AS su, "
    "SUM(a)::BIGINT AS sa, SUM(shout)::BIGINT AS n_shouting_docs "
    "FROM cps GROUP BY source)\n"
    "SELECT source, n_docs, CASE WHEN sa > 0 THEN ((1000000 * su) // sa)::BIGINT "
    "ELSE 0 END AS caps_ratio_micro, n_shouting_docs FROM cpa"
)


_LABEL_BALANCE_SQL = (
    "WITH lbc AS (SELECT label, COUNT(*)::BIGINT AS c FROM embeddings "
    "GROUP BY label),\n"
    "lba AS (SELECT COUNT(*)::BIGINT AS n_labels, SUM(c)::BIGINT AS n_vectors, "
    "MAX(c)::BIGINT AS cmax, MIN(c)::BIGINT AS cmin, "
    "SUM(c * CAST(ROUND(ln(c::DOUBLE) * 1000000.0) AS BIGINT))::BIGINT AS so "
    "FROM lbc)\n"
    "SELECT n_labels, n_vectors, "
    "((1000000 * cmax) // n_vectors)::BIGINT AS max_share_micro, "
    "(CAST(ROUND(ln(n_vectors::DOUBLE) * 1000000.0) AS BIGINT) - so // n_vectors)::BIGINT "
    "AS balance_entropy_micro, "
    "((1000000 * cmax) // cmin)::BIGINT AS imbalance_ratio_micro FROM lba"
)


_REVENUE_HHI_SQL = (
    "WITH rhl AS (SELECT l_suppkey, CAST(ROUND(l_extendedprice * "
    "(1.0 - l_discount) * 100) AS BIGINT) AS cents FROM lineitem),\n"
    "rhp AS (SELECT l_suppkey, SUM(cents)::BIGINT AS rev FROM rhl GROUP BY 1),\n"
    "rhb AS (SELECT COUNT(*)::BIGINT AS n_suppliers, SUM(rev)::BIGINT AS total_cents, "
    "SUM(rev::HUGEINT * rev) AS s2, MAX(rev)::BIGINT AS top1 FROM rhp),\n"
    "rht AS (SELECT SUM(rev)::BIGINT AS t10 FROM "
    "(SELECT rev FROM rhp ORDER BY rev DESC, l_suppkey ASC LIMIT 10))\n"
    "SELECT b.n_suppliers, b.total_cents, "
    "CAST(ROUND(b.s2::DOUBLE / (b.total_cents::DOUBLE * b.total_cents::DOUBLE) "
    "* 1000000.0) AS BIGINT) AS hhi_micro, "
    "((1000000 * b.top1) // b.total_cents)::BIGINT AS top1_share_micro, "
    "((1000000 * t.t10) // b.total_cents)::BIGINT AS top10_share_micro "
    "FROM rhb b CROSS JOIN rht t"
)


_DIGIT_SHARE_SQL = (
    "WITH dts AS (SELECT lang, "
    "len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
    "x -> x <> ''))::BIGINT AS nt, "
    "len(list_filter(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
    "x -> x <> ''), x -> regexp_full_match(x, '[0-9]+')))::BIGINT AS ndig "
    "FROM documents)\n"
    "SELECT lang, SUM(nt)::BIGINT AS n_tokens, SUM(ndig)::BIGINT AS digit_tokens, "
    "CASE WHEN SUM(nt) > 0 THEN ((1000000 * SUM(ndig)) // SUM(nt))::BIGINT "
    "ELSE 0 END AS digit_share_micro FROM dts GROUP BY lang"
)


_PSI_DRIFT_SQL = (
    # twin of psi_value_drift: same integer split/bin arithmetic,
    # Laplace-smoothed 10-bin grid, per-bin micro terms, exact sum
    "WITH pse AS (SELECT event_type, epoch_us(ts) AS m, "
    "CAST(ROUND(value * 1000000) AS BIGINT) AS vm FROM events),\n"
    "psr AS (SELECT event_type, MIN(m) AS m0, MAX(m) AS m1, "
    "MIN(vm) AS v0, MAX(vm) AS v1 FROM pse GROUP BY event_type),\n"
    "psb AS (SELECT e.event_type, "
    "CASE WHEN e.m < (r.m0 + r.m1) / 2 THEN 1 ELSE 0 END AS h, "
    "LEAST(9, ((e.vm - r.v0) * 10) // (r.v1 - r.v0 + 1)) AS bin "
    "FROM pse e JOIN psr r USING (event_type)),\n"
    "psc AS (SELECT event_type, bin, SUM(h)::BIGINT AS c1, "
    "SUM(1 - h)::BIGINT AS c2 FROM psb GROUP BY 1, 2),\n"
    "psg AS (SELECT t.event_type, b.bin, COALESCE(c.c1, 0)::BIGINT AS c1, "
    "COALESCE(c.c2, 0)::BIGINT AS c2 FROM "
    "(SELECT DISTINCT event_type FROM psc) t CROSS JOIN "
    "(SELECT unnest(range(0, 10)) AS bin) b "
    "LEFT JOIN psc c ON c.event_type = t.event_type AND c.bin = b.bin),\n"
    "pst AS (SELECT event_type, SUM(c1)::BIGINT AS n1, SUM(c2)::BIGINT AS n2 "
    "FROM psg GROUP BY event_type),\n"
    "psm AS (SELECT g.event_type, t.n1, t.n2, "
    "CAST(ROUND(((g.c2 + 1)::DOUBLE / (t.n2 + 10)::DOUBLE "
    "- (g.c1 + 1)::DOUBLE / (t.n1 + 10)::DOUBLE) "
    "* ln(((g.c2 + 1)::DOUBLE * (t.n1 + 10)::DOUBLE) "
    "/ ((g.c1 + 1)::DOUBLE * (t.n2 + 10)::DOUBLE)) * 1000000.0) AS BIGINT) AS tm "
    "FROM psg g JOIN pst t USING (event_type))\n"
    "SELECT event_type, MAX(n1)::BIGINT AS n_first, MAX(n2)::BIGINT AS n_second, "
    "SUM(tm)::BIGINT AS psi_micro FROM psm GROUP BY event_type"
)


_REGION_ROLLUP_SQL = (
    "WITH rrl AS (SELECT l_suppkey, CAST(ROUND(l_extendedprice * "
    "(1.0 - l_discount) * 100) AS BIGINT) AS cents FROM lineitem)\n"
    "SELECT r.r_name, n.n_name, COUNT(*)::BIGINT AS n_items, "
    "SUM(l.cents)::BIGINT AS revenue_cents "
    "FROM rrl l JOIN supplier s ON l.l_suppkey = s.s_suppkey "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey "
    "GROUP BY ROLLUP (r.r_name, n.n_name)"
)


_SEASONAL_ANOMALY_SQL = (
    "WITH sae AS (SELECT dayofweek(ts)::BIGINT AS dow, hour(ts)::BIGINT AS hod, "
    "((floor(epoch(ts))::BIGINT // 86400) // 7)::BIGINT AS wk FROM events),\n"
    "sac AS (SELECT dow, hod, wk, COUNT(*)::BIGINT AS c FROM sae GROUP BY 1, 2, 3),\n"
    "sal AS (SELECT MAX(wk) AS lw FROM sac),\n"
    "sag AS (SELECT ce.dow, ce.hod, w.wk, COALESCE(c.c, 0)::BIGINT AS c, l.lw "
    "FROM (SELECT DISTINCT dow, hod FROM sac) ce "
    "CROSS JOIN (SELECT DISTINCT wk FROM sac) w "
    "LEFT JOIN sac c ON c.dow = ce.dow AND c.hod = ce.hod AND c.wk = w.wk "
    "CROSS JOIN sal l),\n"
    "sab AS (SELECT dow, hod, COUNT(*)::BIGINT AS w, SUM(c)::HUGEINT AS s, "
    "SUM(c::HUGEINT * c) AS s2 FROM sag WHERE wk < lw GROUP BY dow, hod),\n"
    "sat AS (SELECT dow, hod, c AS latest_n FROM sag WHERE wk = lw)\n"
    "SELECT b.dow, b.hod, (b.w + 1)::BIGINT AS n_weeks, t.latest_n, "
    "((1000000::HUGEINT * b.s) // b.w)::BIGINT AS baseline_mean_micro, "
    "CASE WHEN b.w >= 2 AND b.w * b.s2 - b.s * b.s > 0 THEN "
    "CAST(ROUND((t.latest_n::HUGEINT * b.w - b.s)::DOUBLE "
    "/ sqrt((b.w * b.s2 - b.s * b.s)::DOUBLE) * 1000000.0) AS BIGINT) END AS z_micro "
    "FROM sab b JOIN sat t ON b.dow = t.dow AND b.hod = t.hod"
)


_ORDER_BACKLOG_SQL = (
    "WITH obo AS (SELECT o_orderstatus, floor(epoch(o_orderdate))::BIGINT AS es, "
    "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders),\n"
    "obm AS (SELECT MAX(es) AS tmax FROM obo),\n"
    "oba AS (SELECT o.o_orderstatus, ((m.tmax - o.es) // 86400)::BIGINT AS age_d, "
    "o.cents FROM obo o CROSS JOIN obm m)\n"
    "SELECT o_orderstatus, COUNT(*)::BIGINT AS n, "
    "ROUND(quantile_cont(age_d, 0.5), 4) AS p50_age_days, "
    "ROUND(quantile_cont(age_d, 0.9), 4) AS p90_age_days, "
    "MAX(age_d)::BIGINT AS max_age_days, SUM(cents)::BIGINT AS value_cents "
    "FROM oba GROUP BY o_orderstatus"
)


_ACCTBAL_SQL = (
    "WITH abu AS (SELECT 'customer' AS entity, c_acctbal AS bal FROM customer "
    "UNION ALL SELECT 'supplier', s_acctbal FROM supplier),\n"
    "abc AS (SELECT entity, bal, CAST(ROUND(bal * 100) AS BIGINT) AS cents FROM abu)\n"
    "SELECT entity, COUNT(*)::BIGINT AS n, "
    "SUM(CASE WHEN bal < 0 THEN 1 ELSE 0 END)::BIGINT AS n_negative, "
    "((1000000 * SUM(CASE WHEN bal < 0 THEN 1 ELSE 0 END)) // COUNT(*))::BIGINT "
    "AS neg_share_micro, "
    "ROUND(quantile_cont(bal, 0.5), 4) AS p50_bal, "
    "ROUND(quantile_cont(bal, 0.9), 4) AS p90_bal, "
    "SUM(cents)::BIGINT AS total_cents FROM abc GROUP BY entity"
)


_PART_TYPE_TOPK_SQL = (
    "WITH ptl AS (SELECT l_partkey, CAST(ROUND(l_extendedprice * "
    "(1.0 - l_discount) * 100) AS BIGINT) AS cents FROM lineitem),\n"
    "pta AS (SELECT p.p_type, COUNT(*)::BIGINT AS n_items, "
    "SUM(l.cents)::BIGINT AS revenue_cents FROM ptl l "
    "JOIN part p ON l.l_partkey = p.p_partkey GROUP BY p.p_type)\n"
    "SELECT p_type, n_items, revenue_cents, rank FROM (SELECT p_type, n_items, "
    "revenue_cents, ROW_NUMBER() OVER (ORDER BY revenue_cents DESC, p_type ASC)"
    "::BIGINT AS rank FROM pta) WHERE rank <= 10"
)


_SQUARE_SURPLUS_SQL = (
    f"WITH {_EDGES_SPARSE_SQL.strip()}, "
    "deg AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src), "
    f"{_WEDGE_SQL}, "
    "ssc AS (SELECT u, v, COUNT(*)::BIGINT AS c FROM wedge GROUP BY u, v),\n"
    "ssq AS (SELECT (SUM(c * (c - 1) // 2) // 2)::BIGINT AS squares FROM ssc),\n"
    "ssm AS (SELECT SUM(deg)::HUGEINT AS s1, SUM(deg::HUGEINT * deg) AS s2 FROM deg)\n"
    "SELECT q.squares, m.s1::BIGINT AS s1, m.s2::BIGINT AS s2, "
    "((1000000::HUGEINT * (m.s2 - m.s1) * (m.s2 - m.s1) * (m.s2 - m.s1) * (m.s2 - m.s1)) "
    "// (8 * m.s1 * m.s1 * m.s1 * m.s1))::BIGINT AS null_micro, "
    "((8000000::HUGEINT * q.squares * m.s1 * m.s1 * m.s1 * m.s1) "
    "// ((m.s2 - m.s1) * (m.s2 - m.s1) * (m.s2 - m.s1) * (m.s2 - m.s1)))::BIGINT "
    "AS surplus_micro "
    "FROM ssq q CROSS JOIN ssm m"
)


_TRANSITION_DWELL_SQL = (
    "WITH tdp AS (SELECT prev_type, next_type, gap_s FROM "
    "(SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "AS prev_type, event_type AS next_type, "
    "(floor(epoch(ts))::BIGINT - LAG(floor(epoch(ts))::BIGINT) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id)) AS gap_s FROM events) "
    "WHERE prev_type IS NOT NULL)\n"
    "SELECT prev_type, next_type, COUNT(*)::BIGINT AS n, "
    "ROUND(quantile_cont(gap_s, 0.5), 4) AS p50_gap_s, "
    "ROUND(quantile_cont(gap_s, 0.9), 4) AS p90_gap_s, "
    "((1000000 * SUM(gap_s)) // COUNT(*))::BIGINT AS mean_gap_s_micro "
    "FROM tdp GROUP BY prev_type, next_type"
)


_BASKET_SIZE_SQL = (
    "WITH pldeg AS (SELECT l_orderkey, COUNT(*)::BIGINT AS deg FROM lineitem "
    "GROUP BY l_orderkey),\n"
    "plh AS (SELECT deg, COUNT(*)::BIGINT AS c FROM pldeg GROUP BY deg),\n"
    "plb AS (SELECT SUM(c)::BIGINT AS n, MIN(deg)::BIGINT AS d_min, "
    "MAX(deg)::BIGINT AS d_max FROM plh),\n"
    "plt AS (SELECT b.n, b.d_min, b.d_max, "
    "SUM(h.c * CAST(ROUND(ln((2.0 * h.deg) / (2.0 * b.d_min - 1.0)) "
    "* 1000000.0) AS BIGINT))::BIGINT AS sml, "
    "SUM(h.c * CAST(ROUND(ln(h.c::DOUBLE) * 1000000.0) AS BIGINT))::BIGINT AS shl "
    "FROM plh h CROSS JOIN plb b GROUP BY b.n, b.d_min, b.d_max)\n"
    "SELECT n AS n_vertices, d_min, d_max, "
    "CASE WHEN sml > 0 THEN 1000000 + "
    "((1000000000000::HUGEINT * n) // sml)::BIGINT END AS alpha_micro, "
    "(CAST(ROUND(ln(n::DOUBLE) * 1000000.0) AS BIGINT) - shl // n)::BIGINT "
    "AS entropy_micro FROM plt"
)


_DISCOUNT_ELASTICITY_SQL = (
    "WITH del AS (SELECT l_returnflag, CAST(ROUND(l_discount * 10000) AS BIGINT) AS x, "
    "CAST(ROUND(l_quantity * 100) AS BIGINT) AS y FROM lineitem),\n"
    "dem AS (SELECT l_returnflag, COUNT(*)::BIGINT AS n, SUM(x)::HUGEINT AS sx, "
    "SUM(y)::HUGEINT AS sy, SUM(x::HUGEINT * x) AS sxx, SUM(y::HUGEINT * y) AS syy, "
    "SUM(x::HUGEINT * y) AS sxy FROM del GROUP BY l_returnflag)\n"
    "SELECT l_returnflag, n, "
    "CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN "
    "CAST(ROUND((n * sxy - sx * sy)::DOUBLE "
    "/ sqrt((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE) "
    "* 1000000.0) AS BIGINT) END AS r_micro, "
    "((100::HUGEINT * sx) // n)::BIGINT AS mean_disc_micro, "
    "((10000::HUGEINT * sy) // n)::BIGINT AS mean_qty_micro FROM dem"
)


_REPEAT_REVENUE_SQL = (
    "WITH rro AS (SELECT o_custkey, COUNT(*)::BIGINT AS n_orders, "
    "SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))::BIGINT AS rev "
    "FROM orders GROUP BY o_custkey)\n"
    "SELECT COUNT(*)::BIGINT AS n_customers, "
    "SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_repeat, "
    "((1000000 * SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)) // COUNT(*))::BIGINT "
    "AS repeat_share_micro, SUM(rev)::BIGINT AS revenue_cents, "
    "((1000000 * SUM(CASE WHEN n_orders >= 2 THEN rev ELSE 0 END)) // SUM(rev))::BIGINT "
    "AS repeat_revenue_micro FROM rro"
)


def _graph_funnel_sql(k: int = KCORE_K, kc_rounds: int = KCORE_ORACLE_ROUNDS,
                      cc_rounds: int = CC_ROUNDS) -> str:
    """Twin of graph_curation_funnel: sparse edge CTEs + the unrolled
    k-core and min-label CC chains, stage counts unioned."""
    ctes = [
        _EDGES_SPARSE_SQL.strip().rstrip(),
        "fcanon AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst)",
        "fverts AS MATERIALIZED (SELECT DISTINCT src AS id FROM und)",
        f"fa0 AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und "
        f"GROUP BY src HAVING COUNT(*) >= {k})",
    ]
    for i in range(1, kc_rounds + 1):
        p = i - 1
        ctes.append(
            f"fa{i} AS (SELECT e.src AS id, COUNT(*)::BIGINT AS deg FROM und e "
            f"JOIN fa{p} x ON e.src = x.id JOIN fa{p} y ON e.dst = y.id "
            f"GROUP BY e.src HAVING COUNT(*) >= {k})"
        )
    ctes.append(f"fcore AS MATERIALIZED (SELECT id FROM fa{kc_rounds})")
    ctes.append("fl0 AS (SELECT id, id AS label FROM fverts)")
    for i in range(1, cc_rounds + 1):
        p = i - 1
        ctes.append(
            f"fl{i} AS (SELECT v.id, LEAST(v.label, COALESCE(m.minl, v.label)) AS label "
            f"FROM fl{p} v LEFT JOIN (SELECT u.dst AS id, MIN(l.label) AS minl FROM und u "
            f"JOIN fl{p} l ON u.src = l.id GROUP BY u.dst) m ON v.id = m.id)"
        )
    last = f"fl{cc_rounds}"
    ctes.append(
        f"fgiant AS (SELECT label FROM (SELECT label, COUNT(*) AS sz FROM {last} "
        "GROUP BY label ORDER BY sz DESC, label ASC LIMIT 1))"
    )
    ctes.append(
        f"fgv AS MATERIALIZED (SELECT l.id FROM {last} l JOIN fgiant g "
        "ON l.label = g.label)"
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT '1_directed' AS stage, (SELECT COUNT(*)::BIGINT FROM fverts) AS n_vertices, "
        "(SELECT COUNT(*)::BIGINT FROM edges) AS n_edges\n"
        "UNION ALL SELECT '2_simple_und', (SELECT COUNT(*)::BIGINT FROM fverts), "
        "(SELECT COUNT(*)::BIGINT FROM fcanon)\n"
        "UNION ALL SELECT '3_core', (SELECT COUNT(*)::BIGINT FROM fcore), "
        "(SELECT COUNT(*)::BIGINT FROM fcanon c JOIN fcore a ON c.src = a.id "
        "JOIN fcore b ON c.dst = b.id)\n"
        "UNION ALL SELECT '4_giant', (SELECT COUNT(*)::BIGINT FROM fgv), "
        "(SELECT COUNT(*)::BIGINT FROM fcanon c JOIN fgv a ON c.src = a.id "
        "JOIN fgv b ON c.dst = b.id)"
    )


def _ivf_nprobe_curve_sql(probes: tuple = (1, 2, 4)) -> str:
    """Twin of ivf_nprobe_curve: one parameterized probe chain per
    nprobe, each wrapped as its own WITH-subquery and unioned."""
    parts = []
    for p in probes:
        parts.append(
            f"SELECT {p}::BIGINT AS nprobe, COUNT(DISTINCT e.query_id)::BIGINT AS n_queries, "
            "COUNT(*)::BIGINT AS sum_exact, "
            "SUM(CASE WHEN a.query_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS sum_overlap, "
            "((1000000 * SUM(CASE WHEN a.query_id IS NOT NULL THEN 1 ELSE 0 END)) "
            "// COUNT(*))::BIGINT AS mean_recall_micro FROM "
            "(SELECT query_id, neighbor_id FROM (SELECT q.qid AS query_id, "
            f"c.vec_id AS neighbor_id, ROUND({_cos_expr('q.qv2', 'c.embedding')}, 6) AS sim, "
            "ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY "
            f"ROUND({_cos_expr('q.qv2', 'c.embedding')}, 6) DESC, c.vec_id ASC) AS rn "
            "FROM embeddings c CROSS JOIN (SELECT vec_id AS qid, embedding AS qv2 "
            "FROM embeddings WHERE vec_id < 5) q WHERE c.vec_id <> q.qid) WHERE rn <= 5) e "
            f"LEFT JOIN (WITH {_ann_ivf_ctes(IVF_STRIDE, p)} "
            "SELECT query_id, neighbor_id FROM ivf_topk) a "
            "ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id"
        )
    return "\nUNION ALL\n".join(parts)


def _simhash_sweep_sql() -> str:
    """Twin of simhash_threshold_sweep on the simhash_neardup chain."""
    return (
        f"WITH {_SIMHASH_CTE}, "
        "bands AS (SELECT doc_id, simhash, b, (simhash >> (15*b)) & 32767 AS bval "
        "FROM sh60 CROSS JOIN (SELECT unnest(range(0, 4)) AS b)),\n"
        "shp AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming "
        "FROM bands a JOIN bands b ON a.b = b.b AND a.bval = b.bval "
        "AND a.doc_id < b.doc_id "
        "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),\n"
        "shh AS (SELECT hamming AS h, COUNT(*)::BIGINT AS n_at FROM shp GROUP BY hamming),\n"
        "shg AS (SELECT unnest(range(0, 4))::BIGINT AS h_threshold)\n"
        "SELECT g.h_threshold, "
        "COALESCE(SUM(CASE WHEN h.h = g.h_threshold THEN h.n_at END), 0)::BIGINT AS n_pairs_at, "
        "COALESCE(SUM(h.n_at), 0)::BIGINT AS n_pairs_cum "
        "FROM shg g LEFT JOIN shh h ON g.h_threshold >= h.h GROUP BY g.h_threshold"
    )


def _pr_damping_sql(n_iters: int = PR_ITERS, k: int = SPEAR_K) -> str:
    """Twin of pagerank_damping_sensitivity: two unrolled PR chains at
    d = 0.85 / 0.5 with prefixed CTE names, head-restricted exact
    Spearman."""
    def chain(prefix: str, d: float) -> list:
        ctes = [
            f"{prefix}outdeg AS MATERIALIZED (SELECT src, COUNT(*)::DOUBLE AS deg "
            "FROM edges GROUP BY src)",
            f"{prefix}r0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM nn) AS rank FROM verts)",
        ]
        for i in range(1, n_iters + 1):
            p = i - 1
            ctes.append(
                f"{prefix}c{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(r.rank/o.deg) AS contrib "
                f"FROM edges e JOIN {prefix}r{p} r ON e.src = r.id "
                f"JOIN {prefix}outdeg o ON e.src = o.src GROUP BY e.dst)"
            )
            ctes.append(
                f"{prefix}dm{i} AS MATERIALIZED (SELECT COALESCE(SUM(rank),0) AS dm "
                f"FROM {prefix}r{p} r WHERE NOT EXISTS "
                f"(SELECT 1 FROM {prefix}outdeg o WHERE o.src = r.id))"
            )
            ctes.append(
                f"{prefix}r{i} AS MATERIALIZED (SELECT v.id, "
                f"(1-{d})/(SELECT n FROM nn) + {d}*(COALESCE(c.contrib,0) "
                f"+ (SELECT dm FROM {prefix}dm{i})/(SELECT n FROM nn)) AS rank "
                f"FROM verts v LEFT JOIN {prefix}c{i} c ON v.id = c.id)"
            )
        return ctes

    ctes = [
        _EDGES_SQL.strip().rstrip(),
        "nn AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS n FROM verts)",
    ]
    ctes += chain("pa_", 0.85)
    ctes += chain("pb_", 0.5)
    ctes += [
        f"pdh AS (SELECT id, ROUND(rank, 6) AS ra FROM pa_r{n_iters} "
        f"ORDER BY ROUND(rank, 6) DESC, id ASC LIMIT {k})",
        f"pdj AS (SELECT h.id, h.ra, ROUND(b.rank, 6) AS rb FROM pdh h "
        f"JOIN pb_r{n_iters} b ON h.id = b.id)",
        "pdr AS (SELECT id, ROW_NUMBER() OVER (ORDER BY ra DESC, id ASC) AS pa, "
        "ROW_NUMBER() OVER (ORDER BY rb DESC, id ASC) AS pb FROM pdj)",
        "pda AS (SELECT COUNT(*)::BIGINT AS k, "
        "SUM((pa - pb) * (pa - pb))::BIGINT AS sum_d2 FROM pdr)",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT k, sum_d2, "
        "(1000000 - (6000000 * sum_d2) // (k * (k * k - 1)))::BIGINT AS spearman_micro "
        "FROM pda"
    )


def _lsh_tables_curve_sql(tables: tuple = (2, 4, 16)) -> str:
    """Twin of lsh_tables_curve: one parameterized LSH chain per
    table count, unioned (the ivf_nprobe_curve shape)."""
    parts = []
    for t in tables:
        parts.append(
            f"SELECT {t}::BIGINT AS num_tables, COUNT(DISTINCT e.query_id)::BIGINT AS n_queries, "
            "COUNT(*)::BIGINT AS sum_exact, "
            "SUM(CASE WHEN a.query_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS sum_overlap, "
            "((1000000 * SUM(CASE WHEN a.query_id IS NOT NULL THEN 1 ELSE 0 END)) "
            "// COUNT(*))::BIGINT AS mean_recall_micro FROM "
            "(SELECT query_id, neighbor_id FROM (SELECT q.qid AS query_id, "
            f"c.vec_id AS neighbor_id, "
            f"ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY "
            f"ROUND({_cos_expr('q.qv2', 'c.embedding')}, 6) DESC, c.vec_id ASC) AS rn "
            "FROM embeddings c CROSS JOIN (SELECT vec_id AS qid, embedding AS qv2 "
            "FROM embeddings WHERE vec_id < 5) q WHERE c.vec_id <> q.qid) WHERE rn <= 5) e "
            f"LEFT JOIN (WITH {_ann_lsh_ctes(t)} "
            "SELECT query_id, neighbor_id FROM lsh_topk) a "
            "ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id"
        )
    return "\nUNION ALL\n".join(parts)


def _degree_drift_ks_sql(mod: int) -> str:
    """Twin of degree_drift_ks on the edge_snapshot_diff slices."""
    def snap(alias: str, cond: str) -> str:
        return (
            f"{alias}e AS (SELECT DISTINCT l_orderkey % {mod} AS src, "
            f"l_partkey % {mod} AS dst FROM lineitem WHERE {cond} "
            f"AND l_orderkey % {mod} <> l_partkey % {mod}),\n"
            f"{alias}u AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM {alias}e "
            f"UNION ALL SELECT dst, src FROM {alias}e)),\n"
            f"{alias}d AS (SELECT src, COUNT(*)::BIGINT AS deg FROM {alias}u GROUP BY src)"
        )

    return (
        "WITH " + snap("ka", "l_linenumber % 2 = 0") + ",\n"
        + snap("kb", "l_quantity <= 40") + ",\n"
        "kh1 AS (SELECT deg, COUNT(*)::BIGINT AS c1 FROM kad GROUP BY deg),\n"
        "kh2 AS (SELECT deg, COUNT(*)::BIGINT AS c2 FROM kbd GROUP BY deg),\n"
        "kg AS (SELECT COALESCE(kh1.deg, kh2.deg) AS deg, "
        "COALESCE(c1, 0)::BIGINT AS c1, COALESCE(c2, 0)::BIGINT AS c2 "
        "FROM kh1 FULL JOIN kh2 ON kh1.deg = kh2.deg),\n"
        "kn1 AS (SELECT COUNT(*)::BIGINT AS n1 FROM kad),\n"
        "kn2 AS (SELECT COUNT(*)::BIGINT AS n2 FROM kbd),\n"
        "kc AS (SELECT deg, SUM(c1) OVER (ORDER BY deg ROWS UNBOUNDED PRECEDING) AS f1, "
        "SUM(c2) OVER (ORDER BY deg ROWS UNBOUNDED PRECEDING) AS f2 FROM kg),\n"
        "kk AS (SELECT c.deg, a.n1, b.n2, "
        "ABS(c.f1::HUGEINT * b.n2 - c.f2::HUGEINT * a.n1) AS gap "
        "FROM kc c CROSS JOIN kn1 a CROSS JOIN kn2 b),\n"
        "kr AS (SELECT deg, n1, n2, gap, ROW_NUMBER() OVER "
        "(ORDER BY gap DESC, deg ASC) AS rn FROM kk)\n"
        "SELECT n1, n2, ((1000000::HUGEINT * gap) // (n1::HUGEINT * n2))::BIGINT "
        "AS ks_micro, deg::BIGINT AS d_at FROM kr WHERE rn = 1"
    )


_LANG_SOURCE_MI_SQL = (
    "WITH mil AS (SELECT lang, COUNT(*)::BIGINT AS c FROM documents GROUP BY lang),\n"
    "mis AS (SELECT source, COUNT(*)::BIGINT AS c FROM documents GROUP BY source),\n"
    "mij AS (SELECT lang, source, COUNT(*)::BIGINT AS c FROM documents GROUP BY 1, 2),\n"
    "mhl AS (SELECT SUM(c)::BIGINT AS n, (CAST(ROUND(ln(SUM(c)::DOUBLE) * 1000000.0) AS BIGINT) "
    "- SUM(c * CAST(ROUND(ln(c::DOUBLE) * 1000000.0) AS BIGINT)) // SUM(c))::BIGINT AS h FROM mil),\n"
    "mhs AS (SELECT (CAST(ROUND(ln(SUM(c)::DOUBLE) * 1000000.0) AS BIGINT) "
    "- SUM(c * CAST(ROUND(ln(c::DOUBLE) * 1000000.0) AS BIGINT)) // SUM(c))::BIGINT AS h FROM mis),\n"
    "mhj AS (SELECT (CAST(ROUND(ln(SUM(c)::DOUBLE) * 1000000.0) AS BIGINT) "
    "- SUM(c * CAST(ROUND(ln(c::DOUBLE) * 1000000.0) AS BIGINT)) // SUM(c))::BIGINT AS h FROM mij)\n"
    "SELECT l.n AS n_docs, l.h AS h_lang_micro, s.h AS h_source_micro, "
    "j.h AS h_joint_micro, (l.h + s.h - j.h)::BIGINT AS mi_micro "
    "FROM mhl l CROSS JOIN mhs s CROSS JOIN mhj j"
)


_VALUE_AUTOCORR_SQL = (
    "WITH vap AS (SELECT event_type, x, y FROM (SELECT event_type, "
    "LAG(CAST(ROUND(value * 1000000) AS BIGINT)) OVER "
    "(PARTITION BY event_type ORDER BY ts, event_id) AS x, "
    "CAST(ROUND(value * 1000000) AS BIGINT) AS y FROM events) WHERE x IS NOT NULL),\n"
    "vam AS (SELECT event_type, COUNT(*)::BIGINT AS n_pairs, SUM(x)::HUGEINT AS sx, "
    "SUM(y)::HUGEINT AS sy, SUM(x::HUGEINT * x) AS sxx, SUM(y::HUGEINT * y) AS syy, "
    "SUM(x::HUGEINT * y) AS sxy FROM vap GROUP BY event_type)\n"
    "SELECT event_type, n_pairs, "
    "CASE WHEN n_pairs * sxx - sx * sx > 0 AND n_pairs * syy - sy * sy > 0 THEN "
    "CAST(ROUND((n_pairs * sxy - sx * sy)::DOUBLE "
    "/ sqrt((n_pairs * sxx - sx * sx)::DOUBLE * (n_pairs * syy - sy * sy)::DOUBLE) "
    "* 1000000.0) AS BIGINT) END AS r_micro FROM vam"
)


def _hh_stability_sql(min_count: int) -> str:
    return (
        "WITH hse AS (SELECT user_id, epoch_us(ts) AS m FROM events),\n"
        "hsr AS (SELECT MIN(m) AS m0, MAX(m) AS m1 FROM hse),\n"
        "hsh AS (SELECT e.user_id, CASE WHEN e.m < (r.m0 + r.m1) / 2 "
        "THEN 1 ELSE 0 END AS h FROM hse e CROSS JOIN hsr r),\n"
        "hsp AS (SELECT user_id, SUM(h)::BIGINT AS c1, SUM(1 - h)::BIGINT AS c2 "
        "FROM hsh GROUP BY user_id),\n"
        "hsf AS (SELECT user_id, c1, c2, "
        f"CASE WHEN c1 >= {min_count} THEN 1 ELSE 0 END AS h1, "
        f"CASE WHEN c2 >= {min_count} THEN 1 ELSE 0 END AS h2 FROM hsp),\n"
        "hsa AS (SELECT SUM(h1)::BIGINT AS n_first, SUM(h2)::BIGINT AS n_second, "
        "SUM(h1 * h2)::BIGINT AS n_both, SUM(h2 * c2)::BIGINT AS mass2, "
        "SUM(h1 * h2 * c2)::BIGINT AS mass2_stable FROM hsf)\n"
        "SELECT n_first, n_second, n_both, "
        "CASE WHEN n_first + n_second - n_both > 0 THEN "
        "((1000000 * n_both) // (n_first + n_second - n_both))::BIGINT ELSE 0 END "
        "AS jaccard_micro, "
        "CASE WHEN mass2 > 0 THEN ((1000000 * mass2_stable) // mass2)::BIGINT "
        "ELSE 0 END AS mass_overlap_micro FROM hsa"
    )


def _pr_mass_sql(n_iters: int = PR_ITERS) -> str:
    """Twin of pagerank_mass_concentration on the unrolled PR chain."""
    ctes = _pagerank_ctes(False, n_iters)
    ctes.append(
        f"pmq AS MATERIALIZED (SELECT id, CAST(ROUND(rank * 1000000000) AS BIGINT) AS r9 "
        f"FROM r{n_iters})"
    )
    ctes.append(
        "pmt AS (SELECT SUM(r9)::BIGINT AS total, COUNT(*)::BIGINT AS n_vertices FROM pmq)"
    )
    parts = []
    for k in (10, 100):
        parts.append(
            f"SELECT {k}::BIGINT AS k, ((1000000 * m.mass) // t.total)::BIGINT "
            "AS mass_share_micro, t.n_vertices FROM "
            f"(SELECT SUM(r9)::BIGINT AS mass FROM (SELECT r9 FROM pmq "
            f"ORDER BY r9 DESC, id ASC LIMIT {k})) m CROSS JOIN pmt t"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(parts)
