"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship PageRank over a dependency-style edge table
derived from sf0.001. ``queries()`` — one entry per implemented operator
from SURVEY.md §2 plus the training-data-pipeline pack; each has a DuckDB
``oracle_sql()`` twin unless genuinely non-SQL-expressible.

Determinism discipline for oracle hash-equality:
- every float column is ROUND()ed identically on both sides, and any
  ranking over floats happens AFTER rounding with an id tie-break;
- aggregates/computed columns carry identical aliases on both sides;
- window orders always include a unique id tie-break column.
"""

from __future__ import annotations

import atexit
import os
import shutil
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

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
# wedge/clustering metrics see realistic sparse-graph structure (mod-301 is
# near-complete at sf≥0.01 — every pair adjacent, link prediction vacuous)


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


# ---------------------------------------------------------------- entry ---

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank top-20 over the sf0.001-derived edge table."""
    sf_dir = "/root/testdata/sf0.001"
    edges = derived_edges(spark, sf_dir)
    ranks, _ = pagerank(
        edges, checkpoint_dir=_tmpdir("metis_entry_"), tol=1e-9, max_iter=100
    )
    # distributed sort + limit FIRST; the unpartitioned ranking window only
    # ever sees the surviving 20 rows (scale-safe global top-k shape)
    top = ranks.select("id", F.round("rank", 6).alias("r6")).orderBy(
        F.desc("r6"), F.asc("id")
    ).limit(20)
    w = Window.orderBy(F.desc("r6"), F.asc("id"))
    return (
        top.withColumn("rn", F.row_number().over(w).cast("long"))
        .select("id", F.col("r6").alias("rank"), "rn")
    )


# ------------------------------------------------------- spark queries ---

def _q_count_by_kind(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _q_global_count(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


def _q_distinct_kinds(spark, sf_dir):
    return _t(spark, sf_dir, "events").select("event_type").distinct()


def _q_sessionize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return sessionize(
        ev, ["user_id"], ["ts", "event_id"], F.col("event_type") == "purchase"
    ).select("event_id", "user_id", "part_index")


SESSION_GAP_MIN = 30  # session-window inactivity gap (minutes)


def _q_session_windows(spark, sf_dir):
    """Native gap-based session windows (F.session_window): per-user
    dynamic windows that merge events closer than the gap — the
    streaming-capable sibling of the lag+cumsum ``sessionize`` (W1).
    session_window is the one windowing primitive whose batch groupBy
    and watermarked streaming aggregation share a plan, so this batch
    twin is what the streaming path (streaming/incremental.py
    streaming_session_windows) is reconciled against. Epoch-second
    bounds; end = last event + gap (Spark's closed-open convention)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("s_epoch"),
            F.unix_timestamp(F.col("session_window.end")).alias("e_epoch"),
            F.col("n_events").cast("long").alias("n_events"),
        )
    )


def _q_forward_fill(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return forward_fill(
        ev,
        ["user_id"],
        ["ts", "event_id"],
        F.when(F.col("event_type") == "signup", F.col("value")),
        "last_signup_value",
    ).select("event_id", "user_id", F.round("last_signup_value", 4).alias("last_signup_value"))


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


def _q_lookup_join(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o["o_custkey"] == c["c_custkey"],
        "left",
    ).select("o_orderkey", "c_mktsegment")


def _q_bit_test(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    flg = (F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 256
    bit6 = flg.bitwiseAND(F.lit(64))
    bit7 = flg.bitwiseAND(F.lit(128))
    result = (
        F.when((bit6 == 0) & (bit7 == 0), 1)
        .when((bit6 != 0) & (bit7 == 0), 0)
        .when((bit7 != 0) & (bit6 == 0), 2)
        .otherwise(-1)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        flg.cast("long").alias("flg"),
        result.cast("long").alias("result"),
    )


def _q_impute(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_size") <= 25)
    joined = li.join(
        p.select("p_partkey", "p_brand", "p_retailprice"),
        li["l_partkey"] == p["p_partkey"],
        "left",
    )
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce("p_brand", F.lit("UNKNOWN")).alias("brand_filled"),
        F.round(F.coalesce("p_retailprice", F.lit(0.0)), 2).alias("price_filled"),
    )


def _q_dedup_sha(spark, sf_dir):
    return DD.exact_dedup_groups(_t(spark, sf_dir, "documents"), "doc_id", "text")


def _q_topk_per_group(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rn")
    )


def _q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_rollup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


def _q_pivot(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    pv = ev.groupBy("user_id").pivot("event_type", kinds).agg(
        F.round(F.sum("value"), 4)
    )
    return pv.select("user_id", *[F.coalesce(F.col(k), F.lit(0.0)).alias(k) for k in kinds])


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


# graph queries -------------------------------------------------------------

def _q_graph_edges(spark, sf_dir):
    return derived_edges(spark, sf_dir)


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


def _q_pagerank(spark, sf_dir):
    edges = derived_edges(spark, sf_dir)
    ranks, _ = pagerank(
        edges,
        checkpoint_dir=_tmpdir("metis_qpr_"),
        tol=0.0,  # run exactly PR_ITERS iterations to mirror the unrolled SQL
        max_iter=PR_ITERS,
    )
    return ranks.select("id", F.round("rank", 6).alias("rank"))


PR_CONV_TOL = 1e-12  # both engines land within ~1e-12 L1 of the unique
# fixpoint; nearest ROUND(,6) boundary on this graph is ≥1.3e-10 away
# (measured at both sf), so the hash compare has two orders of margin
PR_CONV_ORACLE_ITERS = 30  # cold power iteration needs ≤18 at either sf


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


ROB_KS = (0, 8, 64)  # hubs removed per robustness point
ROB_ROUNDS = 24  # min-label flood unroll for the REDUCED graphs (hub
# removal can stretch component diameters past the intact graph's ≤4;
# rounds past each fixpoint are no-ops)


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


COMPONENT_PROFILE_ROUNDS = 12  # min-label unroll depth for the oracle;
# ≥ the dense graph's per-component min-vertex eccentricity (≤4 measured
# at both gate sf); extra rounds are no-ops at the fixpoint


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


SLPA_ROUNDS = 4  # fixed sweeps (oracle-unrollable); unreached stay NULL
SLPA_SEED_MOD = 97  # deterministic seed set: id % 97 == 0, label = id


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


def _q_lpa(spark, sf_dir):
    edges = derived_edges(spark, sf_dir)
    labels, _ = label_propagation(
        edges,
        checkpoint_dir=_tmpdir("metis_qlpa_"),
        max_iter=LPA_ROUNDS,
        stop_when_stable=False,
    )
    return labels


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


def _q_cube(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty")
    )


def _q_set_intersect(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    clickers = ev.where(F.col("event_type") == "click").select("user_id")
    buyers = ev.where(F.col("event_type") == "purchase").select("user_id")
    return clickers.intersect(buyers)


def _q_order_stats(spark, sf_dir):
    """Ordered-set + statistical aggregates: exact interpolated percentiles
    (Spark `percentile` == DuckDB `quantile_cont`), stddev, correlation."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
    )


def _q_lag_delta(spark, sf_dir):
    """LAG analytic: per-user value delta between consecutive events."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("value_delta"),
    )


def _q_json_hour(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00:00").alias("hour"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


SSSP_ROUNDS = 6  # ≥ graph diameter (≤4 at every sf) so BFS has converged
SSSP_W_ROUNDS = 8  # weighted relaxation converges in ≤6 rounds at every sf
# deterministic per-edge weight, reproducible on both engines
_W_EXPR = "(src * 7 + dst * 13) % 10 + 1"


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


WIDEST_ROUNDS = 12  # max-min fixpoint horizon; the query asserts the
# measured convergence fits (rounds past the fixpoint are no-ops)


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


CENTER_K = 5


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


N_WALKS = 64
WALK_LEN = 8


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


N2V_P, N2V_Q = 3, 2  # integer bias multipliers (return / outward)


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


WS_K = 100


def _q_weighted_sample(spark, sf_dir):
    """Deterministic Efraimidis–Spirakis weighted sample (top-100 by
    ln(u)/w priority, w = doc length) — inclusion ∝ n_chars,
    reproducible across engines/cluster sizes
    (operators/sampling.py:weighted_sample_topk)."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "w", F.greatest(F.col("n_chars"), F.lit(1))
    )
    return SAMP.weighted_sample_topk(docs, "doc_id", "w", k=WS_K)


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


LP_EVAL_K = 200  # precision@k cutoff
LP_HOLD_MOD = 4  # hold out ~25% of canonical und pairs by hash


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


LP_NEG_VSAMP_MOD = 16  # vertex-sample modulus for negative-pair generation


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


_CSR_GAP_SQL_TMPL = """
WITH {edges},
gaps AS (SELECT src, dst - LAG(dst) OVER (PARTITION BY src ORDER BY dst) AS gap
         FROM und)
SELECT (length(bin(gap)) - 1)::BIGINT AS gap_bucket, COUNT(*)::BIGINT AS n_gaps
FROM gaps WHERE gap IS NOT NULL GROUP BY 1
"""


N_MEDIA = 200


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


# training-data pack --------------------------------------------------------

def _q_ngram_jaccard(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, min_jaccard=0.8)
    return pairs.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def _q_minhash_lsh(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return DD.minhash_candidates(docs, "doc_id", "text", k=3, num_hashes=8, rows_per_band=2)


def _q_minhash_jaccard(spark, sf_dir):
    """The enforced at-scale dedup composition: MinHash-LSH candidates →
    exact Jaccard verification via array_intersect (no shingle self-join).
    This is the query a 100 TB pipeline ships; ngram_jaccard_dedup is the
    all-pairs baseline it is checked against."""
    docs = _t(spark, sf_dir, "documents")
    cands = DD.minhash_candidates(docs, "doc_id", "text", k=3, num_hashes=8, rows_per_band=2)
    verified = DD.jaccard_verify_pairs(docs, cands, "doc_id", "text", k=3, min_jaccard=0.8)
    return verified.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def _q_simhash(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.repartition(spark.sparkContext.defaultParallelism).select(
        "doc_id", TX.simhash60(TX.tokens(F.col("text"))).alias("simhash")
    )


def _q_simhash_neardup(spark, sf_dir):
    """Hamming≤3 simhash near-dup via 4×15-bit banding (exact recall by
    pigeonhole — no all-pairs scan; verify is one JVM-side bit_count(xor))."""
    docs = _t(spark, sf_dir, "documents")
    return DD.simhash_neardup_pairs(docs, "doc_id", "text", max_hamming=3)


def _q_ann_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5)
    return SIM.cosine_topk(emb, queries_df, "vec_id", "embedding", k=5)


KCENTER_K = 4


def _q_kcenter(spark, sf_dir):
    """Greedy k-center / farthest-first seeds over the embedding corpus
    (operators/similarity.py:kcenter_seeds) — the deterministic
    2-approx diversity seeder; round-before-rank cosine distance."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.kcenter_seeds(emb, "vec_id", "embedding", k=KCENTER_K)


def _kcenter_cos(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)) "
        f"/ (sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE))) "
        f"* sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE))))"
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


def _q_ngram_novelty(spark, sf_dir):
    """Per-doc 3-gram novelty (operators/corpus_stats.py:ngram_novelty):
    fraction of shingles first seen in this doc — the Lee et al.
    novel-token-rate audit over the MinHash path's shingle definition."""
    docs = _t(spark, sf_dir, "documents")
    return CS.ngram_novelty(docs, "doc_id", "text", k=3)


HARDNEG_K = 3


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


LVO_K = 200  # per-language vocabulary head size


def _q_lang_vocab_overlap(spark, sf_dir):
    """Cross-language vocabulary overlap: Jaccard between the top-200
    token heads of every language pair — the cheap code-mixing /
    shared-boilerplate signal a multilingual curation run reports
    (high overlap between supposedly distinct langs ⇒ language-ID or
    contamination trouble). Head selection is (freq DESC, token ASC)
    rank per lang; all counts integer, one rounded ratio."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("tok"),
    )
    freq = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("f"))
    w = Window.partitionBy("lang").orderBy(F.desc("f"), F.asc("tok"))
    head = freq.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= LVO_K
    ).select("lang", "tok")
    sizes = head.groupBy("lang").agg(F.count(F.lit(1)).alias("sz"))
    a = head.select(F.col("lang").alias("lang_a"), "tok")
    b = head.select(F.col("lang").alias("lang_b"), "tok")
    common = (
        a.join(b, "tok")
        .where(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        common.join(sizes.select(F.col("lang").alias("lang_a"), F.col("sz").alias("sa")), "lang_a")
        .join(sizes.select(F.col("lang").alias("lang_b"), F.col("sz").alias("sb")), "lang_b")
        .select(
            "lang_a", "lang_b", "n_common",
            F.round(
                F.col("n_common")
                / (F.col("sa") + F.col("sb") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


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


def _q_sq8_codes(spark, sf_dir):
    """SQ8 scalar-quantized embedding codes (operators/similarity.py:
    scalar_quantize_codes): per-dim min/max scale, floor-coded —
    integer-exact across engines because nothing sums floats."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.scalar_quantize_codes(emb, "vec_id", "embedding")


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


def _q_directed_triads(spark, sf_dir):
    """Directed 3-node motif census on the sparse import graph
    (plans/triangles.py:directed_triad_census): cyclic u→v→w→u vs
    feed-forward u→v→w, u→w — the Milo-style motif signature."""
    from metis_spark.plans.triangles import directed_triad_census

    return directed_triad_census(derived_edges_sparse(spark, sf_dir))


ANN_TABLES, ANN_PLANES = 16, 3       # lsh_bucket_topk / recall-gate params
NEARDUP_TABLES, NEARDUP_PLANES = 24, 3  # sized so every ≥0.4 pair collides


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


IVF_STRIDE, IVF_NPROBE = 25, 4  # 20 lists at sf≤0.01 (80 at sf0.1), probe 4


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


HH_MIN_COUNT = 60


def _q_heavy_hitter_users(spark, sf_dir):
    """Exact heavy hitters via the candidate-pruned two-pass plan
    (operators/sketches.py): per-partition Arrow counting emits provably
    complete candidates; only candidates are shuffled and recounted.
    Output is exact, so the plain GROUP BY/HAVING oracle pins it."""
    from metis_spark.operators.sketches import exact_heavy_hitters

    events = _t(spark, sf_dir, "events")
    return exact_heavy_hitters(events, "user_id", HH_MIN_COUNT)


def _q_hash_sample(spark, sf_dir):
    """Deterministic 10% Bernoulli-by-hash sample of documents — same row
    set on every run/engine/cluster size (operators/sampling.py)."""
    docs = _t(spark, sf_dir, "documents")
    return SAMP.hash_sample(docs, "doc_id", 10, 100).select("doc_id", "lang")


def _q_stratified_sample(spark, sf_dir):
    """Corpus rebalancing: downsample the dominant language (en → 10%),
    keep 50% of the long tail — deterministic per doc_id."""
    docs = _t(spark, sf_dir, "documents")
    out = SAMP.stratified_sample(
        docs, "lang", "doc_id", {"en": (1, 10)}, default=(1, 2), salt="strat"
    )
    return out.select("doc_id", "lang")


def _q_temperature_mix(spark, sf_dir):
    """Temperature-rebalanced (α = 0.5) half-corpus sample: per-language
    quotas ∝ sqrt(n_lang) — upsamples the long tail vs proportional
    draw; integer-exact quotas + hash-rank membership
    (operators/sampling.py:temperature_mixture_sample)."""
    docs = _t(spark, sf_dir, "documents")
    out = SAMP.temperature_mixture_sample(docs, "lang", "doc_id")
    return out.select("doc_id", "lang")


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


def _q_dataset_splits(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment — documents never
    migrate between splits as the corpus grows (operators/sampling.py)."""
    docs = _t(spark, sf_dir, "documents")
    out = SAMP.split_assign(
        docs, "doc_id", [("train", 80), ("val", 10), ("test", 10)]
    )
    return out.select("doc_id", "lang", "split")


CONTAM_K = 5  # decontamination gram width (distinct 5-grams per doc)
CONTAM_BENCH_MOD, CONTAM_BENCH_REM = 11, 3  # deterministic "benchmark" slice
BOILER_MIN_DOCS = 4  # 3-grams in ≥4 docs are corpus-boilerplate (measured:
# ~600-950 such grams at both sf — selective but nonzero)


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


def _q_boilerplate_ngrams(spark, sf_dir):
    """CCNet/C4-style boilerplate signal: fraction of a doc's distinct
    3-grams occurring in ≥ BOILER_MIN_DOCS documents."""
    docs = _t(spark, sf_dir, "documents")
    return CS.boilerplate_ngrams(docs, k=3, min_docs=BOILER_MIN_DOCS)


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


def _q_tfidf_top3(spark, sf_dir):
    """Top-3 characteristic terms per document by tf·ln(N/df)
    (operators/corpus_stats.py)."""
    docs = _t(spark, sf_dir, "documents")
    return CS.tfidf_topk(docs, "doc_id", "text", k=3)


def _q_vocab_top100(spark, sf_dir):
    """Corpus vocabulary heavy hitters: top-100 terms by frequency."""
    docs = _t(spark, sf_dir, "documents")
    return CS.vocab_topk(docs, "doc_id", "text", k=100)


def _q_corpus_divergence(spark, sf_dir):
    """Pairwise Jensen-Shannon divergence between the per-lang unigram
    distributions (operators/corpus_stats.py:corpus_divergence) — the
    training-mixture drift monitor. Per-term log-ratios have only exact
    integer products inside the ln and are quantized to integer
    micro-nats before the exact-decimal accumulation; the only floats
    are two final divisions per pair."""
    docs = _t(spark, sf_dir, "documents")
    return CS.corpus_divergence(docs, slice_col="lang")


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


def _q_bigram_surprisal(spark, sf_dir):
    """Per-document mean conditional bigram surprisal — the fluency
    filter next to unigram_surprisal (shuffled/keyword-stuffed text
    scores high even when every token is common). Same integer
    micro-nat quantization before summation
    (operators/corpus_stats.py:bigram_surprisal)."""
    docs = _t(spark, sf_dir, "documents")
    return CS.bigram_surprisal(docs, "doc_id", "text")


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


def _q_unigram_surprisal(spark, sf_dir):
    """Per-document mean unigram surprisal (the CCNet/Gopher LM-quality
    filter with the corpus's own unigram stats as the LM): per-token
    -ln(freq/T) quantized to integer micro-nats BEFORE summation so
    cross-engine addition order is irrelevant
    (operators/corpus_stats.py:unigram_surprisal)."""
    docs = _t(spark, sf_dir, "documents")
    return CS.unigram_surprisal(docs, "doc_id", "text")


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


def _q_token_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.whitespace_token_count(t).alias("n_ws"),
        TX.bpe_ish_token_count(t).alias("n_bpe"),
        TX.stopword_count(t).alias("n_stop"),
        TX.punct_count(t).alias("n_punct"),
    )


CHUNK_TOK, CHUNK_STRIDE = 64, 48  # context-window slicing: 64-token
# chunks, 16-token overlap


def _q_chunk_plan(spark, sf_dir):
    """Sliding-window chunk plan (operators/packing.py:chunk_plan): one
    row per (doc, context window) with token offsets — the pretraining/
    RAG slicing step as a map-only plan; same whitespace token
    definition as token_stats."""
    docs = _t(spark, sf_dir, "documents")
    from metis_spark.operators.packing import chunk_plan

    return chunk_plan(
        docs, "doc_id", TX.whitespace_token_count(F.col("text")),
        chunk=CHUNK_TOK, stride=CHUNK_STRIDE,
    )


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


ZIPF_TOPN = 100  # fit over the vocab head (the tail is count-quantized)


def _q_zipf_fit(spark, sf_dir):
    """Lexical-health check: least-squares slope/intercept of
    ln(freq) ~ ln(rank) over the top-100 vocabulary — natural corpora
    sit near slope −1 (Zipf); synthetic/templated corpora are flatter.
    Global top-k is a distributed sort-limit; the ranking window and the
    regression see only the surviving 100 rows."""
    docs = _t(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(TX.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = freq.orderBy(F.desc("freq"), F.asc("term")).limit(ZIPF_TOPN)
    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    pts = top.withColumn("rank", F.row_number().over(w)).select(
        F.log("rank").alias("lr"), F.log("freq").alias("lf")
    )
    return pts.agg(
        F.round(F.expr("regr_slope(lf, lr)"), 6).alias("zipf_slope"),
        F.round(F.expr("regr_intercept(lf, lr)"), 6).alias("zipf_intercept"),
    )


def _q_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", F.round(TX.quality_score(F.col("text")), 6).alias("score"))


SHARD_BUDGET = 2048  # tokens per training shard
SHARD_BUCKET = 64  # prefix-sum bucket granularity (doc_id range per bucket)


def _q_training_shards(spark, sf_dir):
    """Concat-and-split training-shard assignment: documents in doc_id
    order, whitespace token counts, shard = start_offset // budget
    (operators/packing.py — two-phase prefix sums, plan-pinned to never
    produce the single-partition global window)."""
    from metis_spark.operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", TX.whitespace_token_count(F.col("text")).alias("tokens")
    )
    return pack_sequences(
        docs, "doc_id", "tokens", budget=SHARD_BUDGET, bucket_size=SHARD_BUCKET
    )


FUNNEL_MIN_TOKENS = 10
FUNNEL_MIN_QUALITY = 0.5


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


def _q_repetition(spark, sf_dir):
    """Gopher-style repetition signals per doc (top-word fraction,
    duplicate-bigram fraction) — the boilerplate/spam filter inputs
    (operators/corpus_stats.py:repetition_stats)."""
    return CS.repetition_stats(_t(spark, sf_dir, "documents"))


# deterministic PII augmentation: the synthetic corpus carries no real
# PII, so both engines append an identical synthetic contact line and the
# scrubber is validated end-to-end on text that actually matches
_PII_SUFFIX_SPARK = lambda: F.concat(  # noqa: E731
    F.col("text"),
    F.lit(" contact user"),
    F.col("doc_id").cast("string"),
    F.lit("@example.com ip 10.0."),
    (F.col("doc_id") % 256).cast("string"),
    F.lit(".1"),
)
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


def _q_pii_scrub(spark, sf_dir):
    """PII redaction audit (functions/text.py:pii_redact/pii_counts):
    per-doc match counts per pattern class + post-redaction length, over
    deterministically PII-augmented text."""
    docs = _t(spark, sf_dir, "documents")
    aug = _PII_SUFFIX_SPARK()
    return docs.select(
        "doc_id",
        *TX.pii_counts(aug),
        F.length(TX.pii_redact(aug)).cast("long").alias("clean_len"),
    )


_LANG_MARKERS = {
    "de": r"\b(der|die|das|und|ist)\b",
    "en": r"\b(the|and|of|to|is)\b",
    "es": r"\b(el|la|y|los|es)\b",
    "fr": r"\b(le|la|et|les|est)\b",
}


def _q_langid(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    scores = {lg: TX.lang_score(t, pat) for lg, pat in _LANG_MARKERS.items()}
    m = F.greatest(*scores.values())
    pred = F.when(m == 0, "und")
    for lg in sorted(scores):  # alphabetical tie-break
        pred = pred.when(scores[lg] == m, lg)
    sel = [F.col("doc_id"), pred.alias("predicted")]
    sel += [F.round(scores[lg], 6).alias(f"s_{lg}") for lg in sorted(scores)]
    return docs.select(*sel)


OOV_VOCAB_K = 100  # head-vocabulary size for the coverage audit


def _q_oov_rate(spark, sf_dir):
    """Vocabulary-coverage audit: per-doc fraction of token OCCURRENCES
    outside the corpus top-K vocabulary — the number that decides
    whether a candidate tokenizer vocabulary is big enough. The K-term
    head is a TakeOrdered result broadcast into an anti-membership
    check; per-doc math stays in one explode + map-side-combining
    groupBy. Docs with zero tokens report NULL."""
    from metis_spark.operators.corpus_stats import vocab_topk

    docs = _t(spark, sf_dir, "documents")
    vocab = F.broadcast(
        vocab_topk(docs, k=OOV_VOCAB_K).select(F.col("term").alias("tok"))
    )
    toks = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok")
    )
    flagged = toks.join(
        vocab.withColumn("in_v", F.lit(1)), "tok", "left"
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok"),
        F.sum(F.when(F.col("in_v").isNull(), 1).otherwise(0))
        .cast("long").alias("n_oov"),
    )
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tok", F.lit(0)).cast("long").alias("n_tok"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.when(
                F.col("n_tok") > 0, F.round(F.col("n_oov") / F.col("n_tok"), 6)
            ).alias("oov_frac"),
        )
    )


def _q_lang_confusion(spark, sf_dir):
    """Language-ID confusion matrix: stored ``lang`` label × the n-gram
    heuristic's prediction, with counts — the accuracy audit run before
    trusting the classifier as a corpus filter. One groupBy over the
    scored docs (same pinned score expressions as ``lang_id``)."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    scores = {lg: TX.lang_score(t, pat) for lg, pat in _LANG_MARKERS.items()}
    m = F.greatest(*scores.values())
    pred = F.when(m == 0, "und")
    for lg in sorted(scores):
        pred = pred.when(scores[lg] == m, lg)
    return (
        docs.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _q_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))


def _q_corpus_curation(spark, sf_dir):
    """End-to-end training-data curation: exact-dedup (keep lowest doc_id)
    → quality gate (score ≥ 0.5) → per-doc BPE-ish token counts.

    The composition a 100 TB pre-training pipeline runs nightly: one
    hash shuffle for the dedup, then narrow scoring expressions — no
    joins wider than the corpus itself.
    """
    docs = _t(spark, sf_dir, "documents")
    hashed = docs.select("doc_id", "text", F.md5("text").alias("h"))
    keep = hashed.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    kept = hashed.join(keep, ["h", "doc_id"]).select("doc_id", "text")
    t = F.col("text")
    scored = kept.select(
        "doc_id",
        F.round(TX.quality_score(t), 6).alias("score"),
        TX.bpe_ish_token_count(t).alias("n_tokens"),
    )
    return scored.where(F.col("score") >= 0.5)


LINKPRED_K = 50
HUB_CAP = 128  # wedge-center degree bound for the link predictors


def _q_local_clustering(spark, sf_dir):
    return local_clustering(derived_edges_sparse(spark, sf_dir))


def _q_assortativity(spark, sf_dir):
    return degree_assortativity(derived_edges_sparse(spark, sf_dir))


def _q_adamic_adar(spark, sf_dir):
    return adamic_adar_topk(
        derived_edges_sparse(spark, sf_dir), k=LINKPRED_K, hub_cap=HUB_CAP
    )


def _q_vertex_jaccard(spark, sf_dir):
    return vertex_jaccard_topk(
        derived_edges_sparse(spark, sf_dir), k=LINKPRED_K, hub_cap=HUB_CAP
    )


def _q_square_count(spark, sf_dir):
    """Global 4-cycle count (plans/metrics.py square_count): the motif
    one step past triangles — ½ Σ C(c_uv, 2) over the SAME hub-capped
    wedge plan the link predictors use (identical cap in the oracle)."""
    from metis_spark.plans.metrics import square_count

    return square_count(derived_edges_sparse(spark, sf_dir), hub_cap=HUB_CAP)


def _q_four_cliques(spark, sf_dir):
    """Exact global 4-clique count next to the triangle count
    (plans/triangles.py:four_clique_count, kClist ordered enumeration on
    the degree-oriented DAG — every clique generated exactly once from
    its two lowest-order vertices). The 4-clique/triangle ratio is the
    motif signature that flags link-ring neighborhoods before they
    dominate triangles."""
    from metis_spark.plans.triangles import four_clique_count

    return four_clique_count(derived_edges_sparse(spark, sf_dir))


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


SWEEP_L = 64
SWEEP_SEED_MOD = 97
SWEEP_ITERS = 5


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


EMB_K = 100


def _q_edge_embeddedness(spark, sf_dir):
    """Top-100 edges by embeddedness |N(a) ∩ N(b)| with neighborhood
    Jaccard (plans/metrics.py:edge_embeddedness) — the tie-strength /
    strong-triadic-closure signal; all-integer ranking key."""
    from metis_spark.plans.metrics import edge_embeddedness

    return edge_embeddedness(derived_edges_sparse(spark, sf_dir), k=EMB_K)


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


SCANSTAT_K = 100


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


def _q_pref_attach(spark, sf_dir):
    """Preferential-attachment predictor over non-adjacent 2-hop pairs
    (full degrees; wedge cap bounds candidate generation only)."""
    from metis_spark.plans.metrics import preferential_attachment_topk

    return preferential_attachment_topk(
        derived_edges_sparse(spark, sf_dir), k=LINKPRED_K, hub_cap=HUB_CAP
    )


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


COOC_K, COOC_CAP = 50, 100


def _q_copart_topk(spark, sf_dir):
    """Top-50 part pairs co-occurring in orders — the bipartite projection
    a recommender/co-import analysis starts from
    (operators/corpus_stats.py:cooccurrence_topk, capped wedge join)."""
    li = _t(spark, sf_dir, "lineitem")
    return CS.cooccurrence_topk(
        li, "l_orderkey", "l_partkey", k=COOC_K, group_cap=COOC_CAP
    )


SCC_PHASES, SCC_ROUNDS = 3, 10  # measured: 2 phases at sf0.001, 1 at sf0.01;
# min-label propagation settles well inside 10 rounds on the mod-301 graph


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


BOWTIE_REACH_ROUNDS = 24  # reach-fixpoint unroll for the bow-tie BFS
# sets (directed fwd/bwd, core-free, weak); the query asserts every
# measured fixpoint lands strictly inside this, and unroll rounds past
# a fixpoint are set-union no-ops


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


DAG_ROUNDS = 6  # ≥ condensation-DAG longest path at every sf (measured ≤ 1)


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


DEG_PCTS = [0.5, 0.9, 0.99, 1.0]


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


def _q_events_in_windows(spark, sf_dir):
    """Bucketed interval-containment join: all events falling inside each
    low-user activity window — an equi-join on time buckets, never a
    BroadcastNestedLoopJoin (operators/windows.py:interval_join)."""
    from metis_spark.operators.windows import interval_join

    events = _t(spark, sf_dir, "events")
    iv = (
        events.where(F.col("user_id") < 3)
        .groupBy(F.col("user_id").alias("w_user"))
        .agg(F.min("ts").alias("t_start"), F.max("ts").alias("t_end"))
    )
    return interval_join(
        events.select("event_id", "ts", "user_id"), iv
    ).select("event_id", "user_id", "w_user")


def _q_window_distinct(spark, sf_dir):
    """Exact distinct users per tumbling hour window × event_type — the
    batch twin of streaming_windowed_distinct (streaming/incremental.py),
    which keeps an O(1) HLL++ sketch per open window because exact
    COUNT(DISTINCT) is unsupported on streams. One shuffle keyed by
    (window, event_type); epoch-hour tumbling windows align F.window
    with date_trunc('hour') exactly (session TZ pinned UTC)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("w_epoch"),
            "event_type",
            F.col("n_users").cast("long").alias("n_users"),
            F.col("n_events").cast("long").alias("n_events"),
        )
    )


CROSS_N = 5  # threshold-crosser count


def _q_threshold_crossers(spark, sf_dir):
    """The event at which each user's cumulative count crosses N — the
    batch twin of streaming_threshold_crossers (streaming/
    incremental.py, applyInPandasWithState emit-once state machine).
    One per-user rank window over (ts, event_id)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == CROSS_N)
        .select(
            "user_id",
            F.col("ts").alias("crossed_at"),
            F.lit(CROSS_N).cast("long").alias("nth"),
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


DEDUP_CC_ROUNDS = 8  # candidate-graph diameter bound for the unrolled oracle


def _q_dedup_clusters(spark, sf_dir):
    """The at-scale dedup ENDGAME: MinHash-LSH candidate pairs become an
    undirected similarity graph, connected components gives each document
    its duplicate-cluster id (min doc_id), plus the cluster size — the
    table a training pipeline joins against to keep one representative
    per cluster. Composition of two already-verified operators."""
    docs = _t(spark, sf_dir, "documents")
    cands = DD.minhash_candidates(docs, "doc_id", "text", k=3, num_hashes=8, rows_per_band=2)
    edges = cands.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    labels, _ = connected_components(
        edges, max_iter=DEDUP_CC_ROUNDS, checkpoint_dir=_tmpdir("metis_qdclus_")
    )
    sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "component").select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
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


def _q_neardup_keep_best(spark, sf_dir):
    """Near-dup curation ENDGAME: MinHash clusters (dedup_clusters'
    machinery) joined with quality_score, keeping the HIGHEST-quality
    representative per cluster (score desc, doc_id asc ties); documents
    in no cluster represent themselves. This is the row a 100 TB
    pipeline actually writes — dedup that keeps the best copy, not an
    arbitrary one. One extra broadcast-size join + a per-cluster window
    over ≤cluster_size rows on top of two verified operators."""
    docs = _t(spark, sf_dir, "documents")
    cands = DD.minhash_candidates(
        docs, "doc_id", "text", k=3, num_hashes=8, rows_per_band=2
    )
    edges = cands.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    labels, _ = connected_components(
        edges, max_iter=DEDUP_CC_ROUNDS, checkpoint_dir=_tmpdir("metis_qnkb_")
    )
    scored = docs.select(
        "doc_id", F.round(TX.quality_score(F.col("text")), 6).alias("score")
    )
    joined = scored.join(
        labels.select(F.col("id").alias("doc_id"), F.col("component").alias("cl")),
        "doc_id",
        "left",
    ).select("doc_id", F.coalesce("cl", "doc_id").alias("cluster"), "score")
    w = Window.partitionBy("cluster").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "cluster", "score")
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


KATZ_ALPHA = 0.01
KATZ_ITERS = 5


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


HITS_ITERS = 3


SALSA_ITERS = 3
PSALSA_SEED_MOD = 10  # personalized-SALSA seed rule, same as ppr_5iter


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


RICH_CLUB_KS = [4, 8, 16, 32]  # degree thresholds; spine rows survive n_k=0


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


KCORE_K = 3
KCORE_ORACLE_ROUNDS = 12  # oracle unroll depth; fixpoint is idempotent so
# any depth ≥ the measured peel depth matches — the pytest suite pins the
# measured depth at test scale well under this


CORENESS_ORACLE_ROUNDS = 18  # measured h-index fixpoint: 8 / 14 rounds
# at sf0.001 / sf0.01; extra rounds past the fixpoint are no-ops, so the
# fixed-round oracle equals the converge-and-stop Spark run


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


def _coreness_sql(rounds: int = CORENESS_ORACLE_ROUNDS, und: str = "und") -> str:
    """Unrolled h-index iteration twin on the sparse und graph:
    c_{t+1}(v) = max over desc-ranked neighbour values of
    least(value, rank). ``und`` names the symmetric edge CTE so the
    decremental twin can run the identical rounds on a reduced set."""
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
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, core FROM c{rounds}"


WCORE_W_MOD = 7  # md5-hash edge weights in 1..7 — small integer
# multiplicities keep the multigraph core values (and so the h-index
# round count) in the same regime as the unweighted decomposition
WCORENESS_ORACLE_ROUNDS = 32  # measured weighted fixpoint: 27 / 23
# rounds at sf0.001 / sf0.01 (weights stretch the h-index descent past
# the unweighted 8/14); rounds past the fixpoint are no-ops


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


CORENESS_DEC_MOD = 5  # deletion rule: drop sparse edges with
# (src*31 + dst) % 5 == 0 (~20% of the canonical edge set)


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


DENSEST_EPS_TENTHS = 5  # eps=0.5: the standard 3-approx threshold 3e/n
DENSEST_ORACLE_ROUNDS = 26  # >= log_{1.5}(n) at the gate scales (each
# round keeps < n/(1+eps) vertices); rounds past the empty fixpoint are
# no-ops — the query asserts the measured count fits


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


WL_ROUNDS = 3


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


N_BETW_SOURCES = 8
BETW_ROUNDS = 10  # ≥ measured source eccentricity on the sparse graph
# (8 at sf0.001, 4 at sf0.01); the Spark query asserts depth ≤ this


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


KTRUSS_K = 4
KTRUSS_ORACLE_ROUNDS = 10  # oracle unroll depth; peeling fixpoint is
# idempotent, so any depth ≥ the measured cascade matches — asserted below


ANF_ROUNDS = 3  # out-reach horizon: exact pair table stays feasible (≤7M
# pairs at sf0.01) while the curve still spans 3 decades of growth
ANF_MASKS = 32  # FM sketches per vertex: 256 B state, ~10% curve error


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


DIAM_ROUNDS = 16  # ≥ measured double-sweep eccentricities on the sparse graph


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


LOUVAIN_ROUNDS = 2


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


def _louvain_level2_ctes(rounds: int) -> list:
    """The unrolled level-2 CTE chain on top of l{rounds}: quotient
    multigraph (qe/qstr/qeo) + ``rounds`` weighted sweeps → q{rounds}."""
    r = rounds
    ctes = [
        f"qe AS MATERIALIZED (SELECT la.label AS src, lb.label AS dst, "
        f"COUNT(*)::BIGINT AS w FROM und e JOIN l{r} la ON e.src = la.id "
        f"JOIN l{r} lb ON e.dst = lb.id GROUP BY la.label, lb.label)",
        "qstr AS MATERIALIZED (SELECT src AS id, SUM(w)::BIGINT AS s "
        "FROM qe GROUP BY src)",
        "qeo AS MATERIALIZED (SELECT src, dst, w FROM qe WHERE src <> dst)",
        "q0 AS MATERIALIZED (SELECT id, id AS label FROM qstr)",
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


SPEC_COLOR_ORACLE_ROUNDS = 10  # measured trial-and-revoke fixpoint:
# 3 / 4 / 4 rounds at sf0.001 / 0.01 / 0.1 — density-independent, so one
# unroll depth covers every scale (post-fixpoint rounds are no-ops:
# no pending vertices remain)


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


MIS_ORACLE_ROUNDS = 12  # ≥ measured Luby rounds on the sparse graph at all sf


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


TRUSSNESS_ORACLE_ROUNDS = 40  # measured edge-h-index fixpoint: 3 / 3 / 35
# rounds at sf0.001 / sf0.01 / sf0.1 (the mod-4096 graph densifies with
# sf, and h-index rounds grow with triangle density); rounds past the
# fixpoint are no-ops, so the fixed-round oracle equals the
# converge-and-stop Spark run — unrolling 40 rounds costs nothing at the
# gate scales (te is ~24k rows at sf0.01)


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


ONION_ROUNDS = 80  # onion layer-count unroll bound (measured 16 / 46 / 57
# at sf0.001/0.01/0.1 — layer count grows with density; rounds past
# exhaustion are no-ops — the query asserts the measured count fits)


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


TRUSS_DEC_MOD = 7  # deletion rule: drop sparse edges with
# (src * 31 + dst) % 7 == 0 (~14% of the canonical directed edge set)


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


MSF_ORACLE_ROUNDS = 8  # Borůvka outer unroll: fragments at least halve
# per round, so rounds ≤ log2(#vertices); rounds past convergence choose
# no edges and are no-ops, so the fixed-round oracle equals the
# converge-and-stop Spark run (the query asserts the measured count fits)
MSF_INNER_J = 12  # hash-min contraction unroll per round: ≥ the longest
# min-edge chain in any round's fragment forest (measured ≤ 4 at the
# gate scales; hash-random weights keep chains O(log)); extra steps are
# no-ops — the query asserts the measured max fits


def _msf_weight_col() -> F.Column:
    """Deterministic distinct edge weight both engines can replay: the
    md5→60-bit trick on the canonical "s_d" pair string."""
    pair = F.concat_ws(
        "_",
        F.least("src", "dst").cast("string"),
        F.greatest("src", "dst").cast("string"),
    )
    return F.conv(F.substring(F.md5(pair), 1, 15), 16, 10).cast("long")


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


MATCHING_ORACLE_ROUNDS = 12  # locally-dominant rounds unroll: measured
# fixpoint well under this at the gate scales (O(log n) expected on
# hash-random priorities); rounds past the fixpoint match no new edges
# and are no-ops — the query asserts the measured count fits


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


HEC_MAXP = 1 << 60  # heavy-edge priority inversion: p = 2^60 − weight


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


PARTITION_K = 8  # balanced k-way partition fan-out
PARTITION_EPS10 = 1  # balance slack in tenths: cap = floor(1.1 * n / k)


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


TEMPORAL_SEED_MOD = 512  # seeds: vertices with id % 512 == 0
TEMPORAL_TS_MOD = 1000  # hash-derived edge timestamps in [0, 1000)
TEMPORAL_ORACLE_ROUNDS = 24  # Bellman-Ford unroll ≥ max hop count of an
# optimal temporal path (measured 6 / 5 at sf0.001 / sf0.01); rounds
# past the fixpoint are no-ops — the query asserts the measured count
TEMPORAL_INF = 1 << 60


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


AFFINITY_LEVEL = 2  # affinity clustering level: fragments after 2
# Borůvka rounds (level 1 is near-trivial pairing on this graph)


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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # ---- round-3/4 families first: the driver correctness gate
        # ---- samples the FIRST 50 entries (VERDICT r3 action item 2)

        "coreness": _q_coreness,
        "score_weighted": _q_score_weighted,
        "trussness": _q_trussness,
        "onion_layers": _q_onion,
        "maximal_matching": _q_maximal_matching,
        "minimum_spanning_forest": _q_msf,
        "temporal_reachability": _q_temporal_reachability,
        "temporal_latest_departure": _q_temporal_latest_departure,
        "temporal_fastest_path": _q_temporal_fastest,
        "linkpred_auc": _q_linkpred_auc,
        "partition_assignment": _q_partition_assignment,
        "partition_quality": _q_partition_quality,
        "densest_subgraph": _q_densest,
        "unigram_surprisal": _q_unigram_surprisal,
        "wl_colors_3": _q_wl_colors,
        "wl_class_histogram": _q_wl_class_histogram,
        "scan_statistic": _q_scan_statistic,
        "corpus_js_divergence": _q_corpus_divergence,
        "four_clique_count": _q_four_cliques,
        "edge_betweenness": _q_edge_betweenness,
        "ppr_sweep_cut": _q_ppr_sweep_cut,
        "bigram_surprisal": _q_bigram_surprisal,
        "attribute_assortativity": _q_attr_assortativity,
        "widest_path": _q_widest_path,
        "temporal_shortest_path": _q_temporal_shortest,
        "edge_embeddedness": _q_edge_embeddedness,
        "louvain_2round": _q_louvain,
        "louvain_2level": _q_louvain_multilevel,
        "louvain_modularity_levels": _q_louvain_trajectory,
        "greedy_coloring": _q_coloring,
        "speculative_coloring": _q_spec_coloring,
        "maximal_independent_set": _q_mis,
        "node2vec_walks": _q_node2vec,
        "betweenness_approx": _q_betweenness,
        "katz_5iter": _q_katz,
        "eigencentrality_5iter": _q_eigen,
        "salsa_3iter": _q_salsa,
        "salsa_personalized": _q_salsa_personalized,
        "bipartite_check": _q_bipartite,
        "closeness_landmarks": _q_closeness,
        "graph_center_landmarks": _q_center,
        "diameter_double_sweep": _q_diameter,
        "bowtie_structure": _q_bowtie,
        "directed_triads": _q_directed_triads,
        "square_count": _q_square_count,
        "resource_allocation_topk": _q_resource_alloc,
        "preferential_attachment_topk": _q_pref_attach,
        "transitivity_global": _q_transitivity,
        "rich_club": _q_rich_club,
        "avg_neighbor_degree": _q_avg_neighbor_degree,
        "degree_percentiles": _q_degree_percentiles,
        "seeded_lpa": _q_seeded_lpa,
        "cc_incremental": _q_cc_incremental,
        "edge_snapshot_diff": _q_edge_diff,
        "pagerank_incremental": _q_pagerank_incremental,
        "component_profile": _q_component_profile,
        "neighborhood_function": _q_neighborhood_function,
        "anf_sketch": _q_anf_sketch,
        "anf_effective_diameter": _q_anf_effective_diameter,
        "robustness_curve": _q_robustness_curve,
        "robustness_random": _q_robustness_random,
        "coreness_decremental": _q_coreness_decremental,
        "trussness_decremental": _q_trussness_decremental,
        "affinity_clusters_l2": _q_affinity_clusters,
        "heavy_edge_coarsen": _q_heavy_edge_coarsen,
        "community_quotient": _q_community_quotient,
        "community_pagerank": _q_community_pagerank,
        "kcenter_seeds": _q_kcenter,
        "training_shards": _q_training_shards,
        # ---- earlier rounds (reference-semantics pack, link-graph core,
        # ---- training-data pipeline) — all still oracle-gated by name

        "count_by_kind": _q_count_by_kind,          # A1
        "global_count": _q_global_count,            # A2
        "distinct_kinds": _q_distinct_kinds,        # A3
        "sessionize_part_index": _q_sessionize,     # W1
        "forward_fill": _q_forward_fill,            # W2
        "asof_fallback_join": _q_asof_fallback,     # J2/W3
        "lookup_join": _q_lookup_join,              # J1
        "bit_test_result": _q_bit_test,             # F2
        "impute_defaults": _q_impute,               # F5
        "dedup_by_hash": _q_dedup_sha,              # S7/F6
        "topk_per_group": _q_topk_per_group,        # W4
        "tpch_q1_agg": _q_tpch_q1,                  # A1-class agg
        "anti_join_missing": _q_anti_join,          # §2.6 set ops
        "running_total": _q_running_total,          # W1-class frame
        "rollup_counts": _q_rollup,                 # grouping sets
        "cube_counts": _q_cube,                     # grouping sets (cube)
        "pivot_event_values": _q_pivot,             # pivot
        "set_intersect_users": _q_set_intersect,    # §2.6 set ops
        "json_hour_extract": _q_json_hour,          # F7 timestamps + JSON
        "order_stats": _q_order_stats,              # percentiles/stddev/corr
        "lag_value_delta": _q_lag_delta,            # LAG analytic
        "graph_edges": _q_graph_edges,
        "graph_degrees": _q_graph_degrees,
        "pagerank_5iter": _q_pagerank,
        "pagerank_weighted": _q_pagerank_weighted,
        "hits_3iter": _q_hits,
        "ppr_5iter": _q_ppr,
        "connected_components": _q_connected_components,
        "strongly_connected_components": _q_scc,
        "dag_levels": _q_dag_levels,
        "label_propagation_2iter": _q_lpa,
        "community_modularity": _q_modularity,
        "degree_histogram": _q_degree_histogram,
        "graph_summary": _q_graph_summary,
        "events_in_windows": _q_events_in_windows,
        "window_distinct_users": _q_window_distinct,
        "threshold_crossers": _q_threshold_crossers,
        "session_windows": _q_session_windows,
        "reciprocity": _q_reciprocity,
        "dedup_clusters": _q_dedup_clusters,
        "neardup_keep_best": _q_neardup_keep_best,
        "copart_topk": _q_copart_topk,
        "triangle_count": _q_triangles,
        "triangles_per_vertex": _q_triangles_per_vertex,
        "csr_adjacency": _q_csr,
        "sssp_hops": _q_sssp,
        "sssp_weighted": _q_sssp_weighted,
        "landmark_distances": _q_landmark_distances,
        "harmonic_landmarks": _q_harmonic,
        "random_walks": _q_random_walks,
        "walk_sentences": _q_walk_sentences,
        "local_clustering": _q_local_clustering,
        "degree_assortativity": _q_assortativity,
        "adamic_adar_topk": _q_adamic_adar,
        "vertex_jaccard_topk": _q_vertex_jaccard,
        "kcore_3": _q_kcore,
        "ktruss_4": _q_ktruss,
        "chunk_plan": _q_chunk_plan,
        "embedding_dedup_clusters": _q_embedding_dedup_clusters,
        "sq8_codes": _q_sq8_codes,
        "ngram_novelty": _q_ngram_novelty,
        "lang_vocab_overlap": _q_lang_vocab_overlap,
        "hard_negatives": _q_hard_negatives,
        "csr_gap_histogram": _q_csr_gap_histogram,
        "linkpred_eval": _q_linkpred_eval,
        "weighted_sample_docs": _q_weighted_sample,
        "media_decode_stats": _q_media_decode,
        "media_feature_dims": _q_media_features,
        "ngram_jaccard_dedup": _q_ngram_jaccard,
        "minhash_lsh_candidates": _q_minhash_lsh,
        "minhash_jaccard_dedup": _q_minhash_jaccard,
        "simhash_fingerprint": _q_simhash,
        "simhash_neardup_h3": _q_simhash_neardup,
        "ann_cosine_topk": _q_ann_topk,
        "ann_lsh_bucketed": _q_ann_lsh,
        "ann_lsh_recall": _q_ann_lsh_recall,
        "ann_ivf_topk": _q_ann_ivf,
        "embedding_cluster_sizes": _q_embedding_cluster_sizes,
        "ann_ivf_recall": _q_ann_ivf_recall,
        "embedding_neardup": _q_embedding_neardup,
        "heavy_hitter_users": _q_heavy_hitter_users,
        "hash_sample_docs": _q_hash_sample,
        "stratified_sample_docs": _q_stratified_sample,
        "dataset_splits": _q_dataset_splits,
        "temperature_mix_sample": _q_temperature_mix,
        "tfidf_top3": _q_tfidf_top3,
        "vocab_top100": _q_vocab_top100,
        "token_stats": _q_token_stats,
        "quality_score": _q_quality,
        "filter_funnel": _q_filter_funnel,
        "repetition_stats": _q_repetition,
        "benchmark_contamination": _q_benchmark_contamination,
        "zipf_fit": _q_zipf_fit,
        "boilerplate_ngrams": _q_boilerplate_ngrams,
        "pii_scrub": _q_pii_scrub,
        "lang_id": _q_langid,
        "lang_confusion": _q_lang_confusion,
        "oov_rate": _q_oov_rate,
        "doc_fingerprint": _q_fingerprint,
        "corpus_curation": _q_corpus_curation,
    }


# ------------------------------------------------------------- oracles ---

_DEG_SQL = "deg AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src)"
# capped wedge join: the DuckDB twin of plans/metrics._wedges — centers with
# deg(w) > HUB_CAP dropped before the self-join, identical to the Spark plan
_WEDGE_SQL = (
    "wedge AS (SELECT h1.dst AS u, h2.dst AS v, h1.src AS w, d.deg AS deg_w "
    "FROM und h1 JOIN und h2 ON h1.src = h2.src AND h1.dst < h2.dst "
    "JOIN deg d ON d.id = h1.src WHERE d.deg <= {cap})"
).format(cap=HUB_CAP)


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


def _pagerank_sql(weighted: bool = False, n_iters: int = PR_ITERS) -> str:
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


def _eigen_sql() -> str:
    """Unrolled eigenvector-centrality twin of plans/spectral.py:
    y_k = A·x̂_{k-1} over und, x̂_k = y_k/‖y_k‖₂, x̂_0 = 1/√n."""
    n_iters = PR_ITERS
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
_COS_SQL = (
    "list_sum(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i]::DOUBLE * c.embedding[i]::DOUBLE)) "
    "/ (sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE))) "
    "* sqrt(list_sum(list_transform(c.embedding, x -> x::DOUBLE * x::DOUBLE))))"
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


def oracle_sql() -> dict[str, str]:
    w_uf = ("PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")
    langid_scores = ", ".join(
        f"len(regexp_extract_all(lower(text), '{pat}'))::DOUBLE / "
        f"greatest(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::DOUBLE, 1.0) AS s_{lg}"
        for lg, pat in _LANG_MARKERS.items()
    )
    lang_pred = ("CASE WHEN m = 0 THEN 'und' "
                 + " ".join(f"WHEN s_{lg} = m THEN '{lg}'" for lg in sorted(_LANG_MARKERS))
                 + " END")
    return {
        "count_by_kind": "SELECT event_type, COUNT(*)::BIGINT AS n FROM events GROUP BY event_type",
        "global_count": "SELECT COUNT(*)::BIGINT AS n FROM lineitem",
        "distinct_kinds": "SELECT DISTINCT event_type FROM events",
        "sessionize_part_index": (
            "SELECT event_id, user_id, COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS part_index FROM events"
        ),
        "forward_fill": (
            "SELECT event_id, user_id, ROUND(LAST_VALUE(CASE WHEN event_type = 'signup' THEN value END "
            f"IGNORE NULLS) OVER ({w_uf}), 4) AS last_signup_value FROM events"
        ),
        "asof_fallback_join": (
            "SELECT event_id, user_id, anchor_event_id FROM ("
            "SELECT event_id, user_id, event_type, COALESCE("
            f"LAST_VALUE(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS) OVER ({w_uf}), "
            "LAST_VALUE(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS) OVER ("
            "PARTITION BY user_id % 16 "
            "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            ") AS anchor_event_id FROM events) WHERE event_type = 'purchase'"
        ),
        "lookup_join": (
            "SELECT o_orderkey, c_mktsegment FROM orders o "
            "LEFT JOIN customer c ON o.o_custkey = c.c_custkey"
        ),
        "bit_test_result": (
            "SELECT l_orderkey, l_linenumber, flg::BIGINT AS flg, "
            "(CASE WHEN (flg & 64) = 0 AND (flg & 128) = 0 THEN 1 "
            "WHEN (flg & 64) <> 0 AND (flg & 128) = 0 THEN 0 "
            "WHEN (flg & 128) <> 0 AND (flg & 64) = 0 THEN 2 ELSE -1 END)::BIGINT AS result "
            "FROM (SELECT l_orderkey, l_linenumber, (l_orderkey * 7 + l_linenumber) % 256 AS flg FROM lineitem)"
        ),
        "impute_defaults": (
            "SELECT l_orderkey, l_linenumber, COALESCE(p_brand, 'UNKNOWN') AS brand_filled, "
            "ROUND(COALESCE(p_retailprice, 0.0), 2) AS price_filled FROM lineitem l "
            "LEFT JOIN (SELECT * FROM part WHERE p_size <= 25) p ON l.l_partkey = p.p_partkey"
        ),
        "dedup_by_hash": (
            "SELECT md5(text) AS content_hash, COUNT(*)::BIGINT AS n_docs, MIN(doc_id) AS keep_id "
            "FROM documents GROUP BY md5(text)"
        ),
        "topk_per_group": (
            "SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, rn FROM ("
            "SELECT o_custkey, o_orderkey, o_totalprice, ROW_NUMBER() OVER ("
            "PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders"
            ") WHERE rn <= 3"
        ),
        "tpch_q1_agg": (
            "SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty, "
            "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge, "
            "ROUND(AVG(l_quantity), 6) AS avg_qty, ROUND(AVG(l_extendedprice), 6) AS avg_price, "
            "ROUND(AVG(l_discount), 6) AS avg_disc, COUNT(*)::BIGINT AS count_order "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "anti_join_missing": (
            "SELECT o_orderkey FROM orders o WHERE NOT EXISTS "
            "(SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)"
        ),
        "running_total": (
            f"SELECT event_id, user_id, ROUND(SUM(value) OVER ({w_uf}), 4) AS running_value FROM events"
        ),
        "rollup_counts": (
            "SELECT l_returnflag, l_linestatus, COUNT(*)::BIGINT AS n, "
            "ROUND(SUM(l_quantity), 2) AS qty FROM lineitem "
            "GROUP BY ROLLUP(l_returnflag, l_linestatus)"
        ),
        "pivot_event_values": (
            "SELECT user_id, "
            + ", ".join(
                f"COALESCE(ROUND(SUM(CASE WHEN event_type = '{k}' THEN value END), 4), 0.0) AS {k}"
                for k in ["click", "error", "purchase", "signup", "view"]
            )
            + " FROM events GROUP BY user_id"
        ),
        "graph_edges": f"WITH {_EDGES_SQL.strip()} SELECT src, dst FROM edges",
        "graph_degrees": (
            f"WITH {_EDGES_SQL.strip()} SELECT src, COUNT(*)::BIGINT AS out_deg FROM edges GROUP BY src"
        ),
        "edge_snapshot_diff": _EDGE_DIFF_SQL,
        "pagerank_5iter": _pagerank_sql(),
        "pagerank_incremental": _pagerank_sql(n_iters=PR_CONV_ORACLE_ITERS),
        "neighborhood_function": _anf_exact_sql(),
        "anf_sketch": _anf_sketch_sql(),
        "anf_effective_diameter": _anf_eff_diam_sql(),
        "pagerank_weighted": _pagerank_sql(weighted=True),
        "katz_5iter": _katz_sql(),
        "eigencentrality_5iter": _eigen_sql(),
        "hits_3iter": _hits_sql(),
        "salsa_3iter": _salsa_sql(),
        "salsa_personalized": _salsa_sql(seed_mod=PSALSA_SEED_MOD),
        "transitivity_global": (
            f"WITH {_EDGES_SPARSE_SQL.strip()}, "
            "u AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges), "
            "degs AS (SELECT src, COUNT(*)::BIGINT AS d FROM und GROUP BY src), "
            "wed AS (SELECT (SUM(d * (d - 1)) / 2)::BIGINT AS w FROM degs), "
            "tri AS (SELECT COUNT(*)::BIGINT AS t FROM u e1 "
            "JOIN u e2 ON e1.b = e2.a JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b) "
            "SELECT w AS wedges, t AS triangles, ROUND(3.0 * t / w, 6) AS transitivity "
            "FROM wed, tri"
        ),
        "rich_club": _RICH_CLUB_SQL.format(edges=_EDGES_SPARSE_SQL.strip()),
        "ppr_5iter": _ppr_sql(),
        "connected_components": _cc_sql(),
        # incremental path has a unique fixpoint == the cold run
        "cc_incremental": _cc_sql(),
        "component_profile": _component_profile_sql(),
        "strongly_connected_components": _scc_sql(),
        "dag_levels": _dag_levels_sql(),
        "label_propagation_2iter": _lpa_sql(),
        "seeded_lpa": _seeded_lpa_sql(),
        "community_modularity": _modularity_sql(),
        "avg_neighbor_degree": (
            f"WITH {_EDGES_SPARSE_SQL.strip()}, "
            "d AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src), "
            "pv AS (SELECT u.src AS id, ROUND(AVG(nd.deg), 9) AS mnd FROM und u "
            "JOIN d nd ON u.dst = nd.id GROUP BY u.src) "
            "SELECT d.deg, COUNT(*)::BIGINT AS n_vertices, ROUND(AVG(pv.mnd), 6) AS knn "
            "FROM pv JOIN d ON pv.id = d.id GROUP BY d.deg"
        ),
        "degree_percentiles": (
            f"WITH {_EDGES_SQL.strip()}, "
            "d AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src), "
            f"q AS (SELECT quantile_cont(deg, {DEG_PCTS}) AS qs FROM d) "
            f"SELECT unnest({DEG_PCTS}::DOUBLE[]) AS pct, "
            "ROUND(unnest(qs), 6) AS deg FROM q"
        ),
        "degree_histogram": (
            f"WITH {_EDGES_SQL.strip()}, "
            "d AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src) "
            "SELECT floor(log2(deg))::BIGINT AS bin, COUNT(*)::BIGINT AS n_vertices, "
            "MIN(deg)::BIGINT AS min_deg, MAX(deg)::BIGINT AS max_deg "
            "FROM d GROUP BY floor(log2(deg))::BIGINT"
        ),
        "events_in_windows": (
            "WITH iv AS (SELECT user_id AS w_user, MIN(ts) AS t_start, MAX(ts) AS t_end "
            "FROM events WHERE user_id < 3 GROUP BY user_id) "
            "SELECT e.event_id, e.user_id, iv.w_user FROM events e "
            "JOIN iv ON e.ts >= iv.t_start AND e.ts <= iv.t_end"
        ),
        "session_windows": (
            # gaps-and-islands twin of F.session_window: a new session
            # starts when the gap is >= 30min (Spark's closed-open
            # [start, last+gap) convention); floor(epoch) matches
            # unix_timestamp's truncation on fractional-second ts
            "WITH o AS (SELECT user_id, ts, CASE WHEN LAG(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts) IS NULL OR ts - LAG(ts) OVER "
            f"(PARTITION BY user_id ORDER BY ts) >= INTERVAL {SESSION_GAP_MIN} MINUTE "
            "THEN 1 ELSE 0 END AS brk FROM events), "
            "s AS (SELECT user_id, ts, SUM(brk) OVER (PARTITION BY user_id "
            "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess FROM o) "
            "SELECT user_id, floor(epoch(MIN(ts)))::BIGINT AS s_epoch, "
            f"(floor(epoch(MAX(ts))) + {SESSION_GAP_MIN * 60})::BIGINT AS e_epoch, "
            "COUNT(*)::BIGINT AS n_events FROM s GROUP BY user_id, sess"
        ),
        "window_distinct_users": (
            "SELECT epoch(date_trunc('hour', ts))::BIGINT AS w_epoch, event_type, "
            "COUNT(DISTINCT user_id)::BIGINT AS n_users, COUNT(*)::BIGINT AS n_events "
            "FROM events GROUP BY 1, 2"
        ),
        "threshold_crossers": (
            "SELECT user_id, ts AS crossed_at, "
            f"{CROSS_N}::BIGINT AS nth FROM ("
            "SELECT user_id, ts, ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS rn FROM events) "
            f"WHERE rn = {CROSS_N}"
        ),
        "graph_summary": (
            f"WITH {_EDGES_SQL.strip()}, "
            "nv AS (SELECT COUNT(*)::BIGINT AS n_vertices FROM verts), "
            "ne AS (SELECT COUNT(*)::BIGINT AS n_edges FROM edges), "
            "nu AS (SELECT (COUNT(*) // 2)::BIGINT AS n_und_edges FROM und), "
            "md AS (SELECT MAX(d)::BIGINT AS max_out_deg FROM "
            "(SELECT COUNT(*) AS d FROM edges GROUP BY src)) "
            "SELECT nv.n_vertices, ne.n_edges, nu.n_und_edges, md.max_out_deg, "
            "ROUND(ne.n_edges / nv.n_vertices::DOUBLE, 6) AS avg_out_deg, "
            "ROUND(nu.n_und_edges / (nv.n_vertices * (nv.n_vertices - 1) / 2.0), 6) AS density "
            "FROM nv CROSS JOIN ne CROSS JOIN nu CROSS JOIN md"
        ),
        "reciprocity": (
            f"WITH {_EDGES_SQL.strip()}, "
            "n AS (SELECT COUNT(*)::BIGINT AS n_edges FROM edges), "
            "r AS (SELECT COUNT(*)::BIGINT AS n_reciprocated FROM edges e "
            "JOIN edges x ON e.src = x.dst AND e.dst = x.src) "
            "SELECT n.n_edges, r.n_reciprocated, "
            "ROUND(r.n_reciprocated / n.n_edges::DOUBLE, 6) AS reciprocity "
            "FROM n CROSS JOIN r"
        ),
        "dedup_clusters": _dedup_clusters_sql(),
        "embedding_dedup_clusters": _embedding_dedup_clusters_sql(),
        "sq8_codes": _SQ8_SQL,
        "lang_vocab_overlap": _LANG_VOCAB_OVERLAP_SQL,
        "csr_gap_histogram": _CSR_GAP_SQL_TMPL.format(
            edges=_EDGES_SPARSE_SQL.strip()
        ),
        "linkpred_eval": _linkpred_eval_sql(),
        "weighted_sample_docs": _WEIGHTED_SAMPLE_SQL,
        "ngram_novelty": (
            f"WITH {_TOKS_SQL}, {_SHINGLES_SQL}, "
            "ex AS MATERIALIZED (SELECT doc_id, unnest(s) AS shingle FROM sh), "
            "fst AS (SELECT shingle, MIN(doc_id) AS fd FROM ex GROUP BY shingle) "
            "SELECT e.doc_id, COUNT(*)::BIGINT AS n_grams, "
            "SUM((f.fd = e.doc_id)::INT)::BIGINT AS n_novel, "
            "ROUND(SUM((f.fd = e.doc_id)::INT) / COUNT(*)::DOUBLE, 6) AS novelty "
            "FROM ex e JOIN fst f ON e.shingle = f.shingle GROUP BY e.doc_id"
        ),
        "hard_negatives": (
            "WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS ql "
            "FROM embeddings WHERE vec_id < 5), "
            "scored AS (SELECT q.qid AS query_id, c.vec_id AS neighbor_id, "
            f"ROUND({_COS_SQL}, 6) AS sim FROM embeddings c CROSS JOIN q "
            "WHERE c.label <> q.ql) "
            "SELECT query_id, neighbor_id, sim, rn FROM ("
            "SELECT query_id, neighbor_id, sim, ROW_NUMBER() OVER "
            "(PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn "
            f"FROM scored) WHERE rn <= {HARDNEG_K}"
        ),
        "neardup_keep_best": _neardup_keep_best_sql(),
        "copart_topk": (
            "WITH g AS (SELECT DISTINCT l_orderkey AS gk, l_partkey AS item FROM lineitem), "
            f"small AS (SELECT gk, item FROM g WHERE gk IN "
            f"(SELECT gk FROM g GROUP BY gk HAVING COUNT(*) <= {COOC_CAP})), "
            "pairs AS (SELECT a.item AS item_a, b.item AS item_b, COUNT(*)::BIGINT AS n_groups "
            "FROM small a JOIN small b ON a.gk = b.gk AND a.item < b.item "
            "GROUP BY a.item, b.item) "
            "SELECT item_a, item_b, n_groups, rn FROM (SELECT item_a, item_b, n_groups, "
            "ROW_NUMBER() OVER (ORDER BY n_groups DESC, item_a ASC, item_b ASC) AS rn "
            f"FROM pairs) WHERE rn <= {COOC_K}"
        ),
        "triangle_count": (
            f"WITH {_EDGES_SQL.strip()}, "
            "u AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges) "
            "SELECT COUNT(*)::BIGINT AS triangles FROM u e1 "
            "JOIN u e2 ON e1.b = e2.a JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b"
        ),
        "sssp_hops": _sssp_sql(),
        "sssp_weighted": _sssp_sql(weighted=True),
        "landmark_distances": (
            f"WITH {_landmark_ctes()} "
            f"SELECT id, source, dist FROM d{SSSP_ROUNDS}"
        ),
        "random_walks": _walks_sql(),
        "walk_sentences": _walk_sentences_sql(),
        "node2vec_walks": _node2vec_sql(),
        "harmonic_landmarks": (
            f"WITH {_landmark_ctes()} "
            f"SELECT id, COUNT(*)::BIGINT AS n_sources, "
            f"ROUND(SUM(1.0 / dist::DOUBLE), 6) AS h "
            f"FROM d{SSSP_ROUNDS} WHERE dist > 0 GROUP BY id"
        ),
        "closeness_landmarks": (
            f"WITH {_landmark_ctes()} "
            f"SELECT id, COUNT(*)::BIGINT AS n_sources, SUM(dist)::BIGINT AS sum_dist, "
            f"ROUND(COUNT(*)::DOUBLE / SUM(dist)::DOUBLE, 6) AS closeness "
            f"FROM d{SSSP_ROUNDS} WHERE dist > 0 GROUP BY id"
        ),
        "graph_center_landmarks": (
            f"WITH {_landmark_ctes()} "
            f"SELECT id, ecc_lb, rn FROM (SELECT id, ecc_lb, "
            f"ROW_NUMBER() OVER (ORDER BY ecc_lb, id) AS rn FROM ("
            f"SELECT id, MAX(dist)::BIGINT AS ecc_lb FROM d{SSSP_ROUNDS} "
            f"GROUP BY id HAVING COUNT(*) = {N_LANDMARKS})) WHERE rn <= {CENTER_K}"
        ),
        "bipartite_check": _bipartite_sql(),
        "kcore_3": _kcore_sql(),
        "coreness": _coreness_sql(),
        "score_weighted": _score_weighted_sql(),
        "coreness_decremental": _coreness_dec_sql(),
        "ktruss_4": _ktruss_sql(),
        "trussness": _trussness_sql(),
        "trussness_decremental": _trussness_dec_sql(),
        "onion_layers": _onion_sql(),
        "heavy_edge_coarsen": _hec_sql(),
        "robustness_curve": _robustness_sql(),
        "robustness_random": _robustness_sql(mode="failure"),
        "minimum_spanning_forest": _msf_sql(),
        "temporal_reachability": _temporal_sql(),
        "temporal_shortest_path": _temporal_sql(out="shortest"),
        "temporal_latest_departure": _temporal_ld_sql(),
        "temporal_fastest_path": _temporal_fp_sql(),
        "linkpred_auc": _linkpred_auc_sql(),
        "partition_assignment": _partition_sql("assign"),
        "partition_quality": _partition_sql("quality"),
        "densest_subgraph": _densest_sql(),
        "unigram_surprisal": _UNIGRAM_SURPRISAL_SQL,
        "corpus_js_divergence": _CORPUS_DIVERGENCE_SQL,
        "bigram_surprisal": _BIGRAM_SURPRISAL_SQL,
        "attribute_assortativity": _ATTR_ASSORT_SQL,
        "widest_path": _widest_sql(),
        "edge_embeddedness": _EDGE_EMB_SQL,
        "wl_colors_3": _wl_sql("colors"),
        "wl_class_histogram": _wl_sql("histogram"),
        "maximal_matching": _matching_sql(),
        "bowtie_structure": _bowtie_sql(),
        "chunk_plan": _CHUNK_PLAN_SQL,
        "affinity_clusters_l2": _msf_sql(rounds=AFFINITY_LEVEL, out="clusters"),
        "kcenter_seeds": _kcenter_sql(),
        "directed_triads": (
            f"WITH {_EDGES_SPARSE_SQL.strip()}, "
            "c AS (SELECT COUNT(*)::BIGINT AS n_cyclic FROM edges e1 "
            "JOIN edges e2 ON e1.dst = e2.src "
            "JOIN edges e3 ON e3.src = e2.dst AND e3.dst = e1.src "
            "WHERE e1.src < e1.dst AND e1.src < e2.dst), "
            "f AS (SELECT COUNT(*)::BIGINT AS n_feedforward FROM edges e1 "
            "JOIN edges e2 ON e1.dst = e2.src AND e1.src <> e2.dst "
            "JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst) "
            "SELECT c.n_cyclic, f.n_feedforward FROM c CROSS JOIN f"
        ),
        "maximal_independent_set": _mis_sql(),
        "greedy_coloring": _coloring_sql(),
        "speculative_coloring": _spec_coloring_sql(),
        "louvain_2round": _louvain_sql(),
        "louvain_2level": _louvain2_sql(),
        "louvain_modularity_levels": _louvain_trajectory_sql(),
        "community_quotient": (
            "WITH " + ",\n".join(_louvain_level1_ctes(LOUVAIN_ROUNDS))
            + f"\nSELECT la.label AS c_src, lb.label AS c_dst, COUNT(*)::BIGINT AS w "
            f"FROM und e JOIN l{LOUVAIN_ROUNDS} la ON e.src = la.id "
            f"JOIN l{LOUVAIN_ROUNDS} lb ON e.dst = lb.id GROUP BY la.label, lb.label"
        ),
        "community_pagerank": _community_pagerank_sql(),
        "diameter_double_sweep": _diameter_sql(),
        "betweenness_approx": _betweenness_sql(),
        "edge_betweenness": _betweenness_sql(out="edges"),
        "local_clustering": (
            f"WITH {_EDGES_SPARSE_SQL.strip()}, {_DEG_SQL}, "
            "u AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges), "
            "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM u e1 "
            "JOIN u e2 ON e1.b = e2.a JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b), "
            "members AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri), "
            "cnt AS (SELECT id, COUNT(*)::BIGINT AS n FROM members GROUP BY id) "
            "SELECT d.id, d.deg, COALESCE(c.n, 0)::BIGINT AS triangles, "
            "CASE WHEN d.deg >= 2 THEN ROUND(2.0 * COALESCE(c.n, 0) / (d.deg * (d.deg - 1)), 6) "
            "ELSE 0.0::DOUBLE END AS lcc "
            "FROM deg d LEFT JOIN cnt c ON d.id = c.id"
        ),
        "degree_assortativity": (
            f"WITH {_EDGES_SPARSE_SQL.strip()}, {_DEG_SQL} "
            "SELECT (COUNT(*) / 2)::BIGINT AS n_edges, "
            "ROUND(corr(ds.deg, dd.deg), 6) AS assortativity "
            "FROM und JOIN deg ds ON und.src = ds.id JOIN deg dd ON und.dst = dd.id"
        ),
        "resource_allocation_topk": (
            f"WITH {_EDGES_SPARSE_SQL.strip()}, {_DEG_SQL}, {_WEDGE_SQL}, "
            "sc AS (SELECT u, v, ROUND(SUM(1.0 / deg_w), 6) AS score "
            "FROM wedge GROUP BY u, v), "
            "na AS (SELECT s.u, s.v, s.score FROM sc s "
            "WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.src = s.u AND e.dst = s.v)) "
            "SELECT u, v, score, rn FROM (SELECT u, v, score, "
            "ROW_NUMBER() OVER (ORDER BY score DESC, u ASC, v ASC)::BIGINT AS rn FROM na) "
            f"WHERE rn <= {LINKPRED_K}"
        ),
        "preferential_attachment_topk": (
            f"WITH {_EDGES_SPARSE_SQL.strip()}, {_DEG_SQL}, {_WEDGE_SQL}, "
            "wc AS (SELECT DISTINCT u, v FROM wedge), "
            "sc AS (SELECT w.u, w.v, (du.deg * dv.deg)::BIGINT AS score "
            "FROM wc w JOIN deg du ON w.u = du.id JOIN deg dv ON w.v = dv.id "
            "WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.src = w.u AND e.dst = w.v)) "
            "SELECT u, v, score, rn FROM (SELECT u, v, score, "
            "ROW_NUMBER() OVER (ORDER BY score DESC, u ASC, v ASC)::BIGINT AS rn FROM sc) "
            f"WHERE rn <= {LINKPRED_K}"
        ),
        "square_count": (
            f"WITH {_EDGES_SPARSE_SQL.strip()}, "
            "deg AS MATERIALIZED (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM und GROUP BY src), "
            f"{_WEDGE_SQL}, "
            "c AS (SELECT u, v, COUNT(*)::BIGINT AS c FROM wedge GROUP BY u, v) "
            "SELECT COUNT(*)::BIGINT AS pairs_common, "
            "(SUM(c * (c - 1) // 2) // 2)::BIGINT AS squares FROM c"
        ),
        "four_clique_count": _FOUR_CLIQUE_SQL,
        "ppr_sweep_cut": _ppr_sweep_sql(),
        "scan_statistic": (
            f"WITH {_EDGES_SPARSE_SQL.strip()}, {_DEG_SQL}, "
            "u AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges), "
            "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM u e1 "
            "JOIN u e2 ON e1.b = e2.a JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b), "
            "members AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri), "
            "cnt AS (SELECT id, COUNT(*)::BIGINT AS n FROM members GROUP BY id), "
            "sc AS (SELECT d.id, d.deg, COALESCE(c.n, 0)::BIGINT AS triangles, "
            "(d.deg + COALESCE(c.n, 0))::BIGINT AS scan_stat "
            "FROM deg d LEFT JOIN cnt c ON d.id = c.id) "
            "SELECT id, deg, triangles, scan_stat, rn FROM ("
            "SELECT id, deg, triangles, scan_stat, "
            "ROW_NUMBER() OVER (ORDER BY scan_stat DESC, id ASC)::BIGINT AS rn FROM sc) "
            f"WHERE rn <= {SCANSTAT_K}"
        ),
        "adamic_adar_topk": (
            f"WITH {_EDGES_SPARSE_SQL.strip()}, {_DEG_SQL}, {_WEDGE_SQL}, "
            "sc AS (SELECT u, v, ROUND(SUM(1.0 / ln(deg_w)), 6) AS score "
            "FROM wedge GROUP BY u, v), "
            "na AS (SELECT s.u, s.v, s.score FROM sc s "
            "WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.src = s.u AND e.dst = s.v)) "
            "SELECT u, v, score, rn FROM (SELECT u, v, score, "
            "ROW_NUMBER() OVER (ORDER BY score DESC, u ASC, v ASC)::BIGINT AS rn FROM na) "
            f"WHERE rn <= {LINKPRED_K}"
        ),
        "vertex_jaccard_topk": (
            f"WITH {_EDGES_SPARSE_SQL.strip()}, {_DEG_SQL}, {_WEDGE_SQL}, "
            "wc AS (SELECT u, v, COUNT(*)::BIGINT AS n_common FROM wedge GROUP BY u, v), "
            "sc AS (SELECT w.u, w.v, w.n_common, "
            "ROUND(w.n_common / (du.deg + dv.deg - w.n_common)::DOUBLE, 6) AS jaccard "
            "FROM wc w JOIN deg du ON w.u = du.id JOIN deg dv ON w.v = dv.id "
            "WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.src = w.u AND e.dst = w.v)) "
            "SELECT u, v, n_common, jaccard, rn FROM (SELECT u, v, n_common, jaccard, "
            "ROW_NUMBER() OVER (ORDER BY jaccard DESC, u ASC, v ASC)::BIGINT AS rn FROM sc) "
            f"WHERE rn <= {LINKPRED_K}"
        ),
        "csr_adjacency": (
            f"WITH {_EDGES_SQL.strip()} "
            "SELECT src, COUNT(*)::BIGINT AS deg, "
            "string_agg(dst::VARCHAR, ',' ORDER BY dst) AS nbrs "
            "FROM edges GROUP BY src"
        ),
        "triangles_per_vertex": (
            f"WITH {_EDGES_SQL.strip()}, "
            "u AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges), "
            "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM u e1 "
            "JOIN u e2 ON e1.b = e2.a JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b), "
            "members AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri), "
            "cnt AS (SELECT id, COUNT(*)::BIGINT AS n FROM members GROUP BY id) "
            "SELECT v.id, COALESCE(c.n, 0)::BIGINT AS triangles "
            "FROM verts v LEFT JOIN cnt c ON v.id = c.id"
        ),
        "cube_counts": (
            "SELECT l_returnflag, l_linestatus, COUNT(*)::BIGINT AS n, "
            "ROUND(SUM(l_quantity), 2) AS qty FROM lineitem "
            "GROUP BY CUBE(l_returnflag, l_linestatus)"
        ),
        "set_intersect_users": (
            "SELECT user_id FROM events WHERE event_type = 'click' "
            "INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase'"
        ),
        "json_hour_extract": (
            "SELECT event_id, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour, "
            "json_extract_string(props, '$.k')::BIGINT AS k FROM events"
        ),
        "order_stats": (
            "SELECT l_returnflag, "
            "ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price, "
            "ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price, "
            "ROUND(stddev_samp(l_extendedprice), 4) AS sd_price, "
            "ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "lag_value_delta": (
            "SELECT event_id, user_id, ROUND(value - LAG(value) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id), 4) AS value_delta FROM events"
        ),
        "media_decode_stats": _media_decode_sql(),
        "media_feature_dims": (
            f"SELECT mid::BIGINT AS media_id, CASE mid % 3 WHEN 0 THEN 'image' "
            f"WHEN 1 THEN 'audio' ELSE 'video' END AS kind, 16::BIGINT AS dim "
            f"FROM (SELECT unnest(range(0, {N_MEDIA})) AS mid)"
        ),
        "ngram_jaccard_dedup": (
            f"WITH {_TOKS_SQL}, {_SHINGLES_SQL}, "
            "ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh), "
            "sizes AS (SELECT doc_id, len(s) AS n FROM sh WHERE len(s) > 0), "
            "shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared "
            "FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT doc_a, doc_b, ROUND(shared::DOUBLE / (sa.n + sb.n - shared), 6) AS jaccard "
            "FROM shared JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b "
            "WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.8"
        ),
        "minhash_lsh_candidates": (
            f"WITH {_MINHASH_CTES} SELECT doc_a, doc_b FROM cand"
        ),
        "minhash_jaccard_dedup": (
            f"WITH {_MINHASH_CTES}, "
            "sets AS (SELECT doc_id, s FROM sh WHERE len(s) > 0) "
            "SELECT doc_a, doc_b, ROUND(j, 6) AS jaccard FROM ("
            "SELECT c.doc_a, c.doc_b, "
            "len(list_intersect(sa.s, sb.s))::DOUBLE "
            "/ (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))::DOUBLE AS j "
            "FROM cand c JOIN sets sa ON sa.doc_id = c.doc_a JOIN sets sb ON sb.doc_id = c.doc_b"
            ") WHERE j >= 0.8"
        ),
        "simhash_fingerprint": (
            f"WITH {_SIMHASH_CTE} SELECT doc_id, simhash FROM sh60"
        ),
        "simhash_neardup_h3": (
            f"WITH {_SIMHASH_CTE}, "
            "bands AS (SELECT doc_id, simhash, b, (simhash >> (15*b)) & 32767 AS bval "
            "FROM sh60 CROSS JOIN (SELECT unnest(range(0, 4)) AS b)) "
            "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming "
            "FROM bands a JOIN bands b ON a.b = b.b AND a.bval = b.bval AND a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"
        ),
        "embedding_neardup": (
            "WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings), "
            "scored AS (SELECT q.qid AS vec_a, c.vec_id AS vec_b, "
            f"ROUND({_COS_SQL}, 6) AS sim FROM embeddings c JOIN q ON q.qid < c.vec_id) "
            "SELECT vec_a, vec_b, sim FROM scored WHERE sim >= 0.40"
        ),
        "ann_cosine_topk": (
            "WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5), "
            "scored AS (SELECT q.qid AS query_id, c.vec_id AS neighbor_id, "
            f"ROUND({_COS_SQL}, 6) AS sim FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.qid) "
            "SELECT query_id, neighbor_id, sim, rn FROM (SELECT query_id, neighbor_id, sim, "
            "ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn "
            "FROM scored) WHERE rn <= 5"
        ),
        "ann_lsh_bucketed": (
            f"WITH {_ann_lsh_ctes()} "
            "SELECT query_id, neighbor_id, sim, rn FROM lsh_topk"
        ),
        "ann_lsh_recall": (
            f"WITH {_ann_lsh_ctes()}, "
            "q5 AS (SELECT vec_id AS qid, embedding AS qv2 FROM embeddings WHERE vec_id < 5), "
            "exact_scored AS (SELECT q.qid AS query_id, c.vec_id AS neighbor_id, "
            "ROUND(list_sum(list_transform(range(1, len(q.qv2) + 1), i -> q.qv2[i]::DOUBLE * c.embedding[i]::DOUBLE)) "
            "/ (sqrt(list_sum(list_transform(q.qv2, x -> x::DOUBLE * x::DOUBLE))) "
            "* sqrt(list_sum(list_transform(c.embedding, x -> x::DOUBLE * x::DOUBLE)))), 6) AS sim "
            "FROM embeddings c CROSS JOIN q5 q WHERE c.vec_id <> q.qid), "
            "exact_topk AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id, "
            "ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn "
            "FROM exact_scored) WHERE rn <= 5), "
            "ne AS (SELECT query_id, COUNT(*)::BIGINT AS n_exact FROM exact_topk GROUP BY query_id), "
            "hits AS (SELECT e.query_id, COUNT(*)::BIGINT AS n_overlap FROM exact_topk e "
            "JOIN lsh_topk a ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id "
            "GROUP BY e.query_id) "
            "SELECT ne.query_id, ne.n_exact, COALESCE(hits.n_overlap, 0)::BIGINT AS n_overlap, "
            "ROUND(COALESCE(hits.n_overlap, 0) / ne.n_exact::DOUBLE, 6) AS recall "
            "FROM ne LEFT JOIN hits ON ne.query_id = hits.query_id"
        ),
        "ann_ivf_topk": (
            f"WITH {_ann_ivf_ctes()} "
            "SELECT query_id, neighbor_id, sim, rn FROM ivf_topk"
        ),
        "embedding_cluster_sizes": (
            f"WITH {_ann_ivf_ctes()} "
            "SELECT cid, COUNT(*)::BIGINT AS n_vectors FROM casg GROUP BY cid"
        ),
        "ann_ivf_recall": (
            f"WITH {_ann_ivf_ctes()}, "
            "q5 AS (SELECT vec_id AS qid, embedding AS qv2 FROM embeddings WHERE vec_id < 5), "
            "exact_scored AS (SELECT q.qid AS query_id, c.vec_id AS neighbor_id, "
            f"ROUND({_cos_expr('q.qv2', 'c.embedding')}, 6) AS sim "
            "FROM embeddings c CROSS JOIN q5 q WHERE c.vec_id <> q.qid), "
            "exact_topk AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id, "
            "ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn "
            "FROM exact_scored) WHERE rn <= 5), "
            "ne AS (SELECT query_id, COUNT(*)::BIGINT AS n_exact FROM exact_topk GROUP BY query_id), "
            "hits AS (SELECT e.query_id, COUNT(*)::BIGINT AS n_overlap FROM exact_topk e "
            "JOIN ivf_topk a ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id "
            "GROUP BY e.query_id) "
            "SELECT ne.query_id, ne.n_exact, COALESCE(hits.n_overlap, 0)::BIGINT AS n_overlap, "
            "ROUND(COALESCE(hits.n_overlap, 0) / ne.n_exact::DOUBLE, 6) AS recall "
            "FROM ne LEFT JOIN hits ON ne.query_id = hits.query_id"
        ),
        "heavy_hitter_users": (
            "SELECT user_id, COUNT(*)::BIGINT AS cnt FROM events "
            f"GROUP BY user_id HAVING COUNT(*) >= {HH_MIN_COUNT}"
        ),
        "hash_sample_docs": (
            "SELECT doc_id, lang FROM documents "
            "WHERE ('0x' || substr(md5('' || doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 10"
        ),
        "stratified_sample_docs": (
            "SELECT doc_id, lang FROM documents "
            "WHERE ('0x' || substr(md5('strat' || doc_id::VARCHAR), 1, 15))::BIGINT "
            "% (CASE WHEN lang = 'en' THEN 10 ELSE 2 END) < 1"
        ),
        "temperature_mix_sample": _TEMPERATURE_MIX_SQL,
        "dataset_splits": (
            "SELECT doc_id, lang, CASE "
            "WHEN ('0x' || substr(md5('split' || doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 80 THEN 'train' "
            "WHEN ('0x' || substr(md5('split' || doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 90 THEN 'val' "
            "ELSE 'test' END AS split FROM documents"
        ),
        "tfidf_top3": (
            "WITH toks AS (SELECT doc_id, unnest(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term FROM documents), "
            "tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term), "
            "nd AS (SELECT COUNT(DISTINCT doc_id)::DOUBLE AS n FROM documents), "
            "dfq AS (SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term), "
            "scored AS (SELECT tf.doc_id, tf.term, "
            "ROUND(tf.tf * ln((SELECT n FROM nd) / dfq.df), 6) AS tfidf "
            "FROM tf JOIN dfq USING (term)) "
            "SELECT doc_id, term, tfidf, rn FROM (SELECT doc_id, term, tfidf, "
            "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rn "
            "FROM scored) WHERE rn <= 3"
        ),
        "vocab_top100": (
            "WITH toks AS (SELECT unnest(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term FROM documents), "
            "freq AS (SELECT term, COUNT(*)::BIGINT AS freq FROM toks GROUP BY term) "
            "SELECT term, freq, rank FROM (SELECT term, freq, "
            "ROW_NUMBER() OVER (ORDER BY freq DESC, term ASC) AS rank FROM freq) "
            "WHERE rank <= 100"
        ),
        "token_stats": (
            "SELECT doc_id, "
            "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::BIGINT AS n_ws, "
            "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS n_bpe, "
            "len(regexp_extract_all(lower(text), '\\b(the|a|and|of|to|in|is|for|on|with)\\b'))::BIGINT AS n_stop, "
            "len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::BIGINT AS n_punct FROM documents"
        ),
        "quality_score": (
            "SELECT doc_id, ROUND("
            "0.4 * least(n_tok / 100.0, 1.0) + 0.3 * (1.0 - n_punct / greatest(n_chars2, 1.0)) "
            "+ 0.2 * least((n_stop / greatest(n_tok, 1.0)) * 5.0, 1.0) + 0.1 * least(n_chars2 / 500.0, 1.0)"
            ", 6) AS score FROM (SELECT doc_id, "
            "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::DOUBLE AS n_tok, "
            "length(text)::DOUBLE AS n_chars2, "
            "len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE AS n_punct, "
            "len(regexp_extract_all(lower(text), '\\b(the|a|and|of|to|in|is|for|on|with)\\b'))::DOUBLE AS n_stop "
            "FROM documents)"
        ),
        "training_shards": (
            "SELECT doc_id, tokens, "
            "(SUM(tokens) OVER (ORDER BY doc_id) - tokens)::BIGINT AS start_off, "
            f"((SUM(tokens) OVER (ORDER BY doc_id) - tokens) // {SHARD_BUDGET})::BIGINT AS shard "
            "FROM (SELECT doc_id, "
            "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::BIGINT AS tokens "
            "FROM documents)"
        ),
        "filter_funnel": (
            "WITH f AS MATERIALIZED (SELECT doc_id, "
            "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::BIGINT AS n_tok, "
            "ROUND("
            "0.4 * least(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::DOUBLE / 100.0, 1.0) "
            "+ 0.3 * (1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE / greatest(length(text)::DOUBLE, 1.0)) "
            "+ 0.2 * least((len(regexp_extract_all(lower(text), '\\b(the|a|and|of|to|in|is|for|on|with)\\b'))::DOUBLE "
            "/ greatest(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::DOUBLE, 1.0)) * 5.0, 1.0) "
            "+ 0.1 * least(length(text)::DOUBLE / 500.0, 1.0), 6) AS score, "
            "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp FROM documents), "
            f"fl AS (SELECT doc_id, fp, (n_tok < {FUNNEL_MIN_TOKENS}) AS s1, "
            f"(n_tok >= {FUNNEL_MIN_TOKENS} AND score < {FUNNEL_MIN_QUALITY}) AS s2 FROM f), "
            "rk AS (SELECT s1, s2, CASE WHEN NOT s1 AND NOT s2 THEN "
            "ROW_NUMBER() OVER (PARTITION BY fp ORDER BY (NOT s1 AND NOT s2) DESC, doc_id) END AS rn FROM fl), "
            "st AS (SELECT (CASE WHEN s1 THEN 1 WHEN s2 THEN 2 WHEN rn > 1 THEN 3 ELSE 0 END)::BIGINT AS stage FROM rk), "
            "c AS (SELECT stage, COUNT(*)::BIGINT AS n FROM st GROUP BY stage), "
            "tot AS (SELECT COUNT(*)::BIGINT AS t FROM st), "
            "spine(stage, stage_name) AS (VALUES (1::BIGINT, 'too_short'), "
            "(2::BIGINT, 'low_quality'), (3::BIGINT, 'exact_dup')) "
            "SELECT s.stage, s.stage_name, COALESCE(c.n, 0)::BIGINT AS dropped, "
            "((SELECT t FROM tot) - SUM(COALESCE(c.n, 0)) OVER (ORDER BY s.stage))::BIGINT AS surviving "
            "FROM spine s LEFT JOIN c ON s.stage = c.stage"
        ),
        "benchmark_contamination": _contamination_sql(),
        "zipf_fit": (
            "WITH toks AS (SELECT unnest(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term FROM documents), "
            "freq AS (SELECT term, COUNT(*)::BIGINT AS freq FROM toks GROUP BY term), "
            "top AS (SELECT term, freq, ROW_NUMBER() OVER "
            "(ORDER BY freq DESC, term ASC) AS rank FROM freq "
            f"QUALIFY rank <= {100}) "
            "SELECT ROUND(regr_slope(ln(freq), ln(rank)), 6) AS zipf_slope, "
            "ROUND(regr_intercept(ln(freq), ln(rank)), 6) AS zipf_intercept FROM top"
        ),
        "boilerplate_ngrams": _boilerplate_sql(),
        "repetition_stats": (
            "WITH lists AS (SELECT doc_id, list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tk FROM documents), "
            "nz AS MATERIALIZED (SELECT doc_id, tk FROM lists WHERE len(tk) > 0), "
            "bf AS (SELECT doc_id, len(tk)::BIGINT AS n_tokens, "
            "CASE WHEN len(tk) >= 2 THEN ROUND(1.0 - len(list_distinct(list_transform("
            "range(len(tk) - 1), i -> tk[i + 1] || ' ' || tk[i + 2])))::DOUBLE "
            "/ (len(tk) - 1)::DOUBLE, 6) ELSE 0.0 END AS dup_bigram_frac FROM nz), "
            "twc AS (SELECT doc_id, w, COUNT(*)::BIGINT AS c FROM "
            "(SELECT doc_id, unnest(tk) AS w FROM nz) GROUP BY doc_id, w), "
            "tw AS (SELECT doc_id, ROUND(MAX(c)::DOUBLE / SUM(c)::DOUBLE, 6) AS top_word_frac "
            "FROM twc GROUP BY doc_id) "
            "SELECT b.doc_id, b.n_tokens, t.top_word_frac, b.dup_bigram_frac "
            "FROM bf b JOIN tw t ON b.doc_id = t.doc_id"
        ),
        "pii_scrub": _pii_scrub_sql(),
        "lang_id": (
            f"SELECT doc_id, {lang_pred} AS predicted, "
            + ", ".join(f"ROUND(s_{lg}, 6) AS s_{lg}" for lg in sorted(_LANG_MARKERS))
            + f" FROM (SELECT doc_id, {langid_scores}, "
            + "greatest(" + ", ".join(f"s_{lg}" for lg in sorted(_LANG_MARKERS)) + ") AS m "
            "FROM documents)"
        ),
        "oov_rate": (
            "WITH toks AS MATERIALIZED (SELECT doc_id, unnest(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok FROM documents), "
            "freq AS (SELECT tok AS term, COUNT(*)::BIGINT AS freq FROM toks GROUP BY tok), "
            "vocab AS (SELECT term FROM (SELECT term, ROW_NUMBER() OVER "
            f"(ORDER BY freq DESC, term ASC) AS rank FROM freq) WHERE rank <= {OOV_VOCAB_K}), "
            "per AS (SELECT doc_id, COUNT(*)::BIGINT AS n_tok, "
            "SUM(CASE WHEN tok IN (SELECT term FROM vocab) THEN 0 ELSE 1 END)::BIGINT AS n_oov "
            "FROM toks GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(p.n_tok, 0)::BIGINT AS n_tok, "
            "COALESCE(p.n_oov, 0)::BIGINT AS n_oov, "
            "CASE WHEN p.n_tok > 0 THEN ROUND(p.n_oov / p.n_tok::DOUBLE, 6) END AS oov_frac "
            "FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id"
        ),
        "lang_confusion": (
            f"SELECT lang, {lang_pred} AS predicted, COUNT(*)::BIGINT AS n "
            f"FROM (SELECT lang, {langid_scores}, "
            + "greatest(" + ", ".join(f"s_{lg}" for lg in sorted(_LANG_MARKERS)) + ") AS m "
            "FROM documents) GROUP BY lang, predicted"
        ),
        "doc_fingerprint": (
            "SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp FROM documents"
        ),
        "corpus_curation": (
            "WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)), "
            "kept AS (SELECT d.doc_id, d.text FROM documents d JOIN keep k ON d.doc_id = k.doc_id), "
            "feats AS (SELECT doc_id, "
            "len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))::DOUBLE AS n_tok, "
            "length(text)::DOUBLE AS n_chars2, "
            "len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE AS n_punct, "
            "len(regexp_extract_all(lower(text), '\\b(the|a|and|of|to|in|is|for|on|with)\\b'))::DOUBLE AS n_stop, "
            "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS n_tokens FROM kept) "
            "SELECT doc_id, score, n_tokens FROM (SELECT doc_id, ROUND("
            "0.4 * least(n_tok / 100.0, 1.0) + 0.3 * (1.0 - n_punct / greatest(n_chars2, 1.0)) "
            "+ 0.2 * least((n_stop / greatest(n_tok, 1.0)) * 5.0, 1.0) + 0.1 * least(n_chars2 / 500.0, 1.0)"
            ", 6) AS score, n_tokens FROM feats) WHERE score >= 0.5"
        ),
    }
