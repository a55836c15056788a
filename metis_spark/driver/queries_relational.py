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

from metis_spark.driver.common import CROSS_N, SESSION_GAP_MIN, _t  # noqa: E501,F401


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


WINDOW_HH_MIN = 4


def _q_window_heavy_users(spark, sf_dir):
    """Exact per-window heavy hitters — users with ≥ WINDOW_HH_MIN
    events inside a tumbling hour window: the batch twin of
    streaming_heavy_hitters (streaming/incremental.py), whose append-
    mode HAVING-on-close emits exactly these rows. One shuffle keyed by
    (window, user_id); all-integer output."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.col("cnt") >= WINDOW_HH_MIN)
        .select(
            F.unix_timestamp(F.col("window.start")).alias("w_epoch"),
            "user_id",
            "cnt",
        )
    )

DECAY_HALF_LIFE_S = 86_400  # one-day half-life

def _q_decayed_counts(spark, sf_dir):
    """Per-user exponentially time-decayed activity score — the
    recency-weighted engagement/abuse signal a streaming scorer keeps
    as one register per user (decay folds into the register on read:
    new = old·2^(−Δ/H) + 1). Batch twin: each event's weight
    2^(−(Tmax−ts)/H) is quantized to integer micro-units as a pure
    double function of its integer age, so the per-user sums are
    order-free exact and both engines agree; Tmax is the data's own
    horizon (deterministic). One scalar max broadcast back + one
    map-side-combined groupBy."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").cast("long").alias("es")
    )
    mx = ev.agg(F.max("es").alias("tmax"))
    w = F.round(
        F.pow(
            F.lit(2.0),
            -(F.col("tmax") - F.col("es")).cast("double")
            / F.lit(float(DECAY_HALF_LIFE_S)),
        )
        * F.lit(1e6)
    ).cast("long")
    return (
        ev.crossJoin(F.broadcast(mx))
        .select("user_id", w.alias("wm"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("wm").cast("long").alias("decayed_micro"),
        )
        .select(
            "user_id",
            "n_events",
            "decayed_micro",
            F.round(F.col("decayed_micro").cast("double") / F.lit(1e6), 6).alias(
                "decayed"
            ),
        )
    )

def _q_burstiness(spark, sf_dir):
    """Per-user burstiness of inter-event times (Goh & Barabási, EPL
    2008): B = (σ − μ)/(σ + μ) over the gaps between consecutive
    events. B → −1 is metronome-regular, 0 is Poisson, → 1 is bursty —
    the activity-shape signal behind rate-limit and bot heuristics.

    Exactness: gaps are integer epoch-second diffs via LAG; per-user
    n, Σgap, Σgap² stay integers and B is one trailing double fold of
    that integer triple (population σ: B = (√(nΣx²−S²) − S) /
    (√(nΣx²−S²) + S)), identical in both engines. Users with < 2 gaps
    are dropped (σ undefined at n=1? no — at n=1 σ=0, B=-1 trivially;
    requiring ≥ 2 keeps the statistic meaningful).

    Scale shape: ONE window partitioned by user (the sessionize
    shape — parallel across users, no global window), one map-side
    combined groupBy. Gap sums use decimal(38,0) so century-scale
    epoch squares can't overflow.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").cast("long").alias("es"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    gaps = ev.select(
        "user_id",
        (F.col("es") - F.lag("es").over(w)).alias("gap"),
    ).where(F.col("gap").isNotNull())
    dec = "decimal(38,0)"
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum(F.col("gap").cast(dec)).alias("s1"),
        F.sum(F.col("gap").cast(dec) * F.col("gap").cast(dec)).alias("s2"),
    ).where(F.col("n_gaps") >= 2)
    disc = F.sqrt(
        (F.col("n_gaps").cast("double") * F.col("s2").cast("double"))
        - F.col("s1").cast("double") * F.col("s1").cast("double")
    )
    return agg.select(
        "user_id",
        "n_gaps",
        F.col("s1").cast("long").alias("sum_gap"),
        F.col("s2").cast("long").alias("sum_gap_sq"),
        F.when(
            disc + F.col("s1").cast("double") > 0,
            F.round((disc - F.col("s1").cast("double")) / (disc + F.col("s1").cast("double")), 6),
        ).alias("burstiness"),
    )

def _q_retention_cohorts(spark, sf_dir):
    """Weekly retention-cohort matrix: users grouped by first-activity
    week, tracked by distinct activity in each later week → (cohort_week,
    week_offset, n_users, retention). The canonical product-analytics
    table, and at pipeline scale the freshness/coverage audit for an
    event source (a cohort whose offsets decay to zero early flags an
    ingestion gap).

    Exactness: weeks are integer epoch-day // 7 buckets; counts are
    distinct-user integers; retention divides by the cohort's own
    offset-0 row, one trailing ROUND.

    Scale shape: one per-user min (map-side combined), one distinct on
    (user, week) — both shuffles keyed by user/cohort, no windows.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        (F.floor(F.unix_timestamp("ts") / F.lit(86400)) / F.lit(7))
        .cast("long")
        .alias("week"),
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    act = ev.select("user_id", "week").distinct()
    cells = (
        act.join(first.hint("shuffle_hash"), "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    base = cells.where(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_users").alias("cohort_size")
    )
    return (
        cells.join(base.hint("shuffle_hash"), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("cohort_size").cast("double"), 6
            ).alias("retention"),
        )
    )

def _q_ordered_funnel(spark, sf_dir):
    """Strictly-ordered conversion funnel view → click → purchase:
    a user converts at step k only with an occurrence of step k's
    event STRICTLY AFTER their step-(k−1) conversion time (first-touch
    semantics: each step anchors at its earliest qualifying time).
    → (step, event_type, n_users, conversion).

    Exactness: anchors are integer epoch seconds chosen by MIN — ties
    between same-type events collapse in the MIN and cross-step ties
    are excluded by the strict inequality, identically in both
    engines; conversion is one trailing ROUND per row over ≤ 3 rows.

    Scale shape: three per-user conditional MIN aggregates, each a
    map-side-combined groupBy on user_id, chained by broadcast-size
    joins; final output is 3 rows.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").cast("long").alias("es")
    )
    t1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("es").alias("t1"))
    )
    t2 = (
        ev.where(F.col("event_type") == "click")
        .join(t1.hint("shuffle_hash"), "user_id")
        .where(F.col("es") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("es").alias("t2"))
    )
    t3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(t2.hint("shuffle_hash"), "user_id")
        .where(F.col("es") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("es").alias("t3"))
    )
    n1 = t1.agg(F.count(F.lit(1)).cast("long").alias("n")).collect()[0]["n"]
    n2 = t2.agg(F.count(F.lit(1)).cast("long").alias("n")).collect()[0]["n"]
    n3 = t3.agg(F.count(F.lit(1)).cast("long").alias("n")).collect()[0]["n"]
    rows = [
        (1, "view", n1, None),
        (2, "click", n2, round(n2 / n1, 6) if n1 else None),
        (3, "purchase", n3, round(n3 / n2, 6) if n2 else None),
    ]
    return spark.createDataFrame(
        rows, "step long, event_type string, n_users long, conversion double"
    )

def _q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix between event types →
    (prev_type, next_type, n, prob). Per-user sequences ordered by
    (ts, event_id); prob is row-normalized over each prev_type. The
    sequence-structure summary behind session modelling and
    next-event prediction baselines.

    Exactness: integer pair counts off one per-user LAG window (the
    sessionize shape — partitioned by user, never global); prob is a
    trailing ROUND of an integer ratio.
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    cnt = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = cnt.groupBy("prev_type").agg(F.sum("n").cast("long").alias("row_n"))
    return cnt.join(tot.hint("shuffle_hash"), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("row_n").cast("double"), 6).alias("prob"),
    )

def _q_mad_outliers(spark, sf_dir):
    """Robust outlier audit per event type → (event_type, n, med,
    mad, n_outliers, outlier_rate). Median/MAD replace mean/stddev so
    the contamination being hunted can't mask itself (the classic
    robust-z screen: |v − med| > 3.5·MAD ≈ Iglewicz–Hoaglin with the
    1.4826 consistency constant folded into the cutoff).

    Exactness: Spark `percentile` and DuckDB `quantile_cont` share the
    interpolated-median definition, so med and mad agree bitwise on
    the same doubles; the outlier predicate compares those shared
    doubles; counts are integers and the rate one trailing ROUND.
    Degenerate types (MAD = 0) report NULL rate rather than flagging
    every tied row.

    Scale shape: two grouped percentile passes (map-side partial
    digests per type) + one broadcast join of the ≤ #types medians —
    no windows.
    """
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "n", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("med").alias("med"),
        F.expr("percentile(adev, 0.5)").alias("mad"),
    )
    flags = (
        ev.join(F.broadcast(mad.select("event_type", F.col("med").alias("m2"), F.col("mad").alias("d2"))), "event_type")
        .where(F.col("d2") > 0)
        .select(
            "event_type",
            (F.abs(F.col("value") - F.col("m2")) > F.lit(3.5) * F.col("d2")).cast("long").alias("o"),
        )
        .groupBy("event_type")
        .agg(F.sum("o").cast("long").alias("n_outliers"))
    )
    return (
        mad.join(flags, "event_type", "left")
        .select(
            "event_type",
            "n",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            F.coalesce("n_outliers", F.lit(0)).cast("long").alias("n_outliers"),
            F.when(
                F.col("mad") > 0,
                F.round(
                    F.coalesce("n_outliers", F.lit(0)).cast("double") / F.col("n").cast("double"), 6
                ),
            ).alias("outlier_rate"),
        )
    )

def _q_kleinberg_bursts(spark, sf_dir):
    """Kleinberg 2-state burst detection per user
    (operators/bursts.py:kleinberg_bursts) — integer-scaled Viterbi
    folded JVM-side with F.aggregate; the DuckDB twin replays the DP
    as a recursive CTE."""
    from metis_spark.operators.bursts import kleinberg_bursts

    return kleinberg_bursts(_t(spark, sf_dir, "events"))

_PROFILE_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
)

def _q_table_profile(spark, sf_dir):
    """Per-column data profile of the orders table → (column, n_rows,
    n_null, n_distinct) — the schema-drift / null-regression audit
    every ingest pipeline runs before trusting a new snapshot. One
    pass: all per-column aggregates fold into a single map-side-
    combined aggregation, then the 1-row result explodes into one row
    per column (no per-column scans)."""
    df = _t(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"null_{c}"))
        aggs.append(F.countDistinct(c).cast("long").alias(f"dist_{c}"))
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"null_{c}").alias("n_null"),
            F.col(f"dist_{c}").alias("n_distinct"),
        )
        for c in _PROFILE_COLS
    ]
    return (
        one.select("n_rows", F.explode(F.array(*structs)).alias("s"))
        .select(F.col("s.column").alias("column"), "n_rows", "s.n_null", "s.n_distinct")
    )

def _q_persistent_heavy_hitters(spark, sf_dir):
    """Persistent heavy hitters: users exceeding PHH_MIN events in
    ≥ PHH_WINDOWS distinct hour windows — the STABILITY refinement of
    window_heavy_users (a one-hour burst and a steady abuser both top a
    single window; only the abuser persists). Two map-side-combined
    groupBys, all integer."""
    ev = _t(spark, sf_dir, "events")
    per_w = (
        ev.select(
            "user_id",
            (F.floor(F.unix_timestamp("ts") / F.lit(3600))).cast("long").alias("w"),
        )
        .groupBy("user_id", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .where(F.col("c") >= PHH_MIN)
    )
    return (
        per_w.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_heavy_windows"),
            F.sum("c").cast("long").alias("events_in_heavy"),
            F.max("c").cast("long").alias("peak_window"),
        )
        .where(F.col("n_heavy_windows") >= PHH_WINDOWS)
    )

PHH_MIN = 3       # events per hour window to count as heavy
PHH_WINDOWS = 2   # distinct heavy windows to count as persistent

def _q_kaplan_meier(spark, sf_dir):
    """Kaplan–Meier survival curve over user lifetimes → (day, n_risk,
    n_events, survival): lifetime = days between a user's first and
    last event; users whose last event falls in the corpus's final day
    are right-censored (still alive at cutoff). S(t) = Π_{tᵢ≤t}
    (1 − dᵢ/nᵢ) — THE churn/retention estimator that handles censoring
    correctly where naive retention curves undercount.

    Determinism: the running product is EXP of a running SUM of
    ln(1 − dᵢ/nᵢ) terms over the day-ordered window — identical
    addends in identical order in both engines, one ROUND(6) per row.
    The risk set nᵢ = (users with lifetime ≥ tᵢ) comes from one
    cumulative count over the day histogram (O(#distinct days) rows)."""
    ev = _t(spark, sf_dir, "events")
    per = (
        ev.select("user_id", F.floor(F.unix_timestamp("ts")).cast("long").alias("es"))
        .groupBy("user_id")
        .agg(F.min("es").alias("first_es"), F.max("es").alias("last_es"))
    )
    cut = per.agg(F.max("last_es").alias("cut")).collect()[0]["cut"]
    base = per.select(
        "user_id",
        ((F.col("last_es") - F.col("first_es")) / F.lit(86400)).cast("long").alias("day"),
        # censored: last event within the final day of the corpus
        (F.col("last_es") >= F.lit(int(cut)) - F.lit(86400)).alias("censored"),
    )
    n_total = base.count()
    hist = base.groupBy("day").agg(
        F.sum((~F.col("censored")).cast("long")).cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("a"),
    )
    from pyspark.sql import Window

    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    wp = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    out = (
        hist.withColumn(
            "n_risk",
            (F.lit(int(n_total)) - F.coalesce(F.sum("a").over(wc), F.lit(0))).cast("long"),
        )
        .where(F.col("d") > 0)
        .withColumn(
            "lnterm",
            F.log(F.lit(1.0) - F.col("d") / F.col("n_risk")),
        )
        .withColumn("survival", F.round(F.exp(F.sum("lnterm").over(wp)), 6))
        .select("day", "n_risk", F.col("d").alias("n_events"), "survival")
    )
    return out

def _q_user_behavior_entropy(spark, sf_dir):
    """Per-user event-type diversity: Shannon entropy of the user's
    event-type distribution via the exact-integer (n·L(n) − Σ c·L(c))
    // n fold — the bot/monoculture detector next to user_burstiness
    (a scraper fires one event type; a human mixes)."""
    ev = _t(spark, sf_dir, "events")
    lc = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    lnm = F.round(F.log(F.col("c").cast("double")) * F.lit(1000000.0)).cast("long")
    agg = lc.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c") * lnm).cast("long").alias("clnc"),
    )
    lnn = F.round(F.log(F.col("n_events").cast("double")) * F.lit(1000000.0)).cast("long")
    return agg.select(
        "user_id", "n_events", "n_types",
        ((F.col("n_events") * lnn - F.col("clnc"))).alias("hnum"),
    ).select(
        "user_id", "n_events", "n_types",
        F.expr("hnum div n_events").cast("long").alias("entropy_micro"),
    )

def _q_bloom_semijoin(spark, sf_dir):
    """Bloom-filter semi-join pruning audit: build a 4096-bit / 3-hash
    Bloom over the BUILDING-segment customer keys (operators/sketches.py
    bloom_words — ≤128 packed words, always broadcastable), probe every
    order through it with zero shuffle on the probed side (bloom_probe),
    and measure what a runtime row-level filter would deliver at 100 TB:
    rows passing, true matches, false positives, fp rate among true
    non-matches. No false negatives by construction (pytest-pinned);
    this is the measured case for Spark's
    spark.sql.optimizer.runtime.bloomFilter.enabled plan shape — prune
    the fact-table stream BEFORE its exchange so the shuffle carries
    only (matches + fp_rate · non-matches) instead of everything."""
    from metis_spark.operators.sketches import bloom_probe, bloom_words

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    build = cust.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").cast("long").alias("key")
    ).distinct()
    words = bloom_words(build, "key", m=4096, k=3)
    probed = bloom_probe(
        orders.select("o_orderkey", F.col("o_custkey").cast("long").alias("o_custkey")),
        "o_custkey", words, m=4096, k=3,
    )
    flagged = probed.join(
        F.broadcast(build.withColumnRenamed("key", "o_custkey").withColumn("is_match", F.lit(1))),
        "o_custkey", "left",
    ).select(
        "bloom_pass", F.coalesce(F.col("is_match"), F.lit(0)).alias("is_match")
    )
    nb = build.agg(F.count(F.lit(1)).cast("long").alias("n_build_keys"))
    return flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe_rows"),
        F.sum(F.col("bloom_pass").cast("long")).cast("long").alias("n_pass_bloom"),
        F.sum("is_match").cast("long").alias("n_true_match"),
        F.sum(((F.col("bloom_pass")) & (F.col("is_match") == 0)).cast("long"))
        .cast("long").alias("n_false_positive"),
    ).crossJoin(F.broadcast(nb)).select(
        "n_probe_rows", "n_build_keys", "n_pass_bloom", "n_true_match",
        "n_false_positive",
        F.expr("(1000000 * n_false_positive) div (n_probe_rows - n_true_match)")
        .cast("long").alias("fp_rate_micro"),
    )

# Benford first-significant-digit probabilities, quantized to integer
# micro-units IN PYTHON and injected as literals into BOTH engines, so
# neither side evaluates log10 at query time (cross-libm drift is
# structurally impossible — the same nine integers appear in the Spark
# plan and the DuckDB oracle).
BENFORD_P_MICRO = {
    d: int(__import__("math").floor(__import__("math").log10(1.0 + 1.0 / d) * 1e6 + 0.5))
    for d in range(1, 10)
}


def _q_cusum_changepoints(spark, sf_dir):
    """Offline CUSUM mean-shift screen per event type → (event_type, n,
    cusum_peak, peak_epoch, peak_frac). The centered prefix sum
    P_i = Σ_{j≤i}(v_j − v̄) peaks at the most likely single change
    point (Page 1954 / Pettitt's argmax-|P| estimator); cusum_peak is
    max_i |Σ_{j≤i}(v_j − v̄)| in value units (0 for a drift-free
    series), peak_epoch the epoch second of the argmax event and
    peak_frac its position in the per-type sequence.

    Exactness: values quantize to integer micro-units once; the
    deviation is scaled by n (d_i = v_i·n − Σv, an exact integer) so
    no per-row division ever happens — P rides decimal(38,0)/HUGEINT
    and only the two final reporting divisions are doubles. Ordering
    (ts, event_id) is total, so prefix sums and the argmax tie-break
    (earliest event wins) replay exactly.

    Scale shape: one shuffle on event_type; both windows share that
    partitioning (sequential per-type scan is inherent to CUSUM — at
    100 TB the type×day re-expression with per-day carry-in keeps
    partitions bounded, same two-level trick as max_concurrency)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id",
        F.round(F.col("value") * F.lit(1e6)).cast("long").alias("vm"),
    )
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("vm").cast("decimal(38,0)")).alias("s"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wi = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pre = (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_type", "ts", "event_id", "n",
            (F.col("vm").cast("decimal(38,0)") * F.col("n") - F.col("s")).alias("d"),
        )
        .select(
            "event_type", "ts", "event_id", "n",
            F.abs(F.sum("d").over(w)).alias("ap"),
            F.row_number().over(wi).cast("long").alias("idx"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.desc("ap"), F.asc("ts"), F.asc("event_id")
    )
    return (
        pre.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            "n",
            F.round(
                F.col("ap").cast("double") / F.col("n").cast("double") / F.lit(1e6), 6
            ).alias("cusum_peak"),
            F.unix_timestamp("ts").cast("long").alias("peak_epoch"),
            F.round(F.col("idx").cast("double") / F.col("n").cast("double"), 6).alias(
                "peak_frac"
            ),
        )
    )


def _q_max_concurrency(spark, sf_dir):
    """Peak concurrent sessions → one row (n_sessions, peak_concurrency,
    peak_epoch): the classic interval max-overlap sweep (+1 at session
    start, −1 at close-open end, running sum peaks at the load
    high-water mark) over the same gap-session definition
    session_windows pins (30-min inactivity, end = last event + gap).

    Exactness: all time arithmetic is integer MICROSECONDS
    (unix_micros / epoch_us) — no interval-vs-float drift; ends sort
    before starts at the same instant (delta ascending) so back-to-back
    sessions never double-count; peak_epoch is the earliest instant
    attaining the peak.

    Scale shape: the sweep is two-level — a per-hour partitioned
    running sum plus an hour-carry cumulative over the (calendar-
    bounded, ≈ retention-window·24 rows) hour totals — so no unbounded
    single-partition window ever materializes; session derivation
    shuffles once on user_id."""
    # ts is TIMESTAMP_NTZ; the session TZ is pinned UTC, so the cast to
    # an instant is the identity and unix_micros yields exact integers
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = _t(spark, sf_dir, "events").select("user_id", us.alias("m"))
    wu = Window.partitionBy("user_id").orderBy("m")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    sess = (
        ev.select(
            "user_id", "m",
            F.when(
                F.lag("m").over(wu).isNull()
                | (F.col("m") - F.lag("m").over(wu) >= F.lit(gap_us)),
                1,
            ).otherwise(0).alias("brk"),
        )
        .select(
            "user_id", "m",
            F.sum("brk").over(
                wu.rowsBetween(Window.unboundedPreceding, 0)
            ).alias("sess"),
        )
        .groupBy("user_id", "sess")
        .agg(
            F.min("m").alias("s_us"),
            (F.max("m") + F.lit(gap_us)).alias("e_us"),
        )
    )
    deltas = sess.select(F.col("s_us").alias("t"), F.lit(1).alias("d")).unionByName(
        sess.select(F.col("e_us").alias("t"), F.lit(-1).alias("d"))
    )
    hour_us = 3_600_000_000
    bucketed = deltas.withColumn("h", (F.col("t") / F.lit(hour_us)).cast("long"))
    wh = (
        Window.partitionBy("h")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = bucketed.select("h", "t", "d", F.sum("d").over(wh).alias("run"))
    # hour-carry: cumulative total of all PRIOR hours (bounded by the
    # calendar span of the data — the one unpartitioned window here
    # runs over #hours rows, not #events)
    wc = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, -1)
    carry = (
        bucketed.groupBy("h")
        .agg(F.sum("d").alias("htot"))
        .select("h", F.coalesce(F.sum("htot").over(wc), F.lit(0)).alias("carry"))
    )
    conc = run.join(F.broadcast(carry), "h").select(
        "t", (F.col("run") + F.col("carry")).cast("long").alias("c")
    )
    peak = conc.agg(F.max("c").alias("peak"))
    at_peak = (
        conc.join(F.broadcast(peak), F.col("c") == F.col("peak"))
        .agg(F.min("t").alias("peak_us"), F.max("c").cast("long").alias("peak_concurrency"))
    )
    nsess = sess.agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    return nsess.crossJoin(F.broadcast(at_peak)).select(
        "n_sessions",
        "peak_concurrency",
        (F.col("peak_us") / F.lit(1_000_000)).cast("long").alias("peak_epoch"),
    )


def _q_benford_audit(spark, sf_dir):
    """Benford first-significant-digit audit of l_extendedprice →
    (digit, n_obs, exp_micro, chi2_contrib, chi2_total): the classic
    fabricated-data / corruption screen — natural multiplicative
    quantities follow P(d) = log10(1+1/d), and a chi-square distance
    far above the ~15.5 (α=0.05, 8 df) line flags a synthetic or
    truncated column.

    Exactness: the nine Benford probabilities are Python-computed
    integer micro-literals injected into BOTH engines (no query-time
    log10 anywhere); digits come from the exact FLOOR of the price
    (prices ≥ 1 in this schema, so the leading digit of the integer
    part IS the first significant digit); obs·10⁶ and n·p_micro are
    exact integers and the chi-square ratio is the single double step,
    rounded once.

    Scale shape: one map-side-combined 9-group aggregate over the scan
    + a broadcast of the 9-row total — no shuffle wider than 9 rows."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_extendedprice") > 0)
    digits = li.select(
        F.substring(
            F.floor(F.col("l_extendedprice")).cast("long").cast("string"), 1, 1
        ).cast("int").alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    n = obs.agg(F.sum("n_obs").cast("long").alias("n"))
    pmap = F.create_map(
        *[F.lit(x) for d, p in sorted(BENFORD_P_MICRO.items()) for x in (d, p)]
    )
    per = (
        obs.crossJoin(F.broadcast(n))
        .select(
            "digit", "n_obs",
            (pmap[F.col("digit")].cast("long") * F.col("n")).alias("exp_micro"),
            (
                (
                    F.col("n_obs").cast("decimal(38,0)") * F.lit(1_000_000)
                    - pmap[F.col("digit")].cast("decimal(38,0)") * F.col("n")
                )
            ).alias("dev"),
        )
        .select(
            "digit", "n_obs", "exp_micro",
            # per-digit contribution quantized to integer micro-units
            # BEFORE the 9-row total, so the total is an exact integer
            # sum in both engines (no float-accumulation-order drift)
            F.round(
                (F.col("dev") * F.col("dev")).cast("double")
                / (F.col("exp_micro").cast("double") * F.lit(1e6))
                * F.lit(1e6)
            ).cast("long").alias("chi2_micro"),
        )
    )
    tot = per.agg(F.sum("chi2_micro").cast("long").alias("chi2_total_micro"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select("digit", "n_obs", "exp_micro", "chi2_micro", "chi2_total_micro")
    )


TPCH_Q3_DATE = "1998-06-01"  # mid-range cut, shared by engine and twin
TPCH_Q3_K = 10


def _q_tpch_q3_topk(spark, sf_dir):
    """TPC-H Q3 shape (shipping-priority revenue top-k): the canonical
    3-way selective join — σ(customer) ⨝ σ(orders) ⨝ σ(lineitem) →
    per-order revenue → top-k. THE multi-join benchmark pattern:
    Catalyst pushes all three filters to the scans, broadcast-joins
    the filtered customer side, and the top-k is a
    TakeOrderedAndProject — no global sort.

    Exactness: revenue quantizes per ROW to integer cents
    (ROUND(price·(1−disc)·100)) before the per-order sum, so the
    aggregate is order-free exact; ranking ties break on l_orderkey.

    Scale shape: the date/segment filters reach the parquet scans
    (PushedFilters), customer is the broadcast side, the groupBy
    partial-aggregates map-side, top-k never materializes a sort."""
    d = F.lit(TPCH_Q3_DATE).cast("timestamp")
    cust = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < d)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > d)
        .select(
            "l_orderkey",
            F.round(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100)
            ).cast("long").alias("rev_cents"),
        )
    )
    agg = (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .select("o_orderkey", "o_orderdate", "o_orderpriority"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev_cents").cast("long").alias("revenue_cents"))
    )
    order = [F.desc("revenue_cents"), F.asc("l_orderkey")]
    top = agg.orderBy(*order).limit(TPCH_Q3_K)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "l_orderkey",
        F.unix_timestamp("o_orderdate").cast("long").alias("odate_epoch"),
        "o_orderpriority",
        "revenue_cents",
        "rank",
    )


def _q_event_type_correlation(spark, sf_dir):
    """Pearson correlation of hourly activity between event types →
    (type_a, type_b, n_hours, r_micro): which metric streams move
    together — the co-incident-load / shared-driver screen behind
    alert dedup and capacity modelling. The hour×type grid is
    COMPLETED (absent cells are true zeros, not missing rows) — the
    classic correlation-of-counts pitfall.

    Exactness: with x, y integer hourly counts, r's numerator
    H·Σxy − Σx·Σy and both variance terms are exact integers
    (decimal(38,0)/HUGEINT); one double division + sqrt, micro-
    rounded. Degenerate (constant) series report NULL.

    Scale shape: one map-side-combined (type, hour) count, the grid
    completion crossJoins the (calendar-bounded) hour list against the
    (vocabulary-bounded) type list, and the pair join runs on hour
    with T² fan-out — T = #types, not data-sized."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("t"),
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).cast("long").alias("h"),
    )
    counts = ev.groupBy("t", "h").agg(F.count(F.lit(1)).cast("long").alias("c"))
    hours = counts.select("h").distinct()
    types = counts.select("t").distinct()
    grid = (
        hours.crossJoin(F.broadcast(types))
        .join(counts, ["t", "h"], "left")
        .select("t", "h", F.coalesce("c", F.lit(0)).cast("long").alias("c"))
    )
    a = grid.select(F.col("t").alias("type_a"), "h", F.col("c").alias("x"))
    b = grid.select(F.col("t").alias("type_b"), "h", F.col("c").alias("y"))
    dec = "decimal(38,0)"
    mom = (
        a.join(b, "h")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.sum("x").cast(dec).alias("sx"),
            F.sum("y").cast(dec).alias("sy"),
            F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
            F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
            F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
        )
    )
    num = F.col("n_hours") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n_hours") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n_hours") * F.col("syy") - F.col("sy") * F.col("sy")
    return mom.select(
        "type_a",
        "type_b",
        "n_hours",
        F.when(
            (vx > 0) & (vy > 0),
            F.round(
                num.cast("double") / F.sqrt(vx.cast("double") * vy.cast("double"))
                * F.lit(1e6)
            ).cast("long"),
        ).alias("r_micro"),
    )


def _q_session_colift(spark, sf_dir):
    """Market-basket lift between event types over gap sessions →
    (type_a, type_b, c_a, c_b, c_ab, lift_micro): within the same
    30-min session definition session_windows pins, how much more
    often do two event types co-occur than independence predicts —
    the association screen behind funnel design and bundle/abuse
    detection (lift ≫ 1 = coupled behaviours, ≪ 1 = substitutes).

    Exactness: lift = N·c_ab/(c_a·c_b) on exact integer session
    counts, micro-quantized by integer division — no floats at all.

    Scale shape: session ids via the per-user gap window; per-session
    distinct-type item sets partial-aggregate map-side; the pair join
    fans out per session by its own type count (vocabulary-bounded),
    and the final table is T² rows."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = _t(spark, sf_dir, "events").select(
        "user_id", us.alias("m"), F.col("event_type").alias("t")
    )
    wu = Window.partitionBy("user_id").orderBy("m")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    sess = ev.select(
        "user_id", "t",
        F.sum(
            F.when(
                F.lag("m").over(wu).isNull()
                | (F.col("m") - F.lag("m").over(wu) >= F.lit(gap_us)),
                1,
            ).otherwise(0)
        ).over(wu.rowsBetween(Window.unboundedPreceding, 0)).alias("sess"),
    )
    items = sess.select("user_id", "sess", "t").distinct()
    n_sess = items.select("user_id", "sess").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    singles = items.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = items.select("user_id", "sess", F.col("t").alias("type_a"))
    b = items.select("user_id", "sess", F.col("t").alias("type_b"))
    pairs = (
        a.join(b, ["user_id", "sess"])
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    )
    return (
        pairs.join(
            F.broadcast(singles.select(F.col("t").alias("type_a"), F.col("c").alias("c_a"))),
            "type_a",
        )
        .join(
            F.broadcast(singles.select(F.col("t").alias("type_b"), F.col("c").alias("c_b"))),
            "type_b",
        )
        .crossJoin(F.broadcast(n_sess))
        .select(
            "type_a",
            "type_b",
            "c_a",
            "c_b",
            "c_ab",
            F.expr("(1000000 * n * c_ab) div (c_a * c_b)").cast("long").alias("lift_micro"),
        )
    )


def _q_markov_next_accuracy(spark, sf_dir):
    """Markov next-event baseline accuracy → (prev_type, pred_type,
    c_pred, c_total, hit_rate, accuracy_micro): predict each next
    event as the argmax of the first-order transition row
    (event_transitions' matrix turned into a CLASSIFIER) and score it
    on the same sequences — the floor any sequence model must beat,
    and per-row the "how predictable is behaviour after X" detail.
    In-sample by construction (the majority-class baseline is
    evaluated on its own training data — the standard baseline
    convention; a held-out variant splits by user hash).

    Exactness: all counts integers off the same per-user LAG window;
    argmax tie-breaks on the smaller type; accuracy is one integer
    division.

    Scale shape: the transition matrix is T² rows — every join after
    the pair count is broadcast-sized; the argmax window runs over T
    rows per prev_type."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    cnt = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wr = Window.partitionBy("prev_type").orderBy(F.desc("n"), F.asc("next_type"))
    pred = (
        cnt.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select("prev_type", F.col("next_type").alias("pred_type"), F.col("n").alias("c_pred"))
    )
    tot = cnt.groupBy("prev_type").agg(F.sum("n").cast("long").alias("c_total"))
    per = pred.join(F.broadcast(tot), "prev_type")
    acc = per.agg(
        F.expr("(1000000 * sum(c_pred)) div sum(c_total)").cast("long").alias("accuracy_micro")
    )
    return per.crossJoin(F.broadcast(acc)).select(
        "prev_type",
        "pred_type",
        "c_pred",
        "c_total",
        F.expr("(1000000 * c_pred) div c_total").cast("long").alias("hit_rate_micro"),
        "accuracy_micro",
    )


def _q_l_diversity_audit(spark, sf_dir):
    """l-diversity audit of the event stream → per l ∈ {2,5,10}:
    (l_threshold, n_classes, n_classes_below_l, n_rows_at_risk). The
    quasi-identifier is (event_type, hour-of-day); the sensitive
    attribute is user_id — a class whose rows all belong to < l
    distinct users lets an observer who knows "a purchase happened in
    hour H" pin the user even after k-anonymity passes (k counts ROWS,
    l counts distinct SECRETS — the Machanavajjhala et al. refinement;
    the release-gate sibling of k_anonymity_audit / pii_scrub).

    All integers: one groupBy to (class, distinct-user) counts, the
    3-row threshold explode runs against the class table, never the
    events."""
    ev = _t(spark, sf_dir, "events")
    classes = (
        ev.select(
            "event_type",
            F.hour("ts").cast("long").alias("hod"),
            "user_id",
        )
        .groupBy("event_type", "hod")
        .agg(
            F.count(F.lit(1)).cast("long").alias("class_rows"),
            F.countDistinct("user_id").cast("long").alias("n_secrets"),
        )
    )
    ls = spark.createDataFrame([(2,), (5,), (10,)], "l_threshold long")
    return (
        classes.crossJoin(F.broadcast(ls))
        .groupBy("l_threshold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum((F.col("n_secrets") < F.col("l_threshold")).cast("long"))
            .cast("long").alias("n_classes_below_l"),
            F.sum(
                F.when(F.col("n_secrets") < F.col("l_threshold"), F.col("class_rows"))
                .otherwise(F.lit(0))
            ).cast("long").alias("n_rows_at_risk"),
        )
    )


def _q_conversion_time_stats(spark, sf_dir):
    """Click→purchase conversion-time card → one row (n_converted,
    p50_s, p90_s, mean_s): per user, the gap between the FIRST click
    and the first purchase strictly after it — the time-to-convert
    distribution behind attribution windows and session-timeout
    choices (a p90 beyond the session gap says the funnel crosses
    sessions and per-session attribution undercounts).

    Exactness: gaps are exact integer seconds (floor-epoch
    difference); Spark `percentile` and DuckDB `quantile_cont` share
    the interpolated definition on the same integers; the mean is an
    integer-division micro value.

    Scale shape: two per-user min-aggregates (map-side combined), one
    broadcast-size join, one scalar agg — no windows."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").cast("long").alias("es")
    )
    first_click = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("es").alias("t_click"))
    )
    purch = ev.where(F.col("event_type") == "purchase").select("user_id", "es")
    conv = (
        purch.join(first_click.hint("shuffle_hash"), "user_id")
        .where(F.col("es") > F.col("t_click"))
        .groupBy("user_id")
        .agg((F.min("es") - F.max("t_click")).cast("long").alias("gap_s"))
    )
    return conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.expr("percentile(gap_s, 0.5)"), 4).alias("p50_s"),
        F.round(F.expr("percentile(gap_s, 0.9)"), 4).alias("p90_s"),
        F.sum("gap_s").cast("long").alias("sum_s"),
    ).select(
        "n_converted",
        "p50_s",
        "p90_s",
        F.when(
            F.col("n_converted") > 0,
            F.expr("(1000000 * sum_s) div n_converted"),
        ).cast("long").alias("mean_s_micro"),
    )


JOURNEY_LEN = 5
JOURNEY_K = 20


def _q_top_user_journeys(spark, sf_dir):
    """Top-k session journeys → (journey, n, rank): the exact ordered
    sequence of the first JOURNEY_LEN event types in each gap session,
    counted and ranked — the "what do users actually do" product
    read behind funnel design (ordered_funnel tests ONE hypothesized
    path; this surfaces the real ones).

    Exactness: sessions are the pinned integer-microsecond gap
    definition; within-session order is total on (ts, event_id); the
    journey string is an ordered join of the first L types, so counts
    are exact and ranking ties break on the journey string.

    Scale shape: the per-session prefix runs on the per-user session
    window (partitioned); journey counting partial-aggregates map-side
    into journey-vocabulary rows; top-k is a TakeOrderedAndProject."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = _t(spark, sf_dir, "events").select(
        "user_id", us.alias("m"), "event_id", F.col("event_type").alias("t")
    )
    wu = Window.partitionBy("user_id").orderBy("m", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    sess = ev.select(
        "user_id", "m", "event_id", "t",
        F.sum(
            F.when(
                F.lag("m").over(wu).isNull()
                | (F.col("m") - F.lag("m").over(wu) >= F.lit(gap_us)),
                1,
            ).otherwise(0)
        ).over(wu.rowsBetween(Window.unboundedPreceding, 0)).alias("sess"),
    )
    ws = Window.partitionBy("user_id", "sess").orderBy("m", "event_id")
    prefix = (
        sess.withColumn("rn", F.row_number().over(ws))
        .where(F.col("rn") <= JOURNEY_LEN)
    )
    journeys = (
        prefix.groupBy("user_id", "sess")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "t"))),
                    lambda s: s["t"],
                ),
                ">",
            ).alias("journey")
        )
        .groupBy("journey")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    order = [F.desc("n"), F.asc("journey")]
    top = journeys.orderBy(*order).limit(JOURNEY_K)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "journey", "n", "rank"
    )


def _q_session_stats(spark, sf_dir):
    """Session shape card → one row (n_sessions, bounce_rate_micro,
    p50_events, p90_events, p50_duration_s, p90_duration_s,
    mean_events_micro): the distributional summary of the pinned
    30-min gap sessions — bounce share (single-event sessions), event
    counts and wall durations at the percentiles product dashboards
    quote. Complements session_windows (the per-session rows) and
    max_concurrency (their overlap peak).

    Exactness: counts and floor-second durations are exact integers
    off the same microsecond gap definition; percentiles share the
    interpolated definition; the mean is one integer division.

    Scale shape: one per-user session window, one map-side-combined
    per-session agg, one scalar fold."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = _t(spark, sf_dir, "events").select("user_id", us.alias("m"))
    wu = Window.partitionBy("user_id").orderBy("m")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    sess = (
        ev.select(
            "user_id", "m",
            F.sum(
                F.when(
                    F.lag("m").over(wu).isNull()
                    | (F.col("m") - F.lag("m").over(wu) >= F.lit(gap_us)),
                    1,
                ).otherwise(0)
            ).over(wu.rowsBetween(Window.unboundedPreceding, 0)).alias("sess"),
        )
        .groupBy("user_id", "sess")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            ((F.max("m") - F.min("m")) / F.lit(1_000_000)).cast("long").alias("dur_s"),
        )
    )
    return sess.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("long")).cast("long").alias("n_bounce"),
        F.round(F.expr("percentile(n_events, 0.5)"), 4).alias("p50_events"),
        F.round(F.expr("percentile(n_events, 0.9)"), 4).alias("p90_events"),
        F.round(F.expr("percentile(dur_s, 0.5)"), 4).alias("p50_duration_s"),
        F.round(F.expr("percentile(dur_s, 0.9)"), 4).alias("p90_duration_s"),
        F.sum("n_events").cast("long").alias("sum_events"),
    ).select(
        "n_sessions",
        F.expr("(1000000 * n_bounce) div n_sessions").cast("long").alias("bounce_rate_micro"),
        "p50_events",
        "p90_events",
        "p50_duration_s",
        "p90_duration_s",
        F.expr("(1000000 * sum_events) div n_sessions").cast("long").alias("mean_events_micro"),
    )


def _q_user_activity_gini(spark, sf_dir):
    """Gini + top-1% share of events per user (plans/metrics.py:
    gini_profile — the degree_gini machinery pointed at the event
    stream): the activity-concentration dial behind rate limiting and
    the per-user skew the HH family hunts; a Gini near 1 says a few
    accounts generate the traffic (bots/abuse or power users)."""
    from metis_spark.plans.metrics import gini_profile

    counts = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    return gini_profile(counts)


def _q_hour_of_week_profile(spark, sf_dir):
    """Hour-of-week traffic heatmap → (dow, hod, n, share_micro,
    chi2_total_micro): the 168-cell seasonality profile every
    capacity plan and anomaly baseline starts from, plus the
    chi-square distance from uniform (0 = flat traffic; large = sharp
    weekly structure worth a per-hour baseline in the CUSUM/burst
    detectors). dow is pinned 0=Sunday in both engines.

    All integers until the single χ² double per cell (micro-quantized
    before the exact total — the Benford discipline); share is an
    integer division."""
    ev = _t(spark, sf_dir, "events").select(
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
    )
    cells = ev.groupBy("dow", "hod").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = cells.agg(
        F.sum("n").cast("long").alias("nt"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    per = cells.crossJoin(F.broadcast(tot)).select(
        "dow", "hod", "n",
        F.expr("(1000000 * n) div nt").cast("long").alias("share_micro"),
        # exp = nt / n_cells; chi2 cell = (n·n_cells − nt)² / (nt·n_cells)
        F.round(
            (
                (F.col("n").cast("decimal(38,0)") * F.col("n_cells") - F.col("nt"))
                * (F.col("n").cast("decimal(38,0)") * F.col("n_cells") - F.col("nt"))
            ).cast("double")
            / (F.col("nt").cast("double") * F.col("n_cells").cast("double"))
            * F.lit(1e6)
        ).cast("long").alias("chi2_micro"),
    )
    ctot = per.agg(F.sum("chi2_micro").cast("long").alias("chi2_total_micro"))
    return per.crossJoin(F.broadcast(ctot)).select(
        "dow", "hod", "n", "share_micro", "chi2_total_micro"
    )


WATERMARK_DELAYS_S = (0, 60, 600)


def _q_watermark_lateness_audit(spark, sf_dir):
    """Out-of-order depth audit → one row per candidate watermark
    delay (delay_s, n_events, n_late, late_rate_micro, p99_late_s):
    with event_id as the arrival sequence, an event's lateness is the
    high-water-mark timestamp already seen minus its own — exactly
    the events a `withWatermark(delay)` streaming aggregation would
    DROP. The table answers the one question every streaming job
    asks first: which delay bounds state while losing < x% of events
    (streaming/incremental.py's watermarked paths consume the answer).

    Exactness: integer floor-second lateness; the high-water mark is
    a TWO-LEVEL prefix max (per 4096-event arrival bucket + bucket
    carry), so no unbounded single-partition window — the same trick
    as max_concurrency; percentile shares the interpolated
    definition; rates are integer divisions.
    """
    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.unix_timestamp("ts").cast("long").alias("es")
    )
    b = (F.col("event_id") / F.lit(4096)).cast("long")
    wb = (
        Window.partitionBy("b")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucketed = ev.withColumn("b", b).withColumn("inmax", F.max("es").over(wb))
    wc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    carry = (
        bucketed.groupBy("b")
        .agg(F.max("es").alias("bmax"))
        .select("b", F.max("bmax").over(wc).alias("carry"))
    )
    late = (
        bucketed.join(F.broadcast(carry), "b")
        .select(
            F.greatest(
                F.lit(0).cast("long"),
                F.greatest(
                    F.coalesce("inmax", F.lit(None).cast("long")),
                    F.col("carry"),
                )
                - F.col("es"),
            ).alias("late_s"),
        )
        .select(F.coalesce("late_s", F.lit(0)).cast("long").alias("late_s"))
    )
    grid = spark.createDataFrame([(d,) for d in WATERMARK_DELAYS_S], "delay_s long")
    stats = late.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.expr("percentile(late_s, 0.99)"), 4).alias("p99_late_s"),
    )
    per = (
        late.crossJoin(F.broadcast(grid))
        .groupBy("delay_s")
        .agg(F.sum((F.col("late_s") > F.col("delay_s")).cast("long")).cast("long").alias("n_late"))
    )
    return per.crossJoin(F.broadcast(stats)).select(
        "delay_s",
        "n_events",
        "n_late",
        F.expr("(1000000 * n_late) div n_events").cast("long").alias("late_rate_micro"),
        "p99_late_s",
    )


def _q_order_priority_semijoin(spark, sf_dir):
    """TPC-H Q4 shape (priority counts over a semi-join): orders that
    have at least one line item shipped after the order date, counted
    by priority — the canonical EXISTS/LEFT-SEMI pattern: the probe
    side never duplicates (semi-join, not inner), the filter pushes
    to both scans, and the count is grouped on a vocabulary-sized
    key. All integers."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    has_late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return has_late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )


def _q_tpch_q5_lite(spark, sf_dir):
    """TPC-H Q5 shape (revenue by supplier nation): lineitem ⨝
    supplier ⨝ nation with per-row cent quantization before the
    per-nation sum — the star-join rollup whose two dimension sides
    broadcast; complements tpch_q3_topk's selective-filter shape.
    Exact integer revenue."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100)
        ).cast("long").alias("rev_cents"),
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("rev_cents").cast("long").alias("revenue_cents"),
        )
    )


def _q_brand_return_rates(spark, sf_dir):
    """Return-rate screen per part brand → (p_brand, n_items,
    n_returned, return_rate_micro, overall_rate_micro): which brands'
    items come back — the vendor-quality BI read; rates are exact
    integer divisions and the overall rate broadcasts back so each
    row carries its own baseline."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", (F.col("l_returnflag") == "R").cast("long").alias("ret")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("ret").cast("long").alias("n_returned"),
        )
    )
    tot = per.agg(
        F.expr("(1000000 * sum(n_returned)) div sum(n_items)")
        .cast("long").alias("overall_rate_micro")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "p_brand",
        "n_items",
        "n_returned",
        F.expr("(1000000 * n_returned) div n_items").cast("long").alias("return_rate_micro"),
        "overall_rate_micro",
    )


def _q_stickiness_card(spark, sf_dir):
    """Engagement stickiness card → one row (n_users, n_days,
    user_days, avg_dau_micro, multi_day_user_rate_micro): average
    daily active users and the share of users active on ≥ 2 distinct
    days — the DAU/MAU-style retention pulse (a high event count with
    a low multi-day share is drive-by traffic; the per-cohort detail
    lives in retention_cohorts). All integer counts off one
    (user, day) distinct; two integer divisions."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).cast("long").alias("d"),
    ).distinct()
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("nd"))
    days = ev.select("d").distinct().agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    base = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("nd").cast("long").alias("user_days"),
        F.sum((F.col("nd") >= 2).cast("long")).cast("long").alias("n_multi"),
    )
    return base.crossJoin(F.broadcast(days)).select(
        "n_users",
        "n_days",
        "user_days",
        F.expr("(1000000 * user_days) div n_days").cast("long").alias("avg_dau_micro"),
        F.expr("(1000000 * n_multi) div n_users").cast("long").alias("multi_day_user_rate_micro"),
    )


def _q_segment_order_stats(spark, sf_dir):
    """Order-value distribution per market segment → (c_mktsegment,
    n_orders, p50_price, p90_price, mean_cents): the
    customer-dimension slice of order_stats — broadcast dimension
    join, shared interpolated percentiles, exact integer mean in
    cents."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        F.round(F.col("o_totalprice") * F.lit(100)).cast("long").alias("cents"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .select(
            "c_mktsegment",
            "n_orders",
            "p50_price",
            "p90_price",
            F.expr("sum_cents div n_orders").cast("long").alias("mean_cents"),
        )
    )


def _q_revenue_hhi(spark, sf_dir):
    """Supplier revenue concentration → one row (n_suppliers,
    total_cents, hhi_micro, top1_share_micro, top10_share_micro): the
    Herfindahl–Hirschman index Σ shareᵢ² of lineitem revenue across
    suppliers plus the top-1/top-10 shares — the supply-chain
    concentration screen (HHI > 0.25 ≡ 2500 points = highly
    concentrated; losing one supplier breaks the pipeline).

    Exactness: per-row cents quantization, Σrevᵢ² in decimal(38,0) —
    HHI = Σrev²/total² needs ONE double division; the top-k shares
    are TakeOrdered sums over k rows, integer divisions."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100)
        ).cast("long").alias("cents"),
    )
    per = li.groupBy("l_suppkey").agg(F.sum("cents").cast("long").alias("rev"))
    dec = "decimal(38,0)"
    base = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("rev").cast("long").alias("total_cents"),
        F.sum(F.col("rev").cast(dec) * F.col("rev")).alias("s2"),
        F.max("rev").cast("long").alias("top1"),
    )
    top10 = (
        per.orderBy(F.desc("rev"), F.asc("l_suppkey"))
        .limit(10)
        .agg(F.sum("rev").cast("long").alias("t10"))
    )
    return base.crossJoin(F.broadcast(top10)).select(
        "n_suppliers",
        "total_cents",
        F.round(
            F.col("s2").cast("double")
            / (F.col("total_cents").cast("double") * F.col("total_cents").cast("double"))
            * F.lit(1e6)
        ).cast("long").alias("hhi_micro"),
        F.expr("(1000000 * top1) div total_cents").cast("long").alias("top1_share_micro"),
        F.expr("(1000000 * t10) div total_cents").cast("long").alias("top10_share_micro"),
    )


def _q_psi_value_drift(spark, sf_dir):
    """Population-stability-index drift monitor → (event_type,
    n_first, n_second, psi_micro): the value distribution of each
    event type in the FIRST half of the time range vs the SECOND,
    compared by the model-monitoring industry's standard
    PSI = Σ_bins (p₂−p₁)·ln(p₂/p₁) over 10 equal-width bins
    (rule of thumb: < 0.1 stable, > 0.25 drifted — the continuous
    sibling of cusum_changepoints' single-shift estimator, and what
    a feature-store monitor runs nightly).

    Exactness: the time split point and bin edges are integer
    microsecond/micro-value arithmetic from per-type min/max (exact,
    broadcast back); bins get +1 Laplace smoothing so empty cells are
    defined; each bin term is one double from exact integer ratios,
    micro-quantized BEFORE the 10-bin sum (exact integer total).

    Scale shape: two passes (min/max then binned counts), both
    map-side-combined; everything after is (types × 10) rows."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("m"),
        F.round(F.col("value") * F.lit(1e6)).cast("long").alias("vm"),
    )
    rng = ev.groupBy("event_type").agg(
        F.min("m").alias("m0"),
        F.max("m").alias("m1"),
        F.min("vm").alias("v0"),
        F.max("vm").alias("v1"),
    )
    binned = (
        ev.join(F.broadcast(rng), "event_type")
        .select(
            "event_type",
            # first half: m < midpoint (integer average, exact)
            (F.col("m") < (F.col("m0") + F.col("m1")) / F.lit(2)).cast("int").alias("h"),
            F.least(
                F.lit(9).cast("long"),
                F.expr("((vm - v0) * 10) div (v1 - v0 + 1)"),
            ).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.col("h")).cast("long").alias("c1"),
            F.sum(F.lit(1) - F.col("h")).cast("long").alias("c2"),
        )
    )
    # complete the 10-bin grid so Laplace smoothing sees empty bins
    bins = spark.createDataFrame([(b,) for b in range(10)], "bin long")
    types = binned.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(bins))
        .join(binned, ["event_type", "bin"], "left")
        .select(
            "event_type", "bin",
            F.coalesce("c1", F.lit(0)).cast("long").alias("c1"),
            F.coalesce("c2", F.lit(0)).cast("long").alias("c2"),
        )
    )
    tot = grid.groupBy("event_type").agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    # p_i = (c_i + 1)/(n_i + 10); term = (p2 − p1)·ln(p2/p1), all from
    # exact integers: ln(((c2+1)(n1+10)) / ((c1+1)(n2+10)))
    terms = grid.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "n1",
        "n2",
        F.round(
            (
                (F.col("c2") + 1).cast("double") / (F.col("n2") + 10).cast("double")
                - (F.col("c1") + 1).cast("double") / (F.col("n1") + 10).cast("double")
            )
            * F.log(
                ((F.col("c2") + 1).cast("double") * (F.col("n1") + 10).cast("double"))
                / ((F.col("c1") + 1).cast("double") * (F.col("n2") + 10).cast("double"))
            )
            * F.lit(1e6)
        ).cast("long").alias("tm"),
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.max("n1").alias("n_first"),
            F.max("n2").alias("n_second"),
            F.sum("tm").cast("long").alias("psi_micro"),
        )
    )


def _q_region_revenue_rollup(spark, sf_dir):
    """Region → nation revenue rollup (grouping-sets over the 4-way
    star lineitem ⨝ supplier ⨝ nation ⨝ region): subtotals per
    nation, per region, and the grand total in one pass — the
    drill-down cube a revenue dashboard serves, and the query that
    completes full table coverage (region was the one driver table no
    other query touched). Both dimension chains broadcast; per-row
    cent quantization keeps every subtotal an exact integer."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100)
        ).cast("long").alias("cents"),
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


def _q_seasonal_anomaly_hours(spark, sf_dir):
    """Seasonality-adjusted anomaly screen → one row per hour-of-week
    cell (dow, hod, n_weeks, latest_n, baseline_mean_micro, z_micro):
    the LATEST week's count in each (dow, hour) cell z-scored against
    that same cell's earlier-weeks baseline — the operational sequel
    to hour_of_week_profile (which gives the static heatmap): "is
    Tuesday 14h unusually hot THIS week" with weekly seasonality
    removed. The per-cell baseline grid is COMPLETED across weeks
    (absent cells are true zeros — the correlation-of-counts pitfall
    again).

    Exactness: z = (latest·W − S)/√(W·S² − S²)... precisely
    (latest·W − S)/√(W·S2 − S²) with every quantity under and above
    the root an exact integer (decimal/HUGEINT); one double division,
    micro-rounded; degenerate cells (W < 2 or zero variance) report
    NULL. Baselines are integer-division micro means.

    Scale shape: one (cell, week) count, grid completion crossJoins
    the calendar-bounded week list against the ≤168 cells, one
    map-side-combined moment fold."""
    ev = _t(spark, sf_dir, "events").select(
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
        F.expr("(unix_timestamp(ts) div 86400) div 7").cast("long").alias("wk"),
    )
    counts = ev.groupBy("dow", "hod", "wk").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    latest_wk = counts.agg(F.max("wk").alias("lw"))
    cells = counts.select("dow", "hod").distinct()
    weeks = counts.select("wk").distinct()
    grid = (
        cells.crossJoin(weeks)
        .join(counts, ["dow", "hod", "wk"], "left")
        .select(
            "dow", "hod", "wk", F.coalesce("c", F.lit(0)).cast("long").alias("c")
        )
        .crossJoin(F.broadcast(latest_wk))
    )
    dec = "decimal(38,0)"
    base = (
        grid.where(F.col("wk") < F.col("lw"))
        .groupBy("dow", "hod")
        .agg(
            F.count(F.lit(1)).cast("long").alias("w"),
            F.sum("c").cast(dec).alias("s"),
            F.sum(F.col("c").cast(dec) * F.col("c")).alias("s2"),
        )
    )
    latest = (
        grid.where(F.col("wk") == F.col("lw"))
        .select("dow", "hod", F.col("c").alias("latest_n"))
    )
    var_n = F.col("w") * F.col("s2") - F.col("s") * F.col("s")
    return (
        base.join(latest, ["dow", "hod"])
        .select(
            "dow",
            "hod",
            (F.col("w") + 1).cast("long").alias("n_weeks"),
            "latest_n",
            F.expr("(cast(1000000 as decimal(38,0)) * s) div w").cast("long")
            .alias("baseline_mean_micro"),
            F.when(
                (F.col("w") >= 2) & (var_n > 0),
                F.round(
                    (F.col("latest_n").cast(dec) * F.col("w") - F.col("s")).cast("double")
                    / F.sqrt(var_n.cast("double"))
                    * F.lit(1e6)
                ).cast("long"),
            ).alias("z_micro"),
        )
    )


def _q_order_backlog_card(spark, sf_dir):
    """Backlog aging card → one row per o_orderstatus (status, n,
    p50_age_days, p90_age_days, max_age_days, value_cents): order age
    (data-horizon minus order date, integer days) and locked-up value
    per status — the open-orders ('O') row is the working-capital /
    fulfilment-SLA read, with 'F'/'P' as controls. Horizon = the
    table's own max o_orderdate (deterministic, like
    decayed_event_counts' Tmax).

    Exactness: integer day ages off floor-epoch arithmetic; shared
    interpolated percentiles; exact integer cents sums."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.unix_timestamp("o_orderdate").cast("long").alias("es"),
        F.round(F.col("o_totalprice") * F.lit(100)).cast("long").alias("cents"),
    )
    mx = o.agg(F.max("es").alias("tmax"))
    aged = o.crossJoin(F.broadcast(mx)).select(
        "o_orderstatus",
        F.expr("(tmax - es) div 86400").cast("long").alias("age_d"),
        "cents",
    )
    return aged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.expr("percentile(age_d, 0.5)"), 4).alias("p50_age_days"),
        F.round(F.expr("percentile(age_d, 0.9)"), 4).alias("p90_age_days"),
        F.max("age_d").cast("long").alias("max_age_days"),
        F.sum("cents").cast("long").alias("value_cents"),
    )


def _q_acctbal_health_card(spark, sf_dir):
    """Account-balance credit screen → one row per entity
    ('customer'/'supplier'): (entity, n, n_negative,
    neg_share_micro, p50_bal, p90_bal, total_cents) — the
    counterparty-risk read on both balance columns; negative-balance
    share is the default-risk dial. Exact cents sums, shared
    percentiles; the two dimension scans union into one plan."""
    c = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("entity"), F.col("c_acctbal").alias("bal")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("entity"), F.col("s_acctbal").alias("bal")
    )
    both = c.unionByName(s).select(
        "entity", "bal", F.round(F.col("bal") * F.lit(100)).cast("long").alias("cents")
    )
    return (
        both.groupBy("entity")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.col("bal") < 0).cast("long")).cast("long").alias("n_negative"),
            F.round(F.expr("percentile(bal, 0.5)"), 4).alias("p50_bal"),
            F.round(F.expr("percentile(bal, 0.9)"), 4).alias("p90_bal"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        .select(
            "entity", "n", "n_negative",
            F.expr("(1000000 * n_negative) div n").cast("long").alias("neg_share_micro"),
            "p50_bal", "p90_bal", "total_cents",
        )
    )


def _q_part_type_revenue_topk(spark, sf_dir):
    """Revenue by part type, top-10 → (p_type, n_items,
    revenue_cents, rank): the product-mix concentration view on the
    one part dimension column no other query used; broadcast
    dimension join, exact cents, TakeOrdered."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100)
        ).cast("long").alias("cents"),
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )
    order = [F.desc("revenue_cents"), F.asc("p_type")]
    top = agg.orderBy(*order).limit(10)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "p_type", "n_items", "revenue_cents", "rank"
    )


def _q_transition_dwell_stats(spark, sf_dir):
    """Dwell time per event transition → (prev_type, next_type, n,
    p50_gap_s, p90_gap_s, mean_gap_s_micro): how long users sit
    between consecutive event types — the TIMING layer over
    event_transitions' probability matrix (a funnel step with high
    probability but hour-long dwell is where sessions die). Gaps are
    exact integer seconds off the same per-user LAG window; shared
    percentiles; integer-division mean."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
        (
            F.unix_timestamp("ts") - F.lag(F.unix_timestamp("ts")).over(w)
        ).cast("long").alias("gap_s"),
    ).where(F.col("prev_type").isNotNull())
    return (
        pairs.groupBy("prev_type", "next_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.expr("percentile(gap_s, 0.5)"), 4).alias("p50_gap_s"),
            F.round(F.expr("percentile(gap_s, 0.9)"), 4).alias("p90_gap_s"),
            F.sum("gap_s").cast("long").alias("sg"),
        )
        .select(
            "prev_type", "next_type", "n", "p50_gap_s", "p90_gap_s",
            F.expr("(1000000 * sg) div n").cast("long").alias("mean_gap_s_micro"),
        )
    )


def _q_basket_size_profile(spark, sf_dir):
    """CSN fit + entropy of lines-per-order (plans/metrics.py:
    powerlaw_profile on lineitem counts per order) — the basket-size
    distribution behind join fan-out estimates on l_orderkey and the
    fifth member of the generic profile family."""
    from metis_spark.plans.metrics import powerlaw_profile

    counts = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    return powerlaw_profile(counts)


def _q_discount_elasticity(spark, sf_dir):
    """Discount→quantity response per return flag → (l_returnflag, n,
    r_micro, mean_disc_micro, mean_qty_micro): the Pearson
    correlation between line discount and quantity — the five-minute
    elasticity read (r ≈ 0 says discounts aren't moving volume and
    the margin is being given away; computed per flag so returns
    can't mask the live population).

    Exactness: discount quantizes to basis points and quantity to
    centi-units once; all Pearson moments are exact
    decimal(38,0)/HUGEINT; one double division (the
    event_type_correlation shape); means are integer divisions."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_discount") * F.lit(10_000)).cast("long").alias("x"),
        F.round(F.col("l_quantity") * F.lit(100)).cast("long").alias("y"),
    )
    dec = "decimal(38,0)"
    mom = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return mom.select(
        "l_returnflag",
        "n",
        F.when(
            (vx > 0) & (vy > 0),
            F.round(
                num.cast("double") / F.sqrt(vx.cast("double") * vy.cast("double"))
                * F.lit(1e6)
            ).cast("long"),
        ).alias("r_micro"),
        F.expr("cast((cast(100 as decimal(38,0)) * sx) div n as long)").alias("mean_disc_micro"),
        F.expr("cast((cast(10000 as decimal(38,0)) * sy) div n as long)").alias("mean_qty_micro"),
    )


def _q_repeat_revenue_share(spark, sf_dir):
    """Loyalty concentration → one row (n_customers, n_repeat,
    repeat_share_micro, revenue_cents, repeat_revenue_micro): how
    much of total order value comes from customers with ≥ 2 orders —
    the retention-economics scalar next to stickiness_card's
    event-level pulse. All integers."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * F.lit(100)).cast("long").alias("cents"),
    )
    per = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("rev"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum((F.col("n_orders") >= 2).cast("long")).cast("long").alias("n_repeat"),
        F.sum("rev").cast("long").alias("revenue_cents"),
        F.sum(F.when(F.col("n_orders") >= 2, F.col("rev")).otherwise(0)).cast("long").alias("rr"),
    ).select(
        "n_customers",
        "n_repeat",
        F.expr("(1000000 * n_repeat) div n_customers").cast("long").alias("repeat_share_micro"),
        "revenue_cents",
        F.expr("(1000000 * rr) div revenue_cents").cast("long").alias("repeat_revenue_micro"),
    )


def _q_value_autocorrelation(spark, sf_dir):
    """Lag-1 serial dependence per event type → (event_type, n_pairs,
    r_micro): Pearson between consecutive values in each type's
    (ts, event_id)-ordered stream — the short-memory companion to
    cusum_changepoints (single shift) and psi_value_drift (slow
    drift): r near 0 says values are independent draws, high |r| says
    a stateful process (retries, ramps, feedback) worth modelling.
    Micro-quantized values, exact integer moments, one double."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id",
        F.round(F.col("value") * F.lit(1e6)).cast("long").alias("vm"),
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pairs = ev.select(
        "event_type",
        F.lag("vm").over(w).alias("x"),
        F.col("vm").alias("y"),
    ).where(F.col("x").isNotNull())
    dec = "decimal(38,0)"
    mom = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
    )
    num = F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
    return mom.select(
        "event_type",
        "n_pairs",
        F.when(
            (vx > 0) & (vy > 0),
            F.round(
                num.cast("double") / F.sqrt(vx.cast("double") * vy.cast("double"))
                * F.lit(1e6)
            ).cast("long"),
        ).alias("r_micro"),
    )


HH_STAB_MIN = 3


def _q_heavy_hitter_stability(spark, sf_dir):
    """Heavy-hitter churn → one row (n_first, n_second, n_both,
    jaccard_micro, mass_overlap_micro): the ≥HH_STAB_MIN-event user
    sets of the first and second halves of the time range, their
    Jaccard overlap, and the share of second-half heavy traffic that
    comes from ALREADY-heavy users — stable sets mean rate-limit
    state and HH sketches stay warm; high churn means every window
    starts cold (and "heavy" is bursty, not behavioural). All
    integers off the same midpoint split as psi_value_drift."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("m")
    )
    rng = ev.agg(F.min("m").alias("m0"), F.max("m").alias("m1"))
    halved = ev.crossJoin(F.broadcast(rng)).select(
        "user_id",
        (F.col("m") < (F.col("m0") + F.col("m1")) / F.lit(2)).cast("int").alias("h"),
    )
    per = halved.groupBy("user_id").agg(
        F.sum("h").cast("long").alias("c1"),
        F.sum(F.lit(1) - F.col("h")).cast("long").alias("c2"),
    )
    flags = per.select(
        "user_id", "c1", "c2",
        (F.col("c1") >= HH_STAB_MIN).cast("long").alias("h1"),
        (F.col("c2") >= HH_STAB_MIN).cast("long").alias("h2"),
    )
    return flags.agg(
        F.sum("h1").cast("long").alias("n_first"),
        F.sum("h2").cast("long").alias("n_second"),
        F.sum(F.col("h1") * F.col("h2")).cast("long").alias("n_both"),
        F.sum(F.col("h2") * F.col("c2")).cast("long").alias("mass2"),
        F.sum(F.col("h1") * F.col("h2") * F.col("c2")).cast("long").alias("mass2_stable"),
    ).select(
        "n_first",
        "n_second",
        "n_both",
        F.when(
            (F.col("n_first") + F.col("n_second") - F.col("n_both")) > 0,
            F.expr("(1000000 * n_both) div (n_first + n_second - n_both)"),
        ).otherwise(F.lit(0)).cast("long").alias("jaccard_micro"),
        F.when(
            F.col("mass2") > 0, F.expr("(1000000 * mass2_stable) div mass2")
        ).otherwise(F.lit(0)).cast("long").alias("mass_overlap_micro"),
    )
