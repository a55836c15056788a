"""Kleinberg burst detection (Kleinberg, KDD 2002) — engine-exact.

Per user, the 2-state automaton over inter-event gaps: state 0 emits
gaps at the empirical base rate α₀ = (n−1)/T, the burst state 1 at
α₁ = 2α₀; entering the burst state costs γ·ln n (γ = 1), leaving is
free. The Viterbi path minimizing

    Σ_i (α_q·g_i − ln α_q) + (#0→1 transitions)·γ·ln n

labels the bursty stretches — the standard model behind "this topic /
user / API suddenly spiked" detectors (and the reason a curation
pipeline can separate a genuine event spike from steady spam).

ENGINE-EXACT DP: the objective is rescaled by 10⁶·T so the gap term
becomes the exact integer 10⁶·f_q·(n−1)·g (f₀=1, f₁=2) and the only
float quantizations are three per-user constants —
L_q = ROUND(10⁶·T·ln(f_q(n−1)/T)) and TR = ROUND(10⁶·T·ln n) — after
which the entire Viterbi recursion is integer arithmetic with pinned
tie-breaks (arrive-at-0 prefers from-0 on ties; arrive-at-1 prefers
staying in 1), so a DuckDB recursive CTE replays the optimal path
bit-for-bit. INF = 5·10¹⁷ forbids starting in the burst state without
overflow risk (max real cost ≈ 10⁶·2(n−1)·T ≪ INF).

The whole DP runs inside F.aggregate over the per-user sorted gap
array — JVM-side whole-stage codegen, zero Python UDFs. Scale shape:
one map-side-combined collect_list per user (state bounded by events-
per-user, the same bound sessionization carries), then map-only fold;
nothing global. Gap values are invariant to the ordering of equal
timestamps, so the sort_array is deterministic where it matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INF = 500_000_000_000_000_000  # 5e17: > any real cost, safe to add to
SCALE = 1_000_000


def kleinberg_bursts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    min_events: int = 3,
) -> DataFrame:
    """→ (user_id, n_events, span_seconds, n_bursts, burst_gaps,
    total_cost_scaled): optimal 2-state Kleinberg labeling per user.

    n_bursts = 0→1 transitions on the optimal path; burst_gaps = gaps
    labeled bursty. Users with < min_events events or zero span are
    skipped (no rate to estimate).
    """
    ev = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.floor(F.unix_timestamp(F.col(ts_col))).cast("long").alias("es"),
    )
    per = (
        ev.groupBy("user_id")
        .agg(F.sort_array(F.collect_list("es")).alias("tsl"))
        .select(
            "user_id",
            "tsl",
            F.size("tsl").cast("long").alias("n"),
            (F.element_at("tsl", -1) - F.element_at("tsl", 1)).cast("long").alias("t_span"),
        )
        .where((F.col("n") >= min_events) & (F.col("t_span") >= 1))
    )
    nd = F.col("n").cast("double")
    td = F.col("t_span").cast("double")
    per = per.select(
        "user_id", "n", "t_span",
        F.transform(
            F.sequence(F.lit(1), F.size("tsl") - 1),
            lambda i: (
                F.element_at("tsl", (i + 1).cast("int"))
                - F.element_at("tsl", i.cast("int"))
            ).cast("long"),
        ).alias("gaps"),
        F.round(F.lit(float(SCALE)) * td * F.log((nd - 1) / td)).cast("long").alias("l0"),
        F.round(F.lit(float(SCALE)) * td * F.log(F.lit(2.0) * (nd - 1) / td)).cast("long").alias("l1"),
        F.round(F.lit(float(SCALE)) * td * F.log(nd)).cast("long").alias("tr"),
    )
    z = F.lit(0).cast("long")
    init = F.struct(
        z.alias("c0"), F.lit(INF).cast("long").alias("c1"),
        z.alias("nb0"), z.alias("nb1"), z.alias("kg0"), z.alias("kg1"),
    )

    def step(acc, g):
        # arrive at state 0: 1→0 is free; ties prefer from-0
        take0_from0 = acc["c0"] <= acc["c1"]
        best0 = F.least(acc["c0"], acc["c1"])
        nb0 = F.when(take0_from0, acc["nb0"]).otherwise(acc["nb1"])
        kg0 = F.when(take0_from0, acc["kg0"]).otherwise(acc["kg1"])
        # arrive at state 1: 0→1 pays tr; ties prefer staying in 1
        from0c = acc["c0"] + F.col("tr")
        take1_from0 = from0c < acc["c1"]
        best1 = F.when(take1_from0, from0c).otherwise(acc["c1"])
        nb1 = F.when(take1_from0, acc["nb0"] + 1).otherwise(acc["nb1"])
        kg1 = (F.when(take1_from0, acc["kg0"]).otherwise(acc["kg1"])) + 1
        emit_base = F.lit(SCALE) * (F.col("n") - 1) * g
        return F.struct(
            (best0 + emit_base - F.col("l0")).cast("long").alias("c0"),
            (best1 + F.lit(2) * emit_base - F.col("l1")).cast("long").alias("c1"),
            nb0.cast("long").alias("nb0"), nb1.cast("long").alias("nb1"),
            kg0.cast("long").alias("kg0"), kg1.cast("long").alias("kg1"),
        )

    folded = per.select(
        "user_id", "n", "t_span",
        F.aggregate("gaps", init, step).alias("dp"),
    )
    end0 = F.col("dp.c0") <= F.col("dp.c1")
    return folded.select(
        "user_id",
        F.col("n").alias("n_events"),
        F.col("t_span").alias("span_seconds"),
        F.when(end0, F.col("dp.nb0")).otherwise(F.col("dp.nb1")).cast("long").alias("n_bursts"),
        F.when(end0, F.col("dp.kg0")).otherwise(F.col("dp.kg1")).cast("long").alias("burst_gaps"),
        F.least(F.col("dp.c0"), F.col("dp.c1")).cast("long").alias("total_cost_scaled"),
    )
