"""kleinberg_bursts (operators/bursts.py) — exact Python replica +
structural pins.

The replica reimplements the integer-scaled Viterbi with the same
quantization and tie-breaks; the engine must reproduce it exactly.
Structural: a uniform-gap user never bursts (state 1's emission is
strictly worse at the mean gap, entry costs extra); a tight cluster
inside long quiet stretches does.
"""

from __future__ import annotations

import datetime
import math

from metis_spark.operators.bursts import INF, SCALE, kleinberg_bursts


def _replica(times: list[int]):
    ts = sorted(times)
    n = len(ts)
    t_span = ts[-1] - ts[0]
    if n < 3 or t_span < 1:
        return None
    gaps = [ts[i + 1] - ts[i] for i in range(n - 1)]
    l0 = round(1e6 * t_span * math.log((n - 1) / t_span))
    l1 = round(1e6 * t_span * math.log(2.0 * (n - 1) / t_span))
    tr = round(1e6 * t_span * math.log(n))
    c0, c1, nb0, nb1, kg0, kg1 = 0, INF, 0, 0, 0, 0
    for g in gaps:
        t00 = c0 <= c1
        b0 = min(c0, c1)
        nb0n, kg0n = (nb0, kg0) if t00 else (nb1, kg1)
        f0c = c0 + tr
        t10 = f0c < c1
        b1 = f0c if t10 else c1
        nb1n = nb0 + 1 if t10 else nb1
        kg1n = (kg0 if t10 else kg1) + 1
        eb = SCALE * (n - 1) * g
        c0, c1 = b0 + eb - l0, b1 + 2 * eb - l1
        nb0, nb1, kg0, kg1 = nb0n, nb1n, kg0n, kg1n
    end0 = c0 <= c1
    return (
        n, t_span,
        nb0 if end0 else nb1,
        kg0 if end0 else kg1,
        min(c0, c1),
    )


def _run(spark, users: dict[int, list[int]]):
    rows = [
        (u, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s))
        for u, tl in users.items()
        for s in tl
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    return {
        r["user_id"]: (
            r["n_events"], r["span_seconds"], r["n_bursts"],
            r["burst_gaps"], r["total_cost_scaled"],
        )
        for r in kleinberg_bursts(df).collect()
    }


def test_matches_python_replica(spark):
    users = {
        1: [0, 1000, 2000, 2010, 2020, 2030, 5000, 9000],
        2: [0, 500, 1000, 1500, 2000, 2500],
        3: [0, 7, 9, 11, 5000, 5003, 5004, 9000, 9001],
        4: [0, 1],  # below min_events: dropped
    }
    got = _run(spark, users)
    want = {u: _replica(tl) for u, tl in users.items() if _replica(tl)}
    assert got == want


def test_uniform_user_never_bursts(spark):
    got = _run(spark, {9: list(range(0, 6000, 500))})
    assert got[9][2] == 0 and got[9][3] == 0


def test_tight_cluster_bursts(spark):
    # three 10s-spaced events inside hour-long quiet stretches
    got = _run(spark, {5: [0, 3600, 3610, 3620, 3630, 7200, 10800]})
    assert got[5][2] >= 1  # at least one 0→1 transition
    assert got[5][3] >= 3  # the cluster's gaps are burst-labeled
