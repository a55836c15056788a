"""facility_location_seeds (operators/similarity.py) — exact Python
replica + the submodularity pin (greedy marginals never increase).
"""

from __future__ import annotations

import hashlib
import math

from metis_spark.operators.similarity import facility_location_seeds


def _replica(vecs: dict[int, list[float]], k: int, pool: int):
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    def h(pid):
        return int(hashlib.md5(f"fl{pid}".encode()).hexdigest()[:15], 16)

    cands = sorted(vecs, key=lambda p: (h(p), p))[:pool]
    sim = {
        (p, c): round(cos(vecs[p], vecs[c]) * 1e6) for p in vecs for c in cands
    }
    best = {p: 0 for p in vecs}
    out, taken, total = [], set(), 0
    for rn in range(1, k + 1):
        marg = sorted(
            (
                (-sum(max(sim[(p, c)] - best[p], 0) for p in vecs), c)
                for c in cands
                if c not in taken
            )
        )
        if not marg:
            break
        g, c = -marg[0][0], marg[0][1]
        total += g
        out.append((rn, c, g, total))
        taken.add(c)
        for p in vecs:
            best[p] = max(best[p], sim[(p, c)])
    return out


def test_matches_python_replica(spark):
    vecs = {
        i: [math.cos(0.61 * i), math.sin(0.61 * i), 0.05 * (i % 5)]
        for i in range(24)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = [
        (r["rn"], r["vec_id"], r["marginal_micro"], r["coverage_micro"])
        for r in facility_location_seeds(df, k=3, pool=8).orderBy("rn").collect()
    ]
    assert got == _replica(vecs, k=3, pool=8)


def test_marginals_non_increasing(spark):
    # submodularity: each greedy round's marginal gain is <= the last
    vecs = {i: [math.cos(0.17 * i * i + 1), math.sin(0.17 * i * i + 1)] for i in range(30)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    rows = facility_location_seeds(df, k=4, pool=10).orderBy("rn").collect()
    gains = [r["marginal_micro"] for r in rows]
    assert gains == sorted(gains, reverse=True)
    assert rows[-1]["coverage_micro"] == sum(gains)
