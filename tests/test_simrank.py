"""SimRank (plans/simrank.py) vs a brute-force Python twin of the
quantized recurrence — pins the SEMANTICS (capped graph, micro-unit
rounding, closure completeness); the DuckDB oracle pins engine
equality separately."""

import collections
from decimal import ROUND_HALF_UP, Decimal

from conftest import edges_df
from oracles import random_graph

from metis_spark.plans.simrank import simrank_pairs

C, SCALE, CAP = 0.8, 1_000_000, 8


def _qround(x: float) -> int:
    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def py_simrank_q2(edges, pairs, cap=CAP, c=C, scale=SCALE):
    nbrs = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    # capped view: both endpoints ≤ cap
    cn_nbrs = {
        v: {u for u in ns if deg[u] <= cap}
        for v, ns in nbrs.items()
        if deg[v] <= cap
    }

    def n(v):
        return cn_nbrs.get(v, set())

    def q1(u, v):
        common = len(n(u) & n(v))
        if not common:
            return 0
        return _qround(c * (float(scale) * common) / (len(n(u)) * len(n(v))))

    out = {}
    for a, b in pairs:
        if not n(a) or not n(b):
            out[(a, b)] = 0
            continue
        s = sum(
            scale if u == v else q1(min(u, v), max(u, v))
            for u in n(a)
            for v in n(b)
        )
        out[(a, b)] = _qround(c * float(s) / (len(n(a)) * len(n(b))))
    return out


def test_simrank_matches_python_twin(spark):
    edges = random_graph(n=60, p=0.06, seed=17, zipf_extra=40)
    verts = sorted({v for e in edges for v in e})
    pairs = [(a, b) for a in verts[:12] for b in verts[:12] if a < b]
    pairs_df = spark.createDataFrame(pairs, "a long, b long")
    got_df, info = simrank_pairs(
        edges_df(spark, edges), pairs_df, c=C, iters=2, deg_cap=CAP, scale=SCALE
    )
    got = {(r["a"], r["b"]): r["q"] for r in got_df.collect()}
    want = py_simrank_q2(edges, pairs)
    assert got == want
    assert info["iterations"] == 2
    # a ≠ b scores are bounded by C (s ≤ 1 scaled by the decay)
    assert all(0 <= q <= int(C * SCALE) for q in got.values())
    # the fixture must actually exercise non-trivial mass
    assert any(q > 0 for q in got.values())
