"""PPR sweep cut (plans/sweep.py): exact python replay of the quantized
pipeline plus the semantic guarantee — the sweep finds a planted dense
cluster behind a single bridge edge."""

import pytest
from conftest import edges_df
from oracles import random_graph

from metis_spark.plans.sweep import ppr_sweep_cut


@pytest.fixture(scope="module")
def spark():
    from metis_spark.session import get_spark

    return get_spark("test_sweep", master="local[4]", shuffle_partitions=4)


def py_sweep(pairs, seed_ids, n_iters=5, sweep_l=64, d=0.85):
    nbrs = {}
    for a, b in pairs:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    verts = sorted(nbrs)
    seeds = [v for v in verts if v in seed_ids]
    p = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in verts}
    rank = dict(p)
    deg = {v: len(nbrs[v]) for v in verts}
    for _ in range(n_iters):
        contrib = {v: 0.0 for v in verts}
        for v in verts:
            for u in nbrs[v]:
                contrib[u] += rank[v] / deg[v]
        rank = {v: p[v] * (1 - d) + d * contrib[v] for v in verts}
    score = {v: round(round(rank[v], 6) / deg[v], 9) for v in verts}
    order = sorted(verts, key=lambda v: (-score[v], v))[:sweep_l]
    m2 = sum(deg.values())
    rows, inset, vol, cut = [], set(), 0, 0
    for k, v in enumerate(order, 1):
        vol += deg[v]
        cut += deg[v] - 2 * sum(1 for u in nbrs[v] if u in inset)
        inset.add(v)
        lo = min(vol, m2 - vol)
        phi = round(cut / lo, 6) if lo > 0 else None
        rows.append((k, v, deg[v], vol, cut, phi))
    return rows


def test_sweep_matches_python_replay(spark):
    pairs = random_graph(n=70, p=0.06, seed=91, zipf_extra=40)
    verts = {v for e in pairs for v in e}
    seed_ids = {v for v in verts if v % 7 == 0}
    out, info = ppr_sweep_cut(
        edges_df(spark, pairs),
        spark.createDataFrame([(int(s),) for s in sorted(seed_ids)], "id long"),
        n_iters=5,
        sweep_l=20,
    )
    got = [
        (r["k"], r["id"], r["deg"], r["vol"], r["cut"], r["phi"])
        for r in out.orderBy("k").collect()
    ]
    want = py_sweep(pairs, seed_ids, sweep_l=20)
    assert got == want
    assert info["best_k"] == min(
        (r for r in want if r[5] is not None), key=lambda r: (r[5], r[0])
    )[0]


def test_sweep_finds_planted_cluster(spark):
    # K8 on 0..7 + K8 on 100..107, single bridge 7-100; seed inside the
    # first clique -> the minimum-conductance prefix is exactly clique 1
    k8a = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    k8b = [(a, b) for a in range(100, 108) for b in range(a + 1, 108)]
    pairs = k8a + k8b + [(7, 100)]
    out, info = ppr_sweep_cut(
        edges_df(spark, pairs),
        spark.createDataFrame([(0,)], "id long"),
        n_iters=5,
        sweep_l=16,
    )
    assert info["best_k"] == 8
    members = {r["id"] for r in out.orderBy("k").limit(8).collect()}
    assert members == set(range(8))
    best = out.where(out["k"] == 8).collect()[0]
    assert best["cut"] == 1 and best["vol"] == 57  # 2*28 within + bridge


def test_fiedler_sweep_finds_planted_cluster(spark):
    """Spectral sweep on the two-cliques-and-a-bridge graph: minimum
    conductance lands exactly on one clique (cut 1, vol 57)."""
    from itertools import combinations

    from metis_spark.plans.sweep import fiedler_sweep_cut

    k8a = list(combinations(range(8), 2))
    k8b = list(combinations(range(100, 108), 2))
    pairs = k8a + k8b + [(7, 100)]
    out, info = fiedler_sweep_cut(edges_df(spark, pairs), n_iters=20, sweep_l=16)
    assert info["best_k"] == 8
    members = {r["id"] for r in out.orderBy("k").limit(8).collect()}
    assert members in (set(range(8)), set(range(100, 108)))
    best = out.where(out["k"] == 8).collect()[0]
    assert best["cut"] == 1 and best["vol"] == 57


def test_hk_sweep_finds_planted_cluster(spark):
    """Heat-kernel sweep on the two-cliques-and-a-bridge graph: the
    1/k!-damped diffusion from vertex 0 (the only id % 1000 == 0 seed)
    concentrates on clique 1 and the minimum-conductance prefix is
    exactly that clique (cut 1, vol 57) — the hk-relax claim."""
    from metis_spark.plans.sweep import hk_sweep_cut

    k8a = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    k8b = [(a, b) for a in range(100, 108) for b in range(a + 1, 108)]
    pairs = k8a + k8b + [(7, 100)]
    out, info = hk_sweep_cut(
        edges_df(spark, pairs), seed_mod=1000, n_terms=6, sweep_l=16
    )
    assert info["best_k"] == 8
    members = {r["id"] for r in out.orderBy("k").limit(8).collect()}
    assert members == set(range(8))
    best = out.where(out["k"] == 8).collect()[0]
    assert best["cut"] == 1 and best["vol"] == 57
