"""Bow-tie decomposition (plans/bowtie.py) on a hand-built graph that
exercises every region, plus a brute-force twin on a random digraph."""

import pytest
from oracles import random_graph

from metis_spark.plans.bowtie import bowtie_decomposition


@pytest.fixture(scope="module")
def spark():
    from metis_spark.session import get_spark

    return get_spark("test_bowtie", master="local[4]", shuffle_partitions=4)


def edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def brute(pairs):
    edges = {(s, d) for s, d in pairs if s != d}
    verts = {v for e in edges for v in e}
    adj, radj, uadj = {}, {}, {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        radj.setdefault(d, set()).add(s)
        uadj.setdefault(s, set()).add(d)
        uadj.setdefault(d, set()).add(s)

    def reach(seeds, nbrs):
        seen = set(seeds)
        stack = list(seeds)
        while stack:
            u = stack.pop()
            for v in nbrs.get(u, ()):
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        return seen

    # SCCs by brute double-reach
    scc = {}
    for v in verts:
        scc[v] = min(
            u for u in (reach({v}, adj) & reach({v}, radj)) | {v}
        )
    sizes = {}
    for v, l in scc.items():
        sizes[l] = sizes.get(l, 0) + 1
    core_l = min(
        (l for l in sizes), key=lambda l: (-sizes[l], l)
    )
    cv = {v for v, l in scc.items() if l == core_l}
    fwd = reach(cv, adj)
    bwd = reach(cv, radj)
    outs = fwd - cv
    ins = bwd - cv
    adj2 = {u: {v for v in vs if v not in cv} for u, vs in adj.items() if u not in cv}
    radj2 = {u: {v for v in vs if v not in cv} for u, vs in radj.items() if u not in cv}
    tf = reach(ins, adj2)
    tb = reach(outs, radj2)
    weak = reach(cv, uadj)
    out = {}
    for v in verts:
        r = (
            "CORE" if v in cv else
            "IN" if v in ins else
            "OUT" if v in outs else
            "TUBE" if v in tf and v in tb else
            "TENDRIL" if v in tf or v in tb else
            "OTHER" if v in weak else
            "DISCONNECTED"
        )
        out[r] = out.get(r, 0) + 1
    return out


def run(spark, pairs, **kw):
    out, info = bowtie_decomposition(edges_df(spark, pairs), **kw)
    return {r["region"]: r["n_vertices"] for r in out.collect()}, info


def test_bowtie_all_regions(spark):
    """Crafted graph hitting every region: 3-cycle CORE {0,1,2};
    IN 10→0; OUT 2→20; TUBE 30 on the core-free IN→OUT path 10→30→20;
    TENDRIL 40 (10→40 dead end, in forward-of-IN only); OTHER 50
    (50→40 — weakly attached, but not in any directed reach set);
    DISCONNECTED pair 60→61."""
    pairs = [
        (0, 1), (1, 2), (2, 0),      # CORE
        (10, 0),                     # IN
        (2, 20),                     # OUT
        (10, 30), (30, 20),          # TUBE via 30
        (10, 40),                    # TENDRIL 40
        (50, 40),                    # OTHER 50 (weakly attached only)
        (60, 61),                    # DISCONNECTED
    ]
    got, info = run(spark, pairs)
    want = brute(pairs)
    assert got == want
    assert got == {
        "CORE": 3, "IN": 1, "OUT": 1, "TUBE": 1,
        "TENDRIL": 1, "OTHER": 1, "DISCONNECTED": 2,
    }
    assert info["core_scc"] == 0


def test_bowtie_matches_bruteforce_random(spark):
    pairs = random_graph(n=60, p=0.05, seed=23, zipf_extra=40)
    got, _ = run(spark, pairs)
    assert got == brute(pairs)
