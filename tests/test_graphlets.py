"""graphlet4_census (plans/metrics.py) vs an itertools brute force over
every 4-vertex subset — pins all six closed-form identities (non-induced
subgraph counts) on graphs small enough to enumerate exhaustively."""

import itertools
import random

from conftest import edges_df

from metis_spark.plans.metrics import graphlet4_census

# non-induced counts of each connected 4-vertex pattern inside the
# induced edge set of a 4-subset, keyed by the subset's edge count and
# degree multiset (every 4-vertex graph is determined by that pair)


def _brute(edges):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    verts = sorted(adj)
    out = {
        "c4_cycle": 0,
        "diamond": 0,
        "k4_clique": 0,
        "p4_path": 0,
        "s3_star": 0,
        "tailed_triangle": 0,
    }
    for quad in itertools.combinations(verts, 4):
        qs = set(quad)
        sub = [
            (a, b)
            for a, b in itertools.combinations(quad, 2)
            if b in adj.get(a, ())
        ]
        es = set(map(frozenset, sub))
        deg = {v: sum(1 for e in es if v in e) for v in quad}
        # enumerate each pattern as explicit edge subsets
        for trio in itertools.combinations(quad, 3):
            tri = set(
                map(
                    frozenset,
                    itertools.combinations(trio, 2),
                )
            )
            if tri <= es:
                (tail,) = qs - set(trio)
                for v in trio:
                    if frozenset((v, tail)) in es:
                        out["tailed_triangle"] += 1
        for center in quad:
            leaves = qs - {center}
            if all(frozenset((center, x)) in es for x in leaves):
                out["s3_star"] += 1
        for perm in itertools.permutations(quad):
            a, b, c, d = perm
            if a > d:
                continue  # each path once (canonical direction)
            if (
                frozenset((a, b)) in es
                and frozenset((b, c)) in es
                and frozenset((c, d)) in es
            ):
                out["p4_path"] += 1
            if a == min(perm) and b < d:  # each cycle once
                if (
                    frozenset((a, b)) in es
                    and frozenset((b, c)) in es
                    and frozenset((c, d)) in es
                    and frozenset((d, a)) in es
                ):
                    out["c4_cycle"] += 1
        if len(es) == 6:
            out["k4_clique"] += 1
        # diamonds: choose the missing pair; the other 5 edges present
        for x, y in itertools.combinations(quad, 2):
            rest = set(map(frozenset, itertools.combinations(quad, 2)))
            rest.discard(frozenset((x, y)))
            if rest <= es:
                out["diamond"] += 1
    return out


def _census(spark, edges):
    rows = graphlet4_census(edges_df(spark, edges), hub_cap=10_000).collect()
    return {r["graphlet"]: int(r["cnt"]) for r in rows}


def test_graphlet4_census_small_known(spark):
    # K4 plus one pendant: known counts by hand
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    got = _census(spark, edges)
    assert got == _brute(edges)
    assert got["k4_clique"] == 1 and got["diamond"] == 6


def test_graphlet4_census_matches_bruteforce_random(spark):
    rng = random.Random(5)
    edges = list(
        {
            (a, b)
            for a, b in (
                sorted(rng.sample(range(16), 2)) for _ in range(60)
            )
        }
    )
    edges = [(a, b) for a, b in edges]
    assert _census(spark, edges) == _brute(edges)
