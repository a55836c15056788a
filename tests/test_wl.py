"""Hash-WL color refinement (plans/wl.py): exact python replay of the
md5 arithmetic, plus the two semantic guarantees fingerprinting relies
on — isomorphism invariance and refinement monotonicity."""

import hashlib

import pytest
from oracles import random_graph

from metis_spark.plans.wl import wl_colors

MOD = 1 << 60


@pytest.fixture(scope="module")
def spark():
    from metis_spark.session import get_spark

    return get_spark("test_wl", master="local[4]", shuffle_partitions=4)


def edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_wl(pairs, rounds=3):
    nbrs = {}
    for a, b in pairs:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    c = {v: h60(f"wl0_{len(ns)}") for v, ns in nbrs.items()}
    for _ in range(rounds):
        c = {
            v: h60(f"wl_{c[v]}_{sum(h60(f'wlh_{c[u]}') for u in ns) % MOD}")
            for v, ns in nbrs.items()
        }
    return c


def test_colors_match_python_replay(spark):
    pairs = random_graph(n=90, p=0.07, seed=4, zipf_extra=60)
    colors, info = wl_colors(edges_df(spark, pairs), rounds=3)
    got = {r["id"]: r["color"] for r in colors.collect()}
    assert got == py_wl(pairs)
    assert len(info["n_colors_per_round"]) == 4


def test_path_roles(spark):
    """P4 (a-b-c-d): endpoints get one color, interior vertices another;
    the two interior vertices of a path of even length share a class."""
    colors, info = wl_colors(edges_df(spark, [(1, 2), (2, 3), (3, 4)]), rounds=2)
    got = {r["id"]: r["color"] for r in colors.collect()}
    assert got[1] == got[4] and got[2] == got[3]
    assert got[1] != got[2]
    assert info["n_colors_per_round"][-1] == 2


def test_isomorphic_graphs_same_fingerprint(spark):
    """A relabeled copy of a graph must produce the identical sorted
    color MULTISET (the canonical fingerprint — vertex ids erased), and
    a structurally different graph of the same size must not. The
    class-size histogram alone is too coarse here: two fully-refined
    graphs both read {1: n}."""
    pairs = random_graph(n=40, p=0.12, seed=6, zipf_extra=20)
    perm = {v: (v * 7919 + 13) % 100003 for p in pairs for v in p}
    relabeled = [(perm[a], perm[b]) for a, b in pairs]

    def fingerprint(ps):
        colors, _ = wl_colors(edges_df(spark, ps), rounds=3)
        return sorted(r["color"] for r in colors.collect())

    assert fingerprint(pairs) == fingerprint(relabeled)
    other = random_graph(n=40, p=0.12, seed=8, zipf_extra=20)
    assert fingerprint(pairs) != fingerprint(other)
