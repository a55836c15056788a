"""Full truss decomposition (plans/trussness.py) vs brute-force peeling."""

import itertools

import pytest

from metis_spark.plans.trussness import trussness


@pytest.fixture(scope="module")
def spark():
    from metis_spark.session import get_spark

    return get_spark("test_trussness", master="local[4]", shuffle_partitions=4)


def edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def brute_truss(pairs):
    """Per-edge truss numbers by literal peeling: for k = 3, 4, ... peel
    edges with support < k-2 to exhaustion; an edge removed while
    peeling toward the k-truss has truss k-1. Edges surviving every
    level get the last k that kept them."""
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    truss = {e: 2 for e in edges}
    cur = set(edges)
    k = 3
    while cur:
        while True:
            adj = {}
            for a, b in cur:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            drop = {
                (a, b) for a, b in cur
                if len(adj[a] & adj[b]) < k - 2
            }
            if not drop:
                break
            cur -= drop
        for e in cur:
            truss[e] = k
        k += 1
        if k > len(edges) + 3:
            break
    return truss


def run(spark, pairs, **kw):
    out, info = trussness(edges_df(spark, pairs), **kw)
    assert info["converged"], info
    got = {(r["src"], r["dst"]): r["truss"] for r in out.collect()}
    return got, info


def test_trussness_k4_with_pendant(spark):
    """K4 edges are all truss 4; a pendant edge is truss 2."""
    k4 = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    pairs = k4 + [(3, 9)]
    got, info = run(spark, pairs)
    assert got == brute_truss(pairs)
    assert got[(3, 9)] == 2
    assert all(got[e] == 4 for e in map(tuple, k4))


def test_trussness_two_triangles_shared_edge(spark):
    """Two triangles glued on an edge: no 4-truss exists, so every
    edge (including the shared one, support 2) has truss 3."""
    pairs = [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)]
    got, _ = run(spark, pairs)
    assert got == brute_truss(pairs)
    assert set(got.values()) == {3}


def test_trussness_mixed_graph_matches_bruteforce(spark):
    """K5 ∪ K4 sharing a vertex, plus a path — exercises distinct truss
    levels 2, 4, 5 in one graph; directed dupes + self-loop ignored."""
    k5 = [(a, b) for a, b in itertools.combinations(range(5), 2)]
    k4 = [(a, b) for a, b in itertools.combinations([4, 10, 11, 12], 2)]
    path = [(12, 20), (20, 21)]
    pairs = k5 + k4 + path + [(1, 0), (7, 7)]  # reverse dup + self-loop
    got, info = run(spark, pairs)
    assert got == brute_truss(pairs)
    assert sorted(set(got.values())) == [2, 4, 5]
    assert info["triangles"] == 10 + 4  # C(5,3) + C(4,3)


def test_trussness_decremental_warm_start(spark, tmp_path):
    """After edge DELETIONS old truss numbers are upper bounds, so a
    warm-started edge-h-index run converges to the same fixpoint as
    cold — in no more rounds."""
    from oracles import random_graph

    pairs = random_graph(n=60, p=0.12, seed=31, zipf_extra=30)
    kept = [e for i, e in enumerate(pairs) if i % 5 != 0]

    base, i0 = trussness(edges_df(spark, pairs), checkpoint_dir=str(tmp_path / "a"))
    assert i0["converged"]
    cold, ic = trussness(edges_df(spark, kept), checkpoint_dir=str(tmp_path / "b"))
    warm, iw = trussness(
        edges_df(spark, kept), init_truss=base, checkpoint_dir=str(tmp_path / "c")
    )
    assert iw["converged"]
    c = {(r["src"], r["dst"]): r["truss"] for r in cold.collect()}
    w = {(r["src"], r["dst"]): r["truss"] for r in warm.collect()}
    assert c == w == brute_truss(kept)
    assert iw["iterations"] <= ic["iterations"]


def test_trussness_resume_identical(spark, tmp_path):
    """A resumed run from a mid-peel checkpoint returns the same table."""
    k4 = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    pairs = k4 + [(0, 8), (1, 8), (3, 9)]
    d = str(tmp_path / "ck")
    full, _ = run(spark, pairs, checkpoint_dir=d)
    again, info = run(spark, pairs, checkpoint_dir=d)
    assert info.get("resumed")
    assert again == full
