"""Locally-dominant maximal matching (plans/matching.py) vs sequential
greedy under the same strict (p, s, d) edge order — they must be THE
same matching."""

import hashlib

import pytest
from oracles import random_graph

from metis_spark.plans.matching import maximal_matching


@pytest.fixture(scope="module")
def spark():
    from metis_spark.session import get_spark

    return get_spark("test_matching", master="local[4]", shuffle_partitions=4)


def edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def prio(s, d):
    return int(hashlib.md5(f"m_{s}_{d}".encode()).hexdigest()[:15], 16)


def greedy(pairs):
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    taken = set()
    out = set()
    for s, d in sorted(edges, key=lambda e: (prio(*e), e)):
        if s not in taken and d not in taken:
            out.add((s, d))
            taken.update((s, d))
    return out


def run(spark, pairs, **kw):
    out, info = maximal_matching(edges_df(spark, pairs), **kw)
    assert info["converged"], info
    return {(r["src"], r["dst"]) for r in out.collect()}, info


def test_matching_equals_sequential_greedy(spark):
    pairs = random_graph(n=80, p=0.08, seed=3, zipf_extra=40)
    got, info = run(spark, pairs)
    want = greedy(pairs)
    assert got == want
    assert info["matched_edges"] == len(want)


def test_matching_is_maximal_and_vertex_disjoint(spark):
    pairs = random_graph(n=60, p=0.1, seed=11, zipf_extra=30)
    got, _ = run(spark, pairs)
    used = [v for e in got for v in e]
    assert len(used) == len(set(used))  # vertex-disjoint
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    free = {v for s, d in edges for v in (s, d)} - set(used)
    assert not any(s in free and d in free for s, d in edges)  # maximal


def test_matching_star_and_path(spark):
    """A star matches exactly one spoke (the min-priority one); a
    3-path matches the lower-priority of its two edges."""
    star = [(0, i) for i in range(1, 6)]
    got, _ = run(spark, star)
    assert got == {min(((0, i) for i in range(1, 6)), key=lambda e: prio(*e))}
    path = [(10, 11), (11, 12)]
    got2, _ = run(spark, path)
    assert got2 == greedy(path) and len(got2) == 1


def test_matching_resume_identical(spark, tmp_path):
    pairs = random_graph(n=50, p=0.1, seed=29, zipf_extra=25)
    cold, _ = run(spark, pairs)
    d = str(tmp_path / "ck")
    maximal_matching(edges_df(spark, pairs), max_iter=1, checkpoint_dir=d)
    warm, info = run(spark, pairs, checkpoint_dir=d)
    assert warm == cold == greedy(pairs)

def test_matching_priority_col_heavy_edge(spark):
    """priority_col inversion gives HEAVY-edge matching: a star matches
    its max-weight spoke; the mutual-max pair wins on a path."""
    from pyspark.sql import functions as F

    BIG = 1 << 30
    rows = [(0, 1, 5), (0, 2, 9), (0, 3, 7), (10, 11, 2), (11, 12, 8)]
    df = spark.createDataFrame(rows, "src long, dst long, w long").withColumn(
        "p", F.lit(BIG) - F.col("w")
    )
    out, info = maximal_matching(df, priority_col="p")
    assert info["converged"]
    got = {(r["src"], r["dst"]) for r in out.collect()}
    assert got == {(0, 2), (11, 12)}
