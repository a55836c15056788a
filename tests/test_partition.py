"""Balanced k-way partitioning (plans/partition.py): assignment
invariants, the hard balance cap, and the cut-beats-hash guarantee the
V-cycle exists to deliver."""

import pytest
from oracles import random_graph

from metis_spark.plans.partition import (
    edge_cut,
    hash_partition,
    kway_partition,
)


@pytest.fixture(scope="module")
def spark():
    from metis_spark.session import get_spark

    return get_spark("test_partition", master="local[4]", shuffle_partitions=4)


def edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _verts(pairs):
    return {v for p in pairs for v in p if p[0] != p[1]}


def _cut(pairs, parts):
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    return sum(1 for a, b in edges if parts[a] != parts[b])


def test_partition_invariants_and_balance(spark, tmp_path):
    pairs = random_graph(n=120, p=0.06, seed=7, zipf_extra=80)
    k = 4
    parts, info = kway_partition(
        edges_df(spark, pairs), k=k, checkpoint_dir=str(tmp_path / "p1")
    )
    got = {r["id"]: r["part"] for r in parts.collect()}
    assert set(got) == _verts(pairs)
    assert all(0 <= p < k for p in got.values())
    assert info["n"] == len(got)
    assert info["cap"] == (info["n"] * 11) // (10 * k)
    sizes = {}
    for p in got.values():
        sizes[p] = sizes.get(p, 0) + 1
    # hash-init is near-balanced and moves are capped, so every part
    # stays under the hard bound
    assert max(sizes.values()) <= info["cap"], sizes


def test_partition_cut_beats_hash(spark, tmp_path):
    pairs = random_graph(n=150, p=0.05, seed=11, zipf_extra=100)
    e = edges_df(spark, pairs)
    k = 4
    parts, info = kway_partition(e, k=k, checkpoint_dir=str(tmp_path / "p2"))
    cut_ref = edge_cut(e, parts).first()["cut"]
    cut_hash = edge_cut(e, hash_partition(e, k)).first()["cut"]
    assert cut_ref < cut_hash, (cut_ref, cut_hash)
    # edge_cut agrees with the python oracle on the same assignment
    got = {r["id"]: r["part"] for r in parts.collect()}
    assert cut_ref == _cut(pairs, got)


def test_refinement_moves_reduce_cut(spark, tmp_path):
    """The refined cut is <= the projected initial cut (refine_passes=0
    twin): parity staging + the strict-gain rule exist for exactly this."""
    pairs = random_graph(n=150, p=0.05, seed=13, zipf_extra=100)
    e = edges_df(spark, pairs)
    k = 4
    p0, _ = kway_partition(
        e, k=k, refine_passes=0, checkpoint_dir=str(tmp_path / "a")
    )
    p1, info = kway_partition(
        e, k=k, refine_passes=1, checkpoint_dir=str(tmp_path / "b")
    )
    cut0 = edge_cut(e, p0).first()["cut"]
    cut1 = edge_cut(e, p1).first()["cut"]
    assert cut1 <= cut0, (cut1, cut0)
    assert sum(info["moves"]) > 0  # refinement actually moved vertices
