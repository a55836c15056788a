"""Bit-parallel multi-source reachability pins: hand-graph closure
(cycles included), root-reaches-itself, and mask-bit ↔ root mapping."""

from metis_spark.plans.sssp import reachability_masks


def test_reachability_hand_graph(spark, tmp_path):
    # 1→2→3→1 (cycle), 3→4, 10→11 (separate chain), 20 isolated target
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (10, 11)], "src long, dst long"
    )
    masks, info = reachability_masks(
        edges, roots=[1, 10], checkpoint_dir=str(tmp_path / "r"), max_iter=10
    )
    assert info["converged"]
    got = {int(r["id"]): int(r["mask"]) for r in masks.collect()}
    # bit 0 = root 1, bit 1 = root 10
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 2, 11: 2}


def test_reachability_overlapping_roots(spark, tmp_path):
    # both roots flow into the shared sink 5
    edges = spark.createDataFrame(
        [(1, 5), (2, 5), (5, 6)], "src long, dst long"
    )
    masks, info = reachability_masks(
        edges, roots=[1, 2], checkpoint_dir=str(tmp_path / "r2"), max_iter=10
    )
    assert info["converged"]
    got = {int(r["id"]): int(r["mask"]) for r in masks.collect()}
    assert got[5] == 3 and got[6] == 3  # union of both bits
    assert got[1] == 1 and got[2] == 2
