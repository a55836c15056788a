"""RR-set mode pins for ic_live_edge_spread(per_bit_roots=...): each
bit starts at its OWN root, and with p=100 on reversed edges the RR
set of a root is exactly its ancestor set."""

from metis_spark.plans.sssp import ic_live_edge_spread


def test_rr_mode_per_bit_roots(spark, tmp_path):
    # chain 1→2→3; reversed: 3→2→1 handled by passing reversed edges
    rev = spark.createDataFrame([(2, 1), (3, 2)], "src long, dst long")
    masks, info = ic_live_edge_spread(
        rev, seeds=[], p_pct=100, per_bit_roots=[3, 1],
        checkpoint_dir=str(tmp_path / "rr"), max_iter=10,
    )
    assert info["converged"]
    got = {int(r["id"]): int(r["mask"]) for r in masks.collect()}
    # bit 0 root=3: ancestors {3,2,1}; bit 1 root=1: ancestors {1}
    assert got == {3: 1, 2: 1, 1: 3}


def test_rr_mode_duplicate_roots_or_bits(spark, tmp_path):
    # two trials rooted at the SAME vertex → init mask has both bits
    rev = spark.createDataFrame([(2, 1)], "src long, dst long")
    masks, info = ic_live_edge_spread(
        rev, seeds=[], p_pct=100, per_bit_roots=[2, 2],
        checkpoint_dir=str(tmp_path / "rr2"), max_iter=10,
    )
    assert info["converged"]
    got = {int(r["id"]): int(r["mask"]) for r in masks.collect()}
    assert got == {2: 3, 1: 3}
