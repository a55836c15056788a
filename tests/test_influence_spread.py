"""IC live-edge spread pins: p=100 degenerates to full reachability
(every trial identical), p=0 reaches only the seeds, and the trial
mask semantics match a per-trial single-cascade rerun."""

from metis_spark.plans.sssp import ic_live_edge_spread, reachability_masks


def test_ic_p100_equals_reachability(spark, tmp_path):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    masks, info = ic_live_edge_spread(
        edges, seeds=[1], n_trials=8, p_pct=100,
        checkpoint_dir=str(tmp_path / "a"), max_iter=10,
    )
    assert info["converged"]
    got = {int(r["id"]): int(r["mask"]) for r in masks.collect()}
    # p=100: every edge live in every trial → all 8 bits set on exactly
    # the vertices reachable from 1
    assert got == {v: 255 for v in (1, 2, 3, 4)}


def test_ic_p0_reaches_only_seeds(spark, tmp_path):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    masks, info = ic_live_edge_spread(
        edges, seeds=[1], n_trials=8, p_pct=0,
        checkpoint_dir=str(tmp_path / "b"), max_iter=10,
    )
    assert info["converged"]
    got = {int(r["id"]): int(r["mask"]) for r in masks.collect()}
    assert got == {1: 255}


def test_ic_trial_matches_single_cascade(spark, tmp_path):
    # trial t of the bit-parallel run == a fresh run whose only live
    # edges are trial t's live set (replayed via the same hash rule)
    from metis_spark.operators.sampling import hash_bucket
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(a, b) for a in range(6) for b in range(6) if a != b],
        "src long, dst long",
    )
    masks, info = ic_live_edge_spread(
        edges, seeds=[0], n_trials=4, p_pct=30,
        checkpoint_dir=str(tmp_path / "c"), max_iter=10,
    )
    assert info["converged"]
    got = {int(r["id"]): int(r["mask"]) for r in masks.collect()}
    t = 2
    key = F.concat_ws("_", F.lit(str(t)), F.col("src"), F.col("dst"))
    live = edges.where(F.pmod(hash_bucket(key, "ic"), F.lit(100)) < 30)
    single, sinfo = reachability_masks(
        live, roots=[0], checkpoint_dir=str(tmp_path / "d"), max_iter=10
    )
    assert sinfo["converged"]
    want = {int(r["id"]) for r in single.collect()}
    have = {v for v, m in got.items() if (m >> t) & 1}
    assert have == want
