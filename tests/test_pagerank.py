"""PageRank golden graphs G1/G2/G6 + seeded random oracle (FIXTURES.md §3)."""

import numpy as np
import pytest

from conftest import edges_df, vertices_df
from metis_spark.plans.pagerank import pagerank
from oracles import pagerank_oracle, random_graph


def _ranks_dict(ranks):
    return {r["id"]: r["rank"] for r in ranks.collect()}


def test_g1_cycle_uniform(spark, tmp_path):
    edges = edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    ranks, info = pagerank(edges, checkpoint_dir=str(tmp_path))
    got = _ranks_dict(ranks)
    assert info["converged"]
    for v in range(4):
        assert got[v] == pytest.approx(0.25, abs=1e-6)


def test_g2_dangling_star(spark, tmp_path):
    edges = edges_df(spark, [(2, 1), (3, 1), (4, 1)])
    ranks, info = pagerank(edges, checkpoint_dir=str(tmp_path))
    got = _ranks_dict(ranks)
    assert info["converged"]
    assert got[1] == pytest.approx(71 / 131, abs=1e-6)
    for v in (2, 3, 4):
        assert got[v] == pytest.approx(20 / 131, abs=1e-6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_g6_dangling_and_isolated(spark, tmp_path):
    edges = edges_df(spark, [(0, 1)])
    vertices = vertices_df(spark, [0, 1, 2])
    ranks, info = pagerank(edges, vertices=vertices, checkpoint_dir=str(tmp_path))
    got = _ranks_dict(ranks)
    assert info["converged"]
    oracle = pagerank_oracle(3, [(0, 1)])
    for v in range(3):
        assert got[v] == pytest.approx(oracle[v], abs=1e-6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_grand_vs_numpy_oracle(spark, tmp_path):
    edges = random_graph(n=100, p=0.05, seed=42)
    n = 100
    df = edges_df(spark, edges)
    vertices = vertices_df(spark, range(n))
    ranks, info = pagerank(df, vertices=vertices, checkpoint_dir=str(tmp_path))
    got = _ranks_dict(ranks)
    oracle = pagerank_oracle(n, edges)
    assert info["converged"]
    assert np.abs(np.array([got[i] for i in range(n)]) - oracle).max() < 1e-6


def test_salted_equals_unsalted(spark, tmp_path):
    edges = random_graph(n=60, p=0.08, seed=7)
    df = edges_df(spark, edges)
    r1, _ = pagerank(df, checkpoint_dir=str(tmp_path / "a"), max_iter=20, tol=1e-12)
    r2, _ = pagerank(df, checkpoint_dir=str(tmp_path / "b"), max_iter=20, tol=1e-12, salt=4)
    d1, d2 = _ranks_dict(r1), _ranks_dict(r2)
    assert set(d1) == set(d2)
    for k in d1:
        assert d1[k] == pytest.approx(d2[k], abs=1e-9)


def test_personalized_pagerank_vs_oracle(spark, tmp_path):
    from oracles import ppr_oracle, random_graph

    edges = random_graph(n=50, p=0.06, seed=19, zipf_extra=30)
    seeds = [0, 7, 21]
    want = ppr_oracle(50, edges, seeds, iters=5)
    ranks, info = pagerank(
        edges_df(spark, edges), vertices=vertices_df(spark, range(50)),
        checkpoint_dir=str(tmp_path), tol=0.0, max_iter=5, seeds=seeds,
    )
    got = {r["id"]: r["rank"] for r in ranks.collect()}
    assert len(got) == 50
    for v in range(50):
        assert got[v] == pytest.approx(want[v], abs=1e-12), v
    # mass conservation: teleport + dangling redistribution keep sum == 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_personalized_seeds_df_equals_list(spark, tmp_path):
    """The distributed seeds-DataFrame path must match driver-list seeds."""
    from oracles import random_graph

    edges = random_graph(n=60, p=0.05, seed=31, zipf_extra=25)
    seeds = [0, 5, 10, 15]
    by_list, _ = pagerank(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "l"),
        tol=0.0, max_iter=4, seeds=seeds,
    )
    seeds_df = spark.createDataFrame([(s,) for s in seeds], "id long")
    by_df, _ = pagerank(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "d"),
        tol=0.0, max_iter=4, seeds=seeds_df,
    )
    a = {r["id"]: r["rank"] for r in by_list.collect()}
    b = {r["id"]: r["rank"] for r in by_df.collect()}
    assert a == b


def test_personalized_resume_identical(spark, tmp_path):
    from oracles import random_graph

    edges = random_graph(n=40, p=0.08, seed=29, zipf_extra=20)
    seeds = [1, 2, 3]
    full, _ = pagerank(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "a"),
        tol=0.0, max_iter=6, seeds=seeds,
    )
    pagerank(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "b"),
        tol=0.0, max_iter=3, seeds=seeds,
    )
    resumed, info = pagerank(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "b"),
        tol=0.0, max_iter=6, seeds=seeds,
    )
    a = {r["id"]: r["rank"] for r in full.collect()}
    b = {r["id"]: r["rank"] for r in resumed.collect()}
    assert a == b


def test_weighted_pagerank_vs_oracle(spark, tmp_path):
    from oracles import random_graph, weighted_pagerank_oracle

    edges = random_graph(n=50, p=0.06, seed=37, zipf_extra=30)
    weights = {(s, t): float((s * 7 + t * 13) % 10 + 1) for s, t in edges}
    want = weighted_pagerank_oracle(50, edges, weights, iters=5)
    wdf = spark.createDataFrame(
        [(s, t, weights[(s, t)]) for s, t in edges], "src long, dst long, w double"
    )
    ranks, _ = pagerank(
        wdf, vertices=vertices_df(spark, range(50)),
        checkpoint_dir=str(tmp_path), tol=0.0, max_iter=5, weight_col="w",
    )
    got = {r["id"]: r["rank"] for r in ranks.collect()}
    assert len(got) == 50
    for v in range(50):
        assert got[v] == pytest.approx(want[v], abs=1e-12), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_warm_start_same_fixpoint_fewer_iterations(spark, tmp_path):
    """init_ranks warm start: identical fixpoint, and restarting from the
    converged vector re-converges (almost) immediately — the re-rank step
    after an incremental edge drain."""
    edges = random_graph(n=80, p=0.05, seed=71, zipf_extra=60)
    cold, info_cold = pagerank(
        edges_df(spark, edges), tol=1e-9, max_iter=200,
        checkpoint_dir=str(tmp_path / "cold"),
    )
    assert info_cold["converged"]
    warm, info_warm = pagerank(
        edges_df(spark, edges), tol=1e-9, max_iter=200,
        checkpoint_dir=str(tmp_path / "warm"), init_ranks=cold,
    )
    assert info_warm["converged"]
    assert info_warm["iterations"] <= 2
    a = {r["id"]: r["rank"] for r in cold.collect()}
    b = {r["id"]: r["rank"] for r in warm.collect()}
    assert set(a) == set(b)
    for v in a:
        assert abs(a[v] - b[v]) < 1e-9, v


def test_warm_start_after_edge_growth(spark, tmp_path):
    """Warm start on a GROWN graph (the incremental-maintenance shape):
    new vertices default to 1/n, vector renormalizes, and the result
    matches a cold run on the grown graph to 1e-9."""
    old = random_graph(n=60, p=0.06, seed=73, zipf_extra=40)
    grown = old + [(90 + i, (7 * i) % 60) for i in range(8)] + [(3, 91), (5, 95)]
    old_ranks, _ = pagerank(
        edges_df(spark, old), tol=1e-9, max_iter=200,
        checkpoint_dir=str(tmp_path / "old"),
    )
    cold, info_cold = pagerank(
        edges_df(spark, grown), tol=1e-9, max_iter=200,
        checkpoint_dir=str(tmp_path / "cold"),
    )
    warm, info_warm = pagerank(
        edges_df(spark, grown), tol=1e-9, max_iter=200,
        checkpoint_dir=str(tmp_path / "warm"), init_ranks=old_ranks,
    )
    assert info_cold["converged"] and info_warm["converged"]
    a = {r["id"]: r["rank"] for r in cold.collect()}
    b = {r["id"]: r["rank"] for r in warm.collect()}
    assert set(a) == set(b)
    for v in a:
        assert abs(a[v] - b[v]) < 1e-8, v
