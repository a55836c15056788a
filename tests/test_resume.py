"""Kill-and-resume: interrupted algorithm resumes from checkpoint and
reproduces the uninterrupted converged state exactly (SURVEY.md §5)."""

import pytest

from conftest import edges_df
from metis_spark.plans.checkpoint import CheckpointManager
from metis_spark.plans.pagerank import pagerank
from metis_spark.plans.components import connected_components
from oracles import random_graph


def test_pagerank_resume_identical(spark, tmp_path):
    edges = edges_df(spark, random_graph(n=50, p=0.06, seed=5))
    full_dir, part_dir = str(tmp_path / "full"), str(tmp_path / "part")
    full, info_full = pagerank(edges, checkpoint_dir=full_dir, tol=1e-10)
    # simulate a kill after 3 iterations
    pagerank(edges, checkpoint_dir=part_dir, tol=1e-10, max_iter=3)
    cm = CheckpointManager(part_dir, "pagerank")
    assert cm.latest() == 3
    resumed, info_res = pagerank(edges, checkpoint_dir=part_dir, tol=1e-10)
    assert info_res["converged"]
    assert info_full["iterations"] == info_res["iterations"]
    a = {r["id"]: r["rank"] for r in full.collect()}
    b = {r["id"]: r["rank"] for r in resumed.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)


def test_checkpoint_lineage_verifies(spark, tmp_path):
    edges = edges_df(spark, random_graph(n=30, p=0.1, seed=9))
    d = str(tmp_path)
    _, info = pagerank(edges, checkpoint_dir=d, max_iter=4)
    cm = CheckpointManager(d, "pagerank")
    k = cm.latest()
    assert k is not None
    assert cm.verify(spark, k)
    metrics = cm.metrics(spark)
    assert metrics is not None and metrics.count() >= 4


def test_cc_resume(spark, tmp_path):
    edges = edges_df(spark, random_graph(n=60, p=0.03, seed=13, zipf_extra=10))
    full, _ = connected_components(edges, checkpoint_dir=str(tmp_path / "f"))
    connected_components(edges, checkpoint_dir=str(tmp_path / "p"), max_iter=1)
    resumed, info = connected_components(edges, checkpoint_dir=str(tmp_path / "p"))
    assert info["converged"]
    a = {r["id"]: r["component"] for r in full.collect()}
    b = {r["id"]: r["component"] for r in resumed.collect()}
    assert a == b
