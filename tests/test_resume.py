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


def test_checksum_is_partition_independent(spark, tmp_path):
    """Two properties of the lineage checksum:
    1. rerunning the identical config is bit-identical (determinism);
    2. the whole-state checksum of a FIXED state is invariant under any
       repartitioning (order-insensitive sum), so lineage can verify a
       state wherever it lands after a shuffle."""
    from pyspark.sql import functions as F

    from metis_spark.plans.checkpoint import _row_checksum

    edges = edges_df(spark, random_graph(n=40, p=0.08, seed=17))
    _, _ = pagerank(edges, checkpoint_dir=str(tmp_path / "a"), max_iter=2, num_partitions=4)
    _, _ = pagerank(edges, checkpoint_dir=str(tmp_path / "b"), max_iter=2, num_partitions=4)
    ca = CheckpointManager(str(tmp_path / "a"), "pagerank")
    cb = CheckpointManager(str(tmp_path / "b"), "pagerank")
    state_a, ma = ca.load(spark, 2)
    _, mb = cb.load(spark, 2)
    assert ma["rows"] == mb["rows"]
    assert ma["checksum"] == mb["checksum"]  # rerun determinism, bit-exact
    # fixed state, arbitrary repartition: whole-state checksum unchanged
    re = state_a.repartition(13)
    got = re.agg(_row_checksum(state_a.columns).alias("cs")).collect()[0]
    assert int(got["cs"]) == ma["checksum"]


def test_torn_commit_is_invisible_and_redone(spark, tmp_path):
    """A data dir without meta.json (kill mid-write) must be invisible to
    resume and cleanly redone — the write-then-commit rule (SURVEY §2.8)."""
    import os
    import shutil

    edges = edges_df(spark, random_graph(n=40, p=0.08, seed=21))
    d = str(tmp_path)
    _, _ = pagerank(edges, checkpoint_dir=d, max_iter=3)
    cm = CheckpointManager(d, "pagerank")
    assert cm.latest() == 3
    # tear iteration 3: keep data, remove the commit marker
    it3 = os.path.join(d, "pagerank", "iter=3")
    os.remove(os.path.join(it3, "meta.json"))
    assert cm.latest() == 2  # torn commit invisible
    # resume redoes iteration 3 and continues to convergence
    ranks, info = pagerank(edges, checkpoint_dir=d, tol=1e-10)
    assert info["converged"]
    assert cm.verify(spark, cm.latest())
    # a fully converged fresh run agrees exactly
    fresh, _ = pagerank(edges, checkpoint_dir=str(tmp_path / "fresh"), tol=1e-10)
    a = {r["id"]: r["rank"] for r in ranks.collect()}
    b = {r["id"]: r["rank"] for r in fresh.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)
    shutil.rmtree(d, ignore_errors=True)


def test_lpa_resume(spark, tmp_path):
    from metis_spark.plans.lpa import label_propagation

    edges = edges_df(spark, random_graph(n=50, p=0.05, seed=31))
    full, _ = label_propagation(edges, checkpoint_dir=str(tmp_path / "f"), max_iter=6,
                                stop_when_stable=False)
    label_propagation(edges, checkpoint_dir=str(tmp_path / "p"), max_iter=2,
                      stop_when_stable=False)
    resumed, info = label_propagation(edges, checkpoint_dir=str(tmp_path / "p"), max_iter=6,
                                      stop_when_stable=False)
    assert info["iterations"] == 6
    a = {r["id"]: r["label"] for r in full.collect()}
    b = {r["id"]: r["label"] for r in resumed.collect()}
    assert a == b


def test_cc_resume(spark, tmp_path):
    edges = edges_df(spark, random_graph(n=60, p=0.03, seed=13, zipf_extra=10))
    full, _ = connected_components(edges, checkpoint_dir=str(tmp_path / "f"))
    connected_components(edges, checkpoint_dir=str(tmp_path / "p"), max_iter=1)
    resumed, info = connected_components(edges, checkpoint_dir=str(tmp_path / "p"))
    assert info["converged"]
    a = {r["id"]: r["component"] for r in full.collect()}
    b = {r["id"]: r["component"] for r in resumed.collect()}
    assert a == b


def test_pagerank_checkpoint_every_equivalent_and_resumable(spark, tmp_path):
    """checkpoint_every=k must not change the math: identical converged
    ranks, commits only on the k-schedule (+ convergence), and resume from
    the last commit reproduces the k=1 fixpoint exactly."""
    import os

    import pytest as _pytest

    edges = edges_df(spark, random_graph(n=50, p=0.06, seed=5))
    d1, d3 = str(tmp_path / "e1"), str(tmp_path / "e3")
    r1, i1 = pagerank(edges, checkpoint_dir=d1, tol=1e-10)
    r3, i3 = pagerank(edges, checkpoint_dir=d3, tol=1e-10, checkpoint_every=3)
    assert i1["iterations"] == i3["iterations"] and i3["converged"]
    a = {r["id"]: r["rank"] for r in r1.collect()}
    b = {r["id"]: r["rank"] for r in r3.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k] == _pytest.approx(b[k], abs=1e-12)
    # only scheduled/convergence iterations are durable
    committed = sorted(
        int(n.split("=")[1])
        for n in os.listdir(os.path.join(d3, "pagerank"))
        if n.startswith("iter=")
    )
    assert committed == [k for k in committed if k % 3 == 0 or k == i3["iterations"]]
    assert len(committed) < i3["iterations"]
    # kill mid-schedule, resume, same fixpoint
    dk = str(tmp_path / "kill")
    pagerank(edges, checkpoint_dir=dk, tol=1e-10, max_iter=5, checkpoint_every=3)
    cm = CheckpointManager(dk, "pagerank")
    assert cm.latest() in (3, 5)  # 5 == max_iter forces a durable final state
    resumed, ir = pagerank(edges, checkpoint_dir=dk, tol=1e-10, checkpoint_every=3)
    assert ir["converged"]
    c = {r["id"]: r["rank"] for r in resumed.collect()}
    for k in a:
        assert a[k] == _pytest.approx(c[k], abs=1e-12)


def test_checkpoint_retention_window(spark, tmp_path):
    """retain=2 keeps only the newest two committed iterations, the run
    converges to the same ranks, and resume-from-latest still works."""
    import os

    from metis_spark.plans.pagerank import pagerank

    edges = spark.createDataFrame(
        [(i, (i + 1) % 12) for i in range(12)] + [(0, 6), (3, 9)],
        "src long, dst long",
    )
    d1 = str(tmp_path / "full")
    full, _ = pagerank(edges, tol=0.0, max_iter=6, checkpoint_dir=d1)
    d2 = str(tmp_path / "ret")
    ret, info = pagerank(edges, tol=0.0, max_iter=6, checkpoint_dir=d2, retain=2)
    a = {r["id"]: round(r["rank"], 12) for r in full.collect()}
    b = {r["id"]: round(r["rank"], 12) for r in ret.collect()}
    assert a == b
    iters = sorted(
        int(n.split("=")[1])
        for n in os.listdir(os.path.join(d2, "pagerank"))
        if n.startswith("iter=")
    )
    assert iters == [5, 6], iters
    # resume sees the retained latest and returns instantly
    again, info2 = pagerank(edges, tol=0.0, max_iter=6, checkpoint_dir=d2, retain=2)
    assert info2.get("resumed") or info2["iterations"] == 6
    assert {r["id"]: round(r["rank"], 12) for r in again.collect()} == a


def test_eigenvector_resume_tolerates_missing_norm(spark, tmp_path):
    """Kill window between cm.commit(k) and cm.update_meta(k): the commit
    is valid but its meta lacks "norm". Resume must recompute the L2 norm
    from the loaded state instead of crashing, and still land on the
    uninterrupted run's scores exactly (ADVICE r4, spectral.py)."""
    import json
    import os

    import pytest as _pytest

    from metis_spark.plans.spectral import eigenvector_centrality
    from oracles import random_graph

    edges = edges_df(spark, random_graph(n=40, p=0.1, seed=21, zipf_extra=20))
    full, _ = eigenvector_centrality(
        edges, tol=0.0, max_iter=5, checkpoint_dir=str(tmp_path / "full")
    )
    part_dir = str(tmp_path / "part")
    eigenvector_centrality(edges, tol=0.0, max_iter=2, checkpoint_dir=part_dir)
    meta_path = os.path.join(part_dir, "eigenvector", "iter=2", "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    assert "norm" in meta
    del meta["norm"]
    del meta["converged"]
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    resumed, info = eigenvector_centrality(
        edges, tol=0.0, max_iter=5, checkpoint_dir=part_dir
    )
    a = {r["id"]: r["score"] for r in full.collect()}
    b = {r["id"]: r["score"] for r in resumed.collect()}
    assert set(a) == set(b)
    for v in a:
        assert a[v] == _pytest.approx(b[v], abs=1e-12), v


def test_densest_resume_ignores_stale_journal(spark, tmp_path):
    """Kill window between cm.commit(k0) and append_metrics: the journal
    ends one round behind the committed state. The resumed threshold must
    come from the COMMITTED state (recomputed n, e), so the trajectory
    still equals the uninterrupted run's (ADVICE r4, densest.py)."""
    import os

    from metis_spark.plans.densest import densest_subgraph
    from oracles import random_graph

    pairs = random_graph(n=80, p=0.08, seed=33, zipf_extra=60)
    edges = edges_df(spark, pairs)
    full, info_full = densest_subgraph(edges, checkpoint_dir=str(tmp_path / "f"))
    assert info_full["converged"]

    part_dir = str(tmp_path / "p")
    densest_subgraph(edges, checkpoint_dir=part_dir, max_iter=3)
    # simulate the torn window: drop the journal line of the last commit
    jpath = os.path.join(part_dir, "densest5", "metrics.jsonl")
    with open(jpath) as f:
        lines = f.readlines()
    with open(jpath, "w") as f:
        f.writelines(lines[:-1])
    resumed, info_res = densest_subgraph(edges, checkpoint_dir=part_dir)
    assert info_res["converged"]
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, resumed.collect()))
    assert (info_full["best_round"], info_full["best_n"], info_full["best_e"]) == (
        info_res["best_round"], info_res["best_n"], info_res["best_e"]
    )
