"""checkpoint_every=k on the round-3 iterative family: the dial must not
change any algorithm's output (identical fixpoint for every k), must
commit only on the k-schedule (+ final/convergence), and resume must land
on the last COMMITTED iteration and reproduce the k=1 result exactly.

Mirrors test_resume.py::test_pagerank_checkpoint_every_equivalent_and_resumable
for the plans that gained the dial in round 4 (VERDICT r3 item 1).
"""

import os

from conftest import edges_df
from metis_spark.plans.checkpoint import CheckpointManager
from metis_spark.plans.coreness import coreness
from metis_spark.plans.matching import maximal_matching
from metis_spark.plans.mst import minimum_spanning_forest
from metis_spark.plans.temporal import temporal_reachability
from oracles import random_graph


def _committed_iters(base_dir: str, algo: str) -> list[int]:
    d = os.path.join(base_dir, algo)
    return sorted(
        int(n.split("=")[1])
        for n in os.listdir(d)
        if n.startswith("iter=") and os.path.isfile(os.path.join(d, n, "meta.json"))
    )


def test_coreness_checkpoint_every_equivalent_and_resumable(spark, tmp_path):
    edges = edges_df(spark, random_graph(n=60, p=0.08, seed=7))
    c1, i1 = coreness(edges, checkpoint_dir=str(tmp_path / "e1"))
    c5, i5 = coreness(edges, checkpoint_dir=str(tmp_path / "e5"), checkpoint_every=5)
    assert i1["converged"] and i5["converged"]
    assert i1["iterations"] == i5["iterations"]
    a = {r["id"]: r["core"] for r in c1.collect()}
    b = {r["id"]: r["core"] for r in c5.collect()}
    assert a == b
    committed = _committed_iters(str(tmp_path / "e5"), "coreness")
    # only scheduled iterations + the convergence iteration are durable
    assert all(k % 5 == 0 or k == i5["iterations"] for k in committed)
    assert len(committed) < i5["iterations"] or i5["iterations"] == 1
    # kill mid-schedule (max_iter=2 < first commit at 5 forces k==max_iter
    # durable), resume, same fixpoint
    dk = str(tmp_path / "kill")
    coreness(edges, checkpoint_dir=dk, max_iter=2, checkpoint_every=5)
    cm = CheckpointManager(dk, "coreness")
    assert cm.latest() == 2  # k == max_iter is always durable
    resumed, ir = coreness(edges, checkpoint_dir=dk, checkpoint_every=5)
    assert ir["converged"]
    assert {r["id"]: r["core"] for r in resumed.collect()} == a


def test_matching_checkpoint_every_equivalent(spark, tmp_path):
    edges = edges_df(spark, random_graph(n=60, p=0.06, seed=11))
    m1, i1 = maximal_matching(edges, checkpoint_dir=str(tmp_path / "e1"))
    m3, i3 = maximal_matching(
        edges, checkpoint_dir=str(tmp_path / "e3"), checkpoint_every=3, retain=2
    )
    assert i1["converged"] and i3["converged"]
    a = {(r["src"], r["dst"]) for r in m1.collect()}
    b = {(r["src"], r["dst"]) for r in m3.collect()}
    assert a == b
    committed = _committed_iters(str(tmp_path / "e3"), "matching")
    assert all(k % 3 == 0 or k == i3["iterations"] for k in committed)
    assert len(committed) <= 2  # retain=2 pruned older commits


def test_mst_checkpoint_every_equivalent(spark, tmp_path):
    rows = [
        (a, b, (a * 7 + b * 13) % 97 + 1)
        for a, b in random_graph(n=50, p=0.07, seed=23)
    ]
    df = spark.createDataFrame(rows, "src long, dst long, weight long")
    f1, i1 = minimum_spanning_forest(df, checkpoint_dir=str(tmp_path / "e1"))
    f4, i4 = minimum_spanning_forest(
        df, checkpoint_dir=str(tmp_path / "e4"), checkpoint_every=4
    )
    assert i1["converged"] and i4["converged"]
    a = {(r["src"], r["dst"], r["weight"]) for r in f1.collect()}
    b = {(r["src"], r["dst"], r["weight"]) for r in f4.collect()}
    assert a == b
    assert i1["msf_edges"] == i4["msf_edges"]


def test_temporal_checkpoint_every_equivalent(spark, tmp_path):
    rows = [
        (a, b, (a * 11 + b * 5) % 40)
        for a, b in random_graph(n=60, p=0.06, seed=31)
    ]
    df = spark.createDataFrame(rows, "src long, dst long, ts long")
    seeds = spark.createDataFrame([(0,), (1,)], "id long")
    r1, i1 = temporal_reachability(df, seeds, checkpoint_dir=str(tmp_path / "e1"))
    r4, i4 = temporal_reachability(
        df, seeds, checkpoint_dir=str(tmp_path / "e4"), checkpoint_every=4
    )
    assert i1["converged"] and i4["converged"]
    a = {r["id"]: r["arrival"] for r in r1.collect()}
    b = {r["id"]: r["arrival"] for r in r4.collect()}
    assert a == b


def test_mst_contraction_budget_raises_not_corrupts(spark, tmp_path):
    """Monotone weights along a path make every edge a round-1 chosen
    edge, so the quotient contraction needs diameter-many hash-min steps.
    An insufficient max_inner must RAISE (never proceed with a partial
    contraction, which could durably append a cycle edge); a sufficient
    budget returns the exact path forest."""
    import pytest

    n = 16  # path diameter = contraction steps; 16 keeps the test fast
    rows = [(i, i + 1, i + 1) for i in range(n)]  # strictly increasing weights
    df = spark.createDataFrame(rows, "src long, dst long, weight long")
    with pytest.raises(RuntimeError, match="max_inner"):
        minimum_spanning_forest(
            df, max_inner=4, checkpoint_dir=str(tmp_path / "tight"), resume=False
        )
    ok, info = minimum_spanning_forest(
        df, max_inner=64, checkpoint_dir=str(tmp_path / "wide"), resume=False
    )
    assert info["converged"] and info["msf_edges"] == n
    assert info["inner_steps_max"] > 4  # the tight budget above was truly short
