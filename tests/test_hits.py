import numpy as np
import pytest

from conftest import edges_df, vertices_df
from metis_spark.plans.hits import hits
from oracles import random_graph


def hits_oracle(n, edges, iters=5):
    """Kleinberg HITS: a' = Aᵀh ; h' = A·a' (raw) ; L2-normalize both."""
    h = np.ones(n)
    a = np.ones(n)
    for _ in range(iters):
        ar = np.zeros(n)
        for s, t in edges:
            ar[t] += h[s]
        hr = np.zeros(n)
        for s, t in edges:
            hr[s] += ar[t]
        a = ar / np.linalg.norm(ar)
        h = hr / np.linalg.norm(hr)
    return h, a


def test_hits_vs_oracle(spark, tmp_path):
    edges = random_graph(n=60, p=0.06, seed=11, zipf_extra=40)
    want_h, want_a = hits_oracle(60, edges, iters=5)
    scores, info = hits(
        edges_df(spark, edges), vertices=vertices_df(spark, range(60)),
        checkpoint_dir=str(tmp_path), tol=0.0, max_iter=5,
    )
    got = {r["id"]: (r["hub"], r["auth"]) for r in scores.collect()}
    assert len(got) == 60 and info["iterations"] == 5
    for v in range(60):
        assert got[v][0] == pytest.approx(want_h[v], abs=1e-9), ("hub", v)
        assert got[v][1] == pytest.approx(want_a[v], abs=1e-9), ("auth", v)


def test_hits_converges(spark, tmp_path):
    edges = random_graph(n=40, p=0.08, seed=13, zipf_extra=20)
    scores, info = hits(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path),
        tol=1e-8, max_iter=100,
    )
    assert info["converged"] and info["iterations"] < 100
    # L2 norms of both vectors are 1 at the fixpoint
    rows = scores.collect()
    assert sum(r["hub"] ** 2 for r in rows) == pytest.approx(1.0, abs=1e-9)
    assert sum(r["auth"] ** 2 for r in rows) == pytest.approx(1.0, abs=1e-9)


def test_hits_resume_identical(spark, tmp_path):
    edges = random_graph(n=50, p=0.06, seed=17, zipf_extra=25)
    full, _ = hits(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "a"),
        tol=0.0, max_iter=6,
    )
    hits(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "b"),
        tol=0.0, max_iter=3,
    )
    resumed, info = hits(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "b"),
        tol=0.0, max_iter=6,
    )
    a = {r["id"]: (r["hub"], r["auth"]) for r in full.collect()}
    b = {r["id"]: (r["hub"], r["auth"]) for r in resumed.collect()}
    assert set(a) == set(b)
    for v in a:
        assert a[v][0] == pytest.approx(b[v][0], abs=1e-12)
        assert a[v][1] == pytest.approx(b[v][1], abs=1e-12)


def test_hits_checkpoint_every_identical(spark, tmp_path):
    edges = random_graph(n=45, p=0.07, seed=23, zipf_extra=20)
    every1, _ = hits(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "e1"),
        tol=0.0, max_iter=5, checkpoint_every=1,
    )
    every3, _ = hits(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "e3"),
        tol=0.0, max_iter=5, checkpoint_every=3,
    )
    a = {r["id"]: (r["hub"], r["auth"]) for r in every1.collect()}
    b = {r["id"]: (r["hub"], r["auth"]) for r in every3.collect()}
    assert set(a) == set(b)
    # commit repartitioning changes float summation order → allow ulp-level
    # drift; semantics are identical
    for v in a:
        assert a[v][0] == pytest.approx(b[v][0], abs=1e-12)
        assert a[v][1] == pytest.approx(b[v][1], abs=1e-12)
