"""k-truss support peeling: goldens, python-oracle equivalence, resume."""

import itertools

import pytest

from conftest import edges_df
from oracles import random_graph

from metis_spark.plans.ktruss import k_truss


def _truss_oracle(edges, k):
    """Reference peeling: {(a,b): support} of the k-truss subgraph."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        nbrs = {}
        for a, b in es:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        sup = {e: len(nbrs[e[0]] & nbrs[e[1]]) for e in es}
        drop = {e for e, s in sup.items() if s < k - 2}
        if not drop:
            return sup
        es -= drop


def _got(df):
    return {(r["src"], r["dst"]): r["support"] for r in df.collect()}


def test_k5_is_its_own_4truss(spark, tmp_path):
    k5 = list(itertools.combinations(range(5), 2))
    sup, info = k_truss(edges_df(spark, k5), k=4, checkpoint_dir=str(tmp_path))
    # every K5 edge sits in exactly 3 triangles
    assert _got(sup) == {e: 3 for e in k5}
    assert info["converged"]


def test_pendant_triangle_peels_for_k4(spark, tmp_path):
    # K5 plus a triangle hanging off vertex 0: the triangle's edges have
    # support 1 < 2 and must peel; K5 survives intact
    k5 = list(itertools.combinations(range(5), 2))
    edges = k5 + [(0, 5), (0, 6), (5, 6)]
    sup, info = k_truss(edges_df(spark, edges), k=4, checkpoint_dir=str(tmp_path))
    assert _got(sup) == {e: 3 for e in k5}
    assert info["converged"]


def test_triangle_free_graph_empty_truss(spark, tmp_path):
    cycle4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
    sup, info = k_truss(edges_df(spark, cycle4), k=3, checkpoint_dir=str(tmp_path))
    assert _got(sup) == {}
    assert info["converged"]


def test_cascade_peels_chained_triangles(spark, tmp_path):
    # two triangles sharing vertex 2 with a K4 attached: for k=4 the two
    # triangles peel (support 1 each) in a cascade, K4 survives
    k4 = list(itertools.combinations(range(4), 2))
    edges = k4 + [(3, 4), (4, 5), (3, 5), (5, 6), (6, 7), (5, 7)]
    sup, info = k_truss(edges_df(spark, edges), k=4, checkpoint_dir=str(tmp_path))
    assert _got(sup) == {e: 2 for e in k4}
    assert info["converged"]


def test_random_vs_python_oracle(spark, tmp_path):
    edges = random_graph(n=60, p=0.08, seed=47, zipf_extra=40)
    sup, info = k_truss(edges_df(spark, edges), k=4, checkpoint_dir=str(tmp_path))
    assert _got(sup) == _truss_oracle(edges, 4)
    assert info["converged"]


def test_resume_mid_peel_identical(spark, tmp_path):
    edges = random_graph(n=60, p=0.08, seed=53, zipf_extra=40)
    full, _ = k_truss(edges_df(spark, edges), k=4, checkpoint_dir=str(tmp_path / "a"))
    want = _got(full)
    # interrupted run: only 1 round, then resume to fixpoint in the same dir
    k_truss(edges_df(spark, edges), k=4, checkpoint_dir=str(tmp_path / "b"), max_iter=1)
    resumed, info = k_truss(edges_df(spark, edges), k=4, checkpoint_dir=str(tmp_path / "b"))
    assert _got(resumed) == want
    assert info["converged"]


def test_k_below_3_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        k_truss(edges_df(spark, [(0, 1)]), k=2, checkpoint_dir=str(tmp_path))
