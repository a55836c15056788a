"""katz_index_topk (plans/metrics.py) — walk-count pins:

- path graph: distance-2 pairs score beta_den, distance-3 pairs 1;
- C4: opposite corners have paths2=2, paths3=0 (bipartite parity);
- triangle + pendant: the mixed 2-and-3-path pair scores 8+1;
- adjacent pairs never appear; ranking is deterministic.
"""

from __future__ import annotations

from metis_spark.plans.metrics import katz_index_topk

from tests.conftest import edges_df


def _run(spark, pairs, k=100):
    rows = katz_index_topk(edges_df(spark, pairs), k=k, beta_den=8).collect()
    return {(r["u"], r["v"]): (r["paths2"], r["paths3"], r["katz_scaled"]) for r in rows}


def test_path_graph(spark):
    out = _run(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert out[(1, 3)] == (1, 0, 8)
    assert out[(1, 4)] == (0, 1, 1)
    assert out[(2, 4)] == (1, 0, 8)
    assert (1, 5) not in out  # distance 4: no length-<=3 walk
    assert (1, 2) not in out  # adjacent pairs excluded


def test_c4_bipartite_parity(spark):
    out = _run(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    assert out == {(1, 3): (2, 0, 16), (2, 4): (2, 0, 16)}


def test_triangle_pendant(spark):
    out = _run(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    # (1,4): common neighbor 3, plus path 1-2-3-4
    assert out[(1, 4)] == (1, 1, 9)
    assert out[(2, 4)] == (1, 1, 9)


def test_rank_and_cut(spark):
    out = _run(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], k=1)
    assert list(out) == [(1, 3)]  # highest score, lowest (u,v) tie-break
