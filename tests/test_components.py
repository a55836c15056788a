"""Connected components goldens G3/G6 + seeded random union-find oracle."""

from conftest import edges_df, vertices_df
from metis_spark.plans.components import connected_components
from oracles import cc_oracle, random_graph


def _labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_g3_two_components(spark, tmp_path):
    edges = edges_df(spark, [(0, 1), (1, 2), (3, 4)])
    labels, info = connected_components(edges, checkpoint_dir=str(tmp_path))
    assert info["converged"]
    assert _labels(labels) == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}


def test_g6_isolated_vertex(spark, tmp_path):
    edges = edges_df(spark, [(0, 1)])
    vertices = vertices_df(spark, [0, 1, 2])
    labels, info = connected_components(edges, vertices=vertices, checkpoint_dir=str(tmp_path))
    assert _labels(labels) == {0: 0, 1: 0, 2: 2}


def test_long_path_converges(spark, tmp_path):
    """Path graph stresses the O(log n) star contraction (hash-min would need n rounds)."""
    n = 64
    edges = edges_df(spark, [(i, i + 1) for i in range(n - 1)])
    labels, info = connected_components(edges, checkpoint_dir=str(tmp_path))
    got = _labels(labels)
    assert all(got[i] == 0 for i in range(n))
    assert info["iterations"] < 15


def test_grand_vs_union_find(spark, tmp_path):
    edges = random_graph(n=100, p=0.01, seed=43, zipf_extra=20)
    df = edges_df(spark, edges)
    vertices = vertices_df(spark, range(100))
    labels, info = connected_components(df, vertices=vertices, checkpoint_dir=str(tmp_path))
    assert info["converged"]
    assert _labels(labels) == cc_oracle(list(range(100)), edges)
