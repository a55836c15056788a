"""LPA goldens G5/G6 and triangle-count goldens G4 + random oracles."""

from conftest import edges_df, vertices_df
from metis_spark.plans.lpa import label_propagation
from metis_spark.plans.triangles import triangle_count, triangle_count_per_vertex
from oracles import lpa_oracle, random_graph, triangles_oracle


def _labels(df):
    return {r["id"]: r["label"] for r in df.collect()}


def test_g5_two_cliques_bridged(spark, tmp_path):
    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    labels, info = label_propagation(edges_df(spark, edges), checkpoint_dir=str(tmp_path))
    got = _labels(labels)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def test_g6_lpa_no_oscillation(spark, tmp_path):
    edges = edges_df(spark, [(0, 1)])
    vertices = vertices_df(spark, [0, 1, 2])
    labels, info = label_propagation(edges, vertices=vertices, checkpoint_dir=str(tmp_path))
    assert _labels(labels) == {0: 0, 1: 0, 2: 2}
    assert info["converged"]


def test_lpa_matches_python_oracle(spark, tmp_path):
    edges = random_graph(n=40, p=0.06, seed=11, zipf_extra=10)
    labels, _ = label_propagation(
        edges_df(spark, edges), vertices=vertices_df(spark, range(40)),
        checkpoint_dir=str(tmp_path), max_iter=10, stop_when_stable=False,
    )
    assert _labels(labels) == lpa_oracle(list(range(40)), edges, max_iter=10)


def test_g4_k4(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = edges_df(spark, k4)
    assert triangle_count(df) == 4
    per_v = {r["id"]: r["triangles"] for r in triangle_count_per_vertex(df).collect()}
    assert per_v == {0: 3, 1: 3, 2: 3, 3: 3}


def test_g6_no_triangles(spark):
    df = edges_df(spark, [(0, 1)])
    assert triangle_count(df) == 0


def test_triangles_vs_bruteforce(spark):
    edges = random_graph(n=80, p=0.08, seed=17, zipf_extra=60)
    df = edges_df(spark, edges)
    expected_global, expected_pv = triangles_oracle(80, edges)
    assert triangle_count(df) == expected_global
    got = {r["id"]: r["triangles"] for r in
           triangle_count_per_vertex(df, vertices_df(spark, range(80))).collect()}
    assert got == expected_pv
