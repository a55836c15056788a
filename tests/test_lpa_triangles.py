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


def test_seeded_lpa_path_and_unreached(spark, tmp_path):
    """Two seeds on a path split it by proximity (smallest-label ties);
    a component with no seed stays honestly NULL."""
    from metis_spark.plans.lpa import seeded_label_propagation

    e = edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (8, 9)])
    seeds = spark.createDataFrame([(0, 100), (5, 200)], "id long, label long")
    out, info = seeded_label_propagation(
        e, seeds, max_iter=10, checkpoint_dir=str(tmp_path / "s")
    )
    assert info["converged"]
    lab = {r["id"]: r["label"] for r in out.collect()}
    assert lab[0] == lab[1] == lab[2] == 100
    assert lab[3] == lab[4] == lab[5] == 200
    assert lab[8] is None and lab[9] is None


def test_seeded_lpa_seeds_immutable(spark, tmp_path):
    """A seed surrounded by the other label still keeps its own."""
    from metis_spark.plans.lpa import seeded_label_propagation

    star = [(0, i) for i in range(1, 6)]
    e = edges_df(spark, star)
    seeds = spark.createDataFrame(
        [(0, 7)] + [(i, 9) for i in range(1, 6)], "id long, label long"
    )
    out, _ = seeded_label_propagation(
        e, seeds, max_iter=5, checkpoint_dir=str(tmp_path / "s2")
    )
    lab = {r["id"]: r["label"] for r in out.collect()}
    assert lab[0] == 7 and all(lab[i] == 9 for i in range(1, 6))


def test_directed_triad_census(spark):
    """Hand-counted motifs. Cyclic: 0→1→2→0 and 10→11→12→10.
    Feed-forward: (5→6, 6→7, 5→7) and (11→12, 12→10, 11→10) — the
    reciprocal edge 11→10 closes a second FFL on the 10/11/12 cycle."""
    from metis_spark.plans.triangles import directed_triad_census

    pairs = [
        (0, 1), (1, 2), (2, 0),
        (5, 6), (6, 7), (5, 7),
        (10, 11), (11, 10), (11, 12), (12, 10),
    ]
    df = spark.createDataFrame(pairs, "src long, dst long")
    row = directed_triad_census(df).collect()[0]
    assert row["n_cyclic"] == 2
    assert row["n_feedforward"] == 2


def test_four_cliques_k5_and_sparse(spark):
    from itertools import combinations

    from metis_spark.plans.triangles import four_clique_count

    k5 = [(a, b) for a, b in combinations(range(5), 2)]
    row = four_clique_count(edges_df(spark, k5)).collect()[0]
    assert (row["triangles"], row["four_cliques"]) == (10, 5)

    edges = random_graph(n=45, p=0.15, seed=17, zipf_extra=30)
    nbrs = {}
    for a, b in edges:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    verts = sorted(nbrs)
    want = sum(
        1
        for q in combinations(verts, 4)
        if all(y in nbrs[x] for x, y in combinations(q, 2))
    )
    row = four_clique_count(edges_df(spark, edges)).collect()[0]
    assert row["four_cliques"] == want
