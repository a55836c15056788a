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


def test_incremental_matches_cold(spark, tmp_path):
    """Incremental label maintenance over an addition delta equals cold
    CC on the union bit-for-bit (transitive merges + new vertices)."""
    from metis_spark.plans.components import connected_components_incremental

    old_edges = [(0, 1), (2, 3), (4, 5), (8, 9)]
    # merges {0,1}+{2,3} transitively via a NEW vertex 20, links {4,5}
    # to new chain 10-11, leaves {8,9} untouched
    delta = [(1, 20), (20, 2), (5, 10), (10, 11)]
    base, _ = connected_components(
        edges_df(spark, old_edges), checkpoint_dir=str(tmp_path / "a")
    )
    inc, info = connected_components_incremental(
        base, edges_df(spark, delta), checkpoint_dir=str(tmp_path / "b")
    )
    assert info["converged"]
    cold, _ = connected_components(
        edges_df(spark, old_edges + delta), checkpoint_dir=str(tmp_path / "c")
    )
    assert _labels(inc) == _labels(cold)
    assert info["quotient_edges"] <= len(delta) + 1


def test_incremental_noop_delta(spark, tmp_path):
    """A delta entirely inside existing components is a zero-round
    no-op: the quotient graph is empty and labels are unchanged."""
    from metis_spark.plans.components import connected_components_incremental

    old_edges = [(0, 1), (1, 2), (4, 5)]
    base, _ = connected_components(
        edges_df(spark, old_edges), checkpoint_dir=str(tmp_path / "a")
    )
    inc, info = connected_components_incremental(
        base, edges_df(spark, [(0, 2), (4, 5)]), checkpoint_dir=str(tmp_path / "b")
    )
    assert info["quotient_edges"] == 0 and info["iterations"] == 0
    assert _labels(inc) == _labels(base)


def test_incremental_random_vs_cold(spark, tmp_path):
    """Random split of a random graph into base + delta: incremental
    composition equals the cold run."""
    from metis_spark.plans.components import connected_components_incremental

    edges = random_graph(n=120, p=0.012, seed=7, zipf_extra=30)
    old = [e for i, e in enumerate(edges) if i % 3 != 0]
    delta = [e for i, e in enumerate(edges) if i % 3 == 0]
    base, _ = connected_components(
        edges_df(spark, old), checkpoint_dir=str(tmp_path / "a")
    )
    inc, info = connected_components_incremental(
        base, edges_df(spark, delta), checkpoint_dir=str(tmp_path / "b")
    )
    assert info["converged"]
    cold, _ = connected_components(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "c")
    )
    assert _labels(inc) == _labels(cold)
