"""clique_percolation_k3 (plans/cpm.py) — structural pins:

- two triangles sharing an edge percolate into ONE community (4
  vertices, 2 triangles); a third edge-disjoint triangle stays its own
  community even when it shares a VERTEX (k=3 CPM adjacency is
  shared-EDGE, not shared-vertex — that's what makes communities
  overlapping at the broker vertex);
- a triangle-free graph yields no communities;
- a clique K4 is one community with C(4,3) = 4 triangles.
"""

from __future__ import annotations

from itertools import combinations

from metis_spark.plans.cpm import clique_percolation_k3


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def test_edge_share_percolates_vertex_share_does_not(spark, tmp_path):
    # T1 = {1,2,3}, T2 = {2,3,4} share edge (2,3) -> one community.
    # T3 = {4,5,6} shares only vertex 4 with T2 -> separate community.
    pairs = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5), (4, 6), (5, 6)]
    out = clique_percolation_k3(_edges(spark, pairs), checkpoint_dir=str(tmp_path))
    rows = sorted(
        ((r["n_vertices"], r["n_triangles"]) for r in out.collect())
    )
    assert rows == [(3, 1), (4, 2)]


def test_triangle_free_is_empty(spark, tmp_path):
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1)]  # 4-cycle, no triangles
    out = clique_percolation_k3(_edges(spark, pairs), checkpoint_dir=str(tmp_path))
    assert out.count() == 0


def test_k4_one_community(spark, tmp_path):
    pairs = list(combinations(range(1, 5), 2))
    out = clique_percolation_k3(_edges(spark, pairs), checkpoint_dir=str(tmp_path))
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["n_vertices"] == 4 and rows[0]["n_triangles"] == 4
