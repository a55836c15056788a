"""scc_condensation summary math on hand-built label/edge pairs via
the same folds the driver query performs (the full SCC chain is pinned
by the existing scc tests; here we pin the condensation arithmetic by
running the driver query at sf0.001 and checking internal consistency).
"""

from __future__ import annotations

from metis_spark.driver.queries_graph_iterative import _q_scc, _q_scc_condensation

SF = "/root/testdata/sf0.001"


def test_condensation_consistent_with_scc_labels(spark):
    r = _q_scc_condensation(spark, SF).collect()[0]
    labels = _q_scc(spark, SF).collect()
    sizes = {}
    for row in labels:
        sizes[row["scc"]] = sizes.get(row["scc"], 0) + 1
    assert r["n_vertices"] == len(labels)
    assert r["n_sccs"] == len(sizes)
    assert r["largest_scc"] == max(sizes.values())
    assert r["nontrivial_sccs"] == sum(1 for v in sizes.values() if v > 1)
    assert r["vertices_in_cycles"] == sum(v for v in sizes.values() if v > 1)
    assert 0 <= r["edge_reduction"] <= 1
    assert r["condensed_edges"] <= r["n_sccs"] * (r["n_sccs"] - 1)
