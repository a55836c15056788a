"""condensation_critical_path (plans/scc.py) — hand-computed pins.

Cycle {1,2} (SCC size 2) → 3 → 4, plus root 5 → 4:

    ef(A={1,2}) = 2; ef(B={3}) = 3; ef(C={4}) = 4; ef(D={5}) = 1
    critical path (build order): A → B → C, steps 1..3

The backtrace must prefer B (ef 3) over D (ef 1) at C, and ties on
ef break toward the smaller SCC label.
"""

from __future__ import annotations

from metis_spark.plans.scc import (
    condensation_critical_path,
    strongly_connected_components,
)

from tests.conftest import edges_df


def _path(spark, tmp_path, edges, rounds=8):
    labels, info = strongly_connected_components(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path)
    )
    assert info["converged"]
    out = condensation_critical_path(
        edges_df(spark, edges), labels, max_rounds=rounds
    )
    return [(r["step"], r["scc"], r["scc_size"], r["ef"]) for r in out.orderBy("step").collect()]


def test_weighted_chain_with_cycle(spark, tmp_path):
    edges = [(1, 2), (2, 1), (2, 3), (3, 4), (5, 4)]
    assert _path(spark, tmp_path, edges) == [
        (1, 1, 2, 2),   # the 2-cycle contracts to scc 1, cost 2
        (2, 3, 1, 3),
        (3, 4, 1, 4),
    ]


def test_backtrace_tie_breaks_to_min_label(spark, tmp_path):
    # preds 1 and 2 of 3 have equal ef=1 — the path roots at min scc 1
    edges = [(1, 3), (2, 3)]
    assert _path(spark, tmp_path, edges) == [(1, 1, 1, 1), (2, 3, 1, 2)]


def test_single_node_dag(spark, tmp_path):
    # one edge, two singleton sccs: path is the whole 2-chain
    edges = [(7, 9)]
    assert _path(spark, tmp_path, edges) == [(1, 7, 1, 1), (2, 9, 1, 2)]
