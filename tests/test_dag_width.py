"""dag_width_profile (plans/scc.py) — hand pins on a diamond DAG and
a cyclic clump collapsing to one task."""

from __future__ import annotations

import tempfile

from metis_spark.plans.scc import (
    condensation_levels,
    dag_width_profile,
    strongly_connected_components,
)

from tests.conftest import edges_df


def _profile(spark, pairs):
    e = edges_df(spark, pairs)
    labels, info = strongly_connected_components(
        e, checkpoint_dir=tempfile.mkdtemp(prefix="dagw_t_")
    )
    assert info["converged"]
    lv = condensation_levels(e, labels, max_rounds=8)
    return {r["level"]: r for r in dag_width_profile(lv).collect()}


def test_diamond_profile(spark):
    # 1→2, 1→3, 2→4, 3→4: acyclic ⇒ 4 tasks, widths 1/2/1, depth 3
    got = _profile(spark, [(1, 2), (1, 3), (2, 4), (3, 4)])
    assert {k: v["width"] for k, v in got.items()} == {0: 1, 1: 2, 2: 1}
    row = got[0]
    assert row["n_tasks"] == 4 and row["critical_path"] == 3
    # Brent: max(ceil(4/8)=1, 3) = 3 — depth-bound, workers don't help
    assert row["makespan_p8"] == 3 and row["makespan_p32"] == 3


def test_cycle_collapses_to_one_task(spark):
    # 2↔3 cycle between 1 and 4: the clump is ONE composite task
    got = _profile(spark, [(1, 2), (2, 3), (3, 2), (3, 4)])
    assert {k: v["width"] for k, v in got.items()} == {0: 1, 1: 1, 2: 1}
    assert got[0]["n_tasks"] == 3 and got[0]["critical_path"] == 3


def test_wide_flat_build_is_worker_bound(spark):
    # one root fanning out to 40 leaves: depth 2, 41 tasks —
    # ceil(41/8)=6 beats depth ⇒ p8 makespan is worker-bound
    got = _profile(spark, [(0, i) for i in range(1, 41)])
    row = got[0]
    assert row["n_tasks"] == 41 and row["critical_path"] == 2
    assert row["makespan_p8"] == 6 and row["makespan_p32"] == 2
