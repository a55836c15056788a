"""temporal_triangle_count (plans/temporal.py) — WSDM'17 motif pins:

- an ascending 3-cycle inside the window counts once (no rotation
  double-count);
- the window excludes it when delta is too small;
- timestamp ties never form a motif;
- a return path u->v->u is not a 2-path.
"""

from __future__ import annotations

from metis_spark.plans.temporal import temporal_triangle_count


def _te(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, ts long")


def _run(spark, rows, delta):
    return temporal_triangle_count(_te(spark, rows), delta).collect()[0]


def test_single_cycle_counts_once(spark):
    r = _run(spark, [(1, 2, 1), (2, 3, 2), (3, 1, 3)], delta=10)
    assert r["cyc_triangles"] == 1
    assert r["two_paths"] == 2  # (1->2->3) and (2->3->1); (3->1->2) breaks order
    assert r["closure"] == 0.5


def test_window_excludes(spark):
    r = _run(spark, [(1, 2, 1), (2, 3, 2), (3, 1, 30)], delta=10)
    assert r["cyc_triangles"] == 0
    assert r["two_paths"] == 1  # only (1->2->3); (2->3->1) gap 28 > delta


def test_ties_never_close(spark):
    r = _run(spark, [(1, 2, 5), (2, 3, 5), (3, 1, 6)], delta=10)
    assert r["two_paths"] == 1  # (2->3->1) strict; (1->2->3) tied out
    assert r["cyc_triangles"] == 0


def test_return_path_not_counted(spark):
    r = _run(spark, [(1, 2, 1), (2, 1, 2)], delta=10)
    assert r["two_paths"] == 0 and r["cyc_triangles"] == 0
