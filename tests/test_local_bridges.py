"""local_bridges (plans/metrics.py) — weak-tie span pins:

- triangle: no local bridges (every edge has a common neighbor);
- square C4: every edge is a local bridge with span exactly 3;
- pentagon C5: every edge is a local bridge with true span 4 (no
  length-3 detour) → span_lb = 4;
- path 1-2-3-4: real bridges (removal disconnects) report the lower
  bound 4;
- barbell (two triangles + connecting edge): only the connector is a
  local bridge, and its span is >= 4.
"""

from __future__ import annotations

from metis_spark.plans.metrics import local_bridges

from tests.conftest import edges_df


def _run(spark, pairs):
    rows = local_bridges(edges_df(spark, pairs)).collect()
    return {(r["src"], r["dst"]): r["span_lb"] for r in rows}


def test_triangle_has_no_local_bridges(spark):
    assert _run(spark, [(1, 2), (2, 3), (1, 3)]) == {}


def test_square_span_3(spark):
    out = _run(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    assert out == {(1, 2): 3, (2, 3): 3, (3, 4): 3, (1, 4): 3}


def test_pentagon_span_4(spark):
    out = _run(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (1, 5)])
    assert set(out.values()) == {4} and len(out) == 5


def test_path_reports_lower_bound(spark):
    out = _run(spark, [(1, 2), (2, 3), (3, 4)])
    # every path edge is a true bridge (span infinite) -> lower bound 4
    assert out == {(1, 2): 4, (2, 3): 4, (3, 4): 4}


def test_barbell_connector_only(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    out = _run(spark, pairs)
    assert out == {(3, 4): 4}


def test_hexagon_span_detour(spark):
    # C6 plus chord (1,4): edges of the chordless half see a 3-detour
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (1, 6), (1, 4)]
    out = _run(spark, pairs)
    # (2,3): detour 2-1-4-3 exists -> 3; (1,2) detour 1-4-3-2 -> 3
    assert out[(2, 3)] == 3 and out[(1, 2)] == 3
