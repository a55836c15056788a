"""k_peak (plans/kpeak.py) — Govindan et al. pins:

- two disjoint cliques peel as two mountains (K5 → 4, K4 → 3);
- the shadowing fix: a satellite wired to two K5 members has CORE 2
  but PEAK 0 — its density was borrowed from the mountain;
- a pendant path forms its own 1-contour;
- the contour bound raises instead of silently truncating.
"""

from __future__ import annotations

import itertools

import pytest

from metis_spark.plans.kpeak import k_peak

from tests.conftest import edges_df

K5 = list(itertools.combinations(range(1, 6), 2))
K4 = list(itertools.combinations(range(10, 14), 2))


def _run(spark, pairs, tmp_path, name, **kw):
    out, info = k_peak(
        edges_df(spark, pairs), checkpoint_dir=str(tmp_path / name), **kw
    )
    return {r["id"]: r["peak"] for r in out.collect()}, info


def test_two_mountains(spark, tmp_path):
    got, info = _run(spark, K5 + K4, tmp_path, "a")
    assert all(got[v] == 4 for v in range(1, 6))
    assert all(got[v] == 3 for v in range(10, 14))
    assert info["contours"] == 2 and info["kmaxes"] == [4, 3]


def test_satellite_peak_below_core(spark, tmp_path):
    # 99 touches two K5 members: coreness(99) = 2, but once the K5
    # mountain is removed it is isolated → peak 0
    got, info = _run(spark, K5 + [(99, 1), (99, 2)], tmp_path, "b")
    assert got[99] == 0
    assert all(got[v] == 4 for v in range(1, 6))


def test_pendant_path_contour(spark, tmp_path):
    got, _ = _run(spark, K5 + [(1, 20), (20, 21), (21, 22)], tmp_path, "c")
    assert all(got[v] == 4 for v in range(1, 6))
    assert got[20] == got[21] == got[22] == 1


def test_contour_bound_raises(spark, tmp_path):
    with pytest.raises(RuntimeError, match="contour bound"):
        k_peak(
            edges_df(spark, K5 + K4),
            checkpoint_dir=str(tmp_path / "d"),
            max_contours=1,
        )
