"""map_equation (plans/metrics.py) — Rosvall-Bergstrom codelength pins:

- two disjoint triangles, partitioned by triangle: q = 0 and the
  closed form L = 1 + log2(6) − 2 ≈ 1.584962 bits;
- the one-module partition of the same graph costs exactly the vertex
  entropy log2(6) ≈ 2.584962 — strictly worse;
- all-singletons is worse still, and splitting a triangle turns the
  index codebook on (q > 0, index_micro > 0).
"""

from __future__ import annotations

from metis_spark.plans.metrics import map_equation

from tests.conftest import edges_df

TRIANGLES = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]


def _labels(spark, mapping):
    return spark.createDataFrame(
        [(int(v), int(m)) for v, m in mapping.items()], "id long, label long"
    )


def _run(spark, mapping):
    return map_equation(_labels(spark, mapping), edges_df(spark, TRIANGLES)).collect()[0]


def test_two_triangle_partition_closed_form(spark):
    r = _run(spark, {1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 1})
    assert (r["n_modules"], r["two_m"], r["q_num"]) == (2, 12, 0)
    assert r["index_micro"] == 0  # no exits → the index codebook is free
    # L = Σ_m plogp(1/2) − Σ_v plogp(1/6) = −1 + log2(6)
    assert r["codelength"] == 1.584962


def test_one_module_is_vertex_entropy(spark):
    r = _run(spark, {v: 7 for v in range(1, 7)})
    assert (r["n_modules"], r["q_num"]) == (1, 0)
    assert r["codelength"] == 2.584962  # log2(6), micro-quantized


def test_orderings_and_split_penalty(spark):
    good = _run(spark, {1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 1})["codelength"]
    lump = _run(spark, {v: 7 for v in range(1, 7)})["codelength"]
    singletons = _run(spark, {v: v for v in range(1, 7)})["codelength"]
    split = _run(spark, {1: 0, 2: 0, 3: 1, 4: 1, 5: 1, 6: 1})
    assert good < lump < singletons
    assert split["q_num"] > 0 and split["index_micro"] > 0
    assert split["codelength"] > good
