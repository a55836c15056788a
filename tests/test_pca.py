"""pca_top_component (operators/similarity.py) — algorithmic pins
independent of the DuckDB oracle:

- on a corpus whose variance is overwhelmingly along one axis, the top
  component concentrates there (|loading| of that axis = norm_scale,
  everything else far smaller);
- the sign convention makes the largest-|loading| component positive
  even when every vector points the negative way;
- output is deterministic and dimension-complete.
"""

from __future__ import annotations

from metis_spark.operators.similarity import _tdiv, pca_top_component


def test_tdiv_truncates_like_duckdb():
    assert _tdiv(-7, 2) == -3  # DuckDB (-7) // 2 = -3 (trunc), not -4
    assert _tdiv(7, 2) == 3
    assert _tdiv(7, -2) == -3
    assert _tdiv(-7, -2) == 3


def _vecs(spark, rows, dim):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        f"vec_id long, embedding array<float>",
    )


def test_pca_finds_dominant_axis(spark):
    dim = 8
    # energy along axis 2; small noise elsewhere
    rows = []
    for i in range(20):
        v = [0.001 * ((i * 7 + j) % 5 - 2) for j in range(dim)]
        v[2] = 1.0 if i % 2 == 0 else 0.9
        rows.append(v)
    out = pca_top_component(_vecs(spark, rows, dim), dim=dim, rounds=8)
    loads = {r["pos"]: r["loading_q"] for r in out.collect()}
    assert len(loads) == dim
    lead = max(loads, key=lambda p: (abs(loads[p]), -p))
    assert lead == 2
    assert loads[2] == 10**6  # renormalized leader hits the scale exactly
    assert all(abs(loads[p]) < 10**5 for p in loads if p != 2)


def test_pca_sign_convention_positive_leader(spark):
    dim = 4
    rows = [[-1.0 if j == 1 else 0.01 for j in range(dim)] for _ in range(10)]
    out = pca_top_component(_vecs(spark, rows, dim), dim=dim, rounds=6)
    loads = {r["pos"]: r["loading_q"] for r in out.collect()}
    # all mass on axis 1, sign flipped positive by convention
    assert loads[1] == 10**6


def test_pca_deterministic(spark):
    dim = 6
    rows = [[((i + j) % 3 - 1) * 0.5 for j in range(dim)] for i in range(15)]
    df = _vecs(spark, rows, dim)
    a = sorted(map(tuple, pca_top_component(df, dim=dim).collect()))
    b = sorted(map(tuple, pca_top_component(df, dim=dim).collect()))
    assert a == b
