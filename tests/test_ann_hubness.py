"""knn_hubness (operators/similarity.py) — hand pins: a planted hub
dominates every neighbour list; a symmetric configuration has zero
skew; zero-occurrence vectors are counted."""

from __future__ import annotations

from metis_spark.operators.similarity import knn_hubness


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_planted_hub_k1(spark):
    # ids 0,8,16,24 pass mod 8. Vector 0 is the normalized "center"
    # direction every other vector is closest to; the others are
    # mutually near-orthogonal ⇒ with k=1 everyone picks 0, and 0
    # picks its nearest — N_1(0)=3, one vector has N_1=1, two have 0
    d = _emb(
        spark,
        [
            (0, [1.0, 1.0, 1.0], 0),
            (8, [1.0, 0.1, 0.0], 0),
            (16, [0.0, 1.0, 0.1], 0),
            (24, [0.1, 0.0, 1.0], 0),
        ],
    )
    rows = knn_hubness(d, mod=8, k=1).collect()
    hist = {r["k_occurrence"]: r["n_vectors"] for r in rows}
    assert hist[3] == 1  # the hub
    assert hist[0] == 2  # antihubs exist and are counted
    assert hist[1] == 1
    assert rows[0]["n_slice"] == 4
    # right-skewed: one big occurrence, mass at zero
    assert rows[0]["skew_micro"] > 0


def test_symmetric_ring_zero_skew(spark):
    # two mutual pairs: everyone occurs exactly once ⇒ m2 = 0 ⇒ NULL skew
    d = _emb(
        spark,
        [
            (0, [1.0, 0.0], 0),
            (8, [0.9, 0.1], 0),
            (16, [0.0, 1.0], 0),
            (24, [0.1, 0.9], 0),
        ],
    )
    rows = knn_hubness(d, mod=8, k=1).collect()
    hist = {r["k_occurrence"]: r["n_vectors"] for r in rows}
    assert hist == {1: 4}
    assert rows[0]["skew_micro"] is None


def test_occurrence_mass_conservation(spark):
    # Σ occ = |slice| · k when every query has ≥ k candidates
    d = _emb(
        spark,
        [(8 * i, [float(i + 1), float((i * 3) % 5), 1.0], 0) for i in range(6)],
    )
    rows = knn_hubness(d, mod=8, k=2).collect()
    assert sum(r["k_occurrence"] * r["n_vectors"] for r in rows) == 6 * 2
