"""embedding_cos_histogram (driver/queries_similarity.py) — binning
pins: identical vectors land in the top bin (cos 1 -> clamped 19),
opposite vectors in bin 0, orthogonal in bin 10; counts are the slice
cross-product.
"""

from __future__ import annotations

from metis_spark.driver.queries_similarity import _q_embedding_cos_histogram


def _write(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    return str(tmp_path)


def test_bins(spark, tmp_path):
    # slice A: vec_id % 8 == 0; slice B: % 8 == 1
    rows = [
        (0, [1.0, 0.0], 0),
        (8, [0.0, 1.0], 0),
        (1, [1.0, 0.0], 0),    # cos(0,1)=1 -> bin 19 ; cos(8,1)=0 -> bin 10
        (9, [-1.0, 0.0], 0),   # cos(0,9)=-1 -> bin 0 ; cos(8,9)=0 -> bin 10
    ]
    sf = _write(spark, tmp_path, rows)
    out = {r["bin"]: r for r in _q_embedding_cos_histogram(spark, sf).collect()}
    assert out[19]["n_pairs"] == 1
    assert out[0]["n_pairs"] == 1
    assert out[10]["n_pairs"] == 2
    assert out[10]["lo"] == 0.0 and out[0]["lo"] == -1.0
    assert sum(r["n_pairs"] for r in out.values()) == 4
