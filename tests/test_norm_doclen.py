"""Pins for embedding_norm_profile and doc_length_powerlaw."""

from __future__ import annotations


def _write_emb(tmp_path, spark, rows):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return d


def test_norm_profile_unit_detection(spark, tmp_path):
    from metis_spark.driver.queries_similarity import _q_embedding_norm_profile

    rows = [
        (1, [1.0, 0.0], 0),        # nsq = 1_000_000 exactly: unit
        (2, [0.6, 0.8], 0),        # 0.6,0.8 quantize to 600,800 → unit
        (3, [2.0, 0.0], 0),        # nsq = 4_000_000: far from unit
    ]
    d = _write_emb(tmp_path, spark, rows)
    row = _q_embedding_norm_profile(spark, d).collect()[0]
    assert row["n_vectors"] == 3
    assert row["min_nsq"] == 1_000_000 and row["max_nsq"] == 4_000_000
    assert row["frac_unit_micro"] == (1_000_000 * 2) // 3
    assert row["mean_nsq_micro"] == (10**6 * 6_000_000) // 3
    assert row["cv2_micro"] > 0


def test_norm_profile_constant_zero_cv(spark, tmp_path):
    from metis_spark.driver.queries_similarity import _q_embedding_norm_profile

    d = _write_emb(
        tmp_path, spark, [(i, [1.0, 0.0], 0) for i in range(4)]
    )
    row = _q_embedding_norm_profile(spark, d).collect()[0]
    assert row["cv2_micro"] == 0
    assert row["frac_unit_micro"] == 1_000_000


def test_doc_length_powerlaw_runs(spark, tmp_path):
    from metis_spark.driver.queries_corpus import _q_doc_length_powerlaw

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (2 ** (i % 5 + 1))), "en", "s", 0) for i in range(20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "sf")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    row = _q_doc_length_powerlaw(spark, d).collect()[0]
    assert row["n_vertices"] == 20
    assert row["d_min"] == 2 and row["d_max"] == 32
    assert row["alpha_micro"] > 1_000_000
    assert row["entropy_micro"] > 0


def test_ivf_nprobe_curve_monotone(spark):
    """Recall must be non-decreasing in nprobe (more probed lists can
    only add candidates)."""
    import os

    from metis_spark.driver.queries_similarity import _q_ivf_nprobe_curve

    d = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    rows = sorted(_q_ivf_nprobe_curve(spark, d).collect(), key=lambda r: r["nprobe"])
    assert [r["nprobe"] for r in rows] == [1, 2, 4]
    recalls = [r["mean_recall_micro"] for r in rows]
    assert recalls == sorted(recalls)
    assert all(0 <= r <= 1_000_000 for r in recalls)
    assert all(r["sum_exact"] == rows[0]["sum_exact"] for r in rows)


def test_lsh_tables_curve_monotone(spark):
    """More hash tables ⇒ more candidate buckets ⇒ recall can only
    grow (union of bucket matches)."""
    import os

    from metis_spark.driver.queries_similarity import _q_lsh_tables_curve

    d = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    rows = sorted(_q_lsh_tables_curve(spark, d).collect(), key=lambda r: r["num_tables"])
    assert [r["num_tables"] for r in rows] == [2, 4, 16]
    recalls = [r["mean_recall_micro"] for r in rows]
    assert recalls == sorted(recalls)
    assert all(0 <= r <= 1_000_000 for r in recalls)
