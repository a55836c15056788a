"""Multimodal binary-column plumbing: schema, determinism, batch shape.

The decode kernel is a documented stub (codec libs absent in this
container); these tests pin the REAL parts — Arrow round-trip of binary
+ struct columns, partition-parallel mapInPandas, deterministic output.
"""

from pyspark.sql import functions as F

from metis_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    sample_frames,
    synthesize_media,
)


def test_media_schema_and_determinism(spark):
    m1 = synthesize_media(spark, 90).orderBy("media_id").collect()
    m2 = synthesize_media(spark, 90).orderBy("media_id").collect()
    assert m1 == m2
    kinds = {r["kind"] for r in m1}
    assert kinds == {"image", "audio", "video"}
    for r in m1[:10]:
        assert isinstance(r["payload"], (bytes, bytearray)) and len(r["payload"]) > 0
        assert r["meta"]["format"] in ("png", "wav", "mp4")
    # audio has sample_rate, images don't
    by_kind = {r["kind"]: r for r in m1}
    assert by_kind["audio"]["meta"]["sample_rate"] == 16000
    assert by_kind["image"]["meta"]["sample_rate"] is None


def test_decode_stats_consistent_with_payload(spark):
    media = synthesize_media(spark, 60)
    dec = decode_media(media)
    rows = dec.collect()
    assert len(rows) == 60
    assert all(r["ok"] for r in rows)
    # digest matches a JVM-side recomputation (sha256 over the same bytes)
    jvm = media.select("media_id", F.sha2("payload", 256).alias("jvm_digest"))
    joined = dec.join(jvm, "media_id").where(F.col("digest") != F.col("jvm_digest"))
    assert joined.count() == 0


def test_features_fixed_dim_and_normalized(spark):
    feats = extract_features(synthesize_media(spark, 60)).collect()
    assert len(feats) == 60
    for r in feats:
        assert len(r["feature"]) == FEATURE_DIM
        norm = sum(x * x for x in r["feature"]) ** 0.5
        assert abs(norm - 1.0) < 1e-5


def test_frame_sampling_counts(spark):
    media = synthesize_media(spark, 60)
    frames = sample_frames(media, every_ms=500)
    got = frames.groupBy("media_id").count().collect()
    meta = {r["media_id"]: r for r in media.where(F.col("kind") != "image").collect()}
    assert {r["media_id"] for r in got} == set(meta)
    for r in got:
        expected = max(1, meta[r["media_id"]]["meta"]["duration_ms"] // 500)
        assert r["count"] == expected
