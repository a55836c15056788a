"""Multimodal binary columns: REAL decode round-trip + batch shape.

synthesize_media emits valid PNG/WAV/MP4 bytes; decode_media parses them
back with stdlib codecs (zlib inflate, struct chunk walks). These tests
pin the round-trip against the closed-form synthesis recipe, the Arrow
binary+struct plumbing, and payload-digest integrity vs JVM sha2.
"""

import struct
import zlib

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
    assert by_kind["audio"]["meta"]["sample_rate"] in (8000, 16000, 24000, 32000)
    assert by_kind["image"]["meta"]["sample_rate"] is None


def test_payloads_are_real_formats(spark):
    """Payload bytes parse with INDEPENDENT stdlib logic (not our decoder)."""
    rows = synthesize_media(spark, 30).collect()
    for r in rows:
        p = bytes(r["payload"])
        if r["kind"] == "image":
            assert p[:8] == b"\x89PNG\r\n\x1a\n"
            w, h = struct.unpack_from(">II", p, 16)  # IHDR data at fixed offset
            assert (w, h) == (r["meta"]["width"], r["meta"]["height"])
            idat_len = struct.unpack_from(">I", p, 33)[0]
            raw = zlib.decompress(p[41 : 41 + idat_len])
            assert len(raw) == h * (3 * w + 1)
        elif r["kind"] == "audio":
            assert p[:4] == b"RIFF" and p[8:12] == b"WAVE" and p[12:16] == b"fmt "
            ch, rate = struct.unpack_from("<HI", p, 22)
            assert ch == r["meta"]["channels"] and rate == r["meta"]["sample_rate"]
        else:
            assert p[4:8] == b"ftyp" and p[8:12] == b"isom"


def test_decode_matches_synthesis_recipe(spark):
    """Full round-trip: decoded stats equal the closed-form ground truth."""
    dec = {r["media_id"]: r for r in decode_media(synthesize_media(spark, 60)).collect()}
    assert len(dec) == 60 and all(r["ok"] for r in dec.values())
    for mid, r in dec.items():
        if mid % 3 == 0:
            w, h = 8 + mid % 24, 8 + (7 * mid) % 24
            n = w * h * 3
            assert (r["format"], r["width"], r["height"], r["bit_depth"]) == ("png", w, h, 8)
            assert r["pixel_sum"] == sum((mid + i) % 256 for i in range(n))
            assert r["n_bytes"] == 68 + h * (3 * w + 1)
        elif mid % 3 == 1:
            ch, rate, frames = 1 + mid % 2, 8000 * (1 + mid % 4), 50 + mid % 200
            assert (r["format"], r["channels"], r["sample_rate"]) == ("wav", ch, rate)
            assert r["n_samples"] == frames * ch
            assert r["sample_sum"] == sum(
                (31 * mid + 17 * i) % 4096 - 2048 for i in range(frames * ch)
            )
            assert r["duration_ms"] == frames * 1000 // rate
        else:
            assert r["format"] == "mp4"
            assert r["duration_ms"] == 1000 + (13 * mid) % 5000
            assert r["n_bytes"] == 208 + mid % 256


def test_decode_rejects_corrupt_payloads(spark):
    """Bit-flipped payloads fail CRC/magic validation → ok=false, stats null."""
    import pandas as pd

    media = synthesize_media(spark, 12)

    def corrupt(batches):
        for b in batches:
            b = b.copy()
            b["payload"] = [
                bytearray(bytes(p)[:20] + bytes([bytes(p)[20] ^ 0xFF]) + bytes(p)[21:])
                for p in b["payload"]
            ]
            yield b

    bad = media.mapInPandas(corrupt, media.schema)
    rows = decode_media(bad).collect()
    assert len(rows) == 12
    for r in rows:
        if r["kind"] == "image":  # byte 20 hits the IHDR data → CRC must fail
            assert not r["ok"] and r["width"] is None


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
