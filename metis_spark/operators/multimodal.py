"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for 100 TB training-data pipelines: media payloads are opaque
``binary`` columns with a typed metadata struct; decode / feature-extract
/ resize / frame-sample run as Arrow-batched pandas UDFs over
``mapInPandas`` so each task streams record batches without JVM copies.

The image/audio codec libraries are not in this container, so the DECODE
KERNEL is stubbed: ``_decode_stub`` derives deterministic per-payload
"pixel statistics" from the payload bytes (sha-seeded), and a real
deployment swaps ``_decode_stub``/``_resize_stub`` for PIL/ffmpeg calls
with the SAME signatures. Everything around the kernel — schema,
Arrow batch shape, partition spreading, output contracts — is real and
tested.

MEDIA_SCHEMA:
  media(media_id long, kind string, payload binary,
        meta struct<width int, height int, channels int,
                    sample_rate int, duration_ms int, format string>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_DDL = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, channels:int, "
    "sample_rate:int, duration_ms:int, format:string>"
)

DECODE_DDL = (
    "media_id long, kind string, ok boolean, n_bytes long, "
    "mean_value double, std_value double, digest string"
)

FEATURE_DIM = 16
FEATURES_DDL = f"media_id long, kind string, feature array<float>"

FRAMES_DDL = "media_id long, frame_index int, offset long, frame_digest string"


def synthesize_media(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic fake media table (payload bytes from a sha256 chain)."""
    if partitions is None:
        partitions = max(4, min(64, n // 256 or 4))

    kinds = ("image", "audio", "video")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid in b["id"]:
                mid = int(mid)
                kind = kinds[mid % 3]
                seed = hashlib.sha256(f"media:{mid}".encode()).digest()
                payload = (seed * (8 + mid % 17))[: 256 + (mid % 512)]
                meta = {
                    "width": 16 + mid % 64 if kind != "audio" else None,
                    "height": 16 + (mid * 7) % 64 if kind != "audio" else None,
                    "channels": 3 if kind == "image" else (2 if kind == "audio" else None),
                    "sample_rate": 16000 if kind == "audio" else None,
                    "duration_ms": 1000 + mid % 5000 if kind != "image" else None,
                    "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                }
                rows.append((mid, kind, bytearray(payload), meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, MEDIA_DDL)


def _decode_stub(payload: bytes) -> tuple[float, float]:
    """STUB decode kernel — replace with PIL/soundfile/ffmpeg in production.

    Deterministic: interprets payload bytes as the 'decoded samples'.
    """
    arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.float64)
    if len(arr) == 0:
        return 0.0, 0.0
    return float(arr.mean()), float(arr.std())


def decode_media(media: DataFrame) -> DataFrame:
    """payload → per-item decode stats (Arrow-batched, partition-parallel)."""
    spread = media.repartition(media.sparkSession.sparkContext.defaultParallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            stats = [_decode_stub(p) for p in b["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "ok": [p is not None for p in b["payload"]],
                    "n_bytes": [len(bytes(p)) for p in b["payload"]],
                    "mean_value": [s[0] for s in stats],
                    "std_value": [s[1] for s in stats],
                    "digest": [hashlib.sha256(bytes(p)).hexdigest() for p in b["payload"]],
                }
            )

    return spread.mapInPandas(run, DECODE_DDL)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """payload → fixed-dim float feature vector (hash-bucket byte histogram).

    The histogram featurizer is real (not a stub): it is the standard
    cheap content signature for binary dedup/clustering, and it exercises
    the exact Arrow shape a learned encoder would produce.
    """
    spread = media.repartition(media.sparkSession.sparkContext.defaultParallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = []
            for p in b["payload"]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
                norm = np.linalg.norm(hist)
                feats.append((hist / norm if norm > 0 else hist).tolist())
            yield pd.DataFrame(
                {"media_id": b["media_id"], "kind": b["kind"], "feature": feats}
            )

    return spread.mapInPandas(run, FEATURES_DDL)


def sample_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """video/audio → frame/window sample index rows (decode kernel stubbed:
    frame content digest is a slice hash; offsets/indices are real)."""
    vids = media.where(F.col("kind").isin("video", "audio"))
    spread = vids.repartition(vids.sparkSession.sparkContext.defaultParallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"media_id": [], "frame_index": [], "offset": [], "frame_digest": []}
            for mid, payload, meta in zip(b["media_id"], b["payload"], b["meta"]):
                duration = (meta or {}).get("duration_ms") or 0
                n_frames = max(1, duration // every_ms)
                raw = bytes(payload)
                for i in range(int(n_frames)):
                    off = (i * max(1, len(raw) // max(1, n_frames)))
                    sl = raw[off : off + 32]
                    out["media_id"].append(int(mid))
                    out["frame_index"].append(i)
                    out["offset"].append(off)
                    out["frame_digest"].append(hashlib.sha256(sl).hexdigest()[:16])
            yield pd.DataFrame(out)

    return spread.mapInPandas(run, FRAMES_DDL)
