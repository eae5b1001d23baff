"""Multimodal (binary) column plumbing: images/audio/video as opaque BINARY
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are STUBS —
either a clearly-marked ``NotImplementedError`` (real-codec path) or a
deterministic fake (test path). Everything Spark-side is real and tested:
schemas, batch iteration, partition sizing, UDF signatures.

Scale design: media blobs dominate bytes, not rows — so (1) metadata-only
predicates must prune *before* any decode (keep metadata in top-level columns,
never inside the blob), (2) decode runs in ``mapInPandas`` so one Python
worker handles an Arrow batch at a time with bounded memory
(``maxRecordsPerBatch`` sized to blob size), and (3) outputs carry fixed-size
feature vectors, not re-encoded media, to keep the shuffle small.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, mime string, width int, height int, n_bytes long, "
    "feature array<float>"
)


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode path — requires an image codec library.

    STUB: the container ships no codecs; a production build plugs Pillow/
    turbojpeg here. The Spark plumbing around this function is real.
    """
    raise NotImplementedError("image codec not available in this environment")


def fake_image_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic fake feature extractor for tests: byte-histogram folded
    to ``dim`` buckets, L2-normalized. Stands in for a CNN embedding."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    counts = np.bincount(np.frombuffer(payload, dtype=np.uint8), minlength=256)
    folded = counts.reshape(dim, 256 // dim).sum(axis=1).astype(np.float32)
    norm = float(np.linalg.norm(folded))
    return folded / norm if norm > 0 else folded


def extract_image_features(media: DataFrame, use_fake: bool = True) -> DataFrame:
    """Per-blob feature extraction via ``mapInPandas`` (Arrow batches).

    Metadata-only columns pass through untouched; only the payload column is
    read inside Python. With ``use_fake=False`` raises at task level —
    documenting exactly where the real codec plugs in.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                (fake_image_features(p) if use_fake else decode_image(p))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms) —
    computed declaratively with ``sequence``/``explode`` so the expensive
    decode fan-out is an ordinary distributed transform. The decode itself is
    the stubbed kernel above."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


RESIZED_SCHEMA = "media_id long, mime string, width int, height int, payload binary"

AUDIO_FEATURES_SCHEMA = (
    "media_id long, mime string, duration_ms long, n_bytes long, "
    "n_windows int, feature array<float>"
)


def fake_resize(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Deterministic fake resize: fold/repeat the byte stream to exactly
    ``target_w*target_h`` bytes. Stands in for a real interpolating resize;
    preserves the binary-in → binary-out contract and output sizing."""
    size = target_w * target_h
    if payload is None or len(payload) == 0:
        return bytes(size)
    arr = np.frombuffer(payload, dtype=np.uint8)
    reps = -(-size // len(arr))  # ceil division
    return bytes(np.tile(arr, reps)[:size])


def resize_images(media: DataFrame, target_w: int, target_h: int, use_fake: bool = True) -> DataFrame:
    """Batch image resize via ``mapInPandas``: binary in → binary out with
    the metadata columns REWRITTEN to the target dimensions (metadata lives
    outside the blob, so downstream pruning still never decodes). The real
    path raises where a codec-backed resize plugs in; output payload size is
    exactly ``target_w*target_h`` per row either way, keeping the shuffle
    footprint predictable."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not use_fake:
                decode_image(None)  # raises NotImplementedError at task level
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "width": target_w,
                    "height": target_h,
                    "payload": [fake_resize(p, target_w, target_h) for p in pdf["payload"]],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(batches, schema=RESIZED_SCHEMA)


def fake_audio_features(payload: bytes, n_windows: int = 16) -> np.ndarray:
    """Deterministic fake audio features: window the byte stream into
    ``n_windows`` frames and emit per-frame mean energy (RMS-ish),
    normalized. Stands in for MFCC/mel features; fixed output width."""
    if payload is None or len(payload) == 0:
        return np.zeros(n_windows, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32) - 128.0
    pad = -len(arr) % n_windows
    if pad:
        arr = np.pad(arr, (0, pad))
    frames = arr.reshape(n_windows, -1)
    rms = np.sqrt((frames * frames).mean(axis=1))
    peak = float(rms.max())
    return (rms / peak if peak > 0 else rms).astype(np.float32)


def extract_audio_features(media: DataFrame, n_windows: int = 16, use_fake: bool = True) -> DataFrame:
    """Windowed audio feature extraction via ``mapInPandas`` — same
    metadata-prunes-before-decode and fixed-width-output contract as the
    image kernel."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not use_fake:
                decode_image(None)  # codec stub shared with the image path
            feats = [fake_audio_features(p, n_windows) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "duration_ms": pdf["duration_ms"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "n_windows": n_windows,
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA
    )


def synthesize_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed + i)
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.integers(0, 256, size=128 + (i % 5) * 64, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 32,
                48 + i % 32,
                1000 * (i % 10) if kind == "video" else None,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
