"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (prompt §'beyond the reference').

The Spark side — schemas, partition-friendly batch iteration,
mapInPandas signatures, Arrow batch shapes — is real and tested.  The
codec calls themselves are STUBBED: the container has no PIL/ffmpeg,
so `decode_mode="fake"` (default) produces deterministic features from
the raw bytes, and `decode_mode="real"` raises NotImplementedError at
the exact line where PIL/soundfile/ffmpeg would be invoked.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

IMAGE_FEATURES_SCHEMA = "media_id long, kind string, n_bytes int, features array<float>"
FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_hash long"


def _byte_histogram(payload: bytes, bins: int = 32) -> np.ndarray:
    """Deterministic fake 'decode': normalized byte-value histogram.
    A real implementation decodes pixels/samples here (PIL.Image.open /
    soundfile.read) and computes the same-shaped feature vector."""
    if not payload:
        return np.zeros(bins, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=bins, range=(0, 256))
    return (hist / arr.size).astype(np.float32)


def extract_features(
    df: DataFrame, decode_mode: str = "fake", bins: int = 32
) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out.

    Column pruning note: only (media_id, kind, payload) are read —
    select BEFORE mapInPandas so the parquet scan prunes `meta`."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "real":
                raise NotImplementedError(
                    "real codecs unavailable in this container: would call "
                    "PIL.Image.open(io.BytesIO(payload)) here"
                )
            feats = [
                _byte_histogram(p or b"", bins).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        op, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_frames(
    df: DataFrame, n_frames: int = 4, decode_mode: str = "fake"
) -> DataFrame:
    """Video frame-sampling plumbing: payload -> n_frames rows (a
    flatMap shape).  Fake decode hashes equal-sized byte chunks; a real
    implementation seeks ffmpeg to n evenly-spaced timestamps."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_mode == "real":
                raise NotImplementedError(
                    "real codecs unavailable: would invoke ffmpeg seek here"
                )
            ids, idxs, hashes = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = p or b""
                step = max(1, len(p) // n_frames)
                for i in range(n_frames):
                    chunk = p[i * step : (i + 1) * step]
                    ids.append(mid)
                    idxs.append(i)
                    hashes.append(
                        int.from_bytes(
                            (chunk[:8] or b"\0").ljust(8, b"\0"), "little", signed=True
                        )
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_hash": hashes}
            )

    return df.select("media_id", "payload").mapInPandas(op, schema=FRAME_SAMPLE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payload through a mapInPandas stage that
    records the target size in meta; real impl resamples pixels."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )


def media_fixture(spark, n: int = 100, seed: int = 42) -> DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, int(rng.integers(64, 2048))).astype(np.uint8))
        rows.append(
            (
                i,
                kind,
                payload,
                (64 * (i % 4 + 1), 48 * (i % 4 + 1), 16000, int(rng.integers(1000, 60000))),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
