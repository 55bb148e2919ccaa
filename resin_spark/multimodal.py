"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-friendly
layout, Arrow-batched mapInPandas pipelines with bounded batch sizes —
while the actual media decoding is stubbed (the image/audio libraries are
not in this container): ``decode_image``/``decode_audio`` raise
NotImplementedError unless ``fake=True``, in which case a deterministic
fake decoder (seeded by the content hash) produces stable features so the
pipeline shape is exercisable end-to-end.

Scale notes: media bytes ride in a ``binary`` column next to metadata;
at 100 TB you partition by (modality, dt) and keep row-group sizes small
enough that a batch of decoded frames fits executor memory —
``spark.sql.files.maxPartitionBytes`` and the mapInPandas batch iterator
bound peak memory per task (one Arrow batch at a time, never the whole
partition).
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), False),
        StructField("content", BinaryType(), False),
        StructField("width", IntegerType(), True),     # image/video
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),  # audio/video
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_sha", StringType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)


def decode_image(content: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image to an HxWx3 array.  STUB: real decode needs an
    imaging library not present in this environment."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library (PIL/cv2) — "
            "not available in this container; use fake=True for the "
            "deterministic test double"
        )
    rng = np.random.default_rng(zlib.crc32(content))
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def decode_audio(content: bytes, fake: bool = False) -> np.ndarray:
    """Decode audio to a 1-D float waveform.  STUB (see decode_image)."""
    if not fake:
        raise NotImplementedError(
            "audio decode requires an audio library (soundfile/librosa) — "
            "use fake=True for the deterministic test double"
        )
    rng = np.random.default_rng(zlib.crc32(content))
    return rng.standard_normal(64).astype(np.float32)


def _extract_features(arr: np.ndarray, dim: int = 8) -> list[float]:
    """Feature stub: per-slice means — deterministic, shape-stable."""
    flat = arr.astype(np.float64).ravel()
    chunks = np.array_split(flat, dim)
    return [float(np.float32(c.mean())) for c in chunks]


def media_features(df: DataFrame, fake: bool = True,
                   batch_hint: int = 256) -> DataFrame:
    """mapInPandas pipeline: binary content -> decoded -> features.

    Arrow streams bounded batches into Python; each batch yields one
    output frame, so peak memory per task is one batch of media, not one
    partition.  The decoder is per-modality; unknown modalities pass
    through with empty features (no task failure on dirty data)."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["content"].map(len).astype("int64"),
                "content_sha": pdf["content"].map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()
                ),
            }
            feats = []
            for modality, content in zip(pdf["modality"], pdf["content"]):
                b = bytes(content)
                if modality == "image":
                    feats.append(_extract_features(decode_image(b, fake=fake)))
                elif modality == "audio":
                    feats.append(_extract_features(decode_audio(b, fake=fake)))
                elif modality == "video":
                    # frame-sample stub: decode as J fake frames, mean-pool
                    frames = [decode_image(b + bytes([j]), fake=fake)
                              for j in range(4)]
                    feats.append(_extract_features(np.stack(frames)))
                else:
                    feats.append([])
            out["features"] = feats
            yield pd.DataFrame(out)

    return df.mapInPandas(proc, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int,
                  fake: bool = True) -> DataFrame:
    """Resize stub with real plumbing: content -> decoded -> 'resized'
    bytes (fake: sha-stamped).  Keeps the MEDIA_SCHEMA shape."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = []
            for content in pdf["content"]:
                arr = decode_image(bytes(content), fake=fake)
                # real impl: cv2.resize(arr, (width, height)).tobytes()
                res.append(arr.tobytes()[: width * height * 3])
            pdf = pdf.copy()
            pdf["content"] = res
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return df.mapInPandas(proc, schema=MEDIA_SCHEMA)


def synthetic_media(spark, n: int = 32) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        content = (f"media{i:06d}".encode() * 32)[: 64 + i]
        rows.append(
            (
                i,
                modality,
                {"image": "image/png", "audio": "audio/wav",
                 "video": "video/mp4"}[modality],
                bytearray(content),
                8 if modality != "audio" else None,
                8 if modality != "audio" else None,
                1000 + i if modality != "image" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
