"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-friendly
layout, Arrow-batched mapInPandas pipelines with bounded batch sizes.
Decoding: the two ubiquitous container formats have REAL pure-stdlib
decoders (``decode_png``: zlib inflate + scanline unfilter for 8-bit
gray/RGB/RGBA/palette; ``decode_wav``: the ``wave`` module for 8/16/32-bit
PCM), dispatched by magic bytes.  Exotic formats (JPEG, mp4, ...) would
need libraries not present in this container: they raise
NotImplementedError unless ``fake=True``, in which case a deterministic
fake decoder (seeded by the content hash) produces stable features so the
pipeline shape stays exercisable end-to-end for every modality.

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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter_avg(line: np.ndarray, prev: np.ndarray, ch: int) -> np.ndarray:
    """Average filter: out[i] = raw[i] + (out[i-ch] + prev[i]) >> 1.
    The left-neighbor dependency forces a sequential scan; a scalar byte
    loop measures ~10x FASTER than a numpy op per pixel column here
    (numpy call overhead >> 3-element vector math — scripts/png_bench.py
    records both), so the hot loop stays plain Python over bytearrays."""
    out = bytearray(line.tobytes())
    pv = prev.tolist()
    for i in range(len(out)):
        left = out[i - ch] if i >= ch else 0
        out[i] = (out[i] + ((left + pv[i]) >> 1)) & 0xFF
    return np.frombuffer(bytes(out), np.uint8)


def _unfilter_paeth(line: np.ndarray, prev: np.ndarray, ch: int) -> np.ndarray:
    """Paeth filter: sequential scan (left/upper-left dependencies); same
    measured result as _unfilter_avg — the scalar loop wins in pure
    Python, a real image pipeline needs a C decoder (absent here)."""
    out = bytearray(line.tobytes())
    pv = prev.tolist()
    for i in range(len(out)):
        a = out[i - ch] if i >= ch else 0
        c = pv[i - ch] if i >= ch else 0
        out[i] = (out[i] + _paeth(a, pv[i], c)) & 0xFF
    return np.frombuffer(bytes(out), np.uint8)


def decode_png(content: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode (zlib inflate + per-scanline unfilter) to an
    HxWx3 uint8 array.  Supports bit depth 8, color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced —
    the overwhelmingly common cases; anything else raises."""
    import struct

    if content[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat, ihdr, plte = 8, [], None, None
    while pos + 8 <= len(content):
        ln, typ = struct.unpack(">I4s", content[pos:pos + 8])
        pos += 8
        data = content[pos:pos + ln]
        pos += ln + 4  # payload + CRC
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace:
        raise NotImplementedError("only 8-bit non-interlaced PNG supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1)
        pos += stride + 1
        if ftype == 0:
            cur = line
        elif ftype == 1:
            # Sub is a per-channel prefix sum: out[i] = Σ raw mod 256.
            # cumsum in uint64 then cast = the whole row in C speed.
            cur = (
                np.cumsum(line.reshape(-1, channels), axis=0, dtype=np.uint64)
                .astype(np.uint8).reshape(-1)
            )
        elif ftype == 2:  # Up: uint8 add wraps mod 256, whole row at once
            cur = line + prev
        elif ftype == 3:
            cur = _unfilter_avg(line, prev, channels)
        elif ftype == 4:
            cur = _unfilter_paeth(line, prev, channels)
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur
        prev = out[y]
    img = out.reshape(h, w, channels)
    if color == 3:  # palette lookup
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        return pal[img[:, :, 0]]
    if channels == 1:
        return np.repeat(img, 3, axis=2)
    if channels == 2:  # gray+alpha -> replicate gray
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3]


def decode_wav(content: bytes) -> np.ndarray:
    """Stdlib `wave` decode of PCM WAV to a mono float32 waveform in
    [-1, 1] (multi-channel mean-pooled)."""
    import io
    import wave

    with wave.open(io.BytesIO(content)) as wv:
        ch = wv.getnchannels()
        sw = wv.getsampwidth()
        raw = wv.readframes(wv.getnframes())
    if sw == 2:
        arr = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        arr = (np.frombuffer(raw, "u1").astype(np.float32) - 128.0) / 128.0
    elif sw == 4:
        arr = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"{sw * 8}-bit WAV unsupported")
    if ch > 1:
        arr = arr.reshape(-1, ch).mean(axis=1)
    return arr


def decode_image(content: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image to an HxWx3 array.  PNG decodes for real (stdlib);
    other formats need libraries absent from this container — they use
    the deterministic fake when ``fake=True``, else raise."""
    if content[:8] == _PNG_MAGIC:
        return decode_png(content)
    if not fake:
        raise NotImplementedError(
            "non-PNG image decode requires an imaging library (PIL/cv2) — "
            "not available in this container; use fake=True for the "
            "deterministic test double"
        )
    rng = np.random.default_rng(zlib.crc32(content))
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def decode_audio(content: bytes, fake: bool = False) -> np.ndarray:
    """Decode audio to a 1-D float waveform.  RIFF/WAVE decodes for real
    (stdlib `wave`); other formats fall back like decode_image."""
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return decode_wav(content)
    if not fake:
        raise NotImplementedError(
            "non-WAV audio decode requires an audio library "
            "(soundfile/librosa) — use fake=True for the test double"
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


def decode_video(content: bytes, fake: bool = False) -> np.ndarray:
    """Decode video to an (n_frames, H, W, 3) array.  No AV library
    ships in this container, so the real branch always raises; the
    deterministic fake (seeded from the byte content, frame count from
    the length) exercises the real Spark plumbing — schema, batch shape,
    per-frame fan-out.  Swap in PyAV/ffmpeg on a real cluster."""
    if not fake:
        raise NotImplementedError(
            "video decode requires an AV library (PyAV/ffmpeg) — not "
            "available in this container; use fake=True for the "
            "deterministic test double")
    rng = np.random.default_rng(zlib.crc32(content))
    n_frames = 8 + len(content) % 8
    return rng.integers(0, 256, size=(n_frames, 8, 8, 3), dtype=np.uint8)


FRAME_SCHEMA = ("media_id long, frame_idx int, n_frames int, "
                "features array<double>")


def sample_frames(df: DataFrame, every_n: int = 4,
                  fake: bool = True) -> DataFrame:
    """Frame sampling: video binary column -> one output row per SAMPLED
    frame (every ``every_n``-th, always including frame 0) with per-frame
    features — the fan-out stage of a video training pipeline.

    mapInPandas so a batch of videos decodes inside one Arrow window and
    the fan-out (rows out > rows in) never materializes a whole
    partition of frames: each input batch yields one output frame of at
    most ``ceil(frames/every_n)`` rows per video.  Non-video rows are
    dropped (filter upstream to keep the scan narrow)."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, totals, feats = [], [], [], []
            for mid, modality, content in zip(
                    pdf["media_id"], pdf["modality"], pdf["content"]):
                if modality != "video":
                    continue
                frames = decode_video(bytes(content), fake=fake)
                n = frames.shape[0]
                for j in range(0, n, every_n):
                    ids.append(mid)
                    idxs.append(j)
                    totals.append(n)
                    feats.append(_extract_features(frames[j]))
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "n_frames": pd.Series(totals, dtype="int32"),
                # object dtype so an all-empty batch still carries a
                # list column Arrow can convert (not a float64 ndarray)
                "features": pd.Series(feats, dtype="object"),
            })

    return df.mapInPandas(proc, schema=FRAME_SCHEMA)
