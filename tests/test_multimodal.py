"""Multimodal plumbing: schema, batch shape, deterministic fake decode,
REAL stdlib PNG/WAV decode, and the NotImplementedError gate on exotic
formats."""

import struct
import zlib

import numpy as np
import pytest

from resin_spark import multimodal as mm


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal RGB8 PNG encoder for round-trip tests (filters 0-4)."""
    h, w, _ = arr.shape
    raw = bytearray()
    prev = np.zeros(w * 3, np.int16)
    for y in range(h):
        line = arr[y].reshape(-1).astype(np.int16)
        raw.append(filter_type)
        left = np.concatenate([np.zeros(3, np.int16), line[:-3]])
        upleft = np.concatenate([np.zeros(3, np.int16), prev[:-3]])
        if filter_type == 0:
            enc = line
        elif filter_type == 1:  # Sub
            enc = (line - left) % 256
        elif filter_type == 2:  # Up
            enc = (line - prev) % 256
        elif filter_type == 3:  # Average
            enc = (line - ((left + prev) >> 1)) % 256
        else:  # Paeth — scalar reference predictor (mm._paeth)
            pred = np.array(
                [mm._paeth(int(a), int(b), int(c))
                 for a, b, c in zip(left, prev, upleft)], np.int16)
            enc = (line - pred) % 256
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (mm._PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes((samples * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def test_png_roundtrip_all_filters():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    for ft in (0, 1, 2, 3, 4):
        got = mm.decode_png(encode_png(img, filter_type=ft))
        assert np.array_equal(got, img), f"filter {ft}"
    # and through the public dispatch with fake=False
    assert np.array_equal(mm.decode_image(encode_png(img), fake=False), img)


def test_png_unfilter_matches_per_byte_reference():
    """The vectorized unfilter must agree byte-for-byte with a per-byte
    reference loop (the PNG spec's recurrences, written independently of
    the decoder) on wider images where cumsum/wraparound bugs would
    show."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(16, 37, 3), dtype=np.uint8)
    for ft in (1, 2, 3, 4):
        content = encode_png(img, filter_type=ft)
        got = mm.decode_png(content)
        assert np.array_equal(got, img), f"filter {ft}"
        # per-byte spec reference on the raw inflate stream
        idat = content.split(b"IDAT")[1]
        ln = struct.unpack(">I", content[content.index(b"IDAT") - 4:
                                         content.index(b"IDAT")])[0]
        raw = zlib.decompress(idat[:ln])
        stride, ch = 37 * 3, 3
        prev = bytearray(stride)
        pos = 0
        for y in range(16):
            ftype = raw[pos]
            line = bytearray(raw[pos + 1:pos + 1 + stride])
            pos += stride + 1
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                if ftype == 1:
                    line[i] = (line[i] + a) & 0xFF
                elif ftype == 2:
                    line[i] = (line[i] + prev[i]) & 0xFF
                elif ftype == 3:
                    line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
                elif ftype == 4:
                    line[i] = (line[i] + mm._paeth(a, prev[i], c)) & 0xFF
            assert bytes(line) == got[y].reshape(-1).tobytes(), (ft, y)
            prev = line


def test_wav_roundtrip():
    t = np.linspace(0, 1, 800, dtype=np.float32)
    wave_f = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    got = mm.decode_audio(encode_wav(wave_f), fake=False)
    assert got.shape == wave_f.shape
    assert np.allclose(got, wave_f, atol=1e-3)


def test_real_media_through_pipeline(spark):
    """media_features with fake=False over REAL PNG + WAV bytes."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    snd = (0.3 * np.sin(np.linspace(0, 20, 500))).astype(np.float32)
    rows = [
        (0, "image", "image/png", bytearray(encode_png(img)), 6, 6, None),
        (1, "audio", "audio/wav", bytearray(encode_wav(snd)), None, None, 62),
    ]
    df = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mm.media_features(df, fake=False).collect()}
    assert len(out[0]["features"]) == 8 and len(out[1]["features"]) == 8
    want_img = mm._extract_features(img)
    assert out[0]["features"] == pytest.approx(want_img)


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media(spark, n=18)


def test_features_pipeline(spark, media):
    out = mm.media_features(media, fake=True)
    rows = out.collect()
    assert len(rows) == 18
    by_id = {r["media_id"]: r for r in rows}
    for i, r in by_id.items():
        assert r["n_bytes"] == 64 + i
        assert len(r["content_sha"]) == 64
        assert len(r["features"]) == 8
    # deterministic: same content => same features
    rows2 = mm.media_features(media, fake=True).collect()
    assert {r["media_id"]: r["features"] for r in rows2} == {
        r["media_id"]: r["features"] for r in rows
    }


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"xx", fake=False)
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"xx", fake=False)


def test_resize_plumbing(spark, media):
    from pyspark.sql import functions as F

    imgs = media.filter(F.col("modality") == "image")
    out = mm.resize_images(imgs, 4, 4, fake=True).collect()
    assert out and all(r["width"] == 4 and r["height"] == 4 for r in out)
    assert all(len(bytes(r["content"])) == 4 * 4 * 3 for r in out)


def test_unknown_modality_passthrough(spark):
    df = spark.createDataFrame(
        [(99, "hologram", "x/y", bytearray(b"zz"), None, None, None)],
        schema=mm.MEDIA_SCHEMA,
    )
    rows = mm.media_features(df, fake=True).collect()
    assert rows[0]["features"] == []


def test_sample_frames_fanout(spark):
    """Frame sampling fans one video row out to ceil(n_frames/every_n)
    frame rows, deterministically (fake decoder seeded from content)."""
    from resin_spark.multimodal import (decode_video, sample_frames,
                                        synthetic_media)

    media = synthetic_media(spark, n=12)
    out = sample_frames(media, every_n=4).collect()
    vids = [(r["media_id"], bytes(r["content"]))
            for r in media.filter("modality = 'video'").collect()]
    assert len(vids) == 4
    want_rows = 0
    by_id = {}
    for mid, content in vids:
        n = decode_video(content, fake=True).shape[0]
        want_rows += len(range(0, n, 4))
        by_id[mid] = n
    assert len(out) == want_rows
    for r in out:
        assert r["n_frames"] == by_id[r["media_id"]]
        assert r["frame_idx"] % 4 == 0
        assert len(r["features"]) == 8
    # deterministic across runs
    again = sample_frames(synthetic_media(spark, n=12), every_n=4).collect()
    key = lambda r: (r["media_id"], r["frame_idx"])
    assert sorted(map(key, again)) == sorted(map(key, out))
    a0 = {key(r): r["features"] for r in again}
    for r in out:
        assert a0[key(r)] == r["features"]
    # real branch refuses without fake
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        decode_video(b"notavideo", fake=False)
