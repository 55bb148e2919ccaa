"""Micro-bench: PNG scanline unfilter throughput, per-byte reference loop
vs the vectorized decoder (resin_spark.multimodal.decode_png).

Prints one JSON line with MB/s per filter type for both paths on a
512x512 RGB image.  The baseline here is the round-2 per-byte loop kept
inline as the comparison twin (and a correctness cross-check)."""

import json
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, "/root/repo")

from resin_spark import multimodal as mm  # noqa: E402
from tests.test_multimodal import encode_png  # noqa: E402


def decode_png_per_byte(content: bytes) -> np.ndarray:
    """Round-2 decoder core: per-byte Python unfilter (baseline)."""
    import struct

    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(content):
        ln, typ = struct.unpack(">I4s", content[pos:pos + 8])
        pos += 8
        data = content[pos:pos + ln]
        pos += ln + 4
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    w, h, _d, _c, _comp, _f, _i = ihdr
    channels = 3
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    out = np.empty((h, stride), np.uint8)
    prev = bytearray(stride)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += stride + 1
        if ftype == 1:
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + mm._paeth(a, prev[i], c)) & 0xFF
        out[y] = np.frombuffer(bytes(line), np.uint8)
        prev = line
    return out.reshape(h, w, channels)


def time_mbs(fn, content, pixels_mb, trials=3):
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        fn(content)
        best = min(best, time.perf_counter() - t0)
    return round(pixels_mb / best, 2)


def main():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(512, 512, 3), dtype=np.uint8)
    mb = img.nbytes / 1e6
    out = {"image": "512x512 RGB", "mb": round(mb, 3), "filters": {}}
    for ft in (0, 1, 2, 3, 4):
        content = encode_png(img, filter_type=ft)
        assert np.array_equal(mm.decode_png(content),
                              decode_png_per_byte(content))
        out["filters"][str(ft)] = {
            "baseline_mbs": time_mbs(decode_png_per_byte, content, mb),
            "vectorized_mbs": time_mbs(mm.decode_png, content, mb),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
