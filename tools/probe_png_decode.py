"""Timing probe for the stdlib PNG decode kernel (operators/multimodal.py
_decode_png_stdlib): decode wall time on a >=1 MP RGB PNG whose rows cycle
through all five PNG filters (the realistic shape — encoders mix filters
per row). Run before/after the round-6 numpy vectorization to record the
speedup in BASELINE.md.

Usage: python tools/probe_png_decode.py [side_px] [n_decodes]
"""

from __future__ import annotations

import struct
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, ".")

from apache_spark_streaming_project_spark.operators import multimodal as mm


def synth_png(side: int, seed: int = 7) -> bytes:
    """RGB PNG of side x side random pixels, rows cycling filters 0..4.
    Forward filtering reads only ORIGINAL neighbor pixels, so it
    vectorizes row-wise — only the decoder has sequential recurrences."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(side, side * 3), dtype=np.uint8)
    ch = 3
    raw = bytearray()
    prev = np.zeros(side * ch, dtype=np.int16)
    for y in range(side):
        line = img[y].astype(np.int16)
        a = np.concatenate([np.zeros(ch, np.int16), line[:-ch]])
        b = prev
        c = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
        f = y % 5
        if f == 0:
            stored = line
        elif f == 1:
            stored = line - a
        elif f == 2:
            stored = line - b
        elif f == 3:
            stored = line - ((a + b) >> 1)
        else:
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
            stored = line - pred
        raw.append(f)
        raw += (stored & 0xFF).astype(np.uint8).tobytes()
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body)
        )

    ihdr = struct.pack(">IIBBBBB", side, side, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def main() -> None:
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    png = synth_png(side)
    print(f"PNG: {side}x{side} RGB ({side * side / 1e6:.2f} MP), "
          f"{len(png)} bytes, filters cycling 0-4")
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        pixels = mm._decode_png_stdlib(png)
        times.append(time.perf_counter() - t0)
    assert len(pixels) == side * side
    med = sorted(times)[len(times) // 2]
    print(f"decode: median {med:.3f}s over {n} runs "
          f"({side * side / med / 1e6:.1f} MP/s); checksum {sum(pixels) % 65521}")


if __name__ == "__main__":
    main()
