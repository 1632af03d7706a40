"""Measure stdlib baseline-JPEG decode throughput on pinned fixtures.

Usage:
    python tools/probe_jpeg_decode.py [git-rev]

Measures the working-tree ``functions/mediacodec.py`` decoder on three
deterministic fixtures (smooth gradient gray 64x64 / rgb 128x128 4:2:0 /
gray 256x256, all q85 — the shapes BASELINE.md's round-8 table uses).
With a git-rev argument it ALSO loads that revision's mediacodec module
and times the same fixtures there, printing the per-fixture speedup —
the honest before/after for entropy-decoder changes.

Each timing is the median of 5 one-second reps, warm.
"""

from __future__ import annotations

import importlib.util
import json
import statistics
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

from apache_spark_streaming_project_spark.functions import mediacodec as mc_new


def _fixtures(mc) -> list[tuple[str, bytes]]:
    """Deterministic, moderately-smooth content (pure gradients quantize
    to almost nothing; noise is unrealistically dense — a two-scale
    sinusoid sits between)."""

    def content(h, w):
        y, x = np.mgrid[0:h, 0:w]
        v = 128 + 90 * np.sin(x / 7.0) * np.cos(y / 11.0) + (x + y) % 9
        return np.clip(np.rint(v), 0, 255).astype(np.uint8)

    g64 = content(64, 64)
    g256 = content(256, 256)
    rgb = np.stack(
        [content(128, 128), content(128, 128).T, 255 - content(128, 128)],
        axis=-1,
    )
    return [
        ("gray 64x64 q85", mc.encode_jpeg(g64, quality=85)),
        (
            "rgb 128x128 4:2:0 q85",
            mc.encode_jpeg(rgb, quality=85, subsample="420"),
        ),
        ("gray 256x256 q85", mc.encode_jpeg(g256, quality=85)),
        (
            "gray 256x256 q85 progressive",
            mc.encode_jpeg_progressive(g256, quality=85),
        ),
    ]


def _time_decode(mc, payload: bytes) -> float:
    """Median seconds/decode over 5 reps of >=1s each, warm."""
    mc.decode_jpeg(payload)
    reps = []
    for _ in range(5):
        n, t0 = 0, time.perf_counter()
        while time.perf_counter() - t0 < 0.4:
            mc.decode_jpeg(payload)
            n += 1
        reps.append((time.perf_counter() - t0) / n)
    return statistics.median(reps)


def _load_rev(rev: str):
    src = subprocess.run(
        [
            "git",
            "show",
            f"{rev}:apache_spark_streaming_project_spark/functions/mediacodec.py",
        ],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    with tempfile.NamedTemporaryFile(
        "w", suffix="_mediacodec_old.py", delete=False
    ) as f:
        f.write(src)
        path = f.name
    spec = importlib.util.spec_from_file_location("mediacodec_old", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    old = _load_rev(sys.argv[1]) if len(sys.argv) > 1 else None
    rows = []
    for name, payload in _fixtures(mc_new):
        t_new = _time_decode(mc_new, payload)
        row = {
            "fixture": name,
            "bytes": len(payload),
            "img_per_s": round(1.0 / t_new, 1),
            "ms": round(t_new * 1000, 2),
        }
        if old is not None and "progressive" not in name:
            # older revisions may predate progressive support
            assert (
                old.decode_jpeg(payload) == mc_new.decode_jpeg(payload)
            ).all(), f"old/new decoders disagree on {name}"
            t_old = _time_decode(old, payload)
            row["old_img_per_s"] = round(1.0 / t_old, 1)
            row["speedup"] = round(t_old / t_new, 2)
        rows.append(row)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
