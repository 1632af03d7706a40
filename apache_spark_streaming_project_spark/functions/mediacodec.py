"""Pure stdlib+numpy media codecs for the X5 real-decode paths.

The engine's multimodal operators (operators/multimodal.py) decode real
media inside Arrow ``mapInPandas`` kernels. PIL / PyAV are optional and
absent from many deployments, so this module supplies dependency-free
codecs for the dominant interchange shapes:

- :func:`decode_jpeg` — BASELINE (SOF0/SOF1) and PROGRESSIVE (SOF2)
  JPEG: Huffman, 8-bit, grayscale or YCbCr with integer-ratio
  subsampling, restart markers, spectral selection + successive
  approximation scan scripts. Entropy decoding is table-driven scalar
  Python (a 16-bit LUT probe per symbol — Huffman is bit-serial by
  nature); everything after it — dequantize, IDCT, plane assembly,
  upsampling, color conversion — is whole-image vectorized numpy.
  Arithmetic coding, lossless, 12-bit and CMYK raise
  ``NotImplementedError`` (PIL remains the path for those).
- :func:`encode_jpeg` / :func:`encode_jpeg_progressive` — minimal
  baseline and progressive encoders (Annex K quantization, IJG quality
  scaling, 4:4:4 or 4:2:0, optional restart intervals; the progressive
  one runs libjpeg's default-shaped scan script). They emit IDENTICAL
  quantized coefficients — the differential pin the progressive decoder
  tests rely on. Exist so JPEG fixtures can be BUILT and
  round-trip-tested in environments without PIL; both write standard
  files any JPEG decoder reads.
- :func:`encode_png` — 8-bit gray/RGB non-interlaced PNG writer (filter
  0 scanlines), the exact shape ``_decode_png_stdlib`` reads back, so
  frame-sampling output is verifiable in a closed loop.
- :func:`encode_avi_mjpeg` / :func:`decode_avi_mjpeg` — the RIFF walk
  for Motion-JPEG AVI, the simplest real video container: per-frame
  JPEG payloads plus a rational frame rate. This is what lets
  ``sample_video_frames(fake_decode=False)`` run on real video bytes
  without PyAV.
- :func:`decode_gif` / :func:`decode_gif_frames` / :func:`encode_gif` —
  GIF87a/89a with LZW, global/local palettes, interlace, transparency,
  and animation with disposal methods 0-3; animated GIFs feed the same
  frame-sampling boundary kernel as AVI video.

Everything here is public-format work from the published specs
(ITU-T T.81 Annex K for the JPEG tables, the PNG and RIFF/AVI format
documents). The reference system (tharushav/Apache_spark_streaming_project)
has no media handling at all — this backs the engine's multimodal
extension surface (SURVEY.md §2 X5).

Determinism note: both codecs are pure functions of their inputs (no
RNG, no time), so fixtures built from them are stable across runs and
hosts; the IDCT/color math uses float64 with a single final rounding,
identical everywhere numpy runs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# Shared JPEG constants (ITU-T T.81 / Annex K)
# ---------------------------------------------------------------------------

# zigzag scan: ZIGZAG[k] = natural (row-major) index of the k-th coefficient
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K base quantization tables (natural order, row-major)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K typical Huffman tables: (bits[1..16], symbol list)
_HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _check_huff(bits: list[int], vals: list[int]) -> tuple[list[int], list[int]]:
    """Structural validation of a Huffman spec: 16 length counts whose sum
    equals the symbol count and fits a prefix code. Raised eagerly (not
    ``assert``) so ``python -O`` can't skip it."""
    if len(bits) != 16:
        raise ValueError(f"Huffman spec needs 16 length counts, got {len(bits)}")
    if sum(bits) != len(vals):
        raise ValueError(
            f"Huffman spec inconsistent: counts sum {sum(bits)} != "
            f"{len(vals)} symbols"
        )
    # Kraft check: the canonical assignment below must never overflow a
    # length's code space.
    code, total = 0, 0
    for ln, n in enumerate(bits, start=1):
        total += n
        if n and (code + n) > (1 << ln):
            raise ValueError(f"Huffman spec overflows {ln}-bit code space")
        code = (code + n) << 1
    return bits, vals


for _spec in (_HT_DC_LUMA, _HT_DC_CHROMA, _HT_AC_LUMA, _HT_AC_CHROMA):
    _check_huff(*_spec)


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman: {(length, code) -> symbol}."""
    _check_huff(bits, vals)
    table, code, k = {}, 0, 0
    for ln, n in enumerate(bits, start=1):
        for _ in range(n):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman: {symbol -> (code, length)}."""
    dec = _huff_decode_table(bits, vals)
    return {sym: (code, ln) for (ln, code), sym in dec.items()}


def _idct_basis() -> np.ndarray:
    """The orthonormal 8x8 DCT-II basis M with M[x, u] =
    c(u)/2 * cos((2x+1)u*pi/16): pixels = M @ F @ M.T, F = M.T @ px @ M."""
    x = np.arange(8).reshape(8, 1)
    u = np.arange(8).reshape(1, 8)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    m[:, 0] *= 1.0 / np.sqrt(2.0)
    return m


_DCT_M = _idct_basis()


def quality_scaled_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: quality 1..100 maps the Annex K base table
    through scale = 5000/q (q < 50) else 200 - 2q, clamped to [1, 255].
    quality=100 yields an all-ones table (lossless-after-DCT-rounding —
    what the flat-image exactness tests rely on)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100] (got {quality})")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    tbl = (base * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def pad_to_byte(self) -> None:
        """Fill the partial byte with 1-bits (T.81 F.1.2.3)."""
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)


class _EntropyEnd(ValueError):
    """Raised when the bit reader hits a non-restart marker mid-read.
    Subclasses ``ValueError`` so a truncated entropy stream surfaces
    under the module's documented malformed-input contract
    (ValueError / NotImplementedError) instead of a bare Exception."""


def _huff_decode_lut(bits: list[int], vals: list[int]) -> list[int]:
    """Flat 16-bit lookup table for one-probe Huffman decode:
    ``lut[peek16] = (symbol << 5) | code_length`` for every 16-bit window
    whose prefix is a valid code, 0 for invalid prefixes. Replaces the
    bit-serial walk (up to 16 dict probes per symbol) with a single list
    index — the standard table-driven decoder.

    Memoized on the table spec: building the 64k-entry table costs more
    than decoding a small image, and bulk decode (mapInPandas over many
    JPEGs) re-sees the same handful of tables — almost always Annex K —
    on every payload."""
    return _huff_decode_lut_cached(tuple(bits), tuple(vals))


def _huff_decode_lut_cached(bits_t, vals_t):
    lut = _LUT_CACHE.get((bits_t, vals_t))
    if lut is None:
        lut = _build_huff_lut(list(bits_t), list(vals_t))
        if len(_LUT_CACHE) >= 64:  # bound worker-lifetime memory
            _LUT_CACHE.clear()
        _LUT_CACHE[(bits_t, vals_t)] = lut
    return lut


_LUT_CACHE: dict = {}


def _build_huff_lut(bits: list[int], vals: list[int]) -> list[int]:
    _check_huff(bits, vals)
    lut = np.zeros(1 << 16, dtype=np.uint32)
    code, k = 0, 0
    for ln, n in enumerate(bits, start=1):
        span = 1 << (16 - ln)
        for _ in range(n):
            start = code << (16 - ln)
            lut[start : start + span] = (vals[k] << 5) | ln
            code += 1
            k += 1
        code <<= 1
    return lut.tolist()  # Python-int list indexing beats numpy scalars here


def _entropy_intervals(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Un-stuffed entropy-coded intervals starting at ``pos``: one pass
    that removes 0xFF 0x00 byte stuffing, splits at RSTn restart markers,
    and stops at the first other marker (or EOF). The split lets the MCU
    loop swap readers at restart boundaries instead of checking for
    markers on every byte load. Returns ``(intervals, end)`` where end is
    the offset of the terminating marker's 0xFF (or ``len(data)``), so
    the marker walk can resume there — progressive JPEGs have one
    entropy segment per scan."""
    intervals: list[bytes] = []
    cur = bytearray()
    n = len(data)
    end = n
    while True:
        j = data.find(b"\xff", pos)
        if j < 0:
            cur += data[pos:]
            break
        cur += data[pos:j]
        nxt = data[j + 1] if j + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)  # stuffed data byte
            pos = j + 2
        elif 0xD0 <= nxt <= 0xD7:
            intervals.append(bytes(cur))
            cur = bytearray()
            pos = j + 2
        else:
            end = j  # real marker: end of scan
            break
    intervals.append(bytes(cur))
    return intervals, end


# ---------------------------------------------------------------------------
# JPEG decoder (baseline)
# ---------------------------------------------------------------------------

def _decode_entropy_scan(
    intervals: list[bytes],
    comps: list[dict],
    huff_dc: dict[int, list[int]],
    huff_ac: dict[int, list[int]],
    restart_interval: int,
    mcux: int,
    mcuy: int,
) -> None:
    """The interleaved-scan entropy decode: fills each component's
    ``coef`` array in place. Huffman decode is inherently bit-serial, so
    this is the honest scalar hot loop — the bit accumulator lives in
    LOCAL variables (acc/nbits/pos) rather than a reader object because
    per-symbol method dispatch was the measured bottleneck (~2x of total
    decode time); together with the 16-bit LUT probe this runs ~4x the
    original bit-serial dict walk. Lookahead past an interval's end reads
    virtual zero padding; ``consumed > real_bits`` detects a truncated
    stream exactly (T.81's legitimate 1-bit padding lives inside the real
    bytes and never trips it)."""
    # per-component decode state, unpacked from the dicts once
    plan = [
        (huff_dc[c["dc_t"]], huff_ac[c["ac_t"]], c["coef"], c["v"], c["h"])
        for c in comps
    ]
    preds = [0] * len(comps)
    interval_i = 0
    data = intervals[0]
    nlen = len(data)
    pos = acc = nbits = consumed = 0
    mcu_count = 0
    zz = ZIGZAG
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if consumed > 8 * nlen:
                    raise _EntropyEnd("entropy data truncated")
                interval_i += 1
                if interval_i >= len(intervals):
                    raise ValueError("expected restart marker, got end of scan")
                data = intervals[interval_i]
                nlen = len(data)
                pos = acc = nbits = consumed = 0
                preds = [0] * len(comps)
            for ci, (dct, act, coef, cv, chh) in enumerate(plan):
                for by in range(cv):
                    for bx in range(chh):
                        # --- DC: one LUT probe + magnitude bits ---
                        while nbits < 16:
                            acc = (acc << 8) | (data[pos] if pos < nlen else 0)
                            pos += 1
                            nbits += 8
                        e = dct[(acc >> (nbits - 16)) & 0xFFFF]
                        if e == 0:
                            raise ValueError(
                                "invalid Huffman code in entropy data"
                            )
                        s = e >> 5
                        if s > 15:
                            # a corrupt DHT can declare any 8-bit symbol;
                            # a DC size past 15 would read 2^s magnitudes
                            # into the int64 coefficient array
                            raise ValueError(
                                f"invalid DC size symbol {s} in entropy data"
                            )
                        nbits -= (e & 31) + s
                        if nbits < 0:
                            while nbits < 0:
                                acc = (acc << 8) | (
                                    data[pos] if pos < nlen else 0
                                )
                                pos += 1
                                nbits += 8
                        consumed += (e & 31) + s
                        if s:
                            v = (acc >> nbits) & ((1 << s) - 1)
                            if v < (1 << (s - 1)):
                                v += 1 - (1 << s)
                            preds[ci] += v
                        acc &= (1 << nbits) - 1
                        ks = [0]
                        vs = [preds[ci]]
                        # --- AC: run-length loop, same inline bit I/O ---
                        k = 1
                        while k < 64:
                            while nbits < 16:
                                acc = (acc << 8) | (
                                    data[pos] if pos < nlen else 0
                                )
                                pos += 1
                                nbits += 8
                            e = act[(acc >> (nbits - 16)) & 0xFFFF]
                            if e == 0:
                                raise ValueError(
                                    "invalid Huffman code in entropy data"
                                )
                            rs = e >> 5
                            s = rs & 0x0F
                            nbits -= (e & 31) + s
                            if nbits < 0:
                                while nbits < 0:
                                    acc = (acc << 8) | (
                                        data[pos] if pos < nlen else 0
                                    )
                                    pos += 1
                                    nbits += 8
                            consumed += (e & 31) + s
                            if s == 0:
                                acc &= (1 << nbits) - 1
                                if rs == 0xF0:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC run past block end")
                            v = (acc >> nbits) & ((1 << s) - 1)
                            acc &= (1 << nbits) - 1
                            if v < (1 << (s - 1)):
                                v += 1 - (1 << s)
                            ks.append(zz[k])
                            vs.append(v)
                            k += 1
                        # one vectorized store per block, not one per coef
                        coef[my * cv + by, mx * chh + bx][ks] = vs
            mcu_count += 1
    if consumed > 8 * nlen:
        raise _EntropyEnd("entropy data truncated")


# ---------------------------------------------------------------------------
# Progressive (SOF2) scan decoders — T.81 G.1.2
# ---------------------------------------------------------------------------


class _ScanReader:
    """Bit reader over one un-stuffed entropy interval, for the
    progressive scan decoders (per-scan coefficient passes are a
    fraction of total decode work, so clarity wins over the inlined
    locals the sequential hot loop uses). Lookahead past the interval
    end reads virtual zero padding; :meth:`check_overrun` raises iff
    decode actually consumed padding bits."""

    __slots__ = ("data", "nlen", "pos", "acc", "nbits", "consumed")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.nlen = len(data)
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.consumed = 0

    def read_sym(self, lut: list[int]) -> int:
        while self.nbits < 16:
            self.acc = (self.acc << 8) | (
                self.data[self.pos] if self.pos < self.nlen else 0
            )
            self.pos += 1
            self.nbits += 8
        e = lut[(self.acc >> (self.nbits - 16)) & 0xFFFF]
        if e == 0:
            raise ValueError("invalid Huffman code in entropy data")
        ln = e & 31
        self.nbits -= ln
        self.acc &= (1 << self.nbits) - 1
        self.consumed += ln
        return e >> 5

    def read_bits(self, n: int) -> int:
        while self.nbits < n:
            self.acc = (self.acc << 8) | (
                self.data[self.pos] if self.pos < self.nlen else 0
            )
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        self.consumed += n
        return v

    def read_bit(self) -> int:
        return self.read_bits(1)

    def check_overrun(self) -> None:
        if self.consumed > 8 * self.nlen:
            raise _EntropyEnd("entropy data truncated")


def _noninterleaved_grid(
    c: dict, w: int, h: int, hmax: int, vmax: int
) -> tuple[int, int]:
    """(nby, nbx) block grid of one component in a NON-interleaved scan
    (T.81 A.2.2): ceil over the component's own sample dimensions, which
    can be smaller than the MCU-padded grid the coef arrays use."""
    cw = -(-w * c["h"] // hmax)
    chh = -(-h * c["v"] // vmax)
    return -(-chh // 8), -(-cw // 8)


def _scan_block_sequence(
    scan_comps: list[dict],
    mcux: int,
    mcuy: int,
    w: int,
    h: int,
    hmax: int,
    vmax: int,
) -> tuple[list[tuple[int, int, int]], int]:
    """Block visit order for a (DC) scan as ``[(comp_idx, by, bx)]`` plus
    the number of blocks per restart unit (blocks per MCU when
    interleaved, 1 when single-component non-interleaved)."""
    seq: list[tuple[int, int, int]] = []
    if len(scan_comps) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, c in enumerate(scan_comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            seq.append((ci, my * c["v"] + by, mx * c["h"] + bx))
        unit = sum(c["v"] * c["h"] for c in scan_comps)
    else:
        nby, nbx = _noninterleaved_grid(scan_comps[0], w, h, hmax, vmax)
        for by in range(nby):
            for bx in range(nbx):
                seq.append((0, by, bx))
        unit = 1
    return seq, unit


def _next_restart_reader(
    intervals: list[bytes], interval_i: int, reader: "_ScanReader"
) -> tuple[int, "_ScanReader"]:
    reader.check_overrun()
    interval_i += 1
    if interval_i >= len(intervals):
        raise ValueError("expected restart marker, got end of scan")
    return interval_i, _ScanReader(intervals[interval_i])


def _decode_scan_dc(
    intervals: list[bytes],
    scan_comps: list[dict],
    huff_dc: dict[int, list[int]],
    restart_interval: int,
    mcux: int,
    mcuy: int,
    w: int,
    h: int,
    hmax: int,
    vmax: int,
    ah: int,
    al: int,
) -> None:
    """Progressive DC scan (T.81 G.1.2.1): first pass (Ah=0) is the
    sequential DC predictor chain shifted left by Al; refinement (Ah>0)
    reads ONE raw bit per block and ORs it at position Al (two's
    complement — Python's infinite-precision OR on negatives matches the
    int16 arithmetic bit-for-bit)."""
    seq, unit = _scan_block_sequence(scan_comps, mcux, mcuy, w, h, hmax, vmax)
    if ah == 0:
        for c in scan_comps:
            if c["dc_t"] not in huff_dc:
                raise ValueError(
                    f"JPEG scan references undefined Huffman table "
                    f"(dc={c['dc_t']})"
                )
        luts = [huff_dc[c["dc_t"]] for c in scan_comps]
    coefs = [c["coef"] for c in scan_comps]
    preds = [0] * len(scan_comps)
    per_restart = restart_interval * unit
    interval_i = 0
    rd = _ScanReader(intervals[0])
    p1 = 1 << al
    for bi, (ci, by, bx) in enumerate(seq):
        if per_restart and bi and bi % per_restart == 0:
            interval_i, rd = _next_restart_reader(intervals, interval_i, rd)
            preds = [0] * len(scan_comps)
        if ah == 0:
            s = rd.read_sym(luts[ci])
            if s > 15:
                raise ValueError(
                    f"invalid DC size symbol {s} in entropy data"
                )
            if s:
                v = rd.read_bits(s)
                if v < (1 << (s - 1)):
                    v += 1 - (1 << s)
                preds[ci] += v
            coefs[ci][by, bx, 0] = preds[ci] << al
        elif rd.read_bit():
            coefs[ci][by, bx, 0] = int(coefs[ci][by, bx, 0]) | p1
    rd.check_overrun()


def _decode_scan_ac_first(
    intervals: list[bytes],
    c: dict,
    act: list[int],
    restart_interval: int,
    w: int,
    h: int,
    hmax: int,
    vmax: int,
    ss: int,
    se: int,
    al: int,
) -> None:
    """Progressive AC first pass over band [Ss, Se] (T.81 G.1.2.2):
    run/size coding like sequential AC but with EOBn run-length codes —
    EOBr covers ``2^r + extra`` blocks (including the current one) whose
    band is entirely zero at this approximation level."""
    nby, nbx = _noninterleaved_grid(c, w, h, hmax, vmax)
    zz = ZIGZAG
    coef = c["coef"]
    interval_i = 0
    rd = _ScanReader(intervals[0])
    eobrun = 0
    bi = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and bi and bi % restart_interval == 0:
                interval_i, rd = _next_restart_reader(intervals, interval_i, rd)
                eobrun = 0
            bi += 1
            if eobrun:
                eobrun -= 1
                continue
            blk = coef[by, bx]
            ks: list[int] = []
            vs: list[int] = []
            k = ss
            while k <= se:
                rs = rd.read_sym(act)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r < 15:
                        eobrun = (1 << r) - 1  # current block included
                        if r:
                            eobrun += rd.read_bits(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("AC run past band end")
                v = rd.read_bits(s)
                if v < (1 << (s - 1)):
                    v += 1 - (1 << s)
                ks.append(zz[k])
                vs.append(v << al)
                k += 1
            if ks:
                # one vectorized store per block (an inlined-bit-state
                # variant of this loop was measured at 1.0x — the refine
                # passes, not this one, hold the remaining scan cost)
                blk[ks] = vs
    rd.check_overrun()


def _decode_scan_ac_refine(
    intervals: list[bytes],
    c: dict,
    act: list[int],
    restart_interval: int,
    w: int,
    h: int,
    hmax: int,
    vmax: int,
    ss: int,
    se: int,
    al: int,
) -> None:
    """Progressive AC refinement over band [Ss, Se] (T.81 G.1.2.3).
    Three coefficient classes: already-nonzero coefficients receive one
    correction bit each (appended at magnitude position Al when set);
    zero-history coefficients are counted by the run lengths; run/1
    codes place a NEW +/-1<<Al after the run. EOBr covers ``2^r +
    extra`` blocks whose remaining band carries only correction bits.
    The ``cur & p1`` already-refined test works on Python's negative
    ints exactly as on C two's complement (coefficients here are
    multiples of 1<<Al)."""
    nby, nbx = _noninterleaved_grid(c, w, h, hmax, vmax)
    coef = c["coef"]
    p1 = 1 << al
    m1 = -1 << al
    interval_i = 0
    rd = _ScanReader(intervals[0])
    eobrun = 0
    bi = 0
    # every band position of every block is visited each refinement
    # pass — gather the band into a Python list once per block and
    # scatter it back once instead of ~63 numpy scalar reads/writes
    # (measured 1.07x on the probe fixture: the remaining cost is the
    # per-symbol/per-bit reader calls, i.e. Huffman's serial floor)
    zz_band = ZIGZAG[ss : se + 1]
    band_len = se - ss + 1
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and bi and bi % restart_interval == 0:
                interval_i, rd = _next_restart_reader(intervals, interval_i, rd)
                eobrun = 0
            bi += 1
            blk = coef[by, bx]
            band = blk[zz_band].tolist()
            i = 0
            if eobrun == 0:
                while i < band_len:
                    rs = rd.read_sym(act)
                    r, s = rs >> 4, rs & 0x0F
                    newval = 0
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r  # current block handled below
                            if r:
                                eobrun += rd.read_bits(r)
                            break
                        # r == 15: ZRL — skip 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError(
                                "invalid coefficient size in AC refinement"
                            )
                        newval = p1 if rd.read_bit() else m1
                    # advance past r zero-history coefficients, emitting
                    # correction bits for nonzero-history ones passed over
                    while i < band_len:
                        cur = band[i]
                        if cur != 0:
                            if rd.read_bit() and (cur & p1) == 0:
                                band[i] = cur + (p1 if cur >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        i += 1
                    if newval and i < band_len:
                        band[i] = newval
                    i += 1
            if eobrun:
                # correction bits for the rest of the band, then this
                # block counts against the EOB run
                while i < band_len:
                    cur = band[i]
                    if cur != 0 and rd.read_bit() and (cur & p1) == 0:
                        band[i] = cur + (p1 if cur >= 0 else m1)
                    i += 1
                eobrun -= 1
            blk[zz_band] = band
    rd.check_overrun()


def _decode_progressive_scan(
    intervals: list[bytes],
    scan_comps: list[dict],
    huff_dc: dict[int, list[int]],
    huff_ac: dict[int, list[int]],
    restart_interval: int,
    mcux: int,
    mcuy: int,
    w: int,
    h: int,
    hmax: int,
    vmax: int,
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> None:
    """Dispatch one progressive scan to its T.81 G.1.2 decoder, with the
    spec's structural constraints enforced loudly."""
    if ss == 0:
        if se != 0:
            raise ValueError(
                "progressive DC scan must have Se=0 (T.81 G.1.1.1)"
            )
        _decode_scan_dc(
            intervals, scan_comps, huff_dc, restart_interval,
            mcux, mcuy, w, h, hmax, vmax, ah, al,
        )
        return
    if len(scan_comps) != 1:
        raise ValueError(
            "progressive AC scan must be single-component (T.81 G.1.1.1)"
        )
    if se > 63 or ss > se:
        raise ValueError(f"invalid spectral band [{ss}, {se}]")
    c = scan_comps[0]
    if c["ac_t"] not in huff_ac:
        raise ValueError(
            f"JPEG scan references undefined Huffman table (ac={c['ac_t']})"
        )
    act = huff_ac[c["ac_t"]]
    if ah == 0:
        _decode_scan_ac_first(
            intervals, c, act, restart_interval, w, h, hmax, vmax, ss, se, al
        )
    else:
        _decode_scan_ac_refine(
            intervals, c, act, restart_interval, w, h, hmax, vmax, ss, se, al
        )


_SOF_UNSUPPORTED = {
    0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


# Decompression-bomb guard, following PIL's public MAX_IMAGE_PIXELS
# precedent: a corrupt/hostile header can declare 65535x65535 and drive a
# multi-GB coefficient allocation from a few hundred payload bytes. The
# same default cap applies to the PNG/BMP decoders in operators/multimodal.
MAX_IMAGE_PIXELS = 89_478_485


def decode_jpeg(payload: bytes, max_pixels: int | None = MAX_IMAGE_PIXELS) -> np.ndarray:
    """Decode a BASELINE or PROGRESSIVE JPEG to uint8 pixels: shape
    (h, w) for a single-component (grayscale) image, (h, w, 3) RGB for
    a YCbCr one.

    Supported: SOF0/SOF1/SOF2 Huffman 8-bit, 1 or 3 components,
    integer-ratio chroma subsampling (4:4:4 / 4:2:2 / 4:2:0 and any
    other integer h/v factors), restart intervals, multi-table DQT/DHT
    segments, progressive spectral-selection + successive-approximation
    scan scripts (T.81 G.1.2). ``NotImplementedError`` for arithmetic /
    lossless / 12-bit / CMYK — PIL remains the path for those.

    Rounding model: exact float64 IDCT and BT.601 YCbCr->RGB with one
    final round-half-up-to-even per sample (numpy rint). libjpeg's
    fixed-point islow IDCT may differ by +/-1 on some samples — this
    decoder is bit-stable with ITSELF everywhere, and the engine uses
    it only when PIL is absent (documented in _decode_image_bytes).

    Entropy decoding is per-symbol Python with a 16-bit LUT probe
    (Huffman is bit-serial — see _decode_entropy_scan); the
    dequantize/IDCT/upsample/color stages below it are whole-image
    numpy. Fine for the fixture scale it serves; real bulk decode
    should install PIL.
    """
    try:
        return _decode_jpeg_impl(payload, max_pixels)
    except (struct.error, IndexError) as e:
        # truncated segments surface as short unpacks / byte reads deep in
        # the parse; normalize to the documented malformed-input error
        raise ValueError(f"truncated or malformed JPEG structure: {e}") from e


def _decode_jpeg_impl(payload: bytes, max_pixels: int | None) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    sof = None
    progressive = False
    restart_interval = 0
    pos = 2
    comps = None  # allocated at the first SOS
    scans_decoded = 0
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        pos += 2
        while marker == 0xFF and pos < len(payload):
            # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
            # marker; without this skip a filled stream would misread the
            # marker id as a segment length
            marker = payload[pos]
            pos += 1
        if marker == 0xFF:
            raise ValueError("JPEG ends in fill bytes with no marker")
        if marker == 0xD9:  # EOI before any scan
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        if seglen < 2:
            # a zero/one-length segment would leave pos unchanged and
            # spin the marker walk forever on malformed input
            raise ValueError(f"JPEG segment length {seglen} at offset {pos}")
        data = payload[pos + 2 : pos + seglen]
        seg_end = pos + seglen
        if marker == 0xDB:  # DQT (one or more tables)
            o = 0
            while o < len(data):
                pq, tq = data[o] >> 4, data[o] & 0x0F
                o += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                zz = np.frombuffer(data[o : o + 64], dtype=np.uint8)
                o += 64
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                qt[tq] = nat
        elif marker == 0xC4:  # DHT (one or more tables)
            o = 0
            while o < len(data):
                tc, th = data[o] >> 4, data[o] & 0x0F
                o += 1
                bits = list(data[o : o + 16])
                o += 16
                nsym = sum(bits)
                vals = list(data[o : o + nsym])
                o += nsym
                tbl = _huff_decode_lut(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
            if sof is not None:
                # a second SOF would silently be ignored (the coefficient
                # arrays are allocated from the first) — refuse instead
                raise ValueError("JPEG has more than one SOF marker")
            progressive = marker == 0xC2
            precision, h, w, ncomp = struct.unpack(">BHHB", data[:6])
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG samples")
            if h == 0:
                # T.81 B.2.2: height 0 defers the line count to a DNL
                # marker after the scan; returning an empty image here
                # would be a silent wrong answer
                raise NotImplementedError(
                    "JPEG with DNL-deferred height (SOF lines=0)"
                )
            if w == 0:
                raise ValueError("JPEG SOF declares zero width")
            if max_pixels is not None and h * w > max_pixels:
                # decompression-bomb guard (PIL MAX_IMAGE_PIXELS shape):
                # the coefficient arrays alone would be 8x the pixel count
                raise ValueError(
                    f"JPEG declares {h}x{w} = {h * w} pixels, over the "
                    f"max_pixels cap {max_pixels}"
                )
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG (CMYK?); expected 1 or 3"
                )
            sof_comps = []
            for i in range(ncomp):
                cid, hv, tq = data[6 + 3 * i : 9 + 3 * i]
                sh, sv = hv >> 4, hv & 0x0F
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    # T.81 B.2.2 bounds; 0 would divide-by-zero the
                    # upsampling ratio below
                    raise ValueError(
                        f"JPEG sampling factors {sh}x{sv} out of range"
                    )
                sof_comps.append({"id": cid, "h": sh, "v": sv, "tq": tq})
            if ncomp == 1:
                # non-interleaved single-component scan: MCU is one block
                sof_comps[0]["h"] = sof_comps[0]["v"] = 1
            sof = {"w": w, "h": h, "comps": sof_comps}
        elif marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"JPEG {_SOF_UNSUPPORTED[marker]} decoding; install PIL "
                "or re-encode as baseline"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            if sof is None:
                raise ValueError("SOS before SOF")
            if comps is None:
                # first scan: allocate the frame's coefficient arrays
                comps = sof["comps"]
                w, h = sof["w"], sof["h"]
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                for c in comps:
                    c["coef"] = np.zeros(
                        (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64
                    )
            ns = data[0]
            if len(data) < 4 + 2 * ns:
                raise ValueError("truncated SOS header")
            by_id = {c["id"]: c for c in comps}
            scan_comps = []
            for i in range(ns):
                cid, tabs = data[1 + 2 * i : 3 + 2 * i]
                if cid not in by_id:
                    raise ValueError(
                        f"scan references unknown component id {cid}"
                    )
                c = by_id[cid]
                if any(sc is c for sc in scan_comps):
                    raise ValueError(
                        f"scan lists component id {cid} more than once"
                    )
                c["dc_t"], c["ac_t"] = tabs >> 4, tabs & 0x0F
                scan_comps.append(c)
            ss, se, ahal = data[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            intervals, end = _entropy_intervals(payload, seg_end)
            if progressive:
                _decode_progressive_scan(
                    intervals, scan_comps, huff_dc, huff_ac,
                    restart_interval, mcux, mcuy, w, h, hmax, vmax,
                    ss, se, ah, al,
                )
            else:
                if ss != 0 or se != 63 or ah or al:
                    raise ValueError(
                        "sequential scan with progressive parameters"
                    )
                if len(scan_comps) != len(comps):
                    raise NotImplementedError(
                        "multi-scan (non-interleaved) sequential JPEG"
                    )
                # T.81 B.2.3: the scan's component ordering must match the
                # frame (SOF) ordering. The entropy decoder below walks
                # comps in SOF order, so a non-conformant reordered SOS
                # would silently consume the stream against the wrong
                # components — refuse loudly instead.
                if any(sc is not c for sc, c in zip(scan_comps, comps)):
                    raise ValueError(
                        "JPEG scan component order differs from SOF order "
                        "(T.81 B.2.3 violation)"
                    )
                # surface a scan referencing an undefined table as the
                # module's documented malformed-input error, not KeyError
                for c in comps:
                    if c["dc_t"] not in huff_dc or c["ac_t"] not in huff_ac:
                        raise ValueError(
                            f"JPEG scan references undefined Huffman table "
                            f"(dc={c['dc_t']}, ac={c['ac_t']})"
                        )
                _decode_entropy_scan(
                    intervals, comps, huff_dc, huff_ac,
                    restart_interval, mcux, mcuy,
                )
            scans_decoded += 1
            pos = end
            continue
        # APPn / COM / others: skip
        pos = seg_end
    if scans_decoded == 0:
        raise ValueError("JPEG has no SOS scan")

    planes = []
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError(
                f"JPEG component references undefined quantization "
                f"table {c['tq']}"
            )
        q = qt[c["tq"]]
        nby, nbx = c["coef"].shape[:2]
        f = (c["coef"] * q).astype(np.float64).reshape(nby, nbx, 8, 8)
        px = np.einsum("xu,bcuv,yv->bxcy", _DCT_M, f, _DCT_M)
        plane = px.reshape(nby * 8, nbx * 8) + 128.0
        plane = np.clip(np.rint(plane), 0, 255).astype(np.uint8)
        cw = -(-w * c["h"] // hmax)
        chh = -(-h * c["v"] // vmax)
        plane = plane[:chh, :cw]
        rh, rv = hmax // c["h"], vmax // c["v"]
        if rh * c["h"] != hmax or rv * c["v"] != vmax:
            raise NotImplementedError(
                f"non-integer sampling ratio {c['h']}x{c['v']} vs "
                f"{hmax}x{vmax}"
            )
        if rh > 1:
            plane = np.repeat(plane, rh, axis=1)
        if rv > 1:
            plane = np.repeat(plane, rv, axis=0)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0]
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# JPEG encoder (baseline, Annex K tables)
# ---------------------------------------------------------------------------


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 -> (H//8, W//8, 8, 8)."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    return plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _encode_component_blocks(
    blocks: np.ndarray, qtbl: np.ndarray
) -> np.ndarray:
    """Vectorized forward DCT + quantization: (nby, nbx, 8, 8) uint8 ->
    (nby, nbx, 64) int coefficients in NATURAL order."""
    f = blocks.astype(np.float64) - 128.0
    coef = np.einsum("ux,bcxy,vy->bcuv", _DCT_M.T, f, _DCT_M.T)
    q = np.rint(coef.reshape(*coef.shape[:2], 64) / qtbl.astype(np.float64))
    return q.astype(np.int64)


def _emit_block(
    writer: _BitWriter, blk: np.ndarray, pred: int, dc_tab: dict, ac_tab: dict
) -> int:
    """Huffman-encode one quantized block (natural order); returns the
    new DC predictor."""
    dc = int(blk[0])
    diff = dc - pred
    mag = abs(diff)
    s = mag.bit_length()
    code, ln = dc_tab[s]
    writer.write(code, ln)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    zz = blk[ZIGZAG]
    run = 0
    # index of the last nonzero AC (0 if none)
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        mag = abs(v)
        s = mag.bit_length()
        code, ln = ac_tab[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        writer.write(code, ln)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _jpeg_frame_setup(
    img: np.ndarray, quality: int, subsample: str
) -> dict:
    """Shared encoder front half (baseline and progressive emit the SAME
    quantized coefficients — that identity is what the progressive
    differential tests pin): validate input, build color planes,
    subsample, pad to the MCU grid, forward-DCT + quantize. Returns the
    frame dict the entropy back halves consume."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        gray = True
    elif img.ndim == 3 and img.shape[2] == 3:
        gray = False
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {img.shape}")
    if subsample not in ("444", "420"):
        raise ValueError(f"subsample must be '444' or '420' (got {subsample!r})")
    if gray:
        subsample = "444"
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("cannot encode an empty image")

    qy = quality_scaled_qtable(_QT_LUMA, quality)
    qc = quality_scaled_qtable(_QT_CHROMA, quality)

    if gray:
        planes = [img.copy()]
        samps = [(1, 1)]
        qts = [qy]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        to8 = lambda p: np.clip(np.rint(p), 0, 255).astype(np.uint8)  # noqa: E731
        if subsample == "420":
            # average 2x2 neighborhoods (on the edge-padded plane so odd
            # dimensions stay well-defined)
            def down2(p):
                p = _pad_edge(to8(p).astype(np.float64), 2)
                return to8(
                    (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])
                    / 4.0
                )

            planes = [to8(y), down2(cb), down2(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [to8(y), to8(cb), to8(cr)]
            samps = [(1, 1), (1, 1), (1, 1)]
        qts = [qy, qc, qc]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_blocks = []
    for plane, (sh, sv) in zip(planes, samps):
        # pad each component plane to its own MCU-aligned block grid
        target_h = mcuy * sv * 8
        target_w = mcux * sh * 8
        p = _pad_edge(plane, 8)
        if p.shape[0] < target_h or p.shape[1] < target_w:
            p = np.pad(
                p,
                ((0, target_h - p.shape[0]), (0, target_w - p.shape[1])),
                mode="edge",
            )
        comp_blocks.append(_to_blocks(p[:target_h, :target_w]))
    coefs = [
        _encode_component_blocks(cb_, qt_) for cb_, qt_ in zip(comp_blocks, qts)
    ]
    return {
        "gray": gray,
        "h": h,
        "w": w,
        "samps": samps,
        "qy": qy,
        "qc": qc,
        "coefs": coefs,
        "mcux": mcux,
        "mcuy": mcuy,
        "hmax": hmax,
        "vmax": vmax,
    }


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 pixels — (h, w) grayscale or (h, w, 3) RGB — as a
    baseline JPEG with Annex K quantization (IJG quality scaling) and
    the Annex K typical Huffman tables. ``subsample`` is '444' or '420'
    (RGB only); ``restart_interval`` > 0 emits DRI + RSTn markers every
    that many MCUs (what exercises the decoder's restart path).

    Exists so environments without PIL can BUILD real JPEG fixtures;
    output is standard and readable by any JPEG decoder. Not a bulk
    encoder — the entropy stage is per-block Python.
    """
    fr = _jpeg_frame_setup(img, quality, subsample)
    gray, h, w = fr["gray"], fr["h"], fr["w"]
    samps, qy, qc, coefs = fr["samps"], fr["qy"], fr["qc"], fr["coefs"]
    mcux, mcuy = fr["mcux"], fr["mcuy"]
    dc_y = _huff_encode_table(*_HT_DC_LUMA)
    ac_y = _huff_encode_table(*_HT_AC_LUMA)
    dc_c = _huff_encode_table(*_HT_DC_CHROMA)
    ac_c = _huff_encode_table(*_HT_AC_CHROMA)

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0 (minimal, 1:1 aspect)
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_y = bytes(int(qy[ZIGZAG[i]]) for i in range(64))
    out += _seg(0xDB, bytes([0x00]) + zz_y)
    if not gray:
        zz_c = bytes(int(qc[ZIGZAG[i]]) for i in range(64))
        out += _seg(0xDB, bytes([0x01]) + zz_c)
    ncomp = 1 if gray else 3
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for i, (sh, sv) in enumerate(samps):
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += _seg(0xC0, bytes(sof))
    for tc_th, (bits, vals) in (
        (0x00, _HT_DC_LUMA),
        (0x10, _HT_AC_LUMA),
    ) + (() if gray else ((0x01, _HT_DC_CHROMA), (0x11, _HT_AC_CHROMA))):
        out += _seg(0xC4, bytes([tc_th] + bits + vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, bytes(sos))

    writer = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.pad_to_byte()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci, (sh, sv) in enumerate(samps):
                dct = dc_y if ci == 0 else dc_c
                act = ac_y if ci == 0 else ac_c
                for by in range(sv):
                    for bx in range(sh):
                        blk = coefs[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _emit_block(writer, blk, preds[ci], dct, act)
            mcu_count += 1
    writer.pad_to_byte()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# A flat 8-bit AC Huffman table for progressive scans: all 176 valid
# run/size symbols INCLUDING the EOBn codes (0x10..0xE0) that the Annex K
# baseline tables lack — baseline never uses EOB runs, progressive needs
# them. 176 symbols at length 8 trivially satisfies Kraft (176 <= 256);
# compression is mediocre, which is irrelevant for fixture building.
_HT_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11) if s or r < 15]
    + [0xF0],
)
_check_huff(*_HT_AC_PROG)


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 pixels as a PROGRESSIVE JPEG (SOF2) with the
    standard spectral-selection + successive-approximation scan script
    (DC first at Al=1; luma AC split into 1-5 / 6-63 bands at Al=2 with
    two refinement passes; chroma AC at Al=1 with one; DC refinement
    last — the same shape libjpeg's default progressive script uses).

    Emits the IDENTICAL quantized coefficients as :func:`encode_jpeg`
    (shared front half), so ``decode_jpeg(encode_jpeg_progressive(x)) ==
    decode_jpeg(encode_jpeg(x))`` bit-for-bit — the differential pin the
    progressive decoder's tests rely on. ``restart_interval`` > 0 emits
    DRI + RSTn in every scan (MCU units in the DC scan, block units in
    AC scans, per T.81). Exists to BUILD progressive fixtures without
    PIL; output is standard."""
    fr = _jpeg_frame_setup(img, quality, subsample)
    gray, h, w = fr["gray"], fr["h"], fr["w"]
    samps, qy, qc, coefs = fr["samps"], fr["qy"], fr["qc"], fr["coefs"]
    mcux, mcuy = fr["mcux"], fr["mcuy"]
    hmax, vmax = fr["hmax"], fr["vmax"]
    ncomp = 1 if gray else 3
    dc_tabs = [_huff_encode_table(*_HT_DC_LUMA)] + [
        _huff_encode_table(*_HT_DC_CHROMA)
    ] * (ncomp - 1)
    ac_tab = _huff_encode_table(*_HT_AC_PROG)
    # scan-side component dicts mirroring the decoder's shape
    comps = [
        {"h": sh, "v": sv, "coef": cf} for (sh, sv), cf in zip(samps, coefs)
    ]

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(
        0xDB, bytes([0x00]) + bytes(int(qy[ZIGZAG[i]]) for i in range(64))
    )
    if not gray:
        out += _seg(
            0xDB, bytes([0x01]) + bytes(int(qc[ZIGZAG[i]]) for i in range(64))
        )
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for i, (sh, sv) in enumerate(samps):
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += _seg(0xC2, bytes(sof))
    dht = [(0x00, _HT_DC_LUMA), (0x10, _HT_AC_PROG)]
    if not gray:
        dht.append((0x01, _HT_DC_CHROMA))
    for tc_th, (bits, vals) in dht:
        out += _seg(0xC4, bytes([tc_th] + bits + vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    def sos_header(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytearray([len(comp_ids)])
        for cid in comp_ids:
            td = 0 if cid == 1 else 1
            body += bytes([cid, (td << 4) | 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, bytes(body))

    def restart_marks(writer: _BitWriter, rst: int) -> int:
        writer.pad_to_byte()
        writer.out += bytes([0xFF, 0xD0 + rst])
        return (rst + 1) % 8

    def emit_dc_first(al: int) -> bytes:
        seq, unit = _scan_block_sequence(comps, mcux, mcuy, w, h, hmax, vmax)
        writer = _BitWriter()
        preds = [0] * ncomp
        per_restart = restart_interval * unit
        rst = 0
        for bi, (ci, by, bx) in enumerate(seq):
            if per_restart and bi and bi % per_restart == 0:
                rst = restart_marks(writer, rst)
                preds = [0] * ncomp
            v = int(coefs[ci][by, bx, 0]) >> al  # arithmetic shift
            diff = v - preds[ci]
            preds[ci] = v
            s = abs(diff).bit_length()
            code, ln = dc_tabs[ci][s]
            writer.write(code, ln)
            if s:
                writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        writer.pad_to_byte()
        return bytes(writer.out)

    def emit_dc_refine(al: int) -> bytes:
        seq, unit = _scan_block_sequence(comps, mcux, mcuy, w, h, hmax, vmax)
        writer = _BitWriter()
        per_restart = restart_interval * unit
        rst = 0
        for bi, (ci, by, bx) in enumerate(seq):
            if per_restart and bi and bi % per_restart == 0:
                rst = restart_marks(writer, rst)
            writer.write((int(coefs[ci][by, bx, 0]) >> al) & 1, 1)
        writer.pad_to_byte()
        return bytes(writer.out)

    def emit_ac_first(ci: int, ss: int, se: int, al: int) -> bytes:
        nby, nbx = _noninterleaved_grid(comps[ci], w, h, hmax, vmax)
        coef = coefs[ci]
        zz = ZIGZAG
        writer = _BitWriter()
        eobrun = 0
        rst = 0

        def flush_eob() -> None:
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                code, ln = ac_tab[r << 4]
                writer.write(code, ln)
                if r:
                    writer.write(eobrun - (1 << r), r)
                eobrun = 0

        bi = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and bi and bi % restart_interval == 0:
                    flush_eob()
                    rst = restart_marks(writer, rst)
                bi += 1
                blk = coef[by, bx]
                vals = [int(blk[zz[k]]) for k in range(ss, se + 1)]
                mags = [abs(v) >> al for v in vals]
                last = -1
                for i, t in enumerate(mags):
                    if t:
                        last = i
                if last < 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                r = 0
                for i in range(last + 1):
                    t = mags[i]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15:
                        code, ln = ac_tab[0xF0]  # ZRL
                        writer.write(code, ln)
                        r -= 16
                    s = t.bit_length()
                    code, ln = ac_tab[(r << 4) | s]
                    writer.write(code, ln)
                    sv = t if vals[i] >= 0 else -t
                    writer.write(sv if sv >= 0 else sv + (1 << s) - 1, s)
                    r = 0
                if last < se - ss:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        writer.pad_to_byte()
        return bytes(writer.out)

    def emit_ac_refine(ci: int, ss: int, se: int, al: int) -> bytes:
        nby, nbx = _noninterleaved_grid(comps[ci], w, h, hmax, vmax)
        coef = coefs[ci]
        zz = ZIGZAG
        writer = _BitWriter()
        eobrun = 0
        be_bits: list[int] = []  # corrections buffered behind the EOB run
        rst = 0

        def flush_eob() -> None:
            nonlocal eobrun, be_bits
            if eobrun:
                r = eobrun.bit_length() - 1
                code, ln = ac_tab[r << 4]
                writer.write(code, ln)
                if r:
                    writer.write(eobrun - (1 << r), r)
                eobrun = 0
            for b in be_bits:
                writer.write(b, 1)
            be_bits = []

        bi = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and bi and bi % restart_interval == 0:
                    flush_eob()
                    rst = restart_marks(writer, rst)
                bi += 1
                blk = coef[by, bx]
                vals = [int(blk[zz[k]]) for k in range(ss, se + 1)]
                mags = [abs(v) >> al for v in vals]
                # last newly-visible position: runs past it fold into the
                # EOB run instead of ZRLs (T.81 G.1.2.3)
                eob_i = -1
                for i, t in enumerate(mags):
                    if t == 1:
                        eob_i = i
                r = 0
                br: list[int] = []  # corrections since the last symbol
                for i, t in enumerate(mags):
                    if t == 0:
                        r += 1
                        continue
                    # flush pending ZRLs at EVERY non-skipped position —
                    # history coefficients included — so the buffered
                    # correction bits stay aligned with the run window
                    # the decoder replays them in
                    while r > 15 and i <= eob_i:
                        flush_eob()
                        code, ln = ac_tab[0xF0]  # ZRL
                        writer.write(code, ln)
                        r -= 16
                        for b in br:
                            writer.write(b, 1)
                        br = []
                    if t > 1:  # history coefficient: one correction bit
                        br.append(t & 1)
                        continue
                    # t == 1: newly visible coefficient
                    flush_eob()
                    code, ln = ac_tab[(r << 4) | 1]
                    writer.write(code, ln)
                    writer.write(0 if vals[i] < 0 else 1, 1)
                    for b in br:
                        writer.write(b, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    eobrun += 1
                    be_bits += br
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        writer.pad_to_byte()
        return bytes(writer.out)

    all_ids = list(range(1, ncomp + 1))
    out += sos_header(all_ids, 0, 0, 0, 1) + emit_dc_first(1)
    out += sos_header([1], 1, 5, 0, 2) + emit_ac_first(0, 1, 5, 2)
    if not gray:
        out += sos_header([2], 1, 63, 0, 1) + emit_ac_first(1, 1, 63, 1)
        out += sos_header([3], 1, 63, 0, 1) + emit_ac_first(2, 1, 63, 1)
    out += sos_header([1], 6, 63, 0, 2) + emit_ac_first(0, 6, 63, 2)
    out += sos_header([1], 1, 63, 2, 1) + emit_ac_refine(0, 1, 63, 1)
    out += sos_header(all_ids, 0, 0, 1, 0) + emit_dc_refine(0)
    if not gray:
        out += sos_header([2], 1, 63, 1, 0) + emit_ac_refine(1, 1, 63, 0)
        out += sos_header([3], 1, 63, 1, 0) + emit_ac_refine(2, 1, 63, 0)
    out += sos_header([1], 1, 63, 1, 0) + emit_ac_refine(0, 1, 63, 0)
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# PNG encoder (the inverse of multimodal._decode_png_stdlib's subset)
# ---------------------------------------------------------------------------


def _filter_png_rows(
    flat: np.ndarray, ch: int, filter_type: int
) -> bytes:
    """Apply one PNG filter to every row of a (nrows, rowbytes) byte
    array, prefixing each row with its filter byte. Supports filters
    0 (None), 1 (Sub), 2 (Up) — enough to differential-test the
    decoder's vectorized de-filter branches from the encoder side."""
    nrows = flat.shape[0]
    out = bytearray()
    prev = np.zeros(flat.shape[1], dtype=np.uint8)
    for y in range(nrows):
        line = flat[y]
        if filter_type == 0:
            enc = line
        elif filter_type == 1:  # Sub: subtract the left neighbor per lane
            left = np.zeros_like(line)
            left[ch:] = line[:-ch]
            enc = line - left
        elif filter_type == 2:  # Up
            enc = line - prev
        else:
            raise ValueError(f"unsupported PNG write filter {filter_type}")
        out += bytes([filter_type]) + enc.tobytes()
        prev = line
    return bytes(out)


# Adam7 pass geometry, duplicated from the decoder side so the writer
# stays importable standalone: (row0, col0, row_step, col_step)
_ADAM7 = (
    (0, 0, 8, 8), (0, 4, 8, 8), (4, 0, 8, 4), (0, 2, 4, 4),
    (2, 0, 4, 2), (0, 1, 2, 2), (1, 0, 2, 1),
)


def encode_png(
    img: np.ndarray, interlace: bool = False, filter_type: int = 0
) -> bytes:
    """Encode uint8 pixels — (h, w) grayscale or (h, w, 3) RGB — as an
    8-bit PNG, plain or Adam7-interlaced, with one filter applied to
    every scanline (0/1/2). Exactly the shapes ``_decode_png_stdlib``
    reads back, so PNG output produced here is verifiable in a closed
    loop without PIL — and the interlace/filter knobs exist precisely to
    differential-test the decoder's pass-reassembly and de-filter paths
    from an independent direction."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color = 0
    elif img.ndim == 3 and img.shape[2] == 3:
        color = 2
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {img.shape}")
    h, w = img.shape[:2]
    ch = 1 if color == 0 else 3

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1 if interlace else 0)
    full = img.reshape(h, w, ch)
    if not interlace:
        raw = _filter_png_rows(full.reshape(h, w * ch), ch, filter_type)
    else:
        parts = []
        for row0, col0, rstep, cstep in _ADAM7:
            sub = full[row0::rstep, col0::cstep]
            if sub.size == 0:
                continue  # empty pass contributes no bytes
            ph, pw = sub.shape[:2]
            parts.append(
                _filter_png_rows(
                    np.ascontiguousarray(sub).reshape(ph, pw * ch),
                    ch,
                    filter_type,
                )
            )
        raw = b"".join(parts)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# Motion-JPEG AVI (RIFF) — the stdlib real-video container
# ---------------------------------------------------------------------------


def encode_avi_mjpeg(
    frames: list[bytes], fps_rate: int = 25, fps_scale: int = 1,
    width: int = 0, height: int = 0,
) -> bytes:
    """Pack per-frame JPEG payloads into a minimal Motion-JPEG AVI
    (RIFF): hdrl (avih + one 'vids'/'MJPG' stream at rate/scale fps)
    followed by a movi list of '00dc' chunks. Enough structure for any
    RIFF walker — including :func:`decode_avi_mjpeg` — to recover the
    frame bytes and their timestamps."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    if fps_rate <= 0 or fps_scale <= 0:
        raise ValueError("fps rate/scale must be positive")

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    usec = (1_000_000 * fps_scale) // fps_rate
    maxbuf = max(len(f) for f in frames)
    avih = struct.pack(
        "<10I4x4x4x4x",
        usec, maxbuf * fps_rate // max(fps_scale, 1), 0, 0x10,
        len(frames), 0, 1, maxbuf, width, height,
    )
    strh = struct.pack(
        "<4s4sI2H8I4h",
        b"vids", b"MJPG", 0, 0, 0, 0,
        fps_scale, fps_rate, 0, len(frames), maxbuf, 0xFFFFFFFF, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<I2i2H4s5I", 40, width, height, 1, 24, b"MJPG",
        maxbuf, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(payload: bytes) -> list[tuple[int, bytes]]:
    """Walk a Motion-JPEG AVI and return ``[(ts_ms, jpeg_bytes)]`` in
    stream order — timestamps from the 'vids' stream's rate/scale
    (frame i at ``i * 1000 * scale // rate`` ms). Raises ``ValueError``
    for non-AVI payloads and ``NotImplementedError`` when the video
    stream isn't Motion-JPEG (PyAV remains the path for real codecs)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    fps: list[tuple[int, int]] = []
    handlers: list[bytes] = []
    frames: list[bytes] = []

    def walk(data: bytes, pos: int, end: int) -> None:
        end = min(end, len(data))  # a lying parent size must not let a
        # child chunk read past the actual payload
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = body_start + size
            if fourcc == b"LIST":
                walk(data, body_start + 4, body_end)
            elif fourcc == b"strh" and size >= 48:
                fcc_type = data[body_start : body_start + 4]
                if fcc_type == b"vids":
                    if body_start + 28 > len(data):
                        # a lying strh size must not leak struct.error
                        raise ValueError("truncated AVI stream header")
                    handlers.append(data[body_start + 4 : body_start + 8])
                    scale, rate = struct.unpack(
                        "<II", data[body_start + 20 : body_start + 28]
                    )
                    fps.append((scale, rate))
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                frames.append(bytes(data[body_start:body_end]))
            pos = body_end + (size % 2)  # chunks pad to even

    walk(payload, 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0]))
    if not fps:
        raise ValueError("AVI has no video stream header")
    if len(fps) > 1:
        # the frame walk below keys on the '##dc'/'##db' fourcc suffix
        # without stream demux, so two video streams would interleave
        raise NotImplementedError(
            "AVI with multiple video streams; install PyAV for demuxing"
        )
    if handlers and handlers[0] not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"AVI video handler {handlers[0]!r} is not Motion-JPEG; "
            "install PyAV for real codecs"
        )
    scale, rate = fps[0]
    if rate <= 0 or scale <= 0:
        raise ValueError("AVI stream has a non-positive frame rate")
    return [
        (i * 1000 * scale // rate, f) for i, f in enumerate(frames)
    ]


# ---------------------------------------------------------------------------
# GIF (87a/89a) — LZW, palettes, interlace, animation with disposal
# ---------------------------------------------------------------------------


def _lzw_decode_gif(min_code_size: int, data: bytes, max_out: int) -> bytearray:
    """GIF-flavor LZW decode (LSB-first variable-width codes, clear/EOI,
    12-bit dictionary cap with deferred-clear tolerance). ``max_out``
    bounds the output so a hostile stream cannot expand past the frame
    it claims to fill (the LZW analog of the decompression-bomb guard)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"GIF LZW min code size {min_code_size} out of range")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("GIF LZW stream truncated (no EOI)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"invalid GIF LZW code {code}")
        out += entry
        if len(out) > max_out:
            raise ValueError("GIF LZW output exceeds declared frame size")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def _lzw_encode_gif(min_code_size: int, indices: bytes) -> bytes:
    """GIF-flavor LZW encode, the inverse of :func:`_lzw_decode_gif` —
    exists so GIF fixtures can be BUILT and differential-tested without
    PIL. Standard greedy longest-match with clear-on-full.

    Width bookkeeping mirrors the DECODER's table, not the encoder's:
    the decoder appends one entry for EVERY processed data code after
    the first in a segment — including the final flush emit, for which
    the encoder registers nothing — so tracking only registrations
    emits EOI one bit narrower than the decoder reads it whenever the
    flush lands exactly on a width boundary (a hypothesis-found
    desync)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0
    width = min_code_size + 1
    dec_len = eoi + 1  # simulated decoder table length
    emitted = 0  # data codes emitted since the last clear

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def emit_data(code: int) -> None:
        # the decoder appends an entry while processing every data code
        # except the first after a clear, and bumps its read width when
        # its table size reaches 1 << width — replay that here so the
        # NEXT emitted code (data, clear, or EOI) uses the width the
        # decoder will read it at
        nonlocal dec_len, emitted, width
        emit(code)
        emitted += 1
        if emitted >= 2 and dec_len < 4096:
            dec_len += 1
            if dec_len == (1 << width) and width < 12:
                width += 1

    def emit_clear() -> None:
        nonlocal dec_len, emitted, width
        emit(clear)  # read at the current width, then both sides reset
        width = min_code_size + 1
        dec_len = eoi + 1
        emitted = 0

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit_clear()
    seq = b""
    for b in bytes(indices):
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        emit_data(table[seq])
        table[cand] = next_code
        next_code += 1
        if next_code > 4095:
            emit_clear()
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
        seq = bytes([b])
    if seq:
        emit_data(table[seq])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# GIF interlace passes: (first_row, step)
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at ``pos``; returns
    (data, position after the 0-length terminator)."""
    parts = []
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("GIF sub-block chain truncated")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return b"".join(parts), pos
        if pos + ln > n:
            raise ValueError("GIF sub-block chain truncated")
        parts.append(payload[pos : pos + ln])
        pos += ln


# materializing every composited frame of an animation is bounded: a
# hostile 2 MB payload can declare 100k tiny frames on a megapixel
# screen (~300 GB of canvas copies). The streaming path
# (_iter_gif_frames, used by frame sampling) holds one frame at a time
# and is not subject to this cap.
MAX_GIF_COMPOSITE_BYTES = 1 << 30


def decode_gif_frames(
    payload: bytes, max_pixels: int | None = MAX_IMAGE_PIXELS
) -> list[tuple[int, np.ndarray]]:
    """Decode a GIF87a/89a — including animations — to
    ``[(ts_ms, rgb_frame)]``: each entry is the composited logical
    screen after drawing that frame, timestamped by the cumulative
    graphic-control delays (frame 0 at 0 ms). Handles global/local
    color tables, interlace, transparency, and disposal methods
    0/1 (leave), 2 (restore to background), 3 (restore to previous).
    Raises ``ValueError`` for malformed streams — same contract as the
    other stdlib decoders — and for animations whose materialized
    frames would exceed ``MAX_GIF_COMPOSITE_BYTES`` (stream them with
    :func:`_iter_gif_frames` instead)."""
    frames: list[tuple[int, np.ndarray]] = []
    total = 0
    for ts_ms, frame in _iter_gif_frames(payload, max_pixels):
        total += frame.nbytes
        if total > MAX_GIF_COMPOSITE_BYTES:
            raise ValueError(
                "GIF animation frames exceed the composite-bytes cap; "
                "stream them with _iter_gif_frames"
            )
        frames.append((ts_ms, frame))
    return frames


def _iter_gif_frames(
    payload: bytes, max_pixels: int | None = MAX_IMAGE_PIXELS
):
    """Generator form of :func:`decode_gif_frames`: yields
    ``(ts_ms, rgb_frame)`` one composited frame at a time, so consumers
    that keep only selected frames (video frame sampling) never hold the
    whole animation."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h, flags, bg_idx, _aspect = struct.unpack("<HHBBB", payload[6:13])
    if w == 0 or h == 0:
        raise ValueError("GIF declares zero dimensions")
    if max_pixels is not None and w * h > max_pixels:
        raise ValueError(
            f"GIF declares {w}x{h} = {w * h} pixels, over the "
            f"max_pixels cap {max_pixels}"
        )
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(payload):
            raise ValueError("truncated GIF global color table")
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    if gct is not None and bg_idx < gct.shape[0]:
        background = gct[bg_idx].copy()
    else:
        background = np.zeros(3, np.uint8)
    canvas = np.empty((h, w, 3), np.uint8)
    canvas[:] = background
    yielded = 0
    ts_ms = 0
    delay_cs = 0
    transparent: int | None = None
    disposal = 0
    while True:
        if pos >= len(payload):
            raise ValueError("GIF stream truncated (no trailer)")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[pos]
            pos += 1
            data, pos = _gif_subblocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                gflags = data[0]
                delay_cs = struct.unpack("<H", data[1:3])[0]
                transparent = data[3] if gflags & 0x01 else None
                disposal = (gflags >> 2) & 0x07
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        left, top, fw, fh, iflags = struct.unpack(
            "<HHHHB", payload[pos : pos + 9]
        )
        pos += 9
        if fw == 0 or fh == 0 or left + fw > w or top + fh > h:
            raise ValueError("GIF frame rectangle outside the logical screen")
        pal = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(payload):
                raise ValueError("truncated GIF local color table")
            pal = np.frombuffer(
                payload[pos : pos + 3 * n], np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame has no color table")
        if pos >= len(payload):
            raise ValueError("truncated GIF image data")
        mcs = payload[pos]
        pos += 1
        data, pos = _gif_subblocks(payload, pos)
        raw = _lzw_decode_gif(mcs, data, fw * fh)
        if len(raw) < fw * fh:
            raise ValueError("GIF LZW data shorter than the frame")
        idx = np.frombuffer(bytes(raw[: fw * fh]), np.uint8)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("GIF pixel index out of color-table range")
        if iflags & 0x40:  # interlaced: reorder rows into place
            rows = np.empty((fh, fw), np.uint8)
            src = idx.reshape(fh, fw)
            o = 0
            for first, step in _GIF_INTERLACE:
                cnt = len(range(first, fh, step))
                rows[first::step] = src[o : o + cnt]
                o += cnt
            idx2d = rows
        else:
            idx2d = idx.reshape(fh, fw)
        saved = canvas.copy() if disposal == 3 else None
        rect = canvas[top : top + fh, left : left + fw]
        rgb = pal[idx2d]
        if transparent is not None:
            mask = idx2d != transparent
            rect[mask] = rgb[mask]
        else:
            rect[:] = rgb
        yield ts_ms, canvas.copy()
        yielded += 1
        ts_ms += delay_cs * 10
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = background
        elif disposal == 3 and saved is not None:
            canvas = saved
        delay_cs = 0
        transparent = None
        disposal = 0
    if not yielded:
        raise ValueError("GIF contains no image frames")


def decode_gif(payload: bytes) -> np.ndarray:
    """First composited frame of a GIF as (h, w, 3) RGB — the still-image
    view the image-feature kernels use."""
    return decode_gif_frames(payload)[0][1]


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    delays_cs: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """Minimal GIF89a writer: full-frame index arrays (h, w) uint8 over
    one global color table, optional per-frame delays (centiseconds) and
    interlacing. Exists so GIF fixtures can be BUILT and the decoder
    differential-tested without PIL; output is standard."""
    palette = np.asarray(palette, dtype=np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or not 1 <= palette.shape[0] <= 256:
        raise ValueError("palette must be (n<=256, 3) uint8")
    if not frames:
        raise ValueError("GIF needs at least one frame")
    h, w = np.asarray(frames[0]).shape[:2]
    # color table size: power of two >= max(palette size, 2)
    bits = max((palette.shape[0] - 1).bit_length(), 1)
    n_pal = 1 << bits
    pal_full = np.zeros((n_pal, 3), np.uint8)
    pal_full[: palette.shape[0]] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal_full.tobytes()
    mcs = max(bits, 2)
    for fi, frame in enumerate(frames):
        frame = np.asarray(frame, dtype=np.uint8)
        if frame.shape != (h, w):
            raise ValueError("all frames must be (h, w) index arrays")
        if int(frame.max(initial=0)) >= palette.shape[0]:
            raise ValueError("frame index out of palette range")
        delay = delays_cs[fi] if delays_cs else 0
        out += bytes([0x21, 0xF9, 4]) + struct.pack("<BHB", 0, delay, 0) + b"\x00"
        out += bytes([0x2C]) + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        if interlace:
            rows = [frame[first::step] for first, step in _GIF_INTERLACE]
            body = np.concatenate(rows, axis=0).tobytes()
        else:
            body = frame.tobytes()
        out += bytes([mcs])
        lzw = _lzw_encode_gif(mcs, body)
        for i in range(0, len(lzw), 255):
            blockb = lzw[i : i + 255]
            out += bytes([len(blockb)]) + blockb
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
