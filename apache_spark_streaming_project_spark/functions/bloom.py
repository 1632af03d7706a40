"""Distributed Bloom filter from PUBLIC built-ins only.

Spark's ``bloom_filter_agg``/``might_contain`` pair is optimizer-internal
(used by runtime-filter injection, not registered for user SQL), so this
module assembles the same thing from registered functions — and keeps the
bitmap SPARSE:

  * BUILD — each key contributes k probe bit-positions (double hashing:
    ``p_i = pmod(h1 + i*h2, m)``, hashes reduced mod m first so ANSI
    int64 arithmetic cannot overflow); positions map to (word, bits)
    rows (``word = p div 64``, ``bits = 1 << (p mod 64)``) which
    ``bit_or``-aggregate per word. ``bit_or`` is partial-aggregatable,
    so the bitmap builds map-side and merges word-wise in one reduce.
    The result IS the sparse (word, bits) table — words with no set bit
    simply have no row.
  * PROBE — k broadcast HASH joins against the word table (one per
    probe position), each followed by a bit-AND filter. A probe whose
    word has no row joins to nothing and is rejected — exactly the
    all-zero-word semantics — and every lookup is an O(1) hash-table
    hit, never a scan. (A first cut densified the bitmap into an
    ``array<bigint>`` via ``map_from_entries`` + ``element_at`` — that
    made the build do n_words LINEAR map scans, O(n_words * n_entries);
    the sparse join needs no dense array at all.)

No false negatives (every inserted key's bits are set), tunable false
positives: with k = 2 and ``m ~= 16 * n`` bits fp is ~1.5%. Sizing at
scale: the sparse word table carries at most min(k*n, m/64) rows — for
10^8 inserted grams that is ~2.4 GB dense but only the SET words sparse;
when it outgrows broadcast range, partition the key space and build
per-partition blooms (or swap the broadcast join for a shuffle join on
the word — the operator shape is unchanged).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _probe_position(key: Column, m_bits: int, i: int) -> Column:
    """i-th probe bit position for a key (double hashing, exact int64
    arithmetic — both hashes reduced mod m BEFORE combining so the sum
    stays < (i+1)*m, far from ANSI overflow)."""
    m = F.lit(m_bits).cast("bigint")
    h1 = F.pmod(F.xxhash64(key), m)
    if i == 0:
        return h1
    # h2 reduced into [1, m-1], never 0: h2 % m == 0 would collapse all
    # k probes onto h1 (effective k = 1 for those keys, fp rate ~p
    # instead of ~p^k) — the standard double-hashing nonzero guard
    h2 = F.pmod(F.xxhash64(key, F.lit(0x9E3779B9)), m - F.lit(1)) + F.lit(1)
    return F.pmod(h1 + F.lit(i).cast("bigint") * h2, m)


def _word_and_mask(pos: Column) -> tuple[Column, Column]:
    word = (pos / 64).cast("int")
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), (pos % 64).cast("int")
    )
    return word, mask


def bloom_build(
    df: DataFrame, key: Column | str, m_bits: int = 1 << 23, k: int = 2
) -> DataFrame:
    """Sparse bloom bitmap ``(_w int, _bits bigint)`` over ``df[key]`` —
    one row per 64-bit word with at least one set bit."""
    key = F.col(key) if isinstance(key, str) else key
    pos = df.select(
        F.explode(
            F.array(*[_probe_position(key, m_bits, i) for i in range(k)])
        ).alias("_p")
    )
    w, b = _word_and_mask(F.col("_p"))
    return (
        pos.select(w.alias("_w"), b.alias("_b"))
        .groupBy("_w")
        .agg(F.expr("bit_or(_b)").alias("_bits"))
    )


def bloom_prefilter(
    df: DataFrame,
    bloom: DataFrame,
    key: Column | str,
    m_bits: int = 1 << 23,
    k: int = 2,
) -> DataFrame:
    """Keep only rows whose ``key`` the bloom (from ``bloom_build`` with
    the SAME m_bits/k) may contain: k broadcast hash joins on the probe
    words + bit-AND filters, all map-side relative to ``df``."""
    key = F.col(key) if isinstance(key, str) else key
    out = df
    for i in range(k):
        w, mask = _word_and_mask(_probe_position(key, m_bits, i))
        side = bloom.select(
            F.col("_w").alias(f"_bw{i}"), F.col("_bits").alias(f"_bb{i}")
        )
        out = (
            out.join(F.broadcast(side), w == F.col(f"_bw{i}"))
            .filter(mask.bitwiseAND(F.col(f"_bb{i}")) != 0)
            .drop(f"_bw{i}", f"_bb{i}")
        )
    return out
