"""Data-layout operators: multi-dimensional clustering for data skipping.

At 100 TB the cheapest query is the one that never reads a file: parquet
footers carry per-file min/max for every column, and a scan skips files
whose ranges exclude the predicate. A single-column sort gives perfect
skipping on ONE column and none on the others; interleaving the bits of
several columns into one Morton (Z-order) sort key bounds EVERY
interleaved column's per-file extent — the trade behind Delta/Iceberg's
OPTIMIZE ZORDER. This module provides the key expression; writing is the
caller's ``repartitionByRange(zorder_key(...)).write`` (the same
repartition-before-write recipe x7_partitioned_export uses).

Everything is integer bit arithmetic on JVM built-ins (shiftleft /
shiftright / bitwiseAND / bitwiseOR) — codegen'd, zero Python, and
bit-for-bit mirrorable in any engine (the x7_zorder_clustering oracle
recomputes the identical interleave in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton/Z-order interleave of the low ``bits`` bits of 2-4
    integer columns into one BIGINT sort key: column ``j`` occupies bit
    positions ``j, j+n, j+2n, ...`` (LSB-first), so equal prefixes of
    the key correspond to multi-dimensional quadrants.

    Inputs should be NON-NEGATIVE and < 2**bits — normalize first (rank,
    modulo, or offset-by-min); values outside that range are masked to
    their low ``bits`` bits (deterministic wrap, never an error), which
    destroys locality but not correctness of the sort. NULLs propagate
    to a NULL key (sort them explicitly with asc_nulls_first/last).

    ``bits * len(cols)`` must fit a signed 64-bit key (<= 62)."""
    n = len(cols)
    if not 2 <= n <= 4:
        raise ValueError(f"zorder_key interleaves 2-4 columns (got {n})")
    if bits < 1 or bits * n > 62:
        raise ValueError(
            f"bits * n_cols must be in [1, 62] (got {bits} * {n})"
        )
    mask = (1 << bits) - 1
    xs = [
        (F.col(c) if isinstance(c, str) else c)
        .cast("long")
        .bitwiseAND(F.lit(mask))
        for c in cols
    ]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, x in enumerate(xs):
            bit = F.shiftright(x, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def cluster_extents(
    df, bucket: Column, cols: list[str], layout: str
):
    """Per-bucket (max - min) extent of each column under a candidate
    layout, rolled up to one row: (layout, n_buckets, sum_ext_<col>...).
    The data-skipping quality metric for a layout: a file (bucket) with
    a small extent on a column can be pruned by predicates on it; the
    SUM of extents is what a uniform point predicate's expected scan
    cost is proportional to. Exact integer arithmetic end to end."""
    per_bucket = df.groupBy(bucket.alias("_b")).agg(
        *[
            (F.max(c) - F.min(c)).alias(f"_ext_{c}")
            for c in cols
        ]
    )
    return per_bucket.agg(
        F.lit(layout).alias("layout"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        *[
            F.sum(f"_ext_{c}").cast("bigint").alias(f"sum_ext_{c}")
            for c in cols
        ],
    )
