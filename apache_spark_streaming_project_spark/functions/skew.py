"""Skew-mitigation utilities (SURVEY.md §4 scale notes).

Spark's partial aggregation already absorbs most aggregation skew (each map
task pre-combines before the shuffle), and AQE splits skewed JOIN partitions
at runtime. The remaining hard case is an operation that must see all rows
of one key in one task with no partial step — high-cardinality aggregates
(collect_list, exact distinct counts per key) and windowed ops — when one
key holds a disproportionate share of rows.

The standard fix is SALTING: spread each key over ``n_salts`` synthetic
sub-keys, do the heavy work per (key, salt), then combine the per-salt
partials per key. Two shuffles, but the first — the expensive one carrying
all rows — is evenly spread.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Add a uniform random salt in [0, n_salts). Salting is a physical
    spreading device only — it must never appear in results."""
    return df.withColumn(
        salt_col, (F.rand(seed=42) * n_salts).cast("int")
    )


def salted_distinct_count(
    df: DataFrame, key_col: str, value_col: str, n_salts: int = 16
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT value) robust to key skew.

    Stage 1 dedups on (key, value) — partitioning by the VALUE alongside
    the key is salting with the value itself as the salt (the limit of
    hash(value) % n_salts as n_salts grows), so a hot key's rows spread
    over every task and a hot (key, value) pair collapses in the
    map-side partial aggregate before the exchange. Stage 2 counts the
    surviving rows per key — also partial-aggregated, so the final task
    receives small per-partition counts, never rows.

    Count semantics: DISTINCT ignores NULL values, so stage 2 counts
    ``value_col`` (not ``*``) — the (key, NULL) survivor must not count.

    This formulation replaced a collect_set-per-(key, salt) + merge
    design whose final stage materialized the ENTIRE per-key distinct
    set as one array in one task — at hot-key distinct cardinality that
    is an OOM/2 GB-array wall, the exact funnel this function exists to
    avoid. Nothing here holds more than a hash-aggregate bucket's worth
    of state per task. ``n_salts`` is kept for API stability; the
    value-as-salt rewrite has no knob to tune."""
    dedup = df.select(key_col, value_col).distinct()
    return dedup.groupBy(key_col).agg(
        F.count(value_col).alias("n_distinct")
    )


def salted_collect_list(
    df: DataFrame, key_col: str, value_col: str, n_salts: int = 16
) -> DataFrame:
    """Per-key collect_list that never funnels a hot key's full row set
    through one task's memory in the row-holding stage. Order within the
    list is not defined (matches plain collect_list)."""
    salted = with_salt(df.select(key_col, value_col), n_salts)
    partial = salted.groupBy(key_col, "_salt").agg(
        F.collect_list(value_col).alias("_part")
    )
    return partial.groupBy(key_col).agg(
        F.flatten(F.collect_list("_part")).alias("values")
    )
