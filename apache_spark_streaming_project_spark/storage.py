"""Physical table layout for scale: bucketed/partitioned writes.

At 100 TB the dominant cost of a fact-fact join (lineitem x orders) is the
shuffle. Spark's answer is BUCKETED tables: write both sides hash-bucketed
(and optionally sorted) by the join key, and Catalyst plans the join with
ZERO exchanges — each task zips bucket i of both tables. The bucket count
is a provisioning decision like the streaming state-store partition count:
pick buckets ~= cluster cores x small factor, and keep it IDENTICAL on
both sides (mismatched counts fall back to a shuffle on one side).

Partitioned writes (``partition_cols``) are the orthogonal axis: low-
cardinality columns (date, region) become directories for partition
PRUNING, while bucketing handles high-cardinality join keys. The
epoch-partitioned streaming sinks (streaming/pipeline.py) use the same
mechanism for idempotent replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted / partitioned)
    parquet table in the session catalog. Sorted buckets additionally let
    the join skip its per-task sort (SortMergeJoin reads presorted runs).
    """
    w = df.write.mode(mode).format("parquet")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w = w.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
