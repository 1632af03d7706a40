"""Bucketed-table layout for co-located joins (scale path, SURVEY.md §4.4).

A shuffle on the join key is the dominant cost of any large fact-fact join.
Writing both tables bucketed (hash-partitioned into N files) AND sorted by
the join key lets Spark's planner prove both sides are already co-located:
the join compiles to SortMergeJoin with ZERO Exchange operators — each task
zips bucket i of A with bucket i of B straight off storage.

This is the storage-layout decision that matters most at 100 TB: pay the
shuffle once at write time, never again for any join/aggregation on the
bucket key. (Bucketed writes require the session catalog / `saveAsTable`;
plain `parquet(path)` writes cannot carry bucket metadata.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sorted_by: str | None = None,
    partition_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-within-bucket)
    managed table. ``n_buckets`` should divide evenly into the cluster's
    task parallelism; each bucket should target 100-500 MB at scale.

    ``partition_cols`` is the orthogonal axis: low-cardinality columns
    (date, region) become directories for partition PRUNING, while
    bucketing handles the high-cardinality join key.

    ``path`` makes the table EXTERNAL at that location — use it when the
    session's warehouse dir isn't yours to write (bucket metadata lives
    in the catalog either way)."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w = w.bucketBy(n_buckets, bucket_col)
    if sorted_by:
        w = w.sortBy(sorted_by)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def cojoin_bucketed(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two identically-bucketed tables on the bucket key. With equal
    bucket counts the plan has no Exchange (verify with
    plans.inspect.count_shuffles == 0)."""
    return spark.table(left_table).join(spark.table(right_table), on)
