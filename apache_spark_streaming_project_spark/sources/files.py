"""Streaming file sources (S1, SURVEY.md §2.1).

The reference tails a directory of headerless CSV micro-batch files with a
declared 14-column schema and positional binding (reference
spark_streaming.py:43-46). Same built-in here, plus json/parquet variants and
the ``rate`` source for load tests. Streaming file sources REQUIRE a declared
schema; none of these ever infer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from apache_spark_streaming_project_spark.schemas import CENSUS_SCHEMA


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "csv",
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """Directory-tailing streaming source. ``max_files_per_trigger`` is the
    backpressure knob the reference leaves unset (SURVEY.md §2.9) — at scale
    it bounds per-batch work so one slow trigger can't snowball."""
    reader = spark.readStream.schema(schema).format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "false")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_census_stream(
    spark: SparkSession, input_dir: str, fmt: str = "csv", **kwargs
) -> DataFrame:
    """S1 — the census stream: headerless CSV files, positional binding to
    the declared 14-col schema (reference spark_streaming.py:43-46)."""
    return read_file_stream(spark, input_dir, CENSUS_SCHEMA, fmt, **kwargs)


def read_rate_stream(
    spark: SparkSession, rows_per_second: int = 100, num_partitions: int | None = None
) -> DataFrame:
    """Built-in ``rate`` source — (timestamp, value) rows for throughput and
    lifecycle tests with no filesystem dependency."""
    reader = (
        spark.readStream.format("rate").option("rowsPerSecond", str(rows_per_second))
    )
    if num_partitions is not None:
        reader = reader.option("numPartitions", str(num_partitions))
    return reader.load()
