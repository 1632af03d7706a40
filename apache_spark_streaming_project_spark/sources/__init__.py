"""Batch & streaming sources (S1/G1 contracts, SURVEY.md §2.1)."""

from apache_spark_streaming_project_spark.sources.files import (
    read_census_stream,
    read_file_stream,
    read_rate_stream,
)

__all__ = ["read_census_stream", "read_file_stream", "read_rate_stream"]
