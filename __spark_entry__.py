"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The actual registry lives in
``apache_spark_streaming_project_spark/entry_queries.py`` — one ``QuerySpec``
per implemented SURVEY.md §2 operator, pairing the Spark callable with its
DuckDB oracle SQL so the two stay in sync.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from apache_spark_streaming_project_spark.entry_queries import QUERIES  # noqa: E402

_FLAGSHIP = "s25_priority_stats"
_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (S25 grouped multi-agg) on /root/testdata/sf0.001."""
    return QUERIES[_FLAGSHIP].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted for non-SQL-expressible ops."""
    return {name: spec.sql for name, spec in QUERIES.items() if spec.sql is not None}
