"""The driver-facing query registry.

Every implemented operator from SURVEY.md §2 is registered here as a
``QuerySpec``: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus the
equivalent ANSI SQL for the DuckDB oracle (or ``None`` for genuinely
non-SQL-expressible ops -> rows-only check). ``__spark_entry__.py`` re-exports
this registry verbatim.

Conventions (driver contract):
  * every computed column is aliased IDENTICALLY in the Spark plan and the
    oracle SQL (the driver sorts columns by name before value-hashing);
  * float outputs use the exact-decimal formulations from
    ``functions.exact`` so both engines produce bit-identical doubles;
  * top-k queries carry a unique tie-break key so results are deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_spark_streaming_project_spark.functions.exact import (
    avg_exact,
    avg_exact_sql,
    stddev_exact,
    stddev_exact_sql,
    sum_money,
    sum_money_sql,
)
from apache_spark_streaming_project_spark.operators import enrich
from apache_spark_streaming_project_spark.schemas import load_table


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None -> rows-only check
    survey_ids: tuple[str, ...] = field(default=())  # SURVEY.md §2 rows covered


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None, *survey_ids: str):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, sql=sql, survey_ids=tuple(survey_ids))
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# S25 — flagship: grouped multi-agg (occupation-stats shape on orders)
# reference spark_streaming.py:177-181
# ---------------------------------------------------------------------------


@register(
    "s25_priority_stats",
    """
    SELECT o_orderpriority,
           {avg_total} AS avg_total,
           {std_total} AS stddev_total,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """.format(
        avg_total=avg_exact_sql("o_totalprice"),
        std_total=stddev_exact_sql("o_totalprice"),
    ),
    "S25",
)
def s25_priority_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship S25 analogue: per-priority avg/stddev of o_totalprice + count.

    Plan shape: parquet scan (2 cols pruned) -> partial HashAggregate ->
    exchange on o_orderpriority (5 keys) -> final HashAggregate. Map-side
    combine makes the shuffle O(partitions x 5) rows at any scale.
    """
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            avg_exact("o_totalprice", out_alias="avg_total"),
            stddev_exact("o_totalprice", out_alias="stddev_total"),
            F.count("*").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# S19 — global multi-aggregate summary (reference spark_streaming.py:78-87)
# ---------------------------------------------------------------------------


@register(
    "s19_lineitem_summary",
    """
    SELECT {avg_qty} AS avg_qty,
           {std_qty} AS stddev_qty,
           {avg_price} AS avg_price,
           {std_price} AS stddev_price,
           {avg_disc} AS avg_disc,
           {std_disc} AS stddev_disc,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    """.format(
        avg_qty=avg_exact_sql("l_quantity"),
        std_qty=stddev_exact_sql("l_quantity"),
        avg_price=avg_exact_sql("l_extendedprice"),
        std_price=stddev_exact_sql("l_extendedprice"),
        avg_disc=avg_exact_sql("l_discount"),
        std_disc=stddev_exact_sql("l_discount"),
    ),
    "S19",
)
def s19_lineitem_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S19 analogue: one-row global summary over lineitem (mean/stddev of
    quantity, extendedprice, discount; min/max quantity; row count)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        avg_exact("l_quantity", out_alias="avg_qty"),
        stddev_exact("l_quantity", out_alias="stddev_qty"),
        avg_exact("l_extendedprice", out_alias="avg_price"),
        stddev_exact("l_extendedprice", out_alias="stddev_price"),
        avg_exact("l_discount", out_alias="avg_disc"),
        stddev_exact("l_discount", out_alias="stddev_disc"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count("*").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# S9-S12 — CASE-WHEN bucketing projections (reference spark_streaming.py:51-69)
# surfaced as grouped counts so the full enrichment is oracle-checked
# ---------------------------------------------------------------------------

_QUANTITY_BUCKET_SQL = """
    CASE WHEN l_quantity < 10 THEN 'Q1 (<10)'
         WHEN l_quantity < 25 THEN 'Q2 (10-24)'
         WHEN l_quantity < 40 THEN 'Q3 (25-39)'
         ELSE 'Q4 (40+)' END
"""

_TOTALPRICE_BUCKET_SQL = """
    CASE WHEN o_totalprice < 50000 THEN 'Low (<50K)'
         WHEN o_totalprice < 150000 THEN 'Mid (50K-150K)'
         ELSE 'High (150K+)' END
"""


@register(
    "s21_quantity_bucket_counts",
    f"""
    SELECT {_QUANTITY_BUCKET_SQL} AS quantity_bucket, COUNT(*) AS count
    FROM lineitem GROUP BY 1
    """,
    "S9",
    "S21",
)
def s21_quantity_bucket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9+S21 analogue: CASE bucketing of l_quantity -> groupBy().count().
    Mirrors age_group distribution (reference spark_streaming.py:51-56,131)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.withColumn("quantity_bucket", enrich.quantity_bucket())
        .groupBy("quantity_bucket")
        .count()
    )


@register(
    "s20_totalprice_bucket_counts",
    f"""
    SELECT {_TOTALPRICE_BUCKET_SQL} AS totalprice_bucket, COUNT(*) AS count
    FROM orders GROUP BY 1
    """,
    "S10",
    "S12",
    "S20",
)
def s20_totalprice_bucket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10/S12+S20 analogue: price-band bucketing -> counts. Mirrors
    income_category distribution (reference spark_streaming.py:57-59,94)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn("totalprice_bucket", enrich.totalprice_bucket())
        .groupBy("totalprice_bucket")
        .count()
    )


@register(
    "s22_crosstab_counts",
    f"""
    SELECT o_orderstatus, {_TOTALPRICE_BUCKET_SQL} AS totalprice_bucket,
           COUNT(*) AS count
    FROM orders GROUP BY 1, 2
    """,
    "S22",
    "S23",
)
def s22_crosstab_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S22/S23 analogue: 2-key cross-tab (status x price band). Mirrors
    education x income / gender x income (reference spark_streaming.py:142,154)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn("totalprice_bucket", enrich.totalprice_bucket())
        .groupBy("o_orderstatus", "totalprice_bucket")
        .count()
    )


@register(
    "s24_returnflag_linestatus_counts",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS count,
           {sum_qty} AS sum_qty
    FROM lineitem GROUP BY 1, 2
    """.format(sum_qty=sum_money_sql("l_quantity")),
    "S24",
)
def s24_returnflag_linestatus_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S24 analogue: grouped counts + exact sum (returnflag x linestatus)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("count"),
        sum_money("l_quantity", out_alias="sum_qty"),
    )
