"""Enrichment projections: S8-S12 (SURVEY.md §2.2).

The reference widens every census row with a processing-time timestamp and
four CASE-WHEN categorical bucketings (reference spark_streaming.py:49-69).
Branch-order semantics are preserved exactly: first strict ``<`` branch wins,
so boundary values fall into the *later* bucket (e.g. age 18 -> "18-29",
hours 20 -> "Full-time (20-40)").

All expressions are built-in ``when/otherwise`` chains — Catalyst folds the
literals and fuses the whole projection into one WholeStageCodegen span; zero
Python in the row path, so this scales to any input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def age_group(c: Column | str = "age") -> Column:
    """S9 — 5-way age bucketing (reference spark_streaming.py:51-56)."""
    c = F.col(c) if isinstance(c, str) else c
    return (
        F.when(c < 18, "Under 18")
        .when(c < 30, "18-29")
        .when(c < 45, "30-44")
        .when(c < 65, "45-64")
        .otherwise("65+")
    )


def income_category(c: Column | str = "income") -> Column:
    """S10 — binarized income label (reference spark_streaming.py:57-59)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.when(c == 1, "High Income (>50K)").otherwise("Low Income (<=50K)")


def work_hours_category(c: Column | str = "hours_per_week") -> Column:
    """S11 — hours bucketing; note 20 is Full-time: strict ``<`` then ``<=``
    (reference spark_streaming.py:60-63)."""
    c = F.col(c) if isinstance(c, str) else c
    return (
        F.when(c < 20, "Part-time (<20)")
        .when(c <= 40, "Full-time (20-40)")
        .otherwise("Overtime (>40)")
    )


def capital_income_category(c: Column | str = "capital_income") -> Column:
    """S12 — 5-way capital bucketing incl. Loss branch (reference
    spark_streaming.py:64-69)."""
    c = F.col(c) if isinstance(c, str) else c
    return (
        F.when(c < 0, "Loss")
        .when(c == 0, "Break-even")
        .when(c < 5000, "Low Gain")
        .when(c < 20000, "Medium Gain")
        .otherwise("High Gain")
    )


def enrich_census(df: DataFrame) -> DataFrame:
    """S8-S12 — the full enrichment projection: processing-time ``timestamp``
    + four categorical columns (reference spark_streaming.py:49-69)."""
    return (
        df.withColumn("timestamp", F.current_timestamp())
        .withColumn("age_group", age_group())
        .withColumn("income_category", income_category())
        .withColumn("work_hours_category", work_hours_category())
        .withColumn("capital_income_category", capital_income_category())
    )


# --- Testdata analogues (FIXTURES.md §C bucketing contract) -----------------
# Same CASE-WHEN shape on the driver's star schema so the bucketing operators
# are oracle-checkable: l_quantity at {<10, <25, <40, else} and o_totalprice
# at {<50k, <150k, else} mirror the census boundary semantics.


def quantity_bucket(c: Column | str = "l_quantity") -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return (
        F.when(c < 10, "Q1 (<10)")
        .when(c < 25, "Q2 (10-24)")
        .when(c < 40, "Q3 (25-39)")
        .otherwise("Q4 (40+)")
    )


def totalprice_bucket(c: Column | str = "o_totalprice") -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return (
        F.when(c < 50_000, "Low (<50K)")
        .when(c < 150_000, "Mid (50K-150K)")
        .otherwise("High (150K+)")
    )
