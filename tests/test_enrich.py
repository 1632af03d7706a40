"""Unit tests for the S8-S12 enrichment operators — hand-computed boundary
values pin the reference's branch-order semantics (first strict ``<`` wins:
reference spark_streaming.py:51-69; FIXTURES.md edge-value list)."""

from __future__ import annotations

from pyspark.sql import Row

from apache_spark_streaming_project_spark.operators.enrich import enrich_census
from apache_spark_streaming_project_spark.schemas import CENSUS_SCHEMA


def _census_row(**overrides):
    base = dict(
        age=30,
        workclass="Private",
        education="Bachelors",
        marital_status="Never-married",
        occupation="Tech-support",
        relationship="Not-in-family",
        race="White",
        gender="Female",
        capital_gain=0,
        capital_loss=0,
        hours_per_week=40,
        native_country="United-States",
        income=0,
        capital_income=0,
    )
    base.update(overrides)
    return Row(**base)


def test_age_group_boundaries(spark):
    rows = [_census_row(age=a) for a in [17, 18, 29, 30, 44, 45, 64, 65, None]]
    df = spark.createDataFrame(rows, CENSUS_SCHEMA)
    got = {r.age: r.age_group for r in enrich_census(df).collect()}
    assert got[17] == "Under 18"
    assert got[18] == "18-29"
    assert got[29] == "18-29"
    assert got[30] == "30-44"
    assert got[44] == "30-44"
    assert got[45] == "45-64"
    assert got[64] == "45-64"
    assert got[65] == "65+"
    assert got[None] == "65+"  # null falls through every when() — matches reference


def test_work_hours_boundary_20_is_fulltime(spark):
    rows = [_census_row(hours_per_week=h) for h in [19, 20, 40, 41]]
    df = spark.createDataFrame(rows, CENSUS_SCHEMA)
    got = {r.hours_per_week: r.work_hours_category for r in enrich_census(df).collect()}
    assert got[19] == "Part-time (<20)"
    assert got[20] == "Full-time (20-40)"  # strict < then <= (reference :60-63)
    assert got[40] == "Full-time (20-40)"
    assert got[41] == "Overtime (>40)"


def test_income_and_capital_buckets(spark):
    rows = [
        _census_row(income=1, capital_income=-1),
        _census_row(income=0, capital_income=0),
        _census_row(income=1, capital_income=4999),
        _census_row(income=0, capital_income=5000),
        _census_row(income=0, capital_income=19999),
        _census_row(income=0, capital_income=20000),
    ]
    df = spark.createDataFrame(rows, CENSUS_SCHEMA)
    out = enrich_census(df).collect()
    incomes = [r.income_category for r in out]
    caps = [r.capital_income_category for r in out]
    assert incomes == [
        "High Income (>50K)",
        "Low Income (<=50K)",
        "High Income (>50K)",
        "Low Income (<=50K)",
        "Low Income (<=50K)",
        "Low Income (<=50K)",
    ]
    assert caps == ["Loss", "Break-even", "Low Gain", "Medium Gain", "Medium Gain", "High Gain"]


def test_timestamp_added(spark):
    df = spark.createDataFrame([_census_row()], CENSUS_SCHEMA)
    out = enrich_census(df)
    assert dict(out.dtypes)["timestamp"] == "timestamp"
