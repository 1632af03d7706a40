"""Unit tests for S19-S25 aggregates — tiny hand-computed inputs plus a
statistics cross-check against Python's statistics module."""

from __future__ import annotations

import statistics

import pytest
from pyspark.sql import Row

from apache_spark_streaming_project_spark.operators.aggregates import (
    grouped_counts,
    occupation_stats,
    summary_statistics,
)
from apache_spark_streaming_project_spark.operators.enrich import enrich_census
from apache_spark_streaming_project_spark.schemas import CENSUS_SCHEMA


@pytest.fixture(scope="module")
def census_df(spark):
    rows = [
        Row(
            age=a,
            workclass="Private",
            education="Bachelors",
            marital_status="Never-married",
            occupation=occ,
            relationship="Not-in-family",
            race="White",
            gender="Female" if a % 2 else "Male",
            capital_gain=0,
            capital_loss=0,
            hours_per_week=h,
            native_country="United-States",
            income=1 if a > 40 else 0,
            capital_income=0,
        )
        for a, h, occ in [
            (25, 40, "Tech-support"),
            (35, 50, "Tech-support"),
            (45, 20, "Sales"),
            (55, 60, "Sales"),
            (65, 10, "Sales"),
        ]
    ]
    return spark.createDataFrame(rows, CENSUS_SCHEMA)


def test_summary_statistics_matches_python(census_df):
    row = summary_statistics(enrich_census(census_df)).collect()[0]
    ages = [25, 35, 45, 55, 65]
    hours = [40, 50, 20, 60, 10]
    assert row.avg_age == pytest.approx(statistics.mean(ages), abs=1e-12)
    assert row.stddev_age == pytest.approx(statistics.stdev(ages), abs=1e-9)
    assert row.avg_hours == pytest.approx(statistics.mean(hours), abs=1e-12)
    assert row.stddev_hours == pytest.approx(statistics.stdev(hours), abs=1e-9)
    assert row.min_age == 25 and row.max_age == 65


def test_grouped_counts(census_df):
    out = {
        r.income_category: r["count"]
        for r in grouped_counts(enrich_census(census_df), "income_category").collect()
    }
    assert out == {"High Income (>50K)": 3, "Low Income (<=50K)": 2}


def test_occupation_stats(census_df):
    out = {r.occupation: r for r in occupation_stats(enrich_census(census_df)).collect()}
    assert out["Tech-support"]["count"] == 2
    assert out["Tech-support"]["avg_age"] == pytest.approx(30.0)
    assert out["Sales"]["avg_hours"] == pytest.approx(30.0)
