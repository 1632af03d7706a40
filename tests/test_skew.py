"""Salted-aggregation tests: results must equal the unsalted formulation on
skewed data, and the heavy first shuffle must key on (key, salt)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_spark_streaming_project_spark.functions.skew import (
    salted_collect_list,
    salted_distinct_count,
)


def _skewed_df(spark):
    # one hot key with 5000 rows, 50 cold keys with 10 each
    hot = spark.range(5000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).alias("v")
    )
    cold = spark.range(500).select(
        F.concat(F.lit("c"), (F.col("id") % 50)).alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    return hot.unionAll(cold)


def test_salted_distinct_count_matches_plain(spark):
    df = _skewed_df(spark)
    got = {
        r["k"]: r["n_distinct"]
        for r in salted_distinct_count(df, "k", "v").collect()
    }
    expect = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == expect
    assert got["hot"] == 97


def test_salted_collect_list_matches_plain_as_multiset(spark):
    df = _skewed_df(spark)
    got = {
        r["k"]: sorted(r["values"])
        for r in salted_collect_list(df, "k", "v").collect()
    }
    expect = {
        r["k"]: sorted(r["vs"])
        for r in df.groupBy("k").agg(F.collect_list("v").alias("vs")).collect()
    }
    assert got == expect


def test_salt_spreads_hot_key(spark):
    from apache_spark_streaming_project_spark.functions.skew import with_salt

    df = with_salt(_skewed_df(spark), n_salts=16)
    per_salt = (
        df.filter(F.col("k") == "hot").groupBy("_salt").count().collect()
    )
    assert len(per_salt) == 16  # every salt bucket used
    assert max(r["count"] for r in per_salt) < 5000 * 0.2  # no bucket hogs
