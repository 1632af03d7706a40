"""Bucketed-layout tests: a join of two identically-bucketed tables must
plan with ZERO Exchange operators — the pay-the-shuffle-once-at-write-time
contract that co-located joins depend on at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_spark_streaming_project_spark.plans.inspect import (
    count_shuffles,
    physical_plan,
)
from apache_spark_streaming_project_spark.schemas import load_table
from apache_spark_streaming_project_spark.sources.bucketed import (
    cojoin_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(orders, "b_orders", "o_orderkey", 4, sorted_by="o_orderkey")
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", 4, sorted_by="o_orderkey")
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the co-location (not the small size) carries it
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cojoin_bucketed(spark, lt, rt, "o_orderkey")
        plan = physical_plan(joined, "simple")
        assert "SortMergeJoin" in plan
        assert count_shuffles(joined) == 0, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_results_match_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    got = cojoin_bucketed(spark, lt, rt, "o_orderkey").count()
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    expect = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert got == expect


def test_groupby_on_bucket_key_has_no_shuffle(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("o_orderkey").agg(F.sum("o_totalprice"))
    assert count_shuffles(agg) == 0
