"""Bucketed-table layout: the fact-fact join must plan with ZERO exchanges
when both sides are bucketed on the join key with equal bucket counts —
the co-location strategy for 100 TB fact joins."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from apache_spark_streaming_project_spark.plans import (
    count_shuffles,
    physical_plan,
)
from apache_spark_streaming_project_spark.schemas import load_table
from apache_spark_streaming_project_spark.storage import (
    drop_table,
    write_bucketed,
)


@pytest.fixture()
def bucketed_pair(spark, sf_dir):
    sfx = uuid.uuid4().hex[:8]
    t_orders, t_li = f"orders_b_{sfx}", f"lineitem_b_{sfx}"
    write_bucketed(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        ),
        t_orders,
        ["o_orderkey"],
        n_buckets=4,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        ),
        t_li,
        ["l_orderkey"],
        n_buckets=4,
        sort_cols=["l_orderkey"],
    )
    yield t_orders, t_li
    drop_table(spark, t_orders)
    drop_table(spark, t_li)


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    t_orders, t_li = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(t_orders)
        li = spark.table(t_li)
        joined = li.join(
            o, li.l_orderkey == o.o_orderkey
        ).groupBy("o_orderkey").agg(F.sum("l_extendedprice").alias("rev"))
        plan = physical_plan(joined, "simple")
        assert "SortMergeJoin" in plan
        # the join itself is exchange-free (bucket co-location); the only
        # allowed shuffle would be a downstream agg, but o_orderkey is the
        # bucket key so even the groupBy reuses the bucketing -> zero
        assert count_shuffles(joined) == 0, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
