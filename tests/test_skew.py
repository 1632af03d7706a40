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


def test_aqe_skew_join_split_activates(spark):
    """AQE skew-join EVIDENCE (not just a claim): a planted hot key holding
    20% of the fact rows joins a uniform dim; with sort-merge forced and
    the skew thresholds scaled to fixture bytes, the final adaptive plan
    must carry the `skew=true` SortMergeJoin marker — Spark split the hot
    partition into parallel subtasks — and the join result must be exactly
    what the unskewed semantics demand. This is the runtime mechanism the
    LSH/dedup scale notes lean on for residual bucket skew."""
    conf = spark.conf
    overrides = {
        # force SMJ (skew split does not apply to broadcast joins)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # scale skew detection down to fixture size (defaults: 256MB)
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        # enough partitions that the hot key dominates its partition
        # (with very few partitions the skew hides inside the median)
        "spark.sql.shuffle.partitions": "32",
    }
    saved = {k: conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            conf.set(k, v)
        n = 200_000
        fact = spark.range(n).select(
            F.when(F.col("id") % 5 == 0, 0)
            .otherwise(F.col("id"))
            .alias("k"),  # key 0 = 20% of all rows
            F.rpad(F.concat(F.lit("payload-"), F.col("id")), 100, "x").alias(
                "pad"
            ),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("d")
        )
        joined = fact.join(dim, "k")
        # collect() executes THIS DataFrame's queryExecution, so the
        # adaptive plan below is the finalized one (count() would build a
        # separate aggregate query and leave this plan unexecuted)
        got = len(joined.collect())
        # expected: hot key 0 -> n/5 rows; cold keys 1..999 not divisible
        # by 5 -> one row each
        cold = sum(1 for i in range(1, 1000) if i % 5 != 0)
        assert got == n // 5 + cold
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
