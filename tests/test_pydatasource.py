"""Python Data Source API connector tests (sources/pydatasource.py)."""

from __future__ import annotations

import pytest

from apache_spark_streaming_project_spark.sources.pydatasource import (
    SyntheticCorpusDataSource,
    synthetic_row,
)


def test_custom_source_rows_match_contract(spark):
    spark.dataSource.register(SyntheticCorpusDataSource)
    df = (
        spark.read.format("synthetic_corpus")
        .option("rows", 50)
        .option("numPartitions", 3)
        .load()
    )
    got = {
        (r.doc_id, r.text, r.lang, r.n_tokens) for r in df.collect()
    }
    want = {synthetic_row(i) for i in range(50)}
    assert got == want


def test_custom_source_partition_planning(spark):
    """The source must plan its own input partitions: numPartitions slices
    of the id range, visible as task parallelism in the scan RDD."""
    spark.dataSource.register(SyntheticCorpusDataSource)
    df = (
        spark.read.format("synthetic_corpus")
        .option("rows", 1000)
        .option("numPartitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000


def test_reregistration_is_safe_and_broken_source_fails_loudly(spark):
    """Registration semantics the entry queries rely on (after dropping
    the old `except Exception: pass` guards): (1) re-registering the same
    source is a safe replace in Spark 4 — no exception, reads still work;
    (2) a BROKEN source is not silently swallowed — Spark surfaces the
    failure at query time (registration itself is lazy by design)."""
    spark.dataSource.register(SyntheticCorpusDataSource)
    spark.dataSource.register(SyntheticCorpusDataSource)  # replace, no raise
    assert (
        spark.read.format("synthetic_corpus").option("rows", 5).load().count()
        == 5
    )

    from pyspark.sql.datasource import DataSource

    class BrokenSource(DataSource):
        @classmethod
        def name(cls):
            return "broken_source_under_test"

        # no schema()/reader(): unusable on purpose

    spark.dataSource.register(BrokenSource)  # lazy: registration accepts it
    with pytest.raises(Exception):  # ...but the failure is loud at read time
        spark.read.format("broken_source_under_test").load().collect()
