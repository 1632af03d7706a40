"""Python Data Source API connector tests (sources/pydatasource.py)."""

from __future__ import annotations

from apache_spark_streaming_project_spark.sources.pydatasource import (
    SyntheticCorpusDataSource,
    synthetic_row,
)


def _register(spark):
    try:
        spark.dataSource.register(SyntheticCorpusDataSource)
    except Exception:
        pass  # already registered in this session


def test_custom_source_rows_match_contract(spark):
    _register(spark)
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
    _register(spark)
    df = (
        spark.read.format("synthetic_corpus")
        .option("rows", 1000)
        .option("numPartitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
