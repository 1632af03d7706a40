"""Shared pytest fixtures: one session-scoped SparkSession (local mode,
small parallelism for fast startup) and sf0.001 testdata paths."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from apache_spark_streaming_project_spark import get_spark

    spark = get_spark("tests", cpus=4, shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def store_rows(spark, store: str):
    """Recursive-lookup read of a batch-keyed store, as sorted row
    tuples — the read-side contract of operators/dedup._read_store /
    entry_queries._read_batch_store, spelled ONCE for every test that
    compares store contents (store-layout changes edit here, not in
    each suite)."""
    return sorted(
        map(
            tuple,
            spark.read.option("recursiveFileLookup", "true")
            .parquet(store)
            .collect(),
        )
    )


def store_kept(spark, store: str, key: str = "doc_id"):
    """Kept-set view of a dedup text/vec store: sorted (key, epoch)
    pairs where kept is true."""
    from pyspark.sql import functions as F

    return sorted(
        (r[key], r["epoch"])
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(store)
        .filter(F.col("kept"))
        .collect()
    )
