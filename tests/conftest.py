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
