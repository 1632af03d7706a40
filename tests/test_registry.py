"""Registry-integrity meta-tests: the driver's correctness gate hashes
Spark and oracle results after sorting columns BY NAME, so a column-name
mismatch between a query and its oracle SQL silently degrades into a
schema-mismatch red row. These tests catch that class statically — every
oracle's projected column names must equal the Spark DataFrame's columns —
plus basic registry hygiene (unique names, known survey-ID shapes)."""

from __future__ import annotations

import re

import duckdb
import pytest

from apache_spark_streaming_project_spark.entry_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents"
    " embeddings"
).split()

# These queries EXECUTE inside their builder (streaming drains over temp
# checkpoints) — their oracles are exercised end-to-end by the oracle gate
# instead of schema-compared here.
EXECUTING = {
    "m3_streaming_parity",
    "m3_simulator_contract",
    "m5_stream_stream_join",
    "m5_stream_stream_left_outer",
    "m6_streaming_dedup",
    "m7_streaming_sessions",
    "m12_streaming_sessions",
    "m13_streaming_kmv",
    "m14_streaming_lsh_dedup",
    "m8_streaming_tumbling",
    "m4_stateful_running_anomalies",
    "j5_bucketed_cojoin",
}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def test_names_unique_and_sane():
    assert len(QUERIES) == len(set(QUERIES))
    for name in QUERIES:
        assert re.fullmatch(r"[a-z0-9_]+", name), name


def test_survey_ids_match_known_families():
    pat = re.compile(r"(S\d+|G\d+|D\d+a?|X\d+|M\d+|§[\d.]+)")
    for name, spec in QUERIES.items():
        for sid in spec.survey_ids:
            assert pat.fullmatch(sid), (name, sid)


def test_oracle_columns_match_spark_columns(spark, duck):
    """For every oracle-bearing, non-executing query: DuckDB's projected
    column names (DESCRIBE, no execution) must equal the Spark schema's
    columns as a set — the exact precondition of the driver's
    sorted-by-name value hash."""
    mismatches = []
    for name, spec in QUERIES.items():
        if spec.sql is None or name in EXECUTING:
            continue
        oracle_cols = [r[0] for r in duck.execute(
            f"DESCRIBE {spec.sql}"
        ).fetchall()]
        spark_cols = spec.fn(spark, SF_DIR).columns
        if sorted(oracle_cols) != sorted(spark_cols):
            mismatches.append((name, sorted(oracle_cols), sorted(spark_cols)))
    assert not mismatches, mismatches


def test_mutation_catalog_is_not_stale():
    """Every mutation-audit catalog entry must still match the source it
    targets (three entries went silently stale across refactors before
    round 11; this pins the static check into the suite)."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, str(repo / "tools" / "mutation_audit.py"), "--check"],
        capture_output=True,
        text=True,
    )
    if r.returncode == 2:
        # Distinct skip code: a full audit is live and sources are
        # transiently mutated. Mapping this to SKIPPED (not PASSED)
        # keeps the gate honest — rc 0 now always means "checked clean".
        pytest.skip("full mutation audit in progress: " + r.stdout.strip())
    assert r.returncode == 0, r.stdout + r.stderr
