"""Streaming MERGE/upsert sink (S2 x X1 composition, no reference
counterpart — reference sinks are append-only Mongo insert loops,
spark_streaming.py:99-197): each micro-batch UPSERTS into a parquet
"table" via ``foreachBatch``, keeping the NEWEST version per key — the
continuously-maintained corpus table every incremental ingest pipeline
ends in (the streaming face of ``operators/dedup.merge_upsert`` /
``x1_incremental_dedup``).

Semantics are keep-max-version (upsert-if-newer), NOT last-batch-wins:
the merge is a ranking window over (current table UNION batch) ordered by
the version column, so the result is

  * ORDER-INDEPENDENT — micro-batch boundaries and file arrival order
    cannot change the outcome (file sources order by modification time,
    which is not a contract);
  * IDEMPOTENT under batch replay — re-merging an already-applied batch
    reproduces the identical table, which is exactly the guarantee
    ``foreachBatch`` needs for effective exactly-once on top of its
    at-least-once delivery.

Scale notes: without a table format each merge rewrites the table
(O(table + batch) per batch — the honest cost of upsert-on-parquet; a
Delta/Iceberg MERGE INTO touches only matching files, and this sink is
the drop-in seam for one). The swap is write-to-staging + directory
rename, so readers never observe a half-written table; a crash between
renames is healed by the next replayed batch (idempotence above).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from apache_spark_streaming_project_spark.operators.dedup import (
    latest_version_dedup,
)


def merge_batch_into_table(
    batch_df: DataFrame,
    table_dir: str,
    key_cols: list[str],
    version_col: str,
    staging_suffix: str = ".staging",
) -> None:
    """One MERGE step: (current table UNION batch) -> newest version per
    key -> atomic swap into ``table_dir``. Exposed separately from the
    streaming writer so batch backfills use the identical code path."""
    spark = batch_df.sparkSession
    if os.path.exists(table_dir):
        current = spark.read.parquet(table_dir)
        candidates = current.unionByName(batch_df)
    else:
        candidates = batch_df
    merged = latest_version_dedup(
        candidates, key_cols, [F.col(version_col).desc()]
    )
    staging = table_dir + staging_suffix
    merged.write.mode("overwrite").parquet(staging)
    retired = table_dir + ".retired"
    shutil.rmtree(retired, ignore_errors=True)
    if os.path.exists(table_dir):
        os.rename(table_dir, retired)
    os.rename(staging, table_dir)
    shutil.rmtree(retired, ignore_errors=True)


def streaming_merge_upsert(
    stream_df: DataFrame,
    table_dir: str,
    key_cols: list[str],
    version_col: str,
    checkpoint_dir: str,
) -> DataStreamWriter:
    """``foreachBatch`` writer that maintains ``table_dir`` as the
    newest-version-per-key table over the change stream. Caller starts it
    (typically ``.trigger(availableNow=True).start()``)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_table(
            batch_df, table_dir, key_cols, version_col,
            staging_suffix=f".staging-{batch_id}",
        )

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
