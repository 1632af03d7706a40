"""Sink truncation utility (S7 — reference reset_database.py:9-37 drops the
8 Mongo collections; here result tables are parquet directories, so reset =
remove table dirs + the checkpoint so the next run starts from offset zero)."""

from __future__ import annotations

import shutil
from pathlib import Path

from apache_spark_streaming_project_spark.schemas import RESULT_TABLES


def reset_results(output_dir: str, checkpoint_dir: str | None = None) -> list[str]:
    """Delete all result-table directories (and optionally the checkpoint).
    Returns the paths removed."""
    removed = []
    for name in RESULT_TABLES:
        p = Path(output_dir) / name
        if p.exists():
            shutil.rmtree(p)
            removed.append(str(p))
    if checkpoint_dir and Path(checkpoint_dir).exists():
        shutil.rmtree(checkpoint_dir)
        removed.append(checkpoint_dir)
    return removed
