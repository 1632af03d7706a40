"""Scale probe: partition-pruned merge vs flat full-rewrite merge.

Measures the claim behind ``merge_batch_into_partitioned_table``: per-merge
cost is O(touched_buckets/n_buckets x table + batch), where a batch of B
uniformly-hashed distinct keys touches ~min(B, n_buckets) buckets. The
flat merge is O(table) regardless of batch size. So the pruned path wins
exactly when the per-batch key count is small relative to n_buckets (the
typical CDC/streaming-upsert regime: hundreds of keys per micro-batch
into a table bucketed 256-4096 ways), and converges to flat cost as B
approaches n_buckets — sizing guidance, not magic.

Usage:  python tools/probe_upsert_scale.py [n_rows] [n_buckets]
Prints a markdown table of merge wall times; results recorded in
BASELINE.md.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from apache_spark_streaming_project_spark import get_spark  # noqa: E402
from apache_spark_streaming_project_spark.streaming.upsert import (  # noqa: E402
    merge_batch_into_partitioned_table,
    merge_batch_into_table,
)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spark = get_spark()
    base_dir = tempfile.mkdtemp(prefix="probe_upsert_")
    flat = f"{base_dir}/flat"
    part = f"{base_dir}/part"

    base = spark.range(n_rows).select(
        F.col("id").alias("k"),
        F.lit(1).alias("version"),
        F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
    )
    t0 = time.monotonic()
    merge_batch_into_table(base, flat, ["k"], "version")
    t_flat_build = time.monotonic() - t0
    t0 = time.monotonic()
    merge_batch_into_partitioned_table(
        base, part, ["k"], "version", n_buckets=n_buckets
    )
    t_part_build = time.monotonic() - t0
    print(
        f"table build: {n_rows} rows — flat {t_flat_build:.1f}s, "
        f"bucketed({n_buckets}) {t_part_build:.1f}s"
    )
    print()
    print(f"| batch keys B | touched buckets | pruned merge s | flat merge s |")
    print(f"|---|---|---|---|")
    for b in (8, 64, 512, 4096):
        batch = spark.range(b).select(
            (F.col("id") * 104_729 % n_rows).alias("k"),  # spread keys
            F.lit(2).alias("version"),
            F.concat(F.lit("v2-"), F.col("id")).alias("payload"),
        )
        t0 = time.monotonic()
        touched = merge_batch_into_partitioned_table(
            batch, part, ["k"], "version", n_buckets=n_buckets
        )
        t_pruned = time.monotonic() - t0
        t0 = time.monotonic()
        merge_batch_into_table(batch, flat, ["k"], "version")
        t_flat = time.monotonic() - t0
        print(f"| {b} | {len(touched)}/{n_buckets} | {t_pruned:.1f} | {t_flat:.1f} |")

    shutil.rmtree(base_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
