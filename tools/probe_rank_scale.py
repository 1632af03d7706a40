"""Decade probe for partitioned_global_ranks (round-11 verdict item 5).

At each scale, the SAME five global rank columns (row_number, rank,
dense_rank via the API's outputs, percent_rank, cume_dist, ntile 10)
are computed two ways over a deterministic synthetic keyed table
(spark.range + xxhash64-derived value, ~1k-way value ties at every
scale):

  * single  — the textbook single-partition global window
              (ROW_NUMBER/RANK/... OVER (ORDER BY v, id)); the shape
              that cannot survive scale-up.
  * composed — partitioned_global_ranks: sketch cuts -> per-bucket
              windows (parallel) -> broadcast prefix offsets.

Equality of the two outputs is pinned by tests/test_rank.py and the
s_rank_distributions_partitioned oracle registration; this probe
records the WALL-CLOCK law only. Timing is a noop-format write; run
alone (quiet-bench rule).

Usage: python tools/probe_rank_scale.py [out_json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SCALES = [("1x", 1_500_000), ("10x", 15_000_000), ("100x", 150_000_000)]


def synth(spark, n):
    # ~n/1000 distinct values -> ~1000-way ties at every scale, so the
    # tie-containment path (rank/dense_rank/cume) is always exercised.
    return spark.range(n).select(
        F.col("id"),
        (F.pmod(F.xxhash64("id"), F.lit(n // 1000))).alias("v"),
    )


def run_single(df):
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    return df.select(
        "id",
        F.row_number().over(w).alias("row_number"),
        F.rank().over(w).alias("rank"),
        F.dense_rank().over(w).alias("dense_rank"),
        F.percent_rank().over(w).alias("percent_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
        F.ntile(10).over(w).alias("ntile"),
    )


def run_composed(df):
    from apache_spark_streaming_project_spark.operators.rank import (
        partitioned_global_ranks,
    )

    return partitioned_global_ranks(
        df, "v", tiebreak_cols=["id"], num_buckets=64, ntile=10
    )


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "tools/probe_rank_scale.json"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe_rank_scale")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for label, n in SCALES:
        row = {"scale": label, "rows": n}
        for name, runner in (("composed", run_composed), ("single", run_single)):
            df = synth(spark, n)
            t0 = time.monotonic()
            runner(df).write.format("noop").mode("overwrite").save()
            row[name] = round(time.monotonic() - t0, 2)
        row["speedup"] = round(row["single"] / row["composed"], 2)
        results.append(row)
        print(row, flush=True)

    Path(out_path).write_text(json.dumps(results, indent=1))
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
