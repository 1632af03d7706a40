"""Decade scale probe (1x -> 10x -> 100x) for text.remove_common_lines —
the round-8 operator with the least obvious scale profile: posexplode
multiplies corpus rows by line count, the line document-frequency table is
corpus-wide (distinct + agg exchanges carry LINE STRINGS in exact mode),
and re-assembly does a groupBy collect_list per doc.

Measures BOTH key modes at each scale:
  * exact      — df table + anti-join keyed on the trimmed line text
                 (byte-exact, zero collision risk; the default)
  * fingerprint — keyed on xxhash64(trimmed line): the corpus-wide
                 distinct/agg exchanges carry 8-byte keys instead of
                 strings (output equality with exact mode is pinned by
                 tests/test_text.py::test_fingerprint_variant_matches_exact)

Inputs are the same isomorphic replicas the registry-wide 10x bench uses
(tools/make_10x_testdata.py, documents subset). Each document gets the
registered x4_remove_common_lines decoration: two all-corpus banners
(df = N), one every-5th-doc banner (df = N/5), a short immune separator,
three text-derived content lines — so banner df GROWS with the corpus,
exactly like real crawl boilerplate.

Runs per scale: 3 / 3 / 1 (median reported); run alone (quiet-bench rule).
Usage: python tools/probe_remove_common_lines.py [dir_1x] [dir_10x] [dir_100x]
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402


def decorated(spark, sf_dir: str):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    text2 = F.concat_ws(
        "\n",
        F.lit("SUBSCRIBE TO OUR NEWSLETTER TODAY"),
        F.substring(F.col("text"), 1, 60),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit("FOLLOW US ON SOCIAL MEDIA")
        ).otherwise(F.substring(F.col("text"), 61, 60)),
        F.lit("--"),
        F.substring(F.col("text"), 21, 60),
        F.lit("COPYRIGHT 2024 EXAMPLE CORP ALL RIGHTS RESERVED"),
    )
    return d.select("doc_id", text2.alias("text"))


def main() -> None:
    d1 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    d10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0-10x"
    d100 = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf10.0-100x"
    scales = [(d1, "1x", 3), (d10, "10x", 3), (d100, "100x", 1)]

    from apache_spark_streaming_project_spark import get_spark
    from apache_spark_streaming_project_spark.operators.text import (
        remove_common_lines,
    )

    spark = get_spark("probe_remove_common_lines")
    for sf_dir, _, _ in scales:
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(1).count()

    for mode, fp in (("exact", False), ("fingerprint", True)):
        print(f"== remove_common_lines, {mode} line keys ==")
        for sf_dir, tag, runs in scales:
            times = []
            n_docs = n_out = None
            for _ in range(runs):
                t0 = time.monotonic()
                out = remove_common_lines(
                    decorated(spark, sf_dir),
                    "doc_id",
                    "text",
                    min_df=10,
                    min_line_chars=8,
                    fingerprint=fp,
                )
                out.write.format("noop").mode("overwrite").save()
                times.append(time.monotonic() - t0)
            n_docs = spark.read.parquet(
                f"{sf_dir}/documents.parquet"
            ).count()
            n_out = out.count()
            med = statistics.median(times)
            print(
                f"{tag:>4}: {med:7.2f} s  docs={n_docs} out_rows={n_out} "
                f"{'OK' if n_out == n_docs else 'ROW-COUNT MISMATCH'}"
            )


if __name__ == "__main__":
    main()
