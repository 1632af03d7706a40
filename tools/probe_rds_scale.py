"""Decade probe for the round-10 registration: remove_duplicate_spans
(Lee et al. ExactSubstr removal) — every new operator registers with a
measured 1x/10x/100x law.

The cost centers: one map-side gram explosion (1 row per token), one
corpus-global count agg on 8-byte gram hashes, the occurrence join
back, per-doc islands windows, and the map-side rebuild. Expected law:
~linear in tokens; the corpus-global gram-count exchange is the piece
to watch under replica growth (gram cardinality grows ~linearly in the
replica construction, so partial aggregation keeps it linear).

Timing is a noop-format write. Run alone (quiet-bench rule).

Usage: python tools/probe_rds_scale.py [out_json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession  # noqa: E402

DIRS = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", "/tmp/sf1.0-10x"),
    ("100x", "/tmp/sf10.0-100x"),
]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "tools/probe_rds_scale.json"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe_rds_scale")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from apache_spark_streaming_project_spark.operators.text import (
        remove_duplicate_spans,
    )

    results = []
    for label, d in DIRS:
        p = Path(d) / "documents.parquet"
        if not p.exists():
            print(f"skip {label}: {p} missing")
            continue
        docs = spark.read.parquet(str(p)).select("doc_id", "text")
        n = docs.count()
        t0 = time.monotonic()
        remove_duplicate_spans(docs, n=8).write.format("noop").mode(
            "overwrite"
        ).save()
        row = {
            "scale": label,
            "n_docs": n,
            "wall_s": round(time.monotonic() - t0, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    Path(out_path).write_text(json.dumps(results, indent=1))
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
