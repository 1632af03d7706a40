"""Decade probe for the round-10 registration: gopher_repetition_flags_df
(the Gopher/MassiveText repetition filter table) — every new operator
registers with a measured 1x/10x/100x law.

The dominant cost is the 9-way n-gram explosion (n=2..10 -> ~9 rows per
token) followed by the (doc, n, gram)-keyed count agg; everything else
(line/paragraph stats) is map-side array arithmetic. Expected law:
~linear in total tokens, explosion-bound.

Timing is a noop-format write over the full output (integer skeleton +
flags). Run alone (quiet-bench rule).

Usage: python tools/probe_repetition_scale.py [out_json]
Scale dirs: /root/testdata/sf0.1, /tmp/sf1.0-10x, /tmp/sf10.0-100x
(regenerate replicas with tools/make_10x_testdata.py if absent).
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
    out_path = (
        sys.argv[1] if len(sys.argv) > 1 else "tools/probe_repetition_scale.json"
    )
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe_repetition_scale")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from apache_spark_streaming_project_spark.operators.text import (
        gopher_repetition_flags_df,
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
        gopher_repetition_flags_df(docs).write.format("noop").mode(
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
