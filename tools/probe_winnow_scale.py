"""Decade probe for the round-11 registration: winnowing fingerprints
(Schleimer et al. 2003; operators/text.py winnow_fingerprints /
winnow_shared_pairs) — every new operator registers with a measured
1x/10x/100x law.

Cost centers: fingerprinting is pure map-side interpreted-HOF work
(O(chars * k) encoded-gram hashing + O(windows) native array_min picks
per document — see the encoding note in the operator; HOFs do not
enter whole-stage codegen, which is why this is the cost to watch);
the pairs stage adds a distinct, the document-frequency cap aggregate,
and the postings self-join whose per-hash lists are bounded by
``max_fp_df``. Expected law: linear in total chars for fingerprints;
~linear for pairs while the df cap holds the posting lists flat (the
suffix-replica corpus multiplies DISTINCT grams, not per-gram
frequency, so caps bite exactly as at 1x).

Timing is a noop-format write. Run alone (quiet-bench rule).

Usage: python tools/probe_winnow_scale.py [out_json]
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
        sys.argv[1] if len(sys.argv) > 1 else "tools/probe_winnow_scale.json"
    )
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe_winnow_scale")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from apache_spark_streaming_project_spark.operators.text import (
        winnow_fingerprints,
        winnow_shared_pairs,
    )

    results = []
    for label, d in DIRS:
        p = Path(d) / "documents.parquet"
        if not p.exists():
            print(f"skip {label}: {p} missing")
            continue
        docs = (
            spark.read.parquet(str(p)).select("doc_id", "text").repartition(64)
        )
        n = docs.count()
        t0 = time.monotonic()
        winnow_fingerprints(docs, k=8, w=5).write.format("noop").mode(
            "overwrite"
        ).save()
        fp_wall = round(time.monotonic() - t0, 1)
        t0 = time.monotonic()
        winnow_shared_pairs(
            docs, k=8, w=5, min_shared=25, max_fp_df=50
        ).write.format("noop").mode("overwrite").save()
        pair_wall = round(time.monotonic() - t0, 1)
        row = {
            "scale": label,
            "n_docs": n,
            "fingerprints_wall_s": fp_wall,
            "shared_pairs_wall_s": pair_wall,
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    Path(out_path).write_text(json.dumps(results, indent=1))
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
