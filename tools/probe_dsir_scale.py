"""Decade probe for the round-11 registration: DSIR importance
resampling (operators/sampling.py:dsir_importance_weights/dsir_select)
— every new operator registers with a measured 1x/10x/100x law.

Cost centers: one map-side hashed-gram explosion carrying (id, pos,
bucket:int); two partial-aggregated bucket counts (result <= num_buckets
rows each, so the exchanges are bounded by the feature-space size, NOT
the corpus); a broadcast join of the <= 4096-row lambda table back onto
the gram stream; one per-document regroup. Expected law: linear in
total grams — the lambda table is corpus-size-independent by
construction, so the only component that grows is the map-side stream
and the per-doc regroup.

The replica corpus (make_10x_testdata.py) suffixes every token per
copy, so gram strings never collide across copies: the bucket
HISTOGRAM stays realistic (more distinct grams hashing into the same
4096 buckets) while each copy's internal structure is isomorphic to
the original — exactly the growth mode a crawl corpus exhibits.

Timing is a noop-format write of the full weights table plus the
top-25 select. Run alone (quiet-bench rule).

Usage: python tools/probe_dsir_scale.py [out_json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

DIRS = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", "/tmp/sf1.0-10x"),
    ("100x", "/tmp/sf10.0-100x"),
]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "tools/probe_dsir_scale.json"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe_dsir_scale")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from apache_spark_streaming_project_spark.operators.sampling import (
        dsir_importance_weights,
        dsir_select,
    )

    results = []
    for label, d in DIRS:
        p = Path(d) / "documents.parquet"
        if not p.exists():
            print(f"skip {label}: {p} missing")
            continue
        docs = spark.read.parquet(str(p)).select("doc_id", "text", "lang")
        n = docs.count()
        is_en = F.col("lang") == F.lit("en")
        t0 = time.monotonic()
        dsir_importance_weights(docs, is_en).write.format("noop").mode(
            "overwrite"
        ).save()
        w_wall = round(time.monotonic() - t0, 1)
        t0 = time.monotonic()
        top = dsir_select(docs, is_en, 25).collect()
        s_wall = round(time.monotonic() - t0, 1)
        row = {
            "scale": label,
            "n_docs": n,
            "weights_wall_s": w_wall,
            "select_wall_s": s_wall,
            "top1_doc": top[0]["doc_id"] if top else None,
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    Path(out_path).write_text(json.dumps(results, indent=1))
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
