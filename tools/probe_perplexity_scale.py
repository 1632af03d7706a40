"""Decade probe for the round-10 registration: perplexity_buckets
(CCNet head/middle/tail bucketing over the corpus-trained bigram LM) —
every new operator registers with a measured 1x/10x/100x law.

Measures BOTH bucketing modes over the isomorphic replica corpora
(tools/make_10x_testdata.py): the default exact mode (per-language
ntile — a per-language sort) and the approx_thresholds scale mode
(percentile_approx sketch cuts + map-side compare, no total order).
The expected shape: cost is dominated by the shared bigram-LM stage
(shuffles keyed on token pairs, ~linear in tokens); the mode delta
measures what the per-language sort costs on top, which is the number
that justifies the approx mode's existence for single-language corpora.

Timing is a noop-format write. Run alone (quiet-bench rule).

Usage: python tools/probe_perplexity_scale.py [out_json]
Scale dirs: /root/testdata/sf0.1, /tmp/sf1.0-10x, /tmp/sf10.0-100x
(regenerate the replicas with tools/make_10x_testdata.py if absent).
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
        sys.argv[1] if len(sys.argv) > 1 else "tools/probe_perplexity_scale.json"
    )
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe_perplexity_scale")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from apache_spark_streaming_project_spark.operators.text import (
        perplexity_buckets,
    )

    results = []
    for label, d in DIRS:
        p = Path(d) / "documents.parquet"
        if not p.exists():
            print(f"skip {label}: {p} missing")
            continue
        docs = spark.read.parquet(str(p)).select("doc_id", "lang", "text")
        n = docs.count()
        row = {"scale": label, "n_docs": n}
        for mode, approx in (("exact_ntile", False), ("approx_cuts", True)):
            t0 = time.monotonic()
            perplexity_buckets(
                docs, "doc_id", "text", lang_col="lang",
                approx_thresholds=approx,
            ).write.format("noop").mode("overwrite").save()
            row[mode + "_s"] = round(time.monotonic() - t0, 1)
        results.append(row)
        print(json.dumps(row), flush=True)
    Path(out_path).write_text(json.dumps(results, indent=1))
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
