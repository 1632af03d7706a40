"""Per-epoch cost law for the streaming CONTAINMENT dedup (m19's batch
body) at 10x: the per-shingle inverted index grows by one row per
(doc, distinct 8-gram) every epoch — the heaviest store any of the
streaming dedup modes carries. The 100 TB claim is that each batch pays
its own gram count plus hash-bucketed probes of the index, NOT a scan
that grows linearly with corpus lifetime. This probe times each of N
equal epochs over the 10x documents corpus and reports per-epoch
seconds alongside the gram-index size it probed.

Usage: python tools/probe_containment_epochs.py [docs_parquet] [epochs]
Writes tools/probe_containment_epochs.json.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else (
        "/tmp/sf1.0-10x/documents.parquet"
    )
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from apache_spark_streaming_project_spark import get_spark
    from apache_spark_streaming_project_spark.operators.dedup import (
        streaming_containment_dedup_batch,
    )

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="contain_epochs_")
    gram, text = f"{base}/gram", f"{base}/text"
    docs = spark.read.parquet(src).select(
        "doc_id", (F.col("doc_id") % epochs).alias("epoch"), "text"
    ).persist()
    docs.count()

    rows = []
    for i in range(epochs):
        t0 = time.time()
        streaming_containment_dedup_batch(
            docs.filter(F.col("epoch") == i), gram, text, 0.6, i
        )
        dt = time.time() - t0
        idx_rows = (spark.read.option("recursiveFileLookup", "true")
                    .parquet(gram).count())
        rows.append({"epoch": i, "seconds": round(dt, 2),
                     "index_rows_after": idx_rows})
        print(rows[-1])

    secs = [r["seconds"] for r in rows]
    k = min(3, len(secs))  # window clamps for short runs; guard 0-div
    report = {
        "src": src, "epochs": epochs, "per_epoch": rows,
        "first3_mean_s": round(sum(secs[:k]) / k, 2),
        "last3_mean_s": round(sum(secs[-k:]) / k, 2),
    }
    report["last3_over_first3"] = round(
        report["last3_mean_s"] / max(report["first3_mean_s"], 1e-9), 2
    )
    print(json.dumps({k: v for k, v in report.items() if k != "per_epoch"}))
    (REPO / "tools" / "probe_containment_epochs.json").write_text(
        json.dumps(report, indent=2) + "\n"
    )


if __name__ == "__main__":
    main()
