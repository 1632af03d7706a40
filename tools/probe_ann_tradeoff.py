"""ANN quality/latency trade-off probe: IVF-PQ nprobe sweep.

Measures the knob every ANN deployment has to turn: recall@10 vs query
wall time as ``nprobe`` grows (more coarse cells scanned -> more
candidates -> higher recall, more work). Runs over the planted corpus
(the regime ANN indexes exist for — the raw synthetic embeddings are
isotropic noise where no sublinear structure can beat a scan) with exact
brute force as ground truth. Results recorded in BASELINE.md.

Usage:  python tools/probe_ann_tradeoff.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from apache_spark_streaming_project_spark import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    from apache_spark_streaming_project_spark.entry_queries import (
        _planted_corpus,
    )
    from apache_spark_streaming_project_spark.operators.similarity import (
        brute_force_top_k,
        ivfpq_index,
        ivfpq_top_k,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [
        float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    corpus = _planted_corpus(e).cache()
    n = corpus.count()

    t0 = time.monotonic()
    indexed, coarse, books = ivfpq_index(
        corpus, n_centroids=16, m=4, pq_centroids=32
    )
    indexed = indexed.cache()
    indexed.count()
    t_build = time.monotonic() - t0

    exact_ids = {r.vec_id for r in brute_force_top_k(corpus, qvec, k=10).collect()}
    t0 = time.monotonic()
    brute_force_top_k(corpus, qvec, k=10).collect()
    t_exact = time.monotonic() - t0

    print(f"corpus {n} vectors; index build {t_build:.1f}s; exact query {t_exact:.2f}s")
    print()
    print("| nprobe | recall@10 | median query s |")
    print("|---|---|---|")
    for nprobe in (1, 2, 4, 8, 16):
        times, hits = [], 0
        for _ in range(3):
            t0 = time.monotonic()
            got = {
                r.vec_id
                for r in ivfpq_top_k(
                    indexed, coarse, books, qvec, k=10, nprobe=nprobe
                ).collect()
            }
            times.append(time.monotonic() - t0)
        hits = len(got & exact_ids)
        print(f"| {nprobe}/16 | {hits}/10 | {sorted(times)[1]:.2f} |")


if __name__ == "__main__":
    main()
