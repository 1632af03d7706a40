"""Probe the two round-7 full-registry scale-bench flags (ratio > 10x
at 10x data, tools/scale_tabulate.py) and measure the law that governs
each, so BASELINE.md records numbers instead of arguments:

1. x_semantic_dedup (10.5x): the registered query pins n_centroids=16
   for oracle determinism, so at 10x corpus each IVF cell holds 10x the
   vectors and the per-cell exact Gram matrix
   (similarity.blocked_cosine_join, O(b^2 d) per block) grows ~100x from
   a small base. The SemDeDup scale law is cells ∝ N (constant
   occupancy). This probe runs the full query shape (plant near-copies,
   ivf_index n_assign=2, blocked cosine join at 0.95, connected
   components, representative count) on the 10x corpus at n_centroids in
   {16, 64, 160} — 160 cells at 10x reproduces the registered query's 1x
   occupancy, so its time should fall back to ~the 1x time plus the
   linear map-only stages, with recall intact (planted pairs found and
   survivor count unchanged — near-copies share their original's cell at
   any cell count).

2. x4_sequence_packing (10.2x): the registered query exercises the
   global-window pack_documents (one single-partition cumulative-sum
   sort — fine for bounded exports, the WindowExec warning in every gate
   log). 10.2x at 10x data IS the expected n log n of that shape; the
   scale path is partition_col=... (packs local to each shard, window
   partitioned, differentially tested in tests/test_text.py). This probe
   times both variants on the 10x documents table.

Usage: python tools/probe_scale_flags.py [sf_dir_10x] [sf_dir_1x]
Defaults: /tmp/sf1.0-10x /root/testdata/sf0.1
Run alone (quiet-bench rule: no concurrent Spark work).
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

RUNS = 3


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def semantic_shape(spark, sf_dir: str, n_centroids: int) -> tuple[float, int, int]:
    """The x_semantic_dedup query shape (entry_queries.py) with the cell
    count as the variable. Returns (median_sec, pair_count, survivors)."""
    from apache_spark_streaming_project_spark.operators.dedup import (
        dedup_keep_representatives,
    )
    from apache_spark_streaming_project_spark.operators.similarity import (
        blocked_cosine_join,
        ivf_index,
    )

    times = []
    pair_count = survivors = -1
    for _ in range(RUNS):
        t0 = time.monotonic()
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        planted = e.select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: (
                    x + 0.003 * F.sin(F.col("vec_id") * 13 + i)
                ).cast("float"),
            ).alias("embedding"),
        )
        corpus = e.unionByName(planted)
        assigned, _ = ivf_index(corpus, n_centroids=n_centroids, n_assign=2)
        pairs = blocked_cosine_join(
            assigned,
            key_col="vec_id",
            vec_col="embedding",
            block_col="centroid_id",
            threshold=0.95,
        ).select("id_a", "id_b")
        surv = dedup_keep_representatives(
            corpus, pairs, "vec_id", key_a="id_a", key_b="id_b"
        ).select("vec_id")
        _noop(surv)
        times.append(time.monotonic() - t0)
        if pair_count < 0:  # recall sanity once, outside the timed loop
            pair_count = pairs.count()
            survivors = surv.count()
    return statistics.median(times), pair_count, survivors


def packing_shape(spark, sf_dir: str, partition_col: str | None) -> float:
    from apache_spark_streaming_project_spark.operators.text import (
        pack_documents,
        token_count,
    )

    times = []
    for _ in range(RUNS):
        t0 = time.monotonic()
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        d = d.withColumn("n_tokens", token_count(F.col("text")))
        packed = pack_documents(
            d, "n_tokens", budget=2048, order_col="doc_id",
            partition_col=partition_col,
        )
        _noop(
            packed.groupBy("pack_id").agg(
                F.count("*").alias("docs"),
                F.sum("n_tokens").alias("tokens"),
            )
        )
        times.append(time.monotonic() - t0)
    return statistics.median(times)


def main() -> None:
    big = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0-10x"
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from apache_spark_streaming_project_spark import get_spark

    spark = get_spark("probe_scale_flags")
    # warm-up (session + parquet footers), as bench.py does
    for p in ("embeddings", "documents"):
        spark.read.parquet(f"{big}/{p}.parquet").limit(1).count()
        spark.read.parquet(f"{base}/{p}.parquet").limit(1).count()

    print(f"== semantic dedup cell-count law (RUNS={RUNS}, median) ==")
    t, pairs, surv = semantic_shape(spark, base, 16)
    print(f"1x  corpus, n_centroids=16 : {t:6.2f} s  pairs={pairs} survivors={surv}")
    for k in (16, 64, 160):
        t, pairs, surv = semantic_shape(spark, big, k)
        print(
            f"10x corpus, n_centroids={k:<3}: {t:6.2f} s  "
            f"pairs={pairs} survivors={surv}"
        )

    print(f"\n== sequence packing window law (RUNS={RUNS}, median) ==")
    for sf_dir, tag in ((base, "1x "), (big, "10x")):
        tg = packing_shape(spark, sf_dir, None)
        tp = packing_shape(spark, sf_dir, "lang")
        print(f"{tag} global-window: {tg:6.2f} s   partitioned(lang): {tp:6.2f} s")


if __name__ == "__main__":
    main()
