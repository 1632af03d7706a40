"""Two-decade scale probe (1x -> 10x -> 100x) for the heavyweight
dedup/ANN operators — the rows that dominate the full-registry 10x
bench (BASELINE.md "Round-7 evidence"). The 10x bench showed every
operator at-or-below linear over ONE decade; this probe extends the
strongest scale claims one more decade on a 100x isomorphic replica
(tools/make_10x_testdata.py with the documents,embeddings subset:
500k docs / 200k vectors), with each operator's documented scale knob
grown per its law:

  * MinHash(32)+LSH(8 bands) planted-recall shape (x_minhash_lsh_pairs,
    registered params at every scale): banding buckets are exact band
    values, random-pair collisions ~ J^4 per band ~ 0 — no knob needed;
    expect ~linear in characters.
  * SimHash(64) pigeonhole shape (x_simhash_pairs, registered params):
    4 blocks of 16 bits -> random-pair candidates ~ 4 * N^2 / 2^17 — the
    quadratic residue the block WIDTH bounds; at N=1M fingerprints this
    term first becomes visible. Measured here so the law is recorded,
    not argued.
  * SemDeDup shape (x_semantic_dedup) with cells ∝ N (16/160/1600) and
    the training sample grown with k: constant cell occupancy -> the
    per-cell Gram term is flat; expect ~linear.
  * Banded hyperplane LSH near-dups (x_embedding_near_dups) with band
    width grown with log2(N) (32 planes/8-bit bands at 1x and 10x — the
    registered params — and 64 planes/16-bit bands at 100x): keeps
    bucket occupancy ~constant; recall of the planted cosine-0.9999
    pairs at 16-bit bands is 1-(1-p^16)^4 ~ 0.99998, so a handful of
    misses in 200k planted pairs is the DESIGN, reported not asserted.

Runs: RUNS per scale (default 3, 1 at 100x — runs are minutes long and
relative jitter is small); reported time is the median. Run alone
(quiet-bench rule).

Usage: python tools/probe_decade_scale.py [dir_1x] [dir_10x] [dir_100x]
Defaults: /root/testdata/sf0.1 /tmp/sf1.0-10x /tmp/sf10.0-100x
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn, runs: int):
    times = []
    out = None
    for _ in range(runs):
        t0 = time.monotonic()
        out = fn()
        times.append(time.monotonic() - t0)
    return statistics.median(times), out


def registered_shape(spark, name: str, sf_dir: str, runs: int):
    from apache_spark_streaming_project_spark.entry_queries import QUERIES

    def run():
        df = QUERIES[name].fn(spark, sf_dir)
        rows = df.collect()  # contract outputs are 1-row aggregates
        return rows

    return timed(run, runs)


def semantic_shape(
    spark, sf_dir: str, n_centroids: int, runs: int, quantizer: str = "ivf"
):
    """quantizer='ivf' is the flat coarse quantizer (assignment O(N*k));
    'imi' is the two-level product quantizer (same cell count from
    k' = sqrt(k) centroids per half, assignment O(N*sqrt(k)))."""
    from apache_spark_streaming_project_spark.operators.dedup import (
        dedup_keep_representatives,
    )
    from apache_spark_streaming_project_spark.operators.similarity import (
        blocked_cosine_join,
        imi_index,
        ivf_index,
    )

    def run():
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
        if quantizer == "imi":
            k_half = int(round(n_centroids**0.5))
            assigned, _ = imi_index(
                corpus,
                n_cells_per_half=k_half,
                n_assign=2,
                max_train_rows=max(10_000, 25 * n_centroids),
            )
        else:
            assigned, _ = ivf_index(
                corpus,
                n_centroids=n_centroids,
                n_assign=2,
                max_train_rows=max(10_000, 25 * n_centroids),
            )
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
        return surv

    med, surv = timed(run, runs)
    return med, surv.count()


def near_dup_shape(spark, sf_dir: str, n_planes: int, runs: int):
    from apache_spark_streaming_project_spark.operators.dedup import (
        embedding_near_dups,
    )

    def run():
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        perturbed = e.select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x + 0.005 * F.sin(F.col("vec_id") * 31 + i),
            ).alias("embedding"),
        )
        pairs = embedding_near_dups(
            e.unionAll(perturbed), n_planes=n_planes, bands=4
        ).select("key_a", "key_b")
        _noop(pairs)
        return pairs

    med, pairs = timed(run, runs)
    e_keys = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id"
    )
    n_vec = e_keys.count()
    # TRUE planted recall: found pairs semi-joined against the known
    # (id, id + 10^7) planted set — a raw pairs.count() would let
    # spurious pairs (pre-existing near-dups, copy-copy) mask misses
    planted = e_keys.select(
        F.col("vec_id").alias("key_a"),
        (F.col("vec_id") + 10_000_000).alias("key_b"),
    )
    found_planted = planted.join(pairs, ["key_a", "key_b"], "left_semi").count()
    spurious = pairs.count() - found_planted
    return med, found_planted, spurious, n_vec


def main() -> None:
    d1 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    d10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0-10x"
    d100 = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf10.0-100x"
    scales = [(d1, "1x", 3), (d10, "10x", 3), (d100, "100x", 1)]

    from apache_spark_streaming_project_spark import get_spark

    spark = get_spark("probe_decade_scale")
    for sf_dir, _, _ in scales:
        for t in ("documents", "embeddings"):
            spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).count()

    for name in ("x_minhash_lsh_pairs", "x_simhash_pairs"):
        print(f"== {name} (registered shape) ==")
        for sf_dir, tag, runs in scales:
            med, rows = registered_shape(spark, name, sf_dir, runs)
            print(f"{tag:>4}: {med:7.2f} s  contract={rows[0].asDict()}")

    print("== semantic dedup, cells ∝ N ==")
    for (sf_dir, tag, runs), k in zip(scales, (16, 160, 1600)):
        med, surv = semantic_shape(spark, sf_dir, k, runs)
        print(f"{tag:>4} n_centroids={k:<4}: {med:7.2f} s  survivors={surv}")

    # the O(N*k) assignment remedy: same 1600 cells at 100x from two
    # 40-centroid half codebooks (similarity.imi_index)
    print("== semantic dedup at 100x, IMI product cells (k' = 40) ==")
    med, surv = semantic_shape(spark, d100, 1600, 1, quantizer="imi")
    print(f"100x imi 40x40 cells : {med:7.2f} s  survivors={surv}")

    print("== embedding near-dups, band width ∝ log2 N ==")
    for (sf_dir, tag, runs), planes in zip(scales, (32, 32, 64)):
        med, found, spurious, n_vec = near_dup_shape(spark, sf_dir, planes, runs)
        print(
            f"{tag:>4} n_planes={planes:<2}: {med:7.2f} s  "
            f"planted={n_vec} found={found} recall={found / n_vec:.5f} "
            f"spurious={spurious}"
        )


if __name__ == "__main__":
    main()
