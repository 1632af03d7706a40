"""Measure the round-8 salted_distinct_count rewrite on a genuinely
skewed corpus — the repo rule is measure-remedies-before-claiming-them.

Corpus: one HOT key holding `hot_rows` rows over `hot_distinct` distinct
values plus 15 cold keys; the old formulation must flatten the hot key's
entire distinct set (hot_distinct values) into one task's array, the new
one never materializes a set. Compares three formulations for time and
(exact) agreement:

  old   - groupBy(key, rand-salt) collect_set -> flatten/array_distinct/size
  new   - (key, value) distinct -> partial-aggregated count  (shipped)
  plain - groupBy(key).agg(countDistinct(value))             (reference)

Usage: python tools/probe_salted_distinct.py [hot_rows] [hot_distinct]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main() -> None:
    from apache_spark_streaming_project_spark import get_spark
    from apache_spark_streaming_project_spark.functions.skew import (
        salted_distinct_count,
        with_salt,
    )

    hot_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    hot_distinct = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark("probe-salted-distinct")

    hot = spark.range(hot_rows).select(
        F.lit("hot").alias("k"), (F.col("id") % hot_distinct).alias("v")
    )
    cold = spark.range(150_000).select(
        F.concat(F.lit("cold"), (F.col("id") % 15)).alias("k"),
        (F.col("id") % 10_000).alias("v"),
    )
    df = hot.unionByName(cold).cache()
    df.count()  # materialize once so every formulation reads the same input

    def old_formulation(d, key_col, value_col, n_salts=16):
        salted = with_salt(d.select(key_col, value_col), n_salts)
        partial = salted.groupBy(key_col, "_salt").agg(
            F.collect_set(value_col).alias("_vals")
        )
        return partial.groupBy(key_col).agg(
            F.size(
                F.array_distinct(F.flatten(F.collect_list("_vals")))
            ).alias("n_distinct")
        )

    def plain(d, key_col, value_col):
        return d.groupBy(key_col).agg(
            F.count_distinct(F.col(value_col)).alias("n_distinct")
        )

    results = {}
    for name, build in [
        ("old_collect_set", lambda: old_formulation(df, "k", "v")),
        ("new_distinct_count", lambda: salted_distinct_count(df, "k", "v")),
        ("plain_count_distinct", lambda: plain(df, "k", "v")),
    ]:
        best = None
        rows = None
        for _ in range(3):
            t0 = time.perf_counter()
            rows = {r["k"]: r["n_distinct"] for r in build().collect()}
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = (best, rows)
        print(f"{name:22s} {best:7.2f}s  hot={rows['hot']}")

    vals = [r for _, r in results.values()]
    assert vals[0] == vals[1] == vals[2], "formulations disagree!"
    print(
        f"agreement OK (hot={vals[0]['hot']}, expected {hot_distinct}); "
        f"speedup old->new: {results['old_collect_set'][0] / results['new_distinct_count'][0]:.2f}x"
    )


if __name__ == "__main__":
    main()
