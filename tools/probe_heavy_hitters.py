"""Measure the mergeable Misra-Gries heavy-hitters sketch against the
exact groupBy count on a skewed token corpus — the repo rule is
measure-remedies-before-claiming-them.

Corpus: ``n_rows`` tokens over ``n_distinct`` values with a Zipf-ish
skew (token i drawn proportionally to 1/(i+1)), built in-plan from
spark.range (deterministic, no RNG state). Compares:

  exact   - groupBy(token).count() -> rank window -> top-k
            (shuffles one row per distinct token per map partition)
  sketch  - heavy_hitters(candidates=C): per-batch MG summaries
            (<= C rows per batch), declarative sum, rank window

and reports wall times, the sketch's worst observed undercount vs the
MG bound N/(C+1), and whether the true top-k sets agree.

Usage: python tools/probe_heavy_hitters.py [n_rows] [n_distinct] [candidates]
Run alone (quiet-bench rule).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F


def main() -> None:
    from apache_spark_streaming_project_spark import get_spark
    from apache_spark_streaming_project_spark.operators.mergeable import (
        heavy_hitters,
    )

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_distinct = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    cand = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    k = 20
    spark = get_spark("probe-heavy-hitters")

    # Zipf-ish via inverse-CDF on a hash-uniform u in (0,1]:
    # token = floor(exp(u * ln(n_distinct))) ~ p(i) ∝ 1/i
    u = (F.abs(F.hash(F.col("id"))) % 1_000_000 + 1) / 1_000_000.0
    tok = F.floor(F.exp(u * F.lit(float(__import__("math").log(n_distinct)))))
    df = (
        spark.range(n_rows)
        .select(F.concat(F.lit("t"), tok.cast("long")).alias("token"))
        .cache()
    )
    df.count()

    def timed(fn):
        t0 = time.monotonic()
        out = fn()
        return time.monotonic() - t0, out

    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    t_exact, exact_rows = timed(
        lambda: (
            df.groupBy("token")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .collect()
        )
    )
    t_sketch, sketch_rows = timed(
        lambda: heavy_hitters(
            df.withColumn("g", F.lit(1)), ["g"], "token", k=k, candidates=cand
        ).collect()
    )
    exact = {r.token: r.cnt for r in exact_rows}
    sketch = {r.token: r.est_count for r in sketch_rows}
    bound = n_rows / (cand + 1)
    worst = max(
        (exact.get(t, 0) - c for t, c in sketch.items() if t in exact),
        default=0,
    )
    missing = [t for t in exact if t not in sketch]
    print(
        f"rows={n_rows} distinct~{n_distinct} candidates={cand} k={k}\n"
        f"exact groupBy top-{k}:  {t_exact:6.1f} s\n"
        f"MG sketch top-{k}:      {t_sketch:6.1f} s\n"
        f"MG bound N/(C+1) = {bound:,.0f}; worst observed undercount on "
        f"shared top items = {worst:,}\n"
        f"true-top-{k} items missing from sketch: {missing or 'none'}"
    )


if __name__ == "__main__":
    main()
