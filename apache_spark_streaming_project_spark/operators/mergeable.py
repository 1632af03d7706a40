"""Mergeable (partial-aggregatable) statistics as a user-level operator.

The reference's dashboard re-aggregates per-batch COUNT snapshots
(dashboard.py:274,310,346 — D5); this module generalizes the pattern to
the full summary-statistics family (S19): persist per-epoch/per-shard
PARTIAL components, then merge partials to any coarser grouping WITHOUT
rescanning the data — the mechanism behind incremental rollups, multi-
cluster aggregation, and tiered storage summaries.

Exactness: the components are (n, sum, sum-of-squares) as exact DECIMALs
plus min/max — all associative and commutative, so merge order cannot
change a bit (the float-sum pitfall the exact-decimal machinery in
``functions/exact.py`` exists to avoid). Finalization (mean/stddev)
reuses the same expression tree as ``stddev_exact``, so a merged result
is IDENTICAL to computing the stats directly over the union — which is
exactly what the registered oracle check proves.

Scale: partials are tiny (one row per group per epoch); merging them is
an aggregation over snapshots, not data. This is the same partial+final
split Spark's HashAggregate performs inside one query, lifted to a
persistable, cross-job surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_stats(
    df: DataFrame, group_cols: list[str], value_col: str, scale: int = 2
) -> DataFrame:
    """Per-group mergeable components of the summary-stats family:
    ``(n, sum_dec, sumsq_dec, min_v, max_v)`` with exact decimal sums
    (values must carry <= ``scale`` fractional digits and fit
    |x| < 10^(16-scale) — see functions/exact.var_components for the
    precision contract and why ``n`` counts the CAST column)."""
    d = F.col(value_col).cast(f"decimal(16,{scale})")
    return df.groupBy(*group_cols).agg(
        F.count(d).alias("n"),
        F.sum(d).alias("sum_dec"),
        F.sum(d * d).alias("sumsq_dec"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_stats(parts: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge partial-stat rows down to a coarser grouping. Decimal sums of
    decimal partials stay exact (associative), so merging per-epoch rows
    equals computing over the union directly."""
    return parts.groupBy(*group_cols).agg(
        F.sum("n").alias("n"),
        F.sum("sum_dec").alias("sum_dec"),
        F.sum("sumsq_dec").alias("sumsq_dec"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize_stats(stats: DataFrame) -> DataFrame:
    """Derive ``(mean, stddev)`` from merged components with the same
    deterministic expression tree as ``functions.exact.stddev_exact``:
    exact components -> double once -> fixed-shape IEEE arithmetic."""
    n = F.col("n")
    nd = n.cast("double")
    sd = F.col("sum_dec").cast("double")
    sqd = F.col("sumsq_dec").cast("double")
    # epsilon-negative clamp — same rationale as functions.exact.stddev_exact
    var = F.greatest(
        (nd * sqd - sd * sd) / (nd * (nd - F.lit(1.0))), F.lit(0.0)
    )
    return stats.select(
        *[c for c in stats.columns if c not in ("sum_dec", "sumsq_dec")],
        (sd / n).alias("mean"),
        F.when(n > 1, F.sqrt(var)).otherwise(F.lit(None).cast("double")).alias(
            "stddev"
        ),
    )


def partial_heavy_hitters(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    candidates: int = 400,
) -> DataFrame:
    """Per-Arrow-batch Misra-Gries frequency summaries: for each group,
    at most ``candidates`` (item, partial_count) rows whose counts
    UNDERCOUNT the batch-exact counts by at most
    ``N_batch_group / (candidates + 1)`` each (the MG compaction bound:
    the (candidates+1)-th largest count is subtracted from every item
    and non-positive entries drop).

    NULL items are ignored (pandas ``value_counts`` semantics — a
    frequency sketch over tokens/domains has no meaningful NULL entry;
    count NULLs separately with a plain aggregate if they matter).

    This is the map-side half of mergeable heavy hitters: raw rows never
    shuffle — each input batch emits <= candidates summary rows per
    group, and summing partials per (group, item) downstream is itself a
    valid merged sketch (per-batch decrements are disjoint, so total
    undercount stays <= N_group / (candidates + 1)). The 100 TB shape:
    top tokens / domains / near-dup cluster sizes in one pass without an
    exact all-items groupBy."""
    import pandas as pd

    from pyspark.sql import types as T

    if candidates < 1:
        raise ValueError(f"candidates must be >= 1 (got {candidates})")
    pruned = df.select(*group_cols, item_col)
    item_field = pruned.schema[item_col]
    out_schema = T.StructType(
        [pruned.schema[c] for c in group_cols]
        + [
            item_field,
            T.StructField("partial_count", T.LongType(), False),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            outs = []
            for keys, grp in pdf.groupby(group_cols, dropna=False, sort=False):
                vc = grp[item_col].value_counts()  # exact within the batch
                if len(vc) > candidates:
                    vc = vc - int(vc.iloc[candidates])  # MG compaction
                    vc = vc[vc > 0]
                if vc.empty:
                    continue
                out = pd.DataFrame(
                    {item_col: vc.index, "partial_count": vc.values}
                )
                if not isinstance(keys, tuple):
                    keys = (keys,)
                for c, v in zip(group_cols, keys):
                    out[c] = v
                outs.append(out[list(group_cols) + [item_col, "partial_count"]])
            yield (
                pd.concat(outs)
                if outs
                else pd.DataFrame(
                    {c: [] for c in group_cols + [item_col, "partial_count"]}
                )
            )

    return pruned.mapInPandas(kernel, out_schema)


def heavy_hitters(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    k: int = 20,
    candidates: int = 400,
) -> DataFrame:
    """Top-``k`` estimated items per group from the mergeable sketch:
    ``partial_heavy_hitters`` map-side, partials summed per (group,
    item) — bounded shuffle: <= candidates rows per group per input
    batch — then a rank window. Returns (group_cols..., item,
    est_count, rank).

    Guarantee (Misra-Gries): est_count undercounts the true count by at
    most ``N_group / (candidates + 1)``, and every item whose true count
    exceeds that bound is PRESENT in the merged sketch — so with
    ``candidates`` sized a few multiples above ``k`` the true top-k
    survive any input partitioning. Exactness on demand: items whose
    est_count already exceeds the bound plus the (k+1)-th estimate are
    provably in the true top-k.

    When to use — measured honestly (tools/probe_heavy_hitters.py): at
    any single-box scale the EXACT ``groupBy(item).count()`` + rank
    window WINS on wall time (2.1 s vs 5.9 s at 20M rows on local[32]) —
    Spark's partial hash aggregate already map-side-combines, and
    millions of distinct keys are trivial for it. Reach for this sketch
    only when distinct cardinality per executor threatens aggregation
    memory / shuffle volume (billions of distinct URLs/shingles at
    corpus scale): its summary traffic is bounded by
    batches x groups x candidates REGARDLESS of distinct count, which
    the exact path cannot promise."""
    from pyspark.sql import Window

    parts = partial_heavy_hitters(df, group_cols, item_col, candidates)
    merged = parts.groupBy(*group_cols, item_col).agg(
        F.sum("partial_count").alias("est_count")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("est_count"), F.asc(item_col)
    )
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketch: mergeable distinct-count AND set-overlap
# estimation (Beyer et al., "On Synopses for Distinct-Value Estimation
# Under Multiset Operations", SIGMOD'07). The third mergeable sketch next
# to HLL (cardinality via Spark's built-in) and Misra-Gries (frequency):
# unlike HLL, a KMV sketch supports INTERSECTION estimates — the
# train/test-overlap question decontamination asks at corpus scale —
# because the k smallest hash values of a union are computable from the
# per-set sketches, and membership of each sampled hash in either side is
# exact. Fully declarative: zero Python, zero driver loops.
# ---------------------------------------------------------------------------

# hashes are signed 64-bit (xxhash64); position = hv + 2^63 + 1 maps them
# onto [1, 2^64] so the k-th smallest estimates k / (position / 2^64)
_HASH_SPAN = float(2**64)
_HASH_OFFSET = 2**63


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    k: int = 1024,
) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest DISTINCT ``xxhash64``
    values of ``item_col`` (NULL items ignored, as in every sketch
    here). Returns (group_cols..., hv) — at most ``k`` rows per group,
    the persistable synopsis.

    Plan: one distinct over (group, 8-byte hash) — the only corpus-sized
    exchange, and it carries hashes, never items — then a rank window
    that Spark executes as a map-side WindowGroupLimit (each task
    forwards at most k rows per group). Merging sketches is
    :func:`kmv_merge`; a sketch row set is a deterministic function of
    the item SET, so it is partitioning- and ingestion-order-invariant
    by construction."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"k must be >= 2 (got {k})")
    distinct = (
        df.filter(F.col(item_col).isNotNull())
        .select(*group_cols, F.xxhash64(item_col).alias("hv"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("hv")
    return (
        distinct.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def kmv_merge(
    sketches: DataFrame, group_cols: list[str], k: int
) -> DataFrame:
    """Merge KMV sketch rows (e.g. per-shard or per-epoch sketches
    unioned together) back into one valid k-sketch per group: distinct
    hashes, keep the k smallest. Valid because every hash among the k
    smallest of a UNION of sets is among the k smallest of the set it
    came from — so the union of per-set sketches is a superset of the
    union's sketch, and trimming recovers it exactly."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("hv")
    return (
        sketches.select(*group_cols, "hv")
        .distinct()
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def kmv_estimate(
    sketch: DataFrame, group_cols: list[str], k: int
) -> DataFrame:
    """Distinct-count estimate per group from a KMV sketch: EXACT when
    the group holds fewer than ``k`` distinct values (the sketch IS the
    distinct hash set), else the unbiased KMV estimator
    ``(k - 1) / u_k`` where ``u_k`` is the k-th smallest hash mapped to
    (0, 1]. Returns (group_cols..., n_sketch, est_distinct). The
    estimate is a deterministic function of the item set (fixed hash,
    no RNG); relative error concentrates around 1/sqrt(k - 2)."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max("hv").alias("_max_hv"),
    )
    # double-space arithmetic: 2^63 overflows a Java long literal, and
    # the 2^-53 mantissa truncation is far below the estimator's
    # 1/sqrt(k) error (still deterministic — IEEE ops on fixed inputs)
    pos = (
        F.col("_max_hv").cast("double")
        + F.lit(float(_HASH_OFFSET))
        + F.lit(1.0)
    )
    return agg.select(
        *group_cols,
        "n_sketch",
        F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(_HASH_SPAN) / pos)
        .alias("est_distinct"),
    )


def kmv_overlap(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int
) -> DataFrame:
    """Set-operation estimates between two (ungrouped) KMV sketches —
    the capability HLL lacks. Builds the UNION's k-sketch from the two
    input sketches (exact, see :func:`kmv_merge`), estimates the union
    cardinality from it, and estimates Jaccard as the fraction of the
    union sample present in BOTH sides (membership is exact: the union
    sketch's hashes all come from one of the sketches). Returns one row:
    (n_union_sketch, est_union, jaccard_est, est_intersection). Scale:
    both inputs are <= k rows — everything here is sketch-sized, and the
    k-smallest trim is a TakeOrderedAndProject, not a global window."""
    a = sketch_a.select("hv")
    b = sketch_b.select("hv")
    union_sk = a.unionByName(b).distinct().orderBy("hv").limit(k)
    both = union_sk.join(a, "hv", "left_semi").join(b, "hv", "left_semi")
    stats = union_sk.agg(
        F.count(F.lit(1)).alias("n_union_sketch"),
        F.max("hv").alias("_max_hv"),
    )
    # double-space arithmetic: 2^63 overflows a Java long literal, and
    # the 2^-53 mantissa truncation is far below the estimator's
    # 1/sqrt(k) error (still deterministic — IEEE ops on fixed inputs)
    pos = (
        F.col("_max_hv").cast("double")
        + F.lit(float(_HASH_OFFSET))
        + F.lit(1.0)
    )
    est_union = (
        F.when(
            F.col("n_union_sketch") < k,
            F.col("n_union_sketch").cast("double"),
        )
        .otherwise(F.lit(float(k - 1)) * F.lit(_HASH_SPAN) / pos)
    )
    n_both = both.agg(F.count(F.lit(1)).alias("n_both"))
    # empty-union guard: two empty sketches have est_union 0 (exact) and
    # an UNDEFINED Jaccard (0/0) — NULL, not an ANSI DIVIDE_BY_ZERO crash
    jaccard = F.when(
        F.col("n_union_sketch") > 0,
        F.col("n_both").cast("double")
        / F.col("n_union_sketch").cast("double"),
    )
    return (
        stats.crossJoin(n_both)  # two 1-row aggregates
        .select(
            "n_union_sketch",
            est_union.alias("est_union"),
            jaccard.alias("jaccard_est"),
            F.when(
                F.col("n_union_sketch") > 0, est_union * jaccard
            )
            .otherwise(F.lit(0.0))  # intersection of empty sets is empty
            .alias("est_intersection"),
        )
    )


def streaming_heavy_hitters_batch(
    batch_df: DataFrame,
    group_cols: list[str],
    item_col: str,
    store_dir: str,
    batch_id: int,
    candidates: int = 400,
) -> None:
    """m24 per-batch body: Misra-Gries frequency-sketch MAINTENANCE
    under ingest — each micro-batch's items are summarized map-side
    (``partial_heavy_hitters``: <= candidates rows per group per Arrow
    batch, raw rows never shuffle), the partials are summed to one
    summary row per (group, item) within the batch, and the summary is
    published with the idempotent batch-keyed overwrite (each batch
    OWNS ``batch-<id>/``; an at-least-once foreachBatch retry
    republishes identical content — the m22 seam). The store is never
    read during ingest, so per-epoch cost is O(batch) with NO
    corpus-lifetime term.

    The read-side merge is one declarative aggregate over the store:
    summing ``partial_count`` per (group, item) across batches IS a
    valid merged Misra-Gries sketch — per-batch compaction decrements
    are disjoint, so every item's total undercount stays
    <= N_group/(candidates+1) and every item above that bound is
    PRESENT (the mergeability theorem the registration gates in-plan).
    The per-batch summary is deliberately NOT re-trimmed to
    ``candidates`` rows on publish: an MG merge-trim would cap the
    store at groups x candidates rows per batch but pay a second
    decrement, doubling the bound constant to 2N/(c+1); keeping the
    summed partials preserves the clean N/(c+1) guarantee at a store
    cost of candidates x (batch rows / Arrow batch size) rows per
    group per batch — still vanishingly small next to the raw item
    stream."""
    import os

    parts = partial_heavy_hitters(
        batch_df, group_cols, item_col, candidates
    )
    summary = parts.groupBy(*group_cols, item_col).agg(
        F.sum("partial_count").alias("partial_count")
    )
    summary.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(store_dir, f"batch-{int(batch_id)}")
    )
