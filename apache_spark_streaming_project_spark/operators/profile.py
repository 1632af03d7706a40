"""Dataset profiling / validation operators.

Before a corpus feeds a training run, a pipeline needs a cheap,
trustworthy answer to "does this table look right?": per-column null
rates, distinct cardinalities, and value ranges, plus hard expectation
gates built on top of them. The reference has no equivalent (its
dashboard recomputes ad-hoc pandas stats per page load,
dashboard.py:150-170); this is the engine-side generalization.

Scale design (100 TB):

* :func:`column_profile` is ONE aggregation pass over the table — every
  metric (count / null-count / distinct / min / max) partial-aggregates,
  so the shuffle carries one row per partition, never data rows. The
  long-format output is produced by a driver-free ``stack`` unpivot of
  the single agg row.
* Exact multi-column ``count_distinct`` makes Catalyst plan an Expand
  (one input row replicated per distinct-agg) — acceptable when profiles
  run over a handful of columns, and required for oracle-exact output.
  At full corpus scale pass ``exact=False`` to use
  ``approx_count_distinct`` (HyperLogLog++, single pass, NO Expand);
  every other metric is unchanged.
* :func:`expect` turns a profile into a boolean gate without collecting
  anything: expectations evaluate in-plan and the operator returns the
  violated rows, so an empty result means "ship it".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_string(c: Column, dtype: str) -> Column:
    """Cast a min/max value to a cross-engine-stable string.

    Doubles >= 1e7 stringify scientifically in Spark but positionally in
    most other engines; money-style doubles (and floats) are routed
    through DECIMAL(18,2) so both render positionally with two places.
    The routing is RANGE-GUARDED: decimal(18,2) holds 16 integer digits,
    so |v| >= 1e15 falls back to the plain double string instead of an
    ANSI NUMERIC_VALUE_OUT_OF_RANGE crash (Spark 4 sessions keep ANSI
    on) — the fallback string is engine-native, not cross-engine-stable,
    which is the honest trade for a value the decimal route cannot
    represent at all.
    """
    if dtype in ("double", "float"):
        d = c.cast("double")
        return F.when(
            F.abs(d) < F.lit(1e15), d.cast("decimal(18,2)").cast("string")
        ).otherwise(d.cast("string"))
    return c.cast("string")


def column_profile(
    df: DataFrame, cols: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """Long-format per-column profile: one output row per column with
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)``.

    ``exact=False`` (the corpus-scale mode) computes everything in ONE
    aggregation pass with HyperLogLog distinct sketches — no Expand in
    the plan. ``exact=True`` keeps the non-distinct stats in that single
    pass but computes each column's exact distinct count as its own
    column-pruned partial-agg branch cross-joined back (1-row sides):
    putting k countDistincts in one aggregate compiles to an Expand that
    replicates every input row k+1 times before the shuffle, while k
    single-column branches each scan one parquet column with map-side
    combine — strictly less data moved on a columnar source (measured 3x
    faster at sf0.1 even for the 2-distinct case; see s_approx_distinct).
    The column label is ``column_name`` (``column`` is reserved in ANSI
    engines and would force quoting in every downstream query).
    """
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"),
            _as_string(F.min(col), dtypes[c]).alias(f"{c}__min"),
            _as_string(F.max(col), dtypes[c]).alias(f"{c}__max"),
        ]
        if not exact:
            aggs.append(F.approx_count_distinct(col).alias(f"{c}__distinct"))
    one = df.agg(*aggs)
    if exact:
        for c in cols:
            # countDistinct semantics: distinct NON-NULL values
            branch = (
                df.filter(F.col(c).isNotNull())
                .select(c)
                .distinct()
                .agg(F.count(F.lit(1)).alias(f"{c}__distinct"))
            )
            one = one.crossJoin(branch)
    stack_args = ", ".join(
        f"'{c}', `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("n_rows"),
    ).select(
        "column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    )


def fixed_width_histogram(
    df: DataFrame, value_col: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """Fixed-width histogram of a numeric column over ``[lo, hi)``:
    ``(bucket, bucket_lo, bucket_hi, n)``, one row per NON-EMPTY bucket.

    Bucket assignment is pure IEEE double arithmetic
    (``floor((x - lo) / width)``) so any engine computes the identical
    bucketing bit-for-bit. The plan is a map-side projection plus a
    partial+final hash agg on at most ``nbins`` keys — the cheapest
    possible distribution sketch at corpus scale (out-of-range rows are
    filtered at the scan, so the predicate can prune row groups)."""
    width = (hi - lo) / nbins
    x = F.col(value_col).cast("double")
    # clamp at nbins-1: for values just under hi, (x-lo)/width can round
    # UP across the bin edge in doubles (e.g. x=1-ulp, lo=0, hi=1,
    # nbins=7 -> floor(6.9999.../width) lands at 7), emitting a phantom
    # bucket == nbins with bucket_lo == hi that misaligns histogram_drift
    bucket = F.least(
        F.floor((x - F.lit(float(lo))) / F.lit(width)),
        F.lit(nbins - 1),
    ).cast("bigint")
    return (
        df.filter((x >= lo) & (x < hi))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.lit(float(lo)) + F.col("bucket") * F.lit(width)).alias("bucket_lo"),
            (F.lit(float(lo)) + (F.col("bucket") + 1) * F.lit(width)).alias(
                "bucket_hi"
            ),
            "n",
        )
    )


def histogram_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """Distribution-drift check between two snapshots of the same column
    (the X9 monitoring primitive a pipeline runs between ingest batches,
    model-training epochs, or before/after a filter change): both
    snapshots binned with the SAME fixed-width histogram, full-outer
    joined on the bucket, per-bucket counts plus integer |diff| — the
    exact inputs a PSI/TV-distance/chi-square computation normalizes, kept
    integer-exact here so any engine reproduces them bit-for-bit.

    Scale shape: each side is a map-side projection + partial/final agg on
    <= nbins keys; the join touches <= nbins rows per side (broadcast-
    trivial). Cost is two scans — at corpus scale run it over the already-
    materialized per-batch histograms instead (they merge by summing
    counts; see mergeable.py for the philosophy)."""
    a = fixed_width_histogram(ref, value_col, lo, hi, nbins).select(
        "bucket", F.col("n").alias("n_ref")
    )
    b = fixed_width_histogram(cur, value_col, lo, hi, nbins).select(
        "bucket", F.col("n").alias("n_cur")
    )
    # FULL OUTER can't use a broadcast hash join in Spark; both sides are
    # <= nbins rows so the sort-merge join here is trivially cheap
    return (
        a.join(b, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
        .withColumn("abs_diff", F.abs(F.col("n_ref") - F.col("n_cur")))
    )


def expect(
    profile: DataFrame,
    max_null_rate: float = 0.0,
    min_distinct: int = 1,
) -> DataFrame:
    """Expectation gate over a :func:`column_profile` result: returns the
    VIOLATING profile rows (empty result == all expectations hold).
    Evaluates in-plan; never collects."""
    return profile.filter(
        (F.col("n_nulls") > F.col("n_rows") * F.lit(max_null_rate))
        | (F.col("n_distinct") < F.lit(min_distinct))
    )


def embedding_correlations(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    n_dims: int = 16,
    top_k: int = 10,
) -> DataFrame:
    """X9 — embedding-space health diagnostic: Pearson correlation
    between coordinate dimensions, top-k most-correlated pairs. Healthy
    (whitened, isotropic) embedding spaces show near-zero off-diagonal
    correlation; strong dim-dim correlation flags a collapsed or
    un-whitened encoder — the kind of regression a corpus pipeline
    wants to catch before building ANN indexes on the vectors.

    Exactness contract: every sum folds in ascending-``key_col`` order
    (``array_sort(collect_list(struct(key, v)))`` + left fold), so both
    engines accumulate the same IEEE doubles in the same sequence;
    products of float32 coordinates are exact in double; the final
    correlation arithmetic is a fixed left-assoc expression over those
    reproducible sums. No decimal casts anywhere — pure ordered-fold
    determinism (the third exactness idiom in this repo, next to
    exact-decimal aggregation and integer rewrites).

    Scale: the fold forces one ordered array per (i, j) pair —
    O(n_dims^2 / 2) groups of corpus-length lists, fine for a
    diagnostic on a profiling sample but NOT the full-corpus shape; at
    100 TB run the same query with plain SUMs (order-free, hash-
    tolerant to last-ulp wobble) on the full data and keep the fold
    form for the oracle-audited sample."""
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_dims - 1)),
            lambda i: F.transform(
                F.sequence(i, F.lit(n_dims - 1)),
                lambda j: F.struct(
                    i.cast("int").alias("i"),
                    j.cast("int").alias("j"),
                    (
                        F.element_at(F.col(vec_col), i.cast("int") + 1).cast("double")
                        * F.element_at(F.col(vec_col), j.cast("int") + 1).cast("double")
                    ).alias("v"),
                ),
            ),
        )
    )
    ex = df.select(F.col(key_col).alias("_k"), F.explode(pair_structs).alias("_p")).select(
        "_k", F.col("_p.i").alias("i"), F.col("_p.j").alias("j"), F.col("_p.v").alias("v")
    )

    def _fold(col: str) -> Column:
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("_k"), F.col(col).alias("_v")))),
            F.lit(0.0),
            lambda acc, x: acc + x["_v"],
        )

    s2 = ex.groupBy("i", "j").agg(_fold("v").alias("sxy"))

    dim_structs = F.transform(
        F.sequence(F.lit(0), F.lit(n_dims - 1)),
        lambda i: F.struct(
            i.cast("int").alias("i"),
            F.element_at(F.col(vec_col), i.cast("int") + 1)
            .cast("double")
            .alias("x"),
        ),
    )
    dx = df.select(F.col(key_col).alias("_k"), F.explode(dim_structs).alias("_d")).select(
        "_k", F.col("_d.i").alias("i"), F.col("_d.x").alias("v")
    )
    sx = dx.groupBy("i").agg(_fold("v").alias("sx"))

    n = df.agg(F.count("*").cast("double").alias("n"))
    diag = s2.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("di"), F.col("sxy").alias("sxx")
    )

    sa = sx.select(F.col("i").alias("ai"), F.col("sx").alias("sxa"))
    sb = sx.select(F.col("i").alias("bi"), F.col("sx").alias("sxb"))
    da = diag.select(F.col("di").alias("dai"), F.col("sxx").alias("sxxa"))
    db = diag.select(F.col("di").alias("dbi"), F.col("sxx").alias("sxxb"))

    # a zero-variance dimension (padded/zeroed coordinate — exactly the
    # collapsed-encoder case this diagnostic exists to catch) makes a
    # denominator exactly 0: under ANSI that's a DIVIDE_BY_ZERO job
    # failure, non-ANSI a NaN that sorts ABOVE every real correlation.
    # nullif the denominator and drop undefined pairs before ranking —
    # a constant dim has no defined correlation with anything.
    den = F.sqrt(F.col("n") * F.col("sxxa") - F.col("sxa") * F.col("sxa")) * F.sqrt(
        F.col("n") * F.col("sxxb") - F.col("sxb") * F.col("sxb")
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sxa") * F.col("sxb")) / F.nullif(
        den, F.lit(0.0)
    )
    return (
        s2.filter(F.col("i") < F.col("j"))
        .join(F.broadcast(sa), F.col("i") == F.col("ai"))
        .join(F.broadcast(sb), F.col("j") == F.col("bi"))
        .join(F.broadcast(da), F.col("i") == F.col("dai"))
        .join(F.broadcast(db), F.col("j") == F.col("dbi"))
        .crossJoin(F.broadcast(n))
        .select("i", "j", corr.alias("corr"))
        .filter(F.col("corr").isNotNull() & ~F.isnan(F.col("corr")))
        .orderBy(F.abs(F.col("corr")).desc(), "i", "j")
        .limit(top_k)
    )


def merge_histograms(hists: DataFrame) -> DataFrame:
    """Merge fixed-width histogram partials (same lo/hi/nbins — e.g.
    per-shard, per-epoch, or per-source outputs of
    :func:`fixed_width_histogram`) into one histogram: counts sum
    associatively per bucket, edges are bucket-determined constants.
    The quantile companion to X11's mergeable moments/HLL/MG/KMV: persist
    per-shard histograms, merge without rescanning."""
    return (
        hists.groupBy("bucket")
        .agg(
            F.min("bucket_lo").alias("bucket_lo"),
            F.min("bucket_hi").alias("bucket_hi"),
            F.sum("n").alias("n"),
        )
        .select("bucket", "bucket_lo", "bucket_hi", "n")
    )


def histogram_quantiles(hist: DataFrame, qs: list[float]) -> DataFrame:
    """Quantile BUCKETS from a (possibly merged) fixed-width histogram:
    for each q, the bucket holding the rank-``ceil(q * N)`` value — the
    first bucket whose cumulative count reaches the rank, found with an
    integer cumulative sum (``cum - n < rank <= cum``), so the result is
    EXACT integer/bucket arithmetic end to end (no estimator error to
    bound: the true q-quantile provably lies in [bucket_lo, bucket_hi),
    i.e. the answer is exact to one bucket width by construction).
    Returns (q, bucket, bucket_lo, bucket_hi, rank, n_total), one row
    per q in (0, 1].

    The window runs over at most nbins rows (the histogram, not the
    data) — quantiles over 100 TB cost one nbins-key aggregation plus
    this constant-size pass."""
    from pyspark.sql import Window

    if not qs or any(q <= 0 or q > 1 for q in qs):
        raise ValueError(f"quantiles must lie in (0, 1] (got {qs})")
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = hist.select(
        "bucket",
        "bucket_lo",
        "bucket_hi",
        "n",
        F.sum("n").over(w).alias("cum"),
    )
    total = hist.agg(F.sum("n").alias("n_total"))
    qcol = F.explode(F.array(*[F.lit(float(q)) for q in sorted(qs)]))
    ranks = total.select(
        "n_total", qcol.alias("q")
    ).withColumn("rank", F.ceil(F.col("q") * F.col("n_total")).cast("bigint"))
    return (
        c.join(
            ranks,
            (F.col("cum") - F.col("n") < F.col("rank"))
            & (F.col("rank") <= F.col("cum")),
        )
        .select(
            "q", "bucket", "bucket_lo", "bucket_hi", "rank", "n_total"
        )
        .orderBy("q")
    )


def streaming_drift_batch(
    batch_df: DataFrame,
    ref_dir: str,
    sink_dir: str,
    batch_id: int,
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 500.0,
    nbins: int = 20,
    t_num: int = 1,
    t_den: int = 10,
) -> None:
    """m21 foreachBatch body, importable for production-body replay (the
    dsir_publish_scored_batch precedent): continuous DISTRIBUTION-DRIFT
    monitoring of an ingest stream against a FROZEN reference profile —
    the inline data-quality gate a pipeline runs while the corpus is
    assembled (alert/quarantine when a shard's distribution shifts)
    instead of profiling after the fact (x9_histogram_drift is the batch
    form; the frozen-reference-table seam is m18's static benchmark gram
    table).

    Each micro-batch: fixed-width histogram of its own rows (same
    binning as the reference — fixed_width_histogram, pure IEEE double
    arithmetic), left-joined onto the full 0..nbins-1 bucket grid with
    the broadcast reference counts, and a total-variation verdict
    decided ENTIRELY in exact BIGINT cross-products:

        TVD(cur, ref) >= t_num/t_den
        <=>  t_den * sum_b |n_cur_b*N_ref - n_ref_b*N_cur|
             >= 2 * t_num * N_ref * N_cur

    so the drifted flag is engine-independent (no float division; the
    BM25 symbolic-ratio move). Output per batch: one row per grid
    bucket — (bucket, n_ref, n_cur, abs_cross, drifted) — published
    with the idempotent hive batch-keyed overwrite (the m15/m17/m18
    seam; a replayed batch overwrites its own directory).

    An EMPTY batch trips the gate BY CONSTRUCTION (N_cur = 0 makes both
    sides 0 and the >= comparator fire) — the right alert semantics: a
    shard that delivered nothing is at least as anomalous as one that
    shifted, and the n_cur totals in the output say which case it was.
    Overflow bound: the cross-products need
    N_ref * N_cur < 2^62/t_den — fine to ~1e9 rows per side; past that
    lift the arithmetic to DECIMAL(38,0) or compare pre-aggregated
    per-shard histograms (they merge by summing counts, mergeable.py).

    At 100 TB: the reference profile is nbins rows (broadcast by
    construction), the batch histogram is a map-side projection plus a
    partial/final agg on <= nbins keys, and the verdict joins touch
    <= nbins rows — per-batch cost is one scan of the batch, zero
    corpus-sized state. Reference has no profiling at all (extension
    surface, SURVEY §2 X9/S6)."""
    import os

    ss = batch_df.sparkSession
    ref = ss.read.parquet(ref_dir).select("bucket", "n_ref")
    cur = fixed_width_histogram(
        batch_df, value_col, lo, hi, nbins
    ).select("bucket", F.col("n").alias("n_cur"))
    grid = ss.range(nbins).select(
        F.col("id").cast("bigint").alias("bucket")
    )
    # persist the <= nbins-row joined grid: the scored/verdict/output
    # tree references it four times, and without the cache each
    # reference re-runs the BATCH SCAN under `cur` (the round-12
    # persist lesson from the dedup bodies — the docstring's "one scan
    # of the batch" claim is this persist)
    j = (
        grid.join(F.broadcast(ref), "bucket", "left")
        .join(F.broadcast(cur), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_ref", F.lit(0)).cast("bigint").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("bigint").alias("n_cur"),
        )
    ).persist()
    try:
        tot = j.agg(
            F.sum("n_ref").alias("_nr"), F.sum("n_cur").alias("_nc")
        )
        # 1-row aggregate crossJoin — the audited BNLJ shape, not a
        # cartesian
        scored = j.crossJoin(F.broadcast(tot)).withColumn(
            "abs_cross",
            F.abs(
                F.col("n_cur") * F.col("_nr")
                - F.col("n_ref") * F.col("_nc")
            ),
        )
        verdict = scored.agg(
            (
                F.lit(int(t_den)) * F.sum("abs_cross")
                >= F.lit(2 * int(t_num)) * F.first("_nr") * F.first("_nc")
            ).alias("drifted")
        )
        out = scored.select(
            "bucket", "n_ref", "n_cur", "abs_cross"
        ).crossJoin(F.broadcast(verdict))
        out.write.mode("overwrite").parquet(
            os.path.join(sink_dir, f"batch={int(batch_id)}")
        )
    finally:
        j.unpersist()


def streaming_histogram_batch(
    batch_df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    nbins: int,
    store: str,
    batch_id: int,
) -> None:
    """m26 per-batch body: fixed-width-histogram MAINTENANCE under
    ingest — each micro-batch is histogrammed (an nbins-key partial
    agg, the cheapest distribution sketch there is) and the partial is
    published with the idempotent batch-keyed overwrite (each batch
    OWNS ``batch-<id>/``; an at-least-once retry republishes identical
    content — the m22 seam, plain ``batch-`` prefix so a compacted
    store keeps taking publishes under one recursive-lookup read). The
    store is never read during ingest: per-epoch cost is O(batch) with
    no corpus-lifetime term.

    Histogram partials are the EXACT mergeable sketch: bucket counts
    sum associatively, so the read-side merge (merge_histograms — one
    aggregate over <= batches x nbins stored rows) equals the direct
    corpus histogram ROW FOR ROW, with none of the inequality slack MG
    carries (m24) — the m13 merged==direct claim, completing the
    streaming-maintenance story for all three sketch families (KMV
    m13, Misra-Gries m24, histogram here). Quantiles derived from the
    merged store (histogram_quantiles) are therefore exact to one
    bucket width BY CONSTRUCTION, and the m26 registration hash-checks
    them against the direct-histogram SQL mirror."""
    import os

    h = fixed_width_histogram(batch_df, value_col, lo, hi, nbins)
    h.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(store, f"batch-{int(batch_id)}")
    )
