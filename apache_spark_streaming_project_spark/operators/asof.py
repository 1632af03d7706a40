"""As-of (time-series point-in-time) join — an operator the reference lacks
and Spark has no built-in for (§2.4 notes the reference's only join is a
read-side pandas merge, dashboard.py:409; an as-of join is the canonical
time-series generalization of that latest-per-key lookup).

Semantics: for every left row, attach the single most recent right row with
the same key whose timestamp is <= the left timestamp (ties included).

Implementation is the UNION + ordered-window formulation, not a join:

    tag left/right -> union -> window over (key) ordered by
    (ts, side, tiebreak) -> last non-null right payload at-or-before each
    row -> keep left rows.

Scale properties: exactly ONE shuffle (hash on the key) + one in-partition
sort — identical cost to the sort-merge join Spark would pick for an
equi-join on the same key, with no range-explosion. This beats the naive
`left JOIN right ON key AND r.ts <= l.ts` + argmax formulation, which
produces O(matches) intermediate rows before re-aggregating. Skewed keys
salt the same way any windowed op does.

Determinism: right rows are first deduplicated to one row per (key, ts)
(keeping the max tiebreak), so the matched row is unique — required for
oracle comparison against DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Point-in-time join: left rows + the latest right payload at-or-before
    each left row's timestamp, per `on` key.

    `right_payload` columns come back nullable (no prior right row -> null),
    prefixed `matched_`. `right_tiebreak` breaks ties among right rows with
    equal (key, ts) deterministically (max wins); required if such ties can
    exist.
    """
    tb = right_tiebreak
    # one right row per (key, ts): keep the max-tiebreak row
    if tb is not None:
        w_dedup = Window.partitionBy(on, right_ts).orderBy(F.col(tb).desc())
        right = (
            right.withColumn("_rn", F.row_number().over(w_dedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    # a right row with a NULL key or NULL timestamp can never be a
    # legitimate at-or-before match (SQL joins never match NULL keys;
    # DuckDB's native ASOF never matches a NULL timestamp) — but the
    # union-window formulation WOULD match both: ascending order sorts
    # NULL _ts first (its payload becomes "most recent" for everyone),
    # and partitionBy groups NULL keys into one shared partition. Drop
    # them here; NULL-key/-ts LEFT rows still come back, unmatched.
    r_tagged = right.filter(
        F.col(on).isNotNull() & F.col(right_ts).isNotNull()
    ).select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # right sorts before left at equal ts (<=)
        payload_struct.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_payload"].dataType).alias("_payload"),
        *left.columns,
    )

    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched: Column = F.last("_payload", ignorenulls=True).over(w)

    return (
        r_tagged.unionByName(l_tagged)
        .withColumn("_matched", matched)
        .filter(F.col("_side") == 1)
        .select(
            *left.columns,
            *[
                F.col(f"_matched.{c}").alias(f"matched_{c}")
                for c in right_payload
            ],
        )
    )


def range_join_small(
    fact: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """Band/range join of a fact table against a SMALL interval table
    (`lo <= value < hi`). The small side is broadcast, so the physical plan
    is BroadcastNestedLoopJoin — the correct strategy when the stream side is
    huge and the interval side is O(10..1000) rows: no shuffle of the fact
    table, predicate evaluated in-generated-code per (row x interval).

    For interval tables too large for per-row predicate evaluation, use
    :func:`range_join_bucketed` — the grid rewrite that turns the range
    condition into an equi-join.
    """
    return fact.join(
        F.broadcast(intervals),
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)),
        "inner",
    )


def range_join_bucketed(
    fact: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Range join via GRID BUCKETING — the scalable rewrite of
    :func:`range_join_small` for interval tables beyond the
    nested-loop-predicate tier (10k+ intervals): each interval explodes
    into the coarse grid cells it overlaps (``floor(lo/w) ..
    floor(hi/w)``), the fact side computes its single cell
    (``floor(value/w)``), and the join becomes an EQUI-join on the cell
    id plus the residual range predicate. A BNLJ evaluates every
    (row x interval) pair — O(|fact| * |intervals|) predicate work that
    scales linearly with the interval count; here each fact row meets
    only the intervals overlapping its cell.

    No duplicates by construction: a (row, interval) match can only
    surface in the row's own cell, whichever cells the interval spans.

    Plan shape: the exploded interval side carries NO explicit hint — at
    10k..1M intervals it is still megabytes, so Spark broadcasts it and
    the fact side keeps ZERO shuffles (BroadcastHashJoin on the cell id,
    test-asserted); beyond broadcast size the same plan degrades
    gracefully to a shuffled hash join on the cell id, which is the
    correct strategy there. Pick ``bucket_width`` near the median
    interval width: much smaller multiplies exploded rows
    (interval-side rows ~ sum(width_i)/w), much larger multiplies the
    intervals each fact row must residual-check."""
    cell = F.floor(F.col(value_col) / F.lit(float(bucket_width)))
    iv = intervals.select(
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(float(bucket_width))),
                F.floor(F.col(hi_col) / F.lit(float(bucket_width))),
            )
        ).alias("_cell"),
        "*",
    )
    tagged = fact.withColumn("_cell", cell)
    return (
        tagged.join(
            iv,
            (tagged["_cell"] == iv["_cell"])
            & (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col)),
            "inner",
        )
        .drop("_cell")
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_lo: str,
    a_hi: str,
    b_lo: str,
    b_hi: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Interval x interval OVERLAP join via grid bucketing — the
    two-sided generalization of :func:`range_join_bucketed` (which joins
    points to intervals). Pairs ([a_lo, a_hi], [b_lo, b_hi]) with
    ``a_lo <= b_hi AND b_lo <= a_hi`` (closed intervals, integer
    coordinates) match exactly once.

    Both sides explode into the coarse grid cells they overlap
    (``lo div w .. hi div w``); the join is an EQUI-join on the cell id
    plus the residual overlap predicate plus the DEDUP ANCHOR
    ``cell == greatest(a_lo, b_lo) div w`` — the overlap's start cell
    lies in both sides' cell ranges, so every overlapping pair surfaces
    in exactly that one cell and nowhere else: no post-join DISTINCT,
    which at corpus scale would be a second full shuffle of the result.

    Cost model: exploded rows ~ n * (mean_width / w + 1) per side; each
    pair candidate is confined to cells where both sides are present.
    Pick ``w`` near the median interval width (same guidance as
    range_join_bucketed:151). A plain BNLJ is O(|a| x |b|) predicate
    evaluations; this is O(co-located cell pairs) — the only shape that
    survives two large interval tables.

    ``how`` must be ``'inner'``: both sides are exploded one-row-per-cell
    before the join, so outer semantics would null-extend an unmatched
    interval once PER CELL it spans (duplicates), violating the
    match-exactly-once contract. For outer results, left-join the
    original un-exploded side back onto this inner result on its key."""
    if how != "inner":
        raise ValueError(
            "interval_overlap_join supports how='inner' only (exploded "
            "inputs make outer joins emit one null-extended row per grid "
            "cell an unmatched interval spans); join the un-exploded side "
            f"back onto the inner result for outer semantics, got {how!r}"
        )
    w = int(bucket_width)
    if w <= 0:
        # without this, `lo div 0` is NULL (non-ANSI), sequence(NULL,
        # NULL) is NULL, and explode(NULL) silently drops every row — a
        # caller typo would read as "no overlaps" instead of an error
        raise ValueError(f"bucket_width must be a positive integer, got {w}")
    # _alc/_blc: each side's lo-cell, computed WITHIN its own DataFrame so
    # the dedup anchor below never name-resolves across sides (a and b may
    # legitimately share lo/hi column names). div is monotone, so
    # greatest(a_lo, b_lo) div w == greatest(a_lo div w, b_lo div w).
    ac = a.withColumn("_alc", F.expr(f"{a_lo} div {w}")).withColumn(
        "_cell", F.explode(F.expr(f"sequence({a_lo} div {w}, {a_hi} div {w})"))
    )
    bc = b.withColumn("_blc", F.expr(f"{b_lo} div {w}")).withColumn(
        "_cellb", F.explode(F.expr(f"sequence({b_lo} div {w}, {b_hi} div {w})"))
    )
    cond = (
        (ac["_cell"] == bc["_cellb"])
        & (ac[a_lo] <= bc[b_hi])
        & (bc[b_lo] <= ac[a_hi])
        & (ac["_cell"] == F.greatest(ac["_alc"], bc["_blc"]))
    )
    return ac.join(bc, cond, "inner").drop("_cell", "_cellb", "_alc", "_blc")
