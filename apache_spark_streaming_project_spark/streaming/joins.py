"""Stream-stream joins (event-time interval semantics).

The reference pipeline never joins two streams (its only join is the
read-side pandas merge, dashboard.py:409); this module adds the
Structured Streaming capability a funnel/attribution workload needs:
join two unbounded streams on a key where the right event must land
inside a time interval after the left event.

Scale design: both sides carry a watermark, and the join condition
bounds the right event time to ``[left.ts, left.ts + max_delay]`` — so
Spark's symmetric hash join keeps only ``watermark + max_delay`` worth
of state per side, evicting continuously. State is partitioned by the
join key across ``spark.sql.shuffle.partitions`` state stores; at
cluster scale provision that to the key cardinality (streaming
exchanges are not AQE-coalescible). Without the interval bound the
state would be unbounded — the interval IS the scalability contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "6 hours",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING DataFrames on ``key`` where the right event
    time falls in ``[left_ts, left_ts + max_delay]``. Column names must
    already be disjoint apart from ``key`` (prefix them upstream).

    ``watermark`` is the lateness bound for BOTH sides; with the interval
    condition it caps join state at watermark + max_delay per side. For
    deterministic drains in tests, pass a watermark larger than the
    fixture's time span (nothing evicts before all files arrive).

    ``how="leftOuter"`` additionally emits a null-padded row for each
    left event whose match window expired unmatched — Spark emits these
    at state-eviction time, i.e. only once the watermark passes
    ``left_ts + max_delay`` (an availableNow drain therefore reports
    outer rows only for windows the final watermark has closed; the
    tail stays pending, matching streaming semantics, not batch)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark).withColumnRenamed(
        key, "_rkey"
    )
    cond = (
        (lw[key] == rw["_rkey"])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, how).drop("_rkey")
