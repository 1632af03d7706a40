"""Anomaly detection: S13-S16 (SURVEY.md §2.2, §4.3-5).

The reference computes batch mean/stddev of ``hours_per_week``, collects them
to the driver, then re-injects them as literals into a z-score filter
(reference spark_streaming.py:78-110) — a driver round-trip plus a second
scan. Here the whole plan stays lazy: the 1-row aggregate is cross-joined
back (Catalyst auto-broadcasts a 1-row relation, so this is a
BroadcastNestedLoopJoin with zero shuffle), and the z-score + filter are
plain column expressions in the same job.

At 100 TB the stats side is a partial+final agg producing ONE row; the
detail side streams through map tasks unchanged — no skew, no extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apache_spark_streaming_project_spark.functions.exact import (
    avg_exact,
    stddev_exact,
)


def zscore(
    df: DataFrame,
    value_col: str,
    threshold: float = 3.0,
    scale: int = 2,
    z_alias: str = "z_score",
) -> DataFrame:
    """S13+S14 — flag rows where |x - mean| / stddev > threshold.

    Mean/stddev use the exact-decimal one-pass formulation so the z values
    are deterministic. S15's stddev>0 guard becomes an in-plan predicate
    (NULL/zero stddev yields no matches, same as the reference's driver-side
    ``if`` — reference spark_streaming.py:106).
    """
    stats = df.agg(
        avg_exact(value_col, scale=scale, out_alias="_mu"),
        stddev_exact(value_col, scale=scale, out_alias="_sigma"),
    )
    z = F.abs((F.col(value_col) - F.col("_mu")) / F.col("_sigma"))
    return (
        df.crossJoin(F.broadcast(stats))
        .filter(F.col("_sigma") > 0)
        .withColumn(z_alias, z)
        .filter(F.col(z_alias) > threshold)
        .drop("_mu", "_sigma")
    )


def census_hours_anomalies(enriched: DataFrame, threshold: float = 3.0) -> DataFrame:
    """S13-S16+S5 — the reference's hours_per_week outlier detector with its
    sink metadata columns (reference spark_streaming.py:104-120):
    ``anomaly_type`` = "hours_outlier", ``detected_at`` epoch seconds."""
    return (
        zscore(enriched, "hours_per_week", threshold, scale=0, z_alias="hours_z_score")
        .withColumn("anomaly_type", F.lit("hours_outlier"))
        .withColumn("z_score", F.col("hours_z_score"))
        .withColumn("detected_at", F.unix_timestamp(F.current_timestamp()).cast("double"))
    )
