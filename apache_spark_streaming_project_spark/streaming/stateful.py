"""Custom stateful streaming operator (M4+): per-key running statistics with
anomaly flagging via ``applyInPandasWithState``.

The reference's anomaly detector (reference spark_streaming.py:104-110) is
STATELESS: z-scores are computed against the current micro-batch's own
mean/stddev, so a batch of 3 rows flags nothing meaningful and state resets
every 10 s. The idiomatic streaming fix is cross-batch state: each key
carries running (n, mean, M2) Welford aggregates in the state store, updated
per micro-batch, and each event is z-scored against statistics accumulated
over the WHOLE stream so far.

This is the one operator family Structured Streaming's built-in aggregations
cannot express (the output is per-EVENT, enriched by evolving per-key state
— not a per-key aggregate), which is exactly what
``applyInPandasWithState`` exists for.

Scale notes: state is one (long, double, double) triple per key — constant
size, no growth with stream length; the state store shuffles by the group
key once per batch (same exchange any streaming groupBy pays). A state TTL
(``GroupStateTimeout``) can evict idle keys for unbounded key domains.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def _output_schema(key_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("user_id", key_type, False),
            T.StructField("event_id", T.LongType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("n_seen", T.LongType(), False),
            T.StructField("running_mean", T.DoubleType(), True),
            T.StructField("running_stddev", T.DoubleType(), True),
            T.StructField("z_score", T.DoubleType(), True),
            T.StructField("is_anomaly", T.BooleanType(), False),
        ]
    )

# Welford state: count, mean, M2 (sum of squared deviations)
RUNNING_STATS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("mean", T.DoubleType(), False),
        T.StructField("m2", T.DoubleType(), False),
    ]
)


def running_stats_anomalies(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    z_threshold: float = 3.0,
    min_n: int = 10,
) -> DataFrame:
    """Streaming per-key running z-score anomaly detection.

    ``events`` must be a STREAMING DataFrame. Each row is emitted with the
    key's running mean/stddev (updated through that row, Welford online
    update — single pass, numerically stable) and flagged anomalous once the
    key has ``min_n`` observations and |z| > ``z_threshold`` against the
    pre-update statistics.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, mean, m2 = state.get
        else:
            n, mean, m2 = 0, 0.0, 0.0
        for pdf in pdfs:
            # deterministic in-batch order regardless of shuffle arrival
            pdf = pdf.sort_values(id_col)
            out = {
                "user_id": [], "event_id": [], "value": [], "n_seen": [],
                "running_mean": [], "running_stddev": [], "z_score": [],
                "is_anomaly": [],
            }
            for eid, v in zip(pdf[id_col], pdf[value_col]):
                v = float(v)
                # z against PRE-update stats (the value must not dilute the
                # baseline it is judged against)
                if n >= 2:
                    var = m2 / (n - 1)
                    std = var**0.5
                else:
                    std = None
                z = (v - mean) / std if std else None
                is_anom = bool(
                    n >= min_n and z is not None and abs(z) > z_threshold
                )
                n += 1
                delta = v - mean
                mean += delta / n
                m2 += delta * (v - mean)
                post_std = (m2 / (n - 1)) ** 0.5 if n >= 2 else None
                out["user_id"].append(key[0])
                out["event_id"].append(eid)
                out["value"].append(v)
                out["n_seen"].append(n)
                out["running_mean"].append(mean)
                out["running_stddev"].append(post_std)
                out["z_score"].append(z)
                out["is_anomaly"].append(is_anom)
            yield pd.DataFrame(out)
        state.update((n, mean, m2))

    return (
        events.select(key_col, id_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            _output_schema(events.schema[key_col].dataType),
            RUNNING_STATS_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
