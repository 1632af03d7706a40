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

import numpy as np
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
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming per-key running z-score anomaly detection.

    ``events`` must be a STREAMING DataFrame. Each row is emitted with the
    key's running mean/stddev (updated through that row) and flagged
    anomalous once the key has ``min_n`` observations and |z| >
    ``z_threshold`` against the pre-update statistics.

    The per-batch update is vectorized: prefix sums over values shifted by
    the carried mean (cancellation-safe) give every prefix's mean/M2 in one
    numpy pass, and Chan's pairwise-combine formula merges the carried state
    with each prefix — no per-row Python loop in the hot path.

    ``idle_timeout_ms`` arms a PROCESSING-TIME state TTL: a key that
    receives no data for that long is evicted on the next trigger (its
    statistics restart from zero if it reappears). This is the bounded-
    state contract for UNBOUNDED key domains — user-id-shaped keys at
    corpus scale churn forever, and without a TTL the state store grows
    monotonically with distinct keys ever seen, not active keys. The
    eviction callback emits nothing; with ``None`` state lives for the
    stream's lifetime (bounded-key-domain mode).
    """

    def _nullable(arr: np.ndarray, valid: np.ndarray) -> np.ndarray:
        out = np.empty(len(arr), dtype=object)
        out[:] = None
        out[valid] = arr[valid]
        return out

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if idle_timeout_ms is not None and state.hasTimedOut:
            # idle-key eviction: drop the statistics, emit nothing; the
            # key restarts cold if it ever reappears
            state.remove()
            return
        if state.exists:
            n, mean, m2 = state.get
        else:
            n, mean, m2 = 0, 0.0, 0.0
        # Materialize the whole group for this batch BEFORE sorting:
        # applyInPandasWithState feeds groups larger than
        # arrow.maxRecordsPerBatch (default 10k) as MULTIPLE chunks, and
        # chunk order follows shuffle arrival — sorting each chunk alone
        # left the cross-chunk order (and so every z-score downstream of
        # the carried state) run-dependent for large groups. Per-key
        # per-batch rows must fit one task's memory anyway (the
        # applyInPandas contract); this makes the documented determinism
        # actually hold at that size.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if len(chunks) > 1:
            chunks = [pd.concat(chunks, ignore_index=True)]
        for pdf in chunks:
            # deterministic in-batch order regardless of shuffle arrival
            pdf = pdf.sort_values(id_col)
            v = pdf[value_col].to_numpy(dtype=np.float64)
            k = len(v)
            if k == 0:
                continue
            # shift by the carried mean (or first value) so cumulative sums
            # accumulate small deviations, not large absolute values
            c = mean if n > 0 else float(v[0])
            d = v - c
            sd = np.cumsum(d)
            sd2 = np.cumsum(d * d)
            j = np.arange(1, k + 1, dtype=np.float64)
            n_post = n + j
            mean_post = c + (n * (mean - c) + sd) / n_post
            # batch-prefix mean/M2 in shifted coordinates, then pairwise
            # combine with the carried (n, mean, m2)
            mb = sd / j
            m2b = np.maximum(sd2 - sd * mb, 0.0)
            delta = (c + mb) - mean
            m2_post = m2 + m2b + delta * delta * (n * j) / n_post
            # z against PRE-update stats (the value must not dilute the
            # baseline it is judged against): row i's pre-stats are row
            # i-1's post-stats
            n_pre = np.concatenate(([n], n_post[:-1]))
            mean_pre = np.concatenate(([mean], mean_post[:-1]))
            m2_pre = np.concatenate(([m2], m2_post[:-1]))
            with np.errstate(invalid="ignore", divide="ignore"):
                std_pre = np.sqrt(m2_pre / (n_pre - 1))
                z = (v - mean_pre) / std_pre
                std_post = np.sqrt(m2_post / (n_post - 1))
            z_ok = (n_pre >= 2) & (std_pre > 0)
            is_anom = z_ok & (n_pre >= min_n) & (np.abs(z) > z_threshold)
            yield pd.DataFrame(
                {
                    "user_id": np.full(k, key[0], dtype=object),
                    "event_id": pdf[id_col].to_numpy(),
                    "value": v,
                    "n_seen": n_post.astype(np.int64),
                    "running_mean": mean_post,
                    "running_stddev": _nullable(std_post, n_post >= 2),
                    "z_score": _nullable(z, z_ok),
                    "is_anomaly": is_anom,
                }
            )
            n, mean, m2 = int(n_post[-1]), float(mean_post[-1]), float(m2_post[-1])
        state.update((n, mean, m2))
        if idle_timeout_ms is not None:
            # re-arm the TTL after every batch that touched the key
            state.setTimeoutDuration(idle_timeout_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select(key_col, id_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            _output_schema(events.schema[key_col].dataType),
            RUNNING_STATS_STATE_SCHEMA,
            "append",
            timeout,
        )
    )
