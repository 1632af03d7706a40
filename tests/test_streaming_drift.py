"""m21_streaming_drift (round-13): continuous distribution-drift gate
against a frozen reference profile, verdict decided in exact BIGINT
cross-products. End-to-end run at sf0.001 against a pure-python replay,
the exact-at-threshold boundary case the natural fixture cannot plant,
the empty-batch contract, and replay idempotency."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from apache_spark_streaming_project_spark.entry_queries import QUERIES
from apache_spark_streaming_project_spark.operators.profile import (
    streaming_drift_batch,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_histogram(values, lo=0.0, hi=500.0, nbins=20):
    width = (hi - lo) / nbins
    return Counter(
        min(int(math.floor((v - lo) / width)), nbins - 1)
        for v in values
        if lo <= v < hi
    )


def test_m21_end_to_end_matches_python_ground_truth(spark):
    out = QUERIES["m21_streaming_drift"].fn(spark, SF_DIR)
    rows = out.collect()
    assert len(rows) == 60  # 3 epochs x 20 grid buckets

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "value"
    )
    nat = [(r["event_id"], r["value"]) for r in ev.collect()]
    ref = _py_histogram([v for _, v in nat])
    n_ref_tot = sum(ref.values())
    for epoch in (0, 1, 2):
        vals = [
            499.0 if epoch == 2 and i % 5 == 0 else v
            for i, v in nat
            if i % 3 == epoch
        ]
        cur = _py_histogram(vals)
        n_cur_tot = sum(cur.values())
        sum_cross = sum(
            abs(cur.get(b, 0) * n_ref_tot - ref.get(b, 0) * n_cur_tot)
            for b in range(20)
        )
        want_drifted = 10 * sum_cross >= 2 * n_ref_tot * n_cur_tot
        got = [r for r in rows if r["epoch"] == epoch]
        assert len(got) == 20
        assert all(r["drifted"] == want_drifted for r in got)
        for r in got:
            assert r["n_ref"] == ref.get(r["bucket"], 0)
            assert r["n_cur"] == cur.get(r["bucket"], 0)
            assert r["abs_cross"] == abs(
                r["n_cur"] * n_ref_tot - r["n_ref"] * n_cur_tot
            )
    # the plant is load-bearing: exactly the planted epoch drifts
    drifted_epochs = {r["epoch"] for r in rows if r["drifted"]}
    assert drifted_epochs == {2}


def test_m21_exact_threshold_boundary(spark, tmp_path):
    """TVD == t EXACTLY must flag drifted (>= comparator) — the
    boundary the natural fixture cannot plant because its TVDs are
    sampling noise. ref = [5, 5], batch = [6, 4] over 2 buckets:
    sum|n_cur*10 - n_ref*10| = 20, 2*t*N*N = 2*(1/10)*100 = 20."""
    ref_dir = str(tmp_path / "ref")
    sink = str(tmp_path / "sink")
    spark.createDataFrame(
        [(0, 5), (1, 5)], "bucket bigint, n_ref bigint"
    ).write.parquet(ref_dir)
    batch = spark.createDataFrame(
        [(0.1,)] * 6 + [(1.1,)] * 4, "value double"
    )
    streaming_drift_batch(
        batch, ref_dir, sink, 0, lo=0.0, hi=2.0, nbins=2,
        t_num=1, t_den=10,
    )
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 2 and all(r["drifted"] for r in rows)

    # one row less on the heavy bucket -> strictly below t -> clean
    sink2 = str(tmp_path / "sink2")
    batch2 = spark.createDataFrame(
        [(0.1,)] * 11 + [(1.1,)] * 9, "value double"
    )
    streaming_drift_batch(
        batch2, ref_dir, sink2, 0, lo=0.0, hi=2.0, nbins=2,
        t_num=1, t_den=10,
    )
    rows2 = spark.read.parquet(sink2).collect()
    assert len(rows2) == 2 and not any(r["drifted"] for r in rows2)


def test_m21_empty_batch_trips_the_gate(spark, tmp_path):
    """Documented contract: an EMPTY batch flags drifted=True by
    construction (N_cur = 0 makes both sides of the inequality 0 and
    the >= comparator fire) — a shard that delivered nothing is at
    least as anomalous as one that shifted; the n_cur totals in the
    output distinguish the two cases."""
    ref_dir = str(tmp_path / "ref")
    sink = str(tmp_path / "sink")
    spark.createDataFrame(
        [(0, 5), (1, 5)], "bucket bigint, n_ref bigint"
    ).write.parquet(ref_dir)
    empty = spark.createDataFrame([], "value double")
    streaming_drift_batch(
        empty, ref_dir, sink, 0, lo=0.0, hi=2.0, nbins=2
    )
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 2
    assert all(r["n_cur"] == 0 and r["drifted"] for r in rows)


def test_m21_replay_is_idempotent(spark, tmp_path):
    from apache_spark_streaming_project_spark.entry_queries import (
        _m21_events,
    )
    from apache_spark_streaming_project_spark.operators.profile import (
        fixed_width_histogram,
    )

    ref_dir = str(tmp_path / "ref")
    sink = str(tmp_path / "sink")
    nat = spark.read.parquet(f"{SF_DIR}/events.parquet").select("value")
    fixed_width_histogram(nat, "value", 0.0, 500.0, 20).select(
        "bucket", F.col("n").alias("n_ref")
    ).write.parquet(ref_dir)

    d = _m21_events(spark, SF_DIR)
    for i in (0, 1):
        streaming_drift_batch(
            d.filter(F.col("epoch") == i), ref_dir, sink, i
        )
    once = sorted(map(tuple, spark.read.parquet(sink).collect()))
    streaming_drift_batch(
        d.filter(F.col("epoch") == 1), ref_dir, sink, 1
    )
    assert sorted(map(tuple, spark.read.parquet(sink).collect())) == once
