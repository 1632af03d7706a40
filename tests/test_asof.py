"""As-of join + range join unit tests (hand-computed tiny inputs)."""

from datetime import datetime

import pyspark.sql.functions as F

from apache_spark_streaming_project_spark.operators.asof import (
    asof_join,
    range_join_small,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00")),
            (2, "u1", _ts("2024-01-01T10:05:00")),
            (3, "u2", _ts("2024-01-01T09:00:00")),
        ],
        "lid long, user string, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, "u1", _ts("2024-01-01T09:59:00")),
            (101, "u1", _ts("2024-01-01T10:02:00")),
            (102, "u2", _ts("2024-01-01T09:30:00")),  # after u2's only left row
        ],
        "rid long, user string, rts timestamp",
    )
    out = asof_join(
        left, right, on="user", left_ts="lts", right_ts="rts",
        right_payload=["rid"], right_tiebreak="rid",
    )
    got = {r["lid"]: r["matched_rid"] for r in out.collect()}
    assert got == {1: 100, 2: 101, 3: None}


def test_asof_join_equal_ts_inclusive_and_tiebreak(spark):
    t = _ts("2024-01-01T12:00:00")
    left = spark.createDataFrame([(1, "u", t)], "lid long, user string, lts timestamp")
    right = spark.createDataFrame(
        [(7, "u", t), (9, "u", t)], "rid long, user string, rts timestamp"
    )
    out = asof_join(
        left, right, on="user", left_ts="lts", right_ts="rts",
        right_payload=["rid"], right_tiebreak="rid",
    )
    # ts <= is inclusive; equal-ts dup resolved to max tiebreak
    assert out.collect()[0]["matched_rid"] == 9


def test_asof_join_single_shuffle(spark):
    left = spark.createDataFrame([(1, "u", _ts("2024-01-01T12:00:00"))],
                                 "lid long, user string, lts timestamp")
    right = spark.createDataFrame([(7, "u", _ts("2024-01-01T11:00:00"))],
                                  "rid long, user string, rts timestamp")
    out = asof_join(left, right, on="user", left_ts="lts", right_ts="rts",
                    right_payload=["rid"])
    from apache_spark_streaming_project_spark.plans.inspect import count_shuffles

    # no range explosion, no join: just the windowing shuffle on the key
    assert count_shuffles(out) <= 1


def test_range_join_small_is_broadcast_nested_loop(spark):
    fact = spark.range(100).select(F.col("id").cast("double").alias("v"))
    tiers = spark.createDataFrame(
        [("lo", 0, 50), ("hi", 50, 200)], "tier string, lo long, hi long"
    )
    out = range_join_small(fact, tiers, "v", "lo", "hi")
    from apache_spark_streaming_project_spark.plans.inspect import physical_plan

    assert "BroadcastNestedLoopJoin" in physical_plan(out, "simple")
    counts = {r["tier"]: r["n"] for r in
              out.groupBy("tier").agg(F.count("*").alias("n")).collect()}
    assert counts == {"lo": 50, "hi": 50}


def test_audio_features_deterministic(spark):
    from apache_spark_streaming_project_spark.operators.multimodal import (
        extract_audio_features,
        synthetic_media_table,
    )

    media = synthetic_media_table(spark, n=12).filter(
        F.col("meta.media_type") == "audio"
    )
    a = extract_audio_features(media).orderBy("media_id").collect()
    b = extract_audio_features(media).orderBy("media_id").collect()
    assert a == b
    assert len(a) == 4  # every 3rd row is audio
    assert all(r["rms"] is not None and r["zero_crossings"] >= 0 for r in a)
    assert all(r["sample_rate"] == 16000 for r in a)


def test_range_join_bucketed_matches_small_on_overlapping_intervals(spark):
    """The grid rewrite is semantics-preserving, including OVERLAPPING and
    multi-cell-spanning intervals (a value matching k intervals appears k
    times, each exactly once)."""
    import random

    from apache_spark_streaming_project_spark.operators.asof import (
        range_join_bucketed,
        range_join_small,
    )

    rng = random.Random(7)
    ivs = []
    for i in range(200):
        lo = rng.uniform(0, 950)
        ivs.append((i, lo, lo + rng.uniform(0.5, 120)))  # overlaps + wide spans
    intervals = spark.createDataFrame(ivs, ["iv_id", "lo", "hi"])
    fact = spark.createDataFrame(
        [(i, rng.uniform(-5, 1010)) for i in range(3000)], ["row_id", "v"]
    )
    a = {
        (r.row_id, r.iv_id)
        for r in range_join_small(fact, intervals, "v", "lo", "hi").collect()
    }
    b = {
        (r.row_id, r.iv_id)
        for r in range_join_bucketed(
            fact, intervals, "v", "lo", "hi", bucket_width=25.0
        ).collect()
    }
    assert a == b and len(a) > 3000  # non-trivial overlap volume


def test_range_join_bucketed_plan_is_hash_join_no_fact_shuffle(spark):
    """At the 10k-interval tier the physical plan must be a (broadcast)
    HASH join on the grid cell — never a nested-loop over all intervals —
    with zero Exchange on the fact side."""
    from pyspark.sql import functions as F

    from apache_spark_streaming_project_spark.operators.asof import (
        range_join_bucketed,
    )

    fact = spark.range(200_000).select((F.col("id") % 500_000).cast("double").alias("v"))
    intervals = spark.range(10_000).select(
        F.col("id").alias("iv_id"),
        (F.col("id") * 50).cast("double").alias("lo"),
        ((F.col("id") + 1) * 50).cast("double").alias("hi"),
    )
    out = range_join_bucketed(fact, intervals, "v", "lo", "hi", 50.0)
    out.write.format("noop").mode("overwrite").save()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # broadcast exchange only — the fact side must not hash-shuffle
    assert "Exchange hashpartitioning" not in plan


class TestIntervalOverlapJoin:
    def _mk(self, spark, rows, cols):
        return spark.createDataFrame(rows, cols)

    def test_closed_boundary_touch_matches(self, spark):
        from apache_spark_streaming_project_spark.operators.asof import (
            interval_overlap_join,
        )

        a = self._mk(spark, [(1, 0, 10)], "aid int, a_lo long, a_hi long")
        b = self._mk(spark, [(7, 10, 20)], "bid int, b_lo long, b_hi long")
        out = interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 8).collect()
        assert len(out) == 1  # closed intervals: touching endpoints overlap

    def test_multi_cell_interval_emits_exactly_once(self, spark):
        from apache_spark_streaming_project_spark.operators.asof import (
            interval_overlap_join,
        )

        # a spans 13 cells at w=8; b sits in the middle -> the dedup anchor
        # must emit the pair exactly once, not once per shared cell
        a = self._mk(spark, [(1, 0, 100)], "aid int, a_lo long, a_hi long")
        b = self._mk(spark, [(7, 50, 55)], "bid int, b_lo long, b_hi long")
        out = interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 8).collect()
        assert len(out) == 1

    def test_same_cell_disjoint_rejected(self, spark):
        from apache_spark_streaming_project_spark.operators.asof import (
            interval_overlap_join,
        )

        a = self._mk(spark, [(1, 0, 5)], "aid int, a_lo long, a_hi long")
        b = self._mk(spark, [(7, 6, 7)], "bid int, b_lo long, b_hi long")
        out = interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 64).collect()
        assert out == []

    def test_equi_join_on_cell_not_cartesian(self, spark):
        from apache_spark_streaming_project_spark.operators.asof import (
            interval_overlap_join,
        )

        a = self._mk(spark, [(i, i * 10, i * 10 + 5) for i in range(50)],
                     "aid int, a_lo long, a_hi long")
        b = self._mk(spark, [(i, i * 9, i * 9 + 7) for i in range(50)],
                     "bid int, b_lo long, b_hi long")
        plan = (
            interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 16)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # equi-join on the cell id (SMJ or hash per size stats) — never a
        # cartesian / nested-loop over the interval pairs
        assert "Cartesian" not in plan and "NestedLoop" not in plan
        assert "SortMergeJoin" in plan or "HashJoin" in plan

    def test_outer_how_rejected(self, spark):
        import pytest

        from apache_spark_streaming_project_spark.operators.asof import (
            interval_overlap_join,
        )

        a = self._mk(spark, [(1, 0, 10)], "aid int, a_lo long, a_hi long")
        b = self._mk(spark, [(7, 5, 8)], "bid int, b_lo long, b_hi long")
        with pytest.raises(ValueError, match="inner"):
            interval_overlap_join(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 8, how="left")

    def test_shared_column_names_resolve_per_side(self, spark):
        """a and b both call their bounds (lo, hi): the dedup anchor must
        bind each side's lo to ITS OWN DataFrame, not raise an ambiguous
        reference or silently mis-bind (the pre-fix F.expr anchor did)."""
        from apache_spark_streaming_project_spark.operators.asof import (
            interval_overlap_join,
        )

        a = self._mk(spark, [(1, 0, 100), (2, 200, 210)], "aid int, lo long, hi long")
        b = self._mk(spark, [(7, 50, 55), (8, 205, 300)], "bid int, lo long, hi long")
        out = interval_overlap_join(a, b, "lo", "hi", "lo", "hi", 8).collect()
        assert sorted((r.aid, r.bid) for r in out) == [(1, 7), (2, 8)]


def test_asof_ignores_null_timestamp_and_null_key_right_rows(spark):
    """Round-7 self-review: ascending window order sorts NULL _ts FIRST
    (its payload would become 'most recent' for every left row), and
    partitionBy groups NULL keys together — neither is a legitimate
    match (SQL joins never match NULL keys; ASOF never matches a NULL
    timestamp)."""
    from apache_spark_streaming_project_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 5), (None, 10)], "k int, lts int"
    )
    right = spark.createDataFrame(
        [(1, None, "null-ts"), (None, 5, "null-key")],
        "k int, rts int, payload string",
    )
    got = {
        (r.k, r.lts): r.matched_payload
        for r in asof_join(left, right, "k", "lts", "rts", ["payload"]).collect()
    }
    assert got == {(1, 5): None, (None, 10): None}


def test_interval_overlap_join_rejects_nonpositive_bucket_width(spark):
    """bucket_width=0 previously made every row vanish via
    explode(sequence(NULL, NULL)) — 'no overlaps' from a typo."""
    import pytest as _pytest

    from apache_spark_streaming_project_spark.operators.asof import (
        interval_overlap_join,
    )

    a = spark.createDataFrame([(1, 0, 10)], "ida int, lo int, hi int")
    b = spark.createDataFrame([(2, 5, 15)], "idb int, blo int, bhi int")
    for bad in (0, -4):
        with _pytest.raises(ValueError, match="bucket_width"):
            interval_overlap_join(a, b, "lo", "hi", "blo", "bhi", bad)
