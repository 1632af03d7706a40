"""Unit tests for stratified sampling and hash-based splits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(90)]
    return spark.createDataFrame(rows, ["doc_id", "lang"])


def test_stratified_sample_exact_quotas(spark, docs):
    from apache_spark_streaming_project_spark.operators.sampling import (
        stratified_sample,
    )

    out = stratified_sample(docs, ["lang"], 5, "doc_id").collect()
    by_lang: dict[str, list[int]] = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    assert {k: len(v) for k, v in by_lang.items()} == {
        "en": 5, "de": 5, "fr": 5,
    }
    # deterministic: the 5 smallest doc_ids per stratum
    assert sorted(by_lang["en"]) == [0, 3, 6, 9, 12]


def test_stratified_sample_short_stratum_kept_whole(spark):
    from apache_spark_streaming_project_spark.operators.sampling import (
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "xx")], ["doc_id", "lang"]
    )
    out = stratified_sample(df, ["lang"], 5, "doc_id").collect()
    assert len(out) == 3


def test_hash_split_partition_properties(spark, docs):
    from apache_spark_streaming_project_spark.operators.sampling import (
        hash_split,
    )

    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = out.collect()
    assert len(rows) == 90
    assert all(r.split in ("train", "val", "test") for r in rows)
    # deterministic & stable: a re-run and a subset agree row-for-row
    again = {
        r.doc_id: r.split
        for r in hash_split(
            docs.filter(F.col("doc_id") < 30),
            "doc_id",
            {"train": 0.8, "val": 0.1, "test": 0.1},
        ).collect()
    }
    full = {r.doc_id: r.split for r in rows}
    assert all(full[k] == v for k, v in again.items())
    # pin the assignment FUNCTION itself (xxhash64(key, 'split') bucket
    # carve), not just self-consistency: the oracle side can only check
    # the contract (DuckDB has no xxhash64), so a salt/hash perturbation
    # survives the gate (round-10 mutation audit x7_split_salt) and must
    # die here instead. Golden values computed once from the shipped
    # implementation.
    golden = {0: "train", 1: "train", 2: "test", 3: "val", 4: "train",
              5: "val", 6: "train", 7: "train", 8: "train", 9: "train"}
    assert {k: full[k] for k in golden} == golden


def test_hash_split_rejects_bad_fractions(spark, docs):
    from apache_spark_streaming_project_spark.operators.sampling import (
        hash_split,
    )

    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.2})


def test_weighted_sample_favors_heavy_and_is_partition_independent(spark):
    from apache_spark_streaming_project_spark.operators.sampling import (
        weighted_sample,
    )

    # 500 light rows (w=1) + 500 heavy rows (w=50): a 100-row A-ES draw
    # should be dominated by heavy rows (E[heavy] ~ 98)
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") >= 500, 50).otherwise(1).alias("w"),
    )
    picked = weighted_sample(df, "w", 100, "doc_id").collect()
    assert len(picked) == 100
    heavy = sum(1 for r in picked if r.doc_id >= 500)
    assert heavy >= 85

    # determinism: same selection regardless of physical partitioning
    again = weighted_sample(df.repartition(7), "w", 100, "doc_id").collect()
    assert sorted(r.doc_id for r in picked) == sorted(r.doc_id for r in again)


class TestNegativeSampling:
    def test_negatives_differ_in_group_and_are_deterministic(self, spark):
        from apache_spark_streaming_project_spark.operators.sampling import (
            negative_sample,
        )

        rows = [(i, i % 4) for i in range(100)]  # dense keys, 4 groups
        df = spark.createDataFrame(rows, "vec_id long, label int")
        out1 = negative_sample(df, "vec_id", "label", k=3, probes=8).collect()
        out2 = negative_sample(df, "vec_id", "label", k=3, probes=8).collect()
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
        label = {i: i % 4 for i in range(100)}
        for r in out1:
            assert label[r.neg_id] != label[r.vec_id]
            assert r.neg_id != r.vec_id
        # 8 probes vs 1/4 same-group odds: every anchor should fill its 3
        per_anchor = {}
        negs = {}
        for r in out1:
            per_anchor.setdefault(r.vec_id, []).append(r.neg_rank)
            negs.setdefault(r.vec_id, []).append(r.neg_id)
        assert all(sorted(v) == [1, 2, 3] for v in per_anchor.values())
        # the k negatives per anchor are DISTINCT: probe hash collisions
        # (two probes nominating the same id) must be deduped, not ranked
        # twice — repeats are semantically degraded for contrastive pairs
        for v in negs.values():
            assert len(set(v)) == len(v)


def test_weighted_sample_rejects_nonpositive_weights(spark):
    """Round-7 self-review: w=0 divided ln(u) by zero (ANSI job failure)
    and w<0 made ln(u)/w POSITIVE — outranking every legitimate row. Both
    now fail loudly in-plan instead of crashing opaquely or silently
    returning a garbage sample."""
    from apache_spark_streaming_project_spark.operators.sampling import (
        weighted_sample,
    )

    good = spark.createDataFrame(
        [(i, 1.0 + i) for i in range(10)], ["doc_id", "w"]
    )
    assert weighted_sample(good, "w", 3, "doc_id").count() == 3
    for bad_w in (0.0, -1.0):
        bad = spark.createDataFrame(
            [(0, 1.0), (1, bad_w)], ["doc_id", "w"]
        )
        with pytest.raises(Exception, match="weights > 0"):
            weighted_sample(bad, "w", 2, "doc_id").collect()


def test_time_split_labels_null_timestamps_distinctly(spark):
    """NULL event times must NOT fold into 'purged' (they are a data
    defect, not a leakage decision)."""
    from apache_spark_streaming_project_spark.operators.sampling import (
        time_split,
    )

    df = spark.createDataFrame(
        [("2024-01-21 00:00:00",), ("2024-01-22 06:00:00",),
         ("2024-01-23 00:00:00",), (None,)],
        "ts string",
    ).select(F.col("ts").cast("timestamp_ntz").alias("ts"))
    got = {
        (r.ts is None, r.split)
        for r in time_split(df, "ts", "2024-01-22 00:00:00", "12 HOURS").collect()
    }
    assert (True, "null_time") in got
    assert {(False, "train"), (False, "purged"), (False, "test")} <= got


def test_mixture_resample_rejects_nonpositive_weight_sum(spark):
    """An all-zero (or empty) weight table must fail with the loud
    in-plan assert, not an ANSI DIVIDE_BY_ZERO from the quota arithmetic
    (round-9 degenerate-input sweep)."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from apache_spark_streaming_project_spark.operators.sampling import (
        mixture_resample,
    )

    df = spark.createDataFrame(
        [(i, "s" + str(i % 2)) for i in range(10)], "id long, src string"
    )
    w = spark.createDataFrame(
        [("s0", 0.0), ("s1", 0.0)], "src string, weight double"
    )
    with _pytest.raises(Exception, match="positive value"):
        mixture_resample(df, "src", w, 10, F.col("id")).count()
    # an EMPTY weight table must fail just as loudly: the per-weight
    # guard never evaluates (zero weight rows), so the sentinel row —
    # derived from the always-one-row sum aggregate — carries the
    # assert instead (round-10 ADVICE fix; previously this silently
    # returned an empty sample)
    empty_w = spark.createDataFrame([], "src string, weight double")
    with _pytest.raises(Exception, match="positive value"):
        mixture_resample(df, "src", empty_w, 10, F.col("id")).count()
