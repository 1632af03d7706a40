"""partitioned_global_ranks (operators/rank.py) — exact global ranking
without a single-partition full-data window (round-11 verdict item 5).

Strategy mirrors the repo's operator-test discipline: a hand-computed
tiny case (ties, including a tie group that MUST straddle a would-be
cut point), a randomized comparison against a pure-Python reference of
the SQL window semantics, and plan-shape pins (the only SinglePartition
exchanges are the 1-row sketch and the <= num_buckets offsets frame).
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from apache_spark_streaming_project_spark.operators.rank import (
    partitioned_global_ranks,
)


def _py_ranks(vals, ties=True):
    """Pure-Python SQL window reference over a list of (key,) or
    (key, tiebreak) tuples: returns dicts keyed by tuple ->
    (row_number, rank, dense_rank, percent_rank, cume_dist)."""
    n = len(vals)
    order = sorted(range(n), key=lambda i: vals[i])
    out = {}
    dense = 0
    prev = None
    for pos, i in enumerate(order, start=1):
        key = vals[i]
        if key != prev:
            dense += 1
            rank = pos
            prev = key
        # cume: last position of my peer group
        out[i] = [pos, rank, dense]
    # second pass for cume (needs group sizes) and pct
    last_of = {}
    for pos, i in enumerate(order, start=1):
        last_of[vals[i]] = pos
    for i in range(n):
        pos, rank, dense = out[i]
        pct = 0.0 if n == 1 else (rank - 1) / (n - 1)
        cume = last_of[vals[i]] / n
        out[i] = (pos, rank, dense, pct, cume)
    return out


def _py_ntile(rn, n, k):
    q, r = divmod(n, k)
    boundary = r * (q + 1)
    if rn <= boundary:
        return (rn - 1) // (q + 1) + 1
    return r + (rn - boundary - 1) // q + 1


def test_rank_hand_computed_ties(spark):
    # values: 5,5,5,2,9,9,1 -> rank over value only
    rows = [(i, v) for i, v in enumerate([5, 5, 5, 2, 9, 9, 1])]
    df = spark.createDataFrame(rows, "id int, v int")
    got = {
        r["id"]: r
        for r in partitioned_global_ranks(df, "v", num_buckets=4).collect()
    }
    # sorted: 1(rank1) 2(rank2) 5,5,5(rank3,dense3) 9,9(rank6,dense4)
    assert (got[6]["rank"], got[6]["dense_rank"]) == (1, 1)
    assert (got[3]["rank"], got[3]["dense_rank"]) == (2, 2)
    for i in (0, 1, 2):
        assert (got[i]["rank"], got[i]["dense_rank"]) == (3, 3)
        assert got[i]["cume_dist"] == pytest.approx(5 / 7)
    for i in (4, 5):
        assert (got[i]["rank"], got[i]["dense_rank"]) == (6, 4)
        assert got[i]["cume_dist"] == pytest.approx(1.0)
    assert got[6]["percent_rank"] == 0.0
    assert got[4]["percent_rank"] == pytest.approx(5 / 6)


def test_rank_total_order_row_number_ntile(spark):
    rows = [(i, (i * 37) % 19) for i in range(57)]  # ties in v, unique id
    df = spark.createDataFrame(rows, "id int, v int")
    out = partitioned_global_ranks(
        df, "v", tiebreak_cols=["id"], num_buckets=8, ntile=5
    ).collect()
    keyed = {(r["v"], r["id"]): r for r in out}
    pyref = _py_ranks([(v, i) for i, v in rows])
    for idx, (i, v) in enumerate(rows):
        r = keyed[(v, i)]
        rn, rank, dense, pct, cume = pyref[idx]
        assert r["row_number"] == rn
        assert r["rank"] == rn  # total order: rank == row_number
        assert r["percent_rank"] == pytest.approx(pct)
        assert r["cume_dist"] == pytest.approx(cume)
        assert r["ntile"] == _py_ntile(rn, 57, 5)


@pytest.mark.parametrize("seed,n,card,buckets", [(1, 200, 12, 4), (2, 500, 50, 16), (3, 64, 3, 64)])
def test_rank_randomized_vs_python_reference(spark, seed, n, card, buckets):
    rng = random.Random(seed)
    rows = [(i, rng.randrange(card)) for i in range(n)]
    df = spark.createDataFrame(rows, "id int, v int").repartition(4)
    out = partitioned_global_ranks(
        df, "v", tiebreak_cols=["id"], num_buckets=buckets, ntile=7
    ).collect()
    pyref = _py_ranks([(v, i) for i, v in rows])
    byid = {r["id"]: r for r in out}
    assert len(byid) == n
    for idx, (i, v) in enumerate(rows):
        rn, rank, dense, pct, cume = pyref[idx]
        r = byid[i]
        assert (r["row_number"], r["rank"], r["dense_rank"]) == (rn, rank, dense), i
        assert r["percent_rank"] == pytest.approx(pct)
        assert r["cume_dist"] == pytest.approx(cume)
        assert r["ntile"] == _py_ntile(rn, n, 7), i


def test_rank_without_tiebreak_omits_row_number(spark):
    df = spark.createDataFrame([(1, 5), (2, 5)], "id int, v int")
    out = partitioned_global_ranks(df, "v")
    assert "row_number" not in out.columns and "ntile" not in out.columns
    assert {"rank", "dense_rank", "percent_rank", "cume_dist"} <= set(out.columns)


def test_rank_single_row_and_constant_column(spark):
    # n=1: percent_rank guard (ANSI division-by-zero) must yield 0.0
    one = partitioned_global_ranks(
        spark.createDataFrame([(1, 42)], "id int, v int"), "v"
    ).collect()[0]
    assert (one["rank"], one["percent_rank"], one["cume_dist"]) == (1, 0.0, 1.0)
    # all keys equal: one giant tie group, sketch cuts collapse
    const = partitioned_global_ranks(
        spark.createDataFrame([(i, 7) for i in range(20)], "id int, v int"),
        "v",
        num_buckets=8,
    ).collect()
    for r in const:
        assert (r["rank"], r["dense_rank"], r["cume_dist"]) == (1, 1, 1.0)
        assert r["percent_rank"] == 0.0


def test_rank_plan_no_fulldata_single_partition_window(spark):
    """The scale claim itself: the full-data window is hash-partitioned
    by bucket; SinglePartition exchanges exist only under the tiny
    sketch/offsets subtrees (aggregates), never feeding a Window over
    the input relation."""
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).alias("v")
    )
    out = partitioned_global_ranks(df, "v", tiebreak_cols=["id"], num_buckets=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every Window node must sit under a hashpartitioning exchange on
    # the bucket column, not a SinglePartition one: assert no Window
    # whose required sort is over the raw 10k rows on one partition.
    import re

    # textual pin: the plan contains a hashpartitioning(_rk_bkt...) and
    # any SinglePartition exchange feeds from an aggregate subtree (its
    # CHILD, printed after it) — i.e. it carries <= num_buckets rows,
    # never the input relation.
    assert "hashpartitioning(_rk_bkt" in plan
    for m in re.finditer(r"SinglePartition", plan):
        child = plan[m.start(): m.start() + 2000]
        assert "HashAggregate" in child or "partial_count" in child
