"""DSIR importance resampling (operators/sampling.py:dsir_*).

The registered oracle contract covers the ratio-form score bit-exactly
(entry_queries x12_dsir_weights/x12_dsir_select); these tests cover what
the oracle cannot: the paper-exact ln log-weight mode against a pure
Python reference, the hand-computed tiny case, the tie-break contract,
the loud empty-target guard, and the plan shape.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from apache_spark_streaming_project_spark.operators.sampling import (
    dsir_importance_weights,
    dsir_select,
)

WS = " \t\n\f\r"


def _tokens(text: str) -> list[str]:
    return [t for t in "".join(
        " " if ch in WS else ch for ch in text.strip().lower()
    ).split(" ") if t]


def _grams(text: str) -> list[str]:
    ts = _tokens(text)
    return ts + [f"{a} {b}" for a, b in zip(ts, ts[1:])]


def _bucket(g: str, m: int) -> int:
    h = 0
    for ch in g:
        h = (h * 31 + ord(ch)) % 2147483647
    return h % m


def _reference(docs, m):
    """Pure-Python DSIR: docs = [(id, text, is_target)]; returns
    {id: (n_grams, n_buckets, sum_tp, sum_tq, log_score, ratio_score)}."""
    streams = {i: [_bucket(g, m) for g in _grams(t)] for i, t, _ in docs}
    tq: dict[int, int] = {}
    tp: dict[int, int] = {}
    for i, _, is_t in docs:
        for b in streams[i]:
            tq[b] = tq.get(b, 0) + 1
            if is_t:
                tp[b] = tp.get(b, 0) + 1
    gtp = sum(tp.values())
    gtq = sum(tq.values())
    out = {}
    for i, _, is_t in docs:
        if is_t or not streams[i]:
            continue
        bs = streams[i]
        ratios = [
            ((tp.get(b, 0) + 1.0) * (gtq + m)) / ((tq[b] + 1.0) * (gtp + m))
            for b in bs
        ]
        out[i] = (
            len(bs),
            len(set(bs)),
            sum(tp.get(b, 0) for b in bs),
            sum(tq[b] for b in bs),
            sum(math.log(r) for r in ratios),
            sum(ratios) / len(bs),
        )
    return out


DOCS = [
    (1, "the cat sat on the mat", True),
    (2, "the dog sat on the log", True),
    (3, "le chat et le chien", False),
    (4, "the cat sat quietly", False),
    (5, "der hund und die katze", False),
    (6, "sat on the mat the cat", False),
    (7, "x", False),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t, "en" if is_t else "xx") for i, t, is_t in DOCS],
        "doc_id long, text string, lang string",
    )


def test_log_mode_matches_python_reference(spark, docs_df):
    ref = _reference(DOCS, 64)
    got = {
        r["doc_id"]: r
        for r in dsir_importance_weights(
            docs_df, F.col("lang") == "en", num_buckets=64, score_mode="log"
        ).collect()
    }
    assert set(got) == set(ref)
    for i, (n, nb, stp, stq, log_s, _) in ref.items():
        r = got[i]
        assert (
            r["n_grams"],
            r["n_buckets_hit"],
            r["sum_target_count"],
            r["sum_raw_count"],
        ) == (n, nb, stp, stq)
        assert r["dsir_score"] == pytest.approx(log_s, abs=1e-12)


def test_ratio_mode_matches_python_reference(spark, docs_df):
    ref = _reference(DOCS, 64)
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_importance_weights(
            docs_df, F.col("lang") == "en", num_buckets=64, score_mode="ratio"
        ).collect()
    }
    for i, (*_, ratio_s) in ref.items():
        assert got[i] == pytest.approx(ratio_s, abs=1e-12)


def test_target_like_candidate_outscores_unlike(spark, docs_df):
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_importance_weights(
            docs_df, F.col("lang") == "en", num_buckets=64
        ).collect()
    }
    # doc 4/6 reuse target grams; 3/5 share none
    assert min(got[4], got[6]) > max(got[3], got[5])


def test_select_topk_and_tiebreak(spark):
    # two bit-identical candidate texts -> identical scores; the doc_id
    # tie-break must keep the smaller id when k splits the tie
    rows = [(1, "a b c", "en"), (10, "a b", "xx"), (11, "a b", "xx"),
            (12, "z z z", "xx")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    sel = dsir_select(df, F.col("lang") == "en", 2, num_buckets=64)
    assert [r["doc_id"] for r in sel.collect()] == [10, 11]


def test_empty_target_raises_loudly(spark, docs_df):
    with pytest.raises(Exception, match="is_target selects no documents"):
        dsir_importance_weights(
            docs_df, F.col("lang") == "zz", num_buckets=64
        ).collect()


def test_zero_token_docs_drop_out(spark):
    df = spark.createDataFrame(
        [(1, "a b", "en"), (2, "   ", "xx"), (3, "a", "xx")],
        "doc_id long, text string, lang string",
    )
    got = dsir_importance_weights(df, F.col("lang") == "en", num_buckets=64)
    assert [r["doc_id"] for r in got.collect()] == [3]


def test_plan_shape(spark, docs_df):
    w = dsir_importance_weights(docs_df, F.col("lang") == "en", num_buckets=64)
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    sel = dsir_select(docs_df, F.col("lang") == "en", 2, num_buckets=64)
    splan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in splan


def test_gumbel_topk_matches_python_composition(spark, docs_df):
    """The Gumbel path pinned against a Python composition: Spark's
    xxhash64 is collected as a primitive, then u -> g = -ln(-ln(u)) and
    the top-k over log-weight + g are recomputed with math.log."""
    seed = 7
    w = dsir_importance_weights(
        docs_df, F.col("lang") == "en", num_buckets=64, score_mode="log"
    )
    hashed = {
        r["doc_id"]: r["h"]
        for r in docs_df.select(
            "doc_id",
            F.pmod(F.xxhash64("doc_id", F.lit(seed)), F.lit(2**31)).alias("h"),
        ).collect()
    }
    expect = []
    for r in w.collect():
        u = (hashed[r["doc_id"]] + 0.5) / 2**31
        expect.append((-(r["dsir_score"] + -math.log(-math.log(u))), r["doc_id"]))
    expect_ids = [i for _, i in sorted(expect)[:3]]
    got = dsir_select(
        docs_df, F.col("lang") == "en", 3, num_buckets=64, gumbel_seed=seed
    )
    assert [r["doc_id"] for r in got.collect()] == expect_ids
    # deterministic: same seed -> same selection, and no _key leaks out
    again = dsir_select(
        docs_df, F.col("lang") == "en", 3, num_buckets=64, gumbel_seed=seed
    )
    assert [r["doc_id"] for r in again.collect()] == expect_ids
    assert "_key" not in got.columns


def test_lambda_table_and_frozen_scoring(spark, docs_df):
    """dsir_lambda_table + dsir_score_against compose to exactly
    dsir_importance_weights, and a frozen table round-tripped through
    parquet scores new data with unseen buckets falling back to the
    smoothed (TQ+m)/(TP+m) ratio."""
    import tempfile

    from apache_spark_streaming_project_spark.operators.sampling import (
        dsir_lambda_table,
        dsir_score_against,
    )

    is_t = F.col("lang") == "en"
    lam = dsir_lambda_table(docs_df, is_t, num_buckets=64)
    composed = {
        r["doc_id"]: r
        for r in dsir_score_against(
            docs_df.filter(~is_t), lam, num_buckets=64
        ).collect()
    }
    direct = {
        r["doc_id"]: r
        for r in dsir_importance_weights(
            docs_df, is_t, num_buckets=64
        ).collect()
    }
    assert set(composed) == set(direct)
    for i in direct:
        assert composed[i]["dsir_score"] == direct[i]["dsir_score"]  # bitwise

    # frozen round-trip scoring NEW text: expected score recomputed in
    # Python from the frozen table (new grams may or may not collide
    # into occupied buckets — the reference handles both; buckets absent
    # from the table count as tp = tq = 0, add-1 smoothing's job)
    with tempfile.TemporaryDirectory() as tmp:
        lam.write.mode("overwrite").parquet(tmp + "/lam")
        frozen = spark.read.parquet(tmp + "/lam")
        table = {
            r["bucket"]: (r["target_count"], r["raw_count"])
            for r in frozen.collect()
        }
        tp_tot = sum(v[0] for v in table.values())
        tq_tot = sum(v[1] for v in table.values())
        new_text = "qqqq wwww eeee rrrr"
        new = spark.createDataFrame(
            [(100, new_text)], "doc_id long, text string"
        )
        got = dsir_score_against(new, frozen, num_buckets=64).collect()[0]
        bs = [_bucket(g, 64) for g in _grams(new_text)]
        ratios = [
            ((table.get(b, (0, 0))[0] + 1.0) * (tq_tot + 64.0))
            / ((table.get(b, (0, 0))[1] + 1.0) * (tp_tot + 64.0))
            for b in bs
        ]
        assert got["sum_target_count"] == sum(
            table.get(b, (0, 0))[0] for b in bs
        )
        assert got["sum_raw_count"] == sum(table.get(b, (0, 0))[1] for b in bs)
        assert got["dsir_score"] == pytest.approx(
            sum(ratios) / len(bs), abs=1e-12
        )
