"""m14_streaming_lsh_dedup (round-11): streaming near-dup dedup with a
persisted LSH band index. Unit pins for the two new dedup helpers plus
an end-to-end run at sf0.001 compared against a pure-Python ground
truth of the declared semantics (keep the first (epoch, doc_id) per
shingle-SET equivalence class; unsignable docs always kept)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from apache_spark_streaming_project_spark.entry_queries import QUERIES
from apache_spark_streaming_project_spark.operators.dedup import (
    lsh_band_rows,
    minhash_signatures_df,
    shingle_sets_equal,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_shingle_set(text: str, n: int = 3) -> frozenset[str]:
    toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
    return frozenset(
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    )


def test_shingle_sets_equal_semantics(spark):
    rows = [
        (["a b c", "b c d"], ["b c d", "a b c"], True),   # same set, order
        (["a b c"], ["a b c", "b c d"], False),           # strict subset
        ([], [], False),                                   # empty never eq
        (["a b c"], ["a b c"], True),
    ]
    df = spark.createDataFrame(
        rows, "sa array<string>, sb array<string>, want boolean"
    )
    got = df.select(
        shingle_sets_equal(F.col("sa"), F.col("sb")).alias("got"), "want"
    ).collect()
    for r in got:
        assert r["got"] == r["want"]


def test_band_rows_equal_signatures_collide_everywhere(spark):
    """Equal texts -> equal signatures -> equal band_hash in EVERY band
    (the recall-1 property the streaming index depends on); a different
    text must differ in at least one band at these sizes."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "an entirely different document about parquet row groups"),
        ],
        "doc_id long, text string",
    )
    sig = minhash_signatures_df(docs, "doc_id", "text", 32, 3)
    bands = lsh_band_rows(sig, 32, 8).select("_key", "band", "band_hash")
    rows = {(r["_key"], r["band"]): r["band_hash"] for r in bands.collect()}
    assert len(rows) == 24
    for b in range(8):
        assert rows[(1, b)] == rows[(2, b)]
    assert any(rows[(1, b)] != rows[(3, b)] for b in range(8))


def test_m14_end_to_end_matches_python_ground_truth(spark):
    out = QUERIES["m14_streaming_lsh_dedup"].fn(spark, SF_DIR).collect()
    kept = [(r["doc_id"], r["epoch"]) for r in out]

    # ground truth: replay the planted fixture in Python
    from apache_spark_streaming_project_spark.entry_queries import (
        _M14_ALPHA,
        _M14_ALPHA_TRUNC,
        _M14_BETA,
        _t,
    )

    docs = _t(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    fixture = []
    for r in sorted(docs, key=lambda r: r["doc_id"]):
        i = r["doc_id"]
        text = (
            _M14_ALPHA
            if i % 11 == 0
            else _M14_BETA
            if i % 13 == 5
            else _M14_ALPHA_TRUNC
            if i % 17 == 2
            else r["text"]
        )
        fixture.append((i, i % 3, text))
    seen: set[frozenset[str]] = set()
    want = []
    for i, epoch, text in sorted(fixture, key=lambda t: (t[1], t[0])):
        s = _py_shingle_set(text)
        if not s:
            want.append((i, epoch))
        elif s not in seen:
            seen.add(s)
            want.append((i, epoch))
    assert kept == sorted(want)

    # the fixture must actually exercise all three plants: alpha/beta
    # each keep exactly ONE planted doc, and every truncated-alpha doc
    # beyond the first is deduped against its own class, never alpha's
    kept_ids = {k for k, _ in kept}
    alphas = [i for i, _, t in fixture if t == _M14_ALPHA]
    betas = [i for i, _, t in fixture if t == _M14_BETA]
    truncs = [i for i, _, t in fixture if t == _M14_ALPHA_TRUNC]
    assert len(alphas) > 1 and len(betas) > 1 and len(truncs) > 1
    assert len(kept_ids & set(alphas)) == 1
    assert len(kept_ids & set(betas)) == 1
    assert len(kept_ids & set(truncs)) == 1  # kept despite band collisions
