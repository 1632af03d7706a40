"""Winnowing fingerprints (operators/text.py:winnow_fingerprints /
winnow_shared_pairs — Schleimer, Wilkerson, Aiken 2003)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from apache_spark_streaming_project_spark.operators.text import (
    winnow_fingerprints,
    winnow_shared_pairs,
)

MOD = 2**31 - 1


def ref_fps(text: str, k: int, w: int) -> list[tuple[int, int]]:
    """Pure-Python robust winnowing: (pos, hash) picks, first-occurrence
    de-duplicated, rightmost-min (<= on a left-to-right scan)."""
    # collapse-then-trim, matching the operator (SQL trim is space-only)
    s = re.sub(r"[ \t\n\f\r]+", " ", text.lower()).strip(" ")
    if len(s) < k:
        return []
    hs = []
    for i in range(len(s) - k + 1):
        h = 0
        for ch in s[i : i + k]:
            h = (h * 31 + ord(ch)) % MOD
        hs.append(h)
    m = len(hs)
    picks = []
    for j in range(max(m - w + 1, 1)):
        best = (MOD + 1, -1)
        for i in range(j, min(j + w, m)):
            if hs[i] <= best[0]:
                best = (hs[i], i + 1)
        picks.append((best[1], best[0]))
    out: list[tuple[int, int]] = []
    seen = set()
    for p in picks:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out


TEXTS = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "the   QUICK brown\tfox jumps over a sleepy cat"),
    (3, "ab"),  # shorter than k -> no fingerprints
    (4, "abcde"),  # one gram -> one truncated window
    (5, "xyzxyzxyzxyzxyzxyz"),  # periodic text -> heavy pick dedup
    (6, ""),
    (7, "aaaaaaaaaaaaaaaa"),  # all-equal hashes -> rightmost-min ties
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


@pytest.mark.parametrize("k,w", [(5, 4), (8, 5), (3, 1)])
def test_matches_python_reference(spark, docs, k, w):
    got: dict[int, list[tuple[int, int]]] = {}
    for r in winnow_fingerprints(docs, k=k, w=w).collect():
        got.setdefault(r["doc_id"], []).append((r["fp_pos"], r["fp_hash"]))
    for i, t in TEXTS:
        assert sorted(got.get(i, [])) == sorted(ref_fps(t, k, w)), (i, k, w)


def test_local_match_guarantee(spark):
    """Any shared run of >= k + w - 1 chars yields a shared fingerprint
    HASH — the winnowing theorem (Schleimer et al. §3), checked on
    documents that differ everywhere else."""
    k, w = 5, 4
    shared = "zqvxkwjrmt"  # k + w + 1 chars, no other occurrence
    a = "first document body " + shared + " completely distinct tail"
    b = "unrelated preamble wording " + shared + " different ending here"
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    fps = winnow_fingerprints(df, k=k, w=w).collect()
    ha = {r["fp_hash"] for r in fps if r["doc_id"] == 1}
    hb = {r["fp_hash"] for r in fps if r["doc_id"] == 2}
    assert ha & hb


def test_density_bounds(spark, docs):
    """At most one pick per window start; at least one fingerprint for
    any doc with >= 1 gram."""
    k, w = 5, 4
    counts = {
        r["doc_id"]: r["n"]
        for r in winnow_fingerprints(docs, k=k, w=w)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for i, t in TEXTS:
        s = re.sub(r"[ \t\n\f\r]+", " ", t.strip().lower())
        m = len(s) - k + 1
        if m < 1:
            assert i not in counts
        else:
            assert 1 <= counts[i] <= max(m - w + 1, 1)


def test_shared_pairs_and_df_cap(spark):
    shared = "zqvxkwjrmtpl"
    rows = [(i, f"doc {i} unique text " + shared) for i in range(1, 5)]
    rows.append((9, "nothing in common with the others at all"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = winnow_shared_pairs(df, k=5, w=4, min_shared=1, max_fp_df=None)
    got = {(r["key_a"], r["key_b"]) for r in pairs.collect()}
    assert {(a, b) for a in range(1, 5) for b in range(a + 1, 5)} <= got
    assert not any(9 in p for p in got)
    # a df cap below the clique size kills the shared hash -> no pairs
    # survive on the shared run alone... unless rarer doc-specific
    # overlaps exist; assert the SHARED-run pairs specifically vanish
    capped = winnow_shared_pairs(df, k=5, w=4, min_shared=1, max_fp_df=3)
    capped_pairs = {(r["key_a"], r["key_b"]) for r in capped.collect()}
    assert len(capped_pairs) < len(got)
