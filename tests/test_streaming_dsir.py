"""m15 streaming DSIR: replay idempotence of the batch-keyed publish.

foreachBatch is at-least-once — the engine may re-deliver a batch after
a failure between sink write and checkpoint commit. The m15 sink
overwrites a deterministic batch-keyed directory, so replay must be a
no-op; a blind append would double every replayed row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_spark_streaming_project_spark.operators.sampling import (
    dsir_lambda_table,
    dsir_publish_scored_batch,
)


def test_batch_replay_is_idempotent(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "en"),
            (2, "the dog sat on the log", "en"),
            (3, "le chat et le chien", "xx"),
            (4, "the cat sat quietly", "xx"),
            (5, "der hund und die katze", "xx"),
        ],
        "doc_id long, text string, lang string",
    )
    lam_dir = str(tmp_path / "lam")
    sink = str(tmp_path / "scored")
    dsir_lambda_table(docs, F.col("lang") == "en", num_buckets=64).write.mode(
        "overwrite"
    ).parquet(lam_dir)

    # the PRODUCTION publish body (round-11 review: a test-local copy
    # would keep passing if the real sink regressed to blind append)
    def score_batch(batch_df, batch_id):
        dsir_publish_scored_batch(
            batch_df, lam_dir, sink, batch_id, num_buckets=64
        )

    cands = docs.filter(F.col("lang") != "en")
    b0 = cands.filter(F.col("doc_id") % 2 == 1)
    b1 = cands.filter(F.col("doc_id") % 2 == 0)
    score_batch(b0, 0)
    score_batch(b1, 1)
    once = sorted(
        (r["doc_id"], r["dsir_score"])
        for r in spark.read.parquet(sink).collect()
    )
    # REPLAY batch 0 (engine re-delivery after a crash before commit)
    score_batch(b0, 0)
    twice = sorted(
        (r["doc_id"], r["dsir_score"])
        for r in spark.read.parquet(sink).collect()
    )
    assert twice == once  # no duplicated rows, scores bit-identical
    assert [i for i, _ in once] == [3, 4, 5]


def test_registered_m15_matches_batch_scorer(spark, sf_dir):
    """End-to-end: the registered streaming query's output equals the
    batch scorer applied to the same candidates (bit-identical scores)."""
    from apache_spark_streaming_project_spark.entry_queries import QUERIES
    from apache_spark_streaming_project_spark.operators.sampling import (
        dsir_importance_weights,
    )

    got = QUERIES["m15_streaming_dsir"].fn(spark, sf_dir).collect()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exp = {
        r["doc_id"]: r
        for r in dsir_importance_weights(
            d, F.col("lang") == F.lit("en"), "text", "doc_id", 4096
        ).collect()
    }
    assert len(got) == len(exp)
    for r in got:
        e = exp[r["doc_id"]]
        assert r["dsir_score"] == e["dsir_score"]
        assert r["n_grams"] == e["n_grams"]
        assert r["epoch"] == r["doc_id"] % 3
