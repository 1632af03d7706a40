"""m17_streaming_packing (round-12): cross-batch BPE-budget sequence
packing via sink-derived offsets and idempotent batch-keyed publish.
Replays the PRODUCTION body (operators/text.py:streaming_pack_publish)
directly, per the dsir_publish_scored_batch precedent."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_spark_streaming_project_spark.operators.text import (
    pack_documents,
    streaming_pack_publish,
)

ROWS = [
    # (lang, doc_id, n_tokens) — two languages interleaved across waves
    ("en", 0, 100), ("de", 1, 200), ("en", 2, 250),
    ("en", 3, 10), ("de", 4, 60), ("de", 5, 300),
    ("en", 6, 256), ("de", 7, 1), ("en", 8, 500),
]


def _batch(spark, ids):
    return spark.createDataFrame(
        [r for r in ROWS if r[1] in ids],
        "lang string, doc_id long, n_tokens_bpe long",
    )


def _sink_rows(spark, sink):
    return sorted(
        (r["lang"], r["doc_id"], r["n_tokens_bpe"], r["pack_id"])
        for r in spark.read.parquet(sink).collect()
    )


def test_streaming_equals_batch_packing(spark, tmp_path):
    """Three production batches == pack_documents over the arrival-
    ordered concatenation (pack ids are global, budget 256)."""
    sink = str(tmp_path / "sink")
    waves = [{0, 1, 2}, {3, 4, 5}, {6, 7, 8}]
    for i, ids in enumerate(waves):
        streaming_pack_publish(_batch(spark, ids), sink, i, 256)

    all_df = spark.createDataFrame(
        [(lang, doc, tok, doc // 3) for lang, doc, tok in ROWS],
        "lang string, doc_id long, n_tokens_bpe long, wave long",
    ).withColumn("arrival", F.col("wave") * 1000 + F.col("doc_id"))
    want = sorted(
        (r["lang"], r["doc_id"], r["n_tokens_bpe"], r["pack_id"])
        for r in pack_documents(
            all_df, "n_tokens_bpe", 256, "arrival", "lang"
        ).collect()
    )
    assert _sink_rows(spark, sink) == want


def test_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering an already-published
    batch must reproduce the identical sink (offsets derive only from
    batches with a SMALLER id, and the publish overwrites its own
    directory)."""
    sink = str(tmp_path / "sink")
    streaming_pack_publish(_batch(spark, {0, 1, 2}), sink, 0, 256)
    streaming_pack_publish(_batch(spark, {3, 4, 5}), sink, 1, 256)
    before = _sink_rows(spark, sink)
    # replay batch 1 (and then batch 0) — both no-ops
    streaming_pack_publish(_batch(spark, {3, 4, 5}), sink, 1, 256)
    assert _sink_rows(spark, sink) == before
    streaming_pack_publish(_batch(spark, {0, 1, 2}), sink, 0, 256)
    assert _sink_rows(spark, sink) == before
