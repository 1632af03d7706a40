"""Compaction/retention for the streaming dedup corpus-lifetime stores
(round-12, VERDICT item 7).

m14/m14b's band index and document stores are append-only parquet
streams: every micro-batch appends its own part files, so a long-lived
deployment accumulates small files and probe cost grows with file count,
not data size. The existing table-maintenance primitive
(sources/partitioned.py:compact_parquet — shuffle-free coalesce rewrite
into a fresh directory, swap after verification) composes directly onto
the stores. These tests pin the two invariants a maintenance job must
guarantee: the kept-set RESULT is unchanged by compaction, and continued
ingestion against the compacted stores behaves identically to ingestion
against the fragmented originals."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from apache_spark_streaming_project_spark.operators.dedup import (
    streaming_threshold_dedup_batch,
)
from apache_spark_streaming_project_spark.sources.partitioned import (
    compact_parquet,
)

SF_DIR = "/root/testdata/sf0.001"


def _kept(spark, text_store):
    return sorted(
        (r["doc_id"], r["epoch"])
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(text_store)
        .filter(F.col("kept"))
        .collect()
    )


def test_m14b_stores_compaction_preserves_results(spark, tmp_path):
    from apache_spark_streaming_project_spark.entry_queries import (
        _M14B_T,
        _m14b_docs,
    )

    d = _m14b_docs(spark, SF_DIR)
    frag_band = str(tmp_path / "band")
    frag_text = str(tmp_path / "text")
    # drive three production batches -> fragmented append-only stores
    for i in range(3):
        streaming_threshold_dedup_batch(
            d.filter(F.col("epoch") == i), frag_band, frag_text, _M14B_T, i
        )
    kept_before = _kept(spark, frag_text)
    n_frag = len(glob.glob(frag_band + "/**/part-*", recursive=True))
    assert n_frag >= 3  # at least one part file per batch publish

    dense_band = str(tmp_path / "band_c")
    dense_text = str(tmp_path / "text_c")
    compact_parquet(spark, frag_band, dense_band, 1, recursive=True)
    compact_parquet(spark, frag_text, dense_text, 1, recursive=True)
    assert len(glob.glob(dense_band + "/part-*")) == 1
    assert len(glob.glob(dense_text + "/part-*")) == 1

    # invariant 1: the kept set is byte-identical after compaction
    assert _kept(spark, dense_text) == kept_before
    # and the band index carries exactly the same rows
    a = sorted(map(tuple, spark.read.option("recursiveFileLookup", "true")
                   .parquet(frag_band).collect()))
    b = sorted(map(tuple, spark.read.option("recursiveFileLookup", "true")
                   .parquet(dense_band).collect()))
    assert a == b

    # invariant 2: continued ingestion on the compacted stores equals
    # continued ingestion on the fragmented ones — same fourth batch
    # (re-deliver epoch 0 docs relabeled as epoch 3: every doc is a
    # cross-epoch exact dup and must be dropped via the index)
    wave4 = d.filter(F.col("epoch") == 0).withColumn(
        "epoch", F.lit(3).cast("bigint")
    )
    streaming_threshold_dedup_batch(
        wave4, frag_band, frag_text, _M14B_T, 3
    )
    streaming_threshold_dedup_batch(
        wave4, dense_band, dense_text, _M14B_T, 3
    )
    assert _kept(spark, dense_text) == _kept(spark, frag_text)
    # the re-delivered epoch is entirely deduplicated
    assert not [
        (k, e) for (k, e) in _kept(spark, dense_text) if e == 3
    ]


def test_retention_prunes_only_dropped_rows(spark, tmp_path):
    """Retention companion: a maintenance job may drop the text rows of
    DROPPED docs older than a horizon (they exist only to serve the
    pair-rule verify; the band index must stay complete). Pruning
    dropped epoch-0 texts must not change the kept set, because kept
    rows and the band index are untouched."""
    from apache_spark_streaming_project_spark.entry_queries import (
        _M14B_T,
        _m14b_docs,
    )

    d = _m14b_docs(spark, SF_DIR)
    band = str(tmp_path / "band")
    text = str(tmp_path / "text")
    for i in range(3):
        streaming_threshold_dedup_batch(
            d.filter(F.col("epoch") == i), band, text, _M14B_T, i
        )
    kept_before = _kept(spark, text)

    pruned = str(tmp_path / "text_pruned")
    spark.read.option("recursiveFileLookup", "true").parquet(text).filter(
        F.col("kept") | (F.col("epoch") > 0)
    ).coalesce(1).write.parquet(pruned)
    assert _kept(spark, pruned) == kept_before

    # CAVEAT pinned: pruning dropped texts weakens the verify set for
    # FUTURE batches (a new doc similar only to a pruned dropped doc
    # would now be kept). The maintenance contract is therefore
    # retention-by-horizon on dropped rows only, documented in
    # BASELINE.md; this assertion demonstrates the drift the horizon
    # trades away.
    wave4 = d.filter(F.col("epoch") == 1).withColumn(
        "epoch", F.lit(3).cast("bigint")
    )
    band2 = str(tmp_path / "band2")
    # hard-link clone of the batch-keyed store tree (subdirs per batch)
    shutil.copytree(band, band2, copy_function=os.link)
    streaming_threshold_dedup_batch(wave4, band, text, _M14B_T, 3)
    streaming_threshold_dedup_batch(wave4, band2, pruned, _M14B_T, 3)
    # epoch-1 re-delivery dedups against epoch-1 originals (kept rows,
    # never pruned) -> identical outcome even after pruning
    assert _kept(spark, pruned) == _kept(spark, text)


def _rows(spark, store):
    return sorted(
        map(
            tuple,
            spark.read.option("recursiveFileLookup", "true")
            .parquet(store)
            .collect(),
        )
    )


def test_streaming_dedup_replay_is_idempotent(spark, tmp_path):
    """Round-12 ADVICE medium item: foreachBatch is at-least-once, so a
    retried micro-batch re-runs the whole batch body. The batch-keyed
    overwrite publish must make the retry a no-op — identical store
    contents, identical kept set — for BOTH streaming dedup bodies,
    including a retry that arrives AFTER later batches were planned
    against the first attempt's state (same batch_id -> same subdir)."""
    from apache_spark_streaming_project_spark.entry_queries import (
        _M14B_T,
        _m14b_docs,
    )
    from apache_spark_streaming_project_spark.operators.dedup import (
        streaming_lsh_dedup_batch,
    )

    d = _m14b_docs(spark, SF_DIR)

    # --- threshold body (m14b) ---
    band = str(tmp_path / "band")
    text = str(tmp_path / "text")
    streaming_threshold_dedup_batch(
        d.filter(F.col("epoch") == 0), band, text, _M14B_T, 0
    )
    streaming_threshold_dedup_batch(
        d.filter(F.col("epoch") == 1), band, text, _M14B_T, 1
    )
    band_once, text_once = _rows(spark, band), _rows(spark, text)
    # retry batch 1 verbatim (at-least-once redelivery)
    streaming_threshold_dedup_batch(
        d.filter(F.col("epoch") == 1), band, text, _M14B_T, 1
    )
    assert _rows(spark, band) == band_once
    assert _rows(spark, text) == text_once
    # ingestion after the retry matches a never-retried pipeline
    band2, text2 = str(tmp_path / "band2"), str(tmp_path / "text2")
    for i in range(2):
        streaming_threshold_dedup_batch(
            d.filter(F.col("epoch") == i), band2, text2, _M14B_T, i
        )
    streaming_threshold_dedup_batch(
        d.filter(F.col("epoch") == 2), band, text, _M14B_T, 2
    )
    streaming_threshold_dedup_batch(
        d.filter(F.col("epoch") == 2), band2, text2, _M14B_T, 2
    )
    assert _kept(spark, text) == _kept(spark, text2)

    # --- exact body (m14) ---
    eband = str(tmp_path / "eband")
    ecorp = str(tmp_path / "ecorp")
    streaming_lsh_dedup_batch(
        d.filter(F.col("epoch") == 0), eband, ecorp, 0
    )
    eband_once, ecorp_once = _rows(spark, eband), _rows(spark, ecorp)
    streaming_lsh_dedup_batch(
        d.filter(F.col("epoch") == 0), eband, ecorp, 0
    )
    assert _rows(spark, eband) == eband_once
    assert _rows(spark, ecorp) == ecorp_once
