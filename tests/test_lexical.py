"""Tests for sparse lexical retrieval (BM25), the public-built-ins bloom
filter, and the snapshot-diff corpus audit — the round-4 continuation
additions."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from apache_spark_streaming_project_spark.functions.bloom import (
    bloom_build,
    bloom_prefilter,
)
from apache_spark_streaming_project_spark.operators.dedup import snapshot_diff
from apache_spark_streaming_project_spark.operators.lexical import bm25_top_k


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, text="apple banana cherry"),
            Row(doc_id=1, text="apple apple banana"),
            Row(doc_id=2, text="durian elderberry fig"),
            Row(doc_id=3, text="apple cherry cherry banana"),
            Row(doc_id=4, text="grape melon kiwi lime"),
        ]
    )


class TestBM25:
    def test_query_doc_ranks_first_and_disjoint_docs_absent(self, spark):
        docs = _docs(spark)
        queries = spark.createDataFrame(
            [Row(query_id=0, term="apple"), Row(query_id=0, term="banana"),
             Row(query_id=0, term="cherry")]
        )
        out = bm25_top_k(docs, queries, k=10).collect()
        by_rank = {r.rank: r for r in out}
        # docs 0 and 3 match all three query terms -> they take the top 2;
        # doc 1 misses 'cherry' and ranks below both
        assert {by_rank[1].doc_id, by_rank[2].doc_id} == {0, 3}
        assert by_rank[3].doc_id == 1
        # docs 2 and 4 share no term with the query -> inner join drops them
        assert {r.doc_id for r in out} == {0, 1, 3}
        # scores strictly ordered, ranks contiguous
        scores = [by_rank[i].score for i in sorted(by_rank)]
        assert scores == sorted(scores, reverse=True)

    def test_rarer_term_outscores_common_term(self, spark):
        # 'durian' appears in 1 doc, 'apple' in 3 -> odds-form IDF must
        # rank the durian-matching doc above an apple-matching doc of the
        # same length for a two-term query
        docs = _docs(spark)
        queries = spark.createDataFrame(
            [Row(query_id=9, term="durian"), Row(query_id=9, term="grape")]
        )
        out = bm25_top_k(docs, queries, k=10).collect()
        assert {r.doc_id for r in out} == {2, 4}

    def test_query_side_broadcasts(self, spark):
        docs = _docs(spark)
        queries = spark.createDataFrame([Row(query_id=0, term="apple")])
        plan = bm25_top_k(docs, queries, k=5)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestBloom:
    def test_no_false_negatives(self, spark):
        base = spark.range(0, 500).select(
            F.concat(F.lit("key-"), F.col("id").cast("string")).alias("k")
        )
        bloom = bloom_build(base, "k", m_bits=1 << 14)
        kept = bloom_prefilter(base, bloom, "k", m_bits=1 << 14)
        # every inserted key must survive its own bloom — zero false negatives
        assert kept.count() == 500

    def test_false_positive_rate_bounded(self, spark):
        base = spark.range(0, 500).select(
            F.concat(F.lit("in-"), F.col("id").cast("string")).alias("k")
        )
        probe = spark.range(0, 2000).select(
            F.concat(F.lit("out-"), F.col("id").cast("string")).alias("k")
        )
        # m = 2^14 bits for 500 keys (~32 bits/key, k=2) -> fp well under 5%
        bloom = bloom_build(base, "k", m_bits=1 << 14)
        fp = bloom_prefilter(probe, bloom, "k", m_bits=1 << 14).count()
        assert fp < 100, f"false-positive count {fp} out of 2000 probes"

    def test_build_is_partial_aggregatable(self, spark):
        base = spark.range(0, 100).repartition(4).select(
            F.col("id").cast("string").alias("k")
        )
        plan = bloom_build(base, "k")._jdf.queryExecution().executedPlan().toString()
        # bit_or partial agg: HashAggregate appears below AND above the exchange
        assert plan.count("HashAggregate") >= 2


class TestSnapshotDiff:
    def test_all_change_classes(self, spark):
        old = spark.createDataFrame(
            [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c"), Row(k=4, v=None)]
        )
        new = spark.createDataFrame(
            [Row(k=2, v="b2"), Row(k=3, v="c"), Row(k=4, v=None), Row(k=5, v="e")]
        )
        out = {
            r.k: r.change_type
            for r in snapshot_diff(old, new, ["k"], ["v"]).collect()
        }
        assert out == {
            1: "removed",
            2: "changed",
            3: "unchanged",
            4: "unchanged",  # null == null must compare null-safely
            5: "added",
        }

    def test_null_to_value_is_changed(self, spark):
        old = spark.createDataFrame([(1, None)], "k int, v string")
        new = spark.createDataFrame([(1, "x")], "k int, v string")
        [r] = snapshot_diff(old, new, ["k"], ["v"]).collect()
        assert r.change_type == "changed"


class TestSpanCoverage:
    def test_planted_shared_span(self, spark):
        from apache_spark_streaming_project_spark.operators.text import (
            duplicate_span_coverage,
        )

        shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
        rows = [
            (0, shared + " unique0a unique0b unique0c unique0d"),
            (1, "unique1a unique1b " + shared + " unique1c unique1d"),
            (2, "totally distinct words here nothing shared at all today"),
        ]
        out = {
            r.doc_id: r
            for r in duplicate_span_coverage(
                spark.createDataFrame(rows, "doc_id int, text string"),
                n=8,
            ).collect()
        }
        # the 8-token shared span is the only dup 8-gram -> covers exactly
        # 8 tokens in docs 0 and 1, zero in doc 2
        assert out[0].covered_tokens == 8 and out[0].n_tokens == 12
        assert out[1].covered_tokens == 8 and out[1].n_tokens == 12
        assert out[2].covered_tokens == 0

    def test_overlapping_spans_merge(self, spark):
        from apache_spark_streaming_project_spark.operators.text import (
            duplicate_span_coverage,
        )

        # doc 0 and 1 share a 10-token run -> three overlapping dup
        # 8-grams merge into ONE island covering 10 tokens, not 24
        run = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
        rows = [(0, run + " x0"), (1, "y0 " + run)]
        out = {
            r.doc_id: r
            for r in duplicate_span_coverage(
                spark.createDataFrame(rows, "doc_id int, text string"),
                n=8,
            ).collect()
        }
        assert out[0].covered_tokens == 10
        assert out[1].covered_tokens == 10
