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


class TestMMR:
    def _cands(self, spark):
        import math

        rows = []
        vecs = {
            10: [1.0, 0.0, 0.0, 0.0],
            11: [0.995, 0.0999, 0.0, 0.0],
            12: [0.6, 0.8, 0.0, 0.0],
            13: [0.0, 0.0, 1.0, 0.0],
        }
        q = [1.0, 0.0, 0.0, 0.0]
        for vid, v in vecs.items():
            nv = math.sqrt(sum(x * x for x in v))
            rel = sum(a * b for a, b in zip(v, q)) / nv
            rows.append((0, vid, rel, v))
        return spark.createDataFrame(
            rows, "query_id long, vec_id long, rel double, embedding array<double>"
        )

    def test_first_pick_is_relevance_argmax_and_all_distinct(self, spark):
        from apache_spark_streaming_project_spark.operators.similarity import (
            mmr_rerank,
        )

        out = mmr_rerank(self._cands(spark), k=4, lam=0.5).orderBy("order_idx").collect()
        assert out[0].vec_id == 10  # exact match to the query direction
        assert len({r.vec_id for r in out}) == 4
        assert [r.order_idx for r in out] == [1, 2, 3, 4]

    def test_orthogonal_item_beats_near_duplicate(self, spark):
        from apache_spark_streaming_project_spark.operators.similarity import (
            mmr_rerank,
        )

        # after picking 10, the near-copy 11 has sim~=rel (score ~0 at
        # lam=0.5) while the orthogonal 13 scores 0.5*0 - 0.5*0 = 0 with
        # rel 0... use lam favoring diversity: at lam=0.3 the orthogonal
        # vector (sim 0 to everything selected) must enter before the
        # near-duplicate of the first pick
        out = (
            mmr_rerank(self._cands(spark), k=3, lam=0.3)
            .orderBy("order_idx")
            .collect()
        )
        picked = [r.vec_id for r in out]
        # 3 picks: the near-duplicate 11 (score ~ -0.4*rel) must be the one
        # left out, and the orthogonal 13 must be pick #2
        assert picked[1] == 13
        assert 11 not in picked

    def test_scores_match_reference_greedy(self, spark):
        from apache_spark_streaming_project_spark.operators.similarity import (
            mmr_rerank,
        )

        cands = self._cands(spark)
        out = mmr_rerank(cands, k=4, lam=0.5).orderBy("order_idx").collect()

        # reference greedy on the same exact cosines, pure python
        import math

        rows = cands.collect()
        vec = {r.vec_id: r.embedding for r in rows}
        rel = {r.vec_id: r.rel for r in rows}

        def cos(a, b):
            d = sum(x * y for x, y in zip(vec[a], vec[b]))
            na = math.sqrt(sum(x * x for x in vec[a]))
            nb = math.sqrt(sum(x * x for x in vec[b]))
            return d / (na * nb)

        remaining, selected, expect = sorted(vec), [], []
        for _ in range(4):
            best = None
            for d in remaining:
                vals = [cos(d, s) for s in selected]
                ms = max(vals) if vals else 0.0
                sc = 0.5 * rel[d] - 0.5 * ms
                if best is None or sc > best[1] or (sc == best[1] and d < best[0]):
                    best = (d, sc)
            selected.append(best[0])
            remaining.remove(best[0])
            expect.append(best)
        got = [(r.vec_id, r.mmr_score) for r in out]
        # same picks; scores equal up to the fold-vs-pairwise float path
        assert [g[0] for g in got] == [e[0] for e in expect]
        for g, e in zip(got, expect):
            assert abs(g[1] - e[1]) < 1e-12


class TestInterleave:
    def test_round_robin_order(self, spark):
        from apache_spark_streaming_project_spark.operators.sampling import (
            interleave_sources,
        )

        rows = [(i, "a") for i in [1, 2, 3]] + [(i, "b") for i in [4, 5]]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = interleave_sources(df, "source", "doc_id", prefix=10).collect()
        assert [(r.doc_id, r.source) for r in out] == [
            (1, "a"), (4, "b"),   # epoch 0
            (2, "a"), (5, "b"),   # epoch 1
            (3, "a"),             # epoch 2 — source b exhausted
        ]
        assert [r.interleave_pos for r in out] == [1, 2, 3, 4, 5]


class TestEmbeddingCorrelations:
    def test_planted_perfect_correlation(self, spark):
        from apache_spark_streaming_project_spark.operators.profile import (
            embedding_correlations,
        )

        import random

        rng = random.Random(7)
        rows = []
        for vid in range(40):
            v = [rng.uniform(-1, 1) for _ in range(4)]
            v[1] = 2.0 * v[0]          # dims 0,1 perfectly correlated
            rows.append((vid, v))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        top = embedding_correlations(df, n_dims=4, top_k=1).collect()[0]
        assert (top.i, top.j) == (0, 1)
        assert abs(top.corr - 1.0) < 1e-9


class TestBM25StopwordGuard:
    def test_max_df_ratio_drops_ubiquitous_term_only(self, spark):
        # 'the' is planted in EVERY doc; 'zebra' in one. With the guard,
        # the stopword contributes nothing (rankings driven by 'zebra'
        # alone) and the posting join never touches its n-row list.
        rows = [(i, "the filler%d zebra" % i if i == 7 else "the filler%d word" % i)
                for i in range(50)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        queries = spark.createDataFrame(
            [(0, "the"), (0, "zebra")], "query_id long, term string"
        )
        guarded = bm25_top_k(docs, queries, k=3, max_df_ratio=0.3).collect()
        # only doc 7 matches any surviving query term
        assert [r.doc_id for r in guarded] == [7]
        # without the guard every doc matches 'the' -> full top-3
        unguarded = bm25_top_k(docs, queries, k=3).collect()
        assert len(unguarded) == 3


class TestRRFFuse:
    def test_rrf_matches_python_reference_and_handles_singletons(self, spark):
        """Fused scores equal 1/(60+ra) + 1/(60+rb) computed exactly (the
        symbolic one-ratio form), docs present in only one list score
        1/(60+r), and the output is top-k by fused score with doc-id
        tie-break."""
        from fractions import Fraction

        from apache_spark_streaming_project_spark.operators.lexical import rrf_fuse

        a = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            "query_id int, doc_id int, rank int",
        )
        b = spark.createDataFrame(
            [(1, 12, 1), (1, 13, 2), (1, 10, 3)],
            "query_id int, doc_id int, rank int",
        )
        out = {r.doc_id: (r.rank, r.rrf_score)
               for r in rrf_fuse(a, b, k=10).collect()}
        ra = {10: 1, 11: 2, 12: 3}
        rb = {12: 1, 13: 2, 10: 3}
        for doc in {10, 11, 12, 13}:
            want = Fraction(0)
            if doc in ra:
                want += Fraction(1, 60 + ra[doc])
            if doc in rb:
                want += Fraction(1, 60 + rb[doc])
            # engine computes num/den as bigints then ONE double division:
            # same value as the exact Fraction rendered to double
            assert out[doc][1] == want.numerator / want.denominator
        # ranking: 12 and 10 tie exactly (1/61+1/63 vs 1/63+1/61) -> doc
        # id tie-break; then 11 (1/62) vs 13 (1/62) tie -> id order
        assert [d for d, (rk, _) in sorted(out.items(), key=lambda kv: kv[1][0])] == [10, 12, 11, 13]

    def test_rrf_k_limits_output(self, spark):
        from apache_spark_streaming_project_spark.operators.lexical import rrf_fuse

        a = spark.createDataFrame(
            [(1, d, d) for d in range(1, 8)], "query_id int, doc_id int, rank int"
        )
        b = spark.createDataFrame(
            [(1, d + 100, d) for d in range(1, 8)],
            "query_id int, doc_id int, rank int",
        )
        out = rrf_fuse(a, b, k=5).collect()
        assert len(out) == 5
        assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]


def test_bm25_int64_guard_fails_loudly(spark, monkeypatch):
    """The int64-magnitude bound is ENFORCED in-plan, not just documented:
    with the safety threshold shrunk below fixture magnitudes, scoring
    must raise instead of silently overflowing the BIGINT products."""
    import pytest

    from apache_spark_streaming_project_spark.operators import lexical

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(20)],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(0, "alpha"), (0, "beta")], "query_id long, term string"
    )
    # normal threshold: runs fine
    assert lexical.bm25_top_k(docs, queries, k=5).count() == 5
    # shrunk threshold: the guard must trip
    monkeypatch.setattr(lexical, "_INT64_SAFE", 10.0)
    with pytest.raises(Exception, match="int64-safe"):
        lexical.bm25_top_k(docs, queries, k=5).collect()


class TestBM25LogIdf:
    """Round-7 verdict item 3: the textbook log-idf option. The odds
    form stays the oracle-pinned default; ``idf="log"`` must (a) agree
    rank-for-rank with a pure-Python textbook BM25 reference on
    multi-term queries, and (b) actually change the ranking on a fixture
    where the two weightings disagree — proving the documented
    odds-vs-log deviation is what the option fixes."""

    @staticmethod
    def _corpus():
        # N=20 docs, all dl=4 (so with tf=1 the saturation factor is
        # exactly 1 and scores are pure idf sums). Doc 0 matches the
        # one rare term (df=1): odds idf = 39/3 = 13, log idf = ln 13.
        # Docs 1..5 each match the three common terms (df=5):
        # odds idf = 31/11 each (sum 8.45 < 13 -> doc 0 wins),
        # log idf = ln(31/11) each (sum 3.11 > ln 13 = 2.56 -> flip).
        rows = [(0, "rare f0a f0b f0c")]
        for i in range(1, 6):
            rows.append((i, f"c1 c2 c3 f{i}"))
        for i in range(6, 20):
            rows.append((i, f"g{i}a g{i}b g{i}c g{i}d"))
        return rows

    @staticmethod
    def _reference_log_bm25(rows, query_terms, k1=1.2, b=0.75):
        import math

        toks = {d: t.split() for d, t in rows}
        n = len(toks)
        dl = {d: len(t) for d, t in toks.items()}
        avgdl = sum(dl.values()) / n
        df = {}
        for t in set(query_terms):
            df[t] = sum(1 for ts in toks.values() if t in ts)
        scores = {}
        for d, ts in toks.items():
            s = 0.0
            for t in set(query_terms):
                tf = ts.count(t)
                if tf == 0 or df[t] == 0:
                    continue
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * dl[d] / avgdl)
                )
            if s != 0.0:
                scores[d] = s
        return [d for d, _ in sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))]

    def test_log_idf_matches_python_reference_and_diverges_from_odds(
        self, spark
    ):
        rows = self._corpus()
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        qterms = ["rare", "c1", "c2", "c3"]
        queries = spark.createDataFrame(
            [Row(query_id=0, term=t) for t in qterms]
        )
        want = self._reference_log_bm25(rows, qterms)
        got_log = [
            r.doc_id
            for r in bm25_top_k(docs, queries, k=20, idf="log")
            .orderBy("rank")
            .collect()
        ]
        assert got_log == want
        # the flip is real: doc 0 tops the odds ranking, the common-term
        # docs top the textbook one
        got_odds = [
            r.doc_id
            for r in bm25_top_k(docs, queries, k=20).orderBy("rank").collect()
        ]
        assert got_odds[0] == 0
        assert got_log[0] != 0 and got_log != got_odds

    def test_log_idf_second_multiterm_query_and_negative_idf(self, spark):
        # a term in MORE than half the docs has NEGATIVE log idf
        # (textbook artifact) — the fixed-point table must carry the sign
        rows = [(i, "common x%d y%d" % (i, i)) for i in range(10)]
        rows[0] = (0, "common needle y0")
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        qterms = ["common", "needle"]
        queries = spark.createDataFrame(
            [Row(query_id=0, term=t) for t in qterms]
        )
        want = self._reference_log_bm25(rows, qterms)
        got = [
            r.doc_id
            for r in bm25_top_k(docs, queries, k=10, idf="log")
            .orderBy("rank")
            .collect()
        ]
        assert got == want
        out = bm25_top_k(docs, queries, k=10, idf="log").collect()
        assert any(r.score < 0 for r in out)  # pure-common docs go negative

    def test_invalid_idf_rejected(self, spark):
        import pytest

        docs = _docs(spark)
        queries = spark.createDataFrame([Row(query_id=0, term="apple")])
        with pytest.raises(ValueError, match="odds"):
            bm25_top_k(docs, queries, idf="LOG")


class TestHybridRetrievalScalePath:
    """Round-7 verdict item 4: fuse the SCALE-PATH retrievers — sparse
    BM25 and dense IVF-PQ batch ANN — through the retrieval-agnostic
    rrf_fuse, proving the hybrid composition works end-to-end without a
    brute-force dense side. Fixture plants three candidate groups:
    docs 0-4 relevant in BOTH modalities, 5-9 lexical-only, 10-14
    dense-only; RRF must put the both-modality docs on top (they are the
    only ones appearing in both k-sized lists)."""

    def test_bm25_plus_ivfpq_rrf_planted_docs_dominate(self, spark):
        import random

        from apache_spark_streaming_project_spark.operators.lexical import (
            rrf_fuse,
        )
        from apache_spark_streaming_project_spark.operators.similarity import (
            ivfpq_batch_top_k,
            ivfpq_index,
        )
        from pyspark.sql.window import Window

        rng = random.Random(7)
        dim = 16
        qvec = [rng.gauss(0, 1) for _ in range(dim)]
        rows = []
        for i in range(100):
            if i < 5:  # both modalities
                text = f"needle pin filler{i}a filler{i}b"
                vec = [x + rng.gauss(0, 0.01) for x in qvec]
            elif i < 10:  # lexical-only
                text = f"needle pin filler{i}a filler{i}b"
                vec = [rng.gauss(0, 1) for _ in range(dim)]
            elif i < 15:  # dense-only
                text = f"hay stack filler{i}a filler{i}b"
                vec = [x + rng.gauss(0, 0.01) for x in qvec]
            else:  # noise
                text = f"hay stack filler{i}a filler{i}b"
                vec = [rng.gauss(0, 1) for _ in range(dim)]
            rows.append((i, text, vec))

        docs = spark.createDataFrame(
            rows, "doc_id long, text string, embedding array<double>"
        )

        sparse = bm25_top_k(
            docs,
            spark.createDataFrame(
                [Row(query_id=0, term="needle"), Row(query_id=0, term="pin")]
            ),
            k=10,
        )

        indexed, coarse, books = ivfpq_index(
            docs.select("doc_id", "embedding").withColumnRenamed(
                "doc_id", "vec_id"
            ),
            n_centroids=8,
            m=4,
            pq_centroids=16,
        )
        queries = spark.createDataFrame(
            [(0, qvec)], "query_id long, qvec array<double>"
        )
        dense_raw = ivfpq_batch_top_k(
            indexed, coarse, books, queries, k=10, nprobe=6
        )
        # adapt (query_id, vec_id, adc_dist) to rrf_fuse's ranked-list
        # contract — deterministic rank, ties on id
        wd = Window.partitionBy("query_id").orderBy(
            F.col("adc_dist").asc(), F.col("vec_id").asc()
        )
        dense = dense_raw.select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            F.row_number().over(wd).alias("rank"),
        )

        # sanity on the inputs: the sparse list is the 10 needle/pin docs,
        # the dense list is (at least mostly) the 10 near-qvec docs
        sparse_ids = {r.doc_id for r in sparse.collect()}
        dense_ids = {r.doc_id for r in dense.collect()}
        assert sparse_ids == set(range(10))
        assert len(dense_ids & set(range(5)) | dense_ids & set(range(10, 15))) >= 8

        fused = rrf_fuse(sparse, dense, k=10).orderBy("rank").collect()
        both = dense_ids & set(range(5))  # planted docs the ANN recalled
        # every both-modality doc the ANN recalled must outrank every
        # single-modality doc in the fused list
        top = [r.doc_id for r in fused]
        assert set(top[: len(both)]) == both
        # and the fused list is drawn from the union of the two lists
        assert set(top) <= sparse_ids | dense_ids


def test_bm25_null_text_doc_is_a_zero_length_doc(spark):
    """A NULL-text doc must behave exactly like an empty-text doc:
    counted in n_docs, dl = 0, contributing nothing to total — not
    silently dropped from the corpus statistics (ANSI size(NULL) is
    NULL) or corrupting them (legacy sizeOfNull is -1). Scores must be
    bit-identical between the two corpora."""
    base = spark.createDataFrame(
        [
            Row(doc_id=0, text="apple banana cherry"),
            Row(doc_id=1, text="apple apple banana"),
            Row(doc_id=2, text="durian elderberry fig"),
        ]
    )
    with_null = base.union(
        spark.createDataFrame([(9, None)], schema=base.schema)
    )
    with_empty = base.union(
        spark.createDataFrame([(9, "")], schema=base.schema)
    )
    q = spark.createDataFrame([Row(query_id=0, term="apple")])
    for idf in ("odds", "log"):
        rn = bm25_top_k(with_null, q, k=10, idf=idf).collect()
        re_ = bm25_top_k(with_empty, q, k=10, idf=idf).collect()
        assert sorted((r.rank, r.doc_id, r.score) for r in rn) == sorted(
            (r.rank, r.doc_id, r.score) for r in re_
        ), idf
        assert all(r.doc_id != 9 for r in rn)
