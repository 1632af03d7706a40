"""Sparse lexical retrieval (BM25) — the inverted-index complement to the
dense ANN surface in ``operators/similarity.py`` (SURVEY §2.11 X3; no
reference counterpart — extension operator for the LLM-data-pipeline
surface).

Shape (the classic search-engine plan, expressed relationally):

  1. postings list: explode tokens -> (doc_id, term, tf) partial-agg
     (one shuffle keyed on (doc_id, term); map-side combine collapses
     repeated terms before the exchange);
  2. document lengths + corpus totals: map-only ``size(tokens())`` on
     the corpus scan (dl == sum of tfs by construction — no second
     explode+aggregate pass over the postings);
  3. document frequency per term: partial-agg over the postings;
  4. query terms broadcast-join the postings (the query set is always
     tiny — it's the *vocabulary* that is huge, and only query terms'
     df rows survive the semi-join, so the df lookup is broadcastable
     by construction no matter the corpus size);
  5. per-(query, doc) score = ordered fold over per-term contributions;
  6. per-query top-k via rank window (map-side WindowGroupLimit).

Exactness contract (why the scoring looks unusual):

  * The IDF is the *odds form* without the logarithm:
    ``idf = (N - df + 0.5) / (df + 0.5) = (2N - 2df + 1) / (2df + 1)``
    — an exact integer ratio. ``ln``/``log2`` are libm calls whose last
    ulp differs across engines, which would break the driver's
    bit-identical value-hash contract; the odds form is strictly
    monotone in the standard BM25 IDF, so PER-TERM ordering is
    preserved. Caveat: monotonicity per term does NOT extend to the
    SUM over a multi-term query — rare terms weigh more relative to
    common ones than under log-idf, so multi-term rankings can differ
    from textbook BM25 (single-term queries are rank-identical). This
    is a documented, deliberate variant; if rank fidelity to log-idf
    BM25 matters, substitute a fixed-precision integer log table for
    the idf ratio (same exactness contract, textbook weighting).
  * With k1 = 1.2 and b = 0.75, the term-frequency saturation
    ``tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` multiplies through
    by ``10 * total_tokens`` (avgdl = total/N) into an exact integer
    ratio: ``22*tf*total / (10*tf*total + 3*total + 9*dl*N)``.
  * Numerator and denominator are built as BIGINTs and cast to DOUBLE
    *before* one division — int64->double conversion and IEEE division
    are bit-identical everywhere.
  * The per-document sum folds the contributions in sorted-term order
    (``array_sort`` + ``aggregate`` left fold), because IEEE addition
    is not associative: both engines add the same doubles in the same
    order and produce the same bits.

Scale: the corpus-side magnitudes (``idf_num * 22 * tf * total``) stay
within int64 up to ~10^13-token corpora; beyond that, pre-divide total
by a corpus-constant scale factor (ranking is invariant under scaling
total, which cancels in the limit) — noted here rather than coded
because the driver fixtures sit ~6 orders of magnitude below the bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from apache_spark_streaming_project_spark.operators.text import tokens

# k1 = 1.2 and b = 0.75 (the textbook defaults) are baked into the exact
# integer rewrite: 22 = 10*tf*(k1+1), 3 = 10*k1*(1-b), 9 = 10*k1*b.
_TF_NUM = 22
_TF_CONST = 3
_TF_DL = 9

# int64-safety margin for the BIGINT products (2^62, one bit of headroom
# for the double-space guard arithmetic below). Tests shrink this to
# exercise the failure path.
_INT64_SAFE = float(2**62)


def postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, term, tf) postings list from whitespace tokens.

    One explode + one partial-aggregated shuffle on (doc_id, term)."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def _contribution(n_docs: Column, total: Column) -> Column:
    """Exact-double BM25 contribution for one (query term, document) row.

    Expects columns tf, df, dl in scope; n_docs/total are 1-row-join
    columns. BIGINT products, one double division — see module
    docstring for the derivation."""
    idf_num = 2 * n_docs - 2 * F.col("df") + 1
    idf_den = 2 * F.col("df") + 1
    tf_num = F.lit(_TF_NUM) * F.col("tf") * total
    tf_den = (
        F.lit(10) * F.col("tf") * total
        + F.lit(_TF_CONST) * total
        + F.lit(_TF_DL) * F.col("dl") * n_docs
    )
    # The docstring's ~10^13-token bound, ENFORCED: overflow in the BIGINT
    # products would silently corrupt every score, so the guard rides on
    # each contribution row. It checks the OPERANDS in double space
    # (sufficient upper bounds computed in doubles can't themselves
    # overflow; _INT64_SAFE keeps a bit of headroom for their rounding),
    # because testing the products after the multiply would be too late.
    nd, tot = n_docs.cast("double"), total.cast("double")
    tfd, dld, dfd = (
        F.col("tf").cast("double"),
        F.col("dl").cast("double"),
        F.col("df").cast("double"),
    )
    num_bound = F.lit(2.0 * _TF_NUM) * nd * tfd * tot
    den_bound = (F.lit(2.0) * dfd + 1.0) * (
        F.lit(10.0) * tfd * tot + F.lit(3.0) * tot + F.lit(9.0) * dld * nd
    )
    guard = F.assert_true(
        (num_bound < F.lit(_INT64_SAFE)) & (den_bound < F.lit(_INT64_SAFE)),
        F.lit(
            "bm25 integer rewrite exceeds int64-safe magnitudes for this "
            "corpus; pre-scale `total` by a corpus constant (ranking-"
            "invariant, see module docstring)"
        ),
    )
    score = (idf_num * tf_num).cast("double") / (idf_den * tf_den).cast(
        "double"
    )
    # no .otherwise(): If(guard-is-null, score, score) would be folded to
    # plain `score` by SimplifyConditionals, silently deleting the guard;
    # with branches (score, null) the conditional — and the assert inside
    # its predicate — must be evaluated per row
    return F.when(guard.isNull(), score)


def bm25_top_k(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_term_col: str = "term",
    k: int = 10,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Per-query BM25 top-k over the corpus.

    ``queries`` is (query_id, term) — one row per distinct query term.
    Returns (query_id, rank, doc_id, score), rank 1..k, ties broken on
    doc_id so the result is deterministic and hashable.

    Plan: postings/df/dl are corpus-sized partial aggs; the query-term
    side broadcasts (hinted — it is small by definition); the df lookup
    joins the *query terms*, never the full vocabulary; per-query top-k
    is a rank window that AQE executes as map-side WindowGroupLimit.

    ``max_df_ratio`` is the STOPWORD-FLOOD guard for corpus scale: a
    query term present in (say) half the documents joins a posting list
    of n/2 rows for a near-zero odds-IDF contribution — quadratic cost,
    epsilon signal. Setting e.g. 0.3 drops query terms with
    df > 0.3 * N before the posting join (the lexical twin of the
    MinHash shingle document-frequency cap; standard practice in search
    engines). None keeps every term — the oracle-exact default.
    """
    post = postings(docs, id_col, text_col)
    # dl == SUM(tf) per doc == the token count — computable map-only from
    # the corpus scan, no second explode+agg pass over the postings
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(text_col)).cast("bigint").alias("dl"),
    )
    df_t = post.groupBy("term").agg(F.count("*").alias("df"))
    stats = docs.agg(F.count("*").alias("n_docs")).crossJoin(
        dl.agg(F.sum("dl").alias("total"))
    )

    qt = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_term_col).alias("term")
    ).distinct()
    # df of the query terms only: broadcast the tiny query side INTO the
    # vocabulary-sized df table, keeping the survivors broadcastable.
    qt_df = df_t.join(F.broadcast(qt), "term")
    if max_df_ratio is not None:
        qt_df = qt_df.crossJoin(
            F.broadcast(docs.agg(F.count("*").alias("_nd")))
        ).filter(
            F.col("df") <= F.lit(max_df_ratio) * F.col("_nd")
        ).drop("_nd")

    contrib = (
        post.join(F.broadcast(qt_df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            "term",
            _contribution(F.col("n_docs"), F.col("total")).alias("c"),
        )
    )

    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "c"))),
            F.lit(0.0),
            lambda acc, x: acc + x["c"],
        ).alias("score")
    )

    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval systems' ranked lists —
    the standard hybrid-retrieval combiner (sparse BM25 + dense ANN):

        rrf(d) = sum over systems s of 1 / (rrf_k + rank_s(d))

    over the UNION of both candidate sets; a document missing from one
    list simply contributes nothing for it (classic RRF). rrf_k=60 is
    the published default.

    Exactness contract (same discipline as BM25's integer rewrite): the
    two reciprocal terms are summed SYMBOLICALLY as one integer ratio —

        both lists:  (2*rrf_k + ra + rb) / ((rrf_k + ra) * (rrf_k + rb))
        one list:     1 / (rrf_k + r)

    — numerator and denominator built in BIGINT, ONE double division at
    the end, so both engines produce bit-identical scores (adding two
    separately-divided doubles would be order/rounding-sensitive).

    Plan shape: one full-outer equi-join on (query, doc) between two
    k-sized-per-query lists (tiny by construction — inputs are already
    top-k), then a rank window per query. Fusion cost is independent of
    corpus size; the expensive work happened in the upstream retrievers.
    Ties break on id for a deterministic, hashable result."""
    fa = a.select(
        F.col(query_col),
        F.col(id_col),
        F.col(rank_col).cast("long").alias("_ra"),
    )
    fb = b.select(
        F.col(query_col),
        F.col(id_col),
        F.col(rank_col).cast("long").alias("_rb"),
    )
    j = fa.join(fb, [query_col, id_col], "full")
    ra, rb = F.col("_ra"), F.col("_rb")
    num = (
        F.when(ra.isNotNull() & rb.isNotNull(), 2 * rrf_k + ra + rb)
        .otherwise(F.lit(1))
        .cast("long")
    )
    den = (
        F.when(ra.isNotNull() & rb.isNotNull(), (rrf_k + ra) * (rrf_k + rb))
        .when(ra.isNotNull(), rrf_k + ra)
        .otherwise(rrf_k + rb)
        .cast("long")
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        j.select(
            F.col(query_col),
            F.col(id_col),
            (num.cast("double") / den.cast("double")).alias("rrf_score"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(query_col, "rank", id_col, "rrf_score")
    )
