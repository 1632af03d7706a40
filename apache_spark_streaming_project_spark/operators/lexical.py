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
    is a documented, deliberate variant; ``bm25_top_k(idf="log")``
    substitutes a fixed-precision integer log table for the idf ratio
    (same exactness contract, textbook weighting) — see
    :func:`_log_idf_table`.
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


# Fixed-point scale for the log-idf table: six decimal digits of the
# natural log, far below any real score separation and small enough that
# idf_scaled stays ~1e7 even for 10^12-document corpora.
_LOG_IDF_SCALE = 10**6


def _log_idf_table(term_dfs: list[tuple[str, int]], n_docs: int) -> dict[str, int]:
    """Fixed-precision integer log-idf per query term, computed on the
    driver with CORRECTLY-ROUNDED decimal arithmetic (``decimal.Decimal
    .ln()`` is specified as correctly rounded, unlike libm ``log`` whose
    last ulp differs across engines/platforms):

        idf_scaled(term) = round( ln((2N - 2df + 1) / (2df + 1)) * 10^6 )

    The table itself becomes a PLAN LITERAL (a broadcast lookup both
    engines can read verbatim), so the exactness contract survives: no
    in-plan transcendental is ever evaluated. Size is bounded by the
    number of distinct query terms — tiny by definition — never by the
    vocabulary."""
    import decimal

    ctx = decimal.Context(prec=40)
    out = {}
    for term, df in term_dfs:
        num = decimal.Decimal(2 * n_docs - 2 * df + 1)
        den = decimal.Decimal(2 * df + 1)
        ln = ctx.divide(num, den).ln(ctx)
        # every step through the LOCAL prec-40 context — the bare `*`
        # operator would consult the process-global thread-local context,
        # making the "same bits on every engine/process" contract depend
        # on whatever precision/traps the host application last set
        scaled = ctx.multiply(ln, decimal.Decimal(_LOG_IDF_SCALE))
        out[term] = int(
            scaled.quantize(
                decimal.Decimal(1), rounding=decimal.ROUND_HALF_EVEN, context=ctx
            )
        )
    return out


def _tf_saturation(n_docs: Column, total: Column) -> Column:
    """The BM25 term-frequency saturation factor alone (no idf), as one
    exact double: ``22*tf*total / (10*tf*total + 3*total + 9*dl*N)`` —
    BIGINT products, one division, same in-plan int64-overflow guard
    discipline as :func:`_contribution`. Used by the ``idf="log"`` path,
    where the idf arrives as a separate fixed-precision plan literal.
    Deliberately NOT shared with ``_contribution``: the odds form fuses
    idf and tf into a single division and the oracle hash pins those
    exact bits — factoring it through this helper would change them."""
    tf_num = F.lit(_TF_NUM) * F.col("tf") * total
    tf_den = (
        F.lit(10) * F.col("tf") * total
        + F.lit(_TF_CONST) * total
        + F.lit(_TF_DL) * F.col("dl") * n_docs
    )
    nd, tot = n_docs.cast("double"), total.cast("double")
    tfd, dld = F.col("tf").cast("double"), F.col("dl").cast("double")
    num_bound = F.lit(2.0 * _TF_NUM) * tfd * tot
    den_bound = F.lit(2.0) * (
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
    ratio = tf_num.cast("double") / tf_den.cast("double")
    # distinct branches (ratio, null) so SimplifyConditionals cannot fold
    # the guard away — see _contribution
    return F.when(guard.isNull(), ratio)


def bm25_top_k(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_term_col: str = "term",
    k: int = 10,
    max_df_ratio: float | None = None,
    idf: str = "odds",
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

    ``idf`` selects the weighting: ``"odds"`` (default) is the exact
    integer-ratio odds form the module docstring derives — the form the
    registered oracle hash contract pins. ``"log"`` is TEXTBOOK BM25
    (Robertson-Sparck Jones log-idf): the per-term dfs are resolved
    EAGERLY (two bounded jobs — a 1-row corpus count and a
    query-term-sized df lookup), turned into a fixed-precision integer
    log table on the driver (:func:`_log_idf_table`), and joined back as
    a plan literal. Same determinism discipline — the only double ops
    are int64 casts, one division per factor, one multiply — but
    multi-term rankings now match the textbook weighting. Note the
    eagerness: ``idf="log"`` runs those two jobs at CALL time, so build
    the plan once and reuse it.
    """
    if idf not in ("odds", "log"):
        raise ValueError(f"idf must be 'odds' or 'log' (got {idf!r})")
    post = postings(docs, id_col, text_col)
    # dl == SUM(tf) per doc == the token count — computable map-only from
    # the corpus scan, no second explode+agg pass over the postings.
    # A NULL text is a ZERO-LENGTH document: without the explicit branch,
    # size(tokens(NULL)) is NULL under ANSI (the doc silently drops out of
    # `total` while n_docs still counts it) and -1 under legacy sizeOfNull
    # (actively corrupting `total`). The oracle's dl derives from the
    # postings GROUP BY — NULL-proof by construction — so this branch is
    # what keeps the Spark side in agreement on NULL-text corpora.
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.size(tokens(text_col)))
        .cast("bigint")
        .alias("dl"),
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

    if idf == "log":
        # Resolve query-term dfs eagerly (bounded: <= #query terms rows)
        # and replace the in-plan odds ratio with the driver-computed
        # fixed-precision log table, re-entering the plan as a literal
        # DataFrame.
        spark = docs.sparkSession
        # Cache the postings for the call: the df collect below AND the
        # scoring plan both read them — uncached, the explode+agg runs
        # twice, and on a non-deterministic source the two reads could
        # disagree (an idf table inconsistent with the tf rows it
        # multiplies). The cache is caller-visible for the lifetime of the
        # returned plan (the materialize-once pattern used by the dedup
        # operators), so it is scoped to the log path that needs it.
        # Measured (BASELINE.md round-8): at sf0.1 the cache COSTS ~35%
        # (2.0 s vs 1.5 s end-to-end — materialization overhead exceeds
        # the recompute it saves at fixture scale). It stays because its
        # job is CONSISTENCY, not speed; both recompute and cache costs
        # scale linearly with the corpus, so the trade does not flip
        # against correctness at scale.
        post = post.cache()
        n_docs_val = docs.count()
        term_dfs = sorted(
            {(r["term"], r["df"]) for r in qt_df.select("term", "df").collect()}
        )
        table = _log_idf_table(term_dfs, n_docs_val)
        # literal table keyed on term; the (query_id, term) side stays
        # lazy (and keeps its caller-declared query_id type) — terms the
        # max_df_ratio guard dropped are absent here, so the inner join
        # drops them identically
        # (term, idf_scaled) only — the log path's tf saturation never
        # reads df, unlike the odds path's fused _contribution
        idf_lit = spark.createDataFrame(
            [(t, table[t]) for t, _ in term_dfs],
            "term string, idf_scaled bigint",
        )
        qt_lit = qt.join(F.broadcast(idf_lit), "term")
        idf_factor = F.col("idf_scaled").cast("double") / F.lit(
            float(_LOG_IDF_SCALE)
        )
        # the tf saturation must read the SAME n_docs the idf table was
        # built from — re-aggregating docs in-plan would be a second scan
        # of the source that could disagree with the eager count above;
        # the literal makes it one shared value (total still aggregates
        # in-plan: it multiplies both sides of the ratio symmetrically)
        stats = spark.range(1).select(
            F.lit(n_docs_val).cast("bigint").alias("n_docs")
        ).crossJoin(dl.agg(F.sum("dl").alias("total")))
        contrib = (
            post.join(F.broadcast(qt_lit), "term")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .select(
                "query_id",
                "doc_id",
                "term",
                (
                    idf_factor
                    * _tf_saturation(F.col("n_docs"), F.col("total"))
                ).alias("c"),
            )
        )
    else:
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
