"""Unit tests for X3 similarity search (brute force + LSH + IVF)."""

from __future__ import annotations

import math

import pytest


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
        (4, [0.7, 0.7, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_brute_force_ordering_and_values(spark, vecs):
    from apache_spark_streaming_project_spark.operators.similarity import (
        brute_force_top_k,
    )

    out = brute_force_top_k(vecs, [1.0, 0.0, 0.0], k=5).collect()
    ids = [r.vec_id for r in out]
    assert ids[0] == 0  # identical vector first
    assert ids[1] == 1
    assert ids[-1] == 3  # opposite vector last
    assert out[0].cosine == pytest.approx(1.0)
    assert out[1].cosine == pytest.approx(0.9 / math.sqrt(0.81 + 0.01))
    assert out[-1].cosine == pytest.approx(-1.0)


def test_lsh_returns_query_top1(spark, vecs):
    from apache_spark_streaming_project_spark.operators.similarity import (
        lsh_index,
        lsh_top_k,
    )

    indexed = lsh_index(vecs, dim=3, n_planes=4)
    out = lsh_top_k(indexed, [1.0, 0.0, 0.0], k=3, n_planes=4).collect()
    assert out[0].vec_id == 0
    assert out[0].cosine == pytest.approx(1.0)


def test_ivf_returns_query_top1(spark, vecs):
    from apache_spark_streaming_project_spark.operators.similarity import (
        ivf_index,
        ivf_top_k,
    )

    assigned, centroids = ivf_index(vecs, n_centroids=2)
    out = ivf_top_k(assigned, centroids, [1.0, 0.0, 0.0], k=2, nprobe=2).collect()
    assert out[0].vec_id == 0
    assert out[0].cosine == pytest.approx(1.0)


def test_multimodal_feature_extraction(spark):
    from apache_spark_streaming_project_spark.operators.multimodal import (
        extract_image_features,
        sample_video_frames,
        synthetic_media_table,
    )

    media = synthetic_media_table(spark, n=8)
    feats = extract_image_features(media, fake_decode=True).collect()
    assert len(feats) == 8
    for r in feats:
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-6  # histogram normalized
        assert r.n_bytes > 0
    # deterministic across runs
    feats2 = extract_image_features(media, fake_decode=True).collect()
    assert [list(r.feature) for r in feats] == [list(r.feature) for r in feats2]

    vids = media.filter("meta.media_type = 'video'")
    frames = sample_video_frames(vids, every_ms=1000).collect()
    assert len(frames) == vids.count() * 3  # 3500ms -> 3 frames under half-open sampling
    # NotImplementedError path: real mode raises inside the executor
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Exception):
        extract_image_features(media, fake_decode=False).collect()


def test_blocked_cosine_join_exact_pairs(spark):
    import math

    from apache_spark_streaming_project_spark.operators.similarity import (
        blocked_cosine_join,
    )

    rows = [
        # block "a": 0~1 nearly identical, 2 orthogonal to both
        (0, [1.0, 0.0, 0.0], "a"),
        (1, [0.99, 0.01, 0.0], "a"),
        (2, [0.0, 1.0, 0.0], "a"),
        # block "b": 3~4 identical -> cosine 1.0; 5 is a zero vector (dropped)
        (3, [0.5, 0.5, 0.5], "b"),
        (4, [0.5, 0.5, 0.5], "b"),
        (5, [0.0, 0.0, 0.0], "b"),
        # 6 would match 0 but is in another block -> never paired
        (6, [1.0, 0.0, 0.0], "c"),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {
        (r.id_a, r.id_b): r.cosine
        for r in blocked_cosine_join(df, threshold=0.9).collect()
    }
    assert set(out) == {(0, 1), (3, 4)}
    assert out[(3, 4)] == 1.0
    expected_01 = 0.99 / math.sqrt(0.99**2 + 0.01**2)
    assert abs(out[(0, 1)] - expected_01) < 1e-6


def test_ivf_training_collect_is_capped(spark):
    """ivf_index must never collect more than max_train_rows vectors to the
    driver, no matter the table size (the 100 TB survival property). The
    cap is enforced by an internal assertion; this drives a table larger
    than the cap through index build + probe."""
    from apache_spark_streaming_project_spark.operators.similarity import (
        ivf_index,
        ivf_top_k,
    )

    rows = [(i, [float(i % 7), float(i % 11), 1.0]) for i in range(400)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    assigned, centroids = ivf_index(df, n_centroids=4, max_train_rows=50)
    assert 1 <= len(centroids) <= 4
    out = ivf_top_k(assigned, centroids, [0.0, 0.0, 1.0], k=3, nprobe=4).collect()
    assert len(out) == 3


def test_lsh_batch_top_k_retrieves_planted(spark):
    """Batch ANN: every perturbed query must retrieve its original as top-1
    (the near-dup regime where LSH guarantees apply)."""
    import random

    from pyspark.sql import functions as F

    from apache_spark_streaming_project_spark.operators.similarity import (
        lsh_batch_top_k,
        lsh_index,
    )

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.transform(
            "embedding", lambda x, i: x + 1e-4 * F.sin(F.col("vec_id") + i)
        ).alias("qvec"),
    )
    indexed = lsh_index(df, dim=8, n_planes=6)
    top1 = lsh_batch_top_k(
        indexed, queries, dim=8, k=1, n_planes=6, multiprobe_hamming=2
    ).collect()
    assert {r.query_id: r.vec_id for r in top1} == {i: i for i in range(5)}


def test_ivf_batch_top_k_retrieves_planted(spark):
    import random

    from pyspark.sql import functions as F

    from apache_spark_streaming_project_spark.operators.similarity import (
        ivf_batch_top_k,
        ivf_index,
    )

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.transform(
            "embedding", lambda x, i: x + 1e-4 * F.sin(F.col("vec_id") + i)
        ).alias("qvec"),
    )
    assigned, centroids = ivf_index(df, n_centroids=4)
    top1 = ivf_batch_top_k(
        assigned, centroids, queries, k=1, nprobe=3
    ).collect()
    assert {r.query_id: r.vec_id for r in top1} == {i: i for i in range(5)}


def test_pq_encode_and_adc_retrieves_self(spark):
    """PQ round-trip: every vector's ADC-nearest code row should be (close
    to) itself — with 60 well-spread vectors and 16 centroids x 4
    subspaces, the query vector's own code must land in the ADC top-3."""
    import random

    from apache_spark_streaming_project_spark.operators.similarity import (
        pq_encode,
        pq_top_k,
        pq_train,
    )

    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    books = pq_train(df, m=4, n_centroids=16, key_col="vec_id")
    assert len(books) == 4 and len(books[0][0]) == 2
    enc = pq_encode(df, books)
    assert enc.columns == ["vec_id", "pq_code"]
    hits = 0
    for qid in range(5):
        qvec = rows[qid][1]
        top = pq_top_k(enc, books, qvec, k=3).collect()
        hits += any(r.vec_id == qid for r in top)
    assert hits >= 4  # 16^4 code space over 60 vectors: self-retrieval


def test_pq_train_rejects_indivisible_dim(spark):
    import pytest

    from apache_spark_streaming_project_spark.operators.similarity import (
        pq_train,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], ["vec_id", "embedding"]
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, m=2, n_centroids=2)


def test_ivfpq_retrieves_planted(spark):
    """IVF-PQ end to end on a small synthetic corpus: perturbed queries
    must retrieve their original vector as ADC top-1 (residual encoding,
    4 cells x 8 codes x 4 subspaces over 60 well-spread vectors)."""
    import random

    from pyspark.sql import functions as F

    from apache_spark_streaming_project_spark.operators.similarity import (
        ivfpq_index,
        ivfpq_top_k,
    )

    rng = random.Random(3)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    indexed, coarse, books = ivfpq_index(
        df, n_centroids=4, m=4, pq_centroids=8
    )
    indexed = indexed.cache()
    hits = 0
    for qid in range(5):
        qvec = [x + 1e-4 for x in rows[qid][1]]
        top = ivfpq_top_k(indexed, coarse, books, qvec, k=1, nprobe=2)
        hits += top.collect()[0].vec_id == qid
    assert hits >= 4


def test_pq_codes_layout_independent(spark):
    """pq_train's sample is keyed-hash selected and driver-sorted, and the
    encode kernel is a pure function of row values — so codebooks AND
    codes must be identical under any partitioning of the same data."""
    import random

    from apache_spark_streaming_project_spark.operators.similarity import (
        pq_encode,
        pq_train,
    )

    rng = random.Random(5)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(40)]
    a = spark.createDataFrame(rows, ["vec_id", "embedding"])
    b = spark.createDataFrame(list(reversed(rows)), ["vec_id", "embedding"]).repartition(7)
    books_a = pq_train(a, m=4, n_centroids=8)
    books_b = pq_train(b, m=4, n_centroids=8)
    assert books_a == books_b
    codes_a = {r.vec_id: r.pq_code for r in pq_encode(a, books_a).collect()}
    codes_b = {r.vec_id: r.pq_code for r in pq_encode(b, books_b).collect()}
    assert codes_a == codes_b


def test_ivfpq_append_matches_full_reencode(spark):
    """Appending new vectors with frozen codebooks must yield exactly the
    rows a full re-encode with the same codebooks produces — same cells,
    same codes — and queries over the appended index must retrieve the
    appended vectors."""
    import random

    from apache_spark_streaming_project_spark.operators.similarity import (
        ivfpq_append,
        ivfpq_assign,
        ivfpq_index,
        ivfpq_top_k,
    )

    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    full = spark.createDataFrame(rows, ["vec_id", "embedding"])
    base = full.filter("vec_id % 4 != 0")
    new = full.filter("vec_id % 4 = 0")

    indexed, coarse, books = ivfpq_index(base, n_centroids=4, m=4, pq_centroids=8)
    appended = ivfpq_append(indexed, new, coarse, books)
    rebuilt = ivfpq_assign(full, coarse, books)

    got = {r.vec_id: (r.centroid_id, tuple(r.pq_code)) for r in appended.collect()}
    want = {r.vec_id: (r.centroid_id, tuple(r.pq_code)) for r in rebuilt.collect()}
    assert got == want and len(got) == 60

    # an appended vector is retrievable: query its own (slightly perturbed)
    # vector, expect it in the top-k of the appended index
    qvec = [x + 1e-4 for x in rows[8][1]]  # vec_id 8 is in `new`
    top = ivfpq_top_k(appended, coarse, books, qvec, k=3, nprobe=4)
    assert 8 in [r.vec_id for r in top.collect()]


def test_ivfpq_batch_top_k_retrieves_planted(spark):
    """Batch IVF-PQ: each planted (perturbed) query must retrieve its
    original vector as top-1 via per-cell residual ADC tables computed
    in-plan on the query side; the plan broadcasts the exploded probe
    rows and never reads float vectors on the candidate side."""
    import random

    from apache_spark_streaming_project_spark.operators.similarity import (
        ivfpq_batch_top_k,
        ivfpq_index,
    )
    from pyspark.sql import functions as F

    rng = random.Random(3)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    indexed, coarse, books = ivfpq_index(df, n_centroids=8, m=4, pq_centroids=16)
    queries = spark.createDataFrame(
        [(i, [x + 1e-4 for x in rows[i][1]]) for i in range(6)],
        "query_id long, qvec array<double>",
    )
    top1 = ivfpq_batch_top_k(indexed, coarse, books, queries, k=1, nprobe=3)
    got = {r.query_id: r.vec_id for r in top1.collect()}
    assert sum(got.get(i) == i for i in range(6)) >= 5

    from apache_spark_streaming_project_spark.plans.inspect import (
        has_broadcast_join,
    )

    assert has_broadcast_join(top1)


def test_batch_brute_force_matches_single_query(spark, sf_dir):
    """brute_force_batch_top_k (broadcast query table + rank window) must
    return exactly the per-query results of single-query brute_force_top_k
    — same ids, same cosine bits, same rank order."""
    from pyspark.sql import functions as F

    from apache_spark_streaming_project_spark.operators.similarity import (
        brute_force_batch_top_k,
        brute_force_top_k,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    batch = brute_force_batch_top_k(e, queries, k=7).collect()
    got = {}
    for r in batch:
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.cosine))
    for qid in (0, 1, 2):
        qvec = [
            float(x)
            for x in e.filter(F.col("vec_id") == qid).first()["embedding"]
        ]
        single = brute_force_top_k(e, qvec, k=7).collect()
        want = [(i + 1, r.vec_id, r.cosine) for i, r in enumerate(single)]
        assert sorted(got[qid]) == want


def test_imi_product_cell_matches_numpy_reference(spark):
    """imi_index's product cell must equal the numpy argmin over each
    half codebook — the distance decomposition |v-c(i,j)|^2 =
    |va-ca_i|^2 + |vb-cb_j|^2 computed independently of the kernel."""
    import numpy as np

    from apache_spark_streaming_project_spark.operators.similarity import (
        imi_index,
    )

    rows = [
        (i, [float(((i * 37 + d * 11) % 19) - 9) / 9.0 for d in range(6)])
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    assigned, (ca, cb) = imi_index(df, n_cells_per_half=3, n_assign=1)
    got = {r.vec_id: r.centroid_id for r in assigned.collect()}
    A, B = np.asarray(ca), np.asarray(cb)
    k = len(ca)
    for vid, vec in rows:
        v = np.asarray(vec)
        da = ((v[:3] - A) ** 2).sum(1)
        db = ((v[3:] - B) ** 2).sum(1)
        want = int(da.argmin() * k + db.argmin())
        assert got[vid] == want, (vid, got[vid], want)


def test_imi_soft_top2_is_exact_over_product_cells(spark):
    """n_assign=2 must emit the TRUE two nearest of all k'^2 product
    cells (the min(a2+b1, a1+b2) shortcut is exact — verified here by
    brute-forcing the full product distance matrix in numpy)."""
    import numpy as np

    from apache_spark_streaming_project_spark.operators.similarity import (
        imi_index,
    )

    rows = [
        (i, [float(((i * 53 + d * 29) % 23) - 11) / 11.0 for d in range(8)])
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    assigned, (ca, cb) = imi_index(df, n_cells_per_half=4, n_assign=2)
    got: dict[int, list[int]] = {}
    for r in assigned.collect():
        got.setdefault(r.vec_id, []).append(r.centroid_id)
    A, B = np.asarray(ca), np.asarray(cb)
    k = len(ca)
    for vid, vec in rows:
        v = np.asarray(vec)
        da = ((v[:4] - A) ** 2).sum(1)
        db = ((v[4:] - B) ** 2).sum(1)
        prod = da[:, None] + db[None, :]  # full k' x k' product distances
        flat = prod.ravel()
        # sort by (distance, cell id): deterministic like the kernel
        order = np.lexsort((np.arange(k * k), flat))
        want = {int(order[0]), int(order[1])}
        assert set(got[vid]) == want, (vid, got[vid], want)


def test_imi_semantic_dedup_recall_on_planted_copies(spark):
    """The SemDeDup composition the ivf_index scale-law note promises:
    imi_index(n_assign=2) feeding blocked_cosine_join + representative
    dedup must remove EXACTLY the planted near-copies — same contract as
    x_semantic_dedup, product cells instead of flat cells."""
    from pyspark.sql import functions as F

    from apache_spark_streaming_project_spark.operators.dedup import (
        dedup_keep_representatives,
    )
    from apache_spark_streaming_project_spark.operators.similarity import (
        blocked_cosine_join,
        imi_index,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    planted = e.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (x + 0.003 * F.sin(F.col("vec_id") * 13 + i)).cast(
                "float"
            ),
        ).alias("embedding"),
    )
    corpus = e.unionByName(planted)
    assigned, _ = imi_index(corpus, n_cells_per_half=4, n_assign=2)
    pairs = blocked_cosine_join(
        assigned,
        key_col="vec_id",
        vec_col="embedding",
        block_col="centroid_id",
        threshold=0.95,
    ).select("id_a", "id_b")
    surv = sorted(
        r.vec_id
        for r in dedup_keep_representatives(
            corpus, pairs, "vec_id", key_a="id_a", key_b="id_b"
        )
        .select("vec_id")
        .collect()
    )
    want = sorted(r.vec_id for r in e.select("vec_id").collect())
    assert surv == want


def test_imi_rejects_bad_n_assign_and_dim(spark):
    import pytest as _pytest

    from apache_spark_streaming_project_spark.operators.similarity import (
        imi_index,
    )

    df = spark.createDataFrame([(0, [1.0, 2.0])], ["vec_id", "embedding"])
    with _pytest.raises(ValueError, match="n_assign"):
        imi_index(df, n_assign=3)
    one_d = spark.createDataFrame([(0, [1.0])], ["vec_id", "embedding"])
    with _pytest.raises(ValueError, match="dim >= 2"):
        imi_index(one_d)
    empty = df.filter("vec_id < 0")
    with _pytest.raises(ValueError, match="non-empty"):
        imi_index(empty)


def test_imi_top_k_retrieves_planted_and_orders_cells_correctly(spark):
    """imi_top_k must (a) return the query vector itself first at
    nprobe=1 (its own product cell is ranked nearest), and (b) at full
    probe width equal the brute-force top-k exactly."""
    from pyspark.sql import functions as F

    from apache_spark_streaming_project_spark.operators.similarity import (
        brute_force_top_k,
        imi_index,
        imi_top_k,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    assigned, books = imi_index(e, n_cells_per_half=3)
    assigned = assigned.cache()
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]

    top1 = imi_top_k(assigned, books, qvec, k=1, nprobe=1).collect()
    assert top1[0].vec_id == 0
    assert top1[0].cosine == pytest.approx(1.0)

    full = imi_top_k(assigned, books, qvec, k=5, nprobe=9).collect()
    exact = brute_force_top_k(e, qvec, k=5).collect()
    assert [(r.vec_id, r.cosine) for r in full] == [
        (r.vec_id, r.cosine) for r in exact
    ]


def test_dot_pd_null_parity_with_builtin_dot(spark):
    """dot_pd substitutes for the built-in dot in hot paths, so a NULL
    array on either side must yield SQL NULL for that row — not a
    whole-job PythonException from np.stack(None)."""
    from pyspark.sql import functions as F

    from apache_spark_streaming_project_spark.functions.vector import (
        dot,
        dot_pd,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 2.0], [3.0, 4.0]), (1, None, [1.0, 1.0]),
         (2, [1.0, 1.0], None)],
        "k long, a array<double>, b array<double>",
    )
    udf = dot_pd()
    rows = df.select(
        "k", udf("a", "b").alias("pd"), dot("a", "b").alias("hof")
    ).orderBy("k").collect()
    assert [(r.pd, r.hof) for r in rows] == [(11.0, 11.0), (None, None), (None, None)]


def test_label_centroids_null_component_population(spark):
    """A NULL vector component drops out of the per-position sum AND the
    divisor: the centroid is the mean over PRESENT components (the old
    row-count divisor silently shrank every mean at that position)."""
    from apache_spark_streaming_project_spark.operators.similarity import (
        label_centroids,
    )

    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [3.0, None]), ("a", [5.0, 4.0])],
        "label string, embedding array<double>",
    )
    got = {
        (r.label, r.pos): r.centroid for r in label_centroids(df).collect()
    }
    assert got[("a", 0)] == pytest.approx(3.0)  # (1+3+5)/3
    assert got[("a", 1)] == pytest.approx(3.0)  # (2+4)/2 — NOT /3


def test_similarity_kernels_reject_null_embeddings(spark, vecs):
    """Every Arrow assignment/encode kernel fails LOUDLY on NULL
    embeddings instead of dying with numpy's opaque inhomogeneous-shape
    error (parity with the dedup/asof NULL-hardening passes)."""
    from apache_spark_streaming_project_spark.operators import similarity as sim

    with_null = vecs.unionByName(
        spark.createDataFrame(
            [(9, None)], "vec_id bigint, embedding array<double>"
        )
    )
    assigned, cents = sim.ivf_index(vecs, n_centroids=2)
    books = sim.pq_train(vecs, m=3, n_centroids=2)
    for build in (
        lambda: sim.ivf_index(with_null, n_centroids=2)[0].collect(),
        lambda: sim.imi_index(with_null, n_cells_per_half=2)[0].collect(),
        lambda: sim.pq_encode(with_null, books).collect(),
        lambda: sim.ivfpq_assign(
            with_null, cents, [[[0.0], [1.0]], [[0.0], [1.0]], [[0.0], [1.0]]]
        ).collect(),
        lambda: sim.blocked_cosine_join(
            with_null.withColumn("label", with_null.vec_id % 2)
        ).collect(),
    ):
        with pytest.raises(Exception, match="NULL embedding"):
            build()


def test_blocked_cosine_join_overflow_guard(spark):
    """Magnitudes past the int64 Gram bound fail loudly — numpy wraps
    int64 silently, which would corrupt every cosine with no error."""
    from pyspark.sql import functions as F

    from apache_spark_streaming_project_spark.operators.similarity import (
        blocked_cosine_join,
    )

    big = 4.0e9  # (4e9 * 1e6)^2 * dim >> 2^63
    df = spark.createDataFrame(
        [(0, [big, 0.0]), (1, [big, 1.0])],
        "vec_id bigint, embedding array<double>",
    ).withColumn("label", F.lit(1))
    with pytest.raises(Exception, match="overflow|int64"):
        blocked_cosine_join(df).collect()
    # in-range vectors still work
    ok = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.1])],
        "vec_id bigint, embedding array<double>",
    ).withColumn("label", F.lit(1))
    assert blocked_cosine_join(ok, threshold=0.9).count() == 1
