"""x3_kmeans_lloyd (round-13): distributed Lloyd iterations with an
integer-exact trajectory. Pins partitioning invariance (the result is
a pure function of the data, not the layout), bit-agreement with an
independent numpy replay of the same quantized algorithm, and that
the Lloyd objective does not increase across iterations."""

from __future__ import annotations

import numpy as np

from apache_spark_streaming_project_spark.entry_queries import QUERIES
from apache_spark_streaming_project_spark.operators.similarity import (
    kmeans_lloyd,
)

SF_DIR = "/root/testdata/sf0.001"
K, ITERS, SCALE = 8, 3, 1_000_000


def _vecs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _numpy_reference(rows, k, iters):
    """The same quantized Lloyd loop in plain numpy (int64 throughout,
    round-half-up requantization, (distance, cid) tie-break)."""
    keys = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    q = np.array(
        [
            [int(np.floor(float(x) * SCALE + 0.5)) for x in r["embedding"]]
            for r in rows
        ],
        dtype=np.int64,
    )
    order = np.argsort(keys)
    keys, q = keys[order], q[order]
    cents = {int(keys[i]): q[i].copy() for i in range(len(keys)) if keys[i] < k}
    assign = None
    for _ in range(iters):
        cid_list = sorted(cents)
        cmat = np.stack([cents[c] for c in cid_list])
        d = ((q[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
        best = np.argmin(d, axis=1)  # argmin takes first on ties == min cid
        assign = np.array([cid_list[b] for b in best], dtype=np.int64)
        for c in cid_list:
            members = q[assign == c]
            if len(members):
                s, n = members.sum(axis=0), len(members)
                cents[c] = (2 * s + n) // (2 * n)  # floor((2s+n)/(2n))
    return cents, dict(zip(keys.tolist(), assign.tolist()))


def test_kmeans_partitioning_invariance(spark):
    e = _vecs(spark)
    outs = []
    for parts in (1, 7):
        cents, assigned = kmeans_lloyd(e.repartition(parts), K, ITERS)
        outs.append(
            (
                sorted((r["cid"], tuple(r["c"])) for r in cents.collect()),
                sorted(map(tuple, assigned.collect())),
            )
        )
    assert outs[0] == outs[1]


def test_kmeans_matches_numpy_reference(spark):
    e = _vecs(spark)
    cents, assigned = kmeans_lloyd(e, K, ITERS)
    got_c = {r["cid"]: tuple(r["c"]) for r in cents.collect()}
    got_a = {r["key"]: r["cid"] for r in assigned.collect()}
    want_c, want_a = _numpy_reference(e.collect(), K, ITERS)
    assert got_a == want_a
    assert {c: tuple(v.tolist()) for c, v in want_c.items()} == got_c


def test_kmeans_objective_non_increasing(spark):
    e = _vecs(spark)
    rows = e.collect()

    def wcss(iters):
        cents, assign = _numpy_reference(rows, K, iters)
        q = {
            r["vec_id"]: np.array(
                [int(np.floor(float(x) * SCALE + 0.5)) for x in r["embedding"]],
                dtype=np.int64,
            )
            for r in rows
        }
        return sum(
            int(((q[k_] - cents[c]) ** 2).sum()) for k_, c in assign.items()
        )

    objs = [wcss(i) for i in (1, 2, 3)]
    assert objs[0] >= objs[1] >= objs[2]


def test_kmeans_end_to_end_shape(spark):
    out = QUERIES["x3_kmeans_lloyd"].fn(spark, SF_DIR).collect()
    assert len(out) == K * 64
    sizes = {r["cid"]: r["n_members"] for r in out}
    n_vecs = _vecs(spark).count()
    assert sum(sizes.values()) == n_vecs  # every vector assigned once
