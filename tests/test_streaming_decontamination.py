"""m18_streaming_decontamination (round-12): the benchmark-leakage gate
run per micro-batch against a static benchmark gram table."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_spark_streaming_project_spark.entry_queries import QUERIES
from apache_spark_streaming_project_spark.operators.dedup import (
    streaming_decontaminate_batch,
    word_shingles,
)

SF_DIR = "/root/testdata/sf0.001"


def test_m18_end_to_end_plants_and_totals(spark):
    out = {
        r["doc_id"]: r
        for r in QUERIES["m18_streaming_decontamination"]
        .fn(spark, SF_DIR)
        .collect()
    }
    # the exactly-one-hit plant: 3 grams, 1 contaminated, dropped
    p = out[-3]
    assert (p["n_grams"], p["n_contaminated"], p["kept"]) == (3, 1, False)
    # only train docs appear; every zero-hit doc is kept
    assert all(
        r["kept"] == (r["n_contaminated"] == 0) for r in out.values()
    )
    assert all(k == -3 or k % 10 < 8 for k in out)


def test_replay_is_idempotent(spark, tmp_path):
    bench_dir = str(tmp_path / "bench")
    sink = str(tmp_path / "sink")
    docs = spark.createDataFrame(
        [(1, 0, "a b c d e f g h i"), (2, 0, "z y x w v u t s r")],
        "doc_id long, epoch long, text string",
    )
    spark.createDataFrame(
        [("a b c d e f g h",)], "gram string"
    ).write.parquet(bench_dir)
    streaming_decontaminate_batch(docs, bench_dir, sink, 0)
    before = sorted(map(tuple, spark.read.parquet(sink).collect()))
    streaming_decontaminate_batch(docs, bench_dir, sink, 0)  # replay
    assert sorted(map(tuple, spark.read.parquet(sink).collect())) == before
    got = {r["doc_id"]: r for r in spark.read.parquet(sink).collect()}
    assert not got[1]["kept"] and got[2]["kept"]


def test_short_doc_has_zero_grams_and_is_kept(spark, tmp_path):
    bench_dir = str(tmp_path / "bench")
    sink = str(tmp_path / "sink")
    spark.createDataFrame(
        [("a b c d e f g h",)], "gram string"
    ).write.parquet(bench_dir)
    docs = spark.createDataFrame(
        [(1, 0, "too short"), (2, 0, "")],
        "doc_id long, epoch long, text string",
    )
    streaming_decontaminate_batch(docs, bench_dir, sink, 0)
    got = {r["doc_id"]: r for r in spark.read.parquet(sink).collect()}
    for k in (1, 2):
        assert (got[k]["n_grams"], got[k]["n_contaminated"],
                got[k]["kept"]) == (0, 0, True)
