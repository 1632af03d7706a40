"""Skewed-distribution stress for the dedup path (round-10 VERDICT
item 4). The existing decade probes grow suffix-varied replicas —
roughly UNIFORM token growth. Real crawl corpora are power-law: a few
tokens dominate, and template/boilerplate lines appear in every
document. This probe re-runs MinHash-LSH and remove_common_lines at
1x/10x/100x under an adversarial Zipfian corpus and records the law,
proving the two skew defenses hold exactly where they are claimed to:

* ``max_shingle_df`` (dedup.py minhash_signatures_df): template
  shingles with df ~= N otherwise dominate every document's min-hashes
  and collapse sub-threshold pairs into mega-buckets (a global O(N^2)
  self-join). Measured both WITH the cap (three decades, including
  planted-near-dup recall under the skew) and WITHOUT it (1x/10x only
  — the uncapped candidate count IS the quadratic blowup, shown then
  avoided).
* fingerprint mode (text.py remove_common_lines): the corpus-wide line
  df table under boilerplate at df=N.

Corpus (fully deterministic, no RNG): N docs; each doc = 3 boilerplate
lines shared by ALL docs (df = N) interleaved with 3 content lines of
10 tokens drawn Zipf(s~1) over a 50k vocabulary via the log-uniform
inverse CDF (rank = floor(V^u), u = xxhash64 fraction) — "one
mega-token + heavy head + long tail", the published crawl token shape.
Every 100th doc is a PLANTED near-dup of its predecessor (same content
lines + one extra token), so capped recall is measurable under skew.

Timing is a noop-format write (count() is NOT a valid timer here:
remove_common_lines ends in a left join against a provably-unique
aggregate, which Catalyst ELIMINATES under a bare count — the first
draft of this probe measured 0.2 s flat at every scale that way).
Failures are caught and recorded, not crashed on: an OOM at scale IS a
result. Driver heap is raised to 8g: the first draft OOMed at the 100x
capped point under the default 1g local heap — measured root cause is
NOT the hot set (only 3,551 shingles exceed df=100 at 500k docs; the
anti-join build side stays tiny exactly as the operator docstring
claims) but the 12.7M-distinct-shingle df aggregation itself, which a
1g heap shared by 8 task threads cannot hold through its hash-agg
spill. Any realistic executor sizing clears it; recorded in
BASELINE.md as an environment bound, not an operator hazard.

Usage: python tools/probe_skewed_dedup.py [out_json]
Run alone (quiet-bench rule).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

V = 50_000
SCALES = [5_000, 50_000, 500_000]
BOILER = [
    "SUBSCRIBE TO OUR NEWSLETTER FOR DAILY UPDATES",
    "COPYRIGHT 2024 EXAMPLE CORP ALL RIGHTS RESERVED",
    "FOLLOW US ON SOCIAL MEDIA FOR MORE CONTENT",
]


def zipf_token(seed_col) -> F.Column:
    u = (
        F.pmod(F.xxhash64(seed_col), F.lit(1_000_000)).cast("double")
        + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    rank = F.floor(F.pow(F.lit(float(V)), u)).cast("long")
    return F.concat(F.lit("t"), rank.cast("string"))


def corpus(spark, n: int):
    d = spark.range(n).select(F.col("id").alias("doc_id"))
    planted = F.col("doc_id") % 100 == 99
    # planted docs reuse the PREDECESSOR's content seed -> near-dup pair
    seed_id = F.when(planted, F.col("doc_id") - 1).otherwise(F.col("doc_id"))

    def line(tag: int):
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(9)),
            lambda j: zipf_token(
                F.concat_ws(":", seed_id.cast("string"),
                            F.lit(str(tag)), j.cast("string"))
            ),
        )
        return F.array_join(toks, " ")

    text = F.concat_ws(
        "\n",
        F.lit(BOILER[0]), line(0), F.lit(BOILER[1]), line(1),
        F.lit(BOILER[2]),
        F.when(planted, F.concat(line(2), F.lit(" textra"))).otherwise(line(2)),
    )
    return d.select("doc_id", text.alias("text"))


def timed_noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "tools/probe_skewed_dedup.json"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("probe_skewed_dedup")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from apache_spark_streaming_project_spark.operators.dedup import (
        minhash_lsh_candidates,
    )
    from apache_spark_streaming_project_spark.operators.text import (
        remove_common_lines,
    )

    results = {"remove_common_lines_fp": [], "minhash_capped": [],
               "minhash_uncapped": []}

    def run(bucket: str, n: int, fn):
        try:
            r = fn()
        except Exception as e:  # noqa: BLE001 — an OOM at scale IS a result
            r = {"error": str(e).splitlines()[0][:160]}
        r["n_docs"] = n
        results[bucket].append(r)
        print(bucket, n, json.dumps(r), flush=True)

    for n in SCALES:
        c = corpus(spark, n).cache()
        c.count()

        def rcl():
            w = timed_noop(remove_common_lines(c, min_df=10, fingerprint=True))
            return {"wall_s": round(w, 1)}

        run("remove_common_lines_fp", n, rcl)

        def capped():
            t0 = time.monotonic()
            out = minhash_lsh_candidates(
                c, "doc_id", "text", num_hashes=32, bands=8,
                max_shingle_df=100,
            ).cache()
            pairs = out.count()
            planted_found = out.filter(
                (F.col("key_b") - F.col("key_a") == 1)
                & (F.col("key_a") % 100 == 98)
            ).count()
            w = time.monotonic() - t0
            out.unpersist()
            return {
                "wall_s": round(w, 1),
                "pairs": pairs,
                "planted_found": planted_found,
                "planted_total": n // 100,
            }

        run("minhash_capped", n, capped)

        if n <= 50_000:
            # uncapped: boilerplate shingles (df = N) dominate the
            # signatures — quantify the mega-bucket blowup at 1x/10x,
            # then stop (the growth is ~N^2; the 100x point is the
            # anti-pattern this probe documents, not a measurement)
            def uncapped():
                t0 = time.monotonic()
                pairs = minhash_lsh_candidates(
                    c, "doc_id", "text", num_hashes=32, bands=8,
                    max_shingle_df=None,
                ).count()
                return {"wall_s": round(time.monotonic() - t0, 1),
                        "pairs": pairs}

            run("minhash_uncapped", n, uncapped)
        c.unpersist()

    Path(out_path).write_text(json.dumps(results, indent=1))
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
