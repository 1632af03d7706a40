"""Replicate an sf directory N-fold (default 10x) with SHIFTED KEYS and
PER-COPY MARKER TOKENS — the round-3 copy-isolation methodology
(BASELINE.md "Scale probe"), extended to EVERY table so the FULL query
registry can run at 10x the data:

  * fact/entity keys shift by copy * (max_key + 1), applied consistently
    to every referencing column (l_orderkey shifts with o_orderkey,
    o_custkey with c_custkey, ...), so each copy is a self-consistent
    star schema and joins produce exactly 10x the rows;
  * dimension tables (region, nation) stay FIXED — realistic corpus
    growth multiplies facts, not countries — so nationkey/regionkey
    references are left unshifted and every copy joins the same dims;
  * document text gets a per-copy SUFFIX appended to every token
    (copy 0 keeps the original text). This is an ISOMORPHIC transform:
    within a copy, the token sequence (and so every word n-gram shingle
    set, every Jaccard, every adjacency) is structurally identical to
    the original, while across copies no token — hence no shingle of
    any n — can ever match. The first cut of this tool inserted a
    marker token BETWEEN words instead; that destroys 2-gram adjacency
    (every 2-gram contains the marker, so SimHash shingle sets
    degenerate to bags of words) and collapsed the 10x corpus's SimHash
    candidate pairs from the expected ~2.5k to 23M — a measurement
    artifact, not an engine behavior. Suffixing has no such failure
    mode;
  * embeddings get a per-copy DIAGONAL ISOMETRY (deterministic ±1 sign
    per component, derived from xxhash64(copy, i)): within a copy every
    pairwise cosine/distance is EXACTLY preserved (diag(±1) is
    orthogonal), while cross-copy vectors decorrelate — the dense-space
    analogue of token suffixing. A small additive perturbation would
    instead leave all 10 copies of each vector mutual near-dups (a
    ~100x spurious pair blowup in the near-dup queries). Labels shift
    per copy too, so label-BLOCKED O(b^2) verification joins keep the
    original block density (10x more blocks, not 10x bigger blocks —
    corpus growth adds categories and shards, it does not densify
    every existing block 10x);
  * events shift BOTH event_id and user_id — the user population grows
    with the corpus, keeping per-user row counts (and the top-k-user
    query shapes) realistic.

Usage:  python tools/make_10x_testdata.py [src_sf_dir] [out_dir] [copies]
            [tables]
Default: /root/testdata/sf0.1 -> /tmp/sf1.0-10x, 10 copies, all tables.
The out dir name deliberately contains "sf1.0" so bench.py's
sf-from-path regex reports the effective scale factor. ``tables`` is an
optional comma-separated fact-table subset (e.g. "documents,embeddings"
for a deep-scale corpus replica that skips the star schema) — the
fixed dims are still copied so the directory stays loadable.

Then:   SPARK_GRAFT_SF_DIR=/tmp/sf1.0-10x python bench.py --runs 3
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F

from apache_spark_streaming_project_spark import get_spark

# key columns to shift, per table, grouped by the entity whose max key
# defines the shared offset (referential integrity within each copy)
ENTITY_KEYS = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
    "label": [("embeddings", "label")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
}
FIXED_DIMS = ["region", "nation"]
FACT_TABLES = [
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]
# target file counts so the 10x copy's scan parallelism reflects its
# size (sf0.1 ships one file per table, capping scans at 1 task)
OUT_FILES = {"lineitem": 32, "events": 16, "orders": 16}


def _copy_of(df: DataFrame, table: str, copy: int, offsets: dict[str, int]) -> DataFrame:
    out = df
    dtypes = dict(df.dtypes)
    for entity, sites in ENTITY_KEYS.items():
        if entity not in offsets:
            continue  # owning table excluded by a table-subset run
        for tab, col in sites:
            if tab == table:
                out = out.withColumn(
                    col,
                    (F.col(col) + F.lit(copy * offsets[entity])).cast(
                        dtypes[col]
                    ),
                )
    if table == "documents" and copy > 0:
        # per-copy suffix on every token: isomorphic within a copy
        # (adjacency and shingle structure preserved), cross-copy
        # shingle matches impossible at any n
        out = out.withColumn(
            "text", F.regexp_replace(F.col("text"), r"(\S+)", f"$1q{copy}z")
        ).withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings" and copy > 0:
        # diagonal isometry: component i flips sign per xxhash64(copy, i)
        # — exact within-copy geometry, decorrelated across copies
        out = out.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: (
                    x
                    * (
                        F.pmod(F.xxhash64(F.lit(copy), i), F.lit(2)) * 2 - 1
                    ).cast("float")
                ).cast("float"),
            ),
        )
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0-10x")
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    fact_tables = (
        [t.strip() for t in sys.argv[4].split(",") if t.strip()]
        if len(sys.argv) > 4
        else FACT_TABLES
    )
    unknown = set(fact_tables) - set(FACT_TABLES)
    if unknown:
        raise SystemExit(f"unknown fact tables: {sorted(unknown)}")
    # entity-ownership closure: a subset that includes a REFERENCING
    # table without the entity's owner would silently skip the key shift
    # (offsets are computed from owners only), leaving N copies with
    # identical keys — exactly the measurement-artifact class the
    # isomorphic transforms exist to prevent. Fail loudly instead.
    broken = sorted(
        f"{tab}.{col} references '{entity}' owned by excluded "
        f"'{sites[0][0]}'"
        for entity, sites in ENTITY_KEYS.items()
        if sites[0][0] not in fact_tables
        for tab, col in sites[1:]
        if tab in fact_tables
    )
    if broken:
        raise SystemExit(
            "table subset breaks key-shift closure (include the owning "
            "tables or drop the referencing ones):\n  " + "\n  ".join(broken)
        )
    spark = get_spark("make-10x")

    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)

    offsets: dict[str, int] = {}
    for entity, sites in ENTITY_KEYS.items():
        tab, col = sites[0]  # the owning table defines the offset
        if tab not in fact_tables:
            continue
        mx = (
            spark.read.parquet(f"{src}/{tab}.parquet")
            .agg(F.max(col).alias("m"))
            .collect()[0]["m"]
        )
        offsets[entity] = int(mx) + 1
    print("key offsets:", offsets)

    for table in FIXED_DIMS:
        df = spark.read.parquet(f"{src}/{table}.parquet")
        df.write.mode("overwrite").parquet(str(out / f"{table}.parquet"))

    for table in fact_tables:
        base = spark.read.parquet(f"{src}/{table}.parquet")
        parts = [_copy_of(base, table, c, offsets) for c in range(copies)]
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        nf = OUT_FILES.get(table, max(copies, 8))
        union.repartition(nf).write.mode("overwrite").parquet(
            str(out / f"{table}.parquet")
        )
        n = spark.read.parquet(str(out / f"{table}.parquet")).count()
        print(f"{table}: {n} rows in {nf} files")

    print(f"done -> {out}")


if __name__ == "__main__":
    main()
