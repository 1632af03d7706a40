"""Z-order layout: demonstrate ACTUAL scan pruning, not just the extent
metric (round-10 VERDICT item 2).

`x7_zorder_clustering` hash-checks the worst-dimension-extent metric; the
100 TB claim behind it is that a z-ordered parquet layout lets footer
(min/max) statistics skip most files/row-groups under MULTI-dimensional
predicates, where a single-column sort only helps its own column. This
test writes the same table twice — sorted by ``x`` alone vs z-ordered via
``repartitionByRange(zorder_key(x, y)) + sortWithinPartitions`` — then
reads the parquet footers with pyarrow and counts which row groups a
stats-based reader must touch for a given predicate. That is exactly the
pruning decision Spark's parquet reader (and every lakehouse OPTIMIZE
ZORDER consumer) makes from the same statistics.

Pinned claims (with wide safety margins over the measured values, which
land in BASELINE.md):

* second-dimension predicate (``y`` range): the x-sorted layout prunes
  NOTHING (every row group spans all of y) while the z-ordered layout
  touches a small fraction of row groups;
* both-dimension box: z-order touches at most as many row groups as the
  single-column sort;
* both layouts return byte-identical query results (layout must never
  change semantics).
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from apache_spark_streaming_project_spark.operators.layout import zorder_key

N = 100_000
DOM = 1 << 10  # x, y in [0, 1024)
FILES = 64


def _data(spark):
    # deterministic pseudo-uniform points (no RNG state): two independent
    # xxhash64 streams folded into the domain
    return spark.range(N).select(
        F.col("id"),
        F.pmod(F.xxhash64("id", F.lit("x")), F.lit(DOM)).cast("int").alias("x"),
        F.pmod(F.xxhash64("id", F.lit("y")), F.lit(DOM)).cast("int").alias("y"),
    )


def _row_group_stats(path: str) -> list[dict]:
    out = []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            st = {}
            for c in ("x", "y"):
                s = rg.column(idx[c]).statistics
                st[c] = (s.min, s.max)
            out.append(st)
    return out


def _candidates(stats: list[dict], box: dict) -> int:
    """Row groups a min/max-stats reader cannot skip for the predicate
    ``AND_c col BETWEEN box[c]`` — the standard interval-overlap test."""
    n = 0
    for st in stats:
        if all(st[c][0] <= hi and st[c][1] >= lo for c, (lo, hi) in box.items()):
            n += 1
    return n


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    d = _data(spark)
    sorted_path = str(base / "sorted_x")
    z_path = str(base / "zorder_xy")
    # single-column layout: range-partitioned and sorted on x only
    (
        d.repartitionByRange(FILES, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(sorted_path)
    )
    # z-ordered layout: same file count, range-partitioned on the Morton key
    zd = d.withColumn("_z", zorder_key(["x", "y"], bits=10))
    (
        zd.repartitionByRange(FILES, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(z_path)
    )
    return sorted_path, z_path


def test_second_dimension_pruning(spark, layouts):
    """A y-only predicate: the x-sorted layout must scan everything, the
    z-ordered layout a small fraction."""
    sorted_path, z_path = layouts
    s_stats = _row_group_stats(sorted_path)
    z_stats = _row_group_stats(z_path)
    assert len(s_stats) >= FILES and len(z_stats) >= FILES

    box = {"y": (256, 319)}  # 1/16 of the y domain
    s_hit = _candidates(s_stats, box)
    z_hit = _candidates(z_stats, box)
    # x-sorted: every row group spans ~all of y -> no pruning at all
    assert s_hit / len(s_stats) >= 0.95
    # z-ordered: 64 range-partitions of the interleaved key constrain the
    # top y bits -> only the matching y-slab row groups survive. Measured
    # ~0.25 at 64 files / 10-bit keys; 0.5 is the safety bar.
    assert z_hit / len(z_stats) <= 0.5
    # and the pruning is REAL: both layouts agree on the answer
    q = lambda p: (  # noqa: E731
        spark.read.parquet(p)
        .filter((F.col("y") >= 256) & (F.col("y") <= 319))
        .agg(
            F.count("*").alias("n"),
            F.sum("id").alias("sid"),
            F.sum("x").alias("sx"),
        )
        .first()
    )
    assert tuple(q(sorted_path)) == tuple(q(z_path))


def test_box_query_z_at_most_sorted(spark, layouts):
    """A box predicate selective in both dimensions: z-order must touch at
    most as many row groups as the x-sort (it trades a little x
    resolution for y resolution; on a square box it wins or ties)."""
    sorted_path, z_path = layouts
    s_stats = _row_group_stats(sorted_path)
    z_stats = _row_group_stats(z_path)
    box = {"x": (512, 575), "y": (512, 575)}  # 1/16 x 1/16 of the domain
    s_frac = _candidates(s_stats, box) / len(s_stats)
    z_frac = _candidates(z_stats, box) / len(z_stats)
    assert z_frac <= s_frac
    # the box is 1/256 of the area; z-order should land well under 10%
    assert z_frac <= 0.10
    q = lambda p: (  # noqa: E731
        spark.read.parquet(p)
        .filter(
            (F.col("x") >= 512) & (F.col("x") <= 575)
            & (F.col("y") >= 512) & (F.col("y") <= 575)
        )
        .agg(F.count("*").alias("n"), F.sum("id").alias("sid"))
        .first()
    )
    assert tuple(q(sorted_path)) == tuple(q(z_path))


def test_report_measured_fractions(spark, layouts, capsys):
    """Record the measured candidate fractions (picked up into
    BASELINE.md; assertions above use 2x safety margins)."""
    sorted_path, z_path = layouts
    s_stats = _row_group_stats(sorted_path)
    z_stats = _row_group_stats(z_path)
    rows = []
    for label, box in [
        ("y-slab 1/16", {"y": (256, 319)}),
        ("box 1/16 x 1/16", {"x": (512, 575), "y": (512, 575)}),
        ("x-slab 1/16", {"x": (256, 319)}),
    ]:
        rows.append(
            f"{label}: sorted-x {_candidates(s_stats, box)}/{len(s_stats)}"
            f" vs z-order {_candidates(z_stats, box)}/{len(z_stats)}"
        )
    print("ZORDER_PRUNING " + " | ".join(rows))
    assert rows
