"""Capture .explain("formatted") output for named queries.

Usage: python tools/capture_plans.py <out_dir> <suffix> <query> [...]
Writes <out_dir>/<query>_<suffix>.txt for each query. Run from any
checkout — the repo root is derived from this file's location, so a
worktree at an older commit captures that commit's plans.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    from apache_spark_streaming_project_spark import get_spark
    from apache_spark_streaming_project_spark.entry_queries import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture_plans")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        s = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(s)
        print("captured", name)


if __name__ == "__main__":
    main()
