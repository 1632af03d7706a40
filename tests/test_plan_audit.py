"""Registry-wide plan-audit gate: every plannable query must build, and
the anti-pattern budget (cartesian products anywhere, Expand outside
grouping-sets/pivot/sliding-window semantics) is pinned at ZERO — a new
offender fails here instead of shipping a scale regression."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def test_registry_plan_audit_is_clean(spark, sf_dir):
    from plan_audit import EXECUTING, audit

    from apache_spark_streaming_project_spark.entry_queries import QUERIES

    rows, problems = audit(sf_dir)
    assert problems == [], problems
    # every non-executing query planned (none silently skipped)
    assert len(rows) == len(QUERIES) - len(EXECUTING & set(QUERIES))
