"""Self-triaging bench diff — compares two bench JSON files (e.g. the
prior round's BENCH_r{N}.json vs a fresh `python bench.py --runs 3`
output) and flags per-query regressions above a ratio threshold, with
each flagged query's PLAN_AUDIT.md row attached so the first triage
question — "did the plan change, or is the box noisy?" — answers itself:
an unchanged audit row plus a multi-run median regression means real
work grew; an unchanged row with a single-run spike is co-tenant noise.

Usage:  python tools/bench_compare.py OLD.json NEW.json [--threshold 1.5]

Exit code 0 always (reporting tool, not a gate); output is markdown.
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_NON_QUERY_KEYS = {"metric", "value", "unit", "sf", "runs", "n", "rc", "cpus"}


def _load(path: str) -> dict[str, float]:
    """Per-query seconds from either bench.py stdout JSON or the driver's
    BENCH_r{N}.json wrapper (which stores the stdout TAIL — possibly
    truncated at the front, so the embedded JSON may not parse whole;
    recover the per-query pairs by regex instead)."""
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc["queries"]
    tail = doc.get("tail", "")
    if isinstance(tail, str):
        pairs = re.findall(r'"([A-Za-z0-9_]+)":\s*([0-9.]+)', tail)
        return {
            k: float(v) for k, v in pairs if k not in _NON_QUERY_KEYS
        }
    return {}


def _plan_audit_rows() -> tuple[str, dict[str, str]]:
    """(header row, {query: table row}) from PLAN_AUDIT.md, if present."""
    path = REPO / "PLAN_AUDIT.md"
    if not path.exists():
        return "", {}
    header = ""
    rows: dict[str, str] = {}
    for line in path.read_text().splitlines():
        if not line.startswith("|"):
            continue
        cells = [c.strip() for c in line.strip("|").split("|")]
        if not cells:
            continue
        if cells[0] == "query":
            header = line
        elif not set(cells[0]) <= {"-"}:
            rows[cells[0]] = line
    return header, rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old", help="baseline bench JSON (e.g. BENCH_r03.json)")
    ap.add_argument("new", help="fresh bench JSON")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument(
        "--min-sec",
        type=float,
        default=0.3,
        help="ignore queries faster than this in BOTH files (fixed-cost "
        "jitter territory: scheduling + codegen dominate below it)",
    )
    args = ap.parse_args()

    old, new = _load(args.old), _load(args.new)
    common = sorted(set(old) & set(new))
    if not common:
        print("no common queries between the two files")
        return

    ratios = sorted(
        (new[q] / old[q], q) for q in common if old[q] > 0
    )
    median_ratio = ratios[len(ratios) // 2][0]
    print(
        f"common queries: {len(common)}; "
        f"median ratio new/old: {median_ratio:.2f}x; "
        f"totals {sum(old[q] for q in common):.1f}s -> "
        f"{sum(new[q] for q in common):.1f}s"
    )

    flagged = [
        q
        for q in common
        if old[q] > 0
        and new[q] / old[q] > args.threshold
        and max(old[q], new[q]) >= args.min_sec
    ]
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"new-only queries ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"dropped queries ({len(removed)}): {', '.join(removed)}")

    if not flagged:
        print(f"no regressions above {args.threshold}x — quiet bench")
        return

    header, audit = _plan_audit_rows()
    print(f"\n## {len(flagged)} queries above {args.threshold}x\n")
    print("| query | old s | new s | ratio |")
    print("|---|---|---|---|")
    for q in sorted(flagged, key=lambda q: new[q] / old[q], reverse=True):
        print(f"| {q} | {old[q]:.2f} | {new[q]:.2f} | {new[q] / old[q]:.2f}x |")
    if header:
        print("\nplan-audit rows for the flagged queries (unchanged row +")
        print("multi-run median regression = real work grew; unchanged row +")
        print("single-run spike = co-tenant noise — rerun with --runs 3):\n")
        print(header)
        print("|" + "---|" * (header.count("|") - 1))
        for q in flagged:
            print(audit.get(q, f"| {q} | (no audit row) |"))


if __name__ == "__main__":
    main()
