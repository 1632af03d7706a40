"""Interleaved A/B drift attribution (round-11 verdict item 2).

Round 10 recorded an across-the-board 1.15x common-query median drift
between tools/bench_r9b_medians.json (taken at round-9 HEAD, one
session) and tools/bench_r10_medians.json (round-10 HEAD, another
session). Uniform drift of that shape is usually box state, but the
two measurements were hours apart on a shared container — this probe
removes the box from the comparison by interleaving the two code trees
in ONE session on one quiet box:

    A = current HEAD (/root/repo)     B = round-9 HEAD (a git worktree)
    run order A B A B A B  (3 full bench.py passes each, sf0.1)

Per-query medians per tree over the COMMON registry, excluding the
three queries whose round-11 boundary plants changed their plans
(s20/d1/d13 — they are no longer the same program as at r9 HEAD).
If the interleaved median ratio ~= 1.0, the r10 drift was box state
and the interleaved spread IS the measured noise bound; if it
reproduces ~1.15x, the drift is real and the round-10 commit range is
the bisect target.

Usage: python tools/probe_drift_interleaved.py [r9_tree] [runs]
Writes tools/probe_drift_interleaved.json.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CHANGED_THIS_ROUND = {
    "s20_totalprice_bucket_counts",
    "d1_trailing_window_counts",
    "d13_top_users_by_value",
}


def bench(tree: Path) -> dict[str, float]:
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        try:
            doc = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "queries" in doc:
            return doc["queries"]
    raise RuntimeError(f"no bench JSON from {tree}: {out.stdout[-500:]}\n{out.stderr[-500:]}")


def main() -> int:
    r9 = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/r9head")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    a_runs: list[dict[str, float]] = []
    b_runs: list[dict[str, float]] = []
    for i in range(runs):
        print(f"pass {i + 1}/{runs}: A (HEAD)", flush=True)
        a_runs.append(bench(REPO))
        print(f"pass {i + 1}/{runs}: B (r9)", flush=True)
        b_runs.append(bench(r9))

    common = (
        set.intersection(*(set(r) for r in a_runs + b_runs))
        - CHANGED_THIS_ROUND
    )
    med = lambda rs, q: statistics.median(r[q] for r in rs)  # noqa: E731
    ratios = sorted(
        ((med(a_runs, q) / med(b_runs, q), q) for q in common), reverse=True
    )
    vals = [r for r, _ in ratios]
    summary = {
        "common_queries": len(common),
        "runs_each": runs,
        "median_ratio": round(statistics.median(vals), 3),
        "p90_ratio": round(sorted(vals)[int(0.9 * len(vals))], 3),
        "worst": [(q, round(r, 2)) for r, q in ratios[:5]],
        "best": [(q, round(r, 2)) for r, q in ratios[-5:]],
        "total_a_median": round(
            statistics.median(sum(r[q] for q in common) for r in a_runs), 1
        ),
        "total_b_median": round(
            statistics.median(sum(r[q] for q in common) for r in b_runs), 1
        ),
        "per_query": {q: {"a": round(med(a_runs, q), 3), "b": round(med(b_runs, q), 3)} for q in sorted(common)},
    }
    out = REPO / "tools" / "probe_drift_interleaved.json"
    out.write_text(json.dumps(summary, indent=1))
    print(json.dumps({k: v for k, v in summary.items() if k != "per_query"}, indent=1))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
