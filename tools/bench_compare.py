"""Self-triaging bench diff — compares two bench JSON files (e.g. the
prior round's BENCH_r{N}.json vs a fresh `python bench.py --runs 3`
output) and flags per-query regressions above a ratio threshold, with
each flagged query's PLAN_AUDIT.md row attached so the first triage
question — "did the plan change, or is the box noisy?" — answers itself:
an unchanged audit row plus a multi-run median regression means real
work grew; an unchanged row with a single-run spike is co-tenant noise.

Usage:  python tools/bench_compare.py OLD.json NEW.json [--threshold 1.5]
                                      [--audit-rev REV]

The co-tenant-noise protocol (BASELINE.md "Reading round-over-round
bench tails") is built in: queries whose PLAN_AUDIT.md row is UNCHANGED
between ``--audit-rev`` (the git rev the old bench was taken at;
default HEAD) and the working tree act as CONTROLS — their median ratio
estimates the box's drift, and a flagged query self-adjudicates:

  * plan row changed                  -> REGRESSION CANDIDATE (real work
                                         may have grown; read the diff)
  * row unchanged, ratio/control <= t -> noise-consistent (the whole box
                                         drifted; nothing to chase)
  * row unchanged, ratio/control >  t -> INVESTIGATE (same plan, slower
                                         than the drift explains — rerun
                                         with --runs 3 before believing)

Exit code 0 always (reporting tool, not a gate); output is markdown.
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_NON_QUERY_KEYS = {"metric", "value", "unit", "sf", "runs", "n", "rc", "cpus"}


def _load(path: str) -> dict[str, float]:
    """Per-query seconds from either bench.py stdout JSON or the driver's
    BENCH_r{N}.json wrapper (which stores the stdout TAIL — possibly
    truncated at the front, so the embedded JSON may not parse whole;
    recover the per-query pairs by regex instead)."""
    text = Path(path).read_text()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        # bench.py emits the full per-query record plus a compact headline
        # as a second line (for the driver's tail parser); take whichever
        # line carries the per-query dict
        doc = {}
        for line in text.splitlines():
            try:
                cand = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "queries" in cand or not doc:
                doc = cand
    if "queries" in doc:
        return doc["queries"]
    tail = doc.get("tail", "")
    if isinstance(tail, str):
        pairs = re.findall(r'"([A-Za-z0-9_]+)":\s*([0-9.]+)', tail)
        return {
            k: float(v) for k, v in pairs if k not in _NON_QUERY_KEYS
        }
    return {}


def _parse_audit(text: str) -> tuple[str, dict[str, str]]:
    header = ""
    rows: dict[str, str] = {}
    for line in text.splitlines():
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


def _plan_audit_rows() -> tuple[str, dict[str, str]]:
    """(header row, {query: table row}) from the working-tree PLAN_AUDIT.md."""
    path = REPO / "PLAN_AUDIT.md"
    if not path.exists():
        return "", {}
    return _parse_audit(path.read_text())


def _plan_audit_rows_at(rev: str) -> dict[str, str]:
    """Audit rows from PLAN_AUDIT.md at a git rev (the rev the OLD bench
    was taken at), for the changed-plan control check; {} if unreadable."""
    try:
        text = subprocess.run(
            ["git", "-C", str(REPO), "show", f"{rev}:PLAN_AUDIT.md"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
    except (subprocess.CalledProcessError, OSError):
        return {}
    return _parse_audit(text)[1]


def _norm_row(row: str | None) -> str:
    """Whitespace-insensitive row comparison (table re-alignment is not a
    plan change)."""
    return re.sub(r"\s+", " ", row or "").strip()


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
    ap.add_argument(
        "--audit-rev",
        default="HEAD",
        help="git rev whose PLAN_AUDIT.md matches the OLD bench (default "
        "HEAD); unchanged-row queries act as drift controls",
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

    header, audit = _plan_audit_rows()
    old_audit = _plan_audit_rows_at(args.audit_rev)
    changed_plan = {
        q
        for q in common
        if _norm_row(audit.get(q)) != _norm_row(old_audit.get(q))
    }
    # the control cohort: common queries whose plan-audit row did NOT
    # change — any uniform drift in their ratios is the box, not the code
    control_ratios = sorted(
        new[q] / old[q]
        for q in common
        if old[q] > 0 and q not in changed_plan
    )
    control = (
        control_ratios[len(control_ratios) // 2] if control_ratios else 1.0
    )
    if old_audit:
        print(
            f"control drift (median ratio over {len(control_ratios)} "
            f"unchanged-plan queries vs {args.audit_rev}): {control:.2f}x"
        )
    else:
        print(
            f"(no PLAN_AUDIT.md at {args.audit_rev}; treating all rows as "
            "unchanged, control drift from the full cohort)"
        )

    if not flagged:
        print(f"no regressions above {args.threshold}x — quiet bench")
        return

    print(f"\n## {len(flagged)} queries above {args.threshold}x\n")
    print("| query | old s | new s | ratio | adj. (/control) | verdict |")
    print("|---|---|---|---|---|---|")
    for q in sorted(flagged, key=lambda q: new[q] / old[q], reverse=True):
        ratio = new[q] / old[q]
        adj = ratio / control if control > 0 else ratio
        if q in changed_plan:
            verdict = "REGRESSION CANDIDATE (plan row changed)"
        elif adj <= args.threshold:
            verdict = "noise-consistent (plan unchanged, within drift)"
        else:
            verdict = "INVESTIGATE (plan unchanged; rerun --runs 3)"
        print(
            f"| {q} | {old[q]:.2f} | {new[q]:.2f} | {ratio:.2f}x "
            f"| {adj:.2f}x | {verdict} |"
        )
    if header:
        print("\nplan-audit rows for the flagged queries:\n")
        print(header)
        print("|" + "---|" * (header.count("|") - 1))
        for q in flagged:
            print(audit.get(q, f"| {q} | (no audit row) |"))


if __name__ == "__main__":
    main()
