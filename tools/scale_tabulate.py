"""Tabulate the full-registry 10x/1x scale ratios (round-7 verdict item
1): reads two bench.py JSON outputs — the sf0.1 medians and the
10x-replicated medians (tools/make_10x_testdata.py) — and emits the
BASELINE.md markdown: aggregate stats, the ratio distribution, the
slowest 10x rows, and every row whose ratio exceeds the super-linear
flag threshold.

At 10x the data, a perfectly DATA-BOUND linear operator costs <= ~10x;
fixed-cost-dominated queries (streaming lifecycle drains, planted
fixtures, tiny dims) sit near 1x. Anything above 10x grew FASTER than
the data — the super-linear smell the registry-wide run exists to
catch — modulo the usual co-tenant jitter on sub-second rows, so the
flag also requires the 10x time to be non-trivial (>= 1 s).

Usage: python tools/scale_tabulate.py tools/bench_r7_medians.json \
           tools/bench_r7_10x_medians.json [flag_ratio=10.0]
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    base_p = sys.argv[1] if len(sys.argv) > 1 else "tools/bench_r7_medians.json"
    big_p = sys.argv[2] if len(sys.argv) > 2 else "tools/bench_r7_10x_medians.json"
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

    base = json.load(open(base_p))["queries"]
    big = json.load(open(big_p))["queries"]
    common = sorted(set(base) & set(big))
    ratios = {q: big[q] / base[q] for q in common if base[q] > 0}

    total_1x = sum(base[q] for q in common)
    total_10x = sum(big[q] for q in common)
    med = statistics.median(ratios.values())
    print(f"queries: {len(common)}  total 1x: {total_1x:.1f} s  "
          f"total 10x: {total_10x:.1f} s  (aggregate {total_10x / total_1x:.2f}x)")
    print(f"per-query ratio: median {med:.2f}x  "
          f"p90 {sorted(ratios.values())[int(0.9 * len(ratios))]:.2f}x  "
          f"max {max(ratios.values()):.2f}x\n")

    buckets = [(0, 1.2), (1.2, 2), (2, 4), (4, 7), (7, 10), (10, 1e9)]
    print("| ratio bucket | queries |")
    print("|---|---|")
    for lo, hi in buckets:
        n = sum(1 for r in ratios.values() if lo <= r < hi)
        label = f"{lo}-{hi}x" if hi < 1e9 else f">={lo}x"
        print(f"| {label} | {n} |")

    print("\nslowest rows at 10x:")
    print("| query | 1x | 10x | ratio |")
    print("|---|---|---|---|")
    for q in sorted(common, key=lambda q: -big[q])[:15]:
        print(f"| {q} | {base[q]:.2f} s | {big[q]:.2f} s | {ratios[q]:.1f}x |")

    flagged = {
        q: r for q, r in ratios.items() if r > flag and big[q] >= 1.0
    }
    print(f"\nsuper-linear flags (ratio > {flag}x and 10x time >= 1 s): "
          f"{len(flagged)}")
    for q, r in sorted(flagged.items(), key=lambda kv: -kv[1]):
        print(f"| {q} | {base[q]:.2f} s | {big[q]:.2f} s | {r:.1f}x |")


if __name__ == "__main__":
    main()
