"""Diff two bench.py JSON outputs: per-query regressions/improvements.

Usage: python tools/bench_diff.py OLD.json NEW.json [threshold_ratio]
Exit code 1 if any query regressed beyond the threshold (default 1.3x)
and by more than 0.25s absolute — the same noise floor used in round
reviews, so tiny queries don't flag on scheduler jitter.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    old = json.load(open(old_path)).get("queries", {})
    new = json.load(open(new_path)).get("queries", {})
    common = sorted(set(old) & set(new))
    regs, imps = [], []
    for name in common:
        o, n = old[name], new[name]
        if o > 0 and n <= 0:
            # Success -> failure is the worst regression of all.
            regs.append((float("inf"), name, o, n))
            continue
        if o <= 0 or n <= 0:
            continue
        r = n / o
        if r > threshold and n - o > 0.25:
            regs.append((r, name, o, n))
        elif r < 1 / threshold and o - n > 0.25:
            imps.append((r, name, o, n))
    for r, name, o, n in sorted(regs, reverse=True):
        print(f"REG  {name}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
    for r, name, o, n in sorted(imps):
        print(f"IMP  {name}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
    # Totals compare the SAME workload: only queries that succeeded in both
    # runs (a query failing in exactly one run would otherwise skew one side).
    both_ok = [q for q in common if old[q] > 0 and new[q] > 0]
    print(
        f"{len(common)} common queries ({len(both_ok)} succeeded in both); "
        f"{len(regs)} regressions, {len(imps)} improvements; totals "
        f"{sum(old[q] for q in both_ok):.1f}s -> "
        f"{sum(new[q] for q in both_ok):.1f}s"
    )
    return 1 if regs else 0


if __name__ == "__main__":
    raise SystemExit(main())
