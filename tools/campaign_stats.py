"""Summarize an interleaved scaling campaign JSONL (bench_runs/r3_scaling.jsonl).

    python tools/campaign_stats.py [path]

Prints per-level min/median/all runs and min-based + median-based efficiency
for the 4->16 and 8->32 pairs. Minima are the estimator of record on this
host: external neighbor load only ever ADDS wall time (BASELINE.md
methodology), so per-level minima over interleaved reps converge on the
quiet-machine time while medians get poisoned by loaded windows.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main(path: str) -> None:
    runs = defaultdict(list)
    for line in open(path):
        line = line.strip()
        if not line or line == "DONE":
            continue
        row = json.loads(line)
        if "value" not in row.get("res", {}):
            continue  # failed child run recorded for forensics
        runs[row["ncpu"]].append(row["res"]["value"])
    for c in sorted(runs):
        xs = sorted(runs[c])
        med = xs[len(xs) // 2]
        print(f"cpus={c:3d}  n={len(xs)}  min={xs[0]:7.2f}  med={med:7.2f}  "
              f"runs={[round(x, 1) for x in runs[c]]}")
    for lo, hi in ((4, 16), (8, 32), (2, 8)):
        if lo in runs and hi in runs:
            m = (min(runs[lo]) / min(runs[hi])) / (hi / lo)
            xs_lo, xs_hi = sorted(runs[lo]), sorted(runs[hi])
            md = (xs_lo[len(xs_lo) // 2] / xs_hi[len(xs_hi) // 2]) / (hi / lo)
            print(f"{lo}->{hi}: min-based eff = {m:.3f}   median-based = {md:.3f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/bench_runs/r3_scaling.jsonl")
