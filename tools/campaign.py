"""Interleaved fresh-process scaling campaign.

    python tools/campaign.py [levels=8,32] [reps=12] [out=bench_runs/r4_scaling.jsonl]

Runs the headline linkage bench (BENCH_HEADLINE_ONLY) over the scaling corpus
at each CPU level, interleaved (so host-load drift hits every level equally),
one fresh process per run, appending one JSONL row per run. Summarize with
tools/campaign_stats.py — per-level MINIMA are the estimator of record on
this host (external neighbor load only ever ADDS wall time; BASELINE.md
"Scaling methodology").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_one(ncpu: int, corpus_dir: str) -> dict:
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(ncpu),
        BENCH_HEADLINE_ONLY="1",
        BENCH_SCALING_CORPUS=corpus_dir,
    )
    r = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        env=env, capture_output=True, text=True,
    )
    if r.returncode != 0:
        return {"error": r.stderr[-500:]}
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    levels = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "8,32").split(",")]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/bench_runs/r4_scaling.jsonl"
    corpus = os.environ.get("CAMPAIGN_CORPUS", "/tmp/elr_bench/scaling_100000_s6")
    with open(out, "a") as f:
        for rep in range(1, reps + 1):
            for ncpu in levels:
                res = run_one(ncpu, corpus)
                row = {"rep": rep, "ncpu": ncpu, "res": res,
                       "t": time.strftime("%H:%M:%S")}
                f.write(json.dumps(row) + "\n")
                f.flush()
                print(row["t"], ncpu, res.get("value", res), flush=True)


if __name__ == "__main__":
    main()
