"""Measure this machine's raw multiprocess CPU-scaling ceiling — no Ray, no
engine code: K independent Python processes each do an identical fixed
amount of sha256 work; ideal hardware keeps wall time constant as K grows to
the core count.

The per-process slowdown factor at high K bounds ANY pipeline's N -> 4N
scaling efficiency measurable on this box: on shared/virtualized cores the
host throttles per-vCPU throughput under full occupancy, an artifact real
multi-node clusters (one memory system + silicon per node) do not have.

    python tools/cpu_ceiling.py            # probes 1/4/8/16/32
    -> {"wall_k8": ..., "ceiling_8_32": ..., "ceiling_4_16": ...}

ceiling_N_4N = wall_kN / wall_k4N == the maximum throughput-scaling
efficiency a perfectly parallel, zero-shuffle workload could record between
num_cpus=N and num_cpus=4N on this machine.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

WORK = r'''
import hashlib, sys
n = int(sys.argv[1])
h = b"x" * 4096
for i in range(n):
    h = hashlib.sha256(h).digest() + b"y" * 4064
'''

# memory-bandwidth kernel: large-array copies, the other resource the engine
# consumes (plasma writes, shard concats, gathers). One shared memory system
# serves every core on this box, so its K-process ceiling is far lower than
# the CPU one — a data pipeline's honest machine ceiling sits BETWEEN the two,
# weighted by its bytes-moved : cpu-work ratio. On a real 4x cluster each
# node brings its own memory controllers; neither saturation exists.
WORK_MEM = r'''
import numpy as np, sys
n = int(sys.argv[1])
a = np.ones(8 * 1024 * 1024, dtype=np.int64)  # 64 MB
for i in range(n):
    b = a.copy()
    a[::4096] += 1
'''


def run(k: int, n: int, work: str = WORK) -> float:
    t0 = time.time()
    ps = [subprocess.Popen([sys.executable, "-c", work, str(n)]) for _ in range(k)]
    for p in ps:
        p.wait()
    return time.time() - t0


def main(n: int = 240_000, reps: int = 3, n_mem: int = 40) -> dict:
    out: dict = {}
    for k in (1, 2, 4, 8, 16, 32):
        out[f"wall_k{k}"] = round(min(run(k, n) for _ in range(reps)), 3)
    out["ceiling_8_32"] = round(out["wall_k8"] / out["wall_k32"], 3)
    out["ceiling_4_16"] = round(out["wall_k4"] / out["wall_k16"], 3)
    out["ceiling_2_8"] = round(out["wall_k2"] / out["wall_k8"], 3)
    for k in (4, 8, 16, 32):
        out[f"mem_wall_k{k}"] = round(
            min(run(k, n_mem, WORK_MEM) for _ in range(reps)), 3
        )
    out["mem_ceiling_8_32"] = round(out["mem_wall_k8"] / out["mem_wall_k32"], 3)
    out["mem_ceiling_4_16"] = round(out["mem_wall_k4"] / out["mem_wall_k16"], 3)
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
