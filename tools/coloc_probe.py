"""Co-location penalty provenance probe.

The executor-proxy scaling bench pays a T_4N/T_iso penalty when 4 pinned
8-core JVMs share one box. This probe attributes it: two synthetic kernels
run under the IDENTICAL pinning scheme (one 8-core group alone, then four
disjoint 8-core groups concurrently):

  * cpu    — register/L1-resident arithmetic (no DRAM pressure): a real
             cluster AND a shared box should both scale this at ~1.0.
  * stream — large-array adds (arrays >> LLC, STREAM-like): saturates the
             shared memory controller; a penalty here is DRAM bandwidth,
             which four separate cluster nodes would not share.

If cpu ~1.0 and stream >> 1.0, the pipeline's co-location penalty is
hardware sharing (memory subsystem), not a plan property — the
isolated-node efficiency is then the cluster-realistic number.

Output: one JSON line with per-kernel alone/concurrent rates and penalty.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

DURATION = float(os.environ.get("COLOC_SECONDS", "10"))

_WORKER = r"""
import multiprocessing as mp
import os, sys, time
kind, lo, hi, dur = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), float(sys.argv[4])

def kernel(cpu, q):
    os.sched_setaffinity(0, {cpu})
    import numpy as np
    if kind == "stream":
        a = np.zeros(32 * 1024 * 1024 // 8)  # 32 MB >> LLC slice
        b = np.ones_like(a)
    else:
        a = np.zeros(2048)  # 16 KB: L1-resident
        b = np.ones_like(a)
    t0 = time.time()
    n = 0
    while time.time() - t0 < dur:
        a += b  # one pass; stream: 3*32MB of DRAM traffic, cpu: none
        n += 1
    q.put(n * a.nbytes)

q = mp.Queue()
procs = [mp.Process(target=kernel, args=(c, q)) for c in range(lo, hi)]
for p in procs: p.start()
total = sum(q.get() for _ in procs)
for p in procs: p.join()
print(total / dur)  # bytes touched per second across the group
"""


def _group(kind: str, lo: int, hi: int) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-c", _WORKER, kind, str(lo), str(hi), str(DURATION)],
        stdout=subprocess.PIPE, text=True,
    )


def _rate(p: subprocess.Popen) -> float:
    out, _ = p.communicate()
    return float(out.strip().splitlines()[-1])


def main() -> None:
    out: dict = {"duration_sec": DURATION}
    for kind in ("cpu", "stream"):
        alone = _rate(_group(kind, 0, 8))
        groups = [_group(kind, g * 8, g * 8 + 8) for g in range(4)]
        rates = [_rate(p) for p in groups]
        out[kind] = {
            "alone_gbps": round(alone / 1e9, 2),
            "concurrent_gbps_each": [round(r / 1e9, 2) for r in rates],
            "penalty": round(alone / min(rates), 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
