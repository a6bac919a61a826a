#!/usr/bin/env python3
"""Host-health probe for bench windows (VERDICT r18 ask #1).

The committed r18 recipe (single-thread 20M-add microbench + load
average) is provably insufficient: the r18 idle rerun read a healthy
single-thread probe (1.39-1.83 s) and load 0.16, yet the bench window
was the WORST of the round (66.6 s). The bench is a 32-thread
workload; only multi-thread throughput predicts it. This probe runs

  1. the legacy single-thread microbench (3 reps, for continuity with
     the r13-r18 stamps), and
  2. a 32-process parallel version of the SAME loop — every core busy
     at once, wall-clocked together.

On a healthy dedicated 32-core host the parallel wall time tracks the
single-thread time (each process has its own core). A degraded window
(hypervisor neighbors, thermal caps, stolen time) inflates the
parallel wall while the single-thread probe can stay flat — exactly
the r18 failure mode. Emits one JSON line; callers compare mt_wall
against the committed healthy reference in PERF_NOTES.

Driver-side tooling only (not a library dep).
"""
import json
import multiprocessing as mp
import os
import sys
import time

N = 20_000_000


def burn(_):
    s = 0
    for i in range(N):
        s += i
    return s


def main(threads=32):
    single = []
    for _ in range(3):
        t0 = time.time()
        burn(None)
        single.append(round(time.time() - t0, 2))
    t0 = time.time()
    with mp.Pool(threads) as pool:
        pool.map(burn, range(threads), chunksize=1)
    mt_wall = round(time.time() - t0, 2)
    la1, la5, _ = os.getloadavg()
    out = {
        "probe": "host_health",
        "single_sec": single,
        "mt_threads": threads,
        "mt_wall_sec": mt_wall,
        # per-core slowdown vs the single-thread baseline. This host is
        # 32 physical cores / no SMT, so >1 comes from all-core turbo
        # droop + hypervisor contention; the healthy reference band is
        # stamped empirically in PERF_NOTES (r19), not assumed
        "mt_ratio": round(mt_wall / min(single), 2),
        "load_1m": round(la1, 2),
        "load_5m": round(la5, 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 32))
