#!/usr/bin/env python
"""Memory-bandwidth scaling probe for the scaling-gate analysis.

Measures aggregate throughput of a pure memory-streaming workload
(numpy copy of a buffer far larger than LLC) at N and 4N pinned
processes on this box. If this ratio is well under 4x, the box's
shared memory bandwidth — not job structure — caps any
bandwidth-bound Spark stage's 4->16 scaling the same way. Companion
evidence for BENCH/BASELINE.md; no Spark involved.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

BUF_MB = 256
ITERS = 40


def _worker(core: int, out):
    os.sched_setaffinity(0, {core})
    a = np.random.randint(0, 255, size=BUF_MB * 1024 * 1024, dtype=np.uint8)
    b = np.empty_like(a)
    t0 = time.monotonic()
    for _ in range(ITERS):
        np.copyto(b, a)
        a[0] ^= 1  # defeat any elision
    dt = time.monotonic() - t0
    out.put(BUF_MB * ITERS * 2 / dt)  # MB moved (r+w) per second


def run(n: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(i, q)) for i in range(n)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total


def main():
    r = {}
    for n in (4, 16):
        # warm + measure
        run(n)
        r[f"agg_MBps_{n}"] = round(run(n), 1)
    r["ratio_16_over_4"] = round(r["agg_MBps_16"] / r["agg_MBps_4"], 3)
    r["scaling_efficiency"] = round(r["ratio_16_over_4"] / 4, 3)
    print(json.dumps(r))


if __name__ == "__main__":
    main()
