"""Memory-bandwidth probe: per-task memcpy time vs parallel width.

Pure userspace, no JVM/Spark/locks: N processes each repeatedly
np.copyto() a 128MB buffer while pinned to cores 0..N-1. If per-task
time inflates with width, the shared resource is DRAM bandwidth (the
copy is cache-defeating by size); cpuprobe's cache-resident int loop
cannot see this term.

Why it exists: diag_round showed IDENTICAL Spark stages costing 5-10x
more task-CPU at width 16 than at width 4 — but only the shuffle/
exchange-heavy (memory-streaming) stages; compute-dense stages inflated
1.2-1.5x. This probe separates "our code stops scaling" from "the
hypervisor's DRAM slice shrank": measured here, the same width-16 probe
swings between 1.2x and 23x inflation within minutes depending on host
neighbors (see BENCH.md). On a real 4N-executor cluster each node brings
its own DRAM, so this term multiplies WITH the cores.

Usage: python tools/bwprobe.py [widths...]   (default 4 16 32)
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

import numpy as np

MB = 1024 * 1024


def _task(q: mp.Queue, reps: int) -> None:
    a = np.random.randint(0, 255, 128 * MB, dtype=np.uint8)
    b = np.empty_like(a)
    t0 = time.monotonic()
    for _ in range(reps):
        np.copyto(b, a)
    q.put(time.monotonic() - t0)


def run(width: int, reps: int = 24) -> float:
    """Avg per-task seconds for reps x 128MB copies at this width."""
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_task, args=(q, reps)) for _ in range(width)]
    for p in ps:
        p.start()
    ts = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(ts) / len(ts)


def main() -> None:
    widths = [int(w) for w in sys.argv[1:]] or [4, 16, 32]
    base = None
    for w in widths:
        os.sched_setaffinity(0, set(range(w)))
        t = run(w)
        base = base if base is not None else t
        print(f"width {w:3d}: avg task {t:.3f}s  inflation {t / base:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
