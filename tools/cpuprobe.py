"""Host silicon probe: how much does per-task CPU inflate as concurrency
widens on THIS box? Pure-userspace spinners (no JVM, no Spark, no disk):

- int: cache-resident integer math — isolates clock/steal effects,
- zlib: 1MB compress+decompress loops — adds memory-bandwidth pressure
  (the decode stage's dominant primitive).

If avg task time at width 32 > width 8 for identical per-task work, the
HOST delivers less than 32 cores' worth of silicon under full load
(hypervisor steal / shared memory bus) — that inflation is the floor any
single-box N-vs-4N scaling measurement sits on, and a real 4N-node
cluster (whose buses and hypervisor slots scale WITH N) does not pay it.

Usage: python tools/cpuprobe.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time
import zlib


def _spin_int(q, iters):
    t0 = time.monotonic()
    x = 1469598103934665603
    for _ in range(iters):
        x = (x * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 33
    q.put(time.monotonic() - t0)


def _spin_zlib(q, iters):
    import numpy as np

    buf = np.random.default_rng(1).integers(0, 64, 1_000_000, dtype=np.uint8).tobytes()
    t0 = time.monotonic()
    for _ in range(iters):
        zlib.decompress(zlib.compress(buf, 1))
    q.put(time.monotonic() - t0)


def _run(width, fn, iters):
    q = mp.Queue()
    ps = [mp.Process(target=fn, args=(q, iters)) for _ in range(width)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    times = [q.get() for _ in ps]
    return sum(times) / len(times)


def probe(widths=(8, 16, 32)) -> dict:
    out: dict = {}
    for name, fn, iters in (("int", _spin_int, 3_000_000), ("zlib", _spin_zlib, 50)):
        per = {w: round(_run(w, fn, iters), 3) for w in widths}
        lo = min(widths)
        out[name] = {"avg_task_s": per,
                     "inflation": {w: round(per[w] / per[lo], 3) for w in widths}}
    return out


if __name__ == "__main__":
    import sys

    ws = (tuple(int(x) for x in sys.argv[1].split(","))
          if len(sys.argv) > 1 else (8, 16, 32))
    print(json.dumps(probe(ws)))
