"""Controlled experiment for the 4->16 scaling residual (round-2 verdict
#1): is SHUFFLE BYTE VOLUME the binding constraint at width 16?

Reproduces the drain round's dominant exchange — the shuffle-hash fetch
join of a frontier-sized scheduled set against web_graph — standalone, at
two widths (taskset-pinned fresh JVMs, same methodology as
bench_scaling.py), in two byte-volume variants over IDENTICAL rows:

  slim: the real round's join columns
  wide: + a 192-byte padding column carried through BOTH sides' exchanges
        and consumed after the join (sum(length) — so pruning can't drop
        it); roughly triples shuffled bytes per row

Interpretation: if wide/slim wall ratios are similar at width 4 and 16,
byte volume is not what breaks the 4->16 pair — the residual is the box
(one memory bus / hypervisor), because tripling the bytes would otherwise
hurt the saturated level far more. If wide inflates strongly at 16 only,
bytes bind -> slim the round's shuffled columns.

Usage: python tools/bench_shuffle_volume.py <fixture_dir> [widths] [attempts]
       (fixture from bench_scaling, e.g. /dev/shm/dws-scalefix-r3)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()

RUNNER = r"""
import json, sys, time, tempfile
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from distributed_webcrawler_spark import get_spark

cpus = int(sys.argv[1]); fix = sys.argv[2]; scratch = sys.argv[3]
mem_gb = min(12 + 3 * cpus, 64)
spark = get_spark(cpus=cpus, app_name=f"dws-shufvol-{{cpus}}", shuffle_partitions=64,
                  extra_conf={{"spark.local.dir": tempfile.mkdtemp(dir=scratch, prefix="sparklocal-"),
                               "spark.driver.memory": f"{{mem_gb}}g",
                               "spark.driver.extraJavaOptions":
                                   f"-XX:+UseG1GC -Xms{{mem_gb}}g -XX:+AlwaysPreTouch"}})
wg = spark.read.parquet(f"{{fix}}/web_graph")
seeds = spark.read.parquet(f"{{fix}}/seeds")
sched = seeds.select(F.col("url"))
pad = F.expr("repeat('x', 192)")

def slim():
    j = sched.join(wg.hint("shuffle_hash"), "url", "left")
    return j.agg(F.count("*"), F.sum(F.size("out_links"))).collect()

def wide():
    s = sched.withColumn("padA", pad)
    w = wg.withColumn("padB", pad)
    j = s.join(w.hint("shuffle_hash"), "url", "left")
    return j.agg(F.count("*"), F.sum(F.size("out_links")),
                 F.sum(F.length("padA") + F.length("padB"))).collect()

slim(); wide()   # untimed warm-up: codegen + workers + page cache
walls = {{}}
for _ in range(2):
    for name, fn in (("slim", slim), ("wide", wide)):
        t0 = time.monotonic(); fn(); w = time.monotonic() - t0
        walls[name] = min(walls.get(name, 1e9), w)
print("RESULT " + json.dumps({{"cpus": cpus, **{{k: round(v, 2) for k, v in walls.items()}}}}))
"""


def run_level(cpus: int, fix: str) -> dict:
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c",
           RUNNER.format(repo=REPO), str(cpus), fix, SCRATCH]
    p = subprocess.run(cmd, capture_output=True, text=True, check=True)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(p.stdout[-1500:] + p.stderr[-1500:])


def main() -> None:
    fix = sys.argv[1]
    widths = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "4,16").split(",")]
    out = {}
    for w in widths:
        r = run_level(w, fix)
        r["wide_over_slim"] = round(r["wide"] / r["slim"], 3)
        out[w] = r
        print(f"width {w}: {r}", flush=True)
    print(json.dumps({"bench": "shuffle_volume_ab", "levels": out}))


if __name__ == "__main__":
    main()
