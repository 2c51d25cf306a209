"""Round-4 verdict #6 A/B: does WIDTH-SCALING spark.sql.shuffle.partitions
(the way a real deployment sizes it) move the 8->32 crawl-round scaling
pair, versus the ladder's fixed cluster-constant 64?

Design mirrors tools/bench_shuffle_volume.py's rigor: identical fixture,
taskset-pinned fresh JVMs per level (bench_scaling._run_level), N warm
attempts interleaved A/B/A/B so host drift hits both arms equally,
best-of per arm. Two arms:

  fixed : shuffle.partitions = 64 at both widths (identical physical plan,
          the ladder's published configuration)
  scaled: shuffle.partitions = 4 x cores (32 at width 8, 128 at width 32 —
          >= 4 task waves per exchange at every width, straggler-amortized)

Prints one JSON line; does NOT touch BENCH.md (the ladder owns that).

Usage: python tools/bench_width_parts.py [n_urls] [n_seeds]
Env:   DWS_SCALING_FIX=<dir>  reuse fixture;  DWS_WP_ATTEMPTS=2
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench_scaling as BS  # noqa: E402


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 600_000
    attempts = int(os.environ.get("DWS_WP_ATTEMPTS", "2"))
    levels = [8, 32]
    keep_fix = os.environ.get("DWS_SCALING_FIX")
    fix = keep_fix or tempfile.mkdtemp(prefix="dws-wp-fix-", dir=BS.SCRATCH)
    try:
        if not os.path.exists(f"{fix}/web_graph"):
            BS._gen_fixture(fix, n_urls, n_seeds, 50_000)
        arms = {"fixed": "64", "scaled": "4xcores"}
        walls: dict = {a: {lv: [] for lv in levels} for a in arms}
        detail: dict = {a: {} for a in arms}
        for _ in range(attempts):
            for lv in levels:
                for arm, sp in arms.items():      # interleaved A/B
                    os.environ["DWS_SHUFFLE_PARTS"] = sp
                    r = BS._run_level(lv, fix, 1)
                    walls[arm][lv].append(round(r["wall"], 2))
                    detail[arm][lv] = {"shuffle_parts": r["shuffle_parts"],
                                       "stage_secs": r["stage_secs"],
                                       "fetched": r["fetched"]}
        os.environ.pop("DWS_SHUFFLE_PARTS", None)
        out = {"bench": "width_scaled_shuffle_parts", "n_urls": n_urls,
               "seed_frontier": n_seeds, "attempts": attempts,
               "walls": walls, "detail": detail}
        for arm in arms:
            b8, b32 = min(walls[arm][8]), min(walls[arm][32])
            out[f"eff_8_32_{arm}"] = round((b8 / b32) / 4.0, 3)
        print(json.dumps(out))
    finally:
        if not keep_fix:
            shutil.rmtree(fix, ignore_errors=True)


if __name__ == "__main__":
    main()
