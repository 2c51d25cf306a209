"""spark-submit entry point for the crawl engine (north_rule: "runs via
spark-submit --py-files on multi-executor clusters").

Cluster usage:
    zip -r dws.zip distributed_webcrawler_spark
    spark-submit --py-files dws.zip tools/submit_crawl.py \
        --fixture /data/fixture --warehouse /data/warehouse \
        --max-depth 2 --budget 16 --rounds 50 [--resume] [--compat]

Local sandbox usage (single JVM):
    python tools/submit_crawl.py --fixture ... --warehouse ... --local 32

The script only wires config + I/O; all engine logic lives in the package
so --py-files distribution is sufficient (pure-Python, no native deps
beyond numpy/pandas/pyarrow which ship on executors).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", required=True, help="dir with web_graph/payloads/robots/seeds parquet")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--session-id", default="session-0")
    ap.add_argument("--max-depth", type=int, default=2)
    ap.add_argument("--budget", type=int, default=16, help="per-host fetches per round")
    ap.add_argument("--rounds", type=int, default=50)
    ap.add_argument("--max-pages", type=int, default=None)
    ap.add_argument("--max-retries", type=int, default=0)
    ap.add_argument("--no-robots", action="store_true")
    ap.add_argument("--no-bloom", action="store_true")
    ap.add_argument("--compat", action="store_true", help="reference_compat parity mode")
    ap.add_argument("--resume", action="store_true", help="resume from last checkpoint")
    ap.add_argument("--local", default=None, help="run on local[N] instead of an existing session")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from distributed_webcrawler_spark import CrawlConfig, get_spark
    from distributed_webcrawler_spark.plans.engine import CrawlEngine
    from distributed_webcrawler_spark.sources.store import SnapshotStore

    if args.local:
        spark = get_spark(cpus=args.local, app_name="dws-crawl")
    else:
        # under spark-submit the session/master comes from the submit command
        spark = SparkSession.builder.appName("dws-crawl").getOrCreate()

    cfg = CrawlConfig(
        session_id=args.session_id, max_depth=args.max_depth,
        budget_per_host_per_round=args.budget, max_rounds=args.rounds,
        max_pages=args.max_pages, max_retries=args.max_retries,
        respect_robots=not args.no_robots, use_bloom=not args.no_bloom,
        reference_compat=args.compat,
    )
    wg = spark.read.parquet(f"{args.fixture}/web_graph")
    pay = spark.read.parquet(f"{args.fixture}/payloads")
    robots = None
    if cfg.respect_robots and os.path.exists(f"{args.fixture}/robots"):
        robots = spark.read.parquet(f"{args.fixture}/robots")
    store = SnapshotStore(args.warehouse)
    eng = CrawlEngine(spark, store, cfg, wg, pay, robots)

    if args.resume:
        history = eng.resume()
    else:
        seeds = spark.read.parquet(f"{args.fixture}/seeds")
        history = eng.run(seeds=seeds)
    for h in history:
        print(json.dumps(h))


if __name__ == "__main__":
    main()
