"""Diagnostic: time each phase of one engine crawl round at a given
parallelism over a pre-generated fixture (DWS_SCALING_FIX layout).

Usage: taskset -c 0-7 python tools/profile_round.py 8 /dev/shm/dws-fix
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from distributed_webcrawler_spark import CrawlConfig, get_spark  # noqa: E402

from distributed_webcrawler_spark.plans.engine import CrawlEngine  # noqa: E402
from distributed_webcrawler_spark.sources.store import SnapshotStore  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    fix = sys.argv[2]
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    spark = get_spark(cpus=cpus, app_name=f"dws-profile-{cpus}", shuffle_partitions=64,
                      extra_conf={"spark.local.dir": tempfile.mkdtemp(dir=scratch, prefix="sl-"),
                                  "spark.driver.memory": f"{12 + 3 * cpus}g"})
    wg = spark.read.parquet(f"{fix}/web_graph")
    pay = spark.read.parquet(f"{fix}/payloads")
    rob = spark.read.parquet(f"{fix}/robots")
    seeds = spark.read.parquet(f"{fix}/seeds")
    cfg = CrawlConfig(max_depth=1, budget_per_host_per_round=1_000_000,
                      max_rounds=1, use_bloom=True,
                      bloom_expected_insertions=5_000_000, respect_robots=True,
                      fetch_join_strategy=os.environ.get("DWS_FETCH_JOIN", "shuffle"))
    wh = tempfile.mkdtemp(dir=scratch, prefix=f"dws-prof-{cpus}-")
    store = SnapshotStore(wh)
    eng = CrawlEngine(spark, store, cfg, wg, pay, rob)

    marks: list[tuple[str, float]] = []
    t = time.monotonic()

    def mark(name: str) -> None:
        nonlocal t
        now = time.monotonic()
        marks.append((name, now - t))
        t = now

    eng.start_session(seeds)
    mark("start_session (untimed bootstrap)")

    rnd = 1
    sched, n_sched = eng._schedule(eng.pending(), rnd)
    mark(f"schedule ({n_sched})")
    sched = sched.cache()
    eng._round_caches.append(sched)

    gated = eng._gate_robots(sched)
    blocked = gated.where(~F.col("robots_allowed"))
    allowed = gated.where(F.col("robots_allowed")).drop("robots_allowed")
    fetched = eng._fetch(allowed).cache()
    eng._round_caches.append(fetched)
    fetched.count()
    mark("fetch join (materialize cache)")

    pages = eng._decode_pages(fetched)
    blocked_pages = blocked.select(
        "session_id", "round", "sched_seq", "url", "url_hash", "host", "depth", "parent_url",
        F.lit(403).alias("status_code"), F.lit("Blocked by robots.txt").alias("error_message"),
        F.lit(None).cast("string").alias("image_id"), F.lit(None).cast("string").alias("caption"),
        F.lit(None).cast("binary").alias("bytes"), F.lit(None).cast("string").alias("fmt"),
        F.lit(None).cast("long").alias("content_length"), F.lit(None).cast("int").alias("decoded_w"),
        F.lit(None).cast("int").alias("decoded_h"), F.lit(None).cast("long").alias("phash"),
        F.lit(0).cast("long").alias("crawl_duration_ms"), F.lit(-1).alias("partition_id"))
    eng._t("pages").append(pages.unionByName(blocked_pages))
    mark("decode + pages append")

    new_rows = eng._expand(fetched, rnd).cache()
    eng._round_caches.append(new_rows)
    fsnap, n_new = eng._t("frontier").append_counted(
        new_rows.select(*eng._frontier_row_cols()), skip_empty=True)
    mark(f"expand + frontier append ({n_new})")
    eng.bloom.add_many(eng._t("frontier").read_column_local(fsnap, "url_hash"))
    mark("bloom add (pyarrow column read, driver)")

    progress = fetched.select(
        "session_id", "url", F.col("round"),
        F.when(F.col("web_status") == 200, "COMPLETED").otherwise("FAILED").alias("status"),
        (F.coalesce(F.col("web_status"), F.lit(0)) == 0).alias("retryable"),
        F.lit("driver").alias("assigned_to"),
    ).unionByName(blocked.select(
        "session_id", "url", F.col("round"),
        F.lit("FAILED").alias("status"), F.lit(False).alias("retryable"),
        F.lit("driver").alias("assigned_to")))
    eng._t("progress").append(progress)
    mark("progress append")
    eng._checkpoint(rnd)
    mark("checkpoint")

    total = sum(d for n, d in marks if "untimed" not in n)
    print(f"\n=== local[{cpus}] phase breakdown (timed total {total:.1f}s) ===")
    for n, d in marks:
        print(f"  {d:8.2f}s  {n}")


if __name__ == "__main__":
    main()
