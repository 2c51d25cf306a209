"""Exact checkpoint resume: a run interrupted after round r (with a torn,
uncommitted round on disk) resumes to final tables identical to an
uninterrupted run (SURVEY.md §5.2 test 5)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from distributed_webcrawler_spark import CrawlConfig
from distributed_webcrawler_spark.plans.engine import CrawlEngine
from distributed_webcrawler_spark.sources.store import SnapshotStore


def _collect_sorted(spark, store, table, cols):
    df = store.table(table).read(spark)
    return df.select(*cols).orderBy(*cols).collect()


def test_resume_equals_uninterrupted(spark, fixture_dir):
    cfg = CrawlConfig(max_depth=2, budget_per_host_per_round=3, max_rounds=8,
                      use_bloom=True, bloom_expected_insertions=10_000)
    wg = spark.read.parquet(f"{fixture_dir}/web_graph")
    pay = spark.read.parquet(f"{fixture_dir}/payloads")
    rob = spark.read.parquet(f"{fixture_dir}/robots")
    seeds = spark.read.parquet(f"{fixture_dir}/seeds")

    wh_a = tempfile.mkdtemp(prefix="dws-a-")
    wh_b = tempfile.mkdtemp(prefix="dws-b-")
    try:
        # uninterrupted run
        store_a = SnapshotStore(wh_a)
        CrawlEngine(spark, store_a, cfg, wg, pay, rob).run(seeds=seeds)

        # interrupted run: 2 rounds, then a TORN round (append without
        # checkpoint), then resume from a fresh engine instance
        cfg2 = CrawlConfig(**{**cfg.__dict__, "max_rounds": 2})
        store_b = SnapshotStore(wh_b)
        CrawlEngine(spark, store_b, cfg2, wg, pay, rob).run(seeds=seeds)
        torn = store_b.table("frontier").read(spark).limit(3) \
            .withColumn("url", F.concat(F.lit("https://torn.example.test/x/"), F.col("url_hash")))
        store_b.table("frontier").append(torn)  # simulated crash mid-commit

        eng_b2 = CrawlEngine(spark, SnapshotStore(wh_b), cfg, wg, pay, rob)
        eng_b2.resume()

        key_cols = {
            "frontier": ["url", "depth", "priority", "discovered_round", "parent_url"],
            "pages": ["round", "sched_seq", "url", "status_code", "content_length", "phash"],
            "progress": ["round", "url", "status"],
        }
        store_b_final = SnapshotStore(wh_b)
        for table, cols in key_cols.items():
            assert _collect_sorted(spark, store_a, table, cols) == \
                   _collect_sorted(spark, store_b_final, table, cols), table
    finally:
        shutil.rmtree(wh_a, ignore_errors=True)
        shutil.rmtree(wh_b, ignore_errors=True)
