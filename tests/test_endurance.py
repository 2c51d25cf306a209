"""Long-crawl endurance (round-2 verdict #5): the compaction design claims
FLAT per-round cost as crawl age grows — prove it over a 40-round crawl,
and prove exact resume deep into a long crawl (kill after round 25 with a
torn round on disk -> resume -> byte-identical to uninterrupted)."""

from __future__ import annotations

import shutil
import statistics
import tempfile

import pytest
from pyspark.sql import functions as F

from distributed_webcrawler_spark import CrawlConfig
from distributed_webcrawler_spark.plans.engine import CrawlEngine
from distributed_webcrawler_spark.sources.store import SnapshotStore


@pytest.fixture(scope="module")
def long_fixture(spark):
    from distributed_webcrawler_spark.sources import datagen

    tmp = tempfile.mkdtemp(prefix="dws-endure-")
    # enough URLs that a budget-1 crawl stays busy for 40+ rounds
    datagen.write_fixture(spark, tmp, n_urls=3000, n_hosts=10, n_images=60,
                          n_seeds=20, max_out_degree=12)
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def _cfg(**kw):
    base = dict(max_depth=3, budget_per_host_per_round=1, max_rounds=40,
                use_bloom=True, bloom_expected_insertions=20_000,
                respect_robots=False)
    base.update(kw)
    return CrawlConfig(**base)


def _tables(spark, store):
    key_cols = {
        "frontier": ["url", "depth", "priority", "discovered_round", "parent_url"],
        "pages": ["round", "sched_seq", "url", "status_code", "content_length", "phash"],
        "progress": ["round", "url", "status"],
    }
    return {t: store.table(t).read(spark).select(*c).orderBy(*c).collect()
            for t, c in key_cols.items()}


def test_forty_round_crawl_flat_cost_and_deep_resume(spark, long_fixture):
    wg = spark.read.parquet(f"{long_fixture}/web_graph")
    pay = spark.read.parquet(f"{long_fixture}/payloads")
    seeds = spark.read.parquet(f"{long_fixture}/seeds")

    wh_a = tempfile.mkdtemp(prefix="dws-end-a-")
    wh_b = tempfile.mkdtemp(prefix="dws-end-b-")
    try:
        store_a = SnapshotStore(wh_a)
        hist = CrawlEngine(spark, store_a, _cfg(), wg, pay, None).run(seeds=seeds)
        assert len(hist) >= 40, f"crawl drained early at round {len(hist)}"

        # flat per-round cost: the crawl's later rounds must not cost a
        # multiple of its early rounds (catches any re-aggregation of the
        # growing progress log / frontier creeping back in). Medians over
        # 10-round windows, round 1 (JVM warm-up) excluded; the 2.5x bound
        # is generous for sandbox noise while still failing a linear blowup.
        walls = [h["wall_secs"] for h in hist]
        early = statistics.median(walls[1:11])
        late = statistics.median(walls[-10:])
        assert late <= 2.5 * early, (early, late, walls)

        # deep kill -> torn round -> resume: byte-identical at round 40
        store_b = SnapshotStore(wh_b)
        CrawlEngine(spark, store_b, _cfg(max_rounds=25), wg, pay, None).run(seeds=seeds)
        torn = (store_b.table("frontier").read(spark).limit(2)
                .withColumn("url", F.concat(F.lit("https://torn.example.test/"),
                                            F.col("url_hash"))))
        store_b.table("frontier").append(torn)  # crash mid-commit
        CrawlEngine(spark, SnapshotStore(wh_b), _cfg(), wg, pay, None).resume()

        a, b = _tables(spark, store_a), _tables(spark, SnapshotStore(wh_b))
        for t in a:
            assert a[t] == b[t], t
    finally:
        shutil.rmtree(wh_a, ignore_errors=True)
        shutil.rmtree(wh_b, ignore_errors=True)
