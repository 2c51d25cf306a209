"""Engine-vs-oracle parity: crawl ordering, URL-seen set, and per-row
payload fidelity (PSNR >= 40 dB for lossy, exact captions) — the
north_rule/BASELINE.json correctness gates."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_webcrawler_spark import CrawlConfig
from distributed_webcrawler_spark.plans.engine import CrawlEngine
from distributed_webcrawler_spark.sources import codec
from distributed_webcrawler_spark.sources.store import SnapshotStore
from tests.oracle.reference_sim import load_fixture_inputs, simulate


def _run_engine(spark, fixture_dir, warehouse, cfg):
    wg = spark.read.parquet(f"{fixture_dir}/web_graph")
    pay = spark.read.parquet(f"{fixture_dir}/payloads")
    rob = spark.read.parquet(f"{fixture_dir}/robots")
    seeds = spark.read.parquet(f"{fixture_dir}/seeds")
    store = SnapshotStore(warehouse)
    eng = CrawlEngine(spark, store, cfg, wg, pay, rob)
    eng.run(seeds=seeds)
    return store


def _engine_order(spark, store):
    pages = store.table("pages").read(spark)
    rows = pages.select("round", "sched_seq", "url", "status_code") \
                .orderBy("round", "sched_seq").collect()
    return [(r.round, r.sched_seq, r.url, r.status_code) for r in rows]


def _configs():
    return [
        CrawlConfig(max_depth=2, budget_per_host_per_round=3, max_rounds=8,
                    use_bloom=True, bloom_expected_insertions=10_000,
                    reference_compat=False),
        CrawlConfig(max_depth=2, batch_size=12, max_rounds=8,
                    use_bloom=False, reference_compat=True),
        CrawlConfig(max_depth=1, budget_per_host_per_round=5, max_rounds=6,
                    use_bloom=False, respect_robots=False, max_pages=25,
                    reference_compat=False),
    ]


@pytest.mark.parametrize("cfg", _configs(),
                         ids=["clean-bloom", "reference-compat", "no-robots-maxpages"])
def test_crawl_order_and_seen_parity(spark, fixture_dir, warehouse, cfg):
    store = _run_engine(spark, fixture_dir, warehouse, cfg)
    web_graph, robots, captions, seeds = load_fixture_inputs(fixture_dir)
    sim = simulate(web_graph, robots, captions, seeds, cfg)

    # 1. exact crawl ordering parity (round, seq, url, status)
    assert _engine_order(spark, store) == sim.crawl_order

    # 2. exact URL-seen set parity (enqueue-time semantics)
    eng_seen = {r.url for r in store.table("frontier").read(spark).select("url").collect()}
    assert eng_seen == sim.seen

    # 3. per-row caption equality + image_id
    pages = store.table("pages").read(spark) \
        .select("url", "status_code", "image_id", "caption").collect()
    for r in pages:
        status, image_id, caption = sim.pages[r.url]
        assert r.status_code == status
        if status == 200:
            assert r.image_id == image_id
            assert r.caption == caption


def test_payload_pixel_fidelity(spark, fixture_dir, warehouse):
    """Decoded-pixel invariant: engine-stored bytes decode to the original
    synthetic pixels exactly (png) or with PSNR >= 40 dB (jpeg/webp)."""
    cfg = CrawlConfig(max_depth=2, budget_per_host_per_round=4, max_rounds=4,
                      use_bloom=False, reference_compat=False)
    store = _run_engine(spark, fixture_dir, warehouse, cfg)
    pay = {r.image_id: (r.w, r.h, r.fmt)
           for r in spark.read.parquet(f"{fixture_dir}/payloads")
           .select("image_id", "w", "h", "fmt").collect()}
    rows = store.table("pages").read(spark) \
        .where(F.col("bytes").isNotNull()) \
        .select("image_id", "bytes", "fmt", "decoded_w", "decoded_h").collect()
    assert rows, "no fetched payloads"
    for r in rows:
        w, h, fmt = pay[r.image_id]
        original = codec.synth_pixels(r.image_id, w, h)
        decoded, dfmt = codec.decode_image(bytes(r.bytes))
        assert dfmt == fmt == r.fmt
        assert (r.decoded_w, r.decoded_h) == (w, h)
        p = codec.psnr(original, decoded)
        if fmt == "png":
            assert np.array_equal(original, decoded)
        else:
            assert p >= 40.0, (r.image_id, fmt, p)
