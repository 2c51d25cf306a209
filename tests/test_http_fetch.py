"""Live HTTP fetch mode (S5/C1/S6 — BasicCrawler.java:77-81, 148-172,
203-217): the engine crawls a REAL http server (the fixture served as HTML
pages + robots.txt) and must produce output identical to join mode on the
same graph — pages, frontier, progress; plus unit coverage of the anchor
parser and the robots error->allow-all path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_webcrawler_spark import CrawlConfig
from distributed_webcrawler_spark.plans.engine import CrawlEngine
from distributed_webcrawler_spark.sources.httpfetch import fetch_batch, parse_page
from distributed_webcrawler_spark.sources.store import SnapshotStore

from http_fixture import FixtureServer, graph_from_parquet, robots_from_parquet


def test_parse_page_anchor_order_and_image():
    html = ('<html><body><img src="/img/img-00000042"/>'
            '<a href="https://a.com/x">1</a><a name="no-href">n</a>'
            '<a href="p/2#frag">2</a><a href="/r/3">3</a></body></html>')
    hrefs, image_id = parse_page(html)
    assert hrefs == ["https://a.com/x", "p/2#frag", "/r/3"]   # document order
    assert image_id == "img-00000042"


def test_fetch_batch_status_mapping(spark, fixture_dir):
    graph = graph_from_parquet(spark, fixture_dir)
    ok = next(u for u, (s, _, _) in graph.items() if s == 200)
    err404 = next((u for u, (s, _, _) in graph.items() if s == 404), None)
    dead = next((u for u, (s, _, _) in graph.items() if s == 0), None)
    with FixtureServer(graph) as srv:
        urls = [ok, "https://host0.example.test/missing/url"]
        if err404:
            urls.append(err404)
        if dead:
            urls.append(dead)
        res = fetch_batch(urls, srv.base, timeout=5)
    assert res[0][0] == 200 and res[0][1] is not None
    assert res[1][0] == 0 and res[1][1] is None          # not in graph -> closed
    if err404:
        assert res[2][0] == 404
    if dead:
        assert res[-1][0] == 0                            # status-0 row -> closed


@pytest.mark.parametrize("respect_robots", [False, True])
def test_live_fetch_matches_join_mode(spark, fixture_dir, warehouse, tmp_path,
                                      respect_robots):
    """The whole crawl — scheduling, robots, fetch, link extraction,
    expansion, dedup — run over HTTP must equal the join-mode crawl on the
    same web graph: identical pages rows, frontier (seen set), and
    progress. partition_id (physical lineage) is excluded: the two modes
    parallelize differently by design."""
    graph = graph_from_parquet(spark, fixture_dir)
    robots = robots_from_parquet(spark, fixture_dir) if respect_robots else {}
    wg = spark.read.parquet(f"{fixture_dir}/web_graph")
    pay = spark.read.parquet(f"{fixture_dir}/payloads")
    rob = spark.read.parquet(f"{fixture_dir}/robots") if respect_robots else None
    seeds = spark.read.parquet(f"{fixture_dir}/seeds")

    def run(cfg, wh, robots_df):
        store = SnapshotStore(wh)
        eng = CrawlEngine(spark, store, cfg, wg, pay, robots_df)
        eng.start_session(seeds)
        eng.run()
        return store

    base = dict(max_depth=2, budget_per_host_per_round=4, max_rounds=3,
                use_bloom=False, respect_robots=respect_robots)
    st_join = run(CrawlConfig(**base), str(tmp_path / "wh-join"), rob)

    with FixtureServer(graph, robots) as srv:
        cfg_http = CrawlConfig(**base, fetch_mode="http",
                               http_rewrite_base=srv.base)
        # http mode fetches robots itself -> robots_df None
        st_http = run(cfg_http, str(tmp_path / "wh-http"), None)

    def rows(store, table, drop=("partition_id",)):
        df = store.table(table).read(spark)
        cols = [c for c in df.columns if c not in drop]
        return sorted(tuple(r) for r in df.select(*cols).collect())

    assert rows(st_join, "pages") == rows(st_http, "pages")
    assert rows(st_join, "frontier") == rows(st_http, "frontier")
    assert rows(st_join, "progress") == rows(st_http, "progress")


def test_robots_fetch_error_allows_all(spark, fixture_dir, warehouse):
    """Unfetchable robots.txt (server down) -> allow-all, never a crash
    (BasicCrawler.java:211-216)."""
    wg = spark.read.parquet(f"{fixture_dir}/web_graph")
    pay = spark.read.parquet(f"{fixture_dir}/payloads")
    seeds = spark.read.parquet(f"{fixture_dir}/seeds")
    cfg = CrawlConfig(max_depth=0, budget_per_host_per_round=100, max_rounds=1,
                      use_bloom=False, respect_robots=True, fetch_mode="http",
                      http_rewrite_base="http://127.0.0.1:9")  # nothing listens
    store = SnapshotStore(warehouse)
    eng = CrawlEngine(spark, store, cfg, wg, pay, None)
    eng.start_session(seeds)
    eng.run()
    pages = store.table("pages").read(spark)
    # robots could not be fetched -> nothing robots-blocked; fetches
    # themselves also fail (status 0) since the server is down
    assert pages.where(F.col("status_code") == 403).count() == 0
    assert pages.count() > 0


def test_robots_fetched_once_per_host_and_no_driver_state(spark, fixture_dir, tmp_path):
    """Across-round robots caching is the durable `robots_http` table, not
    an unbounded driver dict (round-2 verdict #4): a multi-round live
    crawl GETs each host's robots.txt EXACTLY once (the table anti-join
    makes every later round skip it), the engine object holds no per-host
    robots attribute, and the table carries one row per fetched host —
    including allow-all hosts (empty rule lists), which is what prevents
    refetching them."""
    graph = graph_from_parquet(spark, fixture_dir)
    robots = robots_from_parquet(spark, fixture_dir)
    wg = spark.read.parquet(f"{fixture_dir}/web_graph")
    pay = spark.read.parquet(f"{fixture_dir}/payloads")
    seeds = spark.read.parquet(f"{fixture_dir}/seeds")
    store = SnapshotStore(str(tmp_path / "wh"))
    with FixtureServer(graph, robots) as srv:
        cfg = CrawlConfig(max_depth=2, budget_per_host_per_round=2, max_rounds=4,
                          use_bloom=False, respect_robots=True,
                          fetch_mode="http", http_rewrite_base=srv.base)
        eng = CrawlEngine(spark, store, cfg, wg, pay, None)
        eng.start_session(seeds)
        hist = eng.run()
        hits = dict(srv.robots_hits)
    assert len(hist) >= 3, "want a multi-round crawl"
    assert hits and all(n == 1 for n in hits.values()), hits
    assert not any("robots" in a and isinstance(getattr(eng, a), dict) and a != "__dict__"
                   for a in vars(eng) if a.startswith("_robots")), "driver robots dict is back"
    tbl = store.table("robots_http").read(spark)
    fetched_hosts = {r.host for r in tbl.select("host").collect()}
    assert fetched_hosts == set(hits)
    assert tbl.groupBy("host").count().where("count > 1").count() == 0


def test_robots_transient_failure_refetched_after_ttl(spark, fixture_dir, tmp_path):
    """A TRANSIENT robots.txt failure (503) is allow-all only for
    ``robots_error_ttl_rounds`` rounds, then the host is re-fetched and
    the real rules apply (round-4 advice: a one-time blip must not freeze
    a host as allow-all for the warehouse's lifetime). Definitive answers
    are still fetched exactly once."""
    graph = graph_from_parquet(spark, fixture_dir)
    robots = robots_from_parquet(spark, fixture_dir)
    wg = spark.read.parquet(f"{fixture_dir}/web_graph")
    pay = spark.read.parquet(f"{fixture_dir}/payloads")
    seeds = spark.read.parquet(f"{fixture_dir}/seeds")
    seed_hosts = sorted({r.url.split("/")[2]
                         for r in seeds.select("url").collect()})
    bad_host = seed_hosts[0]   # scheduled from round 0 and recurs
    with FixtureServer(graph, robots, robots_fail_first={bad_host: 1}) as srv:
        cfg = CrawlConfig(max_depth=3, budget_per_host_per_round=2,
                          max_rounds=6, use_bloom=False, respect_robots=True,
                          fetch_mode="http", http_rewrite_base=srv.base,
                          robots_error_ttl_rounds=2)
        store = SnapshotStore(str(tmp_path / "wh"))
        eng = CrawlEngine(spark, store, cfg, wg, pay, None)
        eng.start_session(seeds)
        hist = eng.run()
        hits = dict(srv.robots_hits)
    assert len(hist) >= 4, "want enough rounds to cross the TTL"
    # failed host: one 503 + exactly one successful refetch (definitive
    # after that); every other host fetched once
    assert hits[bad_host] == 2, hits
    assert all(n == 1 for h, n in hits.items() if h != bad_host), hits
    tbl = store.table("robots_http").read(spark)
    rows_bad = sorted(tbl.where(F.col("host") == bad_host).collect(),
                      key=lambda r: r.fetched_round)
    assert len(rows_bad) == 2
    assert rows_bad[0].ok is False
    assert rows_bad[1].ok is True
    # the refetch waited out the TTL, not a round sooner
    assert (rows_bad[1].fetched_round - rows_bad[0].fetched_round
            >= cfg.robots_error_ttl_rounds)
    # latest-wins: every OTHER fetched host has exactly one definitive row
    assert (tbl.where(F.col("host") != bad_host)
               .groupBy("host").count().where("count > 1").count() == 0)
