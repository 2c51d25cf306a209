"""Deterministic single-threaded simulator of the reference crawler's
frontier semantics (SURVEY.md §5.2) — the ORACLE the Spark engine is
tested against.

Faithful to the cited reference behaviors:
- enqueue-time, first-wins URL-seen dedup (URLFrontier.java:67-74),
- ZREVRANGE priority dequeue with deterministic tie-break
  (CrawlUrlRepository.java:35 + SURVEY §2.5 W3:
  priority DESC, discovered_round ASC, url ASC),
- child priority max(0.1, 1.0 - parent_depth*0.1) (CrawlerManager.java:215),
- depth gate depth < max_depth (CrawlerManager.java:200),
- validity regex on extracted links only (BasicCrawler.java:37-39, 174-181;
  seeds bypass it, CrawlerManager.java:109-120),
- robots allow-first prefix rules (BasicCrawler.java:268-286) — shares
  parse_robots/robots_is_allowed with the engine so rule parsing parity is
  by construction; the *gating decision flow* is what this sim cross-checks,
- failed URLs are never retried (URLFrontier.java:198-202),
- robots-blocked pages are persisted with 403 and marked FAILED
  (BasicCrawler.java:54-69 -> CrawlerManager markFailed path).

It deliberately shares the pure scalar helpers (URL canonicalization,
robots parsing) with the engine, and implements ALL set/order/flow logic
independently with plain dicts and sorts.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urljoin, urlsplit

from distributed_webcrawler_spark.config import CrawlConfig
from distributed_webcrawler_spark.functions.robots_fn import parse_robots, robots_is_allowed
from distributed_webcrawler_spark.functions.urls import VALID_URL_REGEX, _canon_one

_VALID = re.compile(VALID_URL_REGEX)


@dataclass
class SimResult:
    # (round, seq_in_round, url, status_code)
    crawl_order: list[tuple[int, int, str, int]] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    # url -> (status_code, image_id, caption)
    pages: dict[str, tuple[int, str | None, str | None]] = field(default_factory=dict)


def _sort_key(rec):
    # priority DESC, discovered_round ASC, url ASC
    return (-rec["priority"], rec["round"], rec["url"])


def simulate(web_graph: dict[str, dict], robots: dict[str, str],
             payload_caption: dict[str, str], seeds: list[str],
             cfg: CrawlConfig) -> SimResult:
    """web_graph: url -> {host, out_links, image_id, status_code};
    robots: host -> robots_txt; payload_caption: image_id -> caption."""
    res = SimResult()
    frontier: dict[str, dict] = {}
    attempted: set[str] = set()
    rules_cache: dict[str, tuple[list[str], list[str]]] = {
        h: parse_robots(t) for h, t in robots.items()
    }

    def _host(url: str) -> str | None:
        try:
            return (urlsplit(url).hostname or "").lower() or None
        except ValueError:
            return None

    # --- seed injection: bypass validity, first-wins by seed order --------
    for u in seeds:
        if not cfg.reference_compat:
            u = _canon_one(u, keep_fragment=False)
        if u is not None and u not in frontier:
            frontier[u] = {"url": u, "depth": 0, "priority": 1.0, "round": 0,
                           "host": _host(u)}
    res.seen = set(frontier)

    for rnd in range(1, cfg.max_rounds + 1):
        pending = [frontier[u] for u in frontier if u not in attempted]
        if cfg.reference_compat:
            pending.sort(key=_sort_key)
            scheduled = pending[: cfg.batch_size]
        else:
            by_host: dict[str | None, list[dict]] = {}
            for rec in pending:
                by_host.setdefault(rec["host"], []).append(rec)
            scheduled = []
            for _, recs in by_host.items():
                recs.sort(key=_sort_key)
                scheduled.extend(recs[: cfg.budget_per_host_per_round])
            scheduled.sort(key=_sort_key)
            if cfg.max_pages is not None:
                remaining = max(cfg.max_pages - len(attempted), 0)
                scheduled = scheduled[:remaining]
        if not scheduled:
            break

        new_candidates: dict[str, dict] = {}  # url -> child rec (first wins)
        for seq, rec in enumerate(scheduled, start=1):
            url = rec["url"]
            attempted.add(url)
            host = rec["host"]
            # robots gate
            if cfg.respect_robots and host in rules_cache:
                path = urlsplit(url).path or None
                allow, deny = rules_cache[host]
                if not robots_is_allowed(path, allow, deny):
                    res.crawl_order.append((rnd, seq, url, 403))
                    res.pages[url] = (403, None, None)
                    continue
            # fetch
            page = web_graph.get(url)
            if page is None:
                res.crawl_order.append((rnd, seq, url, 0))
                res.pages[url] = (0, None, None)
                continue
            status = int(page["status_code"])
            image_id = page.get("image_id")
            caption = payload_caption.get(image_id) if (status == 200 and image_id) else None
            res.crawl_order.append((rnd, seq, url, status))
            res.pages[url] = (status, image_id if status == 200 else None, caption)
            # expansion
            if status == 200 and rec["depth"] < cfg.max_depth:
                for href in page["out_links"] or []:
                    if href is None:
                        continue
                    try:
                        child = urljoin(url, href.strip())
                    except ValueError:
                        continue
                    if not cfg.reference_compat:
                        child = child.split("#", 1)[0]
                        child = _canon_one(child, keep_fragment=False)
                    if child is None or not _VALID.match(child):
                        continue
                    if cfg.allowed_domains and not cfg.reference_compat:
                        if _host(child) not in cfg.allowed_domains:
                            continue
                    if not cfg.reference_compat and any(
                            child.startswith(p) for p in cfg.disallowed_url_prefixes):
                        continue
                    if child in new_candidates:
                        continue  # first discovery this round wins
                    new_candidates[child] = {
                        "url": child, "depth": rec["depth"] + 1,
                        "priority": max(0.1, 1.0 - rec["depth"] * 0.1),
                        "round": rnd, "host": _host(child),
                    }
        # enqueue-time dedup vs everything ever discovered
        for u, child in new_candidates.items():
            if u not in frontier:
                frontier[u] = child
    res.seen = set(frontier)
    return res


def load_fixture_inputs(fix_dir: str):
    """Read the datagen parquet fixture into plain-python structures."""
    import pandas as pd

    wg = pd.read_parquet(f"{fix_dir}/web_graph")
    web_graph = {
        r.url: {"host": r.host, "out_links": list(r.out_links) if r.out_links is not None else [],
                "image_id": r.image_id if isinstance(r.image_id, str) else None,
                "status_code": r.status_code}
        for r in wg.itertuples(index=False)
    }
    rb = pd.read_parquet(f"{fix_dir}/robots")
    robots = dict(zip(rb.host, rb.robots_txt))
    pay = pd.read_parquet(f"{fix_dir}/payloads", columns=["image_id", "caption"])
    captions = dict(zip(pay.image_id, pay.caption))
    sd = pd.read_parquet(f"{fix_dir}/seeds").sort_values("seq")
    seeds = list(sd.url)
    return web_graph, robots, captions, seeds
