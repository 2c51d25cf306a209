"""Live HTTP fetch + HTML link extraction — the reference's actual fetch
path (BasicCrawler.java:77-81 Jsoup GET, :148-172 a[href] extraction,
:203-217 robots.txt fetch with 5s timeout and allow-all on error),
re-expressed as Arrow-batched mapInPandas stages.

Design (SURVEY.md S5 "async HTTP inside Arrow batches"):
- the per-batch fetcher runs a bounded thread pool INSIDE the Python
  worker (urllib — stdlib only), so one Arrow batch of scheduled URLs
  turns into concurrent GETs without per-row Python UDF calls or an
  external event loop; batch size × pool size bounds in-flight sockets
  per task, and tasks scale out with executors,
- HTML anchor extraction uses the stdlib html.parser (selectolax/lxml are
  not in this container — same swap point as the codec): hrefs are
  returned VERBATIM in document order; RFC-3986 resolution happens in the
  engine's canonicalize stage exactly as in join mode, so the two fetch
  modes produce identical link sets,
- a `rewrite_base` maps fixture URLs (https://hostN.example.test/p/1) to a
  local test server (http://127.0.0.1:PORT/hostN.example.test/p/1); empty
  rewrite_base fetches the real URL (production),
- robots.txt fetch is a mapInPandas over DISTINCT hosts (dimension-sized,
  never the frontier), 5s timeout, any error -> allow-all — the exact
  reference semantics (BasicCrawler.java:211-216 returns an empty rule set
  on exception, and empty rules allow everything).

Status mapping mirrors the reference: HTTP status as-is; any
connection-level failure (refused / reset / timeout / bad response) -> 0
(BasicCrawler.java:113, 129 map exceptions to statusCode 0).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from concurrent.futures import ThreadPoolExecutor
from html.parser import HTMLParser
from urllib.parse import urlsplit

import pandas as pd

FETCH_TIMEOUT_S = 30.0   # Jsoup timeout(30_000), BasicCrawler.java:79
ROBOTS_TIMEOUT_S = 5.0   # BasicCrawler.java:207
_IMG_RE = re.compile(r"/img/([A-Za-z0-9#_-]+)")


class _AnchorParser(HTMLParser):
    """a[href] in document order (Jsoup doc.select("a[href]") equivalent)
    plus the first /img/<id> image reference."""

    def __init__(self):
        super().__init__()
        self.hrefs: list[str] = []
        self.image_id: str | None = None

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)
        elif tag == "img" and self.image_id is None:
            for k, v in attrs:
                if k == "src" and v:
                    m = _IMG_RE.search(v)
                    if m:
                        self.image_id = m.group(1)


def parse_page(html: str) -> tuple[list[str], str | None]:
    """-> (hrefs in document order, image_id or None). Parse errors yield
    whatever was extracted before the error (lenient, like Jsoup)."""
    p = _AnchorParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return p.hrefs, p.image_id


def _rewrite(url: str, rewrite_base: str | None) -> str:
    if not rewrite_base:
        return url
    parts = urlsplit(url)
    path = parts.path or "/"
    q = f"?{parts.query}" if parts.query else ""
    return f"{rewrite_base}/{parts.hostname}{path}{q}"


def _get(url: str, rewrite_base: str | None, timeout: float,
         user_agent: str) -> tuple[int, bytes | None]:
    """One GET. -> (status, body); connection-level failure -> (0, None)."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        _rewrite(url, rewrite_base), headers={"User-Agent": user_agent})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return int(resp.status), resp.read()
    except urllib.error.HTTPError as e:
        return int(e.code), None        # 404/500: a real HTTP status
    except Exception:
        return 0, None                  # refused/reset/timeout -> 0


def fetch_batch(urls: list[str], rewrite_base: str | None,
                timeout: float = FETCH_TIMEOUT_S, pool: int = 16,
                user_agent: str = "DistributedWebCrawler/1.0") -> list[tuple[int, bytes | None]]:
    """Concurrent GETs for one Arrow batch (order-preserving)."""
    if not urls:
        return []
    with ThreadPoolExecutor(max_workers=min(pool, max(len(urls), 1))) as ex:
        return list(ex.map(lambda u: _get(u, rewrite_base, timeout, user_agent), urls))


def http_fetch_fn(rewrite_base: str | None, timeout: float = FETCH_TIMEOUT_S,
                  pool: int = 16, user_agent: str = "DistributedWebCrawler/1.0"):
    """mapInPandas body: scheduled rows (must carry `url`) -> same rows +
    (web_status int, out_links array<string>, image_id string). The HTML
    body never leaves the worker: only hrefs + the image reference are
    emitted, so no shuffle ever carries page bytes (the same property the
    join-mode fetch has)."""

    def _fetch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            results = fetch_batch(list(pdf["url"]), rewrite_base, timeout, pool,
                                  user_agent)
            statuses, links, img_ids = [], [], []
            for status, body in results:
                hrefs, image_id = ([], None)
                if status == 200 and body is not None:
                    hrefs, image_id = parse_page(body.decode("utf-8", "replace"))
                statuses.append(status)
                links.append(hrefs if status == 200 else None)
                img_ids.append(image_id)
            yield pdf.assign(web_status=statuses, out_links=links,
                             image_id=img_ids)

    return _fetch


def fetch_robots_fn(rewrite_base: str | None, timeout: float = ROBOTS_TIMEOUT_S,
                    user_agent: str = "DistributedWebCrawler/1.0"):
    """mapInPandas body over DISTINCT hosts -> (host, robots_txt, ok).
    Missing/error -> empty text = allow-all for THIS round
    (BasicCrawler.java:211-216), but `ok` distinguishes a definitive
    answer (200 body, or 4xx = "no robots file", RFC 9309 §2.3.1.3) from
    a TRANSIENT failure (connection refused/reset/timeout -> status 0, or
    5xx): transient rows are persisted with ok=false so the caller can
    re-fetch the host after a TTL instead of freezing a one-time network
    blip into permanent allow-all."""

    def _fetch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            texts, oks = [], []
            for host in pdf["host"]:
                status, body = _get(f"https://{host}/robots.txt", rewrite_base,
                                    timeout, user_agent)
                texts.append(body.decode("utf-8", "replace")
                             if status == 200 and body is not None else "")
                oks.append(status == 200 or 400 <= status < 500)
            yield pd.DataFrame({"host": pdf["host"], "robots_txt": texts,
                                "ok": oks})

    return _fetch
