"""Unit tests: URL validity (exact reference regex vectors), RFC-3986
canonicalization, priority ladder (CrawlerManager.java:215 incl. the 0.1
floor), portable hashing."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from distributed_webcrawler_spark.functions.urls import (
    VALID_URL_REGEX,
    _canon_one,
    child_priority,
    is_valid_url,
)

VALID = [
    "https://example.com",
    "http://example.com/",
    "https://sub.host-1.example.co/p/1?q=2",
    "https://example.com/path#frag",  # fragment inside path part is accepted
]
INVALID = [
    None,
    "",
    "   ",
    "ftp://example.com/x",
    "https://example.com:8080/x",     # port rejected (charset excludes ':')
    "http://localhost/x",             # no dot+TLD
    "https://127.0.0.1/x",            # numeric TLD rejected ([a-zA-Z]{2,})
    "https://user:pw@example.com/x",  # userinfo rejected
    "example.com/no-scheme",
]


def test_validity_regex_python_vectors():
    rx = re.compile(VALID_URL_REGEX)
    for u in VALID:
        assert rx.match(u), u
    for u in INVALID:
        assert u is None or not u.strip() or not rx.match(u), u


def test_validity_spark_matches_python(spark):
    urls = [u for u in VALID + INVALID if u is not None]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r.url for r in df.where(is_valid_url(F.col("url"))).collect()}
    rx = re.compile(VALID_URL_REGEX)
    want = {u for u in urls if u.strip() and rx.match(u)}
    assert got == want


@pytest.mark.parametrize("raw,full,compat", [
    ("HTTPS://Host.Example.COM:443/a/../b?q=1#f",
     "https://host.example.com/b?q=1", "https://host.example.com/b?q=1#f"),
    ("http://h.example.com:80/x", "http://h.example.com/x", "http://h.example.com/x"),
    ("http://h.example.com:8080/x#f", "http://h.example.com:8080/x",
     "http://h.example.com:8080/x#f"),
    ("https://h.example.com/a/./b//c", "https://h.example.com/a/b//c",
     "https://h.example.com/a/b//c"),
])
def test_canonicalize(raw, full, compat):
    assert _canon_one(raw, keep_fragment=False) == full
    assert _canon_one(raw, keep_fragment=True) == compat


def test_priority_ladder(spark):
    df = spark.range(0, 15).select(
        F.col("id").alias("depth"), child_priority(F.col("id")).alias("p"))
    rows = {r.depth: r.p for r in df.collect()}
    assert rows[0] == 1.0
    assert abs(rows[1] - 0.9) < 1e-12
    assert rows[9] == pytest.approx(0.1)
    for d in range(9, 15):
        assert rows[d] == pytest.approx(0.1)  # the 0.1 floor


def test_resolve_fast_path_matches_exact_slow_path():
    """The vectorized tiers in resolve_canonicalize_batch must be
    byte-identical to the exact per-row resolve+canonicalize for every
    (base, href) — adversarial fuzz over bases with ports / dot segments /
    query-with-slash / fragments / '//' runs and every href shape."""
    import random

    import pandas as pd

    from distributed_webcrawler_spark.functions.urls import (
        _resolve_one,
        resolve_canonicalize_batch,
    )

    random.seed(1234)
    hosts = ["a.com", "b-x.org", "C.com", "sub.d.net", "a.com:8080", "a.com:80"]
    paths = ["", "/", "/p", "/p/q", "/p/q/", "/p?x=/y", "/p#f/g", "/p?x=1",
             "/p/./q", "/p/../q", "//dbl/x", "/p%20q", "/p;m=1", "/p;", "/p;/q"]
    hrefs = ["x", "x/y", "/r", "/r/s", "http://e.com/z", "HTTP://e.com/z",
             "x?q=1", "?q=2", "#f", "../up", "./same", "x/..", "mailto:z@e.com",
             "//proto.rel/p", "x.y", ".hidden", "http://e.com//dbl", "/r?a=b",
             "x#frag", "", None, "  x  ", "http://E.com/z", "http://e.com:80/z",
             "http://e.com:8080/z", "p/q#a/b", "x;p=1",
             # empty-params quirk: CPython strips a trailing ';' ('x;'->'x')
             "x;", "/x;", "./x;", "http://a.com/x;", "x;/y", ";", "a;b/c;",
             "https://s.io/a?b=c&d=e", "/..", "/.", "x/", "a//b",
             "ftp://f.com/x", "javascript:void(0)", "%2e%2e/x"]
    rows_b, rows_h = [], []
    for _ in range(8000):
        b = f"http://{random.choice(hosts)}{random.choice(paths)}"
        if random.random() < 0.02:
            b = None
        rows_b.append(b)
        rows_h.append(random.choice(hrefs))
    base, href = pd.Series(rows_b), pd.Series(rows_h)
    fast = resolve_canonicalize_batch(base, href)
    slow = [_resolve_one(b, h, False) for b, h in zip(base, href)]
    for i, s in enumerate(slow):
        f = fast.iloc[i]
        f = None if f is None or (isinstance(f, float)) or f is pd.NA else f
        assert f == s, (base.iloc[i], href.iloc[i], f, s)


def test_host_suffixes(spark):
    from distributed_webcrawler_spark.functions.urls import host_suffixes

    df = spark.createDataFrame(
        [("a.b.example.com",), ("example.com",), ("localhost",)], "h string")
    got = [r.s for r in df.select(host_suffixes("h").alias("s")).collect()]
    assert got[0] == ["a.b.example.com", "b.example.com", "example.com", "com"]
    assert got[1] == ["example.com", "com"]
    assert got[2] == ["localhost"]
