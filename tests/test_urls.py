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
