"""Redirect-chain resolution (HTTP 3xx) over a (src, dst) edge table — the
crawl-side canonicalization step after fetch: a URL that 301s must be
credited to its FINAL target for dedup, politeness accounting, and page
storage. The reference follows redirects implicitly inside Jsoup's
Connection.get() (BasicCrawler.java:77-81, one URL at a time); at Spark
scale redirect edges arrive as rows, so following them is a graph
resolution, not an HTTP-client detail.

Algorithm: pointer doubling — compose the partial function f(u) = redirect
target of u with itself each round, so a chain of length d resolves in
O(log d) keyed equi-joins instead of d sequential hops. The composition
SATURATES at terminals (a target with no outgoing edge contributes 0 extra
hops through the left join), so hop counts stay exact, not rounded to
powers of two. Rows whose final target still has an outgoing edge after
ceil(log2(max_hops)) rounds — cycles, or chains longer than max_hops —
come back flagged ``looped`` with null final/hops: exactly what a
production crawler does with a redirect loop (give up, mark failed).

Scale (10^10 redirect rows): each round is ONE shuffle-keyed self-join on
the current target plus a localCheckpoint to truncate iterative lineage
(same rationale as operators/components.py); the terminal test is an
anti-join against the distinct src set. No collect, no per-hop driver
loop, no CartesianProduct.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(edges: DataFrame, src: str = "src", dst: str = "dst",
                      max_hops: int = 32) -> DataFrame:
    """(src, final_url, hops, looped) for every redirecting URL in ``edges``.

    ``edges`` must have at most one outgoing edge per ``src`` (HTTP gives
    one Location per URL; enforce upstream with a first-wins dedup if the
    crawl saw a URL twice). Terminal URLs are those never appearing as a
    src. Chains longer than ``max_hops`` and cycles return
    ``looped=true`` with null ``final_url``/``hops``.
    """
    cur = (edges.select(F.col(src).alias("src"), F.col(dst).alias("tgt"))
           .withColumn("hops", F.lit(1).cast("long"))
           .localCheckpoint(eager=True))
    rounds = max(1, math.ceil(math.log2(max_hops)))
    for _ in range(rounds):
        b = cur.select(F.col("src").alias("b_src"),
                       F.col("tgt").alias("b_tgt"),
                       F.col("hops").alias("b_hops"))
        cur = (cur.join(b, cur["tgt"] == b["b_src"], "left")
               .select("src",
                       F.coalesce("b_tgt", "tgt").alias("tgt"),
                       (F.col("hops") + F.coalesce(F.col("b_hops"), F.lit(0)))
                       .alias("hops"))
               .localCheckpoint(eager=True))
    redirecting = cur.select(F.col("src").alias("tgt")).distinct()
    resolved = (cur.join(redirecting, "tgt", "left_anti")
                .where(F.col("hops") <= max_hops)
                .select("src", F.col("tgt").alias("final_url"),
                        F.col("hops").cast("int").alias("hops"),
                        F.lit(False).alias("looped")))
    unresolved = (cur.join(resolved.select("src"), "src", "left_anti")
                  .select("src",
                          F.lit(None).cast("string").alias("final_url"),
                          F.lit(None).cast("int").alias("hops"),
                          F.lit(True).alias("looped")))
    return resolved.unionByName(unresolved)
