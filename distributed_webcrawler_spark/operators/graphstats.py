"""Exact graph statistics over the host link graph: triangle counting
and BFS seed distance.

- Triangle counting — Schank & Wagner 2005 / Suri & Vassilvitskii (WWW
  2011 "Counting triangles and the curse of the last reducer"), public
  literature: orient every undirected edge from its lower-(degree, id)
  endpoint to its higher one, enumerate wedges only at the LOW corner,
  and close them against the oriented edge set. A hub of degree d is a
  wedge *target*, never a wedge *center*, so the classic d² blowup at
  celebrity nodes — the "last reducer" that kills the naive plan at web
  scale — never materializes; total wedge work is O(Σ oriented-out-deg²)
  = O(m^1.5) worst case. The RESULT is identical to the naive
  enumeration (orientation is a perf strategy, not a semantic), which is
  exactly what lets the DuckDB oracle state the naive form while the
  Spark side runs the oriented one.
- BFS seed distance — iterative min-hop propagation from a seed set
  (the analytic twin of the crawl engine's live depth tracking: "how
  many link hops is every host from my vetted seeds"). Same loop
  discipline as connected_components: one keyed join + one min-agg per
  hop, localCheckpoint() each round so lineage stays flat.

Reference parity: the reference's crawl records per-URL depth as it
fetches (BasicCrawler.java tracks depth for the max-depth gate) but has
no offline graph analytics at all; both operators here are additive
crawl-intelligence surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle participation over the UNDIRECTED simple graph
    induced by ``edges``: (id, degree, triangles, clustering) with
    clustering = 2·T / (deg·(deg−1)) rounded to 6 (nodes of degree < 2
    report clustering 0.0). Each triangle is enumerated exactly once at
    its lowest-(degree, id) corner, then exploded to its three corners
    for the per-node rollup."""
    # canonical undirected edge set (a < b), self-loops dropped
    a, b = F.col(src), F.col(dst)
    und = (edges.where(a != b)
           .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
           .distinct())
    deg = (und.select(F.col("a").alias("id"))
           .unionAll(und.select(F.col("b").alias("id")))
           .groupBy("id").agg(F.count("*").alias("deg")))
    # orient low-(deg, id) -> high-(deg, id); carry both degrees so the
    # wedge join can compare order keys without a global rank
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    ed = und.join(da, "a").join(db, "b")
    lo_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b")))
    oriented = ed.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lo_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("deg_v"),
    )
    o1 = oriented.select(F.col("u"), F.col("v").alias("v1"), F.col("deg_v").alias("dv1"))
    o2 = oriented.select(F.col("u"), F.col("v").alias("v2"), F.col("deg_v").alias("dv2"))
    wedges = o1.join(o2, "u").where(
        (F.col("dv1") < F.col("dv2"))
        | ((F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2"))))
    closing = oriented.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tris = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    per_node = (tris.select(F.explode(F.array("u", "v1", "v2")).alias("id"))
                .groupBy("id").agg(F.count("*").alias("triangles")))
    return (deg.join(per_node, "id", "left")
            .select("id", F.col("deg").cast("bigint").alias("degree"),
                    F.coalesce(F.col("triangles"), F.lit(0)).cast("bigint")
                    .alias("triangles"))
            .select("id", "degree", "triangles",
                    F.when(F.col("degree") >= 2,
                           F.round(F.lit(2.0) * F.col("triangles")
                                   / (F.col("degree") * (F.col("degree") - 1)), 6))
                    .otherwise(F.lit(0.0)).alias("clustering")))


def k_core(edges: DataFrame, k: int, max_rounds: int = 20,
           src: str = "src", dst: str = "dst") -> DataFrame:
    """The k-core of the undirected simple graph: iteratively peel nodes
    of degree < k until none remain (Seidman 1983 — the densest-region
    extractor: a crawl's k-core is its tightly cross-linked site cluster,
    the opposite end of the spectrum from the star-shaped link farms the
    degree histogram flags). Returns (id, core_degree) for surviving
    nodes. Peeling is monotone, so extra rounds are no-ops — the loop
    exits early at the fixpoint (LIMIT-1 probe, never a full count) and
    the unrolled-CTE oracle can simply run a fixed generous round count.
    Each round: one degree agg + two semi-joins; the edge table is
    localCheckpoint()ed per round to keep lineage flat.

    Raises RuntimeError if ``max_rounds`` is exhausted BEFORE the peel
    fixpoint — an under-peeled edge set (nodes of degree < k still
    present) is indistinguishable from a true k-core to the caller, and
    at a cascade depth beyond the oracle's unrolled rounds both engines
    would quietly agree on the same wrong answer; fail loudly instead."""
    a, b = F.col(src), F.col(dst)
    e = (edges.where(a != b)
         .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
         .distinct().localCheckpoint(eager=True))
    converged = False
    for _ in range(max_rounds):
        deg = (e.select(F.col("a").alias("id"))
               .unionAll(e.select(F.col("b").alias("id")))
               .groupBy("id").agg(F.count("*").alias("deg")))
        keep = deg.where(F.col("deg") >= k).select("id")
        e2 = (e.join(keep.withColumnRenamed("id", "a"), "a", "left_semi")
              .join(keep.withColumnRenamed("id", "b"), "b", "left_semi")
              .select("a", "b").localCheckpoint(eager=True))
        dropped = e.join(e2, ["a", "b"], "left_anti").limit(1)
        e = e2
        if not dropped.take(1):
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"k_core(k={k}) did not reach the peel fixpoint within "
            f"max_rounds={max_rounds}; result would be under-peeled — "
            f"raise max_rounds (and the oracle's unrolled round count)")
    return (e.select(F.col("a").alias("id"))
            .unionAll(e.select(F.col("b").alias("id")))
            .groupBy("id").agg(F.count("*").cast("bigint").alias("core_degree")))


def bfs_distances(edges: DataFrame, seeds: DataFrame, max_hops: int,
                  src: str = "src", dst: str = "dst",
                  id_col: str = "id") -> DataFrame:
    """Minimum hop distance from the seed set, exact up to ``max_hops``:
    (id, dist int) for every node reachable within the horizon
    (unreachable nodes are absent, matching "not yet discovered" crawl
    semantics). Each hop is one keyed equi-join + one min partial agg;
    the frontier table is localCheckpoint()ed per hop so the iterative
    plan never stacks lineage."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    dist = (seeds.select(F.col(id_col).alias("id")).distinct()
            .withColumn("dist", F.lit(0)))
    for hop in range(1, max_hops + 1):
        nxt = (dist.where(F.col("dist") == hop - 1)
               .join(e, dist.id == e.src)
               .select(F.col("dst").alias("id"), F.lit(hop).alias("dist")))
        dist = (dist.unionByName(nxt)
                .groupBy("id").agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=True))
    return dist.select("id", F.col("dist").cast("int").alias("dist"))
