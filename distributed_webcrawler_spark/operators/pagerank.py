"""PageRank over the crawl link graph — the canonical crawl-priority
signal (Page/Brin/Motwani/Winograd 1999, public literature): a crawler
that orders its frontier by link authority fetches important pages first,
so this feeds the same priority ladder the scheduler already ranks on
(functions/urls.py priority formula, SURVEY.md C5).

Power iteration, fixed iteration count, deterministic cross-engine:

  r_{t+1}(v) = (1-d)/N + d * ( Σ_{u→v} r_t(u)/outdeg(u)  +  dangling_t/N )

- dangling mass (rank sitting on nodes with no out-edges) is redistributed
  uniformly — the standard correction, and it keeps Σr = 1 so ranks are
  comparable across graphs.
- every iteration rounds to 12 decimals ON BOTH ENGINES (Spark and the
  DuckDB oracle): double summation is order-dependent across partitions,
  so an unrounded pipeline would accumulate last-ulp drift over
  iterations; an identical per-iteration round re-converges both engines
  at every step. The final report rounds to 6.

Scale design (10^10-edge web graphs):
- per iteration: one equi-join of edges with the rank table on src (both
  hash-partitioned on the same key — co-partitioned across iterations),
  one partial/final sum on dst, one left join back to the node table. No
  CartesianProduct, no windows, no collect of vectors.
- the dangling term is a scalar aggregate per iteration (one number to the
  driver — the same cost class as a convergence check).
- the rank table is localCheckpoint()ed per iteration: truncates lineage
  so plan depth stays O(1) in iteration count (on a real cluster point
  setCheckpointDir at durable storage and use checkpoint()).
- edge skew (a mega-hub dst) lands in the sum aggregate, which Spark
  executes as partial map-side sums — hub fan-in is combined before the
  shuffle; AQE skew handling covers the join side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _graph_setup(edges, src, dst):
    """Shared iterative-operator setup: the distinct edge set and node
    table, eagerly localCheckpoint()ed so every iteration's query plans
    against a materialized RDD scan instead of re-analyzing the full
    source lineage (measured: per-iteration planning dominated the wall
    on host-tier graphs — r4 verdict #8), then coalesced to a partition
    count that follows the GRAPH's size rather than the session shuffle
    default (the repo's width-parts measured truth: partitions follow
    data volume). At the 10^10-edge tier the counts leave the layout at
    the session default; a host-tier graph collapses to a handful of
    partitions so 10+ iteration stages stop paying 64 empty tasks each.

    Returns (e, nodes, n_nodes)."""
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
              .distinct().localCheckpoint(eager=True))
    n_edges = e.count()
    nodes = (e.select(F.col("src").alias("id"))
              .unionByName(e.select(F.col("dst").alias("id")))
              .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    default = int(e.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    parts = max(1, min(default, -(-max(n, n_edges // 8) // 50_000)))
    if parts < e.rdd.getNumPartitions():
        e = e.coalesce(parts)
    if parts < nodes.rdd.getNumPartitions():
        nodes = nodes.coalesce(parts)
    return e, nodes, n


def pagerank(edges: DataFrame, n_iter: int = 5, damping: float = 0.85,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """(id, rank) after ``n_iter`` power iterations over the distinct edge
    set. Ranks sum to 1 (modulo the per-iteration 1e-12 rounding).

    Per iteration, ONE Spark query: the dangling-mass scalar rides the
    rank-update query as a broadcast one-row aggregate (the repo's
    documented scalar-broadcast carve-out) instead of a separate
    .first() job — r4 verdict #8: on host-tier graphs the loop's wall
    was per-query planning/scheduling, not data."""
    e, nodes, n = _graph_setup(edges, src, dst)
    deg = e.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint(eager=True)
    teleport = (1.0 - damping) / n
    r = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    for _ in range(n_iter):
        dangling = (r.join(deg.withColumnRenamed("src", "id"), "id", "left_anti")
                      .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dangling")))
        contribs = (e.join(r.withColumnRenamed("id", "src"), "src")
                     .join(deg, "src")
                     .select(F.col("dst").alias("id"),
                             (F.col("rank") / F.col("deg")).alias("c"))
                     .groupBy("id").agg(F.sum("c").alias("contrib")))
        r = (nodes.join(contribs, "id", "left")
                  .crossJoin(F.broadcast(dangling))
                  .select("id",
                          F.round(F.lit(teleport)
                                  + F.lit(damping)
                                  * (F.coalesce(F.col("contrib"), F.lit(0.0))
                                     + F.col("__dangling") / F.lit(float(n))),
                                  12).alias("rank"))
                  .localCheckpoint(eager=True))
    return r


def hits(edges: DataFrame, n_iter: int = 5,
         src: str = "src", dst: str = "dst") -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999, public literature) —
    PageRank's companion crawl signal: a good HUB is a page whose
    out-links point at good authorities (exactly what a frontier wants to
    expand first), a good AUTHORITY is a page many good hubs point at
    (what the corpus wants to keep). Returns (id, authority, hub) after
    ``n_iter`` mutual-reinforcement iterations over the distinct edge set.

    Determinism / cross-engine parity (same scheme as :func:`pagerank`):
    L1 normalization each half-step (divide by the column sum — SQL-exact,
    unlike the classical L2 norm's sqrt) and every normalized score is
    rounded to 12 decimals ON BOTH ENGINES so partition-order-dependent
    double summation cannot drift Spark and the DuckDB oracle apart.

    Scale design mirrors pagerank (10^10-edge graphs): each half-step is
    ONE equi-join of the edge table with a node-score table on its key
    plus ONE partial/final sum keyed by the other endpoint; each L1
    normalizer is a broadcast one-row aggregate over the half-step's own
    raw-sum subtree (Spark's exchange/subquery reuse computes that
    subtree once per query — no second pass, no .first() job). The a and
    h half-steps of one iteration fuse into a single checkpointed query
    (r4 verdict #8: per-query planning overhead dominated host-tier
    walls), so the loop runs n_iter+1 queries total. Mega-hub fan-in
    lands in the sum aggregates, which map-side combine before the
    shuffle; scores are localCheckpoint()ed per iteration so plan depth
    stays O(1) in iteration count.
    """
    e, nodes, n = _graph_setup(edges, src, dst)

    def a_step(h):
        araw = (e.join(h.withColumnRenamed("id", "src"), "src")
                 .groupBy(F.col("dst").alias("id"))
                 .agg(F.sum("h").alias("s")))
        az = araw.agg(F.sum("s").alias("__z"))
        return (nodes.join(araw, "id", "left")
                     .crossJoin(F.broadcast(az))
                     .select("id", F.round(F.coalesce(F.col("s"), F.lit(0.0))
                                           / F.col("__z"), 12).alias("a")))

    def h_step(a):
        hraw = (e.join(a.withColumnRenamed("id", "dst"), "dst")
                 .groupBy(F.col("src").alias("id"))
                 .agg(F.sum("a").alias("s")))
        hz = hraw.agg(F.sum("s").alias("__z"))
        return (nodes.join(hraw, "id", "left")
                     .crossJoin(F.broadcast(hz))
                     .select("id", F.round(F.coalesce(F.col("s"), F.lit(0.0))
                                           / F.col("__z"), 12).alias("h")))

    h = nodes.withColumn("h", F.lit(1.0 / n)).localCheckpoint(eager=True)
    for _ in range(n_iter - 1):
        h = h_step(a_step(h)).localCheckpoint(eager=True)
    # last iteration unfused: the report needs ITS a (a_t = f(h_{t-1}),
    # not a recompute from the updated h_t)
    a = a_step(h).localCheckpoint(eager=True)
    h = h_step(a).localCheckpoint(eager=True)
    return a.join(h, "id").select("id", "a", "h")


def trustrank(edges: DataFrame, seeds: DataFrame, n_iter: int = 5,
              damping: float = 0.85, src: str = "src", dst: str = "dst") -> DataFrame:
    """TrustRank (Gyongyi/Garcia-Molina/Pedersen 2004, public literature):
    PageRank with the teleport biased onto a hand-vetted trusted-seed set,
    so trust flows out along links and link-spam neighborhoods — which
    good pages rarely link INTO — starve. The crawl scheduler reads it as
    the spam-demotion complement to pagerank: schedule high-trust first,
    quarantine near-zero-trust hosts. ``seeds`` is a 1-column ``id``
    DataFrame; returns (id, trust).

      r_{t+1}(v) = (1-d)*t(v) + d*( Σ_{u→v} r_t(u)/deg(u) + dang_t*t(v) )

    with t(v) = 1/|S| on seeds, 0 elsewhere; r_0 = t. Dangling mass is
    re-teleported through t(v) (not uniformly), keeping Σr = 1 and trust
    OFF non-seed dead ends.

    Same scale/parity scheme as :func:`pagerank`: per-iteration rounds to
    12 on both engines, ONE query per iteration (edge equi-join +
    partial/final sum + broadcast one-row dangling aggregate),
    localCheckpoint lineage truncation. The trust vector column rides
    the node table — no extra shuffle.
    """
    e, nodes, _n = _graph_setup(edges, src, dst)
    n_seeds = (nodes.join(seeds.select("id").distinct(), "id", "left_semi").count())
    if n_seeds == 0:
        raise ValueError("trustrank: no seed appears in the graph")
    tele = (nodes.join(seeds.select("id").distinct().withColumn("_s", F.lit(1)),
                       "id", "left")
                 .select("id", F.when(F.col("_s").isNotNull(), F.lit(1.0 / n_seeds))
                               .otherwise(F.lit(0.0)).alias("t"))
                 .localCheckpoint(eager=True))
    deg = e.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint(eager=True)
    r = tele.select("id", F.col("t").alias("trust")).localCheckpoint(eager=True)
    for _ in range(n_iter):
        dangling = (r.join(deg.withColumnRenamed("src", "id"), "id", "left_anti")
                      .agg(F.coalesce(F.sum("trust"), F.lit(0.0)).alias("__dangling")))
        contribs = (e.join(r.withColumnRenamed("id", "src"), "src")
                     .join(deg, "src")
                     .select(F.col("dst").alias("id"),
                             (F.col("trust") / F.col("deg")).alias("c"))
                     .groupBy("id").agg(F.sum("c").alias("contrib")))
        r = (tele.join(contribs, "id", "left")
                 .crossJoin(F.broadcast(dangling))
                 .select("id",
                         F.round(F.lit(1.0 - damping) * F.col("t")
                                 + F.lit(damping)
                                 * (F.coalesce(F.col("contrib"), F.lit(0.0))
                                    + F.col("__dangling") * F.col("t")),
                                 12).alias("trust"))
                 .localCheckpoint(eager=True))
    return r


