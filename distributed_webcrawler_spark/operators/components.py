"""Connected components over a candidate-pair graph — the dedup *clustering*
step the pair-producing operators (minhash_lsh_pairs, simhash_banded_pairs,
hamming_banded_pairs, embedding_near_dup_lsh) all terminate in: near-dup
pairs only become a deduplicated corpus once transitively grouped and a
canonical representative is chosen per group.

Algorithm: min-label propagation with pointer doubling (the "Hash-to-Min"
shape of Rastogi et al., "Finding Connected Components in Map-Reduce in
Logarithmic Rounds", ICDE 2013 — public literature). Each iteration every
node takes the min of
    its own label, its neighbors' labels, and its label's label
and the extra comp(comp(v)) hop halves the pointer chains, so a path of
length d converges in O(log d) driver-loop rounds instead of O(d).
The fixpoint is exact and deterministic: component id = min node id in the
component, independent of iteration order or partitioning.

Scale design (10^10-node candidate graphs):
- Each round is two keyed shuffles (neighbor join on ``src``, pointer join
  on ``comp``) plus one partial/final min-aggregate on ``id`` — no
  CartesianProduct, no collect; AQE's skew-join handles the hot ``comp``
  key a giant component creates.
- The loop localCheckpoint()s the label table every round: iterative
  DataFrames otherwise stack lineage (plan depth grows linearly, task
  binary re-ships the whole history). On a real cluster with executor loss
  concerns, point ``spark.sparkContext.setCheckpointDir`` at durable
  storage and swap localCheckpoint for checkpoint — same plan shape.
- Convergence is detected with a LIMIT 1 existence probe on changed
  labels, not a full count.

Reference parity: the reference has no clustering step (its dedup is the
Redis seen-set, URLFrontier.java:67-74); this operator serves the
LLM-training-data surface the brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iter: int = 25) -> DataFrame:
    """(id, component) for every node appearing in ``edges``; component is
    the min node id reachable through the undirected pair graph. Nodes in
    no pair are trivially their own component and are not emitted (callers
    left-join and coalesce(component, id) if singletons matter).

    ``max_iter`` is a safety rail: pointer doubling needs ~log2(longest
    path) rounds, so 25 covers paths of ~2^25 hops — far past any real
    near-dup chain. The loop exits early at the fixpoint.
    """
    # same setup treatment as operators/pagerank.py (r4 verdict #8): the
    # symmetrized edge set is eagerly localCheckpoint()ed — every
    # iteration then plans against a materialized RDD scan instead of
    # re-analyzing the source lineage — and coalesced to a partition
    # count that follows the GRAPH's size (host-tier graphs stop paying
    # 64 empty tasks per stage; huge graphs keep the session default).
    sym = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    n_edges = sym.count()
    default = int(sym.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    parts = max(1, min(default, -(-(n_edges // 8) // 50_000)))
    if parts < sym.rdd.getNumPartitions():
        sym = sym.coalesce(parts)
    labels = (sym.select(F.col("src").alias("id")).distinct()
                 .withColumn("comp", F.col("id"))
                 .localCheckpoint(eager=True))
    from pyspark.sql import Observation

    for _ in range(max_iter):
        nbr = (sym.join(labels.withColumnRenamed("id", "src"), "src")
                  .select(F.col("dst").alias("id"), "comp"))
        ptr = (labels.join(
                   labels.select(F.col("id").alias("comp"),
                                 F.col("comp").alias("comp2")),
                   "comp")
               .select("id", F.col("comp2").alias("comp")))
        merged = (labels.unionByName(nbr).unionByName(ptr)
                        .groupBy("id").agg(F.min("comp").alias("comp")))
        # the convergence check rides the checkpoint job as an observed
        # metric (CollectMetrics) instead of a second join+count query —
        # ONE Spark query per pointer-doubling round
        obs = Observation()
        new = (merged.join(labels.select("id", F.col("comp").alias("__old")), "id")
                     .observe(obs, F.sum((F.col("comp") != F.col("__old"))
                                         .cast("long")).alias("changed"))
                     .select("id", "comp")
                     .localCheckpoint(eager=True))
        labels = new
        if int(obs.get["changed"] or 0) == 0:
            break
    return labels.select("id", F.col("comp").alias("component"))


def dedup_component_groups(edges: DataFrame, src: str = "src", dst: str = "dst",
                           max_iter: int = 25) -> DataFrame:
    """Cluster summary over the pair graph: one row per component with its
    canonical keeper (the min id — the same first-wins rule the frontier
    uses) and member count. Returns (component, n_members)."""
    cc = connected_components(edges, src, dst, max_iter)
    return (cc.groupBy("component")
              .agg(F.count("*").alias("n_members")))

def component_representatives(components: DataFrame, scores: DataFrame,
                              id_col: str = "id", score_col: str = "score") -> DataFrame:
    """Quality-aware cluster representative: for each near-dup component keep
    the member with the highest score (ties break to the smallest id — a
    total order, so the choice is deterministic on both engines).

    ``components`` is connected_components() output (id, component);
    ``scores`` carries (id_col, score_col). One shuffle on component; the
    window never sees more rows than the largest cluster. Returns
    (component, keep_id, best_score, n_members).
    """
    j = components.join(
        scores.select(F.col(id_col).alias("id"), F.col(score_col).alias("__score")), "id")
    w = Window.partitionBy("component").orderBy(F.col("__score").desc(), F.col("id").asc())
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(Window.partitionBy("component")))
        .where(F.col("__rn") == 1)
        .select("component", F.col("id").alias("keep_id"),
                F.col("__score").alias("best_score"), "n_members")
    )


def label_propagation(edges: DataFrame, n_iter: int = 3,
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """Synchronous label propagation communities (Raghavan et al. 2007,
    public literature), made deterministic for cross-engine parity: each
    sweep every node adopts its neighbors' MOST FREQUENT label, ties to
    the SMALLEST label; isolated-from-update nodes keep their own. Unlike
    connected components (which merges everything reachable), LPA finds
    densely linked neighborhoods inside a component — on a host graph
    these are the site families / link farms a crawl audit looks for.
    Returns (id, community) after ``n_iter`` fixed sweeps (classic LPA
    stops at convergence; a fixed count keeps both engines identical).

    Scale shape per sweep: one edge-labels equi-join, one (node, label)
    count agg, one per-node rank window (partitioned by node id — never a
    global sort), one left join back; labels localCheckpoint()ed so plan
    depth is O(1) in sweeps. Undirected: edges are symmetrized once.
    """
    sym = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)   # see connected_components
    n_edges = sym.count()
    default = int(sym.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    parts = max(1, min(default, -(-(n_edges // 8) // 50_000)))
    if parts < sym.rdd.getNumPartitions():
        sym = sym.coalesce(parts)
    labels = (sym.select(F.col("src").alias("id")).distinct()
                 .withColumn("lab", F.col("id"))
                 .localCheckpoint(eager=True))
    w = Window.partitionBy("id").orderBy(F.col("n").desc(), F.col("lab").asc())
    for _ in range(n_iter):
        votes = (sym.join(labels.withColumnRenamed("id", "src"), "src")
                    .groupBy(F.col("dst").alias("id"), "lab")
                    .agg(F.count("*").alias("n")))
        pick = (votes.withColumn("rk", F.row_number().over(w))
                     .where(F.col("rk") == 1)
                     .select("id", F.col("lab").alias("new_lab")))
        labels = (labels.join(pick, "id", "left")
                        .select("id", F.coalesce("new_lab", "lab").alias("lab"))
                        .localCheckpoint(eager=True))
    return labels.select("id", F.col("lab").alias("community"))
