"""Spherical k-means training for IVF ANN (Dhillon & Modha, "Concept
decompositions for large sparse text data using clustering", 2001 —
public literature): cosine assignment + arithmetic-mean update. This is
the trainer that produces the centroid table `ivf_assign_broadcast`
consumes — closing the "where do the IVF cells come from" gap; cosine
assignment is the right metric for the embedding ANN queries, which all
rank by cosine.

Distributed shape (Lloyd's on Spark, the same layout MLlib's KMeans uses):
- ASSIGN is the proven scale path: broadcast (k x d) numpy centroid
  matrix, one matmul-argmax per Arrow batch (operators/similarity.py
  ivf_assign_broadcast) — the corpus never shuffles for assignment.
- UPDATE is posexplode -> partial/final avg per (cell, dim): one shuffle
  of (cell, dim, val) triples, combiner-friendly.
- per iteration the k x d centroid values (and only those) come back to
  the driver — the treeAggregate-equivalent every distributed k-means
  pays; k*d is tiny by construction (k ~ sqrt(N), d fixed).

Cross-engine determinism (the DuckDB oracle unrolls the iterations):
- init = the k smallest vec_ids, cells numbered 0..k-1 in that order;
- assignment rounds cosine to 6 with ties to the smaller cell — the
  identical rule the ANN queries already hash-match;
- every updated centroid coordinate rounds to 12 on both engines, so
  mean-summation order cannot drift iterations apart;
- a cell that loses all members keeps its previous centroid (coalesce).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import ivf_assign_broadcast


def kmeans_fit(vectors: DataFrame, k: int = 8, n_iter: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Train k centroids; returns the final centroid table as scalar rows
    (cell int, dim int, val double) — the exploded layout joins/oracles
    cleanly and rebuilds into the (cell_id, vector) list
    `ivf_assign_broadcast` takes via `centroids_as_list`."""
    spark = vectors.sparkSession
    init_rows = vectors.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    cents = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(init_rows)]
    dim = len(cents[0][1])

    def one_update(cs: list) -> DataFrame:
        assigned = ivf_assign_broadcast(vectors, cs, nprobe=1,
                                        id_col=id_col, vec_col=vec_col)
        upd = (assigned.select("cell", F.posexplode("v").alias("dim", "val"))
                       .groupBy("cell", "dim")
                       .agg(F.round(F.avg(F.col("val").cast("double")), 12)
                             .alias("val")))
        prev = spark.createDataFrame(
            [(c, d, float(v[d])) for c, v in cs for d in range(dim)],
            "cell long, dim int, val double")
        # empty cell -> keep previous centroid; broadcast the tiny prev table
        return (F.broadcast(prev).alias("p")
                .join(upd.alias("u"), ["cell", "dim"], "left")
                .select("cell", "dim",
                        F.coalesce(F.col("u.val"), F.col("p.val")).alias("val")))

    for _ in range(n_iter - 1):
        rows = one_update(cents).collect()
        by_cell: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cell.setdefault(int(r["cell"]), {})[int(r["dim"])] = float(r["val"])
        cents = [(c, [by_cell[c][d] for d in range(dim)]) for c in sorted(by_cell)]
    return one_update(cents)


def centroids_as_list(centroid_rows: DataFrame) -> list:
    """(cell, dim, val) rows -> [(cell_id, [v0..vd-1]), ...] for
    ivf_assign_broadcast. Collects k*d scalars — the IVF build handoff."""
    by_cell: dict[int, dict[int, float]] = {}
    for r in centroid_rows.collect():
        by_cell.setdefault(int(r["cell"]), {})[int(r["dim"])] = float(r["val"])
    return [(c, [vals[d] for d in range(len(vals))])
            for c, vals in sorted(by_cell.items())]
