"""Token-budget shard packing: assign documents to fixed-token-budget
training shards in a deterministic global order — the "sequence packing /
sharding" step every LLM pre-training pipeline runs between filtering and
tokenizer output (each shard feeds one data-loader worker, so shard
boundaries must be stable and budget-bounded).

Semantics: order docs by ``order_cols`` (total order), compute the exact
running token total BEFORE each doc, and assign
``shard_id = floor(cum_before / budget)``. A document therefore lands in
the shard that was open when it arrived (classic greedy packing; a doc may
straddle its shard's nominal boundary, matching how fixed-size training
shards are cut in practice).

Scale shape — the naive restatement is ``sum() OVER (ORDER BY ...)``,
which collapses the whole corpus into ONE window task. This implementation
reuses the ``topk.global_row_number`` pattern (operators/topk.py): range-
repartition on the order key, per-partition partial sums, a driver-side
cumsum over ONE NUMBER PER PARTITION (never per row), broadcast the
offsets back, and finish with a per-partition window. At 10^10 docs the
driver holds O(partitions) longs; every heavy stage is parallel.

Reference parity: the reference crawler has no training-shard concept —
this is part of the LLM-data-pipeline surface the brief adds on top of the
crawl engine (SURVEY.md §2 extension table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_shards(df: DataFrame, order_cols: list[Column], weight_col: str,
                budget: int, shard_col: str = "shard_id",
                partitions: int | None = None,
                cache_registry: list | None = None) -> DataFrame:
    """Exact global running-sum packing WITHOUT a single-partition window.

    Returns ``df``'s columns plus ``cum_before`` (exact running total of
    ``weight_col`` over all earlier rows in the total order) and
    ``shard_col`` (= floor(cum_before / budget)).
    """
    spark = df.sparkSession
    n = partitions or spark.sparkContext.defaultParallelism * 2
    rp = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    # cache so the sampled range bounds are IDENTICAL between the partial-sum
    # job and the downstream consumption (offsets must describe the same
    # physical layout) — same contract as topk.global_row_number.
    rp = rp.cache()
    if cache_registry is not None:
        cache_registry.append(rp)
    partials = {r["__pid"]: r["s"] for r in
                rp.groupBy("__pid").agg(F.sum(weight_col).alias("s")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(partials):
        offsets[pid] = acc
        acc += int(partials[pid])
    offset_df = F.broadcast(spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __offset long"))
    w = (Window.partitionBy("__pid").orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_local = F.coalesce(F.sum(weight_col).over(w), F.lit(0))
    return (
        rp.join(offset_df, "__pid")
        .withColumn("cum_before", (F.col("__offset") + cum_local).cast("bigint"))
        .withColumn(shard_col,
                    F.floor(F.col("cum_before") / F.lit(budget)).cast("int"))
        .drop("__pid", "__offset")
    )
