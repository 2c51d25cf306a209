"""pack_shards: exact global running sum + shard assignment without a
single-partition window."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_webcrawler_spark.operators.pack import pack_shards


def test_pack_matches_serial_cumsum(spark):
    rows = [(i, (i * 37) % 50 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w long").repartition(13)
    reg = []
    out = pack_shards(df, [F.col("doc_id")], "w", budget=300,
                      partitions=7, cache_registry=reg)
    got = {r.doc_id: (r.cum_before, r.shard_id) for r in out.collect()}
    acc = 0
    for i, w in rows:
        assert got[i] == (acc, acc // 300), f"doc {i}"
        acc += w
    # shards are budget-bounded: each shard's pre-straddle mass < budget
    assert max(r[1] for r in got.values()) == (acc - rows[-1][1]) // 300
    for c in reg:
        c.unpersist()


def test_pack_no_single_partition_window(spark):
    df = spark.createDataFrame([(i, 1) for i in range(100)],
                               "doc_id long, w long")
    reg = []
    out = pack_shards(df, [F.col("doc_id")], "w", budget=10, partitions=5,
                      cache_registry=reg)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window must be keyed by __pid (parallel), not empty-key global
    assert "Window" in plan
    assert "SinglePartition" not in plan
    for c in reg:
        c.unpersist()


def test_grouped_row_number_matches_window(spark):
    """grouped_row_number == Window.partitionBy(group).orderBy(key) exactly,
    including groups that span many range partitions and groups smaller
    than one partition."""
    from distributed_webcrawler_spark.operators.topk import grouped_row_number

    rows = [(i, ["a", "b", "c"][i % 3] if i < 300 else "big") for i in range(900)]
    df = spark.createDataFrame(rows, "k long, g string").repartition(11)
    reg = []
    out = grouped_row_number(df, ["g"], [F.col("k")], seq_col="seq",
                             partitions=7, cache_registry=reg)
    got = {(r.g, r.k): r.seq for r in out.collect()}
    expect: dict = {}
    counts: dict = {}
    for k, g in sorted(rows, key=lambda t: (t[1], t[0])):
        counts[g] = counts.get(g, 0) + 1
        expect[(g, k)] = counts[g]
    assert got == expect
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    for c in reg:
        c.unpersist()
