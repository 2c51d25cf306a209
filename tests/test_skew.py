"""Skew machinery: salted two-phase top-k is EXACTLY equal to the plain
window on Zipf-skewed data; salted_join matches a plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_webcrawler_spark.operators.skew import find_hot_keys, salted_join
from distributed_webcrawler_spark.operators.topk import (
    tie_break_cols,
    topk_per_group,
    topk_per_group_salted,
)


def _skewed_frontier(spark):
    # host0 gets ~70% of rows (worst-case Zipf head)
    return spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 7, "host0").otherwise(
            F.concat(F.lit("host"), (F.col("id") % 10).cast("string"))).alias("host"),
        F.concat(F.lit("https://h/p/"), F.col("id").cast("string")).alias("url"),
        (F.pmod(F.col("id") * 37, 10) / 10.0 + 0.05).alias("priority"),
        F.timestamp_seconds(F.col("id") % 5).alias("discovered_at"),
    )


def test_salted_topk_exact(spark):
    df = _skewed_frontier(spark)
    order = tie_break_cols()
    plain = topk_per_group(df, ["host"], order, 25).select("host", "url", "rk")
    salted = topk_per_group_salted(df, ["host"], order, 25, n_salts=8).select("host", "url", "rk")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_matches_plain_join(spark):
    left = _skewed_frontier(spark)
    right = spark.createDataFrame(
        [(f"host{i}", f"rules-{i}") for i in range(10)], "host string, rules string")
    hot = find_hot_keys(left, "host", threshold=5_000)
    assert {r.host for r in hot.collect()} == {"host0"}
    plain = left.join(right, "host").select("url", "rules")
    salted = salted_join(left, right, "host", hot, n_salts=8, salt_source="url") \
        .select("url", "rules")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
