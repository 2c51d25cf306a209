"""Rank-window operators: the Spark-native replacement for the reference's
Redis-ZSET priority dequeue (CrawlUrlRepository.java:31-43, ZREVRANGE).

Three shapes (SURVEY.md §2.5):
- W1 per-group top-k — rank window, NO global sort; this is the 10^10-row
  scale path (each host_bucket partition ranks independently; one shuffle
  on the partition key, which the fetch join then reuses),
- W2 round-robin quota per session — same window, different key,
- compat global top-k — orderBy().limit() reproducing ZREVRANGE semantics
  exactly for parity tests (acceptable only at test scale; Spark's
  TakeOrderedAndProject keeps it a per-partition top-k + driver merge, so
  even this avoids a full global sort).

Deterministic tie-break everywhere (SURVEY.md §2.5 W3):
  priority DESC, discovered_at ASC, url ASC.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TIE_BREAK = ("priority", "discovered_at", "url")


def tie_break_cols(df: DataFrame | None = None) -> list[Column]:
    return [F.col("priority").desc(), F.col("discovered_at").asc(), F.col("url").asc()]


def topk_per_group(df: DataFrame, group_cols: list[str], order_cols: list[Column],
                   k: int | Column, rank_col: str = "rk") -> DataFrame:
    """Keep the top-k rows per group under a total order. The rank column is
    retained (callers use it as the deterministic in-round sequence)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    ranked = df.withColumn(rank_col, F.row_number().over(w))
    k_expr = F.lit(k) if isinstance(k, int) else k
    return ranked.where(F.col(rank_col) <= k_expr)


def global_topk(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """Reference-compat ZREVRANGE: global priority order, take k."""
    return df.orderBy(*order_cols).limit(k)


def topk_per_group_salted(df: DataFrame, group_cols: list[str], order_cols: list[Column],
                          k: int, n_salts: int, salt_source: str = "url",
                          rank_col: str = "rk") -> DataFrame:
    """Skew-safe per-group top-k (north_rule: "salt hot hosts").

    A Zipf-hot host puts 50%+ of pending rows into ONE window partition; a
    plain rank window then runs single-threaded on that partition. Two-phase
    fix: (1) rank within (group, salt) and keep k per shard — the hot
    group's rows spread over n_salts tasks; (2) re-rank the <= k*n_salts
    survivors per group and keep k. Exact: the true per-group top-k under a
    total order is contained in the union of per-shard top-k.

    The salt is DETERMINISTIC (hash of ``salt_source``), keeping reruns and
    resumed runs byte-identical.
    """
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts)))
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order_cols)
    survivors = (
        salted.withColumn("__rk1", F.row_number().over(w1))
        .where(F.col("__rk1") <= k)
        .drop("__rk1", "__salt")
    )
    return topk_per_group(survivors, group_cols, order_cols, k, rank_col)
