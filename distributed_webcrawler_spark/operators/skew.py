"""Hot-key salting for skewed joins (north_rule: "salt hot hosts to defeat
skew").

The fetch join (scheduled frontier x web_graph, SURVEY.md J4) shuffles on
``url`` whose host distribution is Zipfian — a handful of hot hosts can put
50%+ of a round into one shuffle partition. AQE's skew-join splitting
(enabled in session.py) handles the generic case at runtime; this operator
is the explicit, plan-level treatment for *known* hot keys:

1. count rows per key on the (small) scheduled side — one cheap agg,
2. keys above ``threshold`` become "hot": left side gets a random-ish but
   DETERMINISTIC salt in [0, n_salts) (pmod of xxhash64 of the full row
   key, so re-runs are identical), right side is exploded n_salts times
   for hot keys only,
3. join on (key, salt).

Cost: the build side replicates only for hot keys (bounded by
n_hot * n_salts rows), while the probe side's hot partitions split into
n_salts even shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, key: str, hot_keys_df: DataFrame,
                n_salts: int, how: str = "inner", salt_source: str | None = None) -> DataFrame:
    """Join left x right on ``key`` with hot-key salting.

    hot_keys_df: single-column DF of hot key values (small; broadcast).
    salt_source: column on ``left`` whose hash spreads the salt (defaults to
    the key itself + a row-unique column is better; callers pass e.g. 'url').
    """
    hot = F.broadcast(hot_keys_df.select(F.col(key).alias("__hot_key")))
    src = F.col(salt_source if salt_source else key)

    l = left.join(hot, left[key] == F.col("__hot_key"), "left")
    l = l.withColumn(
        "__salt",
        F.when(F.col("__hot_key").isNull(), F.lit(0))
        .otherwise(F.pmod(F.xxhash64(src), F.lit(n_salts)).cast("int")),
    ).drop("__hot_key")

    salts = F.explode(
        F.when(F.col("__hot_key").isNotNull(), F.sequence(F.lit(0), F.lit(n_salts - 1)))
        .otherwise(F.array(F.lit(0)))
    )
    r = right.join(hot, right[key] == F.col("__hot_key"), "left")
    r = r.withColumn("__salt", salts).drop("__hot_key")

    out = l.join(r, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def find_hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys whose per-round row count exceeds threshold (runs as one partial
    +final hash agg; output is tiny by construction)."""
    return df.groupBy(key).count().where(F.col("count") > threshold).select(key)
