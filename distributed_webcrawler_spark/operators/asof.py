"""Backward as-of join — "latest right value at-or-before each left row".

Spark has no ASOF JOIN operator (DuckDB/kdb do); the naive encoding
(range-θ join + argmax) explodes to |L|x|R| per key. This is the scalable
composition instead:

    union(left tagged 1, right tagged 0)
      -> ONE shuffle on the join key
      -> ordered window carry: last(value, ignorenulls) over
         rowsBetween(unboundedPreceding, currentRow)
      -> keep the left rows

Cost is a single hash shuffle on `on` plus a per-key sort — the same cost
profile as a regular equi-join, independent of how many right rows precede
each left row. Ties at equal timestamps order right (tag 0) before left
(tag 1), so a right row at exactly left_ts IS visible ("at-or-before",
matching DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`).

The right side must be unique per (key, right_ts) — pre-aggregate if not
(equal-ts duplicates would make the carried value depend on partition
iteration order).

No reference analog (the reference has no relational joins, SURVEY.md
§2.3); this is part of the beyond-reference analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str, value_col: str,
              out_col: str = "asof_value") -> DataFrame:
    """For every left row, attach the latest `value_col` from `right` with
    right_ts <= left_ts within the same `on` key (null when none precedes).
    Output: all left columns + `out_col`."""
    rv_type = right.schema[value_col].dataType
    left_payload = left.columns

    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.col(value_col).alias("__rv"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_payload if c not in on],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(rv_type).alias("__rv"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in left_payload if c not in on],
    )
    u = l.unionByName(r)
    w = (Window.partitionBy(*on).orderBy(F.col("__ts").asc(), F.col("__tag").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        u.withColumn(out_col, F.last("__rv", ignorenulls=True).over(w))
        .where(F.col("__tag") == 1)
        .select(*left_payload, out_col)
    )
