"""Vector math over array<float> embedding columns — built-in higher-order
functions only (zip_with / aggregate run JVM-side inside codegen; no Python
and no UDF serialization in the similarity hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column, decimals: int = 6) -> Column:
    """Cosine similarity rounded to ``decimals`` — rounding makes the value
    hash-stable against engine-specific float summation order (the DuckDB
    oracle rounds identically)."""
    return F.round(dot(a, b) / (norm(a) * norm(b)), decimals)


def cosine_sql(a: str, b: str, decimals: int = 6) -> str:
    """DuckDB twin (list_cosine_similarity computes the same quantity)."""
    return f"round(list_cosine_similarity({a}, {b}), {decimals})"
