"""Approximate aggregation operators (E14).

Excluded from the hash corpus BY DESIGN (SURVEY.md §2.3): sketch
implementations legitimately differ across engines (Spark HLL++ vs
DuckDB's HLL; GK vs t-digest quantiles). Tests bound the relative
error against exact answers instead (SURVEY.md §5.2 item 4 spirit).

At 100 TB these are the right defaults for exploratory aggregation:
HLL++ state is KBs per group vs the unbounded set of countDistinct,
and percentile_approx streams in one pass vs a full sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    return df.agg(F.approx_count_distinct(col, rsd).alias("approx_distinct"))


def approx_quantiles(
    df: DataFrame, col: str, probs: list[float], accuracy: int = 10_000
) -> DataFrame:
    return df.agg(
        F.percentile_approx(
            col, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
        ).alias("quantiles")
    )


def approx_topk_freq(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """Heavy hitters via count-min-style grouping: exact groupBy + top-k
    (Spark has no native CMS; the group-by is partial-aggregated so the
    shuffle carries |distinct| rows, acceptable for hot-key detection)."""
    return (
        df.groupBy(col)
        .count()
        .orderBy(F.col("count").desc(), F.col(col))
        .limit(k)
    )
