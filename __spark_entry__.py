"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (Q02 — TPC-H Q1-style
aggregate) at sf0.001. ``queries()`` exposes every implemented operator
from SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent SQL the
driver hash-checks against at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ccog_spark.queries.registry import ORACLE, REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["q02"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(REGISTRY)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query id (same column names/aliases
    as the Spark results — the driver sorts columns by name and hashes).
    Queries without an entry get the weaker rows-only check."""
    return dict(ORACLE)
