"""Declared query corpus (SURVEY.md §2.3) as DataFrame-API programs.

Each query is a function ``(spark, sf_dir) -> DataFrame`` whose result
hash-matches the DuckDB oracle SQL in ``ccog_spark.queries.oracle``.
``REGISTRY`` maps query id → callable.
"""

from ccog_spark.queries.registry import REGISTRY, ORACLE

__all__ = ["REGISTRY", "ORACLE"]
