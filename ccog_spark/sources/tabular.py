"""Tabular sources beyond parquet (E2): CSV / JSON with explicit
schemas (never inferSchema in production — a schema scan reads the data
twice and guesses types), plus partitioned parquet write (E5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str, **options
) -> DataFrame:
    opts = {"header": "true", "mode": "FAILFAST", **options}
    return spark.read.schema(schema).options(**opts).csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str, **options
) -> DataFrame:
    opts = {"mode": "FAILFAST", **options}
    return spark.read.schema(schema).options(**opts).json(path)


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet layout: one directory level per
    partition column → partition pruning on read (Catalyst skips whole
    directories for equality/range predicates on partition columns)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
