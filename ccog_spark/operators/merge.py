"""CDC / upsert / SCD2 operators.

Spark without a table format (Delta/Iceberg jars absent in this image)
emulates MERGE with the classic anti-join + union shape; SCD2 keeps a
validity-interval history. Both are pure DataFrame transforms over the
snapshot — at scale they pair with a partitioned-parquet rewrite of
only the affected partitions.

- ``merge_upsert``: last-writer-wins upsert of ``updates`` into
  ``target`` on ``key`` (MERGE INTO … WHEN MATCHED UPDATE / WHEN NOT
  MATCHED INSERT).
- ``scd2_apply``: type-2 slowly-changing dimension — matched current
  rows are closed (valid_to = change ts) and a new current row opens
  per change; unmatched keys insert as new current rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Rows of ``updates`` win; unmatched target rows survive."""
    survivors = target.join(updates, key, "left_anti")
    return survivors.unionByName(updates)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    change_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply one batch of changes to an SCD2 dimension.

    ``dim`` columns: key, attrs…, valid_from, valid_to (NULL = current).
    ``changes`` columns: key, attrs…, change_ts. One change per key per
    batch (pre-aggregate upstream if needed).
    """
    attr_cols = [
        c for c in dim.columns if c not in (key, valid_from, valid_to)
    ]
    ch = changes.select(
        F.col(key).alias("_k"),
        F.col(change_ts).alias("_ts"),
        *[F.col(c).alias(f"_n_{c}") for c in attr_cols],
    )

    joined = dim.join(ch, (F.col(key) == F.col("_k")), "left")
    # current rows of changed keys close at the change timestamp
    closed = joined.select(
        key,
        *attr_cols,
        F.col(valid_from),
        F.when(
            F.col("_k").isNotNull() & F.col(valid_to).isNull(), F.col("_ts")
        )
        .otherwise(F.col(valid_to))
        .alias(valid_to),
    )
    # one new current row per change
    opened = ch.select(
        F.col("_k").alias(key),
        *[F.col(f"_n_{c}").alias(c) for c in attr_cols],
        F.col("_ts").alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
    )
    return closed.unionByName(opened)
