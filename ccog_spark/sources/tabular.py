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


def write_bucketed_table(
    df, name: str, bucket_col: str, n_buckets: int = 8, sort_col: str | None = None
) -> None:
    """Bucketed managed table (E: co-located joins): later equi-joins on
    ``bucket_col`` between tables bucketed the same way need NO shuffle
    — the pre-shuffle is paid once at write time, the win repeats every
    join. The 100 TB pattern for fact⋈fact joins on a shared key."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(name)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    """ORC scan (same Catalyst pushdown machinery as parquet:
    predicate pushdown + column pruning reach the ORC reader via
    `spark.sql.orc.filterPushdown`, on by default)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC write, optionally hive-partitioned (same pruning story as
    write_parquet_partitioned)."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def upsert_partitioned_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
    check_moved_keys: bool = False,
) -> None:
    """MERGE-style upsert into a hive-partitioned parquet dataset
    without a table format: rows in ``updates`` replace existing rows
    with the same key, new keys are inserted, and ONLY the partitions
    present in ``updates`` are rewritten — untouched partition
    directories keep their exact files (asserted byte-for-byte in the
    test). This is the CDC-apply shape at 100 TB: daily changes touch
    a handful of date partitions; the rewrite cost is proportional to
    the CHANGED partitions, never the table.

    PRECONDITION — partition-stable keys: a key's partition value must
    not change between the stored row and its update (the usual CDC
    contract, where the partition derives from the key or an immutable
    attribute). If an update moves a key to a DIFFERENT partition, the
    old row in the unchanged partition is not visited and would
    survive as a stale duplicate. ``check_moved_keys=True`` pays one
    extra key-scan over the NON-updated partitions and raises if any
    update key exists there; leave it off when the pipeline guarantees
    stability.

    Mechanics: per-write dynamic partition-overwrite (scoped via the
    writer option — never the session conf, which would race with
    concurrent writers on the same session) rewrites exactly the
    partitions the job emits; the merged frame is eagerly
    localCheckpoint-ed first, because its lineage READS the same
    files the commit deletes (lazy evaluation + self-overwrite is the
    classic corruption trap). Not transactional across partitions —
    a mid-commit failure can leave some partitions new and some old
    (that is the table-format gap this deliberately does not claim to
    close); each partition directory swap itself is atomic-per-file.
    """
    from pyspark.sql import functions as F

    parts = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    # NULL partition values defeat every isin() below (NULL comparisons
    # filter out), so existing __HIVE_DEFAULT_PARTITION__ rows would not
    # be anti-joined and the update would append a duplicate beside the
    # stale row. Refuse loudly rather than corrupt.
    if any(p is None for p in parts):
        raise ValueError(
            f"updates contain NULL {partition_col!r} partition values; "
            f"NULL partitions cannot be merged safely (isin/anti-join "
            f"semantics drop NULL keys) — fill or filter them first"
        )
    full = spark.read.parquet(path)
    if check_moved_keys:
        moved = (
            full.where(~F.col(partition_col).isin(parts))
            .join(updates.select(*key_cols).distinct(), key_cols, "semi")
            .limit(1)
            .count()
        )
        if moved:
            raise ValueError(
                "update keys exist in partitions the updates do not "
                "touch — a cross-partition key move would leave stale "
                "duplicates (see docstring precondition)"
            )
    existing = full.where(F.col(partition_col).isin(parts))
    keep = existing.join(
        updates.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    merged = keep.unionByName(
        updates.select(*existing.columns)
    ).localCheckpoint(eager=True)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
