"""Catalog: load the driver fixtures and register them as temp views.

Tables (one parquet file each under an sf dir, /root/repo/TESTDATA.md):
region nation customer supplier part orders lineitem events documents
embeddings.

Raster-domain fixtures (``pixels``, ``parts`` — FIXTURES.md §10/§11) do
not exist on disk; they are synthesized deterministically with exact
integer arithmetic so the DuckDB oracle can regenerate identical values
(see ccog_spark.raster.fixtures).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Tables whose downstream work is CPU-bound per row (simhash folds,
# shingle hashing, per-bit LSH votes) rather than scan/shuffle-bound.
# For these, scan parallelism is the whole ballgame; relational fact
# tables (lineitem/orders/events) aggregate cheaply per row and lose
# more to an extra exchange than they gain.
CPU_HEAVY_TABLES = frozenset({"documents", "embeddings"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan — Catalyst pushes filters/column pruning
    into the scan automatically (check ``PushedFilters`` in explain).

    ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) in some data
    drops (Spark reads it as epoch-nanos BIGINT under
    ``spark.sql.legacy.parquet.nanosAsLong``) and as TIMESTAMP(MICROS)
    without a UTC flag in others (Spark 4 infers TIMESTAMP_NTZ). Both
    are normalized here to a plain session-UTC TIMESTAMP so every
    downstream consumer — window(), epoch casts, the streaming staging
    writer — sees one type. The session timezone is pinned to UTC, so
    the NTZ→LTZ cast is a pure wall-clock reinterpretation and matches
    the UTC-naive DuckDB oracle exactly."""
    # Runtime-settable SQL confs — the caller's session may not have
    # them (the driver builds its own SparkSession and passes it in).
    # UTC pins year()/date_trunc() semantics to match the UTC-naive
    # oracle; nanosAsLong lets events.ts (TIMESTAMP_NANOS) load at all.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if name in CPU_HEAVY_TABLES:
        # Scan-parallelism floor: the local fixtures are single-row-group
        # parquet files, which Spark cannot split below row-group
        # granularity — the CPU-heavy map stages over documents/
        # embeddings (simhash folds, shingle hashing, hyperplane votes)
        # would run as ONE task on local[32]. Repartition only when the
        # file is too small to split into >= defaultParallelism scan
        # partitions; at real scale the table spans many files/row
        # groups, the condition is false, and no shuffle is added.
        target = spark.sparkContext.defaultParallelism
        max_split = int(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728").rstrip("b")
        )
        if os.path.getsize(table_path(sf_dir, name)) < target * max_split:
            df = df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture as a temp view (for the SQL surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
