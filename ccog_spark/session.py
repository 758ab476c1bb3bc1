"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what a cluster deployment would set per-job:
AQE on (runtime re-planning, skew-join handling, partition coalescing),
Arrow on (vectorized Python boundary), shuffle partitions sized to cores
rather than Spark's default 200, UTC session timezone so timestamp
results are oracle-comparable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "ccog_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    On a real cluster the ``master``/memory settings come from the
    deployment; everything else here is engine policy and applies at any
    scale:

    - ``spark.sql.adaptive.*``: AQE re-plans at runtime — coalesces
      post-shuffle partitions, converts to broadcast joins when a side
      turns out small, and splits skewed partitions. Essential at 100 TB
      where static planning guesses wrong.
    - Arrow execution for every pandas_udf / applyInPandas boundary.
    - UTC session timezone: deterministic timestamp semantics.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Parquet TIMESTAMP(NANOS) (events.ts) has no Spark type; read as
        # epoch-nanos BIGINT and convert in the catalog (exact ÷1000).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
