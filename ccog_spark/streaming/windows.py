"""Streaming window aggregations over the events stream (E31-E33).

Each builder takes a *streaming* DataFrame (``spark.readStream``) and
returns the transformed streaming frame; ``run_stream_to_batch`` drives
it synchronously through a memory sink for tests/corpus checks.

Scale notes: watermarks bound state (late rows beyond the horizon are
dropped, state for closed windows is evicted); tumbling/sliding windows
are hash aggregates keyed by (window, extra keys) — partial aggregation
applies per micro-batch exactly like the batch engine. Session windows
use Spark's built-in session_window merging.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def stage_events_dir(spark: SparkSession, sf_dir: str, n_files: int = 4) -> str:
    """Stage the events fixture as a time-ordered multi-file parquet
    directory (the file stream source requires a directory; several
    files → several micro-batches, so state semantics are really
    exercised). Files are written sequentially in event-time ranges so
    arrival order ≈ event-time order — randomly ordered files would
    make the watermark (correctly) drop most rows as late, which is its
    own dedicated test (test_streaming late-data case), not the
    baseline behavior. Also normalizes TIMESTAMP_NANOS to µs."""
    import time as _time

    from ccog_spark.catalog import load_table

    # v2: bumped when the ts normalization changed (NTZ-era staged dirs
    # in /tmp must not be reused — readStream's declared LTZ schema
    # would silently misread them).
    tag = hashlib.md5(f"{sf_dir}:{n_files}:v2".encode()).hexdigest()[:10]
    staging = os.path.join(tempfile.gettempdir(), f"ccog_events_{tag}")
    marker = os.path.join(staging, "_STAGED_OK")
    if not os.path.exists(marker):
        ev = load_table(spark, sf_dir, "events")
        # time-range bins via plain arithmetic on the epoch — a global
        # ntile window would single-partition the whole fixture (the
        # WindowExec warning); equal time slices parallelize and give
        # the same arrival-order ≈ event-time-order property.
        # Double-cast via TIMESTAMP: catalog.load_table already
        # normalizes ts, but a direct NTZ→double cast is illegal in
        # Spark 4 so stay dtype-robust here regardless of the source.
        epoch = F.col("ts").cast("timestamp").cast("double")
        lo, hi = ev.agg(F.min(epoch), F.max(epoch)).first()
        span = max(hi - lo, 1e-9)
        binned = ev.withColumn(
            "f",
            F.least(
                F.lit(n_files),
                (
                    F.floor(
                        (F.col("ts").cast("timestamp").cast("double") - F.lit(lo))
                        / F.lit(span)
                        * n_files
                    )
                    + 1
                ).cast("int"),
            ),
        )
        for i in range(1, n_files + 1):
            binned.where(F.col("f") == i).drop("f").coalesce(1).write.mode(
                "append"
            ).parquet(staging)
            _time.sleep(0.05)  # distinct file mtimes → stable arrival order
        with open(marker, "w") as fh:
            fh.write("ok")
    return staging


def read_events_stream(
    spark: SparkSession, sf_dir: str, with_watermark: str | None = "1 hour"
) -> DataFrame:
    """File-source stream over the (staged) events fixture."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    staging = stage_events_dir(spark, sf_dir)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    if with_watermark:
        stream = stream.withWatermark("ts", with_watermark)
    return stream


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling window counts/sums per event type (E31 ≙ Q19)."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "cnt", "total")
    )


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding window event counts (E31)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("w_start"), "cnt")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (E31 ≙ Q20's batch sessionization)."""
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def interval_join(
    clicks: DataFrame, purchases: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Stream-stream interval join: (click, purchase) pairs for the
    same user with the purchase inside [click.ts, click.ts + gap].

    Both inputs must carry event-time watermarks — with the time-range
    predicate they bound the join state: a buffered click can be
    evicted once the purchase-side watermark passes click.ts + gap, so
    state is O(events per watermark horizon), not O(stream length).
    This is the canonical Structured Streaming join shape (equality
    key + two-sided time constraint) — on a 1000-executor cluster the
    join is hash-partitioned on user_id and each task keeps only its
    keys' in-horizon state.
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {gap}")),
    ).select("click_id", "purchase_id")


def stateful_dedup(events: DataFrame) -> DataFrame:
    """Stateful streaming dedup on event_id (E33).

    State lifetime is governed ENTIRELY by the upstream watermark
    (``withWatermark`` on the input stream) — that horizon IS the dedup
    window; dropDuplicatesWithinWatermark takes no duration of its own,
    so callers must set the watermark to the intended horizon."""
    return events.dropDuplicatesWithinWatermark(["event_id"])


def run_stream_to_batch(
    streaming_df: DataFrame, output_mode: str = "complete"
) -> DataFrame:
    """Drive a streaming frame to completion through a memory sink and
    return the result as a batch DataFrame (test/corpus harness)."""
    name = "s" + uuid.uuid4().hex[:12]
    ckpt = os.path.join(tempfile.gettempdir(), f"ckpt_{name}")
    q = (
        streaming_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return streaming_df.sparkSession.sql(f"SELECT * FROM {name}")
