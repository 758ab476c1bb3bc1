"""Streaming corpus queries: each runs a real Structured Streaming job
(file source → stateful transform → memory sink) synchronously and
returns the final batch result, so the driver can hash-check streamed
results against the batch oracle (E31-E33).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccog_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_batch,
    session_counts,
    sliding_counts,
    stateful_dedup,
    tumbling_counts,
)


def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed tumbling-window aggregate — must equal the batch Q19
    (1-hour windows align to date_trunc('hour'))."""
    events = read_events_stream(spark, sf_dir)
    out = run_stream_to_batch(tumbling_counts(events), "complete")
    return out.orderBy("bucket", "event_type")


def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed sliding-window counts (1-hour windows every 30 min) —
    each event lands in exactly width/slide = 2 epoch-aligned windows,
    so the batch twin is a 2-way window-start expansion per event."""
    events = read_events_stream(spark, sf_dir)
    out = run_stream_to_batch(sliding_counts(events), "complete")
    return out.orderBy("w_start")


def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed session windows (30-min gap) — must equal the batch
    gap-and-cumsum sessionization (Q20 semantics)."""
    events = read_events_stream(spark, sf_dir)
    out = run_stream_to_batch(session_counts(events, "30 minutes"), "complete")
    return out.orderBy("user_id", "session_start")


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup: the stream unioned with itself (every
    event duplicated) must dedup back to exactly the distinct events."""
    events = read_events_stream(spark, sf_dir, with_watermark="2 hours")
    doubled = events.union(events)
    deduped = run_stream_to_batch(stateful_dedup(doubled), "append")
    return deduped.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_distinct(F.col("event_id")).alias("distinct_ids"),
    )


def stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (clicks x purchases, same user,
    purchase within 30 min) — a REAL watermarked two-stream join in
    append mode; must equal the batch interval-join SQL."""
    from ccog_spark.streaming.windows import interval_join

    clicks = read_events_stream(spark, sf_dir, with_watermark="2 hours").where(
        F.col("event_type") == "click"
    )
    purchases = read_events_stream(spark, sf_dir, with_watermark="2 hours").where(
        F.col("event_type") == "purchase"
    )
    out = run_stream_to_batch(interval_join(clicks, purchases), "append")
    return out.orderBy("click_id", "purchase_id")


def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running totals carried across micro-batches in explicit state,
    update output mode. The memory sink accumulates one row per
    (user, micro-batch-that-saw-the-user); totals are monotone in
    n_events, so the final state per user is its max-n_events row —
    which must equal the plain batch GROUP BY.

    Values are pre-quantized to integer cents (floor(v*100 + 0.5) —
    the SAME IEEE ops in both engines) BEFORE the stateful sum: the
    per-micro-batch accumulation order differs from the oracle's
    batch sum order, and float addition is non-associative, so a raw
    double sum could land on opposite sides of a ROUND boundary
    (round-6 review). Integer-valued doubles « 2^53 sum exactly in
    any order."""
    from pyspark.sql import Window as W

    from ccog_spark.streaming.stateful import running_user_totals

    events = read_events_stream(spark, sf_dir).withColumn(
        "value", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("double")
    )
    out = run_stream_to_batch(running_user_totals(events), "update")
    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "n_events",
            (F.col("total_value") / F.lit(100.0)).alias("total_value"),
        )
        .orderBy("user_id")
    )
