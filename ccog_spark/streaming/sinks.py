"""Streaming sinks: exactly-once parquet via foreachBatch.

Structured Streaming's file sink is append-only; ``foreachBatch`` is
the public escape hatch for transactional/idempotent sinks. Writing
each micro-batch to an ``epoch=N`` directory with overwrite semantics
makes replays idempotent: if a batch is reprocessed after a failure,
the rewrite of its epoch directory replaces, never duplicates — the
same commit idea as the ordered MPU sink (parts keyed by number,
publish is atomic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_stream_exactly_once(
    stream_df: DataFrame, path: str, checkpoint: str
):
    """Start a foreachBatch parquet writer; returns the StreamingQuery
    (caller stops it / processAllAvailable)."""

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        # runs on the driver; the write itself is a distributed job
        df.write.mode("overwrite").parquet(f"{path}/epoch={epoch_id}")

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )
