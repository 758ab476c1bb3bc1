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


def write_stream_cogs(
    stream_pixels: DataFrame,
    out_dir: str,
    checkpoint: str,
    width: int,
    height: int,
    bands: int,
    **write_cog_kwargs,
):
    """foreachBatch → COG seam (round 10): each micro-batch of
    long-form pixels (band, y, x, value, valid) becomes ONE complete
    COG at ``{out_dir}/scene_epoch={N}.tif`` via the ordered multipart
    writer — the streaming spelling of the batch write path (satellite
    ingest: every arriving scene granule is COG-ified as it lands).

    Idempotency mirrors write_stream_exactly_once: the COG path is
    keyed by epoch_id and write_cog's finalize REPLACES the target, so
    a replayed batch rewrites its own file, never duplicates. The
    write inside foreachBatch is the same distributed pyramid/encode/
    MPU job the batch API runs — foreachBatch hands over a normal
    DataFrame, so nothing in the COG pipeline is streaming-special.

    The grid geometry (width/height/bands) is fixed per stream, as in
    a tile-ingest feed; heterogeneous scenes need one stream per
    geometry (write_cog validates the batch against the declared
    grid, so a mis-fed scene fails loudly instead of writing a
    corrupt file)."""

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        if df.isEmpty():
            return  # empty trigger: no scene arrived, write nothing
        from ccog_spark.raster.cog import write_cog

        write_cog(
            df.sparkSession,
            df,
            width,
            height,
            bands,
            f"{out_dir}/scene_epoch={epoch_id}.tif",
            **write_cog_kwargs,
        )

    return (
        stream_pixels.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )
