"""Raster corpus queries Q-R1..Q-R3 (SURVEY.md §2.3).

These are the SQL-checkable projections of the reference's raster
operators:

- Q-R1: one 2× average-decimation step (ccog/ccog.py:292-360, kernel
  'average') as a group-by on halved coordinates.
- Q-R2: per-band masked statistics (ccog/ccog.py:511-541).
- Q-R3: the tile-offset prefix sum over ordered parts with sparse→0
  (ccog/ccog.py:717-773, 753-754) as a window running sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ccog_spark.raster.fixtures import BLOCK
from ccog_spark.raster.fixtures import H as FIX_H
from ccog_spark.raster.fixtures import W as FIX_W
from ccog_spark.raster.fixtures import parts_df, pixels_df
from ccog_spark.raster.pyramid import build_pyramid, decimate, overview_count


def qr1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2× average decimation on valid pixels (E20 ≙ ccog 'average').

    Pure hash aggregate on derived keys: decimation at 100 TB is one
    shuffle whose output is 4× smaller than its input; no Python, no
    halo (kernel radius 0 for 'average', ccog/ccog.py:43-53).
    """
    px = pixels_df(spark)
    oy = F.floor(F.col("y") / 2.0).cast("int").alias("oy")
    ox = F.floor(F.col("x") / 2.0).cast("int").alias("ox")
    return (
        px.where("valid")
        .groupBy(F.col("band"), oy, ox)
        .agg(F.round(F.avg("value"), 4).alias("v"))
        .orderBy("band", "oy", "ox")
    )


def qr2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band masked statistics (E22 ≙ ccog _calc_stats_for_profile).

    Spark's partial+final hash aggregate replaces dask's tree reduction;
    per-band output is 5 scalars regardless of raster size.
    """
    px = pixels_df(spark)
    vv = F.when(F.col("valid"), F.col("value"))
    return (
        px.groupBy("band")
        .agg(
            F.max(vv).alias("stat_max"),
            F.round(F.avg(vv), 4).alias("stat_mean"),
            F.min(vv).alias("stat_min"),
            F.round(F.stddev_pop(vv), 4).alias("stat_std"),
            F.round(
                100.0 * F.avg(F.when(F.col("valid"), 1.0).otherwise(0.0)), 4
            ).alias("valid_pct"),
        )
        .orderBy("band")
    )


def qr3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-parts offset prefix sum (E17 ≙ ccog _ifd_offset_adjustments).

    File order is (level DESC, part_seq) — smallest overview first after
    the header, exactly the reference's layout (ccog/ccog.py:661-666).
    Sparse parts (nbytes=0) keep offset 0 (ccog/ccog.py:753-754).

    Scale note: the engine's own bucketed ``prefix_sum`` spelling is
    used (per-bucket windows + driver-cumulated bucket offsets) — no
    single-partition WindowExec even on the index. The declared oracle
    stays the naive global-window SQL; results are identical. The
    production sink computes the same prefix sum on the driver
    (ccog_spark.sinks.mpu).
    """
    from ccog_spark.operators.sharding import prefix_sum

    parts = parts_df(spark).withColumn("hdr", F.lit(4096))
    # single numeric file-order key: levels descend (small overview
    # first), part_seq ascends within a level. The stride must exceed
    # the real max part_seq or levels silently interleave — derive it
    # from the data (index-sized aggregate, two scalars) instead of
    # hard-coding the fixture's 40.
    mx = parts.agg(
        F.max("level").alias("ml"), F.max("part_seq").alias("ms")
    ).collect()[0]
    stride = mx["ms"] + 1
    p = parts.withColumn(
        "_ord", (F.lit(mx["ml"]) - F.col("level")) * stride + F.col("part_seq")
    )
    cum = prefix_sum(p, "_ord", "nbytes", out="_cum", bucket_width=16)
    offset = (
        F.when(F.col("nbytes") == 0, F.lit(0))
        .otherwise(F.col("hdr") + F.col("_cum") - F.col("nbytes"))
        .cast("bigint")
    )
    return cum.select(
        "level", "part_seq", "nbytes", offset.alias("offset")
    ).orderBy(F.col("level").desc(), F.col("part_seq"))


def pyramid_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full 3-level average pyramid over the fixture raster (E20 ≙
    ccog's level loop ccog/ccog.py:603-659 with kernel 'average').

    Levels 1..3 (160×96, blocksize 32 → overview_count = 3, matching
    ccog's GDAL-compatible depth rule). Fixed-order block sums keep the
    cascade bit-deterministic across engines.
    """
    px = pixels_df(spark)
    n = overview_count(FIX_W, FIX_H, BLOCK)
    pyr = build_pyramid(px, n, kernel="average")
    return (
        pyr.where(F.col("level") >= 1)
        .select(
            "level",
            "band",
            "y",
            "x",
            F.round("value", 4).alias("v"),
            "valid",
        )
        .orderBy("level", "band", "y", "x")
    )


def decim_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One 2× nearest decimation step (GDAL 'nearest': top-left sample)."""
    out = decimate(pixels_df(spark), "nearest")
    return out.select("band", "y", "x", "value", "valid").orderBy(
        "band", "y", "x"
    )


def decim_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One 2× RMS decimation step over valid pixels."""
    out = decimate(pixels_df(spark), "rms")
    return out.select(
        "band", "y", "x", F.round("value", 4).alias("v"), "valid"
    ).orderBy("band", "y", "x")


def decim_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One 2× mode decimation step (deterministic smallest-value tiebreak)."""
    out = decimate(pixels_df(spark), "mode")
    return out.select("band", "y", "x", "value", "valid").orderBy(
        "band", "y", "x"
    )
