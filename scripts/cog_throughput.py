"""COG write/read/rebuild throughput ladder (round 8, VERDICT r7
task 2): the engine's core domain verb finally gets wall-clock and
MB/s figures. All cog_* registry rows are NON_BENCH (their cost is
file mechanics, deliberately excluded from the per-query bench), so
THIS script is the performance evidence for the write path.

Protocol: synthetic long-form pixels (band,y,x,value,valid) generated
from spark.range — a parallel JVM source, no driver materialization —
at 1k², 2k², 4k² × 3 bands uint8, blocksize 512. For each size ×
codec (deflate / gray JPEG, plus a pixel-interleaved color-JPEG row):

  write   = write_cog wall-clock (pyramid + tile assembly + encode +
            index collect + header/plan + ordered part write)
  encode  = a separate pyramid→tiles→encode pass timed to its nbytes
            index collect — approximates the encode+index share of
            write; write − encode ≈ plan/write share
  read    = read_cog_pixels full-image decode (count trigger)
  rebuild = rebuild_cog (distributed read → full re-write)

MB/s is raw sample bytes (w*h*bands, uint8) over wall-clock. Run
ALONE (no concurrent Spark jobs — bench-contention rule). Results
recorded in SCALING.md."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def pixels(spark, side: int, bands: int):
    """Deterministic dense uint8-valued long-form raster, ~2.7%
    scattered invalid pixels plus one all-invalid block per band
    (sparse-tile elision stays exercised, as in the fixture corpus)."""
    n = side * side * bands
    ids = spark.range(n, numPartitions=64)
    hw = side * side
    band = (F.floor(F.col("id") / hw) + 1).cast("int")
    y = F.floor((F.col("id") % hw) / side).cast("int")
    x = (F.col("id") % side).cast("int")
    value = ((band * 7919 + y * 104729 + x * 130363) % 256).cast("double")
    block = F.floor(y / 512) * 8 + F.floor(x / 512)
    invalid = (block == band) | (((y * 13 + x * 7 + band) % 37) == 0)
    return ids.select(
        band.alias("band"), y.alias("y"), x.alias("x"),
        value.alias("value"), (~invalid).alias("valid"),
    )


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from ccog_spark.raster.cog import encode_tiles, rebuild_cog, write_cog
    from ccog_spark.raster.pyramid import build_pyramid, overview_count
    from ccog_spark.raster.tiles import tiles_from_pixels
    from ccog_spark.sources.cog_reader import read_cog_pixels

    # warm-up: run the smallest case once untimed so JVM/codegen/Arrow
    # startup doesn't land in the first timed row
    wpx = pixels(spark, 512, 3)
    write_cog(
        spark, wpx, width=512, height=512, bands=3,
        target_path="/tmp/cog_tp_warm.tif", blocksize=512,
        nodata=255.0, dtype="uint8", codec="deflate",
    )
    read_cog_pixels(spark, "/tmp/cog_tp_warm.tif").count()
    os.unlink("/tmp/cog_tp_warm.tif")

    out_rows = []
    cases = []
    for side in (1024, 2048, 4096):
        cases.append((side, "deflate", {}))
        cases.append((side, "jpeg", {"compress_level": 75}))
    # color path: pixel-interleaved YCbCr 4:2:0 at one size
    cases.append(
        (2048, "jpeg", {"compress_level": 75, "pixel_interleave": True,
                        "jpeg_subsampling": "420"})
    )

    for side, codec, extra in cases:
        bands = 3
        raw_mb = side * side * bands / 1e6
        px = pixels(spark, side, bands)
        tag = f"{side}x{side} {codec}" + (
            " color420" if extra.get("pixel_interleave") else ""
        )
        path = f"/tmp/cog_tp_{side}_{codec}_{int(bool(extra.get('pixel_interleave')))}.tif"

        # encode+index share first (cold caches either way — nothing
        # is persisted across these probes): same pyramid→tiles→encode
        # pipeline write_cog runs, timed to its nbytes index collect
        n_ov = overview_count(side, side, 512)
        t_encode = None
        if not extra.get("pixel_interleave"):
            t0 = time.perf_counter()
            enc = encode_tiles(
                tiles_from_pixels(
                    build_pyramid(px, n_ov, kernel="average"),
                    512, 255.0, side, side, dtype="uint8",
                ),
                codec=codec, blocksize=512, dtype="uint8",
                compress_level=extra.get("compress_level", 6),
            )
            enc.select("nbytes").groupBy().sum().collect()
            t_encode = time.perf_counter() - t0

        t0 = time.perf_counter()
        res = write_cog(
            spark, px, width=side, height=side, bands=bands,
            target_path=path, blocksize=512, nodata=255.0,
            dtype="uint8", codec=codec, **extra,
        )
        t_write = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_px = read_cog_pixels(spark, path).count()
        t_read = time.perf_counter() - t0

        t0 = time.perf_counter()
        rebuild_cog(spark, path, path + ".rb.tif", kernel="average")
        t_rebuild = time.perf_counter() - t0

        file_mb = os.path.getsize(path) / 1e6
        row = {
            "case": tag,
            "raw_mb": round(raw_mb, 1),
            "file_mb": round(file_mb, 1),
            "tiles_written": res.n_tiles_written,
            "tiles_sparse": res.n_tiles_sparse,
            "write_s": round(t_write, 2),
            "encode_share_s": (
                round(t_encode, 2) if t_encode is not None else None
            ),
            "write_mbps": round(raw_mb / t_write, 1),
            "read_s": round(t_read, 2),
            "read_mbps": round(raw_mb / t_read, 1),
            "rebuild_s": round(t_rebuild, 2),
            "read_rows": n_px,
        }
        out_rows.append(row)
        print("ROWJSON:", json.dumps(row), flush=True)
        for p in (path, path + ".rb.tif"):
            if os.path.exists(p):
                os.unlink(p)

    print("ALLJSON:", json.dumps(out_rows))


if __name__ == "__main__":
    main()
