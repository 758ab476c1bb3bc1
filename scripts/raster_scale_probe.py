"""Round-12 raster WRITE scale probe: the COG writer at growing raster
sizes, SQL kernel vs halo-exchange interp kernel. Pixels are generated
DISTRIBUTED (spark.range integer formula — no driver array), so the
probe exercises the exact pipeline a 100 TB ingest would: long-form
pixels → pyramid → tiles → encode → offset plan → multipart write.

Run alone: python scripts/raster_scale_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SIZES = [2048, 4096, 8192]
BLOCK = 512
NODATA = -9999.0


def pixels(spark, n: int):
    ids = spark.range(n * n, numPartitions=32)
    return ids.select(
        F.lit(0).alias("band"),
        (F.col("id") / n).cast("int").alias("y"),
        (F.col("id") % n).cast("int").alias("x"),
        ((F.col("id") * 7 + 3) % 1000).cast("double").alias("value"),
        # ~1% scattered invalid pixels so the validity plumbing is hot
        (F.col("id") % 97 != 0).alias("valid"),
    )


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from ccog_spark.raster.cog import write_cog

    out = {}
    for n in SIZES:
        px = pixels(spark, n).persist()
        px.count()  # materialize the input once, outside the timing
        for kernel in ("average", "cubic"):
            path = f"/tmp/raster_probe_{n}_{kernel}.tif"
            t0 = time.time()
            res = write_cog(
                spark, px, width=n, height=n, bands=1, target_path=path,
                blocksize=BLOCK, kernel=kernel, nodata=NODATA,
            )
            dt = round(time.time() - t0, 2)
            size = os.path.getsize(res.path)
            raw_mb = n * n * 8 / 1e6
            out.setdefault(n, {})[kernel] = {
                "sec": dt,
                "raw_mb_s": round(raw_mb / dt, 1),
                "file_mb": round(size / 1e6, 1),
                "n_parts": res.n_parts,
            }
            print(
                json.dumps({"n": n, "kernel": kernel, **out[n][kernel]}),
                flush=True,
            )
            os.remove(path)
        px.unpersist()
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
