"""Pixel ↔ tile dual representation (SURVEY.md §1.4).

The reference's fundamental unit is the blocksize×blocksize compressed
tile (ccog/ccog.py:930-933). Here a tile is one DataFrame row:

    (level INT, band INT, tile_y INT, tile_x INT,
     height INT, width INT, data BINARY, valid_count INT)

``data`` is the raw little-endian float64 row-major block with invalid
pixels holding ``nodata`` — the dense-array form the encode kernel
(zlib) and any GDAL-style kernel consume. Conversion runs in
Arrow-batched ``applyInPandas``/``mapInPandas``; tile payloads never
leave their partition except through the one groupBy(tile key) shuffle
that co-locates a tile's pixels (at 100 TB: pixels arrive already
tile-clustered from ingest, so AQE turns this into a cheap local
aggregation).

All UDF kernels are self-contained closures (no module references) so
executors need no importable ccog_spark package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TILE_SCHEMA = (
    "level int, band int, tile_y int, tile_x int, "
    "height int, width int, data binary, valid_count int"
)

PIXEL_SCHEMA = "level int, band int, y int, x int, value double, valid boolean"


def tiles_from_pixels(
    pixels: DataFrame, blocksize: int, nodata: float = -9999.0
) -> DataFrame:
    """Long-form pixels (level,band,y,x,value,valid) → tile rows.

    One shuffle on the tile key; each group materializes its dense
    block in numpy and emits a single binary row.
    """
    if "level" not in pixels.columns:
        pixels = pixels.withColumn("level", F.lit(0))
    keyed = pixels.select(
        "level",
        "band",
        F.floor(F.col("y") / blocksize).cast("int").alias("tile_y"),
        F.floor(F.col("x") / blocksize).cast("int").alias("tile_x"),
        (F.col("y") % blocksize).cast("int").alias("iy"),
        (F.col("x") % blocksize).cast("int").alias("ix"),
        "value",
        "valid",
    )

    def make_kernel(bs: int, nd: float):
        def to_tile(pdf):
            import numpy as np
            import pandas as pd

            level = int(pdf["level"].iloc[0])
            band = int(pdf["band"].iloc[0])
            ty = int(pdf["tile_y"].iloc[0])
            tx = int(pdf["tile_x"].iloc[0])
            h = int(pdf["iy"].max()) + 1
            w = int(pdf["ix"].max()) + 1
            arr = np.full((h, w), nd, dtype="<f8")
            valid = pdf["valid"].to_numpy()
            vals = pdf["value"].to_numpy(dtype="f8", na_value=nd)
            iy = pdf["iy"].to_numpy()
            ix = pdf["ix"].to_numpy()
            arr[iy[valid], ix[valid]] = vals[valid]
            return pd.DataFrame(
                {
                    "level": [level],
                    "band": [band],
                    "tile_y": [ty],
                    "tile_x": [tx],
                    "height": [h],
                    "width": [w],
                    "data": [arr.tobytes()],
                    "valid_count": [int(valid.sum())],
                }
            )

        return to_tile

    return keyed.groupBy("level", "band", "tile_y", "tile_x").applyInPandas(
        make_kernel(blocksize, nodata), TILE_SCHEMA
    )


def pixels_from_tiles(
    tiles: DataFrame, blocksize: int, nodata: float = -9999.0
) -> DataFrame:
    """Inverse transform: tile rows → long-form pixels (map-side only,
    no shuffle — each tile expands within its partition)."""

    def make_kernel(bs: int, nd: float):
        def to_pixels(it):
            import numpy as np
            import pandas as pd

            for pdf in it:
                outs = []
                for r in pdf.itertuples(index=False):
                    arr = np.frombuffer(r.data, dtype="<f8").reshape(
                        r.height, r.width
                    )
                    yy, xx = np.meshgrid(
                        np.arange(r.height), np.arange(r.width), indexing="ij"
                    )
                    valid = arr != nd
                    outs.append(
                        pd.DataFrame(
                            {
                                "level": r.level,
                                "band": r.band,
                                "y": (r.tile_y * bs + yy).ravel(),
                                "x": (r.tile_x * bs + xx).ravel(),
                                "value": np.where(valid, arr, np.nan).ravel(),
                                "valid": valid.ravel(),
                            }
                        )
                    )
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        return to_pixels

    return tiles.mapInPandas(make_kernel(blocksize, nodata), PIXEL_SCHEMA)
