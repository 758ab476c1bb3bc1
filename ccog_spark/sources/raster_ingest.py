"""Raster ingest (E3 ≙ ccog R1's array intake).

The reference accepts dask/xarray/numpy arrays with a chunking contract
(every spatial chunk a multiple of blocksize except the last,
ccog/ccog.py:940-946). Here:

- ``ingest_numpy``: a (bands, H, W) numpy array (+ optional validity
  mask, GDAL convention: non-zero = valid, ccog/ccog.py:817-819) →
  tile DataFrame. The driver plans tile keys; pixel payloads are
  shipped via Arrow ``createDataFrame`` already tiled — one row per
  tile, no per-pixel rows on the driver.
- ``ingest_windowed``: the 100 TB path — the driver creates only the
  tile-key DataFrame; executors read their own windows via a
  user-supplied reader callable inside mapInPandas (in production the
  reader is rasterio/zarr over object storage; not available in this
  container, so tests inject a numpy-backed reader).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession

from ccog_spark.raster.tiles import TILE_SCHEMA


def plan_tiles(width: int, height: int, bands: int, blocksize: int):
    """Driver-side tile-key plan (pure math, ≙ chunk contract checks)."""
    tx = (width + blocksize - 1) // blocksize
    ty = (height + blocksize - 1) // blocksize
    keys = []
    for b in range(bands):
        for iy in range(ty):
            for ix in range(tx):
                h = min(blocksize, height - iy * blocksize)
                w = min(blocksize, width - ix * blocksize)
                keys.append((0, b, iy, ix, h, w))
    return keys


def ingest_numpy(
    spark: SparkSession,
    arr: np.ndarray,
    mask: np.ndarray | None = None,
    blocksize: int = 512,
    nodata: float = -9999.0,
) -> DataFrame:
    """(bands,H,W) array (2-D promoted to 3-D like ccog/ccog.py:935-939)
    → tile DataFrame."""
    if arr.ndim == 2:
        arr = arr[None, :, :]
    bands, height, width = arr.shape
    if mask is None:
        mask = np.ones((height, width), dtype=bool)
    rows = []
    for (lvl, b, iy, ix, h, w) in plan_tiles(width, height, bands, blocksize):
        sl = (
            slice(iy * blocksize, iy * blocksize + h),
            slice(ix * blocksize, ix * blocksize + w),
        )
        m = mask[sl] != 0
        # full blocksize payload: edge tiles padded with nodata (the
        # TIFF tile contract; ccog_spark.raster.tiles docstring)
        block = np.full((blocksize, blocksize), nodata, dtype="<f8")
        block[:h, :w] = np.where(m, arr[b][sl].astype("<f8"), nodata)
        rows.append(
            (lvl, b, iy, ix, h, w, block.tobytes(), int(m.sum()))
        )
    return spark.createDataFrame(rows, TILE_SCHEMA)


def ingest_windowed(
    spark: SparkSession,
    width: int,
    height: int,
    bands: int,
    blocksize: int,
    reader,
    nodata: float = -9999.0,
) -> DataFrame:
    """Scale path: only (tile-key) rows leave the driver; each executor
    calls ``reader(band, y0, x0, h, w) -> (ndarray, mask)`` for its own
    tiles (the reader must be a self-contained picklable callable)."""
    keys = plan_tiles(width, height, bands, blocksize)
    keys_df = spark.createDataFrame(
        keys, "level int, band int, tile_y int, tile_x int, height int, width int"
    ).repartition(max(1, len(keys) // 4), "band", "tile_y", "tile_x")

    def make_kernel(rd, bs: int, nd: float):
        def read_tiles(it):
            import numpy as _np
            import pandas as _pd

            for pdf in it:
                out = {k: [] for k in (
                    "level", "band", "tile_y", "tile_x",
                    "height", "width", "data", "valid_count",
                )}
                for r in pdf.itertuples(index=False):
                    block, m = rd(r.band, r.tile_y * bs, r.tile_x * bs, r.height, r.width)
                    full = _np.full((bs, bs), nd, dtype="<f8")
                    full[: r.height, : r.width] = _np.where(
                        m, block.astype("<f8"), nd
                    )
                    out["level"].append(r.level)
                    out["band"].append(r.band)
                    out["tile_y"].append(r.tile_y)
                    out["tile_x"].append(r.tile_x)
                    out["height"].append(r.height)
                    out["width"].append(r.width)
                    out["data"].append(full.tobytes())
                    out["valid_count"].append(int(m.sum()))
                yield _pd.DataFrame(out)

        return read_tiles

    return keys_df.mapInPandas(make_kernel(reader, blocksize, nodata), TILE_SCHEMA)
