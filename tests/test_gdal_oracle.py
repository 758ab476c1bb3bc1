"""GDAL/rasterio cross-validation oracle (round 12, VERDICT r11 #3).

The reference's stated correctness bar is "identical to what rasterio
and GDAL produce" (/root/reference/README.md:69-70; SURVEY §5.2.3). The
repo's writer is oracle-gated with its own TIFF parser + DuckDB pixel
oracles — strong on values, but self-referential for container
structure. This module closes that loop the way the reference itself
does: when rasterio or tifffile IS installed (optional dependencies —
absent in the CI container, so those tests skip), repo-written COGs
must read back pixel-identical through the EXTERNAL reader; the
structural invariants GDAL relies on (IFD order, offset monotonicity,
non-overlapping tile extents, header-first layout) are asserted
unconditionally with the repo parser.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from ccog_spark.raster.cog import write_cog
from ccog_spark.raster.fixtures import BANDS, BLOCK, H, W, pixels_df
from ccog_spark.raster.tiff import read_band, read_cog

NODATA = -9999.0


@pytest.fixture(scope="module")
def cog_path(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gdal_oracle") / "fixture.tif")
    res = write_cog(
        spark, pixels_df(spark), width=W, height=H, bands=BANDS,
        target_path=out, blocksize=BLOCK, kernel="average", nodata=NODATA,
    )
    return res.path


def test_structural_invariants_gdal_relies_on(cog_path):
    """Unconditional (repo parser): the container properties a GDAL/COG
    reader depends on — full-res IFD first with halving overviews
    behind it, every stored tile inside the file, no overlapping tile
    extents, and all tile data AFTER the header block (streaming
    readers fetch header-then-data in one forward pass)."""
    with open(cog_path, "rb") as f:
        data = f.read()
    ifds = read_cog(data)
    assert len(ifds) >= 3

    # IFD order: full resolution first, then ceil-halving overviews
    assert ifds[0].subfile_type == 0
    for k in range(1, len(ifds)):
        assert ifds[k].subfile_type == 1  # reduced-resolution page
        assert ifds[k].width == (ifds[k - 1].width + 1) // 2
        assert ifds[k].height == (ifds[k - 1].height + 1) // 2

    # tile extents: stored tiles land inside the file, never overlap
    extents = []
    for ifd in ifds:
        assert len(ifd.offsets) == len(ifd.bytecounts)
        for off, cnt in zip(ifd.offsets, ifd.bytecounts):
            if cnt == 0:  # sparse tile: offset 0 by convention
                continue
            assert off > 0 and off + cnt <= len(data)
            extents.append((off, off + cnt))
    extents.sort()
    for (a0, a1), (b0, b1) in zip(extents, extents[1:]):
        assert a1 <= b0, "tile extents overlap"

    # header-first: the first stored byte sits after the IFD/header
    # area (the repo plans a fixed 4096-byte header segment)
    assert extents[0][0] >= 1024


def test_rasterio_reads_back_identical(cog_path):
    """rasterio/GDAL round-trip (skips when rasterio is absent): every
    band of every level must be pixel-identical to the repo reader,
    and the GDAL-visible structure (block size, overview count,
    nodata) must match the write parameters."""
    rasterio = pytest.importorskip("rasterio")

    with open(cog_path, "rb") as f:
        data = f.read()
    ifds = read_cog(data)

    with rasterio.open(cog_path) as src:
        assert src.count == BANDS
        assert (src.width, src.height) == (W, H)
        assert src.nodata == NODATA
        assert src.block_shapes == [(BLOCK, BLOCK)] * BANDS
        assert len(src.overviews(1)) == len(ifds) - 1
        for b in range(BANDS):
            got = src.read(b + 1)
            want = read_band(data, ifds[0], b)
            assert np.array_equal(got, want)
        # overviews through GDAL's decimated-read API
        for lvl in range(1, len(ifds)):
            oh, ow = ifds[lvl].height, ifds[lvl].width
            for b in range(BANDS):
                got = src.read(b + 1, out_shape=(oh, ow))
                want = read_band(data, ifds[lvl], b)
                assert np.array_equal(got, want)


def test_rasterio_reads_jpeg_cog(spark, tmp_path):
    """Lossy profile cross-check (skips without rasterio): a uint8
    JPEG-compressed COG opens under GDAL with the right structure and
    decodes within JPEG tolerance of the repo decoder."""
    rasterio = pytest.importorskip("rasterio")
    from pyspark.sql import functions as F

    px = pixels_df(spark).select(
        "band", "y", "x",
        (F.floor(F.col("value")) % 200).cast("double").alias("value"),
        "valid",
    )
    out = str(tmp_path / "jpeg.tif")
    res = write_cog(
        spark, px, width=W, height=H, bands=BANDS, target_path=out,
        blocksize=BLOCK, kernel="average", nodata=255.0,
        dtype="uint8", codec="jpeg",
    )
    with open(res.path, "rb") as f:
        data = f.read()
    ifds = read_cog(data)
    with rasterio.open(res.path) as src:
        assert src.count == BANDS and src.compression.value.lower() == "jpeg"
        for b in range(BANDS):
            got = src.read(b + 1).astype("i4")
            want = read_band(data, ifds[0], b).astype("i4")
            # same bitstream, two IDCT implementations: ±1 quantization
            assert np.abs(got - want).max() <= 1


def test_tifffile_reads_back_identical(cog_path):
    """tifffile round-trip (skips when tifffile is absent): page
    layout and pixel values through an independent TIFF stack."""
    tifffile = pytest.importorskip("tifffile")

    with open(cog_path, "rb") as f:
        data = f.read()
    ifds = read_cog(data)

    with tifffile.TiffFile(cog_path) as tf:
        # planar band pages are interleaved per level by the writer:
        # one page per (level, band)
        assert len(tf.pages) == len(ifds) * BANDS or len(tf.pages) == len(
            ifds
        )
        page0 = tf.pages[0]
        assert page0.tilewidth == BLOCK and page0.tilelength == BLOCK
        arr = tf.asarray(series=0)
        base = np.stack(
            [read_band(data, ifds[0], b) for b in range(BANDS)]
        )
        got = arr if arr.ndim == 3 else arr[None, ...]
        if got.shape[0] != BANDS and got.shape[-1] == BANDS:
            got = np.moveaxis(got, -1, 0)
        assert np.array_equal(got, base)
