"""Distributed COG reader (sources/cog_reader.py): write → read back
as a DataFrame; values must match the driver-side reference reader
(tiff.read_band) exactly, index-level band pruning must skip tiles,
and sparse tiles must contribute no rows."""

from __future__ import annotations

import numpy as np
import pytest

from ccog_spark.raster import tiff
from ccog_spark.raster.cog import write_ccog
from ccog_spark.sources.cog_reader import (
    read_cog_mask,
    read_cog_pixels,
    read_header,
)

H, W, BLOCK = 96, 160, 32


@pytest.fixture(scope="module")
def cog_file(spark, tmp_path_factory):
    rng = np.random.default_rng(21)
    arr = np.round(rng.random((2, H, W)) * 100, 2)
    mask = rng.random((H, W)) > 0.08
    mask[0:32, 0:32] = False  # sparse block
    out = str(tmp_path_factory.mktemp("cogread") / "rt.tif")
    write_ccog(
        spark, arr, out, mask=mask, blocksize=BLOCK, nodata=-9999.0,
        internal_mask=True,
    )
    return arr, mask, out


def test_distributed_read_matches_reference_reader(spark, cog_file):
    arr, mask, path = cog_file
    data = open(path, "rb").read()
    ifds = [i for i in tiff.read_cog(data) if not tiff.is_mask_ifd(i)]
    px = read_cog_pixels(spark, path).collect()
    got = {}
    for r in px:
        got[(r.band, r.y, r.x)] = (r.value, r.valid)
    for band in range(2):
        ref = tiff.read_band(data, ifds[0], band)
        for y in range(H):
            for x in range(0, W, 7):  # stride the check for speed
                key = (band, y, x)
                if ref[y, x] == -9999.0:
                    # nodata: either sparse (no row) or invalid row
                    if key in got:
                        assert not got[key][1]
                else:
                    val, valid = got[key]
                    assert valid and val == ref[y, x]


def test_sparse_tiles_emit_no_rows(spark, cog_file):
    _, mask, path = cog_file
    px = read_cog_pixels(spark, path)
    n_sparse_rows = px.where(
        "band = 0 and y < 32 and x < 32"
    ).count()
    assert n_sparse_rows == 0  # the all-invalid block was never read


def test_band_pruning_skips_tiles(spark, cog_file):
    _, _, path = cog_file
    only1 = read_cog_pixels(spark, path, bands=[1])
    bands = {r.band for r in only1.select("band").distinct().collect()}
    assert bands == {1}


def test_overview_level_read(spark, cog_file):
    arr, _, path = cog_file
    lvl1 = read_cog_pixels(spark, path, level=1)
    ys = lvl1.agg({"y": "max", "x": "max"}).collect()[0]
    assert ys["max(y)"] <= (H + 1) // 2 - 1
    assert ys["max(x)"] <= (W + 1) // 2 - 1
    assert lvl1.count() > 0


def test_mask_read_matches(spark, cog_file):
    _, mask, path = cog_file
    rows = read_cog_mask(spark, path).collect()
    got = np.zeros((H, W), dtype=bool)
    for r in rows:
        if r.valid:
            got[r.y, r.x] = True
    assert np.array_equal(got, mask)


def test_header_probe_reads_head_only(cog_file):
    _, _, path = cog_file
    ifds = read_header(path, probe=4096)
    assert len(ifds) >= 2


def test_roundtrip_values_via_dataframe(spark, cog_file):
    """End-to-end: every valid source pixel comes back with its exact
    float64 value through the distributed path."""
    arr, mask, path = cog_file
    px = read_cog_pixels(spark, path, bands=[0]).where("valid").collect()
    for r in px[::37]:
        assert arr[0][r.y, r.x] == r.value
        assert mask[r.y, r.x]


def test_windowed_read_prunes_and_clips(spark, tmp_path):
    """window=(x0,y0,x1,y1): tiles outside the bbox never enter the
    index (spatial partition pruning), edge tiles clip to the bbox,
    values are exact."""
    import numpy as np
    from pyspark.sql import functions as F

    from ccog_spark.raster.cog import write_ccog
    from ccog_spark.sources.cog_reader import read_cog_pixels

    h, w, bs = 96, 160, 32
    arr = (np.arange(h * w, dtype=np.int64) % 251).reshape(h, w)[None].astype(
        np.uint8
    )
    out = str(tmp_path / "win.tif")
    write_ccog(spark, arr, out, blocksize=bs, nodata=255.0)

    win = (40, 20, 100, 70)  # spans tiles (0..2, x) x (0..2, y) partially
    df = read_cog_pixels(spark, out, window=win)
    rows = df.collect()
    x0, y0, x1, y1 = win
    assert len(rows) == (x1 - x0) * (y1 - y0)
    for r in rows[:200]:
        assert x0 <= r.x < x1 and y0 <= r.y < y1
        assert int(r.value) == (r.y * w + r.x) % 251
    # pruning: a 1-tile window reads exactly one tile's pixels and the
    # full-extent read sees all 15 tiles; compare index cardinality via
    # the number of distinct tile origins in the emitted coordinates
    one = read_cog_pixels(spark, out, window=(0, 0, 10, 10)).collect()
    assert len(one) == 100
    assert {(r.y // bs, r.x // bs) for r in one} == {(0, 0)}
    # invalid windows raise clearly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="window"):
        read_cog_pixels(spark, out, window=(0, 0, 1000, 10))


def test_windowed_read_color_chunky(spark, tmp_path):
    """bbox reads compose with pixel-interleaved color tiles."""
    import numpy as np

    from ccog_spark.raster.cog import write_ccog
    from ccog_spark.sources.cog_reader import read_cog_pixels

    y, x = np.mgrid[0:64, 0:64]
    ry, rx = (y * 255) // 63, (x * 255) // 63
    arr = np.stack([ry, rx, (ry + rx) // 2]).astype(np.uint8)
    out = str(tmp_path / "winc.tif")
    write_ccog(
        spark, arr, out, blocksize=32, nodata=255.0, codec="jpeg",
        compress_level=95, pixel_interleave=True,
    )
    got = read_cog_pixels(
        spark, out, bands=[1], window=(10, 40, 30, 60)
    ).collect()
    assert len(got) == 20 * 20
    err = max(
        abs(r.value - float(arr[1, r.y, r.x])) for r in got
    )
    assert err <= 24  # lossy tolerance, smooth ramps


def test_rebuild_cog_recompress_and_rekernel(spark, tmp_path):
    """rebuild_cog: level-0 pixels survive a full read->write cycle
    exactly (lossless codecs); overviews regenerate with the requested
    kernel; codec/level can change; sparse tiles stay sparse."""
    import numpy as np

    from ccog_spark.raster import tiff
    from ccog_spark.raster.cog import rebuild_cog, write_ccog
    from ccog_spark.raster.fixtures import pixels_df, W, H, BANDS, BLOCK
    from ccog_spark.raster.cog import write_cog

    src = str(tmp_path / "src.tif")
    write_cog(
        spark, pixels_df(spark), width=W, height=H, bands=BANDS,
        target_path=src, blocksize=BLOCK, kernel="average",
        nodata=-9999.0,
    )
    dst = str(tmp_path / "dst.tif")
    rebuild_cog(spark, src, dst, kernel="nearest", compress_level=1)
    a, b = open(src, "rb").read(), open(dst, "rb").read()
    ia, ib = tiff.read_cog(a), tiff.read_cog(b)
    assert len(ia) == len(ib)  # same pyramid depth
    for band in range(BANDS):
        pa = tiff.read_band(a, ia[0], band)
        pb = tiff.read_band(b, ib[0], band)
        assert np.array_equal(pa, pb)  # level 0 survives exactly
    # sparse tiles preserved (fixture has one all-invalid block/band)
    assert sum(1 for c in ib[0].bytecounts if c == 0) == sum(
        1 for c in ia[0].bytecounts if c == 0
    )
    # overviews differ (nearest vs average) but dims match
    assert (ib[1].width, ib[1].height) == (ia[1].width, ia[1].height)


def test_write_rebuild_without_declared_nodata(spark, tmp_path):
    """nodata=None → NO GDAL_NODATA tag in the file, padding/sparse
    fill 0 (GDAL's undeclared-nodata convention), every pixel valid on
    read; rebuild_cog passes the undeclared state through VERBATIM
    instead of inventing -9999.0 (which wraps to 241 for uint8 and
    would make real 241-valued pixels read back invalid — round-7
    ADVICE)."""
    from pyspark.sql import functions as F

    from ccog_spark.raster.cog import rebuild_cog, write_cog

    h = w = 64
    px = spark.range(h * w).select(
        F.lit(1).alias("band"),
        (F.col("id") / w).cast("int").alias("y"),
        (F.col("id") % w).cast("int").alias("x"),
        # covers 0..255 incl. 241, the uint8 wrap of -9999
        ((F.col("id") * 97) % 256).cast("double").alias("value"),
        F.lit(True).alias("valid"),
    )
    src = str(tmp_path / "nd_src.tif")
    write_cog(
        spark, px, width=w, height=h, bands=1, target_path=src,
        blocksize=32, nodata=None, dtype="uint8", n_overviews=1,
    )
    data_a = open(src, "rb").read()
    ia = tiff.read_cog(data_a)
    assert ia[0].nodata is None  # tag genuinely absent

    dst = str(tmp_path / "nd_dst.tif")
    rebuild_cog(spark, src, dst)
    data_b = open(dst, "rb").read()
    ib = tiff.read_cog(data_b)
    assert ib[0].nodata is None  # undeclared state survives rebuild
    assert np.array_equal(
        tiff.read_band(data_a, ia[0], 0), tiff.read_band(data_b, ib[0], 0)
    )
    rows = read_cog_pixels(spark, dst).collect()
    assert len(rows) == h * w
    assert all(r.valid for r in rows)  # 241 is a VALID pixel


def test_rebuild_color_jpeg_to_planar_deflate(spark, tmp_path):
    """rebuild_cog transcodes a pixel-interleaved YCbCr JPEG COG into
    planar deflate: the chunky distributed read feeds the planar write
    path, and pixels survive within the JPEG's own lossy tolerance
    (deflate adds nothing)."""
    from ccog_spark.raster.cog import rebuild_cog, write_ccog

    y, x = np.mgrid[0:32, 0:32]
    ry, rx = (y * 255) // 31, (x * 255) // 31
    arr = np.stack([ry, rx, (ry + rx) // 2]).astype(np.uint8)
    src = str(tmp_path / "color.tif")
    write_ccog(
        spark, arr, src, blocksize=32, nodata=255.0, codec="jpeg",
        compress_level=95, pixel_interleave=True,
    )
    dst = str(tmp_path / "planar.tif")
    rebuild_cog(spark, src, dst, codec="deflate")
    data = open(dst, "rb").read()
    ifds = [i for i in tiff.read_cog(data) if not tiff.is_mask_ifd(i)]
    assert ifds[0].compression == 8 and ifds[0].planar_config == 2
    assert ifds[0].bands == 3
    # decoded JPEG pixels re-encode losslessly: dst == src's decode
    src_data = open(src, "rb").read()
    src_ifd = tiff.read_cog(src_data)[0]
    for b in range(3):
        a = tiff.read_band(src_data, src_ifd, b)
        bnd = tiff.read_band(data, ifds[0], b)
        assert np.array_equal(a, bnd)
