"""Native pixel dtypes + TIFF predictors (R9/E23 parity round 2).

The reference forwards any numpy dtype into the rasterio profile
(ccog/ccog.py:952-955) and carries compress/predictor per overview
(_adjust_compression, ccog/ccog.py:452-478). These tests prove:
- write+read round-trip per dtype (uint8/uint16/int16/int32/float32),
- predictor 2 (integer) and 3 (float) byte-identical round-trips and
  actual byte shrinkage on smooth data,
- spec-valid edge tiles: every payload decompresses to the FULL
  blocksize² block (the ADVICE r01 interop bug),
- BigTIFF 8-byte offset arithmetic past the 4 GiB boundary (plan-level,
  no giant file written).
"""

from __future__ import annotations

import numpy as np
import pytest

from ccog_spark.raster import tiff
from ccog_spark.raster.cog import write_ccog, write_cog
from ccog_spark.raster.fixtures import BANDS, BLOCK, H, W, pixels_df

NODATA = -9999.0


@pytest.mark.parametrize(
    "dtype,nodata",
    [
        ("uint8", 255),
        ("uint16", 0),
        ("int16", -999),
        ("int32", -9999),
        ("float32", -9999.0),
    ],
)
def test_dtype_roundtrip(spark, tmp_path, dtype, nodata):
    rng = np.random.default_rng(11)
    dt = np.dtype(dtype)
    if dt.kind in "ui":
        lo, hi = np.iinfo(dt).min, np.iinfo(dt).max
        lo, hi = max(lo, -1000), min(hi, 200)  # keep clear of nodata
        arr = rng.integers(lo, hi, size=(2, 96, 160)).astype(dt)
        if nodata in (0, 255):
            arr = np.clip(arr, 1, 199)
    else:
        arr = np.round(rng.random((2, 96, 160)) * 100, 2).astype(dt)
    mask = rng.random((96, 160)) > 0.07
    out = str(tmp_path / f"{dtype}.tif")
    write_ccog(spark, arr, out, mask=mask, blocksize=32, nodata=float(nodata))
    data = open(out, "rb").read()
    ifds = tiff.read_cog(data)
    bits, sfmt, _ = tiff.DTYPES[dtype]
    assert ifds[0].bits_per_sample == bits
    assert ifds[0].sample_format == sfmt
    for b in range(2):
        got = tiff.read_band(data, ifds[0], b)
        assert got.dtype == np.dtype("<" + tiff.DTYPES[dtype][2])
        assert np.array_equal(got[mask], arr[b][mask])
        assert np.all(got[~mask] == dt.type(nodata))


def test_uint8_file_smaller_than_float64(spark, tmp_path):
    """The r01 gap in one number: a uint8 raster written as float64
    inflates 8× pre-compression; native dtype must shrink the file."""
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 200, size=(1, 96, 160)).astype("uint8")
    o8 = str(tmp_path / "u8.tif")
    o64 = str(tmp_path / "f64.tif")
    write_ccog(spark, arr, o8, blocksize=32, nodata=255.0)  # dtype inferred
    write_ccog(spark, arr, o64, blocksize=32, nodata=255.0, dtype="float64")
    import os

    assert os.path.getsize(o8) < os.path.getsize(o64) * 0.6


@pytest.mark.parametrize("dtype,predictor", [("int32", 2), ("uint16", 2),
                                             ("float64", 3), ("float32", 3)])
def test_predictor_roundtrip_and_shrink(spark, tmp_path, dtype, predictor):
    """Smooth gradient: horizontal differencing must shrink deflate
    output; pixels must round-trip exactly."""
    yy, xx = np.mgrid[0:96, 0:160]
    dt = np.dtype(dtype)
    if dt.kind == "f":
        # fractional smooth field: high-order mantissa bytes vary
        # slowly, which is exactly what the byte-plane predictor wrings
        # out (integer-valued floats would compress fine without it)
        base = yy * 0.3731 + xx * 0.2179
    else:
        base = (yy * 3 + xx * 2).astype("float64")
    arr = base.astype(dt)[None, :, :]
    o_pred = str(tmp_path / "pred.tif")
    o_none = str(tmp_path / "nopred.tif")
    write_ccog(spark, arr, o_pred, blocksize=32, nodata=-1.0
               if dt.kind != "u" else 65535.0, predictor=predictor)
    write_ccog(spark, arr, o_none, blocksize=32, nodata=-1.0
               if dt.kind != "u" else 65535.0)
    dp = open(o_pred, "rb").read()
    dn = open(o_none, "rb").read()
    assert len(dp) < len(dn)
    ip, in_ = tiff.read_cog(dp), tiff.read_cog(dn)
    assert ip[0].predictor == predictor and in_[0].predictor == 1
    got_p = tiff.read_band(dp, ip[0], 0)
    got_n = tiff.read_band(dn, in_[0], 0)
    assert np.array_equal(got_p, got_n)
    assert np.array_equal(got_p, arr[0])


def test_predict_unpredict_inverse_exhaustive():
    """Driver-side predictor kernels are exact inverses for every dtype,
    including wraparound-heavy random integer data."""
    rng = np.random.default_rng(9)
    for name, (bits, sfmt, ch) in tiff.DTYPES.items():
        dt = np.dtype("<" + ch)
        if dt.kind in "ui":
            info = np.iinfo(dt)
            arr = rng.integers(
                info.min, info.max, size=(16, 16), endpoint=True
            ).astype(dt)
            preds = (2,)
        else:
            arr = ((rng.random((16, 16)) - 0.5) * 1e6).astype(dt)
            preds = (3,)
        for p in (1,) + preds:
            raw = tiff.predict_tile(arr, p)
            back = tiff.unpredict_tile(raw, p, 16, 16, dt.str)
            assert np.array_equal(back, arr), (name, p)


def test_predictor_validation(spark, tmp_path):
    out = str(tmp_path / "x.tif")
    arr = np.zeros((32, 32), dtype="float64")
    with pytest.raises(ValueError, match="predictor=2 requires"):
        write_ccog(spark, arr, out, blocksize=32, predictor=2)
    with pytest.raises(ValueError, match="predictor=3 requires"):
        write_ccog(spark, arr.astype("int32"), out, blocksize=32, predictor=3)
    with pytest.raises(ValueError, match="not representable"):
        write_ccog(spark, arr.astype("uint8"), out, blocksize=32, nodata=-5.0)
    with pytest.raises(ValueError, match="unsupported dtype"):
        write_ccog(spark, arr, out, blocksize=32, dtype="complex128")


def test_edge_tiles_are_full_blocks(spark, tmp_path):
    """TIFF 6.0: every tile payload decompresses to blocksize² samples —
    edge tiles padded with nodata (the r01 ADVICE interop bug). Checked
    at every level of a ragged-size raster."""
    rng = np.random.default_rng(21)
    arr = rng.random((1, 70, 90))  # 70/32, 90/32 both ragged
    out = str(tmp_path / "ragged.tif")
    write_ccog(spark, arr, out, blocksize=32)
    data = open(out, "rb").read()
    for ifd in tiff.read_cog(data):
        itemsize = ifd.bits_per_sample // 8
        want = ifd.tile_width * ifd.tile_height * itemsize
        for off, cnt in zip(ifd.offsets, ifd.bytecounts):
            if cnt == 0:
                continue
            raw = tiff.decode_tile(data[off : off + cnt], ifd.compression)
            assert len(raw) == want
    # and the clip region still round-trips exactly
    got = tiff.read_band(data, tiff.read_cog(data)[0], 0)
    assert got.shape == (70, 90)
    assert np.array_equal(got, arr[0])


def test_overview_codec_and_predictor_switch(spark, tmp_path):
    """Per-overview compression options (R9): IFD 0 deflate+predictor 3,
    overviews lzma without predictor — tags and payloads both switch."""
    out = str(tmp_path / "mixed.tif")
    write_cog(
        spark, pixels_df(spark), W, H, BANDS, out, blocksize=BLOCK,
        nodata=NODATA, predictor=3, overview_predictor=1,
        codec="deflate", overview_codec="lzma",
    )
    data = open(out, "rb").read()
    ifds = tiff.read_cog(data)
    assert ifds[0].compression == tiff.COMPRESSION_DEFLATE
    assert ifds[0].predictor == 3
    assert all(i.compression == tiff.COMPRESSION_LZMA for i in ifds[1:])
    assert all(i.predictor == 1 for i in ifds[1:])
    # pixels identical to a plain write
    ref = str(tmp_path / "plain.tif")
    write_cog(spark, pixels_df(spark), W, H, BANDS, ref, blocksize=BLOCK,
              nodata=NODATA)
    dref = open(ref, "rb").read()
    iref = tiff.read_cog(dref)
    for lvl in range(len(ifds)):
        for b in range(BANDS):
            assert np.array_equal(
                tiff.read_band(data, ifds[lvl], b),
                tiff.read_band(dref, iref[lvl], b),
            )


def test_bigtiff_offsets_past_4gib():
    """8-byte offset arithmetic proven with a synthetic plan whose data
    region crosses 4 GiB — no giant file needed, the header/IFD bytes
    are what carry the wide offsets."""
    bs = 512
    w = h = 4 * bs  # 4×4 tiles
    nb = {}
    big_tile = 600 * 1024 * 1024  # 600 MiB × 16 tiles ≈ 9.4 GiB
    for ty in range(4):
        for tx in range(4):
            nb[(0, 0, ty, tx)] = big_tile
    plan = tiff.build_cog_plan(
        w, h, 1, bs, 0, nb, nodata=0.0, fmt="auto", dtype="uint8"
    )
    assert plan.total_size > (1 << 32)
    ifds = tiff.read_cog(plan.header)
    offs = [o for o in ifds[0].offsets if o > 0]
    assert offs == sorted(offs)
    assert offs[-1] > (1 << 32)
    assert offs[-1] + big_tile == plan.total_size
    # classic format must refuse the same plan
    with pytest.raises(ValueError, match="exceeds classic TIFF"):
        tiff.build_cog_plan(w, h, 1, bs, 0, nb, nodata=0.0, fmt="classic",
                            dtype="uint8")


# ---------------------------------------------------------------- codecs
def test_lzw_roundtrip_exhaustive():
    """Pure-Python TIFF LZW: inverse property across the regimes that
    exercise every code path — width bumps at 511/1023/2047 (early
    change), table clear at 4094, KwKwK self-referencing codes, empty
    and single-byte inputs."""
    from ccog_spark.raster.codecs import lzw_decode, lzw_encode

    rng = np.random.default_rng(7)
    cases = [
        b"",
        b"A",
        b"AAAA",
        b"ABABABABABAB",  # KwKwK pattern
        bytes(range(256)) * 3,
        rng.integers(0, 256, 20000, dtype=np.uint8).tobytes(),  # clears
        rng.integers(0, 4, 60000, dtype=np.uint8).tobytes(),  # long runs
        np.arange(8192, dtype="<f8").tobytes(),
    ]
    for data in cases:
        assert lzw_decode(lzw_encode(data)) == data


def test_lzw_cog_roundtrip(spark, tmp_path):
    """COG written with codec='lzw' (+ per-overview codec switch back to
    deflate) reads back pixel-identical; compression tags dispatch."""
    from ccog_spark.raster.codecs import COMPRESSION_DEFLATE, COMPRESSION_LZW

    px = pixels_df(spark)
    out = str(tmp_path / "lzw_cog.tif")
    write_cog(
        spark, px, W, H, BANDS, out, blocksize=BLOCK, nodata=NODATA,
        codec="lzw", overview_codec="deflate",
    )
    data = open(out, "rb").read()
    ifds = tiff.read_cog(data)
    assert ifds[0].compression == COMPRESSION_LZW
    assert ifds[1].compression == COMPRESSION_DEFLATE
    rows = pixels_df(spark).collect()
    want = np.full((BANDS, H, W), NODATA)
    for r in rows:
        if r.valid:
            want[r.band - 1, r.y, r.x] = r.value
    got = np.stack([tiff.read_band(data, ifds[0], b) for b in range(BANDS)])
    assert np.array_equal(got, want)


def test_lzw_with_predictor2_uint8(spark, tmp_path):
    """LZW + horizontal differencing on a native uint8 raster — the
    classic GDAL profile pairing."""
    from ccog_spark.raster.codecs import COMPRESSION_LZW
    from pyspark.sql import functions as F

    px = pixels_df(spark).select(
        "band", "y", "x",
        (F.floor(F.col("value")) % 200).cast("double").alias("value"),
        "valid",
    )
    out = str(tmp_path / "lzw_u8.tif")
    write_cog(
        spark, px, W, H, BANDS, out, blocksize=BLOCK, nodata=255.0,
        codec="lzw", dtype="uint8", predictor=2,
    )
    data = open(out, "rb").read()
    ifds = tiff.read_cog(data)
    assert ifds[0].compression == COMPRESSION_LZW
    assert ifds[0].predictor == 2 and ifds[0].bits_per_sample == 8
    got = tiff.read_band(data, ifds[0], 0)
    assert got.dtype == np.uint8


def test_zstd_codec_gated(tmp_path):
    """zstd is wired through tag 50000 but the module is optional; a
    clear ImportError (not a crash) when absent, full round-trip when
    present."""
    from ccog_spark.raster import codecs

    try:
        import zstandard  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="zstandard"):
            codecs.compress(b"xyz" * 100, "zstd")
        return
    enc = codecs.compress(b"xyz" * 100, "zstd")
    assert codecs.decompress(enc, codecs.COMPRESSION_ZSTD) == b"xyz" * 100


def test_native_dtype_tile_payloads(spark):
    """uint8 tiles carry 1-byte samples through the shuffle (8x less
    in-flight than the old float64 working blocks); float64 unchanged."""
    from ccog_spark.raster.tiles import tiles_from_pixels

    px = pixels_df(spark)
    t8 = tiles_from_pixels(px, BLOCK, 255.0, W, H, dtype="uint8").first()
    t64 = tiles_from_pixels(px, BLOCK, NODATA, W, H).first()
    assert len(t8.data) == BLOCK * BLOCK
    assert len(t64.data) == BLOCK * BLOCK * 8
