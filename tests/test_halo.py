"""Tiling-invariance proof for the halo-exchange cubic kernel (E21):
the distributed tiled+halo result must exactly equal the same
convolution applied to the whole untiled array on the driver."""

from __future__ import annotations

import numpy as np

from ccog_spark.raster.fixtures import BANDS, BLOCK, H, W, pixels_df
from ccog_spark.raster.halo import cubic_decimate, cubic_decimate_reference
from ccog_spark.raster.tiles import tiles_from_pixels

NODATA = -9999.0


def test_cubic_decimate_matches_untiled_reference(spark):
    px = pixels_df(spark)
    tiles = tiles_from_pixels(px, BLOCK, NODATA)
    out = cubic_decimate(tiles, BLOCK, NODATA).collect()

    # driver-side untiled reference per band
    rows = px.collect()
    for band in range(1, BANDS + 1):
        arr = np.full((H, W), NODATA)
        ok = np.zeros((H, W), dtype=bool)
        for r in rows:
            if r.band == band:
                if r.valid:
                    arr[r.y, r.x] = r.value
                    ok[r.y, r.x] = True
        ref_val, ref_ok = cubic_decimate_reference(arr, ok, NODATA)

        got = {(r.y, r.x): (r.value, r.valid) for r in out if r.band == band}
        assert len(got) == (H // 2) * (W // 2)
        for (y, x), (v, valid) in got.items():
            assert valid == bool(ref_ok[y, x]), (band, y, x)
            if valid:
                assert v == ref_val[y, x], (band, y, x, v, ref_val[y, x])


def test_cubic_valid_region_shrinks_at_invalid_blocks(spark):
    """Output pixels whose 4x4 stencil touches the invalid 32x32 block
    must be invalid — the kernel must not hallucinate across nodata."""
    px = pixels_df(spark)
    tiles = tiles_from_pixels(px, BLOCK, NODATA)
    out = cubic_decimate(tiles, BLOCK, NODATA).collect()
    # band 1's invalid block is block_id 3 → tile (0, 3): y 0..31, x 96..127
    # decimated: y 0..15, x 48..63 — all invalid, plus a 1-px fringe
    inner = [r for r in out if r.band == 1 and 0 <= r.y < 16 and 48 <= r.x < 64]
    assert inner and all(not r.valid for r in inner)
    # far from the block: mostly valid
    far = [r for r in out if r.band == 1 and r.y > 20 and r.x < 40]
    assert sum(r.valid for r in far) > len(far) * 0.5


import pytest


@pytest.mark.parametrize("kernel", ["bilinear", "cubicspline", "lanczos", "gauss"])
def test_interp_kernels_tiling_invariance(spark, kernel):
    """Every interpolating kernel: distributed tiled+halo result equals
    the untiled driver-side convolution exactly (halo widths differ per
    kernel — lanczos strips cross 3 px of the neighbour)."""
    from ccog_spark.raster.halo import interp_decimate, interp_decimate_reference

    px = pixels_df(spark)
    tiles = tiles_from_pixels(px, BLOCK, NODATA)
    out = interp_decimate(tiles, BLOCK, kernel, NODATA).collect()

    rows = px.collect()
    band = 2
    arr = np.full((H, W), NODATA)
    ok = np.zeros((H, W), dtype=bool)
    for r in rows:
        if r.band == band and r.valid:
            arr[r.y, r.x] = r.value
            ok[r.y, r.x] = True
    ref_val, ref_ok = interp_decimate_reference(arr, ok, kernel, NODATA)
    got = {(r.y, r.x): (r.value, r.valid) for r in out if r.band == band}
    assert len(got) == (H // 2) * (W // 2)
    for (y, x), (v, valid) in got.items():
        assert valid == bool(ref_ok[y, x]), (kernel, y, x)
        if valid:
            assert v == ref_val[y, x], (kernel, y, x)


def test_lanczos_taps_normalized():
    from ccog_spark.raster.halo import LANCZOS_TAPS

    assert abs(sum(LANCZOS_TAPS) - 1.0) < 1e-12
    assert len(LANCZOS_TAPS) == 6


def test_cubicspline_taps_exact():
    """B-spline basis at half-phase distances: B(0.5)=23/48, B(1.5)=1/48,
    summing to exactly 1 (no normalization residue)."""
    from ccog_spark.raster.halo import CUBICSPLINE_TAPS

    assert CUBICSPLINE_TAPS == (1 / 48, 23 / 48, 23 / 48, 1 / 48)
    assert sum(CUBICSPLINE_TAPS) == 1.0
