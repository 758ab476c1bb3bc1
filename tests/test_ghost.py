"""GDAL ghost-optimisation parity (R5 + ghost retention/leader-trailer,
ccog/ccog.py:948-950, 430-441, 238-258): structural-metadata area,
per-tile size leaders / repeated trailers, delete + incompatible-
edition marking."""

import struct

import numpy as np
import pytest

from ccog_spark.raster import tiff
from ccog_spark.raster.cog import collect_cog_bytes
from ccog_spark.raster.fixtures import BANDS, BLOCK, H, W, pixels_df


@pytest.fixture(scope="module")
def ghost_file(spark):
    data, plan = collect_cog_bytes(
        spark, pixels_df(spark), W, H, BANDS, blocksize=BLOCK
        , ghost=True
    )
    return data, plan


def test_ghost_block_is_canonical():
    gb = tiff.ghost_block()
    assert gb.startswith(b"GDAL_STRUCTURAL_METADATA_SIZE=000140 bytes\n")
    # the size line is exactly the 43 bytes the reference's delete
    # path hard-codes (ccog/ccog.py:238-258)
    assert gb.index(b"\n") + 1 == 43
    assert len(gb) == 43 + 140


def test_ghost_area_and_ifd_pointer(ghost_file):
    data, plan = ghost_file
    assert data[8 : 8 + 30] == b"GDAL_STRUCTURAL_METADATA_SIZE="
    meta = tiff.read_ghost_metadata(data)
    assert meta == {
        "LAYOUT": "IFDS_BEFORE_DATA",
        "BLOCK_ORDER": "ROW_MAJOR",
        "BLOCK_LEADER": "SIZE_AS_UINT4",
        "BLOCK_TRAILER": "LAST_4_BYTES_REPEATED",
        "KNOWN_INCOMPATIBLE_EDITION": "NO",
    }
    (ifd0,) = struct.unpack_from("<I", data, 4)
    assert ifd0 >= 8 + len(tiff.ghost_block())


def test_ghost_leaders_and_trailers(ghost_file):
    data, plan = ghost_file
    checked = 0
    for lp in plan.levels:
        for i, off in enumerate(lp.offsets):
            nb = lp.bytecounts[i]
            if nb == 0:
                continue
            (leader,) = struct.unpack_from("<I", data, off - 4)
            assert leader == nb
            assert data[off + nb : off + nb + 4] == data[off + nb - 4 : off + nb]
            checked += 1
    assert checked > 4  # multiple tiles across levels actually checked


def test_ghost_file_parses_and_decodes(ghost_file):
    """Offsets point at tile DATA, so the normal reader is unaffected."""
    data, plan = ghost_file
    ifds = tiff.read_cog(data)
    assert len(ifds) == len(plan.levels)
    arr = tiff.read_band(data, ifds[0], 0)
    assert arr.shape == (H, W)
    assert np.isfinite(arr).any()


def test_ghost_matches_plain_pixels(spark):
    """Ghost on/off must decode to identical pixels — only layout
    framing differs."""
    plain, _ = collect_cog_bytes(
        spark, pixels_df(spark), W, H, BANDS, blocksize=BLOCK
    )
    ghosted, _ = collect_cog_bytes(
        spark, pixels_df(spark), W, H, BANDS, blocksize=BLOCK, ghost=True
    )
    pa = tiff.read_band(plain, tiff.read_cog(plain)[0], 0)
    ga = tiff.read_band(ghosted, tiff.read_cog(ghosted)[0], 0)
    np.testing.assert_array_equal(
        np.nan_to_num(pa, nan=-1), np.nan_to_num(ga, nan=-1)
    )
    assert tiff.read_ghost_metadata(plain) is None


def test_zero_ghost_header_and_mark_incompatible(ghost_file):
    data, _ = ghost_file
    buf = bytearray(data)
    assert tiff.mark_incompatible_edition(buf)
    assert tiff.read_ghost_metadata(bytes(buf))[
        "KNOWN_INCOMPATIBLE_EDITION"
    ] == "YES"
    # delete path (≙ _delete_COG_ghost_header): blanks the whole area
    assert tiff.zero_ghost_header(buf)
    assert tiff.read_ghost_metadata(bytes(buf)) is None
    # the file still parses after either edit
    arr = tiff.read_band(bytes(buf), tiff.read_cog(bytes(buf))[0], 0)
    assert arr.shape == (H, W)
    # idempotence/absence
    assert not tiff.zero_ghost_header(buf)


def test_ghost_composes_with_internal_mask(spark, tmp_path):
    from ccog_spark.raster.cog import write_cog

    out = str(tmp_path / "gm.tif")
    res = write_cog(
        spark, pixels_df(spark), W, H, BANDS, out,
        blocksize=BLOCK, nodata=-9999.0, internal_mask=True, ghost=True,
    )
    data = open(out, "rb").read()
    assert tiff.read_ghost_metadata(data) is not None
    ifds = tiff.read_cog(data)
    masks = [i for i in ifds if tiff.is_mask_ifd(i)]
    assert masks  # interleaved mask pages survive
    # mask tiles carry leaders/trailers too
    checked = 0
    for mlp in res.plan.mask_levels:
        for i, off in enumerate(mlp.offsets):
            nb = mlp.bytecounts[i]
            if nb == 0:
                continue
            (leader,) = struct.unpack_from("<I", data, off - 4)
            assert leader == nb
            assert data[off + nb : off + nb + 4] == data[off + nb - 4 : off + nb]
            checked += 1
    assert checked > 0
    m = tiff.read_mask(data, masks[0])
    assert m.shape == (H, W)


def test_ghost_parser_never_crashes_on_fuzz():
    """Fuzz the ghost parsers with arbitrary/truncated prefixes:
    absent or malformed areas yield None/False — never an exception
    (a corrupt size line must not crash cleanup utilities)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    gb = tiff.ghost_block()

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=64), st.integers(0, len(gb)))
    def prop(prefix, cut):
        for data in (
            prefix,
            prefix[:8] + gb[:cut],
            b"II*\x00" + prefix,
        ):
            tiff.read_ghost_metadata(data)
            tiff.zero_ghost_header(bytearray(data))

    prop()
