"""Codec registry + the shared-JPEGTables invariant scaffold.

The container has no JPEG library, so the end-to-end path is exercised
by registering a synthetic tables-carrying codec in the 'jpeg' slot —
exactly the move a real deployment makes — and writing/parsing a COG
with it. The invariant (every independently-encoded part derives
byte-identical global tables, ≙ ccog _test_jpegtables,
/root/reference/ccog/ccog.py:261-289) is tested both ways.
"""

import zlib

import pytest

from ccog_spark.raster import codecs
from ccog_spark.raster.codecs import (
    COMPRESSION_JPEG,
    CodecSpec,
    check_shared_tables,
    register_codec,
    shared_tables,
)

FAKE_TABLES = b"\xff\xd8\xff\xdb" + bytes(range(64))  # DQT-ish blob


def _fake_decode(d: bytes) -> bytes:
    # the reader prepends the IFD's JPEGTables for tables-carrying
    # codecs (abbreviated-stream contract); strip it back off
    if d.startswith(FAKE_TABLES):
        d = d[len(FAKE_TABLES) + 1 :]
    return zlib.decompress(d)


@pytest.fixture
def fake_jpeg_codec():
    """Install a deterministic stand-in codec in the jpeg slot; restore
    the real pure-numpy spec afterwards."""
    saved = codecs.REGISTRY["jpeg"]
    register_codec(
        CodecSpec(
            "jpeg",
            COMPRESSION_JPEG,
            encode=lambda d, lv: zlib.compress(d, 6),
            decode=_fake_decode,
            make_tables=lambda lv: FAKE_TABLES + bytes([lv]),
        )
    )
    yield
    register_codec(saved)


def test_webp_slot_is_live():
    """The webp slot now holds the real pure-Python VP8L codec
    (round 6): registry round-trip works; non-square input raises
    the codec's own validation error (not 'unavailable')."""
    import numpy as np

    a = np.arange(256, dtype=np.uint8).reshape(16, 16).tobytes()
    assert codecs.decompress(
        codecs.compress(a, "webp"), codecs.COMPRESSION_WEBP
    ) == a
    with pytest.raises(ValueError, match="square"):
        codecs.compress(b"xx", "webp")


def test_jpeg_slot_is_live():
    """The jpeg slot now holds the real pure-numpy codec (round 6):
    compress/decompress work through the registry with shared tables."""
    import numpy as np

    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    enc = codecs.compress(img.tobytes(), "jpeg", 90)
    tables = shared_tables("jpeg", 90)
    assert tables is not None and tables.startswith(b"\xff\xd8")
    dec = np.frombuffer(
        codecs.decompress(enc, COMPRESSION_JPEG, tables=tables), np.uint8
    )
    assert dec.shape == (256,)
    assert np.abs(dec.astype(int) - img.reshape(-1).astype(int)).max() <= 12


def test_shared_tables_none_for_tableless():
    assert shared_tables("deflate", 6) is None
    assert shared_tables("lzw", 6) is None


def test_check_shared_tables_mismatch():
    with pytest.raises(ValueError, match="different JPEGTables"):
        check_shared_tables(b"aa", b"ab")


def test_cog_with_tables_codec_roundtrip(spark, tmp_path, fake_jpeg_codec):
    from ccog_spark.raster.cog import write_cog
    from ccog_spark.raster.fixtures import BANDS, BLOCK, H, W, pixels_df

    NODATA = -9999.0
    from ccog_spark.raster.tiff import read_band, read_cog

    out = str(tmp_path / "tables.tif")
    res = write_cog(
        spark, pixels_df(spark), width=W, height=H, bands=BANDS,
        target_path=out, blocksize=BLOCK, nodata=NODATA, codec="jpeg",
        compress_level=6,
    )
    with open(res.path, "rb") as f:
        data = f.read()
    ifds = read_cog(data)
    # every IFD references the one global JPEGTables copy
    assert all(i.jpeg_tables == FAKE_TABLES + bytes([6]) for i in ifds)
    assert all(i.compression == COMPRESSION_JPEG for i in ifds)
    # tiles decode through the registry (registered decode fn)
    arr = read_band(data, ifds[0], band=0)
    assert arr.shape == (H, W)


def test_per_part_tables_mismatch_fails(spark, tmp_path):
    """A codec whose tables depend on call order violates the
    invariant: the executor-side derivation differs from the plan's
    and the write must abort with the reference's error."""
    saved = codecs.REGISTRY["jpeg"]
    calls = []

    def unstable_tables(lv):
        calls.append(lv)
        return FAKE_TABLES + bytes([len(calls) % 7])

    register_codec(
        CodecSpec(
            "jpeg",
            COMPRESSION_JPEG,
            encode=lambda d, lv: zlib.compress(d, 6),
            decode=zlib.decompress,
            make_tables=unstable_tables,
        )
    )
    try:
        from ccog_spark.raster.cog import write_cog
        from ccog_spark.raster.fixtures import (
            BANDS, BLOCK, H, W, pixels_df,
        )

        NODATA = -9999.0

        with pytest.raises(Exception, match="different JPEGTables"):
            write_cog(
                spark, pixels_df(spark), width=W, height=H, bands=BANDS,
                target_path=str(tmp_path / "bad.tif"), blocksize=BLOCK,
                nodata=NODATA, codec="jpeg",
            )
    finally:
        register_codec(saved)


def test_overview_codec_carries_its_own_tables(spark, tmp_path, fake_jpeg_codec):
    """deflate level 0 + tables-carrying overview codec: the overview
    IFDs must reference REAL tables (and IFD 0 none) — previously the
    tables were derived from the level-0 codec only, leaving overview
    tiles undecodable (ADVICE r5)."""
    from ccog_spark.raster.cog import write_cog
    from ccog_spark.raster.fixtures import BANDS, BLOCK, H, W, pixels_df
    from ccog_spark.raster.tiff import COMPRESSION_DEFLATE, read_cog

    out = str(tmp_path / "ovtables.tif")
    res = write_cog(
        spark, pixels_df(spark), width=W, height=H, bands=BANDS,
        target_path=out, blocksize=BLOCK, nodata=-9999.0,
        codec="deflate", overview_codec="jpeg",
        compress_level=6, overview_compress_level=3,
    )
    with open(res.path, "rb") as f:
        ifds = read_cog(f.read())
    assert ifds[0].compression == COMPRESSION_DEFLATE
    assert ifds[0].jpeg_tables is None
    for i in ifds[1:]:
        assert i.compression == COMPRESSION_JPEG
        # tables derived at the OVERVIEW level (3), not level 0's 6
        assert i.jpeg_tables == FAKE_TABLES + bytes([3])


def test_differing_level_tables_stored_separately(spark, tmp_path, fake_jpeg_codec):
    """jpeg at two quality levels: IFD 0 and overview IFDs reference
    two distinct external JPEGTables copies."""
    from ccog_spark.raster.cog import write_cog
    from ccog_spark.raster.fixtures import BANDS, BLOCK, H, W, pixels_df
    from ccog_spark.raster.tiff import read_cog

    out = str(tmp_path / "twotables.tif")
    res = write_cog(
        spark, pixels_df(spark), width=W, height=H, bands=BANDS,
        target_path=out, blocksize=BLOCK, nodata=-9999.0,
        codec="jpeg", compress_level=6, overview_compress_level=2,
    )
    with open(res.path, "rb") as f:
        ifds = read_cog(f.read())
    assert ifds[0].jpeg_tables == FAKE_TABLES + bytes([6])
    for i in ifds[1:]:
        assert i.jpeg_tables == FAKE_TABLES + bytes([2])
