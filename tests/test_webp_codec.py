"""Pure-Python WebP-lossless (VP8L, RFC 9649) codec: container bytes,
round-trips, fuzz, and the end-to-end COG path through the registry."""

import struct

import numpy as np
import pytest

from ccog_spark.raster import webpcodec as W


def _gradient(side=48):
    y, x = np.mgrid[0:side, 0:side]
    return ((x * 3 + y * 5) % 256).astype(np.uint8)


def test_container_structure():
    enc = W.encode(_gradient(16).tobytes())
    assert enc[:4] == b"RIFF" and enc[8:12] == b"WEBP"
    assert enc[12:16] == b"VP8L"
    (riff,) = struct.unpack_from("<I", enc, 4)
    assert riff == len(enc) - 8
    (vp8l,) = struct.unpack_from("<I", enc, 16)
    assert 20 + vp8l in (len(enc), len(enc) - 1)  # odd payload is padded
    assert enc[20] == 0x2F  # VP8L signature byte


def test_roundtrip_shapes_and_distributions():
    rng = np.random.default_rng(11)
    cases = [
        np.zeros((8, 8), np.uint8),
        np.full((8, 8), 255, np.uint8),
        np.tile(np.array([7, 250], np.uint8), (16, 8)),
        rng.integers(0, 256, (33, 33)).astype(np.uint8),
        rng.integers(120, 130, (64, 64)).astype(np.uint8),
        _gradient(31),
    ]
    for a in cases:
        raw = a.tobytes()
        assert W.decode(W.encode(raw)) == raw


def test_lossless_beats_raw_on_low_entropy():
    a = np.random.default_rng(3).integers(0, 4, (64, 64)).astype(np.uint8)
    assert len(W.encode(a.tobytes())) < len(a.tobytes()) // 2


def test_rejects_nonsquare_and_foreign():
    with pytest.raises(ValueError, match="square"):
        W.encode(b"12345")
    with pytest.raises(ValueError, match="WebP"):
        W.decode(b"nope")
    with pytest.raises(ValueError, match="VP8L"):
        W.decode(b"RIFF\x04\x00\x00\x00WEBPVP8 \x00\x00\x00\x00")


def test_hypothesis_fuzz_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        side=st.integers(1, 24),
        seed=st.integers(0, 2**31),
        lo=st.integers(0, 250),
        span=st.integers(1, 255),
    )
    def prop(side, seed, lo, span):
        rng = np.random.default_rng(seed)
        hi = min(256, lo + span)
        a = rng.integers(lo, hi, (side, side)).astype(np.uint8)
        assert W.decode(W.encode(a.tobytes())) == a.tobytes()

    prop()


@pytest.mark.slow
def test_webp_cog_end_to_end(spark, tmp_path):
    from ccog_spark.raster import tiff
    from ccog_spark.raster.cog import write_ccog
    from ccog_spark.raster.codecs import COMPRESSION_WEBP

    y, x = np.mgrid[0:80, 0:96]
    arr = (((x * 3 + y * 5) % 200) + 1).astype(np.uint8)[None]
    out = str(tmp_path / "webp.tif")
    res = write_ccog(
        spark, arr, out, blocksize=32, nodata=0.0, codec="webp",
        min_part_size=2 << 10,
    )
    assert res.n_parts >= 1
    data = open(out, "rb").read()
    ifds = tiff.read_cog(data)
    for ifd in ifds:
        assert ifd.compression == COMPRESSION_WEBP
    got = tiff.read_band(data, ifds[0], 0)
    # LOSSLESS: valid pixels must be bit-exact (nodata 0 -> NaN)
    valid = arr[0] != 0
    np.testing.assert_array_equal(got[valid], arr[0][valid])


def test_webp_requires_uint8(spark, tmp_path):
    from ccog_spark.raster.cog import write_ccog

    arr = np.ones((1, 16, 16), np.float64)
    with pytest.raises(ValueError, match="uint8"):
        write_ccog(
            spark, arr, str(tmp_path / "x.tif"), blocksize=16, codec="webp"
        )


def test_level_is_pinned_noop_and_lossy_refused():
    """Declared behavior (round-7 decision): VP8L has no quality knob,
    so ``level`` must be a bitwise NO-OP — never a silent fidelity
    change — and a lossy request must raise, not silently encode
    lossless."""
    rng = np.random.RandomState(3)
    data = rng.randint(0, 256, 16 * 16).astype(np.uint8).tobytes()
    outs = {W.encode(data, level) for level in (1, 6, 50, 99)}
    assert len(outs) == 1  # bitwise invariant to level
    assert W.decode(next(iter(outs))) == data  # and still exact
    with pytest.raises(ValueError, match="lossy.*not implemented|VP8"):
        W.encode(data, 75, lossy=True)
