"""Hypothesis property tests for the pure-Python codec layer."""

import struct
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from ccog_spark.raster.codecs import compress, decompress, lzw_decode, lzw_encode


@given(st.binary(max_size=4096))
@settings(deadline=None, max_examples=300)
def test_lzw_roundtrip_arbitrary_bytes(data):
    assert lzw_decode(lzw_encode(data)) == data


@given(st.binary(min_size=1, max_size=64))
@settings(deadline=None, max_examples=100)
def test_lzw_roundtrip_highly_repetitive(chunk):
    # long repeats drive the code-width switches and table clears
    data = chunk * (6000 // max(len(chunk), 1))
    assert lzw_decode(lzw_encode(data)) == data


@given(st.binary(max_size=2048), st.sampled_from(["deflate", "lzw", "lzma", "packbits"]))
@settings(deadline=None, max_examples=60)
def test_registry_roundtrip(data, codec):
    from ccog_spark.raster.codecs import CODEC_TAGS

    assert decompress(compress(data, codec), CODEC_TAGS[codec]) == data


@given(st.integers(1, 99), st.integers(1, 99), st.binary(min_size=1, max_size=64))
@settings(deadline=None, max_examples=100)
def test_multimodal_decode_fuzz(w, h, src):
    import pandas as pd

    from ccog_spark.operators.multimodal import make_decode_kernel

    need = w * h * 3
    body = (src * (need // len(src) + 1))[:need]
    ppm = b"P6\n%d %d\n255\n" % (w, h) + body
    stride = (w * 3 + 3) // 4 * 4
    bmp = (
        struct.pack("<2sIHHI", b"BM", 54 + stride * h, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0)
        + bytes(stride * h)
    )
    out = list(
        make_decode_kernel()(
            iter([pd.DataFrame({"doc_id": [1, 2], "payload": [ppm, bmp]})])
        )
    )[0]
    assert list(out["width"]) == [w, w]
    assert list(out["height"]) == [h, h]
    assert list(out["format"]) == ["ppm", "bmp"]


@given(st.binary(max_size=4096))
@settings(deadline=None, max_examples=300)
def test_packbits_roundtrip_arbitrary_bytes(data):
    from ccog_spark.raster.codecs import packbits_decode, packbits_encode

    assert packbits_decode(packbits_encode(data)) == data


def test_packbits_matches_tiff_spec_worked_example():
    """TIFF 6.0 §9 worked example: the packed stream decodes to the
    spec's unpacked bytes, and our encoder reproduces the spec's exact
    packing (runs ≥2 packed, literals break at the next ≥3 repeat)."""
    from ccog_spark.raster.codecs import packbits_decode, packbits_encode

    packed = bytes.fromhex("feaa0280002afdaa0380002a22f7aa")
    unpacked = (
        b"\xaa" * 3 + b"\x80\x00\x2a" + b"\xaa" * 4
        + b"\x80\x00\x2a\x22" + b"\xaa" * 10
    )
    assert packbits_decode(packed) == unpacked
    assert packbits_encode(unpacked) == packed


def test_packbits_truncated_streams_raise():
    import pytest

    from ccog_spark.raster.codecs import packbits_decode

    with pytest.raises(ValueError, match="truncated"):
        packbits_decode(b"\x05ab")  # literal claims 6 bytes, has 2
    with pytest.raises(ValueError, match="truncated"):
        packbits_decode(b"\xfe")  # repeat with no byte
    assert packbits_decode(b"\x80") == b""  # noop code
