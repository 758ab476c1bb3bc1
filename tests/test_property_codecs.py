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


@given(st.binary(max_size=2048), st.sampled_from(["deflate", "lzw", "lzma"]))
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
