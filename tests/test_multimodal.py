"""Multimodal decode: the kernel must really parse PPM/BMP containers."""

import struct

import pandas as pd
import pytest

from ccog_spark.operators.multimodal import make_decode_kernel, make_encode_kernel


def _decode_one(payload: bytes, doc_id: int = 1):
    batches = list(
        make_decode_kernel()(
            iter([pd.DataFrame({"doc_id": [doc_id], "payload": [payload]})])
        )
    )
    return batches[0].iloc[0]


def test_decode_handbuilt_ppm():
    # hand-built, NOT from the encoder — catches a parser that only
    # round-trips its own writer
    payload = b"P6\n21 34\n255\n" + bytes(21 * 34 * 3)
    row = _decode_one(payload)
    assert (row.width, row.height, row.channels, row.format) == (21, 34, 3, "ppm")
    assert row.n_bytes == len(payload)


def test_decode_handbuilt_bmp():
    w, h = 19, 7
    stride = (w * 3 + 3) // 4 * 4
    body = bytes(stride * h)
    payload = (
        struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
        + body
    )
    row = _decode_one(payload)
    assert (row.width, row.height, row.channels, row.format) == (19, 7, 3, "bmp")


def test_decode_bottom_up_bmp_height_is_positive():
    # top-down BMPs store a NEGATIVE height; decoded height must be abs
    payload = (
        struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 4, -6, 1, 24, 0, 0, 0, 0, 0, 0)
    )
    assert _decode_one(payload).height == 6


def test_decode_rejects_unknown_magic():
    with pytest.raises(ValueError, match="unknown image magic"):
        _decode_one(b"\x89PNG....")


def test_encode_decode_roundtrip_formats():
    pdf = pd.DataFrame({"doc_id": [2, 3], "text": ["hello world", "abc"]})
    enc = list(make_encode_kernel()(iter([pdf])))[0]
    dec = list(make_decode_kernel()(iter([enc])))[0]
    assert list(dec["format"]) == ["ppm", "bmp"]
    # dims follow the fixture geometry: w = id%48+16, h = 7*id%48+16
    assert list(dec["width"]) == [2 % 48 + 16, 3 % 48 + 16]
    assert list(dec["height"]) == [14 % 48 + 16, 21 % 48 + 16]
    assert list(dec["n_bytes"]) == [len(p) for p in enc["payload"]]
