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


# ----------------------- round 6: feature-extract / resize / frame-sample


def _payloads_df(spark, n=6):
    from ccog_spark.operators.multimodal import attach_payload

    docs = spark.createDataFrame(
        [(i, f"text for document {i} " * (i + 1)) for i in range(n)],
        ["doc_id", "text"],
    )
    return attach_payload(docs)


def test_image_features_match_numpy(spark):
    """Spark feature rows must equal a direct numpy computation on the
    same decoded pixels (PPM and BMP paths both exercised)."""
    import numpy as np

    from ccog_spark.operators.multimodal import image_features

    pay = _payloads_df(spark).persist()
    rows = {r.doc_id: r for r in image_features(pay).collect()}
    raw = {r.doc_id: bytes(r.payload) for r in pay.collect()}
    pay.unpersist()
    assert len(rows) == 6
    for doc_id, payload in raw.items():
        if payload[:2] == b"P6":
            toks = payload[2:32].split(None, 3)
            w, h = int(toks[0]), int(toks[1])
            hdr = payload.index(b"255\n") + 4
            px = np.frombuffer(payload, np.uint8, w * h * 3, hdr).reshape(
                h, w, 3
            )
        else:
            import struct as st

            (off,) = st.unpack_from("<I", payload, 10)
            (w,) = st.unpack_from("<i", payload, 18)
            (h,) = st.unpack_from("<i", payload, 22)
            stride = (w * 3 + 3) // 4 * 4
            px = (
                np.frombuffer(payload, np.uint8, stride * h, off)
                .reshape(h, stride)[:, : w * 3]
                .reshape(h, w, 3)[::-1][:, :, ::-1]
            )
        r = rows[doc_id]
        fpx = px.astype(np.float64)
        lum = fpx.mean(axis=2)
        assert (r.width, r.height) == (px.shape[1], px.shape[0])
        assert abs(r.mean - lum.mean()) < 1e-9
        assert abs(r.std - lum.std()) < 1e-9
        assert abs(r.mean_r - fpx[:, :, 0].mean()) < 1e-9
        hist = np.bincount(
            (lum * 8 / 256.0).astype(np.int64).clip(0, 7).ravel(),
            minlength=8,
        )
        assert list(r.hist) == hist.tolist()
        assert sum(r.hist) == px.shape[0] * px.shape[1]


@pytest.mark.slow
def test_resize_nearest_neighbour_exact(spark):
    import numpy as np

    from ccog_spark.operators.multimodal import image_features, resize_images

    pay = _payloads_df(spark).persist()
    out = resize_images(pay, 24, 12)
    rows = {r.doc_id: bytes(r.payload) for r in out.collect()}
    raw = {r.doc_id: bytes(r.payload) for r in pay.collect()}
    pay.unpersist()
    for doc_id, rp in rows.items():
        assert rp[:2] == b"P6"
        toks = rp[2:32].split(None, 3)
        assert (int(toks[0]), int(toks[1])) == (24, 12)
        # nearest-neighbour: corner pixel (0,0) survives any resize
        src = raw[doc_id]
        if src[:2] == b"P6":
            hdr = src.index(b"255\n") + 4
            first_src = src[hdr : hdr + 3]
            rhdr = rp.index(b"255\n") + 4
            assert rp[rhdr : rhdr + 3] == first_src
    # features compose downstream of resize (pipeline shape)
    feats = image_features(resize_images(pay, 24, 12)).collect()
    assert all((r.width, r.height) == (24, 12) for r in feats)


def test_frame_sampling_every_k(spark):
    import struct as st

    from ccog_spark.operators.multimodal import attach_video, sample_frames

    docs = spark.createDataFrame(
        [(i,) for i in range(8)], ["doc_id"]
    )
    vids = attach_video(docs).persist()
    counts = {
        r.doc_id: st.unpack_from("<I", bytes(r.payload), 4)[0]
        for r in vids.collect()
    }
    sampled = sample_frames(vids, every=2).collect()
    vids.unpersist()
    got = {}
    for r in sampled:
        got.setdefault(r.doc_id, []).append(r.frame_idx)
        # each sampled frame is a standalone PPM with the fixture bytes
        p = bytes(r.payload)
        assert p[:2] == b"P6"
        hdr = p.index(b"255\n") + 4
        expect0 = (r.doc_id * 31 + r.frame_idx * 7) % 256
        assert p[hdr] == expect0
    for doc_id, n in counts.items():
        assert sorted(got[doc_id]) == list(range(0, n, 2))


def test_frame_sample_rejects_non_video(spark):
    import pytest as pt

    from ccog_spark.operators.multimodal import sample_frames

    bad = _payloads_df(spark)  # PPM/BMP, not FSTK
    with pt.raises(Exception, match="FSTK"):
        sample_frames(bad).collect()


def test_decode_pixels_height_255_no_false_match():
    """Regression (round-6 review): a height whose ASCII ends in 255
    must not be mistaken for the maxval token when locating the body."""
    import numpy as np

    from ccog_spark.operators.multimodal import decode_pixels

    w, h = 4, 255
    body = np.arange(w * h * 3, dtype=np.uint32).astype(np.uint8)
    payload = b"P6\n%d %d\n255\n" % (w, h) + body.tobytes()
    px = decode_pixels(payload)
    assert px.shape == (h, w, 3)
    assert px.ravel()[0] == body[0] and px.ravel()[-1] == body[-1]


# --------------------------------------------------------------- audio
def test_audio_wav_container_bytes(spark):
    """WAV fixture payloads are structurally valid RIFF/PCM16 and the
    feature kernel's numbers match a direct numpy recomputation."""
    import struct

    import numpy as np

    from ccog_spark.catalog import load_table
    from ccog_spark.operators.multimodal import attach_audio, audio_features
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(8)
    wav = attach_audio(docs)
    rows = {r.doc_id: r for r in audio_features(wav).collect()}
    for r in wav.collect():
        p = bytes(r.payload)
        assert p[:4] == b"RIFF" and p[8:12] == b"WAVE"
        (riff_len,) = struct.unpack_from("<I", p, 4)
        assert riff_len == len(p) - 8
        d = int(r.doc_id)
        n = 2048 + d % 1024
        i = np.arange(n, dtype=np.int64)
        s = ((d * 13 + i * i) % 65536 - 32768).astype(np.float64)
        f = rows[r.doc_id]
        assert f.n_bytes == 44 + 2 * n and f.n_samples == n
        assert f.sample_rate == 8000 * (d % 3 + 1)
        assert f.peak == int(np.abs(s).max())
        assert abs(f.rms - float(np.sqrt(np.mean(s * s)))) < 1e-9
        nonneg = s >= 0
        assert f.zero_crossings == int((nonneg[1:] != nonneg[:-1]).sum())


def test_audio_riff_walk_skips_foreign_chunks():
    """The parser must walk chunk-by-chunk (incl. odd-length word
    alignment), not assume data at offset 44."""
    import struct

    import numpy as np
    import pandas as pd

    from ccog_spark.operators.multimodal import make_audio_features_kernel

    s = np.array([100, -200, 300, -400, 500], dtype="<i2")
    data = s.tobytes()
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd, padded
    payload = (
        b"RIFF"
        + struct.pack("<I", 4 + len(fmt) + len(junk) + 8 + len(data))
        + b"WAVE"
        + junk
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    out = pd.concat(
        make_audio_features_kernel()(
            iter([pd.DataFrame({"doc_id": [1], "payload": [payload]})])
        )
    )
    r = out.iloc[0]
    assert r.n_samples == 5 and r.peak == 500 and r.zero_crossings == 4


def test_audio_rejects_non_wav():
    import pandas as pd
    import pytest as pt

    from ccog_spark.operators.multimodal import make_audio_features_kernel

    with pt.raises(ValueError, match="RIFF"):
        list(
            make_audio_features_kernel()(
                iter([pd.DataFrame({"doc_id": [1], "payload": [b"nope"]})])
            )
        )


def test_decode_pixels_truncated_header_raises():
    """Regression (round-6 review): a header cut before maxval used to
    spin the token scan forever; it must raise instead."""
    import pytest as pt

    from ccog_spark.operators.multimodal import decode_pixels

    for bad in (b"P6\n16 16", b"P6\n16", b"P6\n", b"P6"):
        with pt.raises(ValueError, match="truncated PPM header"):
            decode_pixels(bad)


def test_frame_sample_rejects_bad_every():
    import pytest as pt

    from ccog_spark.operators.multimodal import make_frame_sample_kernel

    for every in (0, -1):
        with pt.raises(ValueError, match="every"):
            make_frame_sample_kernel(every)


def test_container_walks_fail_loudly_on_truncation():
    """Truncated WAV/FSTK payloads raise instead of silently parsing
    fewer samples/frames (declared chunk/frame lengths are validated
    against the available bytes)."""
    import pandas as pd
    import pytest as pt

    from ccog_spark.operators.multimodal import (
        make_audio_features_kernel,
        make_audio_kernel,
        make_frame_sample_kernel,
        make_video_kernel,
    )

    wav = bytes(
        list(make_audio_kernel()(iter([pd.DataFrame({"doc_id": [3]})])))[0][
            "payload"
        ][0]
    )
    vid = bytes(
        list(make_video_kernel()(iter([pd.DataFrame({"doc_id": [3]})])))[0][
            "payload"
        ][0]
    )
    for payload, kernel, msg in (
        (wav, make_audio_features_kernel(), "truncated|missing"),
        (vid, make_frame_sample_kernel(2), "truncated|FSTK"),
    ):
        for cut in (20, len(payload) // 2, len(payload) - 3):
            bad = payload[:cut]
            with pt.raises(ValueError, match=msg):
                list(
                    kernel(
                        iter([pd.DataFrame({"doc_id": [3], "payload": [bad]})])
                    )
                )


# ------------------------------------------------------------ PNG
def test_png_roundtrip_all_filters():
    import numpy as np

    from ccog_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(3)
    for shape, ct in [((13, 7, 3), 2), ((8, 9), 0), ((5, 6, 4), 6)]:
        arr = rng.randint(0, 256, size=shape).astype(np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            payload = encode_png(arr, color_type=ct, filters=filters)
            out = decode_png(payload)
            a3 = arr
            if a3.ndim == 2:
                a3 = np.repeat(a3[:, :, None], 3, axis=2)
            elif a3.shape[2] == 4:
                a3 = a3[:, :, :3]
            assert out.shape == a3.shape, (shape, ct, filters)
            assert (out == a3).all(), (shape, ct, filters)


def test_png_flows_through_pixel_kernels(spark):
    import numpy as np

    from ccog_spark.operators import multimodal as mm

    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    payload = encode = mm.encode_png(arr, filters=[0, 1, 2, 3, 4])
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    feats = mm.image_features(df).collect()[0]
    assert feats.width == 16 and feats.height == 16
    assert abs(feats.mean - float(arr.mean())) < 0.51
    resized = mm.resize_images(df, 4, 4).collect()[0]
    assert resized.width == 4 and resized.height == 4


def test_png_rejects_malformed():
    import pytest as _pytest

    from ccog_spark.operators.multimodal import PNG_SIG, decode_png, encode_png
    import numpy as np

    good = encode_png(np.zeros((4, 4, 3), np.uint8))
    with _pytest.raises(ValueError, match="signature"):
        decode_png(b"nope" + good)
    with _pytest.raises(ValueError, match="truncated"):
        decode_png(good[:20])
    # corrupt declared IHDR width → IDAT length mismatch
    bad = bytearray(good)
    bad[16:20] = (99).to_bytes(4, "big")
    import struct, zlib
    body = bytes(bad[12:29])  # recompute IHDR crc so the walk proceeds
    bad[29:33] = struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    with _pytest.raises(ValueError, match="match"):
        decode_png(bytes(bad))


# ------------------------------------------------------------ JPEG
def test_jpeg_gray_through_pixel_kernels(spark):
    import numpy as np

    from ccog_spark.operators import multimodal as mm
    from ccog_spark.raster import jpegcodec

    rng = np.random.RandomState(11)
    # smooth gradient tile: quantization error stays small
    side = 16
    base = np.linspace(40, 200, side * side).reshape(side, side)
    tile = (base + rng.randint(0, 5, (side, side))).astype(np.uint8)
    payload = jpegcodec.make_tables(90) + jpegcodec.encode(
        tile.tobytes(), 90
    )
    px = mm.decode_pixels(payload)
    assert px.shape == (side, side, 3)
    assert abs(px[:, :, 0].astype(float).mean() - tile.mean()) < 3.0
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    feats = mm.image_features(df).collect()[0]
    assert feats.width == side and feats.height == side


def test_jpeg_color_through_pixel_kernels(spark):
    """Color YCbCr JPEG payloads (the crawl-image shape) decode to RGB
    through the SAME multimodal kernels as the other containers —
    round-7 upgrade from the grayscale-only era."""
    import numpy as np

    from ccog_spark.operators import multimodal as mm
    from ccog_spark.raster import jpegcodec

    side = 32
    y, x = np.mgrid[0:side, 0:side]
    rgb = np.stack(
        [(y * 255) // 31, (x * 255) // 31, ((y + x) * 255) // 62], axis=-1
    ).astype(np.uint8)
    payload = jpegcodec.make_tables(90) + jpegcodec.encode_color(
        rgb.tobytes(), 90, subsampling="420"
    )
    px = mm.decode_pixels(payload)
    assert px.shape == (side, side, 3)
    assert np.abs(px.astype(int) - rgb.astype(int)).max() <= 24
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    feats = mm.image_features(df).collect()[0]
    assert feats.width == side and feats.height == side
    assert abs(feats.mean - rgb.astype(float).mean()) < 4.0


def test_jpeg_progressive_and_sos_stop():
    """Non-baseline SOF markers are reported explicitly, and the
    segment walk never scans past SOS into entropy-coded data (scan
    bytes are not segment lengths)."""
    import pytest as _pytest

    from ccog_spark.operators.multimodal import decode_jpeg_gray

    # progressive SOF2 → explicit 'non-baseline' error, not a
    # misleading walk-to-EOF 'no SOF0'
    sof2 = b"\xff\xd8" + b"\xff\xc2" + (11).to_bytes(2, "big") + bytes(
        [8]
    ) + (16).to_bytes(2, "big") + (16).to_bytes(2, "big") + bytes([1])
    with _pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg_gray(sof2)

    # SOS with no SOF before it: entropy bytes crafted so that, if the
    # walker kept going, 0xFF 0xFE would parse as a COM whose bogus
    # length runs off the end — the correct behavior is to stop at SOS
    # and raise the honest 'without SOF0'
    sos = b"\xff\xd8" + b"\xff\xda" + (8).to_bytes(2, "big") + bytes(6)
    entropy = b"\xff\xfe\xff\xff" + bytes(4)
    with _pytest.raises(ValueError, match="without SOF0"):
        decode_jpeg_gray(sos + entropy)


# ------------------------------------------------------------- GIF
def test_gif_roundtrip_randomized():
    import numpy as np

    from ccog_spark.operators.multimodal import decode_gif, encode_gif

    rng = np.random.RandomState(5)
    for t in range(12):
        n = int(rng.choice([3, 7, 16, 256]))
        h, w = int(rng.randint(3, 40)), int(rng.randint(3, 40))
        pal = rng.randint(0, 256, (n, 3)).astype(np.uint8)
        idx = rng.randint(0, n, (h, w)).astype(np.uint8)
        if t % 2 == 0:  # long runs: deep LZW dict + width growth
            idx = (np.arange(h * w) // 7 % n).reshape(h, w).astype(np.uint8)
        out = decode_gif(encode_gif(idx, pal))
        assert (out == pal[idx.reshape(-1)].reshape(h, w, 3)).all()


def test_gif_through_pixel_kernels(spark):
    import numpy as np

    from ccog_spark.operators import multimodal as mm

    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (12, 18)).astype(np.uint8)
    payload = mm.encode_gif(idx, pal)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    feats = mm.image_features(df).collect()[0]
    assert (feats.width, feats.height) == (18, 12)
    exp = pal[idx.reshape(-1)].astype(float)
    assert abs(feats.mean - exp.mean()) < 0.51


def test_gif_rejects_malformed():
    import numpy as np
    import pytest as _pytest

    from ccog_spark.operators.multimodal import decode_gif, encode_gif

    good = encode_gif(
        np.zeros((4, 4), np.uint8), np.zeros((2, 3), np.uint8)
    )
    with _pytest.raises(ValueError, match="signature"):
        decode_gif(b"JIF87a" + good[6:])
    with _pytest.raises(ValueError, match="truncated"):
        decode_gif(good[:10])
    # interlace flag set on the image descriptor
    bad = bytearray(good)
    desc = bad.index(0x2C, 13)
    bad[desc + 9] |= 0x40
    with _pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(bad))


def test_gif_lzw_first_code_out_of_range():
    """A corrupt first-code-after-clear (beyond the table) raises the
    module's documented ValueError, not IndexError."""
    import pytest as _pytest

    from ccog_spark.operators.multimodal import _gif_lzw_decode

    # min_code_size=2 → clear=4, end=5, table len 6, width 3.
    # Sole code = 7 (0b111): out of range while prev is None.
    with _pytest.raises(ValueError, match="corrupt GIF LZW"):
        _gif_lzw_decode(bytes([0b111]), 2, 4)


@pytest.mark.slow
def test_fused_variants_match_unfused_compositions(spark):
    """Round-17 fusion (guide §4.1): the *_from_docs entry points chain
    the SAME kernels inside one Python worker instead of separate
    mapInPandas stages, so every output value must be BIT-identical to
    the unfused composition — same kernels, same order, same batches."""
    from ccog_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(i, f"text for document {i} " * (i + 1)) for i in range(8)],
        ["doc_id", "text"],
    )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    assert rows(mm.image_features_from_docs(docs)) == rows(
        mm.image_features(mm.attach_payload(docs))
    )
    assert rows(mm.resized_features_from_docs(docs, 32, 24)) == rows(
        mm.image_features(
            mm.resize_images(mm.attach_payload(docs), 32, 24).select(
                "doc_id", "payload"
            )
        )
    )
    assert rows(mm.sampled_frames_from_docs(docs, every=2)) == rows(
        mm.sample_frames(mm.attach_video(docs), every=2)
    )
    assert rows(mm.audio_features_from_docs(docs)) == rows(
        mm.audio_features(mm.attach_audio(docs))
    )
