"""Pure-numpy baseline JPEG codec (raster/jpegcodec.py) — unit
round-trips plus the end-to-end JPEG-compressed COG write that makes
R6/E23 fully real: abbreviated tile streams, ONE shared JPEGTables
copy per codec config (reference parity:
/root/reference/ccog/ccog.py:24-39 profile options, :261-289 tables
invariant)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ccog_spark.raster import jpegcodec as J


def _gradient(side: int = 32) -> np.ndarray:
    y, x = np.mgrid[0:side, 0:side]
    return ((np.sin(x / 5.0) * 60 + y * 2 + 100) % 256).astype(np.uint8)


@pytest.mark.parametrize("quality,max_err", [(95, 8), (75, 16), (50, 20), (10, 48)])
def test_roundtrip_tolerance(quality, max_err):
    img = _gradient()
    enc = J.encode(img.tobytes(), quality)
    dec = np.frombuffer(
        J.decode(J.make_tables(quality) + enc), np.uint8
    ).reshape(img.shape)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= max_err


def test_constant_midgray_is_exact():
    img = np.full((16, 16), 128, np.uint8)
    enc = J.encode(img.tobytes(), 50)
    assert J.decode(J.make_tables(50) + enc) == img.tobytes()


def test_higher_quality_costs_more_bytes():
    img = _gradient()
    sizes = [len(J.encode(img.tobytes(), q)) for q in (10, 50, 95)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_abbreviated_decode_without_tables_raises():
    enc = J.encode(_gradient().tobytes(), 75)
    with pytest.raises(ValueError, match="JPEGTables"):
        J.decode(enc)


def test_make_tables_pure_and_level_dependent():
    assert J.make_tables(60) == J.make_tables(60)
    assert J.make_tables(60) != J.make_tables(61)
    t = J.make_tables(75)
    # SOI + DQT (luma+chroma tables) + four DHTs (DC/AC × luma/chroma)
    # + EOI — the two-table-set layout GDAL/libtiff JPEGTables carry
    assert t.startswith(b"\xff\xd8") and t.endswith(b"\xff\xd9")
    assert t.count(b"\xff\xdb") == 1 and t.count(b"\xff\xc4") == 4


def test_quant_table_ijg_endpoints():
    assert np.array_equal(J.quant_table(50), J.BASE_QUANT)
    assert J.quant_table(100).max() == 1  # near-lossless
    assert J.quant_table(1).min() >= J.BASE_QUANT.min()


def test_non_square_payload_rejected():
    with pytest.raises(ValueError, match="square"):
        J.encode(bytes(100), 75)


@given(st.integers(0, 2 ** 32 - 1))
@settings(deadline=None, max_examples=40)
def test_fuzz_q100_bounded_error(seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    dec = np.frombuffer(
        J.decode(J.make_tables(100) + J.encode(img.tobytes(), 100)),
        np.uint8,
    ).reshape(16, 16)
    # q100 quantizes DCT coefficients to unit steps: reconstruction of
    # ARBITRARY noise stays within a small bound
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8


# ------------------------------------------------------------- e2e COG


def _smooth_raster(bands: int = 2, h: int = 96, w: int = 160) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    planes = [
        ((np.sin(x / 9.0 + b) * 50 + np.cos(y / 7.0) * 40 + 128) % 256).astype(
            np.uint8
        )
        for b in range(bands)
    ]
    return np.stack(planes)


def test_jpeg_cog_end_to_end(spark, tmp_path):
    from ccog_spark.raster import tiff
    from ccog_spark.raster.cog import write_ccog
    from ccog_spark.raster.codecs import COMPRESSION_JPEG

    arr = _smooth_raster()
    out = str(tmp_path / "jpeg.tif")
    res = write_ccog(
        spark, arr, out, blocksize=32, nodata=0.0, codec="jpeg",
        compress_level=85, min_part_size=2 << 10,
    )
    assert res.n_parts > 1  # the tables invariant ran across parts
    data = open(out, "rb").read()
    ifds = tiff.read_cog(data)
    expected_tables = J.make_tables(85)
    for ifd in ifds:
        assert ifd.compression == COMPRESSION_JPEG
        assert ifd.jpeg_tables == expected_tables
    # ONE external copy: every IFD references the same offset region
    assert data.count(expected_tables) == 1
    for b in range(arr.shape[0]):
        got = tiff.read_band(data, ifds[0], b)
        err = np.abs(got.astype(int) - arr[b].astype(int))
        assert err.max() <= 16 and err.mean() < 4


def test_jpeg_two_quality_levels_two_tables(spark, tmp_path):
    from ccog_spark.raster import tiff
    from ccog_spark.raster.cog import write_ccog

    arr = _smooth_raster(bands=1)
    out = str(tmp_path / "jpeg2.tif")
    write_ccog(
        spark, arr, out, blocksize=32, nodata=0.0, codec="jpeg",
        compress_level=90, overview_compress_level=60,
    )
    data = open(out, "rb").read()
    ifds = tiff.read_cog(data)
    assert ifds[0].jpeg_tables == J.make_tables(90)
    for ifd in ifds[1:]:
        assert ifd.jpeg_tables == J.make_tables(60)
    # overviews decode with THEIR tables (the r5 ADVICE failure mode)
    ov = tiff.read_band(data, ifds[1], 0)
    assert ov.shape == (48, 80)


@pytest.mark.slow
def test_color_jpeg_cog_end_to_end(spark, tmp_path):
    """Pixel-interleaved YCbCr JPEG COG: PlanarConfig=1, Photometric=6,
    YCbCrSubSampling tag, ONE tile per grid cell, shared tables across
    parts, per-band read-back within tolerance — for both subsamplings."""
    from ccog_spark.raster import tiff
    from ccog_spark.raster.cog import write_ccog
    from ccog_spark.raster.codecs import COMPRESSION_JPEG

    y, x = np.mgrid[0:96, 0:160]
    arr = np.stack(
        [
            (y * 255) // 95,
            (x * 255) // 159,
            ((y * 255) // 95 + (x * 255) // 159) // 2,
        ]
    ).astype(np.uint8)
    for sub, tol, tag in (("444", 24, (1, 1)), ("420", 48, (2, 2))):
        out = str(tmp_path / f"color_{sub}.tif")
        res = write_ccog(
            spark, arr, out, blocksize=32, nodata=255.0, codec="jpeg",
            compress_level=90, pixel_interleave=True, jpeg_subsampling=sub,
            min_part_size=2 << 10,
        )
        assert res.n_parts > 1  # tables invariant ran across parts
        data = open(out, "rb").read()
        ifds = tiff.read_cog(data)
        assert data.count(J.make_tables(90)) == 1
        for ifd in ifds:
            assert ifd.compression == COMPRESSION_JPEG
            assert ifd.planar_config == 1 and ifd.bands == 3
            assert ifd.ycbcr_subsampling == tag
            # chunky: ONE tile per grid cell, not per band
            tx = (ifd.width + 31) // 32
            ty = (ifd.height + 31) // 32
            assert len(ifd.offsets) == tx * ty
        for b in range(3):
            got = tiff.read_band(data, ifds[0], b)
            assert np.abs(got.astype(int) - arr[b].astype(int)).max() <= tol


def test_pixel_interleave_validation(spark, tmp_path):
    from ccog_spark.raster.cog import write_ccog

    rgb = np.zeros((3, 32, 32), np.uint8)
    with pytest.raises(ValueError, match="jpeg"):
        write_ccog(
            spark, rgb, str(tmp_path / "a.tif"), blocksize=32, nodata=0.0,
            codec="deflate", pixel_interleave=True,
        )
    two = np.zeros((2, 32, 32), np.uint8)
    with pytest.raises(ValueError, match="3 *bands|bands"):
        write_ccog(
            spark, two, str(tmp_path / "b.tif"), blocksize=32, nodata=0.0,
            codec="jpeg", pixel_interleave=True,
        )
    f64 = np.zeros((3, 32, 32), np.float64)
    with pytest.raises(ValueError, match="uint8"):
        write_ccog(
            spark, f64, str(tmp_path / "c.tif"), blocksize=32, nodata=0.0,
            codec="jpeg", dtype="float64", pixel_interleave=True,
        )


def test_jpeg_requires_uint8_and_no_predictor(spark, tmp_path):
    from ccog_spark.raster.cog import write_ccog

    arr = _smooth_raster(bands=1).astype(np.float64)
    with pytest.raises(ValueError, match="uint8"):
        write_ccog(
            spark, arr, str(tmp_path / "bad.tif"), blocksize=32,
            nodata=0.0, codec="jpeg", dtype="float64",
        )
    arr8 = _smooth_raster(bands=1)
    with pytest.raises(ValueError, match="predictor"):
        write_ccog(
            spark, arr8, str(tmp_path / "bad2.tif"), blocksize=32,
            nodata=0.0, codec="jpeg", predictor=2,
        )


@pytest.mark.slow
def test_jpeg_cog_from_foreign_cwd(tmp_path):
    """Worker self-containment: a driver running from /tmp (repo not on
    the executors' PYTHONPATH) must still write a JPEG COG — the codec
    fns ship by value; any runtime ccog_spark import inside the encode
    closure would ModuleNotFoundError on the workers."""
    import os
    import subprocess
    import sys

    script = tmp_path / "drv.py"
    script.write_text(
        'import sys\n'
        'sys.path.insert(0, "/root/repo")\n'
        'import numpy as np\n'
        'from pyspark.sql import SparkSession\n'
        'spark = (SparkSession.builder.master("local[2]")\n'
        '         .config("spark.ui.enabled", "false").getOrCreate())\n'
        'from ccog_spark.raster.cog import write_ccog\n'
        'from ccog_spark.raster import jpegcodec, tiff\n'
        'y, x = np.mgrid[0:32, 0:64]\n'
        'arr = ((x + y) % 200).astype("uint8")[None]\n'
        'out = sys.argv[1]\n'
        'write_ccog(spark, arr, out, blocksize=16, nodata=0.0,\n'
        '           codec="jpeg", compress_level=80)\n'
        'data = open(out, "rb").read()\n'
        'ifds = tiff.read_cog(data)\n'
        'assert ifds[0].jpeg_tables == jpegcodec.make_tables(80)\n'
        'got = tiff.read_band(data, ifds[0], 0)\n'
        'err = abs(got.astype(int) - arr[0].astype(int)).max()\n'
        'assert err <= 16, err\n'
        'print("FOREIGN_CWD_OK")\n'
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [sys.executable, str(script), str(tmp_path / "f.tif")],
        cwd="/tmp", env=env, capture_output=True, text=True, timeout=600,
    )
    assert "FOREIGN_CWD_OK" in r.stdout, r.stdout[-2000:] + r.stderr[-2000:]


@given(st.integers(0, 2 ** 32 - 1), st.data())
@settings(deadline=None, max_examples=80)
def test_fuzz_corrupt_streams_never_hang_or_crash(seed, data):
    """Truncations and byte flips must raise ValueError (or decode to
    SOME bytes) — never raw IndexError/KeyError/struct.error."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    stream = J.make_tables(75) + J.encode(img.tobytes(), 75)
    mode = data.draw(st.sampled_from(["truncate", "flip", "both"]))
    buf = bytearray(stream)
    if mode in ("truncate", "both"):
        buf = buf[: data.draw(st.integers(0, len(buf) - 1))]
    if mode in ("flip", "both") and buf:
        for _ in range(data.draw(st.integers(1, 4))):
            i = data.draw(st.integers(0, len(buf) - 1))
            buf[i] ^= data.draw(st.integers(1, 255))
    try:
        out = J.decode(bytes(buf))
        assert isinstance(out, bytes)
    except ValueError:
        pass


# ------------------------------------------------------ restart markers
def test_restart_interval_roundtrip_gray():
    """DRI/RSTm streams (what many foreign encoders emit) decode to
    the SAME pixels as the marker-free stream — per-segment predictor
    reset and byte alignment both exercised."""
    img = _gradient(32)  # 16 MCUs
    base = np.frombuffer(
        J.decode(J.make_tables(75) + J.encode(img.tobytes(), 75)), np.uint8
    )
    for ri in (1, 3, 4, 7):
        enc = J.encode(img.tobytes(), 75, restart_interval=ri)
        assert b"\xff\xdd" in enc  # DRI present
        got = np.frombuffer(J.decode(J.make_tables(75) + enc), np.uint8)
        assert np.array_equal(got, base), ri


def test_restart_interval_roundtrip_color():
    rgb = _rgb_gradient(32)
    for sub in ("444", "420"):
        base = J.decode(
            J.make_tables(90) + J.encode_color(rgb.tobytes(), 90, sub)
        )
        enc = J.encode_color(rgb.tobytes(), 90, sub, restart_interval=2)
        got = J.decode(J.make_tables(90) + enc)
        assert got == base, sub


def test_restart_marker_out_of_sequence_rejected():
    img = _gradient(32)
    enc = J.encode(img.tobytes(), 75, restart_interval=4)
    # corrupt the first RSTm (0xFFD0) to 0xFFD5 — resync would decode
    # the wrong MCUs silently if sequence weren't checked
    buf = bytearray(enc)
    i = buf.index(b"\xff\xd0", 20)
    buf[i + 1] = 0xD5
    with pytest.raises(ValueError, match="out of sequence|corrupt"):
        J.decode(J.make_tables(75) + bytes(buf))


# ------------------------------------------------------- golden bytes
def test_encoder_golden_bytes_stable():
    """The entropy encoder's byte output is pinned: the vectorized
    numpy Huffman pass (r7) must produce EXACTLY the bytes of the
    original per-symbol implementation — same categories, runs, ZRL
    splits, EOB placement, 1-fill padding, and 0xFF stuffing."""
    import hashlib

    rng = np.random.RandomState(7)
    golden = {
        10: "a120505cbfea213b", 50: "5e55639d65da2eed",
        75: "afc128ea1de498a6", 90: "77af2e571a568c21",
        100: "9dc6ecc31fb2926b",
    }
    for q in (10, 50, 75, 90, 100):
        img = (
            np.linspace(0, 255, 32 * 32).reshape(32, 32)
            + rng.randint(0, 30, (32, 32))
        ).clip(0, 255).astype(np.uint8)
        d = hashlib.sha256(J.encode(img.tobytes(), q)).hexdigest()[:16]
        assert d == golden[q], q
    flat = np.zeros((16, 16), np.uint8)
    flat[3, 7] = 255  # ZRL-heavy block
    flat[12, 2] = 9
    assert (
        hashlib.sha256(J.encode(flat.tobytes(), 75)).hexdigest()[:16]
        == "b6402bec92266e3d"
    )
    const = np.full((16, 16), 128, np.uint8)
    assert (
        hashlib.sha256(J.encode(const.tobytes(), 50)).hexdigest()[:16]
        == "0731919b0f578726"
    )


# ------------------------------------------------------------- color
def _rgb_gradient(side: int = 32) -> np.ndarray:
    y, x = np.mgrid[0:side, 0:side]
    return np.stack(
        [
            (np.sin(x / 5.0) * 60 + y * 2 + 100) % 256,
            (np.cos(y / 4.0) * 60 + x * 2 + 80) % 256,
            np.full((side, side), 100.0),
        ],
        axis=-1,
    ).astype(np.uint8)


@pytest.mark.parametrize(
    "quality,sub,max_err",
    [
        (95, "444", 10), (75, "444", 20), (50, "444", 26),
        (90, "420", 24), (90, "422", 20), (90, "440", 20),
    ],
)
def test_color_roundtrip_tolerance(quality, sub, max_err):
    rgb = _rgb_gradient()
    enc = J.make_tables(quality) + J.encode_color(
        rgb.tobytes(), quality, subsampling=sub
    )
    dec = np.frombuffer(J.decode(enc), np.uint8).reshape(rgb.shape)
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= max_err


def test_color_constant_near_exact():
    rgb = np.empty((16, 16, 3), np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 37, 180, 99
    enc = J.make_tables(95) + J.encode_color(rgb.tobytes(), 95)
    dec = np.frombuffer(J.decode(enc), np.uint8).reshape(rgb.shape)
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 2


def test_color_gray_input_stays_gray():
    """An RGB tile with R=G=B has Cb=Cr=128; after round-trip the
    channels stay (near) equal — the chroma path is not injecting
    color."""
    g = _gradient(32)
    rgb = np.repeat(g[:, :, None], 3, axis=2)
    enc = J.make_tables(90) + J.encode_color(rgb.tobytes(), 90)
    dec = np.frombuffer(J.decode(enc), np.uint8).reshape(rgb.shape).astype(int)
    assert np.abs(dec[..., 0] - dec[..., 1]).max() <= 2
    assert np.abs(dec[..., 0] - dec[..., 2]).max() <= 2


def test_color_420_smaller_than_444():
    rgb = _rgb_gradient()
    l444 = len(J.encode_color(rgb.tobytes(), 75, subsampling="444"))
    l420 = len(J.encode_color(rgb.tobytes(), 75, subsampling="420"))
    assert l420 < l444


def test_color_component_layout_gdal_convention():
    """SOF/SOS bytes pin the public component convention: ids 1/2/3,
    Y on table set 0, Cb/Cr on set 1; luma sampling = (h<<4)|v."""
    rgb = _rgb_gradient()
    for sub, ysamp in (
        ("444", 0x11), ("420", 0x22), ("422", 0x21), ("440", 0x12)
    ):
        enc = J.encode_color(rgb.tobytes(), 75, subsampling=sub)
        sof = enc.index(b"\xff\xc0") + 4
        assert enc[sof] == 8 and enc[sof + 5] == 3  # precision, ncomp
        comps = enc[sof + 6 : sof + 15]
        assert list(comps) == [1, ysamp, 0, 2, 0x11, 1, 3, 0x11, 1]
        sos = enc.index(b"\xff\xda") + 4
        assert list(enc[sos : sos + 7]) == [3, 1, 0x00, 2, 0x11, 3, 0x11]


def test_color_420_requires_mcu_alignment():
    rgb = np.zeros((24, 24, 3), np.uint8)  # 24 % 16 != 0
    with pytest.raises(ValueError, match="16"):
        J.encode_color(rgb.tobytes(), 75, subsampling="420")


def test_color_bad_subsampling_rejected():
    rgb = _rgb_gradient(16)
    with pytest.raises(ValueError, match="subsampling"):
        J.encode_color(rgb.tobytes(), 75, subsampling="411")


@given(st.integers(0, 2 ** 32 - 1), st.data())
@settings(deadline=None, max_examples=40)
def test_fuzz_corrupt_color_streams(seed, data):
    """Same never-hang/never-crash contract for 3-component streams."""
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    sub = data.draw(st.sampled_from(["444", "420"]))
    stream = J.make_tables(75) + J.encode_color(
        rgb.tobytes(), 75, subsampling=sub
    )
    buf = bytearray(stream)
    mode = data.draw(st.sampled_from(["truncate", "flip", "both"]))
    if mode in ("truncate", "both"):
        buf = buf[: data.draw(st.integers(0, len(buf) - 1))]
    if mode in ("flip", "both") and buf:
        for _ in range(data.draw(st.integers(1, 4))):
            i = data.draw(st.integers(0, len(buf) - 1))
            buf[i] ^= data.draw(st.integers(1, 255))
    try:
        out = J.decode(bytes(buf))
        assert isinstance(out, bytes)
    except ValueError:
        pass


def test_truncated_scan_raises_not_partial():
    """Regression (round-6 review): entropy data cut short but
    terminated by a marker must raise, not return a half-gray image."""
    img = _gradient()
    enc = J.encode(img.tobytes(), 75)
    sos = enc.index(b"\xff\xda")
    scan_start = sos + 2 + int.from_bytes(enc[sos + 2 : sos + 4], "big")
    cut = scan_start + (len(enc) - 2 - scan_start) // 2
    truncated = J.make_tables(75) + enc[:cut] + b"\xff\xd9"
    with pytest.raises(ValueError, match="truncated JPEG scan"):
        J.decode(truncated)


# ------------------------------------------- fast-vs-ref entropy decode
def _both_impls(stream):
    old = J._ENTROPY_IMPL
    try:
        J._ENTROPY_IMPL = "fast"
        a = J.decode(stream)
        J._ENTROPY_IMPL = "ref"
        b = J.decode(stream)
    finally:
        J._ENTROPY_IMPL = old
    return a, b


@pytest.mark.parametrize("sub", ["444", "422", "440", "420"])
@pytest.mark.parametrize("ri", [0, 2])
def test_fast_entropy_decode_matches_ref_color(sub, ri):
    """The round-8 windowed entropy walk is byte-identical to the
    _BitReader reference on every sampling shape, with and without
    restart markers."""
    rng = np.random.RandomState(31)
    rgb = rng.randint(0, 256, (64, 64, 3), np.uint8)
    stream = J.make_tables(90) + J.encode_color(
        rgb.tobytes(), 90, sub, restart_interval=ri
    )
    a, b = _both_impls(stream)
    assert a == b


@pytest.mark.parametrize("q", [30, 75, 100])
def test_fast_entropy_decode_matches_ref_gray(q):
    rng = np.random.RandomState(32)
    img = rng.randint(0, 256, (64, 64), np.uint8)
    stream = J.make_tables(q) + J.encode(img.tobytes(), q, restart_interval=3)
    a, b = _both_impls(stream)
    assert a == b


@pytest.mark.parametrize("seed", range(8))
def test_fast_entropy_fuzz_corrupt_agrees_on_validity(seed):
    """On randomly corrupted streams both implementations must either
    both raise ValueError or both return bytes; when both return, the
    bytes agree (the fast path may not silently decode what the
    reference rejects, or vice versa)."""
    rng = np.random.RandomState(100 + seed)
    img = rng.randint(0, 256, (32, 32), np.uint8)
    stream = bytearray(J.make_tables(75) + J.encode(img.tobytes(), 75, restart_interval=2))
    for _ in range(6):
        stream[rng.randint(len(stream) - 30) + 20] = rng.randint(256)
    outcomes = []
    for impl in ("fast", "ref"):
        J._ENTROPY_IMPL = impl
        try:
            outcomes.append(("ok", J.decode(bytes(stream))))
        except ValueError:
            outcomes.append(("err", None))
    J._ENTROPY_IMPL = "fast"
    assert outcomes[0][0] == outcomes[1][0]
    if outcomes[0][0] == "ok":
        assert outcomes[0][1] == outcomes[1][1]
