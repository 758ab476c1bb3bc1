"""Foreign/adversarial TIFF inputs (round-7 hardening, round-8
big-endian support): layouts other writers produce. Strip-based
files, chunky RGB, uncompressed payloads, and — since round 8 —
big-endian (MM) classic/BigTIFF containers must decode to EXACTLY the
pixels of their little-endian twins; shapes the reader cannot
represent (unknown compression tags, YCbCr photometric with the wrong
codec, truncated or cyclic IFD chains) must fail with a CLEAR
ValueError, never decode wrong pixels and never crash with a raw
struct/Index error.

The builders construct minimal hand-rolled TIFFs (classic, little-
endian unless stated) so each path is reached deliberately.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ccog_spark.raster import tiff


def _entry(tag: int, typ: int, count: int, value: int) -> bytes:
    return struct.pack("<HHI", tag, typ, count) + struct.pack("<I", value)


def _classic_tiff(entries: list[bytes], tail: bytes = b"", next_ifd: int = 0) -> bytes:
    """Header + one IFD at offset 8 + ``tail`` bytes after the IFD."""
    ifd = struct.pack("<H", len(entries))
    for e in sorted(entries, key=lambda e: struct.unpack("<H", e[:2])[0]):
        ifd += e
    ifd += struct.pack("<I", next_ifd)
    return struct.pack("<2sHI", b"II", 42, 8) + ifd + tail


def _tiled_entries(
    w: int = 16, h: int = 16, compression: int = 8, photometric: int = 1,
    bands: int = 1, off: int = 0, cnt: int = 0, planar: int = 2,
) -> list[bytes]:
    return [
        _entry(256, 3, 1, w),          # ImageWidth
        _entry(257, 3, 1, h),          # ImageLength
        _entry(258, 3, 1, 8),          # BitsPerSample
        _entry(259, 3, 1, compression),
        _entry(262, 3, 1, photometric),
        _entry(277, 3, 1, bands),      # SamplesPerPixel
        _entry(284, 3, 1, planar),
        _entry(322, 3, 1, 16),         # TileWidth
        _entry(323, 3, 1, 16),         # TileLength
        _entry(324, 4, 1, off),        # TileOffsets
        _entry(325, 4, 1, cnt),        # TileByteCounts
        _entry(339, 3, 1, 1),          # SampleFormat (uint)
    ]


def _strip_tiff(
    img: np.ndarray, rows_per_strip: int, compression: int = 8,
    predictor: int = 1, chunky_bands: int = 1, rps_tag: bool = True,
) -> bytes:
    """Hand-rolled strip-based gray or chunky-RGB TIFF (what plain
    GDAL GeoTIFFs look like): full-width strips, LAST strip unpadded."""
    h = img.shape[0]
    w = img.shape[1]
    strips = []
    for y0 in range(0, h, rows_per_strip):
        part = img[y0 : y0 + rows_per_strip]
        raw = part.tobytes()
        if predictor == 2:
            d = part.astype(np.uint8).copy()
            d[:, 1:] = d[:, 1:] - part[:, :-1]
            raw = d.tobytes()
        strips.append(zlib.compress(raw) if compression == 8 else raw)
    n = len(strips)
    data_start = 400
    offs, cnts, pos = [], [], data_start
    for s in strips:
        offs.append(pos)
        cnts.append(len(s))
        pos += len(s)
    entries = [
        _entry(256, 3, 1, w),
        _entry(257, 3, 1, h),
        _entry(258, 3, 1, 8),
        _entry(259, 3, 1, compression),
        _entry(262, 3, 1, 1),
        _entry(277, 3, 1, chunky_bands),
        _entry(284, 3, 1, 1),
        _entry(339, 3, 1, 1),
    ]
    if predictor != 1:
        entries.append(_entry(317, 3, 1, predictor))
    if rps_tag:
        entries.append(_entry(278, 3, 1, rows_per_strip))
    if n == 1:
        entries.append(_entry(273, 4, 1, offs[0]))
        entries.append(_entry(279, 4, 1, cnts[0]))
    else:
        # external offset/count arrays at fixed positions
        entries.append(_entry(273, 4, n, 300))
        entries.append(_entry(279, 4, n, 300 + 4 * n))
    head = _classic_tiff(entries)
    buf = bytearray(head) + b"\x00" * (data_start - len(head))
    if n > 1:
        struct.pack_into(f"<{n}I", buf, 300, *offs)
        struct.pack_into(f"<{n}I", buf, 300 + 4 * n, *cnts)
    return bytes(buf) + b"".join(strips)


def test_strip_tiff_reads_exact_gray():
    """Foreign strip-based layout (GDAL's plain-GeoTIFF default) reads
    back exactly — incl. the unpadded short last strip."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (21, 16), np.uint8)  # 21 rows: 8+8+5
    data = _strip_tiff(img, rows_per_strip=8)
    ifd = tiff.read_cog(data)[0]
    assert not ifd.is_tiled and ifd.rows_per_strip == 8
    got = tiff.read_band(data, ifd, 0)
    assert np.array_equal(got, img)


def test_strip_tiff_with_predictor_reads_exact():
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (12, 16), np.uint8)
    data = _strip_tiff(img, rows_per_strip=5, predictor=2)
    got = tiff.read_band(data, tiff.read_cog(data)[0], 0)
    assert np.array_equal(got, img)


def test_strip_tiff_uncompressed_reads_exact():
    """Compression tag 1 (none) — the most common foreign payload."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (10, 16), np.uint8)
    data = _strip_tiff(img, rows_per_strip=4, compression=1)
    got = tiff.read_band(data, tiff.read_cog(data)[0], 0)
    assert np.array_equal(got, img)


def test_strip_tiff_chunky_rgb_reads_exact():
    """Uncompressed pixel-interleaved RGB strips (PlanarConfig=1): the
    default layout of most non-COG RGB TIFFs."""
    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (9, 16, 3), np.uint8)
    data = _strip_tiff(img, rows_per_strip=4, compression=1, chunky_bands=3)
    ifd = tiff.read_cog(data)[0]
    assert ifd.planar_config == 1 and ifd.bands == 3
    for b in range(3):
        assert np.array_equal(tiff.read_band(data, ifd, b), img[:, :, b])


def test_strip_tiff_default_rows_per_strip():
    """No RowsPerStrip tag = one strip covering the image (spec
    default '2**32-1', clamped)."""
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (7, 16), np.uint8)
    data = _strip_tiff(img, rows_per_strip=7, rps_tag=False)
    ifd = tiff.read_cog(data)[0]
    assert ifd.rows_per_strip == 7  # clamped to height
    assert np.array_equal(tiff.read_band(data, ifd, 0), img)


def test_strip_tiff_distributed_reader(spark, tmp_path):
    """sources.cog_reader handles foreign strip files: executor-side
    decode sizes the unpadded last strip by the clip."""
    from ccog_spark.sources.cog_reader import read_cog_pixels

    rng = np.random.RandomState(10)
    img = rng.randint(0, 255, (21, 16), np.uint8)  # 255 excluded: no nodata hits
    p = tmp_path / "strips.tif"
    p.write_bytes(_strip_tiff(img, rows_per_strip=8))
    rows = read_cog_pixels(spark, str(p)).collect()
    got = np.zeros_like(img)
    for r in rows:
        got[r.y, r.x] = int(r.value)
    assert np.array_equal(got, img)


def test_color_jpeg_cog_distributed_reader(spark, tmp_path):
    """read_cog_pixels decodes pixel-interleaved YCbCr JPEG tiles on
    executors (chunky index path: one stored tile = all bands)."""
    from ccog_spark.raster.cog import write_ccog
    from ccog_spark.sources.cog_reader import read_cog_pixels

    y, x = np.mgrid[0:32, 0:64]
    ry, rx = (y * 255) // 31, (x * 255) // 63
    arr = np.stack([ry, rx, (ry + rx) // 2]).astype(np.uint8)
    out = str(tmp_path / "c.tif")
    write_ccog(
        spark, arr, out, blocksize=32, nodata=255.0, codec="jpeg",
        compress_level=95, pixel_interleave=True,
    )
    df = read_cog_pixels(spark, out, bands=[0, 2])
    got = {(r.band, r.y, r.x): r.value for r in df.collect()}
    assert set(b for b, _, _ in got) == {0, 2}
    err = max(
        abs(got[(b, yy, xx)] - float(arr[b, yy, xx]))
        for b in (0, 2)
        for yy in range(0, 32, 5)
        for xx in range(0, 64, 7)
        if (b, yy, xx) in got
    )
    assert err <= 24  # lossy tolerance (smooth ramps, q95)


def _entry_bo(bo: str, tag: int, typ: int, count: int, value: int) -> bytes:
    # inline values are LEFT-justified in the 4-byte field (TIFF 6.0
    # §2): an MM SHORT lives in bytes 0-1, so pack by its own size
    if typ == 3 and count == 1:
        val = struct.pack(bo + "H", value) + b"\x00\x00"
    else:
        val = struct.pack(bo + "I", value)
    return struct.pack(bo + "HHI", tag, typ, count) + val


def _classic_tiff_bo(bo: str, entries: list[bytes], tail: bytes = b"") -> bytes:
    ifd = struct.pack(bo + "H", len(entries))
    for e in sorted(entries, key=lambda e: struct.unpack(bo + "H", e[:2])[0]):
        ifd += e
    ifd += struct.pack(bo + "I", 0)
    magic = b"II" if bo == "<" else b"MM"
    return struct.pack(bo + "2sHI", magic, 42, 8) + ifd + tail


def _tiled_tiff_bo(
    bo: str, img: np.ndarray, tile: int = 16, predictor: int = 1
) -> bytes:
    """Hand-rolled single-IFD tiled TIFF in EITHER byte order: deflate
    tiles, multi-byte samples stored in the container's order (TIFF
    6.0 §2). img dims must be tile-aligned."""
    h, w = img.shape
    dt_file = img.dtype.newbyteorder(bo)
    bits = img.dtype.itemsize * 8
    sfmt = {"u": 1, "i": 2, "f": 3}[img.dtype.kind]
    ty, tx = h // tile, w // tile
    tiles = []
    for r in range(ty):
        for c in range(tx):
            block = img[r * tile : (r + 1) * tile, c * tile : (c + 1) * tile]
            if predictor == 3:
                # fp byte-plane predictor output is big-endian-split by
                # spec — byte-order independent, same payload for MM/II
                from ccog_spark.raster.codecs import predict_tile

                tiles.append(zlib.compress(predict_tile(block, 3)))
                continue
            if predictor == 2:
                d = block.copy()  # diff in NATIVE ints (modular wrap)
                d[:, 1:] = d[:, 1:] - block[:, :-1]
                block = d
            tiles.append(zlib.compress(block.astype(dt_file).tobytes()))
    n = len(tiles)
    data_start = 512
    offs, cnts, pos = [], [], data_start
    for t in tiles:
        offs.append(pos)
        cnts.append(len(t))
        pos += len(t)
    entries = [
        _entry_bo(bo, 256, 3, 1, w),
        _entry_bo(bo, 257, 3, 1, h),
        _entry_bo(bo, 258, 3, 1, bits),
        _entry_bo(bo, 259, 3, 1, 8),   # deflate
        _entry_bo(bo, 262, 3, 1, 1),
        _entry_bo(bo, 277, 3, 1, 1),
        _entry_bo(bo, 284, 3, 1, 2),
        _entry_bo(bo, 322, 3, 1, tile),
        _entry_bo(bo, 323, 3, 1, tile),
        _entry_bo(bo, 339, 3, 1, sfmt),
    ]
    if predictor != 1:
        entries.append(_entry_bo(bo, 317, 3, 1, predictor))
    if n == 1:
        entries.append(_entry_bo(bo, 324, 4, 1, offs[0]))
        entries.append(_entry_bo(bo, 325, 4, 1, cnts[0]))
    else:
        entries.append(_entry_bo(bo, 324, 4, n, 300))
        entries.append(_entry_bo(bo, 325, 4, n, 300 + 4 * n))
    head = _classic_tiff_bo(bo, entries)
    buf = bytearray(head) + b"\x00" * (data_start - len(head))
    if n > 1:
        struct.pack_into(f"{bo}{n}I", buf, 300, *offs)
        struct.pack_into(f"{bo}{n}I", buf, 300 + 4 * n, *cnts)
    return bytes(buf) + b"".join(tiles)


@pytest.mark.parametrize("predictor", [1, 2])
def test_big_endian_tiled_reads_identical_to_le_twin(predictor):
    """Big-endian (MM) tiled TIFFs decode to EXACTLY the same pixels
    as a little-endian twin of the same image — multi-byte (uint16)
    samples byte-swap, IFD walk and external offset/count arrays parse
    in file order, predictor-2 differencing inverts on the swapped
    dtype. GDAL produces both orders; rejecting MM was the one
    foreign-read gap left after round 7."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 65535, (32, 48), np.uint16)
    mm = _tiled_tiff_bo(">", img, predictor=predictor)
    ii = _tiled_tiff_bo("<", img, predictor=predictor)
    ifd_mm = tiff.read_cog(mm)[0]
    ifd_ii = tiff.read_cog(ii)[0]
    assert ifd_mm.byteorder == ">" and ifd_ii.byteorder == "<"
    assert ifd_mm.np_dtype == ">u2"
    a = tiff.read_band(mm, ifd_mm, 0)
    b = tiff.read_band(ii, ifd_ii, 0)
    assert np.array_equal(a, img) and np.array_equal(b, img)


def test_big_endian_distributed_read(tmp_path, spark):
    """MM file through the DISTRIBUTED reader (read_cog_pixels): the
    executor-side Arrow decode kernel gets the byteorder via the IFD's
    np_dtype string; uint16 values forced above 255 prove the byte
    swap actually happened (an unswapped read would scramble them)."""
    from ccog_spark.sources.cog_reader import read_cog_pixels

    rng = np.random.RandomState(12)
    img = (rng.randint(0, 65535, (32, 32), np.uint16) | 0x100).astype(
        np.uint16
    )
    mm = _tiled_tiff_bo(">", img, tile=16)
    p = tmp_path / "mm.tif"
    p.write_bytes(mm)
    got = {(r.y, r.x): r.value for r in read_cog_pixels(spark, str(p)).collect()}
    assert len(got) == 32 * 32
    assert all(got[(y, x)] == float(img[y, x]) for y in range(32) for x in range(32))


def test_not_a_tiff_rejected():
    with pytest.raises(ValueError, match="magic|truncated"):
        tiff.read_cog(b"PK\x03\x04 not a tiff at all")
    with pytest.raises(ValueError, match="truncated"):
        tiff.read_cog(b"II")


def test_unknown_tiff_version_rejected():
    with pytest.raises(ValueError, match="version"):
        tiff.read_cog(struct.pack("<2sHI", b"II", 44, 8))


def test_unknown_compression_raises_on_decode():
    """An exotic compression tag (e.g. 34887 LERC) parses but decoding
    raises — never returns garbage bytes."""
    payload = zlib.compress(bytes(256))
    data = _classic_tiff(
        _tiled_entries(compression=34887, off=200, cnt=len(payload)),
    )
    data = data + b"\x00" * (200 - len(data)) + payload
    ifd = tiff.read_cog(data)[0]
    assert ifd.compression == 34887
    with pytest.raises(ValueError, match="compression"):
        tiff.read_band(data, ifd, 0)


def test_ycbcr_with_deflate_rejected():
    """Photometric=6 + non-JPEG compression would need a color-space
    pass; decoding it as planar gray would be silently wrong pixels."""
    payload = zlib.compress(bytes(256 * 3))
    data = _classic_tiff(
        _tiled_entries(
            compression=8, photometric=6, bands=3, planar=1,
            off=200, cnt=len(payload),
        ),
    )
    data = data + b"\x00" * (200 - len(data)) + payload
    ifd = tiff.read_cog(data)[0]
    with pytest.raises(ValueError, match="YCbCr"):
        tiff.read_band(data, ifd, 0)


def test_wrong_size_payload_rejected():
    """A tile that decompresses to the wrong byte count (foreign writer
    disagreement about dims/dtype) must not be reshaped into pixels."""
    payload = zlib.compress(bytes(100))  # 16x16x1 needs 256
    data = _classic_tiff(
        _tiled_entries(compression=8, off=200, cnt=len(payload)),
    )
    data = data + b"\x00" * (200 - len(data)) + payload
    ifd = tiff.read_cog(data)[0]
    with pytest.raises(ValueError, match="decodes to 100"):
        tiff.read_band(data, ifd, 0)


def test_gray_jpeg_tile_in_chunky_color_ifd_rejected():
    """A 1-component JPEG tile inside a 3-sample PlanarConfig=1 IFD
    decodes to a third of the expected bytes — must raise, not
    scramble."""
    from ccog_spark.raster import jpegcodec as J

    tile = J.make_tables(75) + J.encode(bytes(256), 75)
    data = _classic_tiff(
        _tiled_entries(
            compression=7, photometric=6, bands=3, planar=1,
            off=200, cnt=len(tile),
        ),
    )
    data = data + b"\x00" * (200 - len(data)) + tile
    ifd = tiff.read_cog(data)[0]
    with pytest.raises(ValueError, match="expected 768"):
        tiff.read_band(data, ifd, 0)


def test_truncated_ifd_chain_rejected():
    data = _classic_tiff(_tiled_entries(), next_ifd=100000)
    with pytest.raises(ValueError, match="truncated|beyond EOF"):
        tiff.read_cog(data)


def test_cyclic_ifd_chain_rejected():
    # next IFD points back at itself (offset 8)
    data = _classic_tiff(_tiled_entries(), next_ifd=8)
    with pytest.raises(ValueError, match="cyclic"):
        tiff.read_cog(data)


def test_external_array_beyond_eof_rejected():
    # TileOffsets claims 4 longs at offset 90000 (past EOF)
    entries = _tiled_entries()
    entries[9] = _entry(324, 4, 4, 90000)
    entries[10] = _entry(325, 4, 4, 90000)
    with pytest.raises(ValueError, match="truncated|beyond EOF"):
        tiff.read_cog(_classic_tiff(entries))


def test_missing_tile_arrays_rejected():
    entries = [e for e in _tiled_entries() if struct.unpack("<H", e[:2])[0]
               not in (324, 325)]
    with pytest.raises(ValueError, match="TileOffsets"):
        tiff.read_cog(_classic_tiff(entries))


def test_ifd_walker_fuzz_never_crashes_raw():
    """Byte-flip/truncation fuzz over a real engine-written header:
    read_cog either parses or raises ValueError — no raw struct/Index/
    Key errors, no hangs (mirrors the ghost/JPEG parser fuzzes)."""
    from ccog_spark.raster.tiff import build_cog_plan

    plan = build_cog_plan(
        96, 64, 2, 32, 1, {(0, b, ty, tx): 64 for b in range(2)
                           for ty in range(2) for tx in range(3)},
        nodata=0.0, dtype="uint8",
    )
    base = bytearray(plan.header)
    rng = np.random.default_rng(11)
    for trial in range(300):
        buf = bytearray(base)
        mode = trial % 3
        if mode in (0, 2):
            buf = buf[: rng.integers(1, len(buf))]
        if mode in (1, 2) and buf:
            for _ in range(int(rng.integers(1, 6))):
                i = int(rng.integers(0, len(buf)))
                buf[i] ^= int(rng.integers(1, 256))
        try:
            tiff.read_cog(bytes(buf))
        except ValueError:
            pass


def test_read_header_still_grows_probe_on_truncation(spark, tmp_path):
    """The distributed reader's windowed header parse keeps working
    with the hardened error types: a probe window smaller than the
    header grows instead of failing."""
    from ccog_spark.raster.cog import write_ccog
    from ccog_spark.sources.cog_reader import read_header

    arr = (np.arange(64 * 96, dtype=np.int64).reshape(64, 96) % 200)[
        None
    ].astype(np.uint8)
    out = str(tmp_path / "probe.tif")
    write_ccog(spark, arr, out, blocksize=32, nodata=255.0)
    ifds = read_header(out, probe=64)  # far smaller than the header
    assert ifds[0].width == 96 and ifds[0].bands == 1


def test_read_header_probe_hint_opens_at_most_twice(tmp_path, monkeypatch):
    """A header whose external offset/count arrays sit past the probe
    window triggers tiff.NeedBytes with the exact furthest offset; the
    retry reads once more — 2 opens total, not log4(size) blind ×4
    re-reads (round-7 VERDICT nit)."""
    import builtins

    from ccog_spark.sources.cog_reader import read_header

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (22, 16), np.uint8)  # 11 strips of 2
    data = _strip_tiff(img, rows_per_strip=2)
    p = tmp_path / "hint.tif"
    p.write_bytes(data)

    opens = {"n": 0}
    real_open = builtins.open

    def counting_open(file, *a, **k):
        if str(file) == str(p):
            opens["n"] += 1
        return real_open(file, *a, **k)

    monkeypatch.setattr(builtins, "open", counting_open)
    # probe=160 covers the IFD itself but NOT the external strip
    # offset/count arrays at 300..388
    ifds = read_header(str(p), probe=160)
    assert opens["n"] <= 2
    assert ifds[0].rows_per_strip == 2 and len(ifds[0].offsets) == 11


def test_need_bytes_hint_is_exact():
    """NeedBytes.hint names the furthest byte the parse requires:
    feeding exactly hint bytes must succeed."""
    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (22, 16), np.uint8)
    data = _strip_tiff(img, rows_per_strip=2)
    with pytest.raises(tiff.NeedBytes) as ei:
        tiff.read_cog(data[:160])
    hint = ei.value.hint
    assert 160 < hint <= len(data)
    assert tiff.read_cog(data[:hint])[0].width == 16


def _bigtiff_entry_bo(bo: str, tag: int, typ: int, count: int, value: int) -> bytes:
    # BigTIFF entries are 20 bytes with an 8-byte value field; inline
    # values are left-justified (same rule as classic)
    if typ == 3 and count == 1:
        val = struct.pack(bo + "H", value) + b"\x00" * 6
    elif typ == 16:  # LONG8
        val = struct.pack(bo + "Q", value)
    else:
        val = struct.pack(bo + "I", value) + b"\x00" * 4
    return struct.pack(bo + "HHQ", tag, typ, count) + val


def _bigtiff_single_tile_bo(bo: str, img: np.ndarray) -> bytes:
    """Single-tile BigTIFF (version 43) in either byte order: deflate
    payload, all tags inline (count 1)."""
    h, w = img.shape
    dt_file = img.dtype.newbyteorder(bo)
    payload = zlib.compress(img.astype(dt_file).tobytes())
    data_start = 512
    e = [
        _bigtiff_entry_bo(bo, 256, 3, 1, w),
        _bigtiff_entry_bo(bo, 257, 3, 1, h),
        _bigtiff_entry_bo(bo, 258, 3, 1, img.dtype.itemsize * 8),
        _bigtiff_entry_bo(bo, 259, 3, 1, 8),
        _bigtiff_entry_bo(bo, 262, 3, 1, 1),
        _bigtiff_entry_bo(bo, 277, 3, 1, 1),
        _bigtiff_entry_bo(bo, 284, 3, 1, 2),
        _bigtiff_entry_bo(bo, 322, 3, 1, w),
        _bigtiff_entry_bo(bo, 323, 3, 1, h),
        _bigtiff_entry_bo(bo, 324, 16, 1, data_start),
        _bigtiff_entry_bo(bo, 325, 16, 1, len(payload)),
        _bigtiff_entry_bo(bo, 339, 3, 1, {"u": 1, "i": 2, "f": 3}[img.dtype.kind]),
    ]
    e.sort(key=lambda x: struct.unpack(bo + "H", x[:2])[0])
    magic = b"II" if bo == "<" else b"MM"
    head = struct.pack(bo + "2sHHHQ", magic, 43, 8, 0, 16)
    ifd = struct.pack(bo + "Q", len(e)) + b"".join(e) + struct.pack(bo + "Q", 0)
    buf = bytearray(head + ifd)
    buf += b"\x00" * (data_start - len(buf))
    return bytes(buf) + payload


def test_big_endian_bigtiff_reads_identical_to_le_twin():
    """MM BigTIFF (version 43) exercises the big-endian branch of the
    8-byte count/offset parse; pixels identical to the II twin."""
    rng = np.random.RandomState(13)
    img = rng.randint(0, 65535, (16, 16), np.uint16)
    mm = _bigtiff_single_tile_bo(">", img)
    ii = _bigtiff_single_tile_bo("<", img)
    ifd_mm = tiff.read_cog(mm)[0]
    ifd_ii = tiff.read_cog(ii)[0]
    assert ifd_mm.byteorder == ">" and ifd_mm.np_dtype == ">u2"
    assert np.array_equal(tiff.read_band(mm, ifd_mm, 0), img)
    assert np.array_equal(tiff.read_band(ii, ifd_ii, 0), img)


def test_big_endian_float_predictor3_reads_exact():
    """MM float32 with the TIFF TechNote-3 fp predictor: the byte-
    plane split is big-endian by SPEC (order-independent payload), so
    the MM and II twins share tile bytes and must both invert to the
    exact float array through the byteorder-threaded unpredict."""
    rng = np.random.RandomState(14)
    img = (rng.random((32, 32)) * 1000 - 500).astype(np.float32)
    mm = _tiled_tiff_bo(">", img, tile=16, predictor=3)
    ii = _tiled_tiff_bo("<", img, tile=16, predictor=3)
    ifd_mm = tiff.read_cog(mm)[0]
    assert ifd_mm.np_dtype == ">f4" and ifd_mm.predictor == 3
    assert np.array_equal(tiff.read_band(mm, ifd_mm, 0), img)
    assert np.array_equal(tiff.read_band(ii, tiff.read_cog(ii)[0], 0), img)


def test_strip_tiff_packbits_reads_exact():
    """Foreign PackBits strips (tag 32773, old scanner/fax TIFFs) —
    packed per-row like libtiff writes them (runs never cross rows),
    decoded by the sequential PackBits decoder."""
    from ccog_spark.raster.codecs import packbits_encode

    rng = np.random.RandomState(15)
    # repeat-heavy rows so PackBits actually compresses
    img = np.repeat(rng.randint(0, 256, (11, 4), np.uint8), 4, axis=1)
    h, w = img.shape
    rows_per_strip = 4
    strips = []
    for y0 in range(0, h, rows_per_strip):
        part = img[y0 : y0 + rows_per_strip]
        # per-ROW packing (libtiff behavior), concatenated per strip
        strips.append(b"".join(packbits_encode(r.tobytes()) for r in part))
    n = len(strips)
    data_start = 400
    offs, cnts, pos = [], [], data_start
    for s in strips:
        offs.append(pos)
        cnts.append(len(s))
        pos += len(s)
    entries = [
        _entry(256, 3, 1, w),
        _entry(257, 3, 1, h),
        _entry(258, 3, 1, 8),
        _entry(259, 3, 1, 32773),
        _entry(262, 3, 1, 1),
        _entry(277, 3, 1, 1),
        _entry(284, 3, 1, 1),
        _entry(339, 3, 1, 1),
        _entry(278, 3, 1, rows_per_strip),
        _entry(273, 4, n, 300),
        _entry(279, 4, n, 300 + 4 * n),
    ]
    head = _classic_tiff(entries)
    buf = bytearray(head) + b"\x00" * (data_start - len(head))
    struct.pack_into(f"<{n}I", buf, 300, *offs)
    struct.pack_into(f"<{n}I", buf, 300 + 4 * n, *cnts)
    data = bytes(buf) + b"".join(strips)
    ifd = tiff.read_cog(data)[0]
    assert ifd.compression == 32773
    assert np.array_equal(tiff.read_band(data, ifd, 0), img)


@pytest.mark.parametrize("seed", range(12))
def test_big_endian_header_fuzz_never_crashes(seed):
    """Byte-mutated MM headers/IFDs: parse+decode either succeeds or
    raises ValueError — never a raw struct/Index/Key error and never
    a hang (same contract the II fuzz suite pins)."""
    rng = np.random.RandomState(200 + seed)
    img = rng.randint(0, 65535, (32, 32), np.uint16)
    data = bytearray(_tiled_tiff_bo(">", img, tile=16))
    for _ in range(4):
        data[rng.randint(2, 300)] = rng.randint(256)
    try:
        for ifd in tiff.read_cog(bytes(data)):
            tiff.read_band(bytes(data), ifd, 0)
    except (ValueError, zlib.error):
        pass  # clear rejection is the contract


def test_unreferenced_external_tag_past_eof_ignored():
    """Round-10 (r9 ADVICE #1): an UNREFERENCED external tag — here an
    ICC profile (34675) claiming 5000 bytes at offset 90000, far past
    EOF — must neither fail the parse nor inflate the NeedBytes probe
    hint: val() never dereferences it, so the pre-scan is restricted
    to _PARSED_TAGS. A PARSED tag doing the same still fails loudly
    (test_external_array_beyond_eof_rejected)."""
    entries = _tiled_entries()
    entries.append(_entry(34675, 7, 5000, 90000))  # ICC, UNDEFINED
    base = tiff.read_cog(_classic_tiff(_tiled_entries()))
    got = tiff.read_cog(_classic_tiff(entries))
    assert got[0].width == base[0].width == 16
    assert got[0].height == 16

    # and the probe hint is unaffected: a truncated buffer's NeedBytes
    # hint must cover only PARSED arrays, not the ICC fiction ending
    # at 95000 (an over-read hint would make head-probing readers
    # fetch ~90 KB for a sub-KB header). A 16×32 layout has 2 tiles,
    # so TileOffsets/TileByteCounts (LONG ×2 = 8 bytes each) exceed
    # the 4-byte inline cap and live as EXTERNAL parsed arrays — park
    # them just past the provided bytes at 500/508 alongside the ICC
    # tag: the hint must be exactly 516 (= 508 + 8), not 95000.
    trunc = _tiled_entries(h=32)
    trunc = [
        e for e in trunc
        if struct.unpack("<H", e[:2])[0] not in (324, 325)
    ]
    trunc.append(_entry(324, 4, 2, 500))          # external, ends 508
    trunc.append(_entry(325, 4, 2, 508))          # external, ends 516
    trunc.append(_entry(34675, 7, 5000, 90000))   # ICC, UNPARSED
    with pytest.raises(tiff.NeedBytes) as ei:
        tiff.read_cog(_classic_tiff(trunc))
    assert ei.value.hint == 516  # excludes the 90000+5000 ICC range
