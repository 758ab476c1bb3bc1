"""Foreign TIFF layouts the repo writer never emits (round 13, VERDICT
r12 #3). rasterio/tifffile are absent in this container, so
test_gdal_oracle's external read-back half skips — these hand-packed
fixtures pin the read-side tolerance the reference inherits from GDAL
(/root/reference/README.md:69-70) without the dependency:

- IFD entries in NON-ascending tag order (TIFF 6.0 requires sorted
  tags, but real-world writers violate it; libtiff/GDAL read them)
- the classic "IFD at end of file" layout (data first, directory
  last — the default shape of incrementally-written non-COG TIFFs)
- BigTIFF with MULTI-tile external LONG8 offset/count arrays, both
  byte orders (the repo's own BigTIFF fixtures were single-tile
  inline-only)
- BigTIFF whose tile arrays use classic LONG (type 4) — GDAL emits
  LONG inside BigTIFF when values fit
- big-endian (MM) STRIP-based files (the MM fixtures so far were all
  tiled)
- BitsPerSample as an external 3-entry SHORT array (chunky RGB: 6
  bytes exceeds the classic 4-byte inline cap)
- an MM main + overview IFD chain (NewSubfileType=1 on page 2)

Every fixture must decode to exact pixels; pure parsing, no Spark.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ccog_spark.raster import tiff

from tests.test_cog_reader_foreign import (
    _bigtiff_entry_bo,
    _entry,
    _entry_bo,
)


def test_unsorted_ifd_entries_tolerated():
    """Entries deliberately ordered tag-DESCENDING (spec violation
    common in minimal writers): the reader's tag-dict walk must parse
    and decode exactly, in both byte orders."""
    rng = np.random.RandomState(31)
    img = rng.randint(0, 65535, (16, 16), np.uint16)
    for bo in ("<", ">"):
        dt_file = img.dtype.newbyteorder(bo)
        payload = zlib.compress(img.astype(dt_file).tobytes())
        data_start = 512
        entries = [
            _entry_bo(bo, 256, 3, 1, 16),
            _entry_bo(bo, 257, 3, 1, 16),
            _entry_bo(bo, 258, 3, 1, 16),
            _entry_bo(bo, 259, 3, 1, 8),
            _entry_bo(bo, 262, 3, 1, 1),
            _entry_bo(bo, 277, 3, 1, 1),
            _entry_bo(bo, 284, 3, 1, 2),
            _entry_bo(bo, 322, 3, 1, 16),
            _entry_bo(bo, 323, 3, 1, 16),
            _entry_bo(bo, 324, 4, 1, data_start),
            _entry_bo(bo, 325, 4, 1, len(payload)),
            _entry_bo(bo, 339, 3, 1, 1),
        ]
        entries.sort(
            key=lambda e: struct.unpack(bo + "H", e[:2])[0], reverse=True
        )
        magic = b"II" if bo == "<" else b"MM"
        head = struct.pack(bo + "2sHI", magic, 42, 8)
        ifd = (
            struct.pack(bo + "H", len(entries))
            + b"".join(entries)
            + struct.pack(bo + "I", 0)
        )
        buf = bytearray(head + ifd)
        buf += b"\x00" * (data_start - len(buf))
        data = bytes(buf) + payload
        ifd0 = tiff.read_cog(data)[0]
        assert ifd0.width == 16 and ifd0.byteorder == bo
        assert np.array_equal(tiff.read_band(data, ifd0, 0), img)


def test_ifd_at_end_of_file():
    """Header points PAST the data region to an IFD at EOF — the
    default layout of sequentially-written (non-COG) TIFFs, the exact
    opposite of the COG header-first rule this writer follows."""
    rng = np.random.RandomState(32)
    img = rng.randint(0, 256, (16, 16), np.uint8)
    payload = zlib.compress(img.tobytes())
    data_start = 8
    ifd_off = data_start + len(payload)
    if ifd_off % 2:  # spec: IFDs begin on a word boundary
        ifd_off += 1
    entries = [
        _entry(256, 3, 1, 16),
        _entry(257, 3, 1, 16),
        _entry(258, 3, 1, 8),
        _entry(259, 3, 1, 8),
        _entry(262, 3, 1, 1),
        _entry(277, 3, 1, 1),
        _entry(284, 3, 1, 2),
        _entry(322, 3, 1, 16),
        _entry(323, 3, 1, 16),
        _entry(324, 4, 1, data_start),
        _entry(325, 4, 1, len(payload)),
        _entry(339, 3, 1, 1),
    ]
    entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])
    head = struct.pack("<2sHI", b"II", 42, ifd_off)
    buf = bytearray(head) + payload
    buf += b"\x00" * (ifd_off - len(buf))
    buf += (
        struct.pack("<H", len(entries))
        + b"".join(entries)
        + struct.pack("<I", 0)
    )
    data = bytes(buf)
    ifd0 = tiff.read_cog(data)[0]
    assert np.array_equal(tiff.read_band(data, ifd0, 0), img)


def _bigtiff_multitile_bo(
    bo: str, img: np.ndarray, tile: int, arr_type: int = 16
) -> bytes:
    """Multi-tile BigTIFF with EXTERNAL offset/count arrays of
    ``arr_type`` (16=LONG8 per spec; 4=LONG as GDAL emits when values
    fit), in either byte order."""
    h, w = img.shape
    dt_file = img.dtype.newbyteorder(bo)
    ty, tx = h // tile, w // tile
    tiles = [
        zlib.compress(
            img[r * tile : (r + 1) * tile, c * tile : (c + 1) * tile]
            .astype(dt_file)
            .tobytes()
        )
        for r in range(ty)
        for c in range(tx)
    ]
    n = len(tiles)
    esize = 8 if arr_type == 16 else 4
    fmt = "Q" if arr_type == 16 else "I"
    arr_off = 600
    arr_cnt = arr_off + esize * n
    data_start = arr_cnt + esize * n
    offs, cnts, pos = [], [], data_start
    for t in tiles:
        offs.append(pos)
        cnts.append(len(t))
        pos += len(t)
    e = [
        _bigtiff_entry_bo(bo, 256, 3, 1, w),
        _bigtiff_entry_bo(bo, 257, 3, 1, h),
        _bigtiff_entry_bo(bo, 258, 3, 1, img.dtype.itemsize * 8),
        _bigtiff_entry_bo(bo, 259, 3, 1, 8),
        _bigtiff_entry_bo(bo, 262, 3, 1, 1),
        _bigtiff_entry_bo(bo, 277, 3, 1, 1),
        _bigtiff_entry_bo(bo, 284, 3, 1, 2),
        _bigtiff_entry_bo(bo, 322, 3, 1, tile),
        _bigtiff_entry_bo(bo, 323, 3, 1, tile),
        # external arrays: value field holds the pointer
        struct.pack(bo + "HHQ", 324, arr_type, n)
        + struct.pack(bo + "Q", arr_off),
        struct.pack(bo + "HHQ", 325, arr_type, n)
        + struct.pack(bo + "Q", arr_cnt),
        _bigtiff_entry_bo(
            bo, 339, 3, 1, {"u": 1, "i": 2, "f": 3}[img.dtype.kind]
        ),
    ]
    e.sort(key=lambda x: struct.unpack(bo + "H", x[:2])[0])
    magic = b"II" if bo == "<" else b"MM"
    head = struct.pack(bo + "2sHHHQ", magic, 43, 8, 0, 16)
    ifd = (
        struct.pack(bo + "Q", len(e))
        + b"".join(e)
        + struct.pack(bo + "Q", 0)
    )
    buf = bytearray(head + ifd)
    buf += b"\x00" * (data_start - len(buf))
    struct.pack_into(f"{bo}{n}{fmt}", buf, arr_off, *offs)
    struct.pack_into(f"{bo}{n}{fmt}", buf, arr_cnt, *cnts)
    return bytes(buf) + b"".join(tiles)


def test_bigtiff_multitile_external_long8_both_orders():
    """BigTIFF with 4 tiles whose offsets/counts live as external
    LONG8 arrays — the 8-byte external-pointer parse in both orders;
    the prior BigTIFF fixtures were single-tile inline-only."""
    rng = np.random.RandomState(33)
    img = rng.randint(0, 65535, (32, 32), np.uint16)
    for bo in ("<", ">"):
        data = _bigtiff_multitile_bo(bo, img, tile=16, arr_type=16)
        ifd0 = tiff.read_cog(data)[0]
        assert len(ifd0.offsets) == 4
        assert ifd0.np_dtype == bo + "u2"
        assert np.array_equal(tiff.read_band(data, ifd0, 0), img)


def test_bigtiff_with_classic_long_arrays():
    """BigTIFF whose TileOffsets/ByteCounts are classic LONG (type 4):
    4-byte elements inside an 8-byte-pointer container — GDAL writes
    this shape when all values fit 32 bits."""
    rng = np.random.RandomState(34)
    img = rng.randint(0, 65535, (32, 32), np.uint16)
    for bo in ("<", ">"):
        data = _bigtiff_multitile_bo(bo, img, tile=16, arr_type=4)
        ifd0 = tiff.read_cog(data)[0]
        assert len(ifd0.offsets) == 4
        assert np.array_equal(tiff.read_band(data, ifd0, 0), img)


def test_big_endian_strip_file_reads_exact():
    """MM STRIP-based uint16 file with external offset/count arrays —
    the strip path and the byte-swap together (MM coverage so far was
    tiled-only); short unpadded last strip included (13 rows = 4+4+4+1)."""
    rng = np.random.RandomState(35)
    img = rng.randint(0, 65535, (13, 16), np.uint16)
    bo = ">"
    rows_per_strip = 4
    strips = [
        zlib.compress(
            img[y0 : y0 + rows_per_strip].astype(img.dtype.newbyteorder(bo)).tobytes()
        )
        for y0 in range(0, 13, rows_per_strip)
    ]
    n = len(strips)
    arr_off = 400
    data_start = arr_off + 8 * n
    offs, cnts, pos = [], [], data_start
    for s in strips:
        offs.append(pos)
        cnts.append(len(s))
        pos += len(s)
    entries = [
        _entry_bo(bo, 256, 3, 1, 16),
        _entry_bo(bo, 257, 3, 1, 13),
        _entry_bo(bo, 258, 3, 1, 16),
        _entry_bo(bo, 259, 3, 1, 8),
        _entry_bo(bo, 262, 3, 1, 1),
        _entry_bo(bo, 273, 4, n, arr_off),
        _entry_bo(bo, 277, 3, 1, 1),
        _entry_bo(bo, 278, 3, 1, rows_per_strip),
        _entry_bo(bo, 279, 4, n, arr_off + 4 * n),
        _entry_bo(bo, 284, 3, 1, 1),
        _entry_bo(bo, 339, 3, 1, 1),
    ]
    head = struct.pack(bo + "2sHI", b"MM", 42, 8)
    ifd = (
        struct.pack(bo + "H", len(entries))
        + b"".join(entries)
        + struct.pack(bo + "I", 0)
    )
    buf = bytearray(head + ifd)
    buf += b"\x00" * (data_start - len(buf))
    struct.pack_into(f"{bo}{n}I", buf, arr_off, *offs)
    struct.pack_into(f"{bo}{n}I", buf, arr_off + 4 * n, *cnts)
    data = bytes(buf) + b"".join(strips)
    ifd0 = tiff.read_cog(data)[0]
    assert not ifd0.is_tiled and ifd0.rows_per_strip == 4
    assert ifd0.np_dtype == ">u2"
    assert np.array_equal(tiff.read_band(data, ifd0, 0), img)


def test_bits_per_sample_external_array_chunky_rgb():
    """BitsPerSample for a 3-sample image is a 3-entry SHORT array
    (6 bytes — EXTERNAL in classic TIFF). The repo writer always emits
    per-plane single-sample IFDs, so this shape only arrives from
    foreign chunky RGB files; the parser must dereference the array
    and use its first element."""
    rng = np.random.RandomState(36)
    img = rng.randint(0, 256, (16, 16, 3), np.uint8)
    payload = img.tobytes()  # uncompressed chunky tile
    bps_off = 300
    data_start = 320
    entries = [
        _entry(256, 3, 1, 16),
        _entry(257, 3, 1, 16),
        _entry(258, 3, 3, bps_off),  # external SHORT[3]
        _entry(259, 3, 1, 1),  # uncompressed
        _entry(262, 3, 1, 2),  # RGB
        _entry(277, 3, 1, 3),
        _entry(284, 3, 1, 1),  # chunky
        _entry(322, 3, 1, 16),
        _entry(323, 3, 1, 16),
        _entry(324, 4, 1, data_start),
        _entry(325, 4, 1, len(payload)),
        _entry(339, 3, 1, 1),
    ]
    entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])
    head = struct.pack("<2sHI", b"II", 42, 8)
    ifd = (
        struct.pack("<H", len(entries))
        + b"".join(entries)
        + struct.pack("<I", 0)
    )
    buf = bytearray(head + ifd)
    buf += b"\x00" * (data_start - len(buf))
    struct.pack_into("<3H", buf, bps_off, 8, 8, 8)
    data = bytes(buf) + payload
    ifd0 = tiff.read_cog(data)[0]
    assert ifd0.bands == 3 and ifd0.bits_per_sample == 8
    assert ifd0.planar_config == 1
    for b in range(3):
        assert np.array_equal(
            tiff.read_band(data, ifd0, b), img[:, :, b]
        )


def test_mm_overview_chain_with_subfile_type():
    """MM main + half-resolution overview page chained via next-IFD,
    the overview tagged NewSubfileType=1 (reduced image) — the parser
    must return both pages in chain order and decode each."""
    rng = np.random.RandomState(37)
    full = rng.randint(0, 65535, (16, 16), np.uint16)
    half = full[::2, ::2].copy()
    bo = ">"
    dt = full.dtype.newbyteorder(bo)
    p0 = zlib.compress(full.astype(dt).tobytes())
    p1 = zlib.compress(half.astype(dt).tobytes())

    def page(entries_vals, next_off):
        entries = [_entry_bo(bo, *e) for e in entries_vals]
        entries.sort(key=lambda e: struct.unpack(bo + "H", e[:2])[0])
        return (
            struct.pack(bo + "H", len(entries))
            + b"".join(entries)
            + struct.pack(bo + "I", next_off)
        )

    # layout: header(8) | ifd0 | ifd1 | p0 | p1
    n_entries0, n_entries1 = 13, 13
    ifd0_off = 8
    ifd1_off = ifd0_off + 2 + 12 * n_entries0 + 4
    d0 = ifd1_off + 2 + 12 * n_entries1 + 4
    d1 = d0 + len(p0)
    common = lambda wh, off, cnt, sub: [
        (254, 4, 1, sub),
        (256, 3, 1, wh),
        (257, 3, 1, wh),
        (258, 3, 1, 16),
        (259, 3, 1, 8),
        (262, 3, 1, 1),
        (277, 3, 1, 1),
        (284, 3, 1, 2),
        (322, 3, 1, wh),
        (323, 3, 1, wh),
        (324, 4, 1, off),
        (325, 4, 1, cnt),
        (339, 3, 1, 1),
    ]
    ifd0 = page(common(16, d0, len(p0), 0), ifd1_off)
    ifd1 = page(common(8, d1, len(p1), 1), 0)
    data = (
        struct.pack(bo + "2sHI", b"MM", 42, ifd0_off)
        + ifd0
        + ifd1
        + p0
        + p1
    )
    pages = tiff.read_cog(data)
    assert len(pages) == 2
    assert pages[0].subfile_type == 0 and pages[1].subfile_type == 1
    assert np.array_equal(tiff.read_band(data, pages[0], 0), full)
    assert np.array_equal(tiff.read_band(data, pages[1], 0), half)
