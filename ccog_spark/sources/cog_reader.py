"""Distributed COG → DataFrame source (round 6; completes the E3/E4
round-trip: engine-written COGs can be re-opened as long-form pixels
without GDAL).

Scale shape: the DRIVER reads only the header region (IFD chain +
external arrays — all before ``data_start`` in this writer's layout,
a few KB..MB regardless of data size) and builds a tile index of
(level, band, tile_y, tile_x, offset, nbytes) rows. That index is an
ordinary DataFrame; executors seek+read their own tile byte ranges and
decode in Arrow-batched kernels — tile payloads are born ON the
executor that decodes them, nothing is shuffled but the index and the
decoded pixels the caller asked for. This is the standard
"driver reads footer, executors read row groups" parquet-reader shape
applied to COG.

The reference has no read path of its own (it delegates reads to
GDAL); this source exists so a reference user can both write AND read
at scale through one engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ccog_spark.raster import codecs as codecs_mod
from ccog_spark.raster import tiff

PIXEL_SCHEMA = (
    "band int, y int, x int, value double, valid boolean"
)

INDEX_SCHEMA = (
    "band int, tile_y int, tile_x int, offset bigint, nbytes int"
)


def read_header(path: str, probe: int = 1 << 20) -> list[tiff.IfdInfo]:
    """Parse the IFD chain reading only the file's head (growing the
    probe window on truncation — never the data region).

    When the parse knows the byte offset it ran short at, it raises
    ``tiff.NeedBytes`` with that hint and the retry reads EXACTLY that
    much — one extra open per IFD-chain segment instead of blind ×4
    growth re-reading the head log₄(size) times (round-8). The blind
    ×4 path remains the backstop for errors without a hint
    (struct.error from unpack_from on a torn buffer)."""
    import os
    import struct

    size = os.path.getsize(path)
    while True:
        with open(path, "rb") as f:
            head = f.read(min(probe, size))
        try:
            return tiff.read_cog(head)
        except tiff.NeedBytes as e:
            if probe >= size:
                raise  # whole file read: genuinely corrupt
            # the parse reported the furthest offset it needs — read
            # to exactly there (plus nothing; the hint already covers
            # every known external array of the failing IFD)
            probe = max(e.hint, probe + 1)
        except (IndexError, ValueError, AssertionError, struct.error):
            # struct.error is what a truncated IFD/external array
            # actually raises from unpack_from — it must grow the
            # probe, not crash (round-6 review)
            if probe >= size:
                raise
            probe *= 4


def read_cog_pixels(
    spark: SparkSession,
    path: str,
    level: int = 0,
    bands: list[int] | None = None,
    window: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """Open a COG/GeoTIFF as (band, y, x, value, valid).

    Handles this engine's own files plus the common foreign layouts
    (round 7): strip-based GeoTIFFs (strips = full-width tiles, last
    strip unpadded), uncompressed (tag 1) payloads, and
    pixel-interleaved (PlanarConfig=1) color tiles incl. YCbCr JPEG.
    Layouts it cannot represent raise a clear ValueError from the
    header parse — never wrong pixels (tests/test_cog_reader_foreign).

    ``level`` selects the pyramid level (0 = full resolution);
    ``bands`` optionally prunes band planes at the INDEX level — pruned
    tiles are never read from storage (the reader's analogue of column
    pruning); for pixel-interleaved files the tile must be read anyway,
    so pruning happens at decode. Sparse tiles (bytecount 0) yield no
    rows: their pixels are nodata by construction, matching the
    writer's elision.

    ``window``: (x0, y0, x1, y1) half-open pixel bbox at the selected
    level — THE COG access pattern (the format exists so a reader can
    fetch a spatial window without touching the rest): tiles outside
    the window are pruned at the INDEX (never read from storage, the
    spatial analogue of partition pruning), intersecting edge tiles
    are decoded then clipped, and only in-window pixels are emitted."""
    data_pages = [i for i in read_header(path) if not tiff.is_mask_ifd(i)]
    if level >= len(data_pages):
        raise ValueError(
            f"level {level} out of range ({len(data_pages)} data pages)"
        )
    ifd = data_pages[level]
    tx = (ifd.width + ifd.tile_width - 1) // ifd.tile_width
    ty = (ifd.height + ifd.tile_height - 1) // ifd.tile_height
    n_tiles = tx * ty
    chunky = ifd.planar_config == 1 and ifd.bands > 1

    if window is not None:
        x0, y0, x1, y1 = (int(v) for v in window)
        if not (0 <= x0 < x1 <= ifd.width and 0 <= y0 < y1 <= ifd.height):
            raise ValueError(
                f"window {window} outside level-{level} extent "
                f"{ifd.width}x{ifd.height} (half-open, x0<x1, y0<y1)"
            )
        tx0, tx1 = x0 // ifd.tile_width, (x1 - 1) // ifd.tile_width
        ty0, ty1 = y0 // ifd.tile_height, (y1 - 1) // ifd.tile_height

    def _in_window(r: int, c: int) -> bool:
        if window is None:
            return True
        return ty0 <= r <= ty1 and tx0 <= c <= tx1

    needed = n_tiles if chunky else ifd.bands * n_tiles
    if len(ifd.offsets) < needed or len(ifd.bytecounts) < needed:
        raise ValueError(
            f"IFD geometry implies {needed} tiles but offsets/counts "
            f"hold {len(ifd.offsets)}/{len(ifd.bytecounts)}"
        )
    index = []
    if chunky:
        # pixel-interleaved: ONE stored tile carries every band — band
        # pruning happens at decode, not at the index (the tile must be
        # read either way); band = -1 marks "all bands in this tile"
        for t in range(n_tiles):
            if ifd.bytecounts[t] == 0 or not _in_window(t // tx, t % tx):
                continue
            index.append(
                (-1, t // tx, t % tx, ifd.offsets[t], ifd.bytecounts[t])
            )
    else:
        for band in range(ifd.bands):
            if bands is not None and band not in bands:
                continue
            for t in range(n_tiles):
                i = band * n_tiles + t
                if ifd.bytecounts[i] == 0 or not _in_window(t // tx, t % tx):
                    continue  # sparse or out-of-window: never read
                index.append(
                    (band, t // tx, t % tx, ifd.offsets[i], ifd.bytecounts[i])
                )
    idx_df = spark.createDataFrame(index, INDEX_SCHEMA)

    # ship the codec registry by value so the decode closure needs no
    # ccog_spark import on executors (same contract as encode_tiles)
    codecs_mod.register_worker_modules()
    decompress = codecs_mod.decompress
    unpredict = codecs_mod.unpredict_tile

    th, tw = ifd.tile_height, ifd.tile_width
    np_dtype = ifd.np_dtype
    compression = ifd.compression
    predictor = ifd.predictor
    nodata = ifd.nodata
    jpeg_tables = ifd.jpeg_tables
    im_h, im_w = ifd.height, ifd.width
    # foreign strip-based layouts: strips are full-width "tiles" whose
    # LAST row block is stored unpadded (TIFF 6.0 §3) — decode with the
    # clip height instead of decoding th then cropping
    striped = not ifd.is_tiled
    n_samples = ifd.bands if chunky else 1
    want_bands = (
        list(range(ifd.bands)) if bands is None else sorted(bands)
    )
    win = None if window is None else (x0, y0, x1, y1)

    def decode_batch(it):
        import numpy as np
        import pandas as pd

        with open(path, "rb") as f:
            for pdf in it:
                outs = []
                for r in pdf.itertuples(index=False):
                    f.seek(r.offset)
                    raw = decompress(
                        f.read(r.nbytes), compression, tables=jpeg_tables
                    )
                    h = min(th, im_h - r.tile_y * th)
                    w = min(tw, im_w - r.tile_x * tw)
                    # window clip: local [ly0, ly1) x [lx0, lx1) of the
                    # image clip (edge tiles of the bbox decode whole
                    # but emit only in-window pixels)
                    if win is not None:
                        ly0 = max(0, win[1] - r.tile_y * th)
                        ly1 = min(h, win[3] - r.tile_y * th)
                        lx0 = max(0, win[0] - r.tile_x * tw)
                        lx1 = min(w, win[2] - r.tile_x * tw)
                    else:
                        ly0, ly1, lx0, lx1 = 0, h, 0, w
                    dech = h if striped else th
                    if n_samples > 1:
                        # pixel-interleaved tile: (th, tw, bands)
                        arr3 = np.frombuffer(
                            raw, dtype=np_dtype
                        ).reshape(dech, tw, n_samples)
                        planes = [
                            (b, arr3[ly0:ly1, lx0:lx1, b])
                            for b in want_bands
                        ]
                    else:
                        # inverse predictor: the SAME
                        # codecs.unpredict_tile the writer/parser use,
                        # shipped by value — one implementation, no
                        # drift (round-6 review)
                        arr = unpredict(raw, predictor, dech, tw, np_dtype)
                        planes = [(r.band, arr[ly0:ly1, lx0:lx1])]
                    yy, xx = np.meshgrid(
                        np.arange(ly0, ly1), np.arange(lx0, lx1),
                        indexing="ij",
                    )
                    for b, plane in planes:
                        vals = plane.astype("f8")
                        valid = (
                            vals != nodata
                            if nodata is not None
                            else np.ones_like(vals, dtype=bool)
                        )
                        outs.append(
                            pd.DataFrame(
                                {
                                    "band": b,
                                    "y": (r.tile_y * th + yy).ravel(),
                                    "x": (r.tile_x * tw + xx).ravel(),
                                    "value": np.where(
                                        valid, vals, np.nan
                                    ).ravel(),
                                    "valid": valid.ravel(),
                                }
                            )
                        )
                if outs:
                    yield pd.concat(outs, ignore_index=True)

    return idx_df.mapInPandas(decode_batch, PIXEL_SCHEMA)


def read_cog_mask(
    spark: SparkSession, path: str, level: int = 0
) -> DataFrame:
    """Open an internal MASK page as (y, x, valid) — rows only for
    tiles that were written (all-False tiles are sparse)."""
    mask_pages = [i for i in read_header(path) if tiff.is_mask_ifd(i)]
    if not mask_pages:
        raise ValueError(f"{path} has no internal mask pages")
    if level >= len(mask_pages):
        raise ValueError(f"mask level {level} out of range")
    ifd = mask_pages[level]
    tx = (ifd.width + ifd.tile_width - 1) // ifd.tile_width
    index = [
        (0, t // tx, t % tx, ifd.offsets[t], ifd.bytecounts[t])
        for t in range(len(ifd.offsets))
        if ifd.bytecounts[t] != 0
    ]
    idx_df = spark.createDataFrame(index, INDEX_SCHEMA)
    # codecs' REGISTRY references jpegcodec functions, so both modules
    # ship by value (one helper — round-6 review) even though masks
    # are always deflate
    codecs_mod.register_worker_modules()
    decompress = codecs_mod.decompress
    th, tw = ifd.tile_height, ifd.tile_width
    compression = ifd.compression
    im_h, im_w = ifd.height, ifd.width

    def decode_batch(it):
        import numpy as np
        import pandas as pd

        with open(path, "rb") as f:
            for pdf in it:
                outs = []
                for r in pdf.itertuples(index=False):
                    f.seek(r.offset)
                    raw = decompress(f.read(r.nbytes), compression)
                    bits = np.unpackbits(
                        np.frombuffer(raw, np.uint8).reshape(th, -1),
                        axis=1,
                    )[:, :tw]
                    h = min(th, im_h - r.tile_y * th)
                    w = min(tw, im_w - r.tile_x * tw)
                    bits = bits[:h, :w]
                    yy, xx = np.meshgrid(
                        np.arange(h), np.arange(w), indexing="ij"
                    )
                    outs.append(
                        pd.DataFrame(
                            {
                                "y": (r.tile_y * th + yy).ravel(),
                                "x": (r.tile_x * tw + xx).ravel(),
                                "valid": bits.astype(bool).ravel(),
                            }
                        )
                    )
                if outs:
                    yield pd.concat(outs, ignore_index=True)

    return idx_df.mapInPandas(decode_batch, "y int, x int, valid boolean")
