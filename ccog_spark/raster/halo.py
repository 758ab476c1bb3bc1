"""Halo exchange + interpolating resampling kernels (E21 ≙ ccog R7/R12).

The reference grows every chunk by ``overlap`` pixels from its
neighbours with dask's array machinery before running GDAL's
interpolating resamplers (ccog/ccog.py:614-616; kernel→overlap table at
:41-53 — bilinear 2, cubic 4, cubicspline 4, lanczos 6, gauss 2).

Spark re-expression: a **neighbour-strip shuffle**. Every tile emits up
to 8 edge strips addressed to its neighbours plus its own core; one
groupBy(tile key) co-locates a tile with the strips it needs; an
``applyInPandas`` kernel assembles the padded array and convolves. Only
``halo·perimeter`` pixels per tile cross the wire — at 100 TB the halo
traffic is ~2·halo/blocksize (≈1.6% for halo 4, blocksize 512) of the
raster, not a 9× duplication.

Kernel: 2× cubic (Catmull-Rom) decimation — the output sample sits at
source coordinate 2j+0.5, a separable 4-tap filter with weights
(-0.0625, 0.5625, 0.5625, -0.0625) (the classic half-phase Catmull-Rom
taps; public DSP knowledge). GDAL's cubic differs in nodata weighting;
we pin a deterministic rule instead: an output pixel is valid iff all
16 contributing taps are valid. Correctness is proven by
**tiling-invariance**: the tiled+halo result must equal the same
convolution run on the whole untiled array (tests/test_halo.py).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import math

CUBIC_HALO = 2  # taps reach 1 px left / 2 px right of the 2×2 block
CUBIC_TAPS = (-0.0625, 0.5625, 0.5625, -0.0625)


def _lanczos_taps(a: int = 3) -> tuple[tuple[int, ...], tuple[float, ...]]:
    """Factor-2 phase-0.5 Lanczos-a taps: samples at distance |k-0.5|
    for k in 1-a..a, normalized to sum 1 (standard windowed sinc)."""
    offs = tuple(range(1 - a, a + 1))
    def l(x: float) -> float:
        if x == 0:
            return 1.0
        return (
            a * math.sin(math.pi * x) * math.sin(math.pi * x / a)
            / (math.pi * math.pi * x * x)
        )
    raw = [l(k - 0.5) for k in offs]
    s = sum(raw)
    return offs, tuple(w / s for w in raw)


LANCZOS_OFFSETS, LANCZOS_TAPS = _lanczos_taps(3)

# (offsets relative to the 2×2 block origin, taps, halo) per kernel —
# halo intent mirrors ccog's overlap table (ccog/ccog.py:41-53):
# bilinear needs none for exact factor-2, cubic 2, lanczos(a=3) 3,
# gauss 1.
# cubic B-spline (GDAL 'cubicspline', the smoothing spline in ccog's
# kernel table ccog/ccog.py:41-53): basis B(x) = |x|³/2 − x² + 2/3 for
# |x|≤1, (2−|x|)³/6 for 1≤|x|≤2; sampled at half-phase distances
# {1.5, 0.5, 0.5, 1.5} → (1/48, 23/48, 23/48, 1/48), sum exactly 1.
CUBICSPLINE_TAPS = (1 / 48, 23 / 48, 23 / 48, 1 / 48)

INTERP_KERNELS: dict[str, tuple[tuple[int, ...], tuple[float, ...], int]] = {
    "bilinear": ((0, 1), (0.5, 0.5), 1),
    "cubic": ((-1, 0, 1, 2), CUBIC_TAPS, 2),
    "cubicspline": ((-1, 0, 1, 2), CUBICSPLINE_TAPS, 2),
    "lanczos": (LANCZOS_OFFSETS, LANCZOS_TAPS, 3),
    "gauss": ((-1, 0, 1), (0.25, 0.5, 0.25), 1),
}

STRIP_SCHEMA = (
    "band int, tile_y int, tile_x int, rel_y int, rel_x int, "
    "src_h int, src_w int, data binary, mask binary"
)

PIXEL_SCHEMA = "band int, y int, x int, value double, valid boolean"


def _emit_strips_kernel(bs: int, halo: int, nodata: float | None, use_mask: bool = False):
    """mapInPandas kernel: each tile row → its core (rel 0,0) plus up to
    8 halo strips addressed to neighbouring tile keys. Self-contained
    closure (no ccog_spark import on executors).

    Validity source: with ``use_mask`` the tile rows carry a ``vmask``
    column (packed bits, tiles.TILE_MASK_SCHEMA) that is authoritative —
    valid=false input rows stay invalid even when their fill value
    can't signal it, and valid pixels whose value EQUALS nodata stay
    valid (round-13 ADVICE fix). Without it (legacy/standalone tile
    frames) validity is re-derived from the sentinel: ``nodata=None``
    means the raster declares no nodata, so every clip pixel is valid
    (the write path's sparse-fill-0 rule must not mark real zeros
    invalid); image-edge padding stays invalid via the assemble
    kernel's vpad."""

    def emit(it):
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            out = {k: [] for k in (
                "band", "tile_y", "tile_x", "rel_y", "rel_x",
                "src_h", "src_w", "data", "mask",
            )}
            for r in pdf.itertuples(index=False):
                # payloads are full bs×bs padded blocks; the image clip
                # is the (height, width) corner (raster.tiles contract)
                arr = _np.frombuffer(r.data, dtype="<f8").reshape(bs, bs)[
                    : r.height, : r.width
                ]
                if use_mask:
                    valid = _np.unpackbits(
                        _np.frombuffer(r.vmask, dtype=_np.uint8),
                        count=bs * bs,
                    ).astype(bool).reshape(bs, bs)[: r.height, : r.width]
                elif nodata is None:
                    valid = _np.ones(arr.shape, dtype=bool)
                else:
                    valid = arr != nodata
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        ty, tx = r.tile_y + dy, r.tile_x + dx
                        if ty < 0 or tx < 0:
                            continue
                        if dy == 0:
                            ys = slice(0, r.height)
                        elif dy == 1:  # strip for the tile below: my bottom rows
                            ys = slice(max(0, r.height - halo), r.height)
                        else:  # tile above: my top rows
                            ys = slice(0, min(halo, r.height))
                        if dx == 0:
                            xs = slice(0, r.width)
                        elif dx == 1:
                            xs = slice(max(0, r.width - halo), r.width)
                        else:
                            xs = slice(0, min(halo, r.width))
                        sub = arr[ys, xs]
                        if sub.size == 0:
                            continue
                        out["band"].append(r.band)
                        out["tile_y"].append(ty)
                        out["tile_x"].append(tx)
                        # placement of this strip inside the padded array,
                        # relative to the receiving tile's core origin
                        oy = r.tile_y * bs + ys.start
                        ox = r.tile_x * bs + xs.start
                        out["rel_y"].append(oy - ty * bs)
                        out["rel_x"].append(ox - tx * bs)
                        out["src_h"].append(sub.shape[0])
                        out["src_w"].append(sub.shape[1])
                        out["data"].append(_np.ascontiguousarray(sub).tobytes())
                        out["mask"].append(
                            _np.packbits(valid[ys, xs].ravel()).tobytes()
                        )
            yield _pd.DataFrame(out)

    return emit


def _assemble_decimate_kernel(
    bs: int, halo: int, nodata: float | None, taps, offsets
):
    """applyInPandas kernel: strips of one (band, tile) → padded array →
    separable n-tap 2× decimation of the core → long-form pixels.
    ``nodata=None``: pad fill is 0.0 (never read — vpad gates every
    tap) and validity comes entirely from the strip masks."""
    tap_arr = list(taps)
    off_arr = list(offsets)
    fill = 0.0 if nodata is None else nodata

    def assemble(pdf):
        import numpy as _np
        import pandas as _pd

        band = int(pdf["band"].iloc[0])
        ty = int(pdf["tile_y"].iloc[0])
        tx = int(pdf["tile_x"].iloc[0])
        # the core is the (only) strip placed exactly at (0, 0): halo
        # strips from neighbours land at negative or ≥bs offsets. A
        # group with no core is a halo addressed past the grid edge.
        at_origin = pdf[(pdf["rel_y"] == 0) & (pdf["rel_x"] == 0)]
        if len(at_origin) == 0:
            return _pd.DataFrame(
                columns=["band", "y", "x", "value", "valid"]
            )
        main = at_origin.loc[at_origin["src_h"].idxmax()]
        h, w = int(main["src_h"]), int(main["src_w"])

        pad = _np.full((h + 2 * halo, w + 2 * halo), fill, dtype="<f8")
        vpad = _np.zeros((h + 2 * halo, w + 2 * halo), dtype=bool)
        for r in pdf.itertuples(index=False):
            sub = _np.frombuffer(r.data, dtype="<f8").reshape(r.src_h, r.src_w)
            m = _np.unpackbits(
                _np.frombuffer(r.mask, dtype=_np.uint8),
                count=r.src_h * r.src_w,
            ).astype(bool).reshape(r.src_h, r.src_w)
            y0, x0 = r.rel_y + halo, r.rel_x + halo
            if y0 < 0 or x0 < 0:
                continue
            if y0 + r.src_h > pad.shape[0] or x0 + r.src_w > pad.shape[1]:
                continue
            pad[y0 : y0 + r.src_h, x0 : x0 + r.src_w] = sub
            vpad[y0 : y0 + r.src_h, x0 : x0 + r.src_w] = m

        t = _np.array(tap_arr)
        oh, ow = h // 2, w // 2
        data = _np.where(vpad, pad, 0.0)
        # separable: rows first (source coord 2j+0.5 → taps at 2j+off)
        row_acc = _np.zeros((oh, w + 2 * halo))
        row_ok = _np.ones((oh, w + 2 * halo), dtype=bool)
        for k, off in enumerate(off_arr):
            idx = 2 * _np.arange(oh) + off + halo
            row_acc += t[k] * data[idx, :]
            row_ok &= vpad[idx, :]
        col_acc = _np.zeros((oh, ow))
        col_ok = _np.ones((oh, ow), dtype=bool)
        for k, off in enumerate(off_arr):
            idx = 2 * _np.arange(ow) + off + halo
            col_acc += t[k] * row_acc[:, idx]
            col_ok &= row_ok[:, idx]
        vals = col_acc
        ok = col_ok

        yy, xx = _np.meshgrid(_np.arange(oh), _np.arange(ow), indexing="ij")
        return _pd.DataFrame(
            {
                "band": band,
                "y": (ty * bs) // 2 + yy.ravel(),
                "x": (tx * bs) // 2 + xx.ravel(),
                "value": _np.where(ok, vals, _np.nan).ravel(),
                "valid": ok.ravel(),
            }
        )

    return assemble


def interp_decimate(
    tiles: DataFrame,
    blocksize: int,
    kernel: str = "cubic",
    nodata: float | None = -9999.0,
) -> DataFrame:
    """2× interpolating decimation of a tile DataFrame via halo
    exchange (kernel ∈ INTERP_KERNELS). Returns long-form pixels at
    half resolution. One strip shuffle (groupBy tile key), one Python
    kernel pass. ``nodata=None``: every clip pixel is valid (no-nodata
    rasters); output pixels are invalid only where taps cross the
    image edge. When ``tiles`` carries a ``vmask`` column
    (tiles_from_pixels(with_mask=True)) it is the authoritative
    validity source — no sentinel round-trip.
    """
    offsets, taps, halo = INTERP_KERNELS[kernel]
    strips = tiles.mapInPandas(
        _emit_strips_kernel(
            blocksize, halo, nodata, use_mask="vmask" in tiles.columns
        ),
        STRIP_SCHEMA,
    )
    return strips.groupBy("band", "tile_y", "tile_x").applyInPandas(
        _assemble_decimate_kernel(blocksize, halo, nodata, taps, offsets),
        PIXEL_SCHEMA,
    )


def cubic_decimate(
    tiles: DataFrame, blocksize: int, nodata: float = -9999.0
) -> DataFrame:
    return interp_decimate(tiles, blocksize, "cubic", nodata)


def interp_decimate_reference(
    arr: np.ndarray,
    valid: np.ndarray,
    kernel: str = "cubic",
    nodata: float | None = -9999.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side untiled reference of the same convolution (the
    tiling-invariance oracle): pad the full array with a nodata halo
    and apply the identical separable taps."""
    offsets, taps, halo = INTERP_KERNELS[kernel]
    fill = 0.0 if nodata is None else nodata
    h, w = arr.shape
    pad = np.full((h + 2 * halo, w + 2 * halo), fill)
    vpad = np.zeros((h + 2 * halo, w + 2 * halo), dtype=bool)
    pad[halo : halo + h, halo : halo + w] = arr
    vpad[halo : halo + h, halo : halo + w] = valid
    t = np.array(taps)
    data = np.where(vpad, pad, 0.0)
    oh, ow = h // 2, w // 2
    row_acc = np.zeros((oh, w + 2 * halo))
    row_ok = np.ones((oh, w + 2 * halo), dtype=bool)
    for k, off in enumerate(offsets):
        idx = 2 * np.arange(oh) + off + halo
        row_acc += t[k] * data[idx, :]
        row_ok &= vpad[idx, :]
    col_acc = np.zeros((oh, ow))
    col_ok = np.ones((oh, ow), dtype=bool)
    for k, off in enumerate(offsets):
        idx = 2 * np.arange(ow) + off + halo
        col_acc += t[k] * row_acc[:, idx]
        col_ok &= row_ok[:, idx]
    return np.where(col_ok, col_acc, fill), col_ok


def cubic_decimate_reference(
    arr: np.ndarray, valid: np.ndarray, nodata: float = -9999.0
) -> tuple[np.ndarray, np.ndarray]:
    return interp_decimate_reference(arr, valid, "cubic", nodata)
