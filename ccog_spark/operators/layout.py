"""Z-order (Morton) clustering for multi-dimensional data skipping.

The 100 TB layout problem: parquet prunes row groups with min/max
stats, but a sort on ONE column destroys locality on every other —
filters on the second dimension scan everything. Interleaving the
bits of both sort keys (the Z-order curve) keeps row-group min/max
ranges narrow in ALL participating dimensions at once, which is what
Delta/Iceberg `OPTIMIZE ZORDER BY` does; here it is a pure-Spark
write-path transform.

Scale shape: per-dimension quantization uses approxQuantile cut
points (one bounded-size driver collect per dimension — the
Greenwald-Khanna sketch is a single pass) compiled into a BALANCED
binary-search `when` tree, so each row pays `bits` comparisons inside
whole-stage codegen — no global-sort window per dimension (a naive
ntile spelling would put the whole corpus through one partition,
exactly the WindowExec anti-pattern this repo avoids). Rank-based
cuts make the curve skew-proof: every dimension contributes equally
populated cells regardless of value distribution. The write itself is
`repartitionByRange` on the z-value — the range shuffle any global
sort pays, nothing more.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _searchsorted(col: Column, cuts: list[float]) -> Column:
    """Balanced when-tree computing |{c in cuts : col >= c}| — the
    cell index in [0, len(cuts)]. Depth = ceil(log2(len(cuts)+1))
    comparisons per row, all inside codegen.

    NULLs: every comparison is NULL → all branches fall through to
    cell 0, i.e. null rows cluster with the minimum values (and
    approxQuantile ignores nulls when placing cuts). Filter nulls
    first if they must not pollute the low cells' min/max stats."""

    def rec(lo: int, hi: int) -> Column:
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return (
            F.when(col >= F.lit(cuts[mid]), rec(mid + 1, hi))
            .otherwise(rec(lo, mid))
        )

    return rec(0, len(cuts))


def interleave_bits(cells: list[Column], bits: int) -> Column:
    """Morton code of ``len(cells)`` integer cell ids in [0, 2^bits):
    bit b of dimension d lands at position b*ndim + d. Pure bigint
    bit arithmetic — stays in codegen."""
    nd = len(cells)
    if nd * bits > 63:
        raise ValueError(
            f"{nd} dims x {bits} bits = {nd * bits} interleaved bits "
            "exceeds the 63 usable bits of a signed bigint (Java "
            "shiftleft wraps mod 64 — the code would silently corrupt)"
        )
    z = F.lit(0).cast("bigint")
    for d, c in enumerate(cells):
        cc = c.cast("bigint")
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cc, b).bitwiseAND(F.lit(1)), b * nd + d
                )
            )
    return z


def zorder_value(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    out: str = "_z",
    relative_error: float = 0.001,
) -> DataFrame:
    """Add a Z-order key over numeric ``cols``: each column is
    quantized to 2^bits rank-based cells via approxQuantile cut
    points (sketch pass per dimension, driver collect is 2^bits - 1
    floats), then bit-interleaved. Duplicate cuts (heavy single
    values) are tolerated — ties collapse into one cell, neighbors
    stay ordered."""
    n_cells = 1 << bits
    probs = [i / n_cells for i in range(1, n_cells)]
    # list overload: ALL columns' sketches in ONE pass over the data
    all_cuts = df.approxQuantile(cols, probs, relative_error)
    cells = [
        _searchsorted(F.col(c).cast("double"), cuts)
        for c, cuts in zip(cols, all_cuts)
    ]
    return df.withColumn(out, interleave_bits(cells, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Write parquet clustered on the Z-curve of ``cols``: range-
    partition on the z-value (contiguous curve segments per file),
    sort within partitions so row groups hold contiguous curve runs,
    drop the helper column. Readers filtering on ANY of ``cols`` then
    skip most row groups on min/max stats."""
    zcol = "_z"
    while zcol in df.columns:  # never clobber a caller's column
        zcol += "_"
    zdf = zorder_value(df, cols, bits, out=zcol)
    (
        zdf.repartitionByRange(n_files, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )


def hilbert_value_kernel(cuts_x: list[float], cuts_y: list[float], bits: int):
    """Arrow kernel computing the 2-D Hilbert index of rank-quantized
    (x, y) — strictly better worst-case locality than the Z curve
    (every curve step is a unit move; Z jumps across half the space at
    power-of-two boundaries). The xy→d transform is the standard
    rotate-and-reflect recurrence (Hamilton's convention), vectorized
    over the batch; quantization is np.searchsorted against the same
    approxQuantile cuts the Z path uses.

    An expression spelling of the recurrence would double-reference
    x/y per level — a 3^bits expression-tree blowup past codegen's
    method limits — so this one op is an Arrow kernel by design; the
    curve value is computed once per row at write time.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cx = np.asarray(cuts_x, "f8")
    cy = np.asarray(cuts_y, "f8")

    @pandas_udf("bigint")
    def hv(xs: pd.Series, ys: pd.Series) -> pd.Series:
        x = np.searchsorted(cx, xs.to_numpy("f8"), side="right").astype("i8")
        y = np.searchsorted(cy, ys.to_numpy("f8"), side="right").astype("i8")
        d = np.zeros(len(x), "i8")
        s = 1 << (bits - 1)
        while s > 0:
            rx = ((x & s) > 0).astype("i8")
            ry = ((y & s) > 0).astype("i8")
            d += s * s * ((3 * rx) ^ ry)
            # rotate quadrant
            flip = ry == 0
            swap_flip = flip & (rx == 1)
            x_f = np.where(swap_flip, s - 1 - x, x)
            y_f = np.where(swap_flip, s - 1 - y, y)
            x, y = np.where(flip, y_f, x_f), np.where(flip, x_f, y_f)
            s >>= 1
        return pd.Series(d)

    return hv


def hilbert_value(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    out: str = "_h",
    relative_error: float = 0.001,
) -> DataFrame:
    """Hilbert-curve key over exactly two numeric columns (same
    rank-based quantization as zorder_value; see
    hilbert_value_kernel for why this one is an Arrow kernel)."""
    if len(cols) != 2:
        raise ValueError("hilbert_value supports exactly 2 dimensions")
    n_cells = 1 << bits
    probs = [i / n_cells for i in range(1, n_cells)]
    all_cuts = df.approxQuantile(cols, probs, relative_error)
    kern = hilbert_value_kernel(all_cuts[0], all_cuts[1], bits)
    return df.withColumn(
        out, kern(F.col(cols[0]).cast("double"), F.col(cols[1]).cast("double"))
    )


def write_hilbert(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Hilbert-clustered parquet write (same range-partition + sort
    shape as write_zordered)."""
    hcol = "_h"
    while hcol in df.columns:
        hcol += "_"
    hdf = hilbert_value(df, cols, bits, out=hcol)
    (
        hdf.repartitionByRange(n_files, hcol)
        .sortWithinPartitions(hcol)
        .drop(hcol)
        .write.mode("overwrite")
        .parquet(path)
    )
