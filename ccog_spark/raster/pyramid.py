"""Resolution pyramid: iterative 2× decimation (ccog/ccog.py:558-666).

The reference builds each overview level by running GDAL per chunk and
reassembling (ccog/ccog.py:603-659). Here a level is a *hash aggregate
on halved coordinates* over the long-form pixel DataFrame — one shuffle
per level whose output is 4× smaller than its input, with a driver-side
``for level`` loop exactly like the reference's.

Non-interpolating kernels (overlap 0 in ccog's table, ccog/ccog.py:
43-53) are pure SQL:

- ``average``: mean of the valid pixels in each 2×2 block. The sum is
  computed in a FIXED order (tl+tr)+(bl+br) via conditional aggregation
  so results are bit-deterministic regardless of row order — a plain
  AVG() would vary in the last ulp with partitioning.
- ``nearest``: the top-left pixel of each 2×2 block (GDAL picks the
  first sample).
- ``rms``: sqrt(mean(v²)) over valid pixels, same fixed-order sums.
- ``mode``: most frequent valid value; ties break to the smallest
  value (deterministic; GDAL takes first-seen, which is row-order
  dependent — we pin a stable rule instead).

An output pixel is valid when any contributing pixel is valid
(``average``/``rms``/``mode`` aggregate only valid inputs; ``nearest``
inherits the top-left pixel's validity).

Interpolating kernels (bilinear/cubic/…) need halo exchange — see
raster.halo.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KERNELS = ("average", "nearest", "rms", "mode")


def _corner(name: str, dy: int, dx: int) -> Column:
    """Value of the 2×2-block corner (NULL when absent or invalid)."""
    return F.max(
        F.when(
            (F.col("y") % 2 == dy) & (F.col("x") % 2 == dx) & F.col("valid"),
            F.col(name),
        )
    )


def decimate(pixels: DataFrame, kernel: str = "average") -> DataFrame:
    """One 2× decimation step: (band,y,x,value,valid) → same schema at
    half resolution."""
    if kernel not in KERNELS:
        raise ValueError(f"unknown kernel {kernel!r}; expected one of {KERNELS}")
    oy = F.floor(F.col("y") / 2.0).cast("int")
    ox = F.floor(F.col("x") / 2.0).cast("int")
    g = pixels.groupBy(F.col("band"), oy.alias("y"), ox.alias("x"))

    if kernel == "nearest":
        agg = g.agg(
            F.max(
                F.when((F.col("y") % 2 == 0) & (F.col("x") % 2 == 0), F.col("value"))
            ).alias("value"),
            F.coalesce(
                F.max(
                    F.when(
                        (F.col("y") % 2 == 0) & (F.col("x") % 2 == 0), F.col("valid")
                    )
                ),
                F.lit(False),
            ).alias("valid"),
        )
        return agg.select("band", "y", "x", "value", "valid")

    if kernel == "mode":
        # two-stage: count per (block, value) over valid pixels, then
        # pick max count with smallest-value tiebreak
        counted = (
            pixels.where("valid")
            .groupBy(F.col("band"), oy.alias("y"), ox.alias("x"), F.col("value"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        picked = counted.groupBy("band", "y", "x").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("value")).alias("nv"))).alias("top")
        )
        with_mode = picked.select(
            "band", "y", "x", (-F.col("top.nv")).alias("value"), F.lit(True).alias("valid")
        )
        # blocks with no valid pixel: emit invalid NULL-value rows so the
        # grid stays dense (mirrors GDAL writing nodata)
        all_blocks = pixels.groupBy(F.col("band"), oy.alias("y"), ox.alias("x")).agg(
            F.lit(1).alias("_one")
        ).drop("_one")
        return all_blocks.join(with_mode, ["band", "y", "x"], "left").select(
            "band",
            "y",
            "x",
            "value",
            F.coalesce(F.col("valid"), F.lit(False)).alias("valid"),
        )

    # average / rms: fixed-order conditional sums
    src = F.col("value") if kernel == "average" else F.col("value") * F.col("value")
    tmp = pixels.select(
        "band", "y", "x", "valid", src.alias("v")
    )
    g2 = tmp.groupBy(F.col("band"), oy.alias("y"), ox.alias("x"))
    corners = g2.agg(
        _corner("v", 0, 0).alias("tl"),
        _corner("v", 0, 1).alias("tr"),
        _corner("v", 1, 0).alias("bl"),
        _corner("v", 1, 1).alias("br"),
    )
    cnt = (
        F.when(F.col("tl").isNotNull(), 1).otherwise(0)
        + F.when(F.col("tr").isNotNull(), 1).otherwise(0)
        + F.when(F.col("bl").isNotNull(), 1).otherwise(0)
        + F.when(F.col("br").isNotNull(), 1).otherwise(0)
    )
    total = (
        F.coalesce(F.col("tl"), F.lit(0.0)) + F.coalesce(F.col("tr"), F.lit(0.0))
    ) + (F.coalesce(F.col("bl"), F.lit(0.0)) + F.coalesce(F.col("br"), F.lit(0.0)))
    mean = total / cnt.cast("double")
    value = F.when(cnt > 0, mean if kernel == "average" else F.sqrt(mean))
    return corners.select(
        "band",
        "y",
        "x",
        value.alias("value"),
        (cnt > 0).alias("valid"),
    )


def overview_count(width: int, height: int, blocksize: int, cap: int = 30) -> int:
    """Pyramid depth: halve until the largest dim fits one block
    (GDAL-compatible rule, ccog/ccog.py:56-100)."""
    n = 0
    w, h = width, height
    while max(w, h) > blocksize and n < cap:
        w, h = (w + 1) // 2, (h + 1) // 2
        n += 1
    return n


def build_pyramid_interp(
    pixels: DataFrame,
    levels: int,
    kernel: str,
    blocksize: int,
    width: int,
    height: int,
    nodata: float | None,
    persist_levels: bool = True,
    persist_registry: list | None = None,
) -> DataFrame:
    """Interpolating-kernel pyramid for the WRITE path (closes R7: the
    reference writer accepts all 9 GDAL kernels and runs them per chunk,
    ccog/ccog.py:41-53,905-915,292-360 — here the interpolating five
    route through the halo-exchange machinery instead of GDAL).

    Per level: re-tile the current level's pixels (one groupBy-tile
    shuffle, float64 payloads so the convolution math is exact) and run
    raster.halo.interp_decimate (strip emit + one tile-key shuffle).
    Two shuffles per level vs the SQL kernels' one, each level 4×
    smaller than the last — at 100 TB the halo traffic adds only
    ~2·halo/blocksize (<2%) over the re-tile itself.

    Validity rule (pinned, documented GDAL divergence): an output pixel
    is valid iff ALL taps are valid. When a level dim is ODD, its last
    output row/col always has taps past the image edge (every kernel
    has an offset ≥ 1), so it is invalid → written as nodata fill; the
    kernel emits h//2 rows and tiles_from_pixels pads the ceil-halved
    grid, which is the same thing.

    The re-tile ships the packed validity mask WITH each tile
    (tiles_from_pixels(with_mask=True)) so validity never round-trips
    through the nodata sentinel: input rows with valid=false stay
    invalid under nodata=None, and valid pixels whose value equals
    nodata stay valid (round-13 ADVICE fix).

    ``persist_registry``: when a list is passed, every intermediate
    level frame this builder persists is appended to it so the CALLER
    can unpersist them once the pyramid is consumed (write_cog does —
    otherwise repeated writes, e.g. a streaming foreachBatch COG sink,
    would leak cached level frames for the session's lifetime).
    """
    from ccog_spark.raster.halo import INTERP_KERNELS, interp_decimate
    from ccog_spark.raster.tiles import tiles_from_pixels

    if kernel not in INTERP_KERNELS:
        raise ValueError(
            f"unknown interpolating kernel {kernel!r}; expected one of "
            f"{sorted(INTERP_KERNELS)}"
        )
    out = pixels.withColumn("level", F.lit(0))
    cur = pixels
    for lvl in range(1, levels + 1):
        tiles = tiles_from_pixels(
            cur.withColumn("level", F.lit(lvl - 1)).select(
                "level", "band", "y", "x", "value", "valid"
            ),
            blocksize,
            0.0 if nodata is None else nodata,
            width,
            height,
            dtype="float64",
            with_mask=True,
        )
        cur = interp_decimate(tiles, blocksize, kernel, nodata)
        if persist_levels and lvl < levels:
            cur = cur.persist()
            if persist_registry is not None:
                persist_registry.append(cur)
        out = out.unionByName(cur.withColumn("level", F.lit(lvl)))
    return out


def build_pyramid(
    pixels: DataFrame,
    levels: int,
    kernel: str = "average",
    persist_levels: bool = True,
    persist_registry: list | None = None,
) -> DataFrame:
    """Full pyramid as a union of level-tagged pixel DataFrames.

    Driver loop ≙ ccog's level loop (ccog/ccog.py:603-659). Each level
    is persisted before deriving the next so level k is computed once,
    not re-derived from level 0 for every consumer — the Spark analogue
    of the reference's ``to_delayed(optimize_graph=False)`` tradeoff
    (ccog/ccog.py:618-621). ``persist_registry`` collects the persisted
    handles for caller-side unpersist (see build_pyramid_interp).
    """
    out = pixels.withColumn("level", F.lit(0))
    cur = pixels
    for lvl in range(1, levels + 1):
        cur = decimate(cur, kernel)
        if persist_levels and lvl < levels:
            cur = cur.persist()
            if persist_registry is not None:
                persist_registry.append(cur)
        out = out.unionByName(cur.withColumn("level", F.lit(lvl)))
    return out
