"""Deterministic raster-domain fixtures (FIXTURES.md §10/§11).

The driver's testdata has no ``pixels``/``parts`` parquet, so both the
engine and the DuckDB oracle must *generate* them — identically. All
values derive from integer arithmetic (modulo, FLOOR division) on a row
index, so the two engines produce bit-identical doubles: no
transcendental functions, no RNG, no row-order dependence. (FLOOR is
used for every division because DuckDB's ``/`` is true division and its
double→int CAST rounds, while Spark's truncates.)

``pixels``: 3 bands × 96 rows (H) × 160 cols (W), blocksize 32 →
3×5 = 15 tiles/band; one full block per band is invalid (exercises
sparse-tile elision, reference ccog/ccog.py:443) plus ~2.7% scattered
invalid pixels.

``parts``: 4 pyramid levels with 40/20/10/5 ordered parts; ~14% of
parts have nbytes=0 (sparse, reference ccog/ccog.py:753-754).

On Spark, fixtures are built from ``spark.range`` — a parallel,
partitioned source that scales linearly with the row count (no driver
materialization), exactly how a 100 TB synthetic benchmark table would
be generated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

H, W, BANDS, BLOCK = 96, 160, 3, 32
N_PIXELS = BANDS * H * W  # 46080


def _idiv(col: Column, d: int) -> Column:
    """Floor division matching semantics across Spark and DuckDB."""
    return F.floor(col / F.lit(d)).cast("int")


def pixels_df(spark: SparkSession) -> DataFrame:
    """Long-form raster: (band, y, x, value, valid) — SQL projection of
    the reference's dense (band, y, x) array model."""
    ids = spark.range(N_PIXELS)
    df = ids.select(
        (_idiv(F.col("id"), H * W) + 1).alias("band"),
        _idiv(F.col("id") % (H * W), W).alias("y"),
        (F.col("id") % W).cast("int").alias("x"),
    )
    value = (
        (
            F.col("band") * 7919 + F.col("y") * 104729 + F.col("x") * 130363
        ) % 100000
    ).cast("double") / F.lit(100.0)
    block_id = _idiv(F.col("y"), BLOCK) * 5 + _idiv(F.col("x"), BLOCK)
    block_invalid = block_id == F.col("band") * 3
    scatter_invalid = ((F.col("y") * 13 + F.col("x") * 7 + F.col("band")) % 37) == 0
    return df.select(
        "band",
        "y",
        "x",
        value.alias("value"),
        (~block_invalid & ~scatter_invalid).alias("valid"),
    )


# DuckDB CTE producing the identical table (integer arithmetic matches
# Spark exactly; 46080 = 3*96*160, 15360 = 96*160).
PIXELS_SQL_CTE = """
pixels AS (
  SELECT band, y, x,
         CAST((band * 7919 + y * 104729 + x * 130363) % 100000 AS DOUBLE) / 100.0 AS value,
         (NOT ((CAST(FLOOR(y / 32.0) AS INT) * 5 + CAST(FLOOR(x / 32.0) AS INT)) = band * 3))
           AND (NOT ((y * 13 + x * 7 + band) % 37 = 0)) AS valid
  FROM (
    SELECT CAST(FLOOR(id / 15360.0) AS INT) + 1 AS band,
           CAST(FLOOR((id % 15360) / 160.0) AS INT) AS y,
           CAST(id % 160 AS INT) AS x
    FROM (SELECT range AS id FROM range(46080))
  )
)
"""


def parts_df(spark: SparkSession) -> DataFrame:
    """Ordered byte-part index: (level, part_seq, nbytes), mirroring the
    reference's parts_info (ccog/ccog.py:448,744-757)."""
    ids = spark.range(160)
    df = ids.select(
        _idiv(F.col("id"), 40).alias("level"),
        (F.col("id") % 40).cast("int").alias("part_seq"),
    )
    df = df.where(F.col("part_seq") < F.expr("shiftright(40, level)"))
    h = (F.col("level") * 40503 + F.col("part_seq") * F.lit(2654435761)) % 1009
    nbytes = F.when(h % 7 == 0, F.lit(0)).otherwise((h * 1999) % 2000000)
    return df.select(
        "level", "part_seq", nbytes.cast("bigint").alias("nbytes")
    )


PARTS_SQL_CTE = """
parts AS (
  SELECT level, part_seq,
         CAST(CASE WHEN ((level * 40503 + part_seq * 2654435761) % 1009) % 7 = 0
                   THEN 0
                   ELSE (((level * 40503 + part_seq * 2654435761) % 1009) * 1999) % 2000000
              END AS BIGINT) AS nbytes
  FROM (
    SELECT CAST(FLOOR(id / 40.0) AS INT) AS level, CAST(id % 40 AS INT) AS part_seq
    FROM (SELECT range AS id FROM range(160))
  )
  WHERE part_seq < (40 >> level)
)
"""
