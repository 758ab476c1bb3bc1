"""Vector math over ARRAY<FLOAT>/ARRAY<DOUBLE> columns — JVM-side only.

Dot products and norms use Spark's higher-order functions
(``zip_with`` + ``aggregate``) which run inside whole-stage codegen; no
Python boundary is crossed. Elements are cast to DOUBLE *before*
multiplication so results are bit-identical to an oracle computing in
double precision (float*float→float would round differently).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order double-precision dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def sqnorm(a: Column) -> Column:
    """Sum of squares (double precision, sequential order)."""
    return F.aggregate(
        a,
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )


def norm(a: Column) -> Column:
    return F.sqrt(sqnorm(a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
