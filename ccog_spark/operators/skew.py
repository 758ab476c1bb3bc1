"""Skew-handling join strategies.

AQE's skew-join splitting (on by default in the session factory)
handles most skew at runtime; explicit salting is the deterministic
tool when one build-side key dominates so heavily that even split
partitions overwhelm a task — the classic 100 TB hot-key case.

``salted_join``: the large (probe) side gets a uniform salt in
[0, n_salts); the small (build) side is exploded n_salts× so every
(key, salt) bucket finds its match. Correct for inner/left joins on
equality keys; result is identical to the unsalted join (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equality join with the hot-key shuffle spread across n_salts
    sub-keys. The small side is replicated n_salts× (bounded blow-up;
    choose n_salts ≈ skew factor), the large side is never replicated.
    """
    salted_large = large.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    salted_small = small.withColumn("_salt", salts)
    out = salted_large.join(
        salted_small,
        (F.col(left_key) == F.col(right_key)) & (salted_large._salt == salted_small._salt),
        how,
    )
    return out.drop(salted_large._salt).drop(salted_small._salt)
