"""As-of / range join strategies (E9/E10).

Three physical strategies for "latest right-row at or before the left
timestamp, per key":

1. ``asof_join_agg`` — equi-join on key with the range predicate as a
   residual, then max() per left row. Best when right rows per key are
   modest; one shuffle each side, hash join, partial agg.
2. ``asof_join_union`` — the sort-based merge: union left (tagged) and
   right rows, one window pass ordered by (key, ts) carrying the last
   right value forward (last_value ignoring nulls). NO join at all —
   best when right is huge and keys are skewed: each row is touched
   once, cost is one shuffle+sort of the union.
3. ``asof_join_pandas`` — per-key ``applyInPandas`` with
   ``pd.merge_asof`` for kernels SQL can't express (nearest, tolerance).

All three return identical results; tests assert it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join_agg(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
) -> DataFrame:
    """Join+aggregate strategy: per left row, MAX(right ts ≤ left ts).

    Columns are projected to disambiguated names first so the operator
    works even when both sides derive from the same source (self-join).
    """
    l = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_key).alias("__lk"),
        F.col(left_ts).alias("__lt"),
    )
    r = right.select(
        F.col(right_key).alias("__rk"), F.col(right_ts).alias("__rt")
    )
    return (
        l.join(r, (F.col("__rk") == F.col("__lk")) & (F.col("__rt") <= F.col("__lt")))
        .groupBy("__lid")
        .agg(F.max("__rt").alias("asof_ts"))
        .select(F.col("__lid").alias(left_id), "asof_ts")
    )


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
) -> DataFrame:
    """Union+window strategy: no join — tag rows, sort by (key, ts,
    side), carry the latest right timestamp forward.

    Right rows sort before left rows at equal timestamps (side 0 < 1)
    so ts == left_ts matches, mirroring the ≤ semantics. This is the
    100 TB-safe plan for skewed keys: one shuffle of the union, one
    sort, zero join blowup.
    """
    r = right.select(
        F.col(right_key).alias("k"),
        F.col(right_ts).alias("t"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("lid"),
        F.col(right_ts).alias("rts"),
    )
    l = left.select(
        F.col(left_key).alias("k"),
        F.col(left_ts).alias("t"),
        F.lit(1).alias("side"),
        F.col(left_id).cast("long").alias("lid"),
        F.lit(None).cast(r.schema["rts"].dataType).alias("rts"),
    )
    w = (
        W.partitionBy("k")
        .orderBy("t", "side")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    merged = r.unionByName(l).withColumn(
        "asof_ts", F.last("rts", ignorenulls=True).over(w)
    )
    return (
        merged.where(F.col("side") == 1)
        .where(F.col("asof_ts").isNotNull())
        .select(F.col("lid").alias(left_id), "asof_ts")
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
) -> DataFrame:
    """applyInPandas strategy: cogroup by key, pd.merge_asof per group
    (the escape hatch for tolerance/nearest semantics)."""
    import pandas as pd

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0:
            return pd.DataFrame(columns=[left_id, "asof_ts"])
        l = l.sort_values(left_ts)
        if len(r) == 0:
            out = l[[left_id]].copy()
            out["asof_ts"] = pd.NaT
        else:
            # right ts pre-renamed to __rt: identically-named on-columns
            # would silently resolve to the LEFT timestamp after merge
            r = r.sort_values("__rt")
            m = pd.merge_asof(
                l, r, left_on=left_ts, right_on="__rt", direction="backward"
            )
            out = m[[left_id, "__rt"]].rename(columns={"__rt": "asof_ts"})
        return out.dropna(subset=["asof_ts"])

    lsel = left.select(
        F.col(left_key).alias("k"), F.col(left_id), F.col(left_ts)
    )
    rsel = right.select(F.col(right_key).alias("k"), F.col(right_ts).alias("__rt"))
    return (
        lsel.groupBy("k")
        .cogroup(rsel.groupBy("k"))
        .applyInPandas(
            lambda l, r: merge(l, r), f"{left_id} long, asof_ts timestamp"
        )
    )
