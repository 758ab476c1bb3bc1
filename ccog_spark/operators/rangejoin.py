"""Pure range join (no equality key) via time-bin bucketing (E9's
no-equi-key case; SURVEY §7 Phase-6 optional item).

For ``right.ts ∈ [left.ts, left.ts + gap]`` with NO equi key, Catalyst
has no hash/merge strategy and falls back to BroadcastNestedLoopJoin —
an O(|L|·|R|) comparison that broadcasts one ENTIRE side: the classic
scale-killer on two large inputs. The standard rewrite (used by every
streaming/temporal engine; same family as the reference's time-binned
part ordering, ccog/ccog.py:661-666) buckets both sides into
gap-width bins: a qualifying pair always lands in the same or the
next-higher bin of the left row, so exploding the left side to
(bin, bin+1) turns the theta join into an EQUI join on bin plus a
residual filter. Each side shuffles once on the bin key; per-task work
is bounded by time density (rows per gap window), not corpus size.

All comparisons run on integer epoch-µs (unix_micros), so the
residual predicate and the emitted ``dt_us`` are exact and match the
DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    ts_left: str,
    ts_right: str,
    gap_seconds: float = 10.0,
) -> DataFrame:
    """Rows (l, r) with ``r.ts_right ∈ [l.ts_left, l.ts_left + gap]``.

    Output = left columns + right columns + ``dt_us`` (exact µs
    delta). Column names must not collide (alias before calling).
    A pair joins exactly once: the right row's bin is unique and
    equals one of the left row's two candidate bins.
    """
    gap_us = int(gap_seconds * 1_000_000)
    if gap_us <= 0:
        # gap 0 (or < 1 µs, truncated) would make every bin expression
        # x/0 → NULL and the join would silently return an empty frame
        raise ValueError(
            f"gap_seconds={gap_seconds!r} must be at least 1e-6 (1 µs)"
        )
    l_us = F.unix_micros(F.col(ts_left))
    r_us = F.unix_micros(F.col(ts_right))
    l_bin = F.floor(l_us / gap_us).cast("long")
    lhs = left.withColumn("_lus", l_us).withColumn(
        "_bin", F.explode(F.array(l_bin, l_bin + 1))
    )
    rhs = right.withColumn("_rus", r_us).withColumn(
        "_bin", F.floor(r_us / gap_us).cast("long")
    )
    return (
        lhs.join(rhs, "_bin")
        .where(
            (F.col("_rus") >= F.col("_lus"))
            & (F.col("_rus") <= F.col("_lus") + F.lit(gap_us))
        )
        .withColumn("dt_us", F.col("_rus") - F.col("_lus"))
        .drop("_bin", "_lus", "_rus")
    )
