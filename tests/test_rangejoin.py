"""Pure range join: bin rewrite correctness + plan shape (no
BroadcastNestedLoopJoin)."""

import io
from contextlib import redirect_stdout
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from ccog_spark.operators.rangejoin import time_range_join


def _frame(spark, times, prefix):
    base = datetime(2024, 1, 1)
    rows = [(i, base + timedelta(seconds=s)) for i, s in enumerate(times)]
    return spark.createDataFrame(
        rows, f"{prefix}_id long, {prefix}_ts timestamp"
    )


@pytest.mark.slow
def test_range_join_matches_naive(spark):
    import random

    rng = random.Random(3)
    lt = [rng.uniform(0, 500) for _ in range(300)]
    rt = [rng.uniform(0, 500) for _ in range(300)]
    left, right = _frame(spark, lt, "a"), _frame(spark, rt, "b")
    got = {
        (r.a_id, r.b_id, r.dt_us)
        for r in time_range_join(left, right, "a_ts", "b_ts", 7).collect()
    }
    naive = {
        (r.a_id, r.b_id, r.dt_us)
        for r in left.join(
            right,
            (F.unix_micros("b_ts") >= F.unix_micros("a_ts"))
            & (F.unix_micros("b_ts") <= F.unix_micros("a_ts") + 7_000_000),
        )
        .select(
            "a_id",
            "b_id",
            (F.unix_micros("b_ts") - F.unix_micros("a_ts")).alias("dt_us"),
        )
        .collect()
    }
    assert got == naive and len(got) > 100


def test_range_join_boundary_inclusive(spark):
    left = _frame(spark, [0.0], "a")
    right = _frame(spark, [0.0, 7.0, 7.000001, 3.5], "b")
    got = sorted(
        r.b_id for r in time_range_join(left, right, "a_ts", "b_ts", 7).collect()
    )
    assert got == [0, 1, 3]  # both endpoints inclusive, beyond-gap excluded


def test_range_join_plan_has_no_nested_loop(spark):
    left = _frame(spark, [1.0, 2.0], "a")
    right = _frame(spark, [1.5], "b")
    plan = time_range_join(left, right, "a_ts", "b_ts", 7)
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan.explain("formatted")
    out = buf.getvalue()
    assert "NestedLoop" not in out and "CartesianProduct" not in out
    # the naive spelling degenerates (nested-loop or cartesian),
    # proving the rewrite matters
    naive = left.join(right, F.col("b_ts") >= F.col("a_ts"))
    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        naive.explain("formatted")
    out2 = buf2.getvalue()
    assert "NestedLoop" in out2 or "CartesianProduct" in out2


def test_range_join_zero_gap_raises(spark):
    import pytest

    left = _frame(spark, [0.0], "a")
    right = _frame(spark, [0.0], "b")
    for bad in (0, 1e-9, -5):
        with pytest.raises(ValueError, match="gap_seconds"):
            time_range_join(left, right, "a_ts", "b_ts", bad)
