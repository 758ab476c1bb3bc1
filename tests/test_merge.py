"""MERGE-emulation and SCD2 invariants."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ccog_spark.operators.merge import merge_upsert, scd2_apply


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    updates = spark.createDataFrame(
        [(2, "B"), (4, "D")], "k int, v string"
    )
    out = {(r.k, r.v) for r in merge_upsert(target, updates, "k").collect()}
    assert out == {(1, "a"), (2, "B"), (3, "c"), (4, "D")}


def test_scd2_apply_invariants(spark):
    t0 = datetime(2024, 1, 1)
    t1 = datetime(2024, 2, 1)
    t2 = datetime(2024, 3, 1)
    dim = spark.createDataFrame(
        [
            (1, "x", t0, t1),   # closed historical row
            (1, "y", t1, None), # current
            (2, "z", t0, None), # current, unchanged this batch
        ],
        "k int, attr string, valid_from timestamp, valid_to timestamp",
    )
    changes = spark.createDataFrame(
        [(1, "y2", t2), (3, "new", t2)], "k int, attr string, ts timestamp"
    )
    out = scd2_apply(dim, changes, "k").collect()

    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    # exactly one current row per key
    for k, rows in by_key.items():
        assert sum(1 for r in rows if r.valid_to is None) == 1, k
    # key 1: history preserved, old current closed at t2, new current y2
    k1 = sorted(by_key[1], key=lambda r: r.valid_from)
    assert [(r.attr, r.valid_to) for r in k1] == [
        ("x", t1), ("y", t2), ("y2", None)
    ]
    # unchanged key 2 stays current; key 3 inserted as current
    assert by_key[2][0].valid_to is None
    assert by_key[3][0].attr == "new" and by_key[3][0].valid_from == t2
    # intervals never overlap per key
    for k, rows in by_key.items():
        rows = sorted(rows, key=lambda r: r.valid_from)
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to is not None and a.valid_to <= b.valid_from
