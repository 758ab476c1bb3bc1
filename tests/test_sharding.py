"""Unit tests for operators/sharding.py: the bucketed two-level prefix
sum must agree exactly with the naive single-partition window for any
bucket width, and shard packing / hash sampling must be deterministic.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ccog_spark.operators.sharding import hash_sample, pack_shards, prefix_sum


def _frame(spark, seed: int, n: int = 500):
    rng = random.Random(seed)
    # non-contiguous keys: bucketing must not assume dense ids
    keys = rng.sample(range(0, 10 * n), n)
    return spark.createDataFrame(
        [(k, rng.randint(0, 300)) for k in keys], ["k", "v"]
    )


@pytest.mark.parametrize("seed,width", [(0, 1000), (1, 7), (2, 10 ** 9)])
def test_prefix_sum_matches_naive_window(spark, seed, width):
    df = _frame(spark, seed)
    got = {
        (r.k, r.cum)
        for r in prefix_sum(df, "k", "v", bucket_width=width).collect()
    }
    want = {
        (r.k, r.cum)
        for r in df.select(
            "k", F.sum("v").over(W.orderBy("k")).alias("cum")
        ).collect()
    }
    assert got == want


def test_pack_shards_contiguous_and_budgeted(spark):
    df = _frame(spark, 3)
    rows = (
        pack_shards(df, "v", order_col="k", budget=1000)
        .orderBy("k")
        .collect()
    )
    # shard ids are non-decreasing in corpus order and start at 0
    ids = [r.shard_id for r in rows]
    assert ids[0] == 0 and all(a <= b for a, b in zip(ids, ids[1:]))
    # every shard's pre-doc running total stays under (shard+1)*budget
    cum = 0
    for r in rows:
        assert r.shard_id == cum // 1000
        cum += r.v


def test_hash_sample_deterministic_and_disjoint(spark):
    df = _frame(spark, 4)
    a = {r.k for r in hash_sample(df, "k", 10, salt=7).collect()}
    b = {r.k for r in hash_sample(df, "k", 10, salt=7).collect()}
    assert a == b and 0 < len(a) < df.count()
    # raising the rate only adds rows (nested samples)
    c = {r.k for r in hash_sample(df, "k", 30, salt=7).collect()}
    assert a <= c


def test_prefix_sum_null_order_key_raises(spark):
    df = spark.createDataFrame(
        [(1, 10), (None, 20), (3, 30)], "k long, v long"
    )
    with pytest.raises(ValueError, match="contains nulls"):
        prefix_sum(df, "k", "v").collect()


def test_prefix_sum_null_values_match_naive(spark):
    # null VALUES are legal (window sum skips them); only the order
    # key must be non-null
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30), (4, None), (5, 5)],
        "k long, v long",
    )
    got = {
        (r.k, r.cum)
        for r in prefix_sum(df, "k", "v", bucket_width=2).collect()
    }
    want = {
        (r.k, r.cum)
        for r in df.select(
            "k", F.sum("v").over(W.orderBy("k")).alias("cum")
        ).collect()
    }
    assert got == want


def test_prefix_sum_second_tree_level(spark, monkeypatch):
    """A pathologically small bucket width must NOT collect one row per
    bucket on the driver: past _MAX_DRIVER_BUCKETS the cumulation
    recurses into another bucketed prefix sum, and the result is still
    exact."""
    from ccog_spark.operators import sharding

    monkeypatch.setattr(sharding, "_MAX_DRIVER_BUCKETS", 10)
    df = _frame(spark, 11, n=300)
    got = {
        (r.k, r.cum)
        for r in prefix_sum(df, "k", "v", bucket_width=3).collect()
    }
    want = {
        (r.k, r.cum)
        for r in df.select(
            "k", F.sum("v").over(W.orderBy("k")).alias("cum")
        ).collect()
    }
    assert got == want


def test_quota_per_key(spark):
    from ccog_spark.operators.sharding import quota_per_key

    df = spark.createDataFrame(
        [(i, f"dom{i % 3}") for i in range(30)], ["doc_id", "domain"]
    )
    out = quota_per_key(df, "domain", cap=4).collect()
    assert len(out) == 12
    by_dom = {}
    for r in out:
        by_dom.setdefault(r.domain, []).append(r.doc_id)
    # deterministic keep-first by doc_id within each domain
    assert sorted(by_dom["dom0"]) == [0, 3, 6, 9]
    assert sorted(by_dom["dom1"]) == [1, 4, 7, 10]
    # plan uses the rank-limited window (partial WindowGroupLimit)
    plan = (
        quota_per_key(df, "domain", cap=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
