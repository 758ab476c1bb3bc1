"""Unit tests for operators/sharding.py: the bucketed two-level prefix
sum must agree exactly with the naive single-partition window for any
bucket width, and shard packing / hash sampling must be deterministic.
"""

from __future__ import annotations

import random

import pandas as pd
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


def test_sample_token_budget_semantics(spark):
    """Budget = Σ n_tok·num DIV den per source; docs admitted in
    multiplicative-hash order; the boundary-crossing doc is INCLUDED
    (overshoot < 1 doc); a zero budget keeps nothing; kept token
    totals are per-source ≥ budget (floor-coverage) wherever the
    source has enough tokens."""
    from pyspark.sql import functions as F

    from ccog_spark.operators.sharding import sample_token_budget

    rows = []
    # source A: 100 docs of 10 tokens; source B (hot): 1000 docs of
    # 3 tokens — skew across sources, uniform hash order within
    for i in range(100):
        rows.append((i, "A", " ".join(["w"] * 10)))
    for i in range(1000):
        rows.append((1000 + i, "B", "x y z"))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    out = sample_token_budget(docs, 2, 5)
    got = out.groupBy("source").agg(
        F.sum("n_tok").alias("tok"), F.count("*").alias("n")
    ).collect()
    by = {r.source: (r.tok, r.n) for r in got}
    # A: budget = 1000*2 DIV 5 = 400 → 40 docs exactly reach 400, the
    # 41st starts AT the boundary (cum-before = 400, not < 400) → 40
    assert by["A"] == (400, 40)
    # B: budget = 3000*2 DIV 5 = 1200 → 400 docs
    assert by["B"] == (1200, 400)

    # boundary inclusion: make the budget land mid-document
    out2 = sample_token_budget(docs.where(F.col("source") == "A"), 1, 3)
    tok2 = out2.agg(F.sum("n_tok")).collect()[0][0]
    # budget = 1000 DIV 3 = 333; docs are 10 tokens → the 34th doc
    # CROSSES 333 and is included: 340 kept tokens
    assert tok2 == 340

    # zero budget keeps nothing; bad fraction raises
    assert sample_token_budget(docs, 0, 5).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fraction"):
        sample_token_budget(docs, 1, 0)


def test_sample_token_budget_matches_naive_window(spark):
    """The grouped BUCKETED prefix sum (scale path, no per-source
    window) equals the naive per-source ordered window on the fixture
    — forced through the multi-bucket path with a tiny bucket_width."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ccog_spark.operators.sharding import sample_token_budget
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = sorted(
        map(tuple, sample_token_budget(
            docs, 2, 5, bucket_width=1000).collect())
    )

    n_tok = F.size(
        F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    ).cast("bigint")
    h = (F.col("doc_id").cast("bigint") * 2654435761 + 7) % 1000000007
    d = docs.select(
        "doc_id", "source", n_tok.alias("n_tok"), h.alias("h")
    )
    bud = d.groupBy("source").agg(
        F.expr("CAST(sum(n_tok) * 2 DIV 5 AS BIGINT)").alias("budget")
    )
    cum = F.sum("n_tok").over(
        W.partitionBy("source").orderBy("h", "doc_id")
    )
    naive = (
        d.withColumn("cum", cum)
        .join(bud, "source")
        .where(F.col("cum") - F.col("n_tok") < F.col("budget"))
        .select("doc_id", "source", "n_tok")
    )
    want = sorted(map(tuple, naive.collect()))
    assert got == want and len(got) > 0


def test_exact_quantile_split_matches_ntile(spark):
    """exact_quantile_split == the NTILE(k) window formula
    (1 + floor(rank·k/n) under ORDER BY value, id) on a value
    distribution with duplicates — the distributed selection must
    reproduce the global window EXACTLY, including tie splits by id."""
    from pyspark.sql import Window as W

    from ccog_spark.operators.sharding import exact_quantile_split

    rows = [(i, int((i * 37) % 11)) for i in range(997)]  # heavy ties
    df = spark.createDataFrame(rows, "doc_id long, v long")
    for k in (2, 3, 5, 7):
        got = {
            r.doc_id: r.bucket
            for r in exact_quantile_split(
                df, "v", k, bucket_width=4
            ).collect()
        }
        n = len(rows)
        w = W.orderBy(F.col("v").asc(), F.col("doc_id").asc())
        want = {
            r.doc_id: r.b
            for r in df.select(
                "doc_id",
                (
                    1
                    + F.floor(
                        (F.row_number().over(w) - 1) * k / F.lit(n)
                    ).cast("int")
                ).alias("b"),
            ).collect()
        }
        assert got == want, f"k={k}"


def test_exact_quantile_split_constant_and_edges(spark):
    """All-equal values: ties split purely by id and still match the
    window formula; k > n leaves trailing buckets empty but assigns
    valid labels; k < 2 and oversize histograms fail loudly."""
    import pytest
    from pyspark.sql import Window as W

    from ccog_spark.operators import sharding
    from ccog_spark.operators.sharding import exact_quantile_split

    df = spark.createDataFrame(
        [(i, 5) for i in range(10)], "doc_id long, v long"
    )
    got = {
        r.doc_id: r.bucket
        for r in exact_quantile_split(df, "v", 3).collect()
    }
    w = W.orderBy(F.col("v").asc(), F.col("doc_id").asc())
    want = {
        r.doc_id: r.b
        for r in df.select(
            "doc_id",
            (
                1
                + F.floor(
                    (F.row_number().over(w) - 1) * 3 / F.lit(10)
                ).cast("int")
            ).alias("b"),
        ).collect()
    }
    assert got == want
    # k > n: every row still gets a valid 1..k label matching the rule
    got2 = {
        r.doc_id: r.bucket
        for r in exact_quantile_split(df.limit(2), "v", 5).collect()
    }
    assert set(got2.values()) <= set(range(1, 6)) and len(got2) == 2
    with pytest.raises(ValueError, match="k must be"):
        exact_quantile_split(df, "v", 1)
    # histogram cap: width 1 over spread values with a tiny cap
    spread = spark.createDataFrame(
        [(i, i) for i in range(50)], "doc_id long, v long"
    )
    old = sharding._MAX_DRIVER_BUCKETS
    sharding._MAX_DRIVER_BUCKETS = 10
    try:
        with pytest.raises(ValueError, match="raise bucket_width"):
            exact_quantile_split(spread, "v", 2, bucket_width=1)
    finally:
        sharding._MAX_DRIVER_BUCKETS = old
    # take cap: one hot bucket bigger than the cap
    sharding._QSPLIT_TAKE_CAP = 3
    try:
        with pytest.raises(ValueError, match="lower bucket_width"):
            exact_quantile_split(df, "v", 2)
    finally:
        sharding._QSPLIT_TAKE_CAP = 1_000_000


def test_exact_quantile_split_k10_skew_negative(spark):
    """k=10 over a skewed, NEGATIVE-heavy distribution (round 17,
    VERDICT r16 #5): 60% of rows pile on one hot value so several
    ceil(j*n/k) boundary ranks land INSIDE the tie run of a single
    histogram bucket, and values span negative/zero/positive buckets
    so the refinement's attribute-range rewrite of `v DIV w == b`
    (truncation toward zero: bucket 0 spans (-w, w), negative buckets
    hang low) is exercised for every sign of b."""
    from ccog_spark.operators.sharding import exact_quantile_split

    rows = [
        (i, -3 if i % 5 < 3 else int((i * 53) % 17) - 8)
        for i in range(731)
    ]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    got = {
        r.doc_id: r.bucket
        for r in exact_quantile_split(df, "v", 10, bucket_width=4).collect()
    }
    n = len(rows)
    w = W.orderBy(F.col("v").asc(), F.col("doc_id").asc())
    want = {
        r.doc_id: r.b
        for r in df.select(
            "doc_id",
            (
                1
                + F.floor(
                    (F.row_number().over(w) - 1) * 10 / F.lit(n)
                ).cast("int")
            ).alias("b"),
        ).collect()
    }
    assert got == want
    assert set(got.values()) == set(range(1, 11))


def test_exact_quantile_split_null_rejected(spark):
    """NULL value rows fail LOUDLY (ADVICE r16): a quantile cut is
    defined over a total order, and silently dropping/NULL-grouping
    rows would shift every rank."""
    from ccog_spark.operators.sharding import exact_quantile_split

    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 7)], "doc_id long, v long"
    )
    with pytest.raises(ValueError, match="NULL"):
        exact_quantile_split(df, "v", 2).collect()


def test_exact_quantile_split_single_execution(spark):
    """The fix for VERDICT r16 #1 pinned: the caller's upstream is
    evaluated ONCE across the boundary actions (count + histogram +
    per-boundary TakeOrdered) and the final assignment — an
    accumulator inside a pandas UDF upstream counts exactly n row
    evaluations, not ~4n (the pre-fix replay)."""
    from pyspark.sql.functions import pandas_udf

    from ccog_spark import cache_ledger
    from ccog_spark.operators.sharding import exact_quantile_split

    acc = spark.sparkContext.accumulator(0)

    @pandas_udf("long")
    def scored(v: pd.Series) -> pd.Series:
        acc.add(len(v))
        return v * 7 % 101

    n = 400
    base = spark.range(n).select(
        F.col("id").alias("doc_id"), scored(F.col("id")).alias("v")
    )
    out = exact_quantile_split(base, "v", 3, bucket_width=16)
    rows = out.collect()
    assert len(rows) == n
    assert acc.value == n, (
        f"upstream evaluated {acc.value} rows for n={n}: the scored "
        "frame replayed instead of reading the split's cache"
    )
    cache_ledger.release_owner(spark, "exact_quantile_split")


def test_sample_token_budget_single_execution(spark):
    """Same single-pass pin for sample_token_budget (VERDICT r16 #1,
    the 1x sibling): budgets aggregate + totals collect + final keep
    plan all read the persisted narrow frame, so the text-tokenizing
    upstream runs once."""
    from pyspark.sql.functions import pandas_udf

    from ccog_spark import cache_ledger
    from ccog_spark.operators.sharding import sample_token_budget

    acc = spark.sparkContext.accumulator(0)

    @pandas_udf("string")
    def texted(i: pd.Series) -> pd.Series:
        acc.add(len(i))
        return i.map(lambda x: " ".join(["tok"] * (1 + int(x) % 9)))

    n = 300
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("source"),
        texted(F.col("id")).alias("text"),
    )
    out = sample_token_budget(docs, 2, 5).collect()
    assert len(out) > 0
    assert acc.value == n, (
        f"upstream evaluated {acc.value} rows for n={n}: the narrow "
        "(id, group, n_tok) frame replayed instead of being cached"
    )
    cache_ledger.release_owner(spark, "sample_token_budget")
