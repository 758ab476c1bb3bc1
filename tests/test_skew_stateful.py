"""Salted-join equivalence + custom stateful streaming operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from ccog_spark.catalog import load_table
from ccog_spark.operators.skew import salted_join
from ccog_spark.streaming.stateful import running_user_totals
from ccog_spark.streaming.windows import read_events_stream, run_stream_to_batch
from tests.conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    # manufacture skew: 80% of rows share one key
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        F.when(F.col("l_orderkey") % 5 != 0, F.lit(1))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        "l_extendedprice",
    )
    dim = (
        li.select("k").distinct().withColumn("payload", F.col("k") * 10)
    )
    plain = li.join(dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("p")
    )
    salted = salted_join(li, dim.withColumnRenamed("k", "k2"), "k", "k2").groupBy(
        "k"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("payload").alias("p"))
    assert {tuple(r) for r in plain.collect()} == {
        tuple(r) for r in salted.collect()
    }


def test_stateful_running_totals(spark):
    stream = read_events_stream(spark, SF_SMOKE, with_watermark=None)
    out = run_stream_to_batch(running_user_totals(stream), "update")
    rows = out.collect()
    # multiple micro-batches → multiple updates per user; the LAST
    # update per user must equal the batch totals
    last = {}
    for r in rows:  # memory sink appends in batch order
        last[r.user_id] = (r.n_events, r.total_value)
    batch = {
        r.user_id: (r.n, r.v)
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert set(last) == set(batch)
    for uid, (n, v) in batch.items():
        assert last[uid][0] == n
        assert abs(last[uid][1] - v) < 1e-6
    # state actually carried across micro-batches: some user got >1 update
    assert len(rows) > len(batch)
