"""Sources (CSV/JSON/partitioned-parquet/raster ingest), approximate
aggregates, and UDTF surface tests."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from ccog_spark.catalog import load_table
from ccog_spark.operators.approx import (
    approx_distinct,
    approx_quantiles,
    approx_topk_freq,
)
from ccog_spark.sources.raster_ingest import ingest_numpy, ingest_windowed
from ccog_spark.sources.tabular import (
    read_csv,
    read_json,
    write_parquet_partitioned,
)
from tests.conftest import SF_SMOKE

CUST_SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey int, "
    "c_acctbal double, c_mktsegment string"
)


def test_csv_roundtrip(spark, tmp_path):
    cust = load_table(spark, SF_SMOKE, "customer")
    path = str(tmp_path / "cust_csv")
    cust.write.option("header", "true").csv(path)
    back = read_csv(spark, path, CUST_SCHEMA)
    assert back.count() == cust.count()
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in cust.collect()}


def test_json_roundtrip(spark, tmp_path):
    cust = load_table(spark, SF_SMOKE, "customer")
    path = str(tmp_path / "cust_json")
    cust.write.json(path)
    back = read_json(spark, path, CUST_SCHEMA)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in cust.collect()}


def test_partitioned_parquet_prunes(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_part")
    write_parquet_partitioned(
        orders.withColumn("status", F.col("o_orderstatus")), path, ["status"]
    )
    back = spark.read.parquet(path).where(F.col("status") == "O")
    expected = orders.where(F.col("o_orderstatus") == "O").count()
    assert back.count() == expected
    # partition pruning: physical plan must carry a partition filter
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "status" in plan


def test_ingest_numpy_roundtrip(spark):
    rng = np.random.default_rng(42)
    arr = rng.random((2, 40, 56))
    mask = rng.random((40, 56)) > 0.1
    tiles = ingest_numpy(spark, arr, mask, blocksize=16)
    rows = tiles.collect()
    # 2 bands × ceil(40/16)=3 × ceil(56/16)=4 tiles
    assert len(rows) == 2 * 3 * 4
    ragged = [r for r in rows if r.tile_y == 2 and r.tile_x == 3]
    assert all(r.height == 8 and r.width == 8 for r in ragged)
    got = np.frombuffer(
        next(r for r in rows if (r.band, r.tile_y, r.tile_x) == (0, 0, 0)).data,
        dtype="<f8",
    ).reshape(16, 16)
    expect = np.where(mask[:16, :16], arr[0, :16, :16], -9999.0)
    assert np.array_equal(got, expect)


def test_ingest_windowed_matches_numpy(spark):
    rng = np.random.default_rng(7)
    arr = rng.random((1, 32, 48))

    def reader(band, y0, x0, h, w, _arr=arr):
        block = _arr[band, y0 : y0 + h, x0 : x0 + w]
        return block, np.ones_like(block, dtype=bool)

    via_window = ingest_windowed(spark, 48, 32, 1, 16, reader)
    via_numpy = ingest_numpy(spark, arr, blocksize=16)
    a = {(r.band, r.tile_y, r.tile_x): r.data for r in via_window.collect()}
    b = {(r.band, r.tile_y, r.tile_x): r.data for r in via_numpy.collect()}
    assert a == b


def test_approx_distinct_bounded_error(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    exact = li.select("l_partkey").distinct().count()
    approx = approx_distinct(li, "l_partkey").collect()[0][0]
    assert abs(approx - exact) / exact < 0.1


def test_approx_quantiles_bounded_error(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    qs = approx_quantiles(orders, "o_totalprice", [0.5, 0.9]).collect()[0][0]
    vals = sorted(r.o_totalprice for r in orders.collect())
    exact_p50 = vals[len(vals) // 2]
    exact_p90 = vals[int(len(vals) * 0.9)]
    assert abs(qs[0] - exact_p50) / exact_p50 < 0.05
    assert abs(qs[1] - exact_p90) / exact_p90 < 0.05


def test_approx_topk(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    top = approx_topk_freq(docs, "lang", 3).collect()
    assert len(top) == 3
    assert top[0]["count"] >= top[1]["count"] >= top[2]["count"]


def test_udtf_shingles(spark):
    from ccog_spark.functions.udtf_ops import register_udtfs

    register_udtfs(spark)
    load_table(spark, SF_SMOKE, "documents").createOrReplaceTempView("docs_v")
    out = spark.sql(
        "SELECT d.doc_id, s.pos, s.shingle "
        "FROM docs_v d, LATERAL explode_shingles(text) s WHERE d.doc_id = 0"
    ).collect()
    first = load_table(spark, SF_SMOKE, "documents").where("doc_id = 0").collect()[0]
    toks = first.text.split(" ")
    assert len(out) == len(toks) - 2
    assert out[0].shingle == " ".join(toks[0:3])


def test_bucketed_join_avoids_shuffle(spark):
    """Both sides bucketed on the join key → SortMergeJoin with no
    Exchange above either scan (the co-location contract)."""
    from ccog_spark.sources.tabular import write_bucketed_table

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed_table(li, "b_lineitem", "l_orderkey", 4)
    write_bucketed_table(orders, "b_orders", "o_orderkey", 4)
    # disable broadcast so the join strategy is the bucketed SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert j.count() == li.count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_simhash_column_matches_dataframe_api(spark):
    """The column-level simhash() and with_simhash() must produce the
    identical 60-bit two-family signature (they are documented as the
    same construction)."""
    from pyspark.sql import functions as F

    from ccog_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    a = dedup.with_simhash(docs.select("doc_id", "text")).select("doc_id", "sh")
    b = docs.select("doc_id", dedup.simhash(F.col("text")).alias("sh"))
    diff = a.join(b, "doc_id").where(a.sh != b.sh).count()
    assert diff == 0


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    from ccog_spark.catalog import load_table
    from ccog_spark.sources.tabular import read_orc, write_orc
    from tests.conftest import SF_SMOKE

    src = load_table(spark, SF_SMOKE, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in src.collect()
    )
    # filter must reach the ORC scan (PushedFilters in the plan)
    plan = (
        back.filter("n_regionkey = 2")
        .select("n_name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(n_regionkey), EqualTo(n_regionkey,2)]" in plan


def test_orc_partitioned_prunes(spark, tmp_path):
    from ccog_spark.catalog import load_table
    from ccog_spark.sources.tabular import read_orc, write_orc
    from tests.conftest import SF_SMOKE

    src = load_table(spark, SF_SMOKE, "nation")
    path = str(tmp_path / "nation_orc_part")
    write_orc(src, path, partition_cols=["n_regionkey"])
    back = read_orc(spark, path).filter("n_regionkey = 1")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert back.count() == src.filter("n_regionkey = 1").count()


def test_upsert_partitioned_parquet(spark, tmp_path):
    import glob
    import os

    from ccog_spark.sources.tabular import (
        upsert_partitioned_parquet,
        write_parquet_partitioned,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"v{i}", i % 4) for i in range(40)], ["id", "val", "p"]
    )
    write_parquet_partitioned(base, path, ["p"])

    def files(p):
        return {
            f: os.path.getmtime(f)
            for f in glob.glob(f"{path}/p={p}/*.parquet")
        }

    untouched_before = {p: files(p) for p in (1, 2, 3)}

    # update two existing keys in partition 0, insert one new key
    updates = spark.createDataFrame(
        [(0, "NEW0", 0), (4, "NEW4", 0), (99, "NEW99", 0)],
        ["id", "val", "p"],
    )
    upsert_partitioned_parquet(spark, path, updates, ["id"], "p")

    got = {
        (r.id): (r.val, r.p) for r in spark.read.parquet(path).collect()
    }
    assert len(got) == 41  # 40 original + 1 inserted
    assert got[0] == ("NEW0", 0)
    assert got[4] == ("NEW4", 0)
    assert got[99] == ("NEW99", 0)
    assert got[8] == ("v8", 0)   # untouched key in the SAME partition
    assert got[1] == ("v1", 1)   # untouched partition intact
    # untouched partitions: exact same files, byte-identical mtimes
    for p in (1, 2, 3):
        assert files(p) == untouched_before[p], p


def test_upsert_key_only_updates_and_multi_partition(spark, tmp_path):
    from ccog_spark.sources.tabular import (
        upsert_partitioned_parquet,
        write_parquet_partitioned,
    )

    path = str(tmp_path / "tbl2")
    base = spark.createDataFrame(
        [(i, i * 10, i % 3) for i in range(12)], ["id", "x", "p"]
    )
    write_parquet_partitioned(base, path, ["p"])
    updates = spark.createDataFrame(
        [(0, -1, 0), (1, -2, 1)], ["id", "x", "p"]
    )
    upsert_partitioned_parquet(spark, path, updates, ["id"], "p")
    got = {r.id: r.x for r in spark.read.parquet(path).collect()}
    assert got[0] == -1 and got[1] == -2
    assert got[2] == 20 and len(got) == 12


def test_upsert_moved_key_detection(spark, tmp_path):
    import pytest as _pytest

    from ccog_spark.sources.tabular import (
        upsert_partitioned_parquet,
        write_parquet_partitioned,
    )

    path = str(tmp_path / "tbl3")
    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1)], ["id", "val", "p"]
    )
    write_parquet_partitioned(base, path, ["p"])
    # update moves id=1 from p=0 to p=2
    moved = spark.createDataFrame([(1, "a2", 2)], ["id", "val", "p"])
    with _pytest.raises(ValueError, match="stale"):
        upsert_partitioned_parquet(
            spark, path, moved, ["id"], "p", check_moved_keys=True
        )
    # partition-stable update passes the check
    stable = spark.createDataFrame([(1, "a2", 0)], ["id", "val", "p"])
    upsert_partitioned_parquet(
        spark, path, stable, ["id"], "p", check_moved_keys=True
    )
    got = {r.id: r.val for r in spark.read.parquet(path).collect()}
    assert got == {1: "a2", 2: "b"}


def test_upsert_null_partition_rejected(spark, tmp_path):
    """NULL partition values in updates defeat isin()/anti-join (NULL
    comparisons filter out) — existing default-partition rows would
    survive as stale duplicates. The upsert must refuse loudly."""
    import pytest as _pytest

    from ccog_spark.sources.tabular import (
        upsert_partitioned_parquet,
        write_parquet_partitioned,
    )

    path = str(tmp_path / "tbl4")
    base = spark.createDataFrame([(1, "a", 0), (2, "b", 1)], ["id", "val", "p"])
    write_parquet_partitioned(base, path, ["p"])
    nullpart = spark.createDataFrame(
        [(1, "a2", None)], "id int, val string, p int"
    )
    with _pytest.raises(ValueError, match="NULL"):
        upsert_partitioned_parquet(spark, path, nullpart, ["id"], "p")
    # table untouched after the refused merge
    got = {r.id: r.val for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "b"}


# (bucketed co-located joins are covered by
# test_bucketed_join_avoids_shuffle above — write_bucketed_table)
