"""Relational query corpus Q01–Q16, Q19, Q23, Q24 (SURVEY.md §2.3).

All queries are expressed with the declarative DataFrame API so Catalyst
supplies predicate pushdown, column pruning, join strategy selection,
partial+final aggregation and whole-stage codegen for free (SURVEY.md
§4.2). Scale notes per query describe the physical plan we expect at
100 TB: which side broadcasts, where the shuffles are, what AQE fixes.

Column aliases match the oracle SQL exactly — the correctness harness
sorts columns by name before hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ccog_spark.catalog import load_table


def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + filter + project (E1, E6).

    Both predicates push into the parquet scan (PushedFilters); only 6 of
    11 lineitem columns are read (ReadSchema pruning). No shuffle except
    the final sort.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_discount") > 0.05)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    )


def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style hash aggregate (E11).

    Partial (map-side) + final aggregation: only |groups| ≈ 6 rows cross
    the shuffle regardless of input size — the canonical scale-safe agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + agg (E7).

    customer is the small build side → broadcast hash join (no shuffle of
    the fact table). At 100 TB the orders fact streams through map tasks;
    only the 5-row group-by output shuffles.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner"
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("c_mktsegment")
    )


def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join with broadcast dims (E7).

    region/nation/customer chain is tiny → one broadcast per dim; the
    only big-table shuffle is lineitem⋈orders (both huge at scale: a
    sort-merge join on orderkey, skew handled by AQE).
    """
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    ).select("c_custkey", "n_name", "r_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("r_name", "n_name")
    )


def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + null handling (E7, E28).

    Scale rewrite: orders are PRE-AGGREGATED by custkey before the
    join (Catalyst does not push aggregates through joins itself), so
    the join input is one row per customer instead of one per order —
    at 100 TB that turns a fact-sized shuffle + join into a
    key-cardinality one. COUNT(o_orderkey)=0 and spend=0 for customers
    with no orders come from the COALESCE on the left join.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("_n"), F.sum("o_totalprice").alias("_sum")
    )
    return (
        customer.join(per_cust, per_cust.o_custkey == customer.c_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("_n"), F.lit(0)).alias("n"),
            F.round(F.coalesce(F.col("_sum"), F.lit(0.0)), 2).alias("spend"),
        )
        .orderBy("c_custkey")
    )


def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join (E8): EXISTS / NOT EXISTS as left_semi/left_anti.

    Both are broadcast-able (orders' custkey projection is small after
    dedup); neither materializes the join payload.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    with_orders = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("with_orders"))
    )
    without_orders = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("without_orders"))
    )
    return with_orders.crossJoin(without_orders)


def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (E13). Spark expands the rollup into grouping
    sets inside a single (partial+final) aggregate — no extra passes."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (E12). Spark plans multi-distinct with an
    expand + two-phase aggregate; each distinct stays partial-aggregated
    map-side so the shuffle carries distinct values, not rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_suppkey").alias("suppliers"),
        F.countDistinct("l_partkey").alias("parts"),
        F.round(F.sum_distinct(F.col("l_quantity")), 2).alias("distinct_qty_sum"),
    )


def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window with deterministic tiebreak (E15).

    One shuffle on o_custkey, in-partition sort; rn<=3 filter applies
    before the global order-by, so only ≤3 rows/customer survive.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window + running frame (E16, E17).

    The running sum frame is exactly the reference's tile-offset prefix
    sum pattern (ccog/ccog.py:717-773 re-expressed; see Q-R3).

    The fixture's (l_orderkey, l_linenumber) is not unique, so the
    window additionally orders by l_extendedprice — this totally orders
    the summed values, making the running sums engine-independent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber", "l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.sum("l_extendedprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2
        ).alias("running"),
        F.lag("l_linenumber").over(w).alias("prev_line"),
    ).orderBy("l_orderkey", "l_linenumber")


def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (E18): orderBy+limit plans as TakeOrderedAndProject —
    each partition keeps its local top-100, driver merges; no full sort."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops (E19): INTERSECT / EXCEPT / UNION ALL."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c_keys = customer.select(F.col("c_nationkey").alias("x"))
    s_keys = supplier.select(F.col("s_nationkey").alias("x"))
    both = c_keys.intersect(s_keys).select("x", F.lit("both").alias("grp"))
    # SQL precedence: ((A INTERSECT B) UNION ALL C) EXCEPT D, with
    # EXCEPT being distinct-based (DataFrame.subtract).
    unioned = both.unionAll(c_keys.select("x", F.lit("cust_only").alias("grp")))
    minus = unioned.subtract(s_keys.select("x", F.lit("cust_only").alias("grp")))
    return minus.orderBy("grp", "x")


def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions (E25) — all JVM-side codegen'd built-ins."""
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.where(F.col("c_name").like("%1%"))
        .select(
            "c_custkey",
            F.upper("c_name").alias("u"),
            F.lower("c_mktsegment").alias("l"),
            F.substring("c_name", 1, 8).alias("pre"),
            F.length("c_name").alias("len"),
            F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("repl"),
            F.concat(F.col("c_name"), F.lit("/"), F.col("c_mktsegment")).alias(
                "joined"
            ),
        )
        .orderBy("c_custkey")
    )


def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date functions + agg (E26)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.year("l_shipdate").alias("y"), F.month("l_shipdate").alias("m")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
        .orderBy("y", "m")
    )


def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions (E27)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.round(F.sqrt("p_retailprice"), 4).alias("rt"),
        F.floor("p_retailprice").alias("fl"),
        F.ceil("p_retailprice").alias("ce"),
        F.abs(F.col("p_size") - 25).alias("dist"),
        (F.col("p_partkey") % 7).alias("bucket"),
        F.round(F.pow("p_size", F.lit(2)), 1).alias("sq"),
    ).orderBy("p_partkey")


def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional logic (E28): CASE WHEN / NULLIF."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
    ).orderBy("o_orderkey")


def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate, batch-checkable analogue of the
    streaming E31 operator (see ccog_spark.streaming for readStream)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("bucket", "event_type")
    )


def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of style range join (E9, E10): last event per customer at or
    before the order date.

    Physical plan: equi-join on user_id=custkey (shuffle/broadcast by
    key) with the range predicate as a join residual, then max() per
    order. At 100 TB the equi-key keeps this a hash join, not a BNL —
    the range condition never becomes a cross product. For extreme
    events-per-user skew, the operators.asof module provides a
    merge_asof variant that avoids materializing all (order, event)
    pairs.
    """
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    return (
        orders.join(
            events,
            (events.user_id == orders.o_custkey) & (events.ts <= orders.o_orderdate),
            "inner",
        )
        .groupBy("o_orderkey")
        .agg(F.max("ts").alias("last_event_ts"))
        .orderBy("o_orderkey")
    )


def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via dense_rank (E15, E18)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_partkey").orderBy(F.col("l_quantity").desc())
    return (
        li.select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.dense_rank().over(w).alias("dr"),
        )
        .where(F.col("dr") == 1)
        .orderBy("l_partkey", "l_orderkey", "l_linenumber")
    )


def q07b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (E13): all 4 grouping combinations in one
    partial+final aggregate pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


def pivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (E13 adjunct): order counts by priority × status. The
    pivoted column list is pinned so the plan is a single aggregate
    (no extra distinct-values job)."""
    orders = load_table(spark, sf_dir, "orders")
    p = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return p.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("n_f"),
        F.coalesce("O", F.lit(0)).alias("n_o"),
        F.coalesce("P", F.lit(0)).alias("n_p"),
    ).orderBy("o_orderpriority")


def unpivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt via stack (E13 adjunct): part metrics to long form."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.selectExpr(
            "p_partkey",
            "stack(2, 'size', CAST(p_size AS DOUBLE), "
            "'retail', p_retailprice) AS (metric, val)",
        )
        .orderBy("p_partkey", "metric")
    )
