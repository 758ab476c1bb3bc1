"""Arrays / JSON / sessionization / LLM-pipeline corpus queries:
Q17, Q18, Q20, Q21, Q21b, Q22 (SURVEY.md §2.3).

The heavier reusable operators behind these (MinHash dedup, ANN search,
language-ID, quality scoring) live in ``ccog_spark.operators``; these
corpus queries are the deterministic, oracle-checkable slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ccog_spark.catalog import load_table
from ccog_spark.functions.vectors import dot, sqnorm, norm


def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions (E29): size + fold (sum of squares) per vector.

    ``aggregate`` is a JVM higher-order function — the fold runs in
    codegen, per row, no shuffle, no Python.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(sqnorm(F.col("embedding")), 4).alias("sqnorm"),
    ).orderBy("vec_id")


def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (E30) from a string column — JVM-side JsonPath."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id", F.get_json_object("props", "$.page").alias("page")
    ).orderBy("event_id")


def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via gap + cumulative sum (E16, E31 batch analogue).

    Two window passes over the same (user_id, ts, event_id) ordering —
    Spark reuses one shuffle+sort for both (same partitioning/ordering).
    This is the batch-checkable twin of streaming session_window
    (ccog_spark.streaming.sessions).
    """
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lag("ts").over(w)
    new_s = (
        F.when(gap.isNull(), 1)
        .when(F.col("ts") > gap + F.expr("INTERVAL 30 MINUTE"), 1)
        .otherwise(0)
    )
    with_session = events.select(
        "user_id",
        "ts",
        F.sum(new_s)
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("bigint")
        .alias("session_id"),
    )
    return (
        with_session.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
        )
        .orderBy("user_id", "session_id")
    )


def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash (E34) — duplicate groups report.

    md5 is computed map-side; groups shuffle by hash so duplicate
    clusters co-locate. The actionable dedup operator (keep-first) is
    ccog_spark.operators.dedup.exact_dedup.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("copies"),
            F.min("doc_id").alias("keeper"),
        )
        .where(F.col("copies") > 1)
        .orderBy("h")
    )


def q21b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-analysis rollup (E37) over documents."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "source")
    )


def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k self-similarity (E36), label-bounded (Q22).

    Pairs are bounded by (same label, a.vec_id < b.vec_id) so the join
    is an equi-join on label, not a cross product; top-3 neighbours per
    vec_id via row_number. Deterministic tiebreak on nbr_id. All vector
    math is codegen'd double-precision (functions.vectors). The
    unbounded/scalable ANN variant is operators.similarity.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    # Norms are precomputed per row BEFORE the pair join — O(n) instead
    # of O(pairs) sqrt/fold work; bit-identical result (same expression).
    nv = emb.select("vec_id", "label", "embedding", norm(F.col("embedding")).alias("nrm"))
    a = nv.select(
        F.col("vec_id"),
        F.col("label"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = nv.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    pairs = a.join(
        b, (a.label == b.label_b) & (a.vec_id < b.nbr_id), "inner"
    ).select(
        "vec_id",
        "nbr_id",
        (dot(F.col("emb_a"), F.col("emb_b")) / (F.col("nrm_a") * F.col("nrm_b"))).alias(
            "cos_raw"
        ),
    )
    w = W.partitionBy("vec_id").orderBy(F.col("cos_raw").desc(), F.col("nbr_id"))
    return (
        pairs.select(
            "vec_id",
            "nbr_id",
            F.round(F.col("cos_raw"), 4).alias("cos"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("vec_id", "rn")
    )
