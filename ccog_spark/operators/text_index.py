"""Persisted BM25 inverted index: build once, query many.

``bm25_topk`` (operators/text.py) re-derives TF/DF/doclen from the raw
corpus on EVERY call — right for one-shot corpus rows, wrong for
production retrieval where the corpus is static and query batches
arrive forever. This module splits the pipeline at the natural parquet
seam, the same lifecycle (and module shape) as the persisted ANN index
(operators/ann_index.py — the reference-style build/query split the
E36 surface already ships):

- ``build_bm25_index``: ONE tokenize pass writes four tables under
  ``index_dir``:
    postings/  (t, doc_id, tf) — corpus-sized, the only big table;
               PARTITIONED BY bkt = pmod(xxhash64(t), n_buckets), so
               a query batch reads ≤ |distinct query terms| bucket
               directories (exact partition pruning on bkt — the
               text-side analogue of the ANN codes grp layout)
    terms/     (t, df) vocabulary table, same bkt partitioning —
               Heaps-law-sized; serves idf AND the max-score planner
               (df lookups become bucket-pruned index reads: the
               pruning decision costs NO corpus pass here)
    doclens/   (doc_id, dl)
    meta/      (n_docs, sum_dl, n_buckets, n_terms) — 1 row
- ``query_bm25_index``: reads meta (driver-side), prunes postings and
  terms to the query terms' buckets, and delegates to the SHARED
  scoring/pruning core (text._bm25_rank) — results are BIT-IDENTICAL
  to ``bm25_topk`` on the same corpus (pinned in tests and by the
  registry row's oracle, which is the from-scratch BM25 SQL verbatim:
  one SQL truth, two execution paths).

Scale shape at 100 TB: the corpus is tokenized once at build;
per-batch query cost is (query-term buckets of postings) + a doc-id
join against doclens, both independent of the corpus's non-matching
terms. With pruning engaged the doclens/postings joins are further
restricted to the candidate doc-id union BELOW the query-term join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _bkt(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("t")), F.lit(n_buckets)).cast("int")


# Above this many distinct query terms the In(t) data filter is skipped:
# a thousands-strong isin costs more in expression evaluation than the
# row-group pruning saves (ANN's probe-isin skip precedent).
_TERM_ISIN_CAP = 256


def adaptive_n_buckets(n_docs: int) -> int:
    """Bucket count scaled to the corpus (the ann_index
    adaptive_n_groups precedent): one bucket per ~50k docs, power of
    two, floored at 64 (small corpora keep the fixture layout) and
    capped at 4096 (beyond that, per-query pruning gains flatten while
    tiny partitions multiply file counts)."""
    import math

    if n_docs <= 0:
        return 64
    raw = 1 << max(0, math.ceil(math.log2(max(1, n_docs / 50_000))))
    return min(4096, max(64, raw))


def build_bm25_index(
    docs: DataFrame,
    index_dir: str,
    n_buckets: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """One tokenize pass → persisted index. Returns the meta dict.

    ``n_buckets`` defaults to adaptive_n_buckets(corpus count) — one
    extra column-pruned count job at build time; pass an int to pin
    the directory count (tests, controlled probes). The TF aggregate
    is persisted for the duration of the build (all three written
    tables derive from it) and released before return.
    """
    spark = docs.sparkSession
    if n_buckets is None:
        n_buckets = adaptive_n_buckets(docs.count())
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("t")
    ).where(F.col("t") != "")
    tf = toks.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.persist()
    try:
        # postings are clustered by bkt and SORTED by (t, id) within
        # each directory, so parquet row-group min/max stats on t are
        # tight — the query side's In(t) data filter then prunes row
        # groups INSIDE the matched buckets (the ANN codes
        # cell-clustering precedent). One extra build shuffle.
        tf.withColumn("bkt", _bkt(n_buckets)).repartition(
            "bkt"
        ).sortWithinPartitions("t", id_col).write.mode(
            "overwrite"
        ).partitionBy("bkt").parquet(os.path.join(index_dir, "postings"))
        tf.groupBy("t").agg(F.count(F.lit(1)).alias("df")).withColumn(
            "bkt", _bkt(n_buckets)
        ).write.mode("overwrite").partitionBy("bkt").parquet(
            os.path.join(index_dir, "terms")
        )
        tf.groupBy(id_col).agg(F.sum("tf").alias("dl")).write.mode(
            "overwrite"
        ).parquet(os.path.join(index_dir, "doclens"))
    finally:
        tf.unpersist()

    # corpus stats from the WRITTEN doclens (no further corpus pass);
    # spelled as the same count/sum aggregate bm25_topk keeps in-plan
    row = (
        spark.read.parquet(os.path.join(index_dir, "doclens"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl"))
        .first()
    )
    n_terms = spark.read.parquet(os.path.join(index_dir, "terms")).count()
    meta = {
        "n_docs": int(row["n_docs"]),
        "sum_dl": int(row["sum_dl"]) if row["sum_dl"] is not None else 0,
        "n_buckets": n_buckets,
        "n_terms": int(n_terms),
        "id_col": id_col,
    }
    spark.createDataFrame(
        [tuple(meta.values())],
        "n_docs bigint, sum_dl bigint, n_buckets int, n_terms bigint, "
        "id_col string",
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "meta"))
    return meta


def append_to_text_index(
    docs_delta: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str | None = None,
) -> dict:
    """Grow the index with a corpus delta — the production path (the
    ann_index.append_to_index precedent): postings and doclens rows
    APPEND under the same bucket function; the vocabulary-sized terms
    table is df-MERGED (old + delta per term) and swapped in via a
    staged rewrite (stage dir + rename — on an object store this would
    be a versioned directory; the meta row is rewritten last either
    way). Queries after append are identical to an index built from
    the union corpus (pinned in tests).

    Caveat (same contract as the ANN append): delta ``doc_id``s must
    be NEW — re-appending an existing id would double its doclens row
    and postings. n_docs/sum_dl/n_terms in meta are updated from the
    written tables."""
    spark = docs_delta.sparkSession
    meta = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    n_buckets = int(meta["n_buckets"])
    if id_col is None:
        id_col = str(meta["id_col"])

    toks = docs_delta.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("t")
    ).where(F.col("t") != "")
    tf = toks.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.persist()
    try:
        # same clustered-and-sorted layout as build, so appended files
        # keep tight row-group stats on t
        tf.withColumn("bkt", _bkt(n_buckets)).repartition(
            "bkt"
        ).sortWithinPartitions("t", id_col).write.mode(
            "append"
        ).partitionBy("bkt").parquet(os.path.join(index_dir, "postings"))
        tf.groupBy(id_col).agg(F.sum("tf").alias("dl")).write.mode(
            "append"
        ).parquet(os.path.join(index_dir, "doclens"))

        # terms df merge: old ⊕ delta per term (both Heaps-law-sized).
        # Staged: Spark cannot overwrite a path it is lazily reading.
        old_terms = spark.read.parquet(
            os.path.join(index_dir, "terms")
        ).select("t", "df")
        delta_df = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df_new"))
        merged = (
            old_terms.join(delta_df, "t", "full_outer")
            .select(
                "t",
                (
                    F.coalesce(F.col("df"), F.lit(0))
                    + F.coalesce(F.col("df_new"), F.lit(0))
                ).alias("df"),
            )
            .withColumn("bkt", _bkt(n_buckets))
        )
        stage = os.path.join(index_dir, "terms__stage")
        merged.write.mode("overwrite").partitionBy("bkt").parquet(stage)
    finally:
        tf.unpersist()
    import shutil

    live = os.path.join(index_dir, "terms")
    shutil.rmtree(live)
    os.rename(stage, live)

    row = (
        spark.read.parquet(os.path.join(index_dir, "doclens"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl"))
        .first()
    )
    n_terms = spark.read.parquet(live).count()
    appended = int(row["n_docs"]) - int(meta["n_docs"])
    new_meta = {
        "n_docs": int(row["n_docs"]),
        "sum_dl": int(row["sum_dl"]) if row["sum_dl"] is not None else 0,
        "n_buckets": n_buckets,
        "n_terms": int(n_terms),
        "id_col": id_col,
    }
    spark.createDataFrame(
        [tuple(new_meta.values())],
        "n_docs bigint, sum_dl bigint, n_buckets int, n_terms bigint, "
        "id_col string",
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "meta"))
    return {**new_meta, "appended": appended}


def compact_text_index(spark: SparkSession, index_dir: str) -> dict:
    """Maintenance verb: rewrite the postings table clustered and
    (t, id)-sorted again. Every append lands its own files per bucket
    directory, each with its own row groups — fine for a few appends,
    but across many the per-file overhead grows and the t-sort that
    makes row-group stats tight only holds WITHIN each append's files.
    Compaction restores the freshly-built layout (staged rewrite +
    swap, same pattern as append's terms merge). Query results are
    unchanged by construction — layout only; doclens/terms/meta are
    untouched.

    Returns {"files_before": n, "files_after": m}."""
    import glob
    import shutil

    meta = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    id_col = str(meta["id_col"])  # bkt already rides in the stored rows
    live = os.path.join(index_dir, "postings")

    def n_files(root: str) -> int:
        return len(glob.glob(os.path.join(root, "bkt=*", "*.parquet")))

    before = n_files(live)
    stage = os.path.join(index_dir, "postings__stage")
    (
        spark.read.parquet(live)
        .select(id_col, "t", "tf", "bkt")
        .repartition("bkt")
        .sortWithinPartitions("t", id_col)
        .write.mode("overwrite")
        .partitionBy("bkt")
        .parquet(stage)
    )
    shutil.rmtree(live)
    os.rename(stage, live)
    return {"files_before": before, "files_after": n_files(live)}


def query_bm25_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    prune: bool = True,
    min_postings: int | None = None,
) -> DataFrame:
    """Top-``k`` docs per query FROM THE INDEX ONLY — the raw corpus is
    never re-read. ``queries``: (q_id, q_text). Bit-identical to
    ``bm25_topk`` on the indexed corpus (shared scoring core; the
    1-row stats frame is rebuilt from meta with the same BIGINT
    values, so every double op sees identical inputs).

    Bucket pruning: the distinct query terms are collected (query-
    batch-sized, the ANN-index precedent) and their bkt values derived
    by the same xxhash64 expression in a local no-scan job — Python
    cannot replay Spark's xxhash64 — then pushed as isin partition
    filters into both the postings and terms scans."""
    from ccog_spark.operators.text import _bm25_rank

    meta = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    n_buckets = int(meta["n_buckets"])
    id_col = str(meta["id_col"])
    qterms = (
        queries.select(
            "q_id", F.explode(F.split(F.col("q_text"), " ")).alias("t")
        )
        .where(F.col("t") != "")
        .distinct()
    )
    tlist = [r["t"] for r in qterms.select("t").distinct().collect()]
    if tlist:
        bkts = sorted(
            {
                r["b"]
                for r in spark.createDataFrame([(t,) for t in tlist], "t string")
                .select(_bkt(n_buckets).alias("b"))
                .collect()
            }
        )
    else:
        bkts = []
    # empty query batch: isin() rejects zero args — an always-false
    # literal keeps the (empty) plan well-formed
    bkt_pred = F.col("bkt").isin(bkts) if bkts else F.lit(False)
    postings = spark.read.parquet(os.path.join(index_dir, "postings")).where(
        bkt_pred
    )
    # In(t) data filter: semantically redundant with the scoring join
    # but pushes into the parquet scan, where the build-time (t, id)
    # sort makes row-group min/max stats on t tight — reads only the
    # query terms' neighbourhoods inside each matched bucket. Skipped
    # for very large term batches (expression bloat dwarfs the stats
    # win — the ANN isin-skip precedent).
    if tlist and len(tlist) <= _TERM_ISIN_CAP:
        postings = postings.where(F.col("t").isin(tlist))
    postings = postings.select(id_col, "t", "tf")
    terms = (
        spark.read.parquet(os.path.join(index_dir, "terms"))
        .where(bkt_pred)
        .select("t", "df")
    )
    doclens = spark.read.parquet(os.path.join(index_dir, "doclens"))
    stats = spark.createDataFrame(
        [(int(meta["n_docs"]), int(meta["sum_dl"]))],
        "n_docs bigint, sum_dl bigint",
    )
    if prune:
        # cheap pre-gate (the bm25_topk one, but n_docs comes from
        # meta): the planner's postings total sums df PER (q_id, t)
        # pair, so its ceiling is |distinct (q_id, t) pairs| · n_docs
        # — under the floor, the planner could never engage. NB the
        # DISTINCT-TERM count would under-bound it (a term shared by
        # many queries contributes once per query).
        from ccog_spark.operators.text import BM25_PRUNE_MIN_POSTINGS

        floor = (
            BM25_PRUNE_MIN_POSTINGS if min_postings is None else min_postings
        )
        if qterms.count() * int(meta["n_docs"]) < floor:
            prune = False
    return _bm25_rank(
        spark, postings, doclens, terms, stats, qterms,
        k=k, k1=k1, b=b, id_col=id_col,
        prune=prune, min_postings=min_postings,
    )
