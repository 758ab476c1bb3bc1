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

from ccog_spark.operators import index_common as ic


def _bkt(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("t")), F.lit(n_buckets)).cast("int")


def _dbkt(id_col: str, n_buckets: int):
    """Doc-hash bucket for the FORWARD table (round 15): the postings
    layout clusters by TERM, so any by-doc access (PRF feedback
    counts, delta-less deletes) scans every bucket; the forward table
    clusters the same (id, t, tf) rows by doc hash so those verbs
    prune to the target docs' directories instead."""
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int")


_META_SCHEMA = (
    "n_docs bigint, sum_dl bigint, n_buckets int, n_terms bigint, "
    "id_col string, generation bigint, has_positions boolean, "
    "meta_cols string, last_epoch string, has_forward boolean, "
    "has_blockmax boolean"
)
_META_KEYS = ("n_docs", "sum_dl", "n_buckets", "n_terms", "id_col",
              "generation", "has_positions", "meta_cols", "last_epoch",
              "has_forward", "has_blockmax")


def _write_meta(spark: SparkSession, index_dir: str, meta: dict) -> None:
    spark.createDataFrame(
        [tuple(meta[k] for k in _META_KEYS)], _META_SCHEMA
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "meta"))


def _read_meta(spark: SparkSession, index_dir: str) -> dict:
    row = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    d = row.asDict()
    d.setdefault("generation", 1)  # pre-round-14 index layout
    d.setdefault("has_positions", False)
    d.setdefault("meta_cols", "")
    if d["meta_cols"] is None:
        d["meta_cols"] = ""
    # round 15: the applied-epoch record rides IN the meta rewrite so
    # streaming replay detection is transactional with the append's
    # last step (VERDICT r14 #3); pre-r15 indexes default to ""
    d.setdefault("last_epoch", "")
    if d["last_epoch"] is None:
        d["last_epoch"] = ""
    # round 15: optional doc-bucketed forward table (see
    # build_bm25_index(forward=True)); pre-r15 indexes lack it
    d.setdefault("has_forward", False)
    if d["has_forward"] is None:
        d["has_forward"] = False
    # round 15: optional per-(term, block) tf ceilings (see
    # build_bm25_index(block_max=True)); older indexes lack them
    d.setdefault("has_blockmax", False)
    if d["has_blockmax"] is None:
        d["has_blockmax"] = False
    return d


def _toks_frame(
    docs: DataFrame, text_col: str, id_col: str, positions: bool
) -> DataFrame:
    """(id, t [, pos]) token stream. ``pos`` is the 1-based index in
    the RAW whitespace split (empty tokens filtered, positions NOT
    renumbered) — the same rule as text.phrase_match, so index-backed
    phrase answers are bit-identical to the inline operator's."""
    if not positions:
        return docs.select(
            F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("t")
        ).where(F.col("t") != "")
    return (
        docs.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), " ")).alias("p0", "t"),
        )
        .where(F.col("t") != "")
        .select(id_col, "t", (F.col("p0") + 1).cast("int").alias("pos"))
    )


def _tf_frame(
    docs: DataFrame, text_col: str, id_col: str, positions: bool
) -> DataFrame:
    """The postings rows for one corpus (delta): (id, t, tf [, pos]).
    With positions, each posting carries the SORTED occurrence
    positions — the standard positional-index layout (≈2-3× postings
    bytes; the price of phrase/proximity queries without a corpus
    re-read)."""
    toks = _toks_frame(docs, text_col, id_col, positions)
    if not positions:
        return toks.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    return toks.groupBy(id_col, "t").agg(
        F.count(F.lit(1)).alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("pos"),
    )


# Above this many distinct query terms the In(t) data filter is skipped:
# a thousands-strong isin costs more in expression evaluation than the
# row-group pruning saves (ANN's probe-isin skip precedent).
_TERM_ISIN_CAP = 256


def _pruned_postings(
    spark: SparkSession, index_dir: str, n_buckets: int, tlist: list[str]
):
    """Bucket-pruned postings scan for a query-term list — the shared
    read path of every index query verb (round 15 factor-out of the
    BM25/phrase twins). Returns (postings frame, bkt predicate — the
    same predicate prunes the terms table).

    The ``bkt`` partition filter prunes whole directories; the In(t)
    data filter is semantically redundant with the downstream scoring
    join but pushes into the parquet scan, where the build-time
    (t, id) sort makes row-group min/max stats on t tight — reads
    only the query terms' neighbourhoods inside each matched bucket.
    Skipped for very large term batches (expression bloat dwarfs the
    stats win — the ANN isin-skip precedent). An empty term list gets
    an always-false literal (isin() rejects zero args) so the (empty)
    plan stays well-formed.

    Round 16: with a bucket manifest present the matched buckets'
    files are opened BY NAME (no partition discovery across up to
    4096 directories per query); the returned ``bkts`` list lets
    callers route their terms/blockstats reads through
    ``_manifest_bucket_read`` with the same bucket set."""
    if tlist:
        bkts = sorted(
            {
                r["b"]
                for r in spark.createDataFrame(
                    [(t,) for t in tlist], "t string"
                )
                .select(_bkt(n_buckets).alias("b"))
                .collect()
            }
        )
    else:
        bkts = []
    bkt_pred = F.col("bkt").isin(bkts) if bkts else F.lit(False)
    postings = _manifest_bucket_read(spark, index_dir, "postings", bkts)
    if postings is None:
        postings = spark.read.parquet(
            os.path.join(index_dir, "postings")
        ).where(bkt_pred)
    if tlist and len(tlist) <= _TERM_ISIN_CAP:
        postings = postings.where(F.col("t").isin(tlist))
    return postings, bkt_pred, bkts


_FWD_MANIFEST = "forward_manifest.json"
_BKT_MANIFEST = "bucket_manifest.json"
# the bkt-partitioned tables an index may hold; a manifest entry
# exists per table that exists on disk at (re)write time
_BKT_TABLES = ("postings", "terms", "blockstats")


def _write_bucket_manifest(index_dir: str) -> dict:
    """(Re)write the bkt → file-list manifest for every bucket-
    partitioned table (round 16 — the forward-table manifest's
    generalization to the QUERY hot path): one driver-side walk at
    WRITE time replaces a per-query listing of up to 4096 partition
    directories per table. Written atomically; every verb that
    mutates postings/terms/blockstats (build, append, delete's terms
    rewrite, compact — text AND bm25f families) calls this inside its
    mutation bracket, and ``verify_text_index`` audits drift. Absent
    manifest = pre-round-16 index → reads fall back to partition
    discovery."""
    import json

    man: dict[str, dict[str, list[str]]] = {}
    for table in _BKT_TABLES:
        tdir = os.path.join(index_dir, table)
        if not os.path.isdir(tdir):
            continue
        tman: dict[str, list[str]] = {}
        for d in sorted(os.listdir(tdir)):
            if not d.startswith("bkt="):
                continue
            files = sorted(
                f
                for f in os.listdir(os.path.join(tdir, d))
                if f.endswith(".parquet")
            )
            if files:
                tman[d.split("=", 1)[1]] = [f"{d}/{f}" for f in files]
        man[table] = tman
    tmp = os.path.join(index_dir, _BKT_MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(man, fh)
    os.replace(tmp, os.path.join(index_dir, _BKT_MANIFEST))
    return man


def _read_bucket_manifest(index_dir: str) -> dict | None:
    import json

    p = os.path.join(index_dir, _BKT_MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _manifest_bucket_read(
    spark: SparkSession, index_dir: str, table: str, bkts: list
):
    """Manifest-named-file read of a bucket-partitioned table for the
    given bkt list, or None when the index predates the manifest (or
    the table has no entry) — callers fall back to the
    partition-discovery + ``bkt IN (…)`` read. basePath keeps the bkt
    partition column; row-group data filters still push into the
    named files."""
    man = _read_bucket_manifest(index_dir)
    if man is None or table not in man:
        return None
    tdir = os.path.join(index_dir, table)
    files = [
        os.path.join(tdir, rel)
        for b in bkts
        for rel in man[table].get(str(b), ())
    ]
    if not files:
        # no matched bucket holds rows — well-formed empty plan with
        # the live schema (one listing, edge case only)
        return spark.read.parquet(tdir).where(F.lit(False))
    return spark.read.option("basePath", tdir).parquet(*files)


def _write_forward_manifest(index_dir: str) -> dict:
    """(Re)write the forward table's dbkt → file-list manifest (round
    16, VERDICT r15 #3): one driver-side walk at WRITE time replaces a
    per-query listing of up to 4096 partition directories at READ time
    — ``_pruned_forward`` opens the matched buckets' named files
    directly. Paths are stored RELATIVE to ``forward/`` so an index
    directory can be relocated wholesale. Written atomically (tmp +
    rename); every verb that mutates ``forward/`` (build, append,
    compact) calls this, and ``verify_text_index`` audits
    manifest-vs-live drift."""
    import json

    fwd = os.path.join(index_dir, "forward")
    man: dict[str, list[str]] = {}
    for d in sorted(os.listdir(fwd)):
        if not d.startswith("dbkt="):
            continue
        files = sorted(
            f
            for f in os.listdir(os.path.join(fwd, d))
            if f.endswith(".parquet")
        )
        if files:
            man[d.split("=", 1)[1]] = [f"{d}/{f}" for f in files]
    tmp = os.path.join(index_dir, _FWD_MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(man, fh)
    os.replace(tmp, os.path.join(index_dir, _FWD_MANIFEST))
    return man


def _read_forward_manifest(index_dir: str) -> dict | None:
    """The manifest, or None for a pre-round-16 index (callers fall
    back to the partition-discovery read)."""
    import json

    p = os.path.join(index_dir, _FWD_MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _pruned_forward(
    spark: SparkSession,
    index_dir: str,
    meta: dict,
    id_list: list,
):
    """Doc-bucket-pruned forward-table scan for a doc-id list (round
    15 — the by-doc twin of ``_pruned_postings``): dbkt partition
    pruning + an In(id) data filter over the (id, t)-sorted files.
    Requires ``build_bm25_index(forward=True)``. With the round-16
    manifest the matched buckets' files are opened BY NAME (basePath
    keeps the dbkt partition column) — no directory walk at all."""
    id_col = str(meta["id_col"])
    n_buckets = int(meta["n_buckets"])
    if id_list:
        # the bucket hash is TYPE-sensitive (xxhash64(long) !=
        # xxhash64(string)) — mirror the stored id type
        typ = "bigint" if isinstance(id_list[0], int) else "string"
        dbkts = sorted(
            {
                r["b"]
                for r in spark.createDataFrame(
                    [(i,) for i in id_list], f"{id_col} {typ}"
                )
                .select(_dbkt(id_col, n_buckets).alias("b"))
                .collect()
            }
        )
    else:
        dbkts = []
    fwd_dir = os.path.join(index_dir, "forward")
    man = _read_forward_manifest(index_dir)
    if man is not None:
        files = [
            os.path.join(fwd_dir, rel)
            for b in dbkts
            for rel in man.get(str(b), ())
        ]
        if files:
            fwd = spark.read.option("basePath", fwd_dir).parquet(*files)
        else:
            # no matched bucket holds rows — keep a well-formed empty
            # plan with the live schema (one listing, edge case only)
            fwd = spark.read.parquet(fwd_dir).where(F.lit(False))
    else:
        pred = F.col("dbkt").isin(dbkts) if dbkts else F.lit(False)
        fwd = spark.read.parquet(fwd_dir).where(pred)
    if id_list and len(id_list) <= _TERM_ISIN_CAP:
        fwd = fwd.where(F.col(id_col).isin(id_list))
    return fwd


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
    positions: bool = False,
    meta_cols: tuple[str, ...] = (),
    epoch_tag: str | None = None,
    forward: bool = False,
    block_max: bool = False,
) -> dict:
    """One tokenize pass → persisted index. Returns the meta dict.

    ``epoch_tag`` (round 15, VERDICT r14 #3): the streaming sink's
    applied-epoch record ("{ns}:{epoch_id}"), stored in the meta row
    itself so replay detection is transactional with the build's last
    step — a crash between a completed build/append and the sink's
    convenience marker can no longer double-apply the batch.

    ``n_buckets`` defaults to adaptive_n_buckets(corpus count) — one
    extra column-pruned count job at build time; pass an int to pin
    the directory count (tests, controlled probes). The TF aggregate
    is persisted for the duration of the build (all three written
    tables derive from it) and released before return.

    ``positions=True`` (round 14, VERDICT r13 #5) stores each
    posting's sorted occurrence positions (1-based indices in the raw
    whitespace split) — the positional layout phrase/proximity
    queries need (``phrase_match_index``), at the standard ~2-3×
    postings-bytes cost. BM25 scoring ignores the column entirely.

    ``meta_cols`` (round 14): metadata columns copied into an
    index-resident ``docmeta/`` table (Lucene stored-fields shape —
    corpus-sized but narrow), enabling query-time FILTERED retrieval
    (``query_bm25_index(doc_filter=...)``) without ever re-reading
    the corpus. Column-pruned/predicate-pushed at query time.

    ``forward=True`` (round 15): additionally store the same
    (id, t, tf) rows clustered by DOC hash (``forward/``, dbkt
    partition dirs, (id, t)-sorted — Lucene's term-vectors idea at
    parquet granularity). The postings layout clusters by term, so
    by-DOC access (PRF feedback counts, delta-less deletes) scans
    every bucket; with the forward table those verbs prune to the
    target docs' directories. Costs one extra (already-aggregated)
    shuffle at build and ~1× postings bytes; rides append, delete
    (tombstone anti-join), and compact like every other table.

    ``block_max=True`` (round 15): additionally store per-(term,
    id-range-block) tf ceilings (``blockstats/``, (t, blk, max_tf),
    blk = id DIV text.BM25_BLOCK, same bkt term-hash layout as
    postings so the query read prunes identically). When the
    max-score planner engages, ``query_bm25_index`` then skips whole
    BLOCKS of an essential term's postings whose best possible
    contribution cannot reach θ — Lucene's BlockMaxWAND idea as a
    batch-engine candidate cut, lossless by the bound argument in
    ``text._bm25_rank``. Tiny table (≤ one row per (term, 1024-doc
    block) with postings); appends add delta rows (query side
    max-merges), deletes leave ceilings stale-HIGH (bound loosens,
    never breaks), compact rebuilds them exact.
    """
    spark = docs.sparkSession
    if n_buckets is None:
        n_buckets = adaptive_n_buckets(docs.count())
    tf = _tf_frame(docs, text_col, id_col, positions)
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
        if meta_cols:
            docs.select(id_col, *meta_cols).write.mode("overwrite").parquet(
                os.path.join(index_dir, "docmeta")
            )
        if forward:
            tf.select(id_col, "t", "tf").withColumn(
                "dbkt", _dbkt(id_col, n_buckets)
            ).repartition("dbkt").sortWithinPartitions(id_col, "t").write.mode(
                "overwrite"
            ).partitionBy("dbkt").parquet(os.path.join(index_dir, "forward"))
            _write_forward_manifest(index_dir)
        if block_max:
            from ccog_spark.operators.text import _blk_of

            tf.withColumn("blk", _blk_of(id_col)).groupBy(
                "t", "blk"
            ).agg(F.max("tf").alias("max_tf")).withColumn(
                "bkt", _bkt(n_buckets)
            ).write.mode("overwrite").partitionBy("bkt").parquet(
                os.path.join(index_dir, "blockstats")
            )
    finally:
        tf.unpersist()
    _write_bucket_manifest(index_dir)

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
        "generation": 1,
        "has_positions": bool(positions),
        "meta_cols": ",".join(meta_cols),
        "last_epoch": epoch_tag or "",
        "has_forward": bool(forward),
        "has_blockmax": bool(block_max),
    }
    _write_meta(spark, index_dir, meta)
    return meta


def append_to_text_index(
    docs_delta: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str | None = None,
    epoch_tag: str | None = None,
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
    and postings, and an id sitting in the tombstone set (deleted,
    not yet compacted) would stay invisible behind the query-time
    anti-join: to re-add a deleted id, compact first.
    n_docs/sum_dl/n_terms in meta are updated from the written tables
    (minus pending tombstones).

    TORN-APPEND SAFETY (round 14, ADVICE r13): the verb commits
    postings and doclens BEFORE the terms merge and meta rewrite — a
    crash between those steps leaves stale df/n_docs that would
    silently mis-score every query. An ``_inflight`` marker brackets
    the whole mutation (written first, removed after the meta
    rewrite), and the query side refuses a marked index (see
    index_common.check_not_inflight for the repair path).

    DRIFT SIGNAL (the occupancy-skew twin for text): the returned
    ``new_terms`` / ``vocab_growth`` report how much the delta grew
    the vocabulary. Under Heaps' law, same-domain deltas grow the
    vocabulary ever more slowly — a SPIKE in vocab_growth means the
    delta's term distribution has shifted away from the corpus the
    bucket count and compaction layout were sized for, the cue to
    compact (and at the extreme re-bucket via rebuild)."""
    spark = docs_delta.sparkSession
    meta = _read_meta(spark, index_dir)
    n_buckets = int(meta["n_buckets"])
    if id_col is None:
        id_col = str(meta["id_col"])
    ic.begin_mutation(index_dir, "append", int(meta["generation"]) + 1)

    # delta postings in the INDEX's layout (positions carried iff the
    # build stored them — a mixed table would break phrase reads)
    tf = _tf_frame(
        docs_delta, text_col, id_col, bool(meta["has_positions"])
    )
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
        if meta["meta_cols"]:
            # filtered-retrieval metadata rides along: the delta must
            # carry the build's meta_cols (select fails loudly if not)
            docs_delta.select(
                id_col, *meta["meta_cols"].split(",")
            ).write.mode("append").parquet(os.path.join(index_dir, "docmeta"))
        if meta["has_forward"]:
            # the doc-clustered twin rows ride along (round 15); the
            # manifest refresh picks up the appended files (round 16)
            tf.select(id_col, "t", "tf").withColumn(
                "dbkt", _dbkt(id_col, n_buckets)
            ).repartition("dbkt").sortWithinPartitions(
                id_col, "t"
            ).write.mode("append").partitionBy("dbkt").parquet(
                os.path.join(index_dir, "forward")
            )
            _write_forward_manifest(index_dir)
        if meta["has_blockmax"]:
            # block-max ceilings ride along as APPENDED delta rows —
            # duplicate (t, blk) pairs across appends are fine: the
            # query side max-merges, and max(old, delta) is exactly
            # the union corpus's ceiling. No staged rewrite needed.
            from ccog_spark.operators.text import _blk_of

            tf.withColumn("blk", _blk_of(id_col)).groupBy(
                "t", "blk"
            ).agg(F.max("tf").alias("max_tf")).withColumn(
                "bkt", _bkt(n_buckets)
            ).write.mode("append").partitionBy("bkt").parquet(
                os.path.join(index_dir, "blockstats")
            )

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
    _write_bucket_manifest(index_dir)

    # corpus stats from the written doclens MINUS pending tombstones
    # (an earlier delete leaves its rows physical until compact —
    # counting them here would silently restore the deleted docs'
    # n_docs/avgdl contribution; caught by the delete-then-append
    # composition test)
    row = (
        ic.anti_tombstones(
            spark.read.parquet(os.path.join(index_dir, "doclens")),
            ic.read_tombstones(spark, index_dir, id_col),
            id_col,
        )
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl"))
        .first()
    )
    n_terms = spark.read.parquet(live).count()
    appended = int(row["n_docs"]) - int(meta["n_docs"])
    new_terms = int(n_terms) - int(meta["n_terms"])
    new_meta = {
        "n_docs": int(row["n_docs"]),
        "sum_dl": int(row["sum_dl"]) if row["sum_dl"] is not None else 0,
        "n_buckets": n_buckets,
        "n_terms": int(n_terms),
        "id_col": id_col,
        "generation": int(meta["generation"]) + 1,
        "has_positions": bool(meta["has_positions"]),
        "meta_cols": meta["meta_cols"],
        # streaming replay record, transactional with this rewrite
        # (round 15); a plain batch append preserves the prior value
        "last_epoch": epoch_tag if epoch_tag is not None
        else meta["last_epoch"],
        "has_forward": bool(meta["has_forward"]),
        "has_blockmax": bool(meta["has_blockmax"]),
    }
    _write_meta(spark, index_dir, new_meta)
    ic.end_mutation(index_dir)
    return {
        **new_meta,
        "appended": appended,
        # vocabulary-drift staleness signal (see docstring): fraction
        # by which this append grew the term dictionary
        "new_terms": new_terms,
        "vocab_growth": (
            new_terms / int(meta["n_terms"]) if int(meta["n_terms"]) else 0.0
        ),
    }


def delete_from_text_index(
    spark: SparkSession,
    index_dir: str,
    doc_ids: DataFrame,
    docs_delta: DataFrame | None = None,
    text_col: str = "text",
) -> dict:
    """Remove documents from the index (round 14, VERDICT r13 #2 —
    takedowns, upstream dedup, licence filtering). Deletion is
    LOGICAL-first: the ids land in ``tombstones/`` (a small parquet
    set queries anti-join against) while the corpus-sized postings
    and doclens tables stay untouched until ``compact_text_index``
    applies the tombstones physically. What CANNOT be deferred is the
    statistics: BM25 scores depend on df/n_docs/avgdl, so the
    vocabulary-sized terms table is df-decremented (staged rewrite,
    terms hitting df = 0 dropped) and meta is rewritten — after this
    verb, query results are BIT-IDENTICAL to an index built from
    scratch over the surviving corpus (pinned in tests; the registry
    row's oracle is the from-scratch SQL over survivors).

    The per-term df decrement needs the deleted docs' term sets.
    Two sources:
    - ``docs_delta`` given (id + text of the docs being deleted — the
      takedown workflow has them): ONE tokenize pass over the
      delta only; nothing corpus-sized is read. The scale path.
    - ``docs_delta`` omitted: the postings table is semi-joined on
      the deleted ids — a full postings scan (the ids are spread
      across every term bucket), acceptable for occasional deletes,
      batched takedown queues should pass the delta.

    Ids not present in the index, or already tombstoned, are ignored
    (the verb is IDEMPOTENT — a double delete never double-decrements
    df). Returns {"deleted": n, "generation": g}."""
    meta = _read_meta(spark, index_dir)
    n_buckets = int(meta["n_buckets"])
    id_col = str(meta["id_col"])
    ic.begin_mutation(index_dir, "delete", int(meta["generation"]) + 1)
    # NB: the marker is removed ONLY on the success paths below — an
    # exception mid-mutation must LEAVE it so the query side refuses
    # the possibly-inconsistent index (that detection is the marker's
    # whole job)
    ids = doc_ids.toDF(id_col).distinct()
    doclens = spark.read.parquet(os.path.join(index_dir, "doclens"))
    tomb = ic.read_tombstones(spark, index_dir, id_col)
    # live ∧ not-already-tombstoned: the set whose stats must go
    live_del = doclens.join(F.broadcast(ids), id_col, "left_semi")
    live_del = ic.anti_tombstones(live_del, tomb, id_col)
    live_del = live_del.persist()
    try:
        agg = live_del.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
        ).first()
        n_del = int(agg["n"])
        if n_del == 0:
            ic.end_mutation(index_dir)  # nothing was touched
            return {"deleted": 0, "generation": int(meta["generation"])}
        del_ids = live_del.select(id_col)

        # per-term df decrement from the deleted docs' term sets
        if docs_delta is not None:
            delta_toks = (
                docs_delta.join(F.broadcast(del_ids), id_col, "left_semi")
                .select(
                    F.col(id_col),
                    F.explode(F.split(F.col(text_col), " ")).alias("t"),
                )
                .where(F.col("t") != "")
                .select(id_col, "t")
            )
            # guard (round 15, VERDICT r14 #6): the df decrement
            # TRUSTS the caller's delta text — if it differs from
            # what was indexed, df silently drifts from a
            # from-scratch build. The stored doclens rows are
            # already in hand (live_del), so compare per-doc token
            # counts and refuse loudly on mismatch. Nothing has
            # been mutated yet, so the marker is released.
            delta_dl = delta_toks.groupBy(id_col).agg(
                F.count(F.lit(1)).alias("dl_delta")
            )
            bad = (
                live_del.join(F.broadcast(delta_dl), id_col, "left")
                .where(
                    F.coalesce(F.col("dl_delta"), F.lit(-1))
                    != F.col("dl")
                )
                .select(id_col, "dl", "dl_delta")
                .limit(5)
                .collect()
            )
            if bad:
                ic.end_mutation(index_dir)
                detail = ", ".join(
                    f"{r[0]}: indexed dl={r[1]}, delta dl="
                    f"{r[2] if r[2] is not None else 'missing'}"
                    for r in bad
                )
                raise ValueError(
                    "docs_delta does not match the indexed text for "
                    f"some deleted ids ({detail}, ...): refusing the "
                    "delete — its df decrements would silently "
                    "diverge from a from-scratch build over the "
                    "survivors. Pass the exact indexed text, or omit "
                    "docs_delta to derive term sets from the "
                    "postings table."
                )
            del_terms = delta_toks.distinct()
        elif meta["has_forward"]:
            # doc-clustered forward table (round 15): the deleted
            # ids' dbkt directories only, instead of a full
            # postings-width scan
            del_terms = (
                _pruned_forward(
                    spark, index_dir, meta,
                    [r[0] for r in del_ids.collect()],
                )
                .join(F.broadcast(del_ids), id_col, "left_semi")
                .select(id_col, "t")
            )
        else:
            del_terms = (
                spark.read.parquet(os.path.join(index_dir, "postings"))
                .join(F.broadcast(del_ids), id_col, "left_semi")
                .select(id_col, "t")
            )
        df_del = del_terms.groupBy("t").agg(
            F.count(F.lit(1)).alias("df_del")
        )

        # staged terms rewrite (Spark cannot overwrite a path it
        # lazily reads — append's proven swap pattern); df = 0 rows
        # are dropped exactly as a from-scratch build over the
        # survivors would never have them
        old_terms = spark.read.parquet(
            os.path.join(index_dir, "terms")
        ).select("t", "df")
        merged = (
            old_terms.join(df_del, "t", "left")
            .select(
                "t",
                (
                    F.col("df") - F.coalesce(F.col("df_del"), F.lit(0))
                ).alias("df"),
            )
            .where(F.col("df") > 0)
            .withColumn("bkt", _bkt(n_buckets))
        )
        stage = os.path.join(index_dir, "terms__stage")
        merged.write.mode("overwrite").partitionBy("bkt").parquet(stage)

        ic.append_tombstones(del_ids, index_dir)
    finally:
        live_del.unpersist()
    import shutil

    live = os.path.join(index_dir, "terms")
    shutil.rmtree(live)
    os.rename(stage, live)
    _write_bucket_manifest(index_dir)

    n_terms = spark.read.parquet(live).count()
    new_meta = {
        "n_docs": int(meta["n_docs"]) - n_del,
        "sum_dl": int(meta["sum_dl"]) - int(agg["s"]),
        "n_buckets": n_buckets,
        "n_terms": int(n_terms),
        "id_col": id_col,
        "generation": int(meta["generation"]) + 1,
        "has_positions": bool(meta["has_positions"]),
        "meta_cols": meta["meta_cols"],
        "last_epoch": meta["last_epoch"],
        "has_forward": bool(meta["has_forward"]),
        # block-max ceilings untouched by deletion: tombstoned docs
        # can only make a stored max_tf stale-HIGH, which loosens the
        # (lossless) skip bound without breaking it; compact restores
        # the exact ceilings
        "has_blockmax": bool(meta["has_blockmax"]),
    }
    _write_meta(spark, index_dir, new_meta)
    ic.end_mutation(index_dir)
    return {**new_meta, "deleted": n_del}


def compact_text_index(spark: SparkSession, index_dir: str) -> dict:
    """Maintenance verb: rewrite the postings table clustered and
    (t, id)-sorted again, APPLYING pending tombstones physically
    (round 14). Every append lands its own files per bucket directory,
    each with its own row groups — fine for a few appends, but across
    many the per-file overhead grows and the t-sort that makes
    row-group stats tight only holds WITHIN each append's files; and
    every delete leaves its rows in place behind the tombstone
    anti-join. Compaction restores the freshly-built layout (staged
    rewrite + swap, same pattern as append's terms merge), drops
    tombstoned rows from postings AND doclens, and clears the
    tombstone set. Query answers are unchanged by construction —
    deletes were already logically applied (pinned in tests).

    Returns {"files_before": n, "files_after": m, "tombstones_applied":
    t}."""
    import glob
    import shutil

    meta = _read_meta(spark, index_dir)
    id_col = str(meta["id_col"])  # bkt already rides in the stored rows
    live = os.path.join(index_dir, "postings")

    def n_files(root: str) -> int:
        return len(glob.glob(os.path.join(root, "bkt=*", "*.parquet")))

    before = n_files(live)
    tomb = ic.read_tombstones(spark, index_dir, id_col)
    n_tomb = tomb.count() if tomb is not None else 0
    ic.begin_mutation(index_dir, "compact", int(meta["generation"]) + 1)
    stage = os.path.join(index_dir, "postings__stage")
    cols = [id_col, "t", "tf", "bkt"]
    if bool(meta["has_positions"]):
        cols.insert(3, "pos")  # positional layout rides through
    (
        ic.anti_tombstones(
            spark.read.parquet(live).select(*cols),
            tomb, id_col,
        )
        .repartition("bkt")
        .sortWithinPartitions("t", id_col)
        .write.mode("overwrite")
        .partitionBy("bkt")
        .parquet(stage)
    )
    if tomb is not None:
        dl_live = os.path.join(index_dir, "doclens")
        dl_stage = os.path.join(index_dir, "doclens__stage")
        ic.anti_tombstones(
            spark.read.parquet(dl_live), tomb, id_col
        ).write.mode("overwrite").parquet(dl_stage)
        shutil.rmtree(dl_live)
        os.rename(dl_stage, dl_live)
        if meta["meta_cols"]:
            dm_live = os.path.join(index_dir, "docmeta")
            dm_stage = os.path.join(index_dir, "docmeta__stage")
            ic.anti_tombstones(
                spark.read.parquet(dm_live), tomb, id_col
            ).write.mode("overwrite").parquet(dm_stage)
            shutil.rmtree(dm_live)
            os.rename(dm_stage, dm_live)
    if meta["has_forward"]:
        # restore the doc-clustered layout too (appends fragment it
        # the same way), applying tombstones physically
        fw_live = os.path.join(index_dir, "forward")
        fw_stage = os.path.join(index_dir, "forward__stage")
        (
            ic.anti_tombstones(
                spark.read.parquet(fw_live).select(
                    id_col, "t", "tf", "dbkt"
                ),
                tomb, id_col,
            )
            .repartition("dbkt")
            .sortWithinPartitions(id_col, "t")
            .write.mode("overwrite")
            .partitionBy("dbkt")
            .parquet(fw_stage)
        )
        shutil.rmtree(fw_live)
        os.rename(fw_stage, fw_live)
        _write_forward_manifest(index_dir)
    if meta["has_blockmax"]:
        # rebuild the tf ceilings EXACT from the compacted postings
        # (append-era duplicate (t, blk) rows collapse, delete-era
        # stale-high ceilings tighten back to the truth)
        from ccog_spark.operators.text import _blk_of

        bs_live = os.path.join(index_dir, "blockstats")
        bs_stage = os.path.join(index_dir, "blockstats__stage")
        (
            spark.read.parquet(stage)
            .withColumn("blk", _blk_of(id_col))
            .groupBy("t", "blk")
            .agg(F.max("tf").alias("max_tf"))
            .withColumn("bkt", _bkt(int(meta["n_buckets"])))
            .write.mode("overwrite")
            .partitionBy("bkt")
            .parquet(bs_stage)
        )
        shutil.rmtree(bs_live)
        os.rename(bs_stage, bs_live)
    shutil.rmtree(live)
    os.rename(stage, live)
    _write_bucket_manifest(index_dir)
    ic.clear_tombstones(index_dir)
    _write_meta(
        spark, index_dir,
        {**meta, "generation": int(meta["generation"]) + 1},
    )
    ic.end_mutation(index_dir)
    return {
        "files_before": before,
        "files_after": n_files(live),
        "tombstones_applied": int(n_tomb),
    }


def query_bm25_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    prune: bool = True,
    min_postings: int | None = None,
    doc_filter: str | None = None,
    block_max: bool | str = True,
) -> DataFrame:
    """Top-``k`` docs per query FROM THE INDEX ONLY — the raw corpus is
    never re-read. ``queries``: (q_id, q_text). Bit-identical to
    ``bm25_topk`` on the indexed corpus (shared scoring core; the
    1-row stats frame is rebuilt from meta with the same BIGINT
    values, so every double op sees identical inputs).

    ``block_max`` (round 15, on by default — engages only when the
    index stores blockstats AND the max-score planner engages): skip
    whole id-range BLOCKS of an essential term's postings whose
    per-block tf ceiling cannot reach θ — the BlockMaxWAND candidate
    cut, LOSSLESS (bound proof in ``text._bm25_rank``), so results
    and the oracle are unchanged by construction. The blockstats read
    prunes by the same bkt partition filter as terms. Round 16 adds a
    COST GATE: ``True`` consults the ceilings only when Σ df over the
    planner's essential union clears
    ``text.BM25_BLOCKMAX_MIN_POSTINGS`` (below the crossover the
    bookkeeping loses wall-clock — SCALING.md round-15 table);
    ``"force"`` always engages (A/B probes, the hash-gated registry
    row, tamper tests); ``False`` pins the plain essential-terms
    plan. All three spellings return identical rows.

    Bucket pruning: the distinct query terms are collected (query-
    batch-sized, the ANN-index precedent) and their bkt values derived
    by the same xxhash64 expression in a local no-scan job — Python
    cannot replay Spark's xxhash64 — then pushed as isin partition
    filters into both the postings and terms scans.

    ``doc_filter`` (round 14): a SQL predicate over the index's
    ``meta_cols`` (e.g. ``"lang = 'en'"``) restricting CANDIDATES to
    the matching documents — LUCENE SEMANTICS: df/n_docs/avgdl stay
    index-wide (a filter narrows who can be returned, it does not
    re-weight terms; ``delete_from_text_index`` is the verb that
    adjusts statistics). The predicate pushes into the narrow
    ``docmeta`` parquet scan; the surviving ids semi-join postings
    and doclens BEFORE scoring AND before the max-score planner, so
    the θ probe sees only eligible docs and pruning stays lossless
    under the filter. Requires ``build_bm25_index(meta_cols=…)``."""
    from ccog_spark.operators.text import _bm25_rank

    # a torn append/delete (crash between the postings/doclens commit
    # and the terms/meta rewrite) would silently mis-score — refuse it
    ic.check_not_inflight(index_dir)
    meta = _read_meta(spark, index_dir)
    n_buckets = int(meta["n_buckets"])
    id_col = str(meta["id_col"])
    tomb = ic.read_tombstones(spark, index_dir, id_col)
    qterms = (
        queries.select(
            "q_id", F.explode(F.split(F.col("q_text"), " ")).alias("t")
        )
        .where(F.col("t") != "")
        .distinct()
    )
    tlist = [r["t"] for r in qterms.select("t").distinct().collect()]
    postings, bkt_pred, bkts = _pruned_postings(
        spark, index_dir, n_buckets, tlist
    )
    # pending deletions (round 14): tombstoned docs' postings and
    # doclens rows are still physically present until compact — the
    # anti-joins below, together with the already-decremented df/meta
    # stats, make the query bit-identical to a from-scratch build
    # over the surviving corpus (pinned in tests)
    postings = ic.anti_tombstones(
        postings.select(id_col, "t", "tf"), tomb, id_col
    )
    terms = _manifest_bucket_read(spark, index_dir, "terms", bkts)
    if terms is None:
        terms = spark.read.parquet(
            os.path.join(index_dir, "terms")
        ).where(bkt_pred)
    terms = terms.select("t", "df")
    doclens = ic.anti_tombstones(
        spark.read.parquet(os.path.join(index_dir, "doclens")), tomb, id_col
    )
    if doc_filter is not None:
        if not meta["meta_cols"]:
            raise ValueError(
                f"index at {index_dir!r} was built without meta_cols — "
                "filtered retrieval needs the docmeta table (rebuild "
                "with build_bm25_index(..., meta_cols=(...)))"
            )
        allowed = (
            spark.read.parquet(os.path.join(index_dir, "docmeta"))
            .where(F.expr(doc_filter))
            .select(id_col)
        )
        postings = postings.join(allowed, id_col, "left_semi")
        doclens = doclens.join(allowed, id_col, "left_semi")
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
    if block_max not in (True, False, "force"):
        raise ValueError(
            f"block_max must be True, False or 'force', got {block_max!r}"
        )
    blockstats = None
    if prune and block_max and bool(meta["has_blockmax"]):
        # same bkt partition pruning as the terms read; tombstoned
        # docs need no handling here (stale-high ceilings only loosen
        # the lossless bound — see build_bm25_index's docstring)
        blockstats = _manifest_bucket_read(
            spark, index_dir, "blockstats", bkts
        )
        if blockstats is None:
            blockstats = spark.read.parquet(
                os.path.join(index_dir, "blockstats")
            ).where(bkt_pred)
        blockstats = blockstats.select("t", "blk", "max_tf")
    return _bm25_rank(
        spark, postings, doclens, terms, stats, qterms,
        k=k, k1=k1, b=b, id_col=id_col,
        prune=prune, min_postings=min_postings,
        blockstats=blockstats, block_max=block_max,
    )


def phrase_match_index(
    spark: SparkSession,
    index_dir: str,
    phrases: DataFrame,
    doc_filter: str | None = None,
) -> DataFrame:
    """Exact phrase search FROM THE POSITIONAL INDEX ONLY (round 14,
    VERDICT r13 #5): the corpus is never re-read — the phrase terms'
    posting buckets supply (doc, term, positions) and the SHARED
    adjacency core (text._phrase_core) does the rest, so results are
    BIT-IDENTICAL to ``text.phrase_match`` on the indexed corpus
    (pinned in tests; the registry row's oracle is the from-scratch
    adjacency SQL verbatim — one truth, two execution paths, the
    query_bm25_index contract).

    Requires ``build_bm25_index(positions=True)``; raises otherwise
    (scoring-only postings cannot answer adjacency). Bucket pruning
    and the In(t) row-group filter mirror the BM25 query path;
    pending tombstones are anti-joined — a deleted document can never
    match a phrase. ``doc_filter`` restricts matches to documents
    satisfying a predicate over the index's ``meta_cols`` (same
    contract as query_bm25_index's; phrase output carries no corpus
    statistics, so there is no semantics caveat here at all)."""
    from ccog_spark.operators.text import _phrase_core

    toks, id_col = _positional_toks(spark, index_dir, phrases, doc_filter)
    return _phrase_core(toks, phrases, id_col)


def _positional_toks(
    spark: SparkSession,
    index_dir: str,
    phrases: DataFrame,
    doc_filter: str | None = None,
) -> tuple[DataFrame, str]:
    """(id, pos, t) token stream for the given phrase batch FROM the
    positional postings only — the shared front half of
    ``phrase_match_index`` and ``proximity_match_index``: inflight
    check, has_positions gate, bucket pruning + In(t) row-group
    filter (the BM25 query path's recipe), tombstone anti-join,
    positions exploded back to one row per occurrence."""
    ic.check_not_inflight(index_dir)
    meta = _read_meta(spark, index_dir)
    if not bool(meta["has_positions"]):
        raise ValueError(
            f"index at {index_dir!r} was built without positions=True — "
            "phrase queries need the positional postings layout "
            "(rebuild with build_bm25_index(..., positions=True))"
        )
    n_buckets = int(meta["n_buckets"])
    id_col = str(meta["id_col"])

    pterms = (
        phrases.select(
            "q_id", F.explode(F.split(F.col("phrase"), " ")).alias("t")
        )
        .where(F.col("t") != "")
        .distinct()
    )
    tlist = [r["t"] for r in pterms.select("t").distinct().collect()]
    postings, bkt_pred, bkts = _pruned_postings(
        spark, index_dir, n_buckets, tlist
    )
    postings = ic.anti_tombstones(
        postings.select(id_col, "t", "pos"),
        ic.read_tombstones(spark, index_dir, id_col),
        id_col,
    )
    if doc_filter is not None:
        if not meta["meta_cols"]:
            raise ValueError(
                f"index at {index_dir!r} was built without meta_cols — "
                "filtered retrieval needs the docmeta table (rebuild "
                "with build_bm25_index(..., meta_cols=(...)))"
            )
        allowed = (
            spark.read.parquet(os.path.join(index_dir, "docmeta"))
            .where(F.expr(doc_filter))
            .select(id_col)
        )
        postings = postings.join(allowed, id_col, "left_semi")
    toks = postings.select(
        id_col, "t", F.explode("pos").alias("pos")
    )
    return toks, id_col


def proximity_match_index(
    spark: SparkSession,
    index_dir: str,
    phrases: DataFrame,
    max_span: int,
    doc_filter: str | None = None,
) -> DataFrame:
    """Unordered proximity search FROM THE POSITIONAL INDEX ONLY
    (round 14): the corpus is never re-read — the query terms'
    posting buckets supply per-occurrence positions and the SHARED
    core (text._proximity_core) does the rest, so results are
    BIT-IDENTICAL to ``text.proximity_match`` on the indexed corpus
    (pinned in tests). Same positional-layout requirement, bucket
    pruning, tombstone handling, and ``doc_filter`` contract as
    ``phrase_match_index``."""
    from ccog_spark.operators.text import _proximity_core

    toks, id_col = _positional_toks(spark, index_dir, phrases, doc_filter)
    return _proximity_core(toks, phrases, id_col, max_span)


def snippet_match_index(
    spark: SparkSession,
    index_dir: str,
    phrases: DataFrame,
    docs: DataFrame,
    window: int = 3,
    text_col: str = "text",
    doc_filter: str | None = None,
) -> DataFrame:
    """Snippet extraction with the MATCHING driven by the positional
    index (round 15 — completes the inline↔index twin set: phrase,
    proximity, BM25F, PRF, and now snippet): anchor discovery reads
    only the phrase terms' posting buckets (``_positional_toks`` —
    bucket pruning, In(t) row-group filter, tombstone anti-join,
    ``doc_filter`` contract all shared with ``phrase_match_index``),
    and ``docs`` is read ONLY for the text slice of MATCHING
    documents via the broadcast candidate join — the
    ``query_ivfpq_index(rerank_corpus=…)`` shape: the index answers
    WHERE, the source supplies the payload rows it names.

    Shares ``text._snippet_core`` (MIN-anchor + raw-split slice) with
    the inline ``snippet_match`` ⇒ BIT-IDENTICAL results on the
    indexed corpus (pinned in tests; the registry row's oracle is
    pipeline_snippet's SQL verbatim — one truth, two paths).
    ``docs`` must be the corpus the index was built over (same id
    column and text) — tombstoned documents cannot match (their
    postings are anti-joined), so a deleted document never yields a
    snippet even though its text row is still present in ``docs``."""
    from ccog_spark.operators.text import _snippet_core

    toks, id_col = _positional_toks(spark, index_dir, phrases, doc_filter)
    return _snippet_core(toks, phrases, docs, id_col, text_col, window)


def verify_text_index(spark: SparkSession, index_dir: str) -> dict:
    """Integrity audit (round 14 — the ops complement to the
    ``_inflight`` torn-mutation marker): recompute every derived
    statistic from the PHYSICAL tables and compare against what the
    terms table and meta row claim, accounting for pending
    tombstones. Catches the silent-wrong-scores states a crash plus a
    marker deletion (the documented repair footgun) could leave:
    stale df, stale n_docs/sum_dl/avgdl, doclens/postings drift, a
    positional layout that lost its column.

    Returns {"ok": bool, "errors": [str, ...], "checked": {...}} —
    never raises on inconsistency (callers decide; rebuild is the
    repair). One pass over postings + doclens; vocabulary-sized
    comparisons stay distributed (an anti-join count, nothing
    collected)."""
    errors: list[str] = []
    meta = _read_meta(spark, index_dir)
    id_col = str(meta["id_col"])
    if ic.inflight_op(index_dir) is not None:
        errors.append("inflight marker present (torn mutation)")
    tomb = ic.read_tombstones(spark, index_dir, id_col)

    postings = ic.anti_tombstones(
        spark.read.parquet(os.path.join(index_dir, "postings")), tomb, id_col
    )
    doclens = ic.anti_tombstones(
        spark.read.parquet(os.path.join(index_dir, "doclens")), tomb, id_col
    )
    if bool(meta["has_positions"]) and "pos" not in postings.columns:
        errors.append("meta.has_positions but postings lack a pos column")

    # df drift: recompute per-term df from live postings, anti-join
    # against the terms table in BOTH directions
    true_df = postings.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    claimed = spark.read.parquet(os.path.join(index_dir, "terms")).select(
        "t", "df"
    )
    n_mismatch = (
        true_df.join(claimed, "t", "full_outer")
        .where(
            F.coalesce(true_df["df"], F.lit(-1))
            != F.coalesce(claimed["df"], F.lit(-2))
        )
        .count()
    )
    if n_mismatch:
        errors.append(f"terms.df drift on {n_mismatch} terms")

    stats = doclens.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).first()
    if int(stats["n"]) != int(meta["n_docs"]):
        errors.append(
            f"meta.n_docs {meta['n_docs']} != live doclens {stats['n']}"
        )
    live_sum = int(stats["s"]) if stats["s"] is not None else 0
    if live_sum != int(meta["sum_dl"]):
        errors.append(f"meta.sum_dl {meta['sum_dl']} != live {live_sum}")

    # doclens/postings id drift (either direction)
    p_ids = postings.select(id_col).distinct()
    d_ids = doclens.select(id_col).distinct()
    only_p = p_ids.join(d_ids, id_col, "left_anti").count()
    only_d = d_ids.join(p_ids, id_col, "left_anti").count()
    if only_p or only_d:
        errors.append(
            f"id drift: {only_p} ids only in postings, {only_d} only in doclens"
        )

    # forward-table drift (round 15): the doc-clustered twin must
    # hold exactly the postings' (id, t, tf) rows
    if bool(meta["has_forward"]):
        fw_dir = os.path.join(index_dir, "forward")
        if not os.path.isdir(fw_dir):
            errors.append("meta.has_forward but forward/ is missing")
        else:
            fwd = ic.anti_tombstones(
                spark.read.parquet(fw_dir).select(id_col, "t", "tf"),
                tomb, id_col,
            )
            post3 = postings.select(id_col, "t", "tf")
            n_fw_drift = (
                post3.exceptAll(fwd).count() + fwd.exceptAll(post3).count()
            )
            if n_fw_drift:
                errors.append(
                    f"forward-table drift on {n_fw_drift} rows"
                )
            # manifest audit (round 16): the stored file list must
            # match the live directory exactly — a stale manifest
            # would silently drop appended rows from pruned reads.
            # Absent manifest = pre-r16 index (reads fall back to
            # partition discovery), not an error.
            man = _read_forward_manifest(index_dir)
            if man is not None:
                live_files = set()
                for d in os.listdir(fw_dir):
                    if d.startswith("dbkt="):
                        live_files.update(
                            f"{d}/{f}"
                            for f in os.listdir(os.path.join(fw_dir, d))
                            if f.endswith(".parquet")
                        )
                man_files = {rel for v in man.values() for rel in v}
                if man_files != live_files:
                    errors.append(
                        "forward manifest drift: "
                        f"{len(man_files - live_files)} stale, "
                        f"{len(live_files - man_files)} unlisted files"
                    )

    # bucket-manifest audit (round 16): the stored file lists must
    # match the live directories exactly for every bkt-partitioned
    # table — a stale manifest would silently drop postings (wrong
    # answers, not just slow ones). Absent manifest = pre-r16 index
    # (reads fall back to partition discovery), not an error.
    bman = _read_bucket_manifest(index_dir)
    if bman is not None:
        for table in _BKT_TABLES:
            tdir = os.path.join(index_dir, table)
            if not os.path.isdir(tdir):
                continue
            live_files = set()
            for d in os.listdir(tdir):
                if d.startswith("bkt="):
                    live_files.update(
                        f"{d}/{f}"
                        for f in os.listdir(os.path.join(tdir, d))
                        if f.endswith(".parquet")
                    )
            man_files = {
                rel for v in bman.get(table, {}).values() for rel in v
            }
            if man_files != live_files:
                errors.append(
                    f"bucket manifest drift on {table}: "
                    f"{len(man_files - live_files)} stale, "
                    f"{len(live_files - man_files)} unlisted files"
                )

    # block-max ceiling audit (round 15): a stored ceiling may be
    # stale-HIGH (deletes leave it; the bound only loosens) but a
    # ceiling BELOW the live max, or a live (t, blk) with no stored
    # row at all, would silently break losslessness — flag those.
    if bool(meta["has_blockmax"]):
        bs_dir = os.path.join(index_dir, "blockstats")
        if not os.path.isdir(bs_dir):
            errors.append("meta.has_blockmax but blockstats/ is missing")
        else:
            from ccog_spark.operators.text import _blk_of

            stored = (
                spark.read.parquet(bs_dir)
                .groupBy("t", "blk")
                .agg(F.max("max_tf").alias("ceil_tf"))
            )
            live_max = (
                postings.withColumn("blk", _blk_of(id_col))
                .groupBy("t", "blk")
                .agg(F.max("tf").alias("live_tf"))
            )
            n_low = (
                live_max.join(stored, ["t", "blk"], "left_outer")
                .where(
                    F.col("ceil_tf").isNull()
                    | (F.col("ceil_tf") < F.col("live_tf"))
                )
                .count()
            )
            if n_low:
                errors.append(
                    f"blockstats ceiling BELOW live max on {n_low} "
                    "(term, block) pairs — block-max pruning would be "
                    "lossy; rebuild or compact"
                )

    return {
        "ok": not errors,
        "errors": errors,
        "checked": {
            "n_docs": int(stats["n"]),
            "sum_dl": live_sum,
            "terms_compared": True,
            "generation": int(meta["generation"]),
        },
    }


# ------------------------------------------------------------- BM25F


_BM25F_META_SCHEMA = (
    "n_docs bigint, n_buckets int, n_terms bigint, id_col string, "
    "fields string, sum_dls string, generation bigint, "
    "last_epoch string"
)
_BM25F_META_KEYS = (
    "n_docs", "n_buckets", "n_terms", "id_col", "fields", "sum_dls",
    "generation", "last_epoch",
)


def build_bm25f_index(
    docs: DataFrame,
    index_dir: str,
    field_cols: tuple[str, ...],
    n_buckets: int | None = None,
    id_col: str = "doc_id",
    epoch_tag: str | None = None,
) -> dict:
    """Persisted MULTI-FIELD index (round 15, VERDICT r14 #4 — the
    index-resident twin of ``text.bm25f_topk``, completing the index
    stack's parity with the inline surface): per-field tf columns
    share the single-field index's bucket layout, so structured-
    document ranking stops re-reading the corpus on every query
    batch. Tables under ``index_dir``:

        postings/  (id, t, tf_0..tf_{F-1})  bkt-partitioned, sorted
                   (t, id) — tf_i = term frequency in field i (0 when
                   the doc's field i lacks the term); ONE row per
                   (doc, term) across all fields, so the postings
                   volume is the DISTINCT (doc, term) count, not the
                   per-field sum
        doclens/   (id, dl_0..dl_{F-1})     per-field lengths
        terms/     (t, df) bkt-partitioned — df counts docs
                   containing t in ANY field (the BM25F idf rule)
        meta/      n_docs + per-field sum_dl (avgdl_i = sum_dl_i /
                   n_docs, over ALL docs — empty fields contribute 0,
                   exactly the inline operator's frame algebra)

    Field WEIGHTS are deliberately NOT baked in: the index stores raw
    per-field tf/dl, and ``query_bm25f_index`` applies (weights, k1,
    b) at query time — retuning never rebuilds.

    Scale shape: one union-of-fields tokenize pass (map-side), ONE
    (id, t) shuffle for the wide tf aggregate (conditional sums, no
    pivot), the same bucket-clustered write as the single-field
    build. Query-side bucket/row-group pruning is shared code
    (``_pruned_postings``)."""
    if not field_cols:
        raise ValueError("field_cols must name at least one field")
    spark = docs.sparkSession
    # one column-pruned count serves both the bucket schedule and the
    # meta n_docs row (the inline operator's ALL-docs rule)
    n_docs = docs.count()
    if n_buckets is None:
        n_buckets = adaptive_n_buckets(n_docs)
    nf = len(field_cols)

    toks_f = None
    for fi, col in enumerate(field_cols):
        part = (
            docs.select(
                F.col(id_col),
                F.explode(F.split(F.col(col), " ")).alias("t"),
                F.lit(fi).alias("fi"),
            )
            .where(F.col("t") != "")
        )
        toks_f = part if toks_f is None else toks_f.unionByName(part)

    tf_wide = toks_f.groupBy(id_col, "t").agg(
        *[
            F.sum(F.when(F.col("fi") == i, 1).otherwise(0))
            .cast("bigint")
            .alias(f"tf_{i}")
            for i in range(nf)
        ]
    )
    tf_wide = tf_wide.persist()
    try:
        tf_wide.withColumn("bkt", _bkt(n_buckets)).repartition(
            "bkt"
        ).sortWithinPartitions("t", id_col).write.mode(
            "overwrite"
        ).partitionBy("bkt").parquet(os.path.join(index_dir, "postings"))
        # df over ANY field = one row per (id, t) in the wide frame
        tf_wide.groupBy("t").agg(
            F.count(F.lit(1)).alias("df")
        ).withColumn("bkt", _bkt(n_buckets)).write.mode(
            "overwrite"
        ).partitionBy("bkt").parquet(os.path.join(index_dir, "terms"))
        tf_wide.groupBy(id_col).agg(
            *[
                F.sum(f"tf_{i}").cast("bigint").alias(f"dl_{i}")
                for i in range(nf)
            ]
        ).write.mode("overwrite").parquet(
            os.path.join(index_dir, "doclens")
        )
    finally:
        tf_wide.unpersist()
    _write_bucket_manifest(index_dir)

    # per-field sum_dl from the WRITTEN doclens (no further tokenize
    # pass); n_docs counts ALL docs — the inline operator's
    # docs.agg(count(*)) rule, NOT the doclens row count (all-empty
    # docs still dilute every field's avgdl)
    sums = (
        spark.read.parquet(os.path.join(index_dir, "doclens"))
        .agg(*[F.sum(f"dl_{i}").alias(f"s_{i}") for i in range(nf)])
        .first()
    )
    n_terms = spark.read.parquet(os.path.join(index_dir, "terms")).count()
    meta = {
        "n_docs": int(n_docs),
        "n_buckets": n_buckets,
        "n_terms": int(n_terms),
        "id_col": id_col,
        "fields": ",".join(field_cols),
        "sum_dls": ",".join(
            str(int(sums[f"s_{i}"]) if sums[f"s_{i}"] is not None else 0)
            for i in range(nf)
        ),
        "generation": 1,
        "last_epoch": epoch_tag or "",
    }
    spark.createDataFrame(
        [tuple(meta[k] for k in _BM25F_META_KEYS)], _BM25F_META_SCHEMA
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "meta"))
    return meta


def delete_from_bm25f_index(
    spark: SparkSession, index_dir: str, doc_ids: DataFrame
) -> dict:
    """Remove documents from the per-field index (round 15 —
    completing the BM25F lifecycle to the single-field family's
    surface). LOGICAL-first like every delete here: ids land in
    ``tombstones/``, queries anti-join, compact applies physically.
    The statistics cannot be deferred: any-field df is decremented
    (staged terms rewrite, df = 0 dropped) and meta's n_docs AND
    per-field sum_dls shrink — after this verb, query results are
    BIT-IDENTICAL to a from-scratch build over the survivors (pinned
    in tests for two weightings). The deleted docs' term sets come
    from the wide postings rows (one row per (doc, term) already —
    no distinct needed); per-field dl contributions come from the
    doclens rows in hand. Idempotent. Returns {"deleted": n, ...}."""
    meta_row = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    meta = meta_row.asDict()
    fields = str(meta["fields"]).split(",")
    sum_dls = [int(s) for s in str(meta["sum_dls"]).split(",")]
    n_buckets = int(meta["n_buckets"])
    id_col = str(meta["id_col"])
    nf = len(fields)
    ic.begin_mutation(index_dir, "delete", int(meta["generation"]) + 1)
    ids = doc_ids.toDF(id_col).distinct()
    doclens = spark.read.parquet(os.path.join(index_dir, "doclens"))
    tomb = ic.read_tombstones(spark, index_dir, id_col)
    live_del = doclens.join(F.broadcast(ids), id_col, "left_semi")
    live_del = ic.anti_tombstones(live_del, tomb, id_col)
    live_del = live_del.persist()
    try:
        agg = live_del.agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(f"dl_{i}").alias(f"s_{i}") for i in range(nf)],
        ).first()
        n_del = int(agg["n"])
        if n_del == 0:
            ic.end_mutation(index_dir)  # nothing was touched
            return {"deleted": 0, "generation": int(meta["generation"])}
        del_ids = live_del.select(id_col)
        df_del = (
            spark.read.parquet(os.path.join(index_dir, "postings"))
            .join(F.broadcast(del_ids), id_col, "left_semi")
            .groupBy("t")
            .agg(F.count(F.lit(1)).alias("df_del"))
        )
        old_terms = spark.read.parquet(
            os.path.join(index_dir, "terms")
        ).select("t", "df")
        merged = (
            old_terms.join(df_del, "t", "left")
            .select(
                "t",
                (
                    F.col("df") - F.coalesce(F.col("df_del"), F.lit(0))
                ).alias("df"),
            )
            .where(F.col("df") > 0)
            .withColumn("bkt", _bkt(n_buckets))
        )
        stage = os.path.join(index_dir, "terms__stage")
        merged.write.mode("overwrite").partitionBy("bkt").parquet(stage)
        ic.append_tombstones(del_ids, index_dir)
    finally:
        live_del.unpersist()
    import shutil

    live = os.path.join(index_dir, "terms")
    shutil.rmtree(live)
    os.rename(stage, live)
    _write_bucket_manifest(index_dir)

    n_terms = spark.read.parquet(live).count()
    new_meta = {
        "n_docs": int(meta["n_docs"]) - n_del,
        "n_buckets": n_buckets,
        "n_terms": int(n_terms),
        "id_col": id_col,
        "fields": meta["fields"],
        "sum_dls": ",".join(
            str(
                sum_dls[i]
                - int(agg[f"s_{i}"] if agg[f"s_{i}"] is not None else 0)
            )
            for i in range(nf)
        ),
        "generation": int(meta["generation"]) + 1,
        "last_epoch": meta.get("last_epoch") or "",
    }
    spark.createDataFrame(
        [tuple(new_meta[k] for k in _BM25F_META_KEYS)], _BM25F_META_SCHEMA
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "meta"))
    ic.end_mutation(index_dir)
    return {**new_meta, "deleted": n_del}


def compact_bm25f_index(spark: SparkSession, index_dir: str) -> dict:
    """Maintenance verb for the per-field index (round 15): rewrite
    the wide postings clustered and (t, id)-sorted again, APPLYING
    pending tombstones physically to postings and doclens, clear the
    tombstone set. Query answers unchanged by construction (deletes
    were already logical; pinned in tests). Returns
    {"files_before": n, "files_after": m, "tombstones_applied": t}."""
    import glob
    import shutil

    meta_row = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    meta = meta_row.asDict()
    id_col = str(meta["id_col"])
    live = os.path.join(index_dir, "postings")

    def n_files(root: str) -> int:
        return len(glob.glob(os.path.join(root, "bkt=*", "*.parquet")))

    before = n_files(live)
    tomb = ic.read_tombstones(spark, index_dir, id_col)
    n_tomb = tomb.count() if tomb is not None else 0
    ic.begin_mutation(index_dir, "compact", int(meta["generation"]) + 1)
    stage = os.path.join(index_dir, "postings__stage")
    (
        ic.anti_tombstones(spark.read.parquet(live), tomb, id_col)
        .repartition("bkt")
        .sortWithinPartitions("t", id_col)
        .write.mode("overwrite")
        .partitionBy("bkt")
        .parquet(stage)
    )
    if tomb is not None:
        dl_live = os.path.join(index_dir, "doclens")
        dl_stage = os.path.join(index_dir, "doclens__stage")
        ic.anti_tombstones(
            spark.read.parquet(dl_live), tomb, id_col
        ).write.mode("overwrite").parquet(dl_stage)
        shutil.rmtree(dl_live)
        os.rename(dl_stage, dl_live)
    shutil.rmtree(live)
    os.rename(stage, live)
    _write_bucket_manifest(index_dir)
    ic.clear_tombstones(index_dir)
    new_meta = {
        **{k: meta.get(k) for k in _BM25F_META_KEYS},
        "generation": int(meta["generation"]) + 1,
        "last_epoch": meta.get("last_epoch") or "",
    }
    spark.createDataFrame(
        [tuple(new_meta[k] for k in _BM25F_META_KEYS)], _BM25F_META_SCHEMA
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "meta"))
    ic.end_mutation(index_dir)
    return {
        "files_before": before,
        "files_after": n_files(live),
        "tombstones_applied": int(n_tomb),
    }


def query_bm25f_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    weights: tuple[float, ...],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Multi-field ranking FROM THE INDEX ONLY (round 15): the fields
    are never re-read — candidate (doc, term) rows come from the
    pruned posting buckets, per-field evidence combines through the
    SHARED ``bm25f_field_contrib`` expression and the SHARED
    ``_bm25f_rank`` scoring tail, so results are BIT-IDENTICAL to
    ``text.bm25f_topk`` on the indexed fields (pinned in tests; the
    registry row's oracle is the inline operator's SQL verbatim — one
    truth, two execution paths, the query_bm25_index contract).

    (weights, k1, b) are query-time parameters over the stored raw
    tf/dl — see build_bm25f_index."""
    from ccog_spark.operators.text import _bm25f_rank, bm25f_field_contrib

    ic.check_not_inflight(index_dir)
    row = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    meta = row.asDict()
    fields = str(meta["fields"]).split(",")
    sum_dls = [int(s) for s in str(meta["sum_dls"]).split(",")]
    nf = len(fields)
    if len(weights) != nf:
        raise ValueError(
            f"index stores {nf} fields ({meta['fields']}) but "
            f"{len(weights)} weights were given"
        )
    n_buckets = int(meta["n_buckets"])
    id_col = str(meta["id_col"])
    n_docs = int(meta["n_docs"])

    qterms = (
        queries.select(
            "q_id", F.explode(F.split(F.col("q_text"), " ")).alias("t")
        )
        .where(F.col("t") != "")
        .distinct()
    )
    tlist = [r["t"] for r in qterms.select("t").distinct().collect()]
    postings, bkt_pred, bkts = _pruned_postings(
        spark, index_dir, n_buckets, tlist
    )
    # pending deletions (round 15): tombstoned docs' rows stay
    # physical until compact — anti-joins + the already-decremented
    # df/n_docs/sum_dls make the query bit-identical to a
    # from-scratch build over the survivors (pinned in tests)
    tomb = ic.read_tombstones(spark, index_dir, id_col)
    postings = ic.anti_tombstones(postings, tomb, id_col)
    doclens = ic.anti_tombstones(
        spark.read.parquet(os.path.join(index_dir, "doclens")), tomb, id_col
    )
    # candidate rows only reach the doclens join (query-term docs)
    cand = postings.select(
        id_col, "t", *[f"tf_{i}" for i in range(nf)]
    ).join(doclens, id_col)
    # per-field quantized contributions, summed exactly as the inline
    # operator's integer field combination (shared expression truth)
    qsum = None
    for i, w in enumerate(weights):
        avgdl_i = F.lit(float(sum_dls[i])) / F.lit(float(n_docs))
        c = bm25f_field_contrib(
            F.col(f"tf_{i}"), F.col(f"dl_{i}"), avgdl_i, w, b
        )
        qsum = c if qsum is None else qsum + c
    combined = cand.select(id_col, "t", qsum.alias("qsum"))

    dfs = _manifest_bucket_read(spark, index_dir, "terms", bkts)
    if dfs is None:
        dfs = spark.read.parquet(
            os.path.join(index_dir, "terms")
        ).where(bkt_pred)
    dfs = dfs.select("t", "df")
    n_docs_frame = spark.createDataFrame([(n_docs,)], "n_docs bigint")
    return _bm25f_rank(combined, dfs, qterms, n_docs_frame, k, k1, id_col)


def append_to_bm25f_index(
    fielded_delta: DataFrame, index_dir: str, epoch_tag: str | None = None
) -> dict:
    """Grow the per-field index with a corpus delta (round 15 — the
    lifecycle verb every persisted index here carries;
    append_to_text_index's contract, field-wide): wide postings and
    per-field doclens rows APPEND under the same bucket function; the
    vocabulary-sized terms table is df-MERGED and staged-swapped; meta
    accumulates n_docs and the per-field sum_dls. Queries after
    append are identical to a from-scratch build over the union
    corpus (pinned in tests). Delta ids must be NEW (the standard
    append caveat). The ``_inflight`` marker brackets the whole
    mutation; ``epoch_tag`` records a streaming epoch transactionally
    with the meta rewrite (the round-15 protocol)."""
    spark = fielded_delta.sparkSession
    row = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    meta = row.asDict()
    fields = str(meta["fields"]).split(",")
    sum_dls = [int(s) for s in str(meta["sum_dls"]).split(",")]
    n_buckets = int(meta["n_buckets"])
    id_col = str(meta["id_col"])
    nf = len(fields)
    ic.begin_mutation(index_dir, "append", int(meta["generation"]) + 1)

    n_delta = fielded_delta.count()
    toks_f = None
    for fi, col in enumerate(fields):
        part = (
            fielded_delta.select(
                F.col(id_col),
                F.explode(F.split(F.col(col), " ")).alias("t"),
                F.lit(fi).alias("fi"),
            )
            .where(F.col("t") != "")
        )
        toks_f = part if toks_f is None else toks_f.unionByName(part)
    tf_wide = toks_f.groupBy(id_col, "t").agg(
        *[
            F.sum(F.when(F.col("fi") == i, 1).otherwise(0))
            .cast("bigint")
            .alias(f"tf_{i}")
            for i in range(nf)
        ]
    )
    tf_wide = tf_wide.persist()
    try:
        tf_wide.withColumn("bkt", _bkt(n_buckets)).repartition(
            "bkt"
        ).sortWithinPartitions("t", id_col).write.mode(
            "append"
        ).partitionBy("bkt").parquet(os.path.join(index_dir, "postings"))
        delta_doclens = tf_wide.groupBy(id_col).agg(
            *[
                F.sum(f"tf_{i}").cast("bigint").alias(f"dl_{i}")
                for i in range(nf)
            ]
        )
        delta_doclens.write.mode("append").parquet(
            os.path.join(index_dir, "doclens")
        )
        delta_sums = delta_doclens.agg(
            *[F.sum(f"dl_{i}").alias(f"s_{i}") for i in range(nf)]
        ).first()
        # terms df merge: old ⊕ delta per term, staged swap (Spark
        # cannot overwrite a path it lazily reads)
        old_terms = spark.read.parquet(
            os.path.join(index_dir, "terms")
        ).select("t", "df")
        delta_df = tf_wide.groupBy("t").agg(
            F.count(F.lit(1)).alias("df_new")
        )
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
        tf_wide.unpersist()
    import shutil

    live = os.path.join(index_dir, "terms")
    shutil.rmtree(live)
    os.rename(stage, live)
    _write_bucket_manifest(index_dir)

    n_terms = spark.read.parquet(live).count()
    new_sums = [
        sum_dls[i]
        + int(delta_sums[f"s_{i}"] if delta_sums[f"s_{i}"] is not None else 0)
        for i in range(nf)
    ]
    new_terms = int(n_terms) - int(meta["n_terms"])
    new_meta = {
        "n_docs": int(meta["n_docs"]) + int(n_delta),
        "n_buckets": n_buckets,
        "n_terms": int(n_terms),
        "id_col": id_col,
        "fields": meta["fields"],
        "sum_dls": ",".join(str(s) for s in new_sums),
        "generation": int(meta["generation"]) + 1,
        "last_epoch": epoch_tag if epoch_tag is not None
        else (meta.get("last_epoch") or ""),
    }
    spark.createDataFrame(
        [tuple(new_meta[k] for k in _BM25F_META_KEYS)], _BM25F_META_SCHEMA
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "meta"))
    ic.end_mutation(index_dir)
    return {
        **new_meta,
        "appended": int(n_delta),
        "new_terms": new_terms,
        "vocab_growth": (
            new_terms / int(meta["n_terms"]) if int(meta["n_terms"]) else 0.0
        ),
    }


def query_bm25_prf_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    k_fb: int = 10,
    e_terms: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """PRF query expansion FROM THE INDEX ONLY (round 15, VERDICT r14
    #5): ``text.bm25_prf_topk`` re-tokenizes the corpus for its
    feedback counts and again for pass 2 — three corpus passes per
    query batch. From the persisted index, NO pass touches the raw
    text:

    - pass 1 is ``query_bm25_index`` (pruned posting-bucket reads);
    - the feedback-term counts come from the WINNERS' stored rows
      (Σ tf over the feedback docs ≡ the inline token count, by the
      definition of tf). With ``build_bm25_index(forward=True)`` this
      reads only the winners' doc-bucket directories of the forward
      table (round 15 — Lucene's term-vectors idea); without it, the
      term-bucketed postings force one full-postings-width scan of
      the narrow (id, t, tf) columns. Either way the winner side
      broadcasts and nothing corpus-sized shuffles;
    - pass 2 is the SHARED ``text._bm25_rank`` core over the expanded
      term set's pruned buckets, exactly the query_bm25_index frames.

    Results are BIT-IDENTICAL to ``bm25_prf_topk`` on the indexed
    corpus (pinned in tests; the registry row's oracle is the inline
    operator's nested SQL verbatim — one truth, two execution paths).
    Expansion rule unchanged: top ``k_fb`` docs donate their
    ``e_terms`` most frequent non-query terms (occurrence counts,
    ties by term text); all expanded terms weighted equally; pruning
    off for pass 2 (the expanded batch is small)."""
    from pyspark.sql import Window as W

    from ccog_spark.operators.text import _bm25_rank

    ic.check_not_inflight(index_dir)
    meta = _read_meta(spark, index_dir)
    n_buckets = int(meta["n_buckets"])
    id_col = str(meta["id_col"])
    tomb = ic.read_tombstones(spark, index_dir, id_col)

    base = query_bm25_index(
        spark, index_dir, queries, k=k_fb, k1=k1, b=b, prune=False
    )
    orig = (
        queries.select(
            "q_id", F.explode(F.split(F.col("q_text"), " ")).alias("t")
        )
        .where(F.col("t") != "")
        .distinct()
    )
    # freeze the |Q|·k_fb winners driver-side (query-batch-sized —
    # the accepted collect class): pass 1 runs ONCE instead of being
    # recomputed lazily inside the feedback join, and the id list
    # drives forward-table pruning when available
    winner_frame = base.select("q_id", id_col)
    base_rows = winner_frame.collect()
    winners = spark.createDataFrame(base_rows, winner_frame.schema)
    # feedback counts from the winners' stored rows: Σ tf ≡ the
    # inline path's occurrence count over the same docs. With a
    # forward table (build_bm25_index(forward=True)) this reads the
    # winners' dbkt directories only; without it, the one
    # full-postings-width scan the term-bucketed layout forces
    if meta["has_forward"]:
        src = _pruned_forward(
            spark, index_dir, meta,
            sorted({r[1] for r in base_rows}),
        ).select(id_col, "t", "tf")
    else:
        src = spark.read.parquet(
            os.path.join(index_dir, "postings")
        ).select(id_col, "t", "tf")
    src = ic.anti_tombstones(src, tomb, id_col)
    fb_cnt = (
        F.broadcast(winners)
        .join(src, id_col)
        .groupBy("q_id", "t")
        .agg(F.sum("tf").cast("bigint").alias("c"))
        .join(orig, ["q_id", "t"], "left_anti")
    )
    ew = W.partitionBy("q_id").orderBy(F.col("c").desc(), F.col("t"))
    expansion = (
        fb_cnt.select("q_id", "t", F.row_number().over(ew).alias("ern"))
        .where(F.col("ern") <= e_terms)
        .select("q_id", "t")
    )
    qterms = orig.unionByName(expansion).distinct()

    # pass-2 frames: the query_bm25_index read path over the EXPANDED
    # term set (expansion terms are data-dependent, so the bucket set
    # derives from a collect of the expanded batch — query-batch-sized,
    # the same driver-side cost every index query verb already pays)
    tlist = [r["t"] for r in qterms.select("t").distinct().collect()]
    postings, bkt_pred, bkts = _pruned_postings(
        spark, index_dir, n_buckets, tlist
    )
    postings = ic.anti_tombstones(
        postings.select(id_col, "t", "tf"), tomb, id_col
    )
    terms = _manifest_bucket_read(spark, index_dir, "terms", bkts)
    if terms is None:
        terms = spark.read.parquet(
            os.path.join(index_dir, "terms")
        ).where(bkt_pred)
    terms = terms.select("t", "df")
    doclens = ic.anti_tombstones(
        spark.read.parquet(os.path.join(index_dir, "doclens")), tomb, id_col
    )
    stats = spark.createDataFrame(
        [(int(meta["n_docs"]), int(meta["sum_dl"]))],
        "n_docs bigint, sum_dl bigint",
    )
    return _bm25_rank(
        spark, postings, doclens, terms, stats, qterms,
        k=k, k1=k1, b=b, id_col=id_col, prune=False, min_postings=None,
    )
