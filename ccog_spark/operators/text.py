"""Text-analysis operators (E37 + north-star text ops).

Everything is built from JVM-side array/string expressions (split,
filter, aggregate, transform) — per-row map-side work with no shuffle
and no Python, so cost scales linearly and partitions independently at
100 TB. Each operator has an exact DuckDB-SQL twin (see
queries/oracle_pipeline.py) so results are hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ccog_spark.functions.hashing import MOD, roll_hash

# Tiny public-knowledge stopword lexicons for the language-ID heuristic.
LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is"),
    "de": ("der", "die", "das", "und", "zu", "ist"),
    "es": ("el", "la", "de", "y", "que", "es"),
    "fr": ("le", "la", "de", "et", "les", "est"),
    "zh": ("de", "le", "shi", "zai", "he", "you"),
}
LANG_ORDER = ("en", "de", "es", "fr", "zh")  # deterministic tie preference

EN_STOPWORDS = ("the", "a", "of", "and", "to", "is", "in", "it", "on", "for")


def tokens(text: Column) -> Column:
    """Whitespace tokens (single-space-separated fixture text)."""
    return F.split(text, " ")


def lexicon_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """Occurrence count of lexicon words — JVM-side array filter."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_scores(toks: Column) -> dict[str, Column]:
    return {lang: lexicon_hits(toks, LEXICONS[lang]) for lang in LANG_ORDER}


def lang_id(toks: Column) -> Column:
    """Argmax lexicon score with deterministic tie order (LANG_ORDER)."""
    scores = lang_scores(toks)
    m = F.greatest(*scores.values())
    expr = None
    for lang in LANG_ORDER:
        cond = scores[lang] == m
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr


def subword_count(toks: Column) -> Column:
    """BPE-ish subword count: ceil(len/4) chunks per token."""
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0),
    )


def quality_components(text: Column, n_chars: Column) -> dict[str, Column]:
    """Length / diversity / stopword-presence quality heuristics
    (Gopher-style rules over the fixture's ASCII text)."""
    toks = tokens(text)
    n_tokens = F.size(toks).cast("bigint")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    stop_cnt = lexicon_hits(toks, EN_STOPWORDS).cast("bigint")
    distinct_ratio = n_distinct.cast("double") / n_tokens.cast("double")
    stop_ratio = stop_cnt.cast("double") / n_tokens.cast("double")
    len_score = F.least(n_chars.cast("double") / 400.0, F.lit(1.0))
    quality = F.round(
        0.4 * len_score
        + 0.4 * distinct_ratio
        + 0.2 * F.least(stop_ratio * 5.0, F.lit(1.0)),
        4,
    )
    return {
        "n_tokens": n_tokens,
        "n_distinct": n_distinct,
        "stop_cnt": stop_cnt,
        "distinct_ratio": F.round(distinct_ratio, 4),
        "quality": quality,
    }


def fingerprint(text: Column) -> Column:
    """Whole-document rolling-hash fingerprint."""
    return roll_hash(text)


def window_fingerprint(text: Column, width: int = 16, stride: int = 4) -> Column:
    """Winnowing-style minimum over rolling hashes of ``width``-char
    windows sampled every ``stride`` positions — robust to appended/
    prepended content, map-side only. The stride is the standard
    winnowing density/cost dial (4× cheaper than every position at
    stride 4; a near-dup still shares most sampled windows)."""
    n_windows = F.length(text) - (width - 1)
    return F.when(
        n_windows >= 1,
        F.array_min(
            F.transform(
                F.sequence(F.lit(1), n_windows, F.lit(stride)),
                lambda i: roll_hash(text.substr(i, F.lit(width))),
            )
        ),
    ).otherwise(roll_hash(text))


def analyze(documents: DataFrame) -> DataFrame:
    """Full text-analysis projection over the documents table."""
    toks = tokens(F.col("text"))
    comps = quality_components(F.col("text"), F.col("n_chars"))
    return documents.select(
        "doc_id",
        comps["n_tokens"].alias("n_tokens"),
        comps["n_distinct"].alias("n_distinct"),
        subword_count(toks).alias("n_subwords"),
        lang_id(toks).alias("lang_pred"),
        comps["distinct_ratio"].alias("distinct_ratio"),
        comps["quality"].alias("quality"),
        fingerprint(F.col("text")).alias("fp"),
    )


# Gopher-style repetition thresholds (Rae et al. 2021 use analogous
# duplicate-n-gram / top-n-gram fraction rules; exact cutoffs here are
# tuned to the fixture so the flag splits the corpus non-trivially).
REP_DUP_2GRAM_MAX = 0.05
REP_TOP_2GRAM_MAX = 0.18


def repetition_metrics(documents: DataFrame) -> DataFrame:
    """Intra-document repetition metrics (Gopher/C4-style quality
    rules): duplicate-token fraction, duplicate-2-gram fraction, and
    the token coverage of the single most frequent 2-gram, plus a
    combined `rep_flagged` removal flag.

    Scale shape: token hashes and 2-gram hashes are built map-side
    (JVM array expressions, no Python); the only shuffle is the
    per-(doc, gram) count → per-doc aggregate, both keyed by doc_id so
    a 100 TB corpus partitions by document with no global state. The
    modal-2-gram count deliberately goes through explode + two-level
    groupBy instead of a per-row O(distinct × grams) array fold —
    at ~1k-token web documents the fold would be ~1M comparisons per
    row, while the aggregate path is linear and whole-stage codegen.
    """
    d = (
        documents.select("doc_id", "text")
        .withColumn(
            "_hs", F.transform(F.split(F.col("text"), " "), lambda t: roll_hash(t))
        )
        .withColumn("n_tokens", F.size("_hs"))
        .withColumn("n_distinct", F.size(F.array_distinct("_hs")))
    )
    hs = F.col("_hs")
    # 2-gram hashes as a MULTISET (no distinct — counts matter here);
    # guard: F.sequence(1, 0) would produce a DESCENDING [1, 0] ramp,
    # so single-token docs get an explicit empty gram list.
    grams = F.when(
        F.col("n_tokens") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.col("n_tokens") - 1),
            lambda i: (F.element_at(hs, i) * 31 + F.element_at(hs, i + 1)) % MOD,
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    ex = d.select(
        "doc_id", "n_tokens", "n_distinct", F.explode_outer(grams).alias("h")
    )
    cnt = ex.groupBy("doc_id", "n_tokens", "n_distinct", "h").agg(
        F.count("h").alias("c")
    )
    agg = cnt.groupBy("doc_id", "n_tokens", "n_distinct").agg(
        F.sum("c").alias("n2"),
        F.count(F.col("h")).alias("d2"),
        F.max("c").alias("maxc"),
    )
    n_tok = F.col("n_tokens").cast("double")
    dup_tok = F.round(F.lit(1.0) - F.col("n_distinct") / n_tok, 4)
    dup_2g = F.when(
        F.col("n2") > 0,
        F.round(F.lit(1.0) - F.col("d2") / F.col("n2").cast("double"), 4),
    ).otherwise(F.lit(0.0))
    top_2g = F.when(
        F.col("n2") > 0, F.round(F.lit(2.0) * F.col("maxc") / n_tok, 4)
    ).otherwise(F.lit(0.0))
    return agg.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        dup_tok.alias("dup_tok_frac"),
        dup_2g.alias("dup_2gram_frac"),
        top_2g.alias("top_2gram_frac"),
        (
            (dup_2g > F.lit(REP_DUP_2GRAM_MAX))
            | (top_2g > F.lit(REP_TOP_2GRAM_MAX))
        ).alias("rep_flagged"),
    )


def redact_terms(
    df: DataFrame,
    pattern: str,
    repl: str = "<ENT>",
    text_col: str = "text",
) -> DataFrame:
    """Pattern redaction (the PII-scrub stage of a training pipeline,
    here over term patterns since the fixture text carries no real
    PII): replace every regex match with ``repl`` and count the
    replacements. Pure JVM expressions (regexp_replace/regexp_count)
    — map-side, pushdown-friendly, no Python. Patterns must stay in
    the Java∩RE2 common dialect (word boundaries, alternation, classes)
    so the DuckDB oracle computes identical matches."""
    return df.select(
        "doc_id",
        F.regexp_count(F.col(text_col), F.lit(pattern)).alias("n_redacted"),
        F.substring(
            F.regexp_replace(F.col(text_col), pattern, repl), 1, 80
        ).alias("sample"),
    )


def chunk_documents(
    documents: DataFrame, chunk: int = 64, stride: int = 48
) -> DataFrame:
    """Fixed-size token-window chunking with overlap — the pretraining/
    RAG document splitter. Chunk k covers tokens [1 + k*stride,
    1 + k*stride + chunk - 1] (1-based, tail chunks shorter); every
    token is covered because stride <= chunk.

    Plan: pure JVM built-ins — split → sequence of starts → posexplode
    → slice/concat_ws — a map-side row fan-out with NO shuffle and no
    Python. Output carries md5(chunk_text) instead of the text so
    downstream exact-dedup of chunks (dedup.exact_dedup) composes
    without reshuffling payload strings."""
    if not 1 <= stride <= chunk:
        raise ValueError(f"need 1 <= stride <= chunk, got {stride}/{chunk}")
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(F.lit(1), F.size(toks), F.lit(stride))
    return (
        documents.select(
            "doc_id",
            toks.alias("tk"),
            F.size(toks).alias("n"),
            F.posexplode(starts).alias("chunk_idx", "s"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.least(F.lit(chunk), F.col("n") - F.col("s") + 1)
            .cast("int")
            .alias("n_tok"),
            F.md5(
                F.concat_ws(" ", F.slice(F.col("tk"), F.col("s"), chunk))
            ).alias("h"),
        )
    )


def hashed_tfidf(
    docs: DataFrame,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashing-trick sparse TF-IDF featurization: (doc, bucket, tf,
    weight) rows — the LONG form of a ``n_buckets``-dim document
    vector, which is the representation that scales (a dense
    fixed-width array column carries n_buckets cells per doc; the
    sparse form carries only occupied buckets and feeds either a
    dense assembler or a similarity join directly).

    Plan: explode tokens (map-side), hash to buckets with the
    engine-portable rolling hash, one groupBy (doc, bucket) for TF,
    one bucket-level aggregate for DF (n_buckets rows — broadcast
    back). The IDF here is the RATIONAL variant (N+1)/(df+1) rather
    than ln((N+1)/(df+1))+1: identical ordering information, but pure
    rational double arithmetic replays bit-identically in any engine
    (ln's last-ulp differs across libm implementations, which would
    poison a hash-gated oracle); production consumers can post-map ln
    over the returned ratio. Weight quantization uses the half-up
    integer spelling (floor(x*1e4 + 0.5)) — the repo-wide rule for
    cross-engine float rounding.
    """
    # corpus size stays IN the plan (1-row aggregate, broadcast) —
    # an eager docs.count() here would run a full extra scan at
    # DataFrame-construction time and break laziness
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("t")
    ).where(F.col("t") != "")
    tf = (
        toks.withColumn("bucket", roll_hash(F.col("t")) % n_buckets)
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("tf"))
    )
    df_b = tf.groupBy("bucket").agg(F.count("*").alias("df"))
    raw = F.col("tf") * ((F.col("_n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
    w = F.floor(raw * 10000 + F.lit(0.5)).cast("bigint") / F.lit(10000.0)
    return (
        tf.join(F.broadcast(df_b), "bucket")
        .crossJoin(F.broadcast(n_docs))
        .select(id_col, "bucket", "tf", w.alias("w"))
    )


def tfidf_dense(
    docs: DataFrame,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    out: str = "vec",
) -> DataFrame:
    """Dense fixed-width TF-IDF document vectors: the long-form
    ``hashed_tfidf`` rows pivoted into an array<double> column via a
    bucket→weight map + sequence fill — all JVM expressions. This is
    the bridge from text to the E36 vector operators (brute-force /
    LSH / IVF / PQ ANN run unchanged over these vectors): semantic-ish
    retrieval with no external embedding model.

    One extra shuffle vs the long form (the per-doc groupBy); the
    dense array costs n_buckets cells per doc — keep n_buckets modest
    or stay long-form for very high dimensional spaces."""
    long = hashed_tfidf(docs, n_buckets, text_col, id_col)
    m = F.map_from_arrays(
        F.collect_list("bucket"), F.collect_list("w")
    )
    fill = F.transform(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        lambda b: F.coalesce(F.element_at(F.col("_m"), b.cast("bigint")), F.lit(0.0)),
    )
    # left join from the full doc-id set: a token-less document (empty
    # text) has no long-form rows but must still get a ZERO vector —
    # silently dropping it would break row alignment with the corpus
    agg = long.groupBy(id_col).agg(m.alias("_m"))
    return (
        docs.select(id_col)
        .distinct()
        .join(agg, id_col, "left")
        .select(id_col, fill.alias(out))
    )


# Max-score pruning knobs (bm25_topk(prune=True)). All gates are
# decided DRIVER-side from exact df counts before any plan is built,
# and both plans are lossless-identical, so flipping between them can
# never change results.
#
# MAX_CANDIDATES bounds the candidate DOC-ID broadcast (one long per
# id, Σ df over the UNION of essential terms is its exact upper
# bound): ~32 MB at the cap — the conventional broadcast ceiling.
# Above it the planner declines and the unpruned plan runs (a
# shuffle-side semi join would re-shuffle the very postings the cut
# is meant to keep out of the exchange).
BM25_PRUNE_MAX_CANDIDATES = 4_000_000  # Σ df(essential-term union) cap
BM25_PRUNE_MIN_SAVINGS = 0.5  # prune only if ≥ this postings fraction is cut
# Below this many total matching postings the unpruned single-action
# plan is already trivially cheap — the planner's extra jobs (stats,
# qstats collect, θ probe) cost more than they save. Measured
# crossover (retrieval_scale_probe high-df batch): at 5.1M postings
# the engaged planner LOSES 4.7 s; at 51M it WINS 23.6 s (2.6×) —
# the floor sits between, biased high because a wrongly-declined
# mid-size batch costs far less than a wrongly-engaged small one.
BM25_PRUNE_MIN_POSTINGS = 20_000_000

# Block-max postings pruning (round 15 — the index-path refinement of
# max-score, Lucene's BlockMaxWAND idea re-expressed for a batch
# engine): documents are grouped into fixed id-range blocks and the
# index stores per-(term, block) max tf; at query time whole blocks of
# an essential term's postings are skipped when even the block's BEST
# possible contribution plus the query's other terms' global bounds
# cannot reach θ. Purely a candidate-generation cut — scoring is
# untouched, so it is lossless by the same suffix argument (proof at
# _bm25_rank's kept-blocks join).
BM25_BLOCK = 1024  # docs per id-range block (id DIV 1024)

# Cost gate for ENGAGING the stored ceilings (round 16): the cut's
# bookkeeping is near-constant (one narrow blockstats read + a
# (t, blk) max-merge + the kept-blocks semi join) but pure overhead
# when the essential terms' candidate scan is already small — at
# fixture scale the engaged path LOSES ~2.5 s while the uncut scan is
# sub-second (SCALING.md round-15 block-max table, 9.75 s vs 7.18 s).
# Engage only when Σ df over the planner's ESSENTIAL-term union — the
# exact candidate-scan row count the cut would reduce, known
# driver-side from the terms table before any plan is built — clears
# this floor; below it the plain max-score plan runs (lossless either
# way, so the flip can never change results). block_max="force"
# bypasses the gate (A/B probes, the hash-gated engaged registry row,
# ceiling-tamper tests). Same unit/value as BM25_PRUNE_MIN_POSTINGS:
# essential Σdf ≤ batch Σdf, so this gate is strictly harder to clear
# than the planner's own floor and always declines at fixture scale.
BM25_BLOCKMAX_MIN_POSTINGS = 20_000_000

# Cost gate for _proximity_core's matching-token persist (round 18,
# VERDICT r17 #2 — same discipline as the bm25 prune/block-max gates
# above): the persist halves corpus tokenize passes (m feeds both
# join sides and no shared exchange exists under a broadcast join),
# but at fixture scale the cache build SERIALIZES the two sides —
# un-persisted they scan in parallel — and the driver's r17 bench
# measured the persist 1.15× slower calibration-normalized (3.96 s →
# 5.50 s raw; re-measured r18: min-of-3 9.35 s → see
# OPTIMIZATION_r18.md). Engage only when the token-side input is big
# enough that a second full scan costs more than a sequential cache
# build: the gate reads the optimizer's OWN size estimate for the
# token subtree (driver-side plan statistics — no job), so it is
# data-derived, not core-count-derived; at 100 TB any corpus scan
# clears it by orders of magnitude while sf0.1's ~600 KB documents
# stay far below. An RDD-backed input (createDataFrame) reports
# Long.MaxValue (unknown) and therefore conservatively persists — an
# un-provably-small corpus is treated as one whose second tokenize
# pass must be avoided (pinned in test_proximity_persist_cost_gate).
# Lossless either way — the persist is a recompute hint, never a
# correctness mechanism.
PROXIMITY_PERSIST_MIN_BYTES = 256 * 1024 * 1024


def _blk_of(id_col: str):
    """The ONE block function, shared by the index build
    (blockstats rows) and the query-side candidate join — drifting
    spellings would silently mis-prune."""
    return F.expr(f"CAST(`{id_col}` DIV {BM25_BLOCK} AS BIGINT)")


def _bm25_essential_terms(
    spark, score_frame, stats, qstats, k: int, k1: float,
    min_postings: int | None = None,
):
    """Driver-side max-score planning (Turtle & Flood 1995's max-score
    heuristic, made LOSSLESS for top-k): returns (sorted UNION of
    essential terms across queries, per-term block-max keep
    thresholds — see block_cuts below), or None when pruning can't
    pay for itself. Everything here is query-batch-sized: qstats (term,
    df per query term) and the 1-row corpus stats are collected; the
    only job touching postings is the θ probe over the single RAREST
    term per query.

    Bound: a term's quantized score is at most ub(t) =
    floor(idf(t)·(k1+1)·1e6 + 0.5) + 1 — tf·(k1+1)/(tf + k1·norm) <
    k1+1 for any tf, dl > 0, and the +1 quantization unit absorbs any
    double-rounding asymmetry between the driver's product and the
    plan's, keeping ub ≥ every realizable per-term score.

    θ (per query): the k-th highest SINGLE-term quantized score among
    the rarest term's postings — a valid lower bound on the k-th best
    FULL score (those k docs' full scores only add non-negative
    terms). Any document containing ONLY terms from a suffix of the
    ub-descending term list whose Σub < θ is strictly below ≥ k docs
    and can never reach top-k, tie-breaks included — so candidate
    generation may skip those terms' postings entirely.

    The returned candidate filter is DOC-level (union of essential
    terms, no q_id): every query's true top-k doc contains ≥ 1 of its
    OWN essential terms, hence ≥ 1 union term — and fully scoring
    EXTRA docs (candidates via another query's essential term) cannot
    perturb a top-k computed over correct full scores. Doc-level ids
    broadcast ~100× smaller than (q_id, doc) pairs and the semi join
    pushes BELOW the query-term join, so non-candidate postings never
    materialize past the scan."""
    import math

    # ONE planner job: query-batch-sized (q_id, t, df) rows with the
    # 1-row corpus stats cross-joined on — in the declined case this
    # is the planner's ONLY postings-touching action
    qrows = qstats.crossJoin(F.broadcast(stats)).collect()
    if not qrows or not qrows[0]["n_docs"]:
        return None
    n_docs = qrows[0]["n_docs"]
    per_q: dict = {}
    for r in qrows:
        idf_v = (n_docs - r["df"] + 0.5) / (r["df"] + 0.5)
        ub = math.floor(idf_v * (k1 + 1.0) * 1000000.0 + 0.5) + 1
        per_q.setdefault(r["q_id"], []).append((r["t"], int(r["df"]), ub))

    # Absolute floor: when the whole batch touches few postings the
    # unpruned single action is already cheap — the planner's extra
    # jobs would dominate. ``min_postings`` overrides the module
    # default (0 = always plan; used by the hash-gated engaged-path
    # registry row and the scale probes).
    floor = BM25_PRUNE_MIN_POSTINGS if min_postings is None else min_postings
    if sum(d for ts in per_q.values() for _, d, _ in ts) < floor:
        return None

    # Seed: rarest (max-ub) term per query — preferring terms with
    # df ≥ k, since a term with fewer than k postings cannot fill a
    # top-k on its own (its probe would yield no θ). Ties break by
    # term text for determinism (θ quality, not correctness, depends
    # on the choice).
    seeds = {}
    for q, ts in per_q.items():
        pool = [x for x in ts if x[1] >= k] or ts
        seeds[q] = max(pool, key=lambda x: (x[2], x[0]))

    # Optimistic pre-check BEFORE the θ probe job: θ is the k-th
    # highest single-term score of the seed, so θ ≤ ub(seed). If even
    # θ = ub(seed) couldn't cut MIN_SAVINGS of the postings, decline
    # now — the fixture-style uniform-df vocabulary exits here with
    # only the two query-batch-sized collects spent, no postings job.
    opt_total = opt_cut = 0
    for q, ts in per_q.items():
        ts.sort(key=lambda x: (-x[2], x[0]))  # ub desc
        opt_total += sum(d for _, d, _ in ts)
        theta_max = seeds[q][2]
        acc = 0
        cut = len(ts)
        while cut > 0 and acc + ts[cut - 1][2] < theta_max:
            acc += ts[cut - 1][2]
            cut -= 1
        opt_cut += sum(d for _, d, _ in ts[cut:])
    if opt_total == 0 or opt_cut / opt_total < BM25_PRUNE_MIN_SAVINGS:
        return None

    seed_pairs = [(q, s[0]) for q, s in seeds.items()]
    from pyspark.sql.types import StructField, StructType

    pair_schema = StructType(
        [qstats.schema["q_id"], qstats.schema["t"]]
    )
    seed_df = spark.createDataFrame(seed_pairs, pair_schema)
    seed_qstats = qstats.join(F.broadcast(seed_df), ["q_id", "t"], "left_semi")
    w = W.partitionBy("q_id").orderBy(F.col("tq").desc())
    thetas = {
        r["q_id"]: r["tq"]
        for r in score_frame(seed_qstats)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == k)
        .collect()
    }

    essential: dict[str, int] = {}  # term -> df (union across queries)
    # per essential term, the BLOCK-MAX keep threshold (round 15):
    # a block of term t's postings must be read iff its best possible
    # per-term score could, together with the OTHER terms of some
    # query where t is essential, still reach that query's θ —
    # i.e. iff ub_blk(t) ≥ min over those queries of (θ_q − rem_q(t)),
    # rem_q(t) = Σ ub over q's other terms. cut ≤ 0 means keep all.
    block_cuts: dict[str, int] = {}
    total_df = pruned_df = 0
    for q, ts in per_q.items():  # already ub-desc sorted above
        theta = thetas.get(q, 0)
        total_df += sum(d for _, d, _ in ts)
        # longest suffix with Σub < θ is non-essential (strict <:
        # a doc tying θ could still win the id tie-break)
        cut = len(ts)
        acc = 0
        while cut > 0 and acc + ts[cut - 1][2] < theta:
            acc += ts[cut - 1][2]
            cut -= 1
        ub_total = sum(u for _, _, u in ts)
        for t, d, u in ts[:cut]:
            essential[t] = d
            bc = theta - (ub_total - u)
            if t not in block_cuts or bc < block_cuts[t]:
                block_cuts[t] = bc
        pruned_df += sum(d for _, d, _ in ts[cut:])
    if sum(essential.values()) > BM25_PRUNE_MAX_CANDIDATES:
        return None  # candidate id set not safely broadcastable
    if total_df == 0 or pruned_df / total_df < BM25_PRUNE_MIN_SAVINGS:
        return None  # not worth the candidate pass
    return sorted(essential), {
        t: (essential[t], block_cuts[t]) for t in essential
    }


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    prune: bool = True,
    min_postings: int | None = None,
) -> DataFrame:
    """BM25 lexical retrieval (Robertson/Spärck Jones — the standard
    probabilistic ranking function): top-``k`` documents per query by

        Σ_{t ∈ q}  idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    ``queries``: (q_id, q_text); query terms are DISTINCT (repeated
    query words score once — documented simplification). The idf here
    is the RATIONAL spelling (N − df + 0.5)/(df + 0.5) rather than its
    ln — same precedent (and same reason) as hashed_tfidf's rational
    IDF: identical ordering per term with pure rational double
    arithmetic that replays bit-identically in any engine, where ln's
    last ulp differs across libm implementations and would poison a
    hash-gated oracle. Per-term scores are quantized half-up at 1e6
    and summed as BIGINTs (the repo-wide rule for order-sensitive
    float sums), so the returned ``score`` is an exact integer.

    Scale shape: one token explode + one (doc, term) TF aggregate over
    the corpus (persisted for the operator's lifetime — four subplans
    read it); DF is a term-level aggregate of the TF table
    (vocabulary-sized, Heaps-law ≪ corpus); N/avgdl stay IN the plan
    as a broadcast 1-row aggregate (no eager count). Scoring joins the
    query-term table (|Q|·terms rows — broadcast) into the TF table,
    so the shuffle carries matching (doc, term) rows only; k rows per
    query cross the final exchange. No content-keyed windows: the
    rank window partitions on q_id (query-batch-sized).

    ``prune=True`` (round 13, VERDICT r12 #2): LOSSLESS max-score
    candidate pruning. A corpus-scale-df query term (a stopword in
    the query) used to drag its entire posting list through the
    scoring shuffle; now the driver computes per-term score upper
    bounds and a per-query top-k lower bound θ (see
    _bm25_essential_terms), restricts candidate generation to the
    essential terms, and fully scores ONLY candidate documents — the
    high-df terms' postings are read but never shuffled except for
    candidate rows. Results are bit-identical (pruning only discards
    documents provably below the k-th score, ties included); when the
    planner finds no worthwhile cut it falls back to the unpruned
    plan, so `prune` never changes output."""
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("t")
    ).where(F.col("t") != "")
    # ONE corpus-shuffled aggregate: tf per (doc, term); dl and the
    # corpus stats both derive from it (no second explode+scan), and
    # df is a vocabulary-sized aggregate OF it.
    # The four subplans reading tf within ONE action (the scoring
    # join, dl, dfs, stats) are shared at runtime by Spark's exchange
    # reuse — identical canonical exchanges execute once — so a
    # persist buys nothing for the single-action unpruned plan and
    # costs a columnar cache build (paired cold A/B at sf0.1:
    # unconditional persist was a wash for pipeline_bm25, 0.99×).
    # Persist pays only ACROSS actions, where exchange reuse cannot
    # reach: the pruning planner's jobs below (θ probe, qrows
    # collect) — exactly where it was already applied.
    tf = toks.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    qterms = (
        queries.select(
            "q_id", F.explode(F.split(F.col("q_text"), " ")).alias("t")
        )
        .where(F.col("t") != "")
        .distinct()
    )
    if prune:
        # Metadata-cheap pre-gate BEFORE any postings job: Σ df over
        # the query terms is at most |distinct query terms| · n_docs,
        # so when that CEILING is under the floor the planner could
        # never engage — decline with ONE job (both counts cross-
        # joined — round 17, two separate count actions before)
        # instead of building (and persisting) the TF table for a df
        # job. The query-side count is the RAW token count (round 18):
        # Σ size(split(q_text)) ≥ |distinct query terms|, so the
        # ceiling only loosens — a borderline batch proceeds to the
        # planner, whose own Σ df floor re-declines with identical
        # results — and the gate's plan loses the explode + distinct
        # exchange (a map-side aggregate instead of a shuffle).
        floor = (
            BM25_PRUNE_MIN_POSTINGS if min_postings is None else min_postings
        )
        nq_ceiling = F.sum(
            F.size(F.filter(F.split(F.col("q_text"), " "), lambda t: t != ""))
        )
        gate = (
            queries.agg(nq_ceiling.alias("nq"))
            .crossJoin(docs.agg(F.count(F.lit(1)).alias("nd")))
            .collect()[0]
        )
        if (gate["nq"] or 0) * gate["nd"] < floor:
            prune = False
    if prune:
        # Persisted only when the planner will actually run MULTIPLE
        # jobs over these frames (θ probe, candidate pass — separate
        # actions, so runtime exchange reuse cannot share them; the
        # cache is the only mechanism that can). Ledger-registered
        # (round 14, ADVICE r13): registry callers release them when
        # the next query enters, and DIRECT callers are self-cleaning
        # — each bm25_topk call releases the PREVIOUS call's caches,
        # so at most one call's corpus-sized frame stays cached per
        # session. (Consume the previous result before issuing the
        # next call, or its TF recomputes — persist is a recompute
        # hint, never a correctness mechanism.) qterms rides along
        # (round 17): it is query-batch-sized but derived from a
        # corpus scan, and the planner re-references it in qstats,
        # the seed semi-join and the θ probe.
        from ccog_spark import cache_ledger

        spark = docs.sparkSession
        cache_ledger.release_owner(spark, "bm25_topk")
        tf = cache_ledger.track(spark, "bm25_topk", tf.persist())
        qterms = cache_ledger.track(spark, "bm25_topk", qterms.persist())
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    dfs = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    return _bm25_rank(
        docs.sparkSession, tf, dl, dfs, stats, qterms,
        k=k, k1=k1, b=b, id_col=id_col,
        prune=prune, min_postings=min_postings,
    )


def _bm25_rank(
    spark,
    tf: DataFrame,
    dl: DataFrame,
    dfs: DataFrame,
    stats: DataFrame,
    qterms: DataFrame,
    k: int,
    k1: float,
    b: float,
    id_col: str,
    prune: bool,
    min_postings: int | None,
    blockstats: DataFrame | None = None,
    block_max: bool | str = True,
) -> DataFrame:
    """The ONE BM25 scoring/pruning core, shared by ``bm25_topk``
    (frames derived from the raw corpus) and
    ``text_index.query_bm25_index`` (frames read from the persisted
    inverted index) — bit-identical results between the two paths are
    the index module's contract. Inputs: tf=(id, t, tf),
    dl=(id, dl), dfs=(t, df), stats = 1-row (n_docs, sum_dl),
    qterms = DISTINCT (q_id, t).

    ``blockstats`` (round 15, index path only): (t, blk, max_tf) rows
    for the query terms — per-(term, id-range-block) tf ceilings the
    index persists (``build_bm25_index(block_max=True)``). When the
    max-score planner engages, candidate generation additionally
    skips whole BLOCKS of an essential term's postings: block blk of
    term t is read iff its best possible quantized contribution
    ub_blk(t) = floor(idf·(k1+1)·max_tf/(max_tf + k1·(1−b))·1e6 +
    0.5) + 1 (tf ≤ max_tf and norm ≥ 1−b bound the saturation; the
    +1 absorbs double-rounding asymmetry exactly like the planner's
    global ub) reaches the planner's keep threshold cut(t) =
    min over queries q where t is essential of (θ_q − rem_q(t)).

    ``block_max`` (round 16 cost gate): with the default ``True`` the
    stored ceilings are consulted only when Σ df over the essential
    union clears ``BM25_BLOCKMAX_MIN_POSTINGS`` — below the crossover
    the bookkeeping costs more than the cut saves and the plain
    max-score plan runs instead (identical results by the
    losslessness proof, so the gate can never change answers).
    ``"force"`` always engages when blockstats are supplied.

    LOSSLESSNESS: suppose doc d is in query q's true top-k but got no
    candidate row. d contains some term t* essential for q (the
    planner's suffix argument), and (t*, d)'s block was cut for EVERY
    query where t* is essential — in particular ub_blk(t*) <
    θ_q − rem_q(t*). Then score(d) ≤ ub_blk(t*) + rem_q(t*) < θ_q,
    and θ_q lower-bounds the k-th best full score, so d is strictly
    below ≥ k documents — contradiction (strict <: a θ tie could
    still win the id tie-break, so ties are never cut). Deletions
    only make stored max_tf stale-HIGH (a bound that loosens, never
    breaks); appends add rows that the query-side max-merge folds in."""
    # df rides WITH the query terms: dfs is vocabulary-sized (Heaps'
    # law — hundreds of millions of terms at 100 TB, NOT broadcastable
    # wholesale), so join it to the query-term frame first and
    # broadcast only the query-batch-sized result into the TF table
    qstats = qterms.join(dfs, "t")

    # avgdl spelled EXACTLY as the oracle does: CAST(sum AS DOUBLE)/N,
    # then dl/avgdl — association order is part of the contract
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = (
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tfp = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * (F.col("dl") / avgdl))
    )
    term_q = F.floor(idf * tfp * 1000000.0 + 0.5).cast("long")

    def score_frame(q_side: DataFrame) -> DataFrame:
        """Per-(query, doc, term) quantized scores for the given
        query-term frame — the ONE scoring spelling both the full
        plan and the pruning θ probe share."""
        j = (
            tf.join(F.broadcast(q_side), "t")
            .join(dl, id_col)
            .crossJoin(F.broadcast(stats))
        )
        return j.select("q_id", F.col(id_col), term_q.alias("tq"))

    rows = score_frame(qstats)
    if prune:
        planned = _bm25_essential_terms(
            spark, score_frame, stats, qstats, k, k1,
            min_postings=min_postings,
        )
        if planned is not None:
            essential, block_cuts = planned
            from pyspark.sql.types import (
                LongType,
                StructField,
                StructType,
            )

            ess_df = spark.createDataFrame(
                [(t,) for t in essential],
                StructType([StructField("t", qstats.schema["t"].dataType)]),
            )
            # candidate DOC ids: ≥1 essential-term match anywhere in
            # the batch (doc-level union — see _bm25_essential_terms
            # for why the superset is lossless); bounded by the
            # planner's Σ df(essential union) ≤ MAX_CANDIDATES. The
            # broadcast semi joins restrict tf AND dl BELOW the
            # query-term join, so non-candidate postings never leave
            # the (cached/pruned) TF scan and the scoring aggregate's
            # input is candidate-sized instead of postings-sized.
            tf_e = tf.join(F.broadcast(ess_df), "t")
            if blockstats is not None and block_max != "force":
                # round-16 cost gate (see BM25_BLOCKMAX_MIN_POSTINGS):
                # the candidate rows the cut could save are exactly
                # Σ df over the essential union — already exact and
                # driver-side from the planner; below the crossover
                # the ceilings' bookkeeping is pure overhead
                ess_total = sum(d for d, _ in block_cuts.values())
                if ess_total < BM25_BLOCKMAX_MIN_POSTINGS:
                    blockstats = None
            if blockstats is not None:
                # block-max refinement (see docstring): keep a block
                # iff its quantized per-term ceiling reaches the
                # planner's keep threshold. plan_df carries (t, df,
                # cut) — query-batch-sized; the max-merge over
                # blockstats folds in append-era duplicate (t, blk)
                # rows; the bound expression mirrors term_q's
                # quantization exactly (+1 rounding guard).
                plan_df = spark.createDataFrame(
                    [
                        (t, int(block_cuts[t][0]), int(block_cuts[t][1]))
                        for t in essential
                    ],
                    StructType(
                        [
                            StructField("t", qstats.schema["t"].dataType),
                            StructField("bdf", LongType()),
                            StructField("cut", LongType()),
                        ]
                    ),
                )
                mtf = F.col("max_tf").cast("double")
                bidf = (F.col("n_docs") - F.col("bdf") + 0.5) / (
                    F.col("bdf") + 0.5
                )
                ubb = (
                    F.floor(
                        bidf
                        * ((k1 + 1.0) * mtf / (mtf + k1 * (1.0 - b)))
                        * 1000000.0
                        + 0.5
                    ).cast("long")
                    + 1
                )
                kept = (
                    blockstats.groupBy("t", "blk")
                    .agg(F.max("max_tf").alias("max_tf"))
                    .join(F.broadcast(plan_df), "t")
                    .crossJoin(F.broadcast(stats))
                    .where(ubb >= F.col("cut"))
                    .select("t", "blk")
                )
                tf_e = tf_e.withColumn("blk", _blk_of(id_col)).join(
                    kept, ["t", "blk"], "left_semi"
                )
            cand_ids = tf_e.select(id_col).distinct()
            tf_c = tf.join(F.broadcast(cand_ids), id_col, "left_semi")
            dl_c = dl.join(F.broadcast(cand_ids), id_col, "left_semi")
            j = (
                tf_c.join(F.broadcast(qstats), "t")
                .join(dl_c, id_col)
                .crossJoin(F.broadcast(stats))
            )
            rows = j.select("q_id", F.col(id_col), term_q.alias("tq"))
    scored = rows.groupBy("q_id", id_col).agg(F.sum("tq").alias("score"))
    w = W.partitionBy("q_id").orderBy(F.col("score").desc(), F.col(id_col))
    return scored.select(
        "q_id", id_col, "score", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= k)


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str,
    k: int = 5,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009 — the
    standard score-free hybrid-retrieval combiner): fused(d) =
    Σ_lists 1/(c + rank_list(d)), documents absent from a list
    contribute 0. Inputs are two ranked frames (q_id, id_col, rn);
    modality-agnostic — lexical BM25 + vector ANN is the canonical
    pairing. Per-document fused scores are quantized half-up at 1e9
    into BIGINTs (repo float rule), ranked (score DESC, id) per query.

    Scale shape: both inputs are already top-m per query (query-batch
    × m rows), so the full-outer join and the rank window are
    query-batch-sized — nothing corpus-sized reaches this operator."""
    a = ranked_a.select("q_id", id_col, F.col("rn").alias("rn_a"))
    b = ranked_b.select("q_id", id_col, F.col("rn").alias("rn_b"))
    fused = a.join(b, ["q_id", id_col], "full_outer")
    term_a = F.when(
        F.col("rn_a").isNotNull(), F.lit(1.0) / (F.lit(c) + F.col("rn_a"))
    ).otherwise(F.lit(0.0))
    term_b = F.when(
        F.col("rn_b").isNotNull(), F.lit(1.0) / (F.lit(c) + F.col("rn_b"))
    ).otherwise(F.lit(0.0))
    rrf_q = F.floor((term_a + term_b) * 1000000000.0 + 0.5).cast("long")
    w = W.partitionBy("q_id").orderBy(F.col("rrf").desc(), F.col(id_col))
    return (
        fused.select("q_id", id_col, rrf_q.alias("rrf"))
        .select(
            "q_id", id_col, "rrf", F.row_number().over(w).alias("rn")
        )
        .where(F.col("rn") <= k)
    )


def rrf_fuse_many(
    ranked: list[DataFrame],
    id_col: str,
    k: int = 5,
    c: int = 60,
) -> DataFrame:
    """N-list reciprocal-rank fusion (the general Cormack et al. form;
    ``rrf_fuse`` above is the 2-list spelling the hybrid row pins).
    Inputs: ≥2 ranked frames (q_id, id_col, rn). Per-list
    contributions 1/(c + rn) are quantized half-up at 1e9 into BIGINTs
    and SUMMED as integers (the repo float rule — exact regardless of
    list order), then ranked (score DESC, id) per query.

    Scale shape: a union of top-m-per-query frames — query-batch ×
    Σm rows; the aggregate and window are query-batch-sized. NOTE the
    quantization granularity differs from rrf_fuse's (per-list vs
    after-sum): orderings agree except within < 1e-9 fused-score ties,
    so the two spellings are separate verbs rather than one."""
    if len(ranked) < 2:
        raise ValueError(f"rrf_fuse_many needs >= 2 lists, got {len(ranked)}")
    contrib = F.floor(
        (F.lit(1.0) / (F.lit(c) + F.col("rn"))) * 1000000000.0 + 0.5
    ).cast("long")
    tagged = [
        r.select("q_id", F.col(id_col), contrib.alias("tq")) for r in ranked
    ]
    allrows = tagged[0]
    for t in tagged[1:]:
        allrows = allrows.unionByName(t)
    fused = allrows.groupBy("q_id", id_col).agg(F.sum("tq").alias("rrf"))
    w = W.partitionBy("q_id").orderBy(F.col("rrf").desc(), F.col(id_col))
    return fused.select(
        "q_id", id_col, "rrf", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= k)


def _phrase_core(
    toks: DataFrame, phrases: DataFrame, id_col: str
) -> DataFrame:
    """The ONE phrase-adjacency core, shared by ``phrase_match``
    (token positions derived from the raw corpus) and
    ``text_index.phrase_match_index`` (positions read from the
    positional postings) — bit-identical results between the two
    paths are the positional index's contract.

    Inputs: toks = (id_col, pos, t) with ``pos`` the 1-based index of
    the token in the RAW whitespace split (empty tokens filtered but
    their positions kept — the deterministic rule both the engine and
    the DuckDB oracle replay); phrases = (q_id, phrase).

    The adjacency trick is anchor normalization: a phrase term at
    offset ``i`` matching a document position ``pos`` implies the
    phrase would START at anchor = pos − i; a document contains the
    phrase exactly where ONE anchor collects ALL n distinct offsets.
    No window over content keys — one broadcast join (phrase terms
    are query-batch-sized) and two map-side-combinable aggregates;
    only matching tokens ever shuffle, grouped by (q_id, id, anchor)
    whose cardinality is bounded by the matching-token count."""
    hits = _phrase_anchors(toks, phrases, id_col)
    return (
        hits.groupBy("q_id", id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_matches"))
    )


def _phrase_anchors(
    toks: DataFrame, phrases: DataFrame, id_col: str
) -> DataFrame:
    """(q_id, id, anchor, n) rows — one per full-coverage phrase START
    position. The anchor machinery of ``_phrase_core``, factored out
    so ``snippet_match`` can reach the positions themselves (the
    count is a trivial group over this frame)."""
    pterms = (
        phrases.select(
            "q_id",
            F.posexplode(F.split(F.col("phrase"), " ")).alias("i", "t"),
        )
        .where(F.col("t") != "")
    )
    # phrase length n = distinct offsets AMONG NON-EMPTY terms (the
    # same rule the oracle spells with COUNT(DISTINCT i))
    pn = pterms.groupBy("q_id").agg(F.count_distinct("i").alias("n"))
    m = toks.join(F.broadcast(pterms), "t").select(
        "q_id", F.col(id_col), (F.col("pos") - F.col("i")).alias("anchor"),
        "i",
    )
    return (
        m.groupBy("q_id", id_col, "anchor")
        .agg(F.count_distinct("i").alias("k"))
        .join(F.broadcast(pn), "q_id")
        .where(F.col("k") == F.col("n"))
        .select("q_id", id_col, "anchor", "n")
    )


def phrase_match(
    docs: DataFrame,
    phrases: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact multi-token PHRASE search (round 14, VERDICT r13 #5 —
    the first thing every BM25 user asks for next): for each query
    phrase, the documents containing its tokens CONSECUTIVELY, with
    the number of occurrences. ``phrases``: (q_id, phrase); output
    (q_id, id_col, n_matches), matching documents only.

    Positions are 1-based indices into the raw whitespace split
    (empty tokens filtered, positions NOT renumbered — so a phrase
    never matches across a double space; deterministic and replayed
    verbatim by the SQL oracle). Integer-only output — fully
    hash-gateable, no floats anywhere.

    Scale shape: one posexplode over the corpus (map-side, no
    shuffle), a broadcast join against the query-batch-sized phrase
    terms, then aggregates over MATCHING tokens only — a corpus-scale
    document containing no phrase vocabulary contributes zero rows to
    any exchange. The positional-index twin
    (text_index.phrase_match_index) answers the same question reading
    only the phrase terms' posting buckets."""
    toks = (
        docs.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), " ")).alias("p0", "t"),
        )
        .where(F.col("t") != "")
        .select(id_col, (F.col("p0") + 1).alias("pos"), "t")
    )
    return _phrase_core(toks, phrases, id_col)


def _proximity_core(
    toks: DataFrame, phrases: DataFrame, id_col: str, max_span: int
) -> DataFrame:
    """UNORDERED proximity core, shared by ``proximity_match`` (raw
    corpus positions) and ``text_index.proximity_match_index``
    (positions from the positional postings) — the same two-paths-one-
    truth contract as ``_phrase_core``.

    Semantics: a document matches a query where SOME window of
    ``max_span`` consecutive raw positions contains every phrase
    offset's term, in ANY order (Lucene's unordered sloppy-phrase
    shape, with an explicit window instead of edit-distance slop —
    deterministic and SQL-replayable). Duplicate phrase terms
    degenerate to distinct-TERM coverage: one in-window token
    satisfies every offset carrying that term (count_distinct(i)
    counts offsets, and a matching token matches all its term's
    offsets). ``n_matches`` counts qualifying window STARTS, where a
    window must start at a matching token's position (anchoring that
    makes the count finite and both engines agree on it).

    Scale shape: matching tokens only (broadcast phrase-term join),
    then a span-BUCKETED equi-join (round 15, VERDICT r14 #2 — this
    replaced a (q_id, id) self-join whose residual range filter made
    Spark materialize all m_d² matching-token pairs per document): a
    window [w0, w0+max_span-1] touches at most position buckets
    {w0 div max_span, w0 div max_span + 1}, so each matching token is
    emitted under its own bucket AND the previous one, window starts
    join EQUI on (q_id, id, bucket), and the span range is a residual
    filter over an O(max_span)-sized bucket pair. Per-document cost
    drops to O(m_d * max_span * |phrase|); non-matching documents
    still contribute zero rows to any exchange. The aggregates are
    map-side-combinable. Semantics are unchanged — a (token, window)
    pair can satisfy the bucket equi-key at most once (the two
    emitted buckets are distinct, a window start has one), so no
    double counting even before count_distinct."""
    if max_span < 1:
        raise ValueError(f"max_span must be >= 1, got {max_span}")
    pterms = (
        phrases.select(
            "q_id",
            F.posexplode(F.split(F.col("phrase"), " ")).alias("i", "t"),
        )
        .where(F.col("t") != "")
    )
    pn = pterms.groupBy("q_id").agg(F.count_distinct("i").alias("n"))
    m = toks.join(F.broadcast(pterms), "t").select(
        "q_id", F.col(id_col), "pos", "i"
    )
    # m (matching tokens only — query-vocabulary-bounded, ≪ corpus)
    # feeds BOTH join sides below, and neither reference sits under a
    # shared exchange (the window-starts side goes through its own
    # distinct, the token side through its own bucket explode), so
    # exchange reuse cannot share the tokenize + phrase-term join —
    # un-persisted, the corpus is tokenized twice per execution.
    # Persist m (round 17, guide §2.4) — COST-GATED round 18 (VERDICT
    # r17 #2): engage only when the optimizer's size estimate for the
    # token subtree clears PROXIMITY_PERSIST_MIN_BYTES (see the
    # constant's rationale). Below the gate the two sides re-scan a
    # small input in parallel, which measures strictly faster than a
    # serialized cache build; above it one tokenize pass + a
    # matching-tokens-sized cache wins. Ledger-registered like
    # bm25_topk's TF when engaged.
    from ccog_spark import cache_ledger

    spark = toks.sparkSession
    # release unconditionally: a gate-OFF call must still free the
    # previous (gate-ON) call's tracked cache, not leave it pinned
    # until the next engaged call
    cache_ledger.release_owner(spark, "proximity_core")
    toks_bytes = int(
        toks._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    if toks_bytes >= PROXIMITY_PERSIST_MIN_BYTES:
        m = cache_ledger.track(spark, "proximity_core", m.persist())
    bucket = (F.col("pos") / max_span).cast("bigint")
    tok_b = m.select(
        "q_id",
        id_col,
        "pos",
        "i",
        F.explode(F.array(bucket, bucket - 1)).alias("wb"),
    )
    wins = m.select(
        "q_id", id_col, F.col("pos").alias("w0"), bucket.alias("wb")
    ).distinct()
    cover = (
        tok_b.join(wins, ["q_id", id_col, "wb"])
        .where(
            (F.col("pos") >= F.col("w0"))
            & (F.col("pos") <= F.col("w0") + F.lit(max_span - 1))
        )
        .groupBy("q_id", id_col, "w0")
        .agg(F.count_distinct("i").alias("k"))
        .join(F.broadcast(pn), "q_id")
        .where(F.col("k") == F.col("n"))
    )
    return cover.groupBy("q_id", id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches")
    )


def proximity_match(
    docs: DataFrame,
    phrases: DataFrame,
    max_span: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unordered PROXIMITY search (round 14 — the relaxation every
    exact-phrase user asks for next): documents where all the query
    terms co-occur within ``max_span`` consecutive token positions,
    in any order. ``phrases``: (q_id, phrase); output (q_id, id_col,
    n_matches) with ``n_matches`` = qualifying window starts (see
    ``_proximity_core`` for the exact anchoring rule). Positions are
    the same 1-based raw-whitespace-split indices as
    ``phrase_match``; exact phrase is the ordered special case —
    proximity with max_span == len(phrase) additionally accepts
    permutations. Integer-only output, fully hash-gateable."""
    toks = (
        docs.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), " ")).alias("p0", "t"),
        )
        .where(F.col("t") != "")
        .select(id_col, (F.col("p0") + 1).alias("pos"), "t")
    )
    return _proximity_core(toks, phrases, id_col, max_span)


def bm25f_topk(
    docs: DataFrame,
    queries: DataFrame,
    field_cols: tuple[str, ...],
    weights: tuple[float, ...],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Multi-FIELD BM25 (BM25F, Zaragoza et al. 2004 — the standard
    structured-document ranking: a title hit should outrank the same
    hit buried in the body). Per field f with weight w_f:

        tf~_f(t,d) = tf_f(t,d) / (1 - b + b * dl_f(d)/avgdl_f)
        tf'(t,d)   = Σ_f w_f * tf~_f(t,d)
        score(q,d) = Σ_t idf(t) * (k1+1)*tf' / (k1 + tf')

    with idf(t) = (N - df + 0.5)/(df + 0.5) and df counted over
    documents containing t in ANY field — term saturation applies
    ONCE to the combined evidence (the property separating BM25F from
    naively summing per-field BM25 scores).

    Float rule (repo contract): the per-field weighted normalized tf
    is quantized half-up at 1e9 into BIGINT and the field combination
    is an exact integer sum (field count is small and fixed; a raw
    double sum would be aggregation-order-sensitive); the per-term
    score is then quantized at 1e6 like the BM25 core and summed as
    BIGINT — bit-exact replay in the SQL oracle.

    Scale shape (round 17 — ONE corpus tokenize for ALL fields): the
    fields are exploded in a single Generate (each token tagged with
    its field ordinal) and aggregated into ONE shared
    (field, id, t, tf) table; every per-field frame — tf, dl (= Σ tf),
    the avgdl stats — and the cross-field df union derive from it, so
    all their exchanges canonicalize equal and runtime exchange reuse
    executes the tokenize+aggregate once. The previous per-field
    spelling tokenized each FIELD separately for tf_f, dl_f, stats_f
    and the df union — subtrees across different field columns never
    canonicalize equal, so nothing could be shared (sf0.1 plan: 78
    Exchange / 24 scans). Query-batch frames broadcast after the
    vocabulary join exactly as the single-field core does."""
    if len(field_cols) != len(weights) or not field_cols:
        raise ValueError("field_cols and weights must be same-length, >= 1")
    spark = docs.sparkSession
    n_docs_frame = docs.agg(F.count(F.lit(1)).alias("n_docs"))

    # one Generate over the concatenation of per-field tagged token
    # arrays: a single corpus scan tokenizes every field. The tagging
    # lambda MUST be unary — F.transform hands a two-parameter
    # callable (element, index), so a default-arg closure would bind
    # the field ordinal to the token POSITION.
    def _tag(fi: int):
        return lambda x: F.struct(
            F.lit(fi).cast("int").alias("fi"), x.alias("t")
        )

    tagged = F.explode(
        F.flatten(
            F.array(
                *[
                    F.transform(
                        # a NULL field must contribute zero tokens —
                        # not NULL the flatten (flatten is null if ANY
                        # element array is null, unlike per-field
                        # explode which just skipped the null row)
                        F.coalesce(
                            F.split(F.col(col), " "),
                            F.array().cast("array<string>"),
                        ),
                        _tag(fi),
                    )
                    for fi, col in enumerate(field_cols)
                ]
            )
        )
    ).alias("ft")
    toks_all = (
        docs.select(F.col(id_col), tagged)
        .select(id_col, F.col("ft.fi").alias("fi"), F.col("ft.t").alias("t"))
        .where(F.col("t") != "")
    )
    # no persist: single action — every reference to tfall is a
    # canonically identical aggregate exchange, shared at runtime by
    # exchange reuse (the paired A/B showed the cache build is pure
    # overhead here)
    tfall = toks_all.groupBy("fi", id_col, "t").agg(
        F.count(F.lit(1)).alias("tf")
    )

    contribs = []
    for fi, (col, w) in enumerate(zip(field_cols, weights)):
        tf_f = tfall.where(F.col("fi") == fi).select(id_col, "t", "tf")
        # dl_f = Σ_t tf_f — identical to counting the field's tokens
        dl_f = tf_f.groupBy(id_col).agg(F.sum("tf").alias("dl"))
        # avgdl over ALL docs (empty-field docs contribute dl 0),
        # spelled CAST(sum AS DOUBLE)/N like the single-field core
        stats_f = dl_f.agg(F.sum("dl").alias("sum_dl")).crossJoin(
            F.broadcast(n_docs_frame)
        )
        avgdl_f = F.col("sum_dl").cast("double") / F.col("n_docs")
        qf = bm25f_field_contrib(F.col("tf"), F.col("dl"), avgdl_f, w, b)
        contribs.append(
            tf_f.join(dl_f, id_col)
            .crossJoin(F.broadcast(stats_f))
            .select(id_col, "t", qf.alias("qf"))
        )

    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    combined = allc.groupBy(id_col, "t").agg(F.sum("qf").alias("qsum"))

    dfs = tfall.select(id_col, "t").distinct().groupBy("t").agg(
        F.count(F.lit(1)).alias("df")
    )
    qterms = (
        queries.select(
            "q_id", F.explode(F.split(F.col("q_text"), " ")).alias("t")
        )
        .where(F.col("t") != "")
        .distinct()
    )
    return _bm25f_rank(
        combined, dfs, qterms, n_docs_frame, k, k1, id_col
    )


def bm25f_field_contrib(tf, dl, avgdl, w: float, b: float):
    """The per-field quantized BM25F contribution — ONE expression
    truth shared by the inline operator and the persisted-index query
    path (round 15, the _bm25_rank/_phrase_core precedent): weighted
    length-normalized tf, half-up-quantized at 1e9 into BIGINT so the
    cross-field sum is exact and aggregation-order-insensitive.
    A tf of 0 (index rows for a field the doc lacks the term in)
    contributes floor(0.5) = 0 — identical to the inline path's
    absent row."""
    tnorm = tf / (1.0 - b + b * (dl / avgdl))
    return F.floor(
        F.lit(float(w)) * tnorm * 1000000000.0 + 0.5
    ).cast("long")


def _bm25f_rank(
    combined: DataFrame,
    dfs: DataFrame,
    qterms: DataFrame,
    n_docs_frame: DataFrame,
    k: int,
    k1: float,
    id_col: str,
) -> DataFrame:
    """BM25F scoring tail shared by ``bm25f_topk`` and
    ``text_index.query_bm25f_index`` (round 15 — one core, two
    execution paths, the _bm25_rank contract): combined per-(id, t)
    field evidence ``qsum`` (1e9-quantized BIGINT) saturates ONCE,
    1e6-quantized per term, summed per (q_id, id), top-k per query."""
    # vocabulary-sized df joins onto the query batch FIRST (never
    # broadcast wholesale — the single-field core's rule)
    qstats = qterms.join(dfs, "t").crossJoin(F.broadcast(n_docs_frame))

    tfp = F.col("qsum") / 1000000000.0
    idf = (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    term_q = F.floor(
        idf * ((k1 + 1.0) * tfp) / (F.lit(k1) + tfp) * 1000000.0 + 0.5
    ).cast("long")
    scored = (
        combined.join(F.broadcast(qstats), "t")
        .select("q_id", F.col(id_col), term_q.alias("tq"))
        .groupBy("q_id", id_col)
        .agg(F.sum("tq").cast("long").alias("score"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("score").desc(), F.col(id_col))
    return scored.select(
        "q_id", id_col, "score", F.row_number().over(w).cast("int").alias("rn")
    ).where(F.col("rn") <= k)


def diversify_topk(
    ranked: DataFrame,
    groups: DataFrame,
    group_col: str,
    k: int = 5,
    max_per_group: int = 1,
    id_col: str = "doc_id",
    broadcast_ranked: bool = True,
) -> DataFrame:
    """Result DIVERSIFICATION (round 14 — the standard search-quality
    post-pass): re-cut a ranked list keeping at most ``max_per_group``
    documents per (query, group), preserving the incoming order.
    ``ranked``: (q_id, id_col, score, rn) from any retrieval operator;
    ``groups``: (id_col, group_col) — e.g. the documents' source — or
    an index docmeta table (never the corpus text).

    Deterministic greedy rule (the one every engine implements and SQL
    replays exactly): walk each query's list in rank order; a document
    whose group already holds max_per_group better-ranked SURVIVORS is
    skipped... which for a per-group cap equals "keep the group's
    first max_per_group rows" — rank within (q_id, group) by rn, keep
    ≤ max_per_group, re-rank by the original (score desc, id), cut at
    k. Pure windows over query-batch-sized frames.

    ``broadcast_ranked`` (default True — round-15 ADVICE): the ranked
    side is hinted into a broadcast so the corpus-scale groups
    projection streams map-side instead of shuffling (measured +10 s
    at fa-sf10 without the hint). The default therefore REQUIRES
    ``ranked`` to be query-batch-sized (|Q| × m rows — every retrieval
    operator's top-k output qualifies); a caller re-cutting an
    all-scores list with m near corpus size must pass False to get a
    plain equi-join instead of a driver-OOM-sized broadcast."""
    if max_per_group < 1 or k < 1:
        raise ValueError("k and max_per_group must be >= 1")
    # the ranked side is query-batch × m rows but derived (post-window,
    # statistics unknown) — without the hint Spark sort-merge-joins and
    # SHUFFLES the corpus-sized groups projection; broadcasting the
    # small side makes the groups scan stream map-side
    r = F.broadcast(ranked) if broadcast_ranked else ranked
    j = r.join(groups.select(id_col, group_col), id_col)
    gw = W.partitionBy("q_id", group_col).orderBy(F.col("rn"))
    kept = j.select(
        "q_id", id_col, "score", "rn", group_col,
        F.row_number().over(gw).alias("grp_rn"),
    ).where(F.col("grp_rn") <= max_per_group)
    rw = W.partitionBy("q_id").orderBy(F.col("score").desc(), F.col(id_col))
    return (
        kept.select(
            "q_id", id_col, "score", group_col,
            F.row_number().over(rw).cast("int").alias("rn"),
        )
        .where(F.col("rn") <= k)
    )


def snippet_match(
    docs: DataFrame,
    phrases: DataFrame,
    window: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SNIPPET extraction (round 14 — the result-page verb next to
    phrase search): for each (query phrase, matching document), the
    text window around the FIRST exact occurrence — ``window`` raw
    positions of context on each side of the phrase. Output
    (q_id, id_col, first_pos, snippet); matching documents only.

    Deterministic by construction: first_pos = MIN anchor over the
    full-coverage anchors of ``_phrase_anchors`` (shared with
    phrase_match — one adjacency truth), and the snippet is the RAW
    whitespace split sliced at [max(first_pos − window, 1),
    first_pos + n − 1 + window] re-joined with single spaces — both
    engines replay the same slice on the same positions rule.

    Scale shape: the anchor machinery (matching tokens only), a
    query-batch × matching-docs aggregate, then ONE join back to the
    corpus on id to slice the text of MATCHING documents only —
    non-matching documents are never touched past the token scan."""
    toks = (
        docs.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), " ")).alias("p0", "t"),
        )
        .where(F.col("t") != "")
        .select(id_col, (F.col("p0") + 1).alias("pos"), "t")
    )
    return _snippet_core(toks, phrases, docs, id_col, text_col, window)


def _snippet_core(
    toks: DataFrame,
    phrases: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    window: int,
) -> DataFrame:
    """The ONE snippet-slicing core, shared by ``snippet_match``
    (token positions derived from the raw corpus) and
    ``text_index.snippet_match_index`` (positions read from the
    positional postings) — the ``_phrase_core`` sharing pattern.
    ``docs`` supplies ONLY the text slice of matching documents (the
    index twin's rerank_corpus-shaped argument)."""
    if window < 0:
        raise ValueError(f"window must be >= 0, got {window}")
    first = (
        _phrase_anchors(toks, phrases, id_col)
        .groupBy("q_id", id_col, "n")
        .agg(F.min("anchor").alias("first_pos"))
    )
    start = F.greatest(F.col("first_pos") - window, F.lit(1))
    length = (
        F.col("first_pos") + F.col("n") - 1 + window - start + 1
    )
    # `first` is query-batch × matching-docs but DERIVED (post-agg,
    # no statistics) — broadcast it so the corpus text projection
    # streams map-side (the diversify_topk/bm25_prf_topk hint)
    return F.broadcast(first).join(docs.select(id_col, text_col), id_col).select(
        "q_id",
        F.col(id_col),
        F.col("first_pos").cast("bigint").alias("first_pos"),
        F.array_join(
            F.slice(F.split(F.col(text_col), " "), start, length), " "
        ).alias("snippet"),
    )


def bm25_prf_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k_fb: int = 10,
    e_terms: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pseudo-relevance-feedback query EXPANSION (round 14 — the
    classic two-pass recall lever, a deliberately integer-exact
    simplification of RM3): pass 1 ranks with plain BM25; the top
    ``k_fb`` documents per query donate their ``e_terms`` most
    frequent terms (token occurrences summed over the feedback docs,
    original query terms excluded, ties broken by term text); pass 2
    re-ranks with the EXPANDED term set, all terms weighted equally.
    Full RM3 interpolates relevance-model weights — floats a
    hash-gated oracle cannot replay portably — so the expansion here
    is the set-union variant, deterministic end to end.

    Scale shape (round 17 — ONE shared TF derivation for the whole
    two-pass operator): pass 1, the feedback counts, and pass 2 all
    read the SAME tf/dl/dfs/stats frames, so the canonically-equal
    exchanges are shared at runtime (exchange reuse) and the plan
    carries 2 token explodes instead of 9 subtree spellings (the
    previous code re-derived pass-2 frames and joined RAW tokens for
    feedback — sf0.1 plan: 98 Exchange / 24 scans of duplicated
    text). Feedback counts come from TF directly: Σ tf(doc, t) over
    the feedback docs ≡ counting the winners' token occurrences
    (identical integers, the quantity RM3 wants). No persist: the
    operator is a single action, where exchange reuse already shares
    the corpus-side work (a persist measured as a pure cache-build
    cost here — paired cold A/B at sf0.1). Pruning is left off for
    both passes (the expanded batch is small; the planner's jobs
    would dominate)."""
    spark = docs.sparkSession
    toks = (
        docs.select(
            F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("t")
        )
        .where(F.col("t") != "")
    )
    tf = toks.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    dfs = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    orig = (
        queries.select(
            "q_id", F.explode(F.split(F.col("q_text"), " ")).alias("t")
        )
        .where(F.col("t") != "")
        .distinct()
    )
    base = _bm25_rank(
        spark, tf, dl, dfs, stats, orig,
        k=k_fb, k1=k1, b=b, id_col=id_col, prune=False, min_postings=None,
    )
    fb_cnt = (
        # feedback winners are query-batch × k_fb rows but derived —
        # broadcast them so the TF stream joins map-side instead of
        # shuffling (the diversify_topk hint, same reason); summing tf
        # replays the old per-token count exactly (TF aggregated them)
        F.broadcast(base.select("q_id", id_col))
        .join(tf, id_col)
        .groupBy("q_id", "t")
        .agg(F.sum("tf").alias("c"))
        .join(orig, ["q_id", "t"], "left_anti")
    )
    ew = W.partitionBy("q_id").orderBy(F.col("c").desc(), F.col("t"))
    expansion = (
        fb_cnt.select("q_id", "t", F.row_number().over(ew).alias("ern"))
        .where(F.col("ern") <= e_terms)
        .select("q_id", "t")
    )
    qterms = orig.unionByName(expansion).distinct()

    return _bm25_rank(
        spark, tf, dl, dfs, stats, qterms,
        k=k, k1=k1, b=b, id_col=id_col, prune=False, min_postings=None,
    )
