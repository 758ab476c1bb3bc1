"""Deduplication operators (E34/E35 + north-star dedup suite).

Scale design notes (the part that matters at 100 TB):

- **Exact dedup**: hash → groupBy(hash) keep-min — one shuffle keyed by
  content hash; duplicate clusters co-locate, everything else is
  map-side. Equivalent to the reference's sparse-tile elision idea of
  keying work by content identity.
- **MinHash signatures are computed map-side** (array_min over a
  transform of shingle hashes) — no explode, no shuffle for the
  signature itself. Only the LSH band join shuffles, and it shuffles
  (band_id, band_key) pairs, not documents.
- **LSH banding**: b bands × r rows; a pair colliding in ≥1 band becomes
  a candidate; candidates are verified with exact Jaccard. b=4, r=4
  targets the s-curve threshold (1/b)^(1/r) ≈ 0.71.
- **SimHash**: 60-bit signature from ±1 bit votes of two token-hash
  families; pairs within Hamming ≤ hamming_max CORPUS-WIDE. Candidate
  generation is signature segment-banding: the 60 bits split into
  (hamming_max + 1) segments, and by pigeonhole any pair within the
  Hamming budget agrees exactly on ≥1 segment — so the banded
  self-join has FULL recall and the final result is identical to the
  all-pairs join, while the pair space is bounded by bucket sizes
  (~n²/2^15 per band on a natural corpus) instead of n² per
  low-cardinality block.
- **Embedding near-dup**: cosine ≥ threshold for pairs sharing ≥1
  hyperplane-LSH band (n_tables tables × bits sign-bits each, the
  deterministic planes from operators.similarity). The band join is
  the blocking key — candidates ~n²·tables/2^bits — and the semantics
  ("share a band AND cos ≥ t") are deterministic and oracle-checkable
  because the hyperplanes are fixed integer formulas.

All hashes are the engine-portable rolling hash (functions.hashing) so
every operator here is hash-checkable against DuckDB.
"""

from __future__ import annotations

import threading

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ccog_spark.functions.hashing import MOD, minhash_perm, roll_hash

N_PERMS = 16
N_BANDS = 4
ROWS_PER_BAND = 4

# Span-dedup gram-key implementation (see remove_repeated_spans):
# 'hash'   — two-seed xxhash64 128-bit pair over the token-window
#            array; the production default (the shuffle carries 16
#            bytes per gram instead of ~k tokens of text).
# 'string' — full token-string keys; the collision-free oracle twin
#            (kept runnable so the two modes can cross-check).
_SPAN_KEY_IMPL = "hash"


def _re_quote(sep: str) -> str:
    """Literal separator → Java-regex pattern for F.split (which takes
    a REGEX, not a literal): \\Q…\\E quoting, the JVM's own
    Pattern.quote construction. Without this a metachar separator
    ('.', '|') silently tokenizes wrong — and diverges from the DuckDB
    oracles, which split literally. Separators containing the two-char
    sequence '\\E' are rejected rather than mis-quoted."""
    if "\\E" in sep:
        raise ValueError(r"separator must not contain the sequence \E")
    return "\\Q" + sep + "\\E"


def _persist_latest(tag: str, df: DataFrame) -> DataFrame:
    """persist() with single-slot scope per operator tag: the PREVIOUS
    call's cached frame is released (async) when a new one arrives, so
    repeated calls in a long-lived session hold at most one cached
    frame per operator instead of accumulating leak sites (operators
    return lazy results, so they cannot unpersist at their own exit;
    the registry's byte-budget sweep remains the global backstop).
    Note Spark's CacheManager keys cache REUSE by analyzed-plan
    equality, so an identical re-invocation first releases, then
    re-persists the same plan — one recompute, no double-caching.
    The same plan-keyed reuse means two TAGS whose frames analyze to
    the same plan alias one cache entry: unpersisting one tag's slot
    releases the other's too (perf-only — the released frame
    recomputes correctly; no tag pair in this module shares a plan).
    The registry dict is lock-guarded: concurrent pipelines in one
    session (e.g. parallel test workers sharing a SparkSession) must
    not interleave pop/persist and strand an unreleased frame. The
    terminal frame per tag stays pinned until the next call or the
    registry byte-budget sweep's clearCache()."""
    with _PERSISTED_LOCK:
        prev = _PERSISTED.pop(tag, None)
        if prev is not None:
            try:
                prev.unpersist(blocking=False)
            except Exception:
                pass  # session may be stopped; nothing to release
        _PERSISTED[tag] = df.persist()
    return df


_PERSISTED: dict[str, DataFrame] = {}
_PERSISTED_LOCK = threading.Lock()


def _content_hash(text_col: str) -> Column:
    """Null-safe content key: md5 of the text, with NULL text mapped
    to a sentinel no real md5 hex digest can collide with (wrong
    length / non-hex). Keeps NULL-text rows participating in dedup
    instead of being dropped by NULL-key equi-joins."""
    return F.coalesce(F.md5(F.col(text_col)), F.lit("__NULL_TEXT__"))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep-first exact dedup: one row per distinct content, the row
    with the minimum id. Adds is_keeper to every input row.

    Keep-first is a groupBy(hash).min — NOT a window over the content
    hash: at web scale one boilerplate page repeated billions of times
    would serialize into a single window task, while the aggregate
    gets map-side combine (hot hashes collapse per input partition
    before the shuffle) and the join back is AQE-skew-splittable
    (round-7 skew sweep; same rework as remove_duplicate_lines)."""
    cols = df.columns
    # coalesce the hash to a sentinel: md5(NULL) is NULL and an equi-
    # join drops NULL keys, which would silently LOSE NULL-text rows.
    # With the sentinel they form one dedup group — exactly what the
    # sibling keep_first's groupBy(NULL-group) does, so the two
    # spellings agree on NULL-text corpora.
    tagged = df.withColumn("_h", _content_hash(text_col))
    firsts = tagged.groupBy("_h").agg(F.min(id_col).alias("_min_id"))
    return (
        tagged.join(firsts, "_h")
        .withColumn("is_keeper", F.col(id_col) == F.col("_min_id"))
        .select(*cols, "is_keeper")
    )


def keep_first(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """KEEPER ROWS ONLY of a keep-first exact dedup — the common
    pipeline-stage spelling where downstream never needs the
    is_keeper flag on dropped rows. ONE map-side-combinable aggregate
    (min_by over the content hash), no join back, skew-proof: a page
    duplicated a billion times collapses per input partition before
    the shuffle. Column set preserved."""
    cols = df.columns
    return (
        df.groupBy(_content_hash(text_col).alias("_h"))
        .agg(F.min_by(F.struct(*cols), F.col(id_col)).alias("_r"))
        .select("_r.*")
    )


def remove_duplicate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-wide line-level dedup WITH document rebuild — CCNet's
    first hygiene stage: a line that appears anywhere earlier in the
    corpus (boilerplate, navigation chrome, repeated headers) is
    dropped from every later occurrence, keeping the FIRST; surviving
    lines are reassembled in original order into a cleaned ``text``.

    Distinct from chunk-level dedup (which REPORTS duplication): this
    operator returns the cleaned corpus — (id_col, text, n_lines,
    n_dropped) — so downstream stages consume deduped text directly.

    Keep-first is deterministic: first by (id_col, line position)
    across the corpus. Lines shorter than ``min_chars`` are kept
    unconditionally (deduping '' or single chars destroys formatting,
    per CCNet practice).

    Scale shape: keep-first is computed as a groupBy(line).min(struct)
    — NOT a window. A window partitioned by line content puts a
    boilerplate line repeated billions of times into ONE task with no
    remedy; the min-aggregate gets map-side combine (hot lines collapse
    to one row per input partition before the shuffle) and the join
    back is AQE-skew-splittable. Content keys (not hashes) — no
    collision false-drops. One combined shuffle for the firsts table,
    one line-keyed join, one per-document regroup. Documents whose
    every line was dropped survive with empty text — silently losing
    rows would break corpus alignment."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), _re_quote(sep))
        ).alias("pos", "line"),
    )
    dedupable = F.length("line") >= min_chars
    firsts = (
        lines.where(dedupable)
        .groupBy("line")
        .agg(F.min(F.struct(id_col, "pos")).alias("_first"))
    )
    kept = lines.join(firsts, "line", "left").withColumn(
        "_keep",
        ~dedupable
        | (F.struct(id_col, "pos") == F.col("_first")),
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_keep"),
                            F.struct(F.col("pos"), F.col("line")),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
            sep,
        ).alias(text_col),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum((~F.col("_keep")).cast("bigint")).alias("n_dropped"),
    )
    return docs.select(id_col).join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
    )


def remove_repeated_spans(
    docs: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
    gram_keys: str | None = None,
) -> DataFrame:
    """EXACT-SUBSTRING (span) dedup with document rebuild — the
    "dedup repeated 50-token spans" stage of Lee et al. 2022
    (Deduplicating Training Data Makes Language Models Better),
    re-expressed corpus-wide at TOKEN granularity: every maximal
    k-token window that occurred anywhere earlier in the corpus
    (earlier = smaller (id, position)) has its covered tokens dropped;
    surviving tokens are reassembled in order. Sub-line granularity —
    catches repeated boilerplate that line dedup (needs exact line
    match) and chunk dedup (fixed 64-token alignment) both miss.

    Returns (id_col, text, n_tokens, n_dropped). Overlapping repeated
    windows merge naturally (dropped POSITIONS are set-unioned);
    repeats WITHIN one document drop too (surgical self-repetition
    removal, the exact-span complement of the Gopher repetition
    heuristics). Documents shorter than k tokens pass through; fully-
    covered documents survive with empty text (corpus alignment).

    Scale shape — same skew discipline as remove_duplicate_lines:
    keep-first is groupBy(gram).min(struct), NEVER a window (a
    boilerplate span repeated billions of times collapses map-side
    before the shuffle); the gram join back is AQE-skew-splittable;
    the position-level anti-join and per-doc regroup shuffle
    (id, pos)-sized rows only. Explode factor is ≤k gram rows per
    token; at 100 TB pick k≈50 like the paper (the default).

    Gram KEYS (``gram_keys``, default module _SPAN_KEY_IMPL='hash'):
    the two exchanges that dominate at scale — the keep-first groupBy
    and the join-back — are keyed on a 128-bit TWO-SEED xxhash64 pair
    of the token-window ARRAY, computed map-side, so the shuffle
    carries 16 bytes per gram instead of a ~k-token string (~50×
    shuffle-byte cut at k=50; SCALING.md span-dedup row). Collision
    risk is ~N²/2¹²⁸ — zero for any physical corpus — and hashing the
    array (not a joined string) removes any separator-injection
    ambiguity outright. ``gram_keys='string'`` keeps full token-string
    keys (NO collision assumption) as the oracle twin: the DuckDB
    oracle replays string grams, and the two modes are asserted equal
    on collision-dense corpora in pytest."""
    mode = gram_keys if gram_keys is not None else _SPAN_KEY_IMPL
    if mode not in ("hash", "string"):
        raise ValueError(f"gram_keys must be 'hash' or 'string': {mode}")
    t = docs.select(
        F.col(id_col),
        F.split(F.col(text_col), _re_quote(sep)).alias("tk"),
    ).withColumn("n", F.size("tk"))
    windows = t.where(F.col("n") >= k).select(
        id_col,
        "tk",
        F.explode(F.sequence(F.lit(0), F.col("n") - F.lit(k))).alias("p"),
    ).select(
        id_col, "p", F.slice("tk", F.col("p") + 1, F.lit(k)).alias("_w")
    )
    if mode == "hash":
        # two independent 64-bit lanes: xxhash64 folds arguments
        # sequentially, so a distinct leading literal re-seeds lane 2
        grams = windows.select(
            id_col,
            "p",
            F.xxhash64("_w").alias("_g1"),
            F.xxhash64(F.lit(1), "_w").alias("_g2"),
        )
        key = ["_g1", "_g2"]
    else:
        grams = windows.select(
            id_col, "p", F.array_join("_w", sep).alias("_g1")
        )
        key = ["_g1"]
    firsts = grams.groupBy(*key).agg(
        F.min(F.struct(id_col, "p")).alias("_first")
    )
    dup_spans = (
        grams.join(firsts, key)
        .where(F.struct(id_col, "p") != F.col("_first"))
        .select(id_col, "p")
    )
    dropped = dup_spans.select(
        id_col,
        F.explode(
            F.sequence(F.col("p"), F.col("p") + F.lit(k - 1))
        ).alias("pos"),
    ).distinct()
    toks = t.select(
        id_col, F.posexplode("tk").alias("pos", "tok")
    )
    kept = toks.join(dropped, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                ),
                lambda s: s["tok"],
            ),
            sep,
        ).alias(text_col),
        F.count(F.lit(1)).cast("bigint").alias("_kept"),
    )
    return t.select(id_col, "n").join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        F.col("n").cast("int").alias("n_tokens"),
        (F.col("n") - F.coalesce("_kept", F.lit(0)))
        .cast("bigint")
        .alias("n_dropped"),
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingle strings (map-side)."""
    toks = F.split(text, " ")
    n_sh = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(n_sh >= 1, F.array_distinct(grams)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def _shingle_combine_arrow(n: int):
    """Arrow-vectorized n-gram combine: token-hash array → distinct
    n-gram hashes ((…(h_i·31 + h_{i+1})·31 + …) mod p), first-occurrence
    order (pd.unique ≡ array_distinct). Pure int64 arithmetic (hashes
    < 2^30, acc·31 + h < 2^35) — BIT-IDENTICAL to the expression
    construction and the DuckDB oracle. ``fb`` carries the whole-text
    hash used when the doc has < n tokens."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def comb(hs_col: pd.Series, fb: pd.Series) -> pd.Series:
        out = []
        for hs, f in zip(hs_col, fb):
            hsa = np.asarray(hs, dtype=np.int64)
            m = hsa.shape[0] - (n - 1)
            if m >= 1:
                acc = hsa[:m].copy()
                for k in range(1, n):
                    acc = (acc * 31 + hsa[k : k + m]) % MOD
                out.append(pd.unique(acc))
            else:
                out.append(np.array([f], dtype=np.int64))
        return pd.Series(out)

    return comb


def with_shingle_hashes(
    df: DataFrame, text_col: str = "text", out: str = "sh", n: int = 3
) -> DataFrame:
    """Add a distinct-shingle-hash array column (BIGINT in [0, MOD)).

    Tokens are hashed ONCE (JVM rolling hash, O(chars) map-side); the
    n-gram combine runs in one Arrow batch kernel per partition. The
    combine MUST NOT be a JVM lambda expression over the token-hash
    column: Catalyst's CollapseProject inlines the column into every
    element_at reference and re-evaluates the char-level hashing per
    gram — a measured ~8× regression (29 s → 4 s on the sf0.1 corpus).
    The UDF boundary forces the token hashes to materialize exactly
    once, and the numpy combine is bit-identical int64 arithmetic, so
    every downstream operator stays hash-checkable against DuckDB.
    """
    df = df.withColumn(
        "_hs", F.transform(F.split(F.col(text_col), " "), lambda t: roll_hash(t))
    )
    # whole-text fallback hash, only evaluated for docs with < n tokens
    fb = F.when(
        F.size(F.col("_hs")) - (n - 1) < 1, roll_hash(F.col(text_col))
    ).otherwise(F.lit(0).cast("bigint"))
    return df.withColumn(
        out, _shingle_combine_arrow(n)(F.col("_hs"), fb)
    ).drop("_hs")


def minhash_signature(sh_hashes: Column, n_perms: int = N_PERMS) -> Column:
    """MinHash signature as an array column — computed entirely
    map-side: array_min over a universal-family permutation of the
    shingle-hash array. No shuffle. (Expression form; the hot path
    uses minhash_signature_arrow — bit-identical, integer-only.)"""
    def perm_min(i: int):
        # single-arg lambda (a 2-arg transform lambda would receive the
        # element index as its second argument)
        return F.array_min(F.transform(sh_hashes, lambda h: minhash_perm(h, i)))

    return F.array(*[perm_min(i) for i in range(n_perms)])


def minhash_signature_arrow(n_perms: int = N_PERMS):
    """Arrow-vectorized MinHash signatures: one numpy broadcast
    ((m,1)·a + b mod p, column mins) per document instead of n_perms
    interpreted array traversals. Pure int64 arithmetic (hashes < 2^30,
    a < 2^7 → products < 2^37), so the result is BIT-IDENTICAL to the
    expression version and the DuckDB oracle."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from ccog_spark.functions.hashing import MINHASH_A, MINHASH_B

    a = np.array(MINHASH_A[:n_perms], dtype=np.int64)
    b = np.array(MINHASH_B[:n_perms], dtype=np.int64)

    @pandas_udf("array<long>")
    def sig(col: pd.Series) -> pd.Series:
        out = []
        for hs in col:
            hsa = np.asarray(hs, dtype=np.int64)
            out.append(((hsa[:, None] * a + b) % MOD).min(axis=0))
        return pd.Series(out)

    return sig


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays (via hash sets)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    return inter / union


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_min: float = 0.4,
    n: int = 3,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, verified with exact Jaccard
    over word ``n``-gram shingles.

    Plan shape: map-side signatures → explode to (band, key) [rows =
    docs × b, small] → shuffle on band key → per-bucket self-join →
    distinct candidate pairs → exact-Jaccard verify via a join back to
    the shingle arrays. The only quadratic work is within LSH buckets.
    """
    # persisted: referenced three times below (bands + both Jaccard sides)
    sigs = (
        with_shingle_hashes(
            docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
            text_col,
            n=n,
        )
        .select("doc_id", "sh")
        .withColumn("sig", minhash_signature_arrow()(F.col("sh")))
        .persist()
    )

    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "-",
                            *[
                                F.col("sig")[b * ROWS_PER_BAND + r]
                                for r in range(ROWS_PER_BAND)
                            ],
                        ).alias("key"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")

    left = bands.select(
        F.col("band"), F.col("key"), F.col("doc_id").alias("doc_a")
    )
    right = bands.select(
        F.col("band"), F.col("key"), F.col("doc_id").alias("doc_b")
    )
    cands = (
        left.join(right, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    sh_a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4).alias("jac"),
        )
        .where(F.col("jac") >= jaccard_min)
    )


SIMHASH_BITS = 30  # rolling hash is mod ~2^30; bits per hash family
# Second hash family (universal perm of the token hash) supplies bits
# 30..59 so the banded signature has 4 × 15-bit segments.
SIMHASH_A2 = 1_000_003
SIMHASH_B2 = 12_345
SIMHASH_TOTAL_BITS = 2 * SIMHASH_BITS
HAMMING_MAX = 3
SIMHASH_N_BANDS = 4  # must be >= HAMMING_MAX + 1 for pigeonhole recall
SIMHASH_BAND_BITS = SIMHASH_TOTAL_BITS // SIMHASH_N_BANDS


def simhash(text: Column) -> Column:
    """60-bit two-family SimHash of a text column — same output as
    ``with_simhash`` (bits 0..29 vote on the rolling token hash, bits
    30..59 on its (a·h + b) mod p permutation; a bit is set when the
    ±1 vote sum is positive). Map-side only.

    Single-pass: one fold over the token-hash array carries the whole
    60-element vote vector; both families vote inside the same lambda
    (family 2 is an affine function of the family-1 hash, so the
    permuted array is never materialized). Column-level convenience —
    ``with_simhash`` is the faster DataFrame-level path."""
    hs = F.transform(F.split(text, " "), lambda t: roll_hash(t))
    pows = F.array(*[F.lit(1 << j).cast("bigint") for j in range(SIMHASH_BITS)])
    zeros = F.array_repeat(F.lit(0).cast("bigint"), SIMHASH_TOTAL_BITS)

    def vote(acc: Column, h: Column) -> Column:
        h2 = (h * SIMHASH_A2 + SIMHASH_B2) % MOD
        return F.concat(
            F.zip_with(
                F.slice(acc, 1, SIMHASH_BITS),
                pows,
                lambda a, p: a + F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1),
            ),
            F.zip_with(
                F.slice(acc, SIMHASH_BITS + 1, SIMHASH_BITS),
                pows,
                lambda a, p: a + F.when(h2.bitwiseAND(p) != 0, 1).otherwise(-1),
            ),
        )

    votes = F.aggregate(hs, zeros, vote)
    masks = F.array(
        *[F.lit(1 << j).cast("bigint") for j in range(SIMHASH_TOTAL_BITS)]
    )
    bits = F.zip_with(
        votes, masks, lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("bigint"))
    )
    return F.aggregate(bits, F.lit(0).cast("bigint"), lambda acc, x: acc + x)


def with_simhash(
    df: DataFrame, text_col: str = "text", out: str = "sh"
) -> DataFrame:
    """DataFrame-level 60-bit simhash. Bits 0..29 come from the rolling
    token hash, bits 30..59 from its (a·h + b) mod p permutation —
    same vote rule (bit set ⟺ 2·ones > n), so the two halves are
    independent simhashes of the same token stream.

    Token hashes are computed JVM-side (engine-portable rolling hash),
    then the 60 bit votes are counted in ONE Arrow-vectorized numpy
    kernel. BIT-IDENTICAL to the expression construction (asserted in
    tests against the column-level simhash()): every step is int64
    arithmetic — products stay < 2^50, no floating point anywhere —
    so there is nothing rounding-order could perturb. The expression
    alternative (60 scalar folds, or 20 with 3×21-bit packed counters)
    runs in Spark's interpreted higher-order-function path and costs
    ~2 s per 5k docs; one Arrow batch does it in ~50 ms."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    pows = 1 << np.arange(SIMHASH_BITS, dtype=np.int64)

    @pandas_udf("long")
    def sig(col: pd.Series) -> pd.Series:
        out_v = np.empty(len(col), dtype=np.int64)
        for i, hs in enumerate(col):
            hsa = np.asarray(hs, dtype=np.int64)
            m = hsa.shape[0]
            hs2 = (hsa * SIMHASH_A2 + SIMHASH_B2) % MOD
            ones1 = ((hsa[:, None] & pows) != 0).sum(axis=0)
            ones2 = ((hs2[:, None] & pows) != 0).sum(axis=0)
            lo = int((pows * (2 * ones1 > m)).sum())
            hi = int((pows * (2 * ones2 > m)).sum())
            out_v[i] = lo | (hi << SIMHASH_BITS)
        return pd.Series(out_v)

    df = df.withColumn(
        "_hs", F.transform(F.split(F.col(text_col), " "), lambda t: roll_hash(t))
    )
    return df.withColumn(out, sig(F.col("_hs"))).drop("_hs")


def simhash_band_keys(sh: Column) -> Column:
    """Array of SIMHASH_N_BANDS segment values of the 60-bit signature
    — the LSH band keys. Pure bit arithmetic, map-side.

    Bucket-size caveat: because MOD (1e9+7) < 2^30, bit 29 of each
    family is set with p ≈ 0.46 rather than 0.5, so the two segments
    containing those top bits have slightly fewer than 2^15 effective
    keys. Fine for banding (buckets stay ~n/2^14.9), noted for
    honesty of the ~2^15-keys-per-band sizing claim."""
    seg_mask = (1 << SIMHASH_BAND_BITS) - 1
    return F.array(
        *[
            F.shiftright(sh, b * SIMHASH_BAND_BITS).bitwiseAND(F.lit(seg_mask))
            for b in range(SIMHASH_N_BANDS)
        ]
    )


def simhash_pairs(
    docs: DataFrame,
    hamming_max: int = HAMMING_MAX,
) -> DataFrame:
    """Near-dup pairs by 60-bit SimHash Hamming distance ≤ hamming_max,
    corpus-wide (no attribute blocking).

    Candidate generation is segment banding: the signature splits into
    SIMHASH_N_BANDS equal segments; by pigeonhole a pair with ≤
    (SIMHASH_N_BANDS − 1) differing bits agrees exactly on at least one
    segment, so joining on (band, segment value) has FULL recall for
    hamming_max ≤ SIMHASH_N_BANDS − 1 and the result is identical to
    the all-pairs join (which is what the oracle computes). The join
    shuffles (band, key) rows — 4 per doc — and quadratic work is
    bounded per bucket (~n/2^15 of the corpus each on natural text),
    unlike blocking on low-cardinality attributes like (lang, source)
    where one block can be most of a 100 TB corpus.
    """
    if hamming_max > SIMHASH_N_BANDS - 1:
        raise ValueError(
            f"hamming_max={hamming_max} needs >= {hamming_max + 1} bands "
            f"for full recall; have {SIMHASH_N_BANDS}"
        )
    sigs = with_simhash(docs.select("doc_id", "text")).select("doc_id", "sh")
    bands = sigs.select(
        "doc_id",
        "sh",
        F.posexplode(simhash_band_keys(F.col("sh"))).alias("band", "key"),
    )
    a = bands.select(
        "band", "key", F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_x")
    )
    b = bands.select(
        "band", "key", F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_y")
    )
    return (
        a.join(b, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sh_x").bitwiseXOR(F.col("sh_y"))).alias("hamming"),
        )
        .where(F.col("hamming") <= hamming_max)
        .distinct()  # a pair may collide in several bands
    )


def _ppjoin_prefix_arrow(t: float, rep_bc):
    """Arrow kernel: per-doc PPJoin prefix (rarest-first) in ONE
    map-side pass. ``rep_bc`` broadcasts the (sorted-key, freq) arrays
    of REPEATED shingles only (corpus freq >= 2); any shingle absent
    from it has freq 1 exactly, so the (freq, h) sort order is the
    same EXACT global order the join-based build produces — no
    approximation. Prefix length is |sh| - ceil(t*|sh|) + 1 (same
    double→ceil arithmetic as the declarative spelling)."""
    import math

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def prefix(col: pd.Series) -> pd.Series:
        keys, freqs = rep_bc.value
        nk = keys.shape[0]
        out = []
        for hs in col:
            hsa = np.asarray(hs, dtype=np.int64)
            sz = hsa.shape[0]
            plen = sz - math.ceil(t * sz) + 1
            f = np.ones(sz, dtype=np.int64)
            if nk:
                idx = np.searchsorted(keys, hsa)
                hit = idx < nk
                hit[hit] = keys[idx[hit]] == hsa[hit]
                f[hit] = freqs[idx[hit]]
            order = np.lexsort((hsa, f))
            out.append(hsa[order[:plen]])
        return pd.Series(out)

    return prefix


# Broadcasting the repeated-shingle frequency table is the fast path;
# above this BYTE budget the operator falls back to the shuffle-based
# prefix build (a 100 TB corpus can have billions of repeated shingles
# — that frame must stay distributed). Each (h, freq) row costs 16 B
# as two int64 numpy arrays, which is what's actually broadcast.
_PPJOIN_BCAST_MAX_BYTES = 64 << 20
_PPJOIN_ROW_BYTES = 16
_PPJOIN_BCAST_MAX = _PPJOIN_BCAST_MAX_BYTES // _PPJOIN_ROW_BYTES

# Test/observability hook: which prefix build the last call took
# ("broadcast" | "distributed").
_LAST_PREFIX_PATH: str | None = None

# Broadcast the (doc_id, shingle-array) verify frame only below this
# doc count (~50 MB at the observed ~52 hashes/doc); larger corpora
# verify through ordinary shuffle joins.
_VERIFY_BCAST_MAX_DOCS = 100_000


def ngram_jaccard_pairs(
    docs: DataFrame,
    jaccard_min: float = 0.5,
    n: int = 3,
) -> DataFrame:
    """ALL word-``n``-gram Jaccard >= ``jaccard_min`` pairs,
    CORPUS-WIDE and EXACT — candidate generation is prefix filtering
    (AllPairs/PPJoin, Bayardo et al. WWW'07), which is lossless:

    Order every doc's distinct shingle hashes by ascending corpus
    frequency (rarest first, hash tie-break) and index only the first
    ``|sh| - ceil(t*|sh|) + 1``. Any pair with Jaccard >= t must share
    an indexed shingle: if A and B overlap in o elements and none is in
    A's prefix, all o lie in A's last ceil(t|A|)-1 positions, so
    o < t*|A| — but jac >= t forces o >= t(|A|+|B|)/(1+t) >= t|A|.
    Hence the banded join has FULL recall and the DuckDB oracle can
    stay a plain all-pairs join.

    Scale shape: one explode+count for global shingle frequencies, a
    map-side Arrow prefix build (repeated-shingle freqs broadcast; the
    freq-join + per-doc regroup spelling is kept as the distributed
    fallback past the broadcast gate), one equi-join on (rare) prefix
    hashes, exact-Jaccard verify. Quadratic work only inside
    single-shingle buckets whose size is capped by the rarest-first
    ordering — no low-cardinality attribute blocks, no n² corpus join.

    Candidate pruning (PPJoin, also lossless): because every doc's
    shingles are sorted by the SAME global (freq, h) order, the first
    prefix match between two docs is also their first common element —
    if a common element sat earlier in A (pos i' < i), consistency of
    the order puts it earlier in B too (j' < j ≤ prefix_len(B)), so it
    would itself be a prefix match. Hence every common element lies at
    or after the first match in both lists, giving the exact bound
    o <= min(|A| - posA, |B| - posB) (0-based pos). Pairs whose bound
    cannot reach alpha = ceil(t·(|A|+|B|)/(1+t)) — equivalently
    jac >= t — are dropped before the verify join, as are pairs
    failing the length filter t·|A| <= |B| <= |A|/t.
    """
    import numpy as np

    base = with_shingle_hashes(
        docs.select("doc_id", "text"), "text", n=n
    ).select("doc_id", "sh").persist()

    ex = base.select("doc_id", F.size("sh").alias("sz"), F.explode("sh").alias("h"))
    freq = ex.groupBy("h").agg(F.count("*").alias("freq"))
    # Prefix build, fast path: shingles with freq 1 need no lookup at
    # all — only the REPEATED minority must be known to order by
    # (freq, h). Pull that minority to the driver (size-gated) and cut
    # the whole prefix build to one Arrow kernel over the persisted
    # base: no freq join, no per-doc regroup shuffle, no collect_list.
    # limit(MAX+1) keeps the probe collect bounded: if it comes back
    # full the set is too big to broadcast and the operator takes the
    # distributed build below instead.
    rep = freq.where(F.col("freq") >= 2).limit(_PPJOIN_BCAST_MAX + 1).toPandas()
    global _LAST_PREFIX_PATH
    if len(rep) <= _PPJOIN_BCAST_MAX:
        _LAST_PREFIX_PATH = "broadcast"
        import logging

        logging.getLogger(__name__).info(
            "ppjoin prefix build: broadcast fast path "
            "(%d repeated shingles, ~%d bytes <= %d budget)",
            len(rep), len(rep) * _PPJOIN_ROW_BYTES, _PPJOIN_BCAST_MAX_BYTES,
        )
        keys = rep["h"].to_numpy(dtype=np.int64)
        order = np.argsort(keys, kind="stable")
        rep_bc = docs.sparkSession.sparkContext.broadcast(
            (keys[order], rep["freq"].to_numpy(dtype=np.int64)[order])
        )
        prefix = base.select(
            "doc_id",
            F.size("sh").alias("sz"),
            F.posexplode(
                _ppjoin_prefix_arrow(float(jaccard_min), rep_bc)(F.col("sh"))
            ).alias("pos", "h"),
        ).persist()  # the candidate self-join references this twice
    else:
        _LAST_PREFIX_PATH = "distributed"
        import logging

        logging.getLogger(__name__).info(
            "ppjoin prefix build: distributed fallback "
            "(> %d repeated shingles, %d-byte broadcast budget exceeded)",
            _PPJOIN_BCAST_MAX, _PPJOIN_BCAST_MAX_BYTES,
        )
        # Distributed fallback (100 TB path): per-doc prefix via
        # array_sort of (freq, h) structs — a per-group O(|sh| log |sh|)
        # map-side sort after the doc_id shuffle, instead of a global
        # window sort over every exploded row.
        plen = (
            F.col("sz") - F.ceil(F.lit(jaccard_min) * F.col("sz")) + 1
        ).cast("int")
        prefix = (
            ex.join(freq, "h")
            .groupBy("doc_id", "sz")
            .agg(F.array_sort(F.collect_list(F.struct("freq", "h"))).alias("fh"))
            .select(
                "doc_id",
                "sz",
                F.posexplode(F.slice(F.col("fh"), 1, plen)).alias("pos", "fh"),
            )
            .select("doc_id", "sz", "pos", F.col("fh.h").alias("h"))
            # persisted: the candidate self-join references this twice,
            # and the chain above it (freq join + per-doc sort) is the
            # expensive part — without the persist both join sides
            # recompute it (exchange reuse is not guaranteed under AQE)
            .persist()
        )
    t = F.lit(float(jaccard_min))
    alpha = F.ceil(t * (F.col("a.sz") + F.col("b.sz")) / (t + 1))
    # Asymmetric index prefix (PPJoin, Xiao et al. WWW'08): orient each
    # pair so b is the SHORTER doc (|b| <= |a|, id tie-break). Then
    # alpha >= ceil(2t/(1+t)·|b|), so b only needs its first
    # |b| - ceil(2t/(1+t)·|b|) + 1 positions indexed — ~1/3 of |b| at
    # t=0.5 vs ~1/2 for the probe prefix. The fraction is nudged down
    # by 1e-12 so double rounding can only LENGTHEN the index prefix
    # (extra candidates are harmless; a shortened prefix would lose
    # recall).
    idx_frac = F.lit(2 * jaccard_min / (1 + jaccard_min) - 1e-12)
    b_index_len = F.col("b.sz") - F.ceil(idx_frac * F.col("b.sz")) + 1
    cands = (
        prefix.alias("a")
        .join(prefix.alias("b"), "h")
        .where(
            (
                (F.col("a.sz") > F.col("b.sz"))
                | (
                    (F.col("a.sz") == F.col("b.sz"))
                    & (F.col("a.doc_id") < F.col("b.doc_id"))
                )
            )
            & (F.col("b.pos") < b_index_len)
            # length filter (t·|A| <= |B|; the mirror bound is implied
            # by |B| <= |A|)
            & (t * F.col("a.sz") <= F.col("b.sz"))
            # positional filter: max possible overlap >= alpha
            & (
                F.least(
                    F.col("a.sz") - F.col("a.pos"), F.col("b.sz") - F.col("b.pos")
                )
                >= alpha
            )
        )
        .select(F.col("a.doc_id").alias("id_x"), F.col("b.doc_id").alias("id_y"))
    )
    # Verify WITHOUT a pre-distinct: multi-prefix-match duplicates are
    # only a few % of candidates, so deduping the (tiny) post-verify
    # result costs far less than an extra full-width shuffle here. The
    # shingle-array joins are broadcast under a size gate — map-side
    # verify at test scale; past the gate they become ordinary shuffle
    # joins (a 100 TB corpus cannot broadcast its shingle arrays).
    sh_x = base.select(F.col("doc_id").alias("id_x"), F.col("sh").alias("sh_x"))
    sh_y = base.select(F.col("doc_id").alias("id_y"), F.col("sh").alias("sh_y"))
    if base.count() <= _VERIFY_BCAST_MAX_DOCS:  # base is persisted: cheap
        sh_x, sh_y = F.broadcast(sh_x), F.broadcast(sh_y)
    return (
        cands.join(sh_x, "id_x")
        .join(sh_y, "id_y")
        .select(
            "id_x",
            "id_y",
            F.round(jaccard(F.col("sh_x"), F.col("sh_y")), 4).alias("jac"),
        )
        .where(F.col("jac") >= jaccard_min)
        .select(
            F.least("id_x", "id_y").alias("doc_a"),
            F.greatest("id_x", "id_y").alias("doc_b"),
            "jac",
        )
        .distinct()
    )


def embedding_dup_pairs(
    emb: DataFrame,
    dim: int,
    cos_min: float = 0.98,
    n_tables: int | None = None,
    band_bits: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by hyperplane-LSH bands.

    Candidate generation: each vector gets similarity.band_keys —
    N_TABLES independent tables of BAND_BITS sign-bits; a pair sharing
    ≥ 1 table's full key is a candidate, verified with exact cosine.
    The band join shuffles (table, key) rows — N_TABLES per vector —
    and quadratic work is bounded per bucket (~n/2^bits of the corpus
    each), unlike blocking on a low-cardinality attribute where one
    block can be most of a 100 TB corpus. Semantics ("share a band AND
    cos ≥ t") are deterministic and oracle-checkable because the
    hyperplanes are fixed integer formulas.

    ``emb``: (vec_id, embedding) — embedding any numeric array; cast to
    double before every arithmetic step so DuckDB sees identical IEEE
    operations.

    ``n_tables`` overrides similarity.N_TABLES; ``band_bits`` PINS the
    band width (tests / controlled probes). The DEFAULT band width is
    ADAPTIVE (round 11): ``similarity.adaptive_band_bits(n)`` with n
    from a cheap count of ``emb`` — bits = max(BAND_BITS,
    ceil(log2(ceil(n / TARGET_BUCKET)))), capping expected bucket
    occupancy at TARGET_BUCKET rows so total verify work stays LINEAR
    in n past the floor instead of carrying the fixed-constant
    n²/2^bits CPU term to 100 TB. The count is one column-pruned
    aggregate over the input (noise next to the band join). Table t
    draws planes from its own fixed t·MAX_BAND_BITS range, so the
    DuckDB oracle replays the adaptive width EXACTLY by masking
    full-width keys with (2^bits − 1), bits from the same integer
    rule (COUNT → ceil-div → power-of-two CASE ladder). More bits →
    smaller buckets → fewer verify pairs but lower per-table recall;
    the buy-back is ALSO executable: the adaptive default adds
    2 tables per bit above the floor (similarity.adaptive_n_tables,
    linear band-join cost, oracle-gated UNION branches up to
    MAX_TABLES). scripts/embed_knee.py and embed_adaptive_probe.py
    measure the trade.
    """
    from ccog_spark.functions.vectors import norm
    from ccog_spark.operators import similarity
    from ccog_spark.operators.similarity import band_keys_arrow

    if band_bits is None:
        bb = similarity.adaptive_band_bits(emb.count())
        # recall buy-back rides with the adaptive width: +2 tables per
        # bit above the floor (linear cost) compensates the per-table
        # recall each extra bit costs; an explicit n_tables pins
        nt = (
            similarity.adaptive_n_tables(bb)
            if n_tables is None
            else n_tables
        )
    else:
        bb = band_bits
        nt = similarity.N_TABLES if n_tables is None else n_tables
    # Band keys via the Arrow-vectorized kernel (bit-identical to the
    # expression version; see similarity.band_keys_arrow). nv is
    # consumed exactly once by the bucket shuffle below — no persist.
    nv = (
        emb.select(
            "vec_id",
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
        )
        .withColumn("nrm", norm(F.col("e")))
        .withColumn("bks", band_keys_arrow(dim, nt, bb)(F.col("e")))
    )
    bands = nv.select(
        "vec_id", "e", "nrm", F.posexplode(F.col("bks")).alias("tbl", "bk")
    )
    # PER-BUCKET verify kernel (round 11). History of this hot path:
    # the original spelling (.distinct() on bare pair ids THEN two
    # vector joins) shuffled ~2.2 B pair rows at 100× — job death;
    # round 10 fused the cosine into the band join (no pair exchange),
    # which survives but MATERIALIZES every candidate as a joined row
    # carrying both ~512 B vectors — the r11 sf10 probe measured
    # 1.13 B candidates (skewed buckets: p50 = 35 but max ≈ 4700), so
    # the join was moving ~1 TB of row data to compute 72 GFLOPs.
    # Now: ONE shuffle groups each (tbl, bk) bucket, and an Arrow
    # kernel does the pairwise work in numpy — a blocked X @ X.T
    # PREFILTER at margin (cos_min − 1e-4) finds candidate pairs at
    # BLAS speed, then ONLY the survivors (result-sized) get their
    # cosine recomputed with strict per-dim left-to-right
    # accumulation — the exact addition sequence of the JVM fold and
    # the DuckDB oracle, so emitted values are BIT-IDENTICAL to the
    # r10 join spelling (the margin safely covers BLAS-vs-sequential
    # rounding ~1e-12 plus the round-to-4 boundary 5e-5; a pair whose
    # rounded cos passes ≥ cos_min has raw ≥ cos_min − 5e-5 > margin,
    # so no true pair is lost). Pair rows never exist JVM-side at
    # all; the exchange count is unchanged (one (tbl, bk) shuffle,
    # ~0.5 KB/vector/table — LINEAR in N). Semantics and the oracle
    # ("share ≥1 band AND cos ≥ t") are unchanged; a pair sharing ≥2
    # tables is emitted once per shared table as bit-identical rows,
    # deduped by the terminal distinct. The per-bucket quadratic
    # PREFILTER work remains the LSH contract — adaptive band_bits is
    # the knob (SCALING.md §round-11).
    margin = cos_min - 1e-4
    blk = 4096  # G-block ≈ 134 MB; bounds kernel memory on hot buckets

    def _emit_chunk(pdf: "pd.DataFrame"):
        # one complete-buckets chunk: build the arrays ONCE (the
        # per-row object→numpy conversion is the chunk's fixed cost),
        # then every bucket is an array SLICE — tiny buckets cost a
        # few numpy calls, not a pandas DataFrame each (the reason
        # this is mapInPandas over sorted partitions rather than
        # groupBy.applyInPandas: at sf0.1 ~15k near-empty buckets
        # made per-group overhead 2.4× the whole operator)
        import numpy as np

        tb = pdf["tbl"].to_numpy()
        bkk = pdf["bk"].to_numpy()
        ids_all = pdf["vec_id"].to_numpy()
        X_all = np.stack(
            [np.asarray(v, dtype="f8") for v in pdf["e"].to_numpy()]
        )
        nr_all = pdf["nrm"].to_numpy()
        cut = np.nonzero((tb[1:] != tb[:-1]) | (bkk[1:] != bkk[:-1]))[0] + 1
        starts = np.concatenate(([0], cut))
        ends = np.concatenate((cut, [len(pdf)]))
        out_a, out_b, out_c = [], [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            order = np.argsort(ids_all[s:e], kind="stable")
            ids = ids_all[s:e][order]
            X = X_all[s:e][order]
            nr = nr_all[s:e][order]
            for s1 in range(0, n, blk):
                e1 = min(s1 + blk, n)
                for s2 in range(s1, n, blk):
                    e2 = min(s2 + blk, n)
                    # 0/0 for zero-norm embeddings is a deliberate NaN
                    # (both engines order NaN above every double), so
                    # silence the warning rather than mask the value
                    with np.errstate(invalid="ignore", divide="ignore"):
                        g = (X[s1:e1] @ X[s2:e2].T) / (
                            nr[s1:e1, None] * nr[None, s2:e2]
                        )
                    if s1 == s2:  # diagonal block: strict upper tri
                        g[np.tril_indices(e1 - s1, 0)] = -2.0
                    # NaN-safe keep: `g >= margin` is False for NaN, but
                    # Spark and DuckDB both order NaN ABOVE every double,
                    # so the r10 join spelling and the oracle EMIT a
                    # zero-norm pair (cos = 0/0 = NaN). `~(g < margin)`
                    # keeps NaN candidates so the exact recompute below
                    # reproduces the NaN and the engines stay agreed
                    # (round-12 ADVICE).
                    ii, jj = np.nonzero(~(g < margin))
                    if len(ii) == 0:
                        continue
                    i, j = ii + s1, jj + s2
                    # exact cosine for survivors only: vectorized
                    # over pairs, SEQUENTIAL over dim — the identical
                    # addition order of the JVM fold / oracle
                    # list_dot_product
                    acc = np.zeros(len(i))
                    for d in range(X.shape[1]):
                        acc += X[i, d] * X[j, d]
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    with np.errstate(invalid="ignore", divide="ignore"):
                        c = acc / (nr[i] * nr[j])
                    # Arrow's pandas conversion turns float NaN into SQL
                    # NULL (pandas' NA sentinel), which the >= filter
                    # would silently drop — ship the degenerate 0/0
                    # cosine as +inf (impossible otherwise: |cos| <= 1
                    # for nonzero norms) and restore NaN JVM-side
                    c[np.isnan(c)] = np.inf
                    out_c.append(c)
        if not out_a:
            return None
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cos_raw": np.concatenate(out_c),
            }
        )

    def partition_pairs(batches):
        # rows arrive sorted by (tbl, bk) within the partition; a
        # bucket may straddle Arrow batches, so hold back the last
        # (possibly incomplete) run and prepend it to the next batch
        import numpy as np

        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            tb = pdf["tbl"].to_numpy()
            bkk = pdf["bk"].to_numpy()
            cut = np.nonzero(
                (tb[1:] != tb[:-1]) | (bkk[1:] != bkk[:-1])
            )[0]
            if len(cut) == 0:
                carry = pdf  # single run — may continue next batch
                continue
            split = int(cut[-1]) + 1
            carry = pdf.iloc[split:]
            out = _emit_chunk(pdf.iloc[:split])
            if out is not None:
                yield out
        if carry is not None and len(carry) > 1:
            out = _emit_chunk(carry)
            if out is not None:
                yield out

    pairs = (
        bands.repartition("tbl", "bk")
        .sortWithinPartitions("tbl", "bk")
        .mapInPandas(partition_pairs, "id_a long, id_b long, cos_raw double")
    )
    # +inf marks a zero-norm 0/0 cosine (see the kernel comment):
    # restore the NaN the r10 join spelling and the DuckDB oracle
    # produce — both engines order NaN above every double, so the
    # degenerate pair passes the threshold in both (round-12 ADVICE)
    raw = F.when(
        F.col("cos_raw") == float("inf"), F.lit(float("nan"))
    ).otherwise(F.col("cos_raw"))
    return (
        pairs.select("id_a", "id_b", F.round(raw, 4).alias("cos"))
        .where(F.col("cos") >= cos_min)
        .distinct()
    )


def semantic_dedup(
    emb: DataFrame,
    dim: int,
    cent_stride: int = 25,
    cos_min: float = 0.98,
    centroids: DataFrame | None = None,
    coarse_stride: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, public
    arXiv:2303.09540): cluster embeddings with a coarse quantizer,
    then prune near-duplicates WITHIN each cluster only — a vector is
    dropped when a SMALLER-id vector in its cluster has cosine ≥
    ``cos_min``. Returns (vec_id, cell, is_keeper) for every input
    vector.

    The third embedding-dedup scale shape next to corpus-wide LSH
    banding (embedding_dup_pairs) and exact all-pairs: candidate
    scope is the CLUSTER, so pair work is Σ|cell|² — the knob is the
    cluster count (at 100 TB size #clusters ∝ N so cells stay
    ~constant and the join is linear). The cluster assignment reuses
    the deterministic IVF coarse quantizer (broadcast centroids,
    map-side argmax, smallest-cent_id tie-break), which is what makes
    the whole operator SQL-replayable; production deployments pass
    ``centroids`` = similarity.kmeans_centroids(emb, n_cells)
    ((cent_id, c_emb, c_nrm) frame) exactly like ann_ivf does —
    cluster count is THE cost knob (size it ∝ N so cells stay
    constant-sized).

    Scale shape: one Arrow assign pass (broadcast centroid matrix);
    ONE shuffle on the cell key for the within-cell self-join; the
    cosine verify is a pure JVM expression (whole-stage codegen, no
    Python in the pair loop); the drop decision is a distinct +
    left join — never a window. Cosines are rounded to 4 digits
    before the threshold on BOTH engines (repo float rule).

    DEFAULT quantizer (``centroids=None``): stride-selected centroids
    (#cells ∝ N keeps cells constant-sized, so within-cell pair work
    stays LINEAR in N) assigned HIERARCHICALLY — the standard
    IVF-on-centroids construction. The coarse level is √C-SIZED
    (round-10 fix of the r9 fixed-stride version, which was a 625×
    constant cut but still O(N²) asymptotically): with C centroids,
    ``n_coarse = ⌈√C⌉`` and the rank stride is ``⌈C/⌈√C⌉⌉`` — every
    stride-th centroid by cent_id rank forms the coarse level (never
    empty). Each centroid maps to its nearest coarse centroid once
    (O(C^1.5), centroid-sized); each vector picks its coarse cell
    (O(N·√C)) then argmaxes only that cell's ~√C member centroids
    (O(N·√C) average). Total assign O(N·√C) = O(N^1.5/√cent_stride)
    — genuinely sub-quadratic, replacing the flat assign's measured
    O(N²/stride) (the r8 sf10 probe's 34×-at-100×; SCALING.md §r10
    carries the re-measured curve). Every hop is a deterministic
    argmax with first-occurrence (smallest-id) tie-break, and the
    stride rule is pure integer arithmetic (``isqrt``), so the DuckDB
    oracle replays the full two-hop assignment including the stride
    computation. Passing an explicit ``coarse_stride`` int pins the
    rank stride instead (tests use this for the degenerate flat case:
    stride ≥ C → one coarse cell ≡ flat assign exactly).

    ``centroids=`` (production contract, e.g. similarity.
    kmeans_centroids with BOUNDED n_cells ∝ corpus/cell-budget) keeps
    the flat exact-nearest assign: with bounded C it is linear and
    hierarchy would only approximate it for no asymptotic gain."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from ccog_spark.functions.vectors import dot, norm
    from ccog_spark.operators.similarity import (
        _ivf_centroid_arrays,
        hierarchical_assigner,
    )

    base = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "e"
        ),
    )
    if centroids is not None:
        # index-sized collect: the quantizer frame is n_cells rows by
        # construction (kmeans_centroids' contract), never corpus-sized
        rows = sorted(centroids.collect(), key=lambda r: r.cent_id)
        cent_ids = np.array([r.cent_id for r in rows], "i8")
        cmat = np.array([[float(x) for x in r.c_emb] for r in rows], "f8")
        cnrm = np.array([float(r.c_nrm) for r in rows], "f8")
        assign_batch = None  # flat exact-nearest (bounded C contract)
    else:
        cent_ids, cmat, cnrm = _ivf_centroid_arrays(
            base.select("vec_id", F.col("e").alias("embedding")),
            cent_stride,
        )
        # √C two-hop assigner (shared with ivfpq_topk / ann_index);
        # an explicit coarse_stride pins the rank stride, and
        # stride ≥ C degenerates to one coarse cell ≡ flat
        assign_batch = hierarchical_assigner(
            cent_ids, cmat, cnrm, coarse_stride
        )

    @pandas_udf("long")
    def assign(col: pd.Series) -> pd.Series:
        x = np.stack([np.asarray(v, dtype="f8") for v in col])
        xn = np.sqrt((x * x).sum(1))
        if assign_batch is None:
            cos = (x @ cmat.T) / (xn[:, None] * cnrm[None, :])
            return pd.Series(cent_ids[cos.argmax(1)])
        return pd.Series(assign_batch(x, xn))

    # referenced by both join sides + the final projection; scoped so
    # repeated calls release the prior call's cache (round-8 ADVICE)
    cells = _persist_latest(
        "semantic_dedup.cells",
        base.select(
            "vec_id",
            "e",
            norm(F.col("e")).alias("nrm"),
            F.coalesce(assign(F.col("e")), F.lit(-1)).alias("cell"),
        ),
    )
    a = cells.select(
        "cell",
        F.col("vec_id").alias("id_a"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = cells.select(
        "cell",
        F.col("vec_id").alias("id_b"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    dups = (
        a.join(b, "cell")
        .where(F.col("id_b") < F.col("id_a"))
        .where(
            F.round(
                dot(F.col("ea"), F.col("eb"))
                / (F.col("na") * F.col("nb")),
                4,
            )
            >= cos_min
        )
        .select(F.col("id_a").alias("vec_id"))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return cells.join(dups, "vec_id", "left").select(
        "vec_id",
        "cell",
        F.coalesce(~F.col("_dup"), F.lit(True)).alias("is_keeper"),
    )
