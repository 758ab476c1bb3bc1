"""DuckDB oracle SQL for the LLM-pipeline corpus queries.

The SQL is generated programmatically so hash permutation constants,
LSH hyperplane weights, lexicons, and bit counts stay in lockstep with
the Spark operators (single source of truth in functions.hashing /
operators.text / operators.similarity).
"""

from __future__ import annotations

from ccog_spark.functions.hashing import MINHASH_A, MINHASH_B, MOD, roll_hash_sql_duckdb
from ccog_spark.operators.dedup import (
    HAMMING_MAX,
    N_BANDS,
    N_PERMS,
    ROWS_PER_BAND,
    SIMHASH_A2,
    SIMHASH_B2,
    SIMHASH_BITS,
)
from ccog_spark.operators.similarity import (
    BAND_BITS,
    MAX_BAND_BITS,
    MAX_TABLES,
    N_PLANES,
    N_TABLES,
    TARGET_BUCKET,
    _hyperplane,
)
from ccog_spark.operators.text import (
    EN_STOPWORDS,
    LANG_ORDER,
    LEXICONS,
    REP_DUP_2GRAM_MAX,
    REP_TOP_2GRAM_MAX,
)

PIPELINE_ORACLE: dict[str, str] = {}


def _in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# ---------------------------------------------------------------- text
_LANG_SCORES = ",\n         ".join(
    f"len(list_filter(tk, t -> t IN ({_in_list(LEXICONS[lang])}))) AS s_{lang}"
    for lang in LANG_ORDER
)
_LANG_CASE = (
    "CASE "
    + " ".join(f"WHEN s_{lang} = m THEN '{lang}'" for lang in LANG_ORDER[:-1])
    + f" ELSE '{LANG_ORDER[-1]}' END"
)

PIPELINE_ORACLE["text_analysis"] = f"""
WITH toks AS (
  SELECT doc_id, n_chars, text, string_split(text, ' ') AS tk FROM documents
), scored AS (
  SELECT doc_id, n_chars, text, tk,
         {_LANG_SCORES},
         len(list_filter(tk, t -> t IN ({_in_list(EN_STOPWORDS)}))) AS stop_cnt
  FROM toks
), m AS (
  SELECT *, GREATEST({', '.join('s_' + lang for lang in LANG_ORDER)}) AS m,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct
  FROM scored
)
SELECT doc_id, n_tokens, n_distinct,
       CAST(list_sum(list_transform(tk, t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords,
       {_LANG_CASE} AS lang_pred,
       ROUND(CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS distinct_ratio,
       ROUND(0.4 * LEAST(CAST(n_chars AS DOUBLE) / 400.0, 1.0)
             + 0.4 * (CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE))
             + 0.2 * LEAST((CAST(stop_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 5.0, 1.0), 4) AS quality,
       {roll_hash_sql_duckdb('text')} AS fp
FROM m
ORDER BY doc_id
"""

# --------------------------------------------------------------- dedup
PIPELINE_ORACLE["dedup_exact"] = """
SELECT doc_id, MD5(text) AS h,
       doc_id = MIN(doc_id) OVER (PARTITION BY MD5(text)) AS is_keeper
FROM documents
ORDER BY doc_id
"""

# Distinct word-n-gram shingle hashes (identical to
# operators.dedup.with_shingle_hashes: tokens hashed once, an n-gram's
# hash is the arithmetic combination of its n token hashes).
_TOKEN_HASHES = f"list_transform(tk, t -> {roll_hash_sql_duckdb('t')})"


def _sh_hashes_sql(n: int) -> str:
    comb = "hs[i]"
    for k in range(1, n):
        comb = f"(({comb}) * 31 + hs[i + {k}]) % {MOD}"
    return (
        f"CASE WHEN len(tk) - {n - 1} >= 1 THEN "
        f"list_distinct(list_transform(range(1, len(tk) - {n - 2}), "
        f"i -> {comb})) "
        f"ELSE [{roll_hash_sql_duckdb('text')}] END"
    )


_SH_HASHES = _sh_hashes_sql(3)

_SIG_COLS = ",\n         ".join(
    f"list_min(list_transform(shh, h -> (h * {MINHASH_A[i]} + {MINHASH_B[i]}) % {MOD})) AS m{i}"
    for i in range(N_PERMS)
)
_BAND_SELECTS = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, {b} AS band, concat_ws('-', "
    + ", ".join(f"m{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
    + ") AS key FROM sigs"
    for b in range(N_BANDS)
)

_JACCARD = (
    "CAST(len(list_intersect(sa.shh, sb.shh)) AS DOUBLE) / "
    "(CAST(len(sa.shh) + len(sb.shh) AS DOUBLE) - "
    "CAST(len(list_intersect(sa.shh, sb.shh)) AS DOUBLE))"
)

# Shared CTE block ending in `mpairs` (verified MinHash near-dup pairs)
# — reused by dedup_minhash and the connected-components oracle.
def _minhash_ctes(n: int, jaccard_min: float, base: str = "documents") -> str:
    return f"""toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS tk FROM {base}
), thashes AS (
  SELECT doc_id, text, tk, {_TOKEN_HASHES} AS hs FROM toks
), hashes AS (
  SELECT doc_id, {_sh_hashes_sql(n)} AS shh FROM thashes
), sigs AS (
  SELECT doc_id, shh,
         {_SIG_COLS}
  FROM hashes
), bands AS (
{_BAND_SELECTS}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
), mpairs AS (
  SELECT doc_a, doc_b, ROUND({_JACCARD}, 4) AS jac
  FROM cand
  JOIN sigs sa ON sa.doc_id = doc_a
  JOIN sigs sb ON sb.doc_id = doc_b
  WHERE ROUND({_JACCARD}, 4) >= {jaccard_min}
)"""


_MINHASH_CTES = _minhash_ctes(3, 0.4)

PIPELINE_ORACLE["dedup_minhash"] = f"""
WITH {_MINHASH_CTES}
SELECT doc_a, doc_b, jac FROM mpairs
ORDER BY doc_a, doc_b
"""

# Connected components over the near-dup graph: min reachable id per
# vertex via a recursive transitive-closure CTE (components are tiny,
# the closure stays small).
PIPELINE_ORACLE["dedup_cc"] = f"""
WITH RECURSIVE {_MINHASH_CTES},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM mpairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM mpairs
), verts AS (
  SELECT DISTINCT u AS doc_id FROM edges
), reach AS (
  SELECT doc_id, doc_id AS label FROM verts
  UNION
  SELECT e.v AS doc_id, r.label FROM reach r JOIN edges e ON e.u = r.doc_id
)
SELECT doc_id, MIN(label) AS cluster FROM reach GROUP BY doc_id
ORDER BY doc_id
"""

# stride-4 window sampling — must match text.window_fingerprint
_WINNOW = (
    "CASE WHEN length(text) >= 16 THEN "
    "list_min(list_transform(range(1, length(text) - 14, 4), "  # excl end = (len-15)+1
    f"i -> {roll_hash_sql_duckdb('substr(text, i, 16)')})) "
    f"ELSE {roll_hash_sql_duckdb('text')} END"
)

PIPELINE_ORACLE["text_winnow"] = f"""
SELECT doc_id, {_WINNOW} AS wfp
FROM documents
ORDER BY doc_id
"""

# 60-bit two-family signature, identical to dedup.with_simhash: bits
# 0..29 vote on the rolling token hash, bits 30..59 on its
# (a·h + b) mod p permutation; bit set when the ±1 vote sum is
# positive (⟺ 2·ones > n). The oracle joins ALL-PAIRS corpus-wide —
# the Spark side's segment banding is recall-lossless by pigeonhole
# for hamming ≤ SIMHASH_N_BANDS − 1, so the two answers are identical.
_SIMHASH_TERMS = "\n         + ".join(
    f"CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h & {1 << j}) <> 0 THEN 1 ELSE -1 END)) > 0 THEN {1 << j} ELSE 0 END"
    for j in range(SIMHASH_BITS)
)
_SIMHASH_TERMS2 = "\n         + ".join(
    f"CASE WHEN list_sum(list_transform(hs2, h -> CASE WHEN (h & {1 << j}) <> 0 THEN 1 ELSE -1 END)) > 0 THEN {1 << (SIMHASH_BITS + j)} ELSE 0 END"
    for j in range(SIMHASH_BITS)
)

PIPELINE_ORACLE["dedup_simhash"] = f"""
WITH hs AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), t -> {roll_hash_sql_duckdb('t')}) AS hs
  FROM documents
), hs2t AS (
  SELECT doc_id, hs,
         list_transform(hs, h -> (h * {SIMHASH_A2} + {SIMHASH_B2}) % {MOD}) AS hs2
  FROM hs
), sigs AS (
  SELECT doc_id,
         CAST({_SIMHASH_TERMS}
         + {_SIMHASH_TERMS2} AS BIGINT) AS sh
  FROM hs2t
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= {HAMMING_MAX}
ORDER BY doc_a, doc_b
"""

# ngram_jaccard_pairs uses lossless prefix filtering for candidates,
# so the oracle is the PLAIN corpus-wide all-pairs join — the two
# answer sets are provably identical (Bayardo et al. prefix-filter
# theorem; see the operator docstring).
PIPELINE_ORACLE["dedup_ngram"] = f"""
WITH toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents
), thashes AS (
  SELECT doc_id, text, tk, {_TOKEN_HASHES} AS hs FROM toks
), hashes AS (
  SELECT doc_id, {_sh_hashes_sql(3)} AS shh FROM thashes
)
SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, ROUND({_JACCARD}, 4) AS jac
FROM hashes sa JOIN hashes sb ON sa.doc_id < sb.doc_id
WHERE ROUND({_JACCARD}, 4) >= 0.5
ORDER BY doc_a, doc_b
"""

# Mirrors pipeline._augmented_embeddings + dedup.embedding_dup_pairs:
# plant a +0.01-perturbed copy of every 10th vector, block candidates
# on (table, band-key) from N_TABLES tables of ADAPTIVE-width
# deterministic hyperplane sign-bits, verify with exact cosine ≥ 0.98.
# Round 11: the engine's band width is data-dependent —
# similarity.adaptive_band_bits(n) = max(BAND_BITS,
# ceil(log2(ceil(n/TARGET_BUCKET)))) — and because table t owns the
# FIXED plane range t·MAX_BAND_BITS+b, a width-``bits`` key is the
# low-bit MASK of the full-width key. So the oracle computes each
# table's full MAX_BAND_BITS-wide key and masks it with (2^bits − 1),
# bits derived by the SAME integer rule in the ``prm`` CTE
# (COUNT → ceil-div → power-of-two CASE ladder): data-dependent
# blocking, replayed bit-for-bit in pure SQL.
def _band_sql(t: int, dim: int) -> str:
    terms = []
    for b in range(MAX_BAND_BITS):
        weights = ", ".join(
            str(w) for w in _hyperplane(t * MAX_BAND_BITS + b, dim)
        )
        terms.append(
            f"CASE WHEN list_dot_product(e, CAST([{weights}] AS DOUBLE[])) > 0 "
            f"THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        )
    return "\n         + ".join(terms)


# One branch per POSSIBLE table (MAX_TABLES), each gated by the
# data-dependent ntab from prm — the oracle replay of
# similarity.adaptive_n_tables' recall buy-back (+2 tables per bit
# above the floor); at or below the knee ntab = N_TABLES and the
# extra branches contribute nothing
_EMB_BAND_UNION = "\n  UNION ALL\n".join(
    f"  SELECT vec_id, {t} AS tbl, bk{t} & mask AS bk FROM nv, prm"
    f" WHERE {t} < ntab"
    for t in range(MAX_TABLES)
)

# ceil(log2(m)) as a power-of-two CASE ladder — exact integer
# arithmetic, no float log in the hash-gated path (repo float rule)
_CEIL_LOG2_M = "CASE WHEN m <= 1 THEN 0 " + " ".join(
    f"WHEN m <= {1 << k} THEN {k}" for k in range(1, MAX_BAND_BITS + 1)
) + f" ELSE {MAX_BAND_BITS + 1} END"

PIPELINE_ORACLE["dedup_embed"] = f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), aug AS (
  SELECT vec_id, e FROM base
  UNION ALL
  SELECT vec_id + 10000000 AS vec_id, list_concat([e[1] + 0.01], e[2:]) AS e
  FROM base WHERE vec_id % 10 = 0
), prm AS (
  SELECT (CAST(1 AS BIGINT) << bits) - 1 AS mask,
         LEAST({MAX_TABLES},
               {N_TABLES} + 2 * (bits - {BAND_BITS})) AS ntab
  FROM (
    SELECT GREATEST({BAND_BITS}, LEAST({MAX_BAND_BITS},
             {_CEIL_LOG2_M})) AS bits
    FROM (SELECT (COUNT(*) + {TARGET_BUCKET - 1}) // {TARGET_BUCKET} AS m
          FROM aug)
  )
), nv AS (
  SELECT vec_id, e, SQRT(list_dot_product(e, e)) AS nrm,
         {",".join(f"{_band_sql(t, 64)} AS bk{t}" for t in range(MAX_TABLES))}
  FROM aug
), bands AS (
{_EMB_BAND_UNION}
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bands a JOIN bands b ON a.tbl = b.tbl AND a.bk = b.bk
  WHERE a.vec_id < b.vec_id
)
SELECT id_a, id_b,
       ROUND(list_dot_product(na.e, nb.e) / (na.nrm * nb.nrm), 4) AS cos
FROM cand
JOIN nv na ON na.vec_id = id_a
JOIN nv nb ON nb.vec_id = id_b
WHERE ROUND(list_dot_product(na.e, nb.e) / (na.nrm * nb.nrm), 4) >= 0.98
ORDER BY id_a, id_b
"""

# ---------------------------------------------------------- similarity
PIPELINE_ORACLE["ann_exact"] = """
WITH nv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
), q AS (
  SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM nv WHERE vec_id % 100 = 0
), pairs AS (
  SELECT q_id, vec_id, list_dot_product(qe, e) / (qn * nrm) AS cos_raw
  FROM q JOIN nv ON vec_id <> q_id
), ranked AS (
  SELECT q_id, vec_id, ROUND(cos_raw, 4) AS cos,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, vec_id) AS rn
  FROM pairs)
SELECT q_id, vec_id, cos, rn FROM ranked WHERE rn <= 5
ORDER BY q_id, rn
"""


def _plane_sql(dim: int) -> str:
    terms = []
    for j in range(N_PLANES):
        weights = ", ".join(str(w) for w in _hyperplane(j, dim))
        terms.append(
            f"CASE WHEN list_dot_product(e, CAST([{weights}] AS DOUBLE[])) > 0 "
            f"THEN {1 << j} ELSE 0 END"
        )
    return "\n         + ".join(terms)


PIPELINE_ORACLE["ann_lsh"] = f"""
WITH nv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
), nb AS (
  SELECT vec_id, e, nrm,
         {_plane_sql(64)} AS bkt
  FROM nv
), q AS (
  SELECT vec_id AS q_id, e AS qe, nrm AS qn, bkt FROM nb WHERE vec_id % 100 = 0
), pairs AS (
  SELECT q_id, vec_id, list_dot_product(qe, e) / (qn * nrm) AS cos_raw
  FROM q JOIN nb USING (bkt) WHERE vec_id <> q_id
), ranked AS (
  SELECT q_id, vec_id, ROUND(cos_raw, 4) AS cos,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, vec_id) AS rn
  FROM pairs)
SELECT q_id, vec_id, cos, rn FROM ranked WHERE rn <= 3
ORDER BY q_id, rn
"""

PIPELINE_ORACLE["pipeline_shards"] = """
WITH toks AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
  FROM toks)
SELECT doc_id, n_tokens,
       CAST(FLOOR((c - n_tokens) / 4096.0) AS INT) AS shard_id
FROM cum
ORDER BY doc_id
"""

# Sequence packing: docs concatenated in doc_id order, cut into
# 512-token training sequences; seq_first/seq_last are the sequence
# ids the doc spans. Naive window spelling; the engine runs the
# bucketed prefix sum.
PIPELINE_ORACLE["pipeline_sequences"] = """
WITH toks AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
  FROM toks)
SELECT doc_id, n_tokens,
       CAST(FLOOR((c - n_tokens) / 512.0) AS BIGINT) AS seq_first,
       CAST(FLOOR((c - 1) / 512.0) AS BIGINT) AS seq_last
FROM cum
ORDER BY doc_id
"""

# Pattern redaction: Java-regex and RE2 agree on this dialect subset
# (word boundary + alternation); count + replaced-sample must match
# byte-for-byte.
PIPELINE_ORACLE["pipeline_redact"] = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\b(customer|supplier|order)\b'))
            AS INT) AS n_redacted,
       substr(regexp_replace(text, '\b(customer|supplier|order)\b', '<ENT>',
                             'g'), 1, 80) AS sample
FROM documents
ORDER BY doc_id
"""

# Stratified (per-group quota) sampling: same multiplicative-hash rule
# as pipeline_sample with a per-language cutoff.
PIPELINE_ORACLE["pipeline_stratified"] = """
SELECT lang, COUNT(*) AS kept
FROM documents
WHERE (doc_id * 2654435761 + 11) % 1000000007 % 100 <
      CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20 WHEN 'es' THEN 20
                WHEN 'fr' THEN 20 WHEN 'zh' THEN 10 ELSE 0 END
GROUP BY lang
ORDER BY lang
"""

# Token-budget mixture sampling (round 15, sample_token_budget): the
# engine's grouped bucketed prefix sum must equal the naive
# per-source ordered window — budget = Σ n_tok·2 DIV 5 per source,
# admit while the running total BEFORE the doc is under budget.
# Integers only (len → BIGINT, // → BIGINT): hash-exact.
PIPELINE_ORACLE["pipeline_mixture"] = """
WITH d AS (
  SELECT doc_id, source,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok,
         (doc_id * 2654435761 + 7) % 1000000007 AS h
  FROM documents
), b AS (
  SELECT source, SUM(n_tok) * 2 // 5 AS budget FROM d GROUP BY source
), c AS (
  SELECT doc_id, source, n_tok,
         SUM(n_tok) OVER (
           PARTITION BY source ORDER BY h, doc_id
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT c.doc_id, c.source, CAST(c.n_tok AS BIGINT) AS n_tok
FROM c JOIN b USING (source)
WHERE c.cum - c.n_tok < b.budget
ORDER BY c.doc_id
"""

# Per-source document quota (round 15, quota_per_key): keep the 7
# smallest doc_ids per source — the anti-spam cap, ROW_NUMBER replay.
PIPELINE_ORACLE["pipeline_quota"] = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY doc_id) AS rk
  FROM documents)
WHERE rk <= 7
ORDER BY doc_id
"""

# Composed data-mixing pipeline (round 16, pipeline_mix_e2e): quota
# (15 smallest ids per source) → token-budget mixture (2/5 of each
# surviving source's tokens, hash admission order) → 1024-token shard
# packing — the three verbs' replays nested in corpus order. Integers
# until the final shard division, which copies pipeline_shards'
# FLOOR(x / 1024.0) spelling exactly.
PIPELINE_ORACLE["pipeline_mix_e2e"] = """
WITH q AS (
  SELECT doc_id, source, text FROM (
    SELECT doc_id, source, text,
           ROW_NUMBER() OVER (
             PARTITION BY source ORDER BY doc_id) AS rk
    FROM documents)
  WHERE rk <= 15
), d AS (
  SELECT doc_id, source,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok,
         (doc_id * 2654435761 + 7) % 1000000007 AS h
  FROM q
), b AS (
  SELECT source, SUM(n_tok) * 2 // 5 AS budget FROM d GROUP BY source
), c AS (
  SELECT doc_id, source, n_tok,
         SUM(n_tok) OVER (
           PARTITION BY source ORDER BY h, doc_id
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
), kept AS (
  SELECT c.doc_id, c.source, CAST(c.n_tok AS BIGINT) AS n_tok
  FROM c JOIN b USING (source)
  WHERE c.cum - c.n_tok < b.budget
), s AS (
  SELECT doc_id, source, n_tok,
         CAST(SUM(n_tok) OVER (ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM kept)
SELECT doc_id, source, n_tok,
       CAST(FLOOR((cum - n_tok) / 1024.0) AS INT) AS shard_id
FROM s
ORDER BY doc_id
"""

# Pure range join (no equi key): the engine's bin rewrite must equal
# the naive theta join (DuckDB executes it as an IEJoin).
PIPELINE_ORACLE["range_events"] = """
SELECT a.event_id AS a_id, b.event_id AS b_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
FROM events a JOIN events b
  ON b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 SECOND
 AND a.event_id < b.event_id
ORDER BY a_id, b_id
"""

# Benchmark decontamination — mirrors operators.decontam: the corpus/
# benchmark split is doc_id % 97, shingles are the same distinct word
# 3-gram hashes as the dedup suite, a doc's n_shared counts distinct
# shared grams (shh is distinct per doc, so COUNT(*) suffices).
PIPELINE_ORACLE["pipeline_decontam"] = f"""
WITH toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents
), thashes AS (
  SELECT doc_id, text, tk, {_TOKEN_HASHES} AS hs FROM toks
), hashes AS (
  SELECT doc_id, {_sh_hashes_sql(3)} AS shh FROM thashes
), bench AS (
  SELECT DISTINCT unnest(shh) AS h FROM hashes WHERE doc_id % 97 = 0
), corpus AS (
  SELECT doc_id, unnest(shh) AS h FROM hashes WHERE doc_id % 97 <> 0
), hits AS (
  SELECT c.doc_id, COUNT(*) AS n_shared
  FROM corpus c JOIN bench b USING (h) GROUP BY c.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared,
       COALESCE(n_shared, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM hashes WHERE doc_id % 97 <> 0) d
LEFT JOIN hits USING (doc_id)
ORDER BY doc_id
"""

# Intra-document repetition metrics — mirrors text.repetition_metrics:
# multiset 2-gram hashes (NO list_distinct), modal count via unnest +
# two-level group-by; docs with < 2 tokens keep a row via the left
# join (Spark side uses explode_outer).
PIPELINE_ORACLE["text_repetition"] = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
), th AS (
  SELECT doc_id, {_TOKEN_HASHES} AS hs FROM toks
), base AS (
  SELECT doc_id, len(hs) AS n_tokens, len(list_distinct(hs)) AS n_distinct,
         list_transform(range(1, len(hs)), i -> (hs[i] * 31 + hs[i + 1]) % {MOD}) AS g2
  FROM th
), ex AS (
  SELECT doc_id, unnest(g2) AS h FROM base
), cnt AS (
  SELECT doc_id, h, COUNT(*) AS c FROM ex GROUP BY doc_id, h
), agg AS (
  SELECT doc_id, SUM(c) AS n2, COUNT(*) AS d2, MAX(c) AS maxc
  FROM cnt GROUP BY doc_id
), m AS (
  SELECT b.doc_id, b.n_tokens, b.n_distinct,
         ROUND(1.0 - CAST(b.n_distinct AS DOUBLE) / CAST(b.n_tokens AS DOUBLE), 4) AS dup_tok_frac,
         CASE WHEN COALESCE(a.n2, 0) > 0
              THEN ROUND(1.0 - CAST(a.d2 AS DOUBLE) / CAST(a.n2 AS DOUBLE), 4)
              ELSE 0.0 END AS dup_2gram_frac,
         CASE WHEN COALESCE(a.n2, 0) > 0
              THEN ROUND(2.0 * a.maxc / CAST(b.n_tokens AS DOUBLE), 4)
              ELSE 0.0 END AS top_2gram_frac
  FROM base b LEFT JOIN agg a USING (doc_id)
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       dup_tok_frac, dup_2gram_frac, top_2gram_frac,
       (dup_2gram_frac > {REP_DUP_2GRAM_MAX} OR top_2gram_frac > {REP_TOP_2GRAM_MAX}) AS rep_flagged
FROM m
ORDER BY doc_id
"""

PIPELINE_ORACLE["pipeline_sample"] = """
SELECT doc_id, lang, source
FROM documents
WHERE ((doc_id * 2654435761 + 7) % 1000000007) % 100 < 10
ORDER BY doc_id
"""

PIPELINE_ORACLE["ann_ivf"] = """
WITH nv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
), cent AS (
  SELECT vec_id AS cent_id, e AS ce, nrm AS cn FROM nv WHERE vec_id % 25 = 1
), asn AS (
  SELECT vec_id, e, nrm, cent_id,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id
           ORDER BY list_dot_product(e, ce) / (nrm * cn) DESC, cent_id
         ) AS arn
  FROM nv CROSS JOIN cent
), cells AS (
  SELECT vec_id, e, nrm, cent_id AS cell FROM asn WHERE arn = 1
), q AS (
  SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM nv WHERE vec_id % 100 = 0
), probe AS (
  SELECT q_id, qe, qn, cent_id AS cell,
         ROW_NUMBER() OVER (
           PARTITION BY q_id
           ORDER BY list_dot_product(qe, ce) / (qn * cn) DESC, cent_id
         ) AS prn
  FROM q CROSS JOIN cent
), pairs AS (
  SELECT q_id, vec_id, list_dot_product(qe, e) / (qn * nrm) AS cos_raw
  FROM (SELECT * FROM probe WHERE prn <= 2) p JOIN cells USING (cell)
  WHERE vec_id <> q_id
), ranked AS (
  SELECT q_id, vec_id, ROUND(cos_raw, 4) AS cos,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, vec_id) AS rn
  FROM pairs)
SELECT q_id, vec_id, cos, rn FROM ranked WHERE rn <= 3
ORDER BY q_id, rn
"""

# IVF + SQ8 (round 15, similarity.ivfsq_topk): ann_ivf's cells/probes
# verbatim, but candidates ranked against the per-dimension
# min/max-RECONSTRUCTED vectors — code = clamp(floor((v−mn)·255/rng)),
# x̂ = mn + (code+0.5)·rng/256, rebuilt into a list ORDER BY d so
# list_dot_product sums in the same sequential order as the engine's
# zip_with/aggregate (the repo float rule: no order-free SUM over
# float rows in a hashed path).
PIPELINE_ORACLE["ann_sq8"] = """
WITH nv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
), ev AS (
  SELECT vec_id, t.d AS d, e[t.d] AS v
  FROM nv, UNNEST(range(1, 64 + 1)) AS t(d)
), qstat AS (
  SELECT d, MIN(v) AS mn, MAX(v) - MIN(v) AS rng FROM ev GROUP BY d
), rec AS (
  SELECT vec_id,
         list(mn + (CASE WHEN rng > 0
                         THEN LEAST(255, GREATEST(0,
                                FLOOR((v - mn) * 255.0 / rng)))
                         ELSE 0 END + 0.5) * rng / 256.0
              ORDER BY d) AS xe
  FROM ev JOIN qstat USING (d) GROUP BY vec_id
), rnv AS (
  SELECT vec_id, xe, SQRT(list_dot_product(xe, xe)) AS xn FROM rec
), cent AS (
  SELECT vec_id AS cent_id, e AS ce, nrm AS cn FROM nv WHERE vec_id % 25 = 1
), asn AS (
  SELECT vec_id, cent_id,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id
           ORDER BY list_dot_product(e, ce) / (nrm * cn) DESC, cent_id
         ) AS arn
  FROM nv CROSS JOIN cent
), cells AS (
  SELECT vec_id, cent_id AS cell FROM asn WHERE arn = 1
), q AS (
  SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM nv WHERE vec_id % 100 = 0
), probe AS (
  SELECT q_id, qe, qn, cent_id AS cell,
         ROW_NUMBER() OVER (
           PARTITION BY q_id
           ORDER BY list_dot_product(qe, ce) / (qn * cn) DESC, cent_id
         ) AS prn
  FROM q CROSS JOIN cent
), pairs AS (
  SELECT q_id, c2.vec_id,
         list_dot_product(qe, r.xe) / (qn * r.xn) AS cos_raw
  FROM (SELECT * FROM probe WHERE prn <= 2) p
  JOIN cells c2 USING (cell)
  JOIN rnv r ON r.vec_id = c2.vec_id
  WHERE c2.vec_id <> q_id
), ranked AS (
  SELECT q_id, vec_id, ROUND(cos_raw, 4) AS cos,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, vec_id) AS rn
  FROM pairs)
SELECT q_id, vec_id, cos, rn FROM ranked WHERE rn <= 3
ORDER BY q_id, rn
"""

def _ivfsq_index_sql(
    dim: int = 64,
    cent_stride: int = 25,
    nprobe: int = 2,
    k: int = 3,
    q_pred: str = "vec_id % 100 = 0",
    cand_pred: str = "",
    residual: bool = False,
) -> str:
    """Persisted IVF+SQ8 index replay (round 15): the shared √C
    two-hop cell-assignment chain (``_cells_ctes`` — identical to the
    PQ index's) composed with the ann_sq8 quantize/reconstruct CTEs,
    candidates restricted to probed cells and ranked by the
    asymmetric reconstructed cosine. ``cand_pred`` mirrors
    _ivfpq_sql's (deletion/filter twins).

    ``residual=True`` (round 16, quant='sq8r'): the quantized value is
    the IVF residual e[d] − cv[d] of the assigned cell, the per-dim
    stats are trained over those residuals, and reconstruction adds
    the centroid back — cv[d] + (mn + (code + 0.5)·rng/256), the
    engine kernel's exact float spelling."""
    if residual:
        ev_rec = f"""ev AS (
  SELECT nvv.vec_id, t.d AS d, nvv.e[t.d] - ct.cv[t.d] AS v
  FROM nv nvv
  JOIN cells cl ON cl.vec_id = nvv.vec_id
  JOIN cent ct ON ct.cent_id = cl.cell
  CROSS JOIN UNNEST(range(1, {dim} + 1)) AS t(d)
), qstat AS (
  SELECT d, MIN(v) AS mn, MAX(v) - MIN(v) AS rng FROM ev GROUP BY d
), rec AS (
  SELECT ev.vec_id,
         list(ct.cv[d] + (mn + (CASE WHEN rng > 0
                         THEN LEAST(255, GREATEST(0,
                                FLOOR((v - mn) * 255.0 / rng)))
                         ELSE 0 END + 0.5) * rng / 256.0)
              ORDER BY d) AS xe
  FROM ev
  JOIN qstat USING (d)
  JOIN cells cl ON cl.vec_id = ev.vec_id
  JOIN cent ct ON ct.cent_id = cl.cell
  GROUP BY ev.vec_id
)"""
    else:
        ev_rec = f"""ev AS (
  SELECT vec_id, t.d AS d, e[t.d] AS v
  FROM nv, UNNEST(range(1, {dim} + 1)) AS t(d)
), qstat AS (
  SELECT d, MIN(v) AS mn, MAX(v) - MIN(v) AS rng FROM ev GROUP BY d
), rec AS (
  SELECT vec_id,
         list(mn + (CASE WHEN rng > 0
                         THEN LEAST(255, GREATEST(0,
                                FLOOR((v - mn) * 255.0 / rng)))
                         ELSE 0 END + 0.5) * rng / 256.0
              ORDER BY d) AS xe
  FROM ev JOIN qstat USING (d) GROUP BY vec_id
)"""
    return f"""
WITH nv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
), {_cells_ctes(cent_stride)}, {ev_rec}, rnv AS (
  SELECT vec_id, xe, SQRT(list_dot_product(xe, xe)) AS xn FROM rec
), q AS (
  SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM nv WHERE {q_pred}
), probe AS (
  SELECT q_id, qe, qn, cent_id AS cell,
         ROW_NUMBER() OVER (
           PARTITION BY q_id
           ORDER BY list_dot_product(qe, cv) / (qn * cn) DESC, cent_id
         ) AS prn
  FROM q CROSS JOIN cent
), pairs AS (
  SELECT p.q_id, c2.vec_id,
         list_dot_product(p.qe, r.xe) / (p.qn * r.xn) AS cos_raw
  FROM (SELECT * FROM probe WHERE prn <= {nprobe}) p
  JOIN cells c2 USING (cell)
  JOIN rnv r ON r.vec_id = c2.vec_id
  WHERE c2.vec_id <> p.q_id {cand_pred}
), ranked AS (
  SELECT q_id, vec_id, ROUND(cos_raw, 4) AS cos,
         ROW_NUMBER() OVER (
           PARTITION BY q_id ORDER BY cos_raw DESC, vec_id) AS rn
  FROM pairs)
SELECT q_id, vec_id, cos, rn FROM ranked WHERE rn <= {k}
ORDER BY q_id, rn
"""


# (the ann_sq8_index oracle is assigned AFTER _cells_ctes/_ivfpq_sql
# are defined below — module assignment order, not def order)

# ----------------------------------------------------------- multimodal
# The engine really encodes PPM/BMP containers and really parses them
# back; the oracle derives the expected metadata from the same
# deterministic geometry (dims 16..63 → 2 digits → fixed 13-byte PPM
# header; BMP = 54-byte headers + 4-byte-aligned rows). A decoder
# mis-parse breaks this hash.
PIPELINE_ORACLE["multimodal_meta"] = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 13 + w * h * 3
                 ELSE 54 + (CAST(FLOOR((w * 3 + 3) / 4.0) AS BIGINT) * 4) * h
            END AS INT) AS n_bytes,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       3 AS channels,
       CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS format
FROM (
  SELECT doc_id, doc_id % 48 + 16 AS w, (doc_id * 7) % 48 + 16 AS h
  FROM documents
)
ORDER BY doc_id
"""

# ----------------------------------------------------------- as-of ops
PIPELINE_ORACLE["q23b"] = """
SELECT o.o_orderkey, CAST(MIN(e.ts) AS TIMESTAMP) AS first_event_ts
FROM orders o JOIN events e
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
GROUP BY o.o_orderkey
ORDER BY o.o_orderkey
"""

PIPELINE_ORACLE["asof_union"] = """
SELECT e.event_id, CAST(MAX(p.ts) AS TIMESTAMP) AS asof_ts
FROM events e JOIN events p
  ON p.user_id = e.user_id AND p.ts <= e.ts
WHERE e.event_type = 'click' AND p.event_type = 'purchase'
GROUP BY e.event_id
ORDER BY e.event_id
"""


_QUALITY = (
    "ROUND(0.4 * LEAST(CAST(n_chars AS DOUBLE) / 400.0, 1.0)"
    " + 0.4 * (CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE))"
    " + 0.2 * LEAST((CAST(len(list_filter(tk, t -> t IN ("
    + _in_list(EN_STOPWORDS)
    + "))) AS DOUBLE) / CAST(len(tk) AS DOUBLE)) * 5.0, 1.0), 4)"
)

PIPELINE_ORACLE["pipeline_filter"] = f"""
WITH toks AS (
  SELECT doc_id, lang, source, n_chars, text, string_split(text, ' ') AS tk
  FROM documents
), scored AS (
  SELECT doc_id, lang, source, text, {_QUALITY} AS quality FROM toks
), kept AS (
  SELECT * FROM scored WHERE quality >= 0.5
), deduped AS (
  SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY MD5(text)) AS keep
  FROM kept
)
SELECT lang, source, COUNT(*) AS kept,
       CAST(FLOOR((10 * SUM(CAST(ROUND(quality * 10000, 0) AS BIGINT)) + 5 * COUNT(*))
                  / (10.0 * COUNT(*))) AS BIGINT) / 10000.0 AS avg_q
FROM deduped WHERE keep GROUP BY lang, source
ORDER BY lang, source
"""

# ------------------------------------------------ multimodal pixel ops
# The fixture payload is formula-generated (PPM body = text bytes tiled
# to w*h*3), so the oracle recomputes every pixel byte in SQL:
# hex(encode(text)) + substr gives byte i as an integer. Means use the
# integer half-up spelling (see pipeline_filter) because byte-sum /
# 2^k-pixel-count means land exactly on .xxxx5 boundaries.

_MM_DOCS = """
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS L,
         doc_id % 48 + 16 AS w, (doc_id * 7) % 48 + 16 AS h
  FROM documents WHERE doc_id % 2 = 0
"""


def _half_up4(sum_expr: str, cnt_expr: str) -> str:
    return (
        f"CAST(FLOOR((20000 * {sum_expr} + {cnt_expr}) / (2.0 * {cnt_expr}))"
        f" AS BIGINT) / 10000.0"
    )


PIPELINE_ORACLE["multimodal_features"] = f"""
WITH d AS ({_MM_DOCS}), b AS (
  SELECT doc_id, w, h, i // 3 AS px, i % 3 AS ch,
         ('0x' || substr(hx, CAST(2 * (i % L) AS INT) + 1, 2))::INT AS v
  FROM d, UNNEST(range(0, w * h * 3)) AS t(i)
), pxl AS (
  SELECT doc_id, w, h, px, AVG(v) AS lum, SUM(v) AS s,
         MAX(CASE WHEN ch = 0 THEN v END) AS r,
         MAX(CASE WHEN ch = 1 THEN v END) AS g,
         MAX(CASE WHEN ch = 2 THEN v END) AS bl
  FROM b GROUP BY doc_id, w, h, px
)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       {_half_up4('SUM(s)', '(w * h * 3)')} AS mean,
       ROUND(STDDEV_POP(lum), 4) AS std,
       {_half_up4('SUM(r)', '(w * h)')} AS mean_r,
       {_half_up4('SUM(g)', '(w * h)')} AS mean_g,
       {_half_up4('SUM(bl)', '(w * h)')} AS mean_b,
       CAST(SUM(CASE WHEN s <= 95 THEN 1 ELSE 0 END) AS BIGINT) AS hist0
FROM pxl GROUP BY doc_id, w, h ORDER BY doc_id
"""

PIPELINE_ORACLE["multimodal_frames"] = """
SELECT doc_id, CAST(f AS INT) AS frame_idx, 781 AS n_bytes,
       CAST((doc_id * 31 + f * 7) % 256 AS INT) AS head_byte,
       CAST((doc_id * 31 + f * 7 + 767) % 256 AS INT) AS tail_byte
FROM documents, UNNEST(range(0, doc_id % 5 + 2)) AS t(f)
WHERE f % 2 = 0
ORDER BY doc_id, frame_idx
"""

PIPELINE_ORACLE["multimodal_resize"] = f"""
WITH d AS ({_MM_DOCS}), b AS (
  SELECT doc_id, oy * 32 + ox AS px,
         ('0x' || substr(hx, CAST(2 * (((oy * h // 24) * w * 3
              + (ox * w // 32) * 3 + c) % L) AS INT) + 1, 2))::INT AS v
  FROM d, UNNEST(range(0, 24)) t1(oy), UNNEST(range(0, 32)) t2(ox),
       UNNEST(range(0, 3)) t3(c)
), pxl AS (
  SELECT doc_id, px, AVG(v) AS lum, SUM(v) AS s FROM b GROUP BY doc_id, px
)
SELECT doc_id, 32 AS width, 24 AS height,
       {_half_up4('SUM(s)', '2304')} AS mean,
       ROUND(STDDEV_POP(lum), 4) AS std
FROM pxl GROUP BY doc_id ORDER BY doc_id
"""

PIPELINE_ORACLE["multimodal_audio"] = """
WITH d AS (
  SELECT doc_id, 2048 + doc_id % 1024 AS n, 8000 * (doc_id % 3 + 1) AS rate
  FROM documents
), s AS (
  SELECT doc_id, n, rate, i, (doc_id * 13 + i * i) % 65536 - 32768 AS v
  FROM d, UNNEST(range(0, n)) AS t(i)
), x AS (
  SELECT doc_id, n, rate, v,
         CASE WHEN (v >= 0) <> LAG(v >= 0)
                   OVER (PARTITION BY doc_id ORDER BY i)
              THEN 1 ELSE 0 END AS zc
  FROM s
)
SELECT doc_id,
       CAST(44 + 2 * n AS INT) AS n_bytes,
       CAST(rate AS INT) AS sample_rate,
       CAST(n AS INT) AS n_samples,
       CAST(n * 1000 // rate AS INT) AS duration_ms,
       CAST(MAX(ABS(v)) AS INT) AS peak,
       ROUND(SQRT(AVG(CAST(v AS DOUBLE) * v)), 4) AS rms,
       CAST(SUM(zc) AS INT) AS zero_crossings
FROM x GROUP BY doc_id, n, rate ORDER BY doc_id
"""


# ------------------------------------------------ product quantization
# Built at import from the PQ constants so codebook subsample, block
# geometry, encode tie-break (min struct: d then j) and the ADC sum
# order stay in lockstep with operators.similarity.pq_topk.


def _pq_sql(dim: int = 64) -> str:
    from ccog_spark.operators.similarity import (
        PQ_CB_K,
        PQ_CB_MOD,
        PQ_CB_RES,
        PQ_M_BLOCKS,
    )

    dsub = dim // PQ_M_BLOCKS

    def block(col: str, m: int) -> str:
        return f"{col}[{m * dsub + 1}:{m * dsub + dsub}]"

    def d2(x: str, c: str, m: int) -> str:
        bx, bc = block(x, m), block(c, m)
        return (
            f"list_dot_product({bx}, {bx}) - 2 * list_dot_product({bx}, {bc})"
            f" + list_dot_product({bc}, {bc})"
        )

    blocks = range(PQ_M_BLOCKS)
    enc_aggs = ",\n         ".join(
        "MIN({'d': " + d2("e", "ce", m) + ", 'j': j}) AS a" + str(m)
        for m in blocks
    )
    lut_cols = ",\n         ".join(d2("qe", "ce", m) + f" AS l{m}" for m in blocks)
    lut_arrs = ",\n         ".join(f"list(l{m} ORDER BY j) AS lut{m}" for m in blocks)
    adc = " + ".join(
        f"l.lut{m}[struct_extract(e.a{m}, 'j') + 1]" for m in blocks
    )
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), cbr AS (
  SELECT vec_id, e FROM v WHERE vec_id % {PQ_CB_MOD} = {PQ_CB_RES}
  ORDER BY vec_id LIMIT {PQ_CB_K}
), cb AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS j, e AS ce
  FROM cbr
), enc AS (
  SELECT vec_id,
         {enc_aggs}
  FROM v CROSS JOIN cb GROUP BY vec_id
), q AS (
  SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id % 100 = 0
), lutp AS (
  SELECT q_id, j,
         {lut_cols}
  FROM q CROSS JOIN cb
), lut AS (
  SELECT q_id,
         {lut_arrs}
  FROM lutp GROUP BY q_id
), pairs AS (
  SELECT l.q_id, e.vec_id,
         {adc} AS adc_raw
  FROM enc e CROSS JOIN lut l WHERE e.vec_id <> l.q_id
), ranked AS (
  SELECT q_id, vec_id, ROUND(adc_raw, 4) AS adc,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc_raw, vec_id) AS rn
  FROM pairs)
SELECT q_id, vec_id, adc, rn FROM ranked WHERE rn <= 3
ORDER BY q_id, rn
"""


PIPELINE_ORACLE["ann_pq"] = _pq_sql()

# custom stateful streaming (applyInPandasWithState running totals):
# the final per-user state must equal the plain batch aggregate.
# Values are quantized to integer cents with floor(v*100 + 0.5) —
# bit-identical IEEE ops on both sides — so the sum is order-exact
# (see queries/streaming_corpus.stream_stateful).
PIPELINE_ORACLE["stream_stateful"] = """
SELECT user_id, COUNT(*) AS n_events,
       SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) / 100.0
         AS total_value
FROM events GROUP BY user_id ORDER BY user_id
"""


def _cells_ctes(cent_stride: int, model_pred: str = "") -> str:
    """The engine's √C two-hop hierarchical cell assignment as a CTE
    fragment (cent/cst/coarse/cmap/hop1/cells_h/cells_o/cells,
    including the orphan-cell full-scan fallback), assuming an
    ``nv(vec_id, e, nrm)`` CTE is already in scope — the ONE SQL
    spelling of similarity.hierarchical_assigner, shared by
    ``_ivfpq_sql`` and ``_ivfsq_index_sql`` (round 15)."""
    return f"""cent AS (
  SELECT vec_id AS cent_id, e AS cv, nrm AS cn,
         ROW_NUMBER() OVER (ORDER BY vec_id) AS crk
  FROM nv WHERE vec_id % {cent_stride} = 1 {model_pred}
), cst AS (
  SELECT GREATEST(
           (COUNT(*) + CAST(CEIL(SQRT(COUNT(*))) AS BIGINT) - 1)
           // GREATEST(CAST(CEIL(SQRT(COUNT(*))) AS BIGINT), 1),
           1) AS stride
  FROM cent
), coarse AS (
  SELECT cent_id AS co_id, cv AS gv, cn AS gn
  FROM cent, cst WHERE (crk - 1) % cst.stride = 0
), cmap AS (
  SELECT cent_id, co_id FROM (
    SELECT c.cent_id, g.co_id,
           ROW_NUMBER() OVER (
             PARTITION BY c.cent_id
             ORDER BY list_dot_product(c.cv, g.gv) / (c.cn * g.gn)
                      DESC, g.co_id
           ) AS rn
    FROM cent c CROSS JOIN coarse g
  ) WHERE rn = 1
), hop1 AS (
  SELECT vec_id, co_id FROM (
    SELECT v.vec_id, g.co_id,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_dot_product(v.e, g.gv) / (v.nrm * g.gn)
                      DESC, g.co_id
           ) AS rn
    FROM nv v CROSS JOIN coarse g
  ) WHERE rn = 1
), cells_h AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cent_id AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_dot_product(v.e, c.cv) / (v.nrm * c.cn)
                      DESC, c.cent_id
           ) AS rn
    FROM nv v
    JOIN hop1 h ON v.vec_id = h.vec_id
    JOIN cmap m ON m.co_id = h.co_id
    JOIN cent c ON c.cent_id = m.cent_id
  ) WHERE rn = 1
), cells_o AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cent_id AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_dot_product(v.e, c.cv) / (v.nrm * c.cn)
                      DESC, c.cent_id
           ) AS rn
    FROM nv v
    JOIN hop1 h ON v.vec_id = h.vec_id
    CROSS JOIN cent c
    WHERE h.co_id NOT IN (SELECT co_id FROM cmap)
  ) WHERE rn = 1
), cells AS (
  SELECT * FROM cells_h UNION ALL SELECT * FROM cells_o
)"""


def _ivfpq_sql(
    dim: int = 64,
    cent_stride: int = 25,
    nprobe: int | str = 2,
    model_pred: str = "",
    k: int = 3,
    q_pred: str = "vec_id % 100 = 0",
    cand_pred: str = "",
) -> str:
    """IVF + PQ composed: the cell/probe CTEs joined with the ann_pq
    codebook/encode/LUT CTEs, candidates restricted to probed cells
    and ranked by ADC — built at import from the same constants as
    operators.similarity.ivfpq_topk. The CORPUS cell assignment
    (round 10) replays the engine's √C two-hop hierarchical assigner
    (similarity.hierarchical_assigner — the crk/cst/coarse/cmap/hop1/
    cells CTE chain, identical to dedup_semantic's, incl. the
    orphan-cell full-scan fallback); QUERY probing stays a flat scan
    over all centroids, exactly like the engine (|queries| is small).

    ``model_pred``: extra SQL predicate (e.g. "AND vec_id % 3 <> 0")
    restricting the MODEL-BEARING rows (centroid selection + codebook
    rows) to a sub-corpus while codes/candidates still cover
    everything — the frozen-model semantics of ann_index's
    build(A)+append(B) path (round 8).

    ``cand_pred`` (round 14): extra SQL predicate (e.g.
    "AND e.vec_id % 11 <> 5") restricting the CANDIDATE rows while
    the model still derives from the full corpus — the mirrored
    frozen-model semantics of index DELETION (tombstoned vectors are
    excluded from retrieval; nothing else can change, ADC has no
    corpus statistics).

    ``nprobe="auto"`` (round 14, VERDICT r13 #6): the probe count is
    computed IN SQL from the per-cell occupancy of the replayed cells
    CTE — the exact integer rule ann_index.auto_nprobe applies to its
    persisted cellstats: E = (Σn)² // Σn² (participation ratio),
    np = clamp(ceil(BASE·C_occ/E), BASE, CAP, C_occ). A hash match
    proves the engine picked the identical data-dependent knob (the
    adaptive_band_bits oracle pattern)."""
    from ccog_spark.operators.ann_index import NPROBE_BASE, NPROBE_CAP

    if nprobe == "auto":
        # the exact auto_nprobe integer rule over the cells CTE's
        # occupancy; ceil-div spelled (a + b - 1) // b, E >= 1 always
        npx_cte = f""", npx AS (
  SELECT LEAST(
           LEAST({NPROBE_CAP}, GREATEST({NPROBE_BASE},
             CAST(({NPROBE_BASE} * COUNT(*)
                   + (SUM(n) * SUM(n)) // SUM(n * n) - 1)
                  // ((SUM(n) * SUM(n)) // SUM(n * n)) AS BIGINT))),
           COUNT(*)) AS np
  FROM (SELECT cell, COUNT(*) AS n FROM cells GROUP BY cell) occ
)"""
        prn_cut = "(SELECT np FROM npx)"
    else:
        npx_cte = ""
        prn_cut = str(int(nprobe))
    from ccog_spark.operators.similarity import (
        PQ_CB_K,
        PQ_CB_MOD,
        PQ_CB_RES,
        PQ_M_BLOCKS,
    )

    dsub = dim // PQ_M_BLOCKS

    def block(col: str, m: int) -> str:
        return f"{col}[{m * dsub + 1}:{m * dsub + dsub}]"

    def d2(x: str, c: str, m: int) -> str:
        bx, bc = block(x, m), block(c, m)
        return (
            f"list_dot_product({bx}, {bx}) - 2 * list_dot_product({bx}, {bc})"
            f" + list_dot_product({bc}, {bc})"
        )

    blocks = range(PQ_M_BLOCKS)
    enc_aggs = ",\n         ".join(
        "MIN({'d': " + d2("e", "ce", m) + ", 'j': j}) AS a" + str(m)
        for m in blocks
    )
    lut_cols = ",\n         ".join(d2("qe", "ce", m) + f" AS l{m}" for m in blocks)
    lut_arrs = ",\n         ".join(f"list(l{m} ORDER BY j) AS lut{m}" for m in blocks)
    adc = " + ".join(
        f"l.lut{m}[struct_extract(e.a{m}, 'j') + 1]" for m in blocks
    )
    return f"""
WITH nv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
), {_cells_ctes(cent_stride, model_pred)}{npx_cte}, cbr AS (
  SELECT vec_id, e FROM nv WHERE vec_id % {PQ_CB_MOD} = {PQ_CB_RES} {model_pred}
  ORDER BY vec_id LIMIT {PQ_CB_K}
), cb AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS j, e AS ce
  FROM cbr
), enc AS (
  SELECT vec_id,
         {enc_aggs}
  FROM (SELECT vec_id, e FROM nv) v CROSS JOIN cb GROUP BY vec_id
), q AS (
  SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM nv WHERE {q_pred}
), probe AS (
  SELECT q_id, cent_id AS cell,
         ROW_NUMBER() OVER (
           PARTITION BY q_id
           ORDER BY list_dot_product(qe, cv) / (qn * cn) DESC, cent_id
         ) AS prn
  FROM q CROSS JOIN cent
), lutp AS (
  SELECT q_id, j,
         {lut_cols}
  FROM q CROSS JOIN cb
), lut AS (
  SELECT q_id,
         {lut_arrs}
  FROM lutp GROUP BY q_id
), pairs AS (
  SELECT l.q_id, e.vec_id,
         {adc} AS adc_raw
  FROM (SELECT * FROM probe WHERE prn <= {prn_cut}) p
  JOIN cells USING (cell)
  JOIN enc e ON e.vec_id = cells.vec_id
  JOIN lut l ON l.q_id = p.q_id
  WHERE e.vec_id <> l.q_id {cand_pred}
), ranked AS (
  SELECT q_id, vec_id, ROUND(adc_raw, 4) AS adc,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc_raw, vec_id) AS rn
  FROM pairs)
SELECT q_id, vec_id, adc, rn FROM ranked WHERE rn <= {k}
ORDER BY q_id, rn
"""


PIPELINE_ORACLE["ann_ivfpq"] = _ivfpq_sql()
# persisted SQ8 index (round 15) — builder defined above, next to the
# inline ann_sq8 oracle; needs _cells_ctes/_ivfpq_sql in scope
PIPELINE_ORACLE["ann_sq8_index"] = _ivfsq_index_sql()
# The persisted-index path answers from parquet codes and must land on
# the SAME rows/scores as the inline composition — one SQL truth, two
# execution paths (bit-identity additionally pinned in test_ann_index).

# round 16: RESIDUAL encoding (quant='sq8r') — residual-trained stats,
# residual quantization, centroid-added reconstruction; everything
# else (cell chain, probes, ranking) is the sq8-index SQL verbatim.
PIPELINE_ORACLE["ann_sq8r_index"] = _ivfsq_index_sql(residual=True)


def _ivfpqr_index_sql(
    dim: int = 64,
    cent_stride: int = 25,
    nprobe: int = 2,
    k: int = 3,
    q_pred: str = "vec_id % 100 = 0",
    trained: bool = False,
) -> str:
    """Persisted residual IVF+PQ index replay (round 16,
    quant='pqr' — the FAISS IndexIVFPQ by_residual default): the
    shared √C two-hop cell chain; the codebook trained on the
    deterministic sample rows' RESIDUALS (sample − centroid of its
    assigned cell); per-block codeword argmin over each vector's
    residual; reconstruction x̂ = cv + (codeword-block concatenation),
    spelled as the engine kernel's per-dimension cv[d] + dec[d] sum
    via list_zip; candidates in probed cells ranked by the asymmetric
    reconstructed cosine (the sq8r ranking contract)."""
    from ccog_spark.operators.similarity import (
        PQ_CB_K,
        PQ_CB_MOD,
        PQ_CB_RES,
        PQ_M_BLOCKS,
    )

    dsub = dim // PQ_M_BLOCKS
    blocks = range(PQ_M_BLOCKS)

    def block(col: str, m: int) -> str:
        return f"{col}[{m * dsub + 1}:{m * dsub + dsub}]"

    def d2(x: str, c: str, m: int) -> str:
        bx, bc = block(x, m), block(c, m)
        return (
            f"list_dot_product({bx}, {bx}) - 2 * list_dot_product({bx}, {bc})"
            f" + list_dot_product({bc}, {bc})"
        )

    enc_aggs = ",\n         ".join(
        "MIN({'d': " + d2("re", "ce", m) + ", 'j': j}) AS a" + str(m)
        for m in blocks
    )
    cb_joins = "\n  ".join(
        f"JOIN cb cb{m} ON cb{m}.j = struct_extract(en.a{m}, 'j')"
        for m in blocks
    )
    dec_cat = " || ".join(
        f"cb{m}.ce[{m * dsub + 1}:{m * dsub + dsub}]" for m in blocks
    )
    from ccog_spark.operators.similarity import (
        PQ_LLOYD_ITERS,
        PQ_QSCALE,
        PQ_TRAIN_N,
    )

    if trained:
        # Lloyd-trained residual codebook (round 17, quant='pqt'):
        # the training sample (first PQ_TRAIN_N of the subsample, a
        # superset of the PQ_CB_K init rows) quantizes to the
        # fixed-point integer domain — floor(res·2^20 + 0.5) — where
        # every distance and floor-mean update is an integer-valued
        # double < 2^53, so this recursive CTE reproduces the numpy
        # trainer (similarity.lloyd_train_int) BIT-IDENTICALLY, and
        # the unscaled codewords c/2^20 are exact doubles. Per-block
        # assignment is one cross join trn × lloyd with a per-block
        # MIN struct (ties → smallest j, the argmin rule); block means
        # aggregate per (codeword, block, dim) then re-assemble; empty
        # codeword blocks COALESCE to the previous iteration's block.
        bt = f"t.qe[(mm2.m*{dsub}+1):(mm2.m*{dsub}+{dsub})]"
        bc2 = f"c.qce[(mm2.m*{dsub}+1):(mm2.m*{dsub}+{dsub})]"
        d2t = (
            f"list_dot_product({bt}, {bt})"
            f" - 2 * list_dot_product({bt}, {bc2})"
            f" + list_dot_product({bc2}, {bc2})"
        )
        cb_sql = f"""cbr AS (
  SELECT vec_id, e FROM nv WHERE vec_id % {PQ_CB_MOD} = {PQ_CB_RES}
  ORDER BY vec_id LIMIT {PQ_TRAIN_N}
), cbres AS (
  SELECT c.vec_id, list(c.e[t.d] - ct.cv[t.d] ORDER BY t.d) AS e
  FROM cbr c
  JOIN cells cl ON cl.vec_id = c.vec_id
  JOIN cent ct ON ct.cent_id = cl.cell
  CROSS JOIN UNNEST(range(1, {dim} + 1)) AS t(d)
  GROUP BY c.vec_id
), trn AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) AS tid,
         list_transform(e, x -> FLOOR(x * {PQ_QSCALE} + 0.5)) AS qe
  FROM cbres
), cbinit AS (
  SELECT CAST(tid - 1 AS INT) AS j, qe AS qce
  FROM trn WHERE tid <= {PQ_CB_K}
), lloyd(it, j, qce) AS (
  SELECT 0, j, qce FROM cbinit
  UNION ALL
  SELECT l.it + 1, l.j,
         flatten(list(COALESCE(
             struct_extract(list_filter(nbl.blks,
                 s -> struct_extract(s, 'j') = l.j
                  AND struct_extract(s, 'm') = mm.m)[1], 'blk'),
             l.qce[(mm.m*{dsub}+1):(mm.m*{dsub}+{dsub})]) ORDER BY mm.m))
  FROM lloyd l
  CROSS JOIN (
    SELECT list({{'j': g.jw, 'm': g.m, 'blk': g.blk}}) AS blks
    FROM (
      SELECT md.jw, md.m, list(md.mu ORDER BY md.d) AS blk
      FROM (
        SELECT el.jw, el.m, el.d,
               CAST(FLOOR(CAST(SUM(el.v) AS DOUBLE) / COUNT(*))
                    AS DOUBLE) AS mu
        FROM (
          SELECT asg.tid, asg.m, asg.jw, dd.d,
                 t2.qe[asg.m*{dsub} + dd.d] AS v
          FROM (
            SELECT t.tid, mm2.m,
                   struct_extract(
                     MIN({{'d': {d2t}, 'j': c.j}}), 'j') AS jw
            FROM trn t
            CROSS JOIN lloyd c
            CROSS JOIN UNNEST(range(0, {PQ_M_BLOCKS})) AS mm2(m)
            GROUP BY t.tid, mm2.m
          ) asg
          JOIN trn t2 ON t2.tid = asg.tid
          CROSS JOIN UNNEST(range(1, {dsub} + 1)) AS dd(d)
        ) el
        GROUP BY el.jw, el.m, el.d
      ) md
      GROUP BY md.jw, md.m
    ) g
  ) nbl
  CROSS JOIN UNNEST(range(0, {PQ_M_BLOCKS})) AS mm(m)
  WHERE l.it < {PQ_LLOYD_ITERS}
  GROUP BY l.it, l.j
), cb AS (
  SELECT j, list_transform(qce, x -> x / {float(PQ_QSCALE)}) AS ce
  FROM lloyd WHERE it = {PQ_LLOYD_ITERS}
)"""
    else:
        cb_sql = f"""cbr AS (
  SELECT vec_id, e FROM nv WHERE vec_id % {PQ_CB_MOD} = {PQ_CB_RES}
  ORDER BY vec_id LIMIT {PQ_CB_K}
), cbres AS (
  SELECT c.vec_id, list(c.e[t.d] - ct.cv[t.d] ORDER BY t.d) AS e
  FROM cbr c
  JOIN cells cl ON cl.vec_id = c.vec_id
  JOIN cent ct ON ct.cent_id = cl.cell
  CROSS JOIN UNNEST(range(1, {dim} + 1)) AS t(d)
  GROUP BY c.vec_id
), cb AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS j,
         e AS ce
  FROM cbres
)"""
    return f"""
WITH {"RECURSIVE " if trained else ""}nv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
), {_cells_ctes(cent_stride)}, {cb_sql}, rv AS (
  SELECT nvv.vec_id, list(nvv.e[t.d] - ct.cv[t.d] ORDER BY t.d) AS re
  FROM nv nvv
  JOIN cells cl ON cl.vec_id = nvv.vec_id
  JOIN cent ct ON ct.cent_id = cl.cell
  CROSS JOIN UNNEST(range(1, {dim} + 1)) AS t(d)
  GROUP BY nvv.vec_id
), enc AS (
  SELECT vec_id,
         {enc_aggs}
  FROM rv CROSS JOIN cb GROUP BY vec_id
), rec AS (
  SELECT en.vec_id,
         list_transform(list_zip(ct.cv, {dec_cat}),
                        p -> p[1] + p[2]) AS xe
  FROM enc en
  JOIN cells cl ON cl.vec_id = en.vec_id
  JOIN cent ct ON ct.cent_id = cl.cell
  {cb_joins}
), rnv AS (
  SELECT vec_id, xe, SQRT(list_dot_product(xe, xe)) AS xn FROM rec
), q AS (
  SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM nv WHERE {q_pred}
), probe AS (
  SELECT q_id, qe, qn, cent_id AS cell,
         ROW_NUMBER() OVER (
           PARTITION BY q_id
           ORDER BY list_dot_product(qe, cv) / (qn * cn) DESC, cent_id
         ) AS prn
  FROM q CROSS JOIN cent
), pairs AS (
  SELECT p.q_id, c2.vec_id,
         list_dot_product(p.qe, r.xe) / (p.qn * r.xn) AS cos_raw
  FROM (SELECT * FROM probe WHERE prn <= {nprobe}) p
  JOIN cells c2 USING (cell)
  JOIN rnv r ON r.vec_id = c2.vec_id
  WHERE c2.vec_id <> p.q_id
), ranked AS (
  SELECT q_id, vec_id, ROUND(cos_raw, 4) AS cos,
         ROW_NUMBER() OVER (
           PARTITION BY q_id ORDER BY cos_raw DESC, vec_id) AS rn
  FROM pairs)
SELECT q_id, vec_id, cos, rn FROM ranked WHERE rn <= {k}
ORDER BY q_id, rn
"""


# round 16: residual IVF+PQ index (quant='pqr')
PIPELINE_ORACLE["ann_pqr_index"] = _ivfpqr_index_sql()
# round 17: Lloyd-TRAINED residual codebook (quant='pqt') — same
# replay with the integer-exact recursive-CTE training stage
PIPELINE_ORACLE["ann_pqt_index"] = _ivfpqr_index_sql(trained=True)
PIPELINE_ORACLE["ann_index"] = _ivfpq_sql()
# Incremental append (round 8): build(A = vec_id%3<>0) then append(B)
# under the FROZEN model — the oracle derives centroids/codebook from
# A only while codes/candidates cover the whole corpus, replaying the
# drift contract append_to_index documents.
PIPELINE_ORACLE["ann_index_append"] = _ivfpq_sql(
    model_pred="AND vec_id % 3 <> 0"
)
# Index deletion (round 14, delete_from_ann_index): model frozen on
# the FULL corpus, candidates restricted to the survivors — the
# append row's drift contract mirrored (tombstoned vectors excluded
# from retrieval, every other vector's score untouched).
PIPELINE_ORACLE["ann_index_delete"] = _ivfpq_sql(
    cand_pred="AND e.vec_id % 11 <> 5"
)


def _ann_filtered_sql() -> str:
    """Filtered vector search (round 14): candidates restricted by the
    vecmeta predicate (shared verbatim from queries.pipeline), model
    full-corpus — the deletion oracle's shape with a predicate-defined
    set. The candidate CTE carries codes only, so the predicate is
    applied as a semi-join back onto the embeddings table (exactly
    what the engine's vecmeta semi-join is)."""
    from ccog_spark.queries.pipeline import ANN_FILTER_PRED

    return _ivfpq_sql(
        cand_pred=(
            "AND e.vec_id IN (SELECT vec_id FROM embeddings WHERE "
            + ANN_FILTER_PRED
            + ")"
        )
    )


PIPELINE_ORACLE["ann_index_filtered"] = _ann_filtered_sql()
# nprobe auto-tune (round 14, VERDICT r13 #6): the probe count is the
# data-dependent auto_nprobe value, replayed in SQL from the cells
# CTE's occupancy — hash match ⇒ identical knob AND identical top-k.
PIPELINE_ORACLE["ann_autoprobe"] = _ivfpq_sql(nprobe="auto")

# Two-stage retrieval (round 12, similarity.ivfpq_rerank_topk): the
# full ADC composition at k = m selects the candidate set (the whole
# _ivfpq_sql query embeds as a subquery — its rank-m cut is
# deterministic, ADC ties break on vec_id in both engines), then the
# exact-cosine re-rank replays over ONLY those rows.
def _rerank_sql(
    k: int = 3,
    m: int = 10,
    q_pred: str = "vec_id % 100 = 0",
    cand_pred: str = "",
) -> str:
    """``cand_pred`` (round 15, filtered hybrid): forwarded verbatim
    to the stage-1 ``_ivfpq_sql`` candidate CTE — the engine applies
    ``vec_filter`` BEFORE ADC ranking, so stage 2 only ever re-ranks
    already-filtered candidates and needs no second filter."""
    return f"""
WITH nv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
), cand AS (
  SELECT q_id, vec_id
  FROM ({_ivfpq_sql(k=m, q_pred=q_pred, cand_pred=cand_pred)}) c
), rq AS (
  SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM nv WHERE {q_pred}
), rx AS (
  SELECT c.q_id, c.vec_id,
         list_dot_product(q.qe, v.e) / (q.qn * v.nrm) AS cos_raw
  FROM cand c JOIN rq q USING (q_id) JOIN nv v USING (vec_id)
), rr AS (
  SELECT q_id, vec_id, ROUND(cos_raw, 4) AS cos,
         ROW_NUMBER() OVER (
           PARTITION BY q_id ORDER BY cos_raw DESC, vec_id) AS rn
  FROM rx)
SELECT q_id, vec_id, cos, rn FROM rr WHERE rn <= {k}
ORDER BY q_id, rn
"""


PIPELINE_ORACLE["ann_rerank"] = _rerank_sql()

# token-window chunking: 64-token chunks every 48 tokens (1-based
# inclusive list slice; tail chunks shorter; md5 of the re-joined
# string matches Spark's concat_ws of the same slice)
PIPELINE_ORACLE["pipeline_chunks"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS tk,
         len(string_split(text, ' ')) AS n
  FROM documents
)
SELECT doc_id,
       CAST((s - 1) // 48 AS INT) AS chunk_idx,
       CAST(LEAST(64, n - s + 1) AS INT) AS n_tok,
       MD5(array_to_string(tk[CAST(s AS INT) : CAST(LEAST(s + 63, n) AS INT)], ' ')) AS h
FROM d, UNNEST(range(1, n + 1, 48)) AS t(s)
ORDER BY doc_id, chunk_idx
"""


def _urls_sql() -> str:
    """DuckDB twin of queries.pipeline.pipeline_urls: synthesizes the
    same messy URLs, replays every canonicalization rule of
    operators.web (fragment/scheme/host/port/tracking/sort/trailing-
    slash), then keep-first + host/domain. Constants imported from the
    operator module — single source of truth."""
    from ccog_spark.operators.web import MULTI_SUFFIXES, TRACKING_KEYS

    tk = ", ".join(f"'{k}'" for k in TRACKING_KEYS)
    sfx = ", ".join(f"'{s}'" for s in MULTI_SUFFIXES)
    return f"""
WITH raw AS (
  SELECT doc_id,
    'HTTPS://' || CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END ||
    source ||
    CASE WHEN LENGTH(source) % 2 = 1 THEN '.Example.co.uk' ELSE '.Example.COM' END ||
    CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END ||
    '/Docs/' || CAST(doc_id % 50 AS VARCHAR) ||
    CASE WHEN doc_id % 3 = 0 THEN '/?utm_source=feed&b=2&ref=rss&a=1'
         WHEN doc_id % 3 = 1 THEN '?b=2&a=1' ELSE '' END ||
    CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END AS u
  FROM documents
), s0 AS (
  SELECT doc_id,
         CASE WHEN regexp_matches(split_part(trim(u), '#', 1), '^[a-zA-Z][a-zA-Z0-9+.-]*://')
              THEN split_part(trim(u), '#', 1)
              ELSE 'http://' || split_part(trim(u), '#', 1) END AS u
  FROM raw
), s1 AS (
  SELECT doc_id, lower(split_part(u, '://', 1)) AS scheme,
         substr(u, LENGTH(split_part(u, '://', 1)) + 4) AS rest
  FROM s0
), s2 AS (
  SELECT *, split_part(split_part(rest, '/', 1), '?', 1) AS hostport,
         substr(rest, LENGTH(split_part(split_part(rest, '/', 1), '?', 1)) + 1) AS pq
  FROM s1
), s3 AS (
  SELECT *, split_part(pq, '?', 1) AS path0,
         CASE WHEN contains(pq, '?')
              THEN substr(pq, LENGTH(split_part(pq, '?', 1)) + 2) ELSE '' END AS q0,
         regexp_replace(lower(hostport), '^(www\\.)+', '') AS h0
  FROM s2
), s4 AS (
  SELECT doc_id, scheme,
         CASE WHEN scheme = 'http' THEN regexp_replace(h0, '(:80)+$', '')
              WHEN scheme = 'https' THEN regexp_replace(h0, '(:443)+$', '')
              ELSE h0 END AS host,
         CASE WHEN regexp_replace(path0, '/+$', '') = '' THEN '/'
              ELSE regexp_replace(path0, '/+$', '') END AS path,
         COALESCE(array_to_string(list_sort(list_filter(string_split(q0, '&'),
           p -> p <> '' AND NOT starts_with(p, 'utm_')
                AND split_part(p, '=', 1) NOT IN ({tk}))), '&'), '') AS qs
  FROM s3
), c AS (
  SELECT doc_id,
         scheme || '://' || host || path ||
         CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS url
  FROM s4
), g AS (
  SELECT url, MIN(doc_id) AS keeper, COUNT(*) AS n_raw
  FROM c GROUP BY url
), h AS (
  SELECT *, split_part(split_part(split_part(url, '://', 2), '/', 1), '?', 1) AS host,
         -- registered_domain strips any ':port' before label-splitting
         regexp_replace(split_part(split_part(split_part(url, '://', 2), '/', 1), '?', 1),
                        ':[0-9]+$', '') AS hp
  FROM g
), h2 AS (
  SELECT *, string_split(hp, '.') AS ll FROM h
)
SELECT url, keeper, n_raw, host,
       CASE WHEN len(ll) <= 2 THEN hp
            WHEN array_to_string(ll[GREATEST(len(ll) - 1, 1):len(ll)], '.') IN ({sfx})
            THEN array_to_string(ll[GREATEST(len(ll) - 2, 1):len(ll)], '.')
            ELSE array_to_string(ll[GREATEST(len(ll) - 1, 1):len(ll)], '.') END AS domain
FROM h2
ORDER BY url
"""


PIPELINE_ORACLE["pipeline_urls"] = _urls_sql()


def _e2e_sql() -> str:
    """DuckDB twin of queries.pipeline.pipeline_e2e — the four-stage
    hygiene pipeline composed from the SAME verified building blocks:
    _QUALITY (pipeline_filter), md5 keep-first (dedup_exact),
    _minhash_ctes + recursive CC (dedup_minhash / dedup_cc, re-based
    onto the filtered corpus via the base arg), and the decontam join
    (pipeline_decontam) reusing the pipe-side shingle hashes."""
    return f"""
WITH RECURSIVE qtoks AS (
  SELECT doc_id, lang, source, n_chars, text, string_split(text, ' ') AS tk
  FROM documents WHERE doc_id % 97 <> 0
), qscored AS (
  SELECT doc_id, lang, source, text, {_QUALITY} AS quality FROM qtoks
), qkept AS (
  SELECT * FROM qscored WHERE quality >= 0.5
), pipe AS (
  SELECT doc_id, lang, source, text FROM (
    SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY MD5(text)) AS keep
    FROM qkept
  ) WHERE keep
), {_minhash_ctes(3, 0.4, base="pipe")},
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM mpairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM mpairs
), reach AS (
  SELECT u AS doc_id, u AS label FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.v AS doc_id, r.label FROM reach r JOIN edges e ON e.u = r.doc_id
), clusters AS (
  SELECT doc_id, MIN(label) AS cluster FROM reach GROUP BY doc_id
), surv AS (
  SELECT p.* FROM pipe p LEFT JOIN clusters c USING (doc_id)
  WHERE c.doc_id IS NULL OR c.cluster = p.doc_id
), btoks AS (
  SELECT doc_id, text, string_split(text, ' ') AS tk
  FROM documents WHERE doc_id % 97 = 0
), bthashes AS (
  SELECT doc_id, text, tk, {_TOKEN_HASHES} AS hs FROM btoks
), bgrams AS (
  SELECT DISTINCT unnest({_SH_HASHES}) AS h FROM bthashes
), contaminated AS (
  SELECT DISTINCT s.doc_id
  FROM (SELECT h2.doc_id, unnest(h2.shh) AS h
        FROM hashes h2 JOIN surv USING (doc_id)) s
  JOIN bgrams b USING (h)
), clean AS (
  SELECT s.doc_id, s.lang, s.source, len(t.tk) AS nt
  FROM surv s JOIN toks t USING (doc_id)
  WHERE s.doc_id NOT IN (SELECT doc_id FROM contaminated)
)
SELECT lang, source, COUNT(*) AS kept, CAST(SUM(nt) AS BIGINT) AS tokens
FROM clean GROUP BY lang, source
ORDER BY lang, source
"""


PIPELINE_ORACLE["pipeline_e2e"] = _e2e_sql()


PIPELINE_ORACLE["pipeline_tfidf"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
), tb AS (
  SELECT doc_id, {roll_hash_sql_duckdb('t')} % 64 AS bucket
  FROM toks WHERE t <> ''
), tf AS (
  SELECT doc_id, bucket, COUNT(*) AS tf FROM tb GROUP BY doc_id, bucket
), dfb AS (
  SELECT bucket, COUNT(*) AS df FROM tf GROUP BY bucket
), n AS (
  SELECT COUNT(*) AS n FROM documents
)
SELECT tf.doc_id, tf.bucket, CAST(tf.tf AS BIGINT) AS tf,
       CAST(FLOOR(tf.tf * ((n.n + 1.0) / (dfb.df + 1.0)) * 10000 + 0.5)
            AS BIGINT) / 10000.0 AS w
FROM tf JOIN dfb USING (bucket) CROSS JOIN n
ORDER BY doc_id, bucket
"""


# Char-trigram LM scoring twin: gram extraction by substr positions
# (DuckDB range(a, b) is exclusive of b); context counts and the
# smoothing vocab are DERIVED from the gram table exactly as the
# operator does (prefix-sum / distinct continuation chars — one corpus
# pass); add-one smoothing with exact integer-ratio doubles, per-term
# half-up micro-quantization summed as BIGINTs — no ln anywhere (repo
# float rule; see operators/lm).
PIPELINE_ORACLE["pipeline_lm"] = """
WITH g AS (
  SELECT doc_id, substr(text, CAST(i AS INT), 3) AS gram,
         substr(text, CAST(i AS INT), 2) AS ctx
  FROM documents, UNNEST(range(1, length(text) - 1)) AS t(i)
  WHERE length(text) >= 3
), gc AS (
  SELECT gram, COUNT(*) AS c FROM g GROUP BY gram
), cc AS (
  SELECT substr(gram, 1, 2) AS ctx, SUM(c) AS c FROM gc GROUP BY 1
), v AS (
  SELECT COUNT(DISTINCT substr(gram, 3, 1)) AS v FROM gc
), q AS (
  SELECT g.doc_id,
         CAST(FLOOR(((gc.c + 1) / CAST(cc.c + v.v AS DOUBLE)) * 1000000
                    + 0.5) AS BIGINT) AS q
  FROM g JOIN gc USING (gram) JOIN cc USING (ctx) CROSS JOIN v
)
SELECT doc_id, COUNT(*) AS n_grams,
       CAST(FLOOR(CAST(SUM(q) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
         / 1000000.0 AS score
FROM q GROUP BY doc_id
ORDER BY doc_id
"""


# Line-dedup-with-rebuild twin: same 8-token line synthesis, the same
# corpus-wide keep-first rank (first by doc_id, then position), ordered
# STRING_AGG rebuild; docs losing every line come back with '' text.
PIPELINE_ORACLE["pipeline_line_dedup"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS tk,
         len(string_split(text, ' ')) AS n
  FROM documents
), l AS (
  SELECT doc_id,
         CAST((s - 1) // 8 AS INT) AS pos,
         array_to_string(tk[CAST(s AS INT) : CAST(LEAST(s + 7, n) AS INT)], ' ') AS line
  FROM d, UNNEST(range(1, n + 1, 8)) AS t(s)
), ranked AS (
  SELECT doc_id, pos, line,
         ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
  FROM l
), agg AS (
  SELECT doc_id,
         COALESCE(STRING_AGG(line, chr(10) ORDER BY pos)
                  FILTER (WHERE rn = 1), '') AS text,
         COUNT(*) AS n_lines,
         CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
  FROM ranked GROUP BY doc_id
)
SELECT doc_id, text, n_lines, n_dropped FROM agg
ORDER BY doc_id
"""


PIPELINE_ORACLE["pipeline_chunk_dedup"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS tk,
         len(string_split(text, ' ')) AS n
  FROM documents
), ch AS (
  SELECT doc_id,
         CAST((s - 1) // 64 AS INT) AS chunk_idx,
         MD5(array_to_string(tk[CAST(s AS INT) : CAST(LEAST(s + 63, n) AS INT)], ' ')) AS h
  FROM d, UNNEST(range(1, n + 1, 64)) AS t(s)
), ranked AS (
  SELECT doc_id, chunk_idx, h,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS rn
  FROM ch
)
SELECT doc_id, COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
FROM ranked GROUP BY doc_id
ORDER BY doc_id
"""

# Exact-substring (span) dedup, round 8: k=8 token windows, global
# keep-first by (doc_id, position), covered POSITIONS set-unioned,
# ordered rebuild. The oracle may use a window over gram content
# (oracle-side only — the ENGINE spells keep-first as a combinable
# min-struct aggregate; PLANS.md skew ledger).
PIPELINE_ORACLE["pipeline_span_dedup"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS tk,
         len(string_split(text, ' ')) AS n
  FROM documents
), g AS (
  SELECT doc_id, CAST(p AS INT) AS p,
         array_to_string(tk[CAST(p + 1 AS INT) : CAST(p + 8 AS INT)], ' ') AS gram
  FROM d, UNNEST(range(0, n - 8 + 1)) AS t(p)
  WHERE n >= 8
), ranked AS (
  SELECT doc_id, p,
         ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, p) AS rn
  FROM g
), dropped AS (
  SELECT DISTINCT doc_id, CAST(p + off AS INT) AS pos
  FROM (SELECT doc_id, p FROM ranked WHERE rn > 1) s,
       UNNEST(range(0, 8)) AS o(off)
), toks AS (
  SELECT doc_id, CAST(i AS INT) AS pos, tk[CAST(i + 1 AS INT)] AS tok
  FROM d, UNNEST(range(0, n)) AS t(i)
), kept AS (
  SELECT t.doc_id, t.pos, t.tok
  FROM toks t LEFT JOIN dropped x
    ON t.doc_id = x.doc_id AND t.pos = x.pos
  WHERE x.pos IS NULL
), agg AS (
  SELECT doc_id, STRING_AGG(tok, ' ' ORDER BY pos) AS text,
         COUNT(*) AS kept_n
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.text, '') AS text,
       CAST(d.n AS INT) AS n_tokens,
       CAST(d.n - COALESCE(a.kept_n, 0) AS BIGINT) AS n_dropped
FROM d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY d.doc_id
"""

# SemDeDup-style cluster-scoped semantic dedup, round 8 (round 9:
# HIERARCHICAL two-hop assignment; round 10: √C-SIZED coarse level +
# orphan-cell fallback parity): augmented corpus (same planting as
# dedup_embed), deterministic IVF centroid selection, then the
# IVF-on-centroids assign the engine runs at scale — with C centroids
# the coarse rank stride is ⌈C/⌈√C⌉⌉ (cst CTE, pure integer math
# mirroring the engine's isqrt rule), every stride-th centroid BY
# RANK forms the coarse level, each centroid maps once to its nearest
# coarse centroid, each vector picks its coarse cell and argmaxes
# only that cell's member centroids. Vectors whose coarse cell has NO
# cmap members (unreachable unless float asymmetry — an orphan cell
# loses every hop-1 tie to its identical smaller-id twin) replay the
# engine's exact full-centroid fallback via cells_o instead of being
# silently dropped by the inner joins. Every hop tie-breaks on
# smallest id (ROW_NUMBER cos DESC, id ASC — mirroring numpy's
# first-occurrence argmax over id-ascending arrays). The oracle
# windows over vec_id for the argmaxes (oracle-side only — the
# engine assigns map-side via broadcast centroid matrices, and its
# drop decision is distinct + left join).
PIPELINE_ORACLE["dedup_semantic"] = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), aug AS (
  SELECT vec_id, e FROM base
  UNION ALL
  SELECT vec_id + 10000000 AS vec_id, list_concat([e[1] + 0.01], e[2:]) AS e
  FROM base WHERE vec_id % 10 = 0
), nv AS (
  SELECT vec_id, e, SQRT(list_dot_product(e, e)) AS nrm FROM aug
), cent AS (
  SELECT vec_id AS cent_id, e AS cv, nrm AS cn,
         ROW_NUMBER() OVER (ORDER BY vec_id) AS crk
  FROM nv WHERE vec_id % 25 = 1
), cst AS (
  SELECT GREATEST(
           (COUNT(*) + CAST(CEIL(SQRT(COUNT(*))) AS BIGINT) - 1)
           // GREATEST(CAST(CEIL(SQRT(COUNT(*))) AS BIGINT), 1),
           1) AS stride
  FROM cent
), coarse AS (
  SELECT cent_id AS co_id, cv AS gv, cn AS gn
  FROM cent, cst WHERE (crk - 1) % cst.stride = 0
), cmap AS (
  SELECT cent_id, co_id FROM (
    SELECT c.cent_id, g.co_id,
           ROW_NUMBER() OVER (
             PARTITION BY c.cent_id
             ORDER BY list_dot_product(c.cv, g.gv) / (c.cn * g.gn)
                      DESC, g.co_id
           ) AS rn
    FROM cent c CROSS JOIN coarse g
  ) WHERE rn = 1
), hop1 AS (
  SELECT vec_id, co_id FROM (
    SELECT v.vec_id, g.co_id,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_dot_product(v.e, g.gv) / (v.nrm * g.gn)
                      DESC, g.co_id
           ) AS rn
    FROM nv v CROSS JOIN coarse g
  ) WHERE rn = 1
), cells_h AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cent_id AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_dot_product(v.e, c.cv) / (v.nrm * c.cn)
                      DESC, c.cent_id
           ) AS rn
    FROM nv v
    JOIN hop1 h ON v.vec_id = h.vec_id
    JOIN cmap m ON m.co_id = h.co_id
    JOIN cent c ON c.cent_id = m.cent_id
  ) WHERE rn = 1
), cells_o AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cent_id AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_dot_product(v.e, c.cv) / (v.nrm * c.cn)
                      DESC, c.cent_id
           ) AS rn
    FROM nv v
    JOIN hop1 h ON v.vec_id = h.vec_id
    CROSS JOIN cent c
    WHERE h.co_id NOT IN (SELECT co_id FROM cmap)
  ) WHERE rn = 1
), cells AS (
  SELECT * FROM cells_h UNION ALL SELECT * FROM cells_o
), j AS (
  SELECT nv.vec_id, nv.e, nv.nrm, c.cell
  FROM nv JOIN cells c ON nv.vec_id = c.vec_id
), dups AS (
  SELECT DISTINCT a.vec_id
  FROM j a JOIN j b ON a.cell = b.cell AND b.vec_id < a.vec_id
  WHERE ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) >= 0.98
)
SELECT j.vec_id, j.cell, d.vec_id IS NULL AS is_keeper
FROM j LEFT JOIN dups d ON j.vec_id = d.vec_id
ORDER BY j.vec_id
"""

# Per-source corpus profile, round 8: composes the text_analysis CTE
# (one truth for per-doc metrics) with the exact-dup keeper window and
# per-source integer aggregates (quantized ratio sums — float rule).
_TA_BODY = PIPELINE_ORACLE["text_analysis"].rsplit("ORDER BY doc_id", 1)[0]
PIPELINE_ORACLE["corpus_profile"] = f"""
WITH ta AS ({_TA_BODY}),
dup AS (
  SELECT doc_id,
         doc_id = MIN(doc_id) OVER (PARTITION BY MD5(text)) AS is_keeper
  FROM documents
)
SELECT d.source,
       COUNT(*) AS n_docs,
       CAST(SUM(ta.n_tokens) AS BIGINT) AS sum_tokens,
       CAST(SUM(CASE WHEN dup.is_keeper THEN 0 ELSE 1 END) AS BIGINT) AS n_dup,
       CAST(SUM(CAST(FLOOR(ta.distinct_ratio * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_dr_q,
       CAST(SUM(CASE WHEN ta.lang_pred = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
FROM documents d
JOIN ta ON d.doc_id = ta.doc_id
JOIN dup ON d.doc_id = dup.doc_id
GROUP BY d.source
ORDER BY d.source
"""


# BPE tokenization (round 12): a FULL data-dependent replay of the
# engine's train → encode → id construction (operators/bpe.py) in pure
# SQL — no baked merge tables, so the oracle holds at every scale
# factor. Pieces:
#
# - ``train``: the greedy merge loop as a recursive CTE. Each iteration
#   counts adjacent symbol pairs over the previous state (DuckDB allows
#   aggregates over the recursive reference), picks the max-count pair
#   with lexicographic (a, b) tie-break — the trainer's exact heap key —
#   and rewrites every word with the LEFT-TO-RIGHT single-pair pass:
#   within each run of consecutive candidate positions the pass merges
#   the even offsets ('aaa' + (a,a) → ['aa','a']), which is the
#   gaps-and-islands parity rule (island = j − rank-among-candidates).
# - ``enc``: the ascending-rank encode loop (merge ONE occurrence per
#   step: lowest rank, then leftmost — ORDER BY rnk, i LIMIT 1).
# - ``vocab_map``: vocabulary(merges, alphabet) — sorted base symbols
#   (chars + char·EOW + merge operands, minus produced) then merged
#   symbols in rank order; duplicate produced strings keep the LAST id
#   (the engine's dict-comprehension semantics) via MAX(id).
#
# EOW is chr(1), matching operators.bpe.EOW.
PIPELINE_ORACLE["pipeline_tokenize"] = """
WITH RECURSIVE
words0 AS (
  SELECT w AS word, COUNT(*) AS cnt
  FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents) t
  WHERE w <> '' GROUP BY w
),
winit AS (
  SELECT word, cnt,
         list_append(sp[:LENGTH(word)-1], sp[-1] || chr(1)) AS syms
  FROM (SELECT word, cnt, string_split(word, '') AS sp FROM words0) t
),
train(it, word, cnt, syms, ma, mb) AS (
  SELECT 0, word, cnt, syms, NULL::VARCHAR, NULL::VARCHAR FROM winit
  UNION ALL
  SELECT it, word, cnt,
         list(CASE WHEN sel THEN s0 || s1 ELSE s0 END ORDER BY j)
           FILTER (WHERE NOT consumed),
         ma, mb
  FROM (
    SELECT *,
           COALESCE(LAG(sel) OVER (PARTITION BY word ORDER BY j), false)
             AS consumed
    FROM (
      SELECT *,
             cand AND (crn - MIN(crn) OVER (
               PARTITION BY word, island, cand)) % 2 = 0 AS sel
      FROM (
        SELECT *, j - crn AS island
        FROM (
          SELECT *,
                 ROW_NUMBER() OVER (
                   PARTITION BY word, cand ORDER BY j) AS crn
          FROM (
            SELECT t.it + 1 AS it, t.word, t.cnt, bp.a AS ma, bp.b AS mb,
                   u.j, t.syms[u.j] AS s0,
                   CASE WHEN u.j < len(t.syms) THEN t.syms[u.j + 1] END AS s1,
                   (u.j < len(t.syms) AND t.syms[u.j] = bp.a
                    AND t.syms[u.j + 1] = bp.b) AS cand
            FROM train t,
                 (SELECT a, b FROM (
                    SELECT s.syms[u2.i] AS a, s.syms[u2.i + 1] AS b,
                           SUM(s.cnt) AS c
                    FROM train s, UNNEST(range(1, len(s.syms))) AS u2(i)
                    GROUP BY 1, 2) pc
                  ORDER BY c DESC, a, b LIMIT 1) bp,
                 UNNEST(range(1, len(t.syms) + 1)) AS u(j)
            WHERE t.it < 60
          ) l1
        ) l2
      ) l3
    ) l4
  ) l5
  GROUP BY it, word, cnt, ma, mb
),
merges AS (
  SELECT it - 1 AS rnk, MIN(ma) AS a, MIN(mb) AS b
  FROM train WHERE it >= 1 GROUP BY it
),
enc(it, word, syms) AS (
  SELECT 0, word, syms FROM winit
  UNION ALL
  SELECT it + 1, word,
         list_concat(
           list_concat(syms[:bi - 1], [syms[bi] || syms[bi + 1]]),
           syms[bi + 2:])
  FROM (
    SELECT e0.it, e0.word, e0.syms,
           (SELECT u.i
            FROM UNNEST(range(1, len(e0.syms))) AS u(i)
            JOIN merges m
              ON m.a = e0.syms[u.i] AND m.b = e0.syms[u.i + 1]
            ORDER BY m.rnk, u.i LIMIT 1) AS bi
    FROM enc e0
  ) e
  WHERE bi IS NOT NULL
),
final_enc AS (
  SELECT word, max_by(syms, it) AS syms FROM enc GROUP BY word
),
alpha AS (
  SELECT DISTINCT c
  FROM (SELECT UNNEST(string_split(text, '')) AS c FROM documents) t
  WHERE c <> '' AND c <> ' '
),
vocab_list AS (
  SELECT u, ROW_NUMBER() OVER (ORDER BY grp, su, r) - 1 AS id
  FROM (
    SELECT u, 0 AS grp, u AS su, 0 AS r FROM (
      SELECT c AS u FROM alpha
      UNION SELECT c || chr(1) FROM alpha
      UNION SELECT a FROM merges
      UNION SELECT b FROM merges
    ) b
    WHERE u NOT IN (SELECT a || b FROM merges)
    UNION ALL
    SELECT a || b, 1, '', rnk FROM merges
  ) v
),
vocab_map AS (
  SELECT u, MAX(id) AS id FROM vocab_list GROUP BY u
),
doc_words AS (
  SELECT d.doc_id, u.wi, string_split(d.text, ' ')[u.wi] AS word
  FROM documents d,
       UNNEST(range(1, len(string_split(d.text, ' ')) + 1)) AS u(wi)
),
doc_tokens AS (
  SELECT dw.doc_id, dw.wi, s.si, fe.syms[s.si] AS u
  FROM doc_words dw
  JOIN final_enc fe USING (word),
       UNNEST(range(1, len(fe.syms) + 1)) AS s(si)
  WHERE dw.word <> ''
),
tok_ids AS (
  SELECT doc_id, id,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY wi, si) AS rn
  FROM doc_tokens JOIN vocab_map USING (u)
)
SELECT d.doc_id,
       CAST(COALESCE(t.n, 0) AS INT) AS n_tokens,
       COALESCE(t.first8, '') AS first8
FROM documents d LEFT JOIN (
  SELECT doc_id, COUNT(*) AS n,
         STRING_AGG(CASE WHEN rn <= 8 THEN CAST(id AS VARCHAR) END,
                    ',' ORDER BY rn) AS first8
  FROM tok_ids GROUP BY doc_id
) t USING (doc_id)
ORDER BY d.doc_id
"""


# BM25 retrieval (round 12, text.bm25_topk): full replay — tokenize,
# TF/DF/dl, N and avgdl as plan-level aggregates, the rational idf
# (N − df + 0.5)/(df + 0.5) (no ln in the hashed path — same precedent
# as hashed_tfidf), per-term half-up 1e6 quantization, BIGINT sums.
# Double constants are Python-computed reprs so both engines parse the
# identical IEEE values; association order mirrors the engine exactly.
def _bm25_sql(
    k: int = 5,
    q_cte: str | None = None,
    corpus_pred: str | None = None,
    cand_pred: str | None = None,
) -> str:
    """``q_cte``: SQL for the (q_id, t) DISTINCT query-term set;
    defaults to the corpus-derived registry batch. The scoring body is
    ALWAYS the unpruned full replay — the engine's max-score pruning
    (round 13) is lossless, so the engaged-path row
    (pipeline_bm25_pruned) reuses this oracle verbatim with a fixed
    VALUES query set.

    ``corpus_pred`` (round 14): SQL predicate restricting the SCORED
    corpus (tf/dl/df/N/avgdl all derive from the filtered set) — the
    from-scratch-over-SURVIVORS truth the index-deletion row must
    match. The query CTE still reads the full table: a deleted
    document stops being findable, not askable.

    ``cand_pred`` (round 14, filtered retrieval): predicate
    restricting CANDIDATES only — df/N/avgdl stay corpus-wide (Lucene
    filter semantics, the doc_filter contract of query_bm25_index),
    the opposite statistics rule from ``corpus_pred``'s deletion
    semantics."""
    corpus = (
        "documents" if corpus_pred is None
        else f"(SELECT * FROM documents WHERE {corpus_pred})"
    )
    cand_join = ""
    if cand_pred is not None:
        cand_join = (
            "JOIN (SELECT doc_id FROM documents WHERE "
            + cand_pred
            + ") cand USING (doc_id)\n  "
        )
    if q_cte is None:
        q_cte = """
  SELECT DISTINCT q_id, t FROM (
    SELECT doc_id AS q_id,
           UNNEST(string_split(text, ' ')[1:3]) AS t
    FROM documents WHERE doc_id % 97 = 11) y
  WHERE t <> ''"""
    return f"""
WITH toks AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS t
    FROM {corpus} corpus_d) x
  WHERE t <> ''
), tf AS (
  SELECT doc_id, t, COUNT(*) AS tf FROM toks GROUP BY 1, 2
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1
), dfs AS (
  SELECT t, COUNT(*) AS df FROM tf GROUP BY 1
), stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl
), q AS ({q_cte}
), j AS (
  SELECT q.q_id, tf.doc_id,
         CAST(FLOOR(
           (((s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
            * ((tf.tf * 2.2) /
               (tf.tf + 1.2 * (0.25 + 0.75 *
                 (dl.dl / (CAST(s.sum_dl AS DOUBLE) / s.n_docs))))))
           * 1000000.0 + 0.5) AS BIGINT) AS tq
  FROM tf
  JOIN q USING (t)
  JOIN dfs USING (t)
  JOIN dl USING (doc_id)
  {cand_join}CROSS JOIN stats s
), scored AS (
  SELECT q_id, doc_id, CAST(SUM(tq) AS BIGINT) AS score
  FROM j GROUP BY q_id, doc_id
), ranked AS (
  SELECT q_id, doc_id, score,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY q_id ORDER BY score DESC, doc_id) AS INT) AS rn
  FROM scored)
SELECT q_id, doc_id, score, rn FROM ranked WHERE rn <= {k}
ORDER BY q_id, rn
"""


PIPELINE_ORACLE["pipeline_bm25"] = _bm25_sql(5)


def _bm25_pruned_q_cte() -> str:
    """VALUES-based (q_id, t) set replaying the engaged-path batch —
    imported from queries.pipeline so engine and oracle can't drift."""
    from ccog_spark.queries.pipeline import BM25_PRUNED_QUERY_BATCH

    rows = []
    for q_id, q_text in BM25_PRUNED_QUERY_BATCH:
        for t in dict.fromkeys(q_text.split(" ")):  # distinct, order-free
            if t:
                rows.append(f"({q_id}, '{t}')")
    # CAST: DuckDB VALUES integers are INT32; the engine's q_id is long
    return (
        "\n  SELECT CAST(q_id AS BIGINT) AS q_id, t FROM (VALUES "
        + ", ".join(rows)
        + ") AS v(q_id, t)"
    )


# Engaged-path row (round 13): SAME unpruned scoring SQL, fixed
# rare+stopword query batch — the engine side runs with the pruning
# planner ENGAGED (min_postings=0), so a hash match here proves the
# max-score cut lossless on the driver's own comparison.
PIPELINE_ORACLE["pipeline_bm25_pruned"] = _bm25_sql(
    5, q_cte=_bm25_pruned_q_cte()
)

# Block-max engaged-path row (round 15): same unpruned scoring SQL,
# same fixed rare+stopword batch — the engine side answers FROM an
# index built with per-(term, block) tf ceilings and the BlockMaxWAND
# candidate cut engaged on top of max-score (min_postings=0). A hash
# match proves the block cut lossless on the driver's own comparison.
PIPELINE_ORACLE["pipeline_bm25_blockmax"] = _bm25_sql(
    5, q_cte=_bm25_pruned_q_cte()
)

# Persisted-index row (round 13, text_index.query_bm25_index): the
# engine answers from the bucket-partitioned parquet index; results
# must equal the from-scratch computation, so the oracle is the
# pipeline_bm25 SQL VERBATIM — one truth, two execution paths (the
# ann_index precedent).
PIPELINE_ORACLE["pipeline_bm25_index"] = _bm25_sql(5)

# Incremental text-index growth (round 13): build on 6/7 + append 1/7
# must equal the from-scratch computation over the union corpus — the
# ann_index_append equivalence contract on the text side.
PIPELINE_ORACLE["pipeline_bm25_index_append"] = _bm25_sql(5)


def _bm25_filtered_sql() -> str:
    """Filtered-retrieval oracle (round 14): candidates restricted by
    the docmeta predicate, statistics corpus-wide — the predicate is
    imported from queries.pipeline so engine and oracle can't drift."""
    from ccog_spark.queries.pipeline import BM25_FILTER_PRED

    return _bm25_sql(5, cand_pred=BM25_FILTER_PRED)


PIPELINE_ORACLE["pipeline_bm25_index_filtered"] = _bm25_filtered_sql()

# Multi-field BM25F (round 14, text.bm25f_topk): title = words 1-5,
# body = the rest (synthesized — COALESCE guards DuckDB's NULL
# array_to_string([])), weights 2:1, shared b = 0.75 / k1 = 1.2.
# Float discipline: per-field weighted normalized tf quantized
# half-up at 1e9 (exact BIGINT field sum), per-term saturating score
# quantized at 1e6, BIGINT score sum — every association spelled
# exactly as the engine's column expressions.
_BM25F_SQL = """
WITH fielded AS (
  SELECT doc_id,
         COALESCE(array_to_string(string_split(text, ' ')[1:5], ' '), '')
           AS title,
         COALESCE(array_to_string(string_split(text, ' ')[6:], ' '), '')
           AS body
  FROM documents
), nd AS (
  SELECT COUNT(*) AS n_docs FROM documents
), t_toks AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, UNNEST(string_split(title, ' ')) AS t FROM fielded) x
  WHERE t <> ''
), b_toks AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, UNNEST(string_split(body, ' ')) AS t FROM fielded) x
  WHERE t <> ''
), t_tf AS (
  SELECT doc_id, t, COUNT(*) AS tf FROM t_toks GROUP BY 1, 2
), b_tf AS (
  SELECT doc_id, t, COUNT(*) AS tf FROM b_toks GROUP BY 1, 2
), t_dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM t_toks GROUP BY 1
), b_dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM b_toks GROUP BY 1
), t_stats AS (
  SELECT SUM(dl) AS sum_dl FROM t_dl
), b_stats AS (
  SELECT SUM(dl) AS sum_dl FROM b_dl
), t_qf AS (
  SELECT f.doc_id, f.t,
         CAST(FLOOR(2.0 * (f.tf / (0.25 + 0.75 *
             (d.dl / (CAST(s.sum_dl AS DOUBLE) / nd.n_docs))))
           * 1000000000.0 + 0.5) AS BIGINT) AS qf
  FROM t_tf f JOIN t_dl d USING (doc_id)
  CROSS JOIN t_stats s CROSS JOIN nd
), b_qf AS (
  SELECT f.doc_id, f.t,
         CAST(FLOOR(1.0 * (f.tf / (0.25 + 0.75 *
             (d.dl / (CAST(s.sum_dl AS DOUBLE) / nd.n_docs))))
           * 1000000000.0 + 0.5) AS BIGINT) AS qf
  FROM b_tf f JOIN b_dl d USING (doc_id)
  CROSS JOIN b_stats s CROSS JOIN nd
), combined AS (
  SELECT doc_id, t, CAST(SUM(qf) AS BIGINT) AS qsum FROM (
    SELECT * FROM t_qf UNION ALL SELECT * FROM b_qf) u
  GROUP BY doc_id, t
), dfs AS (
  SELECT t, COUNT(*) AS df FROM (
    SELECT DISTINCT doc_id, t FROM (
      SELECT doc_id, t FROM t_tf UNION ALL SELECT doc_id, t FROM b_tf) v
  ) w GROUP BY t
), q AS (
  SELECT DISTINCT q_id, t FROM (
    SELECT doc_id AS q_id,
           UNNEST(string_split(text, ' ')[1:3]) AS t
    FROM documents WHERE doc_id % 97 = 11) y
  WHERE t <> ''
), j AS (
  SELECT q.q_id, c.doc_id,
         CAST(FLOOR(
           (((nd.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
            * (2.2 * (c.qsum / 1000000000.0)))
           / (1.2 + (c.qsum / 1000000000.0))
           * 1000000.0 + 0.5) AS BIGINT) AS tq
  FROM combined c
  JOIN q ON q.t = c.t
  JOIN dfs ON dfs.t = c.t
  CROSS JOIN nd
), scored AS (
  SELECT q_id, doc_id, CAST(SUM(tq) AS BIGINT) AS score
  FROM j GROUP BY q_id, doc_id
), ranked AS (
  SELECT q_id, doc_id, score,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY q_id ORDER BY score DESC, doc_id) AS INT) AS rn
  FROM scored)
SELECT q_id, doc_id, score, rn FROM ranked WHERE rn <= 5
ORDER BY q_id, rn
"""

PIPELINE_ORACLE["pipeline_bm25f"] = _BM25F_SQL
# Index-resident BM25F (round 15): shared field-combination and
# scoring code ⇒ bit-identical to the inline operator — one SQL
# truth, two execution paths (the query_bm25_index contract).
PIPELINE_ORACLE["pipeline_bm25f_index"] = _BM25F_SQL


def _diversified_sql() -> str:
    """Diversified retrieval (round 14, text.diversify_topk): the
    bm25 top-20 SQL VERBATIM as the base list, then the same two
    windows the engine runs — rank within (q_id, source) by rn, keep
    ≤ 2, re-rank by (score DESC, doc_id), cut at 5."""
    base = _bm25_sql(20)
    return f"""
WITH ranked_base AS ({base}
), grouped AS (
  SELECT rb.q_id, rb.doc_id, rb.score, rb.rn, d.source,
         ROW_NUMBER() OVER (
           PARTITION BY rb.q_id, d.source ORDER BY rb.rn) AS grp_rn
  FROM ranked_base rb JOIN documents d USING (doc_id)
), recut AS (
  SELECT q_id, doc_id, score, source,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY q_id ORDER BY score DESC, doc_id) AS INT) AS rn
  FROM grouped WHERE grp_rn <= 2)
SELECT q_id, doc_id, score, source, rn FROM recut WHERE rn <= 5
ORDER BY q_id, rn
"""


PIPELINE_ORACLE["pipeline_diversified"] = _diversified_sql()

# Exact phrase search (round 14, text.phrase_match — VERDICT r13 #5):
# full adjacency replay. Positions are 1-based indices in the RAW
# whitespace split (empty tokens filtered, positions kept — a phrase
# never matches across a double space, identically in both engines);
# phrase terms carry their 0-based offsets; a document matches at an
# anchor = pos − i that collects ALL distinct offsets; n_matches
# counts such anchors. Integer-only — no float anywhere.
_PHRASE_SQL = """
WITH toks AS (
  SELECT d.doc_id, u.wi AS pos, string_split(d.text, ' ')[u.wi] AS t
  FROM documents d,
       UNNEST(range(1, len(string_split(d.text, ' ')) + 1)) AS u(wi)
  WHERE string_split(d.text, ' ')[u.wi] <> ''
), ph AS (
  SELECT doc_id AS q_id, string_split(text, ' ')[2:4] AS phr
  FROM documents WHERE doc_id % 101 = 7
), pt AS (
  SELECT q_id, u.wi - 1 AS i, phr[u.wi] AS t
  FROM ph, UNNEST(range(1, len(phr) + 1)) AS u(wi)
  WHERE phr[u.wi] <> ''
), pn AS (
  SELECT q_id, COUNT(DISTINCT i) AS n FROM pt GROUP BY q_id
), m AS (
  SELECT pt.q_id, toks.doc_id, toks.pos - pt.i AS anchor, pt.i
  FROM toks JOIN pt USING (t)
), hits AS (
  SELECT q_id, doc_id, anchor, COUNT(DISTINCT i) AS k
  FROM m GROUP BY q_id, doc_id, anchor
)
SELECT h.q_id, h.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
FROM hits h JOIN pn USING (q_id)
WHERE h.k = pn.n
GROUP BY h.q_id, h.doc_id
ORDER BY q_id, doc_id
"""

PIPELINE_ORACLE["pipeline_phrase"] = _PHRASE_SQL
# Index-backed phrase search: shared adjacency core ⇒ bit-identical to
# the inline operator — one SQL truth, two execution paths.
PIPELINE_ORACLE["pipeline_phrase_index"] = _PHRASE_SQL

# Unordered proximity search (round 14, text.proximity_match): same
# tokenization/phrase batch as the exact rows; a document matches
# where some 5-position window starting AT a matching token contains
# every phrase offset's term in any order (count_distinct(i) over the
# window = n); n_matches counts qualifying window starts. Duplicate
# phrase terms degenerate to distinct-term coverage — identically in
# both engines (one in-window token matches all its term's offsets).
_PROXIMITY_SQL = """
WITH toks AS (
  SELECT d.doc_id, u.wi AS pos, string_split(d.text, ' ')[u.wi] AS t
  FROM documents d,
       UNNEST(range(1, len(string_split(d.text, ' ')) + 1)) AS u(wi)
  WHERE string_split(d.text, ' ')[u.wi] <> ''
), ph AS (
  SELECT doc_id AS q_id, string_split(text, ' ')[2:4] AS phr
  FROM documents WHERE doc_id % 101 = 7
), pt AS (
  SELECT q_id, u.wi - 1 AS i, phr[u.wi] AS t
  FROM ph, UNNEST(range(1, len(phr) + 1)) AS u(wi)
  WHERE phr[u.wi] <> ''
), pn AS (
  SELECT q_id, COUNT(DISTINCT i) AS n FROM pt GROUP BY q_id
), m AS (
  SELECT pt.q_id, toks.doc_id, toks.pos, pt.i
  FROM toks JOIN pt USING (t)
), wins AS (
  SELECT DISTINCT q_id, doc_id, pos AS w0 FROM m
), cover AS (
  SELECT w.q_id, w.doc_id, w.w0, COUNT(DISTINCT m.i) AS k
  FROM wins w JOIN m
    ON m.q_id = w.q_id AND m.doc_id = w.doc_id
   AND m.pos BETWEEN w.w0 AND w.w0 + 4
  GROUP BY w.q_id, w.doc_id, w.w0
)
SELECT c.q_id, c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
FROM cover c JOIN pn USING (q_id)
WHERE c.k = pn.n
GROUP BY c.q_id, c.doc_id
ORDER BY q_id, doc_id
"""

PIPELINE_ORACLE["pipeline_proximity"] = _PROXIMITY_SQL

# Snippet extraction (round 14, text.snippet_match): the phrase
# anchors CTE chain verbatim, then first_pos = MIN(anchor) per
# (query, doc) and the snippet = the RAW whitespace split sliced at
# [GREATEST(first_pos - 3, 1), first_pos + n - 1 + 3] re-joined with
# single spaces — same positions rule, same slice, both engines.
_SNIPPET_SQL = """
WITH toks AS (
  SELECT d.doc_id, u.wi AS pos, string_split(d.text, ' ')[u.wi] AS t
  FROM documents d,
       UNNEST(range(1, len(string_split(d.text, ' ')) + 1)) AS u(wi)
  WHERE string_split(d.text, ' ')[u.wi] <> ''
), ph AS (
  SELECT doc_id AS q_id, string_split(text, ' ')[2:4] AS phr
  FROM documents WHERE doc_id % 101 = 7
), pt AS (
  SELECT q_id, u.wi - 1 AS i, phr[u.wi] AS t
  FROM ph, UNNEST(range(1, len(phr) + 1)) AS u(wi)
  WHERE phr[u.wi] <> ''
), pn AS (
  SELECT q_id, COUNT(DISTINCT i) AS n FROM pt GROUP BY q_id
), m AS (
  SELECT pt.q_id, toks.doc_id, toks.pos - pt.i AS anchor, pt.i
  FROM toks JOIN pt USING (t)
), hits AS (
  SELECT h.q_id, h.doc_id, h.anchor, pn.n
  FROM (
    SELECT q_id, doc_id, anchor, COUNT(DISTINCT i) AS k
    FROM m GROUP BY q_id, doc_id, anchor) h
  JOIN pn USING (q_id)
  WHERE h.k = pn.n
), first AS (
  SELECT q_id, doc_id, n, MIN(anchor) AS first_pos
  FROM hits GROUP BY q_id, doc_id, n)
SELECT f.q_id, f.doc_id, CAST(f.first_pos AS BIGINT) AS first_pos,
       COALESCE(array_to_string(
         string_split(d.text, ' ')
           [GREATEST(f.first_pos - 3, 1) : f.first_pos + f.n - 1 + 3],
         ' '), '') AS snippet
FROM first f JOIN documents d USING (doc_id)
ORDER BY q_id, doc_id
"""

PIPELINE_ORACLE["pipeline_snippet"] = _SNIPPET_SQL


def _prf_sql() -> str:
    """PRF query expansion (round 14, text.bm25_prf_topk): pass 1 is
    the bm25 SQL verbatim at k_fb = 10 (nested as a derived table —
    the diversified row's proven composition); the expansion is the
    3 most frequent feedback-doc terms per query (occurrences summed,
    original terms anti-joined out, ties by term text); pass 2 is the
    SAME scoring body with q = original ∪ expansion. Integer-exact
    end to end — full RM3's relevance-model interpolation is floats a
    cross-engine hash cannot carry, which is why the engine ships the
    set-union variant (documented on the operator)."""
    base = _bm25_sql(10)
    orig = """SELECT DISTINCT q_id, t FROM (
    SELECT doc_id AS q_id,
           UNNEST(string_split(text, ' ')[1:3]) AS t
    FROM documents WHERE doc_id % 97 = 11) y
  WHERE t <> ''"""
    q_cte = f"""
  SELECT q_id, t FROM (
    {orig}
    UNION
    SELECT q_id, t FROM (
      SELECT cnt.q_id, cnt.t,
             ROW_NUMBER() OVER (
               PARTITION BY cnt.q_id ORDER BY cnt.c DESC, cnt.t) AS ern
      FROM (
        SELECT fb.q_id, tk.t, COUNT(*) AS c
        FROM ({base}) fb
        JOIN (
          SELECT doc_id, t FROM (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS t
            FROM documents) x
          WHERE t <> '') tk
          ON tk.doc_id = fb.doc_id
        LEFT JOIN ({orig}) o ON o.q_id = fb.q_id AND o.t = tk.t
        WHERE o.t IS NULL
        GROUP BY fb.q_id, tk.t
      ) cnt
    ) e WHERE ern <= 3
  ) u"""
    return _bm25_sql(5, q_cte=q_cte)


PIPELINE_ORACLE["pipeline_prf"] = _prf_sql()
# Index-resident PRF (round 15): shared pass-1/pass-2 scoring core ⇒
# bit-identical to the inline operator — one SQL truth, two paths.
PIPELINE_ORACLE["pipeline_prf_index"] = _prf_sql()
# Index-backed proximity: shared window core ⇒ bit-identical to the
# inline operator — one SQL truth, two execution paths.
PIPELINE_ORACLE["pipeline_proximity_index"] = _PROXIMITY_SQL

# Index deletion (round 14, delete_from_text_index): build on the full
# corpus + delete the doc_id % 13 == 3 slice must equal the
# from-scratch computation over the SURVIVING corpus — tombstone
# anti-joins, df-decremented terms, and the rewritten N/avgdl all
# hash-gated at once (a stale df or n_docs shifts every idf).
PIPELINE_ORACLE["pipeline_bm25_index_delete"] = _bm25_sql(
    5, corpus_pred="doc_id % 13 <> 3"
)


# Hybrid retrieval (round 12, text.rrf_fuse): BM25 top-20 (the builder
# above at k=20) FULL OUTER JOIN the PRODUCTION vector ranking —
# ADC top-30 re-ranked by exact cosine to top-20 (_rerank_sql, the
# same two-stage SQL ann_rerank pins) — on (q_id, doc_id);
# reciprocal-rank fusion 1/(60+rn) per present side, quantized
# half-up at 1e9 into BIGINT, top-5 per query.
PIPELINE_ORACLE["pipeline_hybrid"] = f"""
WITH lex AS (
  SELECT q_id, doc_id, rn FROM ({_bm25_sql(20)}) l0
), vec AS (
  SELECT q_id, vec_id AS doc_id, rn
  FROM ({_rerank_sql(k=20, m=30, q_pred="vec_id % 97 = 11")}) v0
), fused AS (
  SELECT COALESCE(l.q_id, v.q_id) AS q_id,
         COALESCE(l.doc_id, v.doc_id) AS doc_id,
         CAST(FLOOR((
             CASE WHEN l.rn IS NOT NULL
                  THEN 1.0 / (60 + l.rn) ELSE 0.0 END
           + CASE WHEN v.rn IS NOT NULL
                  THEN 1.0 / (60 + v.rn) ELSE 0.0 END
         ) * 1000000000.0 + 0.5) AS BIGINT) AS rrf
  FROM lex l FULL OUTER JOIN vec v
    ON l.q_id = v.q_id AND l.doc_id = v.doc_id
), rk AS (
  SELECT q_id, doc_id, rrf,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS INT) AS rn
  FROM fused)
SELECT q_id, doc_id, rrf, rn FROM rk WHERE rn <= 5
ORDER BY q_id, rn
"""


# Index-only hybrid (round 13): both retrieval sides answered from
# persisted indexes, each pinned bit-identical to its inline twin —
# the oracle is pipeline_hybrid's SQL verbatim. (Assigned at module
# end: the hybrid oracle itself is built further up.)
PIPELINE_ORACLE["pipeline_hybrid_index"] = PIPELINE_ORACLE["pipeline_hybrid"]

# Index-resident snippet (round 15): anchors from the posting buckets,
# shared slicing core ⇒ bit-identical to the inline operator — one SQL
# truth, two execution paths (the phrase pair's pattern).
PIPELINE_ORACLE["pipeline_snippet_index"] = _SNIPPET_SQL

# Index-resident diversification (round 15): query_bm25_index ≡
# bm25_topk (pinned) and diversify_topk is literally shared, with the
# groups column read from the index docmeta instead of the corpus —
# the docmeta build is hash-gated to equal the documents projection by
# this very row (a drifted docmeta source column would flip groups).
PIPELINE_ORACLE["pipeline_diversified_index"] = _diversified_sql()


def _hybrid_filtered_sql() -> str:
    """Filtered hybrid (round 15): the hybrid SQL with each leg's
    candidate set narrowed by ITS index-metadata predicate — the BM25
    leg scores only BM25_FILTER_PRED documents (stats CTEs untouched,
    Lucene filter semantics, exactly _bm25_filtered_sql's shape at
    k=20) and the vector leg's stage-1 candidates are semi-joined to
    ANN_FILTER_PRED rows before ADC ranking (exactly
    _ann_filtered_sql's shape, under the re-rank). Predicates imported
    verbatim from queries.pipeline — the no-drift rule."""
    from ccog_spark.queries.pipeline import (
        ANN_FILTER_PRED,
        BM25_FILTER_PRED,
    )

    lex = _bm25_sql(20, cand_pred=BM25_FILTER_PRED)
    vec = _rerank_sql(
        k=20,
        m=30,
        q_pred="vec_id % 97 = 11",
        cand_pred=(
            "AND e.vec_id IN (SELECT vec_id FROM embeddings WHERE "
            + ANN_FILTER_PRED
            + ")"
        ),
    )
    return f"""
WITH lex AS (
  SELECT q_id, doc_id, rn FROM ({lex}) l0
), vec AS (
  SELECT q_id, vec_id AS doc_id, rn
  FROM ({vec}) v0
), fused AS (
  SELECT COALESCE(l.q_id, v.q_id) AS q_id,
         COALESCE(l.doc_id, v.doc_id) AS doc_id,
         CAST(FLOOR((
             CASE WHEN l.rn IS NOT NULL
                  THEN 1.0 / (60 + l.rn) ELSE 0.0 END
           + CASE WHEN v.rn IS NOT NULL
                  THEN 1.0 / (60 + v.rn) ELSE 0.0 END
         ) * 1000000000.0 + 0.5) AS BIGINT) AS rrf
  FROM lex l FULL OUTER JOIN vec v
    ON l.q_id = v.q_id AND l.doc_id = v.doc_id
), rk AS (
  SELECT q_id, doc_id, rrf,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS INT) AS rn
  FROM fused)
SELECT q_id, doc_id, rrf, rn FROM rk WHERE rn <= 5
ORDER BY q_id, rn
"""


PIPELINE_ORACLE["pipeline_hybrid_index_filtered"] = _hybrid_filtered_sql()

# round 16: tokenization from the persisted BPE model — shared
# training + encode code, the model is just parquet-frozen state, so
# the oracle is the full recursive-CTE replay verbatim (one SQL
# truth, two execution paths — the query_bm25_index contract).
PIPELINE_ORACLE["pipeline_tokenize_index"] = (
    PIPELINE_ORACLE["pipeline_tokenize"]
)

# round 16: CCNet perplexity tertiles — the LM scoring CTEs verbatim
# (one truth with pipeline_lm), then the exact-NTILE identity the
# engine's distributed selection must reproduce: bucket =
# 1 + floor(rank·3/n) under ORDER BY qscore, doc_id, where qscore is
# the integer quantized mean (the BIGINT before pipeline_lm's display
# division — both engines recover it exactly via FLOOR(score·1e6+0.5)).
PIPELINE_ORACLE["pipeline_lm_buckets"] = """
WITH g AS (
  SELECT doc_id, substr(text, CAST(i AS INT), 3) AS gram,
         substr(text, CAST(i AS INT), 2) AS ctx
  FROM documents, UNNEST(range(1, length(text) - 1)) AS t(i)
  WHERE length(text) >= 3
), gc AS (
  SELECT gram, COUNT(*) AS c FROM g GROUP BY gram
), cc AS (
  SELECT substr(gram, 1, 2) AS ctx, SUM(c) AS c FROM gc GROUP BY 1
), v AS (
  SELECT COUNT(DISTINCT substr(gram, 3, 1)) AS v FROM gc
), q AS (
  SELECT g.doc_id,
         CAST(FLOOR(((gc.c + 1) / CAST(cc.c + v.v AS DOUBLE)) * 1000000
                    + 0.5) AS BIGINT) AS q
  FROM g JOIN gc USING (gram) JOIN cc USING (ctx) CROSS JOIN v
), s AS (
  SELECT doc_id,
         CAST(FLOOR(CAST(SUM(q) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
           AS qscore
  FROM q GROUP BY doc_id
), r AS (
  SELECT doc_id, qscore,
         ROW_NUMBER() OVER (ORDER BY qscore, doc_id) - 1 AS rk,
         COUNT(*) OVER () AS n
  FROM s
)
SELECT doc_id, qscore, CAST(1 + (rk * 3) // n AS INT) AS bucket
FROM r
ORDER BY doc_id
"""
