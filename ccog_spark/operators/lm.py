"""Character n-gram language-model quality scoring (CCNet-style LM
filter — the standard "train a small LM, keep fluent documents" stage
of web-corpus pipelines; CCNet/RefinedWeb apply a wiki-trained LM to
Common Crawl and drop the worst-perplexity tail).

Spark-first shape, no model runtime needed:

1. ``train_char_lm``: ONE distributed pass counts character n-grams
   and their (n-1)-char contexts. The count table is bounded by
   |alphabet|^n — a few hundred thousand rows for char trigrams
   regardless of corpus size — so at 100 TB it is a classic
   "aggregate to a broadcastable model" job: the corpus shuffles only
   gram KEYS (fixed-size strings), never documents.
2. ``lm_quality``: re-walk each document's grams map-side, broadcast-
   join the count table, and aggregate an add-one-smoothed mean
   transition probability per document. Two broadcast joins + one
   per-doc aggregate; the corpus is scanned twice (train + score) and
   never self-joined.

Scoring spelling (repo-wide cross-engine float rule): the TRUE LM
score is mean log-probability (perplexity = exp(-avg log p)), but
``ln`` differs in the last ulp across libm implementations, which
poisons a hash-gated oracle. The oracle-checked score is therefore the
MEAN TRANSITION PROBABILITY avg((c_gram+1)/(c_ctx+V)) — every term an
exact IEEE division of two integers, identical in any engine —
quantized per-term with the half-up integer spelling (floor(p*1e6+.5))
and summed as exact BIGINTs (a float sum would be association-order-
dependent). Ordering information matches the log spelling direction-
wise for ranking cutoffs ("drop the worst tail"); ``perplexity=True``
adds the real log-space score for production use (pytest-gated, kept
out of the hash corpus by design — same policy as approx aggs E14).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_Q = 1_000_000  # per-term quantization (micro-probability units)


def char_ngrams(col: Column | str, n: int) -> Column:
    """Array of all ``n``-char grams of a string column (JVM-only:
    sequence + transform + substring — whole-stage-codegen friendly,
    no Python crossing). Empty array for strings shorter than n."""
    c = F.col(col) if isinstance(col, str) else col
    # sequence(1, 0) would produce a DESCENDING [1, 0] — gate short
    # strings to an explicit empty array instead
    return F.when(
        F.length(c) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(c) - F.lit(n - 1)),
            lambda i: F.substring(c, i, n),
        ),
    ).otherwise(F.array().cast("array<string>"))


def train_char_lm(
    docs: DataFrame, n: int = 3, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(gram_counts, ctx_counts, vocab_size) for an ``n``-gram char LM.

    gram_counts: (gram string, c bigint) — the ONE corpus scan.
    ctx_counts and vocab_size are DERIVED from the gram table
    (prefix-sum the counts; distinct continuation chars), so they cost
    model-sized aggregations, not extra passes over the corpus — at
    100 TB the whole model is 1 scan + tiny-table work. Consequence of
    deriving contexts from grams: a context is counted once per gram
    STARTING there (i.e. positions 1..len-n+1, not the trailing
    (n-1)-gram) — exactly the mass that has continuations, which is
    the denominator conditional probability wants anyway.

    vocab_size = distinct continuation characters observed (the
    add-one smoothing denominator mass). All three are lazy plans —
    compose into a scoring plan, or persist gram_counts for a reusable
    model."""
    t = F.col(text_col)
    grams = docs.select(F.explode(char_ngrams(t, n)).alias("gram"))
    gram_counts = grams.where(F.length("gram") == n).groupBy("gram").agg(
        F.count("*").cast("bigint").alias("c")
    )
    ctx_counts = (
        gram_counts.groupBy(
            F.substring("gram", 1, n - 1).alias("ctx")
        ).agg(F.sum("c").cast("bigint").alias("c"))
    )
    vocab = gram_counts.agg(
        F.count_distinct(F.substring("gram", n, 1)).cast("bigint").alias("v")
    )
    return gram_counts, ctx_counts, vocab


def lm_quality(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    perplexity: bool = False,
) -> DataFrame:
    """Per-document LM fluency score against a char n-gram LM trained
    on the SAME corpus (self-scoring — callers with a clean reference
    corpus train there and join here; the plan shape is identical).

    Returns (id_col, n_grams, score) where score is the quantized mean
    add-one transition probability in [0, 1] (6 decimal places; exact
    cross-engine arithmetic — see module docstring). Documents shorter
    than ``n`` chars produce no row (no transitions to judge). With
    ``perplexity=True`` adds ``ppl`` = exp(-avg ln p), the true
    log-space perplexity (float; excluded from the hash corpus).

    Scale: the count tables are alphabet-bounded → broadcast; the only
    per-document work is a map-side gram fan-out and one aggregate."""
    gram_counts, ctx_counts, vocab = train_char_lm(docs, n, text_col)
    # ctx/vocab are DERIVED from gram_counts; without a persist the
    # lazy composition would re-run the counting scan once per branch
    # (3 corpus scans). The cache is model-sized (≤ |alphabet|^n rows)
    # — the registry's budget sweep reclaims it.
    gram_counts = gram_counts.persist()
    g = docs.select(
        F.col(id_col), F.explode(char_ngrams(F.col(text_col), n)).alias("gram")
    ).withColumn("ctx", F.substring("gram", 1, n - 1))
    joined = (
        g.join(F.broadcast(gram_counts), "gram", "left")
        .join(
            F.broadcast(ctx_counts.withColumnRenamed("c", "cc")),
            "ctx",
            "left",
        )
        .crossJoin(F.broadcast(vocab))
    )
    # add-one smoothing: p = (c+1) / (c_ctx + V). Both operands exact
    # integers → the division is ONE deterministic IEEE op; quantize
    # per-term, then the per-doc sum is exact bigint arithmetic.
    p = (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double") / (
        F.coalesce(F.col("cc"), F.lit(0)) + F.col("v")
    ).cast("double")
    q = F.floor(p * _Q + F.lit(0.5)).cast("bigint")
    aggs = [
        F.count("*").cast("bigint").alias("n_grams"),
        (
            F.floor(
                F.sum(q).cast("double") / F.count("*") + F.lit(0.5)
            ).cast("bigint")
            / F.lit(float(_Q))
        ).alias("score"),
    ]
    if perplexity:
        aggs.append(
            F.exp(-F.avg(F.log(p))).alias("ppl")
        )
    return joined.groupBy(id_col).agg(*aggs)
