"""Byte-pair encoding: distributed vocabulary training + map-side
tokenization (Sennrich et al., "Neural Machine Translation of Rare
Words with Subword Units", ACL 2016 — the standard pretraining
tokenizer construction; public algorithm).

Scale shape — the part that matters at 100 TB:

- **Training** aggregates the corpus ONCE into a word-frequency table
  (one shuffle on word), which is orders of magnitude smaller than
  the corpus (vocabulary growth is ~Heaps' law, |V| ≈ O(N^0.5)); the
  driver-side merge loop then runs on that compact dict exactly like
  every production BPE trainer (HuggingFace tokenizers, SentencePiece
  do the same: corpus-scale counting distributed, merge loop local).
  A cap guards the driver collect.
- **Encoding** is a pure map stage: the learned merge ranks ride to
  executors in the closure (a dict of ≤ vocab_size entries), and one
  Arrow kernel tokenizes each batch — no shuffle, no join, nothing
  corpus-sized ever leaves its partition.

Determinism: merge selection breaks frequency ties by lexicographic
pair order, so the same corpus always yields the same vocab — the
round-trip property (decode(encode(w)) == w, exactly) is tested, and
two independent trainings of the same input are asserted identical.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# End-of-word sentinel (GPT-2-style </w> marking; any char not in the
# corpus works — tests assert corpus text is sentinel-free).
EOW = ""

# Driver-side guard for the word-frequency collect. 2^22 distinct
# words ≈ 200 MB of (word, count) rows — far beyond any natural-
# language vocabulary at this cap; corpora that exceed it should
# pre-filter (min_count) rather than ship junk tokens to the trainer.
MAX_VOCAB_WORDS = 1 << 22


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over whitespace tokens — the one corpus-wide
    shuffle BPE training pays. Partial aggregation (map-side combine)
    means the exchange carries distinct words per partition, not
    token instances."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    min_count: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus word frequencies.

    Returns the ordered merge list [(left, right), ...] — rank =
    position. Greedy most-frequent-pair selection; ties break on
    lexicographic (left, right) so training is deterministic."""
    wc = word_counts(docs, text_col)
    if min_count > 1:
        wc = wc.where(F.col("cnt") >= min_count)
    rows = wc.limit(MAX_VOCAB_WORDS + 1).collect()
    if len(rows) > MAX_VOCAB_WORDS:
        raise ValueError(
            f"distinct-word count exceeds MAX_VOCAB_WORDS={MAX_VOCAB_WORDS}; "
            "raise min_count to bound the trainer input"
        )
    # word → symbol tuple (chars + end-of-word sentinel on the last)
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        syms = tuple(r.word[:-1]) + (r.word[-1] + EOW,)
        vocab[syms] = vocab.get(syms, 0) + int(r.cnt)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        nv: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            nv[key] = nv.get(key, 0) + cnt
        vocab = nv
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word by ascending rank (the canonical BPE
    encode loop)."""
    syms = list(word[:-1]) + [word[-1] + EOW] if word else []
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, (a, b) in enumerate(zip(syms, syms[1:])):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode_kernel(merges: list[tuple[str, str]]):
    """Arrow-batched tokenizer: text column → array<string> of BPE
    subword units. The merge-rank dict rides in the closure (≤ vocab
    size — broadcast-sized by construction); encoding is pure
    map-side Python over Arrow batches with a per-batch word cache
    (Zipf: a batch's distinct words ≪ its token count)."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").split(" "):
                if not w:
                    continue
                enc = cache.get(w)
                if enc is None:
                    enc = _encode_word(w, ranks)
                    cache[w] = enc
                toks.extend(enc)
            out.append(toks)
        return pd.Series(out)

    return encode


def bpe_decode(units: list[str]) -> str:
    """Inverse of encoding: concatenate units, split words on the
    end-of-word sentinel."""
    return "".join(units).replace(EOW, " ").rstrip(" ")


def tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out: str = "bpe",
) -> DataFrame:
    """Add an ``out`` array<string> column of BPE units (map-side; see
    bpe_encode_kernel)."""
    # kernel helpers (_encode_word) live in this module — ship by
    # value for foreign-cwd drivers (house pattern)
    try:
        from pyspark.cloudpickle import register_pickle_by_value

        from ccog_spark.operators import bpe as _self

        register_pickle_by_value(_self)
    except ImportError:  # pragma: no cover - older pyspark
        pass
    return docs.withColumn(out, bpe_encode_kernel(merges)(F.col(text_col)))
