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
        if EOW in r.word:
            raise ValueError(
                f"corpus word contains the end-of-word sentinel {EOW!r}; "
                "clean the corpus or change EOW before training"
            )
        syms = tuple(r.word[:-1]) + (r.word[-1] + EOW,)
        vocab[syms] = vocab.get(syms, 0) + int(r.cnt)

    # Incremental trainer (what HuggingFace tokenizers / SentencePiece
    # do): pair counts + a pair→words inverted index are maintained
    # across merges, so each merge touches ONLY the words containing
    # the merged pair — not the whole vocabulary — and best-pair
    # selection is a lazy max-heap pop (stale entries re-pushed), not
    # an O(|pairs|) scan. Selection order is identical to the naive
    # recount-everything spelling: exact counts, ties broken on
    # lexicographic pair order (the heap key (-cnt, pair) IS that
    # ordering), which tests pin against a naive reference.
    import heapq

    words: list[list] = []  # [mutable syms list, cnt]
    pairs: dict[tuple[str, str], int] = {}
    p2w: dict[tuple[str, str], set[int]] = {}
    for syms, cnt in vocab.items():
        wi = len(words)
        words.append([list(syms), cnt])
        for p in zip(syms, syms[1:]):
            pairs[p] = pairs.get(p, 0) + cnt
            p2w.setdefault(p, set()).add(wi)

    heap = [(-c, p) for p, c in pairs.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        nc, best = heapq.heappop(heap)
        cur = pairs.get(best, 0)
        if cur <= 0:
            continue
        if -nc != cur:  # stale entry — re-push with the live count
            heapq.heappush(heap, (-cur, best))
            continue
        merges.append(best)
        merged = best[0] + best[1]
        touched: set[tuple[str, str]] = set()
        for wi in list(p2w.get(best, ())):
            syms, cnt = words[wi]
            for p in zip(syms, syms[1:]):
                pairs[p] -= cnt
                touched.add(p)
                s = p2w.get(p)
                if s is not None:
                    s.discard(wi)
            new = _merge_word(syms, best, merged)
            words[wi][0] = new
            for p in zip(new, new[1:]):
                pairs[p] = pairs.get(p, 0) + cnt
                touched.add(p)
                p2w.setdefault(p, set()).add(wi)
        for p in touched:
            c = pairs.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p))
    return merges


def _merge_word(
    syms: list[str], best: tuple[str, str], merged: str
) -> list[str]:
    """One left-to-right merge pass (the canonical greedy rewrite:
    'aaa' with ('a','a') → ['aa', 'a'])."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


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


def _word_encoder_kernel(merges: list[tuple[str, str]], post, ret_type: str):
    """Shared Arrow tokenizer kernel: text column → per-word
    ``post(_encode_word(...))`` outputs, flattened per doc. The merge
    ranks (and whatever ``post`` captures) ride in the closure —
    broadcast-sized by construction — with a per-batch word cache
    (Zipf: a batch's distinct words ≪ its token count). ONE encode
    loop shared by the unit and id tokenizers so sentinel handling,
    caching, and splitting can never diverge."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf(ret_type)
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list] = {}
        out = []
        for t in texts:
            t = t or ""
            if EOW in t:
                raise ValueError(
                    f"text contains the end-of-word sentinel {EOW!r}; "
                    "decode would be ambiguous — clean the corpus or "
                    "change EOW"
                )
            row: list = []
            for w in t.split(" "):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = post(_encode_word(w, ranks))
                    cache[w] = got
                row.extend(got)
            out.append(row)
        return pd.Series(out)

    return encode


def bpe_encode_kernel(merges: list[tuple[str, str]]):
    """text column → array<string> of BPE subword units (see
    _word_encoder_kernel)."""
    return _word_encoder_kernel(merges, lambda units: units, "array<string>")


def bpe_decode(units: list[str]) -> str:
    """Inverse of encoding: concatenate units, split words on the
    end-of-word sentinel."""
    return "".join(units).replace(EOW, " ").rstrip(" ")


def _register_self() -> None:
    try:
        from pyspark.cloudpickle import register_pickle_by_value

        from ccog_spark.operators import bpe as _self

        register_pickle_by_value(_self)
    except ImportError:  # pragma: no cover - older pyspark
        pass


def tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out: str = "bpe",
) -> DataFrame:
    """Add an ``out`` array<string> column of BPE units (map-side; see
    _word_encoder_kernel)."""
    _register_self()
    return docs.withColumn(out, bpe_encode_kernel(merges)(F.col(text_col)))


def corpus_alphabet(
    docs: DataFrame, text_col: str = "text", max_alphabet: int = 1 << 17
) -> list[str]:
    """Distinct non-space characters of the corpus (distributed
    distinct; result is alphabet-sized — tiny for natural language,
    bounded above by Unicode's ~155k assigned codepoints). This is the
    base-symbol set ``vocabulary`` needs for COMPLETE id coverage: the
    merge list alone underdetermines the alphabet (a character that
    never participates in a merge would otherwise be silently absent
    and its ids lossy).

    Guarded like the other driver materializations (PPJoin gate,
    prefix-sum tree): a ``limit(N+1)`` probe refuses to collect an
    adversarial corpus whose "alphabet" exceeds ``max_alphabet``
    distinct strings (possible with combining-character graphemes —
    Spark's split('') yields grapheme clusters, whose space is
    unbounded) instead of flooding the driver."""
    distinct = (
        docs.select(
            F.explode(F.split(F.col(text_col), "")).alias("c")
        )
        .where((F.col("c") != "") & (F.col("c") != " "))
        .distinct()
    )
    rows = distinct.limit(max_alphabet + 1).collect()
    if len(rows) > max_alphabet:
        raise ValueError(
            f"corpus alphabet exceeds {max_alphabet} distinct symbols — "
            f"not a natural-language alphabet; normalize the corpus "
            f"(NFC, strip combining runs) or raise max_alphabet"
        )
    return sorted(r.c for r in rows)


def vocabulary(
    merges: list[tuple[str, str]], alphabet: list[str] | tuple = ()
) -> list[str]:
    """Deterministic id→unit vocabulary for (merges, alphabet): base
    symbols (every alphabet character plus its word-final EOW form,
    and any merge operand) sorted first, then merged symbols in rank
    order. Ship (merges, alphabet) together — pass
    ``corpus_alphabet(docs)`` to guarantee every unit the encoder can
    emit on that corpus has an id."""
    base: set[str] = set()
    for c in alphabet:
        if c and c != " " and EOW not in c:
            base.add(c)
            base.add(c + EOW)
    for a, b in merges:
        base.add(a)
        base.add(b)
    produced = {a + b for a, b in merges}
    alpha = sorted(base - produced)
    return alpha + [a + b for a, b in merges]


def tokenize_ids(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    alphabet: list[str] | tuple = (),
    text_col: str = "text",
    out: str = "ids",
    unk_id: int = -1,
) -> DataFrame:
    """Add an array<int> token-id column — the artifact a pretraining
    pipeline actually materializes. Ids index
    ``vocabulary(merges, alphabet)``; units outside it map to
    ``unk_id``. Same single-map-stage shape as ``tokenize`` (shared
    encode loop; only the final unit→id mapping differs)."""
    _register_self()
    ids = {u: i for i, u in enumerate(vocabulary(merges, alphabet))}
    kernel = _word_encoder_kernel(
        merges,
        lambda units: [ids.get(u, unk_id) for u in units],
        "array<int>",
    )
    return docs.withColumn(out, kernel(F.col(text_col)))


# --------------------------------------------------------------------
# Persisted tokenizer model (round 16, VERDICT r15 #7): the BPE
# merges/alphabet were the one text artifact still retrained per run.
# A model directory holds three parquet tables:
#   merges/   (rank int, left string, right string) — ordered merges
#   alphabet/ (c string)                            — base symbols
#   meta/     (n_merges, n_alphabet, eow, generation) — 1 row
# FREEZE CONTRACT (the ANN frozen-model rule, tokenizer edition): a
# tokenizer model is immutable after build — appending corpus never
# retrains it (ids would silently shift under every downstream
# artifact), and a vocabulary change is a REBUILD with a new
# generation. There is deliberately no append verb.
# --------------------------------------------------------------------


def save_bpe_model(
    spark,
    model_dir: str,
    merges: list[tuple[str, str]],
    alphabet: list[str] | tuple = (),
) -> dict:
    """Persist a trained (merges, alphabet) pair. Vocabulary-sized
    writes — driver-held lists in, three small parquet tables out."""
    import os

    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(model_dir, "merges")
    )
    spark.createDataFrame(
        [(c,) for c in alphabet], "c string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(model_dir, "alphabet")
    )
    meta = {
        "n_merges": len(merges),
        "n_alphabet": len(alphabet),
        "eow": EOW,
        "generation": 1,
    }
    spark.createDataFrame(
        [tuple(meta.values())],
        "n_merges int, n_alphabet int, eow string, generation int",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(model_dir, "meta")
    )
    return meta


def build_bpe_model(
    docs: DataFrame,
    model_dir: str,
    n_merges: int = 200,
    text_col: str = "text",
    min_count: int = 1,
) -> dict:
    """Train (train_bpe + corpus_alphabet) and persist — after this,
    every tokenize answers from parquet and the corpus is never
    re-counted."""
    merges = train_bpe(docs, n_merges=n_merges, text_col=text_col,
                       min_count=min_count)
    alpha = corpus_alphabet(docs, text_col=text_col)
    return save_bpe_model(docs.sparkSession, model_dir, merges, alpha)


def load_bpe_model(spark, model_dir: str):
    """(merges, alphabet) from a saved model — vocabulary-sized
    driver collect, rank order restored explicitly."""
    import os

    mrows = sorted(
        spark.read.parquet(os.path.join(model_dir, "merges")).collect(),
        key=lambda r: r.rank,
    )
    merges = [(r.left, r.right) for r in mrows]
    alpha = sorted(
        r.c
        for r in spark.read.parquet(
            os.path.join(model_dir, "alphabet")
        ).collect()
    )
    return merges, alpha


def verify_bpe_model(spark, model_dir: str) -> dict:
    """Integrity audit (verify_text_index's tokenizer twin): meta
    counts must match the tables, ranks must be exactly 0..n-1 (a
    gap or duplicate silently reorders every downstream encode), the
    EOW sentinel must match this build of the code, and no alphabet
    symbol may contain EOW. Returns {"ok", "errors"}; never raises —
    a missing or torn model directory (interrupted save) is reported
    as an errors entry, matching the verify_text_index /
    verify_ann_index contract (ADVICE r16)."""
    import os

    errors: list[str] = []

    def _read(name: str):
        try:
            return spark.read.parquet(
                os.path.join(model_dir, name)
            ).collect()
        except Exception as e:  # noqa: BLE001 — audit, not control flow
            errors.append(
                f"table {name}/ missing or unreadable: "
                f"{type(e).__name__}"
            )
            return None

    metas = _read("meta")
    mrows = _read("merges")
    arows = _read("alphabet")
    if metas is None or mrows is None or arows is None:
        return {"ok": False, "errors": errors}
    if not metas:
        return {"ok": False, "errors": errors + ["meta/ is empty"]}
    meta = metas[0]
    if len(mrows) != int(meta.n_merges):
        errors.append(
            f"meta.n_merges={meta.n_merges} but merges/ has {len(mrows)}"
        )
    if len(arows) != int(meta.n_alphabet):
        errors.append(
            f"meta.n_alphabet={meta.n_alphabet} but alphabet/ has "
            f"{len(arows)}"
        )
    ranks = sorted(r.rank for r in mrows)
    if ranks != list(range(len(mrows))):
        errors.append("merge ranks are not exactly 0..n-1")
    if meta.eow != EOW:
        errors.append(
            f"model eow={meta.eow!r} differs from engine EOW={EOW!r}"
        )
    bad = [r.c for r in arows if not r.c or r.c == " " or EOW in r.c]
    if bad:
        errors.append(f"{len(bad)} invalid alphabet symbols")
    return {"ok": not errors, "errors": errors}


def tokenize_ids_from_model(
    docs: DataFrame,
    model_dir: str,
    text_col: str = "text",
    out: str = "ids",
    unk_id: int = -1,
) -> DataFrame:
    """``tokenize_ids`` answered from the persisted model only — the
    corpus is never re-counted and training never re-runs
    (bit-identity with the inline path pinned in tests: same merges,
    same alphabet, same kernel ⇒ same ids by construction)."""
    merges, alpha = load_bpe_model(docs.sparkSession, model_dir)
    return tokenize_ids(
        docs, merges, alpha, text_col=text_col, out=out, unk_id=unk_id
    )
