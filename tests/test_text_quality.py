"""Unit tests for decontamination and repetition-metric operators
(hand-built frames with known answers; the registry harness covers the
fixture corpus against the DuckDB oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ccog_spark.operators.decontam import contamination_flags
from ccog_spark.operators.text import repetition_metrics


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_contamination_flags_exact(spark):
    corpus = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),  # shares 3-grams with bench
            (2, "one two three four five"),  # no overlap
            (3, "beta gamma delta epsilon"),  # shares one 3-gram
        ],
    )
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
    out = {
        r["doc_id"]: (r["n_shared"], r["contaminated"])
        for r in contamination_flags(corpus, bench, n=3).collect()
    }
    # doc 1: "alpha beta gamma" + "beta gamma delta" both in bench
    assert out[1] == (2, True)
    # doc 2 keeps a row with zero hits (left join, not inner)
    assert out[2] == (0, False)
    # doc 3: "beta gamma delta" + "gamma delta epsilon"
    assert out[3] == (2, True)


def test_contamination_short_doc_fallback(spark):
    # < n tokens → whole-text fallback hash (same rule as the dedup
    # shingles); identical short text in bench ⇒ contaminated
    corpus = _docs(spark, [(1, "hi there"), (2, "bye now")])
    bench = _docs(spark, [(9, "hi there")])
    out = {
        r["doc_id"]: r["contaminated"]
        for r in contamination_flags(corpus, bench, n=3).collect()
    }
    assert out == {1: True, 2: False}


def test_repetition_metrics_exact(spark):
    docs = _docs(
        spark,
        [
            (1, "a a a a"),  # 4 tokens, 1 distinct; 3 identical 2-grams
            (2, "w x y z"),  # all distinct
            (3, "solo"),  # single token: no 2-grams, guarded path
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in repetition_metrics(docs).collect()}
    r1 = out[1]
    assert r1["n_tokens"] == 4
    assert r1["dup_tok_frac"] == 0.75  # 1 - 1/4
    assert r1["dup_2gram_frac"] == round(1 - 1 / 3, 4)
    assert r1["top_2gram_frac"] == 1.5  # 2*3/4 (overlapping grams)
    assert r1["rep_flagged"] is True
    r2 = out[2]
    assert r2["dup_tok_frac"] == 0.0
    assert r2["dup_2gram_frac"] == 0.0
    assert r2["top_2gram_frac"] == 0.5  # 2*1/4
    assert r2["rep_flagged"] is True  # modal 2-gram covers > 18% of 4 tokens
    r3 = out[3]  # row survives with zeroed 2-gram metrics
    assert r3["n_tokens"] == 1
    assert (r3["dup_2gram_frac"], r3["top_2gram_frac"]) == (0.0, 0.0)
    assert r3["rep_flagged"] is False


def test_repetition_long_doc_not_flagged(spark):
    text = " ".join(f"tok{i}" for i in range(50))
    out = repetition_metrics(_docs(spark, [(1, text)])).collect()[0]
    assert out["dup_2gram_frac"] == 0.0
    assert out["top_2gram_frac"] == round(2 / 50, 4)
    assert out["rep_flagged"] is False


def test_chunk_documents_coverage_and_overlap(spark):
    """Every token lands in at least one chunk; consecutive chunks of
    a long doc overlap by chunk - stride tokens; guards reject bad
    strides."""
    import pytest as pt

    from ccog_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(150))), (2, "solo")],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_id, r.chunk_idx): r
        for r in chunk_documents(docs, chunk=64, stride=48).collect()
    }
    # doc 1: starts at 1, 49, 97, 145 -> 4 chunks; tail has 6 tokens
    assert {k[1] for k in rows if k[0] == 1} == {0, 1, 2, 3}
    assert rows[(1, 0)].n_tok == 64 and rows[(1, 3)].n_tok == 6
    # covered token count: starts cover 1..150 because stride<=chunk
    assert rows[(2, 0)].n_tok == 1
    with pt.raises(ValueError, match="stride"):
        chunk_documents(docs, chunk=8, stride=9)


def test_bloom_decontam_superset_of_exact(spark):
    """Bloom flags ⊇ exact flags (no false negatives), and at the
    fixture scale with fpp=1e-3 the two agree exactly."""
    from ccog_spark.catalog import load_table
    from ccog_spark.operators.decontam import (
        contamination_flags,
        contamination_flags_bloom,
    )
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter("doc_id % 5 != 0")
    bench = docs.filter("doc_id % 5 = 0").limit(40)

    exact = {
        r.doc_id: r.n_shared
        for r in contamination_flags(corpus, bench, n=3).collect()
    }
    bloom = {
        r.doc_id: r.n_shared
        for r in contamination_flags_bloom(corpus, bench, n=3).collect()
    }
    assert set(bloom) == set(exact)
    # no false negatives: every exact hit is a bloom hit, count-wise ≥
    for did, n_exact in exact.items():
        assert bloom[did] >= n_exact, did
    # fixture-scale: fpp=1e-3 over ~10⁴ probes → expect near-zero FPs;
    # assert the flag sets agree (a loose-but-meaningful bound)
    fp_docs = sum(
        1 for d, nb in bloom.items() if nb > 0 and exact[d] == 0
    )
    assert fp_docs <= len(bloom) * 0.01


def test_bloom_fp_rate_bounded(spark):
    """Measured FP rate on grams guaranteed absent from the filter is
    within ~3× of the configured fpp (binomial slack)."""
    import numpy as np

    from ccog_spark.operators.decontam import _mix64, bench_bloom_filter

    bench = spark.createDataFrame(
        [(i, f"alpha bravo charlie delta{i} echo foxtrot") for i in range(50)],
        ["doc_id", "text"],
    )
    bits, m, k, n_grams = bench_bloom_filter(bench, n=3, fpp=1e-3)
    assert n_grams > 0
    rng = np.random.RandomState(7)
    probes = rng.randint(1 << 40, (1 << 62), size=200_000).astype(np.int64)
    h1 = probes.astype(np.uint64) % np.uint64(m)
    h2 = _mix64(probes.view(np.uint64)) % np.uint64(m - 1) + np.uint64(1)
    hit = np.ones(probes.size, dtype=bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
        hit &= (
            bits[(pos >> np.uint64(3)).astype(np.int64)]
            >> (pos & np.uint64(7)).astype(np.uint8)
        ) & 1 == 1
    assert hit.mean() < 3e-3


def test_tfidf_dense_feeds_ann(spark):
    """Composition: text → dense TF-IDF vectors → exact cosine ANN.
    A doc's nearest neighbour under TF-IDF cosine must be its planted
    near-duplicate (same text + one extra token)."""
    from pyspark.sql import functions as F

    from ccog_spark.operators.similarity import brute_force_topk
    from ccog_spark.operators.text import tfidf_dense

    base = [
        "alpha bravo charlie delta echo foxtrot golf hotel",
        "india juliet kilo lima mike november oscar papa",
        "quebec romeo sierra tango uniform victor whiskey xray",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((2 * i, t))
        rows.append((2 * i + 1, t + " extra"))  # planted near-dup
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    dense = tfidf_dense(docs, n_buckets=32)
    corpus = dense.select(
        F.col("doc_id").alias("vec_id"),
        F.col("vec").cast("array<float>").alias("embedding"),
    )
    queries = dense.select(
        F.col("doc_id").alias("q_id"),
        F.col("vec").cast("array<float>").alias("q_emb"),
    )
    top1 = {
        r.q_id: r.vec_id
        for r in brute_force_topk(corpus, queries, k=1).collect()
    }
    for i in range(len(base)):
        assert top1[2 * i] == 2 * i + 1
        assert top1[2 * i + 1] == 2 * i


def test_tfidf_dense_zero_vector_for_empty_doc(spark):
    from ccog_spark.operators.text import tfidf_dense

    docs = spark.createDataFrame(
        [(1, "alpha bravo"), (2, ""), (3, "  ")], ["doc_id", "text"]
    )
    out = {r.doc_id: r.vec for r in tfidf_dense(docs, n_buckets=8).collect()}
    assert set(out) == {1, 2, 3}  # nothing dropped
    assert all(v == 0.0 for v in out[2])
    assert all(v == 0.0 for v in out[3])
    assert any(v > 0.0 for v in out[1])


def test_lm_quality_properties(spark):
    """Char-LM scoring (operators/lm.py): repetitive text is MORE
    predictable under a self-trained LM (higher mean transition
    probability, lower perplexity); scores live in (0, 1]; docs
    shorter than n produce no row; gram accounting is exact."""
    from ccog_spark.operators.lm import char_ngrams, lm_quality

    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat " * 8),      # repetitive
            (2, "qx7!bz@k9#wf$2m%vj^8ru&1pl*3"),     # noise
            (3, "ab"),                               # shorter than n
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in lm_quality(docs, n=3, perplexity=True).collect()}
    assert 3 not in rows  # no transitions to judge
    assert rows[1].n_grams == len("the cat sat on the mat " * 8) - 2
    for r in rows.values():
        assert 0.0 < r.score <= 1.0
    assert rows[1].score > rows[2].score       # fluency ranks above noise
    assert rows[1].ppl < rows[2].ppl           # and perplexity agrees
    # ngram extraction: windows of exactly n, count = len - n + 1
    g = docs.where("doc_id = 2").select(
        F.explode(char_ngrams("text", 3)).alias("g")
    ).collect()
    assert all(len(r.g) == 3 for r in g)


def test_bm25_ranks_matching_terms_and_rare_terms_higher(spark):
    """BM25 basics on a controlled corpus: a document containing the
    query terms outranks one without; among single-term matches the
    RARE term outweighs the common one (idf monotone in rarity); and
    scores are exact BIGINTs (quantized half-up at 1e6)."""
    from ccog_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple apple apple"),
            (3, "banana banana banana"),
            (4, "durian elderberry fig"),
            (5, "apple durian banana"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(100, "apple durian")], "q_id long, q_text string"
    )
    rows = bm25_topk(docs, q, k=5).orderBy("rn").collect()
    ids = [r.doc_id for r in rows]
    assert 4 not in ids or ids.index(4) > 0  # no-term doc never first
    # doc 5 matches BOTH terms -> top
    assert ids[0] == 5
    # 'durian' (df=2) is rarer than 'apple' (df=3): doc 4 (durian only)
    # outranks docs 1/2 (apple only)
    assert ids.index(4) < ids.index(1) and ids.index(4) < ids.index(2)
    assert all(isinstance(r.score, int) for r in rows)


def test_rrf_fuse_rewards_presence_in_both_lists(spark):
    """RRF: a document ranked 2nd in BOTH lists must outscore one
    ranked 1st in only a single list (1/62+1/62 > 1/61); absent-side
    contribution is 0, and the quantized scores replay the formula."""
    from ccog_spark.operators.text import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2)], "q_id long, doc_id long, rn int"
    )
    b = spark.createDataFrame(
        [(1, 30, 1), (1, 20, 2)], "q_id long, doc_id long, rn int"
    )
    rows = {r.doc_id: r for r in rrf_fuse(a, b, "doc_id", k=5).collect()}
    assert rows[20].rn == 1  # in both lists at rank 2 -> wins
    assert rows[20].rrf == round((1 / 62 + 1 / 62) * 1e9)
    assert rows[10].rrf == rows[30].rrf == round((1 / 61) * 1e9)
    # deterministic tie-break on doc_id
    assert rows[10].rn == 2 and rows[30].rn == 3


def _bm25_corpus(spark, seed: int, n_docs: int = 120):
    """Random corpus with a Zipf-ish mix: a handful of stopwords in
    almost every doc (corpus-scale df — the pruning target), mid-df
    topic words, and rare tail words."""
    import random

    rng = random.Random(seed)
    stop = ["the", "of", "and"]
    mid = [f"topic{i}" for i in range(12)]
    rare = [f"rare{i}" for i in range(60)]
    rows = []
    for d in range(1, n_docs + 1):
        words = []
        words += [w for w in stop if rng.random() < 0.9]
        words += rng.sample(mid, rng.randint(1, 4))
        if rng.random() < 0.5:
            words += rng.sample(rare, rng.randint(1, 2))
        words *= rng.randint(1, 3)
        rng.shuffle(words)
        rows.append((d, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.slow
def test_bm25_maxscore_pruning_is_lossless(spark, seed, monkeypatch):
    """Round 13 (VERDICT r12 #2): max-score candidate pruning must be
    LOSSLESS — identical (q_id, doc_id, score, rn) rows to the
    unpruned plan on stopword-heavy queries (where pruning actually
    engages), including tie-breaks. The absolute-postings floor is
    lifted so the tiny corpus exercises the ENGAGED path."""
    from ccog_spark.operators import text as T

    monkeypatch.setattr(T, "BM25_PRUNE_MIN_POSTINGS", 0)
    docs = _bm25_corpus(spark, seed)
    # stopword + rare pairs: high-df terms are exactly what the
    # planner should classify non-essential
    qs = spark.createDataFrame(
        [
            (1, "the rare3"),
            (2, "of and rare7 topic2"),
            (3, "the of and"),          # all-stopword query: no cut
            (4, "rare11 rare12"),       # all-rare: nothing to cut
            (5, "and topic5 rare20"),
            (6, "the topic1"),          # mid-df essential: cut engages
            (7, "of and topic7"),
        ],
        "q_id long, q_text string",
    )
    a = T.bm25_topk(docs, qs, k=4, prune=False).collect()
    b = T.bm25_topk(docs, qs, k=4, prune=True).collect()
    key = lambda r: (r.q_id, r.rn)
    assert sorted(map(tuple, a), key=lambda x: (x[0], x[3])) == sorted(
        map(tuple, b), key=lambda x: (x[0], x[3])
    )


def test_bm25_pruning_planner_actually_prunes(spark, monkeypatch):
    """The planner must (a) return a strict subset of query terms on a
    stopword+rare query against a stopword-saturated corpus — the
    stopword's postings are the cut — and (b) decline to prune when
    nothing worthwhile can be cut (all-stopword query)."""
    from ccog_spark.operators import text as T

    monkeypatch.setattr(T, "BM25_PRUNE_MIN_POSTINGS", 0)
    docs = _bm25_corpus(spark, 9, n_docs=150)
    base_kwargs = dict(k=3, k1=1.2)

    def plan_for(qs):
        # rebuild the operator's internal frames the way bm25_topk does
        from pyspark.sql import functions as F

        toks = docs.select(
            F.col("doc_id"),
            F.explode(F.split(F.col("text"), " ")).alias("t"),
        ).where(F.col("t") != "")
        tf = toks.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
        dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        dfs = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
        stats = dl.agg(
            F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
        )
        qterms = (
            qs.select(
                "q_id", F.explode(F.split(F.col("q_text"), " ")).alias("t")
            )
            .where(F.col("t") != "")
            .distinct()
        )
        qstats = qterms.join(dfs, "t")
        avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
        idf = (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        tfp = (F.col("tf") * 2.2) / (
            F.col("tf") + 1.2 * (0.25 + 0.75 * (F.col("dl") / avgdl))
        )
        term_q = F.floor(idf * tfp * 1000000.0 + 0.5).cast("long")

        def score_frame(q_side):
            j = (
                tf.join(F.broadcast(q_side), "t")
                .join(dl, "doc_id")
                .crossJoin(F.broadcast(stats))
            )
            return j.select("q_id", F.col("doc_id"), term_q.alias("tq"))

        return T._bm25_essential_terms(
            spark, score_frame, stats, qstats, base_kwargs["k"],
            base_kwargs["k1"],
        )

    # mid-df topic terms have df >= k, so k docs matching them bound
    # the stopword out of the candidate pass; a RARE term with df < k
    # cannot (the top-k then necessarily includes stopword-only docs),
    # which is why mid-df terms are the essential side here
    qs_mixed = spark.createDataFrame(
        [(1, "the topic3"), (2, "of topic8")], "q_id long, q_text string"
    )
    plan = plan_for(qs_mixed)
    assert plan is not None
    # only the mid-df topic terms survive into the essential union
    # (the r15 planner also returns per-term block-max keep
    # thresholds: (df, cut) per essential term)
    terms, cuts = plan
    assert terms == ["topic3", "topic8"]
    assert set(cuts) == {"topic3", "topic8"}
    for t, (d, cut) in cuts.items():
        assert d > 0 and isinstance(cut, int)

    qs_stop = spark.createDataFrame(
        [(1, "the of and")], "q_id long, q_text string"
    )
    assert plan_for(qs_stop) is None  # nothing worthwhile to cut


def test_bm25_pruning_declines_below_postings_floor(spark):
    """Without the monkeypatched floor, a tiny corpus must take the
    unpruned plan (the planner's extra jobs would dominate) — decided
    before the θ probe, so prune=True on small inputs costs only the
    two query-batch-sized collects."""
    from ccog_spark.operators import text as T

    docs = _bm25_corpus(spark, 5)
    qs = spark.createDataFrame(
        [(1, "the topic1")], "q_id long, q_text string"
    )
    # same result either way — and the planner declined internally
    # (observable: identical rows; the floor constant is far above
    # this corpus's total postings)
    assert T.BM25_PRUNE_MIN_POSTINGS > 10_000
    a = T.bm25_topk(docs, qs, k=3, prune=True).collect()
    b = T.bm25_topk(docs, qs, k=3, prune=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_rrf_fuse_many_three_lists_exact(spark):
    """N-list RRF: per-list 1/(c+rn) quantized at 1e9 and summed as
    BIGINTs; a doc present in all three lists at modest ranks beats a
    single-list rank-1 doc; guards reject < 2 lists."""
    from ccog_spark.operators.text import rrf_fuse_many

    mk = lambda rows: spark.createDataFrame(
        rows, "q_id long, doc_id long, rn int"
    )
    a = mk([(1, 10, 1), (1, 20, 2)])
    b = mk([(1, 30, 1), (1, 20, 3)])
    c = mk([(1, 40, 1), (1, 20, 2)])
    rows = {r.doc_id: r for r in rrf_fuse_many([a, b, c], "doc_id", k=5).collect()}
    q = lambda rn: round(1e9 / (60 + rn))
    assert rows[20].rrf == q(2) + q(3) + q(2)
    assert rows[10].rrf == rows[30].rrf == rows[40].rrf == q(1)
    assert rows[20].rn == 1  # in all three lists -> wins
    # deterministic id tie-break among the three singles
    assert [rows[10].rn, rows[30].rn, rows[40].rn] == [2, 3, 4]

    import pytest as pt

    with pt.raises(ValueError, match="2 lists"):
        rrf_fuse_many([a], "doc_id")


def test_rrf_fuse_many_agrees_with_pairwise_ordering(spark):
    """On the fixture retrieval pair, the N-list verb's ordering equals
    rrf_fuse's (quantization granularity differs below 1e-9; ranks
    must match on real data)."""
    from ccog_spark.operators.text import rrf_fuse, rrf_fuse_many

    mk = lambda rows: spark.createDataFrame(
        rows, "q_id long, doc_id long, rn int"
    )
    a = mk([(1, i, r + 1) for r, i in enumerate([5, 3, 9, 7, 1])])
    b = mk([(1, i, r + 1) for r, i in enumerate([3, 1, 5, 11, 13])])
    two = [(r.q_id, r.doc_id, r.rn) for r in
           rrf_fuse(a, b, "doc_id", k=8).orderBy("q_id", "rn").collect()]
    many = [(r.q_id, r.doc_id, r.rn) for r in
            rrf_fuse_many([a, b], "doc_id", k=8).orderBy("q_id", "rn").collect()]
    assert two == many
