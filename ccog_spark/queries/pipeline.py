"""LLM-pipeline corpus queries: text analysis, dedup suite, similarity
search, multimodal metadata, as-of strategies.

Each is a deterministic, oracle-checkable slice of an operator in
ccog_spark.operators. Keys/aliases match queries/oracle_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ccog_spark.catalog import load_table
from ccog_spark.driver_threads import submit_inheriting
from ccog_spark.operators import dedup, multimodal, sharding, similarity, text, web
from ccog_spark.operators.asof import asof_join_union

EMB_DIM = 64  # fixture embedding dimension (asserted in tests)


def _tmp_index_dir(prefix: str, sf_dir: str) -> str:
    """(sf_dir, pid)-scoped temp path for a persisted parquet index,
    registered for atexit removal (round-9 ADVICE #4: repeated
    harness runs must not strand ccog_ivfpq_* dirs under the OS temp
    dir). The dir must OUTLIVE the returning query (its plan reads
    the parquet lazily; the driver collects later), so cleanup is
    process-exit, not function-exit; pid scoping keeps concurrent
    harness runs (or other scale factors) from interleaving on a
    shared path."""
    import atexit
    import hashlib
    import os
    import shutil
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    path = os.path.join(
        tempfile.gettempdir(), f"{prefix}_{tag}_{os.getpid()}"
    )
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def _await_index_builds(futures, index_dirs) -> None:
    """Wait for ALL overlapped index-build futures, then surface the
    first failure (ADVICE r17 #2 — a bare ``tb.result(), vb.result()``
    dropped the second build's exception when the first raised). On
    any failure the half-built index dirs are removed best-effort
    AFTER both builds have settled (ADVICE r17 #3 — removing a dir
    while the surviving build still writes into it would re-orphan
    it; the atexit hook in _tmp_index_dir remains the backstop)."""
    import shutil
    from concurrent.futures import wait as _wait

    _wait(list(futures))
    errs = [f.exception() for f in futures]
    if any(errs):
        for d in index_dirs:
            shutil.rmtree(d, ignore_errors=True)
        raise next(e for e in errs if e is not None)


def text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.analyze(docs).orderBy("doc_id")


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        dedup.exact_dedup(docs)
        .select("doc_id", F.md5("text").alias("h"), "is_keeper")
        .orderBy("doc_id")
    )


def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs).orderBy("doc_a", "doc_b")


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(docs).orderBy("doc_a", "doc_b")


def dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs).orderBy("doc_a", "doc_b")


PLANT_OFFSET = 10_000_000  # planted-copy id namespace


def _augmented_embeddings(emb: DataFrame) -> DataFrame:
    """Corpus + deterministic planted near-duplicates: every 10th
    vector is copied (id + PLANT_OFFSET) with +0.01 on its first
    component — cosine vs the original ≈ 1. The fixture embeddings are
    random (max pairwise cos ≈ 0.6), so without planting a 0.98
    near-dup threshold finds nothing and the driver row is vacuous.
    All arithmetic is double-precision and mirrored in the oracle."""
    base = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    planted = base.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + PLANT_OFFSET).alias("vec_id"),
        F.concat(
            F.array(F.element_at(F.col("embedding"), 1) + F.lit(0.01)),
            F.slice(F.col("embedding"), 2, EMB_DIM - 1),
        ).alias("embedding"),
    )
    return base.unionByName(planted)


def dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_dup_pairs(
        _augmented_embeddings(emb), dim=EMB_DIM
    ).orderBy("id_a", "id_b")


def _queries_subset(emb: DataFrame) -> DataFrame:
    return emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )


def ann_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        similarity.brute_force_topk(emb, _queries_subset(emb), k=5)
        .orderBy("q_id", "rn")
    )


def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        similarity.lsh_topk(emb, _queries_subset(emb), dim=EMB_DIM, k=3)
        .orderBy("q_id", "rn")
    )


def ann_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + 8-bit scalar quantization (round 15,
    similarity.ivfsq_topk — the FAISS SQ8 recipe): the E36 family's
    missing storage point between raw floats (ann_ivf) and PQ codes
    (ann_ivfpq). Same deterministic coarse quantizer and probe set as
    ann_ivf; candidates ranked by cosine against the per-dimension
    min/max-reconstructed vectors (queries unquantized — asymmetric
    distance). The oracle replays the per-dim stats, the code, and
    the reconstruction in SQL with the list rebuilt in dimension
    order (order-stable float sums)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        similarity.ivfsq_topk(emb, _queries_subset(emb), dim=EMB_DIM, k=3)
        .orderBy("q_id", "rn")
    )


def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        similarity.ivf_topk(emb, _queries_subset(emb), k=3)
        .orderBy("q_id", "rn")
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.decode_metadata(docs).orderBy("doc_id")


def q23b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: first event at-or-after the order date (the
    non-empty twin of q23; same join+agg strategy)."""
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    return (
        orders.join(
            events,
            (events.user_id == orders.o_custkey)
            & (events.ts >= orders.o_orderdate),
            "inner",
        )
        .groupBy("o_orderkey")
        .agg(F.min("ts").alias("first_event_ts"))
        .orderBy("o_orderkey")
    )


def asof_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of via the union+window strategy (no join at all):
    for each click, the latest purchase by the same user at-or-before
    it. The 100 TB-safe plan for skewed keys (operators.asof)."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click")
    purchases = events.where(F.col("event_type") == "purchase")
    return (
        asof_join_union(
            clicks,
            purchases,
            left_key="user_id",
            right_key="user_id",
            left_ts="ts",
            right_ts="ts",
            left_id="event_id",
        )
        .orderBy("event_id")
    )


def dedup_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment (E35 clustering step): connected
    components over the MinHash near-dup graph via iterative smallest-
    label propagation; oracle is a recursive transitive-closure CTE."""
    from ccog_spark.operators.cluster import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs)
    return connected_components(pairs).orderBy("doc_id")


def text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style window fingerprint (E37): min rolling hash over
    all 16-char windows — robust to content appends/prepends."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", text.window_fingerprint(F.col("text"), 16).alias("wfp")
    ).orderBy("doc_id")


def pipeline_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing via the scalable (bucketed two-level)
    global prefix sum — no single-partition WindowExec; the oracle runs
    the naive SUM() OVER (ORDER BY) spelling."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    return (
        sharding.pack_shards(docs, "n_tokens", budget=4096)
        .select("doc_id", "n_tokens", "shard_id")
        .orderBy("doc_id")
    )


def pipeline_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (pretraining batch assembly):
    each doc annotated with the fixed-length training sequences it
    spans. Same bucketed prefix-sum machinery as pipeline_shards; docs
    SPLIT across sequence boundaries here."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    return (
        sharding.pack_sequences(docs, "n_tokens", seq_len=512)
        .select("doc_id", "n_tokens", "seq_first", "seq_last")
        .orderBy("doc_id")
    )


def pipeline_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern redaction (PII-scrub stage shape) over entity-term
    patterns: replacement count + redacted sample, all JVM-side."""
    from ccog_spark.operators.text import redact_terms

    docs = load_table(spark, sf_dir, "documents")
    return redact_terms(
        docs, r"\b(customer|supplier|order)\b"
    ).orderBy("doc_id")


def range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range self-join (NO equi key): event pairs within 10 s.
    The bin rewrite keeps the plan a shuffled equi-join on the time
    bin — never a BroadcastNestedLoopJoin (asserted in pytest)."""
    from ccog_spark.operators.rangejoin import time_range_join

    ev = load_table(spark, sf_dir, "events")
    a = ev.select(F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts"))
    b = ev.select(F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts"))
    return (
        time_range_join(a, b, "a_ts", "b_ts", gap_seconds=10)
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "dt_us")
        .orderBy("a_id", "b_id")
    )


def pipeline_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota sampling (corpus-mixing shape): keep 50% en,
    20% de/es/fr, 10% zh — one map-side predicate, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    rates = {"en": 50, "de": 20, "es": 20, "fr": 20, "zh": 10}
    return (
        sharding.stratified_sample(docs, "doc_id", "lang", rates, salt=11)
        .groupBy("lang")
        .agg(F.count("*").alias("kept"))
        .orderBy("lang")
    )


def pipeline_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% hash sample of the corpus (reproducible
    eval-split shape; the sampling predicate is map-side)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        sharding.hash_sample(docs, "doc_id", percent=10, salt=7)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


def pipeline_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source TOKEN-budget mixture sampling (round 15,
    sharding.sample_token_budget — the pretraining data-mixing verb):
    every source capped at 2/5 of ITS tokens, documents admitted in
    deterministic hash order until the running total crosses the
    budget (the crossing document included). Integer-exact throughout
    (budget = Σn_tok·2 DIV 5, running sums of BIGINTs); the engine's
    grouped BUCKETED prefix sum (no per-source window — hash buckets
    are uniform, so a hot source cannot serialize into one task) must
    equal the oracle's naive per-source window replay."""
    docs = load_table(spark, sf_dir, "documents")
    return sharding.sample_token_budget(docs, 2, 5).orderBy("doc_id")


def pipeline_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document quota (round 15, sharding.quota_per_key —
    the RefinedWeb/C4 anti-spam cap: no single host may contribute
    more than N pages): keep the 7 smallest doc_ids per source. The
    rank-limited window's partial WindowGroupLimit truncates the
    heaviest key map-side BEFORE the shuffle — skew is the motivating
    case, not the failure mode. Integer output, trivially replayed by
    ROW_NUMBER in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        sharding.quota_per_key(docs, "source", cap=7)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def pipeline_mix_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed data-mixing pipeline (round 16, VERDICT r15 #6 — the
    RefinedWeb-style last mile as ONE lazy plan): per-source document
    quota (anti-spam host cap, 15 smallest ids per source) → per-source
    TOKEN-budget mixture (2/5 of each surviving source's tokens,
    deterministic hash admission order) → shard packing (global
    bucketed prefix sum, 1024-token shards). Composes the three
    operators the separate rows gate (pipeline_quota,
    pipeline_mixture, pipeline_shards) the way a training-data
    pipeline actually chains them; the oracle replays the full chain
    in nested SQL. Plan shape: one rank-limited window shuffle
    (partial WindowGroupLimit truncates heavy keys map-side), the
    grouped bucketed prefix sum (no per-source window), one global
    bucketed prefix sum — nothing corpus-sized serializes into a
    single task."""
    docs = load_table(spark, sf_dir, "documents")
    quota = sharding.quota_per_key(docs, "source", cap=15)
    mix = sharding.sample_token_budget(quota, 2, 5)
    return (
        sharding.pack_shards(mix, "n_tok", budget=1024)
        .select("doc_id", "source", "n_tok", "shard_id")
        .orderBy("doc_id")
    )


def pipeline_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-data pipeline: quality-score → filter → exact
    dedup keep-first → per-(lang, source) corpus stats. One pass of
    map-side scoring, one hash shuffle for dedup, one aggregate — the
    canonical pre-training corpus-cleaning shape at 100 TB."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    comps = text.quality_components(F.col("text"), F.col("n_chars"))
    scored = docs.select(
        "doc_id", "lang", "source", "text", comps["quality"].alias("quality")
    )
    kept = scored.where(F.col("quality") >= 0.5)
    # keep-first as ONE map-side-combinable aggregate: min_by picks the
    # smallest-doc_id row's fields per content hash directly — no
    # content window (hot duplicate = one serialized task) and no join
    # back (round-7 skew sweep, then de-joined: the downstream stats
    # only need the KEEPER rows, not a flag on every row)
    deduped = (
        kept.groupBy(F.md5("text").alias("_h"))
        .agg(
            F.min_by(
                F.struct("lang", "source", "quality"), F.col("doc_id")
            ).alias("_r")
        )
        .select("_r.*")
    )
    # avg entirely in integer space: float sums are partition-order
    # dependent, and averages of 4-decimal values land EXACTLY on
    # .xxxx5 boundaries where Spark's ROUND (shortest-decimal HALF_UP)
    # and DuckDB's (raw-binary) disagree. Integer sum + integer half-up
    # ((10S + 5n) div (10n)) is deterministic in both engines.
    qint = F.round(F.col("quality") * 10000, 0).cast("bigint")
    s = F.sum(qint)
    n = F.count(F.lit(1))
    avg_fp = F.floor((10 * s + 5 * n) / (10.0 * n)).cast("bigint")
    return (
        deduped.groupBy("lang", "source")
        .agg(
            n.alias("kept"),
            (avg_fp / F.lit(10000.0)).alias("avg_q"),
        )
        .orderBy("lang", "source")
    )


BENCH_MOD = 97  # deterministic benchmark carve: doc_id % 97 == 0


def pipeline_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any word 3-gram
    with the (deterministically carved) benchmark slice are flagged.
    Broadcast semi-join of the benchmark n-gram set — no corpus
    shuffle (operators.decontam)."""
    from ccog_spark.operators.decontam import contamination_flags

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % BENCH_MOD == 0)
    corpus = docs.where(F.col("doc_id") % BENCH_MOD != 0)
    return contamination_flags(corpus, bench, n=3).orderBy("doc_id")


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style intra-document repetition metrics + removal
    flag (operators.text.repetition_metrics)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.repetition_metrics(docs).orderBy("doc_id")


# ------------------------------------------------ multimodal pixel ops


def _fixed4(col: str, cnt) -> F.Column:
    """Half-up 4-decimal rounding of an (integer byte-sum / cnt) mean,
    computed in integer space. Float ROUND is engine-ambiguous exactly
    ON a .xxxx5 boundary, and byte-sum means DO land there (many
    fixture pixel counts are powers of two, e.g. 16x16). The operator's
    float mean times cnt recovers the integer sum exactly (sums are
    ~3e6 << 2^53); (1e4*s + cnt/2)/cnt then floors to the half-up
    value identically in Spark and DuckDB."""
    s = F.round(F.col(col) * cnt, 0).cast("bigint")
    return (F.floor((F.lit(20000) * s + cnt) / (cnt * 2)) / F.lit(10000.0)).alias(col)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pixel decode + quality-signal features on the PPM branch
    (even doc_ids). The oracle recomputes EVERY pixel byte in SQL from
    the fixture's text-tiling formula (hex(encode(text)) byte
    extraction), so the hash row proves the whole decode->feature path,
    not just container headers (multimodal_meta covers those for both
    formats, incl. the BMP branch whose pixel path is byte-checked in
    tests/test_multimodal.py)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 2 == 0)
    # fused single Arrow stage (round 17): encode + features in one
    # Python crossing — payload bytes no longer round-trip the JVM
    feats = multimodal.image_features_from_docs(docs)
    wh = (F.col("width") * F.col("height")).cast("bigint")
    return feats.select(
        "doc_id",
        "width",
        "height",
        _fixed4("mean", wh * 3),
        F.round("std", 4).alias("std"),
        _fixed4("mean_r", wh),
        _fixed4("mean_g", wh),
        _fixed4("mean_b", wh),
        # scalar probe of the luminance histogram: bin 0 holds pixels
        # with r+g+b <= 95 (trunc((S/3)*8/256) = 0 iff S <= 95)
        F.element_at("hist", 1).alias("hist0"),
    ).orderBy("doc_id")


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FSTK video-container walk + every-2nd-frame sampling
    (operators.multimodal.sample_frames). Head/tail body-byte probes
    are computed JVM-side from the sampled binary frames; the oracle
    re-derives them from the fixture's (doc_id, frame, i) byte formula,
    so the row proves the length-prefixed container arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    # fused single Arrow stage (round 17): container build + frame
    # sampling in one Python crossing
    frames = multimodal.sampled_frames_from_docs(docs, every=2)
    byte_at = lambda pos: F.conv(  # noqa: E731 - local probe helper
        F.hex(F.expr(f"substring(payload, {pos}, 1)")), 16, 10
    ).cast("int")
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("payload").alias("n_bytes"),
        byte_at(14).alias("head_byte"),   # body[0]  (13-byte PPM header)
        byte_at(781).alias("tail_byte"),  # body[767] (16*16*3 - 1)
    ).orderBy("doc_id", "frame_idx")


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbour resize to 32x24 chained into the feature
    kernel (decode -> resize -> re-encode -> decode -> features): the
    oracle replays the index arithmetic (oy*h//24, ox*w//32) per output
    byte in SQL. PPM branch (even doc_ids), like multimodal_features."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 2 == 0)
    # fused single Arrow stage (round 17): encode + resize + features
    # in one Python crossing (payload bytes previously crossed the
    # JVM↔Python boundary three times)
    feats = multimodal.resized_features_from_docs(docs, 32, 24)
    n = F.lit(32 * 24 * 3).cast("bigint")
    return feats.select(
        "doc_id",
        "width",
        "height",
        _fixed4("mean", n),
        F.round("std", 4).alias("std"),
    ).orderBy("doc_id")


def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAV/PCM16 audio features (operators.multimodal.audio_features):
    real RIFF chunk walk + signal stats. The fixture PCM is formula-
    generated, so the oracle replays every sample in SQL (window LAG
    for zero crossings)."""
    docs = load_table(spark, sf_dir, "documents")
    # fused single Arrow stage (round 17): WAV build + RIFF walk +
    # signal stats in one Python crossing
    feats = multimodal.audio_features_from_docs(docs)
    return feats.select(
        "doc_id",
        "n_bytes",
        "sample_rate",
        "n_samples",
        "duration_ms",
        "peak",
        F.round("rms", 4).alias("rms"),
        "zero_crossings",
    ).orderBy("doc_id")


def ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators.similarity.pq_topk): 8-byte
    codes + broadcast ADC lookup tables — the memory-compression scale
    path next to exact/LSH/IVF. Deterministic subsample codebook, so
    the oracle replays encode + ADC exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        similarity.pq_topk(emb, _queries_subset(emb), dim=EMB_DIM, k=3)
        .orderBy("q_id", "rn")
    )


def ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ composed (operators.similarity.ivfpq_topk): coarse
    cells prune the scan, PQ codes rank the survivors — the production
    100 TB ANN shape. Deterministic centroids AND codebook, so the
    full composition replays in the oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        similarity.ivfpq_topk(emb, _queries_subset(emb), dim=EMB_DIM, k=3)
        .orderBy("q_id", "rn")
    )


def ann_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval (round 12, similarity.ivfpq_rerank_topk):
    compressed-domain IVF+PQ top-10 candidates per query, exact-cosine
    re-rank of ONLY those rows to top-3 — the production recipe that
    removes ADC quantization error from the final ranking without a
    second corpus pass (stage 2 is a broadcast candidate join into the
    embeddings scan). Oracle: the full ADC SQL embedded at k = 10 as a
    candidate subquery + exact-cosine re-rank replay."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        similarity.ivfpq_rerank_topk(
            emb, _queries_subset(emb), dim=EMB_DIM, k=3, m=10
        )
        .orderBy("q_id", "rn")
    )


def ann_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED IVF+PQ index (operators/ann_index.py): build the
    parquet index (codes/centroids/codebook/meta) in a temp dir, then
    answer the standard query batch FROM THE INDEX ONLY — embeddings
    are never re-read at query time. Must (and does — bit-identical,
    pinned in tests) produce exactly ivfpq_topk's output, so the
    oracle is ann_ivfpq's oracle verbatim: one SQL truth, two
    execution paths (inline vs persisted)."""
    from ccog_spark.operators.ann_index import (
        build_ivfpq_index,
        query_ivfpq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    idx = _tmp_index_dir("ccog_ivfpq_idx", sf_dir)
    build_ivfpq_index(emb, EMB_DIM, idx)
    return query_ivfpq_index(
        spark, idx, _queries_subset(emb), k=3
    ).orderBy("q_id", "rn")


def corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-source corpus PROFILE — the "what's in this crawl"
    report every pipeline run starts with: doc counts, token mass,
    exact-dup rate, mean distinct-ratio (quantized-integer sum — repo
    float rule: consumers divide by n_docs), and language mix, all
    composed from text.analyze + dedup.exact_dedup in ONE lazy plan.
    groupBy(source) aggregates are map-side combinable; the only
    joins are doc_id-keyed (AQE). The oracle reuses the text_analysis
    SQL as a CTE — one truth for the per-doc metrics."""
    from ccog_spark.operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    an = text.analyze(docs)
    return (
        an.join(docs.select("doc_id", "source"), "doc_id")
        .join(exact_dedup(docs).select("doc_id", "is_keeper"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            F.sum((~F.col("is_keeper")).cast("bigint")).alias("n_dup"),
            F.sum(
                F.floor(F.col("distinct_ratio") * 1000000 + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("sum_dr_q"),
            F.sum(
                (F.col("lang_pred") == "en").cast("bigint")
            ).alias("n_en"),
        )
        .orderBy("source")
    )


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style cluster-scoped semantic dedup (operators.dedup.
    semantic_dedup): coarse-quantizer cells via the deterministic IVF
    centroid selection, cosine ≥ 0.98 keep-first WITHIN each cell, on
    the planted-near-dup augmented corpus (same augmentation as
    dedup_embed so the drop path is exercised). Third embedding-dedup
    scale shape next to LSH banding and exact pairs: candidate scope
    is the CLUSTER, pair work Σ|cell|². The oracle replays centroid
    selection, argmax assignment (smallest-cent_id tie-break), and
    the rounded-cosine within-cell exists."""
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.semantic_dedup(
        _augmented_embeddings(emb), dim=EMB_DIM
    ).orderBy("vec_id")


def pipeline_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring (span) dedup with rebuild (operators.dedup.
    remove_repeated_spans — Lee et al. 2022's repeated-span removal at
    token granularity, k=8 for the small-vocab fixture): every 8-token
    window seen earlier in the corpus has its tokens dropped; cleaned
    documents are reassembled in order. The oracle replays window
    extraction, global keep-first ranking, position-set coverage, and
    the ordered rebuild in pure SQL."""
    from ccog_spark.operators.dedup import remove_repeated_spans

    docs = load_table(spark, sf_dir, "documents")
    return remove_repeated_spans(docs, k=8).orderBy("doc_id")


def ann_index_append_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL index growth (operators/ann_index.append_to_index,
    round 8): build the parquet index from the vec_id%3≠0 two-thirds
    of the corpus, append the remaining third encoded under the FROZEN
    saved model (no retrain), answer the standard query batch from the
    grown index. The oracle replays exactly that drift contract:
    centroid selection and codebook rows come from the build subset
    only, while encode/candidates cover the whole corpus — so a
    silent retrain (or a failure to encode the delta) hash-mismatches."""
    from ccog_spark.operators.ann_index import (
        append_to_index,
        build_ivfpq_index,
        query_ivfpq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.where(F.col("vec_id") % 3 != 0)
    b = emb.where(F.col("vec_id") % 3 == 0)
    idx = _tmp_index_dir("ccog_ivfpq_app", sf_dir)
    build_ivfpq_index(a, EMB_DIM, idx)
    append_to_index(b, idx)
    return query_ivfpq_index(
        spark, idx, _queries_subset(emb), k=3
    ).orderBy("q_id", "rn")


def pipeline_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window document chunking (operators.text.chunk_documents,
    64-token chunks / 48-token stride): map-side fan-out, no shuffle,
    no Python. Oracle replays the slice arithmetic with list slicing
    and hashes the same joined string."""
    docs = load_table(spark, sf_dir, "documents")
    return text.chunk_documents(docs, chunk=64, stride=48).orderBy(
        "doc_id", "chunk_idx"
    )


def _synth_url() -> F.Column:
    """Deterministic messy URL per document row (doc_id, source):
    mixed-case scheme/host, www. on every 4th, explicit :443 on every
    7th, tracking params + unsorted keys on every 3rd≡0, the same
    params clean on 3rd≡1, a fragment on every 5th, and a ccTLD
    second-level suffix when len(source) is odd. Designed so distinct
    raw spellings collapse under canonicalization (≡0 and ≡1 rows
    with equal (source, doc_id%50) become ONE canonical URL)."""
    d = F.col("doc_id")
    return F.concat(
        F.lit("HTTPS://"),
        F.when(d % 4 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.col("source"),
        F.when(F.length("source") % 2 == 1, F.lit(".Example.co.uk")).otherwise(
            F.lit(".Example.COM")
        ),
        F.when(d % 7 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/Docs/"),
        (d % 50).cast("string"),
        F.when(d % 3 == 0, F.lit("/?utm_source=feed&b=2&ref=rss&a=1"))
        .when(d % 3 == 1, F.lit("?b=2&a=1"))
        .otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )


def pipeline_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup (operators.web): canonicalize deterministic
    messy URLs, keep-first per canonical form, annotate host +
    registered domain. Pure JVM expressions end-to-end; the one
    shuffle is the groupBy on the canonical key. Oracle replays every
    rule with DuckDB string/list functions."""
    docs = load_table(spark, sf_dir, "documents")
    deduped = web.url_dedup(
        docs.select("doc_id", _synth_url().alias("raw_url")),
        "raw_url",
        "doc_id",
    )
    # host appears twice (column + registered_domain input); Catalyst
    # does not CSE inside expression trees, but this projection runs
    # AFTER the group-by — rows here are unique canonical URLs, not
    # corpus rows, so the duplicated parse is index-sized work
    host = web.url_host(F.col("url"))
    return (
        deduped.select(
            "url",
            "keeper",
            "n_raw",
            host.alias("host"),
            web.registered_domain(host).alias("domain"),
        )
        .orderBy("url")
    )


def pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composed hygiene pipeline — the full pre-training
    cleaning pass in ONE lazy plan: quality filter → exact dedup
    (keep-first) → MinHash-LSH near-dup removal (connected components,
    keep cluster representative) → benchmark decontamination → final
    per-(lang, source) corpus stats.

    Every stage is the same operator the standalone corpus rows check
    individually; this row proves they COMPOSE — the output hash
    covers the interaction of all four stages. Scale shape: the only
    shuffles are the dedup hash, the LSH band keys, the CC label
    iterations (diameter-bounded on near-dup clusters), and the final
    aggregate; corpus text never joins against itself un-blocked.

    Bench set = every 97th raw doc (held out of the pipeline input);
    flagged docs are dropped, mirroring production decontamination."""
    from ccog_spark.operators.cluster import connected_components
    from ccog_spark.operators.decontam import contamination_flags

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 97 != 0)

    comps = text.quality_components(F.col("text"), F.col("n_chars"))
    kept = corpus.select(
        "doc_id", "lang", "source", "text", comps["quality"].alias("quality")
    ).where(F.col("quality") >= 0.5)
    # kept feeds three consumers (pair generation, the survivor join,
    # and the decontam probe input) — persist once instead of
    # recomputing quality scoring + the dedup window per consumer
    # (registry._scoped bounds cross-query cache accumulation)
    # keeper rows directly (dedup.keep_first): one combinable
    # aggregate, no flag join — the e2e stage never reads dropped rows
    kept = dedup.keep_first(kept).persist()

    pairs = dedup.minhash_lsh_pairs(kept)
    cc = connected_components(pairs)
    non_reps = cc.where(F.col("doc_id") != F.col("cluster")).select("doc_id")
    surv = kept.join(non_reps, "doc_id", "left_anti")

    flags = contamination_flags(surv.select("doc_id", "text"), bench)
    clean = surv.join(
        flags.where(~F.col("contaminated")).select("doc_id"), "doc_id", "semi"
    )

    nt = F.size(F.split(F.col("text"), " ")).cast("bigint")
    return (
        clean.select("lang", "source", nt.alias("nt"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("kept"),
            F.sum("nt").alias("tokens"),
        )
        .orderBy("lang", "source")
    )


def pipeline_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick sparse TF-IDF (operators.text.hashed_tfidf):
    long-form (doc, bucket, tf, weight) document vectors. Two
    shuffles total (TF group, bucket-DF group), DF broadcast back.
    The oracle replays token hashing, bucketing, and the rational-IDF
    weight exactly (see the operator docstring for why rational, not
    ln)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.hashed_tfidf(docs).orderBy("doc_id", "bucket")


# pipeline_tokenize merge budget: small enough that rare words stay
# multi-token on the fixture corpus (non-trivial encode), large enough
# to exercise merged-symbol operands in later merges.
TOKENIZE_MERGES = 60


def pipeline_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenization driver row (round 12 — operators/bpe.py was the
    one substantial operator with zero queries() presence): train
    TOKENIZE_MERGES merges on the documents corpus (deterministic —
    greedy max pair count, lexicographic tie-break), derive the id
    vocabulary from the corpus alphabet, tokenize every document
    map-side, and emit (doc_id, n_tokens, first8) with the first 8
    token ids comma-joined.

    The DuckDB oracle replays the ENTIRE construction data-dependently
    in SQL — word counts, the greedy merge loop (recursive CTE; the
    left-to-right single-pair rewrite is the candidate-run parity
    rule), the ascending-rank encode loop, vocabulary id assignment,
    and the per-doc flatten — so a divergence anywhere in training
    order, the encode loop, or id assignment breaks the value hash.
    Training's driver-side merge loop collects only the word-frequency
    table (vocabulary-sized, Heaps-law ≪ corpus; MAX_VOCAB_WORDS
    guard), exactly like production BPE trainers."""
    from ccog_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.train_bpe(docs, n_merges=TOKENIZE_MERGES)
    alpha = bpe.corpus_alphabet(docs)
    toks = bpe.tokenize_ids(docs, merges, alpha)
    return toks.select(
        "doc_id",
        F.size("ids").alias("n_tokens"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice(F.col("ids"), 1, 8), lambda x: x.cast("string")
            ),
        ).alias("first8"),
    ).orderBy("doc_id")


def pipeline_tokenize_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenization from the PERSISTED BPE model (round 16, VERDICT
    r15 #7 — bpe.build_bpe_model/tokenize_ids_from_model): train once,
    persist merges/alphabet/meta as parquet, then tokenize the corpus
    from the model tables only — training never re-runs at query time
    (the query_bm25_index contract, tokenizer edition; the freeze rule
    is the ANN frozen-model one — a vocabulary change is a rebuild).
    Output and oracle are pipeline_tokenize's verbatim: one SQL truth,
    two execution paths."""
    from ccog_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    model = _tmp_index_dir("ccog_bpe_model", sf_dir)
    bpe.build_bpe_model(docs, model, n_merges=TOKENIZE_MERGES)
    toks = bpe.tokenize_ids_from_model(docs, model)
    return toks.select(
        "doc_id",
        F.size("ids").alias("n_tokens"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice(F.col("ids"), 1, 8), lambda x: x.cast("string")
            ),
        ).alias("first8"),
    ).orderBy("doc_id")


def pipeline_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (round 12, operators.text.bm25_topk):
    deterministic query set (first 3 words of every doc_id % 97 == 11
    document), top-5 docs per query by the rational-idf BM25 with
    per-term half-up 1e6 quantization summed as BIGINTs. The oracle
    replays tokenization, TF/DF/dl/avgdl, the exact double arithmetic
    (identical association order), and the quantized sum."""
    docs = load_table(spark, sf_dir, "documents")
    queries = docs.where(F.col("doc_id") % 97 == 11).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 3), " "
        ).alias("q_text"),
    )
    return text.bm25_topk(docs, queries, k=5).orderBy("q_id", "rn")


# Fixed high-df query batch for the ENGAGED-path row below: 'dup' is
# the fixture's one rare term (df ≈ n_docs/20) amid ~uniform
# corpus-scale words, so every query is "rare essential + two
# prunable stopword-scale terms" — the max-score planner engages at
# every SF (seed df ≥ k, pre-check cut ≈ 97% of postings). Shared
# with the oracle builder so both sides stay in sync.
BM25_PRUNED_QUERY_BATCH = (
    (1, "dup the stream"),
    (2, "dup value data"),
    (3, "dup big small"),
    (4, "dup a spark"),
    (5, "dup sort query"),
    (6, "dup agg batch"),
)


def pipeline_bm25_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 with max-score pruning ENGAGED (round 13): the fixed
    rare+stopword query batch above with the postings floor lifted, so
    the driver hash-gates the pruned plan — candidate doc-id union,
    pushed-down semi joins, θ probe — against the UNPRUNED DuckDB
    replay. Identical hashes ARE the losslessness proof at every SF
    (the 3-seed pytest property covers random corpora; this row covers
    the fixture + the driver's own comparison)."""
    docs = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        list(BM25_PRUNED_QUERY_BATCH), "q_id long, q_text string"
    )
    return text.bm25_topk(
        docs, queries, k=5, min_postings=0
    ).orderBy("q_id", "rn")


def pipeline_bm25_blockmax_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOCK-MAX pruning ENGAGED from the index (round 15,
    build_bm25_index(block_max=True) + the BlockMaxWAND candidate cut
    in text._bm25_rank): the index stores per-(term, id-range-block)
    tf ceilings; with the postings floor lifted, the fixed
    rare+stopword batch engages max-score AND the block cut — whole
    blocks of the stopword terms' postings are skipped when their
    best possible contribution cannot reach θ. Lossless by the bound
    proof in _bm25_rank, so the oracle is the UNPRUNED from-scratch
    SQL with the same fixed batch (pipeline_bm25_pruned's oracle
    verbatim): identical hashes ARE the losslessness proof for the
    composed cut at every SF."""
    from ccog_spark.operators.text_index import (
        build_bm25_index,
        query_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = _tmp_index_dir("ccog_bm25_bmx", sf_dir)
    build_bm25_index(docs, idx, block_max=True)
    queries = spark.createDataFrame(
        list(BM25_PRUNED_QUERY_BATCH), "q_id long, q_text string"
    )
    # "force" bypasses the round-16 cost gate: this row's purpose is
    # hash-gating the ENGAGED block cut at driver scale, where the
    # essential Σdf sits far below the production crossover
    return query_bm25_index(
        spark, idx, queries, k=5, min_postings=0, block_max="force"
    ).orderBy("q_id", "rn")


def pipeline_bm25_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED BM25 inverted index (round 13,
    operators/text_index.py): build the bucket-partitioned parquet
    index (postings/terms/doclens/meta) in a temp dir, then answer the
    standard corpus-derived query batch FROM THE INDEX ONLY — the raw
    documents are never re-read at query time. Must (and does — shared
    scoring core, pinned in tests) produce exactly bm25_topk's output,
    so the oracle is pipeline_bm25's from-scratch SQL verbatim: one
    SQL truth, two execution paths (inline vs persisted) — the same
    contract ann_index carries for E36."""
    from ccog_spark.operators.text_index import (
        build_bm25_index,
        query_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = _tmp_index_dir("ccog_bm25_idx", sf_dir)
    build_bm25_index(docs, idx)
    queries = docs.where(F.col("doc_id") % 97 == 11).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 3), " "
        ).alias("q_text"),
    )
    return query_bm25_index(spark, idx, queries, k=5).orderBy("q_id", "rn")


def pipeline_bm25_index_append_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL text-index growth (round 13,
    text_index.append_to_text_index): build the index on 6/7 of the
    corpus, append the remaining 1/7 (postings/doclens append + staged
    terms df-merge), answer the standard batch from the GROWN index.
    Results must equal the from-scratch computation over the union
    corpus, so the oracle is pipeline_bm25's SQL verbatim — the same
    build-vs-grown equivalence contract ann_index_append carries."""
    from ccog_spark.operators.text_index import (
        append_to_text_index,
        build_bm25_index,
        query_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = _tmp_index_dir("ccog_bm25_app", sf_dir)
    build_bm25_index(docs.where(F.col("doc_id") % 7 != 0), idx)
    append_to_text_index(docs.where(F.col("doc_id") % 7 == 0), idx)
    queries = docs.where(F.col("doc_id") % 97 == 11).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 3), " "
        ).alias("q_text"),
    )
    return query_bm25_index(spark, idx, queries, k=5).orderBy("q_id", "rn")


def pipeline_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRF query expansion (round 14, text.bm25_prf_topk — the
    two-pass recall lever): BM25 top-10 feedback docs donate their 3
    most frequent non-query terms; the expanded set re-ranks with the
    shared scoring core. Integer-exact simplification of RM3 (the
    relevance-model interpolation is dropped — floats a cross-engine
    hash cannot carry); the oracle nests the pass-1 SQL verbatim
    inside the expanded q CTE."""
    docs = load_table(spark, sf_dir, "documents")
    queries = docs.where(F.col("doc_id") % 97 == 11).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 3), " "
        ).alias("q_text"),
    )
    return text.bm25_prf_topk(
        docs, queries, k=5, k_fb=10, e_terms=3
    ).orderBy("q_id", "rn")


def pipeline_snippet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snippet extraction (round 14, text.snippet_match — the result
    page's highlight verb): the text window (±3 positions) around the
    FIRST exact occurrence of each matching phrase, first_pos = min
    full-coverage anchor from the shared phrase machinery. String +
    integer output; the oracle replays anchors, the min, and the raw
    split slice/rejoin byte-for-byte."""
    docs = load_table(spark, sf_dir, "documents")
    return text.snippet_match(docs, _phrase_batch(docs), window=3).orderBy(
        "q_id", "doc_id"
    )


def pipeline_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified retrieval (round 14, text.diversify_topk): BM25
    top-20 re-cut to at most 2 documents per source, final top-5 —
    the standard search-quality post-pass (a result page dominated by
    one crawl source is a worse page). Deterministic greedy rule,
    pure windows over query-batch-sized frames; the oracle wraps the
    bm25 SQL verbatim in the same two-window SQL."""
    docs = load_table(spark, sf_dir, "documents")
    queries = docs.where(F.col("doc_id") % 97 == 11).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 3), " "
        ).alias("q_text"),
    )
    ranked = text.bm25_topk(docs, queries, k=20)
    return text.diversify_topk(
        ranked, docs.select("doc_id", "source"), "source",
        k=5, max_per_group=2,
    ).orderBy("q_id", "rn")


def pipeline_bm25f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-field BM25F ranking (round 14, text.bm25f_topk): the
    fixture corpus is single-field, so title/body are SYNTHESIZED
    deterministically (title = words 1-5, body = the rest — the
    pipeline_line_dedup synthesize-then-check precedent) and weighted
    2:1, so a title hit outranks the same hit in the body. Term
    saturation applies once to the combined field evidence (the BM25F
    property); per-field contributions are 1e9-quantized BIGINTs so
    the field sum is exact, then the per-term score is 1e6-quantized
    like every hashed retrieval row. The oracle replays field
    synthesis, per-field normalization, the integer combination, and
    the saturating score in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    tk = F.split("text", " ")
    fielded = docs.select(
        "doc_id",
        F.array_join(F.slice(tk, 1, 5), " ").alias("title"),
        F.array_join(
            F.expr(
                "slice(split(text, ' '), 6,"
                " greatest(size(split(text, ' ')) - 5, 0))"
            ),
            " ",
        ).alias("body"),
    )
    queries = docs.where(F.col("doc_id") % 97 == 11).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(F.slice(tk, 1, 3), " ").alias("q_text"),
    )
    return text.bm25f_topk(
        fielded, queries, field_cols=("title", "body"),
        weights=(2.0, 1.0), k=5,
    ).orderBy("q_id", "rn")


# Filtered-retrieval predicate over the index's docmeta columns —
# module-level so the oracle imports it VERBATIM (the
# BM25_PRUNED_QUERY_BATCH no-drift precedent). Odd-numbered sources ≈
# half the corpus: both the kept and excluded paths carry weight.
BM25_FILTER_PRED = (
    "source IN ('src1','src3','src5','src7','src9',"
    "'src11','src13','src15','src17','src19')"
)


def pipeline_bm25_index_filtered_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FILTERED retrieval from the persisted index (round 14,
    query_bm25_index(doc_filter=…)): the index stores a narrow
    docmeta table (build_bm25_index(meta_cols=…), Lucene stored-fields
    shape); at query time a metadata predicate restricts CANDIDATES
    while df/n_docs/avgdl stay index-wide — Lucene filter semantics,
    the statistical opposite of the deletion row. The oracle is the
    bm25 SQL with the same predicate joined into the scoring CTE
    only (stats CTEs untouched), predicate shared verbatim via
    BM25_FILTER_PRED."""
    from ccog_spark.operators.text_index import (
        build_bm25_index,
        query_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = _tmp_index_dir("ccog_bm25_fil", sf_dir)
    build_bm25_index(docs, idx, meta_cols=("lang", "source"))
    queries = docs.where(F.col("doc_id") % 97 == 11).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 3), " "
        ).alias("q_text"),
    )
    return query_bm25_index(
        spark, idx, queries, k=5, doc_filter=BM25_FILTER_PRED
    ).orderBy("q_id", "rn")


def pipeline_bm25_index_delete_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INDEX DELETION (round 14, text_index.delete_from_text_index —
    VERDICT r13 #2): build the inverted index over the FULL corpus,
    delete the doc_id % 13 == 3 slice (takedown batch: tombstones +
    df-decremented terms + meta rewrite), answer the standard batch
    from the index. Results must equal the from-scratch computation
    over the SURVIVING corpus — the oracle is pipeline_bm25's SQL with
    the corpus CTE filtered to the survivors (queries still derive
    from the full table: a deleted document stops being FINDABLE, not
    askable). Physical postings are untouched until compact — the
    bit-identity of logical deletion is exactly what this row hashes."""
    from ccog_spark.operators.text_index import (
        build_bm25_index,
        delete_from_text_index,
        query_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = _tmp_index_dir("ccog_bm25_del", sf_dir)
    build_bm25_index(docs, idx)
    delete_from_text_index(
        spark, idx, docs.where(F.col("doc_id") % 13 == 3).select("doc_id")
    )
    queries = docs.where(F.col("doc_id") % 97 == 11).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 3), " "
        ).alias("q_text"),
    )
    return query_bm25_index(spark, idx, queries, k=5).orderBy("q_id", "rn")


def pipeline_bm25f_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-resident BM25F (round 15, VERDICT r14 #4 —
    text_index.build_bm25f_index/query_bm25f_index): the fielded
    corpus (title = words 1-5, body = the rest, the pipeline_bm25f
    synthesis verbatim) is indexed ONCE into per-field tf/dl tables
    sharing the bucket layout; the 2:1-weighted query batch is
    answered from the posting buckets only — structured-document
    ranking without re-reading the fields. Shared combination/scoring
    code (bm25f_field_contrib + _bm25f_rank) ⇒ bit-identical to the
    inline operator, so the oracle is pipeline_bm25f's SQL verbatim
    (one truth, two execution paths — the query_bm25_index
    contract)."""
    from ccog_spark.operators.text_index import (
        build_bm25f_index,
        query_bm25f_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    tk = F.split("text", " ")
    fielded = docs.select(
        "doc_id",
        F.array_join(F.slice(tk, 1, 5), " ").alias("title"),
        F.array_join(
            F.expr(
                "slice(split(text, ' '), 6,"
                " greatest(size(split(text, ' ')) - 5, 0))"
            ),
            " ",
        ).alias("body"),
    )
    idx = _tmp_index_dir("ccog_bm25f_idx", sf_dir)
    build_bm25f_index(fielded, idx, ("title", "body"))
    queries = docs.where(F.col("doc_id") % 97 == 11).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(F.slice(tk, 1, 3), " ").alias("q_text"),
    )
    return query_bm25f_index(
        spark, idx, queries, (2.0, 1.0), k=5
    ).orderBy("q_id", "rn")


def pipeline_prf_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-resident PRF (round 15, VERDICT r14 #5 —
    text_index.query_bm25_prf_index): both retrieval passes read
    pruned posting buckets and the feedback-term counts come from the
    winners' postings rows — the inline operator's three corpus
    passes become zero. Shared pass-1/pass-2 scoring core ⇒
    bit-identical to text.bm25_prf_topk, so the oracle is
    pipeline_prf's nested SQL verbatim."""
    from ccog_spark.operators.text_index import (
        build_bm25_index,
        query_bm25_prf_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = _tmp_index_dir("ccog_prf_idx", sf_dir)
    # forward=True: feedback counts read the winners' doc-bucket
    # directories instead of the full postings width (round 15)
    build_bm25_index(docs, idx, forward=True)
    queries = docs.where(F.col("doc_id") % 97 == 11).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 3), " "
        ).alias("q_text"),
    )
    return query_bm25_prf_index(
        spark, idx, queries, k=5, k_fb=10, e_terms=3
    ).orderBy("q_id", "rn")


def _phrase_batch(docs: DataFrame) -> DataFrame:
    """Deterministic phrase set: words 2..4 of every doc_id % 101 == 7
    document — every phrase has ≥ 1 guaranteed match (its source doc)
    and the small fixture vocabulary makes cross-document matches
    common, so both the hit and miss paths are exercised."""
    return docs.where(F.col("doc_id") % 101 == 7).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 2, 3), " "
        ).alias("phrase"),
    )


def pipeline_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search (round 14, text.phrase_match — VERDICT r13
    #5): anchor-normalized adjacency over 1-based raw-split token
    positions, counting occurrences per (query, document). Pure
    integer output; the oracle replays tokenization with positions,
    the anchor group, the distinct-offset coverage test, and the
    occurrence count in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return text.phrase_match(docs, _phrase_batch(docs)).orderBy(
        "q_id", "doc_id"
    )


def pipeline_phrase_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase search FROM THE POSITIONAL INDEX (round 14,
    text_index.phrase_match_index): build_bm25_index(positions=True)
    stores per-posting occurrence positions; the phrase terms' posting
    buckets alone answer the adjacency query — the corpus is never
    re-read. Shared adjacency core ⇒ bit-identical to the inline
    operator, so the oracle is pipeline_phrase's SQL verbatim (the
    query_bm25_index one-truth contract)."""
    from ccog_spark.operators.text_index import (
        build_bm25_index,
        phrase_match_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = _tmp_index_dir("ccog_bm25_pos", sf_dir)
    build_bm25_index(docs, idx, positions=True)
    return phrase_match_index(spark, idx, _phrase_batch(docs)).orderBy(
        "q_id", "doc_id"
    )


def pipeline_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered PROXIMITY search (round 14, text.proximity_match —
    the relaxation of pipeline_phrase): all query terms co-occurring
    within a 5-position window in any order, counting qualifying
    window starts. Same deterministic phrase batch as the exact rows
    (3-token phrases ⇒ span 5 admits permutations and one-token
    gaps); the oracle replays the window self-join, the
    distinct-offset coverage test, and the start count in SQL —
    integers only."""
    docs = load_table(spark, sf_dir, "documents")
    return text.proximity_match(docs, _phrase_batch(docs), max_span=5).orderBy(
        "q_id", "doc_id"
    )


def pipeline_proximity_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity search FROM THE POSITIONAL INDEX (round 14,
    text_index.proximity_match_index): the query terms' posting
    buckets alone answer the window query — the corpus is never
    re-read. Shared core (text._proximity_core) ⇒ bit-identical to
    the inline operator, so the oracle is pipeline_proximity's SQL
    verbatim (the phrase pair's one-truth pattern)."""
    import os

    from ccog_spark.operators.text_index import (
        build_bm25_index,
        proximity_match_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = _tmp_index_dir("ccog_bm25_pos", sf_dir)
    if not os.path.isdir(os.path.join(idx, "meta")):
        build_bm25_index(docs, idx, positions=True)
    return proximity_match_index(
        spark, idx, _phrase_batch(docs), max_span=5
    ).orderBy("q_id", "doc_id")


def pipeline_snippet_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snippet extraction FROM THE POSITIONAL INDEX (round 15,
    text_index.snippet_match_index — completes the inline↔index twin
    set): anchor discovery reads only the phrase terms' posting
    buckets, and the corpus text is read ONLY for the matching
    documents' slice rows (the rerank_corpus shape). Shared slicing
    core (text._snippet_core) ⇒ bit-identical to the inline operator,
    so the oracle is pipeline_snippet's SQL verbatim (the phrase
    pair's one-truth pattern)."""
    import os

    from ccog_spark.operators.text_index import (
        build_bm25_index,
        snippet_match_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = _tmp_index_dir("ccog_bm25_pos", sf_dir)
    if not os.path.isdir(os.path.join(idx, "meta")):
        build_bm25_index(docs, idx, positions=True)
    return snippet_match_index(
        spark, idx, _phrase_batch(docs), docs, window=3
    ).orderBy("q_id", "doc_id")


def pipeline_diversified_index_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Diversified retrieval with the GROUPS TABLE from the index
    (round 15): query_bm25_index supplies the top-20 and the index's
    own docmeta table (build_bm25_index(meta_cols=("source",)) — the
    Lucene stored-fields shape) supplies the per-document group, so
    the corpus text is NEVER re-read at query time — the complete
    index-resident result-page recipe (rank + diversify). Both halves
    are pinned bit-identical to their inline twins (query ≡
    bm25_topk; diversify_topk is literally shared), so the oracle is
    pipeline_diversified's SQL verbatim."""
    from ccog_spark.operators.text_index import (
        build_bm25_index,
        query_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = _tmp_index_dir("ccog_bm25_div", sf_dir)
    build_bm25_index(docs, idx, meta_cols=("source",))
    queries = docs.where(F.col("doc_id") % 97 == 11).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 3), " "
        ).alias("q_text"),
    )
    ranked = query_bm25_index(spark, idx, queries, k=20)
    import os as _os

    groups = spark.read.parquet(_os.path.join(idx, "docmeta"))
    return text.diversify_topk(
        ranked, groups, "source", k=5, max_per_group=2
    ).orderBy("q_id", "rn")


def ann_index_delete_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN INDEX DELETION (round 14, ann_index.delete_from_ann_index —
    the E36 twin of pipeline_bm25_index_delete): build the IVF+PQ
    index over the full corpus, tombstone the vec_id % 11 == 5 slice,
    answer the standard batch. ADC scoring has no corpus statistics,
    so deletion is purely candidate exclusion — the oracle is the
    ann_ivfpq SQL with the CANDIDATE side filtered to survivors while
    the model (centroids/codebook trained on the full corpus) stays
    frozen, exactly the drift contract of the append row mirrored."""
    from ccog_spark.operators.ann_index import (
        build_ivfpq_index,
        delete_from_ann_index,
        query_ivfpq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    idx = _tmp_index_dir("ccog_ivfpq_del", sf_dir)
    build_ivfpq_index(emb, EMB_DIM, idx)
    delete_from_ann_index(
        spark, idx, emb.where(F.col("vec_id") % 11 == 5).select("vec_id")
    )
    return query_ivfpq_index(
        spark, idx, _queries_subset(emb), k=3
    ).orderBy("q_id", "rn")


# Filtered-vector-search predicate over the index's vecmeta columns —
# module-level so the oracle derives its SQL from the SAME string
# (BM25_FILTER_PRED precedent; the oracle wraps it in a semi-join
# subquery against the embeddings table, so it must be valid over
# that table's columns).
ANN_FILTER_PRED = "label % 2 = 0"


def ann_index_filtered_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search from the persisted index (round 14,
    query_ivfpq_index(vec_filter=…) — the text filtered-retrieval
    row's E36 twin): the index stores a narrow vecmeta table
    (build_ivfpq_index(meta_cols=…)); at query time a metadata
    predicate restricts candidates through the tombstone-exclusion
    mechanism. ADC has no corpus statistics, so the oracle is the
    ann_ivfpq SQL with the candidate side filtered by the same
    predicate — the deletion row's shape with a predicate-defined
    set (bit-identity to tombstoning the complement is pinned in
    pytest)."""
    from ccog_spark.operators.ann_index import (
        build_ivfpq_index,
        query_ivfpq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    idx = _tmp_index_dir("ccog_ivfpq_fil", sf_dir)
    build_ivfpq_index(emb, EMB_DIM, idx, meta_cols=("label",))
    return query_ivfpq_index(
        spark, idx, _queries_subset(emb), k=3, vec_filter=ANN_FILTER_PRED
    ).orderBy("q_id", "rn")


def ann_sq8_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted IVF+SQ8 index (round 15,
    ann_index.build_ivfsq_index/query_ivfsq_index — the
    scalar-quantized twin of ann_index): build the cell-clustered
    scalar-code index (dim bytes/vector, 4× smaller than raw
    float32), answer the standard batch from the codes + sqstats
    model tables only — embeddings never re-read. The oracle replays
    the shared two-hop cell assignment (the ann_ivfpq chain verbatim)
    composed with ann_sq8's quantize/reconstruct CTEs and the
    asymmetric reconstructed cosine."""
    from ccog_spark.operators.ann_index import (
        build_ivfsq_index,
        query_ivfsq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    idx = _tmp_index_dir("ccog_ivfsq", sf_dir)
    build_ivfsq_index(emb, EMB_DIM, idx)
    return query_ivfsq_index(
        spark, idx, _queries_subset(emb), k=3
    ).orderBy("q_id", "rn")


def ann_sq8r_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted IVF+SQ8 index with RESIDUAL encoding (round 16,
    VERDICT r15 #5 — ann_index.build_ivfsq_index(residual=True),
    quant='sq8r', the FAISS IndexIVFScalarQuantizer by_residual
    default): per-dim stats trained over x − centroid(cell), residual
    quantization, centroid-added reconstruction — same dim code bytes
    as sq8, tighter spans on clustered corpora (recall 0.678 → 0.984
    at equal probe budget on the synthesized clustered probe,
    SCALING.md round-16). Oracle = the sq8-index SQL with the
    residual-trained stats CTEs and cv[d]-added reconstruction."""
    from ccog_spark.operators.ann_index import (
        build_ivfsq_index,
        query_ivfsq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    idx = _tmp_index_dir("ccog_ivfsqr", sf_dir)
    build_ivfsq_index(emb, EMB_DIM, idx, residual=True)
    return query_ivfsq_index(
        spark, idx, _queries_subset(emb), k=3
    ).orderBy("q_id", "rn")


def ann_pqr_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted residual IVF+PQ index (round 16 —
    ann_index.build_ivfpq_index(residual=True), quant='pqr', the
    FAISS IndexIVFPQ by_residual default): codebook trained on the
    deterministic sample rows' residuals, codes encode
    x − centroid(cell), queries rank the probed cells by the
    asymmetric cosine against x̂ = centroid + decode(codes) — the
    sq8r ranking contract at 1 byte/block instead of 1 byte/dim.
    Oracle = the full SQL replay (_ivfpqr_index_sql): residual
    codebook, per-block argmin, list_zip reconstruction."""
    from ccog_spark.operators.ann_index import (
        build_ivfpq_index,
        query_ivfpq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    idx = _tmp_index_dir("ccog_ivfpqr", sf_dir)
    build_ivfpq_index(emb, EMB_DIM, idx, residual=True)
    return query_ivfpq_index(
        spark, idx, _queries_subset(emb), k=3
    ).orderBy("q_id", "rn")


def ann_pqt_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted TRAINED residual IVF+PQ index (round 17, VERDICT r16
    #4 — ann_index.build_ivfpq_index(residual=True, trained=True),
    quant='pqt', FAISS IndexIVFPQ's actual k-means training step):
    per-block Lloyd iterations over the deterministic sample's
    residuals, run in a fixed-point integer domain so the oracle's
    recursive-CTE replay reproduces the codebook BIT-IDENTICALLY
    (floor-quantized points, integer-exact distances, floor-mean
    updates, power-of-two unscaling). Codes, append under the frozen
    model, and asymmetric-cosine reconstruction are the 'pqr'
    machinery verbatim. Oracle = _ivfpqr_index_sql(trained=True)."""
    from ccog_spark.operators.ann_index import (
        build_ivfpq_index,
        query_ivfpq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    idx = _tmp_index_dir("ccog_ivfpqt", sf_dir)
    build_ivfpq_index(emb, EMB_DIM, idx, residual=True, trained=True)
    return query_ivfpq_index(
        spark, idx, _queries_subset(emb), k=3
    ).orderBy("q_id", "rn")


def ann_autoprobe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OCCUPANCY-TUNED nprobe (round 14, ann_index.auto_nprobe —
    VERDICT r13 #6): the probe count is derived from the persisted
    per-cell occupancy (participation-ratio rule, pure integers)
    instead of the fixed default — skewed quantizers probe more,
    uniform ones keep the cheap setting. The oracle recomputes the
    SAME rule in SQL from the replayed cell assignment and uses it as
    the probe cut, so the hash gates both the knob and the answers
    (the adaptive_band_bits contract). Recall-vs-cost is pinned by a
    pytest property on a deliberately skewed corpus."""
    from ccog_spark.operators.ann_index import (
        build_ivfpq_index,
        query_ivfpq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    idx = _tmp_index_dir("ccog_ivfpq_auto", sf_dir)
    build_ivfpq_index(emb, EMB_DIM, idx)
    return query_ivfpq_index(
        spark, idx, _queries_subset(emb), k=3, nprobe="auto"
    ).orderBy("q_id", "rn")


def pipeline_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (round 12): BM25 lexical top-20 and the
    PRODUCTION vector path — IVF+PQ ADC top-30 candidates re-ranked by
    exact cosine to top-20 (similarity.ivfpq_rerank_topk, never a
    corpus-wide exact scan) — over the SAME query set (documents and
    embeddings are 1:1 by id in the fixture), fused with
    reciprocal-rank fusion (text.rrf_fuse, c=60) into a top-5. The
    vector side excludes self-matches (the ADC candidate contract)
    while the lexical side naturally ranks the query's source
    document; the oracle replays both rankings (the full ADC SQL
    embeds at k=m) and the quantized fusion verbatim."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    q_text = docs.where(F.col("doc_id") % 97 == 11).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 3), " "
        ).alias("q_text"),
    )
    q_emb = emb.where(F.col("vec_id") % 97 == 11).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    # The two legs' CONSTRUCTION each runs independent driver actions
    # (the bm25 pruning planner's gate/θ/candidate jobs; the IVF+PQ
    # centroid+codebook collect) with no data dependency until the
    # fusion below — build them from a 2-thread pool (guide §2.6:
    # concurrent jobs back-fill each other's straggler tails; the
    # sharding boundary-job precedent) so the vector leg's collect
    # overlaps the lexical planner instead of queuing behind it.
    # Every persist either leg issues is explicitly ledger-tracked
    # under its own owner (bm25_topk; similarity has none), so
    # worker-thread construction leaks nothing. Results are the legs'
    # own, unchanged — only job SCHEDULING overlaps.
    # submit_inheriting (round 18, ADVICE r17 #1): worker threads
    # re-establish the caller's job group/description so the legs'
    # jobs stay attributable and cancellable.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        lex_f = submit_inheriting(pool, spark, text.bm25_topk, docs, q_text, 20)
        vec_f = submit_inheriting(
            pool, spark, similarity.ivfpq_rerank_topk, emb, q_emb, EMB_DIM, 20, 30
        )
        lex = lex_f.result()
        vec = vec_f.result().withColumnRenamed("vec_id", "doc_id")
    return text.rrf_fuse(lex, vec, "doc_id", k=5).orderBy("q_id", "rn")


def pipeline_hybrid_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval answered ENTIRELY from persisted indexes
    (round 13 — the production stack): BM25 top-20 from the
    bucket-partitioned inverted index (text_index.query_bm25_index)
    fused with the vector top-20 from the persisted IVF+PQ index with
    exact re-rank (ann_index.query_ivfpq_index(rerank_corpus=…) — the
    embeddings table is read ONLY for the |Q|·m re-rank rows, the
    stage-2 contract). Both sides are pinned bit-identical to their
    inline twins, so the oracle is pipeline_hybrid's SQL VERBATIM:
    one truth, and now a fully index-resident execution path. The raw
    documents are never re-read at query time."""
    from ccog_spark.operators.ann_index import (
        build_ivfpq_index,
        query_ivfpq_index,
    )
    from ccog_spark.operators.text_index import (
        build_bm25_index,
        query_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    q_text = docs.where(F.col("doc_id") % 97 == 11).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 3), " "
        ).alias("q_text"),
    )
    q_emb = emb.where(F.col("vec_id") % 97 == 11).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    # The two index BUILDS are independent write pipelines to separate
    # directories — overlap them from a 2-thread pool (guide §2.6;
    # same rationale as pipeline_hybrid's leg overlap) so the vector
    # build's k-means/encode jobs back-fill the text build's write
    # tail. Both builds self-clean their persists in try/finally, so
    # worker-thread construction leaks nothing.
    from concurrent.futures import ThreadPoolExecutor

    tidx = _tmp_index_dir("ccog_bm25_hyb", sf_dir)
    vidx = _tmp_index_dir("ccog_ivfpq_hyb", sf_dir)
    with ThreadPoolExecutor(max_workers=2) as pool:
        tb = submit_inheriting(pool, spark, build_bm25_index, docs, tidx)
        vb = submit_inheriting(
            pool, spark, build_ivfpq_index, emb, EMB_DIM, vidx
        )
        _await_index_builds((tb, vb), (tidx, vidx))
    lex = query_bm25_index(spark, tidx, q_text, k=20)
    vec = query_ivfpq_index(
        spark, vidx, q_emb, k=20, rerank_corpus=emb, m=30
    ).withColumnRenamed("vec_id", "doc_id")
    return text.rrf_fuse(lex, vec, "doc_id", k=5).orderBy("q_id", "rn")


def pipeline_hybrid_index_filtered_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FILTERED hybrid retrieval from persisted indexes (round 15 —
    the production tenant-/scope-restricted search): the BM25 leg is
    narrowed by a docmeta predicate (query_bm25_index(doc_filter=
    BM25_FILTER_PRED) — Lucene filter semantics, corpus-wide stats)
    and the vector leg by a vecmeta predicate applied BEFORE ADC
    ranking and the exact re-rank (query_ivfpq_index(vec_filter=
    ANN_FILTER_PRED, rerank_corpus=…) — pure candidate exclusion),
    then reciprocal-rank fused. Each filtered leg is already
    hash-gated alone (pipeline_bm25_index_filtered /
    ann_index_filtered); this row gates their COMPOSITION — the
    predicates must narrow candidate sets, not leak through the
    fusion. Oracle: the hybrid SQL with the same two predicates
    injected into each leg's candidate CTE (shared verbatim from this
    module — the no-drift rule)."""
    from ccog_spark.operators.ann_index import (
        build_ivfpq_index,
        query_ivfpq_index,
    )
    from ccog_spark.operators.text_index import (
        build_bm25_index,
        query_bm25_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    q_text = docs.where(F.col("doc_id") % 97 == 11).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 3), " "
        ).alias("q_text"),
    )
    q_emb = emb.where(F.col("vec_id") % 97 == 11).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    # Independent builds overlapped from a 2-thread pool — see
    # pipeline_hybrid_index (guide §2.6).
    from concurrent.futures import ThreadPoolExecutor

    tidx = _tmp_index_dir("ccog_bm25_hybfil", sf_dir)
    vidx = _tmp_index_dir("ccog_ivfpq_hybfil", sf_dir)
    with ThreadPoolExecutor(max_workers=2) as pool:
        tb = submit_inheriting(
            pool, spark, build_bm25_index, docs, tidx,
            meta_cols=("lang", "source"),
        )
        vb = submit_inheriting(
            pool, spark, build_ivfpq_index, emb, EMB_DIM, vidx,
            meta_cols=("label",),
        )
        _await_index_builds((tb, vb), (tidx, vidx))
    lex = query_bm25_index(
        spark, tidx, q_text, k=20, doc_filter=BM25_FILTER_PRED
    )
    vec = query_ivfpq_index(
        spark, vidx, q_emb, k=20, rerank_corpus=emb, m=30,
        vec_filter=ANN_FILTER_PRED,
    ).withColumnRenamed("vec_id", "doc_id")
    return text.rrf_fuse(lex, vec, "doc_id", k=5).orderBy("q_id", "rn")


def pipeline_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram LM quality scoring (operators.lm — the CCNet-style
    "train a small LM, rank documents by fluency" stage): one
    distributed counting pass builds an alphabet-bounded model, a
    second map-side pass scores every document against it via two
    broadcast joins + one aggregate. The oracle replays gram/context
    extraction, add-one smoothing, and the exact-rational quantized
    mean (no ln in the hashed path — repo float rule)."""
    from ccog_spark.operators.lm import lm_quality

    docs = load_table(spark, sf_dir, "documents")
    return lm_quality(docs, n=3).orderBy("doc_id")


def pipeline_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (round 16,
    sharding.exact_quantile_split over operators.lm scores): score
    every document with the char-trigram LM, then split the corpus
    into EXACT score tertiles — boundaries found by distributed
    selection (histogram + confined TakeOrdered, two capped driver
    actions), never a global NTILE window (the one-partition scale
    killer). The integer-exact quantized score (qmean BIGINT) is the
    bucketing value, so the oracle's ROW_NUMBER/NTILE-identity replay
    is hash-exact: bucket = 1 + floor(rank·3/n) under
    ORDER BY qscore, doc_id."""
    from ccog_spark.operators.lm import lm_quality

    docs = load_table(spark, sf_dir, "documents")
    scored = lm_quality(docs, n=3).select(
        "doc_id",
        F.round(F.col("score") * 1000000.0).cast("bigint").alias("qscore"),
    )
    return (
        sharding.exact_quantile_split(scored, "qscore", 3)
        .select("doc_id", "qscore", "bucket")
        .orderBy("doc_id")
    )


def pipeline_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line dedup with document REBUILD (CCNet stage 1,
    operators.dedup.remove_duplicate_lines): synthesize deterministic
    multi-line text (newline every 8 tokens — the fixture corpus is
    single-line; same synthesize-then-check pattern as pipeline_urls),
    drop every later occurrence of a repeated line, reassemble cleaned
    documents in order. The small fixture vocabulary makes 8-token
    lines collide across documents, so the drop path is exercised
    heavily; the oracle replays synthesis, keep-first ranking, and the
    ordered rebuild."""
    from ccog_spark.operators.dedup import remove_duplicate_lines

    docs = load_table(spark, sf_dir, "documents")
    tk = F.split("text", " ")
    n = F.size(tk)
    lines = F.transform(
        F.sequence(F.lit(0), F.floor((n - 1) / 8).cast("int")),
        lambda i: F.array_join(F.slice(tk, i * 8 + 1, 8), " "),
    )
    synth = docs.select(
        "doc_id", F.array_join(lines, "\n").alias("text")
    )
    return remove_duplicate_lines(synth).orderBy("doc_id")


def pipeline_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level (paragraph-style) dedup — the Dolma/RefinedWeb
    sub-document pass: split documents into NON-overlapping 64-token
    chunks (stride = chunk), keep-first each distinct chunk content
    ACROSS the whole corpus, and report per-document kept/duplicate
    chunk counts. Composition of chunk_documents (map-side fan-out)
    with the keep-first as groupBy(hash).min(struct) — map-side
    combinable where a hash-partitioned window would serialize a hot
    duplicate chunk into one task (round-7 skew sweep) — and the
    per-doc arithmetic done on AGGREGATES only: n_dup = n_chunks −
    n_first_occurrences, so the full chunk stream is never joined
    against anything (two combinable shuffles, one doc-sized join).
    The oracle replays the slice arithmetic and the same deterministic
    first-occurrence rule."""
    docs = load_table(spark, sf_dir, "documents")
    ch = text.chunk_documents(docs, chunk=64, stride=64)
    per_doc = ch.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    kept_per_doc = (
        ch.groupBy("h")
        .agg(F.min(F.struct("doc_id", "chunk_idx")).alias("_first"))
        .groupBy(F.col("_first.doc_id").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("_n_kept"))
    )
    return (
        per_doc.join(kept_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            (
                F.col("n_chunks") - F.coalesce(F.col("_n_kept"), F.lit(0))
            ).cast("bigint").alias("n_dup_chunks"),
        )
        .orderBy("doc_id")
    )
