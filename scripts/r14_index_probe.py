"""Round-14 probe (VERDICT r13 #4): the pruned query path measured
FROM the persisted index at scale, plus the index-resident hybrid's
per-batch point.

r13 measured bucket pruning (text_index_probe, unpruned queries) and
max-score pruning (retrieval_scale_probe, inline operator) SEPARATELY;
`query_bm25_index(prune=True)` composes them — the bucket/In(t)
filters cut what the scan READS, the max-score planner cuts what the
scoring aggregate SHUFFLES. This probe runs the r13 high-df 64-query
batch (one rare term 'dup' + two corpus-scale terms per query; Σ
matching postings ≈ 51M at fa-sf10) through the INDEX path with
prune=False vs prune=True, clearCache before every timed pass,
bit-identity asserted.

Second half: pipeline_hybrid_index's per-batch cost at fa-sf10 —
index-resident hybrid (query_bm25_index k=20 + query_ivfpq_index
rerank_corpus k=20 + rrf_fuse) vs the inline hybrid (bm25_topk +
ivfpq_rerank_topk + rrf_fuse) on the retrieval_scale_probe's fixed
query batch (doc_id < 800 AND doc_id % 97 == 11 — same ids at every
scale). Bit-identity asserted on the bm25 side; the fused output is
asserted equal between the two stacks (both sides are pinned
bit-identical to their inline twins by pytest, so equality here is a
consistency re-check, not the primary gate).

Run ALONE (SCALING.md collect protocol). Fixtures:
scripts/make_sf_fixed_alphabet.py with SF_REPLICAS=100 →
/tmp/ccog_sf_fa10 (documents + embeddings since r14).
"""

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

FA = os.environ.get("SF_FA_DIR", "/tmp/ccog_sf_fa10")
TIDX = "/tmp/ccog_r14_bm25_idx"
VIDX = "/tmp/ccog_r14_ivfpq_idx"
EMB_DIM = 64


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from ccog_spark.operators import similarity, text
    from ccog_spark.operators.ann_index import (
        build_ivfpq_index,
        query_ivfpq_index,
    )
    from ccog_spark.operators.text_index import (
        build_bm25_index,
        query_bm25_index,
    )

    docs = spark.read.parquet(os.path.join(FA, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(FA, "embeddings.parquet"))
    out = {"sf": FA}

    # ---- part 1: pruned path FROM the index, high-df batch ----
    others = [
        "the", "a", "of", "stream", "value", "spark", "data", "big",
        "small", "filter", "line", "part", "sort", "query", "batch",
        "agg",
    ]
    pairs = list(itertools.combinations(others, 2))[:64]
    highdf = spark.createDataFrame(
        [(i + 1, f"dup {w1} {w2}") for i, (w1, w2) in enumerate(pairs)],
        "q_id long, q_text string",
    )

    t0 = time.time()
    meta = build_bm25_index(docs, TIDX)
    out["index_build_sec"] = round(time.time() - t0, 2)
    print(json.dumps({"build_sec": out["index_build_sec"], **meta}), flush=True)

    def timed(name, thunk, reps=2):
        thunk().collect()  # warm-up (codegen, OS cache)
        best = 1e9
        rows = None
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            rows = thunk().collect()
            best = min(best, time.time() - t0)
        out[name] = round(best, 2)
        print(json.dumps({name: out[name], "rows": len(rows)}), flush=True)
        return sorted(map(tuple, rows))

    a = timed(
        "idx_highdf_unpruned_sec",
        lambda: query_bm25_index(spark, TIDX, highdf, k=5, prune=False),
    )
    b = timed(
        "idx_highdf_pruned_sec",
        lambda: query_bm25_index(spark, TIDX, highdf, k=5, prune=True),
    )
    assert a == b, "index-path pruning changed results — must be lossless"
    # reference point: the inline operator on the same batch (pays the
    # full TF build every call — the r13 SHIPPING-code row's twin)
    c = timed(
        "inline_highdf_pruned_sec",
        lambda: text.bm25_topk(docs, highdf, k=5, prune=True),
    )
    assert a == c, "index path diverged from inline"

    # ---- part 2: hybrid per-batch, index stack vs inline stack ----
    q_text = docs.where(
        (F.col("doc_id") < 800) & (F.col("doc_id") % 97 == 11)
    ).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 3), " ").alias(
            "q_text"
        ),
    )
    q_emb = emb.where(
        (F.col("vec_id") < 800) & (F.col("vec_id") % 97 == 11)
    ).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )

    t0 = time.time()
    build_ivfpq_index(emb, EMB_DIM, VIDX)
    out["ann_build_sec"] = round(time.time() - t0, 2)
    print(json.dumps({"ann_build_sec": out["ann_build_sec"]}), flush=True)

    def hybrid_index():
        lex = query_bm25_index(spark, TIDX, q_text, k=20)
        vec = query_ivfpq_index(
            spark, VIDX, q_emb, k=20, rerank_corpus=emb, m=30
        ).withColumnRenamed("vec_id", "doc_id")
        return text.rrf_fuse(lex, vec, "doc_id", k=5)

    def hybrid_inline():
        lex = text.bm25_topk(docs, q_text, k=20)
        vec = similarity.ivfpq_rerank_topk(
            emb, q_emb, dim=EMB_DIM, k=20, m=30
        ).withColumnRenamed("vec_id", "doc_id")
        return text.rrf_fuse(lex, vec, "doc_id", k=5)

    h_inline = timed("hybrid_inline_sec", hybrid_inline)
    h_index = timed("hybrid_index_sec", hybrid_index)
    # both stacks' components are pytest-pinned bit-identical to each
    # other; the fused lists can still differ if ANN stage-1 candidate
    # sets differ (inline trains its own KMeans vs the saved model) —
    # report agreement instead of asserting it.
    out["hybrid_lists_equal"] = h_inline == h_index
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
