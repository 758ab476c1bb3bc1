"""Round-12 retrieval-trio scale probe: bm25_topk / ivfpq_rerank_topk /
rrf_fuse composition at sf0.1 and sf10 with a FIXED query batch
(vec_id < 800 AND vec_id % 97 == 11 — the same ids at every scale), so
the curve isolates corpus growth from query-batch growth. collect()
protocol, run alone.

Note the deliberate query bound: the fixture vocabulary is only 31
distinct words, so corpus-derived query SETS (one per ~97 docs) make
every query term match ~90% of a 500k-doc corpus — Σ df(t) postings
explode quadratically with replicas. Real corpora are Zipf-distributed
(rare terms carry queries); the operator's cost is linear in postings
TOUCHED, which this probe measures directly.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SCALES = [("/root/testdata/sf0.1", "sf0.1"), ("/tmp/ccog_sf10", "sf10")]
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

    out = {}
    for sf_dir, tag in SCALES:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        qpred = (F.col("doc_id") < 800) & (F.col("doc_id") % 97 == 11)
        q_text = docs.where(qpred).select(
            F.col("doc_id").alias("q_id"),
            F.array_join(
                F.slice(F.split(F.col("text"), " "), 1, 3), " "
            ).alias("q_text"),
        )
        q_emb = emb.where(
            (F.col("vec_id") < 800) & (F.col("vec_id") % 97 == 11)
        ).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )

        def run(name, thunk):
            thunk().collect()  # warm-up
            t0 = time.time()
            n = len(thunk().collect())
            dt = round(time.time() - t0, 2)
            out.setdefault(name, {})[tag] = {"sec": dt, "rows": n}
            print(json.dumps({"q": name, "sf": tag, "sec": dt, "rows": n}),
                  flush=True)

        run("bm25", lambda: text.bm25_topk(docs, q_text, k=5))
        run(
            "ann_rerank",
            lambda: similarity.ivfpq_rerank_topk(
                emb, q_emb, dim=EMB_DIM, k=3, m=10
            ),
        )
        run(
            "hybrid",
            lambda: text.rrf_fuse(
                text.bm25_topk(docs, q_text, k=20),
                similarity.ivfpq_rerank_topk(
                    emb, q_emb, dim=EMB_DIM, k=20, m=30
                ).withColumnRenamed("vec_id", "doc_id"),
                "doc_id",
                k=5,
            ),
        )

    # Round 13 (VERDICT r12 #2): max-score pruning on a HIGH-DF query
    # batch. The replica-TAGGED sf10 fixture prefixes every token, so
    # per-term df is scale-CONSTANT there — the FIXED-ALPHABET fixtures
    # (make_sf_fixed_alphabet.py) preserve the token multiset, so df
    # grows ∝ corpus: the honest high-df regime. The fixture vocabulary
    # has exactly one rare term ('dup', df ≈ n_docs/20) amid ~uniform
    # corpus-scale terms; a 64-query batch of "dup + two stopword-scale
    # terms" makes the scoring shuffle (Σ df ≈ 100·N_docs rows)
    # dominate the TF build (~40·N_docs token rows) — exactly the case
    # the planner must cut. prune=True keeps only 'dup' essential
    # (postings ≈ 3·N_docs), so its growth must be SUBLINEAR vs the
    # unpruned plan's from fa-sf1 → fa-sf10. Results are asserted
    # bit-identical. Caches cleared before every timed pass so both
    # variants pay the full TF build.
    import itertools

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
    for sf_dir, tag in [
        ("/root/testdata/sf0.1", "sf0.1"),
        ("/tmp/ccog_sf_fa1", "fa-sf1"),
        ("/tmp/ccog_sf_fa10", "fa-sf10"),
    ]:
        if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
            print(json.dumps({"skip": tag, "reason": "fixture missing"}))
            continue
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

        def run_bm25_highdf(name, prune):
            def thunk():
                spark.catalog.clearCache()
                return text.bm25_topk(docs, highdf, k=5, prune=prune)

            thunk().collect()  # warm-up (OS cache, codegen)
            t0 = time.time()
            rows = thunk().collect()
            dt = round(time.time() - t0, 2)
            out.setdefault(name, {})[tag] = {"sec": dt, "rows": len(rows)}
            print(
                json.dumps({"q": name, "sf": tag, "sec": dt, "rows": len(rows)}),
                flush=True,
            )
            return sorted(map(tuple, rows))

        a = run_bm25_highdf("bm25_highdf_unpruned", prune=False)
        b = run_bm25_highdf("bm25_highdf_pruned", prune=True)
        assert a == b, f"pruning changed results at {tag} — must be lossless"
        spark.catalog.clearCache()
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
