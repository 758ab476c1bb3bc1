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
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
