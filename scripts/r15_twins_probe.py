"""Round-15 scale probe: the last three index twins at fa-sf10 —
snippet, diversification-from-docmeta, filtered hybrid.

Measures, on the fixed-alphabet fa-sf10 corpus (500k docs / 200k
vectors, 31-word vocabulary — the honest worst case for posting-bucket
selectivity: every query term appears in ~every document, so the
index path's bucket pruning cannot skip anything and the comparison
isolates the EXECUTION-SHAPE difference, not scan savings; on a real
Heaps-law vocabulary the index path additionally prunes buckets):

- snippet: inline (corpus posexplode + anchors + text join) vs
  index-resident (anchors from positional postings + the SAME
  matching-docs-only text join) — per-batch, bit-identity asserted;
- diversified: inline (bm25_topk + diversify over the corpus
  projection) vs index (query_bm25_index + the index's docmeta as the
  groups table) — per-batch, bit-identity asserted;
- hybrid from indexes, UNFILTERED vs FILTERED (docmeta predicate on
  the BM25 leg, vecmeta predicate before ADC + re-rank on the vector
  leg) — the filter must not cost more than the candidates it removes.

Protocol (scaling_smoke.py rules): run ALONE, min-of-2 after an
untimed warm-up, clearCache before every timed pass, collect() (never
count()), query batches frozen driver-side via createDataFrame.
Fixtures from scripts/make_sf_fixed_alphabet.py (SF_REPLICAS=100).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

FA10 = os.environ.get("SF_FA_DIR", "/tmp/ccog_sf_fa10")
EMB_DIM = 64


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from ccog_spark.operators import text
    from ccog_spark.operators.ann_index import (
        build_ivfpq_index,
        query_ivfpq_index,
    )
    from ccog_spark.operators.text_index import (
        build_bm25_index,
        query_bm25_index,
        snippet_match_index,
    )

    out = {}

    def timed(name, thunk, reps=2):
        thunk().collect()  # warm-up
        best, rows = 1e9, None
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            rows = thunk().collect()
            best = min(best, time.time() - t0)
        out[name] = round(best, 2)
        print(json.dumps({name: out[name], "rows": len(rows)}), flush=True)
        return sorted(map(tuple, rows))

    docs = spark.read.parquet(os.path.join(FA10, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(FA10, "embeddings.parquet"))

    phrases = (
        docs.where(F.col("doc_id") % 3001 == 7)
        .select(
            F.col("doc_id").alias("q_id"),
            F.array_join(
                F.slice(F.split(F.col("text"), " "), 2, 3), " "
            ).alias("phrase"),
        )
        .limit(8)
    )
    phrases = spark.createDataFrame(
        phrases.collect(), "q_id long, phrase string"
    )
    qs = docs.where(
        (F.col("doc_id") < 800) & (F.col("doc_id") % 97 == 11)
    ).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(F.slice(F.split("text", " "), 1, 3), " ").alias(
            "q_text"
        ),
    )
    qs = spark.createDataFrame(qs.collect(), "q_id long, q_text string")
    q_emb_rows = (
        emb.where((F.col("vec_id") < 800) & (F.col("vec_id") % 97 == 11))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
        )
        .collect()
    )
    q_emb = spark.createDataFrame(
        [(int(r.q_id), [float(x) for x in r.q_emb]) for r in q_emb_rows],
        "q_id long, q_emb array<float>",
    )

    # ---- one positional+meta text index, one meta ANN index ----
    tidx = "/tmp/ccog_r15_twins_tidx"
    t0 = time.time()
    build_bm25_index(
        docs, tidx, positions=True, meta_cols=("lang", "source")
    )
    out["text_index_build_sec"] = round(time.time() - t0, 2)
    vidx = "/tmp/ccog_r15_twins_vidx"
    t0 = time.time()
    build_ivfpq_index(emb, EMB_DIM, vidx, meta_cols=("label",))
    out["ann_index_build_sec"] = round(time.time() - t0, 2)
    print(json.dumps({k: out[k] for k in
                      ("text_index_build_sec", "ann_index_build_sec")}),
          flush=True)

    # ---- snippet: inline vs index ----
    a = timed(
        "snippet_inline_sec",
        lambda: text.snippet_match(docs, phrases, window=3),
    )
    b = timed(
        "snippet_index_sec",
        lambda: snippet_match_index(spark, tidx, phrases, docs, window=3),
    )
    assert a == b, "index snippets must equal inline"

    # ---- diversified: corpus groups vs index docmeta groups ----
    a = timed(
        "diversified_inline_sec",
        lambda: text.diversify_topk(
            text.bm25_topk(docs, qs, k=20),
            docs.select("doc_id", "source"),
            "source",
            k=5,
            max_per_group=2,
        ),
    )
    docmeta = spark.read.parquet(os.path.join(tidx, "docmeta"))
    b = timed(
        "diversified_index_sec",
        lambda: text.diversify_topk(
            query_bm25_index(spark, tidx, qs, k=20),
            docmeta,
            "source",
            k=5,
            max_per_group=2,
        ),
    )
    assert a == b, "index diversification must equal inline"

    # ---- hybrid from indexes: unfiltered vs filtered ----
    def hybrid(doc_filter=None, vec_filter=None):
        lex = query_bm25_index(
            spark, tidx, qs, k=20, doc_filter=doc_filter
        )
        vec = query_ivfpq_index(
            spark, vidx, q_emb, k=20, rerank_corpus=emb, m=30,
            vec_filter=vec_filter,
        ).withColumnRenamed("vec_id", "doc_id")
        return text.rrf_fuse(lex, vec, "doc_id", k=5)

    timed("hybrid_index_sec", lambda: hybrid())
    timed(
        "hybrid_index_filtered_sec",
        lambda: hybrid(
            doc_filter=(
                "source IN ('src1','src3','src5','src7','src9',"
                "'src11','src13','src15','src17','src19')"
            ),
            vec_filter="label % 2 = 0",
        ),
    )

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
