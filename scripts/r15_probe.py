"""Round-15 scale probe: linearized proximity + index-resident
BM25F / PRF at fa-sf10 (VERDICT r14 #2/#4/#5 done-bars).

Measures, on the fixed-alphabet corpora (50k docs fa-sf1 / 500k docs
fa-sf10, 31-word vocabulary — every document matches every phrase's
term set, i.e. the STOPWORD-query worst case for positional
operators):

- per-batch proximity (span 5), inline AND index-resident, at BOTH
  scales — the r14 core was quadratic in per-doc matching tokens and
  could only be probed at fa-sf1 (the fa-sf10 batch was ≈2×10⁹
  pre-filter window pairs); the r15 span-bucketed equi-join is
  O(m_d · max_span) per doc, so the same pathological batch must now
  complete at fa-sf10 — this probe row is what retires the r14
  SCALING.md caveat;
- BM25F: per-field index build cost + per-batch query from the index
  vs the inline two-pass operator (the r14 inline point was 19.3 s at
  fa-sf10 — the index point is the amortization argument);
- PRF: per-batch query from the index (zero corpus passes) vs the
  inline three-pass operator (16.0 s at fa-sf10 in r14).

Protocol: run ALONE, min-of-2 after an untimed warm-up, clearCache
before every timed pass, bit-identity asserted between each
operator's two execution paths. Query batches are frozen driver-side
(no corpus re-derivation inside timed plans). Fixtures from
scripts/make_sf_fixed_alphabet.py (SF_REPLICAS=10 → fa-sf1,
100 → fa-sf10).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

FA10 = os.environ.get("SF_FA_DIR", "/tmp/ccog_sf_fa10")
FA1 = os.environ.get("SF_FA1_DIR", "/tmp/ccog_sf_fa1")


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from ccog_spark.operators import text
    from ccog_spark.operators.text_index import (
        build_bm25_index,
        build_bm25f_index,
        proximity_match_index,
        query_bm25_prf_index,
        query_bm25f_index,
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

    def dir_mb(root):
        tot = 0
        for dp, _, fns in os.walk(root):
            tot += sum(os.path.getsize(os.path.join(dp, f)) for f in fns)
        return round(tot / 1e6, 1)

    # ---- proximity, both scales (the r14 caveat retirement) ----
    for tag, fa in (("fa1", FA1), ("fa10", FA10)):
        docs = spark.read.parquet(os.path.join(fa, "documents.parquet"))
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
        pidx = f"/tmp/ccog_r15_pos_idx_{tag}"
        t0 = time.time()
        build_bm25_index(docs, pidx, positions=True)
        out[f"prox_{tag}_build_sec"] = round(time.time() - t0, 2)
        a = timed(
            f"prox_{tag}_inline_sec",
            lambda: text.proximity_match(docs, phrases, max_span=5),
        )
        b = timed(
            f"prox_{tag}_index_sec",
            lambda: proximity_match_index(spark, pidx, phrases, max_span=5),
        )
        assert a == b, "index proximity answers must equal inline"

    # ---- BM25F / PRF amortization at fa-sf10 ----
    docs = spark.read.parquet(os.path.join(FA10, "documents.parquet"))
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
    qs = docs.where(
        (F.col("doc_id") < 800) & (F.col("doc_id") % 97 == 11)
    ).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(F.slice(tk, 1, 3), " ").alias("q_text"),
    )
    qs = spark.createDataFrame(qs.collect(), "q_id long, q_text string")

    fidx = "/tmp/ccog_r15_bm25f_idx"
    t0 = time.time()
    build_bm25f_index(fielded, fidx, ("title", "body"))
    out["bm25f_build_sec"] = round(time.time() - t0, 2)
    out["bm25f_postings_mb"] = dir_mb(os.path.join(fidx, "postings"))
    print(json.dumps({k: out[k] for k in
                      ("bm25f_build_sec", "bm25f_postings_mb")}), flush=True)
    a = timed(
        "bm25f_inline_sec",
        lambda: text.bm25f_topk(
            fielded, qs, ("title", "body"), (2.0, 1.0), k=5
        ),
    )
    b = timed(
        "bm25f_index_sec",
        lambda: query_bm25f_index(spark, fidx, qs, (2.0, 1.0), k=5),
    )
    assert a == b, "index BM25F answers must equal inline"

    sidx = "/tmp/ccog_r15_score_idx"
    t0 = time.time()
    build_bm25_index(docs, sidx)
    out["scoring_build_sec"] = round(time.time() - t0, 2)
    a = timed(
        "prf_inline_sec",
        lambda: text.bm25_prf_topk(docs, qs, k=5, k_fb=10, e_terms=3),
    )
    b = timed(
        "prf_index_sec",
        lambda: query_bm25_prf_index(
            spark, sidx, qs, k=5, k_fb=10, e_terms=3
        ),
    )
    assert a == b, "index PRF answers must equal inline"

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
