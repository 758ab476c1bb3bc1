"""Round-15 scale probe: persisted SQ8 vs PQ index at fa-sf10
(200k vectors, dim 64) — the storage/recall/latency triangle the SQ8
layout exists for. Frozen 33-query batch; recall@10 judged against
the exact brute-force cosine truth; index payload bytes measured on
the written codes tables; queries min-of-2 after a warm-up,
clearCache per pass (scaling_smoke protocol)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

FA10 = os.environ.get("SF_FA_DIR", "/tmp/ccog_sf_fa10")
DIM = 64
K = 10


def dir_mb(root):
    tot = 0
    for dp, _, fns in os.walk(root):
        tot += sum(os.path.getsize(os.path.join(dp, f)) for f in fns)
    return round(tot / 1e6, 1)


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from ccog_spark.operators.ann_index import (
        build_ivfpq_index,
        build_ivfsq_index,
        query_ivfpq_index,
        query_ivfsq_index,
    )
    from ccog_spark.operators.similarity import brute_force_topk

    out = {}
    emb = spark.read.parquet(os.path.join(FA10, "embeddings.parquet"))
    q = emb.where(F.col("vec_id") % 6301 == 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    qrows = q.collect()
    q = spark.createDataFrame(
        [(int(r.q_id), [float(x) for x in r.q_emb]) for r in qrows],
        "q_id long, q_emb array<float>",
    )
    out["n_queries"] = len(qrows)

    truth = {
        (r.q_id, r.vec_id)
        for r in brute_force_topk(emb, q, k=K).collect()
    }

    def timed(name, thunk, reps=2):
        thunk().collect()
        best, rows = 1e9, None
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            rows = thunk().collect()
            best = min(best, time.time() - t0)
        out[name] = round(best, 2)
        got = {(r.q_id, r.vec_id) for r in rows}
        out[name.replace("_sec", "_recall")] = round(
            len(truth & got) / len(truth), 3
        )
        print(json.dumps({name: out[name]}), flush=True)
        return rows

    pq_idx = "/tmp/ccog_r15_probe_pq"
    t0 = time.time()
    build_ivfpq_index(emb, DIM, pq_idx)
    out["pq_build_sec"] = round(time.time() - t0, 2)
    out["pq_codes_mb"] = dir_mb(os.path.join(pq_idx, "codes"))

    sq_idx = "/tmp/ccog_r15_probe_sq8"
    t0 = time.time()
    build_ivfsq_index(emb, DIM, sq_idx)
    out["sq8_build_sec"] = round(time.time() - t0, 2)
    out["sq8_codes_mb"] = dir_mb(os.path.join(sq_idx, "codes"))

    # round 16: residual encoding (quant='sq8r') — same code bytes,
    # residual spans vs raw spans decide the recall delta
    sqr_idx = "/tmp/ccog_r16_probe_sq8r"
    t0 = time.time()
    build_ivfsq_index(emb, DIM, sqr_idx, residual=True)
    out["sq8r_build_sec"] = round(time.time() - t0, 2)
    out["sq8r_codes_mb"] = dir_mb(os.path.join(sqr_idx, "codes"))
    print(json.dumps({k: out[k] for k in
                      ("pq_build_sec", "pq_codes_mb",
                       "sq8_build_sec", "sq8_codes_mb",
                       "sq8r_build_sec", "sq8r_codes_mb")}), flush=True)

    # cent_stride=25 → 8000 cells at 200k vectors; nprobe must cover a
    # realistic fraction for recall to mean anything (the registry
    # rows' nprobe=2 is a 2000-vector-fixture setting). 64/8000 = 0.8%
    # of cells — the production ballpark.
    for npb in (8, 64):
        timed(
            f"pq_query_np{npb}_sec",
            lambda: query_ivfpq_index(spark, pq_idx, q, k=K, nprobe=npb),
        )
        timed(
            f"sq8_query_np{npb}_sec",
            lambda: query_ivfsq_index(spark, sq_idx, q, k=K, nprobe=npb),
        )
        timed(
            f"sq8r_query_np{npb}_sec",
            lambda: query_ivfsq_index(spark, sqr_idx, q, k=K, nprobe=npb),
        )
    # the production two-stage recipe on both layouts
    timed(
        "pq_rerank_sec",
        lambda: query_ivfpq_index(
            spark, pq_idx, q, k=K, nprobe=64, rerank_corpus=emb, m=50
        ),
    )
    timed(
        "sq8_rerank_sec",
        lambda: query_ivfsq_index(
            spark, sq_idx, q, k=K, nprobe=64, rerank_corpus=emb, m=50
        ),
    )

    # ---- round 16: residual vs plain on a CLUSTERED corpus ----
    # The fa fixture is isometric replicas of random vectors — NO
    # cell-local clustering, so residual spans are no tighter there
    # (recorded above: sq8r == sq8). This section synthesizes the
    # shape by_residual exists for (the blockmax-probe precedent):
    # 8000 tight clusters of 25, the % 25 == 1 member of each IS the
    # stride-selected IVF centroid, noise 0.01 vs unit-scale centers.
    cl = spark.range(200_000).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), d -> "
            "sin((CAST(id DIV 25 AS DOUBLE) * 613.0 + d) * 1.061) "
            "+ 0.01 * sin((id * 997.0 + d) * 0.618033988749895))"
        ).alias("embedding"),
    ).persist()
    cl.collect()
    qc_rows = cl.where(F.col("vec_id") % 6301 == 3).collect()
    qc = spark.createDataFrame(
        [(int(r.vec_id), [float(x) for x in r.embedding]) for r in qc_rows],
        "q_id long, q_emb array<double>",
    )
    cl_truth = {
        (r.q_id, r.vec_id)
        for r in brute_force_topk(cl, qc, k=K).collect()
    }
    cl_p = "/tmp/ccog_r16_probe_cl_sq8"
    cl_r = "/tmp/ccog_r16_probe_cl_sq8r"
    build_ivfsq_index(cl, DIM, cl_p)
    build_ivfsq_index(cl, DIM, cl_r, residual=True)
    # PQ family twin (round 16, quant='pqr'): same clustered corpus,
    # 1 byte/block instead of 1 byte/dim
    cl_pq = "/tmp/ccog_r16_probe_cl_pq"
    cl_pqr = "/tmp/ccog_r16_probe_cl_pqr"
    build_ivfpq_index(cl, DIM, cl_pq)
    build_ivfpq_index(cl, DIM, cl_pqr, residual=True)

    def cl_recall(name, idx_dir, npb, fn):
        rows = fn(spark, idx_dir, qc, k=K, nprobe=npb).collect()
        got = {(r.q_id, r.vec_id) for r in rows}
        out[name] = round(len(cl_truth & got) / len(cl_truth), 3)
        print(json.dumps({name: out[name]}), flush=True)

    for npb in (8, 64):
        cl_recall(f"clustered_sq8_np{npb}_recall", cl_p, npb,
                  query_ivfsq_index)
        cl_recall(f"clustered_sq8r_np{npb}_recall", cl_r, npb,
                  query_ivfsq_index)
        cl_recall(f"clustered_pq_np{npb}_recall", cl_pq, npb,
                  query_ivfpq_index)
        cl_recall(f"clustered_pqr_np{npb}_recall", cl_pqr, npb,
                  query_ivfpq_index)
    cl.unpersist()

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
