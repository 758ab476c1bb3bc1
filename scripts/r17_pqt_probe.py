"""Round-17 probe: Lloyd-TRAINED residual PQ codebooks (quant='pqt')
vs sample-assigned 'pqr' at IDENTICAL bytes/vector (VERDICT r16 #4) —
recall@10 against exact brute-force cosine truth on two 200k-vector
clustered corpora:

  tight  — the r16 probe's corpus (8000 clusters, noise 0.01): the
           sample rows already sit on the residual manifold, so
           training has little room;
  spread — same cluster layout with noise 0.25: residuals span a
           shape 16 raw sample rows cannot tile, the regime k-means
           training exists for (FAISS IndexIVFPQ's default).

Build cost is reported too (training is a driver-side numpy Lloyd on
PQ_TRAIN_N sample rows — the delta vs 'pqr' is the training collect,
not a corpus pass)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DIM = 64
K = 10


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
        query_ivfpq_index,
    )
    from ccog_spark.operators.similarity import brute_force_topk

    out = {}

    def corpus(noise: float):
        return spark.range(200_000).select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(0, {DIM - 1}), d -> "
                "sin((CAST(id DIV 25 AS DOUBLE) * 613.0 + d) * 1.061) "
                f"+ {noise} * sin((id * 997.0 + d) * 0.618033988749895))"
            ).alias("embedding"),
        ).persist()

    for tag, noise in (("tight", 0.01), ("spread", 0.25)):
        cl = corpus(noise)
        cl.collect()
        qc_rows = cl.where(F.col("vec_id") % 6301 == 3).collect()
        qc = spark.createDataFrame(
            [(int(r.vec_id), [float(x) for x in r.embedding])
             for r in qc_rows],
            "q_id long, q_emb array<double>",
        )
        truth = {
            (r.q_id, r.vec_id)
            for r in brute_force_topk(cl, qc, k=K).collect()
        }
        for quant, kw in (
            ("pqr", {"residual": True}),
            ("pqt", {"residual": True, "trained": True}),
        ):
            idx = f"/tmp/ccog_r17_probe_{tag}_{quant}"
            t0 = time.time()
            build_ivfpq_index(cl, DIM, idx, **kw)
            out[f"{tag}_{quant}_build_sec"] = round(time.time() - t0, 2)
            for npb in (8, 64):
                rows = query_ivfpq_index(
                    spark, idx, qc, k=K, nprobe=npb
                ).collect()
                got = {(r.q_id, r.vec_id) for r in rows}
                key = f"{tag}_{quant}_np{npb}_recall"
                out[key] = round(len(truth & got) / len(truth), 3)
                print(json.dumps({key: out[key]}), flush=True)
        cl.unpersist()

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
