"""sf0.1 → sf1 scaling smoke: run the heaviest documents/embeddings
queries at both scales and report wall-time ratios. See SCALING.md."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

QUERIES = [
    "dedup_ngram",
    "dedup_cc",
    "dedup_embed",
    "dedup_simhash",
    "dedup_minhash",
    "pipeline_decontam",
    # round 6 additions: PQ ANN (map-side encode + broadcast LUT scan)
    # and the heaviest multimodal kernels — all expected ~linear
    "ann_pq",
    "ann_ivfpq",
    "multimodal_features",
    "multimodal_audio",
    # round-6 session 2: URL dedup (pure JVM expressions — expect
    # scan-bound linear) and the composed 4-stage hygiene pipeline
    # (bounded by its minhash-CC stage)
    "pipeline_urls",
    "pipeline_e2e",
    "pipeline_tfidf",
    # round 7: LM scoring (one counting pass + broadcast scoring),
    # line dedup with rebuild (combinable min-agg + line join), and
    # the persisted IVF+PQ index (build + query timed as one row)
    "pipeline_lm",
    "pipeline_line_dedup",
    "ann_index",
]


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from ccog_spark.queries.registry import REGISTRY

    out = {}
    for sf_dir, tag in (("/root/testdata/sf0.1", "sf0.1"), ("/tmp/ccog_sf1", "sf1")):
        for q in QUERIES:
            # warm-up then timed, mirroring bench.py
            REGISTRY[q](spark, sf_dir).collect()
            t0 = time.time()
            n = len(REGISTRY[q](spark, sf_dir).collect())
            dt = round(time.time() - t0, 2)
            out.setdefault(q, {})[tag] = {"sec": dt, "rows": n}
            print(json.dumps({"q": q, "sf": tag, "sec": dt, "rows": n}), flush=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
