#!/usr/bin/env python
"""Round-18 sf1 mini-bench (VERDICT r17 #8): at sf0.1 the bench is
fixture-overhead-bound (8-core often beats 32-core), so per-query
seconds cannot show parallelism. This probe times the top-10 heavy
documents/embeddings rows against the 10x sf1 fixture
(/tmp/ccog_sf1, scripts/make_sf1.py) at the CURRENT core count —
run it twice (SPARK_GRAFT_CPUS=32, then 8) and compare:

  SPARK_GRAFT_CPUS=32 python scripts/r18_sf1_scaling.py
  SPARK_GRAFT_CPUS=8  python scripts/r18_sf1_scaling.py

A row whose 8/32 ratio stays ~1 at this data-bound scale has a
parallelism defect worth diagnosing."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "pipeline_e2e",
    "pipeline_proximity",
    "pipeline_hybrid",
    "pipeline_bm25_pruned",
    "pipeline_prf",
    "pipeline_diversified",
    "pipeline_bm25f",
    "ann_ivfpq",
    "ann_rerank",
    "dedup_cc",
]


def main() -> None:
    sf = os.environ.get("SF1_DIR", "/tmp/ccog_sf1")
    from ccog_spark.queries.registry import REGISTRY
    from ccog_spark.session import get_spark

    spark = get_spark(app_name="r18_sf1_scaling")
    sc = spark.sparkContext
    out = {}
    for qid in HEAVY:
        fn = REGISTRY[qid]
        sc.setJobDescription(f"sf1:{qid}:warm")
        fn(spark, sf).toPandas()
        best = float("inf")
        for rep in range(2):
            sc.setJobDescription(f"sf1:{qid}:{rep}")
            t0 = time.perf_counter()
            fn(spark, sf).toPandas()
            best = min(best, time.perf_counter() - t0)
        out[qid] = round(best, 3)
        print(f"RESULT: {qid} sec={best:.3f}", flush=True)
    print(
        "JSON:"
        + json.dumps(
            {"cpus": os.environ.get("SPARK_GRAFT_CPUS"), "queries": out}
        )
    )


if __name__ == "__main__":
    main()
