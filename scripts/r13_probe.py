"""Round-13 probe (VERDICT r12 #4 + #6), run ALONE on the box.

1. pipeline_tokenize at sf0.1 and sf10 — the one r12-new row with no
   100× point. BPE training collects only the word-frequency table
   (Heaps-law-sized: 31 words at sf0.1, 3100 at the replica-tagged
   sf10 — the MAX_VOCAB_WORDS guard's regime), so the 100× growth
   should track the token-count aggregate, not the merge loop.

2. The span-dedup cache-band check: pipeline_span_dedup at sf10 FRESH
   (right after calibration) vs BACK-TO-BACK after the four heavy
   predecessors (dedup_cc, pipeline_e2e, dedup_semantic, dedup_embed).
   Round 12 measured 15.3 s fresh vs 33.8 s back-to-back — the
   registry persist ledger (round 13) releases each query's persists
   when the next query enters, so the band must close to ~1.3×.

collect()-triggered, calibration-normalizable (same probe as bench).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

HEAVY_PREDECESSORS = ["dedup_cc", "pipeline_e2e", "dedup_semantic", "dedup_embed"]


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from pyspark.sql import functions as F

    from ccog_spark.queries.registry import REGISTRY

    def calibration() -> float:
        df = (
            spark.range(500_000_000)
            .groupBy((F.col("id") % 1024).alias("k"))
            .agg(F.sum("id").alias("s"), F.count("*").alias("c"))
            .agg(F.sum("s"), F.sum("c"))
        )
        df.collect()
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            df.collect()
            best = min(best, time.time() - t0)
        return round(best, 3)

    def timed(q, sf_dir, warm=True):
        if warm:
            REGISTRY[q](spark, sf_dir).collect()
        t0 = time.time()
        n = len(REGISTRY[q](spark, sf_dir).collect())
        return round(time.time() - t0, 2), n

    out = {"calibration_sec": calibration()}
    print(json.dumps({"calibration_sec": out["calibration_sec"]}), flush=True)

    # 1. pipeline_tokenize 100x point
    for sf_dir, tag in [("/root/testdata/sf0.1", "sf0.1"), ("/tmp/ccog_sf10", "sf10")]:
        dt, n = timed("pipeline_tokenize", sf_dir)
        out.setdefault("pipeline_tokenize", {})[tag] = {"sec": dt, "rows": n}
        print(json.dumps({"q": "pipeline_tokenize", "sf": tag, "sec": dt, "rows": n}), flush=True)

    # 2. span-dedup band: fresh, then after the heavy set (no warm-up
    # on the back-to-back pass — the band IS the cross-query state)
    sf10 = "/tmp/ccog_sf10"
    dt, n = timed("pipeline_span_dedup", sf10)
    out["span_fresh"] = {"sec": dt, "rows": n}
    print(json.dumps({"q": "span_fresh", "sec": dt, "rows": n}), flush=True)
    for q in HEAVY_PREDECESSORS:
        t0 = time.time()
        REGISTRY[q](spark, sf10).collect()
        print(json.dumps({"pred": q, "sec": round(time.time() - t0, 2)}), flush=True)
    t0 = time.time()
    n = len(REGISTRY["pipeline_span_dedup"](spark, sf10).collect())
    dt = round(time.time() - t0, 2)
    out["span_back_to_back"] = {"sec": dt, "rows": n}
    out["span_band_ratio"] = round(dt / out["span_fresh"]["sec"], 2)
    print(json.dumps({"q": "span_back_to_back", "sec": dt, "rows": n}), flush=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
