"""Round-12 sf10 probe (VERDICT r11 #4): fresh 100× datapoints for the
full heavy set — dedup_cc, pipeline_span_dedup, pipeline_e2e,
dedup_semantic (whose last sf10 numbers predate the r11 kernel and
scheme changes) plus dedup_embed (the shipped r11 adaptive + Arrow
verify kernel). collect()-triggered (count() lets Catalyst prune the
expensive output columns), run ALONE on the box, and
calibration-normalizable: the same fixed-work JVM probe bench.py
carries is measured first so cross-round comparisons can divide out
host drift.

Usage: python scripts/sf10_heavy_probe.py [sf0.1 only: --small-only]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

QUERIES = [
    "dedup_cc",
    "pipeline_span_dedup",
    "pipeline_e2e",
    "dedup_semantic",
    "dedup_embed",
]

SCALES = [("/root/testdata/sf0.1", "sf0.1"), ("/tmp/ccog_sf10", "sf10")]


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
        df.collect()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            df.collect()
            best = min(best, time.time() - t0)
        return round(best, 3)

    cal = calibration()
    print(json.dumps({"calibration_sec": cal}), flush=True)

    out = {"calibration_sec": cal}
    scales = SCALES[:1] if "--small-only" in sys.argv else SCALES
    for sf_dir, tag in scales:
        for q in QUERIES:
            # warm-up pass (plan/JIT/Arrow worker spin-up), then timed
            REGISTRY[q](spark, sf_dir).collect()
            t0 = time.time()
            n = len(REGISTRY[q](spark, sf_dir).collect())
            dt = round(time.time() - t0, 2)
            out.setdefault(q, {})[tag] = {"sec": dt, "rows": n}
            print(json.dumps({"q": q, "sf": tag, "sec": dt, "rows": n}), flush=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
