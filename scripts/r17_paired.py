#!/usr/bin/env python
"""Paired cold-cache measurement for one code tree (pointed at by
PYTHONPATH / cwd). Protocol per JVM: calibration probe, warm pass over
the target queries (JIT + codegen + footers), then ROUNDS rounds of:
for each query, release every persist + clearCache, run once, record.
Prints one JSON line: {"cal": .., "queries": {qid: [cold times...]}}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.environ.get("R17_TREE", os.getcwd()))


def main() -> None:
    qids = sys.argv[1:]
    rounds = int(os.environ.get("R17_ROUNDS", "3"))
    sf = os.environ.get("R17_SF", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from ccog_spark.queries.registry import REGISTRY, release_persists
    from ccog_spark.session import get_spark

    spark = get_spark(app_name="r17_paired")

    def cal() -> float:
        df = (
            spark.range(200_000_000)
            .withColumn("g", F.col("id") % 1024)
            .groupBy("g")
            .agg(F.sum("id").alias("s"))
            .agg(F.sum("s").alias("t"))
        )
        df.collect()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    c0 = cal()
    for q in qids:  # warm: JIT/codegen/footers
        REGISTRY[q](spark, sf).toPandas()

    out: dict[str, list[float]] = {q: [] for q in qids}
    for _ in range(rounds):
        for q in qids:
            release_persists(spark)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            REGISTRY[q](spark, sf).toPandas()
            out[q].append(round(time.perf_counter() - t0, 3))
    c1 = cal()
    print("PAIRED:" + json.dumps({"cal": [c0, c1], "queries": out}))


if __name__ == "__main__":
    main()
