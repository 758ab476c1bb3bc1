#!/usr/bin/env python
"""Benchmark: run the declared corpus at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {qid: sec}, "sf": ...}.

Protocol (BASELINE.md): warm JVM — one untimed warm-up pass, then the
timed pass; each query timed end-to-end (plan + execute + fetch).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def run() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from ccog_spark.queries.registry import NON_BENCH, REGISTRY
    from ccog_spark.session import get_spark

    spark = get_spark(app_name="ccog_spark_bench")

    qids = sorted(q for q in REGISTRY if q not in NON_BENCH)
    # Warm-up: JVM JIT, parquet footer caches, Python worker pool.
    for qid in qids:
        REGISTRY[qid](spark, sf_dir).toPandas()

    timings: dict[str, float] = {}
    for qid in qids:
        t0 = time.perf_counter()
        # end-to-end: plan + execute + Arrow fetch to the client
        REGISTRY[qid](spark, sf_dir).toPandas()
        timings[qid] = round(time.perf_counter() - t0, 4)

    return {
        "metric": "corpus_wall_clock",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "n_queries": len(timings),  # corpus grows across rounds;
        # compare totals per-query, not raw
        "queries": timings,
        "sf": sf,
    }


if __name__ == "__main__":
    result = run()
    json.dump(result, sys.stdout)
    print()
