#!/usr/bin/env python
"""Benchmark: run the declared corpus at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {qid: sec}, "sf": ...}.

Protocol (BASELINE.md): warm JVM — one untimed warm-up pass, then the
timed pass; each query timed end-to-end (plan + execute + fetch).

Round 11: the JSON also carries ``calibration_sec`` — a fixed pure-JVM
aggregate over spark.range(5e8), run warm (one untimed pass, then
min-of-3 timed executions) BEFORE the query passes. The probe touches no input data
and no Python workers, so round-over-round movement in it is HOST
drift (CPU contention, thermal, co-tenants), not code: normalize
per-query ratios across rounds by dividing out
calibration_sec_now / calibration_sec_then before attributing a
regression (the r9→r10 +25% swing on untouched queries was exactly
this signature and cost two clean re-runs to adjudicate).
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

    def _calibration() -> float:
        # fixed-work JVM-only probe: hash-distribute 500M longs, two
        # aggregates (forces the exchange + whole-stage codegen), no
        # file IO, no Arrow, no Python workers — a pure host-speed
        # yardstick. collect() (not count) so the aggregate values
        # are materialized; min-of-3 warm runs filters one-off
        # scheduling jitter while keeping sustained contention —
        # exactly the drift signal the field exists to expose.
        from pyspark.sql import functions as F

        df = (
            spark.range(500_000_000)
            .withColumn("g", F.col("id") % 1024)
            .groupBy("g")
            .agg(F.sum("id").alias("s"), F.count("*").alias("c"))
            .agg(F.sum("s").alias("ts"), F.sum("c").alias("tc"))
        )
        df.collect()  # warm (codegen + stage setup)
        best = float("inf")
        for _ in range(3):  # min-of-3: filters scheduling jitter,
            t0 = time.perf_counter()  # keeps contention (the signal)
            df.collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    calibration_sec = _calibration()

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
        "calibration_sec": calibration_sec,  # host-speed yardstick —
        # divide cross-round ratios by the calibration ratio first
        "queries": timings,
        "sf": sf,
    }


def emit(result: dict) -> str:
    """Serialize the result to ONE line guaranteed to fit the grading
    driver's 2000-char stdout tail window (BENCH_r14.json lost
    ``calibration_sec`` to truncation: 90 per-query timings at 4
    decimals + default separators pushed the line past the window and
    ``parsed`` came back null — VERDICT r14 #7). Compact separators +
    2-decimal per-query timings (host noise is >10 ms anyway; the
    corpus total keeps 4 decimals), degrading per-query precision
    further only if the corpus ever outgrows even that."""
    for ndigits in (2, 1):
        out = dict(result)
        out["queries"] = {
            q: round(v, ndigits) for q, v in result["queries"].items()
        }
        line = json.dumps(out, separators=(",", ":"))
        if len(line) <= 1900:
            return line
    # last resort: per-query detail moves to an earlier (unrecorded)
    # line; the final line keeps every scalar the adjudication needs
    out.pop("queries")
    return json.dumps(out, separators=(",", ":"))


if __name__ == "__main__":
    result = run()
    line = emit(result)
    if '"queries"' not in line:
        json.dump(result, sys.stdout)  # full detail, earlier line
        print()
    sys.stdout.write(line + "\n")
