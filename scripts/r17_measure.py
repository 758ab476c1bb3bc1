#!/usr/bin/env python
"""Round-17 per-query measurement harness (guide §1: measure first).

For each requested query id: one warm-up pass, then min-of-3 timed
end-to-end executions (the bench's toPandas protocol, so numbers are
comparable to BENCH_r16), plus the Spark JOB COUNT for one execution
(jobs = driver actions — the fixed-overhead unit that dominates at
fixture scale and costs a corpus pass at 100 TB), and optionally the
formatted plan written to plans/r17/<qid>_<tag>.txt.

Usage:
  python scripts/r17_measure.py [--plans TAG] [--sf DIR] qid [qid ...]
  python scripts/r17_measure.py --all          # every benched query
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("qids", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--plans", default=None, help="write plans/r17/<qid>_<TAG>.txt")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from ccog_spark.queries.registry import NON_BENCH, REGISTRY
    from ccog_spark.session import get_spark

    spark = get_spark(app_name="r17_measure")
    sc = spark.sparkContext

    qids = (
        sorted(q for q in REGISTRY if q not in NON_BENCH)
        if args.all
        else list(args.qids)
    )
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for qid in qids:
        fn = REGISTRY[qid]
        sc.setJobDescription(f"r17_measure:{qid}:warm")
        fn(spark, args.sf).toPandas()  # warm-up (JIT, footers, workers)

        # job count for ONE execution, isolated via a job group
        grp = f"r17cnt_{qid}_{time.monotonic_ns()}"
        sc.setJobGroup(grp, qid)
        t0 = time.perf_counter()
        fn(spark, args.sf).toPandas()
        t_counted = time.perf_counter() - t0
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(grp))
        sc.setLocalProperty("spark.jobGroup.id", None)

        best = t_counted
        for _ in range(max(0, args.reps - 1)):
            sc.setJobDescription(f"r17_measure:{qid}")
            t0 = time.perf_counter()
            fn(spark, args.sf).toPandas()
            best = min(best, time.perf_counter() - t0)

        if args.plans:
            txt = fn(spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(plans_dir, f"{qid}_{args.plans}.txt"), "w"
            ) as f:
                f.write(txt)

        out[qid] = {"sec": round(best, 3), "jobs": n_jobs}
        print(f"RESULT: {qid} sec={best:.3f} jobs={n_jobs}", flush=True)

    print("JSON:" + json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
