#!/usr/bin/env python
"""Round-18 per-query measurement harness (guide §1: measure first).

Extends scripts/r17_measure.py per VERDICT r17 item #5: in addition to
warm min-of-N seconds and the Spark JOB count (driver actions), it can
capture the EXECUTED adaptive plan after the action (--executed) so
that runtime exchange reuse — invisible in static explain — is
machine-checkable: the executed plan renders ReusedExchange /
ReusedSubquery nodes and the final AQE plan shape, and the harness
also records the stage count for the measured execution from the
status tracker.

Usage:
  python scripts/r18_measure.py [--plans TAG] [--executed] [--sf DIR] qid...
  python scripts/r18_measure.py --all
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
    ap.add_argument("--plans", default=None, help="write plans/r18/<qid>_<TAG>.txt")
    ap.add_argument(
        "--executed",
        action="store_true",
        help="with --plans, also write <qid>_<TAG>_executed.txt — the "
        "POST-ACTION adaptive plan (ReusedExchange visible)",
    )
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from ccog_spark.queries.registry import NON_BENCH, REGISTRY
    from ccog_spark.session import get_spark

    spark = get_spark(app_name="r18_measure")
    sc = spark.sparkContext

    qids = (
        sorted(q for q in REGISTRY if q not in NON_BENCH)
        if args.all
        else list(args.qids)
    )
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r18"
    )
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for qid in qids:
        fn = REGISTRY[qid]
        sc.setJobDescription(f"r18_measure:{qid}:warm")
        fn(spark, args.sf).toPandas()  # warm-up (JIT, footers, workers)

        # job + stage count for ONE execution, isolated via a job group
        grp = f"r18cnt_{qid}_{time.monotonic_ns()}"
        sc.setJobGroup(grp, qid)
        t0 = time.perf_counter()
        fn(spark, args.sf).toPandas()
        t_counted = time.perf_counter() - t0
        tracker = sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(grp)
        n_jobs = len(job_ids)
        n_stages = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is not None:
                n_stages += len(info.stageIds)
        sc.setLocalProperty("spark.jobGroup.id", None)

        best = t_counted
        for _ in range(max(0, args.reps - 1)):
            sc.setJobDescription(f"r18_measure:{qid}")
            t0 = time.perf_counter()
            fn(spark, args.sf).toPandas()
            best = min(best, time.perf_counter() - t0)

        n_reused = None
        if args.plans:
            df = fn(spark, args.sf)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            txt = df._jdf.queryExecution().explainString(mode)
            with open(os.path.join(plans_dir, f"{qid}_{args.plans}.txt"), "w") as f:
                f.write(txt)
            if args.executed:
                # run the action so AQE finalizes, then render the
                # EXECUTED plan: ReusedExchange/ReusedSubquery nodes and
                # final join strategies appear only here (guide §7.2)
                df.toPandas()
                etxt = df._jdf.queryExecution().explainString(mode)
                n_reused = etxt.count("ReusedExchange") + etxt.count(
                    "ReusedSubquery"
                )
                with open(
                    os.path.join(plans_dir, f"{qid}_{args.plans}_executed.txt"), "w"
                ) as f:
                    f.write(etxt)

        out[qid] = {"sec": round(best, 3), "jobs": n_jobs, "stages": n_stages}
        if n_reused is not None:
            out[qid]["reused_exchanges"] = n_reused
        print(
            f"RESULT: {qid} sec={best:.3f} jobs={n_jobs} stages={n_stages}"
            + (f" reused={n_reused}" if n_reused is not None else ""),
            flush=True,
        )

    print("JSON:" + json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
