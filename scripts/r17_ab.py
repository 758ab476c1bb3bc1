#!/usr/bin/env python
"""Bench-protocol A/B probe: one fresh session, JVM warm-up on q01,
then each target query timed COLD (previous persists released first,
exactly the bench's cross-query state) N times with releases between.
Reports per-query list of cold times. Usage:
  python scripts/r17_ab.py [--sf DIR] [--reps N] qid [qid ...]
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
    ap.add_argument("qids", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from ccog_spark.queries.registry import REGISTRY, release_persists
    from ccog_spark.session import get_spark

    spark = get_spark(app_name="r17_ab")
    # JVM/codegen/footer warm-up on an unrelated light query
    REGISTRY["q01"](spark, args.sf).toPandas()
    REGISTRY["q01"](spark, args.sf).toPandas()

    out: dict[str, list[float]] = {}
    for qid in args.qids:
        times = []
        for _ in range(args.reps):
            release_persists(spark)  # bench cross-query state: cold caches
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            REGISTRY[qid](spark, args.sf).toPandas()
            times.append(round(time.perf_counter() - t0, 3))
        out[qid] = times
        print(f"RESULT: {qid} {times}", flush=True)
    print("JSON:" + json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
