#!/usr/bin/env python
"""Round-18 focused oracle check: compare the given registry rows
against the DuckDB oracle at the given SF (default sf0.01 — the
driver's correctness SF)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("qids", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from ccog_spark.harness import compare_all
    from ccog_spark.session import get_spark

    spark = get_spark(app_name="r18_check")
    results = compare_all(spark, args.sf, args.qids)
    n_ok = sum(r.ok for r in results)
    for r in results:
        print(f"{'OK ' if r.ok else 'FAIL'} {r.qid} rows={r.spark_rows} {r.detail}")
    print(f"TOTAL {n_ok}/{len(results)} OK")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
