#!/usr/bin/env python
"""Capture .explain('formatted') for the given queries into
plans/r17/<qid>_<tag>.txt WITHOUT timed execution (plan build only;
query functions may still run their own build-time driver actions)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    qids = sys.argv[2:]
    sf = os.environ.get("R17_SF", "/root/testdata/sf0.1")
    from ccog_spark.queries.registry import REGISTRY
    from ccog_spark.session import get_spark

    spark = get_spark(app_name="r17_plans")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r17",
    )
    os.makedirs(out, exist_ok=True)
    for qid in qids:
        df = REGISTRY[qid](spark, sf)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(out, f"{qid}_{tag}.txt"), "w") as f:
            f.write(txt)
        print("PLAN", qid, len(txt.splitlines()), flush=True)


if __name__ == "__main__":
    main()
