"""Round-14 inline-operator scale probe: bm25f / prf / diversified
per-batch walls at sf0.1 and fa-sf10 (the SCALING.md r14 rows).

Collect protocol, run ALONE, min-of-2, clearCache before every timed
pass; fixed query batch (doc_id < 800 AND doc_id % 97 == 11 — the
same ids at every scale). bm25_topk is probed alongside as the
single-field yardstick. Fixture: scripts/make_sf_fixed_alphabet.py
with SF_REPLICAS=100 -> /tmp/ccog_sf_fa10.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from ccog_spark.operators import text

    out = {}
    scales = [("/root/testdata/sf0.1", "sf0.1"),
              ("/tmp/ccog_sf_fa10", "fa-sf10")]
    for sf_dir, tag in scales:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        tk = F.split("text", " ")
        fielded = docs.select(
            "doc_id",
            F.array_join(F.slice(tk, 1, 5), " ").alias("title"),
            F.array_join(
                F.expr(
                    "slice(split(text, ' '), 6,"
                    " greatest(size(split(text, ' ')) - 5, 0))"
                ),
                " ",
            ).alias("body"),
        )
        qs = docs.where(
            (F.col("doc_id") < 800) & (F.col("doc_id") % 97 == 11)
        ).select(
            F.col("doc_id").alias("q_id"),
            F.array_join(F.slice(tk, 1, 3), " ").alias("q_text"),
        )
        qs = spark.createDataFrame(qs.collect(), "q_id long, q_text string")

        def run(name, thunk):
            thunk().collect()  # warm
            best, rows = 1e9, None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                rows = thunk().collect()
                best = min(best, time.time() - t0)
            out.setdefault(name, {})[tag] = round(best, 2)
            print(
                json.dumps({name: out[name][tag], "sf": tag, "rows": len(rows)}),
                flush=True,
            )

        run("bm25", lambda: text.bm25_topk(docs, qs, k=5))
        run(
            "bm25f",
            lambda: text.bm25f_topk(
                fielded, qs, ("title", "body"), (2.0, 1.0), k=5
            ),
        )
        run("prf", lambda: text.bm25_prf_topk(docs, qs, k=5, k_fb=10,
                                              e_terms=3))
        run(
            "diversified",
            lambda: text.diversify_topk(
                text.bm25_topk(docs, qs, k=20),
                docs.select("doc_id", "source"), "source",
                k=5, max_per_group=2,
            ),
        )
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
