"""LM + line-dedup probe over the FIXED-ALPHABET fixtures (round 8,
VERDICT r7 task 6): show the char-trigram model-size plateau that the
replica-tagged fixtures masked, with wall-clock alongside model rows.

Run make_sf_fixed_alphabet.py first:
  SF_FA_DIR=/tmp/ccog_sf_fa1  SF_REPLICAS=10  python scripts/make_sf_fixed_alphabet.py
  SF_FA_DIR=/tmp/ccog_sf_fa10 SF_REPLICAS=100 python scripts/make_sf_fixed_alphabet.py
then run this ALONE (bench-contention rule)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from ccog_spark.catalog import load_table
    from ccog_spark.operators.lm import train_char_lm
    from ccog_spark.queries.registry import REGISTRY

    dirs = [
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1-fixedalpha", os.environ.get("FA1", "/tmp/ccog_sf_fa1")),
        ("sf10-fixedalpha", os.environ.get("FA10", "/tmp/ccog_sf_fa10")),
    ]
    for name, d in dirs:
        docs = load_table(spark, d, "documents")
        n_docs = docs.count()
        gram_counts, ctx_counts, _ = train_char_lm(docs, n=3)
        model_rows = gram_counts.count()
        ctx_rows = ctx_counts.count()
        row = {"fixture": name, "docs": n_docs,
               "model_gram_rows": model_rows, "model_ctx_rows": ctx_rows}
        for q in ("pipeline_lm", "pipeline_line_dedup"):
            fn = REGISTRY[q]
            # collect(), not count(): count lets Catalyst PRUNE the
            # expensive output columns (the rebuilt text, the score),
            # which silently under-measures — scaling_smoke protocol
            fn(spark, d).collect()  # warm-up
            t0 = time.perf_counter()
            fn(spark, d).collect()
            row[q + "_s"] = round(time.perf_counter() - t0, 2)
        print("ROWJSON:", json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
