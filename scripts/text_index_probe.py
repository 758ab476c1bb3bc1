"""Round-13 persisted-BM25-index probe: build-once/query-many
amortization at scale, run ALONE.

On the fixed-alphabet sf10 fixture (500k docs — term df grows with
corpus, the honest regime), compare a query batch answered by the
INLINE operator (re-derives TF/DF/dl every call) vs the PERSISTED
index (bucket-pruned postings reads). Also reports build wall and the
bucket-pruning read fraction (bytes of pruned scan vs full index).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF = os.environ.get("TEXT_IDX_SF", "/tmp/ccog_sf_fa10")
IDX = os.environ.get("TEXT_IDX_DIR", "/tmp/ccog_bm25_probe_idx")


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from ccog_spark.operators.text import bm25_topk
    from ccog_spark.operators.text_index import (
        build_bm25_index,
        query_bm25_index,
    )

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    qs = spark.createDataFrame(
        [(1, "dup the stream"), (2, "dup value data"), (3, "dup big small"),
         (4, "dup sort query"), (5, "dup agg batch"), (6, "dup a line")],
        "q_id long, q_text string",
    )
    out = {"sf": SF}

    t0 = time.time()
    meta = build_bm25_index(docs, IDX)
    out["build_sec"] = round(time.time() - t0, 2)
    out["meta"] = meta
    print(json.dumps({"build_sec": out["build_sec"], **meta}), flush=True)

    def run(name, thunk):
        thunk().collect()  # warm
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            rows = thunk().collect()
            best = min(best, time.time() - t0)
        out[name] = round(best, 2)
        print(json.dumps({name: out[name], "rows": len(rows)}), flush=True)
        return sorted(map(tuple, rows))

    a = run("inline_sec", lambda: bm25_topk(docs, qs, k=5, prune=False))
    b = run("index_sec", lambda: query_bm25_index(spark, IDX, qs, k=5))
    assert a == b, "index answers must equal inline"

    # pruned-read fraction: bytes under the query terms' bucket dirs
    import glob

    tlist = [r.t for r in qs.select(
        F.explode(F.split("q_text", " ")).alias("t")).distinct().collect()]
    bkts = {
        r.b for r in spark.createDataFrame([(t,) for t in tlist], "t string")
        .select(F.pmod(F.xxhash64("t"), F.lit(meta["n_buckets"]))
                .cast("int").alias("b")).collect()
    }
    def dir_bytes(pat):
        return sum(
            os.path.getsize(f)
            for d in glob.glob(pat)
            for f in glob.glob(os.path.join(d, "*.parquet"))
        )
    total = dir_bytes(os.path.join(IDX, "postings", "bkt=*"))
    read = sum(
        dir_bytes(os.path.join(IDX, "postings", f"bkt={b}")) for b in bkts
    )
    out["postings_read_frac"] = round(read / total, 3) if total else None
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
