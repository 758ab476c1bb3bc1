"""Round-15 scale probe: block-max postings pruning A/B.

The fixed-alphabet fa fixtures have UNIFORM per-term tf across id
blocks — the one corpus shape where block-max cannot cut anything —
so this probe synthesizes the skew it exists for, at two scales:
every doc carries 18 filler tokens + the stopword 'the'; the topic
term 'mid' appears with tf 1 in every 4th doc across ALL blocks but
with tf 9 only inside 1% of the 1024-doc id blocks (the hot blocks).
For the engaged rare+stopword query the planner's θ derives from the
hot docs, and every cold block's tf=1 ceiling sits strictly below
θ − ub('the') — the candidate scan should touch ~1% of the topic
term's postings instead of all of them.

Measures (protocol: alone, min-of-2 after an untimed warm-up,
clearCache per pass, collect() not count()):
- build premium: block_max=True vs plain build;
- engaged query wall: block_max=True vs block_max=False (bit-identity
  asserted — the cut is lossless by construction);
- kept/total blocks for the topic term, replayed from the persisted
  blockstats with the exact bound/threshold the engine computes
  (captured via a planner spy) — the "how much did it skip" number
  wall-clock alone can understate on a warm page cache.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def corpus(spark, n):
    filler = " ".join(f"f{i}" for i in range(18))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit(filler),
            F.lit("the"),
            F.when(F.col("id") % 4 == 0, F.lit("mid")).otherwise(F.lit("")),
            F.when(
                ((F.col("id") / 1024).cast("long") % 100 == 0)
                & (F.col("id") % 1024 < 12),
                F.lit(" ".join(["mid"] * 9)),
            ).otherwise(F.lit("")),
        ).alias("text"),
    ).select(
        "doc_id",
        F.regexp_replace(F.trim("text"), " +", " ").alias("text"),
    )


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from ccog_spark.operators import text as T
    from ccog_spark.operators.text_index import (
        build_bm25_index,
        query_bm25_index,
    )

    out = {}

    def timed(name, thunk, reps=2):
        thunk().collect()
        best, rows = 1e9, None
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            rows = thunk().collect()
            best = min(best, time.time() - t0)
        out[name] = round(best, 2)
        print(json.dumps({name: out[name], "rows": len(rows)}), flush=True)
        return sorted(map(tuple, rows))

    for tag, n in (("64k", 65536), ("512k", 524288)):
        docs = corpus(spark, n).persist()
        docs.collect()
        q = spark.createDataFrame([(1, "mid the")], "q_id long, q_text string")

        idx = f"/tmp/ccog_r15_bmx_{tag}"
        t0 = time.time()
        build_bm25_index(docs, idx, n_buckets=64)
        out[f"{tag}_build_plain_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        build_bm25_index(docs, idx, n_buckets=64, block_max=True)
        out[f"{tag}_build_blockmax_sec"] = round(time.time() - t0, 2)
        print(json.dumps({k: out[k] for k in
                          (f"{tag}_build_plain_sec",
                           f"{tag}_build_blockmax_sec")}), flush=True)

        # capture the planner's keep thresholds to replay the skip
        # fraction from the persisted ceilings (spy, then restore)
        captured = {}
        orig = T._bm25_essential_terms

        def spy(*a, **kw):
            r = orig(*a, **kw)
            if r is not None:
                captured["cuts"] = r[1]
                captured["n_docs"] = a[2].collect()[0]["n_docs"]
            return r

        T._bm25_essential_terms = spy
        try:
            # block_max=True is COST-GATED since round 16: at these
            # fixture scales the essential Σdf sits below the floor,
            # so the gated default must match the plain plan's
            # wall-clock; "force" measures the engaged cut's A/B.
            a = timed(
                f"{tag}_query_blockmax_sec",
                lambda: query_bm25_index(
                    spark, idx, q, k=5, min_postings=0, block_max=True
                ),
            )
            f = timed(
                f"{tag}_query_blockmax_forced_sec",
                lambda: query_bm25_index(
                    spark, idx, q, k=5, min_postings=0, block_max="force"
                ),
            )
            b = timed(
                f"{tag}_query_noblock_sec",
                lambda: query_bm25_index(
                    spark, idx, q, k=5, min_postings=0, block_max=False
                ),
            )
        finally:
            T._bm25_essential_terms = orig
        assert a == f == b, "block-max must be lossless in every mode"

        # Noise-free gate proof (wall-clock on identical plans is
        # host-jitter-bound): below the floor the gated True plan must
        # BE the plain plan — optimized plans identical up to expr ids.
        import re as _re

        def _norm(df):
            s = df._jdf.queryExecution().optimizedPlan().toString()
            return _re.sub(r"#\d+", "#", s)

        pt = _norm(query_bm25_index(
            spark, idx, q, k=5, min_postings=0, block_max=True))
        pf = _norm(query_bm25_index(
            spark, idx, q, k=5, min_postings=0, block_max=False))
        pforce = _norm(query_bm25_index(
            spark, idx, q, k=5, min_postings=0, block_max="force"))
        assert pt == pf, "gated True must be the plain plan below floor"
        assert pforce != pf, "'force' must engage the block cut"
        out[f"{tag}_gated_plan_identical"] = True
        print(json.dumps({f"{tag}_gated_plan_identical": True}), flush=True)

        df_mid, cut = captured["cuts"]["mid"]
        nd = captured["n_docs"]
        idf = (nd - df_mid + 0.5) / (df_mid + 0.5)
        bs = (
            spark.read.parquet(os.path.join(idx, "blockstats"))
            .where(F.col("t") == "mid")
            .groupBy("blk")
            .agg(F.max("max_tf").alias("m"))
            .collect()
        )
        kept = sum(
            1
            for r in bs
            if math.floor(
                idf * (2.2 * r.m / (r.m + 1.2 * 0.25)) * 1e6 + 0.5
            )
            + 1
            >= cut
        )
        out[f"{tag}_blocks_kept"] = kept
        out[f"{tag}_blocks_total"] = len(bs)
        print(json.dumps({f"{tag}_blocks": f"{kept}/{len(bs)}"}), flush=True)
        docs.unpersist()

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
