"""Round-16 probe: forward-table manifest vs directory-listing reads.

The r15 honesty row (SCALING.md "the forward table, measured
honestly") showed the dbkt-pruned forward read paying 5.71 s against
a 0.77 s full postings-width scan at fa-sf10 — the cost was partition
DISCOVERY (listing n_buckets dirs) plus per-dir open overhead, not
bytes. Round 16 stores a dbkt→files manifest in the index
(`forward_manifest.json`, rewritten by build/append/compact, audited
by verify) so the pruned read opens the matched buckets' named files
directly. This probe re-times the same feedback-count step (40 winner
ids, fa-sf10, n_buckets=1024):

- full postings-width scan (the term-bucketed baseline);
- forward read WITH the manifest (named files, basePath);
- forward read WITHOUT it (manifest moved aside — the r15 listing
  path, for the apples-to-apples delta).

Protocol: alone, min-of-2 after an untimed warm-up, clearCache per
pass, collect() not count(). Bit-identity across the three reads is
asserted.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ccog_sf_fa10"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from ccog_spark.operators.text_index import (
        _FWD_MANIFEST,
        _pruned_forward,
        _read_meta,
        build_bm25_index,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    idx = "/tmp/ccog_r16_fwd_idx"
    out = {}
    if not os.path.exists(os.path.join(idx, _FWD_MANIFEST)):
        t0 = time.time()
        build_bm25_index(docs, idx, n_buckets=1024, forward=True)
        out["build_sec"] = round(time.time() - t0, 2)

    meta = _read_meta(spark, idx)
    winners = [
        r.doc_id for r in docs.select("doc_id").orderBy("doc_id")
        .limit(40).collect()
    ]

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

    wset = set(winners)

    # feedback-count shape: Σ tf per (id, t) over the winner ids
    def from_postings():
        return (
            spark.read.parquet(os.path.join(idx, "postings"))
            .select("doc_id", "t", "tf")
            .where(F.col("doc_id").isin(winners))
        )

    def from_forward():
        return _pruned_forward(spark, idx, meta, winners).select(
            "doc_id", "t", "tf"
        )

    a = timed("postings_full_scan_sec", from_postings)
    b = timed("forward_manifest_sec", from_forward)
    man = os.path.join(idx, _FWD_MANIFEST)
    os.rename(man, man + ".aside")
    try:
        c = timed("forward_listing_sec", from_forward)
    finally:
        os.rename(man + ".aside", man)
    assert a == b == c, "all three reads must return identical rows"
    assert all(t[0] in wset for t in a)

    # round 16 follow-up: the BUCKET manifest on the query hot path —
    # a BM25 query batch against the same 1024-bucket index, manifest
    # (named postings/terms files) vs partition discovery
    from ccog_spark.operators.text_index import (
        _BKT_MANIFEST,
        _write_bucket_manifest,
        query_bm25_index,
    )

    _write_bucket_manifest(idx)  # index may predate the manifest
    qb = spark.createDataFrame(
        [(1, "dup the stream"), (2, "dup value data")],
        "q_id long, q_text string",
    )
    d = timed(
        "bm25_query_bucket_manifest_sec",
        lambda: query_bm25_index(spark, idx, qb, k=5),
    )
    bman = os.path.join(idx, _BKT_MANIFEST)
    os.rename(bman, bman + ".aside")
    try:
        e = timed(
            "bm25_query_bucket_listing_sec",
            lambda: query_bm25_index(spark, idx, qb, k=5),
        )
    finally:
        os.rename(bman + ".aside", bman)
    assert d == e, "manifest and discovery reads must answer identically"
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
