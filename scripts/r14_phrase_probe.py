"""Round-14 positional-index probe: phrase/proximity at fa-sf10.

The r14 phrase/proximity operators have correctness gates (oracle rows
+ shared-core bit-identity pytest) but no scale point. This measures,
on the fixed-alphabet sf10 corpus (500k docs):

- positional index build cost vs the scoring-only build (the
  positions=True storage/write premium);
- per-batch phrase search: inline (posexplode over the corpus) vs
  index-resident (positions from the phrase terms' posting buckets);
- per-batch proximity (span 5): same comparison.

Query batch: 8 deterministic 3-token phrases drawn from the corpus
(doc_id % 3001 == 7, words 2..4 — guaranteed ≥ 1 match each, heavy
cross-matching under the 31-word fixture vocabulary). Run ALONE,
min-of-2, clearCache before timed passes, bit-identity asserted
between the two execution paths of each operator.

Fixture caveat (probe design, reported in SCALING.md): the 31-word
vocabulary makes EVERY document match every phrase's term set, so
phrase/proximity candidate volume here is the worst case — corpus ×
batch. Phrase (anchor aggregation) is linear in matching tokens and
runs at fa-sf10; proximity's window SELF-JOIN is quadratic in
PER-DOC matching tokens, so its wall is measured at fa-sf1 and the
fa-sf10 point is phrase-only (real phrases are selective — matching
tokens, not corpus size, is the driver; that is what the two scales
show).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

FA = os.environ.get("SF_FA_DIR", "/tmp/ccog_sf_fa10")
PIDX = "/tmp/ccog_r14_pos_idx"
SIDX = "/tmp/ccog_r14_score_idx"


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from ccog_spark.operators.text import phrase_match, proximity_match
    from ccog_spark.operators.text_index import (
        build_bm25_index,
        phrase_match_index,
        proximity_match_index,
    )

    docs = spark.read.parquet(os.path.join(FA, "documents.parquet"))
    phrases = (
        docs.where(F.col("doc_id") % 3001 == 7)
        .select(
            F.col("doc_id").alias("q_id"),
            F.array_join(
                F.slice(F.split(F.col("text"), " "), 2, 3), " "
            ).alias("phrase"),
        )
        .limit(8)
    )
    phrases = spark.createDataFrame(
        phrases.collect(), "q_id long, phrase string"
    )  # freeze the batch (no corpus re-derivation inside timed plans)
    out = {"sf": FA, "n_phrases": phrases.count()}

    t0 = time.time()
    build_bm25_index(docs, SIDX)
    out["build_scoring_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    build_bm25_index(docs, PIDX, positions=True)
    out["build_positional_sec"] = round(time.time() - t0, 2)

    def dir_mb(root):
        tot = 0
        for dp, _, fns in os.walk(root):
            tot += sum(os.path.getsize(os.path.join(dp, f)) for f in fns)
        return round(tot / 1e6, 1)

    out["scoring_postings_mb"] = dir_mb(os.path.join(SIDX, "postings"))
    out["positional_postings_mb"] = dir_mb(os.path.join(PIDX, "postings"))
    print(json.dumps(out), flush=True)

    def timed(name, thunk, reps=2):
        thunk().collect()  # warm-up
        best, rows = 1e9, None
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            rows = thunk().collect()
            best = min(best, time.time() - t0)
        out[name] = round(best, 2)
        print(json.dumps({name: out[name], "rows": len(rows)}), flush=True)
        return sorted(map(tuple, rows))

    a = timed("phrase_inline_sec", lambda: phrase_match(docs, phrases))
    b = timed(
        "phrase_index_sec", lambda: phrase_match_index(spark, PIDX, phrases)
    )
    assert a == b, "index phrase answers must equal inline"

    # proximity at fa-sf1 (see module docstring: the window self-join
    # is quadratic in per-doc MATCHING tokens and this fixture makes
    # every doc match — fa-sf10 would measure the worst case of a
    # deliberately pathological batch, not the operator)
    sf1 = os.environ.get("SF_FA1_DIR", "/tmp/ccog_sf_fa1")
    docs1 = spark.read.parquet(os.path.join(sf1, "documents.parquet"))
    pidx1 = "/tmp/ccog_r14_pos_idx_fa1"
    build_bm25_index(docs1, pidx1, positions=True)
    c = timed(
        "prox_fa1_inline_sec",
        lambda: proximity_match(docs1, phrases, max_span=5),
    )
    d = timed(
        "prox_fa1_index_sec",
        lambda: proximity_match_index(spark, pidx1, phrases, max_span=5),
    )
    assert c == d, "index proximity answers must equal inline"
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
