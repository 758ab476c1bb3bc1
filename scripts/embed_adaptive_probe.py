"""Round-11 probe: adaptive band_bits at sf10 (VERDICT r10 task 1).

Measures dedup_embed's operator wall time and recall at /tmp/ccog_sf10
(200k vectors + 10% planted dups) under (a) the OLD fixed default
band_bits=10 pinned, and (b) the new adaptive default
(similarity.adaptive_band_bits: occupancy capped at TARGET_BUCKET).
Planted-pair recall = found pairs (orig, orig+10M) / planted count.

Run ALONE on the box: python scripts/embed_adaptive_probe.py [sf_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ccog_sf10"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from ccog_spark.catalog import load_table
    from ccog_spark.operators import similarity
    from ccog_spark.operators.dedup import embedding_dup_pairs
    from ccog_spark.queries.pipeline import EMB_DIM, _augmented_embeddings

    emb = _augmented_embeddings(load_table(spark, sf_dir, "embeddings"))
    emb.persist()
    n = emb.count()
    planted = emb.where(F.col("vec_id") >= 10_000_000).count()
    adaptive_bits = similarity.adaptive_band_bits(n)
    adaptive_nt = similarity.adaptive_n_tables(adaptive_bits)
    print(json.dumps({"sf_dir": sf_dir, "n": n, "planted": planted,
                      "adaptive_bits": adaptive_bits,
                      "adaptive_n_tables": adaptive_nt}), flush=True)

    # fixed10 = the pre-r11 default; adaptive_bits_only isolates the
    # width effect; adaptive = the shipped default (width + table
    # buy-back riding together)
    for label, nt, bb in (
        ("fixed10", 8, 10),
        ("adaptive_bits_only", 8, adaptive_bits),
        ("adaptive", None, None),
    ):
        out = embedding_dup_pairs(emb, EMB_DIM, n_tables=nt, band_bits=bb)
        t0 = time.time()
        rows = out.collect()
        dt = round(time.time() - t0, 1)
        found = sum(
            1 for r in rows
            if r.id_b == r.id_a + 10_000_000 and r.id_a % 10 == 0
        )
        print(json.dumps({
            "config": label, "n_tables": nt or adaptive_nt,
            "bits": bb or adaptive_bits, "sec": dt,
            "result_rows": len(rows), "planted_found": found,
            "recall_pct": round(100.0 * found / planted, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
