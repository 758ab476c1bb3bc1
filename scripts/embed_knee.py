"""dedup_embed scaling-knee probe (round-6 judge ask #4).

The sf1 smoke showed dedup_embed at 7.0× time for 10× data — driven by
LSH bucket occupancy: verify cost is ~quadratic per bucket, so as the
corpus grows, candidate pairs (not rows) are the real cost driver.
This probe measures, at sf0.1 and sf1, for several (N_TABLES,
BAND_BITS) configs:

- candidate-pair count out of the band join (the verify workload),
- wall time of the full operator,
- result rows (recall proxy — the planted dups are the ground truth).

Run: python scripts/make_sf1.py && python scripts/embed_knee.py
Results + reading: SCALING.md §dedup_embed knee.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CONFIGS = [(4, 8), (4, 10), (8, 10), (4, 12)]  # (n_tables, band_bits)


def candidate_count(nv_emb, dim, n_tables, bits) -> int:
    from ccog_spark.operators.similarity import band_keys_arrow

    nv = nv_emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    ).withColumn("bks", band_keys_arrow(dim, n_tables, bits)(F.col("e")))
    bands = nv.select("vec_id", F.posexplode(F.col("bks")).alias("tbl", "bk"))
    a = bands.select("tbl", "bk", F.col("vec_id").alias("id_a"))
    b = bands.select("tbl", "bk", F.col("vec_id").alias("id_b"))
    return (
        a.join(b, ["tbl", "bk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .count()
    )


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from ccog_spark.catalog import load_table
    from ccog_spark.operators.dedup import embedding_dup_pairs
    from ccog_spark.queries.pipeline import EMB_DIM, _augmented_embeddings

    for sf_dir, tag in (("/root/testdata/sf0.1", "sf0.1"), ("/tmp/ccog_sf1", "sf1")):
        emb = _augmented_embeddings(load_table(spark, sf_dir, "embeddings"))
        emb.persist().count()
        for nt, bb in CONFIGS:
            pairs = candidate_count(emb, EMB_DIM, nt, bb)
            # warm-up + timed, mirroring bench.py
            embedding_dup_pairs(
                emb, EMB_DIM, n_tables=nt, band_bits=bb
            ).collect()
            t0 = time.time()
            rows = len(
                embedding_dup_pairs(
                    emb, EMB_DIM, n_tables=nt, band_bits=bb
                ).collect()
            )
            dt = round(time.time() - t0, 2)
            print(
                json.dumps(
                    {
                        "sf": tag, "n_tables": nt, "band_bits": bb,
                        "cand_pairs": pairs, "sec": dt, "rows": rows,
                    }
                ),
                flush=True,
            )
        emb.unpersist()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
