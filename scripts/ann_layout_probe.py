"""Round-11 probe: persisted ANN index at sf10 with the cell-clustered
codes layout (VERDICT r10 task 3).

Measures at /tmp/ccog_sf10 (200k vectors): index build wall (incl. the
new grp clustering shuffle), query wall from the persisted index, and
the PRUNING FRACTION — parquet files (and bytes) under probed grp
directories vs the whole codes table, i.e. what a probe query reads
after partition pruning, before row-group stats pruning shrinks it
further.

Run ALONE: python scripts/ann_layout_probe.py [sf_dir]
"""

import glob
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
    import tempfile

    from ccog_spark.catalog import load_table
    from ccog_spark.operators.ann_index import (
        build_ivfpq_index,
        query_ivfpq_index,
    )
    from ccog_spark.queries.pipeline import EMB_DIM, _queries_subset

    emb = load_table(spark, sf_dir, "embeddings")
    idx = tempfile.mkdtemp(prefix="ccog_layout_probe_")
    t0 = time.time()
    meta = build_ivfpq_index(emb, EMB_DIM, idx)
    build_s = round(time.time() - t0, 1)

    cents = sorted(
        r.cent_id
        for r in spark.read.parquet(idx + "/centroids").collect()
    )
    ng = int(meta["n_groups"])
    all_files = glob.glob(os.path.join(idx, "codes", "grp=*", "*.parquet"))
    tb = sum(os.path.getsize(f) for f in all_files)
    vec_cells = dict(
        (r.vec_id, r.cell)
        for r in spark.read.parquet(idx + "/codes")
        .select("vec_id", "cell")
        .collect()
    )

    # pruning fraction vs QUERY-BATCH SIZE: the registry's full
    # vec_id%100 batch (2k queries at sf10) probes ~40% of all cells
    # and legitimately touches every grp dir; the production per-batch
    # case (tens of queries) is where partition pruning pays
    full_q = _queries_subset(emb)
    for label, q in (
        ("registry_batch", full_q),
        ("batch_64", full_q.limit(64)),
        ("batch_8", full_q.limit(8)),
    ):
        out = query_ivfpq_index(spark, idx, q, k=3)
        rows = out.collect()  # warm
        t0 = time.time()
        rows = out.collect()
        query_s = round(time.time() - t0, 2)
        cells = {vec_cells[r.vec_id] for r in rows}
        pgrps = {f"grp={cents.index(c) * ng // len(cents)}" for c in cells}
        probe_files = [
            f for f in all_files
            if os.path.basename(os.path.dirname(f)) in pgrps
        ]
        pb = sum(os.path.getsize(f) for f in probe_files)
        print(json.dumps({
            "config": label, "sf_dir": sf_dir,
            "n_vectors": meta["n_vectors"], "n_groups": ng,
            "build_sec": build_s, "query_sec": query_s,
            "result_rows": len(rows),
            "grp_dirs_probed": len(pgrps),
            "grp_dirs_total": len(
                {os.path.dirname(f) for f in all_files}
            ),
            "files_probed": len(probe_files),
            "files_total": len(all_files),
            "bytes_probed": pb, "bytes_total": tb,
            "bytes_fraction": round(pb / tb, 4),
        }), flush=True)
    import shutil

    shutil.rmtree(idx, ignore_errors=True)


if __name__ == "__main__":
    main()
