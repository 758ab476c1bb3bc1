"""Round-17 probe (VERDICT r16 #6): bucket-manifest reads vs
partition discovery UNDER OBJECT-STORE LIST LATENCY, demonstrated
mechanically instead of argued.

SCALING.md r16 records the honest local-FS result: the manifest's
named-file reads are a wash at fixture scale, because a local
directory listing costs microseconds. The manifest's design target is
object-store LIST latency (S3 ListObjectsV2 ~15-50 ms per call).
This probe injects that latency for real: an LD_PRELOAD shim
(compiled on the fly) intercepts the JVM's directory-listing opens
(fdopendir/opendir) under the index path, counts them, and sleeps
$CCOG_LIST_DELAY_US per call — so Spark's actual partition-discovery
code pays an S3-shaped price while named-file manifest reads, which
list nothing, don't. Each mode runs in a fresh subprocess (the JVM
inherits LD_PRELOAD at launch).

Outputs per mode: wall time of the SAME bm25 query verb over the
persisted index, and the number of listing opens under the index
root. Expected shape: discovery pays ~n_buckets listing opens x
delay; manifest pays ~none. Result hashes are asserted identical."""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHIM_C = r"""
#define _GNU_SOURCE
#include <dirent.h>
#include <dlfcn.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>
static DIR *(*real_opendir)(const char *) = NULL;
static DIR *(*real_fdopendir)(int) = NULL;
static long count = 0;
static const char *prefix = NULL;
static long delay_us = 0;
__attribute__((constructor)) static void init(void) {
    prefix = getenv("CCOG_LIST_DELAY_PREFIX");
    const char *d = getenv("CCOG_LIST_DELAY_US");
    delay_us = d ? atol(d) : 0;
}
static void hit(const char *name) {
    if (prefix && name && strncmp(name, prefix, strlen(prefix)) == 0) {
        __sync_fetch_and_add(&count, 1);
        if (delay_us > 0) usleep(delay_us);
    }
}
DIR *opendir(const char *name) {
    if (!real_opendir)
        real_opendir = (DIR *(*)(const char *))dlsym(RTLD_NEXT, "opendir");
    hit(name);
    return real_opendir(name);
}
DIR *fdopendir(int fd) {
    if (!real_fdopendir)
        real_fdopendir = (DIR *(*)(int))dlsym(RTLD_NEXT, "fdopendir");
    char link[64], path[4096];
    snprintf(link, sizeof link, "/proc/self/fd/%d", fd);
    ssize_t n = readlink(link, path, sizeof path - 1);
    if (n > 0) { path[n] = 0; hit(path); }
    return real_fdopendir(fd);
}
__attribute__((destructor)) static void fini(void) {
    const char *f = getenv("CCOG_LIST_COUNT_FILE");
    if (f && count > 0) {
        FILE *fp = fopen(f, "a");
        if (fp) { fprintf(fp, "%ld\n", count); fclose(fp); }
    }
}
"""

IDX = "/tmp/ccog_r17_manifest_idx"
N_BUCKETS = 256
DELAY_US = 20_000  # 20 ms per LIST — the S3 ballpark


def child(mode: str):
    """Run inside the LD_PRELOAD'd subprocess: one warm-up + one
    timed pass of the query verb; print one JSON line."""
    from pyspark.sql import SparkSession

    from ccog_spark.operators.text_index import (
        _BKT_MANIFEST,
        query_bm25_index,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    man = os.path.join(IDX, _BKT_MANIFEST)
    aside = man + ".aside"
    if mode == "discovery" and os.path.exists(man):
        os.rename(man, aside)
    try:
        from ccog_spark.queries.pipeline import BM25_PRUNED_QUERY_BATCH

        q = spark.createDataFrame(
            list(BM25_PRUNED_QUERY_BATCH), "q_id long, q_text string"
        )

        def once():
            return sorted(
                map(tuple, query_bm25_index(spark, IDX, q, k=10).collect())
            )

        rows = once()  # warm-up (JVM/codegen; listings NOT cached by
        # Spark across reads — each read builds a fresh file index)
        t0 = time.time()
        rows = once()
        dt = time.time() - t0
        print("CHILD " + json.dumps(
            {"mode": mode, "sec": round(dt, 2), "n_rows": len(rows),
             "rows_sig": hash(tuple(rows)) & 0xFFFFFFFF}
        ), flush=True)
    finally:
        if os.path.exists(aside):
            os.rename(aside, man)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2])
        return

    shim_dir = tempfile.mkdtemp(prefix="ccog_listshim_")
    src = os.path.join(shim_dir, "listshim.c")
    so = os.path.join(shim_dir, "listshim.so")
    with open(src, "w") as fh:
        fh.write(SHIM_C)
    subprocess.run(
        ["gcc", "-shared", "-fPIC", "-O2", "-o", so, src, "-ldl"],
        check=True,
    )

    if not os.path.isdir(IDX):
        from pyspark.sql import SparkSession

        from ccog_spark.operators.text_index import build_bm25_index

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        build_bm25_index(docs, IDX, n_buckets=N_BUCKETS)
        spark.stop()

    out = {"n_buckets": N_BUCKETS, "list_delay_ms": DELAY_US // 1000}
    for mode in ("manifest", "discovery"):
        cf = os.path.join(shim_dir, f"count_{mode}.txt")
        env = dict(
            os.environ,
            LD_PRELOAD=so,
            CCOG_LIST_DELAY_PREFIX=IDX,
            CCOG_LIST_DELAY_US=str(DELAY_US),
            CCOG_LIST_COUNT_FILE=cf,
        )
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", mode],
            env=env, capture_output=True, text=True, check=True,
        )
        line = next(
            ln for ln in r.stdout.splitlines() if ln.startswith("CHILD ")
        )
        rec = json.loads(line[6:])
        lists = 0
        if os.path.exists(cf):
            with open(cf) as fh:
                lists = sum(int(x) for x in fh.read().split())
        out[f"{mode}_sec"] = rec["sec"]
        out[f"{mode}_rows_sig"] = rec["rows_sig"]
        out[f"{mode}_n_rows"] = rec["n_rows"]
        out[f"{mode}_list_opens"] = lists
        print(json.dumps({mode: rec, "list_opens": lists}), flush=True)
    assert out["manifest_rows_sig"] == out["discovery_rows_sig"]
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
