"""Benchmark decontamination: flag corpus documents that share any
word n-gram with an evaluation/benchmark set.

The standard training-data hygiene step (n-gram-overlap
decontamination as in GPT-3 appendix C / PaLM / Llama reports): a
training document is contaminated when any of its n-grams appears in
any benchmark document.

Scale shape — the part that matters at 100 TB: benchmark sets are
tiny (MMLU-sized: 10⁴–10⁶ n-grams) while the corpus is huge, so the
benchmark n-gram set is collected DISTINCT and broadcast; the corpus
side explodes its shingle hashes map-side and probes the broadcast
hash set — a broadcast semi-join with NO shuffle of corpus data. The
only shuffle is the per-doc hit-count aggregate, keyed by doc_id.

Shingle hashes reuse operators.dedup.with_shingle_hashes (the
engine-portable rolling hash), so results are hash-checkable against
DuckDB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ccog_spark.operators.dedup import with_shingle_hashes


def contamination_flags(
    corpus: DataFrame, bench: DataFrame, n: int = 3
) -> DataFrame:
    """Per corpus document: the number of distinct word ``n``-grams it
    shares with ``bench``, and a contaminated flag (≥ 1 shared).

    Both inputs need (doc_id, text). Every corpus doc appears in the
    output (zero-hit docs via the left join).
    """
    c = with_shingle_hashes(
        corpus.select("doc_id", "text"), "text", n=n
    ).select("doc_id", "sh")
    b = with_shingle_hashes(bench.select("doc_id", "text"), "text", n=n)
    bench_grams = (
        b.select(F.explode("sh").alias("h"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # Single pass over the corpus: explode (sh is never empty — the
    # < n-token fallback emits one hash — so every doc survives), LEFT
    # broadcast-join against the benchmark gram set, re-aggregate by
    # doc_id. sh is distinct per doc, so the hit count == distinct
    # shared grams; zero-hit docs keep their row via the left join
    # instead of a second scan + join-back.
    return (
        c.select("doc_id", F.explode("sh").alias("h"))
        .join(F.broadcast(bench_grams), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_shared")
        )
        .select(
            "doc_id", "n_shared", (F.col("n_shared") > 0).alias("contaminated")
        )
    )


def _bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m = -n·ln(p)/ln(2)², k = (m/n)·ln(2)."""
    import math

    n_items = max(n_items, 1)
    m = max(64, int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, int(round(m / n_items * math.log(2))))
    return m, k


def _mix64(x):
    """splitmix64 finalizer (public-domain constant mix) — derives the
    second hash for double hashing from the shingle hash. numpy
    uint64 vectorized; identical scalars for any engine that replays
    it (deterministic, no seeds)."""
    import numpy as np

    z = x.astype(np.uint64, copy=True)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def bench_bloom_filter(bench: DataFrame, n: int = 3, fpp: float = 1e-3):
    """Build a Bloom filter (numpy packed bitset) over the benchmark's
    distinct n-gram hashes on the driver.

    Returns (bits: np.ndarray[uint8], m, k, n_grams). The collect is
    bounded by the benchmark-set size — the same "benchmark sets are
    small" assumption the exact variant's broadcast makes, but the
    artifact shipped to executors is ~10 bits per gram instead of a
    ~40-byte hash-set entry: at 10⁸ benchmark grams that is a 120 MB
    bitset vs a multi-GB hash set — the difference between a
    broadcastable filter and an un-broadcastable join side."""
    import numpy as np

    b = with_shingle_hashes(bench.select("doc_id", "text"), "text", n=n)
    grams = np.array(
        [
            r.h
            for r in b.select(F.explode("sh").alias("h")).distinct().collect()
        ],
        dtype=np.int64,
    )
    m, k = _bloom_params(len(grams), fpp)
    bits = np.zeros((m + 7) // 8, dtype=np.uint8)
    h1 = grams.astype(np.uint64) % np.uint64(m)
    h2 = _mix64(grams.view(np.uint64)) % np.uint64(m - 1) + np.uint64(1)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
    return bits, m, k, len(grams)


def contamination_flags_bloom(
    corpus: DataFrame, bench: DataFrame, n: int = 3, fpp: float = 1e-3
) -> DataFrame:
    """Bloom-filter variant of contamination_flags: NO false negatives
    (every truly-shared gram hits), false positives bounded by ``fpp``
    per probed gram. Output schema matches the exact variant
    (doc_id, n_shared, contaminated) — n_shared here counts grams the
    FILTER accepts, so n_shared_bloom ≥ n_shared_exact row-wise.

    Scale shape: the corpus side never shuffles — one Arrow kernel
    probes each document's distinct gram array against the broadcast
    bitset and emits a count; there is no per-gram explode and no join
    at all (the exact variant's explode multiplies corpus rows ~100×
    before its re-aggregate; this path stays at one row per doc)."""
    # the probe kernel references _mix64 (this module) from executor
    # workers — ship the module by value so a driver running outside
    # the repo (foreign cwd, stripped PYTHONPATH) still executes
    # (same pattern as operators.multimodal / raster.codecs)
    try:
        from pyspark.cloudpickle import register_pickle_by_value

        from ccog_spark.operators import decontam as _self

        register_pickle_by_value(_self)
    except ImportError:  # pragma: no cover - older pyspark
        pass

    bits, m, k, _ = bench_bloom_filter(bench, n=n, fpp=fpp)
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast(bits)

    @F.pandas_udf("bigint")
    def probe(sh: pd.Series) -> pd.Series:
        import numpy as np

        bb = bc.value
        mm, kk = np.uint64(m), k
        out = np.zeros(len(sh), dtype=np.int64)
        flat = np.concatenate([np.asarray(v, dtype=np.int64) for v in sh]) \
            if len(sh) else np.array([], dtype=np.int64)
        lens = np.array([len(v) for v in sh], dtype=np.int64)
        if flat.size:
            h1 = flat.astype(np.uint64) % mm
            h2 = _mix64(flat.view(np.uint64)) % (mm - np.uint64(1)) + np.uint64(1)
            hit = np.ones(flat.size, dtype=bool)
            for i in range(kk):
                pos = (h1 + np.uint64(i) * h2) % mm
                hit &= (bb[(pos >> np.uint64(3)).astype(np.int64)]
                        >> (pos & np.uint64(7)).astype(np.uint8)) & 1 == 1
            # per-doc hit counts via segment reduction
            seg = np.repeat(np.arange(len(sh)), lens)
            np.add.at(out, seg, hit.astype(np.int64))
        return pd.Series(out)

    c = with_shingle_hashes(corpus.select("doc_id", "text"), "text", n=n)
    return c.select(
        "doc_id", probe(F.col("sh")).alias("n_shared")
    ).withColumn("contaminated", F.col("n_shared") > 0)
