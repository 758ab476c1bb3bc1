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
