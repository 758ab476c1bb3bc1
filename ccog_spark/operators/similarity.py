"""Vector similarity search (E36): exact top-k + LSH-bucketed ANN.

- ``brute_force_topk``: exact cosine top-k of every query vector
  against the corpus. Plan: broadcast the (small) query set against the
  corpus — a map-side nested loop per corpus partition, then a
  per-query top-k window. At 100 TB of corpus vectors this is the
  standard "broadcast the queries, stream the corpus" shape: no corpus
  shuffle at all, only k rows per query cross the final exchange.
- ``lsh_topk``: random-hyperplane LSH — deterministic integer
  hyperplanes (engine-portable, oracle-checkable), sign-bit bucket key,
  candidates restricted to the query's bucket. The scale path: corpus
  bucketed once (reusable across query batches), per-bucket candidate
  sets ~corpus/2^bits.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ccog_spark.functions.vectors import dot, norm

N_PLANES = 8

# Multi-table banding (embedding near-dup blocking): N_TABLES
# independent tables of up to MAX_BAND_BITS sign-bits each; table t
# OWNS hyperplanes j = t*MAX_BAND_BITS .. (t+1)*MAX_BAND_BITS - 1 and
# a key of ``bits`` uses the FIRST ``bits`` of them (round 11 — the
# fixed per-table plane range makes a key at any ``bits`` the low-bit
# MASK of the same table's full-width key, which is what lets the
# DuckDB oracle replay a DATA-DEPENDENT ``bits`` with pure integer
# SQL: full key & (2^bits - 1)). A pair sharing >= 1 table's full key
# becomes a candidate — the standard OR-of-ANDs LSH amplification.
#
# Floor defaults tuned by scripts/embed_knee.py (SCALING.md): at sf1
# the old 4×8 produced 10.0M candidate pairs (12.6 s) from overfull
# 256-bucket tables; 8×10 cuts pairs to 6.4M and time to 2.65 s at
# equal recall (1998/1999 planted dups) and is faster at sf0.1 too.
# More bits → smaller buckets (pair count ~n²/2^bits per table); more
# tables recover recall at linear cost. The DuckDB oracle builds its
# SQL from these same constants, so both engines move together.
N_TABLES = 8
BAND_BITS = 10
# Past 2^BAND_BITS key-space saturation the per-bucket verify work
# grows ∝ n²/2^bits — a FIXED default carries a quadratic CPU term to
# 100 TB (r10 verdict). adaptive_band_bits makes the documented rule
# ("bits ∝ log N to hold bucket occupancy constant") executable:
# expected occupancy is capped at TARGET_BUCKET rows, i.e. ≤
# N_TABLES·TARGET_BUCKET/2 verify cosines per vector — past the floor,
# total verify work is LINEAR in n at fixed recall-per-table (tables
# buy recall back at linear cost; scripts/embed_knee.py measures).
TARGET_BUCKET = 128
MAX_BAND_BITS = 30  # int32 key space; 128·2^30 ≈ 1.4·10^11 vectors
# recall buy-back cap: the oracle mirrors table-count adaptivity with
# MAX_TABLES gated UNION branches, so the executable rule is bounded
MAX_TABLES = 16


def adaptive_band_bits(n: int) -> int:
    """Corpus-sized band width: ``max(BAND_BITS, ceil(log2(ceil(n /
    TARGET_BUCKET))))``, clamped to MAX_BAND_BITS — pure integer
    arithmetic ((m-1).bit_length() is exact ceil-log2), replayed
    bit-for-bit by the dedup_embed oracle's ``prm`` CTE (ceil-div +
    power-of-two CASE ladder + key mask)."""
    m = (n + TARGET_BUCKET - 1) // TARGET_BUCKET
    bits = (m - 1).bit_length() if m > 1 else 0
    return max(BAND_BITS, min(MAX_BAND_BITS, bits))


def adaptive_n_tables(bits: int) -> int:
    """Executable recall buy-back (the rule SCALING.md states as
    prose): every band bit above the floor costs per-table recall
    p^bits, and tables recover it at LINEAR cost — +2 tables per
    extra bit slightly over-compensates at the cos_min boundary
    (miss prob (1-p^(floor+k))^(8+2k) < (1-p^floor)^8 for p ≈ 0.94),
    capped at MAX_TABLES so the oracle's gated UNION stays bounded.
    Pure integer arithmetic, replayed by the ``ntab`` column of the
    dedup_embed oracle's ``prm`` CTE."""
    return min(MAX_TABLES, N_TABLES + 2 * (bits - BAND_BITS))


def _hyperplane(j: int, dim: int) -> list[int]:
    """Deterministic integer hyperplane weights in [-6, 6] — the same
    formula is reproduced in the DuckDB oracle."""
    return [((j * 131 + d * 17) % 13) - 6 for d in range(dim)]


def bucket_key(emb: Column, dim: int, n_planes: int = N_PLANES) -> Column:
    """LSH bucket id: sign bits of dot(emb, hyperplane_j)."""
    key = F.lit(0)
    for j in range(n_planes):
        weights = F.array(*[F.lit(w) for w in _hyperplane(j, dim)])
        d = F.aggregate(
            F.zip_with(emb, weights, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        key = key + F.when(d > 0, F.lit(1 << j)).otherwise(0)
    return key


def band_keys(
    emb: Column, dim: int, n_tables: int = N_TABLES, bits: int = BAND_BITS
) -> Column:
    """Array of per-table hyperplane-LSH band keys (map-side, all-JVM).

    Each key is ``bits`` sign-bits of deterministic hyperplane dot
    products, so the whole construction is reproducible in the DuckDB
    oracle. Table t draws from its OWN fixed plane range
    (t*MAX_BAND_BITS + b), so a key at any ``bits`` ≤ MAX_BAND_BITS is
    the low-``bits`` mask of that table's full-width key — the oracle
    replays adaptive widths by masking. Blocking on (table, key)
    bounds candidate generation to ~n²·tables/2^bits per key-space
    instead of n² per attribute block."""
    if bits > MAX_BAND_BITS:
        raise ValueError(f"band bits {bits} > MAX_BAND_BITS {MAX_BAND_BITS}")
    keys = []
    for t in range(n_tables):
        key = F.lit(0)
        for b in range(bits):
            weights = F.array(
                *[F.lit(w) for w in _hyperplane(t * MAX_BAND_BITS + b, dim)]
            )
            d = F.aggregate(
                F.zip_with(emb, weights, lambda x, w: x.cast("double") * w),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            key = key + F.when(d > 0, F.lit(1 << b)).otherwise(0)
        keys.append(key)
    return F.array(*keys)


def band_keys_arrow(dim: int, n_tables: int = N_TABLES, bits: int = BAND_BITS):
    """Arrow-vectorized band_keys: numpy kernel inside a pandas_udf.

    BIT-IDENTICAL to the expression version (and to the DuckDB oracle):
    every product is exact in float64 (float32 mantissa ≤ 24 bits ×
    ≤ 4-bit integer weight), and ``cumsum`` accumulates strictly left
    to right — the same addition sequence as the JVM fold. The win is
    ~50× on the hot path: Spark's higher-order lambdas are interpreted
    per element (no codegen), so n_tables × bits separate folds cost
    minutes per million rows; one Arrow batch matmul costs milliseconds.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    if bits > MAX_BAND_BITS:
        raise ValueError(f"band bits {bits} > MAX_BAND_BITS {MAX_BAND_BITS}")
    planes = np.array(
        [
            [_hyperplane(t * MAX_BAND_BITS + b, dim) for b in range(bits)]
            for t in range(n_tables)
        ],
        dtype="f8",
    )  # (n_tables, bits, dim)
    pows = 1 << np.arange(bits)

    @pandas_udf("array<int>")
    def keys(col: pd.Series) -> pd.Series:
        vecs = np.stack([np.asarray(e, dtype="f8") for e in col])  # (n, dim)
        # Strict left-to-right accumulation over dim — element-wise
        # IDENTICAL to cumsum(axis=-1)[..., -1] over the (n,T,B,dim)
        # product tensor, but peak memory is (n,T,B) instead of
        # (n,T,B,dim): ~dim× smaller Arrow-batch footprint.
        dots = np.zeros((vecs.shape[0],) + planes.shape[:2])  # (n, T, B)
        for d in range(vecs.shape[1]):
            dots += vecs[:, None, None, d] * planes[None, :, :, d]
        k = ((dots > 0) * pows).sum(axis=-1).astype("i4")  # (n, T)
        return pd.Series(list(k))

    return keys


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact cosine top-k. queries: (q_id, q_emb); corpus: (vec_id,
    embedding). Excludes self-matches on id equality. Norms are
    precomputed per row (O(n), not O(pairs))."""
    c = corpus.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    q = queries.select("q_id", "q_emb", norm(F.col("q_emb")).alias("qn"))
    pairs = c.join(F.broadcast(q), c.vec_id != q.q_id).select(
        "q_id",
        "vec_id",
        (dot(F.col("q_emb"), F.col("embedding")) / (F.col("qn") * F.col("nrm"))).alias(
            "cos_raw"
        ),
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    return (
        pairs.select(
            "q_id",
            "vec_id",
            F.round("cos_raw", 4).alias("cos"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= k)
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    seed: int = 7,
    max_iter: int = 10,
) -> DataFrame:
    """Production coarse quantizer for IVF: a Spark ML KMeans fit over
    the embedding column. Returns (cent_id, c_emb, c_nrm) — the exact
    frame shape ``ivf_topk`` broadcasts, so the deterministic
    oracle-checkable subsample and the fitted quantizer are drop-in
    interchangeable.

    Scale shape: KMeans training is the standard Spark ML distributed
    Lloyd's iteration (broadcast centers, map-side assignment, one
    reduce per iteration); the result is n_cells rows on the driver —
    tiny by construction."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from ccog_spark.functions.vectors import norm

    train = corpus.select(
        array_to_vector(
            F.col("embedding").cast("array<double>")
        ).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(train)
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return (
        corpus.sparkSession.createDataFrame(
            rows, "cent_id int, c_emb array<double>"
        )
        .select("cent_id", "c_emb", norm(F.col("c_emb")).alias("c_nrm"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    cent_stride: int = 25,
    nprobe: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN top-k: coarse-quantize the corpus into cells, probe
    only the query's ``nprobe`` nearest cells (the third scale path next
    to exact/LSH — the classic inverted-file index, e.g. Jégou et al.,
    "Product Quantization for Nearest Neighbor Search", TPAMI 2011, §IV).

    Default centroids are the deterministic ``vec_id % cent_stride ==
    1`` subsample, so the whole construction is reproducible in the
    DuckDB oracle; pass ``centroids`` (e.g. from ``kmeans_centroids``,
    the Spark ML fit) for the production quantizer — everything
    downstream is unchanged.

    Scale shape: the centroid set (~corpus/stride, or a few k from
    k-means) is BROADCAST; assignment is a map-side argmax expressed as
    a partial-aggregable ``max(struct(cos, -cent_id))`` — no window
    over the n×c pair stream, so the only corpus shuffle is the
    vec_id-keyed agg+join. Probing touches nprobe/cells of the corpus
    per query instead of all of it.

    This pure-JVM spelling keeps the FLAT n×c assignment (it IS the
    O(N·C) shape when C ∝ N): it exists as the oracle-simplest IVF
    demonstration. The scale configuration is ivfpq_topk /
    ann_index, whose Arrow assign uses the √C two-hop
    hierarchical_assigner — or pass ``centroids=`` with bounded C,
    which makes the flat assign linear.
    """
    c = corpus.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    if centroids is None:
        centroids = c.where(F.col("vec_id") % cent_stride == 1).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("c_emb"),
            F.col("nrm").alias("c_nrm"),
        )
    cents = F.broadcast(centroids)
    # assignment: argmax cosine, smallest cent_id on ties — the
    # lexicographic max of (cos, -cent_id) is map-side combinable.
    # The row's own (embedding, nrm) ride the SAME aggregate via
    # first(): every broadcast-crossJoin replica of a vec_id carries
    # identical values, so first() is value-deterministic, and the
    # assigned frame needs NO corpus self-join on vec_id (round 17 —
    # the previous agg + join shape exchanged the corpus TWICE, once
    # per join side, then merged; now ONE vec_id exchange out of the
    # partial aggregate).
    assigned = (
        c.crossJoin(cents)
        .select(
            "vec_id",
            "embedding",
            "nrm",
            F.struct(
                (dot(F.col("embedding"), F.col("c_emb")) / (F.col("nrm") * F.col("c_nrm"))).alias("cos"),
                (-F.col("cent_id")).alias("neg_id"),
            ).alias("sc"),
        )
        .groupBy("vec_id")
        .agg(
            F.max("sc").alias("sc"),
            F.first("embedding").alias("embedding"),
            F.first("nrm").alias("nrm"),
        )
        .select(
            "vec_id", "embedding", "nrm",
            (-F.col("sc.neg_id")).alias("cell"),
        )
    )
    q = queries.select("q_id", "q_emb", norm(F.col("q_emb")).alias("qn"))
    pw = W.partitionBy("q_id").orderBy(
        F.col("p_cos").desc(), F.col("cent_id")
    )
    probes = (
        q.crossJoin(cents)
        .select(
            "q_id",
            "q_emb",
            "qn",
            "cent_id",
            (dot(F.col("q_emb"), F.col("c_emb")) / (F.col("qn") * F.col("c_nrm"))).alias("p_cos"),
        )
        .select("q_id", "q_emb", "qn", F.col("cent_id").alias("cell"), F.row_number().over(pw).alias("prn"))
        .where(F.col("prn") <= nprobe)
    )
    pairs = assigned.join(F.broadcast(probes), "cell").where(
        F.col("vec_id") != F.col("q_id")
    ).select(
        "q_id",
        "vec_id",
        (dot(F.col("q_emb"), F.col("embedding")) / (F.col("qn") * F.col("nrm"))).alias("cos_raw"),
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    return (
        pairs.select(
            "q_id",
            "vec_id",
            F.round("cos_raw", 4).alias("cos"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= k)
    )


def sq8_stats(corpus: DataFrame, dim: int) -> tuple[list, list]:
    """Per-dimension (min, range) over the corpus — the SQ8 training
    pass: ONE partial-aggregable aggregate (2·dim scalar min/max
    expressions), 2·dim doubles to the driver. Element values are cast
    to DOUBLE before aggregation so the stats are bit-identical to an
    oracle computing over CAST(embedding AS DOUBLE[])."""
    row = corpus.agg(
        *[
            F.min(
                F.element_at(F.col("embedding"), d + 1).cast("double")
            ).alias(f"mn{d}")
            for d in range(dim)
        ],
        *[
            F.max(
                F.element_at(F.col("embedding"), d + 1).cast("double")
            ).alias(f"mx{d}")
            for d in range(dim)
        ],
    ).collect()[0]
    mins = [float(row[f"mn{d}"]) for d in range(dim)]
    rngs = [float(row[f"mx{d}"]) - mins[d] for d in range(dim)]
    return mins, rngs


def ivfsq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 3,
    cent_stride: int = 25,
    nprobe: int = 2,
) -> DataFrame:
    """IVF + 8-bit SCALAR quantization ANN top-k (the FAISS
    ``IndexIVFScalarQuantizer``/SQ8 recipe, without residual encoding
    so the DuckDB oracle replays it exactly): the storage/accuracy
    point BETWEEN raw floats (ivf_topk: 4·dim bytes/vector, exact
    in-cell distances) and PQ (ivfpq_topk: 8 bytes/vector, coarse ADC)
    — SQ8 stores dim bytes/vector (4× smaller than float32) and its
    asymmetric distances are near-exact, the standard choice when PQ
    recall is too low but raw vectors don't fit.

    Quantization is per-dimension uniform over the corpus min/max
    (``sq8_stats``): code_d = clamp(floor((x_d − min_d)·255/range_d),
    0..255) — the lower clamp is a no-op when stats come from the
    same corpus (x ≥ min always) and exists for the persisted index's
    frozen-stats appends, where a delta value below the trained min
    must saturate at code 0 like any real scalar quantizer; search
    reconstructs x̂_d = min_d + (code_d + 0.5)·
    range_d/256 and ranks probed-cell candidates by cosine(q, x̂) —
    queries stay unquantized (asymmetric distance). Coarse cells,
    probing, and ties are EXACTLY ivf_topk's (deterministic
    ``vec_id % cent_stride == 1`` centroids, argmax assignment in the
    ORIGINAL space, nprobe cells per query, vec_id tiebreaks), so the
    only semantic delta vs ann_ivf is the reconstructed values — the
    oracle replays min/range per dim, the code, and the
    reconstruction in SQL with the list rebuilt in dimension order
    (order-stable float sums, the repo float rule).

    Scale shape: stats are one map-side-combinable pass; codes are a
    map-side transform (at 100 TB they persist next to the IVF cell
    layout exactly like ann_index's PQ codes — dim bytes/vector
    scanned instead of 4·dim); everything downstream is the
    broadcast-probe join of ivf_topk, nprobe/cells of the corpus per
    query."""
    mins, rngs = sq8_stats(corpus, dim)
    mins_arr = F.array(*[F.lit(m) for m in mins])
    rng_arr = F.array(*[F.lit(r) for r in rngs])
    codes = F.transform(
        F.col("embedding"),
        lambda x, i: (
            F.when(
                F.element_at(rng_arr, i + F.lit(1)) > 0,
                F.least(
                    F.lit(255).cast("bigint"),
                    F.greatest(
                        F.lit(0).cast("bigint"),
                        F.floor(
                            (
                                x.cast("double")
                                - F.element_at(mins_arr, i + F.lit(1))
                            )
                            * 255.0
                            / F.element_at(rng_arr, i + F.lit(1))
                        ),
                    ),
                ),
            )
            .otherwise(F.lit(0))
            .cast("int")
        ),
    )
    xhat = F.transform(
        F.col("codes"),
        lambda c, i: (
            F.element_at(mins_arr, i + F.lit(1))
            + (c.cast("double") + 0.5)
            * F.element_at(rng_arr, i + F.lit(1))
            / 256.0
        ),
    )
    c = corpus.select(
        "vec_id",
        "embedding",
        norm(F.col("embedding")).alias("nrm"),
        codes.alias("codes"),
    ).select(
        "vec_id", "embedding", "nrm", xhat.alias("xe")
    ).select(
        "vec_id", "embedding", "nrm", "xe", norm(F.col("xe")).alias("xn")
    )
    centroids = c.where(F.col("vec_id") % cent_stride == 1).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    cents = F.broadcast(centroids)
    # argmax in the ORIGINAL space, with the row's reconstructed
    # (xe, xn) riding the aggregate via first() (identical across a
    # vec_id's broadcast replicas) — no corpus self-join on vec_id
    # (round 17, same rewrite as ivf_topk: two corpus exchanges + a
    # join collapse into one partial-aggregate exchange)
    assigned = (
        c.crossJoin(cents)
        .select(
            "vec_id",
            "xe",
            "xn",
            F.struct(
                (
                    dot(F.col("embedding"), F.col("c_emb"))
                    / (F.col("nrm") * F.col("c_nrm"))
                ).alias("cos"),
                (-F.col("cent_id")).alias("neg_id"),
            ).alias("sc"),
        )
        .groupBy("vec_id")
        .agg(
            F.max("sc").alias("sc"),
            F.first("xe").alias("xe"),
            F.first("xn").alias("xn"),
        )
        .select(
            "vec_id", "xe", "xn", (-F.col("sc.neg_id")).alias("cell")
        )
    )
    q = queries.select("q_id", "q_emb", norm(F.col("q_emb")).alias("qn"))
    pw = W.partitionBy("q_id").orderBy(F.col("p_cos").desc(), F.col("cent_id"))
    probes = (
        q.crossJoin(cents)
        .select(
            "q_id",
            "q_emb",
            "qn",
            "cent_id",
            (
                dot(F.col("q_emb"), F.col("c_emb"))
                / (F.col("qn") * F.col("c_nrm"))
            ).alias("p_cos"),
        )
        .select(
            "q_id",
            "q_emb",
            "qn",
            F.col("cent_id").alias("cell"),
            F.row_number().over(pw).alias("prn"),
        )
        .where(F.col("prn") <= nprobe)
    )
    pairs = (
        assigned.join(F.broadcast(probes), "cell")
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            (
                dot(F.col("q_emb"), F.col("xe")) / (F.col("qn") * F.col("xn"))
            ).alias("cos_raw"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    return (
        pairs.select(
            "q_id",
            "vec_id",
            F.round("cos_raw", 4).alias("cos"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= k)
    )


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, dim: int, k: int = 3
) -> DataFrame:
    """ANN top-k within the query's LSH bucket (scale path).

    The bucket key is computed with the Arrow kernel (table 0 of
    band_keys_arrow uses hyperplanes 0..N_PLANES-1 — the same planes as
    bucket_key, bit-identically; see band_keys_arrow)."""
    bkt_udf = band_keys_arrow(dim, n_tables=1, bits=N_PLANES)
    # coalesce: the bucket join key must be statically non-nullable or
    # the inner join pushes isnotnull(bkt) below the projection, and a
    # UDF-output filter materializes as a SECOND full-corpus Arrow
    # pass (same planner trap as ivfpq_topk's cell key)
    c = corpus.select(
        "vec_id",
        "embedding",
        norm(F.col("embedding")).alias("nrm"),
        F.coalesce(
            F.element_at(bkt_udf(F.col("embedding")), 1), F.lit(-1)
        ).alias("bkt"),
    )
    q = queries.select(
        "q_id",
        "q_emb",
        norm(F.col("q_emb")).alias("qn"),
        F.coalesce(
            F.element_at(bkt_udf(F.col("q_emb")), 1), F.lit(-1)
        ).alias("bkt"),
    )
    pairs = c.join(F.broadcast(q), "bkt").where(
        F.col("vec_id") != F.col("q_id")
    ).select(
        "q_id",
        "vec_id",
        (dot(F.col("q_emb"), F.col("embedding")) / (F.col("qn") * F.col("nrm"))).alias(
            "cos_raw"
        ),
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    return (
        pairs.select(
            "q_id",
            "vec_id",
            F.round("cos_raw", 4).alias("cos"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= k)
    )


# ------------------------------------------------ product quantization

# PQ codebook: deterministic corpus subsample (vec_id % PQ_CB_MOD ==
# PQ_CB_RES, first PQ_CB_K by vec_id) so the whole construction —
# codebook, per-block encodes, ADC lookups — replays exactly in the
# DuckDB oracle. Production would train per-block k-means codebooks
# (kmeans_centroids is the quantizer hook); everything downstream is
# codebook-agnostic.
PQ_M_BLOCKS = 8
PQ_CB_MOD = 31
PQ_CB_RES = 5
PQ_CB_K = 16

# Trained codebooks (round 17, VERDICT r16 #4): Lloyd iterations per
# block over a larger deterministic sample — FAISS IndexIVFPQ's
# training step, made ORACLE-EXACT by running k-means in a fixed-point
# integer domain. Training points quantize as floor(x·2^20 + 0.5)
# (both engines compute the identical double product and floor), all
# distances are sums of integer-valued doubles < 2^53 (exact in IEEE
# binary64, any summation order), and centroid updates are
# floor(Σ/n) — so numpy and the DuckDB recursive CTE produce
# bit-identical codebooks, and the final codewords c/2^20 are exactly
# representable doubles (power-of-two divisor). PQ_TRAIN_N caps the
# driver-side training collect (TakeOrderedAndProject-bounded).
PQ_TRAIN_N = 128
PQ_LLOYD_ITERS = 4
PQ_QSCALE = 1 << 20


def lloyd_train_int(
    qx: "np.ndarray", k: int, m_blocks: int, iters: int
) -> "np.ndarray":
    """Per-block Lloyd's k-means in the integer domain: ``qx`` is
    (n, dim) of integer-valued float64 training points (already
    quantized); init codewords are the first ``k`` rows; each
    iteration assigns every point's block slice to the argmin-L2
    codeword (ties → smallest j: numpy first-occurrence argmin ≡ the
    oracle's min struct(d, j)) and replaces assigned codeword blocks
    with the elementwise floor-mean; empty codewords keep their
    previous block. Returns the (k, dim) integer-valued codebook —
    blocks trained independently, concatenated row-wise so the
    downstream slice-based PQ machinery is unchanged."""
    import numpy as np

    n, dim = qx.shape
    d_sub = dim // m_blocks
    cb = qx[: min(k, n)].copy()
    for _ in range(iters):
        new = cb.copy()
        for m in range(m_blocks):
            lo = m * d_sub
            xm = qx[:, lo : lo + d_sub]
            cm = cb[:, lo : lo + d_sub]
            d2 = ((xm[:, None, :] - cm[None, :, :]) ** 2).sum(2)
            a = d2.argmin(1)
            for j in range(len(cb)):
                sel = xm[a == j]
                if len(sel):
                    new[j, lo : lo + d_sub] = np.floor(
                        sel.sum(0) / len(sel)
                    )
        cb = new
    return cb


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 3,
    m_blocks: int = PQ_M_BLOCKS,
) -> DataFrame:
    """Product-quantization ANN top-k (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): split each
    vector into ``m_blocks`` subvectors, encode every corpus vector as
    the per-block argmin-L2 codebook index, then rank candidates by
    asymmetric distance (ADC) — the sum of per-block query-to-codeword
    distances looked up from a tiny per-query table.

    THE memory lever for 100 TB ANN: the scan state per corpus vector
    is m_blocks small ints (8 bytes here) instead of dim floats (256+
    bytes) — a 32× compression — and the scan stays map-side: the
    codebook and per-query LUTs are broadcast, corpus rows meet them
    in place, and only k rows per query cross the final exchange.
    Encode is a pure MAP stage: an Arrow kernel with the (tiny)
    codebook in its closure computes all per-block argmins vectorized
    — no corpus shuffle anywhere before the final per-query top-k.
    Ties → smallest codeword id (np.argmin first-occurrence, mirrored
    by the oracle's min(struct(d2, j))).

    Float-parity note: the kernel evaluates d2 with numpy matmul while
    the DuckDB oracle uses sequential list_dot_product — values agree
    to ~1e-15 relative, so the argmin can only diverge on near-exact
    d2 ties between DIFFERENT codewords, which random embeddings do
    not produce (exact duplicates quantize identically in both). The
    sf0.001/sf0.01 hash gates check this empirically every run.
    """
    encode, adc_kernel, qdf = _pq_machinery(corpus, queries, dim, m_blocks)
    codes = corpus.select("vec_id", encode(F.col("embedding")).alias("codes"))
    pairs = (
        codes.crossJoin(F.broadcast(qdf))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            adc_kernel(F.col("q_id"), F.col("codes")).alias("adc_raw"),
        )
    )
    return _rank_adc(pairs, k)


def _rank_adc(pairs: DataFrame, k: int) -> DataFrame:
    w = W.partitionBy("q_id").orderBy(F.col("adc_raw").asc(), F.col("vec_id"))
    return (
        pairs.select(
            "q_id",
            "vec_id",
            F.round("adc_raw", 4).alias("adc"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= k)
    )


def _codebook_mat(corpus: DataFrame):
    """Driver-side PQ codebook matrix from the deterministic corpus
    subsample. The sort+limit stays DISTRIBUTED
    (TakeOrderedAndProject) so the collect is bounded at PQ_CB_K
    rows — collecting the raw %-subsample would scale linearly with
    the corpus (~1/31 of 1e9 rows at the design point; round-6
    review finding)."""
    import numpy as np

    cb_rows = (
        corpus.where(F.col("vec_id") % PQ_CB_MOD == PQ_CB_RES)
        .orderBy("vec_id")
        .limit(PQ_CB_K)
        .select("embedding")
        .collect()
    )
    return np.array([[float(x) for x in r.embedding] for r in cb_rows], "f8")


def _pq_machinery(
    corpus: DataFrame | None,
    queries: DataFrame,
    dim: int,
    m_blocks: int,
    cbmat=None,
):
    """Shared PQ plumbing for pq_topk / ivfpq_topk / the persisted
    index: the encode kernel (map-side Arrow, codebook in closure —
    callers place it in their own projection so it can fuse with
    sibling kernels in one ArrowEvalPython pass), the ADC lookup
    kernel over (q_id, codes) rows, and the bare q_id frame.

    ``cbmat``: precomputed codebook matrix (loaded from a persisted
    index) — skips the corpus collect, and the LUT construction is
    bit-identical because the cb frame is rebuilt from the same
    doubles either way."""
    dsub = dim // m_blocks
    blocks = range(m_blocks)
    import numpy as np

    def slc(col: Column, m: int) -> Column:
        return F.slice(col, m * dsub + 1, dsub)

    if cbmat is None:
        cbmat = _codebook_mat(corpus)
    spark = queries.sparkSession
    cb = spark.createDataFrame(
        [(j, list(map(float, row))) for j, row in enumerate(cbmat)],
        "j int, ce array<double>",
    )
    # materialize slices/self-dots as columns BEFORE multi-reference
    # (Catalyst does no CSE inside expression trees)
    cbp = cb.select(
        "j",
        *[slc(F.col("ce"), m).alias(f"c{m}") for m in blocks],
        *[dot(slc(F.col("ce"), m), slc(F.col("ce"), m)).alias(f"cc{m}") for m in blocks],
    )

    from pyspark.sql.functions import pandas_udf

    n_blocks, d_sub = m_blocks, dsub

    @pandas_udf("array<int>")
    def encode(col: pd.Series) -> pd.Series:
        x = np.stack([np.asarray(e, dtype="f8") for e in col])  # (n, dim)
        n = x.shape[0]
        out = np.empty((n, n_blocks), dtype="i4")
        for m in range(n_blocks):
            xm = x[:, m * d_sub : (m + 1) * d_sub]  # (n, dsub)
            cm = cbmat[:, m * d_sub : (m + 1) * d_sub]  # (K, dsub)
            d2 = (
                (xm * xm).sum(1)[:, None]
                - 2.0 * (xm @ cm.T)
                + (cm * cm).sum(1)[None, :]
            )  # (n, K)
            out[:, m] = d2.argmin(1)  # first occurrence = smallest j
        return pd.Series(list(out))

    qp = queries.select(
        F.col("q_id"),
        *[slc(F.col("q_emb"), m).alias(f"q{m}") for m in blocks],
        *[
            dot(slc(F.col("q_emb"), m), slc(F.col("q_emb"), m)).alias(f"qq{m}")
            for m in blocks
        ],
    )
    lut_pairs = qp.crossJoin(F.broadcast(cbp)).select(
        "q_id",
        "j",
        *[
            (
                F.col(f"qq{m}")
                - 2 * dot(F.col(f"q{m}"), F.col(f"c{m}"))
                + F.col(f"cc{m}")
            ).alias(f"l{m}")
            for m in blocks
        ],
    )
    # ADC scan: collect the flat (q_id, j, l0..l7) LUT rows
    # (index-sized: n_queries × K rows — the broadcast-queries
    # contract) and assemble the (nq, M, K) matrix on the driver; the
    # kernel then looks codes up over SKINNY (q_id, codes) pair rows.
    # Joining LUT arrays into the pair stream instead would copy M×K
    # doubles into every pair row (corpus × queries × 128 doubles of
    # churn). The LUT values are the JVM-computed ones (collected, not
    # recomputed — oracle float parity), and the kernel accumulates
    # blocks left-to-right exactly like the oracle's chained `+`, so
    # ADC stays bit-identical to the SQL spelling.
    lut_rows = lut_pairs.collect()
    qidx: dict[int, int] = {}
    for r in lut_rows:
        qidx.setdefault(int(r.q_id), len(qidx))
    K = 1 + max(r.j for r in lut_rows)
    lutmat = np.zeros((len(qidx), m_blocks, K), "f8")
    for r in lut_rows:
        qi = qidx[int(r.q_id)]
        for m in blocks:
            lutmat[qi, m, r.j] = r[f"l{m}"]

    @pandas_udf("double")
    def adc_kernel(qid: pd.Series, codes: pd.Series) -> pd.Series:
        qi = qid.map(qidx).to_numpy()
        cm = np.stack([np.asarray(c, dtype="i4") for c in codes])  # (n, M)
        acc = lutmat[qi, 0, cm[:, 0]]
        for m in range(1, n_blocks):
            acc = acc + lutmat[qi, m, cm[:, m]]
        return pd.Series(acc)

    qdf = spark.createDataFrame([(int(q),) for q in qidx], "q_id bigint")
    return encode, adc_kernel, qdf


# Row-block size for the centroid→coarse assignment GEMM inside
# hierarchical_assigner: peak driver temporary is 8192·⌈√C⌉ float64s
# (~64 MB at C = 10⁶) regardless of C. Chunking is bit-identical to
# the one-shot product (argmax is per-row).
_CMAP_BLOCK = 8192


def hierarchical_assigner(cent_ids, cmat, cnrm, coarse_stride: int | None = None):
    """Driver-side √C two-hop assigner over a centroid array — THE
    fix for the O(N·C) flat-argmax wall when #centroids ∝ N (the
    stride-quantizer default): with C centroids, every
    ``⌈C/⌈√C⌉⌉``-th centroid BY RANK forms a ⌈√C⌉-cell coarse level,
    each centroid maps once to its nearest coarse centroid
    (O(C^1.5), driver-side, centroid-sized), and a batch assign is
    hop-1 over ⌈√C⌉ coarse cells then hop-2 over that cell's ~√C
    members — O(√C) per vector instead of O(C). Every hop is a
    deterministic argmax with first-occurrence (smallest-id)
    tie-break over id-ascending arrays, and the stride rule is pure
    integer arithmetic (isqrt), so DuckDB oracles replay the full
    two-hop assignment bit-for-bit (the crk/cst/coarse/cmap/hop1
    CTE chain). An explicit ``coarse_stride`` pins the rank stride
    (stride ≥ C ⇒ one coarse cell ⇒ exactly the flat assign).

    The centroid→coarse map is computed in row blocks of
    ``_CMAP_BLOCK`` centroids (argmax per block is independent, so
    the result is bit-identical to the one-shot GEMM), bounding the
    driver's peak temporary at O(block·√C) floats — ~64 MB at
    C = 10⁶ — instead of O(C·√C) (~8 GB at the same C).

    Returns ``assign_batch(x, xn) -> np.ndarray[cent_id]`` for a
    (n, dim) float64 matrix and its (n,) norms. Shared by
    dedup.semantic_dedup, ivfpq_topk, and ann_index's fused
    assign+encode (the hierarchy is a pure function of the centroid
    array, so frozen-model append replays it identically from the
    saved centroid table)."""
    import math

    import numpy as np

    C = len(cent_ids)
    if C == 0:
        raise ValueError(
            "hierarchical_assigner: no centroids (cent_ids is empty — "
            "the stride/filter selection matched no rows)"
        )
    if coarse_stride is not None:
        stride = coarse_stride
    else:
        n_coarse = math.isqrt(C - 1) + 1
        stride = -(-C // n_coarse)
    ci = np.arange(0, C, stride)
    ccm, ccn = cmat[ci], cnrm[ci]
    # centroid → nearest coarse, first-occurrence (smallest coarse
    # cent_id) tie-break; members stay cent_id-ascending so the
    # hop-2 argmax keeps the smallest-cent_id tie-break. Blockwise:
    # per-row argmax is independent, so chunking the GEMM is
    # bit-identical while capping driver peak memory at
    # O(_CMAP_BLOCK·√C) instead of O(C·√C).
    cmap = np.empty(C, "i8")
    for s in range(0, C, _CMAP_BLOCK):
        e = min(s + _CMAP_BLOCK, C)
        cc = (cmat[s:e] @ ccm.T) / (cnrm[s:e, None] * ccn[None, :])
        cmap[s:e] = cc.argmax(1)
    members = [np.where(cmap == j)[0] for j in range(len(ci))]

    def assign_batch(x, xn):
        h1 = ((x @ ccm.T) / (xn[:, None] * ccn[None, :])).argmax(1)
        out = np.empty(len(x), "i8")
        for j in np.unique(h1):
            sel = h1 == j
            mem = members[j]
            if len(mem) == 0:  # orphan coarse cell (duplicate-vector
                mem = np.arange(C)  # tie): exact full-scan fallback
            sub = (x[sel] @ cmat[mem].T) / (
                xn[sel][:, None] * cnrm[mem][None, :]
            )
            out[sel] = cent_ids[mem[sub.argmax(1)]]
        return out

    return assign_batch


def _ivf_centroid_arrays(corpus: DataFrame, cent_stride: int):
    """Driver-side (cent_ids, cmat, cnrm) for the IVF coarse quantizer
    — deterministic stride selection, ids ascending so the assignment
    kernel's first-occurrence argmax matches the oracle's smallest-
    cent_id tie-break. Index-sized collect (|corpus| / cent_stride
    rows; production deployments cap it via kmeans_centroids)."""
    import numpy as np

    c = corpus.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    centroids = c.where(F.col("vec_id") % cent_stride == 1).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    cent_rows = sorted(centroids.collect(), key=lambda r: r.cent_id)
    cent_ids = np.array([r.cent_id for r in cent_rows], "i8")
    cmat = np.array([[float(x) for x in r.c_emb] for r in cent_rows], "f8")
    cnrm = np.array([r.c_nrm for r in cent_rows], "f8")
    return cent_ids, cmat, cnrm


def _ivf_centroid_and_codebook_arrays(corpus: DataFrame, cent_stride: int):
    """(cent_ids, cmat, cnrm, cbmat) in ONE collect action (round 17):
    the IVF+PQ composition previously ran two driver jobs over the
    corpus — the centroid collect and the codebook-subsample collect —
    before any query plan executed. The two subqueries union under a
    tag and collect together; the driver re-sorts each side by id, so
    every value is byte-identical to the separate collects (the
    codebook branch's ORDER BY vec_id LIMIT k subtree computes the
    same row SET; only the transport order changes, and the sort
    restores it). One driver action = one scheduling round trip
    locally and one corpus pass at scale instead of two."""
    import numpy as np

    c = corpus.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    cent = c.where(F.col("vec_id") % cent_stride == 1).select(
        F.lit("c").alias("_t"), "vec_id", "embedding", "nrm"
    )
    cb = (
        corpus.where(F.col("vec_id") % PQ_CB_MOD == PQ_CB_RES)
        .orderBy("vec_id")
        .limit(PQ_CB_K)
        .select(
            F.lit("b").alias("_t"),
            "vec_id",
            "embedding",
            F.lit(0.0).alias("nrm"),
        )
    )
    rows = cent.unionByName(cb).collect()
    cent_rows = sorted(
        (r for r in rows if r._t == "c"), key=lambda r: r.vec_id
    )
    cb_rows = sorted((r for r in rows if r._t == "b"), key=lambda r: r.vec_id)
    cent_ids = np.array([r.vec_id for r in cent_rows], "i8")
    cmat = np.array([[float(x) for x in r.embedding] for r in cent_rows], "f8")
    cnrm = np.array([r.nrm for r in cent_rows], "f8")
    cbmat = np.array([[float(x) for x in r.embedding] for r in cb_rows], "f8")
    return cent_ids, cmat, cnrm, cbmat


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 3,
    cent_stride: int = 25,
    nprobe: int = 2,
    m_blocks: int = PQ_M_BLOCKS,
) -> DataFrame:
    """IVF + PQ composed — the production 100 TB ANN configuration
    (Jégou et al. §IV joined with §III): the coarse quantizer prunes
    the scan to ``nprobe`` cells per query, and within those cells
    candidates are ranked by PQ asymmetric distance over 8-byte codes.
    Both halves reuse the deterministic constructions of ivf_topk and
    pq_topk, so the whole composition replays in the DuckDB oracle.

    Scale shape: cell assignment and PQ encode are both map-side
    (broadcast centroids / closure codebook); the candidate stream is
    |cells probed| / |cells| of the corpus instead of all of it, each
    candidate contributing only (vec_id, cell, 8 codes); k rows per
    query cross the final exchange."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    # one driver action for both constant arrays (round 17) — was two
    # separate corpus-scanning collects (centroids, then the PQ
    # codebook subsample inside _pq_machinery)
    cent_ids, cmat, cnrm, cbmat = _ivf_centroid_and_codebook_arrays(
        corpus, cent_stride
    )
    # Rebuild the centroid frame from the collected rows (bit-identical
    # values — every element round-trips exactly through the f8 matrix)
    # instead of reusing the filtered-corpus frame. Two wins: the
    # probes branch stops rescanning the corpus for centroid selection,
    # and — the important one — the `vec_id % stride == 1` constraint
    # no longer rides on the frame, so InferFiltersFromConstraints
    # cannot propagate `(cell % stride) = 1` through the probe join
    # onto the corpus side, which materialized as a SECOND full-corpus
    # ArrowEvalPython assign pass just to evaluate an inferred filter
    # the join already implies (observed in the sf0.1 plan).
    centroids = corpus.sparkSession.createDataFrame(
        [
            (int(i), [float(x) for x in row], float(n))
            for i, row, n in zip(cent_ids, cmat, cnrm)
        ],
        # array<double>, NOT float: a double-embedding corpus must not
        # lose centroid precision here (float32 inputs are unaffected
        # — they promote exactly). Keeps probe cosines bit-identical
        # to the persisted-index path (ann_index stores doubles too).
        "cent_id long, c_emb array<double>, c_nrm double",
    )

    # √C two-hop assign (round 10): with stride-selected centroids
    # C ∝ N, so the flat argmax was O(N·C) = O(N²/stride) — measured
    # 58.7 s at the 100× probe, the same wall semantic_dedup hit.
    # The hierarchy is a pure function of the centroid array and
    # replays in the oracle's crk/cst/coarse/cmap/hop1 CTE chain.
    assign_batch = hierarchical_assigner(cent_ids, cmat, cnrm)

    @pandas_udf("long")
    def assign(col: pd.Series) -> pd.Series:
        x = np.stack([np.asarray(e, dtype="f8") for e in col])
        return pd.Series(assign_batch(x, np.sqrt((x * x).sum(1))))

    cents = F.broadcast(centroids)
    q = queries.select("q_id", "q_emb", norm(F.col("q_emb")).alias("qn"))
    pw = W.partitionBy("q_id").orderBy(F.col("p_cos").desc(), F.col("cent_id"))
    probes = (
        q.crossJoin(cents)
        .select(
            "q_id",
            "cent_id",
            (
                dot(F.col("q_emb"), F.col("c_emb"))
                / (F.col("qn") * F.col("c_nrm"))
            ).alias("p_cos"),
        )
        .select(
            "q_id",
            F.col("cent_id").alias("cell"),
            F.row_number().over(pw).alias("prn"),
        )
        .where(F.col("prn") <= nprobe)
        .select("q_id", "cell")
    )
    encode, adc_kernel, _qdf = _pq_machinery(
        corpus, queries, dim, m_blocks, cbmat=cbmat
    )
    # FUSED map stage: cell assignment AND PQ encode evaluate in the
    # SAME ArrowEvalPython pass over each corpus batch — one scan, one
    # Python crossing, and no vec_id shuffle join between two derived
    # frames (the previous spelling scanned the corpus twice and
    # exchanged both sides to co-locate codes with cells).
    # coalesce makes the join key statically non-nullable: without it
    # the inner probe join pushes an isnotnull(cell) predicate BELOW
    # this projection, and because cell is a UDF output that pushed
    # filter materializes as its own full-corpus ArrowEvalPython pass
    # (assign evaluated twice — observed in the sf0.1 plan). The
    # sentinel branch is genuinely dead, not merely assumed: a null
    # or malformed embedding makes np.stack raise inside the kernel
    # (fail-loudly, pytest-pinned), so no row can reach the join with
    # cell = -1 and probes never emit -1 (cent ids are corpus ids).
    enc = corpus.select(
        "vec_id",
        F.coalesce(assign(F.col("embedding")), F.lit(-1)).alias("cell"),
        encode(F.col("embedding")).alias("codes"),
    )
    cand = (
        enc.join(F.broadcast(probes), "cell")
        .where(F.col("vec_id") != F.col("q_id"))
    )
    pairs = cand.select(
        "q_id",
        "vec_id",
        adc_kernel(F.col("q_id"), F.col("codes")).alias("adc_raw"),
    )
    return _rank_adc(pairs, k)


def ivfpq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 3,
    m: int = 10,
    cent_stride: int = 25,
    nprobe: int = 2,
    m_blocks: int = PQ_M_BLOCKS,
) -> DataFrame:
    """Two-stage retrieval: compressed-domain IVF+PQ selects ``m``
    candidates per query, then ONLY those |Q|·m rows are re-ranked by
    EXACT cosine against the original embeddings (Jégou et al. §V's
    re-ranking stage — the shape every production IVF+PQ deployment
    runs, because ADC distances carry quantization error that exact
    re-ranking removes for the final k).

    Scale shape: stage 1 reads 8-byte codes (ivfpq_topk's contract);
    stage 2 joins the query-batch-sized candidate set (|Q|·m rows —
    BROADCAST side) back to the embeddings scan, so the exact cosine
    touches |Q|·m embedding rows, never a second corpus pass; k rows
    per query cross the final exchange. The candidate CUT at rank m is
    deterministic in both engines (ADC ties break on vec_id), so the
    re-rank input set — and therefore the output — replays exactly in
    the DuckDB oracle.

    Returns (q_id, vec_id, cos, rn): the exact cosine and the exact
    rank, directly comparable to brute_force_topk on the same queries
    (recall@k against it is pinned in tests)."""
    if m < k:
        raise ValueError(
            f"rerank candidate pool m={m} must be >= k={k} "
            "(stage 2 can only reorder what stage 1 supplies)"
        )
    cands = ivfpq_topk(
        corpus, queries, dim, k=m, cent_stride=cent_stride,
        nprobe=nprobe, m_blocks=m_blocks,
    ).select("q_id", "vec_id")
    return exact_rerank(corpus, queries, cands, k)


def exact_rerank(
    corpus: DataFrame, queries: DataFrame, cands: DataFrame, k: int
) -> DataFrame:
    """Exact-cosine re-rank of a (q_id, vec_id) candidate frame against
    the original embeddings — the stage shared by the inline
    (ivfpq_rerank_topk) and persisted-index (ann_index.query + rerank)
    paths, so the two stay bit-identical by construction. ``cands`` is
    query-batch-sized (top-m per query) and BROADCASTS into the corpus
    scan; k rows per query cross the final exchange."""
    c = corpus.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    q = queries.select("q_id", "q_emb", norm(F.col("q_emb")).alias("qn"))
    exact = (
        c.join(F.broadcast(cands), "vec_id")
        .join(F.broadcast(q), "q_id")
        .select(
            "q_id",
            "vec_id",
            (
                dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("qn") * F.col("nrm"))
            ).alias("cos_raw"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    return (
        exact.select(
            "q_id",
            "vec_id",
            F.round("cos_raw", 4).alias("cos"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= k)
    )
