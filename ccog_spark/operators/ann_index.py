"""Persisted IVF+PQ ANN index: build once, query many.

``ivfpq_topk`` (operators/similarity.py) derives centroids, codebook,
and 8-byte codes inline on every call — right for one-shot corpus
rows, wrong for production retrieval where the corpus is static and
query batches arrive forever. This module splits the pipeline at the
natural parquet seam:

- ``build_ivfpq_index``: ONE corpus pass (the same fused
  assign+encode Arrow stage as ivfpq_topk) writes four parquet
  tables under ``index_dir``:
    codes/      (vec_id, cell, codes array<int>)   — corpus-sized, the
                only big table; CLUSTERED BY CELL (round 11): rows
                land in ``grp=<g>`` partition directories, where
                grp = centroid_rank · n_groups // C is a pure
                function of the SAVED sorted centroid ids (no
                range-sampling shuffle, so build never re-runs the
                encode kernels, and append re-derives the identical
                map from the frozen model). Files are sorted by
                (cell, vec_id) within each directory, so a probe
                query reads ≤ nprobe directories (exact partition
                pruning on grp) and within them only the row groups
                whose cell min/max intersect the probed cells
                (parquet stats pruning) — nprobe/n_groups of the
                corpus instead of all of it
    centroids/  (cent_id, c_emb array<double>, c_nrm) — index-sized
    codebook/   (j, ce array<double>)                — PQ_CB_K rows
    meta/       (dim, m_blocks, cent_stride, n_vectors) — 1 row
- ``query_ivfpq_index``: reads the model tables (driver-side,
  index-sized), broadcasts per-query LUTs, joins the probe cells
  against the CODES table only — the raw embeddings are never read
  again, which is the point of PQ (8 bytes/vector resident).
- ``append_to_index`` (round 8): encode a corpus delta with the SAVED
  model (no retrain) and append to codes/ — the production growth
  path; returns an occupancy-skew staleness signal (see its
  docstring for the drift contract).

Query results are BIT-IDENTICAL to ``ivfpq_topk`` on the same corpus
(asserted in tests): the codebook/centroid doubles round-trip exactly
through parquet, and the LUT/ADC/rank machinery is the same code
(_pq_machinery with the loaded codebook).
"""

from __future__ import annotations

import os

# module scope: @pandas_udf resolves 'pd.Series' hints against module
# globals under `from __future__ import annotations` (UNSUPPORTED_
# SIGNATURE otherwise — repo-wide rule for kernel modules)
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ccog_spark.operators import index_common as ic
from ccog_spark.operators.similarity import (
    PQ_M_BLOCKS,
    _codebook_mat,
    _ivf_centroid_arrays,
    _pq_machinery,
    _rank_adc,
    dot,
    norm,
)


def _code_frame(
    corpus: DataFrame,
    cent_ids: "np.ndarray",
    cmat: "np.ndarray",
    cnrm: "np.ndarray",
    cbmat: "np.ndarray",
    dim: int,
    m_blocks: int,
    residual: bool = False,
) -> DataFrame:
    """Fused assign+encode over a corpus with a GIVEN (frozen) model:
    one scan, one Arrow crossing (same stage shape as ivfpq_topk's
    inline path). Shared by build (fresh model) and append (model
    loaded from the saved index — no retrain). The cell assign is the
    shared √C two-hop assigner (round 10): the hierarchy is a pure
    function of the centroid array, so append re-derives the IDENTICAL
    structure from the saved centroid table — frozen-model bit-identity
    holds by construction (pinned in test_ann_index).

    ``residual=True`` (round 16, quant='pqr' — FAISS IndexIVFPQ's
    by_residual default): the encoded value is the IVF residual
    x − centroid(cell) and the given codebook must be residual-trained
    (``_residual_codebook_mat``); per-block codeword selection is the
    same argmin."""
    from pyspark.sql.functions import pandas_udf

    from ccog_spark.operators.similarity import hierarchical_assigner

    n_blocks = m_blocks
    d_sub = dim // m_blocks
    assign_batch = hierarchical_assigner(cent_ids, cmat, cnrm)

    @pandas_udf("long")
    def assign(col: pd.Series) -> pd.Series:
        x = np.stack([np.asarray(e, dtype="f8") for e in col])
        return pd.Series(assign_batch(x, np.sqrt((x * x).sum(1))))

    def _block_argmin(x: "np.ndarray") -> "np.ndarray":
        n = x.shape[0]
        out = np.empty((n, n_blocks), dtype="i4")
        for m in range(n_blocks):
            xm = x[:, m * d_sub : (m + 1) * d_sub]
            cm = cbmat[:, m * d_sub : (m + 1) * d_sub]
            d2 = (
                (xm * xm).sum(1)[:, None]
                - 2.0 * (xm @ cm.T)
                + (cm * cm).sum(1)[None, :]
            )
            out[:, m] = d2.argmin(1)
        return out

    if residual:
        cpos = {int(c): i for i, c in enumerate(cent_ids)}

        @pandas_udf("array<int>")
        def encode_res(col: pd.Series, cell: pd.Series) -> pd.Series:
            x = np.stack([np.asarray(e, dtype="f8") for e in col])
            # the -1 coalesce sentinel (join-key non-nullability) must
            # never reach here — fail loudly, not an opaque KeyError
            # (ADVICE r16)
            idx = np.empty(len(cell), "i8")
            for i, c in enumerate(cell.to_numpy()):
                pos = cpos.get(int(c))
                if pos is None:
                    raise ValueError(
                        f"residual encode: cell {int(c)} is not a "
                        "known centroid — the coarse assigner "
                        "returned the null sentinel"
                    )
                idx[i] = pos
            return pd.Series(list(_block_argmin(x - cmat[idx])))

        # chained projections — assign evaluates once, encode consumes
        # its column (plan-audited, the _sq_code_frame precedent)
        assigned = corpus.select(
            "vec_id",
            F.col("embedding"),
            F.coalesce(assign(F.col("embedding")), F.lit(-1)).alias("cell"),
        )
        return assigned.select(
            "vec_id",
            "cell",
            encode_res(F.col("embedding"), F.col("cell")).alias("codes"),
        )

    @pandas_udf("array<int>")
    def encode(col: pd.Series) -> pd.Series:
        x = np.stack([np.asarray(e, dtype="f8") for e in col])
        return pd.Series(list(_block_argmin(x)))

    return corpus.select(
        "vec_id",
        F.coalesce(assign(F.col("embedding")), F.lit(-1)).alias("cell"),
        encode(F.col("embedding")).alias("codes"),
    )


def _residual_codebook_mat(
    corpus: DataFrame,
    cent_ids: "np.ndarray",
    cmat: "np.ndarray",
    cnrm: "np.ndarray",
) -> "np.ndarray":
    """Residual PQ codebook (round 16, quant='pqr'): the SAME
    deterministic PQ_CB sample rows as ``_codebook_mat``, each
    replaced by its IVF residual sample − centroid(assigned cell)
    under the shared √C two-hop assigner — FAISS IndexIVFPQ's
    by_residual training collapsed to the repo's deterministic-sample
    codebook rule. Driver-side numpy on PQ_CB_K rows."""
    from ccog_spark.operators.similarity import (
        PQ_CB_K,
        PQ_CB_MOD,
        PQ_CB_RES,
        hierarchical_assigner,
    )

    rows = (
        corpus.where(F.col("vec_id") % PQ_CB_MOD == PQ_CB_RES)
        .orderBy("vec_id")
        .limit(PQ_CB_K)
        .select("embedding")
        .collect()
    )
    x = np.array([[float(v) for v in r.embedding] for r in rows], "f8")
    assign_batch = hierarchical_assigner(cent_ids, cmat, cnrm)
    cells = assign_batch(x, np.sqrt((x * x).sum(1)))
    cpos = {int(c): i for i, c in enumerate(cent_ids)}
    idx = np.array([cpos[int(c)] for c in cells], "i8")
    return x - cmat[idx]


def _trained_residual_codebook_mat(
    corpus: DataFrame,
    cent_ids: "np.ndarray",
    cmat: "np.ndarray",
    cnrm: "np.ndarray",
    m_blocks: int = PQ_M_BLOCKS,
) -> "np.ndarray":
    """TRAINED residual PQ codebook (round 17, quant='pqt', VERDICT
    r16 #4 — FAISS IndexIVFPQ's actual training step, not just its
    sample init): per-block Lloyd iterations over the residuals of a
    larger deterministic sample (first PQ_TRAIN_N of the PQ_CB
    subsample; the first PQ_CB_K rows double as the init codewords,
    so 'pqt' degrades exactly to 'pqr' at zero iterations). Training
    runs in the fixed-point integer domain (similarity.lloyd_train_int
    — floor(res·2^20 + 0.5) points, floor-mean updates) so the DuckDB
    oracle's recursive-CTE replay is bit-identical, and the returned
    codewords c/2^20 are exactly representable doubles. Driver-side
    numpy on ≤ PQ_TRAIN_N rows; the distributed sort+limit stays a
    TakeOrderedAndProject."""
    from ccog_spark.operators.similarity import (
        PQ_CB_K,
        PQ_CB_MOD,
        PQ_CB_RES,
        PQ_LLOYD_ITERS,
        PQ_QSCALE,
        PQ_TRAIN_N,
        hierarchical_assigner,
        lloyd_train_int,
    )

    rows = (
        corpus.where(F.col("vec_id") % PQ_CB_MOD == PQ_CB_RES)
        .orderBy("vec_id")
        .limit(PQ_TRAIN_N)
        .select("embedding")
        .collect()
    )
    x = np.array([[float(v) for v in r.embedding] for r in rows], "f8")
    assign_batch = hierarchical_assigner(cent_ids, cmat, cnrm)
    cells = assign_batch(x, np.sqrt((x * x).sum(1)))
    cpos = {int(c): i for i, c in enumerate(cent_ids)}
    idx = np.array([cpos[int(c)] for c in cells], "i8")
    res = x - cmat[idx]
    if np.abs(res).max() >= 8.0:
        # |residual| < 8 keeps every quantized value < 2^23, so all
        # training distances stay exact integer-valued doubles
        raise ValueError(
            "trained PQ codebook: residual magnitude >= 8 — the "
            "fixed-point training domain assumes bounded embeddings; "
            "normalize the corpus or widen PQ_QSCALE headroom"
        )
    qx = np.floor(res * PQ_QSCALE + 0.5)
    cb = lloyd_train_int(qx, PQ_CB_K, m_blocks, PQ_LLOYD_ITERS)
    return cb / PQ_QSCALE


def _grp_frame(spark: SparkSession, cent_ids, n_groups: int) -> DataFrame:
    """Tiny broadcastable (cell → grp) map: grp = rank·n_groups // C
    over the ASCENDING centroid ids. Pure integer function of the
    sorted centroid array, so build, append (frozen model), and query
    all derive the identical layout from the saved centroids table."""
    C = len(cent_ids)
    return spark.createDataFrame(
        [(int(c), int(i * n_groups // C)) for i, c in enumerate(cent_ids)],
        "cell long, grp int",
    )


def _write_clustered_codes(
    codes: DataFrame, cent_ids, codes_dir: str, n_groups: int, mode: str
) -> None:
    """Cell-clustered codes layout: grp partition dirs (exact pruning
    for probe reads), (cell, vec_id)-sorted files inside (narrow
    parquet row-group stats on cell). One hash shuffle on grp — no
    range sampling, so the assign/encode Arrow kernels run exactly
    once over the corpus."""
    spark = codes.sparkSession
    grp = _grp_frame(spark, cent_ids, n_groups)
    (
        # LEFT join + coalesce: a row carrying the cell = -1 assignment
        # fallback (null embedding, _code_frame) has no centroid-map
        # entry — an inner join would silently DROP it from the
        # persisted table (the pre-r11 flat writer kept such rows, and
        # n_vectors/occupancy accounting counts the written parquet).
        # Unmapped rows land in a dedicated grp = -1 directory: probe
        # reads never touch it (pgrps come from real centroid ranks),
        # so pruning is unchanged (round-12 ADVICE).
        codes.join(F.broadcast(grp), "cell", "left")
        .withColumn("grp", F.coalesce(F.col("grp"), F.lit(-1)))
        .repartition(n_groups, "grp")
        .sortWithinPartitions("cell", "vec_id")
        .write.mode(mode)
        .partitionBy("grp")
        .parquet(codes_dir)
    )


# codes/ partition-directory floor — the DEFAULT directory count is
# corpus-sized (adaptive_n_groups): one dir ≈ GROUP_TARGET_ROWS code
# rows (~36 B each → ~7 GiB of parquet), floored at CODES_GROUPS so
# small corpora still demonstrate pruning. Probe reads touch
# nprobe/n_groups of the table; write parallelism equals n_groups
# (one task per directory), which at the target sizing is
# corpus_bytes / 7 GiB tasks — ample at scale.
CODES_GROUPS = 16
GROUP_TARGET_ROWS = 200_000_000


def adaptive_n_groups(n: int) -> int:
    """Corpus-sized directory count: ceil(n / GROUP_TARGET_ROWS),
    floored at CODES_GROUPS. Pure integer arithmetic; the chosen
    value is persisted in meta/ so append and query re-derive the
    identical layout without recomputing the rule."""
    return max(CODES_GROUPS, -(-n // GROUP_TARGET_ROWS))


# nprobe auto-tune (round 14, VERDICT r13 #6). IVF recall at fixed
# nprobe degrades as cell occupancy skews: when vectors crowd a few
# cells the frozen quantizer never planned for, a query's true
# neighbours spill past its nearest-centroid ranking and more cells
# must be probed to recover them. The rule scales the probe count by
# the occupancy imbalance, measured as C_occ / E where E is the
# participation ratio (Σn)²/Σn² — the "effective number of equally
# loaded cells" (E = C_occ when uniform, E → 1 when one cell holds
# everything). Pure integer arithmetic throughout, so the DuckDB
# oracle replays the identical value from the same per-cell counts
# (the adaptive_band_bits precedent: data-dependent knob as a pure
# post-transform of a deterministic construction).
NPROBE_BASE = 2  # the uniform-occupancy default (all existing rows)
NPROBE_CAP = 8  # conservative ceiling a fixed setting would need


def auto_nprobe(counts: list[int]) -> int:
    """clamp(ceil(NPROBE_BASE · C_occ / E), BASE, CAP, C_occ) over the
    OCCUPIED cells' sizes. Uniform → BASE (existing behaviour);
    skewed → proportionally more probes, never past CAP."""
    counts = [int(c) for c in counts if c > 0]
    if not counts:
        return NPROBE_BASE
    s = sum(counts)
    q = sum(c * c for c in counts)
    e = (s * s) // q  # effective equally-loaded cell count, >= 1
    c_occ = len(counts)
    np_ = min(NPROBE_CAP, max(NPROBE_BASE, -(-NPROBE_BASE * c_occ // e)))
    return min(np_, c_occ)


def _write_cellstats(spark: SparkSession, index_dir: str) -> None:
    """Per-cell occupancy of the WRITTEN codes table (real cells only
    — the grp = -1 null-embedding fallback rows never participate in
    probing). Index-sized; serves auto_nprobe without a codes scan at
    query time."""
    codes = spark.read.parquet(os.path.join(index_dir, "codes"))
    (
        codes.where(F.col("cell") >= 0)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .write.mode("overwrite")
        .parquet(os.path.join(index_dir, "cellstats__stage"))
    )
    import shutil

    live = os.path.join(index_dir, "cellstats")
    shutil.rmtree(live, ignore_errors=True)
    os.rename(os.path.join(index_dir, "cellstats__stage"), live)


def _read_cellstats(spark: SparkSession, index_dir: str) -> list[int]:
    """The per-cell counts, deriving them from codes when the index
    predates the cellstats table (one index-sized aggregate)."""
    p = os.path.join(index_dir, "cellstats")
    if not os.path.isdir(p):
        _write_cellstats(spark, index_dir)
    return [r.n for r in spark.read.parquet(p).collect()]


_ANN_META_SCHEMA = (
    "dim int, m_blocks int, cent_stride int, n_vectors bigint, "
    "n_groups int, last_epoch string, quant string"
)
_ANN_META_KEYS = (
    "dim", "m_blocks", "cent_stride", "n_vectors", "n_groups",
    "last_epoch", "quant",
)


def _meta_quant(meta_row) -> str:
    """``quant`` from a meta Row — 'pq' (8-byte product codes, the
    original layout), 'sq8' (per-dimension scalar codes, round 15),
    'sq8r' (scalar codes over IVF RESIDUALS x − centroid(cell), round
    16 — the FAISS IndexIVFScalarQuantizer by_residual default),
    'pqr' (product codes over residuals, round 16) or 'pqt'
    (Lloyd-TRAINED residual product codebook, round 17);
    pre-round-15 indexes lack the field and are PQ by construction."""
    return meta_row.asDict().get("quant") or "pq"


def _write_ann_meta(spark: SparkSession, index_dir: str, meta: dict) -> None:
    spark.createDataFrame(
        [tuple(meta[k] for k in _ANN_META_KEYS)], _ANN_META_SCHEMA
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "meta"))


def _meta_epoch(meta_row) -> str:
    """``last_epoch`` from a meta Row; pre-round-15 indexes lack the
    field (streaming replay record, see build_ivfpq_index)."""
    return meta_row.asDict().get("last_epoch") or ""


def build_ivfpq_index(
    corpus: DataFrame,
    dim: int,
    index_dir: str,
    cent_stride: int = 25,
    m_blocks: int = PQ_M_BLOCKS,
    n_groups: int | None = None,
    meta_cols: tuple[str, ...] = (),
    epoch_tag: str | None = None,
    residual: bool = False,
    trained: bool = False,
) -> dict:
    """One corpus pass → persisted index. Returns the meta dict.
    ``n_groups`` defaults to adaptive_n_groups(corpus count) — one
    extra column-pruned count job at build time; pass an int to pin
    the directory count (tests, controlled probes).

    ``meta_cols`` (round 14): metadata columns copied into an
    index-resident ``vecmeta/`` table (the text index's docmeta twin),
    enabling query-time FILTERED vector search
    (``query_ivfpq_index(vec_filter=...)``) without re-reading the
    embeddings. Presence is detected by the directory (the ANN meta
    row keeps its fixed schema); the vecmeta schema itself names the
    stored columns.

    ``epoch_tag`` (round 15, VERDICT r14 #3): the streaming sink's
    applied-epoch record ("{ns}:{epoch_id}"), stored in the meta row
    itself so replay detection is transactional with the index write's
    last step (text_index.build_bm25_index twin).

    ``residual=True`` (round 16, VERDICT-r15-adjacent —
    meta.quant='pqr', the FAISS IndexIVFPQ by_residual default): the
    codebook is trained on the sample rows' IVF residuals and codes
    encode x − centroid(cell); queries reconstruct
    x̂ = centroid + decode(codes) and rank by asymmetric cosine.
    Residual spans are far tighter on clustered corpora, lifting
    recall at identical 1-byte-per-block codes (measured in
    scripts/r15_sq8_probe.py's clustered section).

    ``trained=True`` (round 17, VERDICT r16 #4 — meta.quant='pqt';
    requires ``residual=True``, matching FAISS IndexIVFPQ's trained
    by_residual default): per-block Lloyd iterations over the
    deterministic training sample's residuals replace the
    sample-assigned codewords (integer-exact k-means, so the oracle
    replays the trained codebook bit-identically); everything
    downstream — codes, append under the frozen model, query
    reconstruction — is byte-identical machinery to 'pqr'."""
    import shutil

    if trained and not residual:
        raise ValueError(
            "build_ivfpq_index: trained=True requires residual=True "
            "(trained codebooks are residual-trained, the FAISS "
            "IndexIVFPQ by_residual contract)"
        )

    spark = corpus.sparkSession
    if n_groups is None:
        n_groups = adaptive_n_groups(corpus.count())
    vm_dir = os.path.join(index_dir, "vecmeta")
    if meta_cols:
        corpus.select("vec_id", *meta_cols).write.mode("overwrite").parquet(
            vm_dir
        )
    elif os.path.isdir(vm_dir):
        # round-15 ADVICE: append/query detect vecmeta by directory
        # presence, so an in-place rebuild WITHOUT meta_cols must
        # remove a prior build's table — otherwise filtered queries
        # silently join against stale metadata and appends extend it
        shutil.rmtree(vm_dir)
    cent_ids, cmat, cnrm = _ivf_centroid_arrays(corpus, cent_stride)
    if trained:
        cbmat = _trained_residual_codebook_mat(
            corpus, cent_ids, cmat, cnrm, m_blocks
        )
    elif residual:
        cbmat = _residual_codebook_mat(corpus, cent_ids, cmat, cnrm)
    else:
        cbmat = _codebook_mat(corpus)

    codes = _code_frame(
        corpus, cent_ids, cmat, cnrm, cbmat, dim, m_blocks,
        residual=residual,
    )
    _write_clustered_codes(
        codes, cent_ids, os.path.join(index_dir, "codes"), n_groups,
        "overwrite",
    )

    spark.createDataFrame(
        [
            (int(i), [float(x) for x in row], float(nv))
            for i, row, nv in zip(cent_ids, cmat, cnrm)
        ],
        # array<double> (NOT float): truncating centroids to f4 would
        # silently change probe cosines for double-embedding corpora,
        # breaking the pinned bit-identity with the inline ivfpq_topk
        # path (which broadcasts doubles). float32 inputs promote
        # exactly, so fixture hashes are unchanged.
        "cent_id long, c_emb array<double>, c_nrm double",
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "centroids"))

    spark.createDataFrame(
        [(j, [float(x) for x in row]) for j, row in enumerate(cbmat)],
        "j int, ce array<double>",
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "codebook"))

    # count the WRITTEN parquet (counting the lazy frame would re-run
    # the assign/encode kernels over the corpus)
    n_vectors = spark.read.parquet(
        os.path.join(index_dir, "codes")
    ).count()
    _write_cellstats(spark, index_dir)  # serves auto_nprobe
    meta = {
        "dim": dim,
        "m_blocks": m_blocks,
        "cent_stride": cent_stride,
        "n_vectors": int(n_vectors),
        "n_groups": n_groups,
        "last_epoch": epoch_tag or "",
        "quant": "pqt" if trained else ("pqr" if residual else "pq"),
    }
    _write_ann_meta(spark, index_dir, meta)
    return meta


def _load_model(spark: SparkSession, index_dir: str):
    """Driver-side (meta, cent_ids, cmat, cnrm, cbmat) from the saved
    index — index-sized reads only."""
    meta = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    cent_rows = sorted(
        spark.read.parquet(os.path.join(index_dir, "centroids")).collect(),
        key=lambda r: r.cent_id,
    )
    cent_ids = np.array([r.cent_id for r in cent_rows], "i8")
    cmat = np.array([[float(x) for x in r.c_emb] for r in cent_rows], "f8")
    cnrm = np.array([r.c_nrm for r in cent_rows], "f8")
    cb_rows = sorted(
        spark.read.parquet(os.path.join(index_dir, "codebook")).collect(),
        key=lambda r: r.j,
    )
    cbmat = np.array([[float(x) for x in r.ce] for r in cb_rows], "f8")
    return meta, cent_ids, cmat, cnrm, cbmat


def _load_centroids(spark: SparkSession, index_dir: str):
    """Driver-side (cent_ids, cmat, cnrm) from the saved centroids
    table — the codebook-free half of ``_load_model`` (round 15, for
    the SQ8 layout which has no PQ codebook)."""
    cent_rows = sorted(
        spark.read.parquet(os.path.join(index_dir, "centroids")).collect(),
        key=lambda r: r.cent_id,
    )
    cent_ids = np.array([r.cent_id for r in cent_rows], "i8")
    cmat = np.array([[float(x) for x in r.c_emb] for r in cent_rows], "f8")
    cnrm = np.array([r.c_nrm for r in cent_rows], "f8")
    return cent_ids, cmat, cnrm


def _load_sqstats(spark: SparkSession, index_dir: str):
    """Driver-side per-dimension (mins, rngs) from the saved sqstats
    table (round 15) — dim rows, the SQ8 twin of the PQ codebook."""
    rows = sorted(
        spark.read.parquet(os.path.join(index_dir, "sqstats")).collect(),
        key=lambda r: r.d,
    )
    return [float(r.mn) for r in rows], [float(r.rng) for r in rows]


def _sq_code_frame(
    corpus: DataFrame,
    cent_ids: "np.ndarray",
    cmat: "np.ndarray",
    cnrm: "np.ndarray",
    mins: list,
    rngs: list,
    residual: bool = False,
) -> DataFrame:
    """Fused assign+encode for the SQ8 layout (round 15 — the
    ``_code_frame`` twin): the cell assign is the SAME shared √C
    two-hop assigner; the encode is the per-dimension scalar code
    code_d = clamp(floor((x_d − mn_d)·255/rng_d), 0..255) under the
    GIVEN (frozen) stats — shared by build (fresh stats) and append
    (stats loaded from the saved index, out-of-span delta values
    saturate at 0/255 like any real scalar quantizer).

    ``residual=True`` (round 16, quant='sq8r'): the quantized value is
    the IVF residual x − centroid(cell) instead of x — residual spans
    are far tighter than raw-coordinate spans, so the same 256 levels
    land finer and recall rises at identical code bytes (FAISS
    IndexIVFScalarQuantizer's by_residual default). The stats must
    then have been trained over residuals (``_sq_residual_stats``)."""
    from pyspark.sql.functions import pandas_udf

    from ccog_spark.operators.similarity import hierarchical_assigner

    assign_batch = hierarchical_assigner(cent_ids, cmat, cnrm)
    mn_arr = np.asarray(mins, "f8")
    rng_arr = np.asarray(rngs, "f8")

    @pandas_udf("long")
    def assign(col: pd.Series) -> pd.Series:
        x = np.stack([np.asarray(e, dtype="f8") for e in col])
        return pd.Series(assign_batch(x, np.sqrt((x * x).sum(1))))

    def _quantize(v: "np.ndarray") -> "np.ndarray":
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.floor((v - mn_arr[None, :]) * 255.0 / rng_arr[None, :])
        c = np.clip(c, 0, 255)
        return np.where(rng_arr[None, :] > 0, c, 0.0).astype("i4")

    if residual:
        cpos = {int(c): i for i, c in enumerate(cent_ids)}

        @pandas_udf("array<int>")
        def encode_res(col: pd.Series, cell: pd.Series) -> pd.Series:
            x = np.stack([np.asarray(e, dtype="f8") for e in col])
            # loud sentinel check, same contract as the PQ twin
            idx = np.empty(len(cell), "i8")
            for i, c in enumerate(cell.to_numpy()):
                pos = cpos.get(int(c))
                if pos is None:
                    raise ValueError(
                        f"residual encode: cell {int(c)} is not a "
                        "known centroid — the coarse assigner "
                        "returned the null sentinel"
                    )
                idx[i] = pos
            return pd.Series(list(_quantize(x - cmat[idx])))

        # two chained projections — Catalyst chains the Arrow stages,
        # assign evaluates once and encode consumes its column
        assigned = corpus.select(
            "vec_id",
            F.col("embedding"),
            F.coalesce(assign(F.col("embedding")), F.lit(-1)).alias("cell"),
        )
        return assigned.select(
            "vec_id",
            "cell",
            encode_res(F.col("embedding"), F.col("cell")).alias("codes"),
        )

    @pandas_udf("array<int>")
    def encode(col: pd.Series) -> pd.Series:
        x = np.stack([np.asarray(e, dtype="f8") for e in col])
        return pd.Series(list(_quantize(x)))

    return corpus.select(
        "vec_id",
        F.coalesce(assign(F.col("embedding")), F.lit(-1)).alias("cell"),
        encode(F.col("embedding")).alias("codes"),
    )


def _sq_residual_stats(
    corpus: DataFrame,
    cent_ids: "np.ndarray",
    cmat: "np.ndarray",
    cnrm: "np.ndarray",
    dim: int,
) -> tuple[list, list]:
    """Per-dimension (min, range) over IVF RESIDUALS x −
    centroid(cell), under the SAME √C two-hop assigner the encode
    pass uses (round 16 — the by_residual training pass): one Arrow
    assign+subtract map, then the ``sq8_stats`` partial-aggregable
    min/max. One extra corpus pass vs raw-coordinate training — still
    map-side all the way, nothing shuffles."""
    from pyspark.sql.functions import pandas_udf

    from ccog_spark.operators.similarity import (
        hierarchical_assigner,
        sq8_stats,
    )

    assign_batch = hierarchical_assigner(cent_ids, cmat, cnrm)
    cpos = {int(c): i for i, c in enumerate(cent_ids)}

    @pandas_udf("array<double>")
    def res(col: pd.Series) -> pd.Series:
        x = np.stack([np.asarray(e, dtype="f8") for e in col])
        cells = assign_batch(x, np.sqrt((x * x).sum(1)))
        idx = np.array([cpos[int(c)] for c in cells], "i8")
        return pd.Series(list(x - cmat[idx]))

    return sq8_stats(
        corpus.select(res(F.col("embedding")).alias("embedding")), dim
    )


def build_ivfsq_index(
    corpus: DataFrame,
    dim: int,
    index_dir: str,
    cent_stride: int = 25,
    n_groups: int | None = None,
    meta_cols: tuple[str, ...] = (),
    epoch_tag: str | None = None,
    residual: bool = False,
) -> dict:
    """Persisted IVF + SQ8 index (round 15 — the scalar-quantized twin
    of ``build_ivfpq_index``): same centroids / cell-clustered codes
    layout / cellstats / optional vecmeta, but the per-vector payload
    is dim 8-bit scalar codes (4× smaller than raw float32,
    near-exact asymmetric distances — the storage point between raw
    vectors and PQ's 8 bytes; FAISS IndexIVFScalarQuantizer). The
    model tables are the centroids plus a dim-row ``sqstats/``
    (d, mn, rng) — per-dimension corpus min/range from
    ``similarity.sq8_stats``; queries reconstruct
    x̂_d = mn_d + (code_d + 0.5)·rng_d/256 and rank by cosine(q, x̂).

    The whole lifecycle is shared with the PQ index: ``meta.quant``
    records the layout; ``append_to_index`` branches to the frozen-
    stats encode; ``delete_from_ann_index`` / ``compact_ann_index`` /
    ``verify_ann_index`` / ``auto_nprobe`` / ``vec_filter`` operate on
    codes rows they never decode and work unchanged.

    ``residual=True`` (round 16, VERDICT r15 #5 — meta.quant='sq8r'):
    train the per-dim stats over IVF residuals x − centroid(cell) and
    quantize residuals instead of raw coordinates — the FAISS
    IndexIVFScalarQuantizer by_residual default. Residual spans are
    much tighter, so the same dim code bytes carry finer resolution
    and recall rises at an identical probe budget (measured in
    scripts/r15_sq8_probe.py); queries reconstruct
    x̂ = centroid(cell) + mn + (code + 0.5)·rng/256."""
    import shutil

    from ccog_spark.operators.similarity import sq8_stats

    spark = corpus.sparkSession
    if n_groups is None:
        n_groups = adaptive_n_groups(corpus.count())
    vm_dir = os.path.join(index_dir, "vecmeta")
    if meta_cols:
        corpus.select("vec_id", *meta_cols).write.mode("overwrite").parquet(
            vm_dir
        )
    elif os.path.isdir(vm_dir):
        shutil.rmtree(vm_dir)  # stale-vecmeta rule (round-15 ADVICE)
    cent_ids, cmat, cnrm = _ivf_centroid_arrays(corpus, cent_stride)
    mins, rngs = (
        _sq_residual_stats(corpus, cent_ids, cmat, cnrm, dim)
        if residual
        else sq8_stats(corpus, dim)
    )

    codes = _sq_code_frame(
        corpus, cent_ids, cmat, cnrm, mins, rngs, residual=residual
    )
    _write_clustered_codes(
        codes, cent_ids, os.path.join(index_dir, "codes"), n_groups,
        "overwrite",
    )

    spark.createDataFrame(
        [
            (int(i), [float(x) for x in row], float(nv))
            for i, row, nv in zip(cent_ids, cmat, cnrm)
        ],
        "cent_id long, c_emb array<double>, c_nrm double",
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "centroids"))

    spark.createDataFrame(
        [(d, mins[d], rngs[d]) for d in range(dim)],
        "d int, mn double, rng double",
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "sqstats"))

    n_vectors = spark.read.parquet(
        os.path.join(index_dir, "codes")
    ).count()
    _write_cellstats(spark, index_dir)
    meta = {
        "dim": dim,
        "m_blocks": 0,  # no PQ blocks in the SQ8 layout
        "cent_stride": cent_stride,
        "n_vectors": int(n_vectors),
        "n_groups": n_groups,
        "last_epoch": epoch_tag or "",
        "quant": "sq8r" if residual else "sq8",
    }
    _write_ann_meta(spark, index_dir, meta)
    return meta


def query_ivfsq_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int | str = 2,
    rerank_corpus: DataFrame | None = None,
    m: int = 10,
    vec_filter: str | None = None,
) -> DataFrame:
    """Top-k retrieval against a persisted SQ8 index (round 15):
    embeddings are never read — only the probed cells' scalar codes
    (dim bytes/vector) plus the index-sized model tables. Candidates
    are ranked by cosine against the per-dimension reconstruction
    x̂_d = mn_d + (code_d + 0.5)·rng_d/256 — the asymmetric SQ8
    distance, near-exact where PQ's ADC is coarse. Probe-cell
    selection, driver-known scan pruning, tombstone handling,
    ``vec_filter``, ``nprobe="auto"``, and ``rerank_corpus``
    (|Q|·m-row exact re-rank) are all the shared machinery of
    ``query_ivfpq_index``.

    Float discipline: the distance kernel accumulates the dot product
    and the reconstructed norm DIMENSION-BY-DIMENSION in sequential
    order over JVM-collected query vectors/norms — exactly the
    left-to-right sum the oracle's dimension-ordered list rebuild
    produces (the adc_kernel block-accumulation precedent), so the
    SQL replay is bit-identical."""
    from pyspark.sql.functions import pandas_udf

    ic.check_not_inflight(index_dir)
    meta = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    quant = _meta_quant(meta)
    if quant not in ("sq8", "sq8r"):
        raise ValueError(
            f"index at {index_dir!r} is a {quant!r} index — "
            "use query_ivfpq_index"
        )
    if nprobe == "auto":
        nprobe = auto_nprobe(_read_cellstats(spark, index_dir))
    mins, rngs = _load_sqstats(spark, index_dir)
    mn_arr = np.asarray(mins, "f8")
    rng_arr = np.asarray(rngs, "f8")
    dim = int(meta.dim)
    # residual layout (round 16): reconstruction adds the candidate's
    # cell centroid back — centroid table collected (index-sized model
    # table, the _pq_machinery contract), cell rides the candidate row
    if quant == "sq8r":
        cent_ids_r, cmat_r, _ = _load_centroids(spark, index_dir)
        cpos_r = {int(c): i for i, c in enumerate(cent_ids_r)}
    else:
        cmat_r, cpos_r = None, None

    # query vectors + JVM-computed norms, collected driver-side
    # (query-batch-sized — the _pq_machinery LUT contract)
    qrows = queries.select(
        "q_id", "q_emb", norm(F.col("q_emb")).alias("qn")
    ).collect()
    qidx = {int(r.q_id): i for i, r in enumerate(qrows)}
    qmat = np.array(
        [[float(x) for x in r.q_emb] for r in qrows], "f8"
    )
    qn = np.array([float(r.qn) for r in qrows], "f8")

    @pandas_udf("double")
    def sq_cos(qid: pd.Series, codes: pd.Series, cell: pd.Series) -> pd.Series:
        qi = qid.map(qidx).to_numpy()
        cm = np.stack([np.asarray(c, dtype="i4") for c in codes])
        if cpos_r is not None:
            ci = np.array(
                [cpos_r[int(c)] for c in cell.to_numpy()], "i8"
            )
            base = cmat_r[ci]
        # reconstruct and accumulate dim-by-dim, LEFT TO RIGHT — the
        # sequential order both the JVM aggregate and DuckDB's
        # dimension-ordered list_dot_product realize
        dotacc = np.zeros(len(qi), "f8")
        nrmacc = np.zeros(len(qi), "f8")
        qsel = qmat[qi]
        for d in range(dim):
            xh = mn_arr[d] + (cm[:, d].astype("f8") + 0.5) * rng_arr[d] / 256.0
            if cpos_r is not None:
                # centroid added OUTSIDE the scalar term — the SQL
                # spelling cv[d] + (mn + (code+0.5)*rng/256.0)
                xh = base[:, d] + xh
            dotacc = dotacc + qsel[:, d] * xh
            nrmacc = nrmacc + xh * xh
        return pd.Series(dotacc / (qn[qi] * np.sqrt(nrmacc)))

    cand = _probed_candidates(
        spark, index_dir, queries, meta, nprobe, vec_filter
    )
    pairs = cand.select(
        "q_id",
        "vec_id",
        sq_cos(
            F.col("q_id"), F.col("codes"), F.col("cell")
        ).alias("cos_raw"),
    )
    ranked = pairs.select(
        "q_id",
        "vec_id",
        F.round("cos_raw", 4).alias("cos"),
        F.row_number()
        .over(
            W.partitionBy("q_id").orderBy(
                F.col("cos_raw").desc(), F.col("vec_id")
            )
        )
        .alias("rn"),
    )
    if rerank_corpus is None:
        return ranked.where(F.col("rn") <= k)
    from ccog_spark.operators.similarity import exact_rerank

    if m < k:
        raise ValueError(
            f"rerank candidate pool m={m} must be >= k={k} "
            "(stage 2 can only reorder what stage 1 supplies)"
        )
    cands = ranked.where(F.col("rn") <= m).select("q_id", "vec_id")
    return exact_rerank(rerank_corpus, queries, cands, k)


def append_to_index(
    corpus_delta: DataFrame, index_dir: str, epoch_tag: str | None = None
) -> dict:
    """Incremental append: encode ``corpus_delta`` with the SAVED
    centroids/codebook (NO retrain), append the resulting 8-byte codes
    to ``codes/``, update ``meta``. Production indexes grow; a rebuild
    re-derives the model and re-encodes the whole corpus, while append
    touches only the delta (one fused assign+encode Arrow pass) plus
    the index-sized model tables.

    DRIFT CONTRACT: the model stays frozen, so append(B) after
    build(A) is BIT-IDENTICAL to encoding A∪B under A's model
    (pinned in tests) — but it is NOT build(A∪B), whose model would
    see B. As the data distribution moves away from A's, quantization
    error grows and recall degrades; the returned ``occupancy_skew``
    (max/mean vectors per occupied cell, whole index) is the staleness
    signal — a climbing skew means new vectors are crowding a few
    cells the frozen quantizer never planned for, and the index should
    be rebuilt. Appends are not atomic w.r.t. concurrent readers of
    the same dir (parquet file listing); pause queries or append to a
    copy, exactly like any parquet-append pipeline."""
    spark = corpus_delta.sparkSession
    meta = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    quant = _meta_quant(meta)
    dim, m_blocks = int(meta.dim), int(meta.m_blocks)
    if quant in ("sq8", "sq8r"):
        # frozen-stats encode (round 15): the delta is quantized under
        # the SAVED per-dim min/range — values outside the trained
        # span saturate at code 0/255, the scalar-quantizer twin of
        # the frozen-codebook contract (drift signal: occupancy_skew,
        # exactly as for PQ). The residual layout freezes centroids
        # AND residual stats: delta residuals under frozen centroids,
        # quantized under frozen spans (round 16).
        cent_ids, cmat, cnrm = _load_centroids(spark, index_dir)
        mins, rngs = _load_sqstats(spark, index_dir)
        ic.begin_mutation(index_dir, "append")
        codes = _sq_code_frame(
            corpus_delta, cent_ids, cmat, cnrm, mins, rngs,
            residual=(quant == "sq8r"),
        )
    else:
        # pq / pqr: frozen centroids + frozen codebook; the residual
        # layout additionally encodes delta residuals under the
        # frozen centroids (round 16 — same contract as sq8r)
        _, cent_ids, cmat, cnrm, cbmat = _load_model(spark, index_dir)
        ic.begin_mutation(index_dir, "append")
        codes = _code_frame(
            corpus_delta, cent_ids, cmat, cnrm, cbmat, dim, m_blocks,
            residual=(quant in ("pqr", "pqt")),
        )
    # same cell→grp map as build — pure function of the SAVED sorted
    # centroid ids, so appended files land in the matching partition
    # dirs and stay (cell, vec_id)-sorted for stats pruning
    _write_clustered_codes(
        codes, cent_ids, os.path.join(index_dir, "codes"),
        int(meta.n_groups), "append",
    )
    vm_dir = os.path.join(index_dir, "vecmeta")
    if os.path.isdir(vm_dir):
        # filtered-retrieval metadata rides along: the delta must carry
        # the build's vecmeta columns (schema read from the table —
        # the select fails loudly if the delta lacks one)
        vm_cols = [
            f for f in spark.read.parquet(vm_dir).schema.fieldNames()
            if f != "vec_id"
        ]
        corpus_delta.select("vec_id", *vm_cols).write.mode("append").parquet(
            vm_dir
        )

    all_codes = spark.read.parquet(os.path.join(index_dir, "codes"))
    # one index-sized aggregate: total count + cell-occupancy skew
    occ = (
        all_codes.groupBy("cell")
        .agg(F.count("*").alias("n"))
        .agg(
            F.sum("n").alias("total"),
            F.max("n").alias("mx"),
            F.avg("n").alias("mean"),
        )
        .collect()[0]
    )
    new_meta = {
        "dim": dim,
        "m_blocks": m_blocks,
        "cent_stride": int(meta.cent_stride),
        "n_vectors": int(occ.total),
        "n_groups": int(meta.n_groups),
        # streaming replay record, transactional with this rewrite
        # (round 15); a plain batch append preserves the prior value
        "last_epoch": epoch_tag if epoch_tag is not None
        else _meta_epoch(meta),
        "quant": quant,
    }
    _write_ann_meta(spark, index_dir, new_meta)
    _write_cellstats(spark, index_dir)  # occupancy moved: refresh
    ic.end_mutation(index_dir)
    return {
        **new_meta,
        "appended": int(occ.total) - int(meta.n_vectors),
        "occupancy_skew": float(occ.mx) / float(occ.mean),
    }


def delete_from_ann_index(
    spark: SparkSession, index_dir: str, vec_ids: DataFrame
) -> dict:
    """Remove vectors from the index (round 14, VERDICT r13 #2 — the
    text-index deletion's E36 twin). Deletion is LOGICAL: the ids land
    in ``tombstones/`` (small parquet set, appended and deduplicated
    against prior deletes), ``query_ivfpq_index`` anti-joins candidates
    against it, and ``compact_ann_index`` applies it physically.
    Unlike BM25, ADC scoring has NO corpus-level statistics — removing
    a vector cannot change any other vector's score — so nothing else
    needs rewriting: query-after-delete is bit-identical to an index
    whose codes were encoded from the surviving corpus under the SAME
    frozen model (pinned in tests; the registry row's oracle replays
    the full-model/survivor-candidate SQL). meta.n_vectors keeps
    counting PHYSICAL rows until compact (it is informational — no
    scoring path reads it).

    Idempotent: already-tombstoned ids are skipped. Returns
    {"tombstoned": n} — n counts newly tombstoned ids (they need not
    exist in the index; absent ids are harmless no-ops at query
    time)."""
    ic.begin_mutation(index_dir, "delete")
    ids = vec_ids.toDF("vec_id").distinct()
    tomb = ic.read_tombstones(spark, index_dir, "vec_id")
    new_ids = ic.anti_tombstones(ids, tomb, "vec_id")
    n_new = new_ids.count()
    if n_new:
        ic.append_tombstones(new_ids, index_dir)
    ic.end_mutation(index_dir)
    return {"tombstoned": int(n_new)}


def compact_ann_index(spark: SparkSession, index_dir: str) -> dict:
    """Maintenance verb (round 13, twin of
    text_index.compact_text_index): rewrite codes/ clustered and
    (cell, vec_id)-sorted again, APPLYING pending tombstones
    physically (round 14) and clearing the tombstone set.
    append_to_index lands its own files per grp directory on every
    call, and the cell-sort that makes row-group stats narrow only
    holds WITHIN each append's files — compaction restores the
    freshly-built layout via the staged-swap pattern. Query answers
    are unchanged (pinned): deletes were already logically applied by
    the query-side anti-join; meta.n_vectors drops to the surviving
    physical count.

    Returns {"files_before": n, "files_after": m,
    "tombstones_applied": t}."""
    import glob
    import shutil

    live = os.path.join(index_dir, "codes")

    def n_files(root: str) -> int:
        return len(glob.glob(os.path.join(root, "grp=*", "*.parquet")))

    before = n_files(live)
    meta = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    n_groups = int(meta["n_groups"])
    tomb = ic.read_tombstones(spark, index_dir, "vec_id")
    n_tomb = tomb.count() if tomb is not None else 0
    ic.begin_mutation(index_dir, "compact")
    stage = os.path.join(index_dir, "codes__stage")
    (
        ic.anti_tombstones(
            spark.read.parquet(live).select("vec_id", "cell", "codes", "grp"),
            tomb, "vec_id",
        )
        .repartition(n_groups, "grp")
        .sortWithinPartitions("cell", "vec_id")
        .write.mode("overwrite")
        .partitionBy("grp")
        .parquet(stage)
    )
    shutil.rmtree(live)
    os.rename(stage, live)
    vm_dir = os.path.join(index_dir, "vecmeta")
    if n_tomb and os.path.isdir(vm_dir):
        vm_stage = os.path.join(index_dir, "vecmeta__stage")
        ic.anti_tombstones(
            spark.read.parquet(vm_dir), tomb, "vec_id"
        ).write.mode("overwrite").parquet(vm_stage)
        shutil.rmtree(vm_dir)
        os.rename(vm_stage, vm_dir)
    ic.clear_tombstones(index_dir)
    if n_tomb:
        _write_cellstats(spark, index_dir)  # occupancy shrank
        n_vectors = spark.read.parquet(live).count()
        _write_ann_meta(
            spark,
            index_dir,
            {
                "dim": int(meta.dim),
                "m_blocks": int(meta.m_blocks),
                "cent_stride": int(meta.cent_stride),
                "n_vectors": int(n_vectors),
                "n_groups": int(meta.n_groups),
                "last_epoch": _meta_epoch(meta),
                "quant": _meta_quant(meta),
            },
        )
    ic.end_mutation(index_dir)
    return {
        "files_before": before,
        "files_after": n_files(live),
        "tombstones_applied": int(n_tomb),
    }


def query_ivfpq_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int | str = 2,
    rerank_corpus: DataFrame | None = None,
    m: int = 10,
    vec_filter: str | None = None,
) -> DataFrame:
    """Top-k ADC retrieval against a persisted index. Embeddings are
    never read — only the codes table (8 bytes/vector) plus the
    index-sized model tables; and of the codes table only the probed
    cells' neighborhoods (round 11): the probe cells are query-batch-
    sized and driver-known, so they push into the parquet scan as a
    partition filter on grp (exact directory pruning against the
    cell-clustered layout) plus an In(cell) data filter (row-group
    stats pruning inside each directory) — reads ~nprobe/n_groups of
    the files instead of scanning the full corpus-sized table.
    Bit-identical to ivfpq_topk on the same corpus/queries (the test
    pins it): the filters name exactly the equi-join keys.

    ``vec_filter`` (round 14, filtered vector search): a SQL predicate
    over the index's vecmeta columns (``build_ivfpq_index(
    meta_cols=…)``) restricting CANDIDATES — exactly the tombstone
    exclusion mechanism with a predicate-defined set, applied after
    the scan filters (pruning intact) and before ranking. ADC has no
    corpus statistics, so filtering is pure candidate exclusion:
    filter-then-rank ≡ rank-over-allowed, no semantics caveat (and
    bit-identical to tombstoning the predicate's complement — pinned
    in tests). Probing is NOT filter-aware: nprobe cells are chosen
    by query-centroid cosine as usual, so a highly selective filter
    can return < k rows where eligible vectors live outside the
    probed cells — raise nprobe for needle-queries, the standard
    filtered-IVF recall/cost trade.

    ``rerank_corpus`` (round 12): when given, the index supplies the
    top-``m`` ADC candidates per query and the final top-k is the
    EXACT-cosine re-rank of those rows against the provided embeddings
    frame — the production two-stage recipe with the persisted index
    as stage 1. Bit-identical to the inline ivfpq_rerank_topk (the
    rerank stage is the SHARED similarity.exact_rerank, and the
    candidate sets are already pinned identical); the embeddings scan
    touches |Q|·m rows via a broadcast candidate join, preserving the
    index's never-scan-the-corpus property."""
    from pyspark.sql import Window as W

    ic.check_not_inflight(index_dir)
    meta = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    quant = _meta_quant(meta)
    if quant in ("sq8", "sq8r"):
        raise ValueError(
            f"index at {index_dir!r} is a {quant!r} index — "
            "use query_ivfsq_index"
        )
    if nprobe == "auto":
        # occupancy-skew-tuned probe count (round 14, VERDICT r13 #6):
        # derived from the persisted per-cell counts — an index-sized
        # driver read, no codes scan. The value is a deterministic
        # pure function of the saved index state (the oracle replays
        # it from the same counts); pending tombstones leave the
        # counts slightly stale until compact — a recall/cost
        # heuristic drifting a little, not a correctness input.
        nprobe = auto_nprobe(_read_cellstats(spark, index_dir))
    cb_rows = sorted(
        spark.read.parquet(os.path.join(index_dir, "codebook")).collect(),
        key=lambda r: r.j,
    )
    cbmat = np.array([[float(x) for x in r.ce] for r in cb_rows], "f8")
    cand = _probed_candidates(
        spark, index_dir, queries, meta, nprobe, vec_filter
    )
    if quant in ("pqr", "pqt"):
        # residual layout (round 16; round 17 adds the trained-
        # codebook 'pqt' twin — same reconstruction, different
        # codeword values): candidates are ranked by the
        # asymmetric cosine against the full reconstruction
        # x̂ = centroid(cell) + decode(codes) — same kernel shape and
        # float discipline as the SQ8 path (dim-by-dim left-to-right,
        # the dimension-ordered SQL list rebuild)
        from pyspark.sql.functions import pandas_udf

        cent_ids_r, cmat_r, _ = _load_centroids(spark, index_dir)
        cpos_r = {int(c): i for i, c in enumerate(cent_ids_r)}
        dim = int(meta.dim)
        mb = int(meta.m_blocks)
        dsub = dim // mb
        qrows = queries.select(
            "q_id", "q_emb", norm(F.col("q_emb")).alias("qn")
        ).collect()
        qidx = {int(r.q_id): i for i, r in enumerate(qrows)}
        qmat = np.array([[float(x) for x in r.q_emb] for r in qrows], "f8")
        qn = np.array([float(r.qn) for r in qrows], "f8")

        @pandas_udf("double")
        def pqr_cos(
            qid: pd.Series, codes: pd.Series, cell: pd.Series
        ) -> pd.Series:
            qi = qid.map(qidx).to_numpy()
            cm = np.stack([np.asarray(c, dtype="i4") for c in codes])
            idx = np.array(
                [cpos_r[int(c)] for c in cell.to_numpy()], "i8"
            )
            base = cmat_r[idx]
            dec = np.empty((len(qi), dim), "f8")
            for mblk in range(mb):
                lo = mblk * dsub
                dec[:, lo : lo + dsub] = cbmat[cm[:, mblk], lo : lo + dsub]
            dotacc = np.zeros(len(qi), "f8")
            nrmacc = np.zeros(len(qi), "f8")
            qsel = qmat[qi]
            for d in range(dim):
                xh = base[:, d] + dec[:, d]
                dotacc = dotacc + qsel[:, d] * xh
                nrmacc = nrmacc + xh * xh
            return pd.Series(dotacc / (qn[qi] * np.sqrt(nrmacc)))

        pairs = cand.select(
            "q_id",
            "vec_id",
            pqr_cos(
                F.col("q_id"), F.col("codes"), F.col("cell")
            ).alias("cos_raw"),
        )
        ranked = pairs.select(
            "q_id",
            "vec_id",
            F.round("cos_raw", 4).alias("cos"),
            F.row_number()
            .over(
                W.partitionBy("q_id").orderBy(
                    F.col("cos_raw").desc(), F.col("vec_id")
                )
            )
            .alias("rn"),
        )
        if rerank_corpus is None:
            return ranked.where(F.col("rn") <= k)
        from ccog_spark.operators.similarity import exact_rerank

        if m < k:
            raise ValueError(
                f"rerank candidate pool m={m} must be >= k={k} "
                "(stage 2 can only reorder what stage 1 supplies)"
            )
        cands = ranked.where(F.col("rn") <= m).select("q_id", "vec_id")
        return exact_rerank(rerank_corpus, queries, cands, k)
    _encode, adc_kernel, _qdf = _pq_machinery(
        None, queries, int(meta.dim), int(meta.m_blocks), cbmat=cbmat
    )
    pairs = cand.select(
        "q_id",
        "vec_id",
        adc_kernel(F.col("q_id"), F.col("codes")).alias("adc_raw"),
    )
    if rerank_corpus is None:
        return _rank_adc(pairs, k)
    from ccog_spark.operators.similarity import exact_rerank

    if m < k:
        raise ValueError(
            f"rerank candidate pool m={m} must be >= k={k} "
            "(stage 2 can only reorder what stage 1 supplies)"
        )
    cands = _rank_adc(pairs, m).select("q_id", "vec_id")
    return exact_rerank(rerank_corpus, queries, cands, k)


def _probed_candidates(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    meta,
    nprobe: int,
    vec_filter: str | None,
) -> DataFrame:
    """The quantizer-agnostic middle of an index query (round 15 —
    factored verbatim out of ``query_ivfpq_index`` so the SQ8 index
    shares it): probe-cell selection over the saved centroids,
    driver-known scan pruning into the cell-clustered codes layout,
    tombstone anti-join, optional vecmeta candidate filter, self-pair
    exclusion. Returns (q_id, vec_id, codes, …) candidate rows ready
    for whichever distance kernel the caller ranks with."""
    centroids = spark.read.parquet(os.path.join(index_dir, "centroids"))
    codes = spark.read.parquet(os.path.join(index_dir, "codes"))

    q = queries.select("q_id", "q_emb", norm(F.col("q_emb")).alias("qn"))
    pw = W.partitionBy("q_id").orderBy(
        F.col("p_cos").desc(), F.col("cent_id")
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
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
    # Driver-known probe set (query-batch-sized — the distance-kernel
    # model tables are already collected, so this adds no new scale
    # constraint): rebuild the probe frame with createDataFrame (repo
    # planner rule: no constraints ride on it into the join) and push
    # the cells as scan filters. grp is derived from the SAVED sorted
    # centroid ids — the same pure map the writer used.
    prows = probes.collect()
    probes = spark.createDataFrame(
        [(int(r.q_id), int(r.cell)) for r in prows],
        "q_id long, cell long",
    )
    crank = {
        int(r.cent_id): i
        for i, r in enumerate(
            sorted(centroids.select("cent_id").collect(),
                   key=lambda r: r.cent_id)
        )
    }
    n_groups = int(meta.n_groups)
    pcells = sorted({int(r.cell) for r in prows})
    pgrps = sorted({crank[c] * n_groups // len(crank) for c in pcells})
    # Push the probe set into the scan only while it PRUNES: a large
    # query batch (registry-scale probes ~40% of cells) reaches most
    # directories, where thousands of In() literals bloat the plan and
    # per-row filter evaluation while skipping nothing — fall back to
    # the plain broadcast join there (round-12 ADVICE). The 1/2
    # directory-coverage threshold keeps the selective case (the layout
    # probe's 4.6%-of-bytes reads) on the pruned path.
    cand = codes
    if len(pgrps) * 2 <= n_groups and len(pcells) <= 10_000:
        cand = cand.where(F.col("grp").isin(pgrps)).where(
            F.col("cell").isin(pcells)
        )
    # pending deletions (round 14): tombstoned vectors stay physical
    # until compact — drop them from the candidate stream AFTER the
    # scan filters (pruning intact) and BEFORE ranking, so a deleted
    # vector can neither appear in nor displace a top-k row
    cand = ic.anti_tombstones(
        cand, ic.read_tombstones(spark, index_dir, "vec_id"), "vec_id"
    )
    if vec_filter is not None:
        vm_dir = os.path.join(index_dir, "vecmeta")
        if not os.path.isdir(vm_dir):
            raise ValueError(
                f"index at {index_dir!r} was built without meta_cols — "
                "filtered search needs the vecmeta table (rebuild with "
                "build_ivfpq_index(..., meta_cols=(...)))"
            )
        allowed = (
            spark.read.parquet(vm_dir)
            .where(F.expr(vec_filter))
            .select("vec_id")
        )
        cand = cand.join(allowed, "vec_id", "left_semi")
    return (
        cand.join(F.broadcast(probes), "cell")
        .where(F.col("vec_id") != F.col("q_id"))
    )


def verify_ann_index(spark: SparkSession, index_dir: str) -> dict:
    """Integrity audit, ANN side (round 14 — verify_text_index's E36
    twin): recompute what the meta/cellstats tables claim from the
    PHYSICAL codes table. Catches the post-crash states the
    ``_inflight`` marker protocol cannot see once a marker has been
    manually deleted (the documented repair footgun): n_vectors
    drift, code rows assigned to cells no centroid owns, code arrays
    of the wrong PQ width, stale cellstats, vecmeta missing rows for
    live codes. Returns {"ok", "errors", "checked"} — never raises on
    inconsistency (rebuild is the repair). One pass over codes."""
    errors: list[str] = []
    if ic.inflight_op(index_dir) is not None:
        errors.append("inflight marker present (torn mutation)")
    meta = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    codes = spark.read.parquet(os.path.join(index_dir, "codes"))

    # expected code width: m_blocks sub-codes for PQ, one code per
    # dimension for SQ8 (round 15)
    width = (
        int(meta.dim)
        if _meta_quant(meta) in ("sq8", "sq8r")
        else int(meta.m_blocks)
    )
    agg = codes.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.size("codes") != width).cast("int")).alias("badlen"),
    ).first()
    if int(agg["n"]) != int(meta.n_vectors):
        errors.append(
            f"meta.n_vectors {int(meta.n_vectors)} != physical {agg['n']}"
        )
    if int(agg["badlen"] or 0):
        errors.append(f"{agg['badlen']} code rows with wrong code width")

    cent_ids = {
        int(r.cent_id)
        for r in spark.read.parquet(
            os.path.join(index_dir, "centroids")
        ).select("cent_id").collect()
    }
    # cell -1 is the documented null-embedding fallback
    orphan = codes.where(
        (~F.col("cell").isin(sorted(cent_ids))) & (F.col("cell") != -1)
    ).count()
    if orphan:
        errors.append(f"{orphan} code rows in cells no centroid owns")

    # cellstats drift (serves auto_nprobe): recount per-cell occupancy
    true_occ = {
        (int(r.cell), int(r.n))
        for r in codes.where(F.col("cell") != -1)
        .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    cs_path = os.path.join(index_dir, "cellstats")
    if os.path.isdir(cs_path):
        claimed = {
            (int(r.cell), int(r.n))
            for r in spark.read.parquet(cs_path).collect()
        }
        if claimed != true_occ:
            errors.append(
                f"cellstats drift: {len(claimed ^ true_occ)} cells differ"
            )

    vm_dir = os.path.join(index_dir, "vecmeta")
    if os.path.isdir(vm_dir):
        missing = (
            codes.select("vec_id")
            .join(
                spark.read.parquet(vm_dir).select("vec_id"),
                "vec_id", "left_anti",
            )
            .count()
        )
        if missing:
            errors.append(f"{missing} code rows without vecmeta metadata")

    # model-table presence per layout (round 15): an SQ8 index without
    # its per-dim stats (or a PQ index without its codebook) cannot
    # answer queries — a torn copy/restore state worth flagging here
    # rather than at first query
    if _meta_quant(meta) in ("sq8", "sq8r"):
        sq_dir = os.path.join(index_dir, "sqstats")
        if not os.path.isdir(sq_dir):
            errors.append(
                f"meta.quant={_meta_quant(meta)} but sqstats/ is missing"
            )
        else:
            n_dims = spark.read.parquet(sq_dir).count()
            if int(n_dims) != int(meta.dim):
                errors.append(
                    f"sqstats has {n_dims} rows, expected dim={meta.dim}"
                )
    elif not os.path.isdir(os.path.join(index_dir, "codebook")):
        errors.append(
            f"meta.quant={_meta_quant(meta)} but codebook/ is missing"
        )

    return {
        "ok": not errors,
        "errors": errors,
        "checked": {"n_vectors": int(agg["n"]), "n_centroids": len(cent_ids)},
    }
