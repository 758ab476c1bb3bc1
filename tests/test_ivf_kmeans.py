"""IVF with a real Spark ML KMeans quantizer: recall@k on planted
clusters vs the exact brute-force answer."""

import numpy as np
import pytest

from ccog_spark.operators import similarity

N_CLUSTERS = 4
PER_CLUSTER = 60
DIM = 16


@pytest.fixture(scope="module")
def planted(spark):
    """Well-separated gaussian blobs: cluster c centered at 10*e_c with
    sigma 0.5 — KMeans must recover them, and each query's true
    neighbors live in its own blob."""
    rng = np.random.default_rng(42)
    rows = []
    for c in range(N_CLUSTERS):
        center = np.zeros(DIM)
        center[c] = 10.0
        pts = center + rng.normal(0, 0.5, size=(PER_CLUSTER, DIM))
        for i, p in enumerate(pts):
            rows.append((c * PER_CLUSTER + i, [float(x) for x in p]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _queries(emb):
    from pyspark.sql import functions as F

    return emb.where(F.col("vec_id") % 30 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )


def test_kmeans_centroid_frame_shape(planted):
    cents = similarity.kmeans_centroids(planted, n_cells=N_CLUSTERS, seed=7)
    rows = cents.collect()
    assert len(rows) == N_CLUSTERS
    assert set(cents.columns) == {"cent_id", "c_emb", "c_nrm"}
    # each fitted center sits near one planted center (10 on one axis)
    for r in rows:
        assert abs(max(r.c_emb) - 10.0) < 1.0


def test_ivf_kmeans_recall_at_k(planted):
    k = 5
    cents = similarity.kmeans_centroids(planted, n_cells=N_CLUSTERS, seed=7)
    exact = similarity.brute_force_topk(planted, _queries(planted), k=k)
    approx = similarity.ivf_topk(
        planted, _queries(planted), k=k, nprobe=1, centroids=cents
    )
    truth = {(r.q_id, r.vec_id) for r in exact.collect()}
    got = {(r.q_id, r.vec_id) for r in approx.collect()}
    recall = len(truth & got) / len(truth)
    # blobs are far apart: nprobe=1 over a correct fit must recover
    # essentially all true neighbors
    assert recall >= 0.95, f"recall@{k} = {recall}"


def test_ivf_kmeans_same_shape_as_subsample_variant(planted):
    cents = similarity.kmeans_centroids(planted, n_cells=N_CLUSTERS, seed=7)
    a = similarity.ivf_topk(planted, _queries(planted), k=3, centroids=cents)
    b = similarity.ivf_topk(planted, _queries(planted), k=3)
    assert a.columns == b.columns


# ------------------------------------------------ product quantization
def test_pq_blob_recall(planted):
    """PQ ADC ranking must keep neighbors inside the query's own blob:
    blobs are separated by ~10 on one axis while intra-blob distances
    are ~0.5-sigma, far larger than PQ quantization error."""
    res = similarity.pq_topk(planted, _queries(planted), dim=DIM, k=5)
    for r in res.collect():
        assert r.q_id // PER_CLUSTER == r.vec_id // PER_CLUSTER, (
            f"query {r.q_id} matched cross-blob vector {r.vec_id}"
        )


def test_pq_planted_duplicate_is_top1(planted):
    """An exact copy of a query vector has identical PQ codes, hence
    the minimal possible ADC — it must rank first."""
    from pyspark.sql import functions as F

    spark = planted.sparkSession
    q_src = planted.where(F.col("vec_id") == 0).collect()[0]
    dup = spark.createDataFrame(
        [(99999, q_src.embedding)], "vec_id long, embedding array<double>"
    )
    corpus = planted.unionByName(dup)
    queries = spark.createDataFrame(
        [(0, q_src.embedding)], "q_id long, q_emb array<double>"
    )
    top = similarity.pq_topk(corpus, queries, dim=DIM, k=3).collect()
    # the duplicate's ADC equals the query's own quantization residual,
    # <= any other corpus vector's ADC — it must hold rank 1
    assert top[0].vec_id == 99999
    assert all(top[0].adc <= r.adc for r in top[1:])


def test_ivfpq_blob_recall(planted):
    """IVF pruning + PQ ranking composed must still keep neighbors
    inside the query's own blob (cells align with blobs; ADC error is
    tiny vs the inter-blob separation)."""
    res = similarity.ivfpq_topk(
        planted, _queries(planted), dim=DIM, k=5, cent_stride=25
    )
    rows = res.collect()
    assert rows  # pruning must not empty the candidate set
    for r in rows:
        assert r.q_id // PER_CLUSTER == r.vec_id // PER_CLUSTER


def test_ivfpq_subset_of_pq_per_query(planted):
    """Within the probed cells, IVFPQ's ADC values must equal full
    PQ's for the same (q_id, vec_id) pairs — pruning changes the
    candidate set, never the metric."""
    q = _queries(planted)
    full = {
        (r.q_id, r.vec_id): r.adc
        for r in similarity.pq_topk(planted, q, dim=DIM, k=1000).collect()
    }
    for r in similarity.ivfpq_topk(planted, q, dim=DIM, k=5).collect():
        assert full[(r.q_id, r.vec_id)] == r.adc


def test_null_embedding_fails_loudly(spark):
    """The coalesce(-1) join-key spelling in lsh/ivfpq relies on the
    Arrow kernels RAISING on null embeddings (so the sentinel branch
    is dead, and no null row can silently match another null row).
    Pin that: a null embedding must crash the kernel, not flow."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from ccog_spark.operators.similarity import lsh_topk

    corpus = spark.createDataFrame(
        [(1, [0.5] * 8), (2, None)], "vec_id long, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [(1, [0.5] * 8)], "q_id long, q_emb array<float>"
    )
    with _pytest.raises((PythonException, Py4JJavaError)):
        lsh_topk(corpus, queries, dim=8, k=1).collect()


def test_hierarchical_assigner_contracts():
    """Round-10 shared √C assigner (used by semantic dedup, ivfpq_topk
    and ann_index): a pinned stride ≥ C must equal the flat argmax
    bit-for-bit; the default √C hierarchy must emit only real cent_ids,
    assign centroids' own vectors to themselves, and map identical
    inputs identically; a memberless coarse cell (forced via a
    duplicate-direction coarse centroid) must fall back to the exact
    full scan instead of crashing."""
    import numpy as np

    from ccog_spark.operators.similarity import hierarchical_assigner

    rng = np.random.default_rng(11)
    C, dim, n = 200, 16, 500
    cmat = rng.normal(size=(C, dim))
    cent_ids = np.arange(10, 10 + C, dtype="i8")
    cnrm = np.sqrt((cmat * cmat).sum(1))
    x = rng.normal(size=(n, dim))
    xn = np.sqrt((x * x).sum(1))

    flat = cent_ids[
        ((x @ cmat.T) / (xn[:, None] * cnrm[None, :])).argmax(1)
    ]
    pinned = hierarchical_assigner(cent_ids, cmat, cnrm, coarse_stride=C)
    assert np.array_equal(pinned(x, xn), flat)

    default = hierarchical_assigner(cent_ids, cmat, cnrm)
    out = default(x, xn)
    assert set(out.tolist()) <= set(cent_ids.tolist())
    # centroids' own vectors: exact self-match survives the hierarchy
    assert np.array_equal(default(cmat, cnrm), cent_ids)
    # identical inputs co-assign (pure function of the vector)
    two = np.stack([x[0], x[0]])
    t = default(two, np.sqrt((two * two).sum(1)))
    assert t[0] == t[1]

    # forced orphan: duplicate the rank-0 centroid's direction at a
    # later COARSE rank (stride=14 ⇒ ranks 0,14,28,… are coarse);
    # rank 14's coarse cell then loses every tie to rank 0 and is
    # memberless — the full-scan fallback must still place vectors
    cm2 = cmat.copy()
    cm2[14] = 2.0 * cm2[0]
    cn2 = np.sqrt((cm2 * cm2).sum(1))
    orph = hierarchical_assigner(cent_ids, cm2, cn2, coarse_stride=14)
    o = orph(x, xn)
    assert set(o.tolist()) <= set(cent_ids.tolist()) and len(o) == n


def test_hierarchical_assigner_empty_centroids_raises():
    """C == 0 (stride/filter selection matched nothing) must fail at
    CONSTRUCTION with a clear ValueError, not as an opaque numpy
    argmax-over-empty-axis error inside a pandas_udf on first use
    (ADVICE r10)."""
    import numpy as np

    from ccog_spark.operators.similarity import hierarchical_assigner

    with pytest.raises(ValueError, match="no centroids"):
        hierarchical_assigner(
            np.empty(0, "i8"), np.empty((0, 8), "f8"), np.empty(0, "f8")
        )


def test_hierarchical_assigner_blockwise_cmap_parity(monkeypatch):
    """The centroid→coarse map is computed in _CMAP_BLOCK row blocks
    (r11: bounds driver peak memory at O(block·√C) instead of
    O(C·√C)). Per-row argmax is independent, so a tiny block size
    must produce bit-identical assignments to one covering all of C."""
    import numpy as np

    from ccog_spark.operators import similarity

    rng = np.random.default_rng(23)
    C, dim, n = 157, 12, 400
    cmat = rng.normal(size=(C, dim))
    cent_ids = np.arange(C, dtype="i8")
    cnrm = np.sqrt((cmat * cmat).sum(1))
    x = rng.normal(size=(n, dim))
    xn = np.sqrt((x * x).sum(1))

    one_shot = similarity.hierarchical_assigner(cent_ids, cmat, cnrm)(x, xn)
    monkeypatch.setattr(similarity, "_CMAP_BLOCK", 7)  # forces 23 blocks
    chunked = similarity.hierarchical_assigner(cent_ids, cmat, cnrm)(x, xn)
    assert np.array_equal(one_shot, chunked)


# ------------------------------------------- scalar quantization (SQ8)
def test_sq8_stats_shape_and_constant_dim(spark):
    """Per-dim (min, range) over the corpus; a constant dimension gets
    range 0 and reconstructs to exactly that constant (the rng=0
    branch)."""
    from pyspark.sql import functions as F

    emb = spark.createDataFrame(
        [(i, [float(i % 7), 5.0, -float(i % 3)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    mins, rngs = similarity.sq8_stats(emb, 3)
    assert mins == [0.0, 5.0, -2.0]
    assert rngs == [6.0, 0.0, 2.0]
    got = similarity.ivfsq_topk(emb, _queries(emb), dim=3, k=3,
                                cent_stride=7, nprobe=2)
    assert got.columns == ["q_id", "vec_id", "cos", "rn"]
    assert got.count() > 0


def test_sq8_recall_near_exact(planted):
    """SQ8's asymmetric reconstructed distances are near-exact (bin
    width = range/255 per dim, far below the 0.5-sigma intra-blob
    spread): with the full probe budget, top-k must essentially match
    the exact in-cell ranking — the property PQ cannot give, i.e. the
    reason SQ8 exists between raw floats and PQ."""
    k = 5
    exact = similarity.ivf_topk(
        planted, _queries(planted), k=k, cent_stride=25,
        nprobe=N_CLUSTERS + 2,
    )
    sq = similarity.ivfsq_topk(
        planted, _queries(planted), dim=DIM, k=k, cent_stride=25,
        nprobe=N_CLUSTERS + 2,
    )
    truth = {(r.q_id, r.vec_id) for r in exact.collect()}
    got = {(r.q_id, r.vec_id) for r in sq.collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.95, f"SQ8 recall@{k} vs exact-IVF = {recall}"
    # and neighbors never cross blobs
    for r in sq.collect():
        assert r.q_id // PER_CLUSTER == r.vec_id // PER_CLUSTER


def test_merged_centroid_codebook_collect_bit_identical(planted):
    """Round 17: _ivf_centroid_and_codebook_arrays does ONE collect for
    what _ivf_centroid_arrays + the _pq_machinery subsample did in two
    driver actions — every array must be byte-identical to the
    separate collects."""
    from pyspark.sql import functions as F

    from ccog_spark.operators.similarity import (
        PQ_CB_K,
        PQ_CB_MOD,
        PQ_CB_RES,
        _ivf_centroid_and_codebook_arrays,
        _ivf_centroid_arrays,
    )

    stride = 25
    ids1, cmat1, cnrm1 = _ivf_centroid_arrays(planted, stride)
    ids2, cmat2, cnrm2, cbmat2 = _ivf_centroid_and_codebook_arrays(
        planted, stride
    )
    assert (ids1 == ids2).all()
    assert (cmat1 == cmat2).all() and (cnrm1 == cnrm2).all()

    # the codebook subsample, spelled exactly as _pq_machinery does
    cb_rows = (
        planted.where(F.col("vec_id") % PQ_CB_MOD == PQ_CB_RES)
        .orderBy("vec_id")
        .limit(PQ_CB_K)
        .collect()
    )
    cbmat1 = np.array([[float(x) for x in r.embedding] for r in cb_rows], "f8")
    assert cbmat1.shape == cbmat2.shape
    assert (cbmat1 == cbmat2).all()
