"""Index deletion (round 14, VERDICT r13 #2): tombstone lifecycle for
the persisted BM25 and IVF+PQ indexes — bit-identity of
query-after-delete with a from-scratch build over the survivors,
compaction applying tombstones physically, idempotency, and
torn-mutation detection (the _inflight marker, ADVICE r13)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ccog_spark.operators import index_common as ic
from ccog_spark.operators.ann_index import (
    _code_frame,
    _load_model,
    _write_clustered_codes,
    build_ivfpq_index,
    compact_ann_index,
    delete_from_ann_index,
    query_ivfpq_index,
)
from ccog_spark.operators.text_index import (
    append_to_text_index,
    build_bm25_index,
    compact_text_index,
    delete_from_text_index,
    query_bm25_index,
)
from tests.conftest import SF_SMOKE

EMB_DIM = 64


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def _emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def _queries(spark, docs):
    return docs.where(F.col("doc_id") % 97 == 11).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 3), " "
        ).alias("q_text"),
    )


def _vqueries(emb):
    return emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------- text


@pytest.mark.slow
def test_text_delete_equals_fromscratch_survivors(spark, tmp_path):
    """build(full) + delete(slice) answers BIT-IDENTICALLY to
    build(survivors) — df decrements, n_docs/sum_dl rewrite, and the
    tombstone anti-joins all line up with the from-scratch truth
    (same pinned n_buckets on both sides)."""
    docs = _docs(spark)
    qs = _queries(spark, docs)
    dels = docs.where(F.col("doc_id") % 13 == 3).select("doc_id")
    surv = docs.where(F.col("doc_id") % 13 != 3)

    idx = str(tmp_path / "del_idx")
    build_bm25_index(docs, idx, n_buckets=64)
    out = delete_from_text_index(spark, idx, dels)
    assert out["deleted"] == dels.count() > 0
    assert out["generation"] == 2

    ref = str(tmp_path / "ref_idx")
    ref_meta = build_bm25_index(surv, ref, n_buckets=64)
    assert out["n_docs"] == ref_meta["n_docs"]
    assert out["sum_dl"] == ref_meta["sum_dl"]
    assert out["n_terms"] == ref_meta["n_terms"]

    a = _rows(query_bm25_index(spark, idx, qs, k=5))
    b = _rows(query_bm25_index(spark, ref, qs, k=5))
    assert a == b and len(a) > 0
    # no tombstoned doc can surface
    del_set = {r.doc_id for r in dels.collect()}
    assert not del_set & {r[1] for r in a}


@pytest.mark.slow
def test_text_delete_with_docs_delta_matches_postings_path(
    spark, tmp_path
):
    """The scale path (df decrement from re-tokenizing the provided
    delta — no postings scan) produces the same index state as the
    postings-scan path."""
    docs = _docs(spark)
    qs = _queries(spark, docs)
    dels = docs.where(F.col("doc_id") % 13 == 3)

    via_scan = str(tmp_path / "scan_idx")
    build_bm25_index(docs, via_scan, n_buckets=64)
    m1 = delete_from_text_index(
        spark, via_scan, dels.select("doc_id")
    )

    via_delta = str(tmp_path / "delta_idx")
    build_bm25_index(docs, via_delta, n_buckets=64)
    m2 = delete_from_text_index(
        spark, via_delta, dels.select("doc_id"), docs_delta=dels
    )
    assert (m1["n_docs"], m1["sum_dl"], m1["n_terms"]) == (
        m2["n_docs"], m2["sum_dl"], m2["n_terms"]
    )
    assert _rows(query_bm25_index(spark, via_scan, qs, k=5)) == _rows(
        query_bm25_index(spark, via_delta, qs, k=5)
    )


@pytest.mark.slow
def test_text_delete_is_idempotent(spark, tmp_path):
    """Deleting the same ids twice must not double-decrement df or
    n_docs — the second call is a no-op."""
    docs = _docs(spark)
    qs = _queries(spark, docs)
    dels = docs.where(F.col("doc_id") % 13 == 3).select("doc_id")
    idx = str(tmp_path / "idem_idx")
    build_bm25_index(docs, idx, n_buckets=64)
    m1 = delete_from_text_index(spark, idx, dels)
    before = _rows(query_bm25_index(spark, idx, qs, k=5))
    m2 = delete_from_text_index(spark, idx, dels)
    assert m2["deleted"] == 0
    assert m2["generation"] == m1["generation"]  # nothing mutated
    assert _rows(query_bm25_index(spark, idx, qs, k=5)) == before


@pytest.mark.slow
def test_text_compact_applies_tombstones(spark, tmp_path):
    """compact after delete: answers unchanged, tombstone set
    cleared, postings/doclens physically exclude the deleted ids, and
    a re-delete of the same ids stays a no-op."""
    docs = _docs(spark)
    qs = _queries(spark, docs)
    dels = docs.where(F.col("doc_id") % 13 == 3).select("doc_id")
    idx = str(tmp_path / "cmp_idx")
    build_bm25_index(docs, idx, n_buckets=64)
    delete_from_text_index(spark, idx, dels)
    before = _rows(query_bm25_index(spark, idx, qs, k=5))

    n_del = dels.count()
    out = compact_text_index(spark, idx)
    assert out["tombstones_applied"] == n_del
    assert not os.path.isdir(ic.tombstones_path(idx))

    assert _rows(query_bm25_index(spark, idx, qs, k=5)) == before
    del_set = {r.doc_id for r in dels.collect()}
    post_ids = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(idx, "postings"))
        .select("doc_id").distinct().collect()
    }
    dl_ids = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(idx, "doclens")).collect()
    }
    assert not del_set & post_ids
    assert not del_set & dl_ids
    assert delete_from_text_index(spark, idx, dels)["deleted"] == 0


@pytest.mark.slow
def test_text_delete_then_append_composes(spark, tmp_path):
    """Maintenance verbs compose: delete a slice, append a disjoint
    delta — answers equal a from-scratch build over (survivors ∪
    delta)."""
    docs = _docs(spark)
    qs = _queries(spark, docs)
    base = docs.where(F.col("doc_id") % 7 != 0)
    delta = docs.where(F.col("doc_id") % 7 == 0)
    dels = base.where(F.col("doc_id") % 13 == 3).select("doc_id")

    idx = str(tmp_path / "mix_idx")
    build_bm25_index(base, idx, n_buckets=64)
    delete_from_text_index(spark, idx, dels)
    app = append_to_text_index(delta, idx)
    assert app["appended"] == delta.count()
    assert "vocab_growth" in app and app["new_terms"] >= 0

    ref = str(tmp_path / "mix_ref")
    truth = base.where(F.col("doc_id") % 13 != 3).unionByName(delta)
    build_bm25_index(truth, ref, n_buckets=64)
    assert _rows(query_bm25_index(spark, idx, qs, k=5)) == _rows(
        query_bm25_index(spark, ref, qs, k=5)
    )


@pytest.mark.slow
def test_text_torn_mutation_detected(spark, tmp_path, monkeypatch):
    """ADVICE r13 (text_index.py:137): a crash between the
    postings/doclens commit and the terms/meta rewrite must be
    DETECTABLE — the _inflight marker survives the failed append and
    the query side refuses the index instead of silently mis-scoring;
    a second mutation refuses to stack; rebuild (the documented
    repair) recovers."""
    docs = _docs(spark)
    qs = _queries(spark, docs)
    base = docs.where(F.col("doc_id") % 7 != 0)
    delta = docs.where(F.col("doc_id") % 7 == 0)
    idx = str(tmp_path / "torn_idx")
    build_bm25_index(base, idx, n_buckets=64)

    import shutil as _shutil

    real_rmtree = _shutil.rmtree

    def crash_rmtree(path, *a, **k):
        if str(path).endswith("terms"):  # crash mid-swap: worst spot
            raise OSError("injected crash between append steps")
        return real_rmtree(path, *a, **k)

    monkeypatch.setattr(_shutil, "rmtree", crash_rmtree)
    with pytest.raises(OSError, match="injected crash"):
        append_to_text_index(delta, idx)
    monkeypatch.setattr(_shutil, "rmtree", real_rmtree)

    # postings/doclens already carry the delta, terms/meta do not —
    # exactly the silent-wrong-scores state; both verbs refuse
    assert ic.inflight_op(idx)["op"] == "append"
    with pytest.raises(RuntimeError, match="torn 'append'"):
        query_bm25_index(spark, idx, qs, k=5)
    with pytest.raises(RuntimeError, match="torn 'append'"):
        delete_from_text_index(
            spark, idx, docs.limit(1).select("doc_id")
        )
    # repair: rebuild from the corpus
    real_rmtree(idx)
    build_bm25_index(base.unionByName(delta), idx, n_buckets=64)
    assert len(_rows(query_bm25_index(spark, idx, qs, k=5))) > 0


# ----------------------------------------------------------------- ann


@pytest.mark.slow
def test_ann_delete_equals_frozen_model_survivors(spark, tmp_path):
    """build(full) + delete(slice) answers BIT-IDENTICALLY to an
    index whose codes were encoded from the SURVIVORS under the same
    frozen model (the append contract mirrored — ADC has no corpus
    statistics, so candidate exclusion is the whole delta)."""
    emb = _emb(spark)
    qs = _vqueries(emb)
    dels = emb.where(F.col("vec_id") % 11 == 5).select("vec_id")

    idx = str(tmp_path / "ann_del")
    meta = build_ivfpq_index(emb, EMB_DIM, idx, n_groups=16)
    out = delete_from_ann_index(spark, idx, dels)
    assert out["tombstoned"] == dels.count() > 0

    # twin: same saved model, codes encoded from survivors only
    ref = str(tmp_path / "ann_ref")
    import shutil

    shutil.copytree(idx, ref)
    shutil.rmtree(os.path.join(ref, "codes"))
    ic.clear_tombstones(ref)
    m, cent_ids, cmat, cnrm, cbmat = _load_model(spark, ref)
    surv = emb.where(F.col("vec_id") % 11 != 5)
    codes = _code_frame(
        surv, cent_ids, cmat, cnrm, cbmat, EMB_DIM, int(m.m_blocks)
    )
    _write_clustered_codes(
        codes, cent_ids, os.path.join(ref, "codes"),
        int(meta["n_groups"]), "overwrite",
    )

    a = _rows(query_ivfpq_index(spark, idx, qs, k=3))
    b = _rows(query_ivfpq_index(spark, ref, qs, k=3))
    assert a == b and len(a) > 0
    del_set = {r.vec_id for r in dels.collect()}
    assert not del_set & {r[1] for r in a}


@pytest.mark.slow
def test_ann_compact_applies_tombstones(spark, tmp_path):
    """compact after delete: answers unchanged (also on the rerank
    path), tombstones cleared, codes physically exclude the ids,
    meta.n_vectors drops to the surviving count."""
    emb = _emb(spark)
    qs = _vqueries(emb)
    dels = emb.where(F.col("vec_id") % 11 == 5).select("vec_id")
    idx = str(tmp_path / "ann_cmp")
    meta = build_ivfpq_index(emb, EMB_DIM, idx, n_groups=16)
    delete_from_ann_index(spark, idx, dels)
    before = _rows(query_ivfpq_index(spark, idx, qs, k=3))
    before_rr = _rows(
        query_ivfpq_index(spark, idx, qs, k=3, rerank_corpus=emb, m=8)
    )

    n_del = dels.count()
    out = compact_ann_index(spark, idx)
    assert out["tombstones_applied"] == n_del
    assert not os.path.isdir(ic.tombstones_path(idx))

    assert _rows(query_ivfpq_index(spark, idx, qs, k=3)) == before
    assert (
        _rows(
            query_ivfpq_index(
                spark, idx, qs, k=3, rerank_corpus=emb, m=8
            )
        )
        == before_rr
    )
    del_set = {r.vec_id for r in dels.collect()}
    codes_ids = {
        r.vec_id
        for r in spark.read.parquet(os.path.join(idx, "codes"))
        .select("vec_id").collect()
    }
    assert not del_set & codes_ids
    n_vec = (
        spark.read.parquet(os.path.join(idx, "meta")).first()["n_vectors"]
    )
    assert n_vec == int(meta["n_vectors"]) - n_del
    # double delete after compact: all ids re-tombstone harmlessly
    # (absent from codes, so answers cannot change)
    delete_from_ann_index(spark, idx, dels)
    assert _rows(query_ivfpq_index(spark, idx, qs, k=3)) == before


def test_ann_delete_idempotent_and_marker(spark, tmp_path):
    """Second delete of the same ids tombstones nothing; a leftover
    _inflight marker blocks queries with the repair message."""
    emb = _emb(spark)
    qs = _vqueries(emb)
    dels = emb.where(F.col("vec_id") % 11 == 5).select("vec_id")
    idx = str(tmp_path / "ann_idem")
    build_ivfpq_index(emb, EMB_DIM, idx, n_groups=16)
    assert delete_from_ann_index(spark, idx, dels)["tombstoned"] > 0
    assert delete_from_ann_index(spark, idx, dels)["tombstoned"] == 0

    ic.begin_mutation(idx, "delete")
    with pytest.raises(RuntimeError, match="torn 'delete'"):
        query_ivfpq_index(spark, idx, qs, k=3)
    ic.end_mutation(idx)
    assert len(_rows(query_ivfpq_index(spark, idx, qs, k=3))) > 0


def test_verify_text_index_clean_and_corrupt(spark, tmp_path):
    """verify_text_index (round 14): green on a fresh build, green
    through the delete lifecycle, and LOUD on the documented repair
    footgun — clearing tombstones without compacting leaves postings
    rows the df-decremented terms/meta no longer account for."""
    from pyspark.sql import functions as F

    from ccog_spark.operators import index_common as ic
    from ccog_spark.operators.text_index import (
        build_bm25_index,
        delete_from_text_index,
        verify_text_index,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    idx = str(tmp_path / "vfy")
    build_bm25_index(docs, idx)
    r = verify_text_index(spark, idx)
    assert r["ok"], r["errors"]

    delete_from_text_index(
        spark, idx, docs.where(F.col("doc_id") % 13 == 3).select("doc_id")
    )
    r = verify_text_index(spark, idx)
    assert r["ok"], r["errors"]  # tombstones accounted for

    ic.clear_tombstones(idx)  # the footgun: logical delete forgotten
    r = verify_text_index(spark, idx)
    assert not r["ok"]
    assert any("df drift" in e for e in r["errors"])
    assert any("n_docs" in e for e in r["errors"])


def test_verify_ann_index_clean_and_corrupt(spark, tmp_path):
    """verify_ann_index (round 14): green on build + append, loud when
    physical codes are lost behind meta's back (a grp directory
    removed out-of-band)."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from ccog_spark.operators.ann_index import (
        append_to_index,
        build_ivfpq_index,
        verify_ann_index,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    idx = str(tmp_path / "vfy_ann")
    build_ivfpq_index(
        emb.where(F.col("vec_id") % 3 != 0), dim, idx, meta_cols=("label",)
    )
    append_to_index(emb.where(F.col("vec_id") % 3 == 0), idx)
    r = verify_ann_index(spark, idx)
    assert r["ok"], r["errors"]
    assert r["checked"]["n_vectors"] == emb.count()

    victims = sorted(glob.glob(f"{idx}/codes/grp=*"))
    shutil.rmtree(victims[len(victims) // 2])  # lose a directory
    r = verify_ann_index(spark, idx)
    assert not r["ok"]
    assert any("n_vectors" in e for e in r["errors"])


def test_text_delete_refuses_tampered_docs_delta(spark, tmp_path):
    """Round 15 (VERDICT r14 #6): delete_from_text_index(docs_delta=…)
    used to TRUST the caller's delta text — a delta differing from
    what was indexed silently drifted the df decrements away from a
    from-scratch build. Now the delta's per-doc token counts are
    checked against the stored doclens rows (already read on the
    delete path) and a mismatch refuses loudly, releasing the
    _inflight marker (nothing was mutated)."""
    docs = _docs(spark)
    dels = docs.where(F.col("doc_id") % 13 == 3)
    idx = str(tmp_path / "tamper_idx")
    build_bm25_index(docs, idx, n_buckets=64)
    meta_before = spark.read.parquet(f"{idx}/meta").collect()[0]

    tampered = dels.select(
        "doc_id", F.concat(F.col("text"), F.lit(" extra token")).alias("text")
    )
    with pytest.raises(ValueError, match="docs_delta does not match"):
        delete_from_text_index(
            spark, idx, dels.select("doc_id"), docs_delta=tampered
        )
    # marker released, index untouched — the honest delta still works
    assert ic.inflight_op(idx) is None
    assert (
        spark.read.parquet(f"{idx}/meta").collect()[0] == meta_before
    )
    m = delete_from_text_index(
        spark, idx, dels.select("doc_id"), docs_delta=dels
    )
    assert m["deleted"] == dels.count()
