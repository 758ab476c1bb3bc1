"""operators/bpe.py: distributed-count BPE training determinism,
encode/decode round-trip, and map-side tokenization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ccog_spark.operators import bpe


def _docs(spark):
    from ccog_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    return load_table(spark, SF_SMOKE, "documents")


def test_train_deterministic(spark):
    docs = _docs(spark).limit(200)
    m1 = bpe.train_bpe(docs, n_merges=50)
    m2 = bpe.train_bpe(docs, n_merges=50)
    assert m1 == m2
    assert len(m1) == 50
    assert all(isinstance(a, str) and isinstance(b, str) for a, b in m1)


def test_roundtrip_exact(spark):
    docs = _docs(spark).limit(300)
    # sentinel must be absent from the corpus for decode to be exact
    assert (
        docs.where(F.col("text").contains(bpe.EOW)).count() == 0
    )
    merges = bpe.train_bpe(docs, n_merges=120)
    out = bpe.tokenize(docs, merges).select("doc_id", "text", "bpe").collect()
    assert len(out) == 300
    for r in out:
        norm = " ".join(w for w in r.text.split(" ") if w)
        assert bpe.bpe_decode(r.bpe) == norm, r.doc_id


def test_merges_compress(spark):
    """More merges → fewer units per doc (monotone compression), and
    every unit decomposes back to corpus characters."""
    docs = _docs(spark).limit(200)
    m_small = bpe.train_bpe(docs, n_merges=10)
    m_big = bpe.train_bpe(docs, n_merges=150)
    n_small = (
        bpe.tokenize(docs, m_small)
        .select(F.sum(F.size("bpe")).alias("n"))
        .collect()[0]
        .n
    )
    n_big = (
        bpe.tokenize(docs, m_big)
        .select(F.sum(F.size("bpe")).alias("n"))
        .collect()[0]
        .n
    )
    assert n_big < n_small


def test_encode_word_matches_merge_order():
    """Hand-checked micro-case: merges apply by rank, not greedily by
    length."""
    ranks = {("a", "b"): 0, ("ab", "c" + bpe.EOW): 1, ("b", "c" + bpe.EOW): 2}
    assert bpe._encode_word("abc", ranks) == ["abc" + bpe.EOW]
    # 'bc' pair exists but rank 2 > rank 0: 'ab' merges first
    assert bpe._encode_word("abcx", {("a", "b"): 0, ("b", "c"): 1}) == [
        "ab",
        "c",
        "x" + bpe.EOW,
    ]


def _naive_train(word_cnt: dict[str, int], n_merges: int):
    """Reference recount-everything trainer (textbook spelling) — the
    incremental heap trainer must select the identical merge list."""
    vocab = {}
    for w, c in word_cnt.items():
        syms = tuple(w[:-1]) + (w[-1] + bpe.EOW,)
        vocab[syms] = vocab.get(syms, 0) + c
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, cnt in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        nv = {}
        for syms, cnt in vocab.items():
            key = tuple(bpe._merge_word(list(syms), best, merged))
            nv[key] = nv.get(key, 0) + cnt
        vocab = nv
    return merges


def test_incremental_matches_naive(spark):
    docs = _docs(spark).limit(150)
    wc = {
        r.word: int(r.cnt)
        for r in bpe.word_counts(docs).collect()
    }
    assert _naive_train(wc, 80) == bpe.train_bpe(docs, n_merges=80)


def test_sentinel_rejected(spark):
    bad = spark.createDataFrame(
        [(1, f"oops{bpe.EOW}token here")], ["doc_id", "text"]
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sentinel"):
        bpe.train_bpe(bad, n_merges=5)
    import py4j.protocol
    from pyspark.errors import PythonException

    good_merges = [("h", "e")]
    with _pytest.raises(
        (PythonException, py4j.protocol.Py4JJavaError)
    ):
        bpe.tokenize(bad, good_merges).collect()


def test_tokenize_ids_roundtrip(spark):
    docs = _docs(spark).limit(150)
    merges = bpe.train_bpe(docs, n_merges=100)
    alphabet = bpe.corpus_alphabet(docs)
    vocab = bpe.vocabulary(merges, alphabet)
    assert len(set(vocab)) == len(vocab)  # ids unambiguous
    joined = (
        bpe.tokenize(docs, merges)
        .select("doc_id", "bpe")
        .join(
            bpe.tokenize_ids(docs, merges, alphabet).select("doc_id", "ids"),
            "doc_id",
        )
        .collect()
    )
    for r in joined:
        assert len(r.bpe) == len(r.ids), r.doc_id
        # every unit the encoder emits on its own training corpus is
        # in-vocabulary, and ids decode back to the same units
        assert all(i >= 0 for i in r.ids), r.doc_id
        assert [vocab[i] for i in r.ids] == r.bpe, r.doc_id


def test_tokenize_ids_unk(spark):
    merges = [("a", "b")]
    df = spark.createDataFrame([(1, "ab zz")], ["doc_id", "text"])
    # alphabet from a DIFFERENT corpus (no 'z') → 'z' units are unk
    row = bpe.tokenize_ids(df, merges, alphabet=["a", "b"]).collect()[0]
    assert -1 in row.ids
    # alphabet from THIS corpus → full coverage, no unk
    row2 = bpe.tokenize_ids(
        df, merges, alphabet=bpe.corpus_alphabet(df)
    ).collect()[0]
    assert all(i >= 0 for i in row2.ids)


def test_encode_word_roundtrip_hypothesis():
    """Invariant: for ANY merge table, _encode_word's units concatenate
    back to word+EOW — merging only ever concatenates adjacent symbols
    of the same word, so decode is rank-table-independent."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.text(
        alphabet=st.characters(blacklist_characters="<> /"),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=200, deadline=None)
    @given(words, st.integers(0, 2**32 - 1))
    def check(w, seed):
        import random

        rng = random.Random(seed)
        # random merge table built from substrings of the word itself
        # (the only merges that can ever fire)
        syms = list(w[:-1]) + [w[-1] + bpe.EOW]
        ranks = {}
        for _ in range(rng.randint(0, 8)):
            if len(syms) < 2:
                break
            i = rng.randrange(len(syms) - 1)
            pair = (syms[i], syms[i + 1])
            if pair not in ranks:
                ranks[pair] = len(ranks)
            syms[i : i + 2] = [syms[i] + syms[i + 1]]
        units = bpe._encode_word(w, ranks)
        assert "".join(units) == w + bpe.EOW

    check()


def test_corpus_alphabet_guard(spark):
    """The limit(N+1) probe refuses adversarial high-cardinality
    'alphabets' instead of collecting them to the driver."""
    import pytest as _pytest

    # 40 distinct chars via chr() — fine normally, over a tiny cap
    docs = spark.createDataFrame(
        [("".join(chr(0x4E00 + i) for i in range(40)),)], ["text"]
    )
    with _pytest.raises(ValueError, match="alphabet exceeds"):
        bpe.corpus_alphabet(docs, max_alphabet=16)
    # under the cap: full alphabet, sorted
    a = bpe.corpus_alphabet(docs, max_alphabet=64)
    assert len(a) == 40 and a == sorted(a)


@pytest.mark.slow
def test_persisted_model_bit_identical_and_verified(spark, tmp_path):
    """Round-16 persisted tokenizer model: tokenize_ids_from_model ==
    the inline train+tokenize path row-for-row (the one-truth/two-
    paths contract); the saved (merges, alphabet) round-trip exactly;
    verify_bpe_model is green on a good model and flags a tampered
    rank sequence (gaps silently reorder every downstream encode)."""
    docs = _docs(spark).limit(200)
    merges = bpe.train_bpe(docs, n_merges=40)
    alpha = bpe.corpus_alphabet(docs)

    model = str(tmp_path / "bpe_model")
    meta = bpe.build_bpe_model(docs, model, n_merges=40)
    assert meta["n_merges"] == len(merges)
    m2, a2 = bpe.load_bpe_model(spark, model)
    assert m2 == merges and a2 == alpha

    inline = sorted(
        map(tuple, bpe.tokenize_ids(docs, merges, alpha)
            .select("doc_id", "ids").collect())
    )
    from_model = sorted(
        map(tuple, bpe.tokenize_ids_from_model(docs, model)
            .select("doc_id", "ids").collect())
    )
    assert [(d, tuple(i)) for d, i in inline] == [
        (d, tuple(i)) for d, i in from_model
    ] and inline

    assert bpe.verify_bpe_model(spark, model)["ok"]

    # tamper: shift one rank — the audit must flag the gap
    import os

    mdir = os.path.join(model, "merges")
    rows = spark.read.parquet(mdir).collect()
    bad = [
        (r.rank + 1 if r.rank == 0 else r.rank, r.left, r.right)
        for r in rows
    ]
    spark.createDataFrame(
        bad, "rank int, left string, right string"
    ).write.mode("overwrite").parquet(str(tmp_path / "merges_bad"))
    import shutil

    shutil.rmtree(mdir)
    os.rename(str(tmp_path / "merges_bad"), mdir)
    rep = bpe.verify_bpe_model(spark, model)
    assert not rep["ok"]
    assert any("0..n-1" in e for e in rep["errors"])

    # torn model (interrupted save): a missing table is an errors
    # entry, never a raise — the verify_*_index contract (ADVICE r16)
    shutil.rmtree(os.path.join(model, "alphabet"))
    rep2 = bpe.verify_bpe_model(spark, model)
    assert not rep2["ok"]
    assert any("alphabet" in e and "unreadable" in e for e in rep2["errors"])
    rep3 = bpe.verify_bpe_model(spark, str(tmp_path / "no_such_model"))
    assert not rep3["ok"] and rep3["errors"]


@pytest.mark.slow
def test_engine_facade_bpe_model(spark, tmp_path):
    """Engine.build_bpe_model / tokenize / verify_bpe_model round-trip
    and agree with the operator-level path."""
    from ccog_spark.engine import Engine
    from tests.conftest import SF_SMOKE

    eng = Engine(spark=spark, sf_dir=SF_SMOKE)
    docs = _docs(spark).limit(150)
    model = str(tmp_path / "eng_bpe")
    meta = eng.build_bpe_model(docs, model, n_merges=30)
    assert meta["n_merges"] == 30
    assert eng.verify_bpe_model(model)["ok"]
    a = sorted(
        map(tuple, eng.tokenize(docs, model)
            .select("doc_id", "ids").collect())
    )
    b = sorted(
        map(tuple, bpe.tokenize_ids_from_model(docs, model)
            .select("doc_id", "ids").collect())
    )
    assert [(d, tuple(i)) for d, i in a] == [(d, tuple(i)) for d, i in b]
    assert a
