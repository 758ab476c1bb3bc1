"""Property tests for the dedup candidate-generation claims.

The ngram dedup's PPJoin pruning (prefix + positional + length
filters, operators/dedup.py::ngram_jaccard_pairs) is claimed LOSSLESS:
the filtered banded join must return exactly the pairs a brute-force
all-pairs Jaccard join returns, for any corpus and threshold. These
tests check that equivalence on seeded random corpora with planted
near-duplicates — the adversarial shape for prefix filtering, since
mutated copies share most (but not all) of their rare shingles.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ccog_spark.operators.dedup import (
    exact_dedup,
    jaccard,
    keep_first,
    ngram_jaccard_pairs,
    with_shingle_hashes,
)

VOCAB = [f"w{i}" for i in range(40)]


def _corpus(seed: int, n_docs: int = 60) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs // 2):
        words = rng.choices(VOCAB, k=rng.randint(8, 30))
        docs.append(" ".join(words))
        # planted near-duplicate: mutate a few positions of the original
        mutated = list(words)
        for _ in range(rng.randint(0, 3)):
            mutated[rng.randrange(len(mutated))] = rng.choice(VOCAB)
        docs.append(" ".join(mutated))
    return list(enumerate(docs))


def _brute_force(spark, rows, jaccard_min: float):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    base = with_shingle_hashes(df, "text").select("doc_id", "sh")
    a = base.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = base.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    pairs = (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4).alias("jac"),
        )
        .where(F.col("jac") >= jaccard_min)
    )
    return {(r.doc_a, r.doc_b, r.jac) for r in pairs.collect()}


@pytest.mark.parametrize("seed,jaccard_min", [(0, 0.5), (1, 0.5), (2, 0.7), (3, 0.3)])
@pytest.mark.slow
def test_ppjoin_pruning_is_lossless(spark, seed, jaccard_min):
    rows = _corpus(seed)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.doc_a, r.doc_b, r.jac)
        for r in ngram_jaccard_pairs(df, jaccard_min=jaccard_min).collect()
    }
    want = _brute_force(spark, rows, jaccard_min)
    assert got == want
    assert want, "fixture must plant at least one real near-dup pair"

def test_ppjoin_bytes_gate_forces_both_paths(spark, monkeypatch):
    """The broadcast probe is gated on estimated BYTES (rows × 16 B);
    forcing the gate to 0 must take the distributed build and return
    identical pairs to the broadcast fast path."""
    from ccog_spark.operators import dedup as dd

    rows = _corpus(9)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fast = {
        (r.doc_a, r.doc_b, r.jac)
        for r in ngram_jaccard_pairs(df, jaccard_min=0.5).collect()
    }
    assert dd._LAST_PREFIX_PATH == "broadcast"
    monkeypatch.setattr(dd, "_PPJOIN_BCAST_MAX", 0)
    slow = {
        (r.doc_a, r.doc_b, r.jac)
        for r in ngram_jaccard_pairs(df, jaccard_min=0.5).collect()
    }
    assert dd._LAST_PREFIX_PATH == "distributed"
    assert fast == slow and fast


def test_remove_duplicate_lines_rebuild(spark):
    """Line dedup + rebuild invariants: keep-first across the corpus
    (by doc_id then position), order-preserving reassembly, empty-doc
    survival, min_chars bypass."""
    from ccog_spark.operators.dedup import remove_duplicate_lines

    docs = spark.createDataFrame(
        [
            (1, "header\nalpha\n\nfooter"),
            (2, "header\nbeta\nfooter"),
            (3, "header\nfooter"),
            (4, "\n\n"),  # only empty lines
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in remove_duplicate_lines(docs, min_chars=1).collect()
    }
    # first occurrences survive; later repeats dropped; order preserved
    assert out[1].text == "header\nalpha\n\nfooter"
    assert out[2].text == "beta"
    assert out[3].text == ""
    assert (out[2].n_lines, out[2].n_dropped) == (3, 2)
    # empty lines are below min_chars: kept unconditionally
    assert out[4].text == "\n\n" and out[4].n_dropped == 0
    # idempotence: a second pass drops nothing new
    again = remove_duplicate_lines(
        spark.createDataFrame(
            [(k, v.text) for k, v in out.items()], ["doc_id", "text"]
        ),
        min_chars=1,
    ).collect()
    assert all(r.n_dropped == 0 for r in again)


def test_keep_first_matches_exact_dedup(spark):
    """keep_first == exact_dedup keepers, with identical columns —
    one aggregate instead of flag+join."""
    from ccog_spark.operators.dedup import exact_dedup, keep_first

    docs = spark.createDataFrame(
        [(3, "a", "x"), (1, "a", "y"), (2, "b", "z"), (4, "b", "w")],
        ["doc_id", "text", "extra"],
    )
    a = {tuple(r) for r in keep_first(docs).collect()}
    b = {
        tuple(r)[:-1]
        for r in exact_dedup(docs).where("is_keeper").collect()
    }
    assert a == b == {(1, "a", "y"), (2, "b", "z")}
    assert keep_first(docs).columns == docs.columns


def test_exact_dedup_keeps_null_text_rows(spark):
    """NULL-text rows survive BOTH dedup spellings and agree: md5(NULL)
    is NULL, and an equi-join on the hash silently dropped those rows
    while keep_first's groupBy retained them (round-7 ADVICE). The
    sentinel hash makes all NULL-text rows one dedup group in both."""
    docs = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "a")],
        "doc_id int, text string",
    )
    flagged = exact_dedup(docs).collect()
    assert len(flagged) == 4  # no row lost
    assert {r.doc_id for r in flagged if r.is_keeper} == {1, 2}
    kept = {(r.doc_id, r.text) for r in keep_first(docs).collect()}
    assert kept == {(1, "a"), (2, None)}


def test_remove_repeated_spans_semantics(spark):
    """Exact-substring (span) dedup invariants: keep-first by
    (doc_id, pos) across the corpus, overlapping spans merge, short
    docs pass through, within-doc repeats drop, idempotence."""
    from ccog_spark.operators.dedup import remove_repeated_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),        # source of the repeated span
            (2, "x a b c d y"),        # contains repeat of (a b c d)
            (3, "a b c d a b c d"),    # cross-doc repeat AND self-repeat
            (4, "p q"),                # shorter than k: untouched
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r for r in remove_repeated_spans(docs, k=4).collect()
    }
    # doc 1 holds every first occurrence: nothing dropped
    assert out[1].text == "a b c d e f" and out[1].n_dropped == 0
    # doc 2: window (a b c d) at pos 1 repeats doc 1 pos 0 -> drop 4
    assert out[2].text == "x y" and out[2].n_dropped == 4
    # doc 3: every 4-window repeats doc 1's prefix or overlaps one
    # that does -> the whole text is covered
    assert out[3].text == "" and out[3].n_dropped == 8
    assert out[4].text == "p q" and out[4].n_dropped == 0
    assert out[2].n_tokens == 6
    # idempotence: a second pass drops nothing new
    again = remove_repeated_spans(
        spark.createDataFrame(
            [(d, r.text) for d, r in out.items()], ["doc_id", "text"]
        ),
        k=4,
    ).collect()
    assert all(r.n_dropped == 0 for r in again)


def test_semantic_dedup_drops_planted_in_cell(spark):
    """SemDeDup semantics: a planted near-copy (cos≈1) is dropped iff
    it lands in its original's cluster; originals (smaller ids) keep;
    vectors with no in-cell near-dup keep."""
    from ccog_spark.operators.dedup import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    planted = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    aug = emb.select("vec_id", "embedding").unionByName(planted)
    out = {r.vec_id: r for r in semantic_dedup(aug, dim=dim).collect()}
    assert len(out) == aug.count()  # every vector flagged, none lost
    n_checked = n_dropped = 0
    for vid, r in out.items():
        if vid >= 10_000_000:
            orig = out[vid - 10_000_000]
            n_checked += 1
            if r.cell == orig.cell:
                # identical vector, same cell, larger id -> dropped
                assert not r.is_keeper
                assert orig.is_keeper or not orig.is_keeper  # orig flagged
                n_dropped += 1
    assert n_checked > 0 and n_dropped > 0  # the drop path really ran
    # originals are never dropped BY their planted copy (copy id larger)
    keep_rate = sum(out[v].is_keeper for v in out if v < 10_000_000)
    assert keep_rate >= len(emb.collect()) - 5  # random fixture: ~all keep


def _plan_text(df):
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_span_and_semantic_dedup_plan_shapes(spark):
    """Pin the 100 TB-relevant plan shapes: NO window over content
    keys anywhere (keep-first must be a combinable aggregate), the
    span dedup's position removal is a real anti-join, and semantic
    dedup has no nested-loop/cartesian pair generation."""
    from ccog_spark.operators.dedup import (
        remove_repeated_spans,
        semantic_dedup,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], ["doc_id", "text"]
    )
    span_plan = _plan_text(remove_repeated_spans(docs, k=4))
    assert "Window" not in span_plan
    assert "LeftAnti" in span_plan
    assert "HashAggregate" in span_plan  # combinable keep-first

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(200)
    dim = len(emb.select("embedding").first()[0])
    sem_plan = _plan_text(semantic_dedup(emb, dim=dim))
    assert "Window" not in sem_plan
    assert "NestedLoop" not in sem_plan and "CartesianProduct" not in sem_plan
    assert "ArrowEvalPython" in sem_plan  # the one assign pass
    # every ArrowEvalPython occurrence must sit INSIDE an
    # InMemoryRelation build-plan rendering (the persisted `cells`
    # frame referenced by both join sides + the projection): that
    # means ONE real Arrow materialization, re-rendered per cache
    # reference — an occurrence OUTSIDE the cache would be a second
    # live assign pass (the planner trap the verify notes document)
    import re

    arrows = len(re.findall(r"ArrowEvalPython", sem_plan))
    cached = sem_plan.count("InMemoryRelation")
    assert arrows <= cached


def test_semantic_dedup_hierarchical_degenerates_to_flat(spark):
    """The hierarchical default (round-10: √C-sized coarse level):
    with a pinned coarse_stride ≥ #cents there is ONE coarse cell, so
    the two-hop assignment must equal a flat exact-nearest replay
    bit-for-bit (docstring contract); and a real multi-coarse
    hierarchy still assigns every vector to a centroid that exists,
    keeping identical vectors co-celled."""
    import numpy as np

    from ccog_spark.operators.dedup import semantic_dedup
    from ccog_spark.operators.similarity import _ivf_centroid_arrays

    from pyspark.sql import functions as F

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    dim = len(emb.select("embedding").first()[0])
    # flat replay in numpy over the SAME double-cast view the operator
    # quantizes (same argmax + first-occurrence tie-break)
    dbl = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    cent_ids, cmat, cnrm = _ivf_centroid_arrays(dbl, 25)
    rows = dbl.collect()
    want = {}
    for r in rows:
        x = np.asarray([float(v) for v in r.embedding], "f8")
        cos = (cmat @ x) / (np.sqrt(x @ x) * cnrm)
        want[r.vec_id] = int(cent_ids[int(cos.argmax())])
    degen = {
        r.vec_id: r.cell
        for r in semantic_dedup(
            emb, dim=dim, coarse_stride=10**9
        ).collect()
    }
    assert degen == want
    # a REAL multi-coarse hierarchy (coarse_stride=4 → ≥5 coarse cells
    # on the ~20-centroid fixture): every assigned cell is a valid
    # centroid id, no vector lost, and identical inputs co-cell (the
    # assignment is a pure function of the embedding)
    assert len(cent_ids) > 4
    out = {
        r.vec_id: r.cell
        for r in semantic_dedup(emb, dim=dim, coarse_stride=4).collect()
    }
    assert len(out) == len(rows)
    assert set(out.values()) <= set(int(c) for c in cent_ids)


def test_semantic_dedup_with_kmeans_centroids(spark):
    """Production quantizer path: semantic_dedup(centroids=
    kmeans_centroids(...)) — planted identical copies still drop
    (identical vectors ALWAYS share a cell under any quantizer)."""
    from ccog_spark.operators.dedup import semantic_dedup
    from ccog_spark.operators.similarity import kmeans_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    planted = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    aug = emb.select("vec_id", "embedding").unionByName(planted)
    cents = kmeans_centroids(aug, n_cells=8)
    out = {
        r.vec_id: r
        for r in semantic_dedup(aug, dim=dim, centroids=cents).collect()
    }
    assert len(out) == aug.count()
    for vid in out:
        if vid >= 10_000_000:
            # identical copy: same cell as its original, larger id
            assert out[vid].cell == out[vid - 10_000_000].cell
            assert not out[vid].is_keeper


def _span_dedup_reference(rows, k):
    """Independent pure-Python replay of remove_repeated_spans'
    semantics: global keep-first window occurrences by (doc_id, pos),
    covered positions set-unioned, ordered rebuild."""
    first = {}
    for d, t in sorted(rows):
        toks = t.split(" ")
        for p in range(len(toks) - k + 1):
            g = " ".join(toks[p : p + k])
            if g not in first or (d, p) < first[g]:
                first[g] = (d, p)
    out = {}
    for d, t in rows:
        toks = t.split(" ")
        dropped = set()
        for p in range(len(toks) - k + 1):
            g = " ".join(toks[p : p + k])
            if first[g] != (d, p):
                dropped.update(range(p, p + k))
        kept = [tok for i, tok in enumerate(toks) if i not in dropped]
        out[d] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


@pytest.mark.parametrize("mode", ["hash", "string"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_remove_repeated_spans_matches_reference(spark, seed, mode):
    """Randomized corpora with a tiny vocabulary (forcing heavy window
    collisions, incl. overlapping and within-doc repeats) — the Spark
    operator must equal the independent Python replay exactly, in BOTH
    gram-key modes (the production 128-bit two-seed hash keys and the
    collision-free string-key oracle twin)."""
    from ccog_spark.operators.dedup import remove_repeated_spans

    rng = random.Random(100 + seed)
    vocab = [f"t{i}" for i in range(6)]  # tiny: dense collisions
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(2, 20))))
        for i in range(40)
    ]
    want = _span_dedup_reference(rows, k=4)
    got = {
        r.doc_id: (r.text, r.n_tokens, r.n_dropped)
        for r in remove_repeated_spans(
            spark.createDataFrame(rows, ["doc_id", "text"]),
            k=4,
            gram_keys=mode,
        ).collect()
    }
    assert got == want


def test_remove_repeated_spans_regex_metachar_sep(spark):
    """A regex-metachar separator ('.') must split LITERALLY (round-8
    ADVICE: F.split takes a Java regex; the engine \\Q…\\E-quotes it)
    — and both gram-key modes must agree on it."""
    from ccog_spark.operators.dedup import (
        remove_duplicate_lines,
        remove_repeated_spans,
    )

    docs = spark.createDataFrame(
        [(1, "a.b.c.d.e"), (2, "x.a.b.c.d")], ["doc_id", "text"]
    )
    for mode in ("hash", "string"):
        out = {
            r.doc_id: r
            for r in remove_repeated_spans(
                docs, k=4, sep=".", gram_keys=mode
            ).collect()
        }
        assert out[1].text == "a.b.c.d.e" and out[1].n_tokens == 5
        assert out[2].text == "x" and out[2].n_dropped == 4
    # same latent pattern in line dedup: '|'-separated records
    ld = {
        r.doc_id: r
        for r in remove_duplicate_lines(
            spark.createDataFrame(
                [(1, "aa|bb"), (2, "bb|cc")], ["doc_id", "text"]
            ),
            sep="|",
        ).collect()
    }
    assert ld[1].text == "aa|bb" and ld[2].text == "cc"
    with pytest.raises(ValueError, match=r"\\E"):
        remove_repeated_spans(docs, k=4, sep="\\E").collect()


def test_semantic_dedup_parallel_coarse_twins_oracle_parity(spark):
    """Round-10 orphan-cell parity (VERDICT r9 task 5 / ADVICE #3):
    a corpus with two PARALLEL-but-not-identical embeddings (v76 =
    2·v1, exact in floats: power-of-two scaling commutes with dot,
    norm, and the cosine quotient, so every cosine against the twins
    ties EXACTLY in both engines) that both land in the √C coarse
    level — centroid ranks {1,4,7,10} of C=10 ⇒ cent_ids {1,76,151,
    226}. The larger-id twin's coarse cell is then memberless (even
    centroid 76 itself ties to coarse 1 and loses on id), i.e. a live
    ORPHAN cell: the engine's full-centroid fallback guard and the
    oracle's cells_o branch both face it. Both engines must agree row
    for row with no silent drops (the pre-fix oracle lost orphan
    vectors to its inner joins)."""
    import duckdb
    import numpy as np
    import pandas as pd

    from ccog_spark.operators.dedup import semantic_dedup
    from ccog_spark.queries.oracle_pipeline import PIPELINE_ORACLE

    rng = np.random.default_rng(7)
    dim = 8
    vecs = {i: rng.normal(size=dim).round(3) for i in range(1, 251)}
    vecs[76] = 2.0 * vecs[1]  # parallel, NOT identical
    sdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in sorted(vecs.items())],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r for r in semantic_dedup(sdf, dim=dim).collect()}

    # the scenario is real: recompute the √C coarse level + cmap the
    # engine builds and assert the larger twin's coarse cell is orphan
    cent_ids = np.array(sorted(i for i in vecs if i % 25 == 1), "i8")
    C = len(cent_ids)
    assert C == 10
    import math

    stride = -(-C // (math.isqrt(C - 1) + 1))
    ci = np.arange(0, C, stride)
    coarse_ids = cent_ids[ci]
    assert 1 in coarse_ids and 76 in coarse_ids  # twins straddle it
    cmat = np.array([vecs[int(i)] for i in cent_ids], "f8")
    cnrm = np.sqrt((cmat * cmat).sum(1))
    cc = (cmat @ cmat[ci].T) / (cnrm[:, None] * cnrm[ci][None, :])
    cmap = cc.argmax(1)
    orphan_rank = int(np.where(coarse_ids == 76)[0][0])
    assert not (cmap == orphan_rank).any()  # cell 76 is memberless

    # oracle replay: the SHIPPED dedup_semantic SQL verbatim, with the
    # fixture augmentation disabled so it runs on this corpus as-is
    sql = PIPELINE_ORACLE["dedup_semantic"].replace(
        "FROM base WHERE vec_id % 10 = 0", "FROM base WHERE FALSE"
    )
    assert sql != PIPELINE_ORACLE["dedup_semantic"]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": sorted(vecs),
                "embedding": [list(vecs[i]) for i in sorted(vecs)],
            }
        ),
    )
    want = {
        int(v): (int(c), bool(k))
        for v, c, k in con.execute(sql).fetchall()
    }
    got = {v: (int(r.cell), bool(r.is_keeper)) for v, r in out.items()}
    assert len(got) == 250 and len(want) == 250  # no silent drops
    assert got == want
    # the parallel twin co-cells with its original and is pruned
    assert got[76] == (1, False) and got[1][1] is True


def test_adaptive_band_bits_rule_and_oracle_ladder_parity():
    """Round-11 adaptive band width: the Python rule (exact integer
    ceil-log2 of ceil(n/TARGET_BUCKET), floored at BAND_BITS, capped
    at MAX_BAND_BITS) must agree with the dedup_embed oracle's prm
    CTE spelling (ceil-div + power-of-two CASE ladder + shift) for a
    sweep of corpus sizes including every boundary."""
    import duckdb

    from ccog_spark.operators.similarity import (
        BAND_BITS,
        MAX_BAND_BITS,
        MAX_TABLES,
        N_TABLES,
        TARGET_BUCKET,
        adaptive_band_bits,
        adaptive_n_tables,
    )
    from ccog_spark.queries.oracle_pipeline import _CEIL_LOG2_M

    # pinned values: floor holds to n = TARGET_BUCKET * 2^BAND_BITS,
    # the next vector adds a bit, the cap binds at astronomical n
    knee = TARGET_BUCKET * (1 << BAND_BITS)
    assert adaptive_band_bits(1) == BAND_BITS
    assert adaptive_band_bits(knee) == BAND_BITS
    assert adaptive_band_bits(knee + 1) == BAND_BITS + 1
    assert adaptive_band_bits(10**15) == MAX_BAND_BITS

    ns = [1, 2, TARGET_BUCKET, TARGET_BUCKET + 1, knee, knee + 1]
    for k in range(1, MAX_BAND_BITS + 2):
        base = TARGET_BUCKET * (1 << k)
        ns += [base - 1, base, base + 1]
    con = duckdb.connect()
    for n in ns:
        bits, ntab = con.execute(
            f"SELECT bits, LEAST({MAX_TABLES}, "
            f"{N_TABLES} + 2 * (bits - {BAND_BITS})) FROM (SELECT "
            f"GREATEST({BAND_BITS}, LEAST({MAX_BAND_BITS}, "
            f"{_CEIL_LOG2_M})) AS bits FROM (SELECT "
            f"(CAST({n} AS BIGINT) + {TARGET_BUCKET - 1}) // "
            f"{TARGET_BUCKET} AS m))"
        ).fetchone()
        assert bits == adaptive_band_bits(n), n
        assert ntab == adaptive_n_tables(bits), n  # buy-back twin


def test_band_key_width_is_low_bit_mask(spark):
    """The oracle's adaptive replay rests on one property: because
    table t owns the FIXED plane range t·MAX_BAND_BITS+b, a
    width-``bits`` band key equals the low-``bits`` mask of the same
    table's full-width key. Pin it engine-side across widths."""
    import numpy as np

    from ccog_spark.operators.similarity import (
        MAX_BAND_BITS,
        band_keys_arrow,
    )

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, e array<double>")
    full = band_keys_arrow(16, 4, MAX_BAND_BITS)
    out = df.select(
        "vec_id",
        full(F.col("e")).alias("kf"),
        band_keys_arrow(16, 4, 10)(F.col("e")).alias("k10"),
        band_keys_arrow(16, 4, 13)(F.col("e")).alias("k13"),
    ).collect()
    for r in out:
        for t in range(4):
            assert r.k10[t] == (r.kf[t] & ((1 << 10) - 1))
            assert r.k13[t] == (r.kf[t] & ((1 << 13) - 1))


def test_embedding_dup_pairs_default_is_adaptive(spark):
    """The DEFAULT band width routes through adaptive_band_bits(n):
    pinning band_bits to exactly that value must reproduce the default
    output row-for-row (and the floor holds on a small corpus, so the
    r10-era pinned-10 behavior is unchanged below the knee)."""
    import numpy as np

    from ccog_spark.operators.dedup import embedding_dup_pairs
    from ccog_spark.operators.similarity import (
        BAND_BITS,
        adaptive_band_bits,
    )

    rng = np.random.default_rng(3)
    base = rng.normal(size=(120, 16))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # plant near-dups so the result is non-vacuous
    rows += [
        (1000 + i, [float(x) for x in v + 1e-4])
        for i, v in enumerate(base[:12])
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    n = emb.count()
    assert adaptive_band_bits(n) == BAND_BITS  # floor below the knee
    key = lambda r: (r.id_a, r.id_b)
    dflt = {key(r): r.cos for r in embedding_dup_pairs(emb, 16).collect()}
    pinned = {
        key(r): r.cos
        for r in embedding_dup_pairs(
            emb, 16, band_bits=adaptive_band_bits(n)
        ).collect()
    }
    assert dflt == pinned and dflt  # identical, non-empty


def test_embedding_dup_pairs_bucket_straddles_arrow_batches(spark):
    """The r11 verify kernel (mapInPandas over sorted band partitions)
    buffers the trailing (tbl, bk) run across Arrow batches — a bucket
    larger than spark.sql.execution.arrow.maxRecordsPerBatch must be
    reassembled, not split into partial pair sets. Force 16-row
    batches against a 90-vector near-duplicate cluster (one hot
    bucket per table, far wider than a batch) and require the result
    to equal the default-batch run row-for-row."""
    import numpy as np

    from ccog_spark.operators.dedup import embedding_dup_pairs

    rng = np.random.default_rng(5)
    base = rng.normal(size=16)
    rows = [
        (i, [float(x) for x in base + 1e-5 * rng.normal(size=16)])
        for i in range(90)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    default = {
        (r.id_a, r.id_b): r.cos
        for r in embedding_dup_pairs(emb, 16, band_bits=10).collect()
    }
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "16")
        tiny = {
            (r.id_a, r.id_b): r.cos
            for r in embedding_dup_pairs(emb, 16, band_bits=10).collect()
        }
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert tiny == default
    # the cluster really is one hot bucket: ~all C(90,2) pairs found
    assert len(default) > 3500


def test_embedding_dup_pairs_zero_norm_nan_pair_survives(spark):
    """A zero-norm pair's cosine is 0/0 = NaN, and BOTH engines (Spark
    and DuckDB) order NaN above every double — so the r10 join spelling
    and the oracle emit the pair. The r11 numpy prefilter's `g >=
    margin` was False for NaN and silently dropped it; pin the NaN-safe
    keep `~(g < margin)` (round-12 ADVICE)."""
    import math

    from ccog_spark.operators.dedup import embedding_dup_pairs

    rows = [
        (0, [0.0] * 16),
        (1, [0.0] * 16),
        (2, [1.0] + [0.0] * 15),
        (3, [1.0] + [0.0] * 15),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = embedding_dup_pairs(emb, 16, cos_min=0.9, band_bits=10).collect()
    by_pair = {(r.id_a, r.id_b): r.cos for r in got}
    # the degenerate zero-norm pair surfaces with a NaN cosine
    assert (0, 1) in by_pair and math.isnan(by_pair[(0, 1)])
    # and the ordinary exact-duplicate pair still verifies normally
    assert by_pair.get((2, 3)) == 1.0
