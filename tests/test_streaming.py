"""Streaming semantics tests (E31-E33): streamed == batch, and the
watermark really drops late data (SURVEY.md §5.2 item 5)."""

from __future__ import annotations

import os
import tempfile
import time

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ccog_spark.catalog import load_table
from ccog_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_batch,
    sliding_counts,
    stateful_dedup,
    tumbling_counts,
)
from tests.conftest import SF_SMOKE


def test_streamed_tumbling_equals_batch(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    streamed = run_stream_to_batch(tumbling_counts(stream), "complete")
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("total"))
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b


def test_streamed_sliding_counts(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    streamed = run_stream_to_batch(sliding_counts(stream), "complete")
    rows = streamed.collect()
    # each event lands in exactly width/slide = 2 windows
    total_events = load_table(spark, SF_SMOKE, "events").count()
    assert sum(r.cnt for r in rows) == 2 * total_events


def test_watermark_drops_late_data(spark):
    """Files arriving in REVERSE time order: after the newest batch sets
    the watermark, older batches are beyond the lateness horizon and a
    stateful operator must drop them."""
    ev = load_table(spark, SF_SMOKE, "events")
    staging = os.path.join(tempfile.gettempdir(), "ccog_events_reversed")
    if not os.path.exists(os.path.join(staging, "_STAGED_OK")):
        binned = ev.withColumn("f", F.ntile(4).over(W.orderBy(F.col("ts").desc())))
        for i in range(1, 5):
            binned.where(F.col("f") == i).drop("f").coalesce(1).write.mode(
                "append"
            ).parquet(staging)
            time.sleep(0.05)
        with open(os.path.join(staging, "_STAGED_OK"), "w") as fh:
            fh.write("ok")

    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
        .withWatermark("ts", "1 hour")
    )
    deduped = run_stream_to_batch(stateful_dedup(stream), "append")
    survived = deduped.count()
    total = ev.count()
    assert survived < total, "late rows should have been dropped"
    assert survived >= total // 4, "the first (newest) batch must survive"


def test_asof_strategies_agree(spark):
    from ccog_spark.operators.asof import (
        asof_join_agg,
        asof_join_pandas,
        asof_join_union,
    )

    events = load_table(spark, SF_SMOKE, "events")
    clicks = events.where(F.col("event_type") == "click")
    purchases = events.where(F.col("event_type") == "purchase")
    kw = dict(
        left_key="user_id",
        right_key="user_id",
        left_ts="ts",
        right_ts="ts",
        left_id="event_id",
    )
    a = {tuple(r) for r in asof_join_agg(clicks, purchases, **kw).collect()}
    u = {tuple(r) for r in asof_join_union(clicks, purchases, **kw).collect()}
    p = {tuple(r) for r in asof_join_pandas(clicks, purchases, **kw).collect()}
    assert len(a) > 0
    assert a == u == p


def test_foreachbatch_exactly_once_sink(spark, tmp_path):
    """Every source row lands exactly once across epoch directories;
    multiple micro-batches produce multiple epochs."""
    from ccog_spark.streaming.sinks import write_stream_exactly_once
    from ccog_spark.streaming.windows import read_events_stream

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = read_events_stream(spark, SF_SMOKE, with_watermark=None)
    q = write_stream_exactly_once(stream, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    written = spark.read.option("basePath", out).parquet(out + "/epoch=*")
    src = load_table(spark, SF_SMOKE, "events")
    assert written.count() == src.count()
    assert written.select("event_id").distinct().count() == src.count()
    epochs = written.select("epoch").distinct().count()
    assert epochs >= 2  # maxFilesPerTrigger=1 over 4 staged files


def test_foreachbatch_stream_to_cog(spark, tmp_path):
    """Streaming-COG seam (round-10, r8 task 6): a 2-file pixel stream
    (maxFilesPerTrigger=1 → one micro-batch per scene) through
    write_stream_cogs produces TWO complete, independently valid COGs
    — each parses, carries the declared grid + overview chain, and
    reads back its scene's constant fill exactly."""
    import glob

    import numpy as np

    from ccog_spark.raster import tiff
    from ccog_spark.streaming.sinks import write_stream_cogs

    W_, H_, B_ = 64, 48, 1
    staging = str(tmp_path / "scenes")
    # two scenes, one parquet FILE each (repartition(1) + per-scene
    # write) so each micro-batch is exactly one whole scene
    for scene, fill in ((0, 10.0), (1, 20.0)):
        rows = [
            (1, y, x, fill, True) for y in range(H_) for x in range(W_)
        ]
        (
            spark.createDataFrame(
                rows, "band int, y int, x int, value double, valid boolean"
            )
            .repartition(1)
            .write.mode("append")
            .parquet(staging)
        )
    stream = (
        spark.readStream.schema(
            "band int, y int, x int, value double, valid boolean"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    out = str(tmp_path / "cogs")
    q = write_stream_cogs(
        stream, out, str(tmp_path / "ckpt"), W_, H_, B_,
        blocksize=32, nodata=-1.0,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    paths = sorted(glob.glob(out + "/scene_epoch=*.tif"))
    assert len(paths) == 2
    fills = set()
    for p in paths:
        data = open(p, "rb").read()
        ifds = tiff.read_cog(data)
        assert ifds[0].width == W_ and ifds[0].height == H_
        assert len(ifds) >= 2  # overview chain present
        px = tiff.read_band(data, ifds[0], 0)
        vals = np.unique(px)
        assert len(vals) == 1  # constant scene fill, no cross-batch mix
        fills.add(float(vals[0]))
    assert fills == {10.0, 20.0}


# the in-process S3 REST stand-in + fsspec-style options builder from
# the MPU suite; importing the fixture makes it resolvable here
from tests.test_s3_stub import _storage_options, s3_stub  # noqa: E402,F401


@pytest.mark.slow
def test_foreachbatch_stream_to_cog_s3_mpu(spark, tmp_path, s3_stub):
    """Round-11 (VERDICT r10 task 6): the streaming-COG seam composed
    with the OBJECT-STORE target — write_stream_cogs pointed at
    s3://… drives the ordered multipart finalize (create → parts →
    ETag-checked complete) per micro-batch, not the local-file path.
    Two epochs → two completed S3 objects, each a valid COG whose
    pixels read back the scene fill; zero aborts (the stub REJECTS a
    complete whose ETags mismatch its upload-time values, so two
    completed objects prove the ETag round-trip end-to-end)."""
    import numpy as np

    from ccog_spark.raster import tiff
    from ccog_spark.streaming.sinks import write_stream_cogs

    state, endpoint = s3_stub
    W_, H_, B_ = 64, 48, 1
    staging = str(tmp_path / "scenes")
    for scene, fill in ((0, 10.0), (1, 20.0)):
        rows = [
            (1, y, x, fill, True) for y in range(H_) for x in range(W_)
        ]
        (
            spark.createDataFrame(
                rows, "band int, y int, x int, value double, valid boolean"
            )
            .repartition(1)
            .write.mode("append")
            .parquet(staging)
        )
    stream = (
        spark.readStream.schema(
            "band int, y int, x int, value double, valid boolean"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    q = write_stream_cogs(
        stream, "s3://testbkt/scenes", str(tmp_path / "ckpt"),
        W_, H_, B_, blocksize=32, nodata=-1.0,
        storage_options=_storage_options(endpoint),
        min_part_size=4096,  # force several ordered parts per object
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    keys = sorted(k for b, k in state.objects if b == "testbkt")
    assert keys == ["scenes/scene_epoch=0.tif", "scenes/scene_epoch=1.tif"]
    assert not state.aborted  # every multipart upload completed
    fills = set()
    for k in keys:
        data = state.objects[("testbkt", k)]
        ifds = tiff.read_cog(data)
        assert ifds[0].width == W_ and ifds[0].height == H_
        assert len(ifds) >= 2  # overview chain survived the MPU path
        px = tiff.read_band(data, ifds[0], 0)
        vals = np.unique(px)
        assert len(vals) == 1
        fills.add(float(vals[0]))
    assert fills == {10.0, 20.0}


def test_tws_operator_guards_missing_protobuf(spark, sf_dir):
    """running_user_totals_tws (the Spark 4.x transformWithStateInPandas
    twin) hard-depends on google.protobuf for its state-server protocol
    — without it the streaming worker would crash with an opaque JVM
    error mid-query, so the operator must fail FAST with an actionable
    message instead (optional-dependency gate, same pattern as the
    rasterio oracle tests)."""
    import importlib.util

    import pytest

    from ccog_spark.streaming.stateful import running_user_totals_tws
    from ccog_spark.streaming.windows import read_events_stream

    events = read_events_stream(spark, sf_dir)
    try:  # find_spec raises when even the parent 'google' ns is absent
        has_pb = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        has_pb = False
    if not has_pb:
        with pytest.raises(RuntimeError, match="protobuf"):
            running_user_totals_tws(events)
    else:
        # protobuf present: the frame must at least construct
        assert running_user_totals_tws(events).columns == [
            "user_id", "n_events", "total_value",
        ]


def test_tws_matches_classic_stateful_api(spark, sf_dir):
    """When protobuf IS installed, the transformWithStateInPandas twin
    must produce exactly the classic applyInPandasWithState result on
    the same stream (skips in the protobuf-less CI container)."""
    import pytest

    pytest.importorskip("google.protobuf")
    from pyspark.sql import functions as F

    from ccog_spark.streaming.stateful import (
        running_user_totals,
        running_user_totals_tws,
    )
    from ccog_spark.streaming.windows import (
        read_events_stream,
        run_stream_to_batch,
    )

    def final_rows(op):
        events = read_events_stream(spark, sf_dir).withColumn(
            "value", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("double")
        )
        out = run_stream_to_batch(op(events), "update")
        return {
            r.user_id: (r.n_events, r.total_value)
            for r in out.groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("total_value").alias("total_value"),
            )
            .collect()
        }

    assert final_rows(running_user_totals_tws) == final_rows(
        running_user_totals
    )


@pytest.mark.slow
def test_stream_text_index_maintenance(spark, tmp_path):
    """Streaming BM25-index maintenance (round 14, VERDICT r13 #3):
    documents staged as files → maxFilesPerTrigger=1 micro-batches →
    foreachBatch append_to_text_index. After the stream drains, the
    grown index answers BIT-IDENTICALLY to a from-scratch batch build
    over the union corpus; ≥ 2 epochs ran; the on_epoch hook surfaced
    the vocab-drift staleness stats; and checkpoint resume applies
    only the NEW files (per-epoch visibility across restarts)."""
    import glob as _glob

    from ccog_spark.operators.text import bm25_topk
    from ccog_spark.operators.text_index import (
        build_bm25_index,
        query_bm25_index,
    )
    from ccog_spark.streaming.sinks import write_stream_text_index

    docs = load_table(spark, SF_SMOKE, "documents")
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    staging = str(tmp_path / "staged_docs")
    idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")

    part_a = docs.where(F.col("doc_id") % 3 == 0)
    part_b = docs.where(F.col("doc_id") % 3 == 1)
    part_c = docs.where(F.col("doc_id") % 3 == 2)
    part_a.coalesce(1).write.mode("append").parquet(staging)
    part_b.coalesce(1).write.mode("append").parquet(staging)

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staging)
        )
        return write_stream_text_index(
            stream, idx, ckpt,
            on_epoch=lambda e, s: epoch_log.append((e, s)),
        )

    epoch_log = []
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(epoch_log) >= 2  # build epoch + ≥1 append epoch
    # append epochs emit the vocab-drift staleness twin
    append_stats = [s for _, s in epoch_log if "vocab_growth" in s]
    assert append_stats and all(
        s["new_terms"] >= 0 for s in append_stats
    )

    qs = docs.where(F.col("doc_id") % 97 == 11).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 3), " "
        ).alias("q_text"),
    )
    ab = part_a.unionByName(part_b)
    got = sorted(map(tuple, query_bm25_index(spark, idx, qs, k=5).collect()))
    want = sorted(map(tuple, bm25_topk(ab, qs, k=5).collect()))
    assert got == want and len(got) > 0

    # restart from the SAME checkpoint after a third file lands:
    # exactly the new file is applied, and the grown index matches a
    # batch build over the full corpus
    part_c.coalesce(1).write.mode("append").parquet(staging)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got_all = sorted(
        map(tuple, query_bm25_index(spark, idx, qs, k=5).collect())
    )
    want_all = sorted(map(tuple, bm25_topk(docs, qs, k=5).collect()))
    assert got_all == want_all
    markers = _glob.glob(f"{idx}/_stream_epochs/*_epoch_*.done")
    assert len(markers) == 3  # one per applied (non-empty) batch


@pytest.mark.slow
def test_stream_text_index_replay_skip(spark, tmp_path):
    """The epoch-marker commit protocol: re-delivering an
    already-applied epoch (same checkpoint namespace + epoch id) is a
    no-op, while the same epoch id under a DIFFERENT checkpoint
    namespace is applied — epoch ids are lineage-scoped."""
    from ccog_spark.operators.text_index import query_bm25_index
    from ccog_spark.streaming.sinks import apply_text_index_batch

    docs = load_table(spark, SF_SMOKE, "documents")
    part_a = docs.where(F.col("doc_id") % 3 == 0)
    part_b = docs.where(F.col("doc_id") % 3 == 1)
    idx = str(tmp_path / "replay_idx")

    assert apply_text_index_batch(part_a, 0, idx, ns="ck1") is True
    qs = spark.createDataFrame([(1, "dup the")], "q_id long, q_text string")
    before = sorted(
        map(tuple, query_bm25_index(spark, idx, qs, k=5).collect())
    )
    # replay of (ck1, epoch 0): skipped, index unchanged
    assert apply_text_index_batch(part_a, 0, idx, ns="ck1") is False
    assert (
        sorted(map(tuple, query_bm25_index(spark, idx, qs, k=5).collect()))
        == before
    )
    # different lineage, same epoch id: NOT a replay — applied
    assert apply_text_index_batch(part_b, 0, idx, ns="ck2") is True
    after = sorted(
        map(tuple, query_bm25_index(spark, idx, qs, k=5).collect())
    )
    assert after != before or part_b.count() == 0
    # empty batch: no-op, returns False
    assert (
        apply_text_index_batch(part_b.limit(0), 99, idx, ns="ck1") is False
    )


@pytest.mark.slow
def test_stream_ann_index_maintenance(spark, tmp_path):
    """Streaming IVF+PQ-index maintenance (round 14, the ANN twin of
    the text sink): vectors staged as files → maxFilesPerTrigger=1
    micro-batches → first non-empty batch BUILDS, later batches append
    under the FROZEN model. After the stream drains, queries answer
    BIT-IDENTICALLY to a batch build(batch 1) + append(rest) twin —
    the drift contract append_to_index pins, under streaming arrival.
    Checkpoint resume applies only the NEW file; occupancy-skew
    staleness stats surface per append epoch."""
    import glob as _glob

    from ccog_spark.operators.ann_index import (
        append_to_index,
        build_ivfpq_index,
        query_ivfpq_index,
    )
    from ccog_spark.streaming.sinks import write_stream_ann_index

    emb = load_table(spark, SF_SMOKE, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    schema = "vec_id bigint, embedding array<float>, label int"
    staging = str(tmp_path / "staged_vecs")
    idx = str(tmp_path / "stream_ann")
    ckpt = str(tmp_path / "ckpt_ann")

    part_a = emb.where(F.col("vec_id") % 3 == 0)
    part_b = emb.where(F.col("vec_id") % 3 == 1)
    part_c = emb.where(F.col("vec_id") % 3 == 2)
    part_a.coalesce(1).write.mode("append").parquet(staging)
    time.sleep(1.05)  # file-source ordering is by modification time
    part_b.coalesce(1).write.mode("append").parquet(staging)

    epoch_log = []

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staging)
        )
        return write_stream_ann_index(
            stream, idx, ckpt, dim,
            on_epoch=lambda e, s: epoch_log.append((e, s)),
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(epoch_log) >= 2  # build epoch + ≥1 append epoch
    appends = [s for _, s in epoch_log if "occupancy_skew" in s]
    assert appends and all(s["occupancy_skew"] >= 1.0 for s in appends)

    # batch twin: build on the FIRST batch's vectors, append the rest
    twin = str(tmp_path / "twin_ann")
    build_ivfpq_index(part_a, dim, twin)
    append_to_index(part_b, twin)

    qs = emb.where(F.col("vec_id") % 97 == 11).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    key = lambda r: (r.q_id, r.rn)
    got = {key(r): tuple(r) for r in query_ivfpq_index(spark, idx, qs, k=3).collect()}
    want = {
        key(r): tuple(r) for r in query_ivfpq_index(spark, twin, qs, k=3).collect()
    }
    assert got == want and got

    # restart from the SAME checkpoint after a third file lands
    time.sleep(1.05)
    part_c.coalesce(1).write.mode("append").parquet(staging)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    append_to_index(part_c, twin)
    got_all = {
        key(r): tuple(r) for r in query_ivfpq_index(spark, idx, qs, k=3).collect()
    }
    want_all = {
        key(r): tuple(r) for r in query_ivfpq_index(spark, twin, qs, k=3).collect()
    }
    assert got_all == want_all
    markers = _glob.glob(f"{idx}/_stream_epochs/*_epoch_*.done")
    assert len(markers) == 3  # one per applied (non-empty) batch


@pytest.mark.slow
def test_stream_text_index_crash_before_marker_no_double_apply(
    spark, tmp_path, monkeypatch
):
    """VERDICT r14 #3: a crash between a COMPLETED append and the
    history-marker write must not double-apply the batch on replay.
    The epoch tag now rides in the index meta rewrite (the append's
    final, _inflight-bracketed step), so the replay is detected even
    with the marker gone — postings/df are NOT doubled."""
    from ccog_spark.operators.text_index import _read_meta, query_bm25_index
    from ccog_spark.streaming import sinks

    docs = load_table(spark, SF_SMOKE, "documents")
    part_a = docs.where(F.col("doc_id") % 3 == 0)
    part_b = docs.where(F.col("doc_id") % 3 == 1)
    idx = str(tmp_path / "crash_idx")

    assert sinks.apply_text_index_batch(part_a, 0, idx, ns="ck1") is True

    # inject the crash: the append completes, the marker write dies
    def boom(epochs_dir, marker):
        raise RuntimeError("injected crash before marker write")

    monkeypatch.setattr(sinks, "_write_epoch_marker", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        sinks.apply_text_index_batch(part_b, 1, idx, ns="ck1")
    monkeypatch.undo()

    # the append itself committed: meta records the epoch tag
    meta = _read_meta(spark, idx)
    assert meta["last_epoch"] == "ck1:1"
    qs = spark.createDataFrame([(1, "dup the")], "q_id long, q_text string")
    before = sorted(
        map(tuple, query_bm25_index(spark, idx, qs, k=5).collect())
    )

    # checkpoint replay of epoch 1: detected as applied, skipped
    assert sinks.apply_text_index_batch(part_b, 1, idx, ns="ck1") is False
    assert _read_meta(spark, idx)["n_docs"] == meta["n_docs"]
    assert (
        sorted(map(tuple, query_bm25_index(spark, idx, qs, k=5).collect()))
        == before
    )
    # the skip re-recorded the history marker; the stream continues
    assert os.path.exists(f"{idx}/_stream_epochs/ck1_epoch_1.done")
    part_c = docs.where(F.col("doc_id") % 3 == 2)
    assert sinks.apply_text_index_batch(part_c, 2, idx, ns="ck1") is True


def test_stream_ann_index_crash_before_marker_no_double_apply(
    spark, tmp_path, monkeypatch
):
    """The ANN twin of the text crash-injection test: replay after a
    completed append + lost marker must not duplicate vec_ids in
    codes/ or inflate n_vectors."""
    from ccog_spark.operators.ann_index import _meta_epoch
    from ccog_spark.streaming import sinks

    emb = load_table(spark, SF_SMOKE, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    part_a = emb.where(F.col("vec_id") % 3 == 0)
    part_b = emb.where(F.col("vec_id") % 3 == 1)
    idx = str(tmp_path / "crash_ann")

    assert sinks.apply_ann_index_batch(part_a, 0, idx, ns="ck1", dim=dim) is True

    def boom(epochs_dir, marker):
        raise RuntimeError("injected crash before marker write")

    monkeypatch.setattr(sinks, "_write_epoch_marker", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        sinks.apply_ann_index_batch(part_b, 1, idx, ns="ck1", dim=dim)
    monkeypatch.undo()

    meta_row = spark.read.parquet(f"{idx}/meta").collect()[0]
    assert _meta_epoch(meta_row) == "ck1:1"
    codes = spark.read.parquet(f"{idx}/codes")
    n_before = codes.count()
    assert codes.select("vec_id").distinct().count() == n_before

    # replay: skipped, codes/vec_ids/n_vectors unchanged
    assert (
        sinks.apply_ann_index_batch(part_b, 1, idx, ns="ck1", dim=dim)
        is False
    )
    codes2 = spark.read.parquet(f"{idx}/codes")
    assert codes2.count() == n_before
    assert codes2.select("vec_id").distinct().count() == n_before
    meta_row2 = spark.read.parquet(f"{idx}/meta").collect()[0]
    assert int(meta_row2.n_vectors) == n_before
    assert os.path.exists(f"{idx}/_stream_epochs/ck1_epoch_1.done")


@pytest.mark.slow
def test_stream_bm25f_index_maintenance_and_crash(spark, tmp_path, monkeypatch):
    """Streaming BM25F-index maintenance (round 15): multi-epoch
    batches ≡ batch build(first) + append(rest); transactional epoch
    record inherited — a crash after a completed append and before
    the marker write must not double-apply on replay."""
    from pyspark.sql import functions as FF

    from ccog_spark.operators.text_index import (
        append_to_bm25f_index,
        build_bm25f_index,
        query_bm25f_index,
    )
    from ccog_spark.streaming import sinks

    docs = load_table(spark, SF_SMOKE, "documents")
    tk = FF.split("text", " ")
    fielded = docs.select(
        "doc_id",
        FF.array_join(FF.slice(tk, 1, 5), " ").alias("title"),
        FF.array_join(
            FF.expr(
                "slice(split(text, ' '), 6,"
                " greatest(size(split(text, ' ')) - 5, 0))"
            ),
            " ",
        ).alias("body"),
    )
    part_a = fielded.where(FF.col("doc_id") % 3 == 0)
    part_b = fielded.where(FF.col("doc_id") % 3 == 1)
    part_c = fielded.where(FF.col("doc_id") % 3 == 2)
    idx = str(tmp_path / "stream_bm25f")
    fc = ("title", "body")

    log = []
    assert sinks.apply_bm25f_batch(
        part_a, 0, idx, "ck1", fc, on_epoch=lambda e, s: log.append((e, s))
    ) is True
    assert sinks.apply_bm25f_batch(
        part_b, 1, idx, "ck1", fc, on_epoch=lambda e, s: log.append((e, s))
    ) is True
    assert log[1][1]["appended"] == part_b.count()
    # replay of an applied epoch: skipped
    assert sinks.apply_bm25f_batch(part_b, 1, idx, "ck1", fc) is False

    # crash: append completes, marker write dies
    def boom(epochs_dir, marker):
        raise RuntimeError("injected crash before marker write")

    monkeypatch.setattr(sinks, "_write_epoch_marker", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        sinks.apply_bm25f_batch(part_c, 2, idx, "ck1", fc)
    monkeypatch.undo()
    n_docs_after = spark.read.parquet(f"{idx}/meta").collect()[0].n_docs
    # replay: detected via the meta epoch record, not double-applied
    assert sinks.apply_bm25f_batch(part_c, 2, idx, "ck1", fc) is False
    assert (
        spark.read.parquet(f"{idx}/meta").collect()[0].n_docs
        == n_docs_after
    )

    # grown stream index ≡ batch build + appends
    twin = str(tmp_path / "twin_bm25f")
    build_bm25f_index(part_a, twin, fc)
    append_to_bm25f_index(part_b, twin)
    append_to_bm25f_index(part_c, twin)
    qs = docs.where(FF.col("doc_id") % 97 == 11).select(
        FF.col("doc_id").alias("q_id"),
        FF.array_join(FF.slice(tk, 1, 3), " ").alias("q_text"),
    )
    a = sorted(
        map(
            tuple,
            query_bm25f_index(spark, idx, qs, (2.0, 1.0), k=5).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            query_bm25f_index(spark, twin, qs, (2.0, 1.0), k=5).collect(),
        )
    )
    assert a == b and a


@pytest.mark.slow
def test_stream_text_index_build_kwargs_layouts(spark, tmp_path):
    """build_kwargs forwards the first batch's layout knobs (round 15):
    a streaming-maintained index built with block_max + positions
    carries blockstats/positional postings from batch one, appends
    ride both automatically, and the grown index answers BM25 (with
    the block cut engaged) and phrase queries exactly like a
    from-scratch build over the union."""
    import os

    from ccog_spark.operators.text import phrase_match
    from ccog_spark.operators.text_index import (
        build_bm25_index,
        phrase_match_index,
        query_bm25_index,
        verify_text_index,
    )
    from ccog_spark.streaming.sinks import apply_text_index_batch

    docs = load_table(spark, SF_SMOKE, "documents")
    part_a = docs.where(F.col("doc_id") % 3 == 0)
    part_b = docs.where(F.col("doc_id") % 3 != 0)
    union = part_a.unionByName(part_b)
    idx = str(tmp_path / "bk_idx")
    kw = {"block_max": True, "positions": True, "n_buckets": 64}
    assert apply_text_index_batch(
        part_a, 0, idx, ns="ck1", build_kwargs=kw
    ) is True
    assert apply_text_index_batch(
        part_b, 1, idx, ns="ck1", build_kwargs=kw
    ) is True
    assert os.path.isdir(os.path.join(idx, "blockstats"))
    assert verify_text_index(spark, idx)["ok"]

    full = str(tmp_path / "bk_full")
    build_bm25_index(union, full, block_max=True, positions=True,
                     n_buckets=64)
    qs = spark.createDataFrame(
        [(1, "dup the stream"), (2, "dup value data")],
        "q_id long, q_text string",
    )
    a = sorted(map(tuple, query_bm25_index(
        spark, idx, qs, k=5, min_postings=0).collect()))
    b = sorted(map(tuple, query_bm25_index(
        spark, full, qs, k=5, min_postings=0).collect()))
    assert a == b and len(a) > 0

    phrases = union.where(F.col("doc_id") % 101 == 7).select(
        F.col("doc_id").alias("q_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 2, 3), " "
        ).alias("phrase"),
    )
    c = sorted(map(tuple, phrase_match_index(spark, idx, phrases).collect()))
    d = sorted(map(tuple, phrase_match(union, phrases).collect()))
    assert c == d and len(c) > 0


@pytest.mark.slow
def test_stream_ann_index_sq8_quant(spark, tmp_path):
    """quant='sq8' picks the scalar-quantized builder for the first
    batch; later epochs append under the saved meta.quant
    automatically, and the grown index equals build(batch1) +
    append(batch2) of the SQ8 family (the frozen-stats contract the
    batch test pins — here the streaming protocol composes with
    it)."""
    from ccog_spark.operators.ann_index import (
        query_ivfsq_index,
        verify_ann_index,
    )
    from ccog_spark.streaming.sinks import apply_ann_index_batch

    emb = load_table(spark, SF_SMOKE, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    part_a = emb.where(F.col("vec_id") % 3 != 0)
    part_b = emb.where(F.col("vec_id") % 3 == 0)
    idx = str(tmp_path / "sq8_stream")

    assert apply_ann_index_batch(
        part_a, 0, idx, ns="ck1", dim=dim, quant="sq8"
    ) is True
    assert apply_ann_index_batch(
        part_b, 1, idx, ns="ck1", dim=dim, quant="sq8"
    ) is True
    meta = spark.read.parquet(idx + "/meta").collect()[0]
    assert meta.quant == "sq8"
    assert verify_ann_index(spark, idx)["ok"]

    # replay of epoch 1: skipped (transactional record)
    assert apply_ann_index_batch(
        part_b, 1, idx, ns="ck1", dim=dim, quant="sq8"
    ) is False

    qs = emb.where(F.col("vec_id") % 97 == 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    rows = query_ivfsq_index(spark, idx, qs, k=3).collect()
    assert len(rows) > 0


@pytest.mark.slow
def test_stream_ann_index_sq8r_quant(spark, tmp_path):
    """quant='sq8r' (round 16): the first batch builds the RESIDUAL
    SQ8 layout; later epochs append residual-encoded deltas under the
    frozen centroids AND frozen residual stats (meta.quant branch),
    and the grown index is bit-identical to a one-pass residual
    encode of the union under batch 1's model."""
    from ccog_spark.operators.ann_index import (
        _load_centroids,
        _load_sqstats,
        _sq_code_frame,
        query_ivfsq_index,
        verify_ann_index,
    )
    from ccog_spark.streaming.sinks import apply_ann_index_batch

    emb = load_table(spark, SF_SMOKE, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    part_a = emb.where(F.col("vec_id") % 3 != 0)
    part_b = emb.where(F.col("vec_id") % 3 == 0)
    idx = str(tmp_path / "sq8r_stream")

    assert apply_ann_index_batch(
        part_a, 0, idx, ns="ck1", dim=dim, quant="sq8r"
    ) is True
    assert apply_ann_index_batch(
        part_b, 1, idx, ns="ck1", dim=dim, quant="sq8r"
    ) is True
    meta = spark.read.parquet(idx + "/meta").collect()[0]
    assert meta.quant == "sq8r"
    assert verify_ann_index(spark, idx)["ok"]
    # replay skipped
    assert apply_ann_index_batch(
        part_b, 1, idx, ns="ck1", dim=dim, quant="sq8r"
    ) is False

    # grown codes == one-pass residual encode under batch 1's model
    ci, cm, cn = _load_centroids(spark, idx)
    mins, rngs = _load_sqstats(spark, idx)
    onep = {
        (r.vec_id, r.cell, tuple(r.codes))
        for r in _sq_code_frame(
            emb, ci, cm, cn, mins, rngs, residual=True
        ).collect()
    }
    grown = {
        (r.vec_id, r.cell, tuple(r.codes))
        for r in spark.read.parquet(idx + "/codes")
        .select("vec_id", "cell", "codes").collect()
    }
    assert grown == onep

    qs = emb.where(F.col("vec_id") % 97 == 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    assert len(query_ivfsq_index(spark, idx, qs, k=3).collect()) > 0


@pytest.mark.slow
def test_stream_ann_index_pqr_quant(spark, tmp_path):
    """quant='pqr' (round 16): the first batch builds the RESIDUAL PQ
    layout; later epochs append residual-encoded deltas under the
    frozen centroids + frozen residual codebook (meta.quant branch)."""
    from ccog_spark.operators.ann_index import (
        _code_frame,
        _load_model,
        query_ivfpq_index,
        verify_ann_index,
    )
    from ccog_spark.streaming.sinks import apply_ann_index_batch

    emb = load_table(spark, SF_SMOKE, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    part_a = emb.where(F.col("vec_id") % 3 != 0)
    part_b = emb.where(F.col("vec_id") % 3 == 0)
    idx = str(tmp_path / "pqr_stream")

    assert apply_ann_index_batch(
        part_a, 0, idx, ns="ck1", dim=dim, quant="pqr"
    ) is True
    assert apply_ann_index_batch(
        part_b, 1, idx, ns="ck1", dim=dim, quant="pqr"
    ) is True
    meta = spark.read.parquet(idx + "/meta").collect()[0]
    assert meta.quant == "pqr"
    assert verify_ann_index(spark, idx)["ok"]
    assert apply_ann_index_batch(
        part_b, 1, idx, ns="ck1", dim=dim, quant="pqr"
    ) is False

    m_row, ci, cm, cn, cb = _load_model(spark, idx)
    onep = {
        (r.vec_id, r.cell, tuple(r.codes))
        for r in _code_frame(
            emb, ci, cm, cn, cb, dim, int(m_row.m_blocks), residual=True
        ).collect()
    }
    grown = {
        (r.vec_id, r.cell, tuple(r.codes))
        for r in spark.read.parquet(idx + "/codes")
        .select("vec_id", "cell", "codes").collect()
    }
    assert grown == onep

    qs = emb.where(F.col("vec_id") % 97 == 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    assert len(query_ivfpq_index(spark, idx, qs, k=3).collect()) > 0
