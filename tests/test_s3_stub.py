"""Exercise the real boto3 S3Mpu branch against an in-process S3
multipart stand-in (plain http.server speaking the public S3 REST
multipart protocol: initiate / upload-part / complete / abort)."""

import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

import pytest


class _S3State:
    def __init__(self):
        self.uploads = {}  # upload_id -> {part_no: bytes}
        self.objects = {}  # (bucket, key) -> bytes
        self.aborted = []
        self.fail_complete = False
        self.fail_parts_from = None  # fail PUT of part_no >= this
        self.completed_parts = {}  # upload_id -> [(part_no, etag), ...]
        # transient-fault injection (round 12): 503-SlowDown the next N
        # part PUTs / completes, then succeed — exercises the writer's
        # bounded-backoff retry layer
        self.throttle_puts = 0
        self.throttle_completes = 0
        # round 13: complete succeeds SERVER-side but the response is
        # lost (500 returned after the object is assembled) — the
        # ambiguous-retry case real S3 can produce
        self.lose_complete_response = 0
        # round 14: complete fails AND the upload is dropped without
        # assembling (externally aborted between attempts) — with a
        # stale object already at the key, this is the
        # overwrite-ambiguity case the HEAD rescue must NOT claim
        self.fail_complete_and_drop = 0
        # (bucket, key) -> ETag served by HEAD; completes record the
        # real S3 multipart form "…-<n_parts>"
        self.object_meta = {}


def _make_handler(state: _S3State):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _path_parts(self):
            u = urlparse(self.path)
            bucket, _, key = u.path.lstrip("/").partition("/")
            # keep_blank_values: S3's initiate request is '?uploads'
            # with no value, which parse_qs drops by default.
            # unquote: boto3 percent-encodes reserved chars in the
            # key path (e.g. '=' in scene_epoch=0.tif → %3D) and real
            # S3 decodes them back to the logical key
            return bucket, unquote(key), parse_qs(
                u.query, keep_blank_values=True
            )

        def _xml(self, code: int, body: str):
            data = body.encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/xml")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_POST(self):
            bucket, key, q = self._path_parts()
            if "uploads" in q:
                uid = f"up{len(state.uploads)}"
                state.uploads[uid] = {}
                self._xml(
                    200,
                    "<InitiateMultipartUploadResult>"
                    f"<Bucket>{bucket}</Bucket><Key>{key}</Key>"
                    f"<UploadId>{uid}</UploadId>"
                    "</InitiateMultipartUploadResult>",
                )
                return
            if "uploadId" in q:
                uid = q["uploadId"][0]
                if state.fail_complete:
                    self._xml(500, "<Error><Code>InternalError</Code></Error>")
                    return
                if state.throttle_completes > 0:
                    state.throttle_completes -= 1
                    self._xml(503, "<Error><Code>SlowDown</Code></Error>")
                    return
                if uid not in state.uploads:
                    # real S3: completing an already-completed (or
                    # aborted) upload id returns NoSuchUpload
                    self._xml(404, "<Error><Code>NoSuchUpload</Code></Error>")
                    return
                if state.fail_complete_and_drop > 0:
                    # upload dies WITHOUT assembling (external abort
                    # racing the complete) — retry sees NoSuchUpload
                    state.fail_complete_and_drop -= 1
                    del state.uploads[uid]
                    self._xml(
                        500, "<Error><Code>InternalError</Code></Error>"
                    )
                    return
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n).decode()
                order = [int(x) for x in re.findall(r"<PartNumber>(\d+)<", body)]
                etags = re.findall(r"<ETag>\"?([^<\"]+)\"?</ETag>", body)
                # real S3 rejects a complete whose ETags don't match the
                # uploaded parts — verify the round-trip
                for p, e in zip(order, etags):
                    if p not in state.uploads[uid] or e != f"etag-{p}":
                        self._xml(
                            400, "<Error><Code>InvalidPart</Code></Error>"
                        )
                        return
                state.completed_parts[uid] = list(zip(order, etags))
                state.objects[(bucket, key)] = b"".join(
                    state.uploads[uid][p] for p in sorted(order)
                )
                # real S3 multipart ETag: "<md5-of-md5s>-<n_parts>"
                state.object_meta[(bucket, key)] = f'"m{uid}-{len(order)}"'
                if state.lose_complete_response > 0:
                    # the object IS assembled, the upload id IS
                    # consumed — but the client never learns it
                    state.lose_complete_response -= 1
                    del state.uploads[uid]
                    self._xml(
                        500, "<Error><Code>InternalError</Code></Error>"
                    )
                    return
                self._xml(
                    200,
                    "<CompleteMultipartUploadResult>"
                    f"<Location>http://x/{bucket}/{key}</Location>"
                    f"<Bucket>{bucket}</Bucket><Key>{key}</Key>"
                    '<ETag>"done"</ETag>'
                    "</CompleteMultipartUploadResult>",
                )
                return
            self._xml(400, "<Error/>")

        def do_PUT(self):
            bucket, key, q = self._path_parts()
            uid = q["uploadId"][0]
            part_no = int(q["partNumber"][0])
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            if (
                state.fail_parts_from is not None
                and part_no >= state.fail_parts_from
            ):
                self._xml(500, "<Error><Code>InternalError</Code></Error>")
                return
            if state.throttle_puts > 0:
                state.throttle_puts -= 1
                self._xml(503, "<Error><Code>SlowDown</Code></Error>")
                return
            state.uploads[uid][part_no] = body
            self.send_response(200)
            self.send_header("ETag", f'"etag-{part_no}"')
            self.send_header("Content-Length", "0")
            self.end_headers()

        def do_DELETE(self):
            _, _, q = self._path_parts()
            state.aborted.append(q["uploadId"][0])
            self.send_response(204)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def do_HEAD(self):
            bucket, key, _ = self._path_parts()
            obj = state.objects.get((bucket, key))
            if obj is None:
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(obj)))
            self.send_header(
                "ETag", state.object_meta.get((bucket, key), '"done"')
            )
            self.end_headers()

    return Handler


@pytest.fixture
def s3_stub():
    state = _S3State()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield state, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _storage_options(endpoint: str) -> dict:
    from botocore.config import Config

    return {
        "key": "test",
        "secret": "test",
        "client_kwargs": {
            "endpoint_url": endpoint,
            "region_name": "us-east-1",
            "config": Config(
                s3={"addressing_style": "path"},
                request_checksum_calculation="when_required",
            ),
        },
    }


@pytest.mark.slow
def test_s3mpu_cog_write_matches_local(spark, tmp_path, s3_stub):
    """The full boto3 multipart path (create → distributed upload_part
    → complete) produces byte-identical output to the LocalMpu path."""
    from ccog_spark.raster.cog import write_cog
    from ccog_spark.raster.fixtures import BANDS, BLOCK, H, W, pixels_df

    state, endpoint = s3_stub
    kwargs = dict(
        width=W, height=H, bands=BANDS, blocksize=BLOCK, nodata=-9999.0,
        min_part_size=4096,  # force several parts
    )
    local = str(tmp_path / "local.tif")
    write_cog(spark, pixels_df(spark), target_path=local, **kwargs)
    res = write_cog(
        spark, pixels_df(spark), target_path="s3://testbkt/out.tif",
        storage_options=_storage_options(endpoint), **kwargs,
    )
    assert res.path == "s3://testbkt/out.tif"
    assert res.n_parts > 1
    with open(local, "rb") as f:
        assert state.objects[("testbkt", "out.tif")] == f.read()


def test_presigned_url_generation(s3_stub, monkeypatch):
    """URL signing is pure client-side math — generate against the
    stub endpoint and check shape (no request is made)."""
    from ccog_spark.sinks import mpu

    _, endpoint = s3_stub
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "test")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "test")
    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-1")
    monkeypatch.setenv("AWS_ENDPOINT_URL_S3", endpoint)
    url = mpu.presigned_url("bkt", "some/key.tif", expires=60)
    assert "bkt" in url and "some/key.tif" in url
    assert "Signature" in url or "X-Amz-Signature" in url


@pytest.mark.slow
def test_s3mpu_complete_failure_aborts_and_raises(s3_stub):
    """Deliberate divergence from the reference (which swallows,
    aws_tools.py:168-175): complete failure aborts the MPU AND
    re-raises."""
    from ccog_spark.sinks.mpu import resolve_store

    state, endpoint = s3_stub
    store = resolve_store(
        "s3://testbkt/bad.tif", _storage_options(endpoint)
    )
    store.create()
    put = store.part_putter()
    receipts = [put(1, b"x" * 10)]
    state.fail_complete = True
    with pytest.raises(Exception):
        store.complete(receipts)
    assert state.aborted, "abort_multipart_upload was not called"


def test_s3mpu_out_of_order_parts_etag_roundtrip(s3_stub):
    """Full lifecycle with parts uploaded in SHUFFLED order: complete
    must submit (PartNumber, ETag) pairs the service can verify — the
    stub rejects any ETag that doesn't match its upload-time value —
    and the assembled object is in part-number order regardless of
    upload order."""
    import random

    from ccog_spark.sinks.mpu import resolve_store

    state, endpoint = s3_stub
    store = resolve_store(
        "s3://testbkt/shuffled.tif", _storage_options(endpoint)
    )
    uid = store.create()
    put = store.part_putter()
    payloads = {i: bytes([i]) * (10 + i) for i in range(1, 6)}
    order = list(payloads)
    random.Random(3).shuffle(order)
    receipts = [put(i, payloads[i]) for i in order]
    path = store.complete(receipts)
    assert path == "s3://testbkt/shuffled.tif"
    # object assembled in part order, not upload order
    assert state.objects[("testbkt", "shuffled.tif")] == b"".join(
        payloads[i] for i in sorted(payloads)
    )
    # the complete request carried the verified etags, ascending
    assert state.completed_parts[uid] == [
        (i, f"etag-{i}") for i in sorted(payloads)
    ]
    assert not state.aborted


@pytest.mark.slow
def test_s3mpu_part_failure_aborts_whole_write(spark, s3_stub):
    """A part upload failing mid-write must propagate out of write_cog
    AND abort the multipart upload (no half-written object, no orphan
    parts billing forever — the failure mode S3 docs warn about)."""
    from ccog_spark.raster.cog import write_cog
    from ccog_spark.raster.fixtures import BANDS, BLOCK, H, W, pixels_df

    state, endpoint = s3_stub
    state.fail_parts_from = 2  # first part succeeds, rest fail
    with pytest.raises(Exception):
        write_cog(
            spark, pixels_df(spark),
            width=W, height=H, bands=BANDS, blocksize=BLOCK,
            nodata=-9999.0, min_part_size=4096,
            target_path="s3://testbkt/fail.tif",
            storage_options=_storage_options(endpoint),
        )
    assert state.aborted, "abort_multipart_upload was not called"
    assert ("testbkt", "fail.tif") not in state.objects


@pytest.mark.slow
def test_s3mpu_abort_is_idempotent(s3_stub):
    """Regression (round-6 review): complete-failure abort followed by
    the writer's own except-path abort must not raise NoSuchUpload
    (which would mask the original error)."""
    from ccog_spark.sinks.mpu import resolve_store

    state, endpoint = s3_stub
    store = resolve_store("s3://testbkt/dbl.tif", _storage_options(endpoint))
    store.create()
    put = store.part_putter()
    receipts = [put(1, b"y" * 8)]
    state.fail_complete = True
    with pytest.raises(Exception):
        store.complete(receipts)
    assert len(state.aborted) == 1
    store.abort()  # second abort: no-op, no request, no error
    assert len(state.aborted) == 1


def test_s3mpu_abort_after_complete_is_noop(s3_stub):
    """Regression (round-6 review): a cleanup-path abort() after a
    successful complete must be a no-op, not a NoSuchUpload error
    against the already-completed upload."""
    from ccog_spark.sinks.mpu import S3Mpu

    state, endpoint = s3_stub
    m = S3Mpu("testbkt", "done.tif", storage_options=_storage_options(endpoint))
    m.create()
    put = m.part_putter()
    r = put(1, b"x" * 16)
    path = m.complete([r])
    assert path == "s3://testbkt/done.tif"
    assert m.upload_id is None
    m.abort()  # must not raise
    assert state.objects[("testbkt", "done.tif")] == b"x" * 16


def _no_client_retry_options(endpoint: str) -> dict:
    """storage_options with boto3's OWN retry layer disabled, so the
    writer's bounded-backoff loop is the only retry in play."""
    from botocore.config import Config

    so = _storage_options(endpoint)
    so["client_kwargs"]["config"] = Config(
        s3={"addressing_style": "path"},
        request_checksum_calculation="when_required",
        # total_max_attempts counts the initial call in EVERY retry
        # mode (max_attempts means "retries" in legacy mode)
        retries={"total_max_attempts": 1, "mode": "standard"},
    )
    return so


def test_s3mpu_put_retries_throttle_then_succeeds(s3_stub, monkeypatch):
    """Round 12 (VERDICT r11 #5): a throttled part PUT (503 SlowDown)
    must back off and succeed on the retry — with boto3's client-level
    retries disabled, the pass proves the writer's own loop."""
    from ccog_spark.sinks import mpu as mpu_mod
    from ccog_spark.sinks.mpu import S3Mpu

    monkeypatch.setattr(mpu_mod, "RETRY_BASE", 0.01)
    state, endpoint = s3_stub
    m = S3Mpu("b", "retry.bin", _no_client_retry_options(endpoint))
    m.create()
    state.throttle_puts = 2  # two 503s, then success
    rec = m.part_putter()(1, b"hello world")
    assert rec["PartNumber"] == 1 and state.throttle_puts == 0
    m.complete([rec])
    assert state.objects[("b", "retry.bin")] == b"hello world"


def test_s3mpu_complete_retries_throttle_then_succeeds(s3_stub, monkeypatch):
    from ccog_spark.sinks import mpu as mpu_mod
    from ccog_spark.sinks.mpu import S3Mpu

    monkeypatch.setattr(mpu_mod, "RETRY_BASE", 0.01)
    state, endpoint = s3_stub
    m = S3Mpu("b", "retry2.bin", _no_client_retry_options(endpoint))
    m.create()
    rec = m.part_putter()(1, b"abc")
    state.throttle_completes = 1
    m.complete([rec])  # must survive the single 503
    assert state.objects[("b", "retry2.bin")] == b"abc"
    assert not state.aborted  # success path: nothing aborted


def test_s3mpu_retry_bounds_and_nonretryable_passthrough(
    s3_stub, monkeypatch
):
    """The backoff is BOUNDED (persistent throttle still raises after
    RETRY_TRIES attempts, and the abort+re-raise divergence is kept),
    and a non-transient 4xx is NOT retried."""
    import botocore.exceptions
    import pytest as _pytest

    from ccog_spark.sinks import mpu as mpu_mod
    from ccog_spark.sinks.mpu import S3Mpu

    monkeypatch.setattr(mpu_mod, "RETRY_BASE", 0.01)
    monkeypatch.setattr(mpu_mod, "RETRY_TRIES", 3)
    state, endpoint = s3_stub
    m = S3Mpu("b", "retry3.bin", _no_client_retry_options(endpoint))
    m.create()
    state.throttle_puts = 10**6  # never recovers
    with _pytest.raises(botocore.exceptions.ClientError):
        m.part_putter()(1, b"abc")
    # exactly RETRY_TRIES attempts were consumed
    assert state.throttle_puts == 10**6 - 3

    # non-retryable: a complete with a WRONG ETag is a 400 InvalidPart
    # — one attempt, immediate abort + re-raise
    state.throttle_puts = 0
    rec = m.part_putter()(2, b"def")
    calls_before = state.throttle_completes
    with _pytest.raises(botocore.exceptions.ClientError):
        m.complete([{"PartNumber": 2, "ETag": "bogus"}])
    assert state.aborted  # abort-and-re-raise divergence intact
    assert calls_before == state.throttle_completes


def test_s3mpu_complete_lost_response_resolved_by_head(
    s3_stub, monkeypatch
):
    """Round-13 ADVICE: complete is NOT idempotent. When the first
    complete succeeds server-side but its 200 is lost (stub returns
    500 AFTER assembling the object), the retry gets NoSuchUpload —
    which must be resolved by HEAD-ing the target: the object exists,
    so complete() reports SUCCESS and nothing is aborted."""
    from ccog_spark.sinks import mpu as mpu_mod
    from ccog_spark.sinks.mpu import S3Mpu

    monkeypatch.setattr(mpu_mod, "RETRY_BASE", 0.01)
    state, endpoint = s3_stub
    m = S3Mpu("b", "lost.bin", _no_client_retry_options(endpoint))
    m.create()
    rec = m.part_putter()(1, b"payload!")
    state.lose_complete_response = 1
    path = m.complete([rec])
    assert path == "s3://b/lost.bin"
    assert state.objects[("b", "lost.bin")] == b"payload!"
    assert not state.aborted  # the upload DID land — no abort
    assert m.upload_id is None  # cleanup abort stays a no-op


def test_s3mpu_first_attempt_nosuchupload_still_fails(s3_stub):
    """The HEAD rescue applies ONLY to retries (attempt > 0): a
    NoSuchUpload on the FIRST attempt — stale/foreign upload id — is a
    real failure even when some older object happens to exist at the
    key, and must abort-and-re-raise as before."""
    import botocore.exceptions

    from ccog_spark.sinks.mpu import S3Mpu

    state, endpoint = s3_stub
    m = S3Mpu("b", "stale.bin", _no_client_retry_options(endpoint))
    m.create()
    rec = m.part_putter()(1, b"x")
    state.objects[("b", "stale.bin")] = b"older object"  # decoy
    del state.uploads[m.upload_id]  # upload vanishes (e.g. aborted)
    with pytest.raises(botocore.exceptions.ClientError) as ei:
        m.complete([rec])
    assert ei.value.response["Error"]["Code"] == "NoSuchUpload"
    assert state.objects[("b", "stale.bin")] == b"older object"


def test_s3mpu_retry_nosuchupload_without_object_still_fails(
    s3_stub, monkeypatch
):
    """NoSuchUpload on a RETRY with NO object at the key: the HEAD
    404s, so the original NoSuchUpload propagates (abort-and-re-raise
    divergence intact — abort itself is a no-op on the gone id)."""
    import botocore.exceptions

    from ccog_spark.sinks import mpu as mpu_mod
    from ccog_spark.sinks.mpu import S3Mpu

    monkeypatch.setattr(mpu_mod, "RETRY_BASE", 0.01)
    state, endpoint = s3_stub
    m = S3Mpu("b", "gone.bin", _no_client_retry_options(endpoint))
    m.create()
    rec = m.part_putter()(1, b"x")
    uid = m.upload_id

    # first attempt throttles; while the client backs off, the upload
    # is aborted out from under it (no object is ever assembled)
    state.throttle_completes = 1
    del state.uploads[uid]
    with pytest.raises(botocore.exceptions.ClientError) as ei:
        m.complete([rec])
    assert ei.value.response["Error"]["Code"] == "NoSuchUpload"
    assert ("b", "gone.bin") not in state.objects


def test_s3mpu_retry_nosuchupload_stale_object_not_claimed(
    s3_stub, monkeypatch
):
    """Round-14 (ADVICE r13, mpu.py:399): the key is being
    OVERWRITTEN — an older object already sits there — and the upload
    is genuinely lost between attempts. HEAD finds the STALE object;
    existence alone would read as success for data that never landed.
    The rescue must compare ContentLength (Σ part sizes) and the
    multipart ETag part-count before claiming the win — here both
    mismatch, so the NoSuchUpload propagates and the stale object is
    untouched."""
    import botocore.exceptions

    from ccog_spark.sinks import mpu as mpu_mod
    from ccog_spark.sinks.mpu import S3Mpu

    monkeypatch.setattr(mpu_mod, "RETRY_BASE", 0.01)
    state, endpoint = s3_stub
    m = S3Mpu("b", "over.bin", _no_client_retry_options(endpoint))
    m.create()
    rec = m.part_putter()(1, b"new-payload")
    # stale predecessor: different length AND different part count
    state.objects[("b", "over.bin")] = b"much longer stale object body"
    state.object_meta[("b", "over.bin")] = '"stale-3"'
    state.fail_complete_and_drop = 1
    with pytest.raises(botocore.exceptions.ClientError) as ei:
        m.complete([rec])
    assert ei.value.response["Error"]["Code"] == "NoSuchUpload"
    assert state.objects[("b", "over.bin")] == b"much longer stale object body"


def test_s3mpu_retry_nosuchupload_same_size_wrong_partcount(
    s3_stub, monkeypatch
):
    """Same overwrite race, adversarial decoy: the stale object has
    the SAME byte length as the lost upload, so ContentLength alone
    cannot disambiguate — the multipart ETag part-count suffix
    ("…-3" vs the 1 part actually uploaded) must catch it."""
    import botocore.exceptions

    from ccog_spark.sinks import mpu as mpu_mod
    from ccog_spark.sinks.mpu import S3Mpu

    monkeypatch.setattr(mpu_mod, "RETRY_BASE", 0.01)
    state, endpoint = s3_stub
    m = S3Mpu("b", "same.bin", _no_client_retry_options(endpoint))
    m.create()
    payload = b"elevenbytes"
    rec = m.part_putter()(1, payload)
    state.objects[("b", "same.bin")] = b"x" * len(payload)  # same size
    state.object_meta[("b", "same.bin")] = '"stale-3"'  # wrong count
    state.fail_complete_and_drop = 1
    with pytest.raises(botocore.exceptions.ClientError) as ei:
        m.complete([rec])
    assert ei.value.response["Error"]["Code"] == "NoSuchUpload"
