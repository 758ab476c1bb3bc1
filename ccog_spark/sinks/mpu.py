"""Ordered multipart-upload sink (reference: ccog/aws_tools.py).

The reference streams an *ordered* list of byte segments to S3 with a
binary-tree merge that coalesces parts below S3's 5 MiB minimum
(aws_tools.py:181-245). Spark can run a cheap first pass that collects
exact segment sizes, so the driver packs parts optimally with a plain
loop (SURVEY.md §4.3.1) and the upload pass is embarrassingly parallel:

  pass 1: encode segments → collect (seq, nbytes) index   [tiny]
  driver: prefix-sum + greedy part packing (≥5 MiB, ≤5 GiB, ≤10,000)
  pass 2: tag rows with part_no → repartitionByRange(part_no) →
          sortWithinPartitions → foreachPartition uploads its parts

Part numbers are assigned BEFORE execution and the store reassembles by
part number — the same ordering contract as the reference
(aws_tools.py:197, SURVEY §3.3). Unlike the reference's
``complete_mpu`` (bare except → abort swallowed as success,
aws_tools.py:168-175), failures here abort the upload and re-raise.

Stores: LocalMpu (filesystem emulation of the S3 MPU protocol — used in
tests and local runs) and S3Mpu (boto3, gated behind import).
"""

from __future__ import annotations

import hashlib
import os
import shutil
from dataclasses import dataclass

# S3 multipart limits (aws_tools.py:20-28)
MAX_PARTS = 10_000
MIN_PART_SIZE = 5 * 1024 * 1024
MAX_PART_SIZE = 5 * 1024 * 1024 * 1024


@dataclass
class PartAssignment:
    part_no: int  # 1-based, S3 convention
    first_seq: int  # first segment index (inclusive)
    last_seq: int  # last segment index (inclusive)
    nbytes: int


def pack_parts(
    segment_sizes: list[int],
    min_part: int = MIN_PART_SIZE,
    max_part: int = MAX_PART_SIZE,
    max_parts: int = MAX_PARTS,
) -> list[PartAssignment]:
    """Greedy ordered packing of contiguous segments into parts.

    Every part except the last is ≥ min_part (S3 rejects undersized
    non-final parts with EntityTooSmall at complete time); all parts ≤
    max_part; raises if the object needs more than max_parts (the
    reference pre-splits to the cap instead, aws_tools.py:195-199 — we
    fail loudly and let the caller raise min_part, same outcome S3
    enforces).

    A greedy close forced by max_part overflow can strand a part below
    min_part; a repair pass merges any undersized non-final part with a
    neighbour when the merge stays ≤ max_part, and raises otherwise
    (parts are contiguous whole segments — segments are never split).
    """
    parts: list[PartAssignment] = []
    cur_first, cur_bytes = 0, 0
    for seq, size in enumerate(segment_sizes):
        if size > max_part:
            raise ValueError(f"segment {seq} exceeds max part size ({size})")
        if cur_bytes + size > max_part:
            parts.append(
                PartAssignment(len(parts) + 1, cur_first, seq - 1, cur_bytes)
            )
            cur_first, cur_bytes = seq, 0
        cur_bytes += size
        if cur_bytes >= min_part:
            parts.append(PartAssignment(len(parts) + 1, cur_first, seq, cur_bytes))
            cur_first, cur_bytes = seq + 1, 0
    if cur_bytes > 0 or not parts:
        parts.append(
            PartAssignment(
                len(parts) + 1, cur_first, len(segment_sizes) - 1, cur_bytes
            )
        )

    # repair: every non-final part must reach min_part
    i = 0
    while i < len(parts) - 1:
        p = parts[i]
        if p.nbytes >= min_part:
            i += 1
            continue
        nxt = parts[i + 1]
        prv = parts[i - 1] if i > 0 else None
        if p.nbytes + nxt.nbytes <= max_part:
            parts[i] = PartAssignment(
                0, p.first_seq, nxt.last_seq, p.nbytes + nxt.nbytes
            )
            del parts[i + 1]
        elif prv is not None and prv.nbytes + p.nbytes <= max_part:
            parts[i - 1] = PartAssignment(
                0, prv.first_seq, p.last_seq, prv.nbytes + p.nbytes
            )
            del parts[i]
        else:
            raise ValueError(
                f"cannot meet min_part={min_part} for part {i + 1} without "
                f"exceeding max_part={max_part}; adjust part-size limits"
            )
    parts = [
        PartAssignment(n + 1, p.first_seq, p.last_seq, p.nbytes)
        for n, p in enumerate(parts)
    ]
    if len(parts) > max_parts:
        raise ValueError(
            f"{len(parts)} parts exceed the {max_parts}-part cap; "
            "increase min_part"
        )
    return parts


class LocalMpu:
    """Filesystem emulation of the S3 multipart-upload protocol:
    create → upload_part(part_no, bytes) from any task → complete
    (driver) concatenates by part number. Same commit semantics as a
    FileOutputCommitter: parts land in a staging dir, complete is the
    atomic publish."""

    def __init__(self, target_path: str):
        self.target = target_path
        self.staging = target_path + ".mpu"

    def create(self) -> str:
        os.makedirs(self.staging, exist_ok=True)
        return self.staging  # the "upload id"

    def part_putter(self):
        """Picklable (part_no, bytes) -> receipt callable for executors
        (the store-agnostic hook upload_segments dispatches through)."""
        staging = self.staging

        def put(part_no: int, data: bytes) -> dict | None:
            import hashlib as _hashlib
            import os as _os

            if not data:
                return None
            path = _os.path.join(staging, f"part-{part_no:05d}")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(data)
            _os.replace(tmp, path)
            return {
                "PartNumber": part_no,
                "ETag": _hashlib.md5(data).hexdigest(),
                "Size": len(data),
            }

        return put

    # runs on executors — must be picklable via simple state
    @staticmethod
    def upload_part(staging: str, part_no: int, data: bytes) -> dict:
        if not data:
            return {}
        path = os.path.join(staging, f"part-{part_no:05d}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return {
            "PartNumber": part_no,
            "ETag": hashlib.md5(data).hexdigest(),
            "Size": len(data),
        }

    def complete(self, receipts: list[dict]) -> str:
        try:
            receipts = sorted(
                (r for r in receipts if r), key=lambda r: r["PartNumber"]
            )
            expected = list(range(1, len(receipts) + 1))
            got = [r["PartNumber"] for r in receipts]
            if got != expected:
                raise RuntimeError(f"missing/duplicate parts: {got}")
            tmp = self.target + ".tmp"
            with open(tmp, "wb") as out:
                for r in receipts:
                    p = os.path.join(self.staging, f"part-{r['PartNumber']:05d}")
                    with open(p, "rb") as f:
                        shutil.copyfileobj(f, out)
            os.replace(tmp, self.target)
            return self.target
        except Exception:
            self.abort()
            raise  # unlike aws_tools.py:168-175: never swallow failure
        finally:
            shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self) -> None:
        shutil.rmtree(self.staging, ignore_errors=True)


def _boto3_kwargs(storage_options: dict | None) -> dict:
    """fsspec/s3fs-style storage_options → boto3 client kwargs
    (≙ aws_tools.py:31-43, where storage_options feed
    fsspec.get_mapper): ``key``/``secret``/``token`` map to the AWS
    credential trio, ``client_kwargs`` (endpoint_url, region_name, …)
    pass through, ``anon`` maps to unsigned requests."""
    so = storage_options or {}
    kw: dict = dict(so.get("client_kwargs", {}))
    if "key" in so:
        kw["aws_access_key_id"] = so["key"]
    if "secret" in so:
        kw["aws_secret_access_key"] = so["secret"]
    if "token" in so:
        kw["aws_session_token"] = so["token"]
    if "endpoint_url" in so:  # allow the flat spelling too
        kw["endpoint_url"] = so["endpoint_url"]
    if so.get("anon"):
        from botocore import UNSIGNED
        from botocore.config import Config

        kw["config"] = Config(signature_version=UNSIGNED)
    return kw


# Bounded exponential backoff for TRANSIENT S3 failures (round 12,
# VERDICT r11 #5): at 10,000 parts a real bucket throttles (SlowDown /
# 503) and occasionally 500s; boto3 carries its own retry layer, but
# the writer adds an explicit outer bound so throttle behavior is
# deterministic and configurable regardless of the client's retry
# mode. Retried: throttle codes + any 5xx. NOT retried: 4xx protocol
# errors (InvalidPart, auth) — those re-raise immediately, keeping the
# repo's deliberate abort-AND-re-raise divergence (mpu complete) fully
# intact. Sleeps are RETRY_BASE · 2^attempt, RETRY_TRIES total
# attempts.
RETRY_TRIES = 5
RETRY_BASE = 0.1

_RETRY_CODES = (
    "SlowDown",
    "Throttling",
    "ThrottlingException",
    "RequestTimeout",
    "RequestTimeoutException",
    "InternalError",
    "ServiceUnavailable",
)


def _s3_retryable(exc: Exception) -> bool:
    """True for botocore ClientErrors carrying a throttle code or a
    5xx status (transient); False for everything else."""
    resp = getattr(exc, "response", None)
    if not isinstance(resp, dict):
        return False
    code = str(resp.get("Error", {}).get("Code", ""))
    status = resp.get("ResponseMetadata", {}).get("HTTPStatusCode", 0)
    return code in _RETRY_CODES or (isinstance(status, int) and status >= 500)


def _call_with_backoff(fn, tries: int, base: float):
    import time

    for attempt in range(tries):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - filtered by _s3_retryable
            if attempt == tries - 1 or not _s3_retryable(e):
                raise
            time.sleep(base * (2**attempt))


class S3Mpu:
    """boto3-backed store with the same interface (endpoint-level
    behavior exercised against the in-process REST stub in
    tests/test_s3_stub.py, incl. throttle-retry fault injection)."""

    def __init__(self, bucket: str, key: str, storage_options: dict | None = None):
        import boto3  # gated: present in the image, endpoint is not

        self.storage_options = storage_options
        self.client = boto3.client("s3", **_boto3_kwargs(storage_options))
        self.bucket, self.key = bucket, key
        self.upload_id: str | None = None

    def create(self) -> str:
        resp = _call_with_backoff(
            lambda: self.client.create_multipart_upload(
                Bucket=self.bucket, Key=self.key
            ),
            RETRY_TRIES,
            RETRY_BASE,
        )
        self.upload_id = resp["UploadId"]
        return self.upload_id

    def part_putter(self):
        """Executor-side part upload (≙ aws_tools.py upload_part): the
        boto3 client is created lazily INSIDE the closure (clients are
        not picklable); only bucket/key/upload_id ship with the task.
        The closure is SELF-CONTAINED (no ccog_spark import on
        executors), so the transient-retry loop is inlined with the
        module's RETRY_* bounds captured at build time."""
        bucket, key, upload_id = self.bucket, self.key, self.upload_id
        storage_options = self.storage_options
        tries, base, retry_codes = RETRY_TRIES, RETRY_BASE, _RETRY_CODES

        def put(part_no: int, data: bytes) -> dict | None:
            if not data:
                return None
            import time as _time

            import boto3 as _boto3

            client = _boto3.client("s3", **_boto3_kwargs(storage_options))
            for attempt in range(tries):
                try:
                    resp = client.upload_part(
                        Bucket=bucket,
                        Key=key,
                        UploadId=upload_id,
                        PartNumber=part_no,
                        Body=data,
                    )
                    break
                except Exception as e:  # noqa: BLE001 - code-filtered below
                    r = getattr(e, "response", None)
                    code = (
                        str(r.get("Error", {}).get("Code", ""))
                        if isinstance(r, dict)
                        else ""
                    )
                    status = (
                        r.get("ResponseMetadata", {}).get("HTTPStatusCode", 0)
                        if isinstance(r, dict)
                        else 0
                    )
                    transient = code in retry_codes or (
                        isinstance(status, int) and status >= 500
                    )
                    if attempt == tries - 1 or not transient:
                        raise
                    _time.sleep(base * (2**attempt))
            return {
                "PartNumber": part_no,
                "ETag": resp["ETag"],
                "Size": len(data),
            }

        return put

    def complete(self, receipts: list[dict]) -> str:
        try:
            receipts = [r for r in receipts if r]
            parts = sorted(
                ({"PartNumber": r["PartNumber"], "ETag": r["ETag"]} for r in receipts),
                key=lambda r: r["PartNumber"],
            )
            expected_size = sum(int(r.get("Size", 0)) for r in receipts)
            self._complete_with_backoff(parts, expected_size)
            # completed uploads can't be aborted: clear the id so a
            # caller's cleanup-path abort() is a no-op instead of a
            # NoSuchUpload ClientError (round-6 review — same
            # idempotency complete's failure path already has)
            self.upload_id = None
            return f"s3://{self.bucket}/{self.key}"
        except Exception:
            self.abort()
            raise

    def _complete_with_backoff(
        self, parts: list[dict], expected_size: int | None = None
    ) -> None:
        """complete_multipart_upload with the writer's transient-retry
        bound, PLUS the complete-specific ambiguity rule (round-13
        ADVICE): complete is NOT idempotent — if the first attempt
        succeeds server-side but its response is lost (5xx/timeout),
        the RETRY returns NoSuchUpload (404), which naively reads as
        failure and triggers abort-and-re-raise for an upload that
        actually landed. So a NoSuchUpload raised on attempt > 0 is
        resolved by HEAD-ing the target object — but EXISTENCE alone
        is not enough (round-14, ADVICE r13): when the key is being
        OVERWRITTEN, a stale predecessor object also HEADs fine, and
        declaring victory on it would silently report success for
        data that never landed. The HEAD must therefore match THIS
        upload: ContentLength == Σ uploaded part sizes, and when the
        ETag carries S3's multipart part-count suffix ("…-<n>"), n ==
        len(parts). A mismatched HEAD means the lost attempt really
        is lost → the original NoSuchUpload propagates (abort +
        re-raise upstream)."""
        import time

        for attempt in range(RETRY_TRIES):
            try:
                self.client.complete_multipart_upload(
                    Bucket=self.bucket,
                    Key=self.key,
                    UploadId=self.upload_id,
                    MultipartUpload={"Parts": parts},
                )
                return
            except Exception as e:  # noqa: BLE001 - code-filtered below
                resp = getattr(e, "response", None)
                code = (
                    str(resp.get("Error", {}).get("Code", ""))
                    if isinstance(resp, dict)
                    else ""
                )
                if attempt > 0 and code == "NoSuchUpload":
                    try:
                        head = self.client.head_object(
                            Bucket=self.bucket, Key=self.key
                        )
                    except Exception:  # noqa: BLE001 - HEAD 404/denied
                        raise e from None
                    if self._head_matches_upload(
                        head, parts, expected_size
                    ):
                        return  # object IS this upload: lost attempt won
                    raise e from None
                if attempt == RETRY_TRIES - 1 or not _s3_retryable(e):
                    raise
                time.sleep(RETRY_BASE * (2**attempt))

    @staticmethod
    def _head_matches_upload(
        head: dict, parts: list[dict], expected_size: int | None
    ) -> bool:
        """Does a HEAD response describe THIS multipart upload (vs a
        stale predecessor under an overwritten key)? ContentLength
        must equal the summed part sizes when the caller knows them,
        and a multipart ETag's "-<n>" suffix must equal the part
        count. A HEAD with neither signal available (no size passed,
        no multipart suffix) is treated as NOT matching — the
        ambiguous case costs a spurious abort-and-retry upstream,
        never a silent false success."""
        checked = False
        if expected_size is not None:
            cl = head.get("ContentLength")
            if cl is None or int(cl) != int(expected_size):
                return False
            checked = True
        etag = str(head.get("ETag", "")).strip('"')
        if "-" in etag:
            suffix = etag.rsplit("-", 1)[1]
            if suffix.isdigit():
                if int(suffix) != len(parts):
                    return False
                checked = True
        return checked

    def abort(self) -> None:
        """Abort the in-flight MPU (called by the writer when any part
        upload fails — without this, failed writes leave orphan parts
        accruing storage forever; found by the round-6 lifecycle
        test). IDEMPOTENT: upload_id is cleared after a successful
        abort so the writer's own except-path abort after a
        complete-failure abort is a no-op instead of a NoSuchUpload
        ClientError that would mask the original exception."""
        if self.upload_id is not None:
            self.client.abort_multipart_upload(
                Bucket=self.bucket, Key=self.key, UploadId=self.upload_id
            )
            self.upload_id = None


def resolve_store(path: str, storage_options: dict | None = None):
    """Path-string → store resolution (≙ aws_tools.py:31-43's
    fsspec/storage_options dispatch, reduced to the two stores this
    container can express): ``s3://bucket/key`` → S3Mpu, anything else
    → LocalMpu on the filesystem.

    ``storage_options`` follows the fsspec/s3fs convention
    (key/secret/token, anon, client_kwargs={endpoint_url, region_name})
    so an S3-compatible endpoint (minio/moto) can be targeted without
    code changes; ignored for local paths like the reference ignores it
    for non-string stores."""
    if path.startswith("s3://"):
        rest = path[5:]
        bucket, _, key = rest.partition("/")
        if not bucket or not key:
            raise ValueError(f"malformed s3 path {path!r}")
        return S3Mpu(bucket, key, storage_options)
    return LocalMpu(path)


def upload_segments(segments_df, n_parts: int, put) -> list[dict]:
    """Pass 2: distributed ordered upload.

    ``segments_df``: (seq BIGINT, part_no INT, data BINARY) — every
    byte segment of the object in file order, the header included as
    seq 0 (a 1-row DataFrame unioned in by the caller).

    ``put``: a picklable (part_no, bytes) -> receipt callable from the
    store's ``part_putter()`` — LocalMpu writes staging files, S3Mpu
    calls upload_part; the pass itself is store-agnostic.

    repartitionByRange(part_no) gives each task a contiguous run of
    parts; rows are sorted (part_no, seq) so concatenation preserves
    file order inside each part. Returns upload receipts.
    """

    def upload_partition(rows):
        receipts = []
        cur_part, chunks = None, []
        for row in rows:
            if row.part_no != cur_part:
                if cur_part is not None:
                    r = put(cur_part, b"".join(chunks))
                    if r:
                        receipts.append(r)
                cur_part, chunks = row.part_no, []
            chunks.append(bytes(row.data))
        if cur_part is not None:
            r = put(cur_part, b"".join(chunks))
            if r:
                receipts.append(r)
        return iter(receipts)

    return (
        segments_df.repartitionByRange(max(1, min(n_parts, 200)), "part_no")
        .sortWithinPartitions("part_no", "seq")
        .rdd.mapPartitions(upload_partition)
        .collect()
    )


def presigned_url(bucket: str, key: str, expires: int = 3600) -> str:
    """Presigned GET URL for a written object (≙ aws_tools.py:46-56).
    boto3 is present in the image; needs live credentials/endpoint."""
    import boto3

    return boto3.client("s3").generate_presigned_url(
        "get_object", Params={"Bucket": bucket, "Key": key}, ExpiresIn=expires
    )
