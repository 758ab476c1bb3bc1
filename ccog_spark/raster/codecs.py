"""Tile codecs (E23 ≙ the reference profile's compress choices,
ccog/ccog.py:24-39 and _adjust_compression :452-478).

Implemented: deflate (zlib), LZW (pure Python, TIFF 6.0 §13 including
the historical "early change" code-width quirk), PackBits (TIFF 6.0
§9 — spec-worked-example-pinned; round 8), LZMA (public
GDAL/libtiff tag), zstd (GDAL tag 50000, gated on the optional
``zstandard`` module), and baseline JPEG (pure numpy, raster/
jpegcodec.py — abbreviated tile streams whose global tables live in
the TIFF JPEGTables tag, exercising the shared-tables invariant with
a real tables-carrying codec), and WebP-lossless / VP8L (pure
Python, raster/webpcodec.py, RFC 9649 — gray tile plane under
SUBTRACT_GREEN with canonical prefix codes; the former port point is
live).

Scale note: LZW here is a pure-Python kernel — spec-correct and
GDAL-readable, but ~MB/s per core. It exists for reference-profile
parity; at 100 TB use deflate or zstd (C-speed, release-level knob).
"""

from __future__ import annotations

import zlib
from collections.abc import Callable
from dataclasses import dataclass

COMPRESSION_NONE = 1  # uncompressed (common in foreign plain GeoTIFFs)
COMPRESSION_LZW = 5
COMPRESSION_JPEG = 7  # public TIFF 6.0 new-style JPEG tag
COMPRESSION_DEFLATE = 8
COMPRESSION_PACKBITS = 32773  # TIFF 6.0 §9 (old scanners, fax TIFFs)
COMPRESSION_WEBP = 50001  # public GDAL/libtiff WebP tag
COMPRESSION_LZMA = 34925  # public GDAL/libtiff LZMA tag
COMPRESSION_ZSTD = 50000  # public GDAL/libtiff ZSTD tag

CODEC_TAGS = {
    "deflate": COMPRESSION_DEFLATE,
    "lzw": COMPRESSION_LZW,
    "lzma": COMPRESSION_LZMA,
    "zstd": COMPRESSION_ZSTD,
    "jpeg": COMPRESSION_JPEG,
    "webp": COMPRESSION_WEBP,
    "packbits": COMPRESSION_PACKBITS,
}


@dataclass(frozen=True)
class CodecSpec:
    """A pluggable tile codec.

    ``make_tables`` is the port point for codecs that carry GLOBAL
    side tables shared by every tile — JPEG's quantization/Huffman
    tables (TIFF tag 347 JPEGTables). It must be a pure function of
    the codec parameters (level), because tiles are encoded
    independently across partitions and the finished COG stores ONE
    copy: the writer asserts every part derived byte-identical tables
    (the reference's _test_jpegtables invariant,
    /root/reference/ccog/ccog.py:261-289) before emitting the tag.

    Registration is per-process: a deployment adding e.g. a real JPEG
    codec must call ``register_codec`` at import time from a module
    shipped to the executors (local registration on the driver alone
    does not reach executor processes on a real cluster).
    """

    name: str
    tag: int
    encode: Callable[[bytes, int], bytes]  # (payload, level) -> bytes
    decode: Callable[[bytes], bytes]
    make_tables: Callable[[int], bytes] | None = None  # (level) -> tables
    # writer-enforced constraints: permissible sample dtypes (None =
    # any) and whether TIFF predictors compose with this codec (a lossy
    # pixel-domain codec must see raw samples, not differences)
    sample_dtypes: tuple[str, ...] | None = None
    predictor_ok: bool = True


def _zstd_encode(data: bytes, level: int) -> bytes:
    try:
        import zstandard
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "codec 'zstd' needs the optional 'zstandard' module "
            "(not installed in this container); use 'deflate' or 'lzw'"
        ) from e
    return zstandard.ZstdCompressor(level=level).compress(data)


def _zstd_decode(data: bytes) -> bytes:
    try:
        import zstandard
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError("reading zstd tiles needs 'zstandard'") from e
    return zstandard.ZstdDecompressor().decompress(data)


def packbits_encode(data: bytes, level: int = 0) -> bytes:
    """TIFF 6.0 §9 PackBits (Apple run-length): runs of ≥2 equal bytes
    become (-(len-1), byte); literal stretches become (len-1, bytes).
    Literal stretches break at the next ≥3-byte repeat — the exact
    packing of the spec's worked example (pinned in tests). Packs the
    whole tile buffer (runs may cross row boundaries; sequential
    decoders — libtiff/GDAL — accept this). ``level`` ignored:
    PackBits has no ratio knob."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j < n - 1 and data[j] == data[j + 1] and j - i < 127:
            j += 1
        if j > i:  # run of length j-i+1 in 2..128
            out.append((257 - (j - i + 1)) & 0xFF)
            out.append(data[i])
            i = j + 1
            continue
        j = i
        while j < n and j - i < 128:
            if j < n - 2 and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def packbits_decode(data: bytes) -> bytes:
    """Inverse of packbits_encode; accepts any spec-valid stream
    (incl. per-row packings from other writers — the decode is purely
    sequential). Truncated streams raise ValueError."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:  # literal: next c+1 bytes
            if i + c + 1 > n:
                raise ValueError("truncated PackBits literal run")
            out += data[i : i + c + 1]
            i += c + 1
        elif c == 128:  # noop per spec
            continue
        else:  # repeat next byte 257-c times (2..128)
            if i >= n:
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    return bytes(out)


def _lzma_encode(data: bytes, level: int) -> bytes:
    import lzma

    return lzma.compress(data, preset=level)


def _lzma_decode(data: bytes) -> bytes:
    import lzma

    return lzma.decompress(data)


# Bound DIRECTLY to the jpegcodec module functions (not lazy wrappers
# with an import inside the body): a runtime `import ccog_spark…` in a
# worker-side closure would defeat the by-value shipping contract —
# encode_tiles registers BOTH this module and jpegcodec with
# cloudpickle's by-value pickling, so these references serialize whole.
from ccog_spark.raster import jpegcodec as _jpegcodec  # noqa: E402
from ccog_spark.raster import webpcodec as _webpcodec  # noqa: E402

REGISTRY: dict[str, CodecSpec] = {
    # Uncompressed passthrough (tag 1) — foreign plain GeoTIFFs are
    # often written without compression; registering it makes those
    # readable. Not a sensible WRITE choice for COGs, but harmless.
    "none": CodecSpec(
        "none", COMPRESSION_NONE, lambda d, lv: bytes(d), bytes,
    ),
    "deflate": CodecSpec(
        "deflate",
        COMPRESSION_DEFLATE,
        lambda d, lv: zlib.compress(d, lv),
        zlib.decompress,
    ),
    "lzw": CodecSpec(
        "lzw",
        COMPRESSION_LZW,
        lambda d, lv: lzw_encode(d),
        lambda d: lzw_decode(d),
    ),
    "lzma": CodecSpec("lzma", COMPRESSION_LZMA, _lzma_encode, _lzma_decode),
    "zstd": CodecSpec("zstd", COMPRESSION_ZSTD, _zstd_encode, _zstd_decode),
    # TIFF 6.0 §9 PackBits (round 8): decode-side parity for foreign
    # files from old scanners/fax pipelines; also writable (predictor
    # 2 composes per spec, useful for categorical/mask-like rasters)
    "packbits": CodecSpec(
        "packbits", COMPRESSION_PACKBITS, packbits_encode, packbits_decode,
    ),
    # Real pure-numpy baseline JPEG (raster/jpegcodec.py): abbreviated
    # tile streams + make_tables for the shared JPEGTables tag — the
    # registry's one live global-tables codec.
    "jpeg": CodecSpec(
        "jpeg", COMPRESSION_JPEG, _jpegcodec.encode, _jpegcodec.decode,
        make_tables=_jpegcodec.make_tables,
        sample_dtypes=("uint8",), predictor_ok=False,
    ),
    # Real pure-Python WebP-lossless / VP8L (raster/webpcodec.py,
    # RFC 9649): gray tile plane under SUBTRACT_GREEN, canonical
    # prefix codes — the former port point is live
    "webp": CodecSpec(
        "webp", COMPRESSION_WEBP, _webpcodec.encode, _webpcodec.decode,
        sample_dtypes=("uint8",), predictor_ok=False,
    ),
}


def register_codec(spec: CodecSpec) -> None:
    """Install (or replace) a codec in this process. See CodecSpec for
    the cluster-wide registration contract."""
    REGISTRY[spec.name] = spec
    CODEC_TAGS[spec.name] = spec.tag


def shared_tables(codec: str, level: int) -> bytes | None:
    """The codec's global side tables for these parameters, or None
    for tableless codecs (everything but JPEG-family)."""
    spec = REGISTRY.get(codec)
    if spec is None or spec.make_tables is None:
        return None
    return spec.make_tables(level)


def check_shared_tables(expected: bytes, got: bytes) -> None:
    """Per-part invariant: independently-encoded parts must derive
    byte-identical shared tables (≙ the reference's _test_jpegtables,
    ccog/ccog.py:261-289 — same error text)."""
    if expected != got:
        raise ValueError("different JPEGTables")

_CLEAR, _EOI = 256, 257


def lzw_encode(data: bytes) -> bytes:
    """TIFF-flavor LZW: MSB-first bit packing, 9→12-bit codes, Clear
    at 256 / EOI at 257, and the encoder-side width switch when the
    next free entry reaches 2^w − 1 (511/1023/2047 — TIFF 6.0 §13's
    "early change"). The table is cleared at entry 4094, matching
    libtiff's margin, so codes never exceed 12 bits."""
    out = bytearray()
    buf = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((buf >> nbits) & 0xFF)
        buf &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(_CLEAR)
    w = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        elif next_code == 4094:
            emit(_CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        emit(table[w])
    emit(_EOI)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes) -> bytes:
    """Inverse of lzw_encode. The decoder's table lags the encoder's by
    one entry, so it switches width one entry EARLIER — after adding
    code 510/1022/2046 (TIFF 6.0 §13)."""
    bits = int.from_bytes(data, "big")
    total = len(data) * 8
    pos = 0
    width = 9
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    old: bytes | None = None

    while pos + width <= total:
        code = (bits >> (total - pos - width)) & ((1 << width) - 1)
        pos += width
        if code == _EOI:
            break
        if code == _CLEAR:
            del table[258:]
            width = 9
            old = None
            continue
        if old is None:  # first code after (re)initialization
            entry = table[code]
            out += entry
            old = entry
            continue
        if code < len(table):
            entry = table[code]
            table.append(old + entry[:1])
        elif code == len(table):  # KwKwK case
            entry = old + old[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code}")
        out += entry
        old = entry
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out)


def compress(data: bytes, codec: str = "deflate", level: int = 6) -> bytes:
    """Encode one tile payload through the registry. ``level`` applies
    to deflate/lzma/zstd; LZW has no level knob."""
    spec = REGISTRY.get(codec)
    if spec is None:
        raise ValueError(f"unknown codec {codec!r}")
    return spec.encode(data, level)


def decompress(
    data: bytes,
    compression: int = COMPRESSION_DEFLATE,
    tables: bytes | None = None,
) -> bytes:
    """Decode one tile payload by TIFF compression tag (registry
    lookup, so registered codecs decode too). ``tables``: the IFD's
    JPEGTables payload for abbreviated-stream codecs — prepended so
    the codec sees one self-contained stream."""
    for spec in REGISTRY.values():
        if spec.tag == compression:
            if tables is not None and spec.make_tables is not None:
                return spec.decode(tables + data)
            return spec.decode(data)
    raise ValueError(f"unsupported TIFF compression tag {compression}")


# ------------------------------------------------------ TIFF predictors
# The predictor pair lives HERE (not in raster.tiff) because this
# module is the one shipped by value to executors — keeping one
# implementation for the writer kernel, the distributed reader, and
# the driver-side tiff parser (which delegates) prevents the two
# decode paths from silently diverging (round-6 review finding).


def predict_tile(arr, predictor: int) -> bytes:
    """Apply TIFF predictor to a 2-D native-dtype tile before
    compression. 2 = horizontal differencing on integer samples
    (TIFF 6.0 §14); 3 = floating-point horizontal byte differencing
    (big-endian byte-plane split then byte diff — TIFF Technical Note
    3, the public fp predictor every libtiff implements)."""
    import numpy as np

    if predictor == 1:
        return arr.tobytes()
    if predictor == 2:
        d = arr.copy()
        d[:, 1:] = d[:, 1:] - arr[:, :-1]  # modular wrap for ints
        return d.tobytes()
    if predictor == 3:
        h, w = arr.shape
        it = arr.dtype.itemsize
        be = np.ascontiguousarray(arr, dtype=arr.dtype.newbyteorder(">"))
        rows = be.view(np.uint8).reshape(h, w, it).transpose(0, 2, 1)
        rows = np.ascontiguousarray(rows).reshape(h, it * w)
        d = rows.copy()
        d[:, 1:] = d[:, 1:] - rows[:, :-1]
        return d.tobytes()
    raise ValueError(f"unknown predictor {predictor}")


def unpredict_tile(raw: bytes, predictor: int, h: int, w: int, np_dtype: str):
    """Inverse of predict_tile: decompressed bytes → 2-D native array."""
    import numpy as np

    dt = np.dtype(np_dtype)
    if predictor == 1:
        return np.frombuffer(raw, dtype=dt).reshape(h, w)
    if predictor == 2:
        d = np.frombuffer(raw, dtype=dt).reshape(h, w)
        return np.cumsum(d, axis=1, dtype=dt)
    if predictor == 3:
        it = dt.itemsize
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, it * w)
        acc = np.cumsum(rows, axis=1, dtype=np.uint8)
        planes = acc.reshape(h, it, w).transpose(0, 2, 1)
        be = np.ascontiguousarray(planes).reshape(h, w * it)
        return be.view(dt.newbyteorder(">")).reshape(h, w).astype(dt)
    raise ValueError(f"unknown predictor {predictor}")


def register_worker_modules() -> None:
    """Ship this module AND raster.jpegcodec/webpcodec (whose
    functions the REGISTRY references) to executors BY VALUE, so
    worker processes never need an importable ccog_spark package. ONE
    place for the shipping contract — every kernel builder
    (encode_tiles, read_cog_pixels, read_cog_mask) calls this instead
    of repeating the registration block (round-6 review finding)."""
    try:
        from pyspark.cloudpickle import register_pickle_by_value

        from ccog_spark.raster import codecs as _codecs
        from ccog_spark.raster import jpegcodec as _jc
        from ccog_spark.raster import webpcodec as _wc

        register_pickle_by_value(_codecs)
        register_pickle_by_value(_jc)
        register_pickle_by_value(_wc)
    except ImportError:  # pragma: no cover - older pyspark
        pass
