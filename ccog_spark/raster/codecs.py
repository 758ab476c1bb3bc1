"""Tile codecs (E23 ≙ the reference profile's compress choices,
ccog/ccog.py:24-39 and _adjust_compression :452-478).

Implemented: deflate (zlib), LZW (pure Python, TIFF 6.0 §13 including
the historical "early change" code-width quirk), LZMA (public
GDAL/libtiff tag), zstd (GDAL tag 50000, gated on the optional
``zstandard`` module). jpeg/webp need image codec libraries that are
not in this container and raise a clear error.

Scale note: LZW here is a pure-Python kernel — spec-correct and
GDAL-readable, but ~MB/s per core. It exists for reference-profile
parity; at 100 TB use deflate or zstd (C-speed, release-level knob).
"""

from __future__ import annotations

import zlib

COMPRESSION_LZW = 5
COMPRESSION_DEFLATE = 8
COMPRESSION_LZMA = 34925  # public GDAL/libtiff LZMA tag
COMPRESSION_ZSTD = 50000  # public GDAL/libtiff ZSTD tag

CODEC_TAGS = {
    "deflate": COMPRESSION_DEFLATE,
    "lzw": COMPRESSION_LZW,
    "lzma": COMPRESSION_LZMA,
    "zstd": COMPRESSION_ZSTD,
}

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
    """Encode one tile payload. ``level`` applies to deflate/lzma/zstd;
    LZW has no level knob."""
    if codec == "deflate":
        return zlib.compress(data, level)
    if codec == "lzw":
        return lzw_encode(data)
    if codec == "lzma":
        import lzma

        return lzma.compress(data, preset=level)
    if codec == "zstd":
        try:
            import zstandard
        except ImportError as e:  # pragma: no cover - env-dependent
            raise ImportError(
                "codec 'zstd' needs the optional 'zstandard' module "
                "(not installed in this container); use 'deflate' or "
                "'lzw'"
            ) from e
        return zstandard.ZstdCompressor(level=level).compress(data)
    if codec in ("jpeg", "webp"):
        raise ValueError(
            f"codec {codec!r} needs image codec libraries not present "
            "in this container"
        )
    raise ValueError(f"unknown codec {codec!r}")


def decompress(data: bytes, compression: int = COMPRESSION_DEFLATE) -> bytes:
    """Decode one tile payload by TIFF compression tag."""
    if compression == COMPRESSION_DEFLATE:
        return zlib.decompress(data)
    if compression == COMPRESSION_LZW:
        return lzw_decode(data)
    if compression == COMPRESSION_LZMA:
        import lzma

        return lzma.decompress(data)
    if compression == COMPRESSION_ZSTD:
        try:
            import zstandard
        except ImportError as e:  # pragma: no cover - env-dependent
            raise ImportError("reading zstd tiles needs 'zstandard'") from e
        return zstandard.ZstdDecompressor().decompress(data)
    raise ValueError(f"unsupported TIFF compression tag {compression}")
