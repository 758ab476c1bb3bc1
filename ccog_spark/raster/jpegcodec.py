"""Pure-numpy baseline JPEG codec (ITU-T T.81, public spec).

Fills the registry's 'jpeg' slot (raster/codecs.py) so the
shared-JPEGTables invariant guards a REAL global-tables codec — the
reference lists JPEG as a first-class profile option and enforces that
every dask part derives byte-identical tables
(/root/reference/ccog/ccog.py:24-39, 261-289). No image library ships
in this container, so the codec is implemented from the spec:

- baseline sequential DCT, 8-bit, single component (grayscale) — one
  COG band plane per tile, PlanarConfiguration=2, exactly our writer's
  tile payload shape;
- Annex K.1 luminance quantization table scaled by the public IJG
  quality rule; Annex K.3 standard DC/AC Huffman tables (fixed, not
  optimized — that is what makes the tables a pure function of the
  quality level, the property the shared-tables invariant needs);
- ABBREVIATED streams (TIFF tag 347 style): ``make_tables`` emits the
  tables-only stream stored once in JPEGTables; ``encode`` emits
  tables-free SOI/SOF0/SOS tile streams. ``decode`` accepts either a
  standalone stream or ``tables + tile`` concatenated (the reader
  prepends the tag payload).

The DCT/quantization passes are vectorized numpy over all 8×8 blocks
at once; only the entropy (Huffman) pass is a per-block Python loop —
acceptable for the encode path because tiles are encoded inside an
Arrow-batched Spark kernel, and the whole codec exists for format
parity, not throughput (use deflate/zstd for bulk data; same caveat as
the pure-Python LZW).

``level`` semantics: for this codec the COG writer's compress_level IS
the JPEG quality, clamped to 1..100 (GDAL's JPEG_QUALITY creation
option has the same 1-100 domain).
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 luminance quantization table, natural (row-major) order.
BASE_QUANT = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

# Zigzag scan: position k in the scan reads natural index ZIGZAG[k].
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3.1/K.3.2: standard luminance Huffman tables as
# (BITS counts per code length 1..16, ordered symbol values).
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Orthonormal 8-point DCT-II matrix: A @ x applies the 1-D transform.
_DCT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _c = np.sqrt(1.0 / 8) if _k == 0 else np.sqrt(2.0 / 8)
        _DCT[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16)


def quant_table(level: int) -> np.ndarray:
    """IJG quality scaling of the Annex K table (public libjpeg rule):
    quality 50 = base table, 100 = all ones (near-lossless), 1 =
    coarsest. Pure function of ``level`` — the shared-tables contract."""
    q = min(100, max(1, int(level)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (BASE_QUANT * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


def _canonical_codes(bits: list[int], vals: list[int]):
    """JPEG canonical Huffman assignment (T.81 Annex C): symbol →
    (code, length)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(DC_BITS, DC_VALS)
_AC_CODES = _canonical_codes(AC_BITS, AC_VALS)


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">HH", tag, len(payload) + 2) + payload


def _dqt_segment(level: int) -> bytes:
    zz = quant_table(level).reshape(64)[ZIGZAG]
    return _marker(0xFFDB, b"\x00" + bytes(int(v) for v in zz))


def _dht_segments() -> bytes:
    dc = _marker(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    ac = _marker(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    return dc + ac


def make_tables(level: int) -> bytes:
    """The JPEGTables (TIFF tag 347) payload: a tables-only abbreviated
    stream — SOI, DQT, the two DHTs, EOI (the layout GDAL/libtiff
    write)."""
    return b"\xff\xd8" + _dqt_segment(level) + _dht_segments() + b"\xff\xd9"


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 B.1.1.5)
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill padding per spec


def encode(data: bytes, level: int = 75) -> bytes:
    """Encode one square uint8 tile plane (blocksize² bytes — the COG
    writer's payload contract; blocksize is a multiple of 16, so MCU
    alignment is automatic) as an abbreviated baseline JPEG stream."""
    side = int(np.sqrt(len(data)))
    if side * side != len(data) or side % 8:
        raise ValueError(
            f"jpeg codec expects a square uint8 tile with side a "
            f"multiple of 8; got {len(data)} bytes"
        )
    img = np.frombuffer(data, dtype=np.uint8).reshape(side, side)
    q = quant_table(level)

    # all blocks at once: (nb, 8, 8) → DCT → quantize → zigzag
    blocks = (
        img.reshape(side // 8, 8, side // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
    quant = np.round(coef / q).astype(np.int64)
    zz = quant.reshape(-1, 64)[:, ZIGZAG]

    w = _BitWriter()
    pred = 0
    for row in zz:
        dc = int(row[0])
        diff = dc - pred
        pred = dc
        s = _category(diff)
        code, length = _DC_CODES[s]
        w.put(code, length)
        if s:
            w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        # AC: run-length of zeros + category
        nz = np.nonzero(row[1:])[0]
        k = 1
        for idx in nz:
            pos = int(idx) + 1
            run = pos - k
            while run > 15:
                w.put(*_AC_CODES[0xF0])  # ZRL
                run -= 16
            v = int(row[pos])
            s = _category(v)
            code, length = _AC_CODES[(run << 4) | s]
            w.put(code, length)
            w.put(v if v >= 0 else v + (1 << s) - 1, s)
            k = pos + 1
        if k <= 63:
            w.put(*_AC_CODES[0x00])  # EOB
    w.flush()

    sof = _marker(
        0xFFC0, struct.pack(">BHHB", 8, side, side, 1) + b"\x01\x11\x00"
    )
    sos = _marker(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    return b"\xff\xd8" + sof + sos + bytes(w.out) + b"\xff\xd9"


class _BitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed byte
                self.pos += 2
            else:  # a real marker terminates entropy data
                raise _ScanEnd(self.pos)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v


class _ScanEnd(Exception):
    def __init__(self, pos: int):
        self.pos = pos


def _decode_tables(codes: dict[int, tuple[int, int]]):
    """(length, code) → symbol lookup for canonical decoding."""
    return {(length, code): sym for sym, (code, length) in codes.items()}


def _read_huffman(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bits(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("corrupt JPEG stream: no Huffman code matched")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode(data: bytes) -> bytes:
    """Decode a baseline grayscale JPEG stream to raw uint8 bytes.
    Accepts standalone streams OR ``tables_stream + tile_stream``
    concatenations (abbreviated TIFF form: the caller prepends the
    JPEGTables tag payload; interior EOI/SOI markers are skipped).
    Corrupt or truncated input raises ValueError — never hangs or
    crashes with a raw IndexError (fuzz-tested)."""
    try:
        return _decode(data)
    except (IndexError, KeyError, OverflowError, struct.error) as e:
        raise ValueError(f"corrupt JPEG stream: {e!r}") from e


def _decode(data: bytes) -> bytes:
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = None
    dc_id = ac_id = 0
    pos = 0
    n = len(data)
    out = None
    while pos < n - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        m = data[pos + 1]
        if m in (0xD8, 0xD9, 0x01) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if m == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 15
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(
                    body[b + 1 : b + 65], dtype=np.uint8
                ).astype(np.int64)
                qt[tq] = tbl.reshape(8, 8)
                b += 65
        elif m == 0xC4:  # DHT (possibly several)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 15
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                huff[(tc, th)] = _decode_tables(_canonical_codes(bits, vals))
                b += 17 + nv
        elif m == 0xC0:  # SOF0 baseline
            precision, height, width, ncomp = struct.unpack_from(
                ">BHHB", body, 0
            )
            if precision != 8 or ncomp != 1:
                raise ValueError(
                    "only 8-bit single-component baseline JPEG supported"
                )
            # per-component fields start at offset 6: id, sampling, Tq
            qt_id = body[8]
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0) JPEG supported")
        elif m == 0xDA:  # SOS → entropy data follows
            dc_id = body[2] >> 4
            ac_id = body[2] & 15
            if width is None:
                raise ValueError("SOS before SOF0")
            if (0, dc_id) not in huff or (1, ac_id) not in huff or not qt:
                raise ValueError(
                    "abbreviated JPEG tile has no tables in-stream — "
                    "prepend the JPEGTables (TIFF tag 347) payload"
                )
            reader = _BitReader(data, pos + 2 + seglen)
            nb = (height // 8) * (width // 8)
            zz = np.zeros((nb, 64), dtype=np.int64)
            pred = 0
            done = 0
            try:
                for bi in range(nb):
                    s = _read_huffman(reader, huff[(0, dc_id)])
                    if s > 15:  # baseline DC categories are 0..11
                        raise ValueError(f"bad DC category {s}")
                    diff = _extend(reader.bits(s), s) if s else 0
                    pred += diff
                    zz[bi, 0] = pred
                    k = 1
                    while k <= 63:
                        sym = _read_huffman(reader, huff[(1, ac_id)])
                        if sym == 0x00:  # EOB
                            break
                        run, s = sym >> 4, sym & 15
                        if s == 0:
                            if run != 15:
                                raise ValueError("bad AC symbol")
                            k += 16
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("AC index out of range")
                        zz[bi, k] = _extend(reader.bits(s), s)
                        k += 1
                    done = bi + 1
            except _ScanEnd:
                # a marker inside the entropy data before every block
                # decoded = truncated scan; returning the partial image
                # would be silent corruption (round-6 review)
                raise ValueError(
                    f"truncated JPEG scan: {done} of {nb} blocks decoded"
                )
            q = qt[qt_id]
            blocks = np.zeros((nb, 64), dtype=np.int64)
            blocks[:, ZIGZAG] = zz
            coef = blocks.reshape(nb, 8, 8).astype(np.float64) * q
            pix = np.einsum("ji,njk,kl->nil", _DCT, coef, _DCT) + 128.0
            pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
            bh, bw = height // 8, width // 8
            out = (
                pix.reshape(bh, bw, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(height, width)
            )
            # continue scanning (skips trailing EOI); nothing else to do
            break
        pos += 2 + seglen
    if out is None:
        raise ValueError(
            "no scan data found — abbreviated JPEG tile decoded without "
            "its JPEGTables? prepend the tag 347 payload"
        )
    return out.tobytes()
