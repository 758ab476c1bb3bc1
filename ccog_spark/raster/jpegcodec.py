"""Pure-numpy baseline JPEG codec (ITU-T T.81, public spec).

Fills the registry's 'jpeg' slot (raster/codecs.py) so the
shared-JPEGTables invariant guards a REAL global-tables codec — the
reference lists JPEG as a first-class profile option and enforces that
every dask part derives byte-identical tables
(/root/reference/ccog/ccog.py:24-39, 261-289). No image library ships
in this container, so the codec is implemented from the spec:

- baseline sequential DCT, 8-bit; GRAYSCALE (one COG band plane per
  tile, PlanarConfiguration=2) and 3-component YCbCr COLOR
  (interleaved RGB tiles, PlanarConfiguration=1 + Photometric=YCbCr —
  the dominant real-world JPEG-in-COG shape, GDAL's default for RGB);
  no chroma subsampling on encode (all components 1x1 — "4:4:4"),
  decode additionally accepts 2x2-luma 4:2:0 streams (what GDAL/libjpeg
  write by default) with box upsampling;
- Annex K.1 luminance + K.2 chrominance quantization tables scaled by
  the public IJG quality rule; Annex K.3 standard DC/AC Huffman tables
  for both classes (fixed, not optimized — that is what makes the
  tables a pure function of the quality level, the property the
  shared-tables invariant needs);
- ABBREVIATED streams (TIFF tag 347 style): ``make_tables`` emits the
  tables-only stream stored once in JPEGTables — BOTH table sets, the
  layout GDAL/libtiff write, which is why GDAL JPEGTables carries two
  DQT/DHT pairs; ``encode``/``encode_color`` emit tables-free
  SOI/SOF0/SOS tile streams. ``decode`` accepts either a standalone
  stream or ``tables + tile`` concatenated (the reader prepends the
  tag payload).

The DCT/quantization AND the Huffman symbol/category/run-length
passes are vectorized numpy over all blocks at once; the entropy
bitstream itself is packed with np.packbits (no per-symbol Python
loop on encode). The DECODE entropy pass (round 8) de-stuffs and
splits restart segments in one vectorized scan, memo-caches the 64Ki
lookahead tables across tiles (a COG read re-parses the same
JPEGTables for every tile), and walks symbols over precomputed
24-bit byte windows with packed (len|sym) list lookups — ~1.6×
the _BitReader reference walk, which is kept verbatim as the oracle
(`_ENTROPY_IMPL`), byte-identical on the golden/fuzz corpus. A full
per-bit-position gather variant was tried and rejected: .tolist() on
multi-million-entry arrays costs more than the walk saves. Residual
per-symbol Python is the floor; tiles decode embarrassingly parallel
inside Arrow-batched Spark kernels (use deflate/zstd for bulk data).

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

# Annex K.2 chrominance quantization table.
CHROMA_QUANT = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
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

# Annex K.3.1/K.3.2: standard LUMINANCE Huffman tables as
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

# Annex K.3.3/K.3.4: standard CHROMINANCE Huffman tables.
DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALS_C = list(range(12))
AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
assert sum(AC_BITS) == len(AC_VALS) and sum(AC_BITS_C) == len(AC_VALS_C)

# Orthonormal 8-point DCT-II matrix: A @ x applies the 1-D transform.
_DCT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _c = np.sqrt(1.0 / 8) if _k == 0 else np.sqrt(2.0 / 8)
        _DCT[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16)


def quant_table(level: int, chroma: bool = False) -> np.ndarray:
    """IJG quality scaling of the Annex K tables (public libjpeg rule):
    quality 50 = base table, 100 = all ones (near-lossless), 1 =
    coarsest. Pure function of ``level`` — the shared-tables contract."""
    q = min(100, max(1, int(level)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    base = CHROMA_QUANT if chroma else BASE_QUANT
    t = (base * scale + 50) // 100
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
_DC_CODES_C = _canonical_codes(DC_BITS_C, DC_VALS_C)
_AC_CODES_C = _canonical_codes(AC_BITS_C, AC_VALS_C)


def _code_arrays(codes: dict[int, tuple[int, int]], n: int):
    """(code, length) dict → dense numpy lookup arrays for the
    vectorized entropy pass. Unassigned symbols keep length 0 (never
    emitted by a conforming encoder path)."""
    c = np.zeros(n, dtype=np.int64)
    ln = np.zeros(n, dtype=np.int64)
    for sym, (code, length) in codes.items():
        c[sym] = code
        ln[sym] = length
    return c, ln


# Row 0 = luminance tables, row 1 = chrominance tables.
_DC_CODE_ARR = np.stack(
    [_code_arrays(_DC_CODES, 16)[0], _code_arrays(_DC_CODES_C, 16)[0]]
)
_DC_LEN_ARR = np.stack(
    [_code_arrays(_DC_CODES, 16)[1], _code_arrays(_DC_CODES_C, 16)[1]]
)
_AC_CODE_ARR = np.stack(
    [_code_arrays(_AC_CODES, 256)[0], _code_arrays(_AC_CODES_C, 256)[0]]
)
_AC_LEN_ARR = np.stack(
    [_code_arrays(_AC_CODES, 256)[1], _code_arrays(_AC_CODES_C, 256)[1]]
)


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">HH", tag, len(payload) + 2) + payload


def _dqt_segment(level: int) -> bytes:
    """Both quant tables in one DQT segment (id 0 = luma, 1 = chroma),
    the layout libjpeg's abbreviated tables stream uses."""
    zz0 = quant_table(level).reshape(64)[ZIGZAG]
    zz1 = quant_table(level, chroma=True).reshape(64)[ZIGZAG]
    return _marker(
        0xFFDB,
        b"\x00" + bytes(int(v) for v in zz0)
        + b"\x01" + bytes(int(v) for v in zz1),
    )


def _dht_segments() -> bytes:
    dc0 = _marker(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    ac0 = _marker(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    dc1 = _marker(0xFFC4, b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C))
    ac1 = _marker(0xFFC4, b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALS_C))
    return dc0 + ac0 + dc1 + ac1


def make_tables(level: int) -> bytes:
    """The JPEGTables (TIFF tag 347) payload: a tables-only abbreviated
    stream — SOI, DQT (both quant tables), all four DHTs, EOI (the
    two-table-set layout GDAL/libtiff write; grayscale tiles simply
    never reference set 1)."""
    return b"\xff\xd8" + _dqt_segment(level) + _dht_segments() + b"\xff\xd9"


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _cat_vec(v: np.ndarray) -> np.ndarray:
    """Vectorized JPEG magnitude category: bit_length(|v|). Exact for
    |v| < 2^52 (log2 on float64 integers); baseline values are ≤ 11
    bits."""
    a = np.abs(v)
    return np.where(
        a == 0, 0, (np.floor(np.log2(np.maximum(a, 1))) + 1).astype(np.int64)
    )


def _pack_bits(vals: np.ndarray, lens: np.ndarray) -> bytes:
    """MSB-first concatenation of variable-length codes → stuffed JPEG
    entropy bytes (1-fill padding, 0x00 after every 0xFF — T.81
    B.1.1.5). Fully vectorized: per-bit spreading via repeat/arange,
    np.packbits, np.insert for stuffing."""
    keep = lens > 0
    vals, lens = vals[keep], lens[keep]
    total = int(lens.sum())
    if total == 0:
        return b""
    offs = np.cumsum(lens) - lens
    j = np.arange(total, dtype=np.int64) - np.repeat(offs, lens)
    vr = np.repeat(vals, lens)
    lr = np.repeat(lens, lens)
    bits = ((vr >> (lr - 1 - j)) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, dtype=np.uint8)])
    by = np.packbits(bits)
    ff = np.nonzero(by == 0xFF)[0]
    if len(ff):
        by = np.insert(by, ff + 1, 0)
    return by.tobytes()


def _plane_zz(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(h, w) sample plane → (nb, 64) quantized zigzag coefficients,
    blocks in raster order. All blocks DCT'd/quantized at once."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
    quant = np.round(coef / q).astype(np.int64)
    return quant.reshape(-1, 64)[:, ZIGZAG]


# Emission-order keys for the vectorized entropy pass: each emitted
# code gets key = block * _KEY_STRIDE + local, where local preserves
# the T.81 order (DC sym, DC bits, then per AC coefficient position p:
# up to 3 ZRLs, symbol, value bits, then EOB).
_KEY_STRIDE = 400
_EOB_LOCAL = 6 * 64


def _encode_scan(
    zz: np.ndarray, comp: np.ndarray, tsel_of_comp: np.ndarray
) -> bytes:
    """Vectorized baseline entropy encoder.

    zz: (nb, 64) quantized zigzag blocks in SCAN (MCU-interleaved)
    order; comp: (nb,) component index of each block; tsel_of_comp:
    per-component Huffman/quant class (0 luma / 1 chroma). Returns the
    stuffed entropy bytes.
    """
    nb = zz.shape[0]
    tsel = tsel_of_comp[comp]

    # --- DC: per-component predictor chains, all vectorized
    dc = zz[:, 0]
    diff = np.empty(nb, dtype=np.int64)
    for c in np.unique(comp):
        idx = np.nonzero(comp == c)[0]
        d = dc[idx]
        diff[idx] = np.diff(d, prepend=0)
    s_dc = _cat_vec(diff)
    dc_sym_val = _DC_CODE_ARR[tsel, s_dc]
    dc_sym_len = _DC_LEN_ARR[tsel, s_dc]
    dc_bits_val = np.where(diff >= 0, diff, diff + (1 << s_dc) - 1)
    dc_bits_len = s_dc
    blk = np.arange(nb, dtype=np.int64)
    dc_keys = np.concatenate([blk * _KEY_STRIDE, blk * _KEY_STRIDE + 1])
    dc_vals = np.concatenate([dc_sym_val, dc_bits_val])
    dc_lens = np.concatenate([dc_sym_len, dc_bits_len])

    # --- AC: runs/categories for every nonzero coefficient at once
    rows = zz[:, 1:]
    nzb, nzp = np.nonzero(rows)
    pos = nzp + 1  # zigzag position 1..63
    v = rows[nzb, nzp]
    first = np.empty(len(nzb), dtype=bool)
    if len(nzb):
        first[0] = True
        first[1:] = nzb[1:] != nzb[:-1]
    prev = np.where(first, 0, np.concatenate(([0], pos[:-1])))
    run = pos - prev - 1
    n_zrl = run >> 4
    rem = run & 15
    s_ac = _cat_vec(v)
    sym = (rem << 4) | s_ac
    t_ac = tsel[nzb]
    ac_sym_val = _AC_CODE_ARR[t_ac, sym]
    ac_sym_len = _AC_LEN_ARR[t_ac, sym]
    ac_bits_val = np.where(v >= 0, v, v + (1 << s_ac) - 1)
    key_base = nzb * _KEY_STRIDE + 6 * pos
    ac_keys = np.concatenate([key_base + 4, key_base + 5])
    ac_vals = np.concatenate([ac_sym_val, ac_bits_val])
    ac_lens = np.concatenate([ac_sym_len, s_ac])

    # --- ZRL fills (run > 15): n_zrl copies per nonzero, ordered
    total_zrl = int(n_zrl.sum())
    if total_zrl:
        rep = np.repeat(np.arange(len(nzb)), n_zrl)
        joff = np.arange(total_zrl) - np.repeat(
            np.cumsum(n_zrl) - n_zrl, n_zrl
        )
        zrl_keys = nzb[rep] * _KEY_STRIDE + 6 * pos[rep] + joff
        zrl_t = t_ac[rep]
        zrl_vals = _AC_CODE_ARR[zrl_t, 0xF0]
        zrl_lens = _AC_LEN_ARR[zrl_t, 0xF0]
    else:
        zrl_keys = np.empty(0, dtype=np.int64)
        zrl_vals = np.empty(0, dtype=np.int64)
        zrl_lens = np.empty(0, dtype=np.int64)

    # --- EOB: blocks whose last nonzero is before position 63
    lastpos = np.zeros(nb, dtype=np.int64)
    if len(nzb):
        np.maximum.at(lastpos, nzb, pos)
    eob_blocks = np.nonzero(lastpos < 63)[0]
    eob_t = tsel[eob_blocks]
    eob_keys = eob_blocks * _KEY_STRIDE + _EOB_LOCAL
    eob_vals = _AC_CODE_ARR[eob_t, 0x00]
    eob_lens = _AC_LEN_ARR[eob_t, 0x00]

    keys = np.concatenate([dc_keys, ac_keys, zrl_keys, eob_keys])
    vals = np.concatenate([dc_vals, ac_vals, zrl_vals, eob_vals])
    lens = np.concatenate([dc_lens, ac_lens, zrl_lens, eob_lens])
    order = np.argsort(keys, kind="stable")
    return _pack_bits(vals[order], lens[order])


def _scan_with_restarts(
    zz: np.ndarray,
    comp: np.ndarray,
    tsel: np.ndarray,
    mcus: int,
    blocks_per_mcu: int,
    restart_interval: int,
) -> bytes:
    """Entropy bytes for a scan, split at ``restart_interval`` MCUs
    with RSTm markers (m cycles 0..7) between the independently-coded
    segments (T.81 §B.2.1.2 / E.1.4 — each segment byte-aligns with
    1-fill padding and resets every DC predictor)."""
    if restart_interval <= 0:
        return _encode_scan(zz, comp, tsel)
    parts = []
    step = restart_interval * blocks_per_mcu
    for seg, b0 in enumerate(range(0, mcus * blocks_per_mcu, step)):
        if seg:
            parts.append(bytes([0xFF, 0xD0 + ((seg - 1) & 7)]))
        parts.append(
            _encode_scan(zz[b0 : b0 + step], comp[b0 : b0 + step], tsel)
        )
    return b"".join(parts)


def _dri_segment(restart_interval: int) -> bytes:
    if restart_interval <= 0:
        return b""
    return _marker(0xFFDD, struct.pack(">H", restart_interval))


def encode(data: bytes, level: int = 75, restart_interval: int = 0) -> bytes:
    """Encode one square uint8 tile plane (blocksize² bytes — the COG
    writer's payload contract; blocksize is a multiple of 16, so MCU
    alignment is automatic) as an abbreviated baseline JPEG stream.

    ``restart_interval``: emit a DRI segment and RSTm markers every N
    MCUs (0 = none, the default — matches the golden byte pins).
    Restart segments are independently decodable, which is what lets
    foreign readers resynchronize and parallel decoders split a
    scan."""
    side = int(np.sqrt(len(data)))
    if side * side != len(data) or side % 8:
        raise ValueError(
            f"jpeg codec expects a square uint8 tile with side a "
            f"multiple of 8; got {len(data)} bytes"
        )
    img = np.frombuffer(data, dtype=np.uint8).reshape(side, side)
    zz = _plane_zz(img, quant_table(level))
    scan = _scan_with_restarts(
        zz, np.zeros(len(zz), dtype=np.int64), np.array([0], dtype=np.int64),
        len(zz), 1, restart_interval,
    )
    sof = _marker(
        0xFFC0, struct.pack(">BHHB", 8, side, side, 1) + b"\x01\x11\x00"
    )
    sos = _marker(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    return (
        b"\xff\xd8" + sof + _dri_segment(restart_interval) + sos
        + scan + b"\xff\xd9"
    )


# JFIF (ITU-T T.871) full-range RGB <-> YCbCr. Decode uses the exact
# inverse so encode→decode round-trips within quantization error.
def _rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def encode_color(
    data: bytes,
    level: int = 75,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode one square interleaved-RGB uint8 tile (blocksize² × 3
    bytes, pixel-interleaved — the writer's PlanarConfiguration=1
    payload) as an abbreviated baseline YCbCr JPEG stream.

    subsampling: '444' (all components 1x1 — no chroma subsampling;
    chroma error comes only from quantization), '420' (luma 2x2,
    chroma box-downsampled 2× per axis — the GDAL/libjpeg default,
    ~half the bytes), '422' (2× horizontal only) or '440' (2× vertical
    only). Subsampled forms need side % 16 == 0 for MCU alignment,
    which the COG writer's blocksize-multiple-of-16 contract
    guarantees.

    Component layout matches GDAL/libjpeg color conventions: ids
    1/2/3, Y on quant+Huffman set 0, Cb/Cr on set 1, MCU-interleaved
    (Y blocks in MCU-local raster order, then Cb, then Cr).

    ``restart_interval``: DRI/RSTm markers every N MCUs (see encode)."""
    n3 = len(data)
    side = int(np.sqrt(n3 // 3))
    if side * side * 3 != n3 or side % 8:
        raise ValueError(
            f"jpeg color codec expects a square interleaved uint8 RGB "
            f"tile with side a multiple of 8; got {n3} bytes"
        )
    if subsampling not in ("444", "420", "422", "440"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    rgb = np.frombuffer(data, dtype=np.uint8).reshape(side, side, 3)
    y, cb, cr = _rgb_to_ycbcr(rgb)
    ql = quant_table(level)
    qc = quant_table(level, chroma=True)

    if subsampling == "444":
        planes = [_plane_zz(y, ql), _plane_zz(cb, qc), _plane_zz(cr, qc)]
        nb = planes[0].shape[0]
        # interleave blocks in MCU order: Y0 Cb0 Cr0 Y1 ...
        zz = np.empty((3 * nb, 64), dtype=np.int64)
        comp = np.empty(3 * nb, dtype=np.int64)
        for ci in range(3):
            zz[ci::3] = planes[ci]
            comp[ci::3] = ci
        samp = b"\x01\x11\x00" + b"\x02\x11\x01" + b"\x03\x11\x01"
    else:  # subsampled: luma (sh, sv), chroma 1x1
        sh, sv = {"420": (2, 2), "422": (2, 1), "440": (1, 2)}[subsampling]
        if side % 16:
            raise ValueError(
                f"4:2:x needs side % 16 == 0 (MCU alignment), got {side}"
            )
        # box-downsample chroma by (sv, sh) block means
        cb2 = cb.reshape(side // sv, sv, side // sh, sh).mean(axis=(1, 3))
        cr2 = cr.reshape(side // sv, sv, side // sh, sh).mean(axis=(1, 3))
        zy = _plane_zz(y, ql)          # raster block order, bw = side//8
        zcb = _plane_zz(cb2, qc)       # 1 block per MCU, already MCU order
        zcr = _plane_zz(cr2, qc)
        bw = side // 8
        mx, my = side // (8 * sh), side // (8 * sv)
        n_mcu = mx * my
        per = sh * sv
        # luma raster index for MCU mi, local block bi = byy*sh + bxx
        # (T.81 MCU-local row-major order)
        mi = np.arange(n_mcu)
        myy, mxx = mi // mx, mi % mx
        zz = np.empty(((per + 2) * n_mcu, 64), dtype=np.int64)
        comp = np.tile(
            np.array([0] * per + [1, 2], dtype=np.int64), n_mcu
        )
        base = np.arange(n_mcu) * (per + 2)
        for bi in range(per):
            byy, bxx = divmod(bi, sh)
            zz[base + bi] = zy[(sv * myy + byy) * bw + (sh * mxx + bxx)]
        zz[base + per] = zcb
        zz[base + per + 1] = zcr
        samp = (
            bytes([1, (sh << 4) | sv, 0]) + b"\x02\x11\x01" + b"\x03\x11\x01"
        )

    if subsampling == "444":
        bpm = 3
    else:
        _sh, _sv = {"420": (2, 2), "422": (2, 1), "440": (1, 2)}[subsampling]
        bpm = _sh * _sv + 2
    n_mcu = len(comp) // bpm
    scan = _scan_with_restarts(
        zz, comp, np.array([0, 1, 1], dtype=np.int64), n_mcu, bpm,
        restart_interval,
    )
    sof = _marker(
        0xFFC0, struct.pack(">BHHB", 8, side, side, 3) + samp
    )
    sos = _marker(
        0xFFDA, b"\x03" + b"\x01\x00" + b"\x02\x11" + b"\x03\x11"
        + b"\x00\x3f\x00"
    )
    return (
        b"\xff\xd8" + sof + _dri_segment(restart_interval) + sos
        + scan + b"\xff\xd9"
    )


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
    """Flat 16-bit-lookahead decode tables: every canonical code,
    left-aligned in a 16-bit window, claims the window range it
    prefixes — one array index replaces the former per-bit walk
    (~16 dict probes per symbol). 2×64Ki int16 ≈ 256 KB per table.

    Returns (sym_arr, ln_arr, sym_list, ln_list): the numpy pair for
    the reference reader, plus plain-int lists for the fast entropy
    walk (Python-int list indexing beats numpy scalar indexing ~5×
    in a per-symbol loop)."""
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int16)
    for s, (code, length) in codes.items():
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = s
        ln[lo:hi] = length
    # packed (length<<8 | symbol) per 16-bit window, as a plain-int
    # list: the fast walk resolves a symbol with ONE list index +
    # shifts (ln=0 marks windows no code claims)
    pack = (ln.astype(np.int32) << 8) | (sym.astype(np.int32) & 0xFF)
    return sym, ln, sym.tolist(), ln.tolist(), pack.tolist()


_DECODE_TABLES_MEMO: dict = {}


def _decode_tables_cached(bits: tuple, vals: tuple):
    """Per-(bits,vals) cache: a COG read re-parses the same JPEGTables
    payload for EVERY tile, and rebuilding the 2×64Ki lookahead arrays
    plus their list twins per tile dominates small-tile decode. The
    table domain is tiny (one luma + one chroma pair per quality
    level actually in the file).

    A plain dict memo, NOT functools.lru_cache (round 17): cloudpickle
    serializes an lru_cache wrapper BY REFERENCE even when its module
    is registered by value, so any Arrow kernel closing over the
    decode path (multimodal features/resize) shipped a
    `ccog_spark.raster.jpegcodec` import to workers — breaking the
    import-less-worker contract (ModuleNotFoundError on a driver whose
    repo path is sys.path-only). A module-level dict with a plain
    function pickles by value like everything else here; the 64-entry
    bound matches the old maxsize (table domain is tiny, eviction
    order irrelevant)."""
    key = (bits, vals)
    hit = _DECODE_TABLES_MEMO.get(key)
    if hit is None:
        if len(_DECODE_TABLES_MEMO) >= 64:
            _DECODE_TABLES_MEMO.clear()
        hit = _DECODE_TABLES_MEMO.setdefault(
            key, _decode_tables(_canonical_codes(list(bits), list(vals)))
        )
    return hit


def _read_huffman(reader: _BitReader, table) -> int:
    """Decode one Huffman symbol via the 16-bit lookahead table.
    Within 16 bits of a segment end the window is 1-fill padded (the
    encoder's own padding rule), so codes that genuinely end before
    the marker still resolve; a code CLAIMING more bits than remain is
    a truncated scan."""
    sym_t, len_t = table[0], table[1]
    while reader.nbits < 16:
        try:
            reader._fill()
        except _ScanEnd:
            break
    avail = reader.nbits
    if avail == 0:
        raise _ScanEnd(reader.pos)
    if avail >= 16:  # _fill loads whole bytes: avail may reach 23
        window = (reader.acc >> (avail - 16)) & 0xFFFF
    else:
        window = ((reader.acc << (16 - avail)) & 0xFFFF) | (
            (1 << (16 - avail)) - 1
        )
    ln = int(len_t[window])
    if ln == 0:
        if avail < 16:
            # at segment end the 1-fill padding can form an unassigned
            # word — that's a TRUNCATED scan (the old per-bit walk hit
            # the marker mid-code here), not stream corruption
            raise _ScanEnd(reader.pos)
        raise ValueError("corrupt JPEG stream: no Huffman code matched")
    if ln > avail:
        raise _ScanEnd(reader.pos)
    reader.nbits = avail - ln
    reader.acc &= (1 << reader.nbits) - 1
    return int(sym_t[window])


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# which entropy-decode implementation _decode_sos uses. "fast" is the
# round-8 windowed walk below; "ref" is the original _BitReader loop,
# kept verbatim as the oracle (tests assert byte-identical output on
# the golden/fuzz corpus through both).
_ENTROPY_IMPL = "fast"


def _entropy_decode_ref(
    data: bytes,
    start: int,
    n_mcu: int,
    restart_interval: int,
    scan: list[tuple[int, int, int]],
    blocks_per_mcu: list[int],
    huff: dict,
    ncomp: int,
) -> list[np.ndarray]:
    """Reference entropy decode: per-symbol _BitReader walk (the
    pre-round-8 implementation, unchanged). Oracle for the fast path."""
    zz = [
        np.zeros((n_mcu * blocks_per_mcu[i], 64), dtype=np.int64)
        for i in range(ncomp)
    ]
    pred = [0] * ncomp
    reader = _BitReader(data, start)
    done = 0
    try:
        for mi in range(n_mcu):
            if restart_interval and mi and mi % restart_interval == 0:
                # T.81 E.1.4: segment is byte-aligned (1-fill padding);
                # drop buffered pad bits, consume the RSTm marker,
                # reset every DC predictor
                reader.acc = 0
                reader.nbits = 0
                p = reader.pos
                if p + 1 >= len(data) or data[p] != 0xFF or not (
                    0xD0 <= data[p + 1] <= 0xD7
                ):
                    raise ValueError(
                        f"missing restart marker before MCU {mi}"
                    )
                exp = 0xD0 + (((mi // restart_interval) - 1) & 7)
                if data[p + 1] != exp:
                    raise ValueError(
                        f"restart marker out of sequence before MCU "
                        f"{mi}: got 0xFF{data[p + 1]:02X}, expected "
                        f"0xFF{exp:02X}"
                    )
                reader.pos = p + 2
                pred = [0] * ncomp
            for sof_idx, dc_id, ac_id in scan:
                for bi in range(blocks_per_mcu[sof_idx]):
                    row = zz[sof_idx][mi * blocks_per_mcu[sof_idx] + bi]
                    s = _read_huffman(reader, huff[(0, dc_id)])
                    if s > 15:  # baseline DC categories are 0..11
                        raise ValueError(f"bad DC category {s}")
                    diff = _extend(reader.bits(s), s) if s else 0
                    pred[sof_idx] += diff
                    row[0] = pred[sof_idx]
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
                        row[k] = _extend(reader.bits(s), s)
                        k += 1
            done = mi + 1
    except _ScanEnd:
        # a marker inside the entropy data before every MCU decoded =
        # truncated scan; returning the partial image would be silent
        # corruption (round-6 review)
        raise ValueError(
            f"truncated JPEG scan: {done} of {n_mcu} MCUs decoded"
        )
    return zz


def _split_entropy(data: bytes, start: int):
    """De-stuff and split the entropy-coded region: one vectorized
    0xFF scan classifies every candidate (stuffed 0xFF00 → data byte,
    0xFFD0-D7 → restart boundary, anything else → scan end). Returns
    (segments as uint8 arrays, restart marker codes)."""
    b = np.frombuffer(data, dtype=np.uint8)
    n = len(b)
    ff_positions = start + np.nonzero(b[start:] == 0xFF)[0]
    segs: list[np.ndarray] = []
    marks: list[int] = []
    stuffed: list[int] = []
    seg_from = start
    end = n

    def _cut(i0: int, i1: int) -> np.ndarray:
        seg = b[i0:i1]
        if stuffed:
            keep = np.ones(i1 - i0, dtype=bool)
            keep[np.asarray(stuffed) - i0] = False
            seg = seg[keep]
        stuffed.clear()
        return np.ascontiguousarray(seg)

    for j in ff_positions:
        j = int(j)
        if j < seg_from:  # inside an already-consumed marker
            continue
        if j + 1 >= n:
            break  # trailing lone 0xFF: decode hits truncation
        nxt = int(b[j + 1])
        if nxt == 0x00:
            stuffed.append(j + 1)
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(_cut(seg_from, j))
            marks.append(nxt)
            seg_from = j + 2
        else:  # a real marker terminates entropy data
            end = j
            break
    segs.append(_cut(seg_from, end))
    return segs, marks


def _entropy_decode_fast(
    data: bytes,
    start: int,
    n_mcu: int,
    restart_interval: int,
    scan: list[tuple[int, int, int]],
    blocks_per_mcu: list[int],
    huff: dict,
    ncomp: int,
) -> list[np.ndarray]:
    """Windowed entropy decode (round-8, ≙ the r7 encode
    vectorization): the stream is de-stuffed and split into restart
    segments in ONE vectorized pass; per segment, 24-bit byte windows
    are precomputed so each symbol costs two list indexes and a
    shift/mask on plain Python ints — no _BitReader byte feeding, no
    numpy scalar indexing, no exception-driven refills. Coefficients
    accumulate in flat (index, value) lists and scatter into the
    (n_blocks, 64) arrays in one fancy-indexed write per component.
    Byte-identical to _entropy_decode_ref on every stream (golden +
    fuzz suites run both); timing note in SCALING.md."""
    segs, marks = _split_entropy(data, start)
    zz = [
        np.zeros((n_mcu * blocks_per_mcu[i], 64), dtype=np.int64)
        for i in range(ncomp)
    ]
    # flat scatter accumulators per component
    acc_idx: list[list[int]] = [[] for _ in range(ncomp)]
    acc_val: list[list[int]] = [[] for _ in range(ncomp)]
    # EXTEND (T.81 F.2.2.1) folded to two table lookups:
    # v >= half[s] ? v : v - ext[s]
    half = [0] + [1 << (s - 1) for s in range(1, 17)]
    ext = [0] + [(1 << s) - 1 for s in range(1, 17)]

    group = restart_interval if restart_interval else n_mcu
    n_groups = -(-n_mcu // group)
    done = 0
    for g in range(n_groups):
        mi0 = g * group
        if g:
            # T.81 E.1.4 restart boundary: marker presence + sequence
            if g - 1 >= len(marks):
                raise ValueError(
                    f"missing restart marker before MCU {mi0}"
                )
            exp = 0xD0 + ((g - 1) & 7)
            if marks[g - 1] != exp:
                raise ValueError(
                    f"restart marker out of sequence before MCU "
                    f"{mi0}: got 0xFF{marks[g - 1]:02X}, expected "
                    f"0xFF{exp:02X}"
                )
        if g >= len(segs):
            raise ValueError(
                f"truncated JPEG scan: {done} of {n_mcu} MCUs decoded"
            )
        seg = segs[g]
        seg_bits = len(seg) * 8
        # 24-bit windows per BYTE position (one vectorized pass +
        # one small tolist): the window at bit p is
        # (w24[p>>3] >> (8-(p&7))) & 0xFFFF. Per-BIT-position gathers
        # were tried and rejected — .tolist() of multi-million-entry
        # arrays costs more than the whole walk saves. 0xFF padding
        # reproduces the encoder's 1-fill rule at segment end, exactly
        # like _read_huffman's sub-16-bit window padding.
        pad = np.empty(len(seg) + 3, dtype=np.uint8)
        pad[: len(seg)] = seg
        pad[len(seg) :] = 0xFF
        p32 = pad.astype(np.uint32)
        w24 = ((p32[:-2] << 16) | (p32[1:-1] << 8) | p32[2:]).tolist()
        packs = {}  # (tc, th) -> 64Ki packed-entry list (lru-cached)
        for sof_idx, dc_id, ac_id in scan:
            for key in ((0, dc_id), (1, ac_id)):
                if key not in packs:
                    packs[key] = huff[key][4]
        p = 0
        pred = [0] * ncomp
        for mi in range(mi0, min(mi0 + group, n_mcu)):
            for sof_idx, dc_id, ac_id in scan:
                bpm = blocks_per_mcu[sof_idx]
                ci = acc_idx[sof_idx]
                cv = acc_val[sof_idx]
                dcp = packs[(0, dc_id)]
                acp = packs[(1, ac_id)]
                pr = pred[sof_idx]
                base_row = mi * bpm
                for bi in range(bpm):
                    base = (base_row + bi) << 6
                    # ---- DC ----
                    r = p & 7
                    t = dcp[(w24[p >> 3] >> (8 - r)) & 0xFFFF]
                    ln = t >> 8
                    if ln == 0 or p + ln > seg_bits:
                        if seg_bits - p >= 16 and ln == 0:
                            raise ValueError(
                                "corrupt JPEG stream: no Huffman code "
                                "matched"
                            )
                        raise ValueError(
                            f"truncated JPEG scan: {done} of "
                            f"{n_mcu} MCUs decoded"
                        )
                    s = t & 255
                    p += ln
                    if s > 15:  # baseline DC categories are 0..11
                        raise ValueError(f"bad DC category {s}")
                    if s:
                        if p + s > seg_bits:
                            raise ValueError(
                                f"truncated JPEG scan: {done} of "
                                f"{n_mcu} MCUs decoded"
                            )
                        r = p & 7
                        v = (w24[p >> 3] >> (24 - r - s)) & ext[s]
                        p += s
                        pr += v if v >= half[s] else v - ext[s]
                    ci.append(base)
                    cv.append(pr)
                    # ---- AC ----
                    k = 1
                    while k <= 63:
                        r = p & 7
                        t = acp[(w24[p >> 3] >> (8 - r)) & 0xFFFF]
                        ln = t >> 8
                        if ln == 0 or p + ln > seg_bits:
                            if seg_bits - p >= 16 and ln == 0:
                                raise ValueError(
                                    "corrupt JPEG stream: no Huffman "
                                    "code matched"
                                )
                            raise ValueError(
                                f"truncated JPEG scan: {done} of "
                                f"{n_mcu} MCUs decoded"
                            )
                        sym = t & 255
                        p += ln
                        if sym == 0x00:  # EOB
                            break
                        s = sym & 15
                        if s == 0:
                            if sym != 0xF0:  # only ZRL has size 0
                                raise ValueError("bad AC symbol")
                            k += 16
                            continue
                        k += sym >> 4
                        if k > 63:
                            raise ValueError("AC index out of range")
                        if p + s > seg_bits:
                            raise ValueError(
                                f"truncated JPEG scan: {done} of "
                                f"{n_mcu} MCUs decoded"
                            )
                        r = p & 7
                        v = (w24[p >> 3] >> (24 - r - s)) & ext[s]
                        p += s
                        ci.append(base + k)
                        cv.append(v if v >= half[s] else v - ext[s])
                        k += 1
                pred[sof_idx] = pr
            done = mi + 1
        # leftover beyond byte-align padding before a restart boundary
        # means the marker the splitter found is not where the MCU
        # count says it should be (≙ ref's "missing restart marker")
        if g + 1 < n_groups and seg_bits - p >= 8:
            raise ValueError(
                f"missing restart marker before MCU {mi0 + group}"
            )
    for i in range(ncomp):
        if acc_idx[i]:
            zz[i].reshape(-1)[
                np.asarray(acc_idx[i], dtype=np.int64)
            ] = np.asarray(acc_val[i], dtype=np.int64)
    return zz


def decode(data: bytes) -> bytes:
    """Decode a baseline JPEG stream to raw uint8 bytes — grayscale
    (h×w plane) or 3-component YCbCr color (h×w×3 interleaved RGB).
    Sampling: all-1x1 ("4:4:4", what encode_color writes) and
    2x2-luma 4:2:0 (the GDAL/libjpeg default for reading foreign
    color COGs; box chroma upsampling). Accepts standalone streams OR
    ``tables_stream + tile_stream`` concatenations (abbreviated TIFF
    form: the caller prepends the JPEGTables tag payload; interior
    EOI/SOI markers are skipped). Corrupt or truncated input raises
    ValueError — never hangs or crashes with a raw IndexError
    (fuzz-tested)."""
    try:
        return _decode(data)
    except (IndexError, KeyError, OverflowError, struct.error) as e:
        raise ValueError(f"corrupt JPEG stream: {e!r}") from e


def _idct_plane(zz: np.ndarray, q: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """(nb, 64) zigzag coefficients → (bh*8, bw*8) float sample plane."""
    nb = zz.shape[0]
    blocks = np.zeros((nb, 64), dtype=np.int64)
    blocks[:, ZIGZAG] = zz
    coef = blocks.reshape(nb, 8, 8).astype(np.float64) * q
    pix = np.einsum("ji,njk,kl->nil", _DCT, coef, _DCT) + 128.0
    return pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(
        bh * 8, bw * 8
    )


def _decode(data: bytes) -> bytes:
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = None
    # SOF component list: (comp_id, h_samp, v_samp, tq) in SOF order
    sof_comps: list[tuple[int, int, int, int]] = []
    restart_interval = 0
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
                huff[(tc, th)] = _decode_tables_cached(
                    tuple(bits), tuple(vals)
                )
                b += 17 + nv
        elif m == 0xC0:  # SOF0 baseline
            precision, height, width, ncomp = struct.unpack_from(
                ">BHHB", body, 0
            )
            if precision != 8:
                raise ValueError("only 8-bit baseline JPEG supported")
            if ncomp not in (1, 3):
                raise ValueError(
                    f"only 1- or 3-component baseline JPEG supported "
                    f"(got {ncomp})"
                )
            sof_comps = []
            for ci in range(ncomp):
                cid = body[6 + 3 * ci]
                samp = body[7 + 3 * ci]
                sof_comps.append((cid, samp >> 4, samp & 15, body[8 + 3 * ci]))
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0) JPEG supported")
        elif m == 0xDD:  # DRI: restart interval in MCUs
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif m == 0xDA:  # SOS → entropy data follows
            if width is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            if ns != len(sof_comps):
                raise ValueError(
                    "partial (non-interleaved) scans not supported"
                )
            # scan comps in SOS order, mapped back to SOF entries
            scan: list[tuple[int, int, int]] = []  # (sof_idx, dc, ac)
            for si in range(ns):
                cid = body[1 + 2 * si]
                sel = body[2 + 2 * si]
                sof_idx = next(
                    (i for i, c in enumerate(sof_comps) if c[0] == cid), None
                )
                if sof_idx is None:
                    raise ValueError(f"SOS references unknown component {cid}")
                scan.append((sof_idx, sel >> 4, sel & 15))
            for _, dc_id, ac_id in scan:
                if (0, dc_id) not in huff or (1, ac_id) not in huff:
                    raise ValueError(
                        "abbreviated JPEG tile has no tables in-stream — "
                        "prepend the JPEGTables (TIFF tag 347) payload"
                    )
            if not qt:
                raise ValueError(
                    "abbreviated JPEG tile has no tables in-stream — "
                    "prepend the JPEGTables (TIFF tag 347) payload"
                )
            out = _decode_sos(data, pos + 2 + seglen, width, height,
                              sof_comps, scan, qt, huff, restart_interval)
            break
        pos += 2 + seglen
    if out is None:
        raise ValueError(
            "no scan data found — abbreviated JPEG tile decoded without "
            "its JPEGTables? prepend the tag 347 payload"
        )
    return out


def _decode_sos(
    data: bytes,
    start: int,
    width: int,
    height: int,
    sof_comps: list[tuple[int, int, int, int]],
    scan: list[tuple[int, int, int]],
    qt: dict[int, np.ndarray],
    huff: dict[tuple[int, int], dict],
    restart_interval: int = 0,
) -> bytes:
    hs = [c[1] for c in sof_comps]
    vs = [c[2] for c in sof_comps]
    hmax, vmax = max(hs), max(vs)
    # supported sampling shapes: all-1x1, or the standard 3-component
    # forms with luma (h,v) in {1,2}^2 and 1x1 chroma — 4:4:4, 4:2:2
    # (2x1), 4:4:0 (1x2), 4:2:0 (2x2)
    if not (
        all(h == 1 and v == 1 for h, v in zip(hs, vs))
        or (
            len(sof_comps) == 3
            and hs[0] in (1, 2) and vs[0] in (1, 2)
            and hs[1:] == [1, 1] and vs[1:] == [1, 1]
        )
    ):
        raise ValueError(
            f"unsupported JPEG sampling factors {list(zip(hs, vs))} — "
            f"luma (h,v) in {{1,2}}² with 1x1 chroma only"
        )
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    if width % mcu_w or height % mcu_h:
        raise ValueError(
            f"only MCU-aligned dimensions supported, got {width}x{height} "
            f"with {mcu_w}x{mcu_h} MCUs"
        )
    mx, my = width // mcu_w, height // mcu_h
    n_mcu = mx * my
    blocks_per_mcu = [hs[i] * vs[i] for i in range(len(sof_comps))]
    impl = (
        _entropy_decode_fast if _ENTROPY_IMPL == "fast"
        else _entropy_decode_ref
    )
    zz = impl(
        data, start, n_mcu, restart_interval, scan, blocks_per_mcu,
        huff, len(sof_comps),
    )

    planes = []
    for i, (cid, h, v, tq) in enumerate(sof_comps):
        if tq not in qt:
            raise ValueError(f"component {cid} references missing DQT {tq}")
        bw = mx * h
        bh = my * v
        if h == hmax and v == vmax:
            # natural raster order only when one block per MCU per dim;
            # for 2x2 luma the 4 blocks per MCU are in MCU-local order
            if h == 1 and v == 1:
                plane = _idct_plane(zz[i], qt[tq], bh, bw)
            else:
                # reorder MCU-local (v, h) blocks into plane raster order
                nb = zz[i].shape[0]
                idx = np.empty(nb, dtype=np.int64)
                per = h * v
                for mi in range(mx * my):
                    myy, mxx = divmod(mi, mx)
                    for bi in range(per):
                        byy, bxx = divmod(bi, h)
                        r = (myy * v + byy) * bw + (mxx * h + bxx)
                        idx[r] = mi * per + bi
                plane = _idct_plane(zz[i][idx], qt[tq], bh, bw)
        else:
            plane = _idct_plane(zz[i], qt[tq], bh, bw)
            # box-upsample chroma to full resolution (nearest — the
            # cheap, alias-free inverse of the encoder's box downsample)
            plane = np.repeat(
                np.repeat(plane, vmax // v, axis=0), hmax // h, axis=1
            )
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        return (
            np.clip(np.round(planes[0]), 0, 255).astype(np.uint8).tobytes()
        )
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2]).tobytes()
