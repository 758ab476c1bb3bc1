"""Pure-Python WebP-lossless (VP8L) tile codec.

Public knowledge only: the WebP Lossless Bitstream Specification
(RFC 9649; also published as Google's VP8L spec). Fills the registry's
last port point — the reference lists WEBP as a first-class profile
compression (ccog/ccog.py:24-39 via GDAL's COMPRESS=WEBP), and this
module makes the `webp` codec slot real the same way raster/jpegcodec
made `jpeg` real: a from-scratch encoder/decoder pair whose container
bytes are spec-exact.

Scope: encodes one square uint8 tile plane (the COG contract — same as
jpegcodec) as a gray ARGB image using the SUBTRACT_GREEN transform, so
the red/blue/alpha channels collapse to single-symbol prefix codes
(zero bits per pixel) and the green channel carries the sample bytes
under a canonical prefix code. No color cache, no LZ77 backward
references, no meta prefix images — all spec-legal omissions (each is
flagged by its own stream bit). The decoder handles exactly the
features a spec-compliant minimal encoder can emit and raises loudly
on streams using features outside that subset (color cache / LZ77 /
meta prefix / other transforms).

Bit conventions (RFC 9649 §4): the stream is LSB-first; prefix-code
bits are written so the decoder consumes them root-to-leaf, i.e. the
canonical (DEFLATE-style) code is emitted bit-reversed into the
LSB-first writer.
"""

from __future__ import annotations

import struct

# code-length-code storage order (RFC 9649 §5.2.3)
CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
GREEN_ALPHABET = 256 + 24  # literals + LZ77 length codes (cache size 0)
DIST_ALPHABET = 40


class _BitWriter:
    """LSB-first bit writer; completed bytes flush into a bytearray so
    total cost stays O(n) (a single growing big-int accumulator would
    copy the whole stream on every write — quadratic; round-6 review)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0  # < 8 pending bits only
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def bytes(self) -> bytes:
        if self.n:
            return bytes(self.out) + bytes([self.acc & 0xFF])
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def read(self, nbits: int) -> int:
        if self.pos + nbits > self.nbits:
            raise ValueError("truncated VP8L stream")
        v = 0
        for i in range(nbits):
            byte = self.data[(self.pos + i) >> 3]
            v |= ((byte >> ((self.pos + i) & 7)) & 1) << i
        self.pos += nbits
        return v


def _rev(code: int, nbits: int) -> int:
    out = 0
    for _ in range(nbits):
        out = (out << 1) | (code & 1)
        code >>= 1
    return out


def _huffman_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Canonical Huffman code lengths, depth-capped by iterative
    frequency flattening (always yields a complete code)."""
    import heapq

    f = dict(freqs)
    while True:
        heap = [(cnt, sym, ("leaf", sym)) for sym, cnt in f.items()]
        heapq.heapify(heap)
        tick = len(heap)
        while len(heap) > 1:
            a = heapq.heappop(heap)
            b = heapq.heappop(heap)
            heapq.heappush(heap, (a[0] + b[0], tick, ("node", a[2], b[2])))
            tick += 1
        depths: dict[int, int] = {}

        def walk(node, d):
            if node[0] == "leaf":
                depths[node[1]] = max(d, 1)
            else:
                walk(node[1], d + 1)
                walk(node[2], d + 1)

        walk(heap[0][2], 0)
        if max(depths.values()) <= max_len:
            return depths
        f = {s: (c + 1) // 2 for s, c in f.items()}


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, len), DEFLATE canonical assignment."""
    max_len = max(lengths.values())
    bl_count = [0] * (max_len + 1)
    for l in lengths.values():
        bl_count[l] += 1
    next_code = [0] * (max_len + 1)
    code = 0
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    out = {}
    for sym in sorted(lengths, key=lambda s: (lengths[s], s)):
        l = lengths[sym]
        out[sym] = (next_code[l], l)
        next_code[l] += 1
    return out


def _write_code(bw: _BitWriter, codes: dict[int, tuple[int, int]], sym: int) -> None:
    code, ln = codes[sym]
    bw.write(_rev(code, ln), ln)


def _write_simple_code(bw: _BitWriter, symbols: list[int]) -> None:
    """Simple prefix code (1 or 2 symbols, RFC 9649 §5.2.2)."""
    bw.write(1, 1)  # simple
    bw.write(len(symbols) - 1, 1)
    s0 = min(symbols)
    if s0 <= 1 and len(symbols) == 1:
        bw.write(0, 1)  # 1-bit first symbol
        bw.write(s0, 1)
    else:
        bw.write(1, 1)  # 8-bit first symbol
        bw.write(s0, 8)
    if len(symbols) == 2:
        bw.write(max(symbols), 8)


def _length_sequence(lengths: dict[int, int], alphabet: int):
    """Code-length stream: literal lengths + 17/18 zero runs (no 16)."""
    seq: list[tuple[int, int, int]] = []  # (symbol, extra, extra_bits)
    i = 0
    while i < alphabet:
        l = lengths.get(i, 0)
        if l:
            seq.append((l, 0, 0))
            i += 1
            continue
        j = i
        while j < alphabet and lengths.get(j, 0) == 0:
            j += 1
        run = j - i
        # trailing zeros can simply be omitted? No: the reader stops
        # only at alphabet_size, so zeros must be emitted in full.
        while run:
            if run < 3:
                seq.extend([(0, 0, 0)] * run)
                run = 0
            elif run <= 10:
                seq.append((17, run - 3, 3))
                run = 0
            else:
                take = min(run, 138)
                if 0 < run - take < 3:
                    take = run - 3
                seq.append((18, take - 11, 7))
                run -= take
        i = j
    return seq


def _write_complex_code(
    bw: _BitWriter, lengths: dict[int, int], alphabet: int
) -> None:
    """Normal (code-length-coded) prefix code, RFC 9649 §5.2.3."""
    bw.write(0, 1)  # not simple
    seq = _length_sequence(lengths, alphabet)
    cl_freqs: dict[int, int] = {}
    for sym, _, _ in seq:
        cl_freqs[sym] = cl_freqs.get(sym, 0) + 1
    cl_lengths = _huffman_lengths(cl_freqs, 7)
    last = max(i for i, s in enumerate(CL_ORDER) if cl_lengths.get(s, 0))
    num = max(4, last + 1)
    bw.write(num - 4, 4)
    for i in range(num):
        bw.write(cl_lengths.get(CL_ORDER[i], 0), 3)
    bw.write(0, 1)  # no max_symbol shortcut
    cl_codes = _canonical_codes(cl_lengths)
    for sym, extra, ebits in seq:
        _write_code(bw, cl_codes, sym)
        if ebits:
            bw.write(extra, ebits)


def encode(data: bytes, level: int = 6, lossy: bool = False) -> bytes:
    """Encode one square uint8 tile plane as a LOSSLESS WebP file.

    ``level``: accepted for registry-signature parity and pinned as a
    NO-OP — VP8L lossless in this subset has no quality/effort knob,
    so the output bytes are invariant to ``level`` (test-pinned; the
    knob is not silently changing fidelity, because there is none to
    change). Decode(encode(x)) == x exactly at every level.

    ``lossy``: design-N/A, refused loudly. The reference's WEBP
    profile exposes a lossy quality via GDAL's VP8 intra encoder; a
    from-scratch VP8 intra-frame codec (boolean arithmetic coder,
    16x16/4x4 intra prediction, loop filter) is out of scope, and
    silently writing lossless when a caller asked for lossy would
    misrepresent the output. Callers wanting a lossy tile codec should
    use 'jpeg' (grayscale or YCbCr color)."""
    if lossy:
        raise ValueError(
            "lossy (VP8) WebP is not implemented — design N/A; this "
            "codec is VP8L lossless only. Use lossy='jpeg' tiles, or "
            "keep webp for bit-exact lossless."
        )
    side = int(len(data) ** 0.5 + 0.5)
    if side * side != len(data) or side == 0 or side > (1 << 14):
        raise ValueError(
            f"webp codec expects a square uint8 tile, got {len(data)} bytes"
        )
    bw = _BitWriter()
    bw.write(0x2F, 8)  # VP8L signature
    bw.write(side - 1, 14)
    bw.write(side - 1, 14)
    bw.write(0, 1)  # alpha hint: unused
    bw.write(0, 3)  # version
    # SUBTRACT_GREEN transform: gray pixels collapse to r'=b'=0
    bw.write(1, 1)
    bw.write(2, 2)  # transform type
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    # prefix codes: green+length, red, blue, alpha, distance
    freqs: dict[int, int] = {}
    for v in data:
        freqs[v] = freqs.get(v, 0) + 1
    if len(freqs) <= 2:
        green_codes = {
            s: (i, 0 if len(freqs) == 1 else 1)
            for i, s in enumerate(sorted(freqs))
        }
        _write_simple_code(bw, sorted(freqs))
    else:
        green_lengths = _huffman_lengths(freqs, 15)
        green_codes = _canonical_codes(green_lengths)
        _write_complex_code(bw, green_lengths, GREEN_ALPHABET)
    _write_simple_code(bw, [0])  # red' = 0
    _write_simple_code(bw, [0])  # blue' = 0
    _write_simple_code(bw, [255])  # alpha = 255
    _write_simple_code(bw, [0])  # distance (never referenced)
    # pixels: green literal per sample; r/b/a/distance are 0-bit codes
    write = bw.write
    rev_cache = {s: (_rev(c, ln), ln) for s, (c, ln) in green_codes.items()}
    for v in data:
        rv, ln = rev_cache[v]
        write(rv, ln)
    payload = bw.bytes()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        vp8l += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(vp8l)) + b"WEBP" + vp8l


# ------------------------------------------------------------- decode
def _read_prefix_code(br: _BitReader, alphabet: int) -> dict[tuple[int, int], int]:
    """Read one prefix code → {(len, canonical_code): symbol}."""
    if br.read(1):  # simple
        num = br.read(1) + 1
        if br.read(1):
            s0 = br.read(8)
        else:
            s0 = br.read(1)
        if num == 1:
            return {(0, 0): s0}
        s1 = br.read(8)
        a, b = sorted((s0, s1))
        return {(1, 0): a, (1, 1): b}
    num = 4 + br.read(4)
    cl_lengths: dict[int, int] = {}
    for i in range(num):
        l = br.read(3)
        if l:
            cl_lengths[CL_ORDER[i]] = l
    cl_table = {
        (ln, code): sym
        for sym, (code, ln) in _canonical_codes(cl_lengths).items()
    }
    if br.read(1):
        raise ValueError("max_symbol shortcut not emitted by this codec")
    lengths: dict[int, int] = {}
    sym = 0
    prev = 8
    while sym < alphabet:
        cl = _read_symbol(br, cl_table)
        if cl < 16:
            if cl:
                lengths[sym] = cl
                prev = cl
            sym += 1
        elif cl == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                lengths[sym] = prev
                sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
    if not lengths:
        raise ValueError("empty prefix code")
    return {
        (ln, code): s for s, (code, ln) in _canonical_codes(lengths).items()
    }


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    if (0, 0) in table:  # single-symbol code: zero bits consumed
        return table[(0, 0)]
    acc = 0
    ln = 0
    while ln < 16:
        acc = (acc << 1) | br.read(1)
        ln += 1
        if (ln, acc) in table:
            return table[(ln, acc)]
    raise ValueError("corrupt prefix stream")


def decode(data: bytes) -> bytes:
    """Decode a WebP file produced by this encoder's subset back to the
    square uint8 tile plane."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    if data[12:16] != b"VP8L":
        raise ValueError("only VP8L (lossless) streams supported")
    if len(data) < 20:
        raise ValueError("truncated VP8L stream")
    (size,) = struct.unpack_from("<I", data, 16)
    br = _BitReader(data[20 : 20 + size])
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    subtract_green = False
    while br.read(1):
        t = br.read(2)
        if t != 2:
            raise ValueError(f"unsupported transform {t}")
        subtract_green = True
    if br.read(1):
        raise ValueError("color cache not supported")
    if br.read(1):
        raise ValueError("meta prefix codes not supported")
    green = _read_prefix_code(br, GREEN_ALPHABET)
    red = _read_prefix_code(br, 256)
    blue = _read_prefix_code(br, 256)
    alpha = _read_prefix_code(br, 256)
    _dist = _read_prefix_code(br, DIST_ALPHABET)
    out = bytearray(w * h)
    for i in range(w * h):
        g = _read_symbol(br, green)
        if g >= 256:
            raise ValueError("LZ77 backward references not supported")
        r = _read_symbol(br, red)
        b = _read_symbol(br, blue)
        _read_symbol(br, alpha)
        if subtract_green:
            r = (r + g) & 0xFF
            b = (b + g) & 0xFF
        if r != g or b != g:
            raise ValueError("non-gray pixel in tile stream")
        out[i] = g
    return bytes(out)
