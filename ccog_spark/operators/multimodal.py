"""Multimodal columns: opaque BINARY payloads with typed metadata.

Images/audio/video ride through the engine as ``binary`` columns plus a
metadata struct; decode / feature-extract / resize run as Arrow-batched
``mapInPandas`` stages. The container has no compressed-image codecs
(no PIL/ffmpeg), so the fixture payloads are REAL uncompressed raster
formats whose containers are pure struct math — binary PPM (P6) and
24-bit BMP — and the decode kernel genuinely parses them (magic-byte
dispatch, ASCII header scan for PPM, little-endian struct unpack for
BMP). The 100 TB design point is unchanged: payload bytes never leave
their partition, only decoded metadata shuffles.

Reference parity: the reference treats tile payloads as opaque bytes
with typed side-metadata the same way (ccog/ccog.py:448 parts_info);
this module generalizes that to media columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, channels int, "
    "format string"
)

# Deterministic fixture geometry: 2-digit dimensions (16..63) so the
# PPM header is a fixed 13 bytes — the oracle derives expected sizes
# from the same formulas.
_DIM_MOD, _DIM_MIN = 48, 16


def make_encode_kernel():
    """mapInPandas kernel producing REAL image payloads: binary PPM
    (P6) for even doc_ids, 24-bit uncompressed BMP for odd ones.
    Dimensions derive from doc_id; pixel bytes tile the document text
    (content is irrelevant to the metadata contract, but the container
    structure is byte-exact). Self-contained closure: Spark pickles it
    by value, so executors need no ccog_spark import."""

    def encode_batch(it):
        import struct

        import pandas as pd

        def ppm(w: int, h: int, src: bytes) -> bytes:
            need = w * h * 3
            body = (src * (need // max(len(src), 1) + 1))[:need]
            return b"P6\n%d %d\n255\n" % (w, h) + body

        def bmp(w: int, h: int, src: bytes) -> bytes:
            stride = (w * 3 + 3) // 4 * 4
            need = stride * h
            body = (src * (need // max(len(src), 1) + 1))[:need]
            file_hdr = struct.pack("<2sIHHI", b"BM", 54 + need, 0, 0, 54)
            info_hdr = struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, need, 2835, 2835, 0, 0
            )
            return file_hdr + info_hdr + body

        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                w = int(doc_id) % _DIM_MOD + _DIM_MIN
                h = (int(doc_id) * 7) % _DIM_MOD + _DIM_MIN
                src = text.encode("utf-8") or b"\x00"
                payloads.append(
                    ppm(w, h, src) if doc_id % 2 == 0 else bmp(w, h, src)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return encode_batch


def attach_payload(docs: DataFrame) -> DataFrame:
    """Materialize an opaque binary image payload per document (in
    production these bytes come from a blob store; here a deterministic
    PPM/BMP fixture generator runs in the same Arrow stage)."""
    return docs.select("doc_id", "text").mapInPandas(
        make_encode_kernel(), "doc_id bigint, payload binary"
    )


def make_decode_kernel():
    """Build the mapInPandas DECODE kernel as a self-contained closure.

    This is a real decoder for the two codec-free container formats:
    magic-byte dispatch, then PPM ASCII header scan ('P6', whitespace,
    width, height, maxval) or BMP BITMAPINFOHEADER struct unpack
    (width i32@18, height i32@22, bpp u16@28, all little-endian).
    Unknown magic raises — no silent fallback.
    """

    def decode_batch(it):
        import struct

        import pandas as pd

        def decode(payload: bytes):
            if payload[:2] == b"P6":
                toks = payload[2:32].split(None, 3)
                return int(toks[0]), int(toks[1]), 3, "ppm"
            if payload[:2] == b"BM":
                (w,) = struct.unpack_from("<i", payload, 18)
                (h,) = struct.unpack_from("<i", payload, 22)
                (bpp,) = struct.unpack_from("<H", payload, 28)
                return w, abs(h), bpp // 8, "bmp"
            raise ValueError(f"unknown image magic: {payload[:2]!r}")

        for pdf in it:
            meta = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "channels": [m[2] for m in meta],
                    "format": [m[3] for m in meta],
                }
            )

    return decode_batch


def decode_metadata(docs: DataFrame) -> DataFrame:
    """Binary payload → decoded metadata via Arrow-batched mapInPandas.

    The fixture's encode and the decode compose into ONE Arrow stage
    (generator chaining), so payload bytes never cross the JVM↔Python
    boundary twice. In production the payload column arrives from a
    blob store and ``make_decode_kernel`` is the only crossing — the
    per-partition locality property is identical either way."""
    enc, dec = make_encode_kernel(), make_decode_kernel()

    def fused(it):
        yield from dec(enc(it))

    return docs.select("doc_id", "text").mapInPandas(fused, DECODE_SCHEMA)
