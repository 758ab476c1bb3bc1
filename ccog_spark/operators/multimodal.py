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
            if payload[:8] == b"\x89PNG\r\n\x1a\n":
                # IHDR body sits at a fixed offset after the signature
                if len(payload) < 29:
                    raise ValueError("truncated PNG (no full IHDR)")
                (w,) = struct.unpack_from(">I", payload, 16)
                (h,) = struct.unpack_from(">I", payload, 20)
                ct = payload[25]
                ch = {0: 1, 2: 3, 6: 4}.get(ct)
                if ch is None:
                    raise ValueError(
                        f"unsupported PNG color type {ct} "
                        "(gray/RGB/RGBA only; no palette)"
                    )
                return w, h, ch, "png"
            if payload[:2] == b"\xff\xd8":
                ww, hh, nc = _jpeg_sof(payload)
                return ww, hh, nc, "jpeg"
            if payload[:6] in (b"GIF87a", b"GIF89a"):
                if len(payload) < 13:
                    raise ValueError("truncated GIF header")
                (ww,) = struct.unpack_from("<H", payload, 6)
                (hh,) = struct.unpack_from("<H", payload, 8)
                return ww, hh, 3, "gif"
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
    # the decode closure references module-level _jpeg_sof — ship the
    # module by value for import-less workers
    _register_self_by_value()
    enc, dec = make_encode_kernel(), make_decode_kernel()

    def fused(it):
        yield from dec(enc(it))

    return docs.select("doc_id", "text").mapInPandas(fused, DECODE_SCHEMA)


# ---------------------------------------------------- pixel operations
# Full pixel decode + feature-extract / resize / frame-sample: the
# remaining multimodal verbs a training pipeline needs. All kernels are
# self-contained closures (by-value pickling, no worker imports) and
# payload bytes stay inside their partition — only small feature rows
# or resized payloads cross stage boundaries.

FEATURES_SCHEMA = (
    "doc_id bigint, width int, height int, mean double, std double, "
    "mean_r double, mean_g double, mean_b double, hist array<bigint>"
)

RESIZE_SCHEMA = "doc_id bigint, payload binary, width int, height int"

FRAME_SCHEMA = "doc_id bigint, frame_idx int, payload binary"


def decode_pixels(payload: bytes):
    """Full pixel decode for the two container formats → (h, w, 3)
    uint8 RGB. ONE implementation shared by the feature and resize
    kernels (each registers this module for by-value pickling, so the
    closure still ships whole to import-less workers).

    PPM: the header is parsed token-by-token — scanning for a fixed
    byte pattern like ``255\\n`` would false-match a height that ends
    in 255 and silently shift the pixel window."""
    import struct

    import numpy as np

    if payload[:2] == b"P6":
        end = len(payload)
        pos, vals = 2, []
        while len(vals) < 3:  # width, height, maxval
            while pos < end and payload[pos : pos + 1].isspace():
                pos += 1
            start = pos
            while pos < end and not payload[pos : pos + 1].isspace():
                pos += 1
            if start == pos:  # ran off the end mid-header
                raise ValueError("truncated PPM header")
            vals.append(int(payload[start:pos]))
        pos += 1  # exactly ONE whitespace byte after maxval, then body
        w, h, _maxval = vals
        return np.frombuffer(
            payload, np.uint8, count=w * h * 3, offset=pos
        ).reshape(h, w, 3)
    if payload[:2] == b"BM":  # 24-bit BMP: bottom-up BGR rows
        (off,) = struct.unpack_from("<I", payload, 10)
        (w,) = struct.unpack_from("<i", payload, 18)
        (h,) = struct.unpack_from("<i", payload, 22)
        stride = (w * 3 + 3) // 4 * 4
        rows = np.frombuffer(
            payload, np.uint8, count=stride * abs(h), offset=off
        ).reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
        if h > 0:
            rows = rows[::-1]
        return rows[:, :, ::-1]  # BGR -> RGB
    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    raise ValueError(f"unknown image magic: {payload[:2]!r}")


def _register_self_by_value() -> None:
    try:
        from pyspark.cloudpickle import register_pickle_by_value

        from ccog_spark.operators import multimodal as _self
        from ccog_spark.raster import jpegcodec as _jc

        register_pickle_by_value(_self)
        # decode_jpeg_gray references the raster JPEG codec — ship it
        # too so import-less workers resolve it (same registry as
        # codecs.register_worker_modules)
        register_pickle_by_value(_jc)
    except ImportError:  # pragma: no cover - older pyspark
        pass


def make_features_kernel(bins: int = 8):
    """mapInPandas kernel: payload → per-channel means, luminance
    std, and a ``bins``-bin luminance histogram (the standard cheap
    image-quality signals for corpus filtering)."""
    _register_self_by_value()
    pixels = decode_pixels

    def features_batch(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {
                "doc_id": [], "width": [], "height": [], "mean": [],
                "std": [], "mean_r": [], "mean_g": [], "mean_b": [],
                "hist": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = pixels(payload).astype(np.float64)
                lum = px.mean(axis=2)
                hist = np.bincount(
                    (lum * bins / 256.0).astype(np.int64).clip(0, bins - 1).ravel(),
                    minlength=bins,
                )
                out["doc_id"].append(doc_id)
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                out["mean"].append(float(lum.mean()))
                out["std"].append(float(lum.std()))
                out["mean_r"].append(float(px[:, :, 0].mean()))
                out["mean_g"].append(float(px[:, :, 1].mean()))
                out["mean_b"].append(float(px[:, :, 2].mean()))
                out["hist"].append(hist.tolist())
            yield pd.DataFrame(out)

    return features_batch


def image_features(docs_with_payload: DataFrame, bins: int = 8) -> DataFrame:
    """(doc_id, payload) → quality-signal features, one Arrow stage."""
    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        make_features_kernel(bins), FEATURES_SCHEMA
    )


def make_resize_kernel(out_w: int, out_h: int):
    """Nearest-neighbour resize; output is always re-encoded as PPM
    (canonical normalized form for downstream training)."""
    _register_self_by_value()
    pixels = decode_pixels

    def resize_batch(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            outs = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = pixels(payload)
                h, w = px.shape[:2]
                iy = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                ix = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                rs = np.ascontiguousarray(px[iy][:, ix])
                body = b"P6\n%d %d\n255\n" % (out_w, out_h) + rs.tobytes()
                outs.append((doc_id, body))
            yield pd.DataFrame(
                {
                    "doc_id": [o[0] for o in outs],
                    "payload": [o[1] for o in outs],
                    "width": out_w,
                    "height": out_h,
                }
            )

    return resize_batch


def resize_images(
    docs_with_payload: DataFrame, out_w: int, out_h: int
) -> DataFrame:
    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        make_resize_kernel(out_w, out_h), RESIZE_SCHEMA
    )


def make_video_kernel(frame_side: int = 16):
    """Fixture VIDEO container (deterministic fake, per the design
    brief: plumbing real, codec stubbed): magic ``FSTK`` + u32 frame
    count, then length-prefixed PPM frames; frame pixels derive from
    (doc_id, frame_idx) so sampling is byte-verifiable."""

    def video_batch(it):
        import struct

        import numpy as np
        import pandas as pd

        need = frame_side * frame_side * 3
        ramp = np.arange(need, dtype=np.int64)

        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                n = int(doc_id) % 5 + 2
                frames = []
                for f in range(n):
                    body = (
                        ((int(doc_id) * 31 + f * 7 + ramp) % 256)
                        .astype(np.uint8)
                        .tobytes()
                    )
                    ppm = (
                        b"P6\n%d %d\n255\n" % (frame_side, frame_side)
                        + body
                    )
                    frames.append(struct.pack("<I", len(ppm)) + ppm)
                payloads.append(
                    b"FSTK" + struct.pack("<I", n) + b"".join(frames)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return video_batch


def attach_video(docs: DataFrame, frame_side: int = 16) -> DataFrame:
    return docs.select("doc_id").mapInPandas(
        make_video_kernel(frame_side), "doc_id bigint, payload binary"
    )


def make_frame_sample_kernel(every: int):
    """mapInPandas kernel exploding every ``every``-th frame of an
    FSTK container into its own row — the video analogue of document
    chunking; payload bytes stay partition-local, rows fan OUT."""
    if every < 1:  # 0 → ZeroDivisionError in the executor; <0 → all frames
        raise ValueError(f"every must be >= 1, got {every}")

    def sample_batch(it):
        import struct

        import pandas as pd

        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload[:4] != b"FSTK":
                    raise ValueError("not an FSTK video container")
                (n,) = struct.unpack_from("<I", payload, 4)
                pos = 8
                for f in range(n):
                    if pos + 4 > len(payload):
                        raise ValueError("truncated FSTK container")
                    (ln,) = struct.unpack_from("<I", payload, pos)
                    pos += 4
                    if pos + ln > len(payload):
                        raise ValueError("truncated FSTK frame")
                    if f % every == 0:
                        ids.append(doc_id)
                        idxs.append(f)
                        frames.append(payload[pos : pos + ln])
                    pos += ln
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "payload": frames}
            )

    return sample_batch


def sample_frames(videos: DataFrame, every: int = 2) -> DataFrame:
    """(doc_id, payload FSTK) → one row per sampled frame."""
    return videos.select("doc_id", "payload").mapInPandas(
        make_frame_sample_kernel(every), FRAME_SCHEMA
    )


# -------------------------------------------------------------- audio
# WAV (RIFF/PCM16) is the audio analogue of PPM/BMP: a pure-struct
# public container needing no codec library. The fixture synthesizes
# deterministic mono PCM16 from doc_id so every feature is
# SQL-replayable; the parser walks RIFF chunks for real (fmt/data
# discovery by chunk id + size, not fixed offsets).

AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, n_bytes int, sample_rate int, n_samples int, "
    "duration_ms int, peak int, rms double, zero_crossings int"
)


def make_audio_kernel():
    """mapInPandas kernel producing WAV payloads: mono PCM16,
    n = 2048 + doc_id % 1024 samples, rate = 8000 * (doc_id % 3 + 1),
    sample[i] = ((doc_id * 13 + i * i) % 65536) - 32768."""

    def audio_batch(it):
        import struct

        import numpy as np
        import pandas as pd

        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 2048 + d % 1024
                rate = 8000 * (d % 3 + 1)
                i = np.arange(n, dtype=np.int64)
                s = ((d * 13 + i * i) % 65536 - 32768).astype("<i2")
                data = s.tobytes()
                hdr = (
                    b"RIFF"
                    + struct.pack("<I", 36 + len(data))
                    + b"WAVE"
                    + b"fmt "
                    + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
                    + b"data"
                    + struct.pack("<I", len(data))
                )
                payloads.append(hdr + data)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return audio_batch


def attach_audio(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id").mapInPandas(
        make_audio_kernel(), "doc_id bigint, payload binary"
    )


def make_audio_features_kernel():
    """WAV payload → signal features. The RIFF walk is a REAL chunk
    scan (id + little-endian size, word-aligned skip) so containers
    with extra chunks (LIST/INFO) parse too; PCM16 mono is asserted.
    Features: duration, peak amplitude, RMS energy, zero-crossing
    count — the standard cheap audio-quality signals for corpus
    filtering (clipping / silence / noise heuristics)."""

    def features_batch(it):
        import struct

        import numpy as np
        import pandas as pd

        def parse(payload: bytes):
            if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
                raise ValueError("not a RIFF/WAVE container")
            pos, fmt, data = 12, None, None
            while pos + 8 <= len(payload):
                cid = payload[pos : pos + 4]
                (ln,) = struct.unpack_from("<I", payload, pos + 4)
                if pos + 8 + ln > len(payload):
                    raise ValueError("truncated RIFF chunk")
                body = payload[pos + 8 : pos + 8 + ln]
                if cid == b"fmt ":
                    fmt = struct.unpack_from("<HHIIHH", body, 0)
                elif cid == b"data":
                    data = body
                pos += 8 + ln + (ln & 1)  # chunks are word-aligned
            if fmt is None or data is None:
                raise ValueError("missing fmt/data chunk")
            audio_format, channels, rate, _br, _ba, bits = fmt
            if (audio_format, channels, bits) != (1, 1, 16):
                raise ValueError("only PCM16 mono supported")
            return rate, np.frombuffer(data, "<i2").astype(np.float64)

        for pdf in it:
            out = {
                "doc_id": [], "n_bytes": [], "sample_rate": [],
                "n_samples": [], "duration_ms": [], "peak": [],
                "rms": [], "zero_crossings": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, s = parse(payload)
                n = len(s)
                nonneg = s >= 0
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(payload))
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration_ms"].append(n * 1000 // rate)
                out["peak"].append(int(np.abs(s).max()) if n else 0)
                out["rms"].append(float(np.sqrt(np.mean(s * s))) if n else 0.0)
                out["zero_crossings"].append(
                    int((nonneg[1:] != nonneg[:-1]).sum())
                )
            yield pd.DataFrame(out)

    return features_batch


def audio_features(audio: DataFrame) -> DataFrame:
    """(doc_id, payload WAV) → signal features, one Arrow stage."""
    return audio.select("doc_id", "payload").mapInPandas(
        make_audio_features_kernel(), AUDIO_FEATURES_SCHEMA
    )


# --------------------------------------------------------- PNG support
# Real PNG (ISO/IEC 15948): zlib-compressed IDAT, per-scanline filters.
# 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA), non-interlaced
# — the overwhelming majority of crawled PNGs. Not used by the
# oracle-replayed corpus fixtures (zlib output is not SQL-replayable);
# decode_pixels dispatches on the PNG signature so pipelines holding
# real PNG payloads flow through the same feature/resize kernels.

from ccog_spark.raster.jpegcodec import decode as _jpeg_decode

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def encode_png(
    arr, color_type: int = 2, filters: list[int] | None = None
) -> bytes:
    """Minimal PNG encoder (fixture/test source): ``arr`` is
    (h, w) for gray or (h, w, C) uint8; ``filters`` optionally fixes
    the per-row filter type (0..4) — tests use this to exercise every
    unfilter path. Default: filter 0 everywhere."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    assert ch == _PNG_CHANNELS[color_type], (ch, color_type)
    bpp = ch
    raw = bytearray()
    prev = np.zeros(w * ch, np.uint8)
    for y in range(h):
        row = a[y].reshape(-1)
        f = filters[y % len(filters)] if filters else 0
        raw.append(f)
        if f == 0:
            out = row
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            out = (row.astype(np.int16) - left).astype(np.uint8)
        elif f == 2:  # Up
            out = (row.astype(np.int16) - prev).astype(np.uint8)
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            avg = (left.astype(np.int16) + prev.astype(np.int16)) // 2
            out = (row.astype(np.int16) - avg).astype(np.uint8)
        else:  # 4 Paeth
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
            out = (
                row.astype(np.int16) - _paeth(left, prev, ul).astype(np.int16)
            ).astype(np.uint8)
        raw += out.tobytes()
        prev = row

    def chunk(tag: bytes, body: bytes) -> bytes:
        import zlib as z

        crc = z.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _paeth(a, b, c):
    """Paeth predictor, vectorized (PNG spec §9.4: nearest of
    left/up/up-left to the linear gradient a + b - c)."""
    import numpy as np

    a = a.astype(np.int16)
    b = b.astype(np.int16)
    c = c.astype(np.int16)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(payload: bytes):
    """Real PNG decode → (h, w, 3) uint8 RGB: chunk walk with length
    validation, zlib inflate of concatenated IDAT, per-scanline
    unfiltering (all five filter types). Gray expands to RGB; alpha is
    dropped (payload pipelines carry RGB through features/resize)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG signature")
    pos, end = 8, len(payload)
    w = h = color_type = None
    idat = bytearray()
    while pos + 8 <= end:
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        if pos + 12 + ln > end:
            raise ValueError(f"truncated chunk {tag!r}")
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            if ln != 13:
                raise ValueError(f"bad IHDR length {ln}")
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG: depth={depth} color_type={color_type}"
                )
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("missing IHDR")
    ch = _PNG_CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # corrupt IDAT → same contract as the rest
        raise ValueError(f"corrupt PNG IDAT: {e}") from e
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        f = rows[y, 0]
        line = rows[y, 1:]
        if f == 0:
            rec = line.copy()
        elif f == 2:  # Up — fully vectorized
            rec = line + prev  # uint8 wraparound == mod-256 add
        elif f == 1:  # Sub: recon[x] = cumulative sum per channel lane
            d = line.reshape(w, ch).astype(np.int64)
            rec = (d.cumsum(axis=0) % 256).astype(np.uint8).reshape(-1)
        elif f == 3:  # Average: sequential in x, vectorized over ch
            d = line.reshape(w, ch).astype(np.int16)
            up = prev.reshape(w, ch).astype(np.int16)
            rc = np.zeros((w, ch), np.int16)
            left = np.zeros(ch, np.int16)
            for x in range(w):
                rc[x] = (d[x] + ((left + up[x]) >> 1)) & 0xFF
                left = rc[x]
            rec = rc.astype(np.uint8).reshape(-1)
        elif f == 4:  # Paeth: sequential in x, vectorized over ch
            d = line.reshape(w, ch).astype(np.int16)
            up = prev.reshape(w, ch).astype(np.int16)
            rc = np.zeros((w, ch), np.int16)
            left = np.zeros(ch, np.int16)
            ul = np.zeros(ch, np.int16)
            for x in range(w):
                pred = _paeth(
                    left.astype(np.uint8),
                    up[x].astype(np.uint8),
                    ul.astype(np.uint8),
                ).astype(np.int16)
                rc[x] = (d[x] + pred) & 0xFF
                left = rc[x]
                ul = up[x]
            rec = rc.astype(np.uint8).reshape(-1)
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = rec
        prev = out[y]
    px = out.reshape(h, w, ch)
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    if ch == 4:
        return px[:, :, :3].copy()
    return px


def _jpeg_sof(payload: bytes):
    """SOF0 scan shared by the metadata kernel and decode_jpeg_gray:
    → (width, height, n_components). Walks markers (skipping interior
    SOI/EOI of abbreviated tables streams); truncated or SOF0-less
    streams raise ValueError — fail loudly, never struct.error."""
    import struct

    pos, n = 2, len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        m = payload[pos + 1]
        if m == 0xC0:
            if pos + 10 > n:
                raise ValueError("truncated JPEG SOF0 segment")
            (h,) = struct.unpack_from(">H", payload, pos + 5)
            (w,) = struct.unpack_from(">H", payload, pos + 7)
            return w, h, payload[pos + 9]
        # Non-baseline SOF family (progressive SOF2, extended SOF1,
        # lossless SOF3, arithmetic 0xC9-0xCB/0xCD-0xCF): say so
        # explicitly rather than scanning on and mis-reporting.
        if 0xC1 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            raise ValueError(
                f"unsupported JPEG SOF marker 0xFF{m:02X} (non-baseline, "
                f"e.g. progressive); only baseline SOF0 is supported"
            )
        # SOS starts entropy-coded data — segment-length walking past
        # it would interpret scan bytes as lengths. A SOF must appear
        # before SOS in any valid stream, so stop here.
        if m == 0xDA:
            break
        if m in (0xD8, 0xD9, 0x01) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        pos += 2 + ln
    raise ValueError("JPEG stream without SOF0")


def decode_jpeg(payload: bytes):
    """Baseline JPEG → (h, w, 3) uint8 RGB — grayscale (replicated to
    RGB) AND 3-component YCbCr color (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0,
    the crawl-image shapes), reusing the pure-numpy raster codec
    (raster/jpegcodec.py — the COG tile codec decodes standalone
    streams too, incl. restart markers). Honest limits raise a clear
    error instead of mis-decoding: progressive streams, exotic
    sampling factors, and dimensions that are not MCU-aligned (the
    tile codec has no partial-MCU crop)."""
    import numpy as np

    w, h, nc = _jpeg_sof(payload)
    raw = _jpeg_decode(payload)
    if nc == 1:
        px = np.frombuffer(raw, np.uint8, count=w * h).reshape(h, w)
        return np.repeat(px[:, :, None], 3, axis=2)
    return np.frombuffer(raw, np.uint8, count=w * h * 3).reshape(h, w, 3)


# kept as the historical name (grayscale-era API); now decodes color too
decode_jpeg_gray = decode_jpeg


# --------------------------------------------------------- GIF support
# GIF87a/89a (CompuServe spec, public): logical screen descriptor,
# global color table, image descriptor, variable-code-width LZW pixel
# data in length-prefixed sub-blocks. Decode covers the common crawl
# case: first image frame, global or local palette, no interlace
# (raises clearly). encode_gif is the fixture/test source with a real
# greedy-dictionary LZW encoder so decode's code-width growth path is
# genuinely exercised.


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int):
    """GIF variable-width LZW → list of palette indices."""
    import numpy as np

    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, np.uint8)
    n_out = 0

    bitpos = 0
    nbits = len(data) * 8

    def read_code(width):
        nonlocal bitpos
        if bitpos + width > nbits:
            raise ValueError("truncated GIF LZW stream")
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            v |= ((byte >> ((bitpos + i) & 7)) & 1) << i
        bitpos += width
        return v

    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while True:
        code = read_code(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"corrupt GIF LZW code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt GIF LZW code {code}")
        if n_out + len(entry) > n_pixels:
            raise ValueError("GIF LZW output exceeds image size")
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, np.uint8)
        n_out += len(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if n_out == n_pixels:
            break
    if n_out != n_pixels:
        raise ValueError("GIF LZW stream ended early")
    return out


def decode_gif(payload: bytes):
    """First frame of a GIF87a/89a → (h, w, 3) uint8 RGB. Extensions
    are skipped; interlaced images raise (not mis-decoded)."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    flags = payload[10]
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        if pos + 3 * n > len(payload):
            raise ValueError("truncated global color table")
        palette = np.frombuffer(
            payload, np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        if pos + 10 > len(payload):
            raise ValueError("truncated image descriptor")
        _x, _y, w, h = struct.unpack_from("<HHHH", payload, pos + 1)
        iflags = payload[pos + 9]
        pos += 10
        if iflags & 0x40:
            raise ValueError("interlaced GIF unsupported")
        if iflags & 0x80:  # local color table wins
            n = 2 << (iflags & 7)
            if pos + 3 * n > len(payload):
                raise ValueError("truncated local color table")
            palette = np.frombuffer(
                payload, np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF image without a color table")
        mcs = payload[pos]
        pos += 1
        chunks = []
        while pos < len(payload) and payload[pos] != 0:
            ln = payload[pos]
            if pos + 1 + ln > len(payload):
                raise ValueError("truncated GIF data sub-block")
            chunks.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        idx = _gif_lzw_decode(b"".join(chunks), mcs, w * h)
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError("GIF pixel index outside color table")
        return palette[idx].reshape(h, w, 3)
    raise ValueError("GIF contains no image block")


def encode_gif(indices, palette) -> bytes:
    """Minimal GIF89a encoder (fixture/test source): ``indices``
    (h, w) uint8 palette indices, ``palette`` (n, 3) uint8. Real
    greedy-dictionary variable-width LZW so the decoder's table-growth
    and width-increase paths are exercised."""
    import struct

    import numpy as np

    idx = np.asarray(indices, np.uint8)
    pal = np.asarray(palette, np.uint8)
    h, w = idx.shape
    n = pal.shape[0]
    pbits = max(1, (n - 1).bit_length())
    full = 1 << pbits
    gct = np.zeros((full, 3), np.uint8)
    gct[:n] = pal
    mcs = max(2, pbits)
    clear = 1 << mcs
    end = clear + 1

    codes: list[tuple[int, int]] = []  # (code, width)
    width = mcs + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    nxt = end + 1
    codes.append((clear, width))
    run = b""
    for px in idx.reshape(-1):
        cand = run + bytes([px])
        if cand in table:
            run = cand
            continue
        codes.append((table[run], width))
        table[cand] = nxt
        if nxt == (1 << width) and width < 12:
            width += 1
        nxt += 1
        if nxt == 4096:  # table full: reset (spec-standard)
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            nxt = end + 1
            width = mcs + 1
        run = bytes([px])
    if run:
        codes.append((table[run], width))
    codes.append((end, width))

    bits = bytearray()
    acc = nacc = 0
    for code, cw in codes:
        acc |= code << nacc
        nacc += cw
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        bits.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (pbits - 1), 0, 0])
    out += gct.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(mcs)
    data = bytes(bits)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# ------------------------------------------------- fused compositions
# Round 17 (guide §4.1): chaining mapInPandas stages back-to-back
# still pays a full JVM↔Python↔JVM round trip of the PAYLOAD BYTES at
# every stage boundary (Arrow serialize + transpose each way), even
# though the stages land in one Spark stage. The kernels are plain
# generator transformers (iterator of pdf → iterator of pdf), so they
# compose INSIDE one Python worker: payload bytes then cross the
# boundary exactly once (decode_metadata has always used this trick —
# these entry points extend it to the feature/resize/frame/audio
# paths). Output values are bit-identical: the same kernels run in
# the same order on the same batches.


def _fused_map(docs: DataFrame, cols, kernels, schema) -> DataFrame:
    _register_self_by_value()

    def fused(it):
        for k in kernels:
            it = k(it)
        yield from it

    return docs.select(*cols).mapInPandas(fused, schema)


def image_features_from_docs(docs: DataFrame, bins: int = 8) -> DataFrame:
    """(doc_id, text) → payload → features in ONE Arrow stage."""
    return _fused_map(
        docs, ("doc_id", "text"),
        (make_encode_kernel(), make_features_kernel(bins)),
        FEATURES_SCHEMA,
    )


def resized_features_from_docs(
    docs: DataFrame, out_w: int, out_h: int, bins: int = 8
) -> DataFrame:
    """(doc_id, text) → payload → resize → features, ONE Arrow stage
    (was three: encode, resize, features — payload crossed the Python
    boundary three times)."""
    return _fused_map(
        docs, ("doc_id", "text"),
        (
            make_encode_kernel(),
            make_resize_kernel(out_w, out_h),
            make_features_kernel(bins),
        ),
        FEATURES_SCHEMA,
    )


def sampled_frames_from_docs(
    docs: DataFrame, every: int = 2, frame_side: int = 16
) -> DataFrame:
    """(doc_id) → FSTK container → sampled frames, ONE Arrow stage."""
    return _fused_map(
        docs, ("doc_id",),
        (make_video_kernel(frame_side), make_frame_sample_kernel(every)),
        FRAME_SCHEMA,
    )


def audio_features_from_docs(docs: DataFrame) -> DataFrame:
    """(doc_id) → WAV payload → signal features, ONE Arrow stage."""
    return _fused_map(
        docs, ("doc_id",),
        (make_audio_kernel(), make_audio_features_kernel()),
        AUDIO_FEATURES_SCHEMA,
    )
