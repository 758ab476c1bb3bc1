"""Multimodal columns: opaque BINARY payloads with typed metadata.

Images/audio/video ride through the engine as ``binary`` columns plus a
metadata struct; decode / feature-extract / resize run as Arrow-batched
``mapInPandas`` stages. The container has no image/audio codecs, so the
decode kernel is a clearly-marked deterministic stub — but the
Spark-side plumbing (schema, Arrow binary batches, partition-preserving
mapInPandas, metadata derivation) is real and tested, which is the part
that matters for the 100 TB design: payload bytes never leave their
partition, only metadata aggregates shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, channels int, "
    "format string"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Materialize an opaque binary payload column (here: the UTF-8
    bytes of the text; in production: image/audio bytes read from a
    blob store) plus a typed metadata struct."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("content_type"),
            F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def make_decode_kernel():
    """Build the mapInPandas decode kernel as a SELF-CONTAINED closure.

    Spark pickles UDFs defined in an importable module *by reference*;
    executors that can't import ccog_spark (driver launched from an
    arbitrary cwd, package not pip-installed) would fail with
    ModuleNotFoundError. A nested function with only local imports and
    no module globals is pickled by value and runs anywhere.
    """

    def decode_batch(it):
        import pandas as pd  # local import: executors need no ccog_spark

        def fake_decode(payload: bytes):
            # STUB — deterministic fake decoder. A real deployment
            # decodes with PIL/ffmpeg here; the container has no codecs,
            # so dimensions derive from the payload length (keeps the
            # operator oracle-checkable end-to-end).
            n = len(payload)
            return (n % 64 + 16, (n * 7) % 64 + 16, 3, "fake")

        for pdf in it:
            meta = [fake_decode(p) for p in pdf["payload"]]
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
    """Binary payload → decoded metadata via Arrow-batched mapInPandas."""
    return attach_payload(docs).mapInPandas(make_decode_kernel(), DECODE_SCHEMA)
