"""UDTF surface (E38): Python user-defined table functions (Spark ≥3.5).

One representative operator: ``explode_shingles`` — a UDTF emitting
(position, shingle) rows per document, the row-generating twin of the
expression-based shingle machinery in operators.dedup. UDTFs are the
engine's extension point for one-row→many-rows operators that don't fit
``explode`` over a prebuilt array (e.g. when emission is conditional or
stateful per row).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, shingle string")
class ShingleUDTF:
    """Emit word 3-gram shingles with positions for one text value."""

    def eval(self, text: str):  # noqa: D102 — Spark UDTF contract
        if text is None:
            return
        toks = text.split(" ")
        for i in range(max(0, len(toks) - 2)):
            yield i, " ".join(toks[i : i + 3])


def register_udtfs(spark) -> None:
    """Register engine UDTFs for the SQL surface:
    ``SELECT s.* FROM documents, LATERAL explode_shingles(text) s``."""
    spark.udtf.register("explode_shingles", ShingleUDTF)
