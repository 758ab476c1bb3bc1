"""Shared persisted-index lifecycle helpers: in-flight mutation
markers and tombstone tables (round 14).

Both persisted indexes (text_index.py, ann_index.py) mutate several
tables per maintenance verb — append commits postings/doclens (or
codes) before the terms merge and meta rewrite. A crash between those
steps used to leave an index whose stale df/n_docs silently produced
WRONG scores (round-13 ADVICE, text_index.py:137), with nothing to
detect the half-applied mutation. The fix is a marker protocol:

- ``begin_mutation`` writes ``_inflight`` (op name + target
  generation) BEFORE the first table is touched; if a marker is
  already present the previous mutation tore — refuse to stack a
  second one on top.
- ``end_mutation`` removes the marker AFTER the meta rewrite — the
  last step of every verb, so a visible marker always means "tables
  may be mutually inconsistent".
- ``check_not_inflight`` is the QUERY-side gate: a torn index raises
  loudly (with the repair path — rebuild from the corpus, or restore
  the directory from its source snapshot) instead of returning
  plausible-but-wrong rankings.

On a real object store the marker is one small object PUT/DELETE —
the same visibility story as the staged-rename directory swaps these
modules already use.

Tombstones: deletion is logical-first (the 100 TB-friendly order) —
``tombstones/`` holds the deleted ids as a small parquet set, queries
anti-join against it, and compaction applies it physically. Helpers
here keep the read/append/clear spelling identical across both
indexes.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INFLIGHT = "_inflight"
TOMBSTONES = "tombstones"


def _marker_path(index_dir: str) -> str:
    return os.path.join(index_dir, INFLIGHT)


def begin_mutation(index_dir: str, op: str, generation: int = -1) -> None:
    """Write the in-flight marker; refuses if one is already there
    (the previous mutation tore — mutating further could compound the
    inconsistency)."""
    check_not_inflight(index_dir)
    with open(_marker_path(index_dir), "w") as fh:
        json.dump({"op": op, "target_generation": generation}, fh)


def end_mutation(index_dir: str) -> None:
    os.remove(_marker_path(index_dir))


def inflight_op(index_dir: str) -> dict | None:
    """The torn mutation's marker payload, or None when clean."""
    p = _marker_path(index_dir)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as fh:
            return json.load(fh)
    except Exception:  # unreadable marker is still a torn mutation
        return {"op": "unknown", "target_generation": -1}


def check_not_inflight(index_dir: str) -> None:
    info = inflight_op(index_dir)
    if info is not None:
        raise RuntimeError(
            f"index at {index_dir!r} has a torn {info.get('op')!r} "
            "mutation (an _inflight marker is present): its tables may "
            "be mutually inconsistent and scores would be silently "
            "wrong. Repair: rebuild the index from the corpus, or "
            "restore the index directory from its pre-mutation "
            "snapshot, then delete the _inflight marker."
        )


def tombstones_path(index_dir: str) -> str:
    return os.path.join(index_dir, TOMBSTONES)


def read_tombstones(
    spark: SparkSession, index_dir: str, id_col: str
) -> DataFrame | None:
    """The tombstoned id set as a 1-column frame, or None when the
    index has no pending deletions."""
    p = tombstones_path(index_dir)
    if not os.path.isdir(p):
        return None
    return spark.read.parquet(p).select(id_col)


def append_tombstones(ids: DataFrame, index_dir: str) -> None:
    ids.write.mode("append").parquet(tombstones_path(index_dir))


def clear_tombstones(index_dir: str) -> None:
    shutil.rmtree(tombstones_path(index_dir), ignore_errors=True)


def anti_tombstones(
    df: DataFrame, tomb: DataFrame | None, id_col: str
) -> DataFrame:
    """df minus tombstoned ids. The tombstone side is broadcast: a
    delete batch is takedown/dedup-listing sized (≪ corpus); a
    deletion set too big to broadcast is a rebuild, not a tombstone
    job — compact applies pending tombstones long before that."""
    if tomb is None:
        return df
    return df.join(F.broadcast(tomb), id_col, "left_anti")
