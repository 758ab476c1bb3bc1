"""Local correctness harness: run a Spark corpus query and its DuckDB
oracle side-by-side and compare row count, column names, and an
order-insensitive value hash — a stand-in for the driver's
CORRECTNESS_r{N}.json gate so regressions surface before a round ends.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass
from datetime import datetime
from typing import Any

import duckdb
from pyspark.sql import SparkSession

from ccog_spark.catalog import TABLES, table_path


def _norm_cell(v: Any) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def _hash_rows(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


@dataclass
class CompareResult:
    qid: str
    ok: bool
    spark_rows: int
    duck_rows: int
    spark_cols: list[str]
    duck_cols: list[str]
    detail: str = ""


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def compare_query(
    spark: SparkSession, qid: str, sf_dir: str, sample_on_mismatch: int = 5
) -> CompareResult:
    from ccog_spark.queries.registry import ORACLE, REGISTRY

    sdf = REGISTRY[qid](spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    if qid not in ORACLE:
        # mirror the driver's no_oracle path: a rows-only check — the
        # query ran and produced a stable frame, nothing to hash against
        return CompareResult(
            qid, True, len(s_rows), -1, s_cols, [], "no_oracle (rows-only)"
        )

    con = duckdb_conn(sf_dir)
    res = con.execute(ORACLE[qid])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    detail = ""
    ok = True
    if sorted(s_cols) != sorted(d_cols):
        ok = False
        detail = f"columns differ: spark={s_cols} duck={d_cols}"
    elif len(s_rows) != len(d_rows):
        ok = False
        detail = f"row count: spark={len(s_rows)} duck={len(d_rows)}"
    else:
        hs = _hash_rows(s_cols, s_rows)
        hd = _hash_rows(d_cols, d_rows)
        if hs != hd:
            ok = False
            s_set = {
                "\x1f".join(
                    _norm_cell(r[i])
                    for i in sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                )
                for r in s_rows
            }
            d_set = {
                "\x1f".join(
                    _norm_cell(r[i])
                    for i in sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                )
                for r in d_rows
            }
            only_s = list(s_set - d_set)[:sample_on_mismatch]
            only_d = list(d_set - s_set)[:sample_on_mismatch]
            detail = f"value hash differs; spark-only={only_s} duck-only={only_d}"
    return CompareResult(
        qid, ok, len(s_rows), len(d_rows), s_cols, d_cols, detail
    )


def compare_all(
    spark: SparkSession, sf_dir: str, qids: list[str] | None = None
) -> list[CompareResult]:
    from ccog_spark.queries.registry import REGISTRY

    out = []
    for qid in qids or REGISTRY:
        try:
            out.append(compare_query(spark, qid, sf_dir))
        except Exception as e:  # keep going: report every query's status
            out.append(
                CompareResult(qid, False, -1, -1, [], [], f"error: {e}"[:500])
            )
    return out
