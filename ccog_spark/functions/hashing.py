"""Deterministic, engine-portable hashing for dedup/fingerprint ops.

Engines disagree on built-in hash functions (Spark xxhash64 vs DuckDB
hash), so sketch operators built on them could never be oracle-checked.
Instead we define a polynomial rolling hash over code points:

    h(s) = fold(c in s): (acc * 31 + codepoint(c)) mod 1_000_000_007

computable with higher-order array functions in BOTH Spark
(``aggregate(split(s,''), ...)``) and DuckDB (``list_reduce``) — fully
JVM-side in Spark (whole-stage codegen, no Python), deterministic, and
identical across engines. MinHash then uses the standard universal
family h_i(x) = (a_i·x + b_i) mod p over the rolling hash.

Scale note: these are per-row map-side expressions — no shuffle, no
UDF; cost is O(len) per string exactly like any built-in hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007
# Deterministic MinHash parameter family (a must be nonzero mod p).
MINHASH_A = [2 * i + 1 for i in range(1, 65)]
MINHASH_B = [7919 * i + 104729 for i in range(1, 65)]


def roll_hash(col: Column) -> Column:
    """Polynomial rolling hash of a string column → BIGINT in [0, MOD)."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % MOD,
    )


def roll_hash_sql_duckdb(expr: str) -> str:
    """DuckDB expression computing the identical rolling hash."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split_regex({expr}, ''), "
        f"c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, c) -> (acc * 31 + c) % {MOD})"
    )


def minhash_perm(h: Column, i: int) -> Column:
    """i-th universal-family permutation of a base hash."""
    return (h * MINHASH_A[i] + MINHASH_B[i]) % MOD


def minhash_perm_sql(expr: str, i: int) -> str:
    return f"(({expr}) * {MINHASH_A[i]} + {MINHASH_B[i]}) % {MOD}"
