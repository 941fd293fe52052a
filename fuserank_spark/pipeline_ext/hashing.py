"""Portable deterministic hashing shared by dedup/text operators.

Every hash here is md5-derived so Spark and DuckDB (and any other
engine) compute bit-identical values — xxhash64/murmur are
engine-specific and would break differential checks. 32-bit values
keep all downstream arithmetic safely inside BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_PRIME = 2147483647  # 2^31 − 1

# fixed (a, b) affine permutation constants for MinHash signatures
MINHASH_PERMS: list[tuple[int, int]] = [
    (1103515245, 12345),
    (214013, 2531011),
    (134775813, 1),
    (22695477, 1),
    (69069, 362437),
    (1664525, 1013904223),
    (48271, 11),
    (16807, 7),
]


def portable_hash32(col: Column) -> Column:
    """First 8 hex chars of md5 as a BIGINT ∈ [0, 2^32)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def portable_hash32_sql(expr: str) -> str:
    """DuckDB twin of portable_hash32."""
    return f"CAST(concat('0x', substring(md5({expr}), 1, 8)) AS BIGINT)"


def minhash_perm(h: Column, a: int, b: int) -> Column:
    return (F.lit(a) * h + F.lit(b)) % F.lit(HASH_PRIME)


def minhash_perm_sql(h_expr: str, a: int, b: int) -> str:
    return f"(({a} * {h_expr} + {b}) % {HASH_PRIME})"


def minhash_perms(k: int) -> list[tuple[int, int]]:
    """First ``k`` affine permutation constants: the 8 fixed
    MINHASH_PERMS (signature compatibility) extended deterministically
    by an LCG-derived sequence — constants are pinned forever by the
    differential tests, both engines materialize them as literals.
    All multipliers stay < HASH_PRIME so a·h fits in BIGINT."""
    if k <= len(MINHASH_PERMS):
        return MINHASH_PERMS[:k]
    out = list(MINHASH_PERMS)
    for i in range(len(MINHASH_PERMS), k):
        a = (1103515245 * (i + 1) + 12345) % HASH_PRIME
        b = (1013904223 * (i + 1)) % HASH_PRIME
        out.append((a or 1, b))
    return out
