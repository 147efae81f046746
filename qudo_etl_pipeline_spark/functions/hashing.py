"""Cross-engine deterministic hashing expressions.

MinHash / SimHash / fingerprint operators need a 64-bit hash whose value
is identical in Spark AND in the DuckDB oracle so their outputs can be
hash-compared (driver correctness gate). Spark's ``hash()`` is Murmur3
with Spark-specific seeding and DuckDB's ``hash()`` is unrelated, so
neither can be the common function. Instead both sides derive a 60-bit
integer from the first 15 hex chars of md5 (md5 is identical everywhere):

  Spark : CAST(CONV(SUBSTRING(MD5(s), 1, 15), 16, 10) AS BIGINT)
  DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT

60 bits < 63, so the value is always a non-negative signed BIGINT in
both engines. For seeded hash families (MinHash permutations) the seed
is prepended to the input string.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash64(col: Column | str) -> Column:
    """Deterministic non-negative 60-bit hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def token_hash64(col: Column | str, seed: int) -> Column:
    """Seeded variant for hash families: hash64(seed || ':' || value)."""
    c = F.col(col) if isinstance(col, str) else col
    return hash64(F.concat(F.lit(f"{seed}:"), c))


def hash64_sql(expr: str) -> str:
    """DuckDB SQL text computing the same value as :func:`hash64`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def token_hash64_sql(expr: str, seed: int) -> str:
    """DuckDB SQL text computing the same value as :func:`token_hash64`."""
    return hash64_sql(f"('{seed}:' || {expr})")


# Universal affine family over ONE md5 base hash (the same Broder-style
# construction dedup.py uses for MinHash): position_r(x) =
# ((a_r * (hash64(x) mod 2^31) + b_r) mod P) mod modulus. The md5 is the
# dominant per-row cost, so an n-position probe costs one md5 + n cheap
# affine transforms instead of n md5 passes. All operands stay < 2^62 —
# exact, ANSI-safe, and bit-identical in the DuckDB oracle.
UNIVERSAL_MOD = 2_147_483_647  # 2^31 - 1 (prime)
UNIVERSAL_RANGE = 2_147_483_648  # 2^31


def affine_params(seed: int) -> tuple[int, int]:
    """Deterministic (a, b) for family member `seed` (a != 0)."""
    a = (seed * 2_654_435_761 + 1) % UNIVERSAL_MOD
    b = (seed * 1_013_904_223 + 12_345) % UNIVERSAL_MOD
    return (a or 1, b)


def hash_positions(col: Column | str, n: int, modulus: int) -> Column:
    """Array of n universal-hash positions of a string column in
    [0, modulus) — Spark side."""
    c = F.col(col) if isinstance(col, str) else col
    base = hash64(c) % UNIVERSAL_RANGE
    out = []
    for r in range(n):
        a, b = affine_params(r)
        out.append((F.lit(a) * base + F.lit(b)) % UNIVERSAL_MOD % modulus)
    return F.array(*out)


def hash_position_sql(expr: str, seed: int, modulus: int) -> str:
    """DuckDB SQL text for ONE member of :func:`hash_positions`."""
    a, b = affine_params(seed)
    base = f"({hash64_sql(expr)} % {UNIVERSAL_RANGE})"
    return f"((({a} * {base} + {b}) % {UNIVERSAL_MOD}) % {modulus})"
