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
