"""Z-order (Morton) interleave key for multi-dimensional data layout.

Extension scope: sorting a 100 TB table by ``zorder2(a, b)`` before a
partitioned/parquet write clusters BOTH dimensions into the same files,
so min/max footer stats prune scans for predicates on either column —
the layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``. The key is
pure bit arithmetic (shift/and/or), identical in Spark and DuckDB, so
layouts are oracle-checkable.

Inputs must be non-negative and < 2**bits; callers bucket/offset raw
values first (e.g. ``col % 65536``). 2*bits <= 62 keeps every
intermediate positive in signed BIGINT on both engines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["zorder2", "zorder2_sql"]


def zorder2(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of x (even positions) and y (odd)."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    xl = x.cast("bigint")
    yl = y.cast("bigint")
    parts = []
    for b in range(bits):
        parts.append(
            F.shiftleft(F.shiftright(xl, b).bitwiseAND(F.lit(1)), 2 * b)
        )
        parts.append(
            F.shiftleft(F.shiftright(yl, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return reduce(lambda a, c: a.bitwiseOR(c), parts)


def zorder2_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB SQL text computing the same value as :func:`zorder2`."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " | ".join(terms) + ")"
