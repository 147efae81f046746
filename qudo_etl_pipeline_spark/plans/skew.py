"""Skew-mitigation plan helpers: key salting.

AQE (enabled in session.py) already splits skewed sort-merge-join
partitions at runtime, and hash aggregation does map-side partial
aggregation — those cover most hot-key cases for free. Explicit salting
remains the right tool when

- a broadcast is impossible (both sides large) AND the hot keys are so
  dominant that even a split partition is one task's worth of a single
  key (AQE splits by partition, not by key);
- the skewed operation is a stateful streaming aggregation, where AQE
  does not apply.

``salted_join`` replicates the small(er) side once per salt so the big
side's hot key fans out over ``n_salts`` tasks; ``salted_aggregate``
does a two-phase aggregation through an intermediate (key, salt) group.
Both are result-identical to their unsalted forms (tests/test_plans.py).

Scale note (100 TB): salting multiplies the replicated side by
``n_salts`` — use it per-hot-key-table, not as a default; the salt
column derives from a deterministic per-row hash, so retries/speculative
tasks stay consistent (no rand()).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AGGS = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}

# second-phase re-aggregation of the per-salt partials
_MERGE = {
    "sum": F.sum,
    "count": F.sum,
    "min": F.min,
    "max": F.max,
}


def _salt_col(df: DataFrame, n_salts: int) -> Column:
    """Row salt in [0, n_salts): DETERMINISTIC content hash of the row.

    Determinism is a fault-tolerance requirement, not a nicety: a salt
    derived from row POSITION (monotonically_increasing_id) changes when
    a lost map task regenerates its input in a different fetch order, so
    reducers holding partials from the old generation and reducers
    reading the new one could count the same row under two different
    salts — double-counting (or dropping) rows exactly when a large job
    hits executor loss. A content hash assigns every row the same salt
    on every regeneration.

    Byte-identical duplicate rows necessarily share a salt. For the
    aggregate path that is harmless: phase 1's map-side combine folds
    identical rows within each task, so the reducer for their (key,
    salt) sees at most one partial per map task — bounded by task
    count, not row count. For the join path a flood of fully identical
    big-side rows stays on one reducer; spreading those would require
    nondeterminism, which the correctness argument forbids.
    """
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]),
        F.lit(n_salts),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys fanned out over n_salts.

    The big side gets a deterministic salt; the small side is exploded
    once per salt value so every (key, salt) pair finds its match. The
    shuffle then distributes each hot key over n_salts reducers instead
    of one. Result-identical to ``big.join(small, on, how)`` for
    inner/left joins.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_big = big.withColumn("_salt", _salt_col(big, n_salts))
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    joined = salted_big.join(salted_small, [*on, "_salt"], how)
    return joined.drop("_salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation through (keys, salt) for decomposable aggs.

    ``aggs`` maps output column -> (input column, fn) with fn in
    sum/count/min/max. Phase 1 aggregates per (keys, salt) — the hot key
    spreads over n_salts reducers; phase 2 merges the tiny per-salt
    partials per key. Result-identical to ``df.groupBy(keys).agg(...)``.
    """
    bad = [fn for _, fn in aggs.values() if fn not in _AGGS]
    if bad:
        raise ValueError(f"unsupported agg fns: {bad} (need {sorted(_AGGS)})")
    salted = df.withColumn("_salt", _salt_col(df, n_salts))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[_AGGS[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    phase2 = phase1.groupBy(*keys).agg(
        *[_MERGE[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )
    return phase2
