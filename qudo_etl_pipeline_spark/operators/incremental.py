"""Incremental aggregate maintenance: mergeable partial states.

Extension scope (no reference counterpart): at 100 TB you never
recompute a rollup from scratch — you aggregate today's delta into a
partial state (count / exact sum / exact sum-of-squares per group) and
MERGE it with yesterday's state; the merge is a groupBy over
state-table-sized inputs, independent of history size. Count, sum, and
sum-of-squares are the canonical commutative-monoid states: mean,
variance, and stddev are derived at read time, so the merged result is
bit-identical to a direct full-data aggregate.

Sums accumulate in DECIMAL (exact, order-independent) so merge order
and partitioning can never change the answer — the same device the
oracle catalog uses everywhere for cross-engine float determinism.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["partial_state", "merge_states", "finalize_state", "table_diff"]

_SUM_T = "decimal(28,6)"
_SQ_T = "decimal(38,12)"


def partial_state(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Aggregate a batch into mergeable per-group state:
    (keys..., n, sum_v, sum_sq) with DECIMAL-exact sums."""
    v = F.col(value_col).cast(_SUM_T)
    # the SQUARE operand must be narrow enough that the product type is
    # exact: decimal(28,6) * decimal(28,6) wants decimal(57,12), which
    # overflows precision 38 and makes Spark silently TRUNCATE the
    # product scale to 6 (e.g. 0.0015^2 -> 0.000002, not 0.00000225).
    # decimal(18,6) operands produce an exact decimal(37,12) product
    # (|value| < 1e12 — far beyond any metric this engine aggregates),
    # then the cast to decimal(38,12) is lossless.
    vsq = F.col(value_col).cast("decimal(18,6)")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("sum_v"),
        F.sum((vsq * vsq).cast(_SQ_T)).alias("sum_sq"),
    )


def merge_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge partial states (union + re-sum). Input and output are
    state-table-sized — merging a day's delta into a year's rollup
    never touches the year's raw rows."""
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    # decimal(38,6), not the (28,6) input-value type: Spark already
    # widens partial_state's SUM to (38,6), so casting the merge back
    # down both destabilized the state schema across merge generations
    # and overflowed on totals >= 1e22 that (38,6) holds exactly
    return unioned.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").cast("decimal(38,6)").alias("sum_v"),
        F.sum("sum_sq").cast(_SQ_T).alias("sum_sq"),
    )


def finalize_state(state: DataFrame, keys: list[str]) -> DataFrame:
    """Read-time projection: exact totals as doubles plus derived mean.
    (Variance/stddev derive the same way: (sum_sq - sum_v²/n)/n.)

    ``total_sq`` is ROUNDED to scale 6 in the DECIMAL domain before the
    double cast (the q1_pricing_summary device): at scale 12 a group's
    squared-sum exceeds 2^53 unscaled around 9e3 — a few hundred rows of
    |value|~1e3 — and past that DuckDB's int128→double→/10^12 double
    rounding can land 1 ulp off Spark's correctly-rounded BigDecimal
    conversion (observed: ONE divergent group in the 18k-group sf1
    sweep). At scale 6 the unscaled value stays exact to 9e9 —
    far beyond any per-group squared total this engine rolls up.
    ``sum_v`` keeps its direct cast: at scale 6 it is exact to the same
    9e9 bound, which group-level value totals do not approach."""
    return state.select(
        *keys,
        "n",
        F.col("sum_v").cast("double").alias("total"),
        F.round(F.col("sum_sq"), 6).cast("double").alias("total_sq"),
        # divide as DOUBLE (not decimal): both engines then evaluate the
        # same IEEE division of identical operands — decimal division
        # would introduce engine-specific result scales
        (F.col("sum_v").cast("double") / F.col("n")).alias("mean"),
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Snapshot diff: classify every key as ``insert`` / ``delete`` /
    ``update`` between two table versions (unchanged keys are omitted —
    the diff IS the output).

    Rows are compared by an md5 fingerprint of ``compare_cols``
    (default: all shared non-key columns), each value null-coalesced to
    a \\x02 sentinel and joined with a \\x01 separator — so NULL vs
    'NULL'-the-string never collide, and the compare cost per row is
    one md5 regardless of column count. Cast semantics for doubles
    differ across engines; fingerprint string/int columns when the diff
    must be replayed cross-engine.

    ONE full-outer shuffle join on the key (exchange-free when both
    snapshots are bucketed on it — the steady-state layout for a table
    diffed every cycle). Output: keys + change_type.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    if not compare_cols:
        raise ValueError("no columns to compare")

    def fp(df: DataFrame, alias: str) -> DataFrame:
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x02"))
            for c in compare_cols
        ]
        return df.select(
            *keys, F.md5(F.concat_ws("\x01", *parts)).alias(alias)
        )

    o = fp(old, "_fp_old")
    n = fp(new, "_fp_new")
    joined = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("_fp_old").isNull(), F.lit("insert"))
        .when(F.col("_fp_new").isNull(), F.lit("delete"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("update"))
    )
    return (
        joined.select(*keys, change.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )
