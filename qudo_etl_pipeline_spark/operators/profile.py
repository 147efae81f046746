"""Table profiler: per-column stats (nulls, distincts, extremes, top
value) in ONE full-data shuffle.

Extension scope (no reference counterpart): the first thing run against
an unknown 100 TB table — the summary a schema-drift monitor, a
quality-check author, or a data catalog consumes.

Scale design: profiled columns melt into (col_name, value) cells in a
single map pass — the same device the contingency layer uses — then ONE
groupBy(col, value) shuffle with map-side combine produces the distinct
cell table, and every statistic (null count, distinct count, min/max,
modal value) is an O(cells) aggregate of it. Nothing else touches the
input again. The cell table is the cost knob: profiling a near-unique
column materializes ~|rows| cells for it (exact distinct counting can't
do better); drop such columns from ``columns`` or profile a sample when
that matters.

Numeric min/max come from a ``try_cast`` double alongside the string
form, so one melt serves mixed-type tables; non-castable columns yield
NULL numeric extremes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table", "benford_profile"]


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``.

    Output, one row per column (ordered by col_name for determinism):
    ``col_name, n_rows, n_nulls, n_distinct, min_value, max_value,
    top_value, top_count, min_num, max_num`` — string extremes are
    lexicographic over the cast-to-string values; ``top_value`` is the
    modal non-null value (ties broken by ascending value);
    ``min_num``/``max_num`` are double extremes where values cast
    (NULL otherwise).
    """
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile columns not in table: {missing}")

    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("v"),
                        F.expr(
                            f"try_cast(`{c}` AS DOUBLE)"
                        ).alias("vn"),
                    )
                    for c in cols
                ]
            )
        ).alias("c")
    ).select("c.*")

    counted = cells.groupBy("col_name", "v").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("vn").alias("vn_min"),
        F.max("vn").alias("vn_max"),
    )

    nn = F.col("v").isNotNull()
    # modal value with ties to the ascending value: min_by over the
    # composite ordering (-count, value) — NULL ordering keys (the
    # null-value cell) are skipped by min_by, so the mode is non-null
    top_ord = F.when(
        nn, F.struct((-F.col("cnt")).alias("nc"), F.col("v").alias("tv"))
    )
    return (
        counted.groupBy("col_name")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(~nn, F.col("cnt"))), F.lit(0)
            ).alias("n_nulls"),
            F.count(F.when(nn, 1)).alias("n_distinct"),
            F.min(F.when(nn, F.col("v"))).alias("min_value"),
            F.max("v").alias("max_value"),
            F.min_by(F.col("v"), top_ord).alias("top_value"),
            F.coalesce(
                F.max(F.when(nn, F.col("cnt"))), F.lit(0)
            ).alias("top_count"),
            F.min("vn_min").alias("min_num"),
            F.max("vn_max").alias("max_num"),
        )
        .orderBy("col_name")
    )


def benford_profile(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-data / unit-mixing smell test for a measure
    column.

    One map expression extracts the leading nonzero digit (string form
    of ABS(x) with sign/zero/dot stripped — no log10 edge cases), then
    ONE 9-row groupBy. Expected shares are exact literals
    ``log10(1 + 1/d)``; the chi-squared statistic over the 9 cells
    comes back via a 1-row total broadcast. Zero/NULL values are
    excluded (they carry no leading digit).
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    v = F.col(value_col)
    # try_cast: |x| < 5e-11 strips to the EMPTY string (no leading
    # digit at 10-decimal precision) — ANSI cast would error; NULL is
    # correct and the filter below drops it
    digit = F.substring(
        F.regexp_replace(
            F.format_number(F.abs(v.cast("double")), 10), "[0.,]", ""
        ),
        1,
        1,
    ).try_cast("bigint")
    digits = (
        df.filter(v.isNotNull() & (v != 0))
        .select(digit.alias("digit"))
        # |x| < 5e-11 survives the v != 0 filter but formats to an
        # all-zero string -> NULL digit: such rows carry no leading
        # digit at this precision, so drop them (keeps the output to
        # the 9 meaningful Benford cells)
        .filter(F.col("digit").between(1, 9))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = digits.agg(F.sum("n").alias("n_total"))
    import math

    expected = F.log10(
        F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")
    )
    obs_p = F.col("n").cast("double") / F.col("n_total").cast("double")
    dev = obs_p - expected
    chi_cell = (
        F.col("n_total").cast("double") * dev * dev / expected
    )
    return (
        digits.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            "n_total",
            ref_round(obs_p, 6).alias("observed_p6"),
            ref_round(expected, 6).alias("benford_p6"),
            ref_round(chi_cell, 6).alias("chi2_cell6"),
        )
    )
