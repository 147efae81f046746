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

__all__ = ["profile_table"]


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
