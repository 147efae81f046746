"""Wide -> long reshape (melt) as a narrow, single-pass plan.

The reference's inference engine re-scans the whole wide pandas table once
per (cluster x variable) pair (reference chisquared_tester.py:1434-1589).
The Spark redesign melts the wide respondent table to long
``(id_vars..., variable, value)`` ONCE with ``stack`` — a narrow map-side
transform (no shuffle) that every downstream contingency aggregation
shares (SURVEY §3.3).

``stack`` is preferred over exploding an array of structs because it stays
entirely inside whole-stage codegen and keeps column pruning intact: only
the melted columns are read from the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    id_vars: list[str],
    value_vars: list[str] | None = None,
    var_name: str = "variable",
    value_name: str = "value",
    value_type: str = "string",
) -> DataFrame:
    """Unpivot ``value_vars`` into (var_name, value_name) rows.

    All values are cast to ``value_type`` (default string — the survey
    tables are categorical; numeric variables keep their lexical form and
    are re-cast downstream where needed).
    """
    if value_vars is None:
        value_vars = [c for c in df.columns if c not in id_vars]
    if not value_vars:
        raise ValueError("melt: no value_vars to unpivot")
    # Survey column names are externally supplied: escape backticks in
    # identifiers and backslashes/quotes in the label literal so a hostile
    # name can't break (or inject into) the stack() SQL.
    def _ident(c: str) -> str:
        return c.replace("`", "``")

    def _label(c: str) -> str:
        return c.replace("\\", "\\\\").replace("'", "\\'")

    kv_pairs = ", ".join(
        f"'{_label(c)}', cast(`{_ident(c)}` as {value_type})" for c in value_vars
    )
    stack_expr = (
        f"stack({len(value_vars)}, {kv_pairs}) as "
        f"(`{_ident(var_name)}`, `{_ident(value_name)}`)"
    )
    return df.select(*[F.col(c) for c in id_vars], F.expr(stack_expr))
