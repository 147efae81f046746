"""Cleaning / recoding layer (SURVEY §2.2 P1-P10).

Pure, composable DataFrame transforms replicating the reference's pandas
cleaning semantics (file:line cites to /root/reference):

- drop `_time` columns + lowercase names      (utils.py:61-67)
- NA policy: string -> 'not selected', numeric -> -999  (utils.py:47-58)
- drop `cint` / `qudo_weight` columns         (chisquared_tester.py:139-164)
- inference exclusion list                    (chisquared_tester.py:166-190)
- `_tgt` tagging of `_fb`/`_gg` columns       (utils.py:83-89)
- `_numeric` suffix strip                     (utils.py:92-95)
- option_value -> option_text recode from the question-metadata dimension
  via broadcast map literals                  (main.py:18-42)
- column selection by fragment                (main.py:94-138)
- best-effort numeric coercion (dtype sniffing)  (clustering.py:101)
- weight-column / confidence-interval resolution (utils.py:6-44)
- HTML stripping                              (chisquared_tester.py:25-31)

All transforms are lazy and fuse into the scan under Catalyst; none
shuffles. The only actions are in ``try_cast_numeric`` (one aggregate
over cast-failure counts) and ``recode_option_values`` (collect of the
small question-metadata dimension to build map literals).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NOT_SELECTED = "not selected"
NUMERIC_NA = -999

_NUMERIC_TYPES = {
    "double", "float", "int", "bigint", "smallint", "tinyint", "decimal",
}


def _is_numeric(dtype: str) -> bool:
    return dtype.split("(")[0] in _NUMERIC_TYPES


def lowercase_columns(df: DataFrame) -> DataFrame:
    return df.toDF(*[c.lower() for c in df.columns])


def drop_time_cols(df: DataFrame) -> DataFrame:
    """Drop per-question timing columns ('_time' in name); lowercase names."""
    keep = [c for c in df.columns if "_time" not in c]
    return lowercase_columns(df.select(*keep))


def fill_na_policy(df: DataFrame) -> DataFrame:
    """Sentinel NA policy: string -> 'not selected', numeric -> -999.

    Parity note: the reference applies the numeric -999 fill to weight
    columns too (utils.py:53-58 runs inside remove_time_cols before any
    weighting), so missing weights distort weighted modes/sums there and
    here identically. Resolve the weight column from data with NAs
    intact, or pre-filter, if that distortion is unwanted.
    """
    string_cols = [c for c, t in df.dtypes if t == "string"]
    numeric_cols = [c for c, t in df.dtypes if _is_numeric(t)]
    out = df
    if string_cols:
        out = out.na.fill(NOT_SELECTED, subset=string_cols)
    if numeric_cols:
        out = out.na.fill(NUMERIC_NA, subset=numeric_cols)
    return out


def drop_cint_weight_cols(df: DataFrame) -> DataFrame:
    """Drop panel-provider ('cint') and qudo_weight columns."""
    keep = [
        c for c in df.columns if "cint" not in c and "qudo_weight" not in c
    ]
    return df.select(*keep)


def inference_excluded_cols(
    columns: list[str], weight_col: str | None = None
) -> list[str]:
    """Columns excluded from inference: weights + segmentation labels.

    'weightgain'/'weightwatch' are decoy names that stay in
    (chisquared_tester.py:179-186).
    """
    exception_keywords = ("weightgain", "weightwatch")
    excluded = [weight_col] if weight_col else []
    excluded += [c for c in columns if "segmentation" in c.lower()]
    excluded += [
        c
        for c in columns
        if "weight" in c.lower() and not any(k in c for k in exception_keywords)
    ]
    return list(dict.fromkeys(excluded))


def add_tgt_tag(columns: list[str]) -> list[str]:
    """Platform-targetable columns (_fb/_gg) get a _tgt suffix."""
    return [
        c + "_tgt"
        if ("_fb" in c or "_gg" in c) and "_tgt" not in c
        else c
        for c in columns
    ]


def remove_numeric_tag(columns: list[str]) -> list[str]:
    return [c.replace("_numeric", "") for c in columns]


def rename_columns(df: DataFrame, new_names: list[str]) -> DataFrame:
    return df.toDF(*new_names)


def select_columns_by_fragments(
    df: DataFrame, fragments: list[str], exact: bool = False
) -> list[str]:
    """Column names matching any requested fragment (or exact names)."""
    frags = [f.lower() for f in fragments]
    if exact:
        return [c for c in df.columns for f in frags if c == f]
    out: list[str] = []
    for f in frags:
        out.extend([c for c in df.columns if f in c])
    return list(dict.fromkeys(out))


def strip_html(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "<[^<]+?>", "")


def recode_option_values(df: DataFrame, questions: DataFrame) -> DataFrame:
    """Remap stored option codes to display text per mismatched variable.

    The question-metadata dimension is tiny; collect the mismatch rows
    once and apply per-column broadcast map literals — Catalyst folds the
    lookups into the scan projection, no join or shuffle.
    """
    mismatch = (
        questions.filter(F.col("option_text") != F.col("option_value"))
        .select("varname", "option_value", "option_text")
        .dropDuplicates()
        .collect()
    )
    per_col: dict[str, dict[str, str]] = {}
    for row in mismatch:
        per_col.setdefault(row["varname"], {})[row["option_value"]] = row[
            "option_text"
        ]
    out = df
    replacements = {}
    for col, mapping in per_col.items():
        if col not in df.columns:
            continue
        kv = []
        for k, v in mapping.items():
            kv += [F.lit(k), F.lit(v)]
        m = F.create_map(*kv)
        replacements[col] = F.coalesce(m[F.col(col)], F.col(col))
    if replacements:
        out = out.withColumns(replacements)
    return out


def try_cast_numeric(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Best-effort numeric coercion (pandas to_numeric(errors='ignore')).

    A string column becomes double iff every non-null value casts cleanly.
    One aggregate pass computes cast-failure counts for all candidate
    columns simultaneously.
    """
    candidates = [
        c for c, t in df.dtypes if t == "string" and (columns is None or c in columns)
    ]
    if not candidates:
        return df
    fail_counts = df.agg(
        *[
            F.sum(
                F.when(
                    F.col(c).isNotNull()
                    & F.col(c).try_cast("double").isNull(),
                    1,
                ).otherwise(0)
            ).alias(c)
            for c in candidates
        ]
    ).collect()[0]
    castable = [c for c in candidates if fail_counts[c] == 0]
    if not castable:
        return df
    return df.withColumns({c: F.col(c).try_cast("double") for c in castable})


def find_weight_col(
    essential_columns: dict, data_columns: list[str]
) -> str | None:
    """Resolve the weight column from the run-config document (utils.py:6-34)."""
    utility = essential_columns.get("weighting", {}).get("utility", {})
    pre = bool(utility.get("pre_completes"))
    post = bool(utility.get("post_completes"))
    if not pre and not post:
        return None
    weight_col = "weight" if post else "precompletion_weight"
    if weight_col.lower() not in data_columns:
        return None
    return weight_col


def find_conf_interval(essential_columns: dict) -> float:
    try:
        return float(essential_columns["confidence_interval"])
    except (KeyError, TypeError, ValueError):
        return 0.95


def clean_responses(
    df: DataFrame,
    questions: DataFrame | None = None,
    coerce_numeric: bool = False,
) -> DataFrame:
    """The standard load-time cleaning pipeline (main.py:66-80, 94-126):

    drop _time cols -> drop cint/qudo_weight panel columns -> lowercase
    -> NA policy -> option recode [-> numeric coercion] -> _tgt tagging
    of the _fb/_gg targetable columns. The cint drop and the tag rename
    mirror ChiSquaredTester.remove_cint (chisquared_tester.py:139-164)
    and main.py's add_tgt_tag step — without them, panel-provider ID
    columns become clustering features and tgt-dependent business
    metrics (magnitude, signal loss, message reach) silently vanish.
    """
    out = fill_na_policy(drop_cint_weight_cols(drop_time_cols(df)))
    if questions is not None:
        out = recode_option_values(out, questions)
    if coerce_numeric:
        out = try_cast_numeric(out)
    return out.toDF(*add_tgt_tag(out.columns))
