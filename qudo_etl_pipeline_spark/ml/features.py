"""Feature pipeline: dtype sniffing, label encoding, scaling, PCA.

Re-implements the reference's feature prep (reference:
src/kraken/app/clustering.py:101-109,207-291) Spark-first:

- dynamic typing: ``data.apply(pd.to_numeric, errors='ignore')``
  (clustering.py:101) -> one try-cast null-rate pass over every string
  column (SURVEY §1.3).
- whole-table label encode: ``data.apply(LabelEncoder().fit_transform)``
  (clustering.py:103-109) -> sorted-distinct-value codes per column.
  sklearn sorts values (numerics numerically, strings lexicographically),
  so codes are computed per column in sorted order — NOT Spark
  StringIndexer's frequency order.
- StandardScaler (clustering.py:236-257) -> population-std z-score
  (sklearn ddof=0; MLlib StandardScaler would use ddof=1).
- PCA component selection (clustering.py:259-291): smallest n with
  cumulative explained variance >= 0.5.

Scale notes (100 TB design):
- Code maps are built in ONE melt + groupBy pass over the table; the
  per-column dictionaries (answer options — tiny) are collected and
  re-applied as broadcast `F.create_map` literals, so ENCODING ADDS NO
  SHUFFLE to the downstream plan and survives Catalyst pushdown.
- Scaling statistics are a single agg; the transform is pure column
  arithmetic (whole-stage codegen).
- PCA runs on MLlib vectors (distributed covariance/SVD), k<=#features.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qudo_etl_pipeline_spark.plans.melt import melt


def sniff_numeric_columns(df: DataFrame, candidates: list[str] | None = None) -> list[str]:
    """Columns that are numeric or fully castable to double (P10).

    A string column counts as numeric iff casting adds no nulls
    (pd.to_numeric errors='ignore' semantics: all-or-nothing per column).
    One aggregation pass for all candidates.
    """
    numeric = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.NumericType)
        and (candidates is None or f.name in candidates)
    ]
    strings = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.StringType)
        and (candidates is None or f.name in candidates)
    ]
    if not strings:
        return numeric
    aggs = [
        F.sum(
            F.when(
                F.col(c).isNotNull() & F.col(c).try_cast("double").isNull(), 1
            ).otherwise(0)
        ).alias(c)
        for c in strings
    ]
    row = df.agg(*aggs).collect()[0]
    return numeric + [c for c in strings if row[c] == 0]


def build_code_maps(
    df: DataFrame, cols: list[str]
) -> dict[str, dict[str, int]]:
    """Sorted-distinct-value integer codes per column, in ONE pass.

    Mirrors per-column ``LabelEncoder().fit_transform``
    (clustering.py:103): codes follow sorted value order. Columns whose
    every value casts to double sort numerically; others sort as strings.
    """
    long = melt(df.select(cols), id_vars=[], value_vars=cols)
    dist = (
        long.groupBy("variable", "value")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_num", F.col("value").try_cast("double"))
        .collect()
    )
    by_col: dict[str, list] = {c: [] for c in cols}
    all_numeric: dict[str, bool] = {c: True for c in cols}
    for r in dist:
        by_col[r["variable"]].append((r["value"], r["_num"]))
        if r["value"] is not None and r["_num"] is None:
            all_numeric[r["variable"]] = False
    maps: dict[str, dict[str, int]] = {}
    for c in cols:
        vals = [(v, n) for v, n in by_col[c] if v is not None]
        if all_numeric[c]:
            vals.sort(key=lambda t: t[1])
        else:
            vals.sort(key=lambda t: str(t[0]))
        maps[c] = {v: i for i, (v, _) in enumerate(vals)}
    return maps


def label_encode(
    df: DataFrame,
    cols: list[str] | None = None,
    code_maps: dict[str, dict[str, int]] | None = None,
    suffix: str = "",
) -> DataFrame:
    """Apply code maps as broadcast literal lookups (no shuffle, M1).

    Encoded columns are int; unmapped/null values encode to null.
    """
    if cols is None:
        cols = [c for c in df.columns]
    if code_maps is None:
        code_maps = build_code_maps(df, cols)
    out = df
    for c in cols:
        entries = []
        for v, i in code_maps[c].items():
            entries += [F.lit(v), F.lit(i)]
        if entries:
            mapping = F.create_map(*entries)
            out = out.withColumn(
                c + suffix, mapping[F.col(c).cast("string")].cast("int")
            )
        else:
            out = out.withColumn(c + suffix, F.lit(None).cast("int"))
    return out


def standardize(
    df: DataFrame, cols: list[str], stats: dict | None = None
) -> tuple[DataFrame, dict]:
    """Population-std z-score (sklearn StandardScaler parity, M2).

    Constant columns pass through centered (std 0 -> divide by 1,
    sklearn's behavior). Returns (transformed df, fitted stats) so a
    train-fit can be replayed on test data (model-consistency checks).
    """
    if stats is None:
        aggs = []
        for c in cols:
            aggs.append(F.avg(F.col(c).cast("double")).alias(f"m_{c}"))
            aggs.append(F.stddev_pop(F.col(c).cast("double")).alias(f"s_{c}"))
        row = df.agg(*aggs).collect()[0]
        stats = {
            c: (row[f"m_{c}"], row[f"s_{c}"] if row[f"s_{c}"] else 1.0)
            for c in cols
        }
    out = df.select(
        *[
            ((F.col(c).cast("double") - F.lit(stats[c][0])) / F.lit(stats[c][1])).alias(c)
            if c in cols
            else F.col(c)
            for c in df.columns
        ]
    )
    return out, stats


def assemble_array(
    df: DataFrame, cols: list[str], out_col: str = "features"
) -> DataFrame:
    """Pack columns into an array<double> features column."""
    return df.withColumn(
        out_col, F.array(*[F.col(c).cast("double") for c in cols])
    )


def find_n_components(
    df: DataFrame,
    features_col: str = "features",
    var_threshold: float = 0.5,
):
    """Fit full-rank PCA; smallest n with cum. explained variance >=
    threshold (clustering.py:259-274). Returns (ideal_n, fitted model)."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    vdf = df.select(
        array_to_vector(F.col(features_col).cast("array<double>")).alias("_v")
    )
    dim = len(vdf.first()["_v"])
    model = PCA(k=dim, inputCol="_v", outputCol="_pca").fit(vdf)
    cum = 0.0
    ideal_n = dim
    for i, ratio in enumerate(model.explainedVariance):
        cum += ratio
        if cum >= var_threshold:
            ideal_n = i + 1
            break
    return ideal_n, model


def pca_transform(
    df: DataFrame,
    features_col: str = "features",
    n_components: int | None = None,
    var_threshold: float = 0.5,
) -> tuple[DataFrame, int]:
    """Project features onto the first n principal components (M3).

    Output column replaces `features_col` with the array<double>
    projection; other columns pass through.
    """
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vdf = df.withColumn(
        "_v", array_to_vector(F.col(features_col).cast("array<double>"))
    )
    if n_components is None:
        # reuse the full-rank model find_n_components already fitted:
        # PCA components are nested (same ordered eigenvectors), so the
        # first n coordinates of the full projection ARE the
        # n-component projection — a second covariance/SVD job over the
        # data would recompute the identical subspace
        n_components, model = find_n_components(
            df, features_col, var_threshold
        )
        projected = F.slice(
            vector_to_array(F.col("_pca")), 1, n_components
        )
    else:
        model = PCA(k=n_components, inputCol="_v", outputCol="_pca").fit(vdf)
        projected = vector_to_array(F.col("_pca"))
    out = (
        model.transform(vdf)
        .withColumn(features_col, projected)
        .drop("_v", "_pca")
    )
    return out, n_components
