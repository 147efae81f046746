"""Survey weighting: raking (iterative proportional fitting).

Extension scope, domain-fitting: the reference pipeline segments survey
responses and carries design weights (its weighted modes/proportions);
the standard way those weights are PRODUCED is raking — iteratively
scaling respondent weights until the weighted share of every category
matches known population margins (Deming & Stephan 1940; the default
weighting method in survey practice).

Distributed shape: each rake step is one category-sized groupBy (the
weighted count per category of ONE dimension — map-side combinable)
plus a broadcast factor map joined back onto the respondents; an
iteration visits each dimension once. iters × dims steps total, each
one shuffle of category cardinality — row count never re-shuffles.
Lineage is truncated per iteration (localCheckpoint, the PageRank
device) so plans stay flat.

Cross-engine determinism: weights are pinned to 9-decimal doubles
(ref_round) after every multiplicative update, so per-category sums
are DECIMAL-exact, the scale factors are fixed IEEE trees over exact
sums, and the whole fit replays bit-identically in any engine — the
DuckDB oracle unrolls the same steps as a CTE chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rake_weights", "rake_summary", "kish_neff"]


def _w_sum(col: str = "w") -> F.Column:
    return F.sum(F.col(col).cast("decimal(28,9)")).cast("double")


def rake_weights(
    df: DataFrame,
    dims: dict[str, dict[str, float]],
    iters: int = 3,
    weight_col: str = "w",
    max_cells: int = 200_000,
) -> DataFrame:
    """Rake ``df`` so each dimension's weighted category shares match
    ``dims[dim][category]`` targets (shares per dim should sum to 1;
    every category value must appear in the mapping). Returns the
    input columns plus the fitted 9-decimal weight ``w``.

    Weights start at 1 (or ``weight_col`` if present, pre-rounded).

    100 TB shape: weights are constant within each (category-tuple,
    starting-weight) CELL by construction, so the fit runs on the cell
    CONTRACTION — one map-side-combinable groupBy collapses the input
    to at most Π|categories| × |distinct start weights| cells, the
    IPF loop runs on the driver over that schema-bound table (the
    iterative-operator exception, like the k collected KMeans
    centroids), and ONE broadcast join maps the fitted cell weights
    back onto the rows. The row table is scanned twice total (cell
    count + final join) instead of iters × dims aggregate passes plus
    per-iteration checkpoint I/O of the full frame.

    Bit-exactness: the row-level loop's per-category sums were
    DECIMAL(28,9)-exact over 9-dp fixed-point weights, so the cell
    sum Σ n·w (integer nano arithmetic here) is the SAME exact
    rational, the factors are the same IEEE trees over the same exact
    sums, and every fitted weight is bit-identical to the old
    iters × dims join chain — the unrolled-CTE oracle needs no change.
    NULL-category rows drop at their dimension's factor join exactly as
    before (the oracle's USING join mirrors it); categories missing
    from the target mapping keep their rows with a NULL weight.

    Above ``max_cells`` distinct cells (continuous starting weights —
    not a raking use case) the row-level loop runs unchanged.
    """
    from qudo_etl_pipeline_spark.functions.rounding import fp_round

    dim_cols = list(dims)
    has_w = weight_col in df.columns
    w0 = fp_round(F.col(weight_col), 9) if has_w else F.lit(1.0)
    wcol = "_w0"
    while wcol in df.columns or wcol in dim_cols:  # external names
        wcol += "_"
    base = df.withColumn(wcol, w0.cast("double"))
    key = [*dim_cols, wcol]
    cells = base.groupBy(*key).agg(F.count(F.lit(1)).alias("_n"))
    cell_rows = cells.limit(max_cells + 1).collect()
    if len(cell_rows) > max_cells:
        return _rake_weights_rows(df, dims, iters, weight_col)

    fitted = _ipf_cells(cell_rows, dims, iters, dim_cols, wcol)

    spark = df.sparkSession
    from pyspark.sql import types as T

    schema = T.StructType(
        [cells.schema[c] for c in key]
        + [T.StructField("_w_fit", T.DoubleType(), True)]
    )
    fin = spark.createDataFrame(fitted, schema)
    joined = base.join(F.broadcast(fin), on=key)
    out = []
    for c in df.columns:
        if c == "w":  # the fitted weight replaces an existing w in place
            out.append(F.col("_w_fit").alias("w"))
        else:
            out.append(F.col(c))
    if "w" not in df.columns:
        out.append(F.col("_w_fit").alias("w"))
    return joined.select(*out)


def _ipf_cells(cell_rows, dims, iters, dim_cols, wcol):
    """Driver-side IPF over the collected cell table — every float op
    mirrors the row-level loop's IEEE tree exactly (fp_round =
    floor(x·1e9 + 0.5)/1e9; per-category sums in integer nanos,
    converted to double through a scale-9 Decimal, the same single
    rounding as CAST(SUM(DECIMAL(28,9)) AS DOUBLE))."""
    import math
    from decimal import Decimal

    def nanos(x: float) -> int:
        return math.floor(x * 1e9 + 0.5)

    state = []
    for r in cell_rows:
        w = float(r[wcol])
        state.append(
            {
                "key": tuple(r[c] for c in dim_cols),
                "w0": r[wcol],
                "n": r["_n"],
                "w": w,
                "k": nanos(w),
            }
        )
    active = state
    for _ in range(iters):
        for di, (dim, targets) in enumerate(dims.items()):
            # NULL category: the factor equi-join drops these rows in
            # the row-level loop (and the oracle's USING join) — drop
            # the cell from this step on
            active = [s for s in active if s["key"][di] is not None]
            swc: dict = {}
            st = 0
            for s in active:
                if s["w"] is None:
                    continue  # NULL weights are skipped by SUM
                nk = s["n"] * s["k"]
                swc[s["key"][di]] = swc.get(s["key"][di], 0) + nk
                st += nk
            wt = float(Decimal(st).scaleb(-9))
            tmap = {v: float(sh) for v, sh in targets.items()}
            # string-keyed fallback mirrors the when-chain's implicit
            # numeric/string coercion for non-string dimension columns
            tmap_str = {str(v): float(sh) for v, sh in targets.items()}
            for s in active:
                if s["w"] is None:
                    continue  # fp_round(NULL * f) stays NULL
                cat = s["key"][di]
                t = tmap.get(cat)
                if t is None:
                    t = tmap_str.get(str(cat))
                if t is None:  # unmapped category: weight becomes NULL
                    s["w"] = None
                    s["k"] = None
                    continue
                wc = float(Decimal(swc[s["key"][di]]).scaleb(-9))
                f = t * wt / wc
                k = nanos(s["w"] * f)
                s["w"] = float(k) / 1e9
                s["k"] = k
    return [(*s["key"], s["w0"], s["w"]) for s in active]


def _rake_weights_rows(
    df: DataFrame,
    dims: dict[str, dict[str, float]],
    iters: int,
    weight_col: str,
) -> DataFrame:
    """The row-level IPF join chain — the fallback when the cell
    contraction would not contract (more distinct (category-tuple,
    start-weight) cells than ``max_cells``). Semantics identical to
    :func:`rake_weights` by construction (the contraction was derived
    from this loop)."""
    from qudo_etl_pipeline_spark.functions.rounding import fp_round

    if weight_col in df.columns:
        cur = df.withColumn("w", fp_round(F.col(weight_col), 9))
    else:
        cur = df.withColumn("w", F.lit(1.0))
    for _ in range(iters):
        for dim, targets in dims.items():
            sums = cur.groupBy(dim).agg(_w_sum().alias("_wc"))
            tot = cur.agg(_w_sum().alias("_wt"))
            target_expr = F.lit(None).cast("double")
            for val, share in sorted(targets.items()):
                target_expr = F.when(
                    F.col(dim) == val, F.lit(float(share))
                ).otherwise(target_expr)
            factors = sums.crossJoin(F.broadcast(tot)).select(
                dim,
                (
                    target_expr * F.col("_wt") / F.col("_wc")
                ).alias("_f"),
            )
            cur = cur.join(F.broadcast(factors), dim).withColumn(
                "w", fp_round(F.col("w") * F.col("_f"), 9)
            ).drop("_f")
        cur = cur.localCheckpoint()
    return cur


def rake_summary(
    raked: DataFrame, dims: dict[str, dict[str, float]]
) -> DataFrame:
    """Per (dimension, category): weighted share achieved by the fit vs
    the target, plus counts — the convergence evidence a weighting
    report shows. Output cardinality = total category count."""
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    outs = []
    for dim, targets in dims.items():
        sums = raked.groupBy(
            F.lit(dim).alias("dim"),
            F.col(dim).cast("string").alias("category"),
        ).agg(
            F.count(F.lit(1)).alias("n"),
            _w_sum().alias("_wc"),
        )
        tot = raked.agg(_w_sum().alias("_wt"))
        target_expr = F.lit(None).cast("double")
        for val, share in sorted(targets.items()):
            target_expr = F.when(
                F.col("category") == str(val), F.lit(float(share))
            ).otherwise(target_expr)
        outs.append(
            sums.crossJoin(F.broadcast(tot)).select(
                "dim",
                "category",
                "n",
                ref_round(F.col("_wc") / F.col("_wt"), 6).alias(
                    "share6"
                ),
                ref_round(target_expr, 6).alias("target6"),
            )
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    return u


def kish_neff(
    df: DataFrame,
    weight_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Kish effective sample size and design effect — the diagnostic
    every weighting report pairs with raked weights: n_eff =
    (sum w)^2 / sum w^2, deff = n / n_eff. A deff of 1 means weighting
    cost no precision; 2 means the weighted sample carries the
    information of half its rows.

    ONE map-side-combinable aggregate per group; both moments
    accumulate in DECIMAL (exact for fixed-point weights), the ratios
    are fixed IEEE trees. NULL/non-positive weights are excluded.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    gcols = group_cols or []
    w = F.col(weight_col)
    src = df.filter(w.isNotNull() & (w > 0))
    agg = src.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(w.cast("decimal(27,6)")).cast("double").alias("_sw"),
        F.sum(
            (w.cast("decimal(18,6)") * w.cast("decimal(18,6)")).cast(
                "decimal(38,12)"
            )
        )
        .cast("double")
        .alias("_sw2"),
    )
    neff = F.col("_sw") * F.col("_sw") / F.col("_sw2")
    deff = F.col("n").cast("double") / neff
    return agg.select(
        *gcols,
        "n",
        ref_round(neff, 6).alias("n_eff6"),
        ref_round(deff, 6).alias("deff6"),
    )
