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
) -> DataFrame:
    """Rake ``df`` so each dimension's weighted category shares match
    ``dims[dim][category]`` targets (shares per dim should sum to 1;
    every category value must appear in the mapping). Returns the
    input columns plus the fitted 9-decimal weight ``w``.

    Weights start at 1 (or ``weight_col`` if present, pre-rounded).

    Cost note for corpus-scale reweighting: each sweep runs small keyed
    aggregates plus broadcast factor joins (the big side is never
    re-shuffled), but the per-sweep ``localCheckpoint`` MATERIALIZES
    the full frame on executor storage to truncate the growing lineage
    — iters × table-size of checkpoint I/O. Sized for survey frames
    (the reference's use case); to rake a 100 TB corpus, rake a
    (category-tuple, count) CONTRACTION instead — weights are constant
    within each category cell by construction, so the fit is identical
    and the checkpoint is cell-count-sized.
    """
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
