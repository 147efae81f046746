"""Contingency/inference catalog entries (SURVEY §2.4, §2.7 M21-M26).

The survey-shaped input is synthesized from TPC-H tables: cluster =
c_mktsegment, variables = nation name + an account-balance bucket. The
DuckDB oracles re-derive the full melt -> densified crosstab -> totals ->
chi-squared pipeline in SQL so every arithmetic step of the Spark engine
is value-checked. (p-values come from the engine's own chi2_sf and are
covered by closed-form unit tests; the SQL oracles check stat/dof/
residuals, which determine them.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.catalog import load_table, register
from qudo_etl_pipeline_spark.operators.contingency import (
    _dense_grid,
    chi2_by_variable,
    contingency_tables,
    deliver_stats,
)

# Shared CTE prefix: the melted customer table and its crosstab cells.
_MELT_CTE = """
    WITH wide AS (
      SELECT c_custkey AS id, c_mktsegment AS cluster,
             n_name AS q_nation,
             CASE WHEN c_acctbal < 0 THEN 'negative'
                  WHEN c_acctbal < 5000 THEN 'low'
                  ELSE 'high' END AS q_balance
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ), long AS (
      SELECT id, cluster, 'q_nation' AS variable, q_nation AS value FROM wide
      UNION ALL
      SELECT id, cluster, 'q_balance' AS variable, q_balance AS value FROM wide
    ), cells AS (
      SELECT variable, cluster, value, COUNT(*) AS observed
      FROM long GROUP BY variable, cluster, value
    ), grid AS (
      SELECT vv.variable, vv.value, vc.cluster
      FROM (SELECT DISTINCT variable, value FROM cells) vv
      JOIN (SELECT DISTINCT variable, cluster FROM cells) vc USING (variable)
    ), dense AS (
      SELECT g.variable, g.cluster, g.value, COALESCE(c.observed, 0) AS observed
      FROM grid g LEFT JOIN cells c
        ON g.variable = c.variable AND g.cluster = c.cluster AND g.value = c.value
    ), tot AS (
      SELECT *,
             SUM(observed) OVER (PARTITION BY variable, value) AS row_tot,
             SUM(observed) OVER (PARTITION BY variable, cluster) AS col_tot,
             SUM(observed) OVER (PARTITION BY variable) AS n
      FROM dense
    )
"""


def _survey_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_mktsegment").alias("cluster"),
            F.col("n_name").alias("q_nation"),
            F.when(F.col("c_acctbal") < 0, "negative")
            .when(F.col("c_acctbal") < 5000, "low")
            .otherwise("high")
            .alias("q_balance"),
        )
    )


@register(
    "contingency_cells",
    oracle=_MELT_CTE + """
    SELECT variable, cluster, value, CAST(observed AS BIGINT) AS observed
    FROM dense
    """,
    survey_ids=["A1", "R2"],
    description="All crosstab cells from one melt+aggregate (densified grid)",
)
def contingency_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = contingency_tables(_survey_wide(spark, sf_dir), "cluster", id_vars=["id"])
    return _dense_grid(t.cells, "cluster").select(
        "variable", "cluster", "value", F.col("observed").cast("bigint").alias("observed")
    )


@register(
    "chi2_stat_by_variable",
    oracle=_MELT_CTE + """
    , pervar AS (
      SELECT variable,
             SUM(POW(observed - row_tot * col_tot * 1.0 / n, 2) /
                 (row_tot * col_tot * 1.0 / n)) AS stat_plain,
             SUM(POW(GREATEST(ABS(observed - row_tot * col_tot * 1.0 / n) - 0.5, 0), 2) /
                 (row_tot * col_tot * 1.0 / n)) AS stat_yates,
             MIN(observed) AS min_observed,
             COUNT(DISTINCT value) AS n_values,
             COUNT(DISTINCT cluster) AS n_clusters
      FROM tot GROUP BY variable
    )
    SELECT variable,
           ROUND(CASE WHEN (n_values - 1) * (n_clusters - 1) = 1 AND min_observed <= 5
                      THEN stat_yates ELSE stat_plain END, 6) AS chi2_stat,
           CAST((n_values - 1) * (n_clusters - 1) AS BIGINT) AS dof,
           CAST(n_values AS BIGINT) AS n_values,
           CAST(n_clusters AS BIGINT) AS n_clusters,
           CAST(CASE WHEN min_observed <= 5 THEN 1 ELSE 0 END AS BIGINT) AS yates
    FROM pervar
    """,
    survey_ids=["M21", "A3", "A11"],
    description="Vectorized chi-squared statistic for every variable at once",
)
def chi2_stat_by_variable(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = contingency_tables(_survey_wide(spark, sf_dir), "cluster", id_vars=["id"])
    return chi2_by_variable(t).select(
        "variable",
        F.round("chi2_stat", 6).alias("chi2_stat"),
        F.col("dof").cast("bigint").alias("dof"),
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("n_clusters").cast("bigint").alias("n_clusters"),
        F.when(F.col("yates"), 1).otherwise(0).cast("bigint").alias("yates"),
    )


@register(
    "adjusted_residuals",
    oracle=_MELT_CTE + """
    SELECT variable, cluster, value,
           CAST(observed AS BIGINT) AS observed,
           ROUND(row_tot * col_tot * 1.0 / n, 6) AS expected,
           ROUND((observed - row_tot * col_tot * 1.0 / n) /
                 SQRT((row_tot * col_tot * 1.0 / n) *
                      (1 - row_tot * 1.0 / n) * (1 - col_tot * 1.0 / n)), 3)
             AS adj_residual,
           CAST(CASE WHEN observed > row_tot * col_tot * 1.0 / n
                     THEN 1 ELSE 0 END AS BIGINT) AS direction_pos
    FROM tot
    """,
    survey_ids=["M22", "M23", "A3"],
    description="Expected frequencies + adjusted residuals + direction per cell",
)
def adjusted_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = contingency_tables(_survey_wide(spark, sf_dir), "cluster", id_vars=["id"])
    dense = _dense_grid(t.cells, "cluster")
    w_row = Window.partitionBy("variable", "value")
    w_col = Window.partitionBy("variable", "cluster")
    w_var = Window.partitionBy("variable")
    dense = (
        dense.withColumn("row_tot", F.sum("observed").over(w_row))
        .withColumn("col_tot", F.sum("observed").over(w_col))
        .withColumn("n", F.sum("observed").over(w_var))
        .withColumn("expected", F.col("row_tot") * F.col("col_tot") * 1.0 / F.col("n"))
    )
    return dense.select(
        "variable",
        "cluster",
        "value",
        F.col("observed").cast("bigint").alias("observed"),
        F.round("expected", 6).alias("expected"),
        F.round(
            (F.col("observed") - F.col("expected"))
            / F.sqrt(
                F.col("expected")
                * (1 - F.col("row_tot") * 1.0 / F.col("n"))
                * (1 - F.col("col_tot") * 1.0 / F.col("n"))
            ),
            3,
        ).alias("adj_residual"),
        F.when(F.col("observed") > F.col("expected"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("direction_pos"),
    )


@register(
    "deliver_stats_planted",
    oracle=None,  # p-values + array columns: engine-native output, rows-only check
    survey_ids=["M24", "M25", "M26", "A6", "A12", "W3"],
    description="Full deliver-stats inference on a planted-dependence table",
)
def deliver_stats_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wide = o.select(
        F.col("o_orderkey").alias("id"),
        F.when(F.col("o_totalprice") < 100000, "budget")
        .when(F.col("o_totalprice") < 250000, "mid")
        .otherwise("premium")
        .alias("cluster"),
        F.when(F.col("o_totalprice") < 150000, "under150k")
        .otherwise("over150k")
        .alias("q_band"),
        F.col("o_orderpriority").alias("q_priority"),
        F.col("o_orderstatus").alias("q_status"),
    )
    t = contingency_tables(wide, "cluster", id_vars=["id"])
    d = deliver_stats(t)
    # stringify arrays for a stable driver-side representation
    return d.select(
        "q_code",
        "pop_mode",
        F.round("response_rate", 6).alias("response_rate"),
        "mode_pop_perc",
        "chi_2_result",
        F.concat_ws("|", "sig_more_category").alias("sig_more_category"),
        F.concat_ws(
            "|", F.transform("category_percentages", lambda x: x.cast("string"))
        ).alias("category_percentages"),
        "targeting_seg",
        "chi2_stat",
    )
