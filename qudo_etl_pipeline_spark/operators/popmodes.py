"""Population modes: per-(cluster, question) multi-select answer modes.

Re-implements ``flag_not_selected`` / ``find_population_modes``
(reference: src/kraken/app/inference/chisquared_tester.py:695-838, M27):
a "question" spans several one-hot/multi-select sub-columns; per row the
distinct answers across the sub-columns are collected (W4), 'not
selected' is stripped UNLESS it is the only answer, rows explode to
(cluster, answer) pairs (R2), and per (cluster, question) the weighted
and unweighted modal answer and its share of the WHOLE sample are
reported (A5/A6), rounded to 2.

One LINEAR plan computes every (question x cluster) simultaneously: a
single scan builds an array of (question, answers) structs per row and
explodes twice (map-only — no per-question re-scan, no union), ONE
groupBy(question, cluster, value) aggregation counts the cells, and a
second tiny aggregation picks both modes as min-over-struct argmaxes
(no windows, no self-join of ranked branches). Ties resolve to the
lexicographically smallest value (pandas groupby-sum index order +
idxmax first-occurrence semantics).

Scale notes: the exploded frame is narrow (4 columns); the single
full-data shuffle's output is |questions| x |clusters| x |answers| —
independent of row count. The parquet cache round-trip (S6/S4) lives in
sources/io.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.functions.rounding import ref_round

NOT_SELECTED = "not selected"


def _row_values(cols: list[str]):
    """Distinct non-null answers across the question's sub-columns;
    'not selected' stripped unless it is the only distinct answer
    (chisquared_tester.py:745-752)."""
    arr = F.array_distinct(
        F.filter(
            F.array(*[F.col(c).cast("string") for c in cols]),
            lambda x: x.isNotNull(),
        )
    )
    return F.when(
        (F.size(arr) == 1) & (arr[0] == NOT_SELECTED), arr
    ).otherwise(F.array_remove(arr, NOT_SELECTED))


def population_modes(
    df: DataFrame,
    question_cols: dict[str, list[str]],
    cluster_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """All (question, cluster) weighted + unweighted modes in one plan.

    Output: cluster, shortname, weighted_mode, weighted_mode_prop,
    unweighted_mode, unweighted_mode_prop (props = share of the WHOLE
    sample, rounded 2 — chisquared_tester.py:760-771).
    """
    # null weights count as 0 (same total as sum's null-skip) so group
    # weighted counts are never NULL — a NULL struct field would sort
    # FIRST under the min-over-struct argmax and steal the mode
    w = (
        F.coalesce(F.col(weight_col).cast("double"), F.lit(0.0))
        if weight_col
        else F.lit(1.0)
    )
    # Totals ride the plan as a 1-row broadcast (no eager collect: the
    # old driver-side .collect() ran a full-data aggregate at PLAN-BUILD
    # time — a whole extra input scan before the real job started).
    # ref_round == the reference's Python round(weights.sum(), 2)
    # (chisquared_tester.py:757) — HALF_EVEN on the true binary value.
    totals = df.agg(
        F.count(F.lit(1)).cast("double").alias("_n_tot"),
        (
            ref_round(F.sum(w), 2)
            if weight_col
            else F.count(F.lit(1)).cast("double")
        ).alias("_w_tot"),
    )

    # pandas groupby drops NaN GROUP KEYS — filter null clusters up
    # front so unlabeled rows match the reference's groupby(cluster_col)
    # semantics (same fix as cluster_mode_list; round-3 ADVICE class)
    df = df.filter(F.col(cluster_col).isNotNull())

    q_structs = []
    for shortname, cols in question_cols.items():
        present = [c for c in cols if c in df.columns]
        if not present:
            continue
        q_structs.append(
            F.struct(
                F.lit(shortname).alias("shortname"),
                _row_values(present).alias("vals"),
            )
        )
    if not q_structs:
        raise ValueError("no question columns present in the data")

    long = (
        df.select(
            F.col(cluster_col).alias("cluster"),
            w.alias("_w"),
            F.explode(F.array(*q_structs)).alias("q"),
        )
        .select(
            "cluster",
            "_w",
            F.col("q.shortname").alias("shortname"),
            F.explode("q.vals").alias("value"),
        )
    )

    counts = long.groupBy("shortname", "cluster", "value").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_w").alias("wn"),
    )
    # Both modes from ONE aggregation: min over (-count, value) orders by
    # descending count then ascending value — identical tie semantics to
    # the reference's idxmax-first-occurrence.
    modes = counts.groupBy("shortname", "cluster").agg(
        F.min(
            F.struct(
                (-F.col("wn")).alias("k"),
                F.col("value").alias("v"),
                F.col("wn").alias("m"),
            )
        ).alias("_wm"),
        F.min(
            F.struct(
                (-F.col("n")).alias("k"),
                F.col("value").alias("v"),
                F.col("n").alias("m"),
            )
        ).alias("_um"),
    )
    # ref_round = Python-round parity (chisquared_tester.py:764,769) —
    # HALF_EVEN on the true binary value, NOT F.round's HALF_UP
    # try_divide: an all-NULL weight column gives _w_tot = 0 — plain
    # ANSI division would crash the job where the pandas reference
    # yields NaN proportions (NULL is the Spark-native spelling)
    return modes.crossJoin(F.broadcast(totals)).select(
        "cluster",
        "shortname",
        F.col("_wm.v").alias("weighted_mode"),
        ref_round(
            F.try_divide(F.col("_wm.m"), F.col("_w_tot")), 2
        ).alias("weighted_mode_prop"),
        F.col("_um.v").alias("unweighted_mode"),
        ref_round(
            F.try_divide(F.col("_um.m"), F.col("_n_tot")), 2
        ).alias("unweighted_mode_prop"),
    )
