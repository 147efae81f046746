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
# group-key sentinel for the whole-sample totals cell that rides the
# melt shuffle next to the question cells (cannot collide with data:
# question shortnames are guarded at the operator boundary)
_TOTALS_KEY = "\x00__totals__"


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
    # Totals (whole-sample row count + weight sum) ride the SAME melt
    # shuffle as the cells: every row emits one sentinel struct next to
    # its question structs, so the input is scanned ONCE — the old
    # separate df.agg() totals branch cost a second full pass over the
    # input. The sentinel cell accumulates exactly like the old global
    # aggregate (per-partition partials merged once), and
    # ref_round == the reference's Python round(weights.sum(), 2)
    # (chisquared_tester.py:757) — HALF_EVEN on the true binary value.
    if _TOTALS_KEY in question_cols:
        raise ValueError(
            f"question shortname {_TOTALS_KEY!r} collides with the "
            "internal totals sentinel"
        )

    # pandas groupby drops NaN GROUP KEYS — null-cluster rows emit NO
    # question cells, matching the reference's groupby(cluster_col)
    # semantics (round-3 ADVICE class). They DO emit the sentinel:
    # totals cover the whole sample, labeled or not.
    labeled = F.col(cluster_col).isNotNull()

    q_structs = [
        F.struct(
            F.lit(_TOTALS_KEY).alias("shortname"),
            F.array(F.lit(None).cast("string")).alias("vals"),
        )
    ]
    n_present = 0
    for shortname, cols in question_cols.items():
        present = [c for c in cols if c in df.columns]
        if not present:
            continue
        n_present += 1
        q_structs.append(
            F.struct(
                F.lit(shortname).alias("shortname"),
                F.when(labeled, _row_values(present))
                .otherwise(F.array())
                .alias("vals"),
            )
        )
    if n_present == 0:
        raise ValueError("no question columns present in the data")

    long = (
        df.select(
            F.col(cluster_col).alias("cluster"),
            w.alias("_w"),
            F.explode(F.array(*q_structs)).alias("q"),
        )
        .select(
            # sentinel rows collapse to ONE group key regardless of the
            # row's cluster — (sentinel, NULL, NULL)
            F.when(
                F.col("q.shortname") == _TOTALS_KEY, F.lit(None)
            )
            .otherwise(F.col("cluster"))
            .alias("cluster"),
            "_w",
            F.col("q.shortname").alias("shortname"),
            F.explode("q.vals").alias("value"),
        )
    )

    # The cell table (schema-bound: |questions| x |clusters| x |answers|
    # + the sentinel) feeds BOTH the mode argmax and the totals row;
    # without the registry cache the sentinel filters would push below
    # the aggregate into two separate scans of the input.
    from qudo_etl_pipeline_spark.operators.prefix import (
        acquire_operator_cache,
    )

    cells = acquire_operator_cache(
        long.groupBy("shortname", "cluster", "value").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_w").alias("wn"),
        )
    )
    totals = cells.filter(F.col("shortname") == _TOTALS_KEY).select(
        F.col("n").cast("double").alias("_n_tot"),
        (
            ref_round(F.col("wn"), 2)
            if weight_col
            else F.col("n").cast("double")
        ).alias("_w_tot"),
    )
    counts = cells.filter(F.col("shortname") != _TOTALS_KEY)
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
