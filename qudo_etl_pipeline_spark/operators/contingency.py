"""Contingency-table / chi-squared inference core.

Re-implements the reference's ``ChiSquaredTester`` engine
(reference: src/kraken/app/inference/chisquared_tester.py) as a
single-shuffle Spark plan. The reference loops
``clusters x variables`` times over the full pandas table, computing one
``pd.crosstab`` per pair (chisquared_tester.py:1434-1589). Here the wide
table is melted once (plans/melt.py) and ONE
``groupBy(variable, cluster, value).count()`` produces every crosstab cell
simultaneously; all remaining statistics are arithmetic over that
aggregated (small) cell table — windows, joins and one Arrow-batched
pandas UDF for the chi-squared survival function.

Scale notes (100 TB design):
- The only full-data shuffle is the cell aggregation, with map-side
  partial aggregation; its output cardinality is
  |variables| x |categories| x |clusters| — millions at worst, independent
  of row count.
- Everything downstream operates on that aggregated table; window
  functions partition by ``variable`` (high cardinality, no skew pile-up).
- No collect() on the big table; cluster sizes are a second map-side
  combined aggregate over the same scan (Catalyst reuses the exchange
  where possible).

Semantics replicated from the reference (file:line cites):
- "Not shown" rows excluded from crosstabs        (chisquared_tester.py:229-236)
- Yates correction requested iff any cell <= 5    (chisquared_tester.py:244-256)
  and (scipy semantics) applied iff dof == 1, clamped at |O-E|
- degenerate tables -> p = 1.0                    (chisquared_tester.py:376-377)
- adjusted residual rounded to 3 decimals         (chisquared_tester.py:475)
- cell significant iff |z| >= 1.96 AND
  chi2_sf(z^2, 1) <= alpha / (r*c)  [Bonferroni]  (chisquared_tester.py:544-552)
- deliver stats: p rounded to 5, percentages to 2 (chisquared_tester.py:1546-1560)
- 'not selected' stripped from significant-category lists and empty rows
  dropped                                         (chisquared_tester.py:1653-1662)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.functions.rounding import ref_round, ref_round_expr
from qudo_etl_pipeline_spark.functions.stats import chi2_sf_col, z_threshold_table
from qudo_etl_pipeline_spark.plans.melt import melt

NOT_SHOWN = "Not shown"
NOT_SELECTED = "not selected"


@dataclass
class ContingencyTables:
    """Aggregated crosstab state shared by every downstream statistic.

    ``cells``  — one row per (variable, cluster, value) with ``observed``
                 count and ``w_observed`` weighted count, *including*
                 sentinel values (callers filter as needed).
    ``cluster_sizes`` — one row per cluster: ``cluster_n`` rows,
                 ``cluster_w`` total weight.
    ``n_rows`` — total row count of the input table (lazy: the first
                 access runs the cluster-size aggregate, which also
                 materializes the cell cache — construction itself
                 launches NO job, so building the plan stays free).
    ``_cached`` — the cached frame behind ``cells``/``cluster_sizes``;
                 call :meth:`unpersist` when inference is done (long-lived
                 drivers run many schemes x algorithms — pipeline.py).
    """

    cells: DataFrame
    cluster_sizes: DataFrame
    cluster_col: str
    weighted: bool
    _cached: DataFrame | None = None
    _n_rows: int | None = None
    # derived cached frames (dense grid) — registered lazily so repeated
    # post-hoc calls share one entry and unpersist() releases everything
    _derived: dict = field(default_factory=dict)

    def dense_with_expected(self) -> DataFrame:
        """The dense (value x cluster) grid with expected frequencies,
        cached: it is the shared input of BOTH branches of
        :func:`post_hoc_cells` (the per-variable aggregate and the
        per-cell residuals), and without a cache the grid+windows
        subtree is compiled and executed once per consuming branch.
        Cardinality is the cell table's (schema-bound, row-count
        independent), so the cache is tiny at any scale."""
        if "dense" not in self._derived:
            self._derived["dense"] = _dense_with_expected(
                self.cells, self.cluster_col
            ).cache()
        return self._derived["dense"]

    @property
    def n_rows(self) -> int:
        if self._n_rows is None:
            self._n_rows = int(
                self.cluster_sizes.agg(F.sum("cluster_n")).collect()[0][0]
            )
        return self._n_rows

    def unpersist(self) -> None:
        if self._cached is not None:
            self._cached.unpersist()
        for df in self._derived.values():
            df.unpersist()
        self._derived.clear()


def detect_cell_skew(
    long: DataFrame,
    keys: list[str],
    sample_frac: float = 0.05,
    hot_share: float = 0.3,
    seed: int = 7,
) -> bool:
    """Sampled probe: does one cell key hold >= ``hot_share`` of rows?

    One cheap job over a ``sample_frac`` sample of the melted frame —
    the decision input for salting the cell aggregation. A single
    dominant (variable, cluster, value) key (e.g. a sentinel answer in
    one big cluster) concentrates on one reducer; everything else is
    absorbed by map-side partial aggregation and AQE.
    """
    top = (
        long.sample(fraction=sample_frac, seed=seed)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"), F.sum("n").alias("tot"))
        .collect()[0]
    )
    if not top["tot"]:
        return False
    return top["mx"] / top["tot"] >= hot_share


def contingency_tables(
    wide: DataFrame,
    cluster_col: str,
    variables: list[str] | None = None,
    weight_col: str | None = None,
    id_vars: list[str] | None = None,
    salt_cells: bool | str = False,
    n_salts: int = 8,
) -> ContingencyTables:
    """Melt ``wide`` and aggregate every crosstab cell in one shuffle.

    ``salt_cells``: False (default) uses the plain one-shuffle hash
    aggregation — map-side partial aggregation already bounds per-key
    reduce input by the task count, which covers ordinary hot keys.
    True forces the two-phase salted aggregation (plans/skew.py) for
    inputs known to concentrate on single cells; ``"auto"`` runs
    :func:`detect_cell_skew` (ONE sampled job at build time — only this
    mode gives up the construction-launches-no-job property) and salts
    iff the probe fires.
    """
    if variables is None:
        excluded = {cluster_col, weight_col, *(id_vars or [])}
        variables = [c for c in wide.columns if c not in excluded]

    keep = [cluster_col] + ([weight_col] if weight_col else [])
    # A constant pseudo-variable rides the melt so per-cluster row counts
    # fall out of the SAME aggregation — cluster sizes must count every
    # row (answered or not), which no real variable's cells can provide,
    # and a separate groupBy over `wide` would be a second full-data scan.
    row_marker = "__rows__"
    while row_marker in variables:  # survey columns are externally named
        row_marker += "_"
    long = melt(
        wide.select(*keep, *variables, F.lit("1").alias(row_marker)),
        id_vars=keep,
        value_vars=variables + [row_marker],
    )

    # null weights count as 0 (same as sum's null-skip) so w_observed is
    # never NULL — the weighted-mode argmax sorts on a struct of it, and
    # a NULL field would sort first instead of last
    w = (
        F.coalesce(F.col(weight_col).cast("double"), F.lit(0.0))
        if weight_col
        else F.lit(1.0)
    )
    # THE one big-data shuffle (and the only pass over the input). The
    # result is tiny (|vars| x |values| x |clusters|), so cache it: every
    # downstream statistic (chi2, post-hoc, modes, denominators, cluster
    # sizes) re-reads it instead of re-scanning the input.
    # Lay the cached cells out hash-partitioned by `variable`: every
    # downstream window, groupBy and join keys on `variable` (or a
    # superset, which a hash layout on the subset satisfies), so they all
    # reuse this one layout instead of re-exchanging the tiny table across
    # `shuffle.partitions` mostly-empty tasks. The repartition carries no
    # explicit partition count, so AQE right-sizes it from the measured
    # cell-table size (session enables cached-plan output repartitioning).
    keys = ["variable", cluster_col, "value"]
    nn = long.filter(F.col("value").isNotNull()).withColumn("_w", w)
    if salt_cells == "auto":
        salt_cells = detect_cell_skew(nn, keys)
    if salt_cells:
        from qudo_etl_pipeline_spark.plans.skew import salted_aggregate

        # two-phase (keys, salt) aggregation: the hot cell fans out over
        # n_salts reducers; _w is never NULL (coalesced above), so
        # count(_w) == count(*)
        cells_agg = salted_aggregate(
            nn,
            keys,
            {"observed": ("_w", "count"), "w_observed": ("_w", "sum")},
            n_salts=n_salts,
        )
    else:
        cells_agg = nn.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("observed"),
            F.sum("_w").alias("w_observed"),
        )
    all_cells = cells_agg.repartition("variable").cache()
    cells = all_cells.filter(F.col("variable") != row_marker)

    cluster_sizes = all_cells.filter(F.col("variable") == row_marker).select(
        cluster_col,
        F.col("observed").alias("cluster_n"),
        F.col("w_observed").alias("cluster_w"),
    )
    return ContingencyTables(
        cells=cells,
        cluster_sizes=cluster_sizes,
        cluster_col=cluster_col,
        weighted=weight_col is not None,
        _cached=all_cells,
    )


def _observed(cells: DataFrame, cluster_col: str) -> DataFrame:
    """Crosstab input cells: the reference drops rows where EITHER side of
    the crosstab is the "Not shown" sentinel (chisquared_tester.py:229-236).
    The cluster cast makes the filter a typed no-op on numeric predictions.

    NULL clusters are excluded EXPLICITLY (not as a side effect of the
    != comparison's NULL semantics): pd.crosstab drops NaN index/column
    labels by default, so a row with no cluster contributes to no
    crosstab — matching the reference.
    """
    return cells.filter(
        F.col(cluster_col).isNotNull()
        & (F.col("value") != NOT_SHOWN)
        & (F.col(cluster_col).cast("string") != NOT_SHOWN)
    )


def _dense_grid(cells: DataFrame, cluster_col: str) -> DataFrame:
    """Densify per-variable crosstabs to the full (value x cluster) grid.

    Mirrors ``pd.crosstab`` shape semantics: only values and clusters that
    actually occur for the variable (after the "Not shown" filter) form
    the table; missing combinations are zero cells
    (chisquared_tester.py:241-246).

    Built as one groupBy(variable) + double explode rather than two
    distinct-projections joined back: every step keys on ``variable`` so
    the cached cells layout satisfies it and the whole densification adds
    ZERO exchanges (the old shape compiled to 2 distincts + 2 joins,
    re-executed per consuming branch).
    """
    observed = _observed(cells, cluster_col)
    sets = observed.groupBy("variable").agg(
        F.collect_set("value").alias("_vals"),
        F.collect_set(cluster_col).alias("_cls"),
    )
    grid = sets.select(
        "variable", F.explode("_vals").alias("value"), "_cls"
    ).select("variable", "value", F.explode("_cls").alias(cluster_col))
    return (
        grid.join(observed, ["variable", cluster_col, "value"], "left")
        .na.fill({"observed": 0, "w_observed": 0.0})
    )


def _dense_with_expected(cells: DataFrame, cluster_col: str) -> DataFrame:
    """Dense grid + row/col/grand totals + expected frequency per cell.

    The shared physical input of the chi-squared statistics AND the
    post-hoc residuals — built once so the (distinct x2 + join x2 +
    3 windows) subplan is not compiled and executed twice per query.
    """
    dense = _dense_grid(cells, cluster_col)
    w_var = Window.partitionBy("variable")
    w_row = Window.partitionBy("variable", "value")
    w_col = Window.partitionBy("variable", cluster_col)
    # one select, not a withColumn chain: every withColumn re-analyzes
    # the (deep) plan — fusing them measurably cuts the deliver-stats
    # build time
    row_tot = F.sum("observed").over(w_row)
    col_tot = F.sum("observed").over(w_col)
    n = F.sum("observed").over(w_var)
    return dense.select(
        "*",
        row_tot.alias("row_tot"),
        col_tot.alias("col_tot"),
        n.alias("n"),
        (row_tot * col_tot / n).alias("expected"),
    )


def _chi2_parts() -> tuple[Column, Column]:
    """(plain, Yates-corrected) per-cell chi-squared summands over the
    dense grid's observed/expected columns."""
    diff = F.col("observed") - F.col("expected")
    corrected = F.greatest(F.abs(diff) - F.lit(0.5), F.lit(0.0))
    return (
        F.pow(diff, 2) / F.col("expected"),
        F.pow(corrected, 2) / F.col("expected"),
    )


def _chi2_finalize(
    df: DataFrame, stat_plain: str, stat_yates: str, min_obs: str
) -> DataFrame:
    """Shared scipy-semantics finalizer: adds dof / yates / chi2_stat /
    p_value from the aggregated parts. One implementation serves both the
    groupBy shape (chi2_by_variable) and the window shape (post_hoc_cells)
    so the Yates gate and degenerate-table rule can never diverge.

    Replicates scipy.stats.chi2_contingency as used by the reference
    (chisquared_tester.py:331-379): Yates correction requested when any
    observed cell <= 5, applied only when dof == 1, correction clamped so
    |O-E| never increases; degenerate tables (dof <= 0) give p = 1.0.
    Requires ``n_values``/``n_clusters`` columns on ``df``.
    """
    dof = (F.col("n_values") - 1) * (F.col("n_clusters") - 1)
    yates = F.col(min_obs) <= 5
    stat = F.when(yates & (dof == 1), F.col(stat_yates)).otherwise(
        F.col(stat_plain)
    )
    # two fused selects (not four withColumns): chi2_sf_col references
    # the just-created chi2_stat/dof columns, everything else lands in
    # one projection. chi2_sf_col is the pure JVM survival function —
    # the p-value stays inside whole-stage codegen (no Arrow/Python
    # worker in the inference plan).
    df = df.select(
        "*",
        dof.alias("dof"),
        yates.alias("yates"),
        F.when(dof > 0, stat).alias("chi2_stat"),
    )
    return df.select(
        "*",
        F.when(F.col("dof") > 0, chi2_sf_col("chi2_stat", "dof"))
        .otherwise(F.lit(1.0))
        .alias("p_value"),
    )


def chi2_by_variable(
    tables: ContingencyTables, dense: DataFrame | None = None
) -> DataFrame:
    """Per-variable chi-squared test over all crosstabs at once.

    Returns: variable, chi2_stat, dof, p_value, yates, n_values, n_clusters.
    Statistical semantics live in :func:`_chi2_finalize`.
    """
    cluster_col = tables.cluster_col
    if dense is None:
        dense = tables.dense_with_expected()

    plain, corrected = _chi2_parts()
    per_var = dense.groupBy("variable").agg(
        F.sum(plain).alias("stat_plain"),
        F.sum(corrected).alias("stat_yates"),
        F.min("observed").alias("min_observed"),
        F.countDistinct("value").alias("n_values"),
        F.countDistinct(cluster_col).alias("n_clusters"),
    )
    return _chi2_finalize(per_var, "stat_plain", "stat_yates", "min_observed").select(
        "variable", "chi2_stat", "dof", "yates", "n_values", "n_clusters", "p_value"
    )


def post_hoc_cells(tables: ContingencyTables, alpha: float = 0.05) -> DataFrame:
    """Adjusted residuals + Bonferroni post-hoc per crosstab cell.

    Returns one row per (variable, cluster, value) of every variable whose
    chi-squared p <= alpha, with ``adj_residual`` (rounded to 3, as the
    reference does before squaring — chisquared_tester.py:475) and
    ``post_hoc`` in {'pos','neg','neu'}.
    """
    cluster_col = tables.cluster_col
    # Per-variable test stats come from the groupBy shape over the SAME
    # dense frame, broadcast-joined back onto the cells. The test columns
    # (chi2 stat, dof, p) are constant per variable, so evaluating them
    # on the |variables|-row aggregate — not per cell inside a window
    # chain — keeps the chi2_sf fold expressions off the per-cell path
    # and the generated code small. No shuffle: the per-variable frame is
    # broadcast, and the dense side derives from the cached
    # variable-partitioned cell table, so re-densifying under the agg
    # branch re-reads the cache rather than re-scanning the input. The
    # inner join doubles as the p <= alpha significance filter. The dense
    # frame comes cached off the tables object so the grid+windows
    # subtree executes ONCE for both branches (and for any standalone
    # chi2_by_variable call on the same tables).
    dense = tables.dense_with_expected()
    per_var = chi2_by_variable(tables, dense).filter(F.col("p_value") <= alpha)
    dense = dense.join(
        F.broadcast(
            per_var.select(
                "variable", "n_values", "n_clusters", "p_value", "chi2_stat"
            )
        ),
        "variable",
    )

    # try_divide, not /: the p-value filter above only drops whole
    # variables, so rows with a zero divisor (e.g. a constant variable,
    # row_tot == n) can still be evaluated before being filtered. The NULL
    # keeps ANSI mode from throwing on rows that never reach the output.
    # ref_round: Python-round parity (reference rounds z to 3 with Python
    # round before squaring, chisquared_tester.py:473)
    adj_res = ref_round_expr(
        "try_divide(observed - expected,"
        " sqrt(expected * (1 - row_tot / n) * (1 - col_tot / n)))",
        3,
    )

    # Cell-level dof=1 Bonferroni test, WITHOUT a per-cell survival
    # function: chi2_sf(z^2, 1) <= alpha/m is monotone in |z|, and
    # m = n_values * n_clusters is constant per variable — so the |z|
    # threshold rides the SAME broadcast join as the per-variable test
    # columns, looked up from a once-per-process bisected table (same
    # floats as the scalar z_threshold the DuckDB oracle uses; no
    # driver collect, plan construction stays job-free). Tables wider
    # than the precomputed range fall back to the in-plan JVM survival
    # function — rare rows only, correctness for any m.
    spark = dense.sparkSession
    tbl = z_threshold_table(alpha)
    thr_df = spark.createDataFrame(
        sorted(tbl.items()), "_m: bigint, _z_thr: double"
    )
    # adj_residual and _m land in the same fused projection
    dense = dense.select(
        "*",
        adj_res.alias("adj_residual"),
        (F.col("n_values") * F.col("n_clusters")).cast("bigint").alias("_m"),
    ).join(F.broadcast(thr_df), "_m", "left")
    fallback_p = chi2_sf_col("adj_residual * adj_residual", "1")
    bonferroni_ok = F.when(
        F.col("_z_thr").isNotNull(),
        F.abs(F.col("adj_residual")) >= F.col("_z_thr"),
    ).otherwise(fallback_p <= F.lit(alpha) / F.col("_m"))
    # _m/_z_thr stay on `dense` until the final projection drops them
    significant = (F.abs(F.col("adj_residual")) >= 1.96) & bonferroni_ok
    post_hoc = (
        F.when(significant & (F.col("observed") > F.col("expected")), F.lit("pos"))
        .when(significant, F.lit("neg"))
        .otherwise(F.lit("neu"))
    )
    return dense.select(
        "variable",
        cluster_col,
        "value",
        "observed",
        "w_observed",
        "expected",
        "adj_residual",
        post_hoc.alias("post_hoc"),
        "p_value",
        "chi2_stat",
    )


def _ordered_list(sort_key: Column, payload: Column) -> Column:
    """collect_list with a deterministic order (by sort_key ascending)."""
    return F.transform(
        F.array_sort(F.collect_list(F.struct(sort_key.alias("k"), payload.alias("v")))),
        lambda s: s["v"],
    )


def deliver_stats(
    tables: ContingencyTables,
    alpha: float = 0.05,
    include_chi2_stat: bool = True,
) -> DataFrame:
    """The flagship inference output ("deliver_pg_stats").

    One row per (significant variable, segment):
      q_code, pop_mode, response_rate, mode_pop_perc, chi_2_result,
      sig_more_category, category_percentages, targeting_seg
      [+ chi2_stat] [+ weighted_pop_mode, weighted_pop_mode_perc,
      weighted_category_percentages when the input was weighted]

    Reference: chisquared_tester.py:1434-1589 (lazy path) and :1671-1731.
    Divergence note: the reference's weighted_pop_mode takes
    ``category_sizes.max()["category"]`` — the lexicographic max category,
    an apparent bug (chisquared_tester.py:966-971). We compute the argmax
    of the weighted count (the documented intent: "the category with the
    highest weighted sum").
    """
    cluster_col = tables.cluster_col
    cells = tables.cells
    post = post_hoc_cells(tables, alpha=alpha)

    # ONE aggregation of the cell table computes, per (variable, cluster):
    # the answer denominators (sentinel values INCLUDED — pandas
    # value_counts(normalize=True) semantics, chisquared_tester.py:1527-1536)
    # and both population modes ("Not shown" excluded, ties broken by
    # ascending value like pandas .mode(), chisquared_tester.py:914-918).
    # The mode argmax rides the same aggregate as a min-over-struct —
    # (-count, value) orders by descending count then ascending value —
    # replacing the old two-window + three-join shape. Response rate
    # (chisquared_tester.py:1503) is a per-variable window over the
    # grouped frame, so it still sums EVERY cluster's cells, including
    # ones later dropped by the significance join.
    mode_struct = F.when(
        F.col("value") != NOT_SHOWN,
        F.struct(
            (-F.col("observed")).alias("neg_n"),
            F.col("value").alias("v"),
            F.col("observed").alias("n"),
        ),
    )
    wmode_struct = F.when(
        F.col("value") != NOT_SHOWN,
        F.struct(
            (-F.col("w_observed")).alias("neg_n"),
            F.col("value").alias("v"),
            F.col("w_observed").alias("n"),
        ),
    )
    grp = cells.groupBy("variable", cluster_col).agg(
        F.sum("observed").alias("answered_n"),
        F.sum("w_observed").alias("answered_w"),
        F.min(mode_struct).alias("_mode"),
        F.min(wmode_struct).alias("_wmode"),
    )
    # response_rate divides by the TOTAL input row count. That count is a
    # one-row aggregate of cluster_sizes, broadcast into the plan as a
    # scalar — not collected: keeping it lazy removes the only driver-side
    # job from the deliver-stats plan-build path (tables.n_rows stays for
    # callers that need the Python int).
    total_rows = tables.cluster_sizes.agg(
        F.sum("cluster_n").cast("double").alias("_total_rows")
    )
    grp = grp.select(
        "variable",
        cluster_col,
        "answered_n",
        "answered_w",
        F.col("_mode.v").alias("pop_mode"),
        F.col("_mode.n").alias("mode_count"),
        F.col("_wmode.v").alias("weighted_pop_mode"),
        F.col("_wmode.n").alias("wmode_count"),
        F.sum("answered_n").over(Window.partitionBy("variable")).alias("_answered_tot"),
    ).crossJoin(F.broadcast(total_rows)).select(
        "variable",
        cluster_col,
        "answered_n",
        "answered_w",
        "pop_mode",
        "mode_count",
        "weighted_pop_mode",
        "wmode_count",
        (F.col("_answered_tot") / F.col("_total_rows") * 100).alias(
            "response_rate"
        ),
    )

    # Significant "more" categories per (variable, cluster): post_hoc ==
    # 'pos', 'not selected' stripped (chisquared_tester.py:1653 +
    # helper_functions.py:24-30); arrays ordered by category value like the
    # crosstab index iteration (chisquared_tester.py:1516-1538). The
    # per-variable p/chi2 ride along via first() — post carries them on
    # every row, so no distinct-projection self-join is needed.
    pos = (
        post.filter((F.col("post_hoc") == "pos") & (F.col("value") != NOT_SELECTED))
        .join(grp, ["variable", cluster_col])
        .select(
            "*",
            ref_round_expr("observed / answered_n * 100", 2).alias("cat_perc"),
            # try_divide: a cluster whose weights are all NULL (coalesced
            # to 0 upstream) has answered_w = 0 — ANSI plain division
            # would kill the whole job; NULL here is the Spark-native
            # spelling of the reference's NaN percentage
            ref_round_expr("try_divide(w_observed, answered_w) * 100", 2).alias(
                "w_cat_perc"
            ),
        )
    )
    pos_agg = pos.groupBy("variable", cluster_col).agg(
        _ordered_list(F.col("value"), F.col("value")).alias("sig_more_category"),
        _ordered_list(F.col("value"), F.col("cat_perc")).alias("category_percentages"),
        _ordered_list(F.col("value"), F.col("w_cat_perc")).alias(
            "weighted_category_percentages"
        ),
        F.first("p_value").alias("p_value"),
        F.first("chi2_stat").alias("chi2_stat"),
        F.first("pop_mode").alias("pop_mode"),
        F.first("mode_count").alias("mode_count"),
        F.first("weighted_pop_mode").alias("weighted_pop_mode"),
        F.first("wmode_count").alias("wmode_count"),
        F.first("response_rate").alias("response_rate"),
    )

    cluster_sizes = tables.cluster_sizes

    out = (
        pos_agg.join(F.broadcast(cluster_sizes), cluster_col)
        .select(
            F.col("variable").alias("q_code"),
            "pop_mode",
            "response_rate",
            ref_round_expr("mode_count / cluster_n * 100", 2).alias(
                "mode_pop_perc"
            ),
            ref_round_expr("p_value", 5).alias("chi_2_result"),
            "sig_more_category",
            "category_percentages",
            F.col(cluster_col).cast("string").alias("targeting_seg"),
            *(
                [ref_round_expr("chi2_stat", 2).alias("chi2_stat")]
                if include_chi2_stat
                else []
            ),
            *(
                [
                    "weighted_pop_mode",
                    ref_round_expr(
                        "try_divide(wmode_count, cluster_w) * 100", 0
                    ).alias("weighted_pop_mode_perc"),
                    "weighted_category_percentages",
                ]
                if tables.weighted
                else []
            ),
        )
        # no empty-array filter needed: NOT_SELECTED rows are stripped
        # BEFORE the aggregation, so every group has >= 1 category (the
        # reference's empty-row drop is realized pre-agg)
        .orderBy("chi_2_result", "q_code", "targeting_seg")
    )
    return out


def cluster_mode_list(
    wide: DataFrame,
    cluster_col: str,
    variables: list[str] | None = None,
    id_vars: list[str] | None = None,
) -> DataFrame:
    """Per-cluster modal answer for every column — the third element of
    the reference's ``return_API_data`` triple (M26).

    Reference: chisquared_tester.py:1788-1792 — for each cluster group,
    ``sub_frame.mode(dropna=False).head(1)``: per column the most
    frequent value, with nulls counted as a value, ties broken by the
    ascending sort pandas.mode applies (nulls last). The group sub-frame
    includes the cluster column itself, so its (trivial) mode row is kept
    for output-shape parity.

    One melt + ONE full-data shuffle; output cardinality is
    |columns| x |clusters| — independent of row count, same scale story
    as the deliver-stats cell table. Output: cluster (string), variable,
    mode_value.
    """
    if variables is None:
        variables = [c for c in wide.columns if c not in set(id_vars or [])]
    elif cluster_col not in variables:
        variables = [*variables, cluster_col]
    # pandas groupby drops NaN GROUP KEYS (while mode(dropna=False) keeps
    # null VALUES) — filter null clusters up front so a caller passing
    # unlabeled rows matches the reference's self.data.groupby(cluster_col)
    # (chisquared_tester.py:1789; round-3 ADVICE).
    wide = wide.filter(F.col(cluster_col).isNotNull())
    long = melt(
        wide.select(cluster_col, *[c for c in variables if c != cluster_col]),
        id_vars=[cluster_col],
        value_vars=None,
    ).unionByName(
        # the cluster column's own melt row (cluster, 'cluster_col', cluster)
        wide.select(
            F.col(cluster_col),
            F.lit(cluster_col).alias("variable"),
            F.col(cluster_col).cast("string").alias("value"),
        )
    )
    counts = long.groupBy(cluster_col, "variable", "value").agg(
        F.count(F.lit(1)).alias("n")  # count(lit(1)) keeps null-value rows
    )
    # argmax as min-over-struct: (-count, nulls-last, value) reproduces
    # pandas mode(dropna=False) tie order without a window
    pick = counts.groupBy(cluster_col, "variable").agg(
        F.min(
            F.struct(
                (-F.col("n")).alias("neg_n"),
                F.col("value").isNull().cast("int").alias("null_last"),
                F.col("value").alias("v"),
            )
        ).alias("_m")
    )
    return pick.select(
        F.col(cluster_col).cast("string").alias("cluster"),
        "variable",
        F.col("_m.v").alias("mode_value"),
    )


def discover_stats(deliver: DataFrame, n_feats: int = 10) -> DataFrame:
    """Top-``n_feats`` variables per segment by ascending p-value.

    Reference: seg_discover_stats_df (chisquared_tester.py:1671-1731) —
    renames pop_mode->mode / mode_pop_perc->mode_perc, drops rows whose
    mode is a sentinel, keeps the first n_feats per segment.
    """
    ranked = deliver.filter(
        ~F.col("pop_mode").isin(NOT_SELECTED, NOT_SHOWN)
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("targeting_seg").orderBy(
                F.asc("chi_2_result"), F.asc("q_code")
            )
        ),
    )
    return (
        ranked.filter(F.col("rn") <= n_feats)
        .select(
            "targeting_seg",
            F.col("q_code"),
            F.col("pop_mode").alias("mode"),
            F.col("mode_pop_perc").alias("mode_perc"),
            "sig_more_category",
            "category_percentages",
        )
    )


def cramers_v(
    tables: "ContingencyTables", dense: DataFrame | None = None
) -> DataFrame:
    """Cramér's V effect size per variable — the magnitude companion to
    the chi-squared p-value (p says "dependent"; V says "how much"):
    V = sqrt(chi2 / (n * (min(r, c) - 1))), in [0, 1].

    Reuses :func:`chi2_by_variable`'s per-variable aggregate and adds
    only a per-variable observation total over the SAME dense frame —
    both are |variables|-row frames, so the join is broadcast and the
    whole statistic stays schema-bound.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    if dense is None:
        dense = tables.dense_with_expected()
    chi2 = chi2_by_variable(tables, dense)
    totals = dense.groupBy("variable").agg(
        F.sum("observed").alias("n_obs")
    )
    k = (
        F.least(F.col("n_values"), F.col("n_clusters")) - F.lit(1)
    ).cast("double")
    # V from the 6-rounded statistic, mirroring the chi2 query's
    # rounding so the oracle derives from the identical value
    stat6 = F.round(F.col("chi2_stat"), 6)
    v = F.sqrt(stat6 / (F.col("n_obs").cast("double") * k))
    return chi2.join(F.broadcast(totals), "variable").select(
        "variable",
        stat6.alias("chi2_stat"),
        F.col("dof").cast("bigint").alias("dof"),
        F.col("n_obs").cast("bigint").alias("n_obs"),
        F.when(k > 0, ref_round(v, 6)).alias("cramers_v6"),
    )
