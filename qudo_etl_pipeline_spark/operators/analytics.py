"""Event-analytics and table-maintenance operators: funnel, retention
cohorts, CDC latest-wins compaction.

Extension scope (no reference counterpart): the event-pipeline analytics
and the incremental-maintenance primitive a 100 TB table needs. Shuffle
budget:

- ``funnel_depth``: ONE shuffle (groupBy user) + an in-JVM higher-order
  ``aggregate`` scan over each user's time-sorted event array. A
  stage-join formulation costs one shuffle PER stage; this costs one
  total, at the price of materializing each user's (relevant-typed)
  events as an array — bounded by per-user event count, the same bound
  sessionization already carries.
- ``retention_cohorts``: distinct user-day activity (one shuffle),
  per-user min-day cohort (map-side partial agg), one join back on
  user_id — all keyed on user_id so AQE can coalesce/skew-split.
- ``cdc_compact``: the standard log-structured merge: union snapshot +
  change batch, ONE shuffle on the key, row_number by (event time desc,
  change-batch priority), keep the winner, drop keys whose winner is a
  delete. At scale this is the compaction pass of a merge-on-read table;
  bucketing the snapshot by key makes successive compactions
  exchange-free on the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "funnel_depth",
    "funnel_counts",
    "retention_cohorts",
    "cdc_compact",
    "scd2_history",
    "ols_trend",
    "robust_zscore",
    "corr_matrix",
    "sequence_match",
    "event_transitions",
    "item_cooccurrence",
    "kaplan_meier",
    "two_proportion_ztest",
    "winsorize",
    "exact_quantile",
    "quantile_normalize",
    "weighted_quantile",
    "mann_whitney_u",
    "hill_tail_index",
    "gini_coefficient",
    "bootstrap_ci_mean",
    "cohort_ltv",
    "ks_two_sample",
    "mutual_information",
    "kendall_tau_b",
    "spearman_rho",
    "psi_drift",
    "psi_from_binned",
    "gains_curve",
    "cuped_adjust",
    "bh_fdr",
    "roc_auc",
    "calibration_curve",
    "diff_in_diff",
    "ab_srm_check",
    "ab_power_mde",
]


def funnel_depth(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user ordered-funnel depth: how many of ``stages`` were hit in
    order, each strictly after the previous match (greedy earliest
    matching — equivalent to stage-wise "first stage-i event after the
    matched stage-(i-1) event").

    Returns (user_col, depth) with depth in [0, len(stages)]; users with
    no stage-typed events at all do not appear (depth 0 rows exist only
    for users who emitted SOME stage event out of order).
    """
    stage_arr = F.array(*[F.lit(s) for s in stages])
    evs = (
        events.filter(F.col(type_col).isin(stages))
        .groupBy(user_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(ts_col).alias("t"),
                                        F.col(type_col).alias("y")))
            ).alias("_evs")
        )
    )
    # single in-JVM pass over the sorted array: advance when the next
    # event matches the next unmatched stage AND is strictly after the
    # previous match — the accumulator carries (depth, matched ts) so a
    # same-timestamp successor cannot advance (stage-wise
    # first-event-after semantics, identical to the SQL oracle's
    # `e.ts > prev_stage_ts` chain)
    n = len(stages)
    depth = F.aggregate(
        "_evs",
        F.struct(
            F.lit(0).alias("d"), F.lit(None).cast("timestamp").alias("t")
        ),
        lambda acc, e: F.when(
            (acc["d"] < n)
            & (e["y"] == F.element_at(stage_arr, acc["d"] + 1))
            & ((acc["d"] == 0) | (e["t"] > acc["t"])),
            F.struct((acc["d"] + 1).alias("d"), e["t"].alias("t")),
        ).otherwise(acc),
        lambda acc: acc["d"],
    )
    return evs.select(user_col, depth.cast("bigint").alias("depth"))


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel summary: for each stage, how many users reached AT LEAST
    that depth. Output (stage, stage_name, n_users), one row per stage.
    """
    depths = funnel_depth(events, stages, user_col, ts_col, type_col)
    reached = depths.filter(F.col("depth") > 0).select(
        F.explode(F.sequence(F.lit(1), F.col("depth"))).alias("stage")
    )
    stage_arr = F.array(*[F.lit(s) for s in stages])
    return (
        reached.groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.col("stage").cast("bigint").alias("stage"),
            F.element_at(stage_arr, F.col("stage").cast("int")).alias(
                "stage_name"
            ),
            "n_users",
        )
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by first-active day;
    output (cohort_day, day_offset, n_users) = how many of a cohort's
    users were active day_offset days after their cohort day.

    day_offset 0 row is the cohort size (every user is active on their
    first day by construction).
    """
    activity = events.select(
        F.col(user_col).alias("u"), F.to_date(F.col(ts_col)).alias("d")
    ).distinct()
    cohort = activity.groupBy("u").agg(F.min("d").alias("c"))
    return (
        activity.join(cohort, "u")
        .groupBy(
            F.date_format("c", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "c").cast("bigint").alias("day_offset"),
        )
        .agg(F.countDistinct("u").alias("n_users"))
    )


def cdc_compact(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Latest-wins CDC merge: apply a change batch (upserts ``'U'`` and
    deletes ``'D'`` in ``op_col``) onto a snapshot, keeping the newest
    version of each key and dropping keys whose newest version is a
    delete.

    ``changes`` must carry the snapshot's columns plus ``op_col``
    (delete rows may leave non-key payload columns NULL). Ties on
    ``ts_col`` resolve in favor of the change batch; within the change
    batch, an equal-timestamp upsert/delete pair resolves to the
    DELETE (op ASC — the conservative read of an ambiguous log, and a
    deterministic one: without it the winner was partition-order
    luck, surfaced by the r11 NULL-salt sweep where NULL change times
    tie). Remaining payload columns (snapshot order, ASC NULLS LAST)
    complete the order into a TOTAL one: with non-unique keys — above
    all the NULL-key group, which at scale holds thousands of rows
    sharing date-grained timestamps — (ts, src, op) alone leaves the
    winner tie-order luck again (caught by the r12 salted sf0.1 sweep;
    unique-key/unique-ts inputs are unaffected). Oracles must mirror
    the full ORDER BY. Returns the compacted table in the snapshot's
    schema.
    """
    snap = snapshot.withColumn(op_col, F.lit("U")).withColumn(
        "__src", F.lit(0)
    )
    chg = changes.withColumn("__src", F.lit(1))
    payload_tiebreak = [
        F.asc_nulls_last(c)
        for c in snapshot.columns
        if c not in keys and c != ts_col and c != op_col
    ]
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(),
        F.col("__src").desc(),
        F.asc_nulls_last(op_col),
        *payload_tiebreak,
    )
    return (
        snap.unionByName(chg)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) == "U"))
        .select(*snapshot.columns)
    )


OPEN_END = "9999-12-31 00:00:00"


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history: turn a change log
    (upserts ``'U'`` / deletes ``'D'``) into one validity interval per
    version.

    Each upsert opens a version at its ``ts_col``; the version closes at
    the NEXT change of the same key (upsert or delete), or stays open
    (``valid_to`` = :data:`OPEN_END` sentinel, ``is_current`` = 1).
    Delete rows only close the prior version — they emit no interval.

    ONE shuffle on the key (a single ``lead`` window); at scale this is
    the history-table build over a CDC log, and bucketing the log by key
    makes re-builds exchange-free.

    Same-timestamp changes of one key are an inherently ambiguous
    history; the version order is made TOTAL by the remaining log
    columns (log column order, ASC NULLS LAST) so the interval pairing
    is deterministic in the data, not in partition order — binding for
    non-unique keys (the salted NULL-key group ties date-grained
    timestamps at scale; r12 sweep), a no-op when (key, ts) is unique.
    Oracles must mirror the full ORDER BY.
    """
    tiebreak = [
        F.asc_nulls_last(c)
        for c in changes.columns
        if c not in keys and c != ts_col
    ]
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc(), *tiebreak)
    nxt = F.lead(F.col(ts_col)).over(w)
    payload = [c for c in changes.columns if c not in (op_col, ts_col)]
    return (
        changes.withColumn("__next_ts", nxt)
        .filter(F.col(op_col) == "U")
        .select(
            *payload,
            F.col(ts_col).alias("valid_from"),
            F.coalesce(
                F.col("__next_ts"), F.lit(OPEN_END).cast("timestamp")
            ).alias("valid_to"),
            F.when(F.col("__next_ts").isNull(), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("is_current"),
        )
    )


def ols_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group closed-form OLS of ``y`` on ``x``: slope, intercept, r².

    Extension scope (no reference counterpart): the per-segment trend
    fit every analytics pipeline eventually needs (price elasticity per
    flag, volume trend per source). ONE shuffle: the five moments
    (Σx, Σy, Σxy, Σx², Σy²) are map-side-combinable sums, so the fit is
    a plain groupBy — no second pass, no driver-side math, and the
    output cardinality is the group count, independent of row count.

    Cross-engine determinism: moments are DECIMAL-exact sums. The
    product moments (scale 8) are pre-rounded before the double cast —
    Σxy/Σx² to scale 2, Σy² to scale 0 — keeping each unscaled value
    under 2^53 so the decimal→double conversion is a single correct
    rounding on both engines (the q1 sum_disc_price lesson). The final
    slope/intercept/r² arithmetic is then a fixed IEEE expression tree
    over bit-identical doubles. Per-group Σy² bounds the usable |y| at
    roughly 3e7 per 6M-row group; wider data should scale y down first.

    Degenerate groups: slope/intercept are NULL when var(x)=0 (vertical
    or single-point groups), r² additionally NULL when var(y)=0.
    """
    xd = F.col(x_col).cast("decimal(18,4)")
    yd = F.col(y_col).cast("decimal(18,4)")
    m = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(xd).cast("double").alias("_sx"),
        F.sum(yd).cast("double").alias("_sy"),
        F.round(F.sum(xd * yd), 2).cast("double").alias("_sxy"),
        F.round(F.sum(xd * xd), 2).cast("double").alias("_sxx"),
        F.round(F.sum(yd * yd), 0).cast("double").alias("_syy"),
    )
    n, sx, sy = F.col("_n"), F.col("_sx"), F.col("_sy")
    cov = n * F.col("_sxy") - sx * sy
    varx = n * F.col("_sxx") - sx * sx
    vary = n * F.col("_syy") - sy * sy
    slope = cov / varx
    return m.select(
        *group_cols,
        n.cast("bigint").alias("n"),
        F.when(varx > 0, slope).alias("slope"),
        F.when(varx > 0, (sy - slope * sx) / n).alias("intercept"),
        F.when((varx > 0) & (vary > 0), (cov * cov) / (varx * vary)).alias(
            "r2"
        ),
    )


def robust_zscore(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    threshold: float = 3.5,
    percentile: str = "exact",
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group robust (median/MAD) outlier score: the modified z-score
    rz = 0.6745 · (x − median) / MAD with the Iglewicz–Hoaglin |rz| >
    3.5 flag — the outlier detector that, unlike mean/std z-scores,
    an outlier cannot mask by inflating its own baseline.

    Two keyed shuffles (median, then MAD of |x − median|), each a
    map-side-combinable percentile; group stats come back via
    broadcast joins, so the big side is never re-shuffled.

    ``percentile`` picks the median engine (mirroring
    :mod:`qudo_etl_pipeline_spark.ml.discretize`'s exact/approx split):

    - ``"exact"`` (default, the oracle-parity path): Spark
      ``percentile`` — aggregation state is the per-group
      distinct-value histogram, fine for grouped analytics where
      groups hold up to ~1e5 distinct values.
    - ``"approx"``: ``percentile_approx`` (Greenwald–Khanna sketch,
      ``accuracy`` controls the ε=1/accuracy rank error) — aggregation
      state is O(accuracy·log n) per group regardless of distinct-value
      cardinality; the 100 TB path when per-group value cardinality is
      unbounded. Same plan shape, no oracle hash parity (sketch
      medians differ from interpolated ones by ≤ one rank step).

    Group keys join back null-safely (``eqNullSafe``): rows whose group
    key is NULL score against the NULL-key group's median/MAD instead
    of silently dropping from the output.

    Cross-engine determinism (exact path): both medians are
    ref_round(…, 6)ed (Spark ``percentile`` and DuckDB
    ``quantile_cont`` interpolate identically on doubles; the rounding
    absorbs any residual ulp), and rz is a fixed IEEE tree over those.
    Zero-MAD groups (>50% of values at the median) yield NULL rz /
    flag 0.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    if percentile not in ("exact", "approx"):
        raise ValueError(f"unknown percentile engine: {percentile!r}")

    def med50(col: F.Column) -> F.Column:
        if percentile == "exact":
            return F.percentile(col, F.lit(0.5))
        return F.percentile_approx(col, F.lit(0.5), F.lit(accuracy))

    def join_back(big: DataFrame, stats: DataFrame) -> DataFrame:
        # null-safe broadcast join: group keys renamed on the (tiny)
        # stats side so the big side's columns pass through unchanged
        ren = stats
        for i, c in enumerate(group_cols):
            ren = ren.withColumnRenamed(c, f"_g{i}")
        cond = F.lit(True)
        for i, c in enumerate(group_cols):
            cond = cond & big[c].eqNullSafe(F.col(f"_g{i}"))
        return big.join(F.broadcast(ren), cond).drop(
            *[f"_g{i}" for i in range(len(group_cols))]
        )

    v = F.col(value_col)
    med = df.groupBy(*group_cols).agg(
        ref_round(med50(v), 6).alias("_med6")
    )
    dev = join_back(df, med)
    mad = dev.groupBy(*group_cols).agg(
        ref_round(med50(F.abs(v - F.col("_med6"))), 6).alias("_mad6")
    )
    scored = join_back(dev, mad)
    rz = F.lit(0.6745) * (v - F.col("_med6")) / F.col("_mad6")
    return scored.select(
        *df.columns,
        F.when(F.col("_mad6") > 0, ref_round(rz, 6)).alias("rz6"),
        F.when((F.col("_mad6") > 0) & (F.abs(rz) > threshold), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_outlier"),
    )


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """All pairwise Pearson correlations of ``cols`` in ONE aggregation
    pass (n + Σx per column + Σxy per pair — every moment map-side-
    combinable), then pure column arithmetic. Output one row per
    unordered pair: (col_x, col_y, corr) — the flattened correlation
    matrix a feature-selection / drift-monitoring step consumes.

    Same determinism discipline as :func:`ols_trend`: DECIMAL-exact
    sums, product moments pre-rounded to scale 2 under the 2^53
    decimal→double bound, correlation as a fixed IEEE tree
    corr = (n·Σxy − Σx·Σy) / (sqrt(n·Σxx − Σx²) · sqrt(n·Σyy − Σy²)),
    NULL for constant columns.
    """
    # moment aliases are keyed by column INDEX, not name: name-based
    # aliases like _p_{a}_{b} collide when names themselves contain
    # underscores (['unit','price_total'] vs ['unit_price','total']
    # would both alias _p_unit_price_total)
    d = {c: F.col(c).cast("decimal(18,4)") for c in cols}
    aggs = [F.count(F.lit(1)).cast("double").alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(d[c]).cast("double").alias(f"_s_{i}"))
    pairs = [
        (i, j)
        for i in range(len(cols))
        for j in range(i, len(cols))
    ]  # includes (i, i): Σx² rides in the same pass
    for i, j in pairs:
        aggs.append(
            F.round(F.sum(d[cols[i]] * d[cols[j]]), 2)
            .cast("double")
            .alias(f"_p_{i}_{j}")
        )
    m = df.agg(*aggs)

    def _cov(i: int, j: int) -> F.Column:
        key = f"_p_{i}_{j}" if i <= j else f"_p_{j}_{i}"
        return F.col("_n") * F.col(key) - F.col(f"_s_{i}") * F.col(
            f"_s_{j}"
        )

    structs = []
    for i, j in pairs:
        if i == j:
            continue
        r = _cov(i, j) / (F.sqrt(_cov(i, i)) * F.sqrt(_cov(j, j)))
        r = F.when((_cov(i, i) > 0) & (_cov(j, j) > 0), r)
        structs.append(
            F.struct(
                F.lit(cols[i]).alias("col_x"),
                F.lit(cols[j]).alias("col_y"),
                r.alias("corr"),
            )
        )
    return m.select(
        F.explode(F.array(*structs)).alias("_e")
    ).select("_e.col_x", "_e.col_y", "_e.corr")


def sequence_match(
    events: DataFrame,
    symbols: dict[str, str],
    pattern: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """MATCH_RECOGNIZE-lite: regex pattern detection over each user's
    time-ordered event-type sequence.

    ``symbols`` maps event types to single characters (events of
    unmapped types are dropped BEFORE the shuffle — the filter prunes
    the scan); ``pattern`` is a regex over those characters, e.g. with
    ``{"view": "V", "click": "C", "purchase": "P", "error": "E"}`` the
    pattern ``V[VC]*P`` is "a view leading to a purchase through any
    run of views/clicks with no error in between" — the per-user
    funnel-with-negation queries SQL's MATCH_RECOGNIZE serves, without
    a stage-join per pattern step.

    ONE shuffle (groupBy user); each user's events materialize as a
    character string, bounded by per-user event count — the same bound
    sessionization and funnel_depth already carry. Matching is
    JVM-side regex over that string: ``n_matches`` counts
    non-overlapping leftmost matches, ``first_match`` is the first
    matched subsequence ('' when none). Keep the symbol alphabet to
    plain characters/classes so RE2-based oracle engines agree with
    Java regex semantics.

    Output: (user_col, seq_len, n_matches, matched, first_match).
    """
    mapping = F.create_map(
        *[F.lit(x) for kv in symbols.items() for x in kv]
    )
    evs = events.filter(
        F.col(type_col).isin(list(symbols))
    ).select(
        F.col(user_col),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("id"),
            mapping[F.col(type_col)].alias("sym"),
        ).alias("e"),
    )
    seq = F.array_join(
        F.transform(
            F.array_sort(F.collect_list("e")), lambda e: e["sym"]
        ),
        "",
    )
    return (
        evs.groupBy(user_col)
        .agg(seq.alias("seq"))
        .select(
            user_col,
            F.length("seq").cast("bigint").alias("seq_len"),
            F.regexp_count("seq", F.lit(pattern))
            .cast("bigint")
            .alias("n_matches"),
            (F.regexp_count("seq", F.lit(pattern)) > 0)
            .cast("bigint")
            .alias("matched"),
            F.regexp_extract("seq", pattern, 0).alias("first_match"),
        )
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    for every observed (prev_type -> type) step, its count and the
    row-normalized transition probability P(next = type | prev).

    ONE keyed window shuffle (lag over each user's time-ordered events)
    + one aggregation over the |types|^2-bounded pair space; the
    probability normalization is a window over that schema-bound
    aggregate, so nothing after the first shuffle scales with rows.
    Output: (prev_type, next_type, n, p) — p rounded to 6.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    steps = (
        events.select(
            F.lag(type_col).over(w).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wrow = Window.partitionBy("prev_type")
    return steps.select(
        "prev_type",
        "next_type",
        "n",
        ref_round(
            F.col("n") / F.sum("n").over(wrow).cast("double"), 6
        ).alias("p"),
    )


def item_cooccurrence(
    events: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item",
    max_basket: int = 200,
) -> DataFrame:
    """Item co-occurrence with association-rule stats: for every item
    pair appearing in some user's basket (the user's DISTINCT item
    set), the pair count and support/confidence/lift.

    The scale guard is ``max_basket``: a user's pair fan-out is
    quadratic in basket size, so baskets over the cap are dropped
    whole (the standard power-user cut in co-occurrence mining — a
    crawler or bot account would otherwise dominate both cost AND the
    statistics). Work is then <= max_basket x |kept events|.

    Shuffles: distinct (user, item), per-user count + filter (same
    key), the within-user pair self-join, pair aggregation, and two
    broadcast joins of the item-marginal table. n_users counts KEPT
    users only, so support/lift are consistent under the cap.
    Output: (item_a, item_b, n_ab, n_a, n_b, support, conf_a_b, lift),
    ratios rounded to 6.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    baskets = events.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("i")
    ).distinct()
    sizes = baskets.groupBy("u").agg(F.count(F.lit(1)).alias("bs"))
    # kept feeds four branches (n_users, marginals, both pair sides);
    # truncate lineage so the distinct+size-gate runs once, not 4x
    kept = baskets.join(
        sizes.filter(F.col("bs") <= max_basket).select("u"), "u"
    ).localCheckpoint()
    n_users = kept.select("u").distinct().agg(
        F.count(F.lit(1)).alias("n_users")
    )
    marg = kept.groupBy("i").agg(F.count(F.lit(1)).alias("n_i"))
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.u") == F.col("b.u"))
            & (F.col("a.i") < F.col("b.i")),
        )
        .groupBy(
            F.col("a.i").alias("item_a"), F.col("b.i").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ma = marg.select(
        F.col("i").alias("item_a"), F.col("n_i").alias("n_a")
    )
    mb = marg.select(
        F.col("i").alias("item_b"), F.col("n_i").alias("n_b")
    )
    d = F.col("n_users").cast("double")
    return (
        pairs.join(F.broadcast(ma), "item_a")
        .join(F.broadcast(mb), "item_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            ref_round(F.col("n_ab") / d, 6).alias("support"),
            ref_round(
                F.col("n_ab") / F.col("n_a").cast("double"), 6
            ).alias("conf_a_b"),
            ref_round(
                (F.col("n_ab") * d)
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                6,
            ).alias("lift"),
        )
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    max_domain: int = 100_000,
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimator.

    Input: one row per subject with an integer duration and a 0/1
    event flag (0 = right-censored). Output: one row per DISTINCT
    duration t with the at-risk count, event/censor counts, and the
    survival estimate ``S(t) = prod_{t' <= t} (n_t' - d_t') / n_t'``.

    Scale shape: the subject table collapses to the distinct-duration
    frame in ONE groupBy whose output cardinality is the duration
    domain (days/weeks — thousands, not rows), plus a 1-row broadcast
    total; the running product then runs as ordered windows over that
    sketch-sized frame (single-partition by construction — the
    deliberate unpartitioned-window case session.py documents). That
    contract is ENFORCED: a plan-side :func:`_domain_gate` asserts the
    distinct-duration count is <= ``max_domain`` before the windows
    build, so sub-second timestamps passed as "durations" fail loudly
    instead of silently funneling a row-count-sized frame through one
    task. Coarsen durations to days/weeks (integer division) first.

    Determinism: at-risk counts are exact integers from a running
    integer sum; the product runs as ``exp(running sum of ln factors)``
    with identical operand order in any engine, and a running any-zero
    flag pins ``S = 0`` exactly past a saturated step (no infinities).
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    from qudo_etl_pipeline_spark.operators.prefix import (
        acquire_operator_cache,
    )

    ev = F.col(event_col).cast("bigint")
    # materialize the duration collapse ONCE: the domain-gate probe and
    # the subject total are separate plan branches, and without a cache
    # each re-runs the caller's subject plan from the source scans
    # (measured: 3 executions = 6 parquet scans for the catalog query).
    # __nt carries the exact per-duration row count so the total below
    # is count(*)-identical (sum(ev)/sum(1-ev) skip NULL event flags;
    # a row count does not) — it is dropped from the output.
    per_t = acquire_operator_cache(
        df.groupBy(duration_col).agg(
            F.sum(ev).alias("n_event"),
            F.sum(F.lit(1) - ev).alias("n_censor"),
            F.count(F.lit(1)).alias("__nt"),
        )
    )
    card = per_t.agg(F.count(F.lit(1)).alias("_dd"))
    ok = _domain_gate(
        card,
        F.col("_dd") <= max_domain,
        _oversize_err("kaplan_meier", max_domain, F.col("_dd")),
    )
    tot = per_t.agg(F.sum("__nt").alias("__n"))
    per_t = per_t.drop("__nt").crossJoin(F.broadcast(ok)).drop(
        "_domain_ok"
    )
    before = (
        Window.orderBy(duration_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    upto = (
        Window.orderBy(duration_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    at_risk = F.col("__n") - F.coalesce(
        F.sum(F.col("n_event") + F.col("n_censor")).over(before),
        F.lit(0),
    )
    stepped = (
        per_t.crossJoin(F.broadcast(tot))
        .withColumn("n_risk", at_risk)
        .withColumn(
            "__factor",
            (F.col("n_risk") - F.col("n_event")).cast("double")
            / F.col("n_risk").cast("double"),
        )
    )
    ln_term = F.when(
        F.col("n_event") > 0, F.log(F.col("__factor"))
    ).otherwise(F.lit(0.0))
    zero_step = F.when(
        (F.col("n_event") > 0) & (F.col("n_risk") == F.col("n_event")),
        F.lit(1),
    ).otherwise(F.lit(0))
    surv = F.when(
        F.max(zero_step).over(upto) > 0, F.lit(0.0)
    ).otherwise(
        F.exp(
            F.sum(
                F.when(zero_step == 1, F.lit(0.0)).otherwise(ln_term)
            ).over(upto)
        )
    )
    return stepped.select(
        duration_col,
        "n_risk",
        "n_event",
        "n_censor",
        ref_round(surv, 6).alias("surv6"),
    )


#: two-sided normal critical value for alpha = 0.05 — stated as the
#: exact double both engines compare against (Python:
#: ``-statistics.NormalDist().inv_cdf(0.025)``).
Z_CRIT_95 = 1.959963984540054


def two_proportion_ztest(
    df: DataFrame,
    group_col: str,
    success_col: str,
    z_crit: float = Z_CRIT_95,
) -> DataFrame:
    """Pooled two-proportion z-test (the A/B conversion test).

    Input: one row per experimental UNIT (already deduplicated —
    assignment must be unit-level, not event-level) with a binary
    success flag and exactly two group labels. Output: ONE row —
    per-group n/successes, rate difference, pooled z, and the
    ``|z| > z_crit`` verdict.

    The whole test is two integer aggregates: a groupBy(variant) whose
    output is 2 rows, collapsed to one via min/max structs (group
    labels order the struct comparison, so A = lexicographically first
    label — deterministic). Every double derives from the same integer
    counts through one fixed IEEE expression tree, so z is
    bit-identical cross-engine; significance compares against an exact
    double constant rather than a p-value (monotone in |z|, the same
    threshold trick the chi-squared post-hoc layer uses). The
    exactly-two-labels contract is ENFORCED: with any other label
    count the row comes back all-NULL rather than a
    plausible-but-wrong test between the lexicographic extremes.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    g = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(success_col).cast("bigint")).alias("k"),
    )
    row = g.agg(
        F.min(
            F.struct(F.col(group_col).alias("g"), F.col("n"), F.col("k"))
        ).alias("a"),
        F.max(
            F.struct(F.col(group_col).alias("g"), F.col("n"), F.col("k"))
        ).alias("b"),
        F.count(F.lit(1)).alias("_ng"),
    )
    # contract guard: min/max structs keep only the lexicographic
    # extremes, so >2 group labels would silently drop the middle
    # groups and report a plausible-but-wrong test — null every output
    # instead of answering a different question
    ok = F.col("_ng") == 2
    n1 = F.col("a.n").cast("double")
    n2 = F.col("b.n").cast("double")
    p1 = F.col("a.k").cast("double") / n1
    p2 = F.col("b.k").cast("double") / n2
    pp = (F.col("a.k") + F.col("b.k")).cast("double") / (
        F.col("a.n") + F.col("b.n")
    ).cast("double")
    se = F.sqrt(
        pp * (F.lit(1.0) - pp) * (F.lit(1.0) / n1 + F.lit(1.0) / n2)
    )
    # degenerate pooled rate (0 or 1) -> no variance -> no test.
    # Stage _z/_d as COLUMNS: ref_round references its argument ~8x
    # (the Dekker split), so inlining the z tree into z6 AND the
    # significance test blew the generated projection past Janino's
    # 64 KB method limit (silent interpreted fallback). Staged, the
    # non-cheap _z is shared, Catalyst keeps the projections apart
    # (CollapseProject does not duplicate non-cheap expressions), and
    # every method compiles.
    z = F.when(se > 0, (p1 - p2) / se)
    mid = row.select(
        "a",
        "b",
        ok.alias("_ok"),
        (p1 - p2).alias("_d"),
        z.alias("_z"),
    )
    ok2 = F.col("_ok")
    return mid.select(
        F.when(ok2, F.col("a.g")).alias("group_a"),
        F.when(ok2, F.col("a.n")).alias("n_a"),
        F.when(ok2, F.col("a.k")).alias("conv_a"),
        F.when(ok2, F.col("b.g")).alias("group_b"),
        F.when(ok2, F.col("b.n")).alias("n_b"),
        F.when(ok2, F.col("b.k")).alias("conv_b"),
        F.when(ok2, ref_round(F.col("_d"), 6)).alias("rate_diff6"),
        F.when(ok2, ref_round(F.col("_z"), 6)).alias("z6"),
        F.when(
            ok2,
            F.when(F.abs(F.col("_z")) > F.lit(z_crit), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint"),
        ).alias("is_significant"),
    )


def winsorize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    percentile: str = "exact",
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group winsorization: clip ``value_col`` to the group's
    [lower, upper] quantile bounds — the standard tail-taming transform
    before means/regressions on heavy-tailed measures.

    Same shuffle shape and engine split as :func:`robust_zscore`: ONE
    keyed percentile aggregate (both bounds in the same pass), bounds
    ref_round(…, 6)ed for cross-engine parity, then broadcast back —
    the big side is never re-shuffled. ``percentile="approx"`` swaps in
    the Greenwald-Khanna sketch for unbounded per-group cardinality.

    Output: input columns + ``lo6``/``hi6`` bounds, the clipped value
    ``w``, and ``clip_flag`` (-1 clipped low / 0 untouched / +1 clipped
    high). NULL values pass through unclipped with flag 0.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    if percentile not in ("exact", "approx"):
        raise ValueError(f"unknown percentile engine: {percentile!r}")

    v = F.col(value_col)
    # BOTH bounds from ONE percentile aggregate (array form): the
    # aggregation state (the per-group value histogram) is the cost,
    # and two scalar percentile calls would build it twice
    if percentile == "exact":
        pct_arr = F.percentile(v, F.array(F.lit(lower), F.lit(upper)))
    else:
        pct_arr = F.percentile_approx(
            v, F.array(F.lit(lower), F.lit(upper)), F.lit(accuracy)
        )
    bounds = df.groupBy(*group_cols).agg(pct_arr.alias("_b")).select(
        *group_cols,
        ref_round(F.col("_b")[0], 6).alias("lo6"),
        ref_round(F.col("_b")[1], 6).alias("hi6"),
    )
    ren = bounds
    for i, c in enumerate(group_cols):
        ren = ren.withColumnRenamed(c, f"_g{i}")
    cond = F.lit(True)
    for i, c in enumerate(group_cols):
        cond = cond & df[c].eqNullSafe(F.col(f"_g{i}"))
    j = df.join(F.broadcast(ren), cond).drop(
        *[f"_g{i}" for i in range(len(group_cols))]
    )
    w = F.when(v < F.col("lo6"), F.col("lo6")).when(
        v > F.col("hi6"), F.col("hi6")
    ).otherwise(v)
    flag = (
        F.when(v < F.col("lo6"), F.lit(-1))
        .when(v > F.col("hi6"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    return j.select(
        *df.columns,
        "lo6",
        "hi6",
        w.alias("w"),
        flag.alias("clip_flag"),
    )


def exact_quantile(
    df: DataFrame,
    value_col: str,
    q_num: int,
    q_den: int,
    buckets: int = 1024,
    max_leaf: int = 100_000,
) -> DataFrame:
    """EXACT order statistic (the value of rank ``floor(q*(n-1))``,
    q = q_num/q_den) without a global sort.

    ``percentile()`` keeps a per-group distinct-value histogram —
    unbounded state on a 100 TB column; a global ``orderBy`` is a full
    shuffle of the table. This is the classic iterative histogram
    refinement instead: each round partitions the CURRENT value range
    into ``buckets`` equal-width bins with one map-side-combinable
    aggregate (a bucket-count frame, B rows), the driver locates the
    bin holding the remaining rank (a legitimate aggregated collect,
    like centroids), and the search narrows to that bin. Rounds =
    log_B(n / max_leaf) — TWO extra scans at 100 TB with B=1024 —
    and the final ≤ ``max_leaf``-row leaf resolves by distributed
    take-ordered. Equal values always share a bin (bucketing is a
    monotone value function), so ties never split the rank.

    Returns a 1-row DataFrame (n, k, value). NULLs are excluded.
    """
    src = df.select(F.col(value_col).alias("v")).filter(
        F.col("v").isNotNull()
    )
    stats = src.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    ).collect()[0]
    n = stats["n"]
    if n == 0:
        return df.sparkSession.createDataFrame(
            [], "n bigint, k bigint, value double"
        )
    k = (q_num * (n - 1)) // q_den
    k_rem, lo, hi = k, float(stats["lo"]), float(stats["hi"])
    cur = src
    cur_n = n
    while cur_n > max_leaf and lo < hi:
        width = (hi - lo) / buckets
        # clamp BOTH sides: IEEE rounding of (v - lo)/width at a bucket
        # boundary can push a surviving row to bucket -1 in a later
        # refinement round (lo has moved above the row's value by one
        # ulp) — invisible to the range(buckets) walk below and able to
        # stall the rank bookkeeping
        b = F.greatest(
            F.lit(0),
            F.least(
                F.lit(buckets - 1),
                F.floor((F.col("v") - F.lit(lo)) / F.lit(width)),
            ),
        ).cast("int")
        hist = {
            r["b"]: r["c"]
            for r in cur.groupBy(b.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        seen = 0
        for i in range(buckets):
            c = hist.get(i, 0)
            if seen + c > k_rem:
                k_rem -= seen
                cur_n = c
                b_lo = lo + i * width
                b_hi = lo + (i + 1) * width if i < buckets - 1 else hi
                sel = F.greatest(
                    F.lit(0),
                    F.least(
                        F.lit(buckets - 1),
                        F.floor((F.col("v") - F.lit(lo)) / F.lit(width)),
                    ),
                ) == i
                # the floor-bucket predicate is exact but opaque to the
                # scanner; the redundant (1-bucket-slack) range test is
                # a superset, changes nothing, and IS pushable — at
                # scale each refinement round prunes parquet row groups
                # instead of re-reading the table
                guard = (F.col("v") >= F.lit(b_lo - width)) & (
                    F.col("v") <= F.lit(b_hi + width)
                )
                cur = cur.filter(guard & sel)
                lo, hi = b_lo, b_hi
                break
            seen += c
    if lo >= hi:
        value = cur.limit(1)
    else:
        value = (
            cur.orderBy(F.asc("v"))
            .limit(k_rem + 1)
            .orderBy(F.desc("v"))
            .limit(1)
        )
    return value.select(
        F.lit(n).cast("bigint").alias("n"),
        F.lit(k).cast("bigint").alias("k"),
        F.col("v").alias("value"),
    )


def quantile_normalize(
    df: DataFrame,
    id_col: str,
    cols: list[str],
) -> DataFrame:
    """Quantile normalization across measure columns: every column is
    forced onto the SAME distribution — each value is replaced by the
    mean of the values sharing its within-column rank (the standard
    cross-sample calibration transform; ties break by id for a
    deterministic rank — NULL ids rank FIRST among ties, the prefix
    device's bare asc() placement, so oracles must pin ``NULLS FIRST``
    on both rank keys; caught by the r12 salted sf0.1 sweep).

    Columns must be non-null and equally sized (one value per id). The
    within-column rank is the RANGE-PARTITIONED two-pass prefix count
    (:func:`~qudo_etl_pipeline_spark.operators.prefix.
    ranged_prefix_sums` — the shared device, NOT a per-column
    Window.orderBy which would move each whole column into one task).
    Then one groupBy(rank) computes the rank means DECIMAL-exactly and
    one rank-keyed join brings them home: three shuffles total,
    independent of column count.
    """
    from qudo_etl_pipeline_spark.operators.prefix import (
        ranged_prefix_sums,
    )

    melted = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("_c"),
                        F.col(c).cast("double").alias("_v"),
                    )
                    for c in cols
                ]
            )
        ).alias("kv"),
    ).select("_id", F.col("kv._c").alias("_c"), F.col("kv._v").alias("_v"))
    # within-column rank = inclusive prefix COUNT through the shared
    # device ((_v, _id) is a total order per column, so row_number and
    # the running count coincide)
    ranked = ranged_prefix_sums(
        melted.withColumn("_one", F.lit(1)),
        ["_v", "_id"],
        {"_rank": "_one"},
        group_cols=["_c"],
    )
    means = ranked.groupBy("_rank").agg(
        (
            F.sum(F.col("_v").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_qnorm")
    )
    return ranked.join(means, "_rank").select(
        F.col("_id").alias(id_col),
        F.col("_c").alias("col_name"),
        F.col("_v").alias("value"),
        F.col("_rank").alias("rank"),
        F.col("_qnorm").alias("qnorm"),
    )


def weighted_quantile(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    q_num: int = 1,
    q_den: int = 2,
) -> DataFrame:
    """Per-group weighted quantile (default: weighted median) — the
    survey-statistics primitive where each row speaks for ``weight``
    design units: the smallest value v such that the cumulative weight
    of rows <= v reaches q of the group total.

    The running weight sum is the RANGE-PARTITIONED two-pass prefix
    sum (:func:`~qudo_etl_pipeline_spark.operators.prefix.
    ranged_prefix_sums` — the shared device), NOT a
    ``Window.partitionBy(group)`` — with few wide groups that window
    serializes each group into one task (measured 2.9 s at sf0.1 on 3
    groups; the device spreads the same work over every core). Weights
    must be NON-NEGATIVE (quantile semantics) and accumulate as BIGINT
    micros (one exact DECIMAL(18,6) cast + scale shift per row; ANSI
    mode keeps the |group total| < 9.2e12-weight-unit range bound
    loud); the crossing test is the integer-exact ``q_den * cumw >=
    q_num * totw`` — no float thresholds. Group totals come from the
    cum column's per-group maximum (exact under non-negative weights),
    a map-side-combinable aggregate over the device's cached frame.
    The non-negativity contract is ENFORCED by a plan-side
    :func:`_domain_gate` on the global minimum weight — a negative
    weight would silently make the max-based total wrong, so the plan
    fails loudly instead.

    Determinism under ties: the device frame is the DISTINCT
    (group, value) frame — rows sharing a value collapse to ONE device
    row carrying the value's total weight (the Mann-Whitney midrank
    trick), so the row's cumulative weight IS the value group's END
    cumulative weight: a value crosses the threshold iff that does —
    order-independent — and the selected value is the min over
    crossing rows, so every engine picks the same value. The collapse
    is also the scale lever: the prefix device runs on at most
    |groups|·|distinct values| rows instead of the row count (measured
    28.9 s → under half at sf1 on 3 groups × the price domain).
    NULL values/weights are excluded.
    """
    from qudo_etl_pipeline_spark.operators.prefix import (
        ranged_prefix_sums,
    )

    v = F.col(value_col)
    # accumulate on the unscaled integer representation (micros), the
    # same exact-rational device as bootstrap_ci_mean: one decimal cast
    # + scale shift per row, then every aggregate/window in the plan
    # sums BIGINT instead of DECIMAL (~15% off a cold device build at
    # sf0.1). The shift is exact (the (18,6) cast already fixed the
    # scale), the crossing test compares integers either way, and the
    # outputs are shifted back through DECIMAL before the one double
    # conversion — bit-identical results. ANSI mode keeps the BIGINT
    # range bound loud: |group total| < 9.2e12 weight units (the same
    # documented bound class as bootstrap's replicate sums).
    wt = (F.col(weight_col).cast("decimal(18,6)") * 1_000_000).cast(
        "bigint"
    )
    src = df.filter(v.isNotNull() & F.col(weight_col).isNotNull()).select(
        *group_cols, v.alias("__v"), wt.alias("__w")
    )
    # ONE map-side-combined groupBy collapses ties before the device:
    # per (group, value) total weight + row count + per-value MIN weight
    # (min over the per-value minima IS the global minimum, so the
    # non-negativity gate below reads the device's cached frame instead
    # of paying its own full-data aggregate pass)
    per_v = src.groupBy(*group_cols, "__v").agg(
        F.sum("__w").alias("__w"),
        F.count(F.lit(1)).alias("__nv"),
        F.min("__w").alias("__minw"),
    )
    cum = ranged_prefix_sums(
        per_v, ["__v"], {"__cumw": "__w"}, group_cols=list(group_cols)
    )
    ok = _domain_gate(
        cum.agg(F.min("__minw").alias("_minw")),
        # empty input -> NULL min -> pass (0-row output downstream)
        F.coalesce(F.col("_minw") >= 0, F.lit(True)),
        F.concat(
            F.lit("weighted_quantile: negative weight found (min="),
            # _minw is in micros — shift back to weight units for the
            # message (same string the DECIMAL path produced)
            (F.col("_minw").cast("decimal(28,6)") / 1_000_000)
            .cast("decimal(18,6)")
            .cast("string"),
            F.lit("). Weights must be non-negative."),
        ),
    )
    cum = cum.drop("__minw").crossJoin(F.broadcast(ok)).drop("_domain_ok")
    gtot = cum.groupBy(*group_cols).agg(
        F.max("__cumw").alias("__totw"), F.sum("__nv").alias("__n")
    )
    crossed = F.lit(q_den) * F.col("__cumw") >= F.lit(q_num) * F.col(
        "__totw"
    )
    # null-safe totals join (same contract as robust_zscore/winsorize):
    # the NULL-key group is a group — a plain key join would silently
    # drop it from the output (r11 NULL-salt parity)
    ren = gtot
    for i, c in enumerate(group_cols):
        ren = ren.withColumnRenamed(c, f"_g{i}")
    cond = F.lit(True)
    for i, c in enumerate(group_cols):
        cond = cond & cum[c].eqNullSafe(F.col(f"_g{i}"))
    flagged = cum.join(F.broadcast(ren), cond).drop(
        *[f"_g{i}" for i in range(len(group_cols))]
    ).filter(crossed)
    # micros -> DECIMAL(28,6) -> double: the division is exact (the
    # value has <= 6 decimals), and (28,6) is the type the old
    # sum-of-DECIMAL(18,6) produced — so the double is bit-identical
    tot_units = (
        (F.first("__totw").cast("decimal(28,6)") / 1_000_000)
        .cast("decimal(28,6)")
        .cast("double")
    )
    return flagged.groupBy(*group_cols).agg(
        F.min("__v").alias("wq_value"),
        tot_units.alias("total_weight"),
        F.first("__n").alias("n"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    label_a: str,
    label_b: str,
    z_crit: float = Z_CRIT_95,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) two-sample test with the
    normal approximation and tie correction — the nonparametric
    "did the distribution shift" test that needs no variance
    assumptions.

    Built on the DISTINCT-VALUE frame, not per-row ranks: one
    groupBy(value) collapses both samples to (value, cnt_a, cnt_b),
    then the midrank mass accumulates via the RANGE-PARTITIONED
    two-pass prefix sum (:func:`~qudo_etl_pipeline_spark.operators.
    prefix.ranged_prefix_sums` — NOT a global ``Window.orderBy``, which
    would move the whole frame through one task: harmless on a bounded
    value domain, a scale-killer on a continuous measure whose distinct
    count approaches the row count). All rank mass stays in INTEGER
    arithmetic via the doubling trick: 2·R_a = sum cnt_a·(2·cum_before
    + cnt + 1) is a bigint, so R_a, U_a and the z numerator are exact
    halves — no summation-order drift, bit-identical cross-engine (the
    device reassociates additions, which is a no-op on integers).
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round
    from qudo_etl_pipeline_spark.operators.prefix import (
        ranged_prefix_sums,
    )

    g = F.col(group_col)
    per_v = (
        df.filter(g.isin([label_a, label_b]) & F.col(value_col).isNotNull())
        .groupBy(value_col)
        .agg(
            F.sum(F.when(g == label_a, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(g == label_b, 1).otherwise(0)).alias("cb"),
        )
        .withColumn("_ct", F.col("ca") + F.col("cb"))
    )
    cum = ranged_prefix_sums(
        per_v, [value_col], {"_cum": "_ct"}, inclusive=False
    )
    ranked = cum.select(
        "ca",
        "cb",
        F.col("_ct").alias("ct"),
        (
            F.col("ca")
            * (F.lit(2) * F.col("_cum") + F.col("_ct") + F.lit(1))
        ).alias("r2a"),
    )
    agg = ranked.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum("r2a").alias("r2_a"),
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct")).alias(
            "t3"
        ),
    )
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    nn = n_a + n_b
    u2 = F.col("r2_a") - F.col("n_a") * (F.col("n_a") + F.lit(1))
    num = (u2.cast("double") - n_a * n_b) / F.lit(2.0)
    var = (
        n_a * n_b / F.lit(12.0)
        * (
            (nn + F.lit(1.0))
            - F.col("t3").cast("double") / (nn * (nn - F.lit(1.0)))
        )
    )
    z = F.when(var > 0, num / F.sqrt(var))
    return agg.select(
        "n_a",
        "n_b",
        (u2.cast("double") / F.lit(2.0)).alias("u_a"),
        ref_round(z, 6).alias("z6"),
        F.when(F.abs(z) > F.lit(z_crit), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_significant"),
    )


def hill_tail_index(
    df: DataFrame,
    value_col: str,
    d_min: int,
) -> DataFrame:
    """Hill estimator of a power-law tail exponent: alpha = 1 +
    n_tail / sum(ln(x / d_min)) over the tail x >= d_min — the
    standard heavy-tail diagnostic for degree/activity/frequency
    distributions (is this key-popularity curve Zipfian, and how
    hard will it skew my shuffles?).

    ONE filtered aggregate over the DISTINCT-value frame (value
    domain-sized): each distinct value contributes count·ln(v/d_min)
    as a deterministic per-value double expression QUANTIZED to
    DECIMAL(38,12), and the tail sum accumulates in DECIMAL — exact
    and association-free, so the total is bit-identical in any engine
    under ANY aggregation order (no ordered window anywhere in the
    plan; the quantization error is 1e-12 per term, ~9 decimal digits
    below the 1e-6 output rounding at any plausible tail size).
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    per_v = (
        df.filter(F.col(value_col) >= d_min)
        .groupBy(F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("m"))
    )
    term = (
        F.col("m").cast("double")
        * F.log(F.col("v").cast("double") / F.lit(float(d_min)))
    ).cast("decimal(38,12)")
    agg = per_v.agg(
        F.sum("m").alias("n_tail"),
        F.sum(term).alias("_lnsum"),
    ).filter(F.col("n_tail").isNotNull())
    alpha = (
        F.lit(1.0)
        + F.col("n_tail").cast("double") / F.col("_lnsum").cast("double")
    )
    return agg.select(
        F.lit(d_min).cast("bigint").alias("d_min"),
        F.col("n_tail"),
        F.when(F.col("_lnsum") > 0, ref_round(alpha, 6)).alias("alpha6"),
    )


def gini_coefficient(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Gini coefficient (inequality) of a non-negative INTEGER measure
    — how concentrated is activity/spend across keys (0 = uniform,
    ->1 = one key holds everything).

    Runs on the distinct-value frame with midrank mass: with m_v keys
    at value v, 2·sum(rank_i·x_i) = sum_v v·m_v·(2·cum_before + m_v
    + 1) — a pure bigint — so G = that/(n·sum x) − (n+1)/n is one
    fixed IEEE expression over exact integers, bit-identical in any
    engine (ties need no ordering decisions: equal values contribute
    identically under any tie order). The running count is the
    RANGE-PARTITIONED two-pass prefix sum, so a high-cardinality value
    domain never funnels through a single ordered task.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round
    from qudo_etl_pipeline_spark.operators.prefix import (
        ranged_prefix_sums,
    )

    per_v = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).cast("bigint").alias("v"))
        .agg(F.count(F.lit(1)).alias("m"))
    )
    cum = ranged_prefix_sums(per_v, ["v"], {"_cum": "m"}, inclusive=False)
    terms = cum.select(
        "v",
        "m",
        (
            F.col("v")
            * F.col("m")
            * (F.lit(2) * F.col("_cum") + F.col("m") + 1)
        ).alias("r2x"),
    )
    agg = terms.agg(
        F.sum("m").alias("n"),
        F.sum(F.col("v") * F.col("m")).alias("sx"),
        F.sum("r2x").alias("r2x"),
    )
    n = F.col("n").cast("double")
    g = F.col("r2x").cast("double") / (
        n * F.col("sx").cast("double")
    ) - (n + F.lit(1.0)) / n
    return agg.select(
        "n",
        "sx",
        F.when(F.col("sx") > 0, ref_round(g, 6)).alias("gini6"),
    )


#: Poisson(1) CDF thresholds quantized to 1e-6 — the inverse-CDF table
#: both engines use to draw deterministic bootstrap weights.
_POISSON1_CDF_PPM = [367879, 735758, 919698, 980998, 996323, 999405]


def bootstrap_ci_mean(
    df: DataFrame,
    id_col: str,
    value_col: str,
    n_boot: int = 200,
    alpha: float = 0.05,
    seed: int = 17,
) -> DataFrame:
    """Percentile-bootstrap confidence interval for the mean, via the
    POISSON bootstrap — the resampling scheme that works on a dataset
    too large to index: replicate r counts row i with weight
    w ~ Poisson(1), drawn DETERMINISTICALLY from the seeded hash of
    (id, r) through a quantized inverse-CDF table, so the whole CI is
    reproducible in any engine (no rng state, no shuffle of samples).

    Cost shape: one pass with an in-map ``n_boot``-way fan-out that
    collapses immediately under map-side combine — the shuffle carries
    n_boot partial rows per partition, never n x n_boot rows. The
    replicate means (a ``n_boot``-row frame) resolve to the percentile
    interval in one sketch-sized aggregate. n_boot is the CPU knob.

    Returns 1 row: n, mean6 (full-sample, DECIMAL-exact), ci_lo6,
    ci_hi6, n_boot. Weights are integers 0..6, so every replicate sum
    is DECIMAL-exact.
    """
    from qudo_etl_pipeline_spark.functions.hashing import (
        UNIVERSAL_MOD,
        UNIVERSAL_RANGE,
        hash64,
    )
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    src = df.filter(F.col(value_col).isNotNull()).select(
        F.col(id_col).cast("string").alias("__id"),
        F.col(value_col).alias("__v"),
    )
    # ONE md5 per ROW; per-replicate uniforms come from the affine
    # universal family (hashing.py) with the replicate id as a column —
    # a and b are the same closed forms affine_params() uses, so the
    # md5 cost is 1/n_boot of a per-(row, replicate) hash (measured
    # 78 s -> 20 s at sf0.1, B=200 — the remainder is the DECIMAL
    # replicate accumulation, which is the exactness contract) while
    # the draws stay pairwise independent
    base = (
        hash64(F.concat(F.lit(f"{seed}:"), F.col("__id")))
        % UNIVERSAL_RANGE
    )
    r = F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("__r")
    rl = F.col("__r").cast("long")
    a_raw = (rl * F.lit(2_654_435_761) + 1) % UNIVERSAL_MOD
    a = F.when(a_raw == 0, F.lit(1)).otherwise(a_raw)
    b = (rl * F.lit(1_013_904_223) + 12_345) % UNIVERSAL_MOD
    u = ((a * F.col("__b") + b) % UNIVERSAL_MOD) % 1_000_000
    w = F.lit(6)
    for k in range(len(_POISSON1_CDF_PPM) - 1, -1, -1):
        w = F.when(u < _POISSON1_CDF_PPM[k], F.lit(k)).otherwise(w)
    # The exactness contract runs on the UNSCALED representation: the
    # value becomes exact integer micros ONCE per row (a decimal cast +
    # scale shift), the per-(row, replicate) hot path is then pure
    # BIGINT multiply-add (~10x cheaper than per-pair decimal ops —
    # measured 18 s -> ~6 s at sf0.1, B=200), and each replicate sum is
    # shifted back through DECIMAL so the final double is bit-identical
    # to the old decimal(28,6) accumulation (same exact rational, one
    # double rounding). Range: the bigint replicate sum holds
    # |sum(w * v)| < 9.2e12 in value units (w <= 6) — ANSI mode makes
    # an overflow loud, not a wraparound.
    vmic = (F.col("__v").cast("decimal(18,6)") * 1_000_000).cast(
        "bigint"
    )
    reps = (
        src.select(base.alias("__b"), vmic.alias("__vm"))
        .select("__b", "__vm", r)
        .select("__r", w.alias("__w"), F.col("__vm"))
        .groupBy("__r")
        .agg(
            (
                (
                    F.sum(F.col("__w") * F.col("__vm")).cast(
                        "decimal(28,6)"
                    )
                    / F.lit(1_000_000)
                ).cast("double")
                / F.sum("__w").cast("double")
            ).alias("__m")
        )
    )
    lo, hi = alpha / 2.0, 1.0 - alpha / 2.0
    ci = reps.agg(
        F.percentile("__m", F.array(F.lit(lo), F.lit(hi))).alias("_ci")
    )
    base = src.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("__v").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_mean"),
    )
    return base.crossJoin(F.broadcast(ci)).select(
        "n",
        ref_round(F.col("_mean"), 6).alias("mean6"),
        ref_round(F.col("_ci")[0], 6).alias("ci_lo6"),
        ref_round(F.col("_ci")[1], 6).alias("ci_hi6"),
        F.lit(n_boot).cast("bigint").alias("n_boot"),
    )


def cohort_ltv(
    events: DataFrame,
    revenue_types: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Cohort lifetime-value curves: users cohort by first-active day,
    and each (cohort, day_offset) row carries the cohort's cumulative
    revenue per user up to that age — the payback-period table every
    growth dashboard draws.

    Shape: the retention_cohorts device (distinct user-day activity,
    min-day cohorts, one user-keyed join) plus a revenue aggregate to
    the (cohort, offset) frame; the running total is an ordered window
    over that DATE-DOMAIN-bounded frame, never over events. Revenue
    accumulates in DECIMAL end to end, so the cumulative sums are
    exact and engine-identical.

    Output: (cohort_day, day_offset, cohort_size, rev, cum_rev,
    ltv6 = cum_rev / cohort_size). Offsets appear only where the
    cohort had revenue that day.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    cohort = (
        events.select(
            F.col(user_col).alias("u"), F.to_date(F.col(ts_col)).alias("d")
        )
        .groupBy("u")
        .agg(F.min("d").alias("c"))
    )
    rev = (
        events.filter(F.col(type_col).isin(revenue_types))
        .select(
            F.col(user_col).alias("u"),
            F.to_date(F.col(ts_col)).alias("d"),
            F.col(value_col).cast("decimal(18,6)").alias("v"),
        )
        .join(cohort, "u")
        .groupBy(
            F.date_format("c", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "c").cast("bigint").alias("day_offset"),
        )
        .agg(F.sum("v").alias("_rev"))
    )
    sizes = cohort.groupBy(
        F.date_format("c", "yyyy-MM-dd").alias("cohort_day")
    ).agg(F.count(F.lit(1)).alias("cohort_size"))
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("_rev").over(w)
    return (
        rev.join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "cohort_size",
            F.col("_rev").cast("double").alias("rev"),
            cum.cast("double").alias("cum_rev"),
            ref_round(
                cum.cast("double") / F.col("cohort_size").cast("double"),
                6,
            ).alias("ltv6"),
        )
    )


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    label_a: str,
    label_b: str,
    alpha_c: float = 1.3581015157406195,
    bins: int | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test: D = max over v of
    |F_a(v) - F_b(v)| between the two samples' empirical CDFs — the
    distribution-shape companion to Mann-Whitney's location shift.

    Same frame discipline as :func:`mann_whitney_u`: ONE
    groupBy(value) collapses both samples to (value, cnt_a, cnt_b),
    the ECDF running sums come from the RANGE-PARTITIONED two-pass
    prefix sum (:func:`~qudo_etl_pipeline_spark.operators.prefix.
    ranged_prefix_sums` — never a global ``Window.orderBy``, so a
    CONTINUOUS measure whose distinct-value frame approaches the row
    count still spreads over every core), and the deviation maximized
    is the INTEGER cross-multiplied form |n_b*cum_a - n_a*cum_b|
    (totals ride a 1-row broadcast), so the argmax is exact and
    tie-free cross-engine; only the final normalization divides.
    Significance: D > c(alpha) * sqrt((n_a+n_b)/(n_a*n_b)),
    c(0.05) = 1.3581... (the classic large-sample critical value).

    ``bins=B`` optionally pre-buckets the measure into B equi-width
    bins on the pooled [min, max] (a broadcast 1-row range), shrinking
    the frame from the distinct-value count to B regardless of
    cardinality. Discretization error bound: the binned ECDFs agree
    with the exact ones at every bin edge, and inside a bin each ECDF
    moves by at most that bin's sample mass, so
    D_binned <= D_exact <= D_binned + max_bin max(p_a_bin, p_b_bin);
    with B equi-width bins on a roughly uniform measure that slack is
    O(1/B). The test stays conservative (never inflates D).

    Returns 1 row: (n_a, n_b, d6, crit6, is_significant).
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round
    from qudo_etl_pipeline_spark.operators.prefix import (
        ranged_prefix_sums,
    )

    g = F.col(group_col)
    src = df.filter(
        g.isin([label_a, label_b]) & F.col(value_col).isNotNull()
    ).select(g.alias("_g"), F.col(value_col).alias("_v"))
    if bins is not None:
        rng = src.agg(
            F.min(F.col("_v").cast("double")).alias("_lo"),
            F.max(F.col("_v").cast("double")).alias("_hi"),
        )
        width = (F.col("_hi") - F.col("_lo")) / F.lit(bins)
        bucket = F.greatest(
            F.lit(0),
            F.least(
                F.lit(bins - 1),
                F.floor(
                    (F.col("_v").cast("double") - F.col("_lo")) / width
                ),
            ),
        ).cast("bigint")
        src = src.crossJoin(F.broadcast(rng)).select(
            "_g",
            # degenerate range (all values equal) -> one bucket, and
            # width=0 would divide by zero under ANSI
            F.when(width > 0, bucket).otherwise(F.lit(0)).alias("_v"),
        )
    per_v = src.groupBy("_v").agg(
        F.sum(F.when(F.col("_g") == label_a, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("_g") == label_b, 1).otherwise(0)).alias("cb"),
    )
    tot = per_v.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    cums = ranged_prefix_sums(
        per_v, ["_v"], {"_ca": "ca", "_cb": "cb"}, inclusive=True
    )
    dev = F.abs(
        F.col("_ca") * F.col("n_b") - F.col("_cb") * F.col("n_a")
    )
    agg = (
        cums.crossJoin(F.broadcast(tot))
        .select(dev.alias("_dev"), "n_a", "n_b")
        .groupBy("n_a", "n_b")
        .agg(F.max("_dev").alias("_dmax"))
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    d = F.col("_dmax").cast("double") / (na * nb)
    crit = F.lit(alpha_c) * F.sqrt((na + nb) / (na * nb))
    return agg.select(
        "n_a",
        "n_b",
        ref_round(d, 6).alias("d6"),
        ref_round(crit, 6).alias("crit6"),
        F.when(d > crit, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_significant"),
    )


def _domain_gate(card: DataFrame, cond, err) -> DataFrame:
    """1-row broadcast gate that ENFORCES a domain-size contract.

    ``card`` is a 1-row cardinality frame (one cheap aggregate over a
    frame the plan builds anyway), ``cond`` the boolean contract over
    it, ``err`` the error-message Column. The returned 1-row frame
    evaluates ``F.assert_true`` when it materializes — crossJoin
    (broadcast) it into the plan BEFORE the stage whose cost the
    contract bounds, so that stage can never start against an
    oversized domain. This is the ``theil_sen_slope`` enforcement
    device (temporal.py): assert_true inside a filter is not prunable
    by the optimizer and materializes with the broadcast build side.
    """
    gate = F.assert_true(cond, err)
    return card.filter(gate.isNull()).select(
        F.lit(1).alias("_domain_ok")
    )


def _oversize_err(what: str, cap: int, *counts) -> "F.Column":
    """Error Column for :func:`_domain_gate` carrying the measured
    cardinalities, so the failure names the violated contract."""
    parts = [F.lit(f"{what}: domain exceeds max_domain={cap} (got ")]
    for i, c in enumerate(counts):
        if i:
            parts.append(F.lit(" x "))
        parts.append(c.cast("string"))
    parts.append(
        F.lit(
            "). Pre-bin continuous measures (or pass "
            "on_excess='bin' where supported)."
        )
    )
    return F.concat(*parts)


def _equiwidth_pair_bin(
    df: DataFrame, col_a: str, col_b: str, bins: int
) -> DataFrame:
    """Equi-width discretization of two numeric columns onto
    ``[0, bins)`` bucket indexes — the ``ks_two_sample(bins=B)``
    device applied per column. Each column's min/max ride ONE 1-row
    broadcast; the bucket transform is monotone, so rank statistics
    over the buckets are the standard binned variants. A degenerate
    (constant) column collapses to bucket 0 — width=0 never divides
    under ANSI.
    """
    rng = df.agg(
        F.min(F.col(col_a).cast("double")).alias("_loa"),
        F.max(F.col(col_a).cast("double")).alias("_hia"),
        F.min(F.col(col_b).cast("double")).alias("_lob"),
        F.max(F.col(col_b).cast("double")).alias("_hib"),
    )

    def bucket(c: str, lo: str, hi: str):
        width = (F.col(hi) - F.col(lo)) / F.lit(bins)
        b = F.greatest(
            F.lit(0),
            F.least(
                F.lit(bins - 1),
                F.floor(
                    (F.col(c).cast("double") - F.col(lo)) / width
                ),
            ),
        ).cast("bigint")
        # NULL-preserving: greatest/least SKIP nulls, so without the
        # leading isNull branch a NULL value would collapse to
        # greatest(0, least(bins-1, NULL)) = bins-1 and survive the
        # callers' post-bin isNotNull exclusion as a phantom top-bucket
        # observation.
        return (
            F.when(F.col(c).isNull(), F.lit(None).cast("bigint"))
            .when(width > 0, b)
            .otherwise(F.lit(0).cast("bigint"))
        )

    return df.crossJoin(F.broadcast(rng)).select(
        bucket(col_a, "_loa", "_hia").alias(col_a),
        bucket(col_b, "_lob", "_hib").alias(col_b),
    )


def mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
    max_domain: int = 10_000,
) -> DataFrame:
    """Mutual information I(A;B) between two categorical columns in
    nats, plus both entropies and the normalized MI
    (NMI = I / sqrt(H_A * H_B)) — the effect-size companion to the
    chi-squared family that is comparable ACROSS tables of different
    shapes (Cramér's V saturates differently with table size).

    Shape: ONE groupBy(a, b) collapses the table to the cell frame
    (|A|·|B| rows, bounded by the category domains); marginals and the
    grand total derive from that frame (never a second table scan) and
    ride broadcasts. Determinism: every ln term is a fixed IEEE
    expression over exact integer counts, QUANTIZED to DECIMAL(38,12)
    before summation (the hill_tail_index device) — the sums are
    association-free and bit-identical cross-engine; only the final
    1-row normalization divides.

    The bounded-domain contract is ENFORCED, not just documented:
    both marginal cardinalities are checked against ``max_domain`` by
    a plan-side :func:`_domain_gate` (one countDistinct aggregate over
    the cell frame, asserted before the marginal broadcasts build), so
    a raw continuous column fails loudly instead of silently riding
    row-count-sized broadcast marginals. Pre-bin continuous measures
    (the ``ks_two_sample(bins=B)`` equi-width device).

    Returns 1 row: (n, mi6, h_a6, h_b6, nmi6); empty input -> 0 rows.
    NULLs in either column are excluded. NMI is NULL when either
    marginal entropy is 0 (a constant column carries no information).
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    from qudo_etl_pipeline_spark.operators.prefix import (
        acquire_operator_cache,
    )

    a, b = F.col(col_a), F.col(col_b)
    # materialize the cell collapse ONCE so "marginals and the grand
    # total derive from that frame (never a second table scan)" holds
    # physically: the gate probe, both marginals, the total and the MI
    # join are five plan branches, and without a cache each re-runs
    # the scan + groupBy (measured: 16 parquet scans for the catalog
    # query). The frame is |A|·|B| rows, gate-bounded below.
    cells = acquire_operator_cache(
        df.filter(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("_a"), b.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_nab"))
    )
    card = cells.agg(
        F.countDistinct("_a").alias("_da"),
        F.countDistinct("_b").alias("_db"),
    )
    ok = _domain_gate(
        card,
        (F.col("_da") <= max_domain) & (F.col("_db") <= max_domain),
        _oversize_err(
            "mutual_information", max_domain,
            F.col("_da"), F.col("_db"),
        ),
    )
    cells = cells.crossJoin(F.broadcast(ok)).drop("_domain_ok")
    ma = cells.groupBy("_a").agg(F.sum("_nab").alias("_na"))
    mb = cells.groupBy("_b").agg(F.sum("_nab").alias("_nb"))
    tot = cells.agg(F.sum("_nab").alias("_n"))
    dn = F.col("_n").cast("double")
    mi_term = (
        F.col("_nab").cast("double")
        * F.log(
            (dn * F.col("_nab").cast("double"))
            / (F.col("_na").cast("double") * F.col("_nb").cast("double"))
        )
    ).cast("decimal(38,12)")
    mis = (
        cells.join(F.broadcast(ma), "_a")
        .join(F.broadcast(mb), "_b")
        .crossJoin(F.broadcast(tot))
        .agg(F.sum(mi_term).alias("_mis"), F.max("_n").alias("n"))
        .filter(F.col("n").isNotNull())
    )

    def _entropy(marg: DataFrame, cnt: str, out: str) -> DataFrame:
        term = (
            F.col(cnt).cast("double")
            * F.log(dn / F.col(cnt).cast("double"))
        ).cast("decimal(38,12)")
        return marg.crossJoin(F.broadcast(tot)).agg(
            F.sum(term).alias(out)
        )

    ha = _entropy(ma, "_na", "_has")
    hb = _entropy(mb, "_nb", "_hbs")
    n = F.col("n").cast("double")
    mi = F.col("_mis").cast("double") / n
    h_a = F.col("_has").cast("double") / n
    h_b = F.col("_hbs").cast("double") / n
    nmi = mi / F.sqrt(h_a * h_b)
    return (
        mis.crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
        .select(
            "n",
            ref_round(mi, 6).alias("mi6"),
            ref_round(h_a, 6).alias("h_a6"),
            ref_round(h_b, 6).alias("h_b6"),
            F.when((h_a > 0) & (h_b > 0), ref_round(nmi, 6)).alias(
                "nmi6"
            ),
        )
    )


def kendall_tau_b(
    df: DataFrame,
    col_a: str,
    col_b: str,
    max_domain: int = 128,
    on_excess: str = "error",
) -> DataFrame:
    """Kendall's tau-b rank correlation between two ORDINAL columns,
    computed exactly from the contingency cells with the standard tie
    correction: tau_b = (C - D) / sqrt((n0 - n1)(n0 - n2)), where C/D
    are concordant/discordant pair counts, n0 = n(n-1)/2 and n1/n2 the
    within-marginal tie pair counts.

    Deliberately a CELL-frame operator (the domain-bounded contract
    Mann-Whitney documents): the table collapses to |A|·|B| cells in
    ONE groupBy, and C/D come from the cell-frame self-join
    sum_{i<i'} n_ij · n_i'j' split by j-direction — |cells|² work,
    bounded by the category domains, NEVER an O(rows²) pair join. The
    contract is ENFORCED by ``max_domain`` (default 128, bounding the
    cell self-join at ~(128²)² evaluated pairs):

    - ``on_excess="error"`` (default): a plan-side
      :func:`_domain_gate` asserts both marginal cardinalities before
      the cell self-join builds, so a raw continuous column fails
      loudly with the measured domains instead of silently going
      quadratic in |cells|.
    - ``on_excess="bin"``: both columns are equi-width discretized
      onto ``max_domain`` buckets first (:func:`_equiwidth_pair_bin`
      — monotone, so this is the standard binned tau-b; requires
      numeric/castable columns).

    Pair counts are ~n²/2 and the
    denominator ~n⁴, far past bigint at scale, so every product
    accumulates in DECIMAL(38,0) (HUGEINT in the oracle) — exact to
    n ≲ 3·10⁹ observations, the same documented moment bound as
    :func:`spearman_rho` (sample beyond that; rank statistics
    stabilize long before). tau_b is one fixed IEEE expression over
    those exact integers.

    Returns 1 row: (n, conc, disc, tau_b6) with conc/disc as exact
    DECIMAL pair counts; empty input -> 0 rows. tau_b6 is NULL when
    either margin is constant (denominator 0).
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round
    from qudo_etl_pipeline_spark.operators.prefix import (
        acquire_operator_cache,
    )

    if on_excess not in ("error", "bin"):
        raise ValueError(f"unknown on_excess policy: {on_excess!r}")
    if on_excess == "bin":
        df = _equiwidth_pair_bin(df, col_a, col_b, max_domain)
    a, b = F.col(col_a), F.col(col_b)
    # cached once: the gate probe and every marginal/pair branch below
    # would otherwise each re-run the scan + groupBy from the source
    # (measured: 6-8 parquet scans per catalog query); the frame is
    # |A|·|B| cells, gate/bin-bounded
    cells = acquire_operator_cache(
        df.filter(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("_a"), b.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_nab"))
    )
    if on_excess == "error":
        card = cells.agg(
            F.countDistinct("_a").alias("_da"),
            F.countDistinct("_b").alias("_db"),
        )
        ok = _domain_gate(
            card,
            (F.col("_da") <= max_domain)
            & (F.col("_db") <= max_domain),
            _oversize_err(
                "kendall_tau_b", max_domain,
                F.col("_da"), F.col("_db"),
            ),
        )
        cells = cells.crossJoin(F.broadcast(ok)).drop("_domain_ok")
    lo = cells.select(
        F.col("_a").alias("_a1"),
        F.col("_b").alias("_b1"),
        F.col("_nab").alias("_n1"),
    )
    hi = cells.select(
        F.col("_a").alias("_a2"),
        F.col("_b").alias("_b2"),
        F.col("_nab").alias("_n2"),
    )
    cross = lo.crossJoin(F.broadcast(hi)).filter(
        F.col("_a2") > F.col("_a1")
    )
    dec = "decimal(38,0)"
    prod = F.col("_n1").cast(dec) * F.col("_n2").cast(dec)
    zero = F.lit(0).cast(dec)
    cd = cross.agg(
        F.sum(
            F.when(F.col("_b2") > F.col("_b1"), prod).otherwise(zero)
        ).alias("conc"),
        F.sum(
            F.when(F.col("_b2") < F.col("_b1"), prod).otherwise(zero)
        ).alias("disc"),
    )
    ties_a = (
        cells.groupBy("_a")
        .agg(F.sum("_nab").alias("_m"))
        .agg(
            F.sum(
                F.col("_m").cast(dec) * (F.col("_m") - 1).cast(dec)
            ).alias("_t1x2"),
            F.sum("_m").alias("_n"),
        )
    )
    ties_b = (
        cells.groupBy("_b")
        .agg(F.sum("_nab").alias("_m"))
        .agg(
            F.sum(
                F.col("_m").cast(dec) * (F.col("_m") - 1).cast(dec)
            ).alias("_t2x2")
        )
    )
    joined = (
        cd.crossJoin(F.broadcast(ties_a))
        .crossJoin(F.broadcast(ties_b))
        .filter(F.col("_n").isNotNull())
    )
    # doubled pair counts keep everything integral: 2*n0 = n(n-1),
    # 2*n1 = sum m(m-1) — the ratio is unchanged
    n0x2 = F.col("_n").cast(dec) * (F.col("_n") - 1).cast(dec)
    den = (
        (n0x2 - F.col("_t1x2")).cast("double")
        * (n0x2 - F.col("_t2x2")).cast("double")
    )
    tau = (
        F.lit(2.0)
        * (F.col("conc") - F.col("disc")).cast("double")
        / F.sqrt(den)
    )
    return joined.select(
        F.col("_n").alias("n"),
        # bigint on the OUTPUT is safe within the documented n bound
        # (conc <= n^2/2 < 2^63 for n <= 4e9); the DECIMAL accumulation
        # above is what protects the intermediates
        F.coalesce(F.col("conc"), F.lit(0)).cast("bigint").alias("conc"),
        F.coalesce(F.col("disc"), F.lit(0)).cast("bigint").alias("disc"),
        F.when(den > 0, ref_round(tau, 6)).alias("tau_b6"),
    )


def spearman_rho(
    df: DataFrame,
    col_a: str,
    col_b: str,
    max_domain: int = 1024,
    on_excess: str = "error",
) -> DataFrame:
    """Spearman rank correlation (tie-corrected, via midranks) between
    two ORDINAL columns — the rank-statistics companion to
    :func:`kendall_tau_b`: rho = Pearson correlation of the midrank
    transforms, computed EXACTLY from the contingency cells.

    Same domain-bounded cell-frame contract as Kendall/Mann-Whitney,
    and like :func:`kendall_tau_b` the contract is ENFORCED: the
    default ``on_excess="error"`` gates both marginal cardinalities at
    ``max_domain`` (default 1024 — the midrank windows are single-task
    by design, and the cell frame is bounded at max_domain²) via a
    plan-side :func:`_domain_gate` before the midrank windows build;
    ``on_excess="bin"`` equi-width discretizes both (numeric) columns
    onto ``max_domain`` buckets first — the standard binned variant.
    ONE groupBy(a, b) builds the cell
    frame; each marginal's midranks come from an ordered window over
    the DOMAIN-BOUNDED marginal frame (the deliberate bounded-window
    case) in DOUBLED integer form (2·midrank = 2·cum_before + m + 1 —
    a pure bigint, and the doubling cancels in the correlation); every
    moment then accumulates as DECIMAL(38,0) products of exact
    integers, so num/den are exact integers in any engine and only the
    final sqrt/divide is IEEE. Bound: the decimal moments hold to
    n ≲ 2·10^9 observations — beyond that, sample (rank correlations
    stabilize long before).

    Returns 1 row: (n, rho6); empty input -> 0 rows; rho6 NULL when
    either margin is constant.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round
    from qudo_etl_pipeline_spark.operators.prefix import (
        acquire_operator_cache,
    )

    if on_excess not in ("error", "bin"):
        raise ValueError(f"unknown on_excess policy: {on_excess!r}")
    if on_excess == "bin":
        df = _equiwidth_pair_bin(df, col_a, col_b, max_domain)
    a, b = F.col(col_a), F.col(col_b)
    # cached once: the gate probe and every marginal/pair branch below
    # would otherwise each re-run the scan + groupBy from the source
    # (measured: 6-8 parquet scans per catalog query); the frame is
    # |A|·|B| cells, gate/bin-bounded
    cells = acquire_operator_cache(
        df.filter(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("_a"), b.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_nab"))
    )
    if on_excess == "error":
        card = cells.agg(
            F.countDistinct("_a").alias("_da"),
            F.countDistinct("_b").alias("_db"),
        )
        ok = _domain_gate(
            card,
            (F.col("_da") <= max_domain)
            & (F.col("_db") <= max_domain),
            _oversize_err(
                "spearman_rho", max_domain,
                F.col("_da"), F.col("_db"),
            ),
        )
        cells = cells.crossJoin(F.broadcast(ok)).drop("_domain_ok")

    def _midranks(key: str, out: str) -> DataFrame:
        marg = cells.groupBy(key).agg(F.sum("_nab").alias("_m"))
        before = Window.orderBy(key).rowsBetween(
            Window.unboundedPreceding, -1
        )
        cum = F.coalesce(F.sum("_m").over(before), F.lit(0))
        return marg.select(
            key,
            (F.lit(2) * cum + F.col("_m") + F.lit(1)).alias(out),
        )

    ra = _midranks("_a", "_r2a")
    rb = _midranks("_b", "_r2b")
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    w = d(F.col("_nab"))
    x = d(F.col("_r2a"))
    y = d(F.col("_r2b"))
    m = (
        cells.join(F.broadcast(ra), "_a")
        .join(F.broadcast(rb), "_b")
        .agg(
            F.sum(w).alias("_w"),
            F.sum(w * x).alias("_sx"),
            F.sum(w * y).alias("_sy"),
            F.sum(w * x * x).alias("_sxx"),
            F.sum(w * y * y).alias("_syy"),
            F.sum(w * x * y).alias("_sxy"),
        )
        .filter(F.col("_w").isNotNull())
    )
    num = d(F.col("_w")) * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    vx = d(F.col("_w")) * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = d(F.col("_w")) * F.col("_syy") - F.col("_sy") * F.col("_sy")
    rho = num.cast("double") / (
        F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))
    )
    return m.select(
        F.col("_w").cast("bigint").alias("n"),
        F.when(
            (vx.cast("double") > 0) & (vy.cast("double") > 0),
            ref_round(rho, 6),
        ).alias("rho6"),
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    bins: int = 10,
    floor_ppm: int = 100,
) -> DataFrame:
    """Population Stability Index between two samples of a numeric
    measure — the standard model/feature drift monitor
    (PSI = sum (p_a - p_b) * ln(p_a / p_b) over bins; rule of thumb:
    <0.1 stable, 0.1-0.25 drifting, >0.25 shifted).

    Bins are equi-width on the POOLED min/max (a broadcast 1-row
    range, the binned-KS device) so both samples discretize
    identically; empty-bin shares are floored at ``floor_ppm`` parts
    per million (the standard epsilon guard, applied IDENTICALLY to
    both sides so a bin empty in both contributes ~0). Each bin's PSI
    term is a fixed IEEE expression over exact integer counts
    quantized to DECIMAL(38,12) before the sum (the hill device) —
    association-free, engine-identical.

    Returns 1 row: (n_a, n_b, n_bins_used, psi6); empty input on
    either side -> 0 rows.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    a = df_a.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("_v"), F.lit(0).alias("_s")
    )
    b = df_b.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("_v"), F.lit(1).alias("_s")
    )
    u = a.unionByName(b)
    rng = u.agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
    width = (F.col("_hi") - F.col("_lo")) / F.lit(bins)
    bucket = F.greatest(
        F.lit(0),
        F.least(
            F.lit(bins - 1),
            F.floor((F.col("_v") - F.col("_lo")) / width),
        ),
    ).cast("bigint")
    binned = u.crossJoin(F.broadcast(rng)).select(
        "_s",
        F.when(width > 0, bucket).otherwise(F.lit(0)).alias("_b"),
    )
    from qudo_etl_pipeline_spark.operators.prefix import (
        acquire_operator_cache,
    )

    # the bins-row aggregate feeds the totals branch and the term join
    # — cached so the union + range-attach + bin pass runs once, not
    # three times (the pooled min/max pass stays: bounds must exist
    # before the bins)
    per_b = acquire_operator_cache(
        binned.groupBy("_b").agg(
            F.sum(F.when(F.col("_s") == 0, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("_s") == 1, 1).otherwise(0)).alias("cb"),
        )
    )
    tot = per_b.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.count(F.lit(1)).alias("n_bins_used"),
    )
    j = per_b.crossJoin(F.broadcast(tot))
    floor = F.lit(floor_ppm).cast("double") / F.lit(1_000_000.0)
    pa = F.greatest(
        F.col("ca").cast("double") / F.col("n_a").cast("double"), floor
    )
    pb = F.greatest(
        F.col("cb").cast("double") / F.col("n_b").cast("double"), floor
    )
    term = ((pa - pb) * F.log(pa / pb)).cast("decimal(38,12)")
    agg = j.groupBy("n_a", "n_b", "n_bins_used").agg(
        F.sum(term).alias("_psi")
    )
    return agg.filter(
        F.col("n_a").isNotNull() & (F.col("n_a") > 0) & (F.col("n_b") > 0)
    ).select(
        "n_a",
        "n_b",
        "n_bins_used",
        ref_round(F.col("_psi").cast("double"), 6).alias("psi6"),
    )


def gains_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_buckets: int = 10,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Cumulative gains / lift table for a scored binary outcome — the
    campaign-targeting evaluation every propensity model ships with:
    rank by score DESCENDING into ``n_buckets`` exact equal-count
    buckets, then per bucket the response rate, the cumulative capture
    of all responders, and the cumulative lift vs the base rate.

    Ranking is EXACT NTILE through the scale-safe closed-form device
    (:func:`~qudo_etl_pipeline_spark.ml.discretize.ntile_bucketize` on
    the negated score — never a single-task global window); ``tiebreak``
    columns must make the order total. The cumulative sums run over the
    ``n_buckets``-row aggregate frame (bounded window by construction).
    Counts are exact integers; every ratio is one fixed IEEE expression
    ref_round(6)ed.

    Output per bucket (1 = highest scores): (bucket, n, responders,
    resp_rate6, cum_capture6, cum_lift6).
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round
    from qudo_etl_pipeline_spark.ml.discretize import ntile_bucketize

    src = df.select(
        (-F.col(score_col).cast("double")).alias("_negscore"),
        F.col(label_col).cast("bigint").alias("_y"),
        *[F.col(t) for t in (tiebreak or [])],
    )
    from qudo_etl_pipeline_spark.operators.prefix import (
        acquire_operator_cache,
    )

    b = ntile_bucketize(
        src, "_negscore", n_buckets, list(tiebreak or [])
    )
    # the n_buckets-row aggregate feeds two branches (the totals
    # broadcast and the output join) — cached so the bucketize consumer
    # chain above the device cache runs once, not twice
    per_b = acquire_operator_cache(
        b.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("responders"),
        )
    )
    tot = per_b.agg(
        F.sum("n").alias("_tn"), F.sum("responders").alias("_tr")
    )
    upto = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum_n = F.sum("n").over(upto)
    cum_r = F.sum("responders").over(upto)
    j = per_b.crossJoin(F.broadcast(tot))
    base = F.col("_tr").cast("double") / F.col("_tn").cast("double")
    return j.select(
        "bucket",
        "n",
        "responders",
        ref_round(
            F.col("responders").cast("double") / F.col("n").cast("double"),
            6,
        ).alias("resp_rate6"),
        F.when(
            F.col("_tr") > 0,
            ref_round(
                cum_r.cast("double") / F.col("_tr").cast("double"), 6
            ),
        ).alias("cum_capture6"),
        F.when(
            F.col("_tr") > 0,
            ref_round(
                (cum_r.cast("double") / cum_n.cast("double")) / base, 6
            ),
        ).alias("cum_lift6"),
    )


def cuped_adjust(
    df: DataFrame,
    group_col: str,
    metric_col: str,
    covariate_col: str,
) -> DataFrame:
    """CUPED variance reduction for A/B metrics (Deng, Xu, Kohavi &
    Walker, WSDM'13): adjust each unit's metric by its PRE-EXPERIMENT
    covariate, Y' = Y - theta * (X - mean(X)) with
    theta = cov(Y, X) / var(X) pooled across groups — the industry-
    standard sensitivity boost (same expectation per group, variance
    shrunk by the squared correlation).

    ONE aggregate pass computes the pooled moments AND the per-group
    sums (grouping-set-free: per-group aggregates + a 1-row broadcast
    of the pooled moments). Determinism: every cross-term (y*x, x*x,
    ...) is quantized to DECIMAL(38,12) before summation (the hill
    device — sums become association-free and engine-identical); theta
    and the means are fixed IEEE expressions over those exact sums.

    Output: one row per group — (group, n, mean_metric6, mean_adj6,
    theta6, var_reduction6), where var_reduction6 = rho² (the fraction
    of metric variance CUPED removes). Groups with no variance in X
    return NULL theta-dependent columns. NULL metric/covariate rows
    are excluded.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    y = F.col(metric_col).cast("double")
    x = F.col(covariate_col).cast("double")
    d = lambda c: c.cast("decimal(38,12)")  # noqa: E731
    src = df.filter(y.isNotNull() & x.isNotNull()).select(
        F.col(group_col).alias("_g"), y.alias("_y"), x.alias("_x")
    )
    per_g = src.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d(F.col("_y"))).alias("_sy"),
        F.sum(d(F.col("_x"))).alias("_sx"),
    )
    pooled = src.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(d(F.col("_y"))).alias("_py"),
        F.sum(d(F.col("_x"))).alias("_px"),
        F.sum(d(F.col("_y") * F.col("_x"))).alias("_pyx"),
        F.sum(d(F.col("_x") * F.col("_x"))).alias("_pxx"),
        F.sum(d(F.col("_y") * F.col("_y"))).alias("_pyy"),
    )
    n = F.col("_n").cast("double")
    cov = F.col("_pyx").cast("double") - (
        F.col("_py").cast("double") * F.col("_px").cast("double") / n
    )
    varx = F.col("_pxx").cast("double") - (
        F.col("_px").cast("double") * F.col("_px").cast("double") / n
    )
    vary = F.col("_pyy").cast("double") - (
        F.col("_py").cast("double") * F.col("_py").cast("double") / n
    )
    theta = F.when(varx > 0, cov / varx)
    rho2 = F.when(
        (varx > 0) & (vary > 0), (cov * cov) / (varx * vary)
    )
    mean_x = F.col("_px").cast("double") / n
    gm_y = F.col("_sy").cast("double") / F.col("n").cast("double")
    gm_x = F.col("_sx").cast("double") / F.col("n").cast("double")
    adj = gm_y - theta * (gm_x - mean_x)
    return (
        per_g.crossJoin(F.broadcast(pooled))
        .select(
            F.col("_g").alias(group_col),
            "n",
            ref_round(gm_y, 6).alias("mean_metric6"),
            ref_round(adj, 6).alias("mean_adj6"),
            ref_round(theta, 6).alias("theta6"),
            ref_round(rho2, 6).alias("var_reduction6"),
        )
    )


def bh_fdr(
    df: DataFrame,
    key_col: str,
    p_col: str,
    alpha: float = 0.05,
    max_tests: int = 100_000,
) -> DataFrame:
    """Benjamini-Hochberg FDR adjustment over a family of test
    p-values — the multiple-testing companion to the chi-squared
    layer's Bonferroni: p_adj(i) = min_{j >= i} (m * p_(j) / j),
    clamped to 1, reject where p_adj <= alpha. BH controls the FALSE
    DISCOVERY RATE, the right guarantee when a pipeline runs hundreds
    of per-variable tests and Bonferroni would throw away all power.

    Deliberately a TEST-frame operator: the input is one row per test
    (metric-count sized — the frames the post-hoc layer emits), never
    per-observation rows; the contract is ENFORCED by a plan-side
    :func:`_domain_gate` on the row count (``max_tests``) before the
    ordered windows build. Ranks break p ties by ``key_col``, so the
    running min and every output are deterministic cross-engine; the
    rank window runs on the gated, bounded frame.

    Output: (key, p, rank, p_adj6, rejected) sorted by rank.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    src = df.filter(F.col(p_col).isNotNull()).select(
        F.col(key_col).alias("_k"), F.col(p_col).cast("double").alias("_p")
    )
    card = src.agg(F.count(F.lit(1)).alias("_m"))
    ok = _domain_gate(
        card,
        F.col("_m") <= max_tests,
        _oversize_err("bh_fdr", max_tests, F.col("_m")),
    )
    gated = src.crossJoin(F.broadcast(ok)).drop("_domain_ok")
    ranked = gated.crossJoin(F.broadcast(card)).withColumn(
        "_r", F.row_number().over(Window.orderBy("_p", "_k"))
    )
    stepped = ranked.withColumn(
        "_q",
        F.col("_m").cast("double")
        * F.col("_p")
        / F.col("_r").cast("double"),
    )
    tail_min = Window.orderBy(F.desc("_r")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    p_adj = F.least(F.lit(1.0), F.min("_q").over(tail_min))
    # `rejected` is EXACT step-up BH, decided multiplication-only:
    # reject ranks 1..k where k = max{r : m·p(r) <= alpha·r}. This is
    # algebraically `p_adj <= alpha` but never divides, so there is no
    # division-rounding at the boundary (deciding on the ROUNDED p_adj6
    # mis-rejected true p_adj in (alpha, alpha + 5e-7]); p_adj6 stays
    # the 6-dp display value.
    hit = F.when(
        F.col("_m").cast("double") * F.col("_p")
        <= F.lit(float(alpha)) * F.col("_r").cast("double"),
        F.lit(1),
    ).otherwise(F.lit(0))
    return stepped.select(
        F.col("_k").alias(key_col),
        F.col("_p").alias(p_col),
        F.col("_r").alias("rank"),
        ref_round(p_adj, 6).alias("p_adj6"),
        F.max(hit).over(tail_min).cast("bigint").alias("rejected"),
    ).orderBy("rank")


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """EXACT ROC-AUC of a score against a binary label via the rank
    statistic AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg) with
    midranks for tied scores — identical to the trapezoidal ROC
    integral, no threshold sweep, no sampling.

    The :func:`mann_whitney_u` machinery verbatim (AUC IS the
    normalized U statistic): ONE groupBy(score) collapses to the
    distinct-score frame, the rank mass accumulates through the
    range-partitioned prefix device (never a global ``Window.orderBy``
    — a continuous score's distinct count approaches the row count),
    and the doubling trick keeps everything integral: 2·R_pos is a
    DECIMAL(38,0)-exact sum, so the numerator is exact in any engine
    and only the final division is IEEE.

    Returns 1 row: (n_pos, n_neg, auc6); AUC NULL when either class
    is empty. NULL scores/labels excluded.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round
    from qudo_etl_pipeline_spark.operators.prefix import (
        ranged_prefix_sums,
    )

    y = F.col(label_col).cast("bigint")
    per_v = (
        df.filter(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .groupBy(F.col(score_col).alias("_s"))
        .agg(
            F.sum(y).alias("_cp"),
            F.sum(F.lit(1) - y).alias("_cn"),
        )
        .withColumn("_ct", F.col("_cp") + F.col("_cn"))
    )
    cum = ranged_prefix_sums(
        per_v, ["_s"], {"_cb": "_ct"}, inclusive=False
    )
    dec = "decimal(38,0)"
    r2p = (
        F.col("_cp").cast(dec)
        * (F.lit(2) * F.col("_cb") + F.col("_ct") + F.lit(1)).cast(dec)
    )
    agg = cum.agg(
        F.sum("_cp").alias("n_pos"),
        F.sum("_cn").alias("n_neg"),
        F.sum(r2p).alias("_r2p"),
    ).filter(F.col("n_pos").isNotNull())
    np_, nn = F.col("n_pos"), F.col("n_neg")
    num = F.col("_r2p") - np_.cast(dec) * (np_ + 1).cast(dec)
    auc = num.cast("double") / (
        F.lit(2.0) * np_.cast("double") * nn.cast("double")
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.when((np_ > 0) & (nn > 0), ref_round(auc, 6)).alias("auc6"),
    )


def calibration_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram + Expected Calibration Error for a
    probabilistic score in [0, 1]: equi-width bins over [0, 1], per
    bin the observed positive rate vs the mean predicted score, and
    ECE = sum_b (n_b / N) * |frac_pos_b - mean_score_b| — the standard
    "is 0.8 really 80%?" model-monitoring readout.

    ONE groupBy(bucket) (bins rows out regardless of input size);
    mean scores accumulate as DECIMAL(38,12)-quantized sums
    (association-free), positive counts are exact integers, and the
    ECE total rides a broadcast of the bins-sized frame with each term
    quantized before the sum — every number engine-identical. Scores
    outside [0, 1] clamp into the edge bins.

    Output: one row per NON-EMPTY bin — (bucket, n, mean_score6,
    frac_pos6, gap6, ece6) with ece6 repeated (it is a property of
    the whole curve).
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("bigint")
    bucket = F.greatest(
        F.lit(0),
        F.least(F.lit(bins - 1), F.floor(s * F.lit(float(bins)))),
    ).cast("bigint")
    per_b = (
        df.filter(s.isNotNull() & y.isNotNull())
        .select(bucket.alias("bucket"), s.alias("_s"), y.alias("_y"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_s").cast("decimal(38,12)")).alias("_ss"),
            F.sum("_y").alias("_np"),
        )
    )
    mean_s = F.col("_ss").cast("double") / F.col("n").cast("double")
    frac_p = F.col("_np").cast("double") / F.col("n").cast("double")
    gap = frac_p - mean_s
    tot = per_b.agg(F.sum("n").alias("_nt"))
    term = (
        F.col("n").cast("double")
        * F.abs(F.col("frac_pos6") - F.col("mean_score6"))
    ).cast("decimal(38,12)")
    binned = per_b.select(
        "bucket",
        "n",
        ref_round(mean_s, 6).alias("mean_score6"),
        ref_round(frac_p, 6).alias("frac_pos6"),
        ref_round(gap, 6).alias("gap6"),
    )
    ece = (
        binned.agg(F.sum(term).alias("_et"))
        .crossJoin(F.broadcast(tot))
        .select(
            ref_round(
                F.col("_et").cast("double") / F.col("_nt").cast("double"),
                6,
            ).alias("ece6")
        )
    )
    return binned.crossJoin(F.broadcast(ece)).orderBy("bucket")


def diff_in_diff(
    df: DataFrame,
    treated_col: str,
    post_col: str,
    metric_col: str,
) -> DataFrame:
    """Difference-in-differences estimate for a natural experiment:
    DID = (ȳ_treated,post - ȳ_treated,pre) - (ȳ_control,post -
    ȳ_control,pre) — the causal-effect workhorse when assignment
    wasn't randomized but a control group shares the pre-trend.

    ``treated_col`` and ``post_col`` are 0/1 indicators; exactly four
    cells must be non-empty or every estimate comes back NULL (the
    two_proportion_ztest missing-cell discipline: never answer a
    different question than asked). ONE groupBy collapses the table to
    the 2x2 cell frame (DECIMAL-quantized metric sums, exact counts),
    collapsed to one row via conditional min/max — no second pass.

    Returns 1 row: per-cell n/mean6 (n_c0, mean_c0_6 = control-pre,
    ... t1 = treated-post), pre/post deltas, and did6.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    t = F.col(treated_col).cast("int")
    p = F.col(post_col).cast("int")
    y = F.col(metric_col).cast("double")
    cells = (
        df.filter(t.isNotNull() & p.isNotNull() & y.isNotNull())
        .groupBy(t.alias("_t"), p.alias("_p"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(y.cast("decimal(38,12)")).alias("_s"),
        )
    )
    one = cells.agg(
        *[
            F.max(
                F.when(
                    (F.col("_t") == ti) & (F.col("_p") == pi),
                    F.col("_n"),
                )
            ).alias(f"n_{ti}{pi}")
            for ti in (0, 1)
            for pi in (0, 1)
        ],
        *[
            F.max(
                F.when(
                    (F.col("_t") == ti) & (F.col("_p") == pi),
                    F.col("_s"),
                )
            ).alias(f"s_{ti}{pi}")
            for ti in (0, 1)
            for pi in (0, 1)
        ],
    )
    means = {
        f"{ti}{pi}": F.col(f"s_{ti}{pi}").cast("double")
        / F.col(f"n_{ti}{pi}").cast("double")
        for ti in (0, 1)
        for pi in (0, 1)
    }
    ok = None
    for ti in (0, 1):
        for pi in (0, 1):
            c = F.col(f"n_{ti}{pi}").isNotNull()
            ok = c if ok is None else ok & c
    delta_t = means["11"] - means["10"]
    delta_c = means["01"] - means["00"]
    did = delta_t - delta_c
    sel = []
    for ti, name in ((0, "c"), (1, "t")):
        for pi in (0, 1):
            sel.append(
                F.coalesce(F.col(f"n_{ti}{pi}"), F.lit(0)).alias(
                    f"n_{name}{pi}"
                )
            )
            sel.append(
                F.when(ok, ref_round(means[f"{ti}{pi}"], 6)).alias(
                    f"mean_{name}{pi}_6"
                )
            )
    return one.select(
        *sel,
        F.when(ok, ref_round(delta_t, 6)).alias("delta_treated6"),
        F.when(ok, ref_round(delta_c, 6)).alias("delta_control6"),
        F.when(ok, ref_round(did, 6)).alias("did6"),
    )


#: chi-squared critical value at alpha = 0.05, df = 1 — stated as the
#: exact double both engines compare against (Python:
#: ``statistics.NormalDist().inv_cdf(0.975) ** 2``).
CHI2_CRIT_95_DF1 = 3.841458820694126


def ab_srm_check(
    df: DataFrame,
    group_col: str,
    expected_a: int = 1,
    expected_b: int = 1,
    chi2_crit: float = CHI2_CRIT_95_DF1,
) -> DataFrame:
    """Sample-Ratio-Mismatch check for a two-group experiment — the
    assignment-health gate every A/B readout should pass FIRST: a
    significant deviation of observed group sizes from the intended
    ``expected_a : expected_b`` split means the randomization (or
    logging) is broken and the metric comparison is invalid.

    Chi-squared goodness of fit on the two counts with df = 1:
    chi2 = sum (n_g - E_g)² / E_g with E_g = N * w_g. Exactly two
    group labels are enforced the two_proportion_ztest way (all-NULL
    row otherwise); group A is the lexicographically first label.
    Expected weights are INTEGER ratio parts, so E_g and the statistic
    are fixed IEEE expressions over exact counts; significance
    compares against the exact df=1 critical value (the established
    threshold trick — no p-value CDF crossing).

    Returns 1 row: (group_a, n_a, group_b, n_b, expected_a_share6,
    chi2_6, is_mismatch).
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    g = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    row = g.agg(
        F.min(F.struct(F.col(group_col).alias("g"), F.col("n"))).alias(
            "a"
        ),
        F.max(F.struct(F.col(group_col).alias("g"), F.col("n"))).alias(
            "b"
        ),
        F.count(F.lit(1)).alias("_ng"),
    )
    ok = F.col("_ng") == 2
    na = F.col("a.n").cast("double")
    nb = F.col("b.n").cast("double")
    tot = na + nb
    wa = F.lit(float(expected_a)) / F.lit(float(expected_a + expected_b))
    ea = tot * wa
    eb = tot - ea
    chi2 = (na - ea) * (na - ea) / ea + (nb - eb) * (nb - eb) / eb
    return row.select(
        F.when(ok, F.col("a.g")).alias("group_a"),
        F.when(ok, F.col("a.n")).alias("n_a"),
        F.when(ok, F.col("b.g")).alias("group_b"),
        F.when(ok, F.col("b.n")).alias("n_b"),
        F.when(ok, ref_round(wa, 6)).alias("expected_a_share6"),
        F.when(ok, ref_round(chi2, 6)).alias("chi2_6"),
        F.when(
            ok,
            F.when(chi2 > F.lit(chi2_crit), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint"),
        ).alias("is_mismatch"),
    )


#: z quantiles as exact doubles: two-sided alpha=0.05 and power=0.80
#: (Python: NormalDist().inv_cdf(0.975), NormalDist().inv_cdf(0.8)).
Z_BETA_80 = 0.8416212335729143


def ab_power_mde(
    df: DataFrame,
    group_col: str,
    success_col: str,
    z_alpha: float = Z_CRIT_95,
    z_beta: float = Z_BETA_80,
) -> DataFrame:
    """Minimum Detectable Effect of a running two-group conversion
    experiment at its CURRENT sample sizes — the "is this test even
    big enough" readout: MDE_abs = (z_alpha/2 + z_beta) *
    sqrt(p(1-p) * (1/n_a + 1/n_b)) with p the pooled rate, plus the
    relative MDE. The standard two-proportion power approximation
    under the pooled-variance null.

    Same two-integer-aggregate shape as :func:`two_proportion_ztest`
    (whose exactly-two-labels guard it reuses): every output derives
    from exact counts through one fixed IEEE expression; z quantiles
    enter as exact double constants, never a CDF crossing.

    Returns 1 row: (group_a, n_a, group_b, n_b, pooled_rate6,
    mde_abs6, mde_rel6). Degenerate pooled rate (0 or 1) -> NULL MDEs.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    g = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(success_col).cast("bigint")).alias("k"),
    )
    row = g.agg(
        F.min(
            F.struct(F.col(group_col).alias("g"), F.col("n"), F.col("k"))
        ).alias("a"),
        F.max(
            F.struct(F.col(group_col).alias("g"), F.col("n"), F.col("k"))
        ).alias("b"),
        F.count(F.lit(1)).alias("_ng"),
    )
    ok = F.col("_ng") == 2
    n1 = F.col("a.n").cast("double")
    n2 = F.col("b.n").cast("double")
    pp = (F.col("a.k") + F.col("b.k")).cast("double") / (
        F.col("a.n") + F.col("b.n")
    ).cast("double")
    mde = (
        F.lit(z_alpha + z_beta)
        * F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / n1 + F.lit(1.0) / n2))
    )
    good = (pp > 0) & (pp < 1)
    return row.select(
        F.when(ok, F.col("a.g")).alias("group_a"),
        F.when(ok, F.col("a.n")).alias("n_a"),
        F.when(ok, F.col("b.g")).alias("group_b"),
        F.when(ok, F.col("b.n")).alias("n_b"),
        F.when(ok, ref_round(pp, 6)).alias("pooled_rate6"),
        F.when(ok & good, ref_round(mde, 6)).alias("mde_abs6"),
        F.when(ok & good, ref_round(mde / pp, 6)).alias("mde_rel6"),
    )


def psi_from_binned(
    counts_ref: DataFrame,
    counts_cur: DataFrame,
    bucket_col: str = "bucket",
    count_col: str = "n",
    floor_ppm: int = 100,
) -> DataFrame:
    """PSI from two ALREADY-binned count frames over the same bucket
    scheme — the composition point for drift monitoring pipelines
    whose current-side histogram arrives from somewhere the raw-frame
    :func:`psi_drift` can't reach (a Structured Streaming aggregate, a
    metrics store, another engine's rollup). Identical arithmetic:
    same ppm floor applied to BOTH shares, same DECIMAL(38,12)-
    quantized terms, so ``psi_from_binned(bin(a), bin(b)) ==
    psi_drift(a, b)`` when the bucket schemes agree.

    The join is bucket-frame-sized (bins rows); the whole operator is
    O(bins). Returns 1 row: (n_a, n_b, n_bins_used, psi6); empty
    either side -> 0 rows.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    a = counts_ref.select(
        F.col(bucket_col).alias("_b"), F.col(count_col).alias("_ca")
    )
    b = counts_cur.select(
        F.col(bucket_col).alias("_b"), F.col(count_col).alias("_cb")
    )
    j = (
        a.join(b, "_b", "full_outer")
        .select(
            F.coalesce(F.col("_ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("_cb"), F.lit(0)).alias("cb"),
        )
    )
    tot = j.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.count(F.lit(1)).alias("n_bins_used"),
    )
    jt = j.crossJoin(F.broadcast(tot))
    floor = F.lit(floor_ppm).cast("double") / F.lit(1_000_000.0)
    pa = F.greatest(
        F.col("ca").cast("double") / F.col("n_a").cast("double"), floor
    )
    pb = F.greatest(
        F.col("cb").cast("double") / F.col("n_b").cast("double"), floor
    )
    term = ((pa - pb) * F.log(pa / pb)).cast("decimal(38,12)")
    agg = jt.groupBy("n_a", "n_b", "n_bins_used").agg(
        F.sum(term).alias("_psi")
    )
    return agg.filter(
        F.col("n_a").isNotNull() & (F.col("n_a") > 0) & (F.col("n_b") > 0)
    ).select(
        "n_a",
        "n_b",
        "n_bins_used",
        ref_round(F.col("_psi").cast("double"), 6).alias("psi6"),
    )
