"""Temporal-join catalog entries over the events table.

As-of join, bucketed range join, and multi-grain rollup — the temporal
operators a training-data/event pipeline needs beyond the reference's
batch-tabular surface (extension scope; no reference counterpart).
Oracles use DuckDB's native ASOF JOIN / range-predicate join / ROLLUP so
the Spark implementations (which never issue a range predicate to a join
operator) are verified against an engine that executes the textbook
semantics directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.catalog import load_events, register
from qudo_etl_pipeline_spark.operators import temporal as T


@register(
    "asof_purchase_attribution",
    oracle="""
    WITH probe AS (
      SELECT event_id AS purchase_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    ),
    build AS (
      -- dedup ties: asof picks among equal build timestamps
      -- nondeterministically in both engines; MAX(event_id) pins one
      SELECT user_id, ts, MAX(event_id) AS click_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    )
    -- NULL-ts probes forced unmatched: DuckDB's ASOF sorts a NULL
    -- probe timestamp LAST (matching the newest build row), but a
    -- purchase without a timestamp has no "most recent prior" click —
    -- the operator's (and pandas merge_asof's) contract
    SELECT purchase_id,
           probe.user_id AS user_id,
           COALESCE(click_id, -1) AS click_id,
           COALESCE(epoch_us(probe.ts) - epoch_us(click_ts), -1) AS gap_us
    FROM probe ASOF LEFT JOIN build
      ON probe.user_id = build.user_id AND probe.ts >= build.ts
    WHERE probe.ts IS NOT NULL
    UNION ALL
    SELECT purchase_id, user_id, -1 AS click_id, -1 AS gap_us
    FROM probe WHERE ts IS NULL
    """,
    survey_ids=["J1", "W1"],
    description="As-of join: each purchase to the most recent prior click "
    "by the same user (distributed merge-asof: union + one shuffle + "
    "running last(); DuckDB ASOF JOIN oracle)",
)
def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    probe = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    build = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("click_ts", F.col("ts"))
    )
    joined = T.asof_join(probe, build, on="user_id", suffix="")
    return joined.select(
        "purchase_id",
        "user_id",
        F.coalesce(F.col("click_id"), F.lit(-1)).alias("click_id"),
        F.coalesce(
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("click_ts")),
            F.lit(-1),
        ).alias("gap_us"),
    )


@register(
    "asof_attribution_chunked",
    oracle="""
    WITH probe AS (
      SELECT event_id AS purchase_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    ),
    build AS (
      SELECT user_id, ts, MAX(event_id) AS click_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    )
    -- NULL-ts probes forced unmatched: DuckDB's ASOF sorts a NULL
    -- probe timestamp LAST (matching the newest build row), but a
    -- purchase without a timestamp has no "most recent prior" click —
    -- the operator's (and pandas merge_asof's) contract
    SELECT purchase_id,
           probe.user_id AS user_id,
           COALESCE(click_id, -1) AS click_id,
           COALESCE(epoch_us(probe.ts) - epoch_us(click_ts), -1) AS gap_us
    FROM probe ASOF LEFT JOIN build
      ON probe.user_id = build.user_id AND probe.ts >= build.ts
    WHERE probe.ts IS NOT NULL
    UNION ALL
    SELECT purchase_id, user_id, -1 AS click_id, -1 AS gap_us
    FROM probe WHERE ts IS NULL
    """,
    survey_ids=["J1", "W1"],
    description="Hot-key-safe as-of join: same attribution query and "
    "SAME DuckDB ASOF oracle as asof_purchase_attribution, but the "
    "running-last window partitions by (key, time-chunk) with "
    "boundary-replicated carry rows, so one pathologically hot user "
    "spreads over its active chunks instead of serializing into one "
    "window task",
)
def asof_attribution_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    probe = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    build = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("click_ts", F.col("ts"))
    )
    # ~1-day chunks: the synthetic event table spans weeks, so the hot
    # key splits across tens of window tasks while carry rows stay
    # ≤ one per (user, active day)
    joined = T.asof_join(
        probe, build, on="user_id", suffix="", chunk_seconds=86_400
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.coalesce(F.col("click_id"), F.lit(-1)).alias("click_id"),
        F.coalesce(
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("click_ts")),
            F.lit(-1),
        ).alias("gap_us"),
    )


@register(
    "range_join_error_context",
    oracle="""
    WITH iv AS (
      -- id-less errors excluded: one window per REFERENCEABLE error
      -- (a NULL group would merge them all; r11 NULL-salt parity)
      SELECT event_id AS error_id, ts AS w_start,
             ts + INTERVAL 10 MINUTE AS w_end
      FROM events WHERE event_type = 'error' AND event_id IS NOT NULL
    ),
    pt AS (
      SELECT ts AS v_ts, user_id AS v_user
      FROM events WHERE event_type = 'view'
    )
    SELECT error_id,
           COUNT(v_ts) AS n_views,
           COUNT(DISTINCT v_user) AS n_users
    FROM iv LEFT JOIN pt ON v_ts >= w_start AND v_ts < w_end
    GROUP BY error_id
    """,
    survey_ids=["J1", "A4", "A7"],
    description="Range join without an equi-key: views inside each "
    "error's 10-minute window via time-bucket equi-join (no cartesian "
    "fallback), left-complete so empty windows survive",
)
def range_join_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    intervals = ev.filter(
        (F.col("event_type") == "error") & F.col("event_id").isNotNull()
    ).select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    points = ev.filter(F.col("event_type") == "view").select(
        F.col("ts").alias("v_ts"), F.col("user_id").alias("v_user")
    )
    # inner-match then re-attach empty windows AFTER aggregation: the
    # left-completeness join runs over the k-row counts table instead of
    # the row-scale match table (operator-level how='left' exists for
    # row-level needs; here it would dedup/anti-join at data scale).
    joined = T.range_join(
        points, intervals, "v_ts", "w_start", "w_end", bucket_seconds=600
    )
    counts = joined.groupBy("error_id").agg(
        F.count("v_ts").alias("m_views"),
        F.countDistinct("v_user").alias("m_users"),
    )
    return (
        intervals.select("error_id")
        .join(counts, "error_id", "left")
        .select(
            "error_id",
            F.coalesce(F.col("m_views"), F.lit(0)).alias("n_views"),
            F.coalesce(F.col("m_users"), F.lit(0)).alias("n_users"),
        )
    )


def _twa_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    twa = (
        "CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * gap "
        "AS DECIMAL(38,6))) AS DOUBLE) / CAST(SUM(gap) AS DOUBLE)"
    )
    return f"""
    WITH s AS (
      SELECT user_id, value,
             epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts))
               - epoch_us(ts) AS gap
      FROM events WHERE event_type = 'view'
    )
    SELECT user_id,
           {ref_round_sql(twa, 6)} AS twa,
           CAST(SUM(gap) AS BIGINT) AS covered_us
    FROM s WHERE gap IS NOT NULL
    GROUP BY user_id
    """


@register(
    "time_weighted_value",
    oracle=_twa_oracle(),
    survey_ids=["A5", "A8", "W1"],
    description="LOCF time-weighted average of each user's view values: "
    "irregular-sampling-corrected mean (one lead window + reused-"
    "partitioning aggregate; DECIMAL-exact weighting)",
)
def time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    ev = load_events(spark, sf_dir).filter(F.col("event_type") == "view")
    twa = T.time_weighted_avg(ev, "user_id", "ts", "value")
    return twa.select(
        "user_id", ref_round(F.col("twa"), 6).alias("twa"), "covered_us"
    )


@register(
    "hourly_anomaly_zscore",
    oracle="""
    WITH hourly AS (
      SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                      '%Y-%m-%d %H:%M:%S') AS hour_start,
             event_type, COUNT(*) AS n
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    scored AS (
      SELECT hour_start, event_type, n,
             SUM(n) OVER w AS s,
             SUM(n * n) OVER w AS sq,
             COUNT(n) OVER w AS c
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_start
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT hour_start, event_type, n,
           ROUND((24 * n - s) / sqrt(24 * sq - s * s), 6) AS z,
           CAST(CASE WHEN ABS((24 * n - s) / sqrt(24 * sq - s * s)) > 3
                     THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
    FROM scored WHERE c = 24 AND (24 * sq - s * s) > 0
    """,
    survey_ids=["A4", "W1", "A8"],
    description="Trailing-24h z-score anomaly detection on hourly event "
    "counts: integer-exact window sums, two IEEE ops, bit-identical "
    "cross-engine (no decimal machinery needed)",
)
def hourly_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        load_events(spark, sf_dir)
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
            .alias("hour_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    scored = T.trailing_zscore(
        hourly, "event_type", "hour_start", "n", window=24, threshold=3.0
    )
    return scored.filter(F.col("z").isNotNull()).select(
        "hour_start",
        "event_type",
        "n",
        F.round("z", 6).alias("z"),
        "is_anomaly",
    )


@register(
    "events_rollup_grains",
    oracle="""
    SELECT CASE WHEN GROUPING(day) = 1 THEN 'ALL'
                ELSE COALESCE(day, '(null)') END AS day,
           CASE WHEN GROUPING(hour) = 1 THEN -1
                ELSE COALESCE(hour, -2) END AS hour,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(hour(ts) AS BIGINT) AS hour, value
      FROM events
    )
    GROUP BY ROLLUP(day, hour)
    """,
    survey_ids=["A4", "A5"],
    description="Day/hour hierarchy rollup in one pass (Catalyst Expand "
    "node — the hypertable multi-grain continuous-aggregate shape)",
)
def events_rollup_grains(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.rollup_time_grains(load_events(spark, sf_dir))


def _rolling_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    s = "CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)"
    return f"""
    SELECT event_id, user_id,
           CAST(COUNT(value) OVER w AS BIGINT) AS n_w,
           {ref_round_sql(s, 6)} AS sum_w,
           {ref_round_sql(f'{s} / (COUNT(value) OVER w)', 6)} AS avg_w
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """


@register(
    "rolling_avg_purchase_1h",
    oracle=_rolling_oracle(),
    survey_ids=["A5", "A8", "W1"],
    description="Trailing 1-hour time-RANGE rolling count/sum/avg of each "
    "user's purchase values (irregular-sampling moving aggregate; one "
    "keyed shuffle, DECIMAL-exact frame sums, tie-symmetric peers)",
)
def rolling_avg_purchase_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "value")
    )
    r = T.rolling_time_stats(ev, "user_id", "ts", "value", window_sec=3600)
    return r.select("event_id", "user_id", "n_w", "sum_w", "avg_w")


def _ewma_oracle(alpha: float = 0.5, window: int = 8) -> str:
    """Mirror of temporal.ewma's fixed newest-first term chain: the
    frame list via a ROWS window, then the IDENTICAL left-to-right
    multiply/add sequence with the same driver-computed weight
    literals (exact powers of two at alpha = 0.5)."""
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    beta = 1.0 - alpha
    num = "0.0"
    den = "0.0"
    for age in range(window):
        wt = repr(beta**age)
        num += (
            f" + (CASE WHEN len(l) - {age} >= 1"
            f" THEN l[len(l) - {age}] * {wt} ELSE 0.0 END)"
        )
        den += (
            f" + (CASE WHEN len(l) - {age} >= 1"
            f" THEN {wt} ELSE 0.0 END)"
        )
    # FILTER mirrors Spark collect_list's NULL-skip (the frame holds
    # only non-null values); NULLS LAST mirrors the operator's pinned
    # null ordering. ewma is NULL when the filtered frame is empty
    # (0.0/0.0 -> try_divide NULL on the Spark side, NULL/0 here).
    return f"""
    SELECT event_id, user_id,
           -- COALESCE: an all-filtered frame is NULL (not []) in
           -- DuckDB, while Spark's collect_list gives an empty array
           CAST(COALESCE(len(l), 0) AS BIGINT) AS n_w,
           CASE WHEN COALESCE(len(l), 0) = 0 THEN NULL
                ELSE {ref_round_sql(f'({num}) / ({den})', 6)} END AS ewma
    FROM (
      SELECT event_id, user_id,
             list(value) FILTER (WHERE value IS NOT NULL) OVER (
               PARTITION BY user_id
               ORDER BY ts NULLS LAST, event_id NULLS LAST
               ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW
             ) AS l
      FROM events WHERE event_type = 'view'
    )
    ORDER BY event_id
    """


@register(
    "ewma_user_views",
    oracle=_ewma_oracle(),
    survey_ids=["A5", "W1"],
    description="Per-user EWMA (alpha 0.5, 8-observation memory) of view "
    "event values: one keyed shuffle, sliding ROWS frame, exact "
    "power-of-two weight products, fixed-order term chain",
)
def ewma_user_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_events(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select("event_id", "user_id", "ts", "value")
    )
    out = T.ewma(
        ev, "user_id", ["ts", "event_id"], "value", alpha=0.5, window=8
    )
    return out.select("event_id", "user_id", "n_w", "ewma").orderBy(
        "event_id"
    )


def _attribution_oracle(window_sec: int, half_life_sec: int | None) -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    win_us = window_sec * 1_000_000
    if half_life_sec is None:
        w = "1::BIGINT"
    else:
        hl_us = half_life_sec * 1_000_000
        w = (
            "(1::BIGINT << (40 - CAST(LEAST((ct - t) // "
            f"{hl_us}, 40) AS INT)))"
        )
    credit7 = ref_round_sql("w * 1.0 / sw", 7)
    credit6 = ref_round_sql("CAST(c AS DOUBLE)", 6)
    return f"""
    WITH ev AS (
      -- a journey needs a user and a time; the eid tie-break is
      -- pinned NULLS FIRST to mirror the operator's bare asc()
      -- (r11 NULL-salt parity)
      SELECT user_id AS u, epoch_us(ts) AS t, event_id AS eid,
             event_type AS ty,
             (event_type = 'purchase') AS is_conv
      FROM events
      WHERE event_type IN ('purchase', 'view', 'click')
        AND user_id IS NOT NULL AND ts IS NOT NULL
    ),
    nxt AS (
      SELECT *,
             first_value(
               CASE WHEN is_conv THEN struct_pack(t := t, eid := eid) END
               IGNORE NULLS
             ) OVER (
               PARTITION BY u
               ORDER BY t, is_conv, eid NULLS FIRST
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             ) AS conv
      FROM ev
    ),
    touch AS (
      SELECT u, t, eid, ty, conv.t AS ct, conv.eid AS ceid
      FROM nxt
      WHERE NOT is_conv AND conv IS NOT NULL
        AND conv.t - t <= {win_us}
    ),
    wtd AS (SELECT *, {w} AS w FROM touch),
    norm AS (
      SELECT *, SUM(w) OVER (PARTITION BY u, ceid) AS sw FROM wtd
    ),
    agg AS (
      SELECT ty AS touch_type,
             CAST(COUNT(*) AS BIGINT) AS n_touches,
             -- FILTER mirrors Spark countDistinct, which skips tuples
             -- with a NULL member (an id-less conversion still earns
             -- credit but cannot be counted as a distinct conversion)
             CAST(COUNT(DISTINCT (u, ceid))
                  FILTER (WHERE ceid IS NOT NULL) AS BIGINT)
               AS n_conversions,
             SUM(CAST({credit7} AS DECIMAL(28,7))) AS c
      FROM norm GROUP BY ty
    )
    SELECT touch_type, n_touches, n_conversions, {credit6} AS credit
    FROM agg ORDER BY touch_type
    """


@register(
    "attribution_linear",
    oracle=_attribution_oracle(86400, None),
    survey_ids=["A5", "A9", "W1"],
    description="Multi-touch attribution, linear model: each touch "
    "credits the user's next purchase within 24h, equal split per "
    "conversion; ONE keyed window shuffle, DECIMAL-exact credit sums",
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    return T.attribution_credit(
        ev, "purchase", ["view", "click"], window_sec=86400
    ).orderBy("touch_type")


@register(
    "attribution_time_decay",
    oracle=_attribution_oracle(86400, 3600),
    survey_ids=["A5", "A9", "W1"],
    description="Multi-touch attribution, bucketed time-decay: weight "
    "halves per elapsed hour (exact power-of-two fixed-point, no pow() "
    "drift), normalized per conversion",
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    return T.attribution_credit(
        ev,
        "purchase",
        ["view", "click"],
        window_sec=86400,
        half_life_sec=3600,
    ).orderBy("touch_type")


def _interp_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    prev_v = "last_value(v IGNORE NULLS) OVER back"
    prev_t = (
        "last_value(CASE WHEN v IS NOT NULL THEN bucket END "
        "IGNORE NULLS) OVER back"
    )
    next_v = "first_value(v IGNORE NULLS) OVER fwd"
    next_t = (
        "first_value(CASE WHEN v IS NOT NULL THEN bucket END "
        "IGNORE NULLS) OVER fwd"
    )
    filled = f"""CASE WHEN v IS NOT NULL THEN v ELSE
        {prev_v} + ({next_v} - {prev_v})
        * (CAST(date_diff('second', {prev_t}, bucket) AS DOUBLE)
           / CAST(date_diff('second', {prev_t}, {next_t}) AS DOUBLE))
        END"""
    return f"""
    WITH obs AS (
      SELECT user_id % 4 AS series_key,
             time_bucket(INTERVAL '1 hour', ts) AS bucket,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
      FROM events
      WHERE event_type = 'purchase' AND event_id % 13 = 0
      GROUP BY 1, 2
    ),
    spans AS (
      SELECT series_key, MIN(bucket) AS mn, MAX(bucket) AS mx
      FROM obs GROUP BY 1
    ),
    grid AS (
      SELECT series_key,
             unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
      FROM spans
    ),
    g AS (
      SELECT grid.series_key, grid.bucket, obs.v
      FROM grid LEFT JOIN obs USING (series_key, bucket)
    )
    SELECT series_key,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           CAST(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_observed,
           {ref_round_sql(filled, 6)} AS value_filled6
    FROM g
    WINDOW back AS (PARTITION BY series_key ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           fwd AS (PARTITION BY series_key ORDER BY bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    """


@register(
    "resample_interpolate_hourly",
    oracle=_interp_oracle(),
    survey_ids=["W1", "R2", "J1"],
    description="Regular-grid resample of a sparse hourly series with "
    "linear interpolation across the gaps: sequence()+explode builds "
    "the grid, two ignore-null window scans find the bracketing "
    "observations, fractions stay in integer epoch arithmetic — ONE "
    "keyed shuffle end to end",
)
def resample_interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    obs = (
        load_events(spark, sf_dir)
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("event_id") % 13 == 0)
        )
        .groupBy(
            (F.col("user_id") % 4).alias("series_key"),
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
    )
    out = T.resample_interpolate(obs, "series_key", "bucket", "v", 3600)
    return out.select(
        "series_key",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "is_observed",
        ref_round(F.col("value_filled"), 6).alias("value_filled6"),
    )


def _cusum_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    return f"""
    WITH hourly AS (
      SELECT event_type,
             time_bucket(INTERVAL '1 hour', ts) AS bucket,
             COUNT(*) AS n
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS c,
             CAST(SUM(n) AS DOUBLE) AS s,
             CAST(SUM(n * n) AS DOUBLE) AS ss
      FROM hourly GROUP BY 1
    ),
    z AS (
      SELECT h.event_type, h.bucket,
             (CAST(h.n AS DOUBLE) - (s / c))
               / sqrt((c * ss - s * s) / (c * (c - 1.0))) AS zv
      FROM hourly h JOIN stats USING (event_type)
      WHERE (c * ss - s * s) / (c * (c - 1.0)) > 0
    ),
    cum AS (
      SELECT event_type, bucket,
             SUM(zv - 0.5) OVER upto AS cp,
             SUM(-zv - 0.5) OVER upto AS cn
      FROM z
      WINDOW upto AS (PARTITION BY event_type ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s AS (
      SELECT event_type, bucket,
             cp - LEAST(0.0, MIN(cp) OVER upto) AS sp,
             cn - LEAST(0.0, MIN(cn) OVER upto) AS sn
      FROM cum
      WINDOW upto AS (PARTITION BY event_type ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           {ref_round_sql('sp', 6)} AS cusum_pos6,
           {ref_round_sql('sn', 6)} AS cusum_neg6,
           CAST(CASE WHEN sp > 5.0 OR sn > 5.0 THEN 1 ELSE 0 END
                AS BIGINT) AS alarm
    FROM s
    """


@register(
    "cusum_hourly_drift",
    oracle=_cusum_oracle(),
    survey_ids=["W1", "A8"],
    description="Page's two-sided CUSUM drift detector on hourly event "
    "counts: the reset recursion rewritten as its prefix closed form "
    "(running sum minus running min), so the whole detector is two "
    "ordered window scans in one keyed shuffle — integer-exact moments, "
    "no iteration, no state store",
)
def cusum_hourly_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        load_events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = T.cusum_changepoints(
        hourly, "event_type", "bucket", "n", k_sigma=0.5, h_sigma=5.0
    )
    return out.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "cusum_pos6",
        "cusum_neg6",
        "alarm",
    )


def _xcorr_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    corr = (
        "(CAST(n AS DOUBLE) * sxy - sx * sy) / "
        "(sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)"
        " * sqrt(CAST(n AS DOUBLE) * syy - sy * sy))"
    )
    guard = (
        "CAST(n AS DOUBLE) * sxx - sx * sx > 0 "
        "AND CAST(n AS DOUBLE) * syy - sy * sy > 0"
    )
    return f"""
    WITH hourly AS (
      SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) // 3600
                  AS BIGINT) AS t,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                  END) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    lags AS (SELECT unnest(range(-3, 4)) AS lag),
    pairs AS (
      SELECT l.lag, a.x, b.y
      FROM hourly a
      JOIN lags l ON TRUE
      JOIN hourly b ON b.t = a.t + l.lag
    ),
    m AS (
      SELECT lag, COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(19,6))
                      * CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(19,6))
                      * CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x AS DECIMAL(19,6))
                      * CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sxy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, n,
           CASE WHEN {guard} THEN {ref_round_sql(corr, 6)} END AS corr6
    FROM m ORDER BY lag
    """


@register(
    "lag_crosscorr_view_purchase",
    oracle=_xcorr_oracle(),
    survey_ids=["A5", "A8", "J1"],
    description="Lead-lag cross-correlation between hourly view and "
    "purchase counts (lags -3..+3): bounded explode of shifted copies, "
    "integer bucket-index equi-join, ONE groupBy(lag) with DECIMAL-"
    "exact moments — does X lead Y, as one aggregation pass",
)
def lag_crosscorr_view_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    hourly = (
        load_events(spark, sf_dir)
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("y"),
        )
    )
    out = T.lag_crosscorr(hourly, "bucket", "x", "y", 3, 3600)
    return out.orderBy("lag")


def _pband_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    qs = {
        "p50_6": 0.5,
        "p95_6": 0.95,
        "p99_6": 0.99,
    }
    cols = ",\n           ".join(
        f"{ref_round_sql(f'quantile_cont(value, {p})', 6)} AS {a}"
        for a, p in qs.items()
    )
    return f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                    '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           COUNT(*) AS n,
           {cols}
    FROM events GROUP BY 1, 2
    """


@register(
    "hourly_percentile_bands",
    oracle=_pband_oracle(),
    survey_ids=["A4", "A8"],
    description="Observability percentile bands (P50/P95/P99 of event "
    "value per type-hour): all three exact percentiles in ONE "
    "map-side-combinable aggregate pass",
)
def hourly_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    ev = load_events(spark, sf_dir)
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
        .alias("hour_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        ref_round(F.percentile("value", F.lit(0.5)), 6).alias("p50_6"),
        ref_round(F.percentile("value", F.lit(0.95)), 6).alias("p95_6"),
        ref_round(F.percentile("value", F.lit(0.99)), 6).alias("p99_6"),
    )


def _theil_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    return f"""
    WITH hourly AS (
      SELECT event_type,
             CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) // 3600
                  AS DOUBLE) AS x,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type,
             (b.y - a.y) / (b.x - a.x) AS s
      FROM hourly a JOIN hourly b
        ON a.event_type = b.event_type AND a.x < b.x
    ),
    med AS (
      SELECT event_type, COUNT(*) AS n_pairs,
             {ref_round_sql("quantile_cont(s, 0.5)", 6)} AS slope6
      FROM pairs GROUP BY event_type
    ),
    cnt AS (
      SELECT event_type, COUNT(*) AS n_points FROM hourly GROUP BY 1
    )
    SELECT m.event_type, c.n_points, m.n_pairs, m.slope6
    FROM med m JOIN cnt c USING (event_type)
    """


@register(
    "theil_sen_hourly_trend",
    oracle=_theil_oracle(),
    survey_ids=["A8", "J3"],
    description="Theil-Sen robust trend of hourly event counts per "
    "type (median of pairwise slopes, 29% breakdown point): a series-"
    "frame operator by contract — the quadratic pair fan-out runs on "
    "the date-domain-bounded aggregate, never raw events",
)
def theil_sen_hourly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        load_events(spark, sf_dir)
        .groupBy(
            "event_type",
            (
                F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
                / 3600
            )
            .cast("bigint")
            .cast("double")
            .alias("x"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    return T.theil_sen_slope(hourly, "event_type", "x", "y")


def _seasonal_oracle(period: int = 24, step: int = 3600) -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    half = period // 2
    rem = "CAST(v AS DOUBLE) - trend - seas"
    # mirror the operator's classical centered MA OPERATION FOR
    # OPERATION: even period -> 2xMA with half-weighted endpoints over
    # a symmetric period+1 window; odd -> plain mean over period rows
    if period % 2 == 0:
        trend_expr = (
            f"CASE WHEN COUNT(*) OVER win = {period + 1} THEN "
            f"CAST(2 * SUM(v) OVER win - FIRST_VALUE(v) OVER win "
            f"- LAST_VALUE(v) OVER win AS DOUBLE) "
            f"/ {float(2 * period)!r} END"
        )
    else:
        trend_expr = (
            f"CASE WHEN COUNT(*) OVER win = {period} THEN "
            f"CAST(SUM(v) OVER win AS DOUBLE) / {float(period)!r} END"
        )
    return f"""
    WITH series AS (
      SELECT event_type AS k, date_trunc('hour', ts) AS t,
             CAST(CAST(COUNT(*) AS DECIMAL(18,6)) AS DECIMAL(18,6)) AS v
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    w AS (
      SELECT k, t, v,
             {trend_expr} AS trend,
             CAST(epoch(t) AS BIGINT) / {step} % {period} AS pos
      FROM series
      WINDOW win AS (PARTITION BY k ORDER BY t
                     ROWS BETWEEN {half} PRECEDING
                     AND {half} FOLLOWING)
    ),
    raw_idx AS (
      SELECT k, pos,
             CAST(SUM(CAST(CAST(v AS DOUBLE) - trend AS DECIMAL(28,12)))
                  AS DOUBLE) / COUNT(*) AS raw
      FROM w WHERE trend IS NOT NULL GROUP BY k, pos
    ),
    centers AS (
      SELECT k, CAST(SUM(CAST(raw AS DECIMAL(28,12))) AS DOUBLE)
                / COUNT(*) AS c
      FROM raw_idx GROUP BY k
    ),
    seas AS (
      SELECT r.k, r.pos, r.raw - c.c AS seas
      FROM raw_idx r JOIN centers c ON r.k = c.k
    )
    SELECT w.k AS event_type, w.t AS bucket,
           CAST(v AS DOUBLE) AS n_events,
           {ref_round_sql("trend", 6)} AS trend6,
           {ref_round_sql("seas", 6)} AS seasonal6,
           CASE WHEN trend IS NOT NULL AND seas IS NOT NULL
                THEN {ref_round_sql(rem, 6)} END AS remainder6
    FROM w LEFT JOIN seas ON w.k = seas.k AND w.pos = seas.pos
    """


@register(
    "seasonal_decompose_hourly",
    oracle=_seasonal_oracle(),
    survey_ids=["W1", "A8", "A4"],
    description="Classical additive seasonal decomposition of hourly "
    "event counts per type (period 24): centered 2xMA trend (period+1 "
    "symmetric window, half-weighted endpoints) with exact DECIMAL "
    "window sums, time-derived position indices centered per "
    "key via keyed aggregates + broadcast joins, remainder only where "
    "both components exist — the anomaly-triage decomposition",
)
def seasonal_decompose_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.operators.temporal import (
        seasonal_decompose,
    )

    ev = load_events(spark, sf_dir)
    series = ev.groupBy(
        F.col("event_type"),
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
    ).agg(F.count(F.lit(1)).cast("decimal(18,6)").alias("n_events"))
    return seasonal_decompose(
        series, "event_type", "bucket", "n_events", 24, 3600
    )
