"""Temporal join operators: as-of join, bucketed range join, multi-grain
rollup.

The reference pipeline is batch-tabular and has no temporal joins; these
are the scale extensions a training-data/event pipeline needs (event
attribution, windowed context joins, time-hierarchy rollups). Each is
built shuffle-consciously:

- ``asof_join``: the classic distributed merge-asof — tag both sides,
  union, ONE shuffle on the equi-key, sort within partition, and carry
  the last build row forward with ``last(..., ignorenulls=True)``. No
  range predicate ever reaches a join operator, so Catalyst never falls
  back to a broadcast-nested-loop/cartesian plan. Cost is
  O((|probe|+|build|) log partition) — exactly a sort-merge join's cost
  shape, and it scales to any build:probe ratio.
- ``range_join``: point-in-interval join WITHOUT an equi-key — the case
  that naively cross-joins. Intervals are exploded into fixed-width time
  buckets (``sequence`` over floor-divided epochs) while each point maps
  to exactly one bucket, turning the range predicate into a bucket
  equi-join + residual filter. Because the point side has one bucket per
  row, every qualifying (interval, point) pair is produced exactly once —
  no dedup pass. Bucket width is the knob: ~the median interval length
  keeps the explode factor ~2 while the per-bucket candidate count stays
  small.
- ``rollup_time_grains``: day/hour hierarchy rollup in one pass via
  ``DataFrame.rollup`` (Catalyst Expand node — one scan, one shuffle for
  all grains), the Spark-native version of a hypertable's multi-grain
  continuous aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "range_join",
    "rollup_time_grains",
    "time_weighted_avg",
    "trailing_zscore",
    "rolling_time_stats",
    "ewma",
    "attribution_credit",
    "resample_interpolate",
    "cusum_changepoints",
    "lag_crosscorr",
    "theil_sen_slope",
    "seasonal_decompose",
]


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_ts: str = "ts",
    build_ts: str = "ts",
    suffix: str = "_b",
    chunk_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: each probe row gains the most recent build row of
    the same ``on`` key with build ts <= probe ts (inclusive, backward).

    Equivalent to DuckDB ``probe ASOF LEFT JOIN build ON probe.k = build.k
    AND probe.ts >= build.ts`` and pandas ``merge_asof(direction=
    'backward')``. Build payload columns come back suffixed; they are all
    NULL when no build row precedes the probe row.

    Ties: a build row at exactly the probe timestamp matches (it sorts
    before the probe row via the side tag). Duplicate build timestamps
    within a key resolve to the later row in union order — callers that
    need a deterministic winner should pre-dedup the build side.

    ``chunk_seconds`` is the hot-key remedy. Default (None) partitions
    the running-last window by the equi-key alone — ONE shuffle, but a
    pathologically hot key (a single user holding a meaningful fraction
    of all events) serializes into one window task, and AQE's skew
    handling does not split window partitions. With ``chunk_seconds``
    set, time is cut into fixed-width chunks and the window partitions
    by (key, chunk), so a hot key spreads over as many tasks as it has
    active chunks. Correctness across chunk boundaries is restored by
    boundary replication: per (key, chunk) the latest build row is
    pre-aggregated (map-side combinable), a key-partitioned running
    ``last`` over the CHUNK-LEVEL rows (cardinality = active chunks per
    key, not rows — the hot key's serialized work is O(chunks)) yields
    each chunk's carry-in, and the carry-in is re-inserted as one
    synthetic build row per (key, chunk). Result is row-identical to
    the un-chunked plan for any chunk width (property-tested); pick
    ~the probe's median inter-event gap × 1e3 so the replication
    overhead (one synthetic row per key-chunk) stays ≪ data.
    """
    payload_cols = [c for c in build.columns if c not in (on, build_ts)]
    payload = F.struct(*[F.col(c) for c in payload_cols])

    # NULL-key/NULL-ts build rows can never legitimately precede a
    # probe row (DuckDB ASOF's `probe.ts >= build.ts` and the equi-key
    # are both three-valued-false on NULL) — but Spark's window
    # PARTITIONS BY the key, where NULL groups WITH NULL, so without
    # this filter a NULL-key probe row would silently "match" a
    # NULL-key build row. Probe rows with NULL key/ts need no filter:
    # their partition (or null-first sort position) holds no build
    # payload, so they come back unmatched — exactly the ASOF LEFT
    # semantics (r11 NULL-salt parity; NULL-free inputs unchanged).
    build = build.filter(
        F.col(on).isNotNull() & F.col(build_ts).isNotNull()
    )
    b = build.select(
        F.col(on).alias("__k"),
        F.col(build_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in probe.columns],
    )
    p = probe.select(
        F.col(on).alias("__k"),
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(b.schema["__payload"].dataType).alias("__payload"),
        *probe.columns,
    )
    u = b.unionByName(p)

    if chunk_seconds is None:
        part_cols = ["__k"]
    else:
        u = u.withColumn("__chunk", _time_chunk(u, "__ts", chunk_seconds))
        part_cols = ["__k", "__chunk"]
        u = u.unionByName(_boundary_carries(u, p.columns))

    w = (
        Window.partitionBy(*part_cols)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out = matched.select(
        *probe.columns,
        *[F.col("__match")[c].alias(c + suffix) for c in payload_cols],
    )
    return out


def _time_chunk(df: DataFrame, ts_col: str, chunk_seconds: int) -> F.Column:
    """Fixed-width time-chunk id: timestamp columns chunk on epoch
    micros, numeric (epoch-seconds-like) columns on the value itself."""
    from pyspark.sql.types import TimestampType, TimestampNTZType

    c = F.col(ts_col)
    if isinstance(df.schema[ts_col].dataType, (TimestampType, TimestampNTZType)):
        return F.floor(
            F.unix_micros(c) / F.lit(chunk_seconds * 1_000_000)
        ).cast("long")
    return F.floor(c.cast("double") / F.lit(float(chunk_seconds))).cast("long")


def _boundary_carries(u: DataFrame, out_cols: list[str]) -> DataFrame:
    """Synthetic build rows replicating each (key, chunk)'s carry-in:
    the latest build row from any EARLIER chunk of the same key.

    Two cheap keyed aggregations over chunk-level cardinality:
    per-(key, chunk) latest build row (``max_by`` — map-side
    combinable, so the hot key's rows combine before the shuffle), then
    a key-partitioned running ``last`` across the key's chunk sequence
    — including probe-only chunks, which still need a carry-in. The
    output is ≤ one row per active (key, chunk); its original ``__ts``
    is kept (strictly below the chunk's start by construction, so it
    sorts before every real row of the chunk).
    """
    # ONE groupBy yields both the per-chunk latest build row AND the
    # active-chunk roster: max_by skips rows whose ordering key is NULL,
    # so probe rows never win and probe-only chunks surface with a NULL
    # __last — exactly the frame the former separate distinct() +
    # left-join pair built, minus one full pass over the union
    per_chunk = u.groupBy("__k", "__chunk").agg(
        F.max_by(
            F.struct(F.col("__ts"), F.col("__payload")),
            F.when(F.col("__side") == 0, F.col("__ts")),
        ).alias("__last")
    )
    wk = (
        Window.partitionBy("__k")
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = (
        per_chunk
        .withColumn("__carry", F.last("__last", ignorenulls=True).over(wk))
        .filter(F.col("__carry").isNotNull())
    )
    return carries.select(
        F.col("__k"),
        F.col("__carry.__ts").alias("__ts"),
        F.lit(0).alias("__side"),
        F.col("__carry.__payload").alias("__payload"),
        *[
            F.lit(None).cast(u.schema[c].dataType).alias(c)
            for c in out_cols
            if c not in ("__k", "__ts", "__side", "__payload")
        ],
        F.col("__chunk"),
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join points to [start, end) intervals via time-bucket equi-join.

    Returns interval columns + point columns for every point with
    start <= point_ts < end. ``how='left'`` keeps empty intervals (point
    columns NULL). Both inputs must not already contain a ``__bucket``
    column. Interval and point column sets must be disjoint.
    """
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_micros(F.col(start)) / (bucket_seconds * 1_000_000))
                .cast("long"),
                # end is exclusive, but a point at bucket boundary epsilon
                # below end still lands in end's bucket: include it.
                (F.unix_micros(F.col(end)) / (bucket_seconds * 1_000_000))
                .cast("long"),
            )
        ),
    )
    pt = points.withColumn(
        "__bucket",
        (F.unix_micros(F.col(point_ts)) / (bucket_seconds * 1_000_000))
        .cast("long"),
    )
    cond = (
        (iv["__bucket"] == pt["__bucket"])
        & (pt[point_ts] >= iv[start])
        & (pt[point_ts] < iv[end])
    )
    joined = iv.join(pt, cond, "inner").drop("__bucket")
    if how == "inner":
        return joined
    if how != "left":
        raise ValueError(f"unsupported how={how!r}")
    # left: re-attach intervals that matched nothing (anti-join, then
    # union with null point columns) — keeps the matched path a pure
    # bucket equi-join instead of forcing a left join with explode-side
    # duplicate intervals that would need dedup.
    matched_ids = joined.select(*intervals.columns).distinct()
    # NULL-SAFE anti-join: `on=columns` uses null-unsafe equality, so a
    # matched interval carrying a NULL payload column would survive the
    # anti-join and be emitted a second time as a spurious empty row
    from functools import reduce

    anti_cond = reduce(
        lambda a, b: a & b,
        [
            intervals[c].eqNullSafe(matched_ids[c])
            for c in intervals.columns
        ],
    )
    empty = intervals.join(matched_ids, anti_cond, "left_anti")
    for c in points.columns:
        empty = empty.withColumn(c, F.lit(None).cast(points.schema[c].dataType))
    return joined.unionByName(empty)


def time_weighted_avg(
    samples: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Last-observation-carried-forward time-weighted average per key.

    Irregularly-sampled series bias a plain AVG toward densely-sampled
    stretches; here each sample is weighted by how long it REMAINED the
    latest observation (gap to the next sample, in microseconds). The
    final sample of a key carries no weight; keys with a single sample
    drop out (no covered interval).

    ONE keyed shuffle (a lead window) + a groupBy on the same key —
    Catalyst reuses the window's hash partitioning for the aggregate, so
    the second exchange disappears. value*gap accumulates in DECIMAL
    (exact, order-independent), the final divide is double/double —
    bit-identical cross-engine.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap = F.unix_micros(F.lead(F.col(ts_col)).over(w)) - F.unix_micros(
        F.col(ts_col)
    )
    num = (F.col(value_col).cast("decimal(18,6)") * gap).cast(
        "decimal(38,6)"
    )
    return (
        samples.select(key_col, gap.alias("__gap"), num.alias("__num"))
        .filter(F.col("__gap").isNotNull())
        .groupBy(key_col)
        .agg(
            (
                F.sum("__num").cast("double")
                / F.sum("__gap").cast("double")
            ).alias("twa"),
            F.sum("__gap").alias("covered_us"),
        )
    )


def trailing_zscore(
    series: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    window: int = 24,
    threshold: float = 3.0,
) -> DataFrame:
    """Streaming-style anomaly score: each point's z-score against the
    TRAILING ``window`` points of its key (the point itself excluded, so
    an anomaly can't mask itself). Points without a full trailing window
    or with a constant window (zero variance) get z = NULL.

    ``value_col`` must be integral (counts): the window's sum and
    sum-of-squares are then exact integers, and
    z = (w*x - sum) / sqrt(w*sumsq - sum^2)  (population-std form,
    integer numerator and radicand) is two IEEE ops on exact inputs —
    bit-identical cross-engine with no decimal machinery.

    One keyed shuffle (all window frames share the partitioning).
    """
    # a series point with a NULL NULL order key has no position in the
    # ordered series — excluded (r11 NULL-salt parity; gap-free
    # NULL-free series unchanged)
    series = series.filter(F.col(order_col).isNotNull())
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(-window, -1)
    )
    x = F.col(value_col)
    s = F.sum(x).over(w)
    sq = F.sum(x * x).over(w)
    cnt = F.count(x).over(w)
    radicand = window * sq - s * s
    # z = (x - s/w) / (sqrt(w*sq - s^2)/w) = (w*x - s)/sqrt(w*sq - s^2).
    # Exactness bound: w*sum^2 must stay < 2^63, i.e. values up to ~1e8
    # per point at w=24 — far above any hourly event count.
    z = F.when(
        (cnt == window) & (radicand > 0),
        (window * x - s) / F.sqrt(radicand.cast("double")),
    )
    return series.select(
        key_col,
        order_col,
        value_col,
        z.alias("z"),
        F.when(F.abs(z) > threshold, 1).otherwise(0).cast("bigint").alias(
            "is_anomaly"
        ),
    )


def rollup_time_grains(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Day->hour hierarchy rollup in ONE pass (Catalyst Expand node).

    Emits three grains — (day, hour), (day), and grand total — with the
    grouped-out level mapped to sentinel values so the output is
    NULL-free and hash-stable: day='ALL' / hour=-1. Sentinels key off
    GROUPING() bits, not coalesce: a NULL-timestamp event forms a real
    (NULL, NULL) detail group, which coalesce would collide with the
    subtotal rows — GROUPING() separates them (the data NULL surfaces
    as day='(null)' / hour=-2).
    """
    d = F.date_format(F.col(ts_col), "yyyy-MM-dd")
    h = F.hour(F.col(ts_col)).cast("bigint")
    return (
        events.select(d.alias("day"), h.alias("hour"), F.col(value_col))
        .rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
            # grouping bits are only legal inside the agg — carry them
            # out as a column: gid = grouping(day)*2 + grouping(hour)
            F.grouping_id().alias("_gid"),
        )
        .select(
            F.when(F.col("_gid").bitwiseAND(2) == 2, F.lit("ALL"))
            .otherwise(F.coalesce(F.col("day"), F.lit("(null)")))
            .alias("day"),
            F.when(F.col("_gid").bitwiseAND(1) == 1, F.lit(-1))
            .otherwise(F.coalesce(F.col("hour"), F.lit(-2)))
            .alias("hour"),
            "n",
            "total_value",
        )
    )


def rolling_time_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_sec: int = 3600,
) -> DataFrame:
    """Trailing time-RANGE rolling count/sum/avg of ``value_col``: for
    each row, aggregate over the key's rows with ts in
    ``[ts - window_sec, ts]`` (inclusive, peers included).

    Complements :func:`trailing_zscore` (fixed row-count frames): RANGE
    frames are what irregular sampling needs — a burst contributes all
    its points, a gap contributes none, and rows tied on ts see each
    other symmetrically (no hidden dependence on tie order, which also
    makes the result engine-order-independent by construction).

    ONE keyed shuffle; within each partition Spark's window evaluator
    keeps a sliding frame, so cost is O(rows) amortized, not O(rows ×
    frame). Cross-engine determinism: the frame sum is a DECIMAL(18,6)
    exact sum (frame membership is a set, but double summation order
    wouldn't be), divided once as a double.

    Output: input key/ts/value plus ``n_w`` (frame row count),
    ``sum_w``/``avg_w`` (rounded to 6). Equivalent DuckDB window:
    ``RANGE BETWEEN INTERVAL .. PRECEDING AND CURRENT ROW``.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-window_sec * 1_000_000, 0)
    )
    vd = F.col(value_col).cast("decimal(18,6)")
    n = F.count(value_col).over(w)
    s = F.sum(vd).over(w).cast("double")
    return df.select(
        *df.columns,
        n.cast("bigint").alias("n_w"),
        ref_round(s, 6).alias("sum_w"),
        ref_round(s / n, 6).alias("avg_w"),
    )


def ewma(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.5,
    window: int = 8,
) -> DataFrame:
    """Per-key exponentially weighted moving average with finite memory:
    for each row, the weighted mean of the key's last ``window``
    non-null values in ``order_cols`` order, weight ``(1-alpha)^age``
    (pandas ``ewm(adjust=True)`` over a truncated history).

    The truncation is the scale design: an unbounded EWMA is a
    sequential recurrence (O(rows) serial per key), while the truncated
    form is ONE keyed shuffle + a sliding ROWS frame — and for any
    alpha the dropped tail's total weight is (1-alpha)^window (0.4% at
    the defaults), below the 6-decimal output resolution for typical
    alphas.

    Cross-engine determinism: weights are driver-computed double
    literals; the numerator/denominator are emitted as a FIXED
    left-to-right chain of newest-first terms, so both engines perform
    the identical multiply/add sequence (for alpha = 0.5 every product
    is exact: multiplying by a power of two only shifts the exponent).
    ``order_cols`` must be a total order per key (pass a tie-break id).

    Output: input columns + ``n_w`` (frame size) + ``ewma`` (rounded
    to 6). Rows whose own value is NULL still get the EWMA of the
    trailing non-null frame.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha {alpha} outside (0, 1]")
    if window < 1:
        raise ValueError(f"window {window} must be >= 1")
    beta = 1.0 - alpha
    # NULLS LAST pinned: Spark's bare asc() is NULLS FIRST while SQL
    # engines default NULLS LAST, so a NULL order key would silently
    # shift every frame (r11 NULL-salt parity; total orders without
    # NULLs are unchanged)
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.asc_nulls_last(c) for c in order_cols])
        .rowsBetween(-(window - 1), 0)
    )
    # collect_list skips NULLs, so the frame list holds the last
    # <= window non-null values, oldest first
    vals = F.collect_list(F.col(value_col).cast("double")).over(w)
    tmp = df.select(*df.columns, vals.alias("_vals"))
    n = F.size(F.col("_vals"))
    num = F.lit(0.0)
    den = F.lit(0.0)
    for age in range(window):  # newest-first, fixed chain order
        wt = F.lit(beta**age)
        present = (n - age) >= 1
        num = num + F.when(
            present, F.element_at("_vals", n - F.lit(age)) * wt
        ).otherwise(F.lit(0.0))
        den = den + F.when(present, wt).otherwise(F.lit(0.0))
    # try_divide: a row whose whole trailing frame is NULL values has
    # den = 0 (collect_list skipped everything) — its EWMA is undefined
    # and must be NULL, not an ANSI divide-by-zero crash (hit by the
    # r11 NULL-salt sweep; on NULL-free data every row's own value is
    # in its frame, so den > 0 and the plan is unchanged)
    return tmp.select(
        *df.columns,
        n.cast("bigint").alias("n_w"),
        ref_round(F.try_divide(num, den), 6).alias("ewma"),
    )


def attribution_credit(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    window_sec: int,
    half_life_sec: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Multi-touch attribution: every touch event credits the user's
    NEXT conversion within ``window_sec``; credit per conversion sums
    to 1 across its touches.

    ``half_life_sec=None`` -> linear (equal split). Otherwise bucketed
    time-decay: a touch's weight halves per ELAPSED half-life bucket
    (``2^-floor(dt/half_life)``) — bucketing keeps the weight an exact
    power of two, so weights/normalizers run in bigint fixed-point
    (shifts + integer sums) and each row's credit is ONE double
    division of identical integers on any engine; the standard smooth
    ``exp(-dt)`` decay differs from this by at most 2x within a bucket
    and would cost cross-engine pow() drift.

    Plan: union-free — one window pass per user over the time-ordered
    stream (forward ``first(ignorenulls)`` finds each touch's next
    conversion, the same device asof_join uses backward), one window
    over (user, conversion) for the normalizer, then a
    touch-type-bounded aggregate. ONE keyed shuffle total; credits are
    summed as DECIMAL(28,7) of the (scale-7) rounded per-row credit, so
    the aggregate is order-independent.

    Output: (touch_type, n_touches, n_conversions, credit) — credit
    rounded to 6; conversions with no in-window touch receive no row
    (their credit is unassigned, the standard reporting convention).
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    if window_sec <= 0:
        raise ValueError(f"window_sec {window_sec} must be positive")
    relevant = [conversion_type] + list(touch_types)
    ev = events.filter(F.col(type_col).isin(relevant)).select(
        F.col(user_col).alias("u"),
        # cast tolerates TIMESTAMP_NTZ sources (same normalization the
        # catalog's load_events applies)
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("ty"),
        (F.col(type_col) == conversion_type).alias("is_conv"),
    )
    # touches sort before a same-timestamp conversion, so they credit it
    wfwd = (
        Window.partitionBy("u")
        .orderBy(F.col("t").asc(), F.col("is_conv").asc(), F.col("eid").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    conv_ref = F.first(
        F.when(F.col("is_conv"), F.struct("t", "eid")), ignorenulls=True
    ).over(wfwd)
    touches = (
        ev.withColumn("conv", conv_ref)
        .filter(
            (~F.col("is_conv"))
            & F.col("conv").isNotNull()
            & (
                F.col("conv.t") - F.col("t")
                <= F.lit(window_sec * 1_000_000)
            )
        )
    )
    if half_life_sec is None:
        w_fp = F.lit(1).cast("bigint")
    else:
        hl_us = half_life_sec * 1_000_000
        # integer half-life bucket, clamped at 40 so the shift stays
        # in range; shiftleft needs a literal in the Python API, so the
        # column-shift goes through one SQL expr
        w_fp = F.expr(
            "shiftleft(1L, 40 - CAST(LEAST("
            f"(conv.t - t) DIV {hl_us}, 40L) AS INT))"
        )
    wconv = Window.partitionBy("u", "conv.eid")
    credit = ref_round(
        F.col("_w").cast("double") / F.sum("_w").over(wconv).cast("double"),
        7,
    )
    return (
        touches.withColumn("_w", w_fp)
        .withColumn("_credit", credit)
        .groupBy(F.col("ty").alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.countDistinct("u", "conv.eid").alias("n_conversions"),
            ref_round(
                F.sum(F.col("_credit").cast("decimal(28,7)")).cast(
                    "double"
                ),
                6,
            ).alias("credit"),
        )
    )


def resample_interpolate(
    obs: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """Resample a sparse per-key series onto a regular time grid with
    linear interpolation across the gaps.

    Input: one row per OBSERVED (key, bucket) with a value (buckets
    already truncated to the grid step). Output: one row per grid
    point from each key's first to last observation — observed points
    pass through untouched, gaps get the linear interpolation between
    the surrounding observations, and ``is_observed`` tags which is
    which.

    Scale shape: per-key min/max is a map-side-combinable aggregate;
    the grid materializes via ``sequence()`` + explode (span/step rows
    per key — the dense series a downstream model wants anyway, NOT a
    row-count blowup: it is the OUTPUT size); the neighbor search is
    two ignore-null window scans on the (key, bucket) ordering, ONE
    keyed shuffle total since grid, join, and windows share the key
    partitioning.

    Determinism: interpolation fractions derive from integer epoch
    arithmetic, and the value expression is one fixed IEEE tree over
    engine-identical inputs.
    """
    spans = obs.groupBy(key_col).agg(
        F.min(bucket_col).alias("__mn"), F.max(bucket_col).alias("__mx")
    )
    step = F.expr(f"INTERVAL {int(step_seconds)} SECONDS")
    grid = spans.select(
        key_col,
        F.explode(
            F.sequence(F.col("__mn"), F.col("__mx"), step)
        ).alias(bucket_col),
    )
    g = grid.join(obs, [key_col, bucket_col], "left")
    back = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    obs_ts = F.when(v.isNotNull(), F.col(bucket_col))
    prev_v = F.last(v, ignorenulls=True).over(back)
    prev_t = F.last(obs_ts, ignorenulls=True).over(back)
    next_v = F.first(v, ignorenulls=True).over(fwd)
    next_t = F.first(obs_ts, ignorenulls=True).over(fwd)
    frac = (
        (F.unix_timestamp(F.col(bucket_col)) - F.unix_timestamp(prev_t))
        .cast("double")
        / (F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)).cast(
            "double"
        )
    )
    filled = F.when(v.isNotNull(), v).otherwise(
        prev_v + (next_v - prev_v) * frac
    )
    return g.select(
        key_col,
        bucket_col,
        F.when(v.isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_observed"),
        filled.alias("value_filled"),
    )


def cusum_changepoints(
    series: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    k_sigma: float = 0.5,
    h_sigma: float = 5.0,
) -> DataFrame:
    """Page's two-sided CUSUM drift detector over a per-key series.

    The textbook recursion ``s+_t = max(0, s+_{t-1} + z_t - k)`` resets
    at zero and looks inherently sequential — but it has the prefix
    closed form ``s+_t = c_t - min(0, min_{j<=t-1} c_j)`` where
    ``c_t = sum_{i<=t} (z_i - k)``, so the whole detector runs as TWO
    ordered window scans (running sum + running min) per direction:
    one keyed shuffle, no iteration, no state store. z-scores come
    from DECIMAL-exact per-key moments broadcast back onto the series.

    Output: one row per series point with both CUSUM statistics (in
    sigma units) and ``alarm`` when either exceeds ``h_sigma``.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    # a series point with a NULL order key has no position in the
    # ordered series — excluded (r11 NULL-salt parity; gap-free
    # NULL-free series unchanged)
    series = series.filter(F.col(bucket_col).isNotNull())
    stats = series.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(value_col).cast("decimal(27,6)")).alias("__s"),
        F.sum(
            (
                F.col(value_col).cast("decimal(18,6)")
                * F.col(value_col).cast("decimal(18,6)")
            ).cast("decimal(38,12)")
        ).alias("__ss"),
    )
    n = F.col("__n").cast("double")
    sm = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    var = (n * ss - sm * sm) / (n * (n - F.lit(1.0)))
    stats = stats.select(
        key_col,
        (sm / n).alias("__mean"),
        F.sqrt(var).alias("__sd"),
    )
    z = (F.col(value_col) - F.col("__mean")) / F.col("__sd")
    upto = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # two stacked Window projections (running sum, then running min of
    # it — Spark forbids nesting them in one expression) — same
    # partitioning/ordering, so Catalyst plans ONE exchange+sort
    cummed = (
        series.join(F.broadcast(stats), key_col)
        .filter(F.col("__sd") > 0)
        .withColumn("__cp", F.sum(z - F.lit(k_sigma)).over(upto))
        .withColumn("__cn", F.sum(-z - F.lit(k_sigma)).over(upto))
    )
    # the prefix min INCLUDES the current row (s_t = max(0, ...) needs
    # j <= t: with j <= t-1 a first-step drop would go negative)
    s_pos = F.col("__cp") - F.least(
        F.lit(0.0), F.min("__cp").over(upto)
    )
    s_neg = F.col("__cn") - F.least(
        F.lit(0.0), F.min("__cn").over(upto)
    )
    return cummed.select(
        key_col,
        bucket_col,
        ref_round(s_pos, 6).alias("cusum_pos6"),
        ref_round(s_neg, 6).alias("cusum_neg6"),
        F.when(
            (s_pos > F.lit(h_sigma)) | (s_neg > F.lit(h_sigma)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("alarm"),
    )


def lag_crosscorr(
    series: DataFrame,
    bucket_col: str,
    x_col: str,
    y_col: str,
    max_lag: int,
    step_seconds: int,
) -> DataFrame:
    """Lead-lag cross-correlation: Pearson corr(x_t, y_{t+L}) for every
    lag L in [-max_lag, max_lag] — the "does series X lead series Y"
    scan behind attribution and capacity planning.

    Input: one row per time bucket with both measures (a regular grid —
    run :func:`resample_interpolate` first if sparse). The y side
    explodes into 2·max_lag+1 shifted copies (bounded fan-out, a map),
    joins back on the integer bucket index, and ONE groupBy(lag)
    computes all per-lag moments map-side-combinably. Integer-valued
    measures keep every moment exact; corr is the usual fixed IEEE
    tree.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    idx = (F.unix_timestamp(F.col(bucket_col)) / step_seconds).cast(
        "bigint"
    )
    xs = series.select(idx.alias("t"), F.col(x_col).alias("x"))
    lags = F.explode(
        F.sequence(F.lit(-max_lag), F.lit(max_lag))
    ).alias("lag")
    ys = series.select(
        idx.alias("ty"), F.col(y_col).alias("y")
    ).select("ty", "y", lags)
    # y at t+L pairs with x at t  ->  join where ty - lag == t
    pairs = xs.join(
        ys, xs["t"] == ys["ty"] - ys["lag"], "inner"
    )
    dx = F.col("x").cast("decimal(18,6)")
    dy = F.col("y").cast("decimal(18,6)")
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum((dx * dx).cast("decimal(38,12)")).cast("double").alias("sxx"),
        F.sum((dy * dy).cast("decimal(38,12)")).cast("double").alias("syy"),
        F.sum((dx * dy).cast("decimal(38,12)")).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    corr = cov / (F.sqrt(vx) * F.sqrt(vy))
    return m.select(
        "lag",
        "n",
        F.when((vx > 0) & (vy > 0), ref_round(corr, 6)).alias("corr6"),
    )


def theil_sen_slope(
    series: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    max_points_per_key: int = 1000,
    on_excess: str = "error",
) -> DataFrame:
    """Theil-Sen robust trend: per key, the MEDIAN of all pairwise
    slopes (y_j - y_i)/(x_j - x_i), x_i < x_j — the slope estimator
    with a 29% outlier breakdown point, vs OLS's zero.

    Deliberately a SERIES-frame operator: all-pairs is quadratic, so
    the input contract is the already-aggregated per-key series
    (hours/days — the frame rolling stats and CUSUM run on), where
    n_pairs = O(domain²) is bounded by construction, NOT the raw event
    table. The contract is ENFORCED by ``max_points_per_key``:

    - ``on_excess="error"`` (default): a plan-side ``assert_true``
      gate fires before any pair is built, so a raw event table can
      never silently fan out quadratically — the job fails with the
      offending key in the message.
    - ``on_excess="subsample"``: each oversized key keeps its
      ``max_points_per_key`` seeded-hash-smallest points (the
      randomized/subsampled Theil-Sen variant from the estimator
      literature — same breakdown robustness, bounded pair count;
      deterministic because the hash order is a pure row function).
      Under-cap keys are untouched either way.

    The pair fan-out is a self-equi-join on the key; the median is one
    exact percentile per key over the pair frame.

    Output: (key, n_points, n_pairs, slope6) — n_points is the
    ORIGINAL series size (pre-cap), n_pairs the pairs actually used.
    """
    from qudo_etl_pipeline_spark.functions.hashing import hash64
    from qudo_etl_pipeline_spark.functions.rounding import ref_round
    from qudo_etl_pipeline_spark.operators.prefix import (
        acquire_operator_cache,
    )

    if on_excess not in ("error", "subsample"):
        raise ValueError(f"unknown on_excess policy: {on_excess!r}")

    # materialize the (key, x, y) collapse ONCE: the plan below
    # references it from five branches (counts, the gate's broadcast
    # build, both pair-join sides, the n_points join-back), and column
    # pruning makes each branch's subtree physically distinct — without
    # a cache every branch re-runs the caller's series aggregation from
    # the source scan (measured: 5 parquet scans per execution). The
    # series-frame contract bounds the frame by the key × bucket
    # domain, so the cache is small by construction.
    base = acquire_operator_cache(
        series.select(
            F.col(key_col).alias("_k"),
            F.col(x_col).cast("double").alias("_x"),
            F.col(y_col).cast("double").alias("_y"),
        )
    )
    counts = base.groupBy("_k").agg(F.count(F.lit(1)).alias("n_points"))
    src = base
    if on_excess == "error":
        # assert_true inside a FILTER is not prunable by the optimizer
        # and materializes with the broadcast build side below — the
        # quadratic join can never start against an oversized key
        gate = F.assert_true(
            F.col("n_points") <= F.lit(max_points_per_key),
            F.concat(
                F.lit("theil_sen_slope: a key has n_points > "),
                F.lit(str(max_points_per_key)),
                F.lit(
                    " (max_points_per_key). Pre-aggregate the series "
                    "per key or pass on_excess='subsample'."
                ),
            ),
        )
        gated = counts.filter(gate.isNull())
        src = src.join(F.broadcast(gated.select("_k")), "_k")
    else:
        order = Window.partitionBy("_k").orderBy(
            hash64(
                F.concat_ws(
                    "\x1f",
                    F.col("_x").cast("string"),
                    F.col("_y").cast("string"),
                )
            ),
            "_x",
            "_y",
        )
        src = (
            src.withColumn("_rn", F.row_number().over(order))
            .filter(F.col("_rn") <= max_points_per_key)
            .drop("_rn")
        )
    a = src.select(
        "_k", F.col("_x").alias("_xa"), F.col("_y").alias("_ya")
    )
    b = src.select(
        "_k", F.col("_x").alias("_xb"), F.col("_y").alias("_yb")
    )
    pairs = a.join(b, "_k").filter(F.col("_xa") < F.col("_xb"))
    slope = (F.col("_yb") - F.col("_ya")) / (
        F.col("_xb") - F.col("_xa")
    )
    med = pairs.groupBy("_k").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        ref_round(F.percentile(slope, F.lit(0.5)), 6).alias("slope6"),
    )
    return (
        med.join(F.broadcast(counts), "_k")
        .select(
            F.col("_k").alias(key_col), "n_points", "n_pairs", "slope6"
        )
    )


def seasonal_decompose(
    series: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    period: int,
    step_seconds: int,
) -> DataFrame:
    """Classical ADDITIVE seasonal decomposition on the per-key series
    frame: value = trend + seasonal + remainder — the
    anomaly-triage decomposition (is this spike trend, time-of-day, or
    genuinely anomalous?).

    Same series-frame contract as :func:`lag_crosscorr` /
    :func:`theil_sen_slope`: one row per (key, bucket) on a regular
    grid (run :func:`resample_interpolate` first if sparse; row-based
    windows shift consistently across engines either way because both
    order by the same bucket). Shape per key:

    - trend: the CLASSICAL centered moving average. Odd period: a
      symmetric ``period``-row window, plain mean. Even period: the
      2xMA — a ``period + 1``-row symmetric window whose two endpoint
      rows carry HALF weight ((2*sum - first - last) / (2*period)), so
      each seasonal position contributes exactly weight 1 and no
      seasonality leaks into the trend. NULL at the edges where the
      window is short (the classical convention). The numerator is an
      EXACT DECIMAL expression divided once in IEEE, so no
      engine-order drift;
    - seasonal: the per-(key, position) mean of the detrended series,
      position = (bucket_epoch / step) % period (time-derived, robust
      to gaps), CENTERED by subtracting the per-key mean of the
      seasonal indices (the standard identifiability constraint);
      computed with keyed aggregates + broadcast joins, never a second
      pass over wide windows;
    - remainder: value - trend - seasonal where trend exists.

    Output: (key, bucket, value, trend6, seasonal6, remainder6).
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    # a series point with a NULL bucket has no position in the ordered
    # series — excluded (r11 NULL-salt parity)
    series = series.filter(F.col(bucket_col).isNotNull())
    half = period // 2
    k = F.col(key_col)
    src = series.select(
        k.alias("_k"),
        F.col(bucket_col).alias("_t"),
        F.col(value_col).cast("decimal(18,6)").alias("_v"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t")
        .rowsBetween(-half, half)
    )
    win_n = F.count(F.lit(1)).over(w)
    if period % 2 == 0:
        # classical 2xMA: endpoint rows at +-half are the SAME seasonal
        # position, so each carries half weight — exact in DECIMAL,
        # one final IEEE division
        num = (
            F.lit(2) * F.sum("_v").over(w)
            - F.first("_v").over(w)
            - F.last("_v").over(w)
        )
        trend = F.when(
            win_n == period + 1,
            num.cast("double") / F.lit(float(2 * period)),
        )
    else:
        trend = F.when(
            win_n == period,
            F.sum("_v").over(w).cast("double") / F.lit(float(period)),
        )
    pos = (
        (F.unix_timestamp(F.col("_t")) / F.lit(step_seconds)).cast(
            "bigint"
        )
        % F.lit(period)
    ).alias("_pos")
    from qudo_etl_pipeline_spark.operators.prefix import (
        acquire_operator_cache,
    )

    # the windowed trend pass feeds the seasonal-index aggregate AND
    # the final output join — cached once (the series-frame contract
    # bounds it by the key × bucket domain) so the shuffle + moving-
    # average window runs once, not three times
    detr = acquire_operator_cache(
        src.select("_k", "_t", "_v", pos, trend.alias("_trend"))
    )
    raw_idx = (
        detr.filter(F.col("_trend").isNotNull())
        .groupBy("_k", "_pos")
        .agg(
            (
                F.sum(
                    (F.col("_v").cast("double") - F.col("_trend")).cast(
                        "decimal(28,12)"
                    )
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("_raw")
        )
    )
    center = raw_idx.groupBy("_k").agg(
        (
            F.sum(F.col("_raw").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("_c")
    )
    seas = raw_idx.join(F.broadcast(center), "_k").select(
        "_k", "_pos", (F.col("_raw") - F.col("_c")).alias("_seas")
    )
    out = detr.join(F.broadcast(seas), ["_k", "_pos"], "left")
    rem = F.col("_v").cast("double") - F.col("_trend") - F.col("_seas")
    return out.select(
        F.col("_k").alias(key_col),
        F.col("_t").alias(bucket_col),
        F.col("_v").cast("double").alias(value_col),
        ref_round(F.col("_trend"), 6).alias("trend6"),
        ref_round(F.col("_seas"), 6).alias("seasonal6"),
        F.when(
            F.col("_trend").isNotNull() & F.col("_seas").isNotNull(),
            ref_round(rem, 6),
        ).alias("remainder6"),
    )
