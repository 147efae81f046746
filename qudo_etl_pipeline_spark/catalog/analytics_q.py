"""Event-analytics catalog entries: funnel, retention cohorts, CDC
compaction (operators/analytics.py).

Oracles express the same semantics in textbook SQL: the funnel as
stage-wise "earliest stage-i event strictly after the matched
stage-(i-1)" CTEs (provably equivalent to the operator's greedy
time-ordered scan), retention as plain relational algebra, and the CDC
merge as a ROW_NUMBER window over the unioned log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.catalog import load_events, load_table, register
from qudo_etl_pipeline_spark.operators import analytics as A

_FUNNEL_STAGES = ["signup", "click", "purchase"]


@register(
    "funnel_signup_click_purchase",
    oracle="""
    WITH ev AS (
      -- a journey needs a user and a time (r11 NULL-salt parity)
      SELECT user_id, ts, event_type FROM events
      WHERE event_type IN ('signup', 'click', 'purchase')
        AND user_id IS NOT NULL AND ts IS NOT NULL
    ),
    s1 AS (SELECT user_id, MIN(ts) AS t FROM ev
           WHERE event_type = 'signup' GROUP BY 1),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t
           FROM ev e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
    s3 AS (SELECT e.user_id, MIN(e.ts) AS t
           FROM ev e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'signup',   (SELECT COUNT(*) FROM s1)),
      (CAST(2 AS BIGINT), 'click',    (SELECT COUNT(*) FROM s2)),
      (CAST(3 AS BIGINT), 'purchase', (SELECT COUNT(*) FROM s3))
    ) AS t(stage, stage_name, n_users)
    WHERE n_users > 0
    """,
    survey_ids=["A4", "W1"],
    description="Ordered funnel signup->click->purchase: per-user greedy "
    "time-ordered stage matching in ONE shuffle (higher-order aggregate "
    "over the sorted event array), vs the stage-join SQL formulation",
)
def funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    counts = A.funnel_counts(ev, _FUNNEL_STAGES)
    return counts.filter(F.col("n_users") > 0)


@register(
    "retention_matrix",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events
    ),
    cohort AS (SELECT u, MIN(d) AS c FROM activity GROUP BY u)
    SELECT strftime(c, '%Y-%m-%d') AS cohort_day,
           CAST(d - c AS BIGINT) AS day_offset,
           COUNT(DISTINCT a.u) AS n_users
    FROM activity a JOIN cohort USING (u)
    GROUP BY 1, 2
    """,
    survey_ids=["A4", "A7"],
    description="Cohort retention matrix: first-active-day cohorts x "
    "day-offset activity counts",
)
def retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return A.retention_cohorts(load_events(spark, sf_dir))


@register(
    "cdc_compact_orders",
    oracle="""
    WITH snap AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             o_totalprice AS total, o_orderdate AS ts,
             'U' AS op, 0 AS src
      FROM orders
    ),
    chg AS (
      SELECT o_orderkey, 'X', o_totalprice + 100,
             o_orderdate + INTERVAL 1 DAY, 'U', 1
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, NULL, NULL,
             o_orderdate + INTERVAL 2 DAY, 'D', 1
      FROM orders WHERE o_orderkey % 13 = 0
    ),
    ranked AS (
      -- NULLS LAST pins the change-ts order to Spark's desc()
      -- semantics (a NULL change time never wins latest-wins); the
      -- payload columns complete the order into a TOTAL one — the
      -- salted NULL-key group ties date-grained timestamps at sf0.1
      -- (r12; mirrors cdc_compact's payload tie-break)
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY k ORDER BY ts DESC NULLS LAST, src DESC,
                                op ASC NULLS LAST,
                                status ASC NULLS LAST,
                                total ASC NULLS LAST) AS rn
      FROM (SELECT * FROM snap UNION ALL SELECT * FROM chg)
    )
    SELECT k AS o_orderkey, status AS o_orderstatus,
           total AS o_totalprice
    FROM ranked WHERE rn = 1 AND op = 'U'
    """,
    survey_ids=["R1", "W2", "P7"],
    description="CDC latest-wins compaction: deterministic upsert+delete "
    "batch merged onto the orders snapshot (union + one keyed window; "
    "the merge-on-read compaction shape)",
)
def cdc_compact_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    snapshot = orders.select(
        F.col("o_orderkey"),
        F.col("o_orderstatus"),
        F.col("o_totalprice"),
        F.col("o_orderdate").alias("ts"),
    )
    upserts = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") + 100).alias("o_totalprice"),
        (F.col("o_orderdate") + F.expr("INTERVAL 1 DAY")).alias("ts"),
        F.lit("U").alias("op"),
    )
    deletes = orders.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey",
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
        (F.col("o_orderdate") + F.expr("INTERVAL 2 DAY")).alias("ts"),
        F.lit("D").alias("op"),
    )
    compacted = A.cdc_compact(
        snapshot, upserts.unionByName(deletes), keys=["o_orderkey"],
        ts_col="ts",
    )
    return compacted.select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "incremental_hourly_merge",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                    '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total,
           CAST(ROUND(SUM(CAST(CAST(value AS DECIMAL(18,6))
                         * CAST(value AS DECIMAL(18,6))
                         AS DECIMAL(38,12))), 6) AS DOUBLE) AS total_sq,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
             AS mean
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    """,
    survey_ids=["A4", "A5", "A8"],
    description="Incremental rollup maintenance: hourly state built "
    "separately on the first/second half-month, merged state-to-state "
    "(never re-reading history) — oracle is the DIRECT full aggregate, "
    "proving merge==recompute bit-for-bit",
)
def incremental_hourly_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.operators import incremental as INC

    ev = load_events(spark, sf_dir).select(
        F.date_format(
            F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
        ).alias("hour_start"),
        "event_type",
        "value",
        F.to_date("ts").alias("d"),
    )
    split = "2024-01-15"
    keys = ["hour_start", "event_type"]
    prev = INC.partial_state(ev.filter(F.col("d") < split), keys, "value")
    delta = INC.partial_state(ev.filter(F.col("d") >= split), keys, "value")
    return INC.finalize_state(INC.merge_states([prev, delta], keys), keys)


@register(
    "scd2_order_history",
    oracle="""
    WITH log AS (
      -- a change without a timestamp cannot open a validity interval
      -- (r11 NULL-salt parity; mirrored in the Spark-side log filter)
      SELECT * FROM (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               o_orderdate AS ts, 'U' AS op
        FROM orders
        UNION ALL
        SELECT o_orderkey, 'X', o_orderdate + INTERVAL 1 DAY, 'U'
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, NULL, o_orderdate + INTERVAL 2 DAY, 'D'
        FROM orders WHERE o_orderkey % 13 = 0
      ) WHERE ts IS NOT NULL
    ),
    v AS (
      -- payload tie-break mirrors scd2_history: same-ts versions of a
      -- key (the salted NULL-key group at scale) pair intervals
      -- deterministically (r12)
      SELECT *, LEAD(ts) OVER (PARTITION BY k
        ORDER BY ts, status ASC NULLS LAST, op ASC NULLS LAST) AS nts
      FROM log
    )
    SELECT k AS o_orderkey, status AS o_orderstatus,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(COALESCE(nts, TIMESTAMP '9999-12-31 00:00:00'),
                    '%Y-%m-%d %H:%M:%S') AS valid_to,
           CAST(CASE WHEN nts IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_current
    FROM v WHERE op = 'U'
    """,
    survey_ids=["W1", "R1"],
    description="SCD type-2 history build: the same deterministic change "
    "log turned into validity intervals (one lead-window shuffle; deletes "
    "close versions without emitting rows)",
)
def scd2_order_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_orderdate").alias("ts"),
        F.lit("U").alias("op"),
    )
    upserts = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_orderdate") + F.expr("INTERVAL 1 DAY")).alias("ts"),
        F.lit("U").alias("op"),
    )
    deletes = orders.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey",
        F.lit(None).cast("string").alias("o_orderstatus"),
        (F.col("o_orderdate") + F.expr("INTERVAL 2 DAY")).alias("ts"),
        F.lit("D").alias("op"),
    )
    log = (
        base.unionByName(upserts)
        .unionByName(deletes)
        .filter(F.col("ts").isNotNull())
    )
    hist = A.scd2_history(log, keys=["o_orderkey"], ts_col="ts")
    return hist.select(
        "o_orderkey",
        "o_orderstatus",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        "is_current",
    )


def _ols_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    # Mirrors operators/analytics.py::ols_trend's expression tree exactly:
    # DECIMAL-exact moments (product moments pre-rounded under the 2^53
    # decimal->double bound), then the same fixed IEEE op sequence.
    return f"""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
             -- one operand widened to DECIMAL(19,4): DuckDB executes
             -- 18x18 products in int64 (overflows on price^2); 19-width
             -- forces the HUGEINT path. Values are exact either way, so
             -- Spark's (18,4) side is unaffected.
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(19,4))
                          * CAST(l_extendedprice AS DECIMAL(18,4))), 2)
                  AS DOUBLE) AS sxy,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(19,4))
                          * CAST(l_quantity AS DECIMAL(18,4))), 2)
                  AS DOUBLE) AS sxx,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                          * CAST(l_extendedprice AS DECIMAL(18,4))), 0)
                  AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag
    ), v AS (
      SELECT l_returnflag, n, sx, sy,
             n * sxy - sx * sy AS cov,
             n * sxx - sx * sx AS varx,
             n * syy - sy * sy AS vary
      FROM m
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           {ref_round_sql('CASE WHEN varx > 0 THEN cov / varx END', 6)}
             AS slope6,
           {ref_round_sql(
               'CASE WHEN varx > 0 THEN (sy - (cov / varx) * sx) / n END', 6
           )} AS intercept6,
           {ref_round_sql(
               'CASE WHEN varx > 0 AND vary > 0 '
               'THEN (cov * cov) / (varx * vary) END', 6
           )} AS r2_6
    FROM v
    """


@register(
    "ols_trend_qty_price",
    oracle=_ols_oracle(),
    survey_ids=["A5", "A8"],
    description="Per-group closed-form OLS trend (slope/intercept/r2 of "
    "extendedprice on quantity per returnflag) from DECIMAL-exact "
    "moments in ONE map-side-combinable shuffle",
)
def ols_trend_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    li = load_table(spark, sf_dir, "lineitem")
    t = A.ols_trend(li, ["l_returnflag"], "l_quantity", "l_extendedprice")
    return t.select(
        "l_returnflag",
        "n",
        ref_round(F.col("slope"), 6).alias("slope6"),
        ref_round(F.col("intercept"), 6).alias("intercept6"),
        ref_round(F.col("r2"), 6).alias("r2_6"),
    )


def _mad_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    rz = "0.6745 * (d.v - d.med6) / m.mad6"
    return f"""
    WITH med AS (
      SELECT o_orderpriority AS g,
             {ref_round_sql('quantile_cont(o_totalprice, 0.5)', 6)} AS med6
      FROM orders GROUP BY 1
    ), dev AS (
      -- IS NOT DISTINCT FROM mirrors the operator's eqNullSafe join:
      -- NULL-key rows score against the NULL-key group's median/MAD
      SELECT o.o_orderkey, o.o_orderpriority AS g, o.o_totalprice AS v,
             m.med6
      FROM orders o JOIN med m ON o.o_orderpriority IS NOT DISTINCT FROM m.g
    ), mad AS (
      SELECT g,
             {ref_round_sql('quantile_cont(ABS(v - med6), 0.5)', 6)} AS mad6
      FROM dev GROUP BY g
    )
    SELECT d.o_orderkey, d.g AS o_orderpriority,
           CASE WHEN m.mad6 > 0 THEN {ref_round_sql(rz, 6)} END AS rz6,
           CAST(CASE WHEN m.mad6 > 0 AND ABS({rz}) > 3.5
                     THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
    FROM dev d JOIN mad m ON d.g IS NOT DISTINCT FROM m.g
    """


@register(
    "robust_zscore_orders",
    oracle=_mad_oracle(),
    survey_ids=["A8", "P6"],
    description="Per-group median/MAD modified z-score (Iglewicz-Hoaglin "
    "|rz|>3.5 outlier flag) over order totals by priority: two exact-"
    "percentile shuffles, group stats broadcast back",
)
def robust_zscore_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    r = A.robust_zscore(ords, ["o_orderpriority"], "o_totalprice")
    return r.select("o_orderkey", "o_orderpriority", "rz6", "is_outlier")


def _corr_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    moments = ["CAST(COUNT(*) AS DOUBLE) AS n"]
    for c in cols:
        moments.append(
            f"CAST(SUM(CAST({c} AS DECIMAL(18,4))) AS DOUBLE) AS s_{c}"
        )
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i:]]
    for a, b in pairs:
        # 19-width first operand: force DuckDB's HUGEINT product path
        moments.append(
            f"CAST(ROUND(SUM(CAST({a} AS DECIMAL(19,4))"
            f" * CAST({b} AS DECIMAL(18,4))), 2) AS DOUBLE) AS p_{a}_{b}"
        )

    def cov(a: str, b: str) -> str:
        key = f"p_{a}_{b}" if (a, b) in pairs else f"p_{b}_{a}"
        return f"(n * {key} - s_{a} * s_{b})"

    rows = []
    for a, b in pairs:
        if a == b:
            continue
        r = f"{cov(a, b)} / (sqrt({cov(a, a)}) * sqrt({cov(b, b)}))"
        guarded = (
            f"CASE WHEN {cov(a, a)} > 0 AND {cov(b, b)} > 0 "
            f"THEN ({r}) END"
        )
        rows.append(
            f"SELECT '{a}' AS col_x, '{b}' AS col_y, "
            f"{ref_round_sql(guarded, 6)} AS corr6 FROM m"
        )
    sel = "\n    UNION ALL\n    ".join(rows)
    return f"""
    WITH m AS (
      SELECT {", ".join(moments)} FROM lineitem
    )
    {sel}
    """


@register(
    "corr_matrix_lineitem",
    oracle=_corr_oracle(),
    survey_ids=["A5", "A8", "R2"],
    description="Flattened Pearson correlation matrix of three lineitem "
    "measures from ONE aggregation pass (all sums and cross-products "
    "map-side-combinable; DECIMAL-exact moments)",
)
def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    li = load_table(spark, sf_dir, "lineitem")
    out = A.corr_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount"]
    )
    return out.select(
        "col_x", "col_y", ref_round(F.col("corr"), 6).alias("corr6")
    )


_SEQ_SYMBOLS = {
    "signup": "S",
    "view": "V",
    "click": "C",
    "purchase": "P",
    "error": "E",
}
_SEQ_PATTERN = "V[VC]*P"  # view -> purchase with no error/signup between


@register(
    "sequence_match_view_purchase",
    oracle=f"""
    WITH sym AS (
      SELECT user_id, ts, event_id,
             CASE event_type
               WHEN 'signup' THEN 'S' WHEN 'view' THEN 'V'
               WHEN 'click' THEN 'C' WHEN 'purchase' THEN 'P'
               WHEN 'error' THEN 'E' END AS s
      FROM events
      WHERE event_type IN ('signup','view','click','purchase','error')
        AND user_id IS NOT NULL AND ts IS NOT NULL
    ),
    seqs AS (
      SELECT user_id,
             string_agg(s, '' ORDER BY ts, event_id) AS seq
      FROM sym GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(seq, '{_SEQ_PATTERN}'))
                AS BIGINT) AS n_matches,
           CASE WHEN len(regexp_extract_all(seq, '{_SEQ_PATTERN}')) > 0
                THEN 1 ELSE 0 END::BIGINT AS matched,
           regexp_extract(seq, '{_SEQ_PATTERN}') AS first_match
    FROM seqs ORDER BY user_id
    """,
    survey_ids=["A4", "W4"],
    description="MATCH_RECOGNIZE-lite: per-user regex event-pattern "
    "detection (view->purchase uninterrupted by error/signup) over the "
    "time-ordered symbol sequence; ONE groupBy(user) shuffle",
)
def sequence_match_view_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    out = A.sequence_match(ev, _SEQ_SYMBOLS, _SEQ_PATTERN)
    return out.orderBy("user_id")


def _markov_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    p6 = ref_round_sql("n * 1.0 / tot", 6)
    return f"""
    WITH steps AS (
      SELECT LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id NULLS LAST
             ) AS prev_type,
             event_type AS next_type
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    counts AS (
      SELECT prev_type, next_type, COUNT(*) AS n
      FROM steps WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type
    ),
    tot AS (
      SELECT *, SUM(n) OVER (PARTITION BY prev_type) AS tot FROM counts
    )
    SELECT prev_type, next_type, n, {p6} AS p
    FROM tot
    ORDER BY prev_type, next_type
    """


@register(
    "event_transitions_markov",
    oracle=_markov_oracle(),
    survey_ids=["A4", "A9"],
    description="First-order Markov transition matrix over per-user "
    "event streams: one lag-window shuffle, |types|^2-bounded "
    "aggregate, row-normalized probabilities",
)
def event_transitions_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    return A.event_transitions(ev).orderBy("prev_type", "next_type")


_COOC_CAP = 200


def _cooc_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    support = ref_round_sql("n_ab * 1.0 / n_users", 6)
    conf = ref_round_sql("n_ab * 1.0 / n_a", 6)
    lift = ref_round_sql(
        "(n_ab * CAST(n_users AS DOUBLE)) / CAST(n_a * n_b AS DOUBLE)", 6
    )
    return f"""
    WITH baskets AS (
      SELECT DISTINCT user_id AS u,
             CAST(json_extract(props, '$.k') AS BIGINT) AS i
      FROM events
    ),
    kept AS (
      SELECT b.u, b.i FROM baskets b
      JOIN (
        SELECT u FROM baskets GROUP BY u HAVING COUNT(*) <= {_COOC_CAP}
      ) s USING (u)
    ),
    nu AS (SELECT COUNT(DISTINCT u) AS n_users FROM kept),
    marg AS (SELECT i, COUNT(*) AS n_i FROM kept GROUP BY i),
    pairs AS (
      SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS n_ab
      FROM kept a JOIN kept b ON a.u = b.u AND a.i < b.i
      GROUP BY a.i, b.i
    ),
    joined AS (
      SELECT item_a, item_b, n_ab, ma.n_i AS n_a, mb.n_i AS n_b, n_users
      FROM pairs
      JOIN marg ma ON pairs.item_a = ma.i
      JOIN marg mb ON pairs.item_b = mb.i
      CROSS JOIN nu
    )
    SELECT item_a, item_b, n_ab, n_a, n_b,
           {support} AS support,
           {conf} AS conf_a_b,
           {lift} AS lift
    FROM joined
    ORDER BY item_a, item_b
    """


@register(
    "item_cooccurrence_rules",
    oracle=_cooc_oracle(),
    survey_ids=["A4", "A9", "J3"],
    description="Association rules over user->item baskets (support, "
    "confidence, lift) with the max_basket power-user cap bounding the "
    "quadratic pair fan-out",
)
def item_cooccurrence_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select(
        "user_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("item"),
    )
    out = A.item_cooccurrence(ev, "user_id", "item", max_basket=_COOC_CAP)
    return out.orderBy("item_a", "item_b")


@register(
    "table_diff_orders",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
    ),
    new AS (
      SELECT o_orderkey,
             o_orderstatus,
             CASE WHEN o_orderkey % 89 = 0 THEN 'X-UPDATED'
                  ELSE o_orderpriority END AS o_orderpriority
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 50000000, o_orderstatus, o_orderpriority
      FROM orders WHERE o_orderkey % 101 = 0
    ),
    fo AS (
      SELECT o_orderkey,
             md5(concat_ws(chr(1),
                 COALESCE(o_orderstatus, chr(2)),
                 COALESCE(o_orderpriority, chr(2)))) AS fp
      FROM old
    ),
    fn AS (
      SELECT o_orderkey,
             md5(concat_ws(chr(1),
                 COALESCE(o_orderstatus, chr(2)),
                 COALESCE(o_orderpriority, chr(2)))) AS fp
      FROM new
    )
    SELECT COALESCE(fo.o_orderkey, fn.o_orderkey) AS o_orderkey,
           CASE WHEN fo.fp IS NULL THEN 'insert'
                WHEN fn.fp IS NULL THEN 'delete'
                WHEN fo.fp <> fn.fp THEN 'update' END AS change_type
    FROM fo FULL OUTER JOIN fn ON fo.o_orderkey = fn.o_orderkey
    WHERE (CASE WHEN fo.fp IS NULL THEN 'insert'
                WHEN fn.fp IS NULL THEN 'delete'
                WHEN fo.fp <> fn.fp THEN 'update' END) IS NOT NULL
    ORDER BY o_orderkey
    """,
    survey_ids=["J1", "R6"],
    description="Snapshot table diff (insert/delete/update per key) via "
    "md5 row fingerprints and ONE full-outer key join, on planted "
    "deletes (keys % 97), updates (% 89), and inserts (% 101 offset)",
)
def table_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.operators.incremental import table_diff

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    new = (
        base.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_orderpriority",
            F.when(
                F.col("o_orderkey") % 89 == 0, F.lit("X-UPDATED")
            ).otherwise(F.col("o_orderpriority")),
        )
        .unionByName(
            base.filter(F.col("o_orderkey") % 101 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(50_000_000)
            )
        )
    )
    return table_diff(base, new, ["o_orderkey"]).orderBy("o_orderkey")


def _km_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    surv = (
        "CASE WHEN MAX(zs) OVER upto > 0 THEN 0.0 "
        "ELSE exp(SUM(lt) OVER upto) END"
    )
    return f"""
    WITH base AS (
      SELECT date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(s.ship AS DATE)) AS dur,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
      FROM orders o
      JOIN (SELECT l_orderkey, MAX(l_shipdate) AS ship
            FROM lineitem GROUP BY 1) s
        ON o.o_orderkey = s.l_orderkey
      WHERE date_diff('day', CAST(o.o_orderdate AS DATE),
                      CAST(s.ship AS DATE)) >= 0
    ),
    tot AS (SELECT COUNT(*) AS n FROM base),
    per_t AS (
      SELECT dur, CAST(SUM(ev) AS BIGINT) AS n_event,
             CAST(SUM(1 - ev) AS BIGINT) AS n_censor
      FROM base GROUP BY dur
    ),
    r AS (
      SELECT dur, n_event, n_censor,
             CAST(n - COALESCE(SUM(n_event + n_censor) OVER (
                 ORDER BY dur
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS BIGINT) AS n_risk
      FROM per_t CROSS JOIN tot
    ),
    s AS (
      SELECT dur, n_risk, n_event, n_censor,
             CASE WHEN n_event > 0 AND n_risk = n_event
                  THEN 1 ELSE 0 END AS zs,
             CASE WHEN n_event > 0 AND n_risk > n_event
                  THEN ln(CAST(n_risk - n_event AS DOUBLE)
                          / CAST(n_risk AS DOUBLE))
                  ELSE 0.0 END AS lt
      FROM r
    )
    SELECT dur, n_risk, n_event, n_censor,
           {ref_round_sql(surv, 6)} AS surv6
    FROM s
    WINDOW upto AS (ORDER BY dur
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """


@register(
    "kaplan_meier_orders",
    oracle=_km_oracle(),
    survey_ids=["A4", "W1"],
    description="Kaplan-Meier survival curve of order fulfilment time "
    "(order date -> last shipment; non-finished orders right-censored): "
    "one groupBy collapses subjects to the duration domain, then "
    "ordered windows over that sketch-sized frame run the product-"
    "limit estimate with an any-zero guard instead of infinities",
)
def kaplan_meier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ship = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("ship")
    )
    base = (
        orders.join(ship, orders.o_orderkey == ship.l_orderkey)
        .select(
            F.datediff(F.col("ship"), F.col("o_orderdate"))
            .cast("bigint")
            .alias("dur"),
            F.when(F.col("o_orderstatus") == "F", 1)
            .otherwise(0)
            .alias("ev"),
        )
        .filter(F.col("dur") >= 0)
    )
    return A.kaplan_meier(base, "dur", "ev")


def _ab_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql
    from qudo_etl_pipeline_spark.operators.analytics import Z_CRIT_95

    p1 = "CAST(a.k AS DOUBLE) / CAST(a.n AS DOUBLE)"
    p2 = "CAST(b.k AS DOUBLE) / CAST(b.n AS DOUBLE)"
    pp = "(CAST(a.k + b.k AS DOUBLE) / CAST(a.n + b.n AS DOUBLE))"
    se = (
        f"sqrt({pp} * (1.0 - {pp}) * "
        f"(1.0 / CAST(a.n AS DOUBLE) + 1.0 / CAST(b.n AS DOUBLE)))"
    )
    z = f"(CASE WHEN {se} > 0 THEN ({p1} - {p2}) / {se} END)"
    # mirror two_proportion_ztest's exactly-two-labels guard (all-NULL
    # row otherwise) so a degenerate single-variant input can never
    # make the a/b order-by-limit device silently duplicate group A.
    # The guard row is emitted UNCONDITIONALLY via a 1-row spine with
    # LEFT JOINs to a/b (r9 ADVICE item 3): a bare CROSS JOIN of two
    # empty LIMIT-1 CTEs returns 0 rows on a fully empty event source,
    # while the Spark global agg always yields one all-NULL row
    ok = "(SELECT COUNT(*) FROM g) = 2"
    return f"""
    WITH conv AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT variant, COUNT(*) AS n,
             CAST(SUM(converted) AS BIGINT) AS k
      FROM conv GROUP BY variant
    ),
    a AS (SELECT * FROM g ORDER BY variant ASC LIMIT 1),
    b AS (SELECT * FROM g ORDER BY variant DESC LIMIT 1)
    SELECT CASE WHEN {ok} THEN a.variant END AS group_a,
           CASE WHEN {ok} THEN a.n END AS n_a,
           CASE WHEN {ok} THEN a.k END AS conv_a,
           CASE WHEN {ok} THEN b.variant END AS group_b,
           CASE WHEN {ok} THEN b.n END AS n_b,
           CASE WHEN {ok} THEN b.k END AS conv_b,
           CASE WHEN {ok} THEN {ref_round_sql(f"({p1} - {p2})", 6)} END
             AS rate_diff6,
           CASE WHEN {ok} THEN {ref_round_sql(z, 6)} END AS z6,
           CASE WHEN {ok} THEN CAST(CASE WHEN ABS({z}) > {Z_CRIT_95!r}
                     THEN 1 ELSE 0 END AS BIGINT) END AS is_significant
    FROM (SELECT 1 AS _one) _spine
    LEFT JOIN a ON TRUE
    LEFT JOIN b ON TRUE
    """


@register(
    "ab_conversion_ztest",
    oracle=_ab_oracle(),
    survey_ids=["A8", "A12"],
    description="Pooled two-proportion z-test on user-level purchase "
    "conversion under a deterministic 50/50 assignment: two integer "
    "aggregates collapse the event log to one row; significance "
    "compares |z| against the exact normal critical value (monotone in "
    "|z| — the same threshold trick as the chi-squared post-hoc layer)",
)
def ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    conv = ev.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 14,
            1,
        )
        .otherwise(0)
        .alias("converted")
    ).select(
        F.when(F.col("user_id") % 2 == 0, "A")
        .otherwise("B")
        .alias("variant"),
        "converted",
    )
    return A.two_proportion_ztest(conv, "variant", "converted")


def _winsor_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    return f"""
    WITH b AS (
      SELECT l_returnflag AS g,
             {ref_round_sql("quantile_cont(l_extendedprice, 0.05)", 6)}
               AS lo6,
             {ref_round_sql("quantile_cont(l_extendedprice, 0.95)", 6)}
               AS hi6
      FROM lineitem GROUP BY 1
    ),
    w AS (
      SELECT b.g,
             CASE WHEN l_extendedprice < lo6 THEN -1
                  WHEN l_extendedprice > hi6 THEN 1 ELSE 0 END AS f,
             CASE WHEN l_extendedprice < lo6 THEN lo6
                  WHEN l_extendedprice > hi6 THEN hi6
                  ELSE l_extendedprice END AS w
      -- IS NOT DISTINCT FROM mirrors the operator's null-safe
      -- bounds join: the NULL-key group winsorizes against its own
      -- quantiles instead of dropping (r11 NULL-salt parity)
      FROM lineitem l JOIN b ON l.l_returnflag IS NOT DISTINCT FROM b.g
    )
    SELECT g AS l_returnflag, COUNT(*) AS n,
           CAST(SUM(CASE WHEN f = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clip_lo,
           CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clip_hi,
           CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE) AS sum_w
    FROM w GROUP BY g
    """


@register(
    "winsorize_prices",
    oracle=_winsor_oracle(),
    survey_ids=["A8", "P6"],
    description="Per-group winsorization of extended prices at the "
    "[p05, p95] group quantiles (one keyed percentile pass, bounds "
    "broadcast back, big side never re-shuffled), verified through "
    "clip counts and the DECIMAL-exact sum of the clipped measure",
)
def winsorize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    w = A.winsorize(li, ["l_returnflag"], "l_extendedprice", 0.05, 0.95)
    return w.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("clip_flag") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_clip_lo"),
        F.sum(F.when(F.col("clip_flag") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_clip_hi"),
        F.sum(F.col("w").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_w"),
    )


@register(
    "exact_quantile_totalprice",
    oracle="""
    WITH s AS (
      SELECT o_totalprice AS v,
             ROW_NUMBER() OVER (ORDER BY o_totalprice) - 1 AS r
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    n AS (SELECT COUNT(*) AS c FROM s)
    SELECT c AS n, (c - 1) // 2 AS k, v AS value
    FROM s CROSS JOIN n WHERE r = (c - 1) // 2
    """,
    survey_ids=["A8", "W3"],
    description="Exact median of order totals WITHOUT a global sort: "
    "iterative equal-width histogram refinement (B-row aggregate per "
    "round, driver walks the bucket counts, ~log_B(n) scans), final "
    "sub-leaf resolved by distributed take-ordered — the 100 TB order "
    "statistic that percentile()'s unbounded histogram state cannot do",
)
def exact_quantile_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # max_leaf small enough that the refinement loop actually runs at
    # the gate scale factor (15k rows at sf0.01)
    return A.exact_quantile(
        orders, "o_totalprice", 1, 2, buckets=256, max_leaf=2_000
    )


def _qn_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    arms = "\n      UNION ALL\n      ".join(
        f"SELECT vec_id AS id, 'd{i}' AS c, "
        f"{ref_round_sql(f'CAST(embedding[{i + 1}] AS DOUBLE)', 6)} AS v "
        f"FROM embeddings"
        for i in range(3)
    )
    return f"""
    WITH m AS (
      {arms}
    ),
    r AS (
      -- NULLS FIRST mirrors the Spark prefix device's bare asc() on
      -- both rank keys: a NULL id is a valid row (salted fixtures) and
      -- must occupy the same rank slot on both engines (r12)
      SELECT id, c, v,
             ROW_NUMBER() OVER (PARTITION BY c
               ORDER BY v NULLS FIRST, id NULLS FIRST) AS rank
      FROM m
    ),
    mn AS (
      SELECT rank,
             CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS qnorm
      FROM r GROUP BY rank
    )
    SELECT id AS vec_id, c AS col_name, v AS value, rank, qnorm
    FROM r JOIN mn USING (rank)
    WHERE id % 23 = 0
    """


@register(
    "quantile_normalize_embeddings",
    oracle=_qn_oracle(),
    survey_ids=["W1", "A8", "R2"],
    description="Quantile normalization of the first three embedding "
    "dimensions (every dimension forced onto the shared rank-mean "
    "distribution): within-column ranks via the range-partitioned "
    "two-pass prefix count — never a one-task-per-column window — then "
    "DECIMAL-exact rank means joined home; three shuffles total "
    "independent of column count",
)
def quantile_normalize_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        *[
            ref_round(F.col("embedding")[i].cast("double"), 6).alias(
                f"d{i}"
            )
            for i in range(3)
        ],
    )
    out = A.quantile_normalize(emb, "vec_id", ["d0", "d1", "d2"])
    return out.filter(F.col("vec_id") % 23 == 0)


@register(
    "weighted_median_prices",
    oracle="""
    WITH f AS (
      SELECT l_returnflag AS g, l_extendedprice AS v,
             CAST(l_quantity AS DECIMAL(18,6)) AS w
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    ),
    c AS (
      SELECT g, v,
             SUM(w) OVER (PARTITION BY g ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cumw,
             SUM(w) OVER (PARTITION BY g) AS totw,
             COUNT(*) OVER (PARTITION BY g) AS n
      FROM f
    )
    SELECT g AS l_returnflag,
           MIN(v) AS wq_value,
           CAST(ANY_VALUE(totw) AS DOUBLE) AS total_weight,
           CAST(ANY_VALUE(n) AS BIGINT) AS n
    FROM c WHERE 2 * cumw >= 1 * totw
    GROUP BY g
    """,
    survey_ids=["A5", "A8", "W1"],
    description="Quantity-weighted median extended price per return "
    "flag: value-ordered DECIMAL running weight + integer-exact "
    "crossing test + min-over-crossing-rows (tie-stable in any engine) "
    "— ONE keyed shuffle, the aggregate reuses the window partitioning",
)
def weighted_median_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return A.weighted_quantile(
        li, ["l_returnflag"], "l_extendedprice", "l_quantity", 1, 2
    )


def _mw_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql
    from qudo_etl_pipeline_spark.operators.analytics import Z_CRIT_95

    num = "((CAST(r2_a - n_a * (n_a + 1) AS DOUBLE)"
    num += " - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) / 2.0)"
    nn = "(CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))"
    var = (
        f"(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 * "
        f"(({nn} + 1.0) - CAST(t3 AS DOUBLE) / ({nn} * ({nn} - 1.0))))"
    )
    z = f"(CASE WHEN {var} > 0 THEN {num} / sqrt({var}) END)"
    return f"""
    WITH per_v AS (
      SELECT l_quantity AS v,
             CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM lineitem
      WHERE l_returnflag IN ('A', 'R') AND l_quantity IS NOT NULL
      GROUP BY l_quantity
    ),
    ranked AS (
      SELECT ca, cb, ca + cb AS ct,
             ca * (2 * COALESCE(SUM(ca + cb) OVER (
                 ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) + (ca + cb) + 1) AS r2a
      FROM per_v
    ),
    agg AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(cb) AS BIGINT) AS n_b,
             CAST(SUM(r2a) AS BIGINT) AS r2_a,
             CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS t3
      FROM ranked
    )
    SELECT n_a, n_b,
           CAST(r2_a - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
           {ref_round_sql(z, 6)} AS z6,
           CAST(CASE WHEN ABS({z}) > {Z_CRIT_95!r} THEN 1 ELSE 0 END
                AS BIGINT) AS is_significant
    FROM agg
    """


@register(
    "mann_whitney_quantity",
    oracle=_mw_oracle(),
    survey_ids=["A8", "M21"],
    description="Mann-Whitney U rank-sum test of lineitem quantity "
    "between return flags A and R on the distinct-value frame "
    "(midrank mass in integer arithmetic via the 2R doubling trick, "
    "tie-corrected normal approximation, threshold significance)",
)
def mann_whitney_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return A.mann_whitney_u(li, "l_returnflag", "l_quantity", "A", "R")


def _hill_oracle(d_min: int = 70) -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    alpha = "1.0 + CAST(n_tail AS DOUBLE) / CAST(lnsum AS DOUBLE)"
    return f"""
    WITH counts AS (
      SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id
    ),
    per_v AS (
      SELECT c AS v, COUNT(*) AS m FROM counts
      WHERE c >= {d_min} GROUP BY c
    ),
    agg AS (
      SELECT CAST(SUM(m) AS BIGINT) AS n_tail,
             SUM(CAST(CAST(m AS DOUBLE)
                 * ln(CAST(v AS DOUBLE) / {float(d_min)!r})
                 AS DECIMAL(38,12))) AS lnsum
      FROM per_v
    )
    SELECT CAST({d_min} AS BIGINT) AS d_min, n_tail,
           CASE WHEN lnsum > 0 THEN {ref_round_sql(alpha, 6)} END
             AS alpha6
    FROM agg
    WHERE n_tail IS NOT NULL
    """


@register(
    "hill_tail_user_activity",
    oracle=_hill_oracle(),
    survey_ids=["A8", "A4"],
    description="Hill power-law tail exponent of per-user event counts "
    "(the will-this-key-distribution-skew-my-shuffles diagnostic): "
    "tail ln-mass quantized to DECIMAL(38,12) per distinct count and "
    "summed exactly (association-free, no ordered window), alpha from "
    "one fixed IEEE expression",
)
def hill_tail_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return A.hill_tail_index(counts, "c", 70)


@register(
    "gini_user_activity",
    oracle="""
    WITH counts AS (
      SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id
    ),
    per_v AS (SELECT c AS v, COUNT(*) AS m FROM counts GROUP BY c),
    terms AS (
      SELECT v, m,
             v * m * (2 * COALESCE(SUM(m) OVER (
                 ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) + m + 1) AS r2x
      FROM per_v
    ),
    agg AS (
      SELECT CAST(SUM(m) AS BIGINT) AS n,
             CAST(SUM(v * m) AS BIGINT) AS sx,
             CAST(SUM(r2x) AS BIGINT) AS r2x
      FROM terms
    )
    SELECT n, sx,
           CASE WHEN sx > 0 THEN ROUND(
             CAST(r2x AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) END
             AS gini6
    FROM agg
    """,
    survey_ids=["A8", "A9"],
    description="Gini inequality coefficient of per-user event counts: "
    "midrank mass on the distinct-value frame keeps 2*sum(rank*x) a "
    "pure bigint, so G is one fixed IEEE expression over exact "
    "integers — tie-order free, bit-identical cross-engine",
)
def gini_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return A.gini_coefficient(counts, "c")


_BOOT_B = 200


def _boot_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.hashing import (
        UNIVERSAL_MOD,
        UNIVERSAL_RANGE,
        hash64_sql,
    )
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql
    from qudo_etl_pipeline_spark.operators.analytics import (
        _POISSON1_CDF_PPM,
    )

    h0 = hash64_sql("('17:' || id)")
    base = f"({h0} % {UNIVERSAL_RANGE})"
    a = (
        f"(CASE WHEN (r * 2654435761 + 1) % {UNIVERSAL_MOD} = 0 THEN 1"
        f" ELSE (r * 2654435761 + 1) % {UNIVERSAL_MOD} END)"
    )
    b = f"((r * 1013904223 + 12345) % {UNIVERSAL_MOD})"
    u = f"((({a} * b0 + {b}) % {UNIVERSAL_MOD}) % 1000000)"
    whens = " ".join(
        f"WHEN {u} < {t} THEN {k}"
        for k, t in enumerate(_POISSON1_CDF_PPM)
    )
    return f"""
    WITH src AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS id, o_totalprice AS v
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    based AS (SELECT v, {base} AS b0 FROM src),
    fan AS (
      SELECT v, r, CASE {whens} ELSE 6 END AS w
      FROM based CROSS JOIN (
        SELECT unnest(range(0, {_BOOT_B})) AS r
      )
    ),
    reps AS (
      SELECT r,
             CAST(SUM(CAST(w * CAST(v AS DECIMAL(18,6))
                           AS DECIMAL(28,6))) AS DOUBLE)
               / CAST(SUM(w) AS DOUBLE) AS m
      FROM fan GROUP BY r
    ),
    ci AS (
      SELECT quantile_cont(m, 0.025) AS lo,
             quantile_cont(m, 0.975) AS hi
      FROM reps
    ),
    base AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(v AS DECIMAL(27,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS mean
      FROM src
    )
    SELECT n, {ref_round_sql("mean", 6)} AS mean6,
           {ref_round_sql("lo", 6)} AS ci_lo6,
           {ref_round_sql("hi", 6)} AS ci_hi6,
           CAST({_BOOT_B} AS BIGINT) AS n_boot
    FROM base CROSS JOIN ci
    """


@register(
    "bootstrap_ci_totalprice",
    oracle=_boot_oracle(),
    survey_ids=["A8", "R5"],
    description="Poisson-bootstrap 95% CI for the mean order total: "
    "deterministic hash-drawn Poisson(1) weights per (row, replicate) "
    "through a quantized inverse-CDF table, map-side-combined to a "
    "200-row replicate-mean frame — the index-free distributed "
    "bootstrap, bit-reproducible in any engine",
)
def bootstrap_ci_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return A.bootstrap_ci_mean(
        orders, "o_orderkey", "o_totalprice", n_boot=_BOOT_B, seed=17
    )


def _ltv_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    return f"""
    WITH evd AS (
      -- undated events take no part in cohort analytics (r11
      -- NULL-salt parity; mirrored in the Spark-side filter)
      SELECT * FROM events WHERE ts IS NOT NULL
    ),
    cohort AS (
      SELECT user_id AS u, MIN(CAST(ts AS DATE)) AS c
      FROM evd GROUP BY user_id
    ),
    rev AS (
      SELECT strftime(c, '%Y-%m-%d') AS cohort_day,
             CAST(CAST(e.ts AS DATE) - c AS BIGINT) AS day_offset,
             SUM(CAST(e.value AS DECIMAL(18,6))) AS _rev
      FROM evd e JOIN cohort ON e.user_id = cohort.u
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    ),
    sizes AS (
      SELECT strftime(c, '%Y-%m-%d') AS cohort_day,
             COUNT(*) AS cohort_size
      FROM cohort GROUP BY 1
    )
    SELECT r.cohort_day, r.day_offset, s.cohort_size,
           CAST(r._rev AS DOUBLE) AS rev,
           CAST(SUM(r._rev) OVER w AS DOUBLE) AS cum_rev,
           {ref_round_sql(
               "CAST(SUM(r._rev) OVER w AS DOUBLE)"
               " / CAST(s.cohort_size AS DOUBLE)", 6)} AS ltv6
    FROM rev r JOIN sizes s USING (cohort_day)
    WINDOW w AS (PARTITION BY r.cohort_day ORDER BY r.day_offset
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """


@register(
    "cohort_ltv_curves",
    oracle=_ltv_oracle(),
    survey_ids=["A4", "A5", "W1"],
    description="Cohort lifetime-value curves (cumulative purchase "
    "revenue per user by cohort age): the retention-cohort device plus "
    "a DECIMAL-exact running total over the date-domain-bounded "
    "(cohort, offset) frame — events are never windowed",
)
def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).filter(F.col("ts").isNotNull())
    return A.cohort_ltv(ev, ["purchase"])


def _ks_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    d = "CAST(dmax AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"
    crit = (
        "1.3581015157406195 * sqrt((CAST(n_a AS DOUBLE)"
        " + CAST(n_b AS DOUBLE))"
        " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))"
    )
    return f"""
    WITH per_v AS (
      SELECT o_totalprice AS v,
             CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
                           THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND o_totalprice IS NOT NULL
      GROUP BY o_totalprice
    ),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(cb) AS BIGINT) AS n_b
      FROM per_v
    ),
    cums AS (
      SELECT ABS(SUM(ca) OVER upto * n_b - SUM(cb) OVER upto * n_a)
               AS dev, n_a, n_b
      FROM per_v CROSS JOIN tot
      WINDOW upto AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW)
    ),
    agg AS (
      SELECT n_a, n_b, CAST(MAX(dev) AS BIGINT) AS dmax
      FROM cums GROUP BY n_a, n_b
    )
    SELECT n_a, n_b,
           {ref_round_sql(d, 6)} AS d6,
           {ref_round_sql(crit, 6)} AS crit6,
           CAST(CASE WHEN {d} > {crit} THEN 1 ELSE 0 END AS BIGINT)
             AS is_significant
    FROM agg
    """


@register(
    "ks_test_totalprice",
    oracle=_ks_oracle(),
    survey_ids=["A8", "M21"],
    description="Two-sample Kolmogorov-Smirnov test of order totals "
    "between URGENT and HIGH priorities: ECDF deviations maximized in "
    "the integer cross-multiplied form on the distinct-value frame "
    "(1-row totals broadcast), large-sample critical-value verdict",
)
def ks_test_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return A.ks_two_sample(
        orders, "o_orderpriority", "o_totalprice", "1-URGENT", "2-HIGH"
    )


_KS_BINS = 64


def _ks_binned_oracle(bins: int = _KS_BINS) -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    d = "CAST(dmax AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"
    crit = (
        "1.3581015157406195 * sqrt((CAST(n_a AS DOUBLE)"
        " + CAST(n_b AS DOUBLE))"
        " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))"
    )
    # bucket arithmetic mirrors the Spark plan OPERATION FOR OPERATION:
    # (v - lo) / ((hi - lo) / bins), floor, two-sided clamp — identical
    # IEEE expression tree, identical buckets in both engines
    bucket = (
        f"GREATEST(0, LEAST({bins - 1}, "
        f"FLOOR((CAST(v AS DOUBLE) - lo) / ((hi - lo) / {float(bins)!r}))))"
    )
    return f"""
    WITH src AS (
      SELECT o_orderpriority AS g, o_totalprice AS v
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND o_totalprice IS NOT NULL
    ),
    rng AS (
      SELECT MIN(CAST(v AS DOUBLE)) AS lo, MAX(CAST(v AS DOUBLE)) AS hi
      FROM src
    ),
    binned AS (
      SELECT g,
             CAST(CASE WHEN (hi - lo) / {float(bins)!r} > 0
                       THEN {bucket} ELSE 0 END AS BIGINT) AS v
      FROM src CROSS JOIN rng
    ),
    per_v AS (
      SELECT v,
             CAST(SUM(CASE WHEN g = '1-URGENT' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN g = '2-HIGH' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM binned GROUP BY v
    ),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(cb) AS BIGINT) AS n_b
      FROM per_v
    ),
    cums AS (
      SELECT ABS(SUM(ca) OVER upto * n_b - SUM(cb) OVER upto * n_a)
               AS dev, n_a, n_b
      FROM per_v CROSS JOIN tot
      WINDOW upto AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW)
    ),
    agg AS (
      SELECT n_a, n_b, CAST(MAX(dev) AS BIGINT) AS dmax
      FROM cums GROUP BY n_a, n_b
    )
    SELECT n_a, n_b,
           {ref_round_sql(d, 6)} AS d6,
           {ref_round_sql(crit, 6)} AS crit6,
           CAST(CASE WHEN {d} > {crit} THEN 1 ELSE 0 END AS BIGINT)
             AS is_significant
    FROM agg
    """


@register(
    "ks_test_totalprice_binned",
    oracle=_ks_binned_oracle(),
    survey_ids=["A8", "M21"],
    description="Binned two-sample KS test of order totals (64 "
    "equi-width bins on the pooled broadcast range): the frame the "
    "ECDFs run on is 64 rows REGARDLESS of measure cardinality — the "
    "documented scale path for continuous measures; conservative to "
    "within the max per-bin sample mass (D_binned <= D_exact <= "
    "D_binned + max bin mass)",
)
def ks_test_totalprice_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return A.ks_two_sample(
        orders,
        "o_orderpriority",
        "o_totalprice",
        "1-URGENT",
        "2-HIGH",
        bins=_KS_BINS,
    )


def _running_ecdf_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    # both running and grand totals are ROUNDED to scale 2 in the
    # DECIMAL domain before the double cast (the q1_pricing_summary
    # device): at scale 6 the cumulative revenue's unscaled value
    # crosses 2^53 in the distribution's top tail at sf1 (~5.6k rows
    # diverged by 1 ulp in the sweep that caught this); at scale 2 it
    # is exact to 9e13. The share then divides the SAME two rounded
    # doubles on both engines.
    share = (
        "CAST(ROUND(crev, 2) AS DOUBLE) / CAST(ROUND(trev, 2) AS DOUBLE)"
    )
    return f"""
    WITH per_v AS (
      SELECT o_totalprice AS v, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
      FROM orders WHERE o_totalprice IS NOT NULL GROUP BY o_totalprice
    ),
    tot AS (SELECT SUM(rev) AS trev FROM per_v),
    c AS (
      SELECT v, n,
             CAST(SUM(n) OVER upto AS BIGINT) AS cum_n,
             SUM(rev) OVER upto AS crev
      FROM per_v
      WINDOW upto AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW)
    )
    SELECT v, n, cum_n, CAST(ROUND(crev, 2) AS DOUBLE) AS cum_rev,
           {ref_round_sql(share, 6)} AS share6
    FROM c CROSS JOIN tot
    """


@register(
    "running_revenue_ecdf",
    oracle=_running_ecdf_oracle(),
    survey_ids=["W3", "A9"],
    description="Row-count-scaled running sums through the "
    "range-partitioned prefix device, oracle-checked at FULL output "
    "cardinality: per distinct order total, cumulative order count "
    "(bigint-exact) and DECIMAL-exact cumulative revenue + share — "
    "the distinct-value frame is ~the table's row count, exactly the "
    "shape a global Window.orderBy would serialize into one task",
)
def running_revenue_ecdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round
    from qudo_etl_pipeline_spark.operators.prefix import (
        ranged_prefix_sums,
    )

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    per_v = orders.groupBy(F.col("o_totalprice").alias("v")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("_rev"),
    )
    cum = ranged_prefix_sums(
        per_v, ["v"], {"cum_n": "n", "_crev": "_rev"}
    )
    tot = per_v.agg(F.sum("_rev").alias("_trev"))
    # scale-2 decimal pre-round before the double casts — see
    # _running_ecdf_oracle's comment (keeps the unscaled cumulative
    # exact under 2^53 at any plausible SF)
    crev2 = F.round(F.col("_crev"), 2).cast("double")
    trev2 = F.round(F.col("_trev"), 2).cast("double")
    return cum.crossJoin(F.broadcast(tot)).select(
        "v",
        "n",
        "cum_n",
        crev2.alias("cum_rev"),
        ref_round(crev2 / trev2, 6).alias("share6"),
    )


def _mi_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    mi = "CAST(mis AS DOUBLE) / CAST(n AS DOUBLE)"
    h_a = "CAST(has AS DOUBLE) / CAST(n AS DOUBLE)"
    h_b = "CAST(hbs AS DOUBLE) / CAST(n AS DOUBLE)"
    nmi = f"({mi}) / sqrt(({h_a}) * ({h_b}))"
    return f"""
    WITH cells AS (
      SELECT o_orderstatus AS a, o_orderpriority AS b,
             CAST(COUNT(*) AS BIGINT) AS nab
      FROM orders
      WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
      GROUP BY 1, 2
    ),
    ma AS (SELECT a, CAST(SUM(nab) AS BIGINT) AS na FROM cells GROUP BY a),
    mb AS (SELECT b, CAST(SUM(nab) AS BIGINT) AS nb FROM cells GROUP BY b),
    tot AS (SELECT CAST(SUM(nab) AS BIGINT) AS n FROM cells),
    mis_t AS (
      SELECT SUM(CAST(
               CAST(nab AS DOUBLE) * ln(
                 (CAST(n AS DOUBLE) * CAST(nab AS DOUBLE))
                 / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
             AS DECIMAL(38,12))) AS mis,
             MAX(n) AS n
      FROM cells JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot
    ),
    ha_t AS (
      SELECT SUM(CAST(
               CAST(na AS DOUBLE)
               * ln(CAST(n AS DOUBLE) / CAST(na AS DOUBLE))
             AS DECIMAL(38,12))) AS has
      FROM ma CROSS JOIN tot
    ),
    hb_t AS (
      SELECT SUM(CAST(
               CAST(nb AS DOUBLE)
               * ln(CAST(n AS DOUBLE) / CAST(nb AS DOUBLE))
             AS DECIMAL(38,12))) AS hbs
      FROM mb CROSS JOIN tot
    )
    SELECT n, {ref_round_sql(mi, 6)} AS mi6,
           {ref_round_sql(h_a, 6)} AS h_a6,
           {ref_round_sql(h_b, 6)} AS h_b6,
           CASE WHEN {h_a} > 0 AND {h_b} > 0
                THEN {ref_round_sql(nmi, 6)} END AS nmi6
    FROM mis_t CROSS JOIN ha_t CROSS JOIN hb_t
    WHERE n IS NOT NULL
    """


@register(
    "mutual_information_priority_status",
    oracle=_mi_oracle(),
    survey_ids=["M21", "A1"],
    description="Mutual information + entropies + NMI between order "
    "status and priority from ONE cell-frame pass: every ln term is a "
    "fixed IEEE expression over exact integer counts quantized to "
    "DECIMAL(38,12) before summation (association-free, the "
    "hill_tail_index device), marginals broadcast from the cell frame "
    "— never a second table scan",
)
def mutual_information_priority_status(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return A.mutual_information(orders, "o_orderstatus", "o_orderpriority")


#: src CTE both rank-correlation oracles share by default: quantity
#: (already discrete) x the 10k-wide price band.
_RANK_SRC_BANDED = """
      SELECT l_quantity AS a,
             CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) / 10000.0)
                  AS BIGINT) AS b
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
"""


def _rank_src_autobinned(bins: int) -> str:
    """src CTE mirroring the operator's ``on_excess='bin'`` device
    OPERATION FOR OPERATION (the ks_binned bucket arithmetic, per
    column): price and the discounted charge, each equi-width
    discretized onto ``bins`` buckets over its own broadcast min/max.
    """
    w = f"{float(bins)!r}"

    def bucket(v: str, lo: str, hi: str) -> str:
        return (
            f"CAST(CASE WHEN ({hi} - {lo}) / {w} > 0 THEN "
            f"GREATEST(0, LEAST({bins - 1}, "
            f"FLOOR(({v} - {lo}) / (({hi} - {lo}) / {w})))) "
            f"ELSE 0 END AS BIGINT)"
        )

    return f"""
      SELECT {bucket('x', 'lox', 'hix')} AS a,
             {bucket('y', 'loy', 'hiy')} AS b
      FROM (
        SELECT CAST(l_extendedprice AS DOUBLE) AS x,
               CAST(l_extendedprice AS DOUBLE)
                 * (1.0 - CAST(l_discount AS DOUBLE)) AS y
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
      ) CROSS JOIN (
        SELECT MIN(CAST(l_extendedprice AS DOUBLE)) AS lox,
               MAX(CAST(l_extendedprice AS DOUBLE)) AS hix,
               MIN(CAST(l_extendedprice AS DOUBLE)
                   * (1.0 - CAST(l_discount AS DOUBLE))) AS loy,
               MAX(CAST(l_extendedprice AS DOUBLE)
                   * (1.0 - CAST(l_discount AS DOUBLE))) AS hiy
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
      )
"""


def _tau_oracle(src_sql: str = _RANK_SRC_BANDED) -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    n0x2 = "CAST(n AS HUGEINT) * (n - 1)"
    tau = (
        "2.0 * CAST(conc - disc AS DOUBLE) / sqrt("
        f"CAST({n0x2} - t1x2 AS DOUBLE)"
        f" * CAST({n0x2} - t2x2 AS DOUBLE))"
    )
    den = (
        f"CAST({n0x2} - t1x2 AS DOUBLE)"
        f" * CAST({n0x2} - t2x2 AS DOUBLE)"
    )
    return f"""
    WITH src AS ({src_sql}
    ),
    cells AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS nab
      FROM src GROUP BY a, b
    ),
    cd AS (
      SELECT CAST(SUM(CASE WHEN c2.b > c1.b
                           THEN CAST(c1.nab AS HUGEINT) * c2.nab
                           ELSE 0 END) AS BIGINT) AS conc,
             CAST(SUM(CASE WHEN c2.b < c1.b
                           THEN CAST(c1.nab AS HUGEINT) * c2.nab
                           ELSE 0 END) AS BIGINT) AS disc
      FROM cells c1 JOIN cells c2 ON c2.a > c1.a
    ),
    ta AS (
      SELECT SUM(CAST(m AS HUGEINT) * (m - 1)) AS t1x2,
             CAST(SUM(m) AS BIGINT) AS n
      FROM (SELECT CAST(SUM(nab) AS BIGINT) AS m FROM cells GROUP BY a)
    ),
    tb AS (
      SELECT SUM(CAST(m AS HUGEINT) * (m - 1)) AS t2x2
      FROM (SELECT CAST(SUM(nab) AS BIGINT) AS m FROM cells GROUP BY b)
    )
    SELECT n, COALESCE(conc, 0) AS conc, COALESCE(disc, 0) AS disc,
           CASE WHEN {den} > 0 THEN {ref_round_sql(tau, 6)} END
             AS tau_b6
    FROM cd CROSS JOIN ta CROSS JOIN tb
    WHERE n IS NOT NULL
    """


@register(
    "kendall_tau_quantity_price",
    oracle=_tau_oracle(),
    survey_ids=["M21", "A8"],
    description="Kendall's tau-b between lineitem quantity and the "
    "10k-wide price band, exactly from the contingency cells: C/D "
    "from the domain-bounded cell-frame self-join (never O(rows^2) "
    "pairs), tie-corrected denominator in doubled-integer form, one "
    "fixed IEEE expression at the end",
)
def kendall_tau_quantity_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
    )
    binned = li.select(
        F.col("l_quantity").alias("qty"),
        F.floor(
            F.col("l_extendedprice").cast("double") / F.lit(10000.0)
        )
        .cast("bigint")
        .alias("price_band"),
    )
    return A.kendall_tau_b(binned, "qty", "price_band")


def _spearman_oracle(src_sql: str = _RANK_SRC_BANDED) -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    num = "CAST(CAST(w AS HUGEINT) * sxy - sx * sy AS DOUBLE)"
    vx = "CAST(CAST(w AS HUGEINT) * sxx - sx * sx AS DOUBLE)"
    vy = "CAST(CAST(w AS HUGEINT) * syy - sy * sy AS DOUBLE)"
    rho = f"({num}) / (sqrt({vx}) * sqrt({vy}))"
    return f"""
    WITH src AS ({src_sql}
    ),
    cells AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS nab
      FROM src GROUP BY a, b
    ),
    ra AS (
      SELECT a, 2 * COALESCE(SUM(m) OVER (ORDER BY a
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + m + 1 AS r2a
      FROM (SELECT a, CAST(SUM(nab) AS BIGINT) AS m FROM cells GROUP BY a)
    ),
    rb AS (
      SELECT b, 2 * COALESCE(SUM(m) OVER (ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + m + 1 AS r2b
      FROM (SELECT b, CAST(SUM(nab) AS BIGINT) AS m FROM cells GROUP BY b)
    ),
    moments AS (
      SELECT CAST(SUM(nab) AS HUGEINT) AS w,
             SUM(CAST(nab AS HUGEINT) * r2a) AS sx,
             SUM(CAST(nab AS HUGEINT) * r2b) AS sy,
             SUM(CAST(nab AS HUGEINT) * r2a * r2a) AS sxx,
             SUM(CAST(nab AS HUGEINT) * r2b * r2b) AS syy,
             SUM(CAST(nab AS HUGEINT) * r2a * r2b) AS sxy
      FROM cells JOIN ra USING (a) JOIN rb USING (b)
    )
    SELECT CAST(w AS BIGINT) AS n,
           CASE WHEN {vx} > 0 AND {vy} > 0
                THEN {ref_round_sql(rho, 6)} END AS rho6
    FROM moments
    WHERE w IS NOT NULL
    """


@register(
    "spearman_rho_quantity_price",
    oracle=_spearman_oracle(),
    survey_ids=["M21", "A8"],
    description="Tie-corrected Spearman rank correlation between "
    "lineitem quantity and the 10k price band: Pearson over DOUBLED "
    "integer midranks from the cell frame (doubling cancels in the "
    "correlation), every moment a DECIMAL/HUGEINT product of exact "
    "integers — only the final sqrt/divide is IEEE",
)
def spearman_rho_quantity_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
    )
    binned = li.select(
        F.col("l_quantity").alias("qty"),
        F.floor(
            F.col("l_extendedprice").cast("double") / F.lit(10000.0)
        )
        .cast("bigint")
        .alias("price_band"),
    )
    return A.spearman_rho(binned, "qty", "price_band")


_AUTOBIN_BINS = 32


def _price_charge_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two RAW continuous measures (price, discounted charge) — the
    exact input shape the bounded-domain gate exists to catch; the
    on_excess='bin' queries below feed it straight to the operators."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
        & F.col("l_discount").isNotNull()
    )
    price = F.col("l_extendedprice").cast("double")
    return li.select(
        price.alias("x"),
        (price * (F.lit(1.0) - F.col("l_discount").cast("double")))
        .alias("y"),
    )


@register(
    "kendall_tau_autobinned_charge",
    oracle=_tau_oracle(_rank_src_autobinned(_AUTOBIN_BINS)),
    survey_ids=["M21", "A8"],
    description="Kendall's tau-b with on_excess='bin' on two RAW "
    "continuous measures (price vs discounted charge): the operator "
    "itself equi-width discretizes both onto 32 buckets (one 1-row "
    "broadcast min/max, the binned-KS device) before the cell frame "
    "builds — exercising the enforced bounded-domain contract's "
    "auto-bin escape hatch end-to-end against a DuckDB mirror",
)
def kendall_tau_autobinned_charge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return A.kendall_tau_b(
        _price_charge_pair(spark, sf_dir),
        "x",
        "y",
        max_domain=_AUTOBIN_BINS,
        on_excess="bin",
    )


@register(
    "spearman_rho_autobinned_charge",
    oracle=_spearman_oracle(_rank_src_autobinned(_AUTOBIN_BINS)),
    survey_ids=["M21", "A8"],
    description="Binned Spearman rho via on_excess='bin' over the "
    "same raw (price, discounted charge) pair: auto-discretization "
    "inside the operator, then doubled-integer midranks over the now "
    "32-bounded margins — the enforcement path, oracle-checked",
)
def spearman_rho_autobinned_charge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return A.spearman_rho(
        _price_charge_pair(spark, sf_dir),
        "x",
        "y",
        max_domain=_AUTOBIN_BINS,
        on_excess="bin",
    )


def _psi_oracle(bins: int = 10, floor_ppm: int = 100) -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    floor = f"{floor_ppm}.0 / 1000000.0"
    pa = f"GREATEST(CAST(ca AS DOUBLE) / CAST(n_a AS DOUBLE), {floor})"
    pb = f"GREATEST(CAST(cb AS DOUBLE) / CAST(n_b AS DOUBLE), {floor})"
    bucket = (
        f"GREATEST(0, LEAST({bins - 1}, "
        f"FLOOR((CAST(v AS DOUBLE) - lo) / ((hi - lo) / {float(bins)!r}))))"
    )
    return f"""
    WITH u AS (
      SELECT o_totalprice AS v, 0 AS s FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice IS NOT NULL
      UNION ALL
      SELECT o_totalprice AS v, 1 AS s FROM orders
      WHERE o_orderpriority = '5-LOW' AND o_totalprice IS NOT NULL
    ),
    rng AS (SELECT MIN(CAST(v AS DOUBLE)) AS lo,
                   MAX(CAST(v AS DOUBLE)) AS hi FROM u),
    binned AS (
      SELECT s,
             CAST(CASE WHEN (hi - lo) / {float(bins)!r} > 0
                       THEN {bucket} ELSE 0 END AS BIGINT) AS b
      FROM u CROSS JOIN rng
    ),
    per_b AS (
      SELECT b,
             CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM binned GROUP BY b
    ),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(cb) AS BIGINT) AS n_b,
             CAST(COUNT(*) AS BIGINT) AS n_bins_used
      FROM per_b
    ),
    agg AS (
      SELECT n_a, n_b, n_bins_used,
             SUM(CAST(({pa} - {pb}) * ln({pa} / {pb})
                 AS DECIMAL(38,12))) AS psi
      FROM per_b CROSS JOIN tot
      GROUP BY n_a, n_b, n_bins_used
    )
    SELECT n_a, n_b, n_bins_used,
           {ref_round_sql("CAST(psi AS DOUBLE)", 6)} AS psi6
    FROM agg
    WHERE n_a IS NOT NULL AND n_a > 0 AND n_b > 0
    """


@register(
    "psi_drift_priority_prices",
    oracle=_psi_oracle(),
    survey_ids=["A8", "A9", "M21"],
    description="Population Stability Index of order totals between "
    "URGENT and LOW priorities: equi-width bins on the pooled "
    "broadcast range (the binned-KS device), identical ppm floor on "
    "both shares, per-bin terms DECIMAL(38,12)-quantized before the "
    "association-free sum — the standard feature-drift monitor",
)
def psi_drift_priority_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    b = orders.filter(F.col("o_orderpriority") == "5-LOW")
    return A.psi_drift(a, b, "o_totalprice", bins=10)


def _gains_oracle(k: int = 10) -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    label = (
        "CASE WHEN (c_custkey * 2654435761) % 997"
        " < 200 + FLOOR(CAST(c_acctbal AS DOUBLE) / 20.0)"
        " THEN 1 ELSE 0 END"
    )
    base = "CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE)"
    return f"""
    WITH scored AS (
      -- a NULL score has no decile and a NULL id no deterministic
      -- tie-break position — unscoreable rows excluded (mirrored in
      -- the Spark-side filter; r11 NULL-salt parity)
      SELECT -CAST(c_acctbal AS DOUBLE) AS negscore,
             CAST({label} AS BIGINT) AS y,
             c_custkey
      FROM customer
      WHERE c_acctbal IS NOT NULL AND c_custkey IS NOT NULL
    ),
    b AS (
      SELECT y, NTILE({k}) OVER (ORDER BY negscore, c_custkey) AS bucket
      FROM scored
    ),
    per_b AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS responders
      FROM b GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS tn,
             CAST(SUM(responders) AS BIGINT) AS tr
      FROM per_b
    ),
    c AS (
      SELECT bucket, n, responders,
             CAST(SUM(n) OVER upto AS BIGINT) AS cum_n,
             CAST(SUM(responders) OVER upto AS BIGINT) AS cum_r,
             tn, tr
      FROM per_b CROSS JOIN tot
      WINDOW upto AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW)
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, n, responders,
           {ref_round_sql(
               "CAST(responders AS DOUBLE) / CAST(n AS DOUBLE)", 6)}
             AS resp_rate6,
           CASE WHEN tr > 0 THEN {ref_round_sql(
               "CAST(cum_r AS DOUBLE) / CAST(tr AS DOUBLE)", 6)} END
             AS cum_capture6,
           CASE WHEN tr > 0 THEN {ref_round_sql(
               "(CAST(cum_r AS DOUBLE) / CAST(cum_n AS DOUBLE))"
               f" / ({base})", 6)} END AS cum_lift6
    FROM c
    """


@register(
    "gains_curve_planted",
    oracle=_gains_oracle(),
    survey_ids=["W2", "A9", "M2"],
    description="Cumulative gains / lift table over a PLANTED "
    "score-dependent outcome on customer (response probability rises "
    "with account balance by construction): exact decile NTILE via "
    "the closed-form prefix device on the negated score, capture and "
    "lift from integer cumulative sums over the 10-row bucket frame",
)
def gains_curve_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal").isNotNull() & F.col("c_custkey").isNotNull()
    )
    label = F.when(
        (F.col("c_custkey") * F.lit(2654435761)) % 997
        < F.lit(200) + F.floor(F.col("c_acctbal").cast("double") / 20.0),
        1,
    ).otherwise(0)
    scored = cust.select(
        F.col("c_acctbal").alias("score"),
        label.cast("bigint").alias("resp"),
        "c_custkey",
    )
    return A.gains_curve(
        scored, "score", "resp", 10, tiebreak=["c_custkey"]
    ).orderBy("bucket")


def _cuped_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    n = "CAST(gn AS DOUBLE)"
    cov = f"CAST(pyx AS DOUBLE) - (CAST(py AS DOUBLE) * CAST(px AS DOUBLE) / {n})"
    varx = f"CAST(pxx AS DOUBLE) - (CAST(px AS DOUBLE) * CAST(px AS DOUBLE) / {n})"
    vary = f"CAST(pyy AS DOUBLE) - (CAST(py AS DOUBLE) * CAST(py AS DOUBLE) / {n})"
    theta = f"CASE WHEN {varx} > 0 THEN ({cov}) / ({varx}) END"
    rho2 = (
        f"CASE WHEN {varx} > 0 AND {vary} > 0 "
        f"THEN (({cov}) * ({cov})) / (({varx}) * ({vary})) END"
    )
    mean_x = f"CAST(px AS DOUBLE) / {n}"
    gm_y = "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)"
    gm_x = "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"
    adj = f"{gm_y} - ({theta}) * ({gm_x} - ({mean_x}))"
    return f"""
    WITH src AS (
      SELECT l_returnflag AS g,
             CAST(l_extendedprice AS DOUBLE) AS y,
             CAST(l_quantity AS DOUBLE) AS x
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    ),
    per_g AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(y AS DECIMAL(38,12))) AS sy,
             SUM(CAST(x AS DECIMAL(38,12))) AS sx
      FROM src GROUP BY g
    ),
    pooled AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS gn,
             SUM(CAST(y AS DECIMAL(38,12))) AS py,
             SUM(CAST(x AS DECIMAL(38,12))) AS px,
             SUM(CAST(y * x AS DECIMAL(38,12))) AS pyx,
             SUM(CAST(x * x AS DECIMAL(38,12))) AS pxx,
             SUM(CAST(y * y AS DECIMAL(38,12))) AS pyy
      FROM src
    )
    SELECT g AS l_returnflag, n,
           {ref_round_sql(gm_y, 6)} AS mean_metric6,
           {ref_round_sql(adj, 6)} AS mean_adj6,
           {ref_round_sql(theta, 6)} AS theta6,
           {ref_round_sql(rho2, 6)} AS var_reduction6
    FROM per_g CROSS JOIN pooled
    """


@register(
    "cuped_price_by_returnflag",
    oracle=_cuped_oracle(),
    survey_ids=["A8", "A5", "M2"],
    description="CUPED variance-reduced group means (Deng et al. "
    "WSDM'13): price adjusted by the quantity covariate, pooled "
    "theta=cov/var from ONE aggregate pass with every cross-term "
    "quantized to DECIMAL(38,12) before summation (association-free, "
    "engine-identical) - the A/B sensitivity booster, with rho^2 "
    "reporting the variance fraction removed",
)
def cuped_price_by_returnflag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return A.cuped_adjust(
        li, "l_returnflag", "l_extendedprice", "l_quantity"
    )


def _bh_oracle(alpha: float = 0.25) -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    padj = "LEAST(1.0, tq)"
    return f"""
    WITH tests AS (
      -- concat_ws mirrors Spark's NULL-skipping test-id join (the ||
      -- operator would NULL out any test with a NULL family member)
      SELECT concat_ws('|', o_orderpriority, o_orderstatus) AS test_id,
             (COUNT(*) % 997) / 997.0 AS p
      FROM orders
      GROUP BY o_orderpriority, o_orderstatus
    ),
    ranked AS (
      SELECT test_id, p,
             CAST(ROW_NUMBER() OVER (ORDER BY p, test_id) AS BIGINT)
               AS rank,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM tests
    ),
    stepped AS (
      SELECT test_id, p, rank,
             MIN(CAST(m AS DOUBLE) * p / CAST(rank AS DOUBLE))
               OVER (ORDER BY rank DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS tq,
             MAX(CASE WHEN CAST(m AS DOUBLE) * p
                           <= {alpha!r} * CAST(rank AS DOUBLE)
                 THEN 1 ELSE 0 END)
               OVER (ORDER BY rank DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS hit
      FROM ranked
    )
    SELECT test_id, p, rank,
           {ref_round_sql(padj, 6)} AS p_adj6,
           CAST(hit AS BIGINT) AS rejected
    FROM stepped ORDER BY rank
    """


@register(
    "bh_fdr_planted",
    oracle=_bh_oracle(),
    survey_ids=["M24", "W1"],
    description="Benjamini-Hochberg FDR adjustment over the 15-test "
    "priority x status family (planted deterministic p-values): "
    "rank + reverse running-min windows on the ENFORCED test-count-"
    "bounded frame (the _domain_gate device), ties broken by test id "
    "for cross-engine determinism - the FDR companion to the post-hoc "
    "layer's Bonferroni",
)
def bh_fdr_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    tests = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        ((F.count(F.lit(1)) % 997).cast("double") / F.lit(997.0)).alias(
            "p"
        )
    ).select(
        F.concat_ws(
            "|", F.col("o_orderpriority"), F.col("o_orderstatus")
        ).alias("test_id"),
        "p",
    )
    return A.bh_fdr(tests, "test_id", "p", alpha=0.25)


def _auc_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    auc = (
        "CAST(r2p - CAST(np AS HUGEINT) * (np + 1) AS DOUBLE)"
        " / (2.0 * CAST(np AS DOUBLE) * CAST(nn AS DOUBLE))"
    )
    return f"""
    WITH src AS (
      -- both label inputs non-null: a NULL orderkey makes the planted
      -- XOR label UNKNOWN, and an unlabeled row is unscoreable
      SELECT CAST(o_totalprice AS DOUBLE) AS s,
             CAST(CASE WHEN (o_totalprice > 150000)
                       <> (o_orderkey % 11 = 0)
                  THEN 1 ELSE 0 END AS BIGINT) AS y
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL
    ),
    per_v AS (
      SELECT s, CAST(SUM(y) AS BIGINT) AS cp,
             CAST(SUM(1 - y) AS BIGINT) AS cn,
             CAST(COUNT(*) AS BIGINT) AS ct
      FROM src GROUP BY s
    ),
    cum AS (
      SELECT cp, cn, ct,
             COALESCE(SUM(ct) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cb
      FROM per_v
    ),
    agg AS (
      SELECT CAST(SUM(cp) AS BIGINT) AS np,
             CAST(SUM(cn) AS BIGINT) AS nn,
             SUM(CAST(cp AS HUGEINT) * (2 * cb + ct + 1)) AS r2p
      FROM cum
    )
    SELECT np AS n_pos, nn AS n_neg,
           CASE WHEN np > 0 AND nn > 0
                THEN {ref_round_sql(auc, 6)} END AS auc6
    FROM agg WHERE np IS NOT NULL
    """


@register(
    "roc_auc_planted",
    oracle=_auc_oracle(),
    survey_ids=["A8", "W1", "M33"],
    description="Exact ROC-AUC of order total against a planted "
    "noisy label (price threshold XOR a hash slice): the normalized "
    "Mann-Whitney U with midrank tie handling - distinct-score frame "
    "through the range-partitioned prefix device, doubled rank mass "
    "in DECIMAL(38,0), one final IEEE division; no threshold sweep, "
    "no sampling, never a global orderBy window",
)
def roc_auc_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull() & F.col("o_orderkey").isNotNull()
    )
    scored = orders.select(
        F.col("o_totalprice").cast("double").alias("score"),
        (
            (F.col("o_totalprice") > 150000)
            != (F.col("o_orderkey") % 11 == 0)
        )
        .cast("bigint")
        .alias("label"),
    )
    return A.roc_auc(scored, "score", "label")


def _calibration_oracle(bins: int = 10) -> str:
    from qudo_etl_pipeline_spark.functions.hashing import hash64_sql
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    h = hash64_sql("('cal:' || CAST(o_orderkey AS VARCHAR))")
    mean_s = "CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)"
    frac_p = "CAST(np AS DOUBLE) / CAST(n AS DOUBLE)"
    return f"""
    WITH src AS (
      SELECT (o_orderkey % 1000) / 1000.0 AS s,
             CAST(CASE WHEN ({h} % 1000) < (o_orderkey % 1000)
                  THEN 1 ELSE 0 END AS BIGINT) AS y
      FROM orders WHERE o_orderkey IS NOT NULL
    ),
    per_b AS (
      SELECT CAST(GREATEST(0, LEAST({bins - 1},
                   FLOOR(s * {float(bins)!r}))) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(s AS DECIMAL(38,12))) AS ss,
             CAST(SUM(y) AS BIGINT) AS np
      FROM src GROUP BY 1
    ),
    binned AS (
      SELECT bucket, n,
             {ref_round_sql(mean_s, 6)} AS mean_score6,
             {ref_round_sql(frac_p, 6)} AS frac_pos6,
             {ref_round_sql(f"({frac_p}) - ({mean_s})", 6)} AS gap6
      FROM per_b
    ),
    ece_t AS (
      SELECT {ref_round_sql(
          "CAST(SUM(CAST(CAST(n AS DOUBLE)"
          " * ABS(frac_pos6 - mean_score6) AS DECIMAL(38,12)))"
          " AS DOUBLE) / CAST(SUM(n) AS DOUBLE)", 6)} AS ece6
      FROM binned
    )
    SELECT bucket, n, mean_score6, frac_pos6, gap6, ece6
    FROM binned CROSS JOIN ece_t ORDER BY bucket
    """


@register(
    "calibration_curve_planted",
    oracle=_calibration_oracle(),
    survey_ids=["A4", "A8", "M33"],
    description="Reliability diagram + ECE for a planted calibrated "
    "score (P(label)=score by a hash draw): 10 equi-width bins in ONE "
    "groupBy (bins rows out at any SF), DECIMAL-quantized score sums, "
    "ECE as a broadcast total over the bins frame - the 'is 0.8 "
    "really 80%?' model monitor; planted construction makes every "
    "gap6 small and the curve near-diagonal",
)
def calibration_curve_planted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from qudo_etl_pipeline_spark.functions.hashing import hash64

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey").isNotNull()
    )
    scored = orders.select(
        (
            (F.col("o_orderkey") % 1000).cast("double") / F.lit(1000.0)
        ).alias("score"),
        (
            (
                hash64(
                    F.concat(
                        F.lit("cal:"),
                        F.col("o_orderkey").cast("string"),
                    )
                )
                % 1000
            )
            < (F.col("o_orderkey") % 1000)
        )
        .cast("bigint")
        .alias("label"),
    )
    return A.calibration_curve(scored, "score", "label", bins=10)


def _did_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    def mean(ti: int, pi: int) -> str:
        return f"CAST(s_{ti}{pi} AS DOUBLE) / CAST(n_{ti}{pi} AS DOUBLE)"

    dt = f"({mean(1, 1)}) - ({mean(1, 0)})"
    dc = f"({mean(0, 1)}) - ({mean(0, 0)})"
    did = f"({dt}) - ({dc})"
    picks = []
    for ti in (0, 1):
        for pi in (0, 1):
            cond = f"t = {ti} AND p = {pi}"
            picks.append(f"MAX(CASE WHEN {cond} THEN n END) AS n_{ti}{pi}")
            picks.append(f"MAX(CASE WHEN {cond} THEN s END) AS s_{ti}{pi}")
    ok = " AND ".join(
        f"n_{ti}{pi} IS NOT NULL" for ti in (0, 1) for pi in (0, 1)
    )
    sel = []
    for ti, name in ((0, "c"), (1, "t")):
        for pi in (0, 1):
            sel.append(
                f"CAST(COALESCE(n_{ti}{pi}, 0) AS BIGINT) AS n_{name}{pi}"
            )
            sel.append(
                f"CASE WHEN {ok} THEN {ref_round_sql(mean(ti, pi), 6)} END"
                f" AS mean_{name}{pi}_6"
            )
    return f"""
    WITH src AS (
      -- CAST(bool), not CASE-ELSE-0: an undated order's period is
      -- UNKNOWN (NULL p falls outside all four cells), mirroring the
      -- Spark side's bool cast (r11 NULL-salt parity)
      SELECT CAST(o_orderkey % 2 AS INT) AS t,
             CAST(o_orderdate >= TIMESTAMP '1998-01-01' AS INT) AS p,
             CAST(o_totalprice AS DOUBLE)
               + CASE WHEN o_orderkey % 2 = 1
                       AND o_orderdate >= TIMESTAMP '1998-01-01'
                      THEN 5000.0 ELSE 0.0 END AS y
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    cells AS (
      SELECT t, p, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(y AS DECIMAL(38,12))) AS s
      FROM src GROUP BY t, p
    ),
    one AS (SELECT {", ".join(picks)} FROM cells)
    SELECT {", ".join(sel)},
           CASE WHEN {ok} THEN {ref_round_sql(dt, 6)} END
             AS delta_treated6,
           CASE WHEN {ok} THEN {ref_round_sql(dc, 6)} END
             AS delta_control6,
           CASE WHEN {ok} THEN {ref_round_sql(did, 6)} END AS did6
    FROM one
    """


@register(
    "diff_in_diff_planted",
    oracle=_did_oracle(),
    survey_ids=["A8", "A5"],
    description="Difference-in-differences with a planted +5000 "
    "treated-post effect (odd orderkeys after 1998): ONE groupBy to "
    "the 2x2 cell frame (DECIMAL-quantized sums), conditional min/max "
    "collapse to a single row, all-four-cells-present guard nulls the "
    "estimates rather than answering a different question; did6 "
    "recovers the planted effect against independent-noise deltas",
)
def diff_in_diff_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    treated = (F.col("o_orderkey") % 2).cast("int")
    post = (F.col("o_orderdate") >= "1998-01-01").cast("int")
    y = F.col("o_totalprice").cast("double") + F.when(
        (treated == 1) & (post == 1), F.lit(5000.0)
    ).otherwise(F.lit(0.0))
    src = orders.filter(F.col("o_totalprice").isNotNull()).select(
        treated.alias("t"), post.alias("p"), y.alias("y")
    )
    return A.diff_in_diff(src, "t", "p", "y")


def _srm_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql
    from qudo_etl_pipeline_spark.operators.analytics import (
        CHI2_CRIT_95_DF1,
    )

    tot = "(CAST(a.n AS DOUBLE) + CAST(b.n AS DOUBLE))"
    wa = "(1.0 / 2.0)"
    ea = f"({tot} * {wa})"
    eb = f"({tot} - {ea})"
    chi2 = (
        f"(CAST(a.n AS DOUBLE) - {ea}) * (CAST(a.n AS DOUBLE) - {ea})"
        f" / {ea}"
        f" + (CAST(b.n AS DOUBLE) - {eb}) * (CAST(b.n AS DOUBLE) - {eb})"
        f" / {eb}"
    )
    # the two-label guard is mirrored: ab_srm_check emits an all-NULL
    # row unless EXACTLY two group labels exist (at sf0.001 every
    # user_id is < 52, so only variant A exists and the a/b
    # order-by-limit device would silently duplicate group A)
    ok = "(SELECT COUNT(*) FROM g) = 2"
    return f"""
    WITH units AS (
      SELECT DISTINCT user_id,
             CASE WHEN user_id % 100 < 52 THEN 'A' ELSE 'B' END
               AS variant
      FROM events
    ),
    g AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n
          FROM units GROUP BY variant),
    a AS (SELECT * FROM g ORDER BY variant ASC LIMIT 1),
    b AS (SELECT * FROM g ORDER BY variant DESC LIMIT 1)
    SELECT CASE WHEN {ok} THEN a.variant END AS group_a,
           CASE WHEN {ok} THEN a.n END AS n_a,
           CASE WHEN {ok} THEN b.variant END AS group_b,
           CASE WHEN {ok} THEN b.n END AS n_b,
           CASE WHEN {ok} THEN {ref_round_sql(wa, 6)} END
             AS expected_a_share6,
           CASE WHEN {ok} THEN {ref_round_sql(chi2, 6)} END AS chi2_6,
           CASE WHEN {ok} THEN CAST(CASE WHEN {chi2} > {CHI2_CRIT_95_DF1!r}
                THEN 1 ELSE 0 END AS BIGINT) END AS is_mismatch
    FROM (SELECT 1 AS _one) _spine
    LEFT JOIN a ON TRUE
    LEFT JOIN b ON TRUE
    """


@register(
    "ab_srm_planted",
    oracle=_srm_oracle(),
    survey_ids=["A12", "A8"],
    description="Sample-ratio-mismatch gate on a PLANTED 52/48 "
    "assignment against an intended 50/50 split: chi-squared goodness "
    "of fit on the two unit counts (df=1), significance against the "
    "exact critical value (the threshold trick, no CDF crossing) - "
    "the assignment-health check every A/B readout runs FIRST",
)
def ab_srm_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    units = ev.select("user_id").distinct().select(
        F.when(F.col("user_id") % 100 < 52, "A")
        .otherwise("B")
        .alias("variant")
    )
    return A.ab_srm_check(units, "variant", 1, 1)


def _mde_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql
    from qudo_etl_pipeline_spark.operators.analytics import (
        Z_BETA_80,
        Z_CRIT_95,
    )

    zsum = Z_CRIT_95 + Z_BETA_80
    pp = "(CAST(a.k + b.k AS DOUBLE) / CAST(a.n + b.n AS DOUBLE))"
    mde = (
        f"({zsum!r} * sqrt({pp} * (1.0 - {pp})"
        f" * (1.0 / CAST(a.n AS DOUBLE) + 1.0 / CAST(b.n AS DOUBLE))))"
    )
    good = f"{pp} > 0 AND {pp} < 1"
    # same exactly-two-labels mirror as _ab_oracle/_srm_oracle
    ok = "(SELECT COUNT(*) FROM g) = 2"
    return f"""
    WITH conv AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT variant, COUNT(*) AS n,
             CAST(SUM(converted) AS BIGINT) AS k
      FROM conv GROUP BY variant
    ),
    a AS (SELECT * FROM g ORDER BY variant ASC LIMIT 1),
    b AS (SELECT * FROM g ORDER BY variant DESC LIMIT 1)
    SELECT CASE WHEN {ok} THEN a.variant END AS group_a,
           CASE WHEN {ok} THEN a.n END AS n_a,
           CASE WHEN {ok} THEN b.variant END AS group_b,
           CASE WHEN {ok} THEN b.n END AS n_b,
           CASE WHEN {ok} THEN {ref_round_sql(pp, 6)} END
             AS pooled_rate6,
           CASE WHEN {ok} AND {good} THEN {ref_round_sql(mde, 6)} END
             AS mde_abs6,
           CASE WHEN {ok} AND {good}
                THEN {ref_round_sql(f"({mde} / {pp})", 6)}
             END AS mde_rel6
    FROM (SELECT 1 AS _one) _spine
    LEFT JOIN a ON TRUE
    LEFT JOIN b ON TRUE
    """


@register(
    "ab_power_mde_events",
    oracle=_mde_oracle(),
    survey_ids=["A8", "A12"],
    description="Minimum detectable effect of the running purchase-"
    "conversion experiment at its CURRENT sample sizes (alpha=.05 "
    "two-sided, power=.80): pooled-variance two-proportion "
    "approximation, z quantiles as exact double constants, same "
    "two-integer-aggregate shape and two-label guard as the z-test - "
    "the 'is this test big enough' readout",
)
def ab_power_mde_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    conv = ev.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 14,
            1,
        )
        .otherwise(0)
        .alias("converted")
    ).select(
        F.when(F.col("user_id") % 2 == 0, "A")
        .otherwise("B")
        .alias("variant"),
        "converted",
    )
    return A.ab_power_mde(conv, "variant", "converted")
