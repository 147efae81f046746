"""Data-quality catalog entries: the declarative constraint suite
(operators/checks.py) evaluated over ``orders`` with a foreign-key
coverage gate against ``customer``.

The oracle mirrors the one-pass compilation as scalar aggregates in a
single CTE, then unions one row per check — same metric arithmetic
(integer-ratio divisions, exact DECIMAL mean), same ref_round(6), same
compare-on-the-rounded-metric pass rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.catalog import load_table, register
from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql
from qudo_etl_pipeline_spark.operators.checks import Check, check_suite

_CHECKS = [
    Check("custkey_complete", "completeness", "o_custkey", 1.0),
    Check("orderkey_unique", "uniqueness", "o_orderkey", 1.0),
    Check("price_floor", "min_value", "o_totalprice", 0.0),
    Check("price_cap_ok", "max_value", "o_totalprice", 500000.0),
    Check("price_cap_tight", "max_value", "o_totalprice", 400000.0),
    Check("price_mean_floor", "mean_min", "o_totalprice", 100000.0),
    Check("status_domain", "isin", "o_orderstatus", 1.0, values=("F", "O", "P")),
    Check("priority_format", "pattern", "o_orderpriority", 1.0, pattern="^[1-5]-"),
    Check("custkey_fk", "fk_coverage", "o_custkey", 1.0, ref="customer"),
]


def _checks_oracle() -> str:
    frac = "{num} * 1.0 / {den}"

    def r6(expr: str) -> str:
        return ref_round_sql(expr, 6)

    metrics = {
        "custkey_complete": r6(frac.format(num="COUNT(o_custkey)", den="COUNT(*)")),
        "orderkey_unique": r6(
            frac.format(num="COUNT(DISTINCT o_orderkey)", den="COUNT(*)")
        ),
        "price_floor": r6("CAST(MIN(o_totalprice) AS DOUBLE)"),
        "price_cap_ok": r6("CAST(MAX(o_totalprice) AS DOUBLE)"),
        "price_cap_tight": r6("CAST(MAX(o_totalprice) AS DOUBLE)"),
        "price_mean_floor": r6(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)"
            " / COUNT(o_totalprice)"
        ),
        "status_domain": r6(
            frac.format(
                num="COUNT(CASE WHEN o_orderstatus IN ('F','O','P')"
                " THEN 1 END)",
                den="COUNT(o_orderstatus)",
            )
        ),
        "priority_format": r6(
            frac.format(
                num="COUNT(CASE WHEN regexp_matches(o_orderpriority,"
                " '^[1-5]-') THEN 1 END)",
                den="COUNT(o_orderpriority)",
            )
        ),
        "custkey_fk": r6(frac.format(num="COUNT(fk_flag)", den="COUNT(*)")),
    }
    sel = ",\n        ".join(f"{sql} AS m_{n}" for n, sql in metrics.items())
    rows = []
    for c in _CHECKS:
        op = "<=" if c.kind in ("max_value", "mean_max") else ">="
        rows.append(
            f"SELECT '{c.name}' AS check_name, '{c.column}' AS col_name,"
            f" m_{c.name} AS metric, CAST({float(c.threshold)} AS DOUBLE)"
            f" AS threshold,"
            f" CASE WHEN m_{c.name} {op} {float(c.threshold)} THEN 1"
            f" ELSE 0 END::BIGINT AS passed FROM m"
        )
    union = "\n      UNION ALL\n      ".join(rows)
    return f"""
    WITH flagged AS (
      SELECT o.*, r.fk_flag
      FROM orders o LEFT JOIN (
        SELECT DISTINCT c_custkey, 1 AS fk_flag FROM customer
      ) r ON o.o_custkey = r.c_custkey
    ),
    m AS (
      SELECT
        {sel}
      FROM flagged
    )
    {union}
    """


@register(
    "quality_check_suite",
    oracle=_checks_oracle(),
    survey_ids=["A4", "A8", "J5"],
    description="Deequ-style declarative constraint suite over orders "
    "(completeness, uniqueness, bounds, exact-decimal mean, set/regex "
    "conformance, broadcast FK coverage) compiled into ONE aggregation "
    "pass; one row per check with rounded metric and 0/1 gate",
)
def quality_check_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    return check_suite(orders, _CHECKS, refs={"customer": customer}).orderBy(
        "check_name"
    )


_PROFILE_COLS = ["c_custkey", "c_mktsegment", "c_name", "c_nationkey"]


def _profile_oracle() -> str:
    """Mirror of profile_table's melt -> cell-count -> per-column
    aggregate, with the mode tie-break (count desc, value asc) as a
    ROW_NUMBER pick. Profiled columns are ints/strings only: their
    cast-to-VARCHAR forms are engine-identical (doubles are not)."""
    cells = "\n      UNION ALL\n      ".join(
        f"SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS v,"
        f" TRY_CAST({c} AS DOUBLE) AS vn FROM customer"
        for c in _PROFILE_COLS
    )
    return f"""
    WITH cells AS (
      {cells}
    ),
    counted AS (
      SELECT col_name, v, COUNT(*) AS cnt,
             MIN(vn) AS vn_min, MAX(vn) AS vn_max
      FROM cells GROUP BY col_name, v
    ),
    stats AS (
      SELECT col_name,
             CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN cnt END), 0)
                  AS BIGINT) AS n_nulls,
             CAST(COUNT(CASE WHEN v IS NOT NULL THEN 1 END)
                  AS BIGINT) AS n_distinct,
             MIN(CASE WHEN v IS NOT NULL THEN v END) AS min_value,
             MAX(v) AS max_value,
             CAST(COALESCE(MAX(CASE WHEN v IS NOT NULL THEN cnt END), 0)
                  AS BIGINT) AS top_count,
             MIN(vn_min) AS min_num,
             MAX(vn_max) AS max_num
      FROM counted GROUP BY col_name
    ),
    top AS (
      SELECT col_name, v AS top_value,
             ROW_NUMBER() OVER (
               PARTITION BY col_name ORDER BY cnt DESC, v ASC
             ) AS rn
      FROM counted WHERE v IS NOT NULL
    )
    SELECT s.col_name AS col_name, n_rows, n_nulls, n_distinct,
           min_value, max_value, t.top_value AS top_value, top_count,
           min_num, max_num
    FROM stats s LEFT JOIN top t ON s.col_name = t.col_name AND t.rn = 1
    ORDER BY col_name
    """


@register(
    "profile_customer_columns",
    oracle=_profile_oracle(),
    survey_ids=["A4", "A6", "A7"],
    description="One-shuffle table profiler over customer (nulls, exact "
    "distincts, string/numeric extremes, modal value with deterministic "
    "tie-break) via a single melt + cell-count pass",
)
def profile_customer_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.operators.profile import profile_table

    cust = load_table(spark, sf_dir, "customer")
    return profile_table(cust, _PROFILE_COLS)


def _benford_oracle() -> str:
    dev = (
        "(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE)"
        " - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))"
    )
    chi = (
        f"CAST(n_total AS DOUBLE) * {dev} * {dev}"
        f" / log10(1.0 + 1.0 / CAST(digit AS DOUBLE))"
    )
    return f"""
    WITH digits AS (
      SELECT TRY_CAST(substr(regexp_replace(
               printf('%.10f', ABS(CAST(o_totalprice AS DOUBLE))),
               '[0.]', '', 'g'), 1, 1) AS BIGINT) AS digit
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_totalprice <> 0
    ),
    d AS (SELECT digit, COUNT(*) AS n FROM digits
          WHERE digit BETWEEN 1 AND 9 GROUP BY 1),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM d)
    SELECT digit, n, n_total,
           {ref_round_sql(
               "CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE)", 6)}
             AS observed_p6,
           {ref_round_sql(
               "log10(1.0 + 1.0 / CAST(digit AS DOUBLE))", 6)}
             AS benford_p6,
           {ref_round_sql(chi, 6)} AS chi2_cell6
    FROM d CROSS JOIN t
    ORDER BY digit
    """


@register(
    "benford_totalprice",
    oracle=_benford_oracle(),
    survey_ids=["A4", "A9"],
    description="Benford first-significant-digit profile of order "
    "totals: digit extraction via string stripping (no log10 edge "
    "cases), a 9-row groupBy, exact-literal expected shares and "
    "per-cell chi-squared contributions via a 1-row total broadcast",
)
def benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.operators.profile import benford_profile

    orders = load_table(spark, sf_dir, "orders")
    return benford_profile(orders, "o_totalprice").orderBy("digit")


_DIFF_L = """
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
"""
_DIFF_R = """
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 13 = 3 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 101 = 5
"""


@register(
    "table_diff_orders_planted",
    oracle=f"""
    WITH l AS ({_DIFF_L}), r AS ({_DIFF_R}),
    lk AS (
      SELECT o_orderkey, COUNT(*) AS ln,
             MAX(o_totalprice) AS lp, MAX(o_orderstatus) AS ls
      FROM l GROUP BY o_orderkey
    ),
    rk AS (
      SELECT o_orderkey, COUNT(*) AS rn,
             MAX(o_totalprice) AS rp, MAX(o_orderstatus) AS rs
      FROM r GROUP BY o_orderkey
    ),
    j AS (
      -- IS NOT DISTINCT FROM mirrors table_diff's eqNullSafe pairing
      -- (a NULL key pairs instead of reading as removed+added);
      -- presence is detected from the per-side COUNTs, never key
      -- nullness (r11 NULL-salt parity; NULL-free data identical)
      SELECT lk.o_orderkey AS lkey, rk.o_orderkey AS rkey,
             ln, rn, lp, rp, ls, rs
      FROM lk FULL OUTER JOIN rk
        ON lk.o_orderkey IS NOT DISTINCT FROM rk.o_orderkey
    ),
    agg AS (
      SELECT
        CAST(SUM(CASE WHEN ln IS NULL AND rn IS NOT NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS added,
        CAST(SUM(CASE WHEN ln IS NOT NULL AND rn IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS removed,
        CAST(SUM(CASE WHEN ln IS NOT NULL AND rn IS NOT NULL
                 AND (lp IS DISTINCT FROM rp OR ls IS DISTINCT FROM rs)
                 THEN 1 ELSE 0 END) AS BIGINT) AS changed,
        CAST(SUM(CASE WHEN ln IS NOT NULL AND rn IS NOT NULL
                 AND lp IS NOT DISTINCT FROM rp
                 AND ls IS NOT DISTINCT FROM rs
                 THEN 1 ELSE 0 END) AS BIGINT) AS unchanged,
        CAST(SUM(CASE WHEN ln > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dupl,
        CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dupr,
        CAST(SUM(CASE WHEN ln IS NOT NULL AND lkey IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS nulll,
        CAST(SUM(CASE WHEN rn IS NOT NULL AND rkey IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS nullr,
        CAST(SUM(CASE WHEN ln IS NOT NULL AND rn IS NOT NULL
                 AND lp IS DISTINCT FROM rp
                 THEN 1 ELSE 0 END) AS BIGINT) AS ch_price,
        CAST(SUM(CASE WHEN ln IS NOT NULL AND rn IS NOT NULL
                 AND ls IS DISTINCT FROM rs
                 THEN 1 ELSE 0 END) AS BIGINT) AS ch_status
      FROM j
    )
    SELECT * FROM (
      SELECT 'added' AS metric, added AS n FROM agg
      UNION ALL SELECT 'removed', removed FROM agg
      UNION ALL SELECT 'changed', changed FROM agg
      UNION ALL SELECT 'unchanged', unchanged FROM agg
      UNION ALL SELECT 'dup_keys:left', dupl FROM agg
      UNION ALL SELECT 'dup_keys:right', dupr FROM agg
      UNION ALL SELECT 'null_keys:left', nulll FROM agg
      UNION ALL SELECT 'null_keys:right', nullr FROM agg
      UNION ALL SELECT 'changed:o_totalprice', ch_price FROM agg
      UNION ALL SELECT 'changed:o_orderstatus', ch_status FROM agg
    ) ORDER BY metric
    """,
    survey_ids=["J3", "A4", "R6"],
    description="Table reconciliation after a planted perturbation "
    "(deleted keys, shifted prices, injected keys): ONE full-outer "
    "key join + a single aggregate -> added/removed/changed/unchanged "
    "+ per-column change counts, null-safe comparison throughout",
)
def table_diff_orders_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.operators.checks import table_diff

    orders = load_table(spark, sf_dir, "orders")
    left = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    key = F.col("o_orderkey")
    right = left.filter(key % 97 != 0).select(
        "o_orderkey",
        F.when(key % 13 == 3, F.col("o_totalprice") + F.lit(1.0))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    ).unionByName(
        left.filter(key % 101 == 5).select(
            (key + F.lit(100000000)).alias("o_orderkey"),
            "o_totalprice",
            "o_orderstatus",
        )
    )
    return table_diff(
        left, right, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    ).orderBy("metric")


@register(
    "join_profile_orders_lineitem",
    oracle="""
    WITH lk AS (
      SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS ln
      FROM orders GROUP BY o_orderkey
    ),
    rk AS (
      SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS rn
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT lk.k AS lkey, rk.k AS rkey, ln, rn
      FROM lk FULL OUTER JOIN rk ON lk.k = rk.k
    ),
    agg AS (
      -- mirror of join_profile's sentinel-group routing: a side's
      -- NULL-key group is PRESENT (ln/rn non-null) but has no key —
      -- it feeds null_keys_* and rows_*, never the key counts
      -- (r11 NULL-salt parity; NULL-free data identical)
      SELECT
        CAST(SUM(CASE WHEN ln IS NOT NULL AND lkey IS NOT NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS keys_left,
        CAST(SUM(CASE WHEN rn IS NOT NULL AND rkey IS NOT NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS keys_right,
        CAST(SUM(CASE WHEN lkey IS NOT NULL AND rkey IS NOT NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS keys_matched,
        CAST(SUM(CASE WHEN lkey IS NOT NULL AND rn IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS keys_left_only,
        CAST(SUM(CASE WHEN rkey IS NOT NULL AND ln IS NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS keys_right_only,
        CAST(COALESCE(SUM(CASE WHEN lkey IS NOT NULL
                 AND rkey IS NOT NULL THEN ln * rn END), 0)
             AS BIGINT) AS joined_rows,
        CAST(COALESCE(MAX(CASE WHEN lkey IS NOT NULL
                 AND rkey IS NOT NULL THEN ln END), 0)
             AS BIGINT) AS max_left_rows_per_key,
        CAST(COALESCE(MAX(CASE WHEN lkey IS NOT NULL
                 AND rkey IS NOT NULL THEN rn END), 0)
             AS BIGINT) AS max_right_rows_per_key,
        CAST(COALESCE(SUM(CASE WHEN ln IS NOT NULL AND lkey IS NULL
                 THEN ln END), 0) AS BIGINT) AS null_keys_left,
        CAST(COALESCE(SUM(CASE WHEN rn IS NOT NULL AND rkey IS NULL
                 THEN rn END), 0) AS BIGINT) AS null_keys_right,
        CAST(COALESCE(SUM(ln), 0) AS BIGINT) AS rows_left,
        CAST(COALESCE(SUM(rn), 0) AS BIGINT) AS rows_right,
        CAST(COALESCE(SUM(CASE WHEN lkey IS NOT NULL
                 AND rkey IS NOT NULL THEN ln END), 0)
             AS BIGINT) AS rows_left_matched,
        CAST(COALESCE(SUM(CASE WHEN lkey IS NOT NULL
                 AND rkey IS NOT NULL THEN rn END), 0)
             AS BIGINT) AS rows_right_matched
      FROM j
    )
    SELECT * FROM (
      SELECT 'keys_left' AS metric, keys_left AS n FROM agg
      UNION ALL SELECT 'keys_right', keys_right FROM agg
      UNION ALL SELECT 'keys_matched', keys_matched FROM agg
      UNION ALL SELECT 'keys_left_only', keys_left_only FROM agg
      UNION ALL SELECT 'keys_right_only', keys_right_only FROM agg
      UNION ALL SELECT 'joined_rows', joined_rows FROM agg
      UNION ALL SELECT 'max_left_rows_per_key', max_left_rows_per_key
        FROM agg
      UNION ALL SELECT 'max_right_rows_per_key', max_right_rows_per_key
        FROM agg
      UNION ALL SELECT 'null_keys_left', null_keys_left FROM agg
      UNION ALL SELECT 'null_keys_right', null_keys_right FROM agg
      UNION ALL SELECT 'rows_left', rows_left FROM agg
      UNION ALL SELECT 'rows_right', rows_right FROM agg
      UNION ALL SELECT 'rows_left_matched', rows_left_matched FROM agg
      UNION ALL SELECT 'rows_right_matched', rows_right_matched FROM agg
    ) ORDER BY metric
    """,
    survey_ids=["J1", "A4", "A7"],
    description="Pre-join key-overlap profile of orders->lineitem: "
    "distinct/matched/orphan key counts, exact joined-row prediction "
    "and per-key fan-out maxima from two keyed aggregates + one "
    "unique-key full-outer join (the fan-out itself is never "
    "materialized); null keys ride sentinel groups, one lazy plan",
)
def join_profile_orders_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from qudo_etl_pipeline_spark.operators.checks import join_profile

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return join_profile(orders, li, "o_orderkey", "l_orderkey").orderBy(
        "metric"
    )


def _strategy_oracle() -> str:
    """Mirror choose_join_strategy's integer decision per scenario:
    broadcast when min(rows) <= budget; salted when the bigger side's
    hottest matched key >= skew_factor * its average (max*keys >=
    factor*rows, exact integers); shuffle otherwise."""
    return """
    WITH
    a_sides AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS rl,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
              WHERE o_orderkey % 1000 = 0) AS rr
    ),
    a_dec AS (
      SELECT 'dim_lookup' AS scenario,
             CASE WHEN LEAST(rl, rr) <= 10000 THEN 'broadcast'
                  ELSE 'other' END AS strategy,
             CASE WHEN rr <= rl THEN 'right' ELSE 'left' END
               AS build_side,
             CAST(NULL AS BIGINT) AS n_salts
      FROM a_sides
    ),
    b_keys AS (
      SELECT CASE WHEN l_orderkey % 10 <> 0 THEN 0
                  ELSE l_orderkey END AS k,
             CAST(COUNT(*) AS BIGINT) AS ln
      FROM lineitem GROUP BY 1
    ),
    b_stats AS (
      SELECT CAST(SUM(ln) AS BIGINT) AS rl,
             CAST(COUNT(*) AS BIGINT) AS rr,
             CAST(COUNT(*) AS BIGINT) AS km,
             CAST(MAX(ln) AS BIGINT) AS mx,
             CAST(SUM(ln) AS BIGINT) AS rm
      FROM b_keys
    ),
    b_dec AS (
      SELECT 'planted_hot_key' AS scenario,
             CASE WHEN LEAST(rl, rr) <= 50 THEN 'broadcast'
                  WHEN mx * km >= 8 * rm THEN 'salted'
                  ELSE 'shuffle' END AS strategy,
             CASE WHEN LEAST(rl, rr) <= 50 THEN
                    CASE WHEN rr <= rl THEN 'right' ELSE 'left' END
                  WHEN mx * km >= 8 * rm THEN
                    CASE WHEN rl >= rr THEN 'left' ELSE 'right' END
             END AS build_side,
             CASE WHEN LEAST(rl, rr) > 50 AND mx * km >= 8 * rm
                  THEN LEAST(32, (mx * km + rm - 1) // rm)
             END AS n_salts
      FROM b_stats
    ),
    c_lk AS (
      SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS ln
      FROM lineitem GROUP BY 1
    ),
    c_rk AS (
      SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS rn
      FROM orders GROUP BY 1
    ),
    c_j AS (
      SELECT c_lk.k AS lkey, c_rk.k AS rkey, ln, rn
      FROM c_lk FULL OUTER JOIN c_rk ON c_lk.k = c_rk.k
    ),
    c_stats AS (
      SELECT
        CAST(COALESCE(SUM(CASE WHEN lkey IS NOT NULL THEN ln END), 0)
             AS BIGINT) AS rl,
        CAST(COALESCE(SUM(CASE WHEN rkey IS NOT NULL THEN rn END), 0)
             AS BIGINT) AS rr,
        CAST(SUM(CASE WHEN lkey IS NOT NULL AND rkey IS NOT NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS km,
        CAST(COALESCE(MAX(CASE WHEN lkey IS NOT NULL
                 AND rkey IS NOT NULL THEN ln END), 0) AS BIGINT)
          AS mxl,
        CAST(COALESCE(MAX(CASE WHEN lkey IS NOT NULL
                 AND rkey IS NOT NULL THEN rn END), 0) AS BIGINT)
          AS mxr,
        CAST(COALESCE(SUM(CASE WHEN lkey IS NOT NULL
                 AND rkey IS NOT NULL THEN ln END), 0) AS BIGINT)
          AS rml,
        CAST(COALESCE(SUM(CASE WHEN lkey IS NOT NULL
                 AND rkey IS NOT NULL THEN rn END), 0) AS BIGINT)
          AS rmr
      FROM c_j
    ),
    c_dec AS (
      SELECT 'balanced_fact_fact' AS scenario,
             CASE WHEN LEAST(rl, rr) <= 50 THEN 'broadcast'
                  WHEN (CASE WHEN rl >= rr THEN mxl ELSE mxr END) * km
                       >= 8 * (CASE WHEN rl >= rr THEN rml ELSE rmr END)
                  THEN 'salted'
                  ELSE 'shuffle' END AS strategy,
             CAST(NULL AS VARCHAR) AS build_side,
             CAST(NULL AS BIGINT) AS n_salts
      FROM c_stats
    )
    SELECT * FROM (
      SELECT * FROM a_dec
      UNION ALL SELECT * FROM b_dec
      UNION ALL SELECT * FROM c_dec
    ) ORDER BY scenario
    """


@register(
    "join_strategy_decision_planted",
    oracle=_strategy_oracle(),
    survey_ids=["J1", "J5", "A4"],
    description="profile->strategy decisions for three planted join "
    "shapes (tiny dimension -> broadcast; 90%-of-rows hot key -> "
    "salted with the hot/avg salt count; balanced fact-fact -> plain "
    "shuffle): each decision is pure integer arithmetic over the "
    "exact join_profile counts, so the DuckDB oracle replays the same "
    "choice from the same data - the skew story AQE cannot cover "
    "(one mega-KEY inside one partition), decided before the join runs",
)
def join_strategy_decision_planted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from qudo_etl_pipeline_spark.operators.checks import join_profile
    from qudo_etl_pipeline_spark.plans.skew import choose_join_strategy

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    def prof(left, right, lk, rk):
        return {
            r["metric"]: r["n"]
            for r in join_profile(left, right, lk, rk).collect()
        }

    hot = li.select(
        F.when(F.col("l_orderkey") % 10 != 0, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .alias("k")
    )
    cases = [
        (
            "dim_lookup",
            choose_join_strategy(
                prof(
                    li,
                    orders.filter(F.col("o_orderkey") % 1000 == 0),
                    "l_orderkey",
                    "o_orderkey",
                ),
                broadcast_rows=10_000,
            ),
        ),
        (
            "planted_hot_key",
            choose_join_strategy(
                prof(hot, hot.select("k").distinct(), "k", "k"),
                broadcast_rows=50,
            ),
        ),
        (
            "balanced_fact_fact",
            choose_join_strategy(
                prof(li, orders, "l_orderkey", "o_orderkey"),
                broadcast_rows=50,
            ),
        ),
    ]
    rows = [
        (name, d["strategy"], d["build_side"], d["n_salts"])
        for name, d in cases
    ]
    return spark.createDataFrame(
        rows,
        "scenario string, strategy string, build_side string, "
        "n_salts bigint",
    ).orderBy("scenario")


@register(
    "golden_record_customers",
    oracle="""
    WITH newest AS (
      -- mirror of the operator's newest-rule struct
      -- (non_null_flag, recency, value) max: any NON-NULL value beats
      -- every NULL value regardless of recency, then newest wins with
      -- NULL recency smallest (DESC NULLS LAST)
      SELECT o_custkey, o_orderstatus,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY (o_orderstatus IS NOT NULL) DESC,
                        o_orderdate DESC NULLS LAST,
                        o_orderstatus DESC NULLS LAST) AS rn
      FROM orders
    ),
    freq AS (
      SELECT o_custkey, o_orderpriority,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY COUNT(*) DESC, o_orderpriority ASC) AS rn
      FROM orders GROUP BY o_custkey, o_orderpriority
    ),
    mx AS (
      SELECT o_custkey, MAX(o_totalprice) AS o_totalprice
      FROM orders GROUP BY o_custkey
    )
    -- IS NOT DISTINCT FROM mirrors the operator's groupBy, which
    -- keeps the NULL-custkey group as its own golden record
    SELECT mx.o_custkey AS o_custkey, mx.o_totalprice,
           n.o_orderstatus, f.o_orderpriority
    FROM mx
    JOIN newest n ON mx.o_custkey IS NOT DISTINCT FROM n.o_custkey
                  AND n.rn = 1
    JOIN freq f ON mx.o_custkey IS NOT DISTINCT FROM f.o_custkey
                  AND f.rn = 1
    ORDER BY o_custkey
    """,
    survey_ids=["A6", "A10", "J3"],
    description="Survivorship golden record per customer from their "
    "order history: max price, status from the NEWEST order "
    "(struct-ordered aggregate - no window), modal priority via the "
    "contingency layer's min-over-struct argmax with all mode "
    "attributes melted through ONE extra shuffle; deterministic "
    "tie-breaks on every rule",
)
def golden_record_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.operators.entity import golden_record

    orders = load_table(spark, sf_dir, "orders")
    return golden_record(
        orders,
        "o_custkey",
        {
            "o_totalprice": "max",
            "o_orderstatus": "newest",
            "o_orderpriority": "most_frequent",
        },
        recency_col="o_orderdate",
    ).orderBy("o_custkey")
