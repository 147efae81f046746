"""Relational operator catalog (SURVEY §2.2-§2.6) on the TPC-H-ish tables.

Each query exercises one operator family from the reference inventory and
is expressed Spark-first: filters/projections Catalyst can push into the
parquet scan, broadcast joins for dimensions, window functions for
top-k/rank/mode, exact DECIMAL arithmetic for money sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.catalog import load_table, register

DEC = "decimal(18,4)"


def _d(c) -> F.Column:
    """Exact decimal view of a double column (cross-engine deterministic)."""
    return (F.col(c) if isinstance(c, str) else c).cast(DEC)


# --- scans / aggregations -------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                    (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ids=["S1", "A4", "A5", "A8"],
    description="TPC-H Q1-style pricing summary: multi-agg groupBy with pushed-down date filter",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_d("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_d("l_extendedprice")).cast("double").alias("sum_base_price"),
            # Round the exact decimal to scale 4 BEFORE the double cast: at
            # scale 8 the unscaled sum exceeds 2^53 at sf>=0.1, and DuckDB's
            # decimal->double (int128->double, then /10^scale: two roundings)
            # can land 1 ulp away from Spark's correctly-rounded BigDecimal
            # conversion. At scale 4 the unscaled value fits in 2^53 so both
            # conversions are a single exact-input rounding -> identical.
            F.round(
                F.sum(_d("l_extendedprice") * (F.lit(1) - _d("l_discount"))), 4
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.round(
                F.sum(_d("l_quantity")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "nation_revenue_sql",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    survey_ids=["S1", "J1", "A5"],
    description="spark.sql() surface: 3-table join + aggregate over temp views",
)
def nation_revenue_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same engine through the SQL front-end: register the scans as
    temp views and let the parser/analyzer produce the plan — the
    DataFrame catalog entries and this one meet in the same Catalyst
    representation (broadcast join for nation, partial aggregation)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sql_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("sql_customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("sql_nation")
    return spark.sql(
        """
        SELECT n.n_name AS nation,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS revenue,
               COUNT(*) AS n_orders
        FROM sql_orders o
        JOIN sql_customer c ON o.o_custkey = c.c_custkey
        JOIN sql_nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


@register(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity < 5 AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
    survey_ids=["P6", "S1"],
    description="Predicate + projection pushed to the parquet scan",
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") < 5)
        & (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "distinct_pairs",
    oracle="SELECT DISTINCT o_custkey, o_orderstatus FROM orders",
    survey_ids=["P7"],
    description="Deduplication via dropDuplicates on a key pair",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").dropDuplicates(
        ["o_custkey", "o_orderstatus"]
    ).select("o_custkey", "o_orderstatus")


@register(
    "recode_case",
    oracle="""
    SELECT CASE l_returnflag WHEN 'R' THEN 'returned'
                             WHEN 'A' THEN 'acknowledged'
                             ELSE 'none' END AS flag_text,
           COUNT(*) AS n
    FROM lineitem GROUP BY 1
    """,
    survey_ids=["P3", "J5"],
    description="Value recode via broadcast map literal (dict-map remap)",
)
def recode_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    mapping = F.create_map(
        F.lit("R"), F.lit("returned"), F.lit("A"), F.lit("acknowledged")
    )
    return (
        li.withColumn(
            "flag_text", F.coalesce(mapping[F.col("l_returnflag")], F.lit("none"))
        )
        .groupBy("flag_text")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "regex_extract_firstword",
    oracle="""
    SELECT regexp_extract(p_name, '^(\\w+)', 1) AS first_word, COUNT(*) AS n
    FROM part GROUP BY 1
    """,
    survey_ids=["P8"],
    description="Regex scalar extraction over a string column",
)
def regex_extract_firstword(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.withColumn("first_word", F.regexp_extract("p_name", r"^(\w+)", 1))
        .groupBy("first_word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "string_scalar_ops",
    oracle="""
    SELECT lower(p_type) AS type_lc,
           CAST(NULLIF(split_part(p_brand, '#', 2), '') AS BIGINT) AS brand_num,
           COUNT(*) AS n
    FROM part GROUP BY 1, 2
    """,
    survey_ids=["P9", "P10"],
    description="String scalar ops: lower + split + cast",
)
def string_scalar_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL parity (r11 NULL-salt sweep): DuckDB split_part(NULL, ...)
    # returns '' (not NULL), so the bare oracle CAST('') blows up on a
    # NULL p_brand while Spark's split().getItem() yields NULL —
    # NULLIF(..., '') restores identical NULL-in/NULL-out on both
    # engines (a no-op on NULL-free data: every brand has a '#')
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            F.lower("p_type").alias("type_lc"),
            F.split("p_brand", "#").getItem(1).cast("bigint").alias("brand_num"),
        )
        .groupBy("type_lc", "brand_num")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- joins ----------------------------------------------------------------

@register(
    "join_customer_geo",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    survey_ids=["J1", "J5", "A5"],
    description="Fact-to-dimension equi-joins with broadcast dims",
)
def join_customer_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_d("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


@register(
    "join_semi_suppliers",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
    """,
    survey_ids=["J3"],
    description="Left-semi join (EXISTS): suppliers appearing in lineitem",
)
def join_semi_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@register(
    "join_anti_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    survey_ids=["J3"],
    description="Left-anti join (NOT EXISTS): customers with no orders",
)
def join_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --- pivots / crosstabs ---------------------------------------------------

@register(
    "pivot_status_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
    FROM orders GROUP BY o_orderpriority
    """,
    survey_ids=["A1"],
    description="Crosstab / pivot count: order priority x status",
)
def pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return piv.select(
        "o_orderpriority",
        F.col("F").alias("status_f"),
        F.col("O").alias("status_o"),
        F.col("P").alias("status_p"),
    )


@register(
    "crosstab_percent",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (PARTITION BY o_orderstatus), 6) AS pct_of_status
    FROM orders GROUP BY o_orderpriority, o_orderstatus
    """,
    survey_ids=["A2"],
    description="Column-percent of crosstab via window over the aggregate",
)
def crosstab_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus")
    return counts.select(
        "o_orderpriority",
        "o_orderstatus",
        F.round(F.col("n") * 100.0 / F.sum("n").over(w), 6).alias("pct_of_status"),
    )


# --- weighted aggregates / modes ------------------------------------------

@register(
    "weighted_avg_discount",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE)
                 / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 6) AS wavg_discount
    FROM lineitem GROUP BY l_returnflag
    """,
    survey_ids=["A5"],
    description="Weighted mean by group (weighted sum / weight total)",
)
def weighted_avg_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            # same scale-4 pre-round as q1: keep the unscaled decimal under
            # 2^53 so the decimal->double cast is identical across engines
            F.round(F.sum(_d("l_discount") * _d("l_quantity")), 4).cast("double")
            / F.sum(_d("l_quantity")).cast("double"),
            6,
        ).alias("wavg_discount")
    )


@register(
    "group_mode_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_count FROM (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY COUNT(*) DESC, o_orderpriority ASC) AS rn
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rn = 1
    """,
    survey_ids=["A6"],
    description="Per-group mode via count + row_number window (tie: value asc)",
)
def group_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_count"),
        )
    )


@register(
    "distinct_parts_per_supplier",
    oracle="""
    SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts
    FROM lineitem GROUP BY l_suppkey
    """,
    survey_ids=["A7"],
    description="Exact distinct count per group",
)
def distinct_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts")
    )


@register(
    "cluster_share",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (), 6) AS share
    FROM orders GROUP BY o_orderpriority
    """,
    survey_ids=["A9", "M16"],
    description="Proportion-of-total per group (cluster share)",
)
def cluster_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy()
    return counts.select(
        "o_orderpriority",
        "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(w), 6).alias("share"),
    )


@register(
    "top_supplier_by_qty",
    oracle="""
    SELECT l_suppkey, total_qty FROM (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_suppkey
    ) ORDER BY total_qty DESC, l_suppkey ASC LIMIT 1
    """,
    survey_ids=["A10"],
    description="Argmax selection: orderBy desc + limit 1 with tie-break",
)
def top_supplier_by_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.sum(_d("l_quantity")).cast("double").alias("total_qty"))
        .orderBy(F.desc("total_qty"), F.asc("l_suppkey"))
        .limit(1)
    )


# --- windows / sorts / set ops / reshape ----------------------------------

@register(
    "topk_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, revenue FROM (
      SELECT p_brand, p_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) DESC,
                                         p_partkey ASC) AS rn
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, p_partkey
    ) WHERE rn <= 3
    """,
    survey_ids=["W2", "J1"],
    description="Top-k per group: revenue top-3 parts per brand",
)
def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    # aggregate BEFORE the join: p_partkey determines p_brand, so the
    # per-(brand, part) revenue equals the per-part revenue — joining
    # part onto the |part|-row aggregate instead of the |lineitem|-row
    # fact table cuts the join input by the fan-out factor (the shape
    # that matters at 100 TB, where lineitem >> part)
    rev = li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.sum(_d("l_extendedprice")).cast("double").alias("revenue")
    )
    # no broadcast hint on part (grows with SF): both join sides are
    # |part|-row frames here, so stats pick broadcast when it fits and
    # a keyed shuffle join stays safe when it doesn't
    rev = rev.join(p.select("p_partkey", "p_brand"), "p_partkey")
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_partkey"))
    return (
        rev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "revenue")
    )


@register(
    "rank_suppliers_by_balance",
    oracle="""
    SELECT s_nationkey, s_suppkey, rnk FROM (
      SELECT s_nationkey, s_suppkey,
             RANK() OVER (PARTITION BY s_nationkey
                          ORDER BY s_acctbal DESC NULLS LAST,
                                   s_suppkey ASC NULLS LAST) AS rnk
      FROM supplier
    ) WHERE rnk <= 5
    """,
    survey_ids=["W1"],
    description="Rank-over-metric per partition (rank-sum building block)",
)
def rank_suppliers_by_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL parity (r11 NULL-salt sweep): window ORDER BY null placement
    # is pinned NULLS LAST on BOTH engines — Spark's bare asc() means
    # NULLS FIRST while DuckDB's bare ASC means NULLS LAST, so a NULL
    # tie-break key silently shifts which rows survive the rnk cutoff
    # (no-op on NULL-free data)
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc_nulls_last("s_acctbal"), F.asc_nulls_last("s_suppkey")
    )
    return (
        s.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 5)
        .select("s_nationkey", "s_suppkey", "rnk")
    )


@register(
    "orders_sorted_top100",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST
    LIMIT 100
    """,
    survey_ids=["W3"],
    description="Global sort + limit (TopK physical op)",
)
def orders_sorted_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULLS LAST pinned on both engines: with enough NULL sort keys the
    # LIMIT cutoff would otherwise keep different rows per engine
    o = load_table(spark, sf_dir, "orders")
    return o.orderBy(
        F.desc_nulls_last("o_totalprice"), F.asc_nulls_last("o_orderkey")
    ).select("o_orderkey", "o_totalprice").limit(100)


@register(
    "union_parties",
    oracle="""
    SELECT kind, COUNT(*) AS n,
           CAST(SUM(CAST(acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
    FROM (
      SELECT 'customer' AS kind, c_acctbal AS acctbal FROM customer
      UNION ALL
      SELECT 'supplier' AS kind, s_acctbal AS acctbal FROM supplier
    ) GROUP BY kind
    """,
    survey_ids=["R1"],
    description="Vertical union of heterogeneous tables + aggregate",
)
def union_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"), F.col("c_acctbal").alias("acctbal")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"), F.col("s_acctbal").alias("acctbal")
    )
    return (
        c.unionByName(s)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_d("acctbal")).cast("double").alias("total_bal"),
        )
    )


@register(
    "explode_name_tokens",
    oracle="""
    SELECT token, COUNT(*) AS n FROM (
      SELECT unnest(string_split(p_name, ' ')) AS token FROM part
    ) GROUP BY token
    """,
    survey_ids=["R2", "W4"],
    description="Explode tokenized strings to long form + count",
)
def explode_name_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_hourly",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    """,
    survey_ids=["A4", "A5"],
    description="Tumbling 1-hour window aggregation over the event stream (batch form)",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL parity (r11 NULL-salt sweep): a NULL timestamp has no
    # 1-hour window — Spark's F.window() generates zero windows for it
    # (the row vanishes), while DuckDB's time_bucket(NULL) would keep a
    # NULL-bucket group. The oracle's WHERE ts IS NOT NULL mirrors the
    # Spark operator semantics (no-op on NULL-free data).
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.window("ts", "1 hour").start, "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "total_value"
            ),
        )
    )


@register(
    "events_json_props",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
    FROM events GROUP BY 1
    """,
    survey_ids=["S2", "P8"],
    description="Semi-structured JSON extraction from a string column",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(F.get_json_object("props", "$.k").cast("bigint").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l.l_discount AS DECIMAL(8,6))), 4)
                AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS priority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderdate, l.l_orderkey
    LIMIT 10
    """,
    survey_ids=["J1", "A5", "A10", "W3"],
    description="TPC-H Q3 shape (shipping priority): filters pushed into "
    "BOTH fact scans, dimension broadcast, partial agg before the top-10 "
    "(the canonical optimizer-showcase star query)",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analogue over the synthetic tables (o_orderpriority
    stands in for o_shippriority, which the generator doesn't carry).
    Deliberately written as a pure DataFrame program: Catalyst pushes
    c_mktsegment / date filters into the scans, broadcasts the filtered
    customer side, and AQE plans the lineitem join; the top-10 is a
    TakeOrderedAndProject, not a global sort."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-06-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-06-01"
    )
    # ROUND to scale 4 in the decimal domain before the double cast:
    # the true volume has exactly <= 4 decimals (2dp price x 2dp
    # discount), so the round is the IDENTITY on the value — but it
    # shrinks the decimal's scale from 10 to 4, keeping the unscaled
    # sum under 2^53 (where DuckDB's two-step int128->double conversion
    # and Spark's correctly-rounded BigDecimal cast provably agree; a
    # 1-ulp divergence was observed on q5 at sf3 without it)
    revenue = F.round(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(8,6)")
        ),
        4,
    ).cast("double")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .orderBy(F.col("revenue").desc(), "orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count
    """,
    survey_ids=["J1", "A4"],
    description="TPC-H Q13 shape: left-outer join orders-per-customer "
    "count, then count-of-counts distribution (two shuffles, filter "
    "inside the join condition so customers with only urgent orders "
    "still count as zero)",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    c_orders = (
        cust.join(
            orders,
            (cust["c_custkey"] == orders["o_custkey"])
            & (orders["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


@register(
    "cube_orders_profile",
    oracle="""
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    survey_ids=["A4", "A11"],
    description="Native CUBE grouping sets: all four aggregation grains "
    "in ONE Expand+aggregate pass (no self-union of per-grain scans); "
    "GROUPING() ids disambiguate real NULLs from subtotal rows",
)
def cube_orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (
                F.grouping("o_orderstatus") * 2
                + F.grouping("o_orderpriority")
            ).cast("bigint").alias("gid"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias(
                "priority"
            ),
            "n",
            "gid",
        )
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * CAST(1 - l.l_discount AS DECIMAL(8,6))), 4)
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
    survey_ids=["J1", "J5", "A5", "W3"],
    description="TPC-H Q5 shape (local supplier volume): six-way star "
    "join where every dimension chain (region->nation->customer/"
    "supplier) broadcasts, the customer-nation == supplier-nation "
    "residual rides the supplier join, and only the orders-lineitem "
    "spine shuffles — DECIMAL-exact revenue per nation",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analogue: the classic 'does the optimizer keep the
    fact-table spine as the only shuffle' benchmark. The region/nation
    dimension chain and supplier/customer sides are broadcast-sized at
    any SF where they fit (Catalyst picks broadcast-hash from stats);
    the c_nationkey = s_nationkey clause is a residual on the lineitem-
    supplier join, not a separate shuffle."""
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    # ROUND to scale 4 in the decimal domain before the double cast:
    # the true volume has exactly <= 4 decimals (2dp price x 2dp
    # discount), so the round is the IDENTITY on the value — but it
    # shrinks the decimal's scale from 10 to 4, keeping the unscaled
    # sum under 2^53 (where DuckDB's two-step int128->double conversion
    # and Spark's correctly-rounded BigDecimal cast provably agree; a
    # 1-ulp divergence was observed on q5 at sf3 without it)
    revenue = F.round(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(8,6)")
        ),
        4,
    ).cast("double")
    asian_nations = nation.join(
        F.broadcast(region),
        nation["n_regionkey"] == region["r_regionkey"],
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            # no broadcast hint: supplier grows with SF, so forcing it
            # would override Catalyst's size-based planning and risk
            # executor OOM at scale — stats pick broadcast-hash at any
            # SF where it actually fits
            supp,
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(
            F.broadcast(asian_nations),
            supp["s_nationkey"] == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), "nation")
    )


def _rankfn_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    pr = ref_round_sql("PERCENT_RANK() OVER w", 6)
    cd = ref_round_sql("CUME_DIST() OVER w", 6)
    return f"""
    SELECT s_suppkey,
           s_nationkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           {pr} AS prank6,
           {cd} AS cdist6,
           NTILE(4) OVER w AS quartile
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey
                 ORDER BY s_acctbal DESC NULLS LAST, s_suppkey NULLS LAST)
    ORDER BY s_suppkey
    """


@register(
    "rank_functions_suppliers",
    oracle=_rankfn_oracle(),
    survey_ids=["W1", "W3"],
    description="Full ranking-function surface in one keyed window "
    "(rank, dense_rank, percent_rank, cume_dist, ntile) over suppliers "
    "by balance within nation — deterministic tie-break key so every "
    "rank is engine-stable",
)
def rank_functions_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    supp = load_table(spark, sf_dir, "supplier")
    # NULLS LAST pinned on both engines (see rank_suppliers_by_balance)
    # — NTILE especially depends on the TOTAL order, not just ties
    w = (
        Window.partitionBy("s_nationkey")
        .orderBy(F.desc_nulls_last("s_acctbal"), F.asc_nulls_last("s_suppkey"))
    )
    return supp.select(
        "s_suppkey",
        "s_nationkey",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        ref_round(F.percent_rank().over(w), 6).alias("prank6"),
        ref_round(F.cume_dist().over(w), 6).alias("cdist6"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    ).orderBy("s_suppkey")


@register(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250
    )
    SELECT c.c_name AS c_name, c.c_custkey AS c_custkey,
           o.o_orderkey AS o_orderkey, o.o_totalprice AS o_totalprice,
           b.sum_qty AS sum_qty
    FROM orders o
    JOIN big b ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    survey_ids=["A5", "J1", "W2", "W3"],
    description="TPC-H Q18 shape (large-volume customers): the "
    "HAVING-subquery pattern as aggregate-then-join — lineitem "
    "collapses to the qualifying-order frame FIRST (tiny after the "
    "threshold), so the orders/customer joins see hundreds of rows, "
    "not the fact table; deterministic top-100 by (price desc, key)",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_totalprice", "sum_qty"
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q4_late_shipment_priority",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY priority
    """,
    survey_ids=["J3", "A4", "P6"],
    description="TPC-H Q4 shape (order-priority checking, adapted to "
    "this schema's dates): EXISTS with a CORRELATED cross-table range "
    "predicate expressed as a left-semi join carrying the non-equi "
    "residual — the fact table never fans out, each order counts once "
    "no matter how many late lines it has",
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = (
        F.col("l_orderkey") == F.col("o_orderkey")
    ) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("priority")
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT date_trunc('month', l.l_shipdate) AS ship_month,
           CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                         * (1 - CAST(l.l_discount AS DECIMAL(8,6)))
                    ELSE 0 END), 4) AS DOUBLE) AS promo_rev,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,6)))), 4)
                AS DOUBLE) AS total_rev,
           (CASE WHEN ((100.0 * CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO' THEN CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6))) ELSE 0 END), 4) AS DOUBLE) / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE))) IS NULL OR isnan(CAST(((100.0 * CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO' THEN CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6))) ELSE 0 END), 4) AS DOUBLE) / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE))) AS DOUBLE)) OR isinf(CAST(((100.0 * CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO' THEN CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6))) ELSE 0 END), 4) AS DOUBLE) / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE))) AS DOUBLE)) OR ABS(CAST(((100.0 * CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO' THEN CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6))) ELSE 0 END), 4) AS DOUBLE) / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE))) AS DOUBLE)) >= 9007199254.740992 THEN CAST(((100.0 * CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO' THEN CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6))) ELSE 0 END), 4) AS DOUBLE) / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE))) AS DOUBLE) ELSE CAST(CAST(FLOOR((CAST(printf('%.20f', CAST(((100.0 * CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO' THEN CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6))) ELSE 0 END), 4) AS DOUBLE) / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE))) AS DOUBLE)) AS DECIMAL(38,20)) * 1000000)) AS HUGEINT) + CASE WHEN ((((CAST(printf('%.20f', CAST(((100.0 * CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO' THEN CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6))) ELSE 0 END), 4) AS DOUBLE) / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE))) AS DOUBLE)) AS DECIMAL(38,20)) * 1000000) - FLOOR((CAST(printf('%.20f', CAST(((100.0 * CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO' THEN CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6))) ELSE 0 END), 4) AS DOUBLE) / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE))) AS DOUBLE)) AS DECIMAL(38,20)) * 1000000)))) > 0.5 OR ((((CAST(printf('%.20f', CAST(((100.0 * CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO' THEN CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6))) ELSE 0 END), 4) AS DOUBLE) / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE))) AS DOUBLE)) AS DECIMAL(38,20)) * 1000000) - FLOOR((CAST(printf('%.20f', CAST(((100.0 * CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO' THEN CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6))) ELSE 0 END), 4) AS DOUBLE) / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE))) AS DOUBLE)) AS DECIMAL(38,20)) * 1000000)))) = 0.5 AND (CAST(FLOOR((CAST(printf('%.20f', CAST(((100.0 * CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO' THEN CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6))) ELSE 0 END), 4) AS DOUBLE) / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE))) AS DOUBLE)) AS DECIMAL(38,20)) * 1000000)) AS HUGEINT)) % 2 != 0)) THEN 1 ELSE 0 END AS DOUBLE) / 1000000 END) AS promo_share6
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1 ORDER BY 1
    """,
    survey_ids=["A5", "A9", "J1"],
    description="TPC-H Q14 shape (promo revenue share) per ship month: "
    "conditional DECIMAL-exact revenue split on a dimension attribute "
    "(part joins AFTER the date filter prunes the fact side), share "
    "from the scale-4-rounded exact sums so both engines divide "
    "identical doubles",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    # discount at DECIMAL(8,6), mirroring the oracle's cast exactly
    # (the q5/q3 pairing convention — a 4dp cast would quantize
    # differently from the oracle's 6dp on finer-grained discounts)
    rev = _d("l_extendedprice") * (
        F.lit(1) - F.col("l_discount").cast("decimal(8,6)")
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", rev).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    )
    total = F.sum(rev)
    promo4 = F.round(promo, 4).cast("double")
    total4 = F.round(total, 4).cast("double")
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            promo4.alias("promo_rev"),
            total4.alias("total_rev"),
            # ref_round, never F.round, on a double RATIO — the
            # round-6 cross-engine determinism rule
            ref_round(F.lit(100.0) * promo4 / total4, 6).alias(
                "promo_share6"
            ),
        )
        .orderBy("ship_month")
    )


def _rev6_sql(expr: str) -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    return ref_round_sql(expr, 6)


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {_rev6_sql(
        "CAST(ROUND(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
        " * CAST(l_discount AS DECIMAL(8,6))), 0), 4) AS DOUBLE)"
    )} AS revenue6,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    survey_ids=["P6", "A8"],
    description="TPC-H Q6 shape (forecast revenue change): pure "
    "scan-side predicate work - every filter (date range, discount "
    "band, quantity cap) pushes to the parquet scan, ONE map-side-"
    "combined DECIMAL aggregate, zero joins and zero wide shuffles; "
    "the canonical 'is pushdown actually happening' probe",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.round(
        F.coalesce(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * F.col("l_discount").cast("decimal(8,6)")
            ),
            F.lit(0),
        ),
        4,
    ).cast("double")
    return li.agg(
        ref_round(rev, 6).alias("revenue6"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q7_nation_volume_shipping",
    oracle=f"""
    WITH flows AS (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             CAST(strftime(l.l_shipdate, '%Y') AS BIGINT) AS l_year,
             CAST(l.l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - l.l_discount AS DECIMAL(8,6)) AS volume
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
          OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
    )
    SELECT supp_nation, cust_nation, l_year,
           {_rev6_sql("CAST(ROUND(SUM(volume), 4) AS DOUBLE)")} AS revenue6,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM flows
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    survey_ids=["J1", "J5", "A5"],
    description="TPC-H Q7 shape (bilateral shipping volume): the "
    "lineitem spine is the ONLY large scan - orders/customer join on "
    "the spine, both nation legs ride broadcasts, and the two-nation "
    "disjunction prunes early; per (direction, year) DECIMAL volume",
)
def q7_nation_volume_shipping(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    n1, n2 = "NATION_1", "NATION_2"
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    vol = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,6)")
    flows = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .filter(
            (
                (F.col("supp_nation") == n1)
                & (F.col("cust_nation") == n2)
            )
            | (
                (F.col("supp_nation") == n2)
                & (F.col("cust_nation") == n1)
            )
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            vol.alias("_v"),
        )
    )
    return (
        flows.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            ref_round(
                F.round(F.sum("_v"), 4).cast("double"), 6
            ).alias("revenue6"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q10_returned_item_reporting",
    oracle=f"""
    WITH rev AS (
      SELECT c.c_custkey, c.c_name, n.n_name,
             {_rev6_sql(
                 "CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))"
                 " * CAST(1 - l.l_discount AS DECIMAL(8,6))), 4)"
                 " AS DOUBLE)"
             )} AS revenue6
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1996-07-01'
        AND l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, n.n_name
    )
    SELECT c_custkey, c_name, n_name, revenue6
    FROM rev ORDER BY revenue6 DESC, c_custkey LIMIT 20
    """,
    survey_ids=["J1", "W2", "A5"],
    description="TPC-H Q10 shape (returned-item revenue, top 20 "
    "customers): date + returnflag predicates push to the scans, the "
    "customer rollup is ONE shuffle on the join spine, nation rides a "
    "broadcast, and the top-k is a deterministic (revenue, custkey) "
    "global sort of the AGGREGATED frame - never the raw fan-out",
)
def q10_returned_item_reporting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    rev = F.round(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(8,6)")
        ),
        4,
    ).cast("double")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == cust["c_custkey"])
        .join(
            F.broadcast(nation),
            cust["c_nationkey"] == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(ref_round(rev, 6).alias("revenue6"))
        .orderBy(F.desc("revenue6"), "c_custkey")
        .limit(20)
    )


@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {_rev6_sql(
        "CAST(ROUND(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
        " * CAST(1 - l_discount AS DECIMAL(8,6))), 0), 4) AS DOUBLE)"
    )} AS revenue6,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    survey_ids=["J1", "P6", "A8"],
    description="TPC-H Q19 shape (OR-of-ANDs predicate revenue): the "
    "classic disjunctive-pushdown test - brand/size conjuncts prune "
    "the part side before the join, quantity bands stay as residuals, "
    "one DECIMAL aggregate over the surviving pairs",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(part, li["l_partkey"] == part["p_partkey"])
    q = F.col("l_quantity")
    sz = F.col("p_size")
    b = F.col("p_brand")
    cond = (
        ((b == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & sz.between(1, 15) & q.between(20, 30))
    )
    rev = F.round(
        F.coalesce(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(8,6)")
            ),
            F.lit(0),
        ),
        4,
    ).cast("double")
    return j.filter(cond).agg(
        ref_round(rev, 6).alias("revenue6"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
               / COUNT(*) AS ab
      FROM customer WHERE c_acctbal > 0.0
    ),
    eligible AS (
      SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
      FROM customer c CROSS JOIN avg_bal
      WHERE c.c_acctbal > ab
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    )
    SELECT n.n_name AS n_name,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
             AS totacctbal
    FROM eligible e JOIN nation n ON e.c_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY n.n_name
    """,
    survey_ids=["J3", "A5", "A8"],
    description="TPC-H Q22 shape (global sales opportunity): scalar "
    "subquery (positive-balance average) as a 1-row broadcast, "
    "customers without RECENT orders as a LEFT ANTI join on the "
    "date-pruned order spine "
    "(never NOT IN's null trap), nation rollup of the survivors - "
    "the anti-join + scalar-subquery shape in one query",
)
def q22_global_sales_opportunity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2001-01-01")
        .select("o_custkey")
    )
    nation = load_table(spark, sf_dir, "nation")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("ab")
    )
    eligible = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
    )
    return (
        eligible.join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("n_name")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * CAST(1 - l_discount AS DECIMAL(8,6))) AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    ),
    mx AS (SELECT MAX(r) AS m FROM rev)
    SELECT s.s_suppkey, s.s_name,
           {_rev6_sql("CAST(ROUND(r, 4) AS DOUBLE)")} AS revenue6
    FROM rev JOIN mx ON rev.r = mx.m
    JOIN supplier s ON rev.l_suppkey = s.s_suppkey
    ORDER BY s.s_suppkey
    """,
    survey_ids=["J1", "A10", "A5"],
    description="TPC-H Q15 shape (top supplier by quarterly revenue): "
    "the argmax-against-a-scalar-subquery pattern - per-supplier "
    "DECIMAL revenue in one shuffle, the max as a 1-row broadcast, "
    "the equality filter EXACT because both sides stay DECIMAL until "
    "after selection (double equality on aggregates is the classic "
    "cross-engine trap this sidesteps)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(8,6)")
        ).alias("_r")
    )
    mx = rev.agg(F.max("_r").alias("_m"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("_r") == F.col("_m"))
        .join(supp, F.col("l_suppkey") == supp["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            ref_round(
                F.round(F.col("_r"), 4).cast("double"), 6
            ).alias("revenue6"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH avgq AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               / COUNT(*) AS aq
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {_rev6_sql(
        "CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 0)"
        " AS DOUBLE) / 7.0"
    )} AS avg_yearly6,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN avgq a ON l.l_partkey = a.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND CAST(l.l_quantity AS DOUBLE) < 0.2 * a.aq
    """,
    survey_ids=["J1", "A8", "A5"],
    description="TPC-H Q17 shape (small-quantity-order revenue): the "
    "correlated-aggregate-subquery pattern as a per-part average join "
    "back onto the spine - one keyed aggregate (exact DECIMAL mean, "
    "one IEEE division), brand filter pruning the part side, "
    "threshold residual on the rejoin; never a per-row subquery",
)
def q17_small_quantity_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    )
    # Semi-join pushdown (r8 verdict task 2): the per-part average is
    # only ever consumed for partkeys that survive the brand filter
    # (~1/25 selectivity), so aggregate ONLY those lineitem rows — the
    # spine join restricts to the same partkeys, so the result is
    # identical while the aggregate's shuffle input shrinks ~25x. At
    # these SFs AQE turns the semi join into a broadcast; no forced
    # broadcast (a 100 TB part table's filtered set may not fit).
    avgq = (
        li.join(
            part.select("p_partkey"),
            li["l_partkey"] == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("_pk"))
        .agg(
            (
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("_aq")
        )
    )
    j = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(avgq, li["l_partkey"] == F.col("_pk"))
        .filter(
            F.col("l_quantity").cast("double")
            < F.lit(0.2) * F.col("_aq")
        )
    )
    total = F.coalesce(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), F.lit(0)
    ).cast("double")
    return j.agg(
        ref_round(total / F.lit(7.0), 6).alias("avg_yearly6"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --- round 9: the remaining TPC-H query shapes ---------------------------
#
# Rounds 1-8 covered Q1/Q3/Q4/Q5/Q6/Q7/Q10/Q13/Q14/Q15/Q17/Q18/Q19/Q22.
# These eight close the family: every one of the 22 TPC-H optimizer
# shapes now has a catalog analogue on the synthetic star schema
# (adapted where the synthetic schema lacks partsupp / l_commitdate /
# l_shipmode: the "supply" relation derives from distinct
# (l_partkey, l_suppkey) pairs, lateness from l_shipdate vs
# o_orderdate). Reference parity: the reference's query layer is a
# SQL-equivalent relational surface (SURVEY §2.2-§2.6); TPC-H is the
# public stand-in for its join/agg/subquery shapes.


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
      FROM lineitem GROUP BY 1, 2
    ),
    eligible AS (
      SELECT s.s_acctbal, s.s_name, n.n_name,
             sp.l_partkey, sp.cost
      FROM supply sp
      JOIN part p ON sp.l_partkey = p.p_partkey AND p.p_size = 15
      JOIN supplier s ON sp.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    best AS (
      SELECT l_partkey, MIN(cost) AS mincost FROM eligible GROUP BY 1
    )
    SELECT e.s_acctbal, e.s_name, e.n_name,
           e.l_partkey AS p_partkey, e.cost
    FROM eligible e
    JOIN best b ON e.l_partkey = b.l_partkey AND e.cost = b.mincost
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p_partkey
    """,
    survey_ids=["J1", "A10", "A5"],
    description="TPC-H Q2 shape (min-cost supplier): correlated-MIN "
    "subquery as aggregate-then-join-back; the supply relation derives "
    "from distinct (part, supplier) lineitem pairs since the synthetic "
    "schema has no partsupp",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analogue (the correlated-min subquery shape; see the
    section comment above for why TPC-H stands in for the reference's
    relational surface). The per-part
    minimum is computed ONLY over region-eligible suppliers of
    size-15 parts — the part and region filters prune BOTH the
    aggregate's input and the join-back spine, so the correlated
    subquery never sees the full supply relation (the Q17 semi-join
    pushdown lesson applied at design time). cost = MIN(price) is an
    exact selection, so the equality join-back is engine-stable
    (never an equality on a SUM).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    # Semi-join pushdown (r9 verdict task 2, same transform as Q17):
    # l_partkey and l_suppkey are BOTH grouping keys of the supply
    # aggregate, and the post-agg joins restrict to exactly the
    # size-15 partkeys (~1/50) and EUROPE suppkeys (~1/5) — both
    # unique-keyed inner joins, so pre-filtering the aggregate's
    # input leaves every surviving group's MIN untouched while the
    # one fact-sized shuffle shrinks ~250x. AQE turns the semi joins
    # into broadcasts at these SFs; no forced broadcast (a 100 TB
    # part table's filtered set may not fit).
    # fresh loads (new expr ids) for the semi side: the same tables
    # join again above the aggregate, and reusing the frames would
    # trip Spark's ambiguous-self-join analyzer
    supp2 = load_table(spark, sf_dir, "supplier")
    nation2 = load_table(spark, sf_dir, "nation")
    region2 = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    eur_suppkeys = (
        supp2.join(
            F.broadcast(
                nation2.join(
                    F.broadcast(region2),
                    nation2["n_regionkey"] == region2["r_regionkey"],
                ).select("n_nationkey")
            ),
            supp2["s_nationkey"] == F.col("n_nationkey"),
            "left_semi",
        )
        .select(F.col("s_suppkey").alias("_esk"))
    )
    supply = (
        li.join(
            part.select("p_partkey"),
            li["l_partkey"] == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            eur_suppkeys,
            li["l_suppkey"] == F.col("_esk"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("cost"))
    )
    # no join back to part: the semi join below the aggregate already
    # restricts supply's partkeys to the size-15 set (p_partkey is
    # unique and no part column is projected, so the former inner
    # join was pure dead work — one scan + one join per execution)
    eligible = (
        supply.join(supp, supply["l_suppkey"] == supp["s_suppkey"])
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation["n_regionkey"] == region["r_regionkey"],
                )
            ),
            supp["s_nationkey"] == F.col("n_nationkey"),
        )
        .select("s_acctbal", "s_name", "n_name", "l_partkey", "cost")
    )
    best = eligible.groupBy(F.col("l_partkey").alias("_bk")).agg(
        F.min("cost").alias("_mincost")
    )
    return (
        eligible.join(
            best,
            (eligible["l_partkey"] == F.col("_bk"))
            & (eligible["cost"] == F.col("_mincost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "cost",
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
    )


def _q8_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    share = ref_round_sql(
        "COALESCE(CAST(ROUND(SUM(CASE WHEN nat = 'NATION_7' THEN volume END), 4)"
        " AS DOUBLE), 0.0) / CAST(ROUND(SUM(volume), 4) AS DOUBLE)",
        6,
    )
    return f"""
    WITH sale AS (
      SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,4))
               * CAST(1 - l.l_discount AS DECIMAL(8,6)) AS volume,
             sn.n_name AS nat
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    )
    SELECT o_year, {share} AS mkt_share6
    FROM sale GROUP BY o_year ORDER BY o_year
    """


@register(
    "q8_market_share",
    oracle=_q8_oracle(),
    survey_ids=["J1", "A9", "A8"],
    description="TPC-H Q8 shape (national market share): eight-way "
    "star join - two nation aliases (customer-side market region, "
    "supplier-side share nation), conditional-sum ratio per order year",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analogue: NATION_7's share of ECONOMY-part volume sold
    into the ASIA market per order year. The nation dimension joins
    TWICE under different roles (customer region gate, supplier share
    flag) — both ride broadcasts; the only shuffle is the fact-spine
    orders join and the year rollup. The share is a conditional
    DECIMAL sum over the same cell frame (never two scans), rounded
    in the decimal domain (scale 4) BEFORE the double cast so both
    engines convert a sub-2^53 unscaled value exactly.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    )
    cust_nations = nation.join(
        F.broadcast(region),
        nation["n_regionkey"] == region["r_regionkey"],
    ).select(F.col("n_nationkey").alias("_cnk"))
    supp_nations = nation.select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("nat")
    )
    volume = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,6)")
    # Most-selective-first (r9 verdict task 3): the ECONOMY part
    # filter is the tightest gate on the fact spine (~1/25), so
    # semi-join lineitem to the filtered part keys BEFORE the
    # orders/customer/supplier shuffle chain — AQE broadcasts the
    # small side but will not reorder shuffle joins above it, so the
    # ordering must be declared. p_partkey is unique, so the semi
    # join equals the former tail inner join row-for-row.
    sale = (
        li.join(
            part.select("p_partkey"),
            li["l_partkey"] == F.col("p_partkey"),
            "left_semi",
        )
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(cust_nations), cust["c_nationkey"] == F.col("_cnk"))
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(supp_nations), supp["s_nationkey"] == F.col("_snk"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            volume.alias("volume"),
            "nat",
        )
    )
    num = F.coalesce(
        F.round(F.sum(F.when(F.col("nat") == "NATION_7", F.col("volume"))), 4)
        .cast("double"),
        F.lit(0.0),
    )
    den = F.round(F.sum("volume"), 4).cast("double")
    return (
        sale.groupBy("o_year")
        .agg(ref_round(num / den, 6).alias("mkt_share6"))
        .orderBy("o_year")
    )


def _q9_oracle() -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    profit = ref_round_sql(
        "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
        " * CAST(1 - l_discount AS DECIMAL(8,6))), 2) AS DOUBLE)"
        " - 0.1 * CAST(ROUND(SUM(CAST(p_retailprice AS DECIMAL(18,4))"
        " * CAST(l_quantity AS DECIMAL(9,2))), 2) AS DOUBLE)",
        2,
    )
    return f"""
    SELECT sn.n_name AS nation,
           EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
           {profit} AS profit2
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """


@register(
    "q9_product_type_profit",
    oracle=_q9_oracle(),
    survey_ids=["J1", "A5", "A8"],
    description="TPC-H Q9 shape (product-type profit): LIKE-filtered "
    "part dimension pruning the fact spine, profit = revenue minus a "
    "retail-price cost proxy (no partsupp in the synthetic schema), "
    "rolled up by supplier nation x order year",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analogue: profit on '%widget%' parts by supplier
    nation and order year. Cost uses p_retailprice x quantity (the
    synthetic schema has no ps_supplycost) — the shape is what
    matters: a mid-selectivity LIKE filter on the part dimension
    pruning the spine, two independent DECIMAL sums over the same
    cell frame, and the revenue-minus-cost arithmetic done on
    decimal-rounded doubles so both engines see identical operands.
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(8,6)")
    )
    cost = F.sum(
        F.col("p_retailprice").cast("decimal(18,4)")
        * F.col("l_quantity").cast("decimal(9,2)")
    )
    profit = F.round(rev, 2).cast("double") - F.lit(0.1) * F.round(
        cost, 2
    ).cast("double")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("_snk"),
                    F.col("n_name").alias("nation"),
                )
            ),
            supp["s_nationkey"] == F.col("_snk"),
        )
        .join(
            part.select("p_partkey", "p_retailprice"),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("nation", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(ref_round(profit, 2).alias("profit2"))
        .orderBy("nation", F.desc("o_year"))
    )


def _q11_oracle() -> str:
    return """
    WITH val AS (
      SELECT l.l_partkey AS p_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS v
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'AFRICA'
      GROUP BY 1
    ),
    tot AS (SELECT SUM(v) AS t, COUNT(*) AS n FROM val)
    SELECT v.p_partkey,
           CAST(ROUND(v.v, 2) AS DOUBLE) AS value2
    FROM val v, tot
    WHERE CAST(ROUND(v.v, 2) AS DOUBLE)
          > 2.0 * CAST(ROUND(tot.t, 2) AS DOUBLE) / tot.n
    ORDER BY value2 DESC, v.p_partkey
    """


@register(
    "q11_important_stock",
    oracle=_q11_oracle(),
    survey_ids=["A5", "A9", "J1"],
    description="TPC-H Q11 shape (important stock): per-part value "
    "restricted to one region's suppliers, kept only above a "
    "fraction-of-grand-total threshold - the scalar-subquery-"
    "threshold pattern as a 1-row broadcast",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analogue: AFRICA-supplied part value above twice the
    average per-part value (TPC-H scales its fraction by 1/SF; the
    2x-average form is the same selectivity at EVERY scale factor).
    ONE keyed aggregate builds the per-part value
    frame; the grand total derives from that frame (never a second
    fact scan) and rides a 1-row broadcast into the threshold filter.
    The comparison is done in doubles computed identically by both
    engines from the same exact DECIMAL sums; a strict > against a
    scaled total (not an equality) so the filter is engine-stable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AFRICA"
    )
    african = nation.join(
        F.broadcast(region),
        nation["n_regionkey"] == region["r_regionkey"],
    ).select(F.col("n_nationkey").alias("_nk"))
    val = (
        li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(african), supp["s_nationkey"] == F.col("_nk"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("_v")
        )
    )
    tot = val.agg(
        F.sum("_v").alias("_t"), F.count(F.lit(1)).alias("_n")
    )
    # pre-round both sums in the DECIMAL domain (scale 2 — lossless
    # on cent-valued prices) BEFORE the double casts, so the grand
    # total's unscaled value stays under 2^53 at any SF and both
    # engines convert identically (same device as q1/q3/q5; r9
    # ADVICE item 1)
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(
            F.round(F.col("_v"), 2).cast("double")
            > F.lit(2.0) * F.round(F.col("_t"), 2).cast("double")
            / F.col("_n")
        )
        .select(
            "p_partkey",
            F.round(F.col("_v"), 2).cast("double").alias("value2"),
        )
        .orderBy(F.desc("value2"), "p_partkey")
    )


@register(
    "q12_late_shipment_modes",
    oracle="""
    SELECT l.l_linestatus AS linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY linestatus
    ORDER BY linestatus
    """,
    survey_ids=["J1", "A4", "P6"],
    description="TPC-H Q12 shape (shipping-mode priority split): "
    "date-pruned fact join with a cross-column lateness residual, "
    "conditional-count split by order priority per line status "
    "(the synthetic schema has no l_shipmode; l_linestatus stands in)",
)
def q12_late_shipment_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analogue: 1997 shipments more than 60 days after
    their order date, split urgent/high vs other priority per line
    status. The ship-year range pushes into the parquet scan; the
    lateness predicate is a cross-table residual evaluated on the
    join, and both counts come from ONE conditional aggregation pass
    (never two scans of the joined frame).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("linestatus")
    )


@register(
    "q16_supplier_part_variety",
    oracle="""
    WITH supply AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    bad_supp AS (
      -- anti-join semantics, mirroring the Spark LEFT ANTI exactly:
      -- a NULL s_acctbal supplier is NOT excluded on either engine
      -- (r9 ADVICE item 2 — the former inner join on s_acctbal >= 0
      -- dropped NULL-balance suppliers that the anti join keeps)
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           COUNT(DISTINCT sp.l_suppkey) AS supplier_cnt
    FROM supply sp
    LEFT JOIN bad_supp b ON sp.l_suppkey = b.s_suppkey
    JOIN part p ON sp.l_partkey = p.p_partkey
    WHERE b.s_suppkey IS NULL
      AND p.p_brand <> 'Brand#1'
      AND p.p_size IN (5, 10, 15, 20, 25)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p_size
    """,
    survey_ids=["J3", "A7", "P7"],
    description="TPC-H Q16 shape (supplier variety per part class): "
    "distinct supply pairs, NOT-IN-complaint-suppliers as a positive "
    "balance filter (anti-join semantics without NOT IN's null trap), "
    "countDistinct suppliers per (brand, type, size)",
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analogue: how many distinct in-good-standing
    suppliers serve each (brand, type, size) class. The supply
    relation is the distinct (part, supplier) projection of lineitem
    (no partsupp in the synthetic schema); the excluded-supplier
    subquery (TPC-H's NOT IN on complaint comments) becomes a
    LEFT ANTI join against negative-balance suppliers — same
    semantics, no NOT IN null trap, and Catalyst broadcasts the
    6-row exclusion side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(5, 10, 15, 20, 25)
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    supply = li.select("l_partkey", "l_suppkey").distinct()
    return (
        supply.join(
            bad_supp, supply["l_suppkey"] == F.col("s_suppkey"), "left_anti"
        )
        .join(part, supply["l_partkey"] == part["p_partkey"])
        .groupBy(
            "p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size")
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_promotion_suppliers",
    oracle="""
    WITH red_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ),
    per_pair AS (
      SELECT l.l_suppkey, l.l_partkey,
             CAST(COALESCE(SUM(CASE
               WHEN l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
               THEN CAST(l.l_quantity AS DECIMAL(18,4)) END), 0) AS DOUBLE)
               AS q97,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               AS qall
      FROM lineitem l
      JOIN red_parts p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    qualifying AS (
      SELECT DISTINCT l_suppkey FROM per_pair WHERE q97 > 0.25 * qall
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN qualifying q ON s.s_suppkey = q.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    ORDER BY s.s_suppkey
    """,
    survey_ids=["J3", "A5", "P6"],
    description="TPC-H Q20 shape (potential part promotion): nested "
    "correlated-aggregate subquery as ONE conditional aggregate over "
    "the name-filtered supply spine, then a semi-join lifting "
    "qualifying suppliers (lineitem-derived supply; no partsupp)",
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analogue: suppliers who concentrated more than 25%
    of their all-time shipped quantity of some 'red%' part into 1997
    (TPC-H's availqty > half-of-shipped test re-expressed on the
    synthetic schema). The correlated subquery pair (per-(supplier,
    part) year quantity vs total) collapses into ONE conditional
    aggregation over the part-pruned spine; qualification is a
    strict > on doubles both engines derive from the same exact
    DECIMAL sums; the supplier lift is a left-semi join so no
    duplicate suppliers ever materialize.
    """
    li = load_table(spark, sf_dir, "lineitem")
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    in_97 = (F.col("l_shipdate") >= "1997-01-01") & (
        F.col("l_shipdate") < "1998-01-01"
    )
    per_pair = (
        li.join(red, li["l_partkey"] == red["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(in_97, F.col("l_quantity").cast("decimal(18,4)"))
                ),
                F.lit(0).cast("decimal(18,4)"),
            )
            .cast("double")
            .alias("q97"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("qall"),
        )
    )
    qualifying = per_pair.filter(
        F.col("q97") > F.lit(0.25) * F.col("qall")
    ).select("l_suppkey")
    return (
        supp.join(
            qualifying, supp["s_suppkey"] == F.col("l_suppkey"), "left_semi"
        )
        .join(
            F.broadcast(nation),
            supp["s_nationkey"] == nation["n_nationkey"],
        )
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH pairs AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                 THEN 1 ELSE 0 END) AS late
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY 1, 2
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(*) AS n_supp,
             SUM(late) AS n_late
      FROM pairs GROUP BY 1
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM pairs p
    JOIN per_order po ON p.l_orderkey = po.l_orderkey
                     AND po.n_supp > 1 AND po.n_late = 1
    JOIN supplier s ON p.l_suppkey = s.s_suppkey
    WHERE p.late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
    survey_ids=["J3", "A4", "A7"],
    description="TPC-H Q21 shape (suppliers who kept orders waiting): "
    "the EXISTS / NOT-EXISTS double correlated subquery rewritten as "
    "set algebra over ONE collapsed (order, supplier, late) frame - "
    "multi-supplier orders where exactly one supplier shipped late",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analogue: for finalized orders, suppliers who were
    the SOLE late shipper (>90 days after order date) on an order
    involving other suppliers. The classic EXISTS(other supplier) AND
    NOT EXISTS(other LATE supplier) pair becomes counting over a
    collapsed frame: lineitem folds to distinct (order, supplier,
    any-late) ONCE (the only fact-sized shuffle); per-order supplier
    and late-supplier counts derive from that tiny frame, and the
    verdict is n_supp > 1 AND n_late = 1 with the late flag on the
    pair row — identical semantics, no correlated re-scans.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    late = F.when(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        1,
    ).otherwise(0)
    from qudo_etl_pipeline_spark.operators.prefix import (
        acquire_operator_cache,
    )

    # cached once so "lineitem folds ... ONCE (the only fact-sized
    # shuffle)" holds physically: the per-order counts and the verdict
    # join both consume the collapsed pair frame, and without a cache
    # each re-ran the lineitem-orders join + aggregation
    pairs = acquire_operator_cache(
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late"))
    )
    per_order = pairs.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late").alias("n_late"),
    )
    return (
        pairs.filter(F.col("late") == 1)
        .join(
            per_order.filter(
                (F.col("n_supp") > 1) & (F.col("n_late") == 1)
            ),
            pairs["l_orderkey"] == F.col("_ok"),
        )
        .join(supp, pairs["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )
