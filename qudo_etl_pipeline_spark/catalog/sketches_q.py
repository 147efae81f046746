"""Sketch & layout catalog entries: count-min frequency, Bloom-filter
membership, z-order clustering (operators/sketches.py,
functions/zorder.py).

The sketches use the universal affine family over one md5 base hash
(functions/hashing.py::hash_positions) so the DuckDB oracle reproduces
every cell/word bit-for-bit — the driver hash-checks the sketch
CONTENTS, not just the estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.catalog import (
    load_table,
    load_table_spread,
    register,
)
from qudo_etl_pipeline_spark.functions.hashing import hash_position_sql
from qudo_etl_pipeline_spark.functions.zorder import zorder2, zorder2_sql
from qudo_etl_pipeline_spark.operators import sketches as SK
from qudo_etl_pipeline_spark.operators.prefix import acquire_operator_cache


def _h(expr: str, seed: int, modulus: int) -> str:
    return hash_position_sql(expr, seed, modulus)


def _cms_oracle(depth: int = 3, width: int = 256) -> str:
    pk = "CAST(l_partkey AS VARCHAR)"
    h = " UNION ALL ".join(
        f"SELECT l_partkey, {r} AS row, {_h(pk, r, width)} AS bucket "
        f"FROM lineitem"
        for r in range(depth)
    )
    ph = " UNION ALL ".join(
        f"SELECT l_partkey, {r} AS row, {_h(pk, r, width)} AS bucket "
        f"FROM probes"
        for r in range(depth)
    )
    return f"""
    WITH h AS ({h}),
    cms AS (SELECT row, bucket, COUNT(*) AS cnt FROM h GROUP BY 1, 2),
    probes AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_partkey <= 20),
    ph AS ({ph}),
    est AS (
      SELECT ph.l_partkey, MIN(COALESCE(cnt, 0)) AS est
      FROM ph LEFT JOIN cms USING (row, bucket) GROUP BY 1
    ),
    tru AS (
      SELECT l_partkey, COUNT(*) AS true_cnt
      FROM lineitem WHERE l_partkey <= 20 GROUP BY 1
    )
    SELECT est.l_partkey AS l_partkey, est, true_cnt
    FROM est JOIN tru USING (l_partkey)
    """


@register(
    "cms_part_frequency",
    oracle=_cms_oracle(),
    survey_ids=["A4", "J5"],
    description="Count-min sketch (depth 3 x width 256) over lineitem "
    "part keys + min-estimator lookups vs true counts — sketch cells are "
    "bit-identical cross-engine",
)
def cms_part_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread ONLY the build input: the md5 base hash is CPU-bound and
    # the single-row-group test file otherwise runs it on one core
    # (no-op on real multi-split inputs — see load_table_spread); the
    # probe/truth branches are cheap scans that don't warrant the
    # repartition
    cms = SK.cms_build(
        load_table_spread(spark, sf_dir, "lineitem", columns=["l_partkey"]),
        "l_partkey", depth=3, width=256,
    )
    li = load_table(spark, sf_dir, "lineitem")
    # ONE cached probe-key collapse serves both branches: the probe set
    # is exactly the truth table's key column (groupBy keys are
    # distinct), so the separate distinct() scan was a second pass over
    # the same pushed-filter read
    tru = acquire_operator_cache(
        li.filter(F.col("l_partkey") <= 20)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    probes = tru.select("l_partkey")
    est = SK.cms_lookup(cms, probes, "l_partkey", depth=3, width=256)
    return est.join(tru, "l_partkey")


def _bloom_oracle(m_bits: int = 2048, k: int = 3) -> str:
    ok = "CAST(o_custkey AS VARCHAR)"
    ck = "CAST(c_custkey AS VARCHAR)"
    build = " UNION ALL ".join(
        f"SELECT {_h(ok, r, m_bits)} AS pos FROM orders" for r in range(k)
    )
    # c_custkey IS NOT NULL mirrors bloom_lookup's NULL-probe drop
    probe = " UNION ALL ".join(
        f"SELECT c_custkey, {_h(ck, r, m_bits)} AS pos FROM customer"
        " WHERE c_custkey IS NOT NULL"
        for r in range(k)
    )
    return f"""
    WITH pos AS ({build}),
    words AS (
      SELECT pos // 32 AS word, BIT_OR(1::BIGINT << (pos % 32)) AS bits
      FROM pos GROUP BY 1
    ),
    ph AS ({probe}),
    ph2 AS (
      SELECT c_custkey, pos // 32 AS word,
             (1::BIGINT << (pos % 32)) AS mask
      FROM ph
    ),
    hits AS (
      SELECT c_custkey,
             CAST(MIN(CASE WHEN (COALESCE(bits, 0) & mask) = mask
                           THEN 1 ELSE 0 END) AS BIGINT) AS hit
      FROM ph2 LEFT JOIN words USING (word) GROUP BY 1
    )
    SELECT h.c_custkey AS c_custkey, hit,
           CAST(CASE WHEN o.o_custkey IS NULL THEN 0 ELSE 1 END
                AS BIGINT) AS has_orders
    FROM hits h LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
      ON h.c_custkey = o.o_custkey
    """


@register(
    "bloom_filter_custkeys",
    oracle=_bloom_oracle(),
    survey_ids=["J3", "A4"],
    description="Bloom filter (2048 bits, 3 hashes) of ordering customers, "
    "probed with every customer vs ground truth — no false negatives by "
    "construction, false positives deterministic cross-engine",
)
def bloom_filter_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    bloom = SK.bloom_build(
        load_table_spread(spark, sf_dir, "orders", columns=["o_custkey"]),
        "o_custkey", m_bits=2048, n_hashes=3,
    )
    hits = SK.bloom_lookup(
        bloom, customer.select("c_custkey"), "c_custkey",
        m_bits=2048, n_hashes=3,
    )
    truth = orders.select("o_custkey").distinct()
    return (
        hits.join(truth, hits["c_custkey"] == truth["o_custkey"], "left")
        .select(
            "c_custkey",
            "hit",
            F.when(F.col("o_custkey").isNull(), 0)
            .otherwise(1)
            .cast("bigint")
            .alias("has_orders"),
        )
    )


@register(
    "zorder_layout_lineitem",
    oracle=f"""
    WITH z AS (
      SELECT {zorder2_sql("(l_partkey % 1024)", "(l_suppkey % 1024)", 10)}
               >> 14 AS zbucket,
             l_partkey % 1024 AS p, l_suppkey % 1024 AS s
      FROM lineitem
    )
    SELECT zbucket, COUNT(*) AS n,
           MIN(p) AS p_min, MAX(p) AS p_max,
           MIN(s) AS s_min, MAX(s) AS s_max
    FROM z GROUP BY zbucket
    """,
    survey_ids=["A4", "W3"],
    description="Z-order (Morton) layout audit: interleaved "
    "partkey/suppkey key, per-zbucket extent stats — the min/max ranges "
    "a footer-stats scan would prune on",
)
def zorder_layout_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    z = li.select(
        F.shiftright(
            zorder2(F.col("l_partkey") % 1024, F.col("l_suppkey") % 1024, 10),
            14,
        ).alias("zbucket"),
        (F.col("l_partkey") % 1024).alias("p"),
        (F.col("l_suppkey") % 1024).alias("s"),
    )
    return z.groupBy("zbucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("p").alias("p_min"),
        F.max("p").alias("p_max"),
        F.min("s").alias("s_min"),
        F.max("s").alias("s_max"),
    )


def _kmv_oracle(k: int = 256) -> str:
    from qudo_etl_pipeline_spark.functions.hashing import hash64_sql
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    # (k-1) * 2^60: both factors and the product are exactly
    # representable doubles, so the literal matches Spark's bit-for-bit.
    est = (
        f"CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE) "
        f"ELSE ({float(k - 1)!r} * 1152921504606846976.0) "
        f"/ CAST(MAX(h) AS DOUBLE) END"
    )
    return f"""
    WITH hs AS (
      SELECT DISTINCT {hash64_sql("CAST(o_custkey AS VARCHAR)")} AS h
      FROM orders WHERE o_custkey IS NOT NULL
    ), sk AS (
      SELECT h FROM hs ORDER BY h LIMIT {k}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(MAX(h) AS BIGINT) AS kth_hash,
           {ref_round_sql(est, 2)} AS est_distinct
    FROM sk
    """


@register(
    "kmv_distinct_custkeys",
    oracle=_kmv_oracle(256),
    survey_ids=["A7"],
    description="KMV (theta) distinct-count sketch of order custkeys: "
    "k=256 smallest md5-hashes + the (k-1)/U_(k) estimator — the "
    "sketch content itself is engine-independent, so the oracle "
    "hash-checks the sketch AND the estimate",
)
def kmv_distinct_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    sk = SK.kmv_build(load_table(spark, sf_dir, "orders"), "o_custkey", 256)
    est = SK.kmv_estimate(sk, 256)
    return est.select(
        "n_kept", "kth_hash", ref_round(F.col("est_distinct"), 2).alias(
            "est_distinct"
        )
    )


def _kmv_jaccard_oracle(k: int = 128) -> str:
    from qudo_etl_pipeline_spark.functions.hashing import hash64_sql
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    h = hash64_sql("CAST(user_id AS VARCHAR)")

    def sketch(etype: str) -> str:
        return f"""(
      SELECT h FROM (
        SELECT DISTINCT {h} AS h FROM events
        WHERE event_type = '{etype}' AND user_id IS NOT NULL
      ) ORDER BY h LIMIT {k}
    )"""

    return f"""
    WITH a AS {sketch("click")}, b AS {sketch("purchase")},
    both_ AS (SELECT h FROM a INTERSECT SELECT h FROM b),
    comb AS (
      SELECT DISTINCT h FROM (SELECT h FROM a UNION ALL SELECT h FROM b)
    ),
    ranked AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS r FROM comb),
    kp AS (SELECT LEAST({k}, COUNT(*)) AS kp FROM ranked),
    sel AS (
      SELECT CASE WHEN both_.h IS NOT NULL THEN 1 ELSE 0 END AS m, kp.kp
      FROM ranked CROSS JOIN kp LEFT JOIN both_ ON ranked.h = both_.h
      WHERE ranked.r <= kp.kp
    )
    SELECT CAST(MAX(kp) AS BIGINT) AS k_used,
           CAST(SUM(m) AS BIGINT) AS n_matches,
           {ref_round_sql(
               'CAST(SUM(m) AS DOUBLE) / CAST(MAX(kp) AS DOUBLE)', 6
           )} AS jaccard6
    FROM sel
    """


@register(
    "kmv_jaccard_event_users",
    oracle=_kmv_jaccard_oracle(128),
    survey_ids=["A7", "R6"],
    description="Set-similarity from sketches alone: Jaccard of "
    "click-users vs purchase-users estimated from two k=128 KMV "
    "sketches (Beyer et al.) — no full-set intersection is ever built",
)
def kmv_jaccard_event_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.catalog import load_events

    ev = load_events(spark, sf_dir)
    users = lambda t: ev.filter(F.col("event_type") == t)
    sk_a = SK.kmv_build(users("click"), "user_id", 128)
    sk_b = SK.kmv_build(users("purchase"), "user_id", 128)
    return SK.kmv_jaccard(sk_a, sk_b, 128)


def _hll_rho_sql(w: str, max_rho: int) -> str:
    """CASE chain mirroring sketches._rho_expr: lowest-set-bit exponent
    + 1 via exact integer compares (no float log anywhere)."""
    whens = " ".join(
        f"WHEN {1 << k} THEN {k + 1}" for k in range(max_rho - 1)
    )
    return f"CASE ({w} & -({w})) {whens} ELSE {max_rho} END"


def _hll_registers_oracle(p: int = 8) -> str:
    from qudo_etl_pipeline_spark.functions.hashing import hash64_sql

    m = 1 << p
    max_rho = 60 - p + 1
    h = hash64_sql("CAST(o_custkey AS VARCHAR)")
    return f"""
    WITH hs AS (
      SELECT {h} AS h FROM orders WHERE o_custkey IS NOT NULL
    ),
    hits AS (
      SELECT h % {m} AS bucket,
             MAX({_hll_rho_sql(f"(h // {m})", max_rho)}) AS rho
      FROM hs GROUP BY 1
    )
    SELECT g.bucket AS bucket,
           CAST(COALESCE(rho, 0) AS BIGINT) AS rho
    FROM (SELECT unnest(generate_series(0, {m - 1})) AS bucket) g
    LEFT JOIN hits ON g.bucket = hits.bucket
    ORDER BY bucket
    """


def _hll_estimate_oracle(p: int = 8) -> str:
    from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql

    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    regs = _hll_registers_oracle(p)
    raw = (
        f"{alpha * m * m * float(1 << 53)!r}"
        " / CAST(sum_fp AS DOUBLE)"
    )
    linear = f"{float(m)!r} * ln({float(m)!r} / CAST(n_zero AS DOUBLE))"
    est = (
        f"CASE WHEN ({raw}) <= {2.5 * m!r} AND n_zero > 0"
        f" THEN ({linear}) ELSE ({raw}) END"
    )
    return f"""
    WITH regs AS ({regs}),
    agg AS (
      SELECT CAST(SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero,
             CAST(SUM(1::BIGINT << CAST(53 - rho AS INT)) AS BIGINT)
               AS sum_fp
      FROM regs
    )
    SELECT n_zero, sum_fp, {ref_round_sql(est, 6)} AS est FROM agg
    """


@register(
    "hll_registers_custkeys",
    oracle=_hll_registers_oracle(),
    survey_ids=["A7"],
    description="HyperLogLog register vector (p=8) of order custkeys: "
    "bucket = low hash bits, register = max lowest-set-bit rank of the "
    "rest — all-integer construction, so the driver hash-checks the "
    "sketch CONTENT; merge = per-bucket max (property-tested)",
)
def hll_registers_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return SK.hll_build(orders, "o_custkey", p=8).orderBy("bucket")


@register(
    "hll_estimate_custkeys",
    oracle=_hll_estimate_oracle(),
    survey_ids=["A7"],
    description="HyperLogLog cardinality estimate from the register "
    "vector: exact integer fixed-point harmonic sum (sum of 2^(53-rho) "
    "as bigint shifts), linear-counting small-range correction",
)
def hll_estimate_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return SK.hll_estimate(SK.hll_build(orders, "o_custkey", p=8), p=8)


_HH_KEY = (
    "CASE WHEN event_id % 3 <> 0 THEN user_id % 7 "
    "ELSE 1000000 + event_id END"
)


@register(
    "heavy_hitters_planted",
    oracle=f"""
    WITH keyed AS (
      SELECT {_HH_KEY} AS hh_key FROM events
    ),
    tot AS (SELECT COUNT(*) AS n_total FROM keyed),
    cnts AS (SELECT hh_key, COUNT(*) AS cnt FROM keyed
             WHERE hh_key IS NOT NULL GROUP BY 1)
    SELECT hh_key, cnt, n_total FROM cnts CROSS JOIN tot
    WHERE cnt * 100 >= 1 * n_total
    ORDER BY hh_key
    """,
    survey_ids=["A4", "A10"],
    description="Exact 1%-heavy hitters over a planted skewed key (7 hot "
    "keys holding 2/3 of the mass + a unique-key tail): per-partition "
    "Misra-Gries candidate summaries (Arrow mapInPandas, mergeable-"
    "summary compression) + exact broadcast-semi-join recount — the raw "
    "key space is never shuffled; threshold kept in integer arithmetic",
)
def heavy_hitters_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qudo_etl_pipeline_spark.catalog import load_events

    ev = load_events(spark, sf_dir).select(
        F.expr(_HH_KEY).alias("hh_key")
    )
    out = SK.heavy_hitters(ev, "hh_key", phi_num=1, phi_den=100)
    return out.orderBy("hh_key")
