"""Structural contracts of the inline-salted NULL-parity gate queries
(catalog/salted_q.py). Engine-vs-oracle VALUE parity is owned by the
selfcheck/driver gate; these tests pin the properties that make each
query a real probe of its NULL class — above all that the inline salt
actually produces NULLs and that the NULL-bearing groups/metrics
survive into the output on the Spark side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.catalog import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def specs():
    return registry()


def test_salt_probe_rate(spark):
    """The md5 hex-prefix probe NULLs ~1/16 of cells (seeded, not 0%)."""
    from qudo_etl_pipeline_spark.catalog.salted_q import _salt

    n, n_null = (
        spark.range(100_000)
        .select(_salt(F.col("id"), F.col("id"), "rate:v1").alias("s"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("s").isNull().cast("bigint")).alias("k"),
        )
        .first()
    )
    assert abs(n_null / n - 1 / 16) < 0.01


def test_rank_orders_nulls_rank_last(spark, specs):
    """Class 1: within each priority, every NULL price ranks after
    every non-NULL price (DESC NULLS LAST pinned)."""
    out = specs["salted_rank_orders"].spark(spark, SF).collect()
    assert any(r.price_s is None for r in out)
    by_prio: dict[str, list] = {}
    for r in out:
        by_prio.setdefault(r.o_orderpriority, []).append(r)
    for rows in by_prio.values():
        null_ranks = [r.rnk for r in rows if r.price_s is None]
        real_ranks = [r.rnk for r in rows if r.price_s is not None]
        if null_ranks and real_ranks:
            assert min(null_ranks) > max(real_ranks)


def test_group_join_back_keeps_null_group(spark, specs):
    """Class 2: the NULL-nationkey group survives the eqNullSafe
    join-back — its rows carry the NULL group's own stats."""
    from qudo_etl_pipeline_spark.catalog import load_table
    from qudo_etl_pipeline_spark.catalog.salted_q import _salt

    out = specs["salted_group_join_back"].spark(spark, SF)
    # the class-2 failure mode is silent row LOSS: a null-unsafe join
    # would drop every NULL-nk customer. Output rows must equal the
    # %37-filtered input exactly — salted rows included.
    cust = load_table(spark, SF, "customer").select(
        "c_custkey",
        _salt("c_nationkey", "c_custkey", "salt:c_nationkey").alias("nk"),
    )
    n_expected = cust.filter(F.col("c_custkey") % 37 == 0).count()
    n_salted = cust.filter(F.col("nk").isNull()).count()
    assert n_salted > 0  # the probe actually fired on this table
    assert out.count() == n_expected
    for r in out.filter(F.col("nk").isNull()).collect():
        assert r.grp_cnt >= 1 and r.grp_avg_bal is not None


def test_agg_null_skip_arithmetic(spark, specs):
    """Class 3: COUNT(*) = COUNT(col) + null count, and the zero-fill
    SUM never exceeds... equals the null-skipping SUM (zeros added)."""
    out = specs["salted_agg_null_skip"].spark(spark, SF).collect()
    assert out and any(r.n_null_qty > 0 for r in out)
    for r in out:
        assert r.n_rows == r.n_qty + r.n_null_qty
        assert r.n_status <= 2  # linestatus domain, NULL never counted


def test_events_hourly_excludes_null_ts(spark, specs):
    """Class 4: total windowed events = events with a non-NULL salted
    ts (the excluded rows are exactly the NULL-ts ones)."""
    from qudo_etl_pipeline_spark.catalog import load_events
    from qudo_etl_pipeline_spark.catalog.salted_q import _salt

    out = specs["salted_events_hourly"].spark(spark, SF)
    windowed = out.agg(F.sum("n_events")).first()[0]
    expected = (
        load_events(spark, SF)
        .select(_salt("ts", "event_id", "salt:ts").alias("ts_s"))
        .filter(F.col("ts_s").isNotNull())
        .count()
    )
    assert windowed == expected


def test_join_profile_measures_nulls(spark, specs):
    """Class 5: null_keys_left is nonzero by construction."""
    rows = {
        r.metric: r.n
        for r in specs["salted_join_profile"].spark(spark, SF).collect()
    }
    assert rows["null_keys_left"] > 0
    assert rows["null_keys_right"] == 0
    # rows_left decomposes into matched + null-key + left-only-key rows
    assert (
        rows["rows_left"]
        >= rows["rows_left_matched"] + rows["null_keys_left"]
    )


def test_weighted_median_null_group(spark, specs):
    """Class 6: the salted group key yields a 4th (NULL) group with its
    own median through the prefix device."""
    out = specs["salted_weighted_median"].spark(spark, SF).collect()
    groups = {r.l_returnflag for r in out}
    assert None in groups
    assert len(groups) == 4
    null_row = next(r for r in out if r.l_returnflag is None)
    assert null_row.wq_value is not None and null_row.n > 0
