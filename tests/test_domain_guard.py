"""Enforcement tests for the bounded-domain contract on the
cell-frame statistics (kendall_tau_b / spearman_rho /
mutual_information) and kaplan_meier's duration frame.

The contract used to be documentation-only ("bin continuous measures
first"); these tests pin the plan-side ``_domain_gate``: an oversized
domain must FAIL LOUDLY (assert_true fires before the expensive stage)
or, where ``on_excess='bin'`` is supported, auto-discretize via the
equi-width device and still recover the planted association.
"""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.operators.analytics import (
    kaplan_meier,
    kendall_tau_b,
    mutual_information,
    spearman_rho,
)


def _continuous_pair(spark, n=500):
    # n distinct values in both columns, monotone association
    return spark.range(n).select(
        (F.col("id").cast("double") + 0.25).alias("x"),
        (F.col("id").cast("double") * 3.0 + 0.5).alias("y"),
    )


def test_kendall_oversized_domain_raises(spark):
    df = _continuous_pair(spark)
    with pytest.raises(Exception, match="kendall_tau_b.*max_domain"):
        kendall_tau_b(df, "x", "y", max_domain=100).collect()


def test_kendall_bin_mode_recovers_monotone_association(spark):
    df = _continuous_pair(spark)
    r = kendall_tau_b(df, "x", "y", max_domain=50, on_excess="bin")
    row = r.collect()[0]
    # equi-width binning of a strictly monotone pair is perfectly
    # concordant across bins (ties within bins are tie-corrected away)
    assert row["n"] == 500
    assert row["disc"] == 0
    assert row["tau_b6"] == pytest.approx(1.0, abs=1e-9)


def test_spearman_oversized_domain_raises(spark):
    df = _continuous_pair(spark)
    with pytest.raises(Exception, match="spearman_rho.*max_domain"):
        spearman_rho(df, "x", "y", max_domain=100).collect()


def test_spearman_bin_mode_recovers_monotone_association(spark):
    df = _continuous_pair(spark)
    row = spearman_rho(
        df, "x", "y", max_domain=50, on_excess="bin"
    ).collect()[0]
    assert row["n"] == 500
    assert row["rho6"] == pytest.approx(1.0, abs=1e-9)


def test_bin_mode_rejects_unknown_policy(spark):
    df = _continuous_pair(spark, n=10)
    with pytest.raises(ValueError, match="on_excess"):
        kendall_tau_b(df, "x", "y", on_excess="subsample")
    with pytest.raises(ValueError, match="on_excess"):
        spearman_rho(df, "x", "y", on_excess="subsample")


def test_bin_mode_excludes_null_rows(spark):
    # Regression: greatest/least skip NULLs, so an un-guarded bucket
    # expression mapped NULL values to bucket bins-1 and they survived
    # the post-bin isNotNull exclusion as phantom top-bucket rows
    # (tau_b 1.0 -> 0.795 on this exact fixture). The NULL-preserving
    # bucket must make binned-with-NULLs == binned-on-NULL-free-subset.
    clean = _continuous_pair(spark, n=20)
    # NULL-x rows carry y values INSIDE the clean y range, so the
    # broadcast min/max (computed pre-filter) is identical for both
    # frames and any difference is attributable to the NULL handling.
    with_nulls = clean.unionByName(
        spark.range(10).select(
            F.lit(None).cast("double").alias("x"),
            (F.col("id").cast("double") * 3.0 + 2.0).alias("y"),
        )
    )
    for fn in (kendall_tau_b, spearman_rho):
        got = fn(
            with_nulls, "x", "y", max_domain=10, on_excess="bin"
        ).collect()[0]
        want = fn(
            clean, "x", "y", max_domain=10, on_excess="bin"
        ).collect()[0]
        assert got["n"] == want["n"] == 20
        assert got == want


def test_bin_mode_degenerate_constant_column(spark):
    # constant x -> width 0 -> single bucket, rho/tau NULL (denominator 0)
    df = spark.range(100).select(
        F.lit(7.0).alias("x"), F.col("id").cast("double").alias("y")
    )
    row = kendall_tau_b(
        df, "x", "y", max_domain=10, on_excess="bin"
    ).collect()[0]
    assert row["n"] == 100 and row["tau_b6"] is None
    row = spearman_rho(
        df, "x", "y", max_domain=10, on_excess="bin"
    ).collect()[0]
    assert row["n"] == 100 and row["rho6"] is None


def test_mutual_information_oversized_domain_raises(spark):
    df = _continuous_pair(spark)
    with pytest.raises(
        Exception, match="mutual_information.*max_domain"
    ):
        mutual_information(df, "x", "y", max_domain=100).collect()


def test_mutual_information_small_domain_unchanged(spark):
    # the gate must be invisible for in-contract domains
    df = spark.range(400).select(
        (F.col("id") % 4).alias("a"), (F.col("id") % 2).alias("b")
    )
    row = mutual_information(df, "a", "b").collect()[0]
    # a determines b here only partially: a%2 == b exactly -> H(b) bits
    assert row["n"] == 400
    assert row["nmi6"] is not None


def test_kaplan_meier_oversized_duration_domain_raises(spark):
    df = spark.range(5000).select(
        F.col("id").alias("dur"), F.lit(1).alias("ev")
    )
    with pytest.raises(Exception, match="kaplan_meier.*max_domain"):
        kaplan_meier(df, "dur", "ev", max_domain=1000).collect()


def test_kaplan_meier_in_contract_unchanged(spark):
    df = spark.range(5000).select(
        (F.col("id") % 50).alias("dur"), F.lit(1).alias("ev")
    )
    out = kaplan_meier(df, "dur", "ev", max_domain=1000)
    assert out.count() == 50


def test_gate_passes_on_empty_input(spark):
    empty = _continuous_pair(spark).filter(F.lit(False))
    assert kendall_tau_b(empty, "x", "y").count() == 0
    assert spearman_rho(empty, "x", "y").count() == 0
    assert mutual_information(empty, "x", "y").count() == 0


def test_weighted_quantile_rejects_negative_weights(spark):
    from qudo_etl_pipeline_spark.operators.analytics import (
        weighted_quantile,
    )

    df = spark.range(100).select(
        F.lit("g").alias("g"),
        F.col("id").cast("double").alias("v"),
        F.when(F.col("id") == 50, F.lit(-1.0))
        .otherwise(F.lit(1.0))
        .alias("w"),
    )
    with pytest.raises(Exception, match="negative weight"):
        weighted_quantile(df, ["g"], "v", "w").collect()
    # non-negative weights (incl. zeros) still pass
    ok = df.withColumn("w", F.abs(F.col("w")) - F.lit(1.0))
    assert weighted_quantile(ok, ["g"], "v", "w").count() == 1
