"""Unit tests for the one-shuffle table profiler
(operators/profile.py)."""

from __future__ import annotations

import pytest

from qudo_etl_pipeline_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def mixed(spark):
    rows = [
        (1, "a", None),
        (2, "b", 1.5),
        (2, "a", 2.5),
        (None, "a", 2.5),
    ]
    return spark.createDataFrame(rows, "id: long, s: string, x: double")


def test_profile_stats(spark, mixed):
    out = {r["col_name"]: r for r in profile_table(mixed).collect()}
    assert set(out) == {"id", "s", "x"}

    r = out["id"]
    assert (r["n_rows"], r["n_nulls"], r["n_distinct"]) == (4, 1, 2)
    assert (r["min_value"], r["max_value"]) == ("1", "2")
    assert (r["top_value"], r["top_count"]) == ("2", 2)
    assert (r["min_num"], r["max_num"]) == (1.0, 2.0)

    r = out["s"]
    assert (r["n_nulls"], r["n_distinct"]) == (0, 2)
    assert (r["top_value"], r["top_count"]) == ("a", 3)
    assert r["min_num"] is None and r["max_num"] is None  # not castable

    r = out["x"]
    assert (r["n_nulls"], r["n_distinct"]) == (1, 2)
    assert (r["min_num"], r["max_num"]) == (1.5, 2.5)


def test_mode_tie_breaks_ascending(spark):
    df = spark.createDataFrame(
        [("b",), ("a",), ("c",), ("a",), ("b",)], "v: string"
    )
    r = profile_table(df).collect()[0]
    assert r["top_value"] == "a" and r["top_count"] == 2


def test_column_subset_and_validation(spark, mixed):
    out = profile_table(mixed, ["s"]).collect()
    assert len(out) == 1 and out[0]["col_name"] == "s"
    with pytest.raises(ValueError, match="nope"):
        profile_table(mixed, ["nope"])


def test_single_shuffle_plan(spark, mixed):
    plan = (
        profile_table(mixed)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ExistingRDD") == 1  # one pass over the input
    assert "partial_count" in plan  # map-side combine on the cell table
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_benford_digit_extraction_and_shares(spark):
    import math

    from qudo_etl_pipeline_spark.operators.profile import benford_profile

    # crafted values incl. <1 magnitudes, negatives, zeros, nulls
    vals = [123.0, 0.042, -950.0, 1000.0, 2.5, 0.0, None, 0.19, 31.0,
            700.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {r["digit"]: r for r in benford_profile(df, "x").collect()}
    # leading digits: 1,4,9,1,2,_,_,1,3,7 -> {1:3, 2:1, 3:1, 4:1, 7:1, 9:1}
    assert {d: r["n"] for d, r in out.items()} == {
        1: 3, 2: 1, 3: 1, 4: 1, 7: 1, 9: 1,
    }
    assert all(r["n_total"] == 8 for r in out.values())
    for d, r in out.items():
        assert abs(r["benford_p6"] - round(math.log10(1 + 1 / d), 6)) < 1e-9
        assert abs(r["observed_p6"] - round(r["n"] / 8, 6)) < 1e-6


def test_benford_subprecision_values_dropped(spark):
    """|x| < 5e-11 formats to an all-zero string at 10 decimals: such
    rows survive the x != 0 filter but carry no leading digit — they
    must be dropped, not emitted as a NULL-digit row with NULL shares."""
    from qudo_etl_pipeline_spark.operators.profile import benford_profile

    vals = [1e-12, -4.9e-11, 123.0, 2.5, 0.19]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = benford_profile(df, "x").collect()
    assert {r["digit"]: r["n"] for r in out} == {1: 2, 2: 1}
    # and the degenerate rows are excluded from the denominator too
    assert all(r["n_total"] == 3 for r in out)
