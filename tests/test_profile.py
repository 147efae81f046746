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
