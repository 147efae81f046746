"""Unit tests for the declarative data-quality suite
(operators/checks.py): metric values, pass gates, null handling,
FK coverage, the approx-distinct switch, and declaration errors."""

from __future__ import annotations

import pytest

from qudo_etl_pipeline_spark.operators.checks import Check, check_suite


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        (1, "a@x.com", "US", 10.0),
        (2, "b@x.com", "US", 20.0),
        (3, None, "DE", 30.0),
        (4, "d@x", "FR", 40.0),
        (4, "e@x.com", "XX", None),
    ]
    return spark.createDataFrame(
        rows, "id: long, email: string, country: string, amount: double"
    )


@pytest.fixture(scope="module")
def countries(spark):
    return spark.createDataFrame(
        [("US",), ("DE",), ("FR",)], "code: string"
    )


def _by_name(df):
    return {r["check_name"]: r for r in df.collect()}


def test_metrics_and_gates(spark, table, countries):
    checks = [
        Check("email_complete", "completeness", "email", 0.9),
        Check("id_unique", "uniqueness", "id", 1.0),
        Check("amount_min", "min_value", "amount", 0.0),
        Check("amount_max", "max_value", "amount", 35.0),
        Check("amount_mean", "mean_min", "amount", 20.0),
        Check("email_format", "pattern", "email", 1.0, pattern="^[^@]+@[^@]+\\.[^@]+$"),
        Check("country_domain", "isin", "country", 0.8, values=("US", "DE", "FR")),
        Check("country_fk", "fk_coverage", "country", 1.0, ref="countries"),
    ]
    out = _by_name(
        check_suite(table, checks, refs={"countries": countries})
    )
    assert len(out) == len(checks)
    assert out["email_complete"]["metric"] == 0.8  # 4/5 non-null
    assert out["email_complete"]["passed"] == 0
    assert out["id_unique"]["metric"] == 0.8  # 4 distinct / 5 rows
    assert out["id_unique"]["passed"] == 0
    assert out["amount_min"]["metric"] == 10.0
    assert out["amount_min"]["passed"] == 1
    assert out["amount_max"]["metric"] == 40.0
    assert out["amount_max"]["passed"] == 0  # 40 > 35 cap
    assert out["amount_mean"]["metric"] == 25.0  # mean over non-null
    assert out["amount_mean"]["passed"] == 1
    # pattern/isin fractions are over NON-NULL values only
    assert out["email_format"]["metric"] == 0.75  # 3 of 4 non-null match
    assert out["country_domain"]["metric"] == 0.8  # XX out of domain
    assert out["country_domain"]["passed"] == 1
    # fk: XX missing from the ref -> 4/5 coverage, gate 1.0 fails
    assert out["country_fk"]["metric"] == 0.8
    assert out["country_fk"]["passed"] == 0
    # schema contract for the driver/publish gate
    assert check_suite(table, checks[:1]).columns == [
        "check_name",
        "col_name",
        "metric",
        "threshold",
        "passed",
    ]


def test_approx_distinct_switch(spark, table):
    out = _by_name(
        check_suite(
            table,
            [Check("id_unique", "uniqueness", "id", 0.5)],
            approx_distinct=True,
        )
    )
    # HLL on 4 distinct values is exact at this cardinality
    assert out["id_unique"]["metric"] == 0.8
    assert out["id_unique"]["passed"] == 1


def test_declaration_errors(spark, table):
    with pytest.raises(ValueError, match="unknown check kind"):
        Check("x", "median_value", "amount", 1.0)
    with pytest.raises(ValueError, match="unique"):
        check_suite(
            table,
            [
                Check("dup", "completeness", "email", 1.0),
                Check("dup", "completeness", "country", 1.0),
            ],
        )
    with pytest.raises(ValueError, match="refs"):
        check_suite(
            table, [Check("fk", "fk_coverage", "country", 1.0, ref="nope")]
        )


def test_one_aggregation_pass(spark, table, countries):
    """The compiled plan has exactly one aggregate chain (plus the
    Expand that exact count-distinct costs) and one broadcast join —
    no per-check scans."""
    checks = [
        Check("email_complete", "completeness", "email", 0.9),
        Check("id_unique", "uniqueness", "id", 1.0),
        Check("country_fk", "fk_coverage", "country", 1.0, ref="countries"),
    ]
    plan = (
        check_suite(table, checks, refs={"countries": countries})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one scan of the checked table per plan, not one per check
    assert plan.count("Scan ExistingRDD[id") == 1
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_table_diff_statuses_and_nullsafe_compare(spark):
    from qudo_etl_pipeline_spark.operators.checks import table_diff

    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, None, 40.0)],
        "k bigint, s string, v double",
    )
    right = spark.createDataFrame(
        [
            (1, "a", 10.0),      # unchanged
            (2, "b", None),      # unchanged (NULL == NULL)
            (3, "c", 31.0),      # changed: v
            (5, "e", 50.0),      # added
        ],                        # key 4 removed
        "k bigint, s string, v double",
    )
    out = {
        r["metric"]: r["n"]
        for r in table_diff(left, right, ["k"]).collect()
    }
    assert out == {
        "added": 1,
        "removed": 1,
        "changed": 1,
        "unchanged": 2,
        "dup_keys:left": 0,
        "dup_keys:right": 0,
        "null_keys:left": 0,
        "null_keys:right": 0,
        "changed:s": 0,
        "changed:v": 1,
    }
    # NULL vs value IS a change
    l2 = spark.createDataFrame([(1, None)], "k bigint, v double")
    r2 = spark.createDataFrame([(1, 9.0)], "k bigint, v double")
    out2 = {
        r["metric"]: r["n"] for r in table_diff(l2, r2, ["k"]).collect()
    }
    assert out2["changed"] == 1 and out2["changed:v"] == 1
    # empty-vs-empty: all zero counts, full metric set
    e = spark.createDataFrame([], "k bigint, v double")
    out3 = {r["metric"]: r["n"] for r in table_diff(e, e, ["k"]).collect()}
    assert out3 == {"added": 0, "removed": 0, "changed": 0,
                    "unchanged": 0, "dup_keys:left": 0,
                    "dup_keys:right": 0, "null_keys:left": 0,
                    "null_keys:right": 0, "changed:v": 0}


def test_table_diff_duplicate_keys_stay_key_level(spark):
    """Duplicate keys must NOT fan out the join: counts stay at key
    level (added+removed+changed+unchanged == distinct key count) and
    the duplication itself is surfaced as dup_keys metrics."""
    from qudo_etl_pipeline_spark.operators.checks import table_diff

    left = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k bigint, v double"
    )
    right = spark.createDataFrame(
        [(1, 10.0), (1, 10.0), (2, 21.0), (2, 21.0), (2, 21.0),
         (4, 40.0)],
        "k bigint, v double",
    )
    out = {
        r["metric"]: r["n"] for r in table_diff(left, right, ["k"]).collect()
    }
    assert out["added"] == 1            # key 4, counted ONCE
    assert out["removed"] == 1          # key 3
    assert out["changed"] == 1          # key 2 (representative differs)
    assert out["unchanged"] == 1        # key 1 (duplicates identical)
    assert out["added"] + out["removed"] + out["changed"] + out["unchanged"] == 4
    assert out["dup_keys:left"] == 0
    assert out["dup_keys:right"] == 2   # keys 1 and 2 duplicated


def test_table_diff_composite_key_null_components(spark):
    """A composite key whose secondary component is NULL must pair
    null-safely (one 'unchanged'/'changed' verdict), never double-count
    as removed+added, and must surface in the null_keys metrics."""
    from qudo_etl_pipeline_spark.operators.checks import table_diff

    left = spark.createDataFrame(
        [(1, "x", 10.0), (2, None, 20.0), (3, "z", 30.0)],
        "k1 bigint, k2 string, v double",
    )
    right = spark.createDataFrame(
        [(1, "x", 10.0), (2, None, 25.0), (3, "z", 30.0)],
        "k1 bigint, k2 string, v double",
    )
    out = {
        r["metric"]: r["n"]
        for r in table_diff(left, right, ["k1", "k2"]).collect()
    }
    assert out["added"] == 0 and out["removed"] == 0
    assert out["changed"] == 1          # the (2, NULL) key, paired
    assert out["unchanged"] == 2
    assert out["null_keys:left"] == 1 and out["null_keys:right"] == 1


def test_join_profile_fanout_orphans_and_nulls(spark):
    from qudo_etl_pipeline_spark.operators.checks import join_profile

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (None, "x"), (None, "y")],
        "k bigint, v string",
    )
    right = spark.createDataFrame(
        [(1, "p"), (2, "q"), (2, "r"), (2, "s"), (4, "t"), (None, "z")],
        "k bigint, v string",
    )
    out = {
        r["metric"]: r["n"]
        for r in join_profile(left, right, "k", "k").collect()
    }
    assert out == {
        "keys_left": 3,            # 1, 2, 3 (nulls not keys)
        "keys_right": 3,           # 1, 2, 4
        "keys_matched": 2,         # 1, 2
        "keys_left_only": 1,       # 3
        "keys_right_only": 1,      # 4
        "joined_rows": 2 * 1 + 1 * 3,   # exact inner-join prediction
        "max_left_rows_per_key": 2,
        "max_right_rows_per_key": 3,
        "null_keys_left": 2,       # rows an inner join silently drops
        "null_keys_right": 1,
        "rows_left": 6,            # side totals incl. null-key rows
        "rows_right": 6,
        "rows_left_matched": 3,    # rows on matched keys (1, 2)
        "rows_right_matched": 4,
    }
    # prediction check: the actual inner join yields exactly that many
    actual = left.filter("k IS NOT NULL").join(
        right.filter("k IS NOT NULL"), "k"
    ).count()
    assert actual == out["joined_rows"]
    # empty sides: all-zero profile, no NULLs
    e = spark.createDataFrame([], "k bigint, v string")
    out2 = {
        r["metric"]: r["n"] for r in join_profile(e, e, "k", "k").collect()
    }
    assert set(out2.values()) == {0} and len(out2) == 14
