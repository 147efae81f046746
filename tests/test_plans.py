"""Plan-layer tests: melt escaping, skew salting equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.plans.melt import melt
from qudo_etl_pipeline_spark.plans.skew import salted_aggregate, salted_join


def test_melt_escapes_hostile_column_names(spark):
    df = spark.createDataFrame(
        [(1, "a", "b"), (2, "c", "d")], ["id", "w`eird", "q'uo\\te"]
    )
    rows = sorted(
        (r["variable"], r["value"]) for r in melt(df, id_vars=["id"]).collect()
    )
    assert rows == [
        ("q'uo\\te", "b"),
        ("q'uo\\te", "d"),
        ("w`eird", "a"),
        ("w`eird", "c"),
    ]


def _skewed(spark):
    # hot key 'h' carries 90% of rows
    rows = [(("h" if i % 10 else f"k{i}"), i, float(i % 7)) for i in range(200)]
    return spark.createDataFrame(rows, "key string, v long, w double")


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("h", 1.0), ("k10", 2.0), ("k20", 3.0)], "key string, dim double"
    )
    plain = {tuple(r) for r in big.join(small, ["key"]).collect()}
    salted = {tuple(r) for r in salted_join(big, small, ["key"], n_salts=4).collect()}
    assert salted == plain and len(plain) > 0

    plain_left = {tuple(r) for r in big.join(small, ["key"], "left").collect()}
    salted_left = {
        tuple(r)
        for r in salted_join(big, small, ["key"], n_salts=4, how="left").collect()
    }
    assert salted_left == plain_left


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r["key"]: (r["total"], r["n"], r["lo"], r["hi"])
        for r in df.groupBy("key")
        .agg(
            F.sum("w").alias("total"),
            F.count("v").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    salted = {
        r["key"]: (r["total"], r["n"], r["lo"], r["hi"])
        for r in salted_aggregate(
            df,
            ["key"],
            {
                "total": ("w", "sum"),
                "n": ("v", "count"),
                "lo": ("v", "min"),
                "hi": ("v", "max"),
            },
            n_salts=4,
        ).collect()
    }
    assert salted == plain
