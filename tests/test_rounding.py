"""Reference-parity rounding: ref_round == Python round == ref_round_sql.

The reference rounds every user-visible number with Python's built-in
``round`` (chisquared_tester.py:473,764,769,918,969,1527,1547,1553) —
half-even on the TRUE binary value of the double. Neither F.round
(HALF_UP) nor F.bround (HALF_EVEN on the shortest decimal repr) matches:

- 2/16 = 0.125 (exact binary midpoint): Python 0.12, F.round 0.13;
- 3/40 = 0.075 (binary 0.074999…972): Python 0.07, F.bround 0.08.

These tests pin both failure classes plus a dense rational sweep, on the
Spark column implementation AND the DuckDB SQL emitter the oracles use.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.functions.rounding import (
    ref_round,
    ref_round_expr,
    ref_round_sql,
)

# Exact-binary midpoints (denominator a power of two) — bround-agreeing
# class — and shortest-repr pseudo-midpoints (denominators 40, 200) where
# bround/round_even diverge from Python.
ADVERSARIAL = (
    [a / 8 for a in range(-16, 17)]
    + [a / 16 for a in range(-32, 33)]
    + [a / 40 for a in range(-80, 81)]
    + [a / 200 for a in range(-400, 401)]
    + [0.125, -0.125, 0.075, -0.075, 0.975, -0.975, 2.675, 0.005, 0.015]
)


def _rationals(seed: int = 3, n_random: int = 300) -> list[float]:
    vals = set(ADVERSARIAL)
    for b in range(1, 130):
        for a in range(0, b + 1):
            vals.add(a / b)
            vals.add(-(a / b))
            vals.add(a / b * 100)
    rng = random.Random(seed)
    for _ in range(n_random):
        vals.add(rng.uniform(-3000, 3000))
    return sorted(vals)


SCALES = [0, 2, 3, 5]


def test_ref_round_matches_python_round(spark):
    vals = _rationals()
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = df.select(
        "x",
        *[ref_round(F.col("x"), s).alias(f"r{s}") for s in SCALES],
        *[ref_round_expr("x", s).alias(f"e{s}") for s in SCALES],
    ).collect()
    assert len(rows) == len(vals)
    for r in rows:
        for s in SCALES:
            assert r[f"r{s}"] == round(r["x"], s), (r["x"], s)
            assert r[f"e{s}"] == round(r["x"], s), (r["x"], s, "expr")


def test_ref_round_near_bigint_overflow(spark):
    # ADVICE r3: scale-5 rounding of x in ~[9.2e13, 1e15) used to push
    # x*10^5 past 2^63 and throw ARITHMETIC_OVERFLOW under ANSI mode.
    # The passthrough guard now scales with the rounding scale
    # (min(1e15, 2^62/10^scale)), where passthrough is provably the
    # identity: ulp(x) >= 1024/10^scale, so Python round(x, scale) == x.
    vals = [
        9.2e13, 9.3e13, -9.3e13, 9.3e13 + 1 / 3, 4.6e13, 4.7e13,
        2.0**62 / 1e5, 1e14, 9.9e14, 1.1e13 + 0.123456,
        # the [1e15, 2^53) band at scale 0: fractional doubles the old
        # 1e15 blanket guard passed through unrounded
        1e15 + 0.5, 1e15 + 0.25, 2.0**53 - 1.5, 4.5e15 + 1 / 3,
        2.0**53, 2.0**53 + 2.0,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = df.select(
        "x",
        *[ref_round(F.col("x"), s).alias(f"r{s}") for s in SCALES],
        *[ref_round_expr("x", s).alias(f"e{s}") for s in SCALES],
    ).collect()
    for r in rows:
        for s in SCALES:
            assert r[f"r{s}"] == round(r["x"], s), (r["x"], s)
            assert r[f"e{s}"] == round(r["x"], s), (r["x"], s, "expr")


def test_ref_round_sql_matches_python_round():
    vals = _rationals() + [9.2e13, 9.3e13, -9.3e13, 4.7e13, 1e14]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    cols = ", ".join(ref_round_sql("x", s) for s in SCALES)
    for row in con.sql(f"SELECT x, {cols} FROM t").fetchall():
        x, rest = row[0], row[1:]
        for s, got in zip(SCALES, rest):
            assert got == round(x, s), (x, s)


def test_ref_round_passthrough_specials(spark):
    df = spark.createDataFrame(
        [(None,), (float("nan"),), (float("inf"),), (-float("inf"),), (1e18,)],
        "x double",
    )
    got = [r["r"] for r in df.select(ref_round("x", 2).alias("r")).collect()]
    assert got[0] is None
    assert math.isnan(got[1])
    assert got[2] == float("inf") and got[3] == -float("inf")
    assert got[4] == 1e18


def test_ref_round_rejects_unvalidated_scale():
    with pytest.raises(ValueError):
        ref_round(F.lit(1.0), 9)
    with pytest.raises(ValueError):
        ref_round_sql("x", -1)
