"""Reference-parity decimal rounding (Python ``round`` semantics).

Every user-visible rounded number in the reference is produced by Python's
built-in ``round`` (reference: src/kraken/app/inference/chisquared_tester.py
:473, :757, :764, :769, :918, :969, :1527, :1535, :1547, :1553), which
rounds the **true binary value** of the double to the nearest n-digit
decimal, ties (exact binary midpoints) to even.

Spark's ``F.round`` is HALF_UP and ``F.bround`` is HALF_EVEN — but both
round the *shortest decimal representation* of the double
(``BigDecimal.valueOf``), not its true binary value. The two semantics
disagree on two classes of input:

- exact binary midpoints, e.g. ``2/16 = 0.125`` → Python/bround 0.12,
  F.round 0.13 (the round-2 failing property test);
- values whose shortest repr *looks* like a midpoint but whose binary
  value is off it, e.g. ``3/40 = 0.075`` (binary 0.074999…972) →
  Python 0.07, but bround sees "0.075" and gives 0.08.

:func:`ref_round` reproduces Python ``round`` exactly in pure JVM column
arithmetic: an error-free Dekker/Veltkamp two-product splits ``x * 10^n``
into ``p + err`` (both doubles, sum exact), and the round-half-even
decision is taken on ``(frac(p) - 0.5) + err`` — the sign of which is the
sign of the true distance from the midpoint. No UDF, no Python crossing,
whole-stage-codegen friendly.

:func:`ref_round_sql` emits the equivalent DuckDB SQL for oracle queries:
DuckDB's ``printf('%.20f', x)`` is correctly rounded against the true
binary value (unlike Java's zero-padding ``format``), and 20 fractional
digits is provably enough — the nearest non-representable double to any
n<=5-digit midpoint is ~1e-17 away, far above the 5e-21 quantization of
the printf. (DuckDB's own ``round_even`` silently casts DECIMAL to DOUBLE
and then uses shortest-repr semantics, so it cannot be used.)

Both implementations pass through NULL / NaN / ±Inf and
|x| >= 2^53 / 10^scale unchanged — above that bound
Python ``round(x, scale)`` is provably the identity (see
:func:`_passthrough_bound`), and below it the integer arithmetic is
exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Veltkamp splitter for IEEE doubles: 2^27 + 1.
_SPLIT = 134217729.0


def _passthrough_bound(scale: int) -> float:
    """Magnitude above which rounding is the identity AND must bypass the
    integer floor arithmetic. The two-sided proof (scale-aware, fixes the
    round-3 ADVICE overflow at 9.3e13/scale 5 AND a silent 1-ulp
    reconstruction error for x*10^scale in [2^53, 2^63)):

    - BELOW the bound the Dekker path is exact: p = fl(x*10^s) < 2^53, so
      k = floor(p) and k2 are exactly representable doubles and the final
      k2/10^s division is correctly rounded — the same real number Python
      rounds (validated by tests/test_rounding.py incl. the near-2^53
      band).
    - AT/ABOVE the bound passthrough is exact: 2^e > x/2 >= 2^52/10^s
      gives ulp(x) = 2^(e-52) > 10^-s, so the correctly-rounded s-digit
      decimal of x lies within 0.5*10^-s < ulp(x)/2 of x and its nearest
      double is x itself — Python round(x, s) == x.
    """
    return 2.0**53 / 10**scale


def ref_round(col: Column | str, scale: int = 0) -> Column:
    """Python-``round`` parity rounding of a double column to ``scale``.

    Matches CPython ``round(x, scale)`` bit-for-bit for ALL finite
    doubles at 0 <= scale <= 7: exact Dekker arithmetic below
    ``_passthrough_bound(scale)``, provably-identity passthrough above it
    (property-tested in tests/test_rounding.py against Python and the
    DuckDB mirror, including the near-2^53 band).
    """
    if not 0 <= scale <= 7:
        raise ValueError(f"scale {scale} outside validated range [0, 7]")
    x = F.col(col) if isinstance(col, str) else col
    c = F.lit(float(10**scale))

    # Error-free transformation: p + err == x * 10^scale exactly.
    # 10^scale <= 1e7 fits in 24 bits, so it needs no splitting; both
    # xh*c (27+24 bits) and xl*c (26+24 bits) are exact products.
    p = x * c
    big = x * F.lit(_SPLIT)
    xh = big - (big - x)
    xl = x - xh
    err = (xh * c - p) + xl * c

    k = F.floor(p)  # BIGINT
    fr = p - k.cast("double")  # exact: p in [k, k+1), |p| < 2^52
    # fr - 0.5 is exact whenever fr is near 0.5 (Sterbenz); elsewhere the
    # rounding error cannot flip the sign of s. s's sign is the side of
    # the true midpoint; s == 0 is an exact tie.
    s = (fr - F.lit(0.5)) + err
    odd = F.pmod(k, F.lit(2)) != 0
    up = (s > 0) | ((s == 0) & odd)
    k2 = F.when(up, k + 1).otherwise(k)
    rounded = k2.cast("double") / c

    return F.when(
        x.isNull() | F.isnan(x) | (F.abs(x) >= F.lit(_passthrough_bound(scale))), x
    ).otherwise(rounded)


def _d(v: float) -> str:
    """Exact double literal as Spark SQL text (string cast round-trips)."""
    return f"CAST('{v!r}' AS DOUBLE)"


def ref_round_spark_sql(expr: str, scale: int = 0) -> str:
    """Spark-SQL text with ref_round's exact arithmetic.

    Same Dekker/Veltkamp error-free transformation as :func:`ref_round`,
    emitted as one SQL string so hot-path callers (the deliver-stats
    plan builds six of these) pay a single parser round-trip instead of
    ~50 py4j calls each. ``expr`` is a SQL fragment of DOUBLE type; it
    is re-evaluated textually (deterministic, and Catalyst's
    common-subexpression elimination handles the runtime cost).
    """
    if not 0 <= scale <= 7:
        raise ValueError(f"scale {scale} outside validated range [0, 7]")
    c = _d(float(10**scale))
    X = f"CAST(({expr}) AS DOUBLE)"
    P = f"({X} * {c})"
    BIG = f"({X} * {_d(_SPLIT)})"
    XH = f"({BIG} - ({BIG} - {X}))"
    XL = f"({X} - {XH})"
    ERR = f"(({XH} * {c} - {P}) + {XL} * {c})"
    K = f"FLOOR({P})"
    FR = f"({P} - CAST({K} AS DOUBLE))"
    S = f"(({FR} - {_d(0.5)}) + {ERR})"
    ODD = f"(pmod({K}, 2) != 0)"
    UP = f"(({S} > {_d(0.0)}) OR (({S} = {_d(0.0)}) AND {ODD}))"
    K2 = f"(CASE WHEN {UP} THEN {K} + 1 ELSE {K} END)"
    ROUNDED = f"(CAST({K2} AS DOUBLE) / {c})"
    bound = _d(_passthrough_bound(scale))
    return (
        f"(CASE WHEN ({expr}) IS NULL OR isnan({X}) OR abs({X}) >= {bound}"
        f" THEN {X} ELSE {ROUNDED} END)"
    )


def ref_round_expr(expr: str, scale: int = 0) -> Column:
    """:func:`ref_round` over a SQL fragment — one ``F.expr`` round-trip."""
    from pyspark.sql import functions as F

    return F.expr(ref_round_spark_sql(expr, scale))


def ref_round_sql(expr: str, scale: int = 0) -> str:
    """DuckDB SQL expression with the same Python-``round`` semantics.

    ``expr`` must be a SQL expression of DOUBLE type (it is re-evaluated
    several times — fine for the aggregated oracle frames this serves).
    """
    if not 0 <= scale <= 7:
        raise ValueError(f"scale {scale} outside validated range [0, 7]")
    c = 10**scale
    x = f"CAST(({expr}) AS DOUBLE)"
    # Exact 20-digit decimal expansion of the double, scaled. The DECIMAL
    # multiply is exact (scale shift); 38-20=18 integer digits hold any
    # |x| < 1e15 scaled by <= 1e7... within the guard below.
    scaled = f"(CAST(printf('%.20f', {x}) AS DECIMAL(38,20)) * {c})"
    k = f"CAST(FLOOR({scaled}) AS HUGEINT)"
    fr = f"({scaled} - FLOOR({scaled}))"
    up = f"(({fr}) > 0.5 OR (({fr}) = 0.5 AND ({k}) % 2 != 0))"
    return (
        f"(CASE WHEN ({expr}) IS NULL OR isnan({x}) OR isinf({x})"
        f" OR ABS({x}) >= {_passthrough_bound(scale)!r} THEN {x}"
        f" ELSE CAST({k} + CASE WHEN {up} THEN 1 ELSE 0 END AS DOUBLE)"
        f" / {c} END)"
    )


def fp_round(col: Column | str, scale: int) -> Column:
    """Cross-engine DETERMINISTIC fixed-point rounding of a double:
    ``floor(x * 10^scale + 0.5) / 10^scale`` — every step is one IEEE
    double op that Spark and DuckDB (:func:`fp_round_sql`) evaluate
    identically, so the two engines agree BIT-FOR-BIT on every input,
    by construction.

    This is a determinism device for ranking keys and displayed scores
    (the cos9 family), NOT true decimal rounding: the value rounded is
    the computed double ``x * 10^scale``, which can sit one ulp off the
    true product. Use :func:`ref_round` where Python-``round`` decimal
    semantics are the contract.

    Domain: |x| * 10^scale + 0.5 must fit a signed 64-bit integer
    (|x| < ~9.2e18 / 10^scale) — similarity scores are O(1).
    """
    x = F.col(col) if isinstance(col, str) else col
    c = float(10**scale)
    return F.floor(x * F.lit(c) + F.lit(0.5)).cast("double") / F.lit(c)


def fp_round_sql(expr: str, scale: int) -> str:
    """DuckDB SQL text computing the same value as :func:`fp_round`."""
    c = float(10**scale)
    return f"(FLOOR(({expr}) * {c!r} + 0.5) / {c!r})"
