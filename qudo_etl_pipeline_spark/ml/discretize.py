"""Equi-depth (quantile) bucketing: feature discretization.

Two paths with the same output contract (bucket id per row):

- :func:`ntile_bucketize` — EXACT equal-count buckets via NTILE over a
  deterministic total order. This is a global sort (one range-exchange
  over the full column) — correct at any size but sort-bound; it exists
  as the semantics definition and the oracle surface.
- :func:`bounds_bucketize` — the 100 TB path: bucket BOUNDARIES from
  ``approx_percentile`` (one aggregate, Greenwald-Khanna sketch —
  row-count-independent state), then a map-only assignment against the
  broadcast boundary array. No global sort, no full shuffle; bucket
  counts are approximately equal (sketch accuracy), which is what
  discretization needs in practice. The two paths' agreement is pinned
  by a tolerance test, not an oracle (the sketch is engine-specific).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ntile_bucketize", "bounds_bucketize", "auto_bucketize"]


def ntile_bucketize(
    df: DataFrame, col: str, k: int, tiebreak: list[str]
) -> DataFrame:
    """Append ``bucket`` (1..k, exact equal counts ±1) with EXACT
    ``NTILE`` semantics over (col, *tiebreak). The tiebreak columns
    must make the order total, or tied rows would land
    nondeterministically across engines.

    NOT ``F.ntile`` over a global ``Window.orderBy`` — that moves the
    whole table through one task. Instead the global rank comes from
    the range-partitioned two-pass prefix COUNT
    (:func:`~qudo_etl_pipeline_spark.operators.prefix.
    ranged_prefix_sums`) and the bucket from NTILE's closed form over
    (rank, n): the first ``n % k`` buckets take ``n // k + 1`` rows,
    the rest ``n // k`` — integer arithmetic on a broadcast 1-row
    total, bit-identical to the window form for any total order
    (full-row duplicates may swap ranks across engines, but swapping
    identical rows is a no-op on every downstream aggregate).

    Row-count contract: output rows = NON-NULL input rows of ``col``.
    NULL-value rows are dropped, not given a NULL bucket — a caller
    joining buckets back by id must expect partial coverage.
    """
    from qudo_etl_pipeline_spark.operators.prefix import (
        ranged_prefix_sums,
    )

    # a NULL value has no position in a value-ordered discretization —
    # excluded (r11 NULL-salt parity; NULL-free inputs unchanged)
    df = df.filter(F.col(col).isNotNull())
    src = df.withColumn("_one", F.lit(1))
    ranked = ranged_prefix_sums(
        src, [col, *tiebreak], {"_rank": "_one"}
    )
    n_row = df.agg(F.count(F.lit(1)).alias("_n"))
    r = F.col("_rank")
    n = F.col("_n")
    small = F.floor(n / F.lit(k)).cast("bigint")
    big = small + F.lit(1)
    cnt_big = n % F.lit(k)
    thresh = cnt_big * big
    bucket = (
        F.when(r <= thresh, F.floor((r - F.lit(1)) / big) + F.lit(1))
        .otherwise(
            cnt_big
            + F.floor((r - thresh - F.lit(1)) / small)
            + F.lit(1)
        )
        .cast("bigint")
    )
    return ranked.crossJoin(F.broadcast(n_row)).select(
        *df.columns, bucket.alias("bucket")
    )


def bounds_bucketize(
    df: DataFrame, col: str, k: int, accuracy: int = 10_000
) -> DataFrame:
    """Append ``bucket`` (1..k) by approx-quantile boundaries: one
    sketch aggregate + a map-only assignment (boundaries broadcast as a
    literal array). Values above the last inner boundary take bucket k;
    ties at a boundary go to the lower bucket (<= semantics, matching
    NTILE's placement of the boundary row).

    Row-count contract: output rows = NON-NULL input rows of ``col``
    (same as :func:`ntile_bucketize` — join-back callers must expect
    partial coverage)."""
    # same contract as ntile_bucketize: NULL values have no bucket
    df = df.filter(F.col(col).isNotNull())
    probs = [i / k for i in range(1, k)]
    bounds = df.agg(
        F.percentile_approx(col, probs, accuracy).alias("b")
    ).first()["b"]
    if bounds is None:  # empty or all-NULL input: no quantiles exist
        raise ValueError(
            f"bounds_bucketize: no non-null values in column {col!r}"
        )
    arr: Column = F.array(*[F.lit(float(b)) for b in bounds])
    # bucket = 1 + number of boundaries strictly below the value;
    # NULL values stay NULL (percentile_approx ignored them, so folding
    # them into bucket 1 would silently overfill it and read missing
    # data as lowest-value data)
    bucket = F.lit(1) + F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(F.col(col) > b, 1).otherwise(0),
    )
    return df.withColumn(
        "bucket",
        F.when(F.col(col).isNotNull(), bucket).cast("bigint"),
    )


def auto_bucketize(
    df: DataFrame,
    col: str,
    k: int,
    tiebreak: list[str],
    exact_max_rows: int = 2_000_000,
    accuracy: int = 10_000,
) -> DataFrame:
    """Size-dispatched equi-depth bucketing: EXACT :func:`ntile_bucketize`
    up to ``exact_max_rows`` input rows, the map-only
    :func:`bounds_bucketize` sketch path above — the same
    measured-input plan choice :func:`~qudo_etl_pipeline_spark.plans.
    skew.choose_join_strategy` makes for joins. The exact path's
    full-row-cardinality frame through repartitionByRange + windows was
    the heaviest scale ratio left in SCALING.md (1.93x wall for 3x rows,
    20 s at sf3); above the threshold equal counts +-sketch-accuracy is
    what discretization needs, and the sketch path is one aggregate +
    a broadcast boundary array. The row count is one count-star job
    (parquet-stats cheap); the dispatch is deterministic in the data.
    """
    n = df.count()
    if n <= exact_max_rows:
        return ntile_bucketize(df, col, k, tiebreak)
    return bounds_bucketize(df, col, k, accuracy=accuracy)
