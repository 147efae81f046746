"""Distributed probabilistic sketches: count-min and Bloom filter.

Extension scope (no reference counterpart): the sketch primitives a
100 TB pipeline uses to avoid full shuffles — a count-min sketch answers
per-key frequency queries from a depth x width grid instead of a
key-cardinality groupBy, and a Bloom filter broadcast to every executor
replaces a semi-join shuffle for existence filtering.

Both sketches are DETERMINISTIC functions of the data (seeded md5-prefix
hash family, functions/hashing.py), so unlike engine-native sketch
aggregates (``approx_count_distinct``'s HLL, Spark's BloomFilter
aggregate) they are reproducible in the DuckDB oracle bit-for-bit and
hash-checked by the driver gate.

Scale shape: building either sketch is one narrow map (posexplode of a
depth/k-hash-sized array per row) + ONE groupBy whose output cardinality
is the sketch size (depth x width cells / m_bits/32 words) — independent
of row count. Lookups join the tiny sketch to the probe keys —
broadcast-sized by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.functions.hashing import hash64, hash_positions

__all__ = [
    "cms_build",
    "cms_lookup",
    "bloom_build",
    "bloom_lookup",
    "kmv_build",
    "kmv_estimate",
    "kmv_jaccard",
    "hll_build",
    "hll_merge",
    "hll_estimate",
    "heavy_hitters",
]


def _probe_positions(key: Column, n_hashes: int, modulus: int) -> Column:
    """Array of ``n_hashes`` universal-hash positions in [0, modulus):
    ONE md5 base hash + cheap affine transforms (functions/hashing.py),
    so sketch builds cost one md5 pass regardless of depth."""
    return hash_positions(key, n_hashes, modulus)


def cms_build(
    df: DataFrame, key_col: str, depth: int = 3, width: int = 256
) -> DataFrame:
    """Count-min sketch of ``key_col``: (row, bucket, cnt) cells.

    Cells with zero count are absent (sparse representation); lookups
    treat absence as 0.
    """
    key = F.col(key_col).cast("string")
    return (
        df.select(
            F.posexplode(_probe_positions(key, depth, width)).alias(
                "row", "bucket"
            )
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("row").cast("bigint").alias("row"),
            F.col("bucket").cast("bigint").alias("bucket"),
            "cnt",
        )
    )


def cms_lookup(
    cms: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Frequency estimate for each probe key: min over the sketch rows of
    the key's bucket count (the count-min estimator — an upper bound on
    the true frequency, exact when no collisions). Output (key_col, est).
    """
    # NULL probe keys are dropped (md5(NULL) has no positions) —
    # callers wanting a row per probe should coalesce keys first
    probes = probes.filter(F.col(key_col).isNotNull())
    key = F.col(key_col).cast("string")
    ph = probes.select(
        key_col,
        F.posexplode(_probe_positions(key, depth, width)).alias(
            "row", "bucket"
        ),
    )
    return (
        ph.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 2048, n_hashes: int = 3
) -> DataFrame:
    """Bloom filter of ``key_col`` as (word, bits) rows — 32-bit words so
    every mask stays positive in both engines' signed BIGINT arithmetic.

    At scale the result (m_bits/32 rows) is collected/broadcast and used
    to pre-filter the big side of a semi-join without shuffling it.
    """
    key = F.col(key_col).cast("string")
    pos = F.explode(_probe_positions(key, n_hashes, m_bits)).alias("pos")
    return (
        df.select(pos)
        .select(
            F.floor(F.col("pos") / 32).cast("bigint").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_lookup(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    m_bits: int = 2048,
    n_hashes: int = 3,
) -> DataFrame:
    """Membership probe: hit=1 iff ALL n_hashes bits are set (may
    false-positive, never false-negative). Output (key_col, hit).
    """
    # NULL probe keys are dropped — same contract as cms_lookup
    probes = probes.filter(F.col(key_col).isNotNull())
    key = F.col(key_col).cast("string")
    ph = probes.select(
        key_col,
        F.explode(_probe_positions(key, n_hashes, m_bits)).alias("pos"),
    ).select(
        key_col,
        F.floor(F.col("pos") / 32).cast("bigint").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("mask"),
    )
    hit_bit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
        == F.col("mask")
    )
    return (
        ph.join(F.broadcast(bloom), "word", "left")
        .select(key_col, hit_bit.alias("b"))
        .groupBy(key_col)
        .agg(F.min(F.col("b").cast("int")).cast("bigint").alias("hit"))
    )


def kmv_build(df: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """K-minimum-values (theta) sketch of ``key_col``: the ``k`` smallest
    distinct 60-bit hashes of the key (Bar-Yossef et al. / the theta
    sketch's KMV core). One column ``h``; at most ``k`` rows.

    Like :func:`hll_build` (the register-vector alternative below), the
    sketch is a deterministic function of the data (hash64 is the md5
    device), so the sketch itself — not just its estimate — is
    oracle-checkable and MERGEABLE by construction:
    kmv(A union B) == k-smallest of (kmv(A) union kmv(B)), the property
    a 100 TB pipeline uses to sketch per-partition/per-day and combine.

    Scale shape: map (hash) -> partial-dedup shuffle on the hash ->
    TakeOrdered(k) (per-partition top-k, single tiny merge). Output is
    k rows regardless of input row count.
    """
    key = F.col(key_col)
    return (
        df.filter(key.isNotNull())
        .select(hash64(key.cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


# hash64 yields 60-bit values: estimates normalize by 2^60.
_KMV_SPACE = float(1 << 60)


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """Distinct-count estimate from a :func:`kmv_build` sketch (1 row).

    Saturated sketch (n_kept == k): the classic unbiased KMV estimator
    (k-1) / U_(k) with U = h_k / 2^60. Unsaturated: the sketch holds
    EVERY distinct hash, so the count is exact (collisions aside).
    """
    n = F.count(F.lit(1))
    hk = F.max("h")
    est = F.when(
        n < k, n.cast("double")
    ).otherwise((F.lit(float(k - 1)) * _KMV_SPACE) / hk.cast("double"))
    return sketch.agg(
        n.cast("bigint").alias("n_kept"),
        hk.cast("bigint").alias("kth_hash"),
        est.alias("est_distinct"),
    )


def kmv_jaccard(sk_a: DataFrame, sk_b: DataFrame, k: int) -> DataFrame:
    """Jaccard similarity estimate between two key sets from their KMV
    sketches alone (Beyer et al., SIGMOD'07): among the k' smallest
    hashes of the combined sketch (k' = min(k, |union of sketches|)),
    the fraction present in BOTH sketches estimates |A∩B| / |A∪B|.

    Everything here is sketch-sized (<= 2k rows) — the single-partition
    window and the 1-row broadcast crossJoin never see data scale.
    Output: k_used, n_matches, jaccard6.
    """
    from pyspark.sql import Window

    from qudo_etl_pipeline_spark.functions.rounding import ref_round
    from qudo_etl_pipeline_spark.operators.prefix import (
        acquire_operator_cache,
    )

    # each sketch is <= k rows but its BUILD is a full-input hash +
    # dedup pass — cached once so the intersect and union branches do
    # not re-run the build per reference (measured: 6 input scans per
    # execution without the caches); the ranked union (<= 2k rows)
    # likewise feeds both the k' probe and the match join
    sk_a = acquire_operator_cache(sk_a)
    sk_b = acquire_operator_cache(sk_b)
    both = sk_a.select("h").intersect(sk_b.select("h"))
    comb = sk_a.select("h").union(sk_b.select("h")).distinct()
    ranked = acquire_operator_cache(
        comb.select(
            "h", F.row_number().over(Window.orderBy("h")).alias("r")
        )
    )
    kp = ranked.agg(
        F.least(F.lit(k), F.count(F.lit(1))).cast("int").alias("kp")
    )
    j = (
        ranked.join(both.withColumn("m", F.lit(1)), "h", "left")
        .crossJoin(F.broadcast(kp))
        .filter(F.col("r") <= F.col("kp"))
    )
    return j.agg(
        F.max("kp").cast("bigint").alias("k_used"),
        F.sum(F.coalesce(F.col("m"), F.lit(0))).cast("bigint").alias(
            "n_matches"
        ),
        ref_round(
            F.sum(F.coalesce(F.col("m"), F.lit(0))).cast("double")
            / F.max("kp").cast("double"),
            6,
        ).alias("jaccard6"),
    )


# --- HyperLogLog (register-exact, mergeable) ------------------------------

_HLL_HASH_BITS = 60  # hash64 emits 60-bit values


def _rho_expr(w: Column, max_rho: int) -> Column:
    """rho(w) = 1-based position of w's lowest set bit (max_rho when
    w == 0): pure integer logic — ``w & -w`` isolates the bit, a
    driver-built literal map looks up its exponent. Exact in any
    engine; no log2/float anywhere.

    (Classic HLL ranks leading zeros of the suffix; ranking the
    TRAILING zeros is the Flajolet-Martin-style equivalent — for a
    uniform hash both are Geometric(1/2), and integer bit isolation
    beats a float log in cross-engine exactness.)
    """
    lsb = w.bitwiseAND(-w)
    m = F.create_map(
        *[
            F.lit(x)
            for k in range(max_rho - 1)
            for x in (1 << k, k + 1)
        ]
    )
    return F.coalesce(m[lsb], F.lit(max_rho))


def hll_build(df: DataFrame, key_col: str, p: int = 8) -> DataFrame:
    """HyperLogLog registers for ``key_col``: bucket = low ``p`` hash
    bits, register = max rho of the remaining ``60-p`` bits
    (Flajolet et al., AofA'07). Output is ALL ``2^p`` rows
    (bucket, rho) with rho = 0 for never-hit buckets — the register
    VECTOR, so the driver gate hash-checks sketch content, not just
    the estimate.

    Scale shape: one map (md5 + integer ops) + ONE groupBy(bucket) with
    map-side combine — 2^p rows out regardless of input. Mergeability
    (:func:`hll_merge` = per-bucket max) is what a 100 TB pipeline
    exploits: sketch per partition/day, merge 2^p-sized vectors, never
    re-scan. Complements :func:`kmv_build`: KMV also supports set
    operations (Jaccard); HLL's register vector is 4x smaller for the
    same error (~1.04/sqrt(2^p) relative) and merges with max instead
    of a sort.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p {p} outside [4, 16]")
    m = 1 << p
    max_rho = _HLL_HASH_BITS - p + 1
    key = F.col(key_col)
    hits = (
        df.filter(key.isNotNull())
        .select(hash64(key.cast("string")).alias("h"))
        .select(
            (F.col("h") % m).alias("bucket"),
            # integer DIV, not floor(double /): a 60-bit hash would be
            # rounded by the double cast before the division
            _rho_expr(F.expr(f"h DIV {m}"), max_rho).alias("r"),
        )
        .groupBy("bucket")
        .agg(F.max("r").alias("rho"))
    )
    buckets = df.sparkSession.range(m).select(
        F.col("id").alias("bucket")
    )
    return buckets.join(hits, "bucket", "left").select(
        "bucket",
        F.coalesce("rho", F.lit(0)).cast("bigint").alias("rho"),
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union of the sketched sets: per-bucket max over register vectors
    (lossless — hll(A u B) == hll_merge(hll(A), hll(B)) exactly)."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """Cardinality estimate from a register vector (1 row).

    The harmonic mean runs in exact integer fixed-point:
    ``sum_fp = sum(2^(53 - rho))`` (every term an integer shift, the
    sum < 2^62) — so Z and the raw estimate are single deterministic
    double operations on identical integers in any engine. Small-range
    (linear counting) correction applies below 2.5m when empty buckets
    remain. Output: n_zero, sum_fp, est (rounded 6).
    """
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.agg(
        F.count(F.lit(1)).alias("_m"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).alias("n_zero"),
        F.sum(F.expr("shiftleft(1L, cast(53 - rho AS INT))")).alias(
            "sum_fp"
        ),
    )
    raw = (
        F.lit(alpha * m * m * float(1 << 53))
        / F.col("sum_fp").cast("double")
    )
    linear = F.lit(float(m)) * F.log(
        F.lit(float(m)) / F.col("n_zero").cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("n_zero") > 0), linear
    ).otherwise(raw)
    return agg.select(
        F.col("n_zero").cast("bigint").alias("n_zero"),
        F.col("sum_fp").cast("bigint").alias("sum_fp"),
        ref_round(est, 6).alias("est"),
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    phi_num: int = 1,
    phi_den: int = 100,
    capacity: int | None = None,
) -> DataFrame:
    """EXACT phi-heavy hitters (keys with count >= ceil(phi * N)) in two
    passes, without ever shuffling the raw key space.

    The direct formulation — ``groupBy(key).count().filter(...)`` —
    shuffles one aggregate row per DISTINCT key. At 100 TB with
    billions of mostly-rare keys that shuffle IS the job. The classic
    two-pass remedy (Misra-Gries '82 candidates + exact recount):

    - **pass 1 (map-only):** each partition runs a Misra-Gries summary
      of ``capacity`` counters over its rows inside one Arrow
      ``mapInPandas`` kernel (stateful across batches within the
      partition, nothing leaves the executor but the summary). A key
      absent from partition i's summary has local count <= n_i /
      (capacity+1), so a key absent from EVERY summary has global count
      <= N / (capacity+1) < phi*N whenever capacity >= 1/phi — the
      union of summaries is a guaranteed superset of the true heavy
      hitters. Each kernel also emits its exact partition row count, so
      N costs no extra pass.
    - **pass 2:** re-scan with the candidate set broadcast as a
      semi-join filter (at most ``capacity * n_partitions`` keys) and
      count EXACTLY, keeping ``cnt * phi_den >= ceil`` in integer
      arithmetic — no float threshold, bit-identical to the oracle's
      ``HAVING cnt * phi_den >= phi_num * N``.

    Output: (key, cnt, n_total), exact, deterministic, one row per true
    heavy hitter. phi is the exact rational phi_num/phi_den.
    """
    import pandas as pd

    if capacity is None:
        capacity = max(64, 4 * ((phi_den + phi_num - 1) // phi_num))
    cap = int(capacity)

    field = df.schema[key_col]
    out_schema = (
        f"`{key_col}` {field.dataType.simpleString()}, __pn bigint"
    )

    def mg_kernel(batches):
        # Vectorized MERGE of per-batch exact counts into a running MG
        # summary (Agarwal/Cormode "Mergeable Summaries": add counts,
        # then subtract the (cap+1)-st largest and drop non-positives —
        # preserves the est >= true - n_i/(cap+1) bound). No per-row
        # Python: each batch is one value_counts + one dict merge.
        summary = pd.Series(dtype="int64")
        n_rows = 0
        for pdf in batches:
            keys = pdf[key_col].dropna()
            n_rows += len(pdf)
            summary = summary.add(keys.value_counts(), fill_value=0)
            if len(summary) > cap:
                m = summary.nlargest(cap + 1).iloc[-1]
                summary = summary - m
                summary = summary[summary > 0]
        out = pd.DataFrame(
            {key_col: summary.index.to_list() + [None],
             "__pn": [0] * len(summary) + [n_rows]}
        )
        yield out

    # The summary is read twice (total + candidates) and is bounded at
    # cap x n_partitions rows; the cache is correctness-neutral but
    # stops the MG pass running twice. Like token_budget_sample's cache
    # it is load-bearing for the RETURNED lazy plan, so it cannot be
    # released here — it goes through the operator-cache registry
    # (strong ref until the caller's prefix_cache_scope exits after
    # full materialization, or clear_prefix_caches runs).
    from qudo_etl_pipeline_spark.operators.prefix import (
        acquire_operator_cache,
    )

    summary = acquire_operator_cache(
        df.select(key_col).mapInPandas(mg_kernel, out_schema)
    )
    total = summary.agg(F.sum("__pn").alias("n_total"))
    cands = summary.filter(F.col(key_col).isNotNull()).select(
        key_col
    ).distinct()
    exact = (
        df.join(F.broadcast(cands), on=key_col, how="inner")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    out = exact.crossJoin(F.broadcast(total)).filter(
        F.col("cnt") * phi_den
        >= F.lit(phi_num) * F.col("n_total")
    )
    return out.select(key_col, "cnt", "n_total")
