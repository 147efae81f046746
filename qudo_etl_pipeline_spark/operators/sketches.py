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

from qudo_etl_pipeline_spark.functions.hashing import hash_positions

__all__ = ["cms_build", "cms_lookup", "bloom_build", "bloom_lookup"]


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
