"""Sketch & z-order invariants.

The sf0.01 catalog entries hash-check cell-level equality against
DuckDB; these pin the estimator guarantees — count-min never
underestimates (and is exact without collisions), Bloom filters never
false-negative — and the z-order key's bit-interleave identities.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.functions.zorder import zorder2
from qudo_etl_pipeline_spark.operators.sketches import (
    bloom_build,
    bloom_lookup,
    cms_build,
    cms_lookup,
)


def _keys(spark, values):
    return spark.createDataFrame([(v,) for v in values], "k bigint")


def test_cms_never_underestimates(spark):
    data = [1] * 10 + [2] * 5 + list(range(3, 60))
    df = _keys(spark, data)
    cms = cms_build(df, "k", depth=3, width=16)  # narrow -> collisions
    probes = df.distinct()
    est = {r["k"]: r["est"] for r in cms_lookup(cms, probes, "k", 3, 16).collect()}
    true = {1: 10, 2: 5, **{v: 1 for v in range(3, 60)}}
    assert all(est[k] >= t for k, t in true.items())
    # total mass per sketch row equals the input size
    row_mass = (
        cms.groupBy("row").agg(F.sum("cnt").alias("m")).collect()
    )
    assert all(r["m"] == len(data) for r in row_mass)


def test_cms_exact_when_wide(spark):
    data = [1] * 7 + [2] * 3 + [3]
    df = _keys(spark, data)
    cms = cms_build(df, "k", depth=4, width=4096)
    est = {r["k"]: r["est"]
           for r in cms_lookup(cms, df.distinct(), "k", 4, 4096).collect()}
    assert est == {1: 7, 2: 3, 3: 1}


def test_bloom_no_false_negatives(spark):
    members = _keys(spark, range(0, 200, 2))
    bloom = bloom_build(members, "k", m_bits=512, n_hashes=3)
    probes = _keys(spark, range(200))
    hits = {r["k"]: r["hit"]
            for r in bloom_lookup(bloom, probes, "k", 512, 3).collect()}
    assert all(hits[k] == 1 for k in range(0, 200, 2)), "false negative!"
    # with 100 keys in 512 bits some non-members must still miss
    assert any(hits[k] == 0 for k in range(1, 200, 2))


def test_hll_distinct_within_tolerance(spark):
    # engine-native HLL sketch (approx_count_distinct) vs exact: the
    # scale path for COUNT(DISTINCT) at 100 TB. rsd=0.02 -> assert 5%.
    df = spark.range(20_000).select((F.col("id") % 7_919).alias("k"))
    row = df.agg(
        F.approx_count_distinct("k", rsd=0.02).alias("approx"),
        F.countDistinct("k").alias("exact"),
    ).first()
    assert row["exact"] == 7_919
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_zorder_known_values_and_ordering(spark):
    df = spark.createDataFrame(
        [(3, 0), (0, 3), (3, 3), (1, 2)], "x bigint, y bigint"
    )
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder2(F.col("x"), F.col("y"), 4).alias("z")).collect()
    }
    # x occupies even bit positions, y odd
    assert out[(3, 0)] == 0b0101
    assert out[(0, 3)] == 0b1010
    assert out[(3, 3)] == 0b1111
    assert out[(1, 2)] == 0b1001
    # monotone in x for fixed y
    assert out[(1, 2)] < out[(3, 3)]


def test_zorder_locality_beats_linear_sort(spark):
    # 32x32 grid; query a 4x4 box. After z-sort into 64-row files, the
    # box must touch fewer files than an x-sorted layout (which smears a
    # 4-wide x-slab across every y).
    pts = spark.range(1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("bigint").alias("y")
    )
    z = pts.select("x", "y", zorder2(F.col("x"), F.col("y"), 5).alias("z"))
    zfile = z.select("x", "y", F.floor(F.col("z") / 64).alias("f"))
    xfile = z.select("x", "y", F.floor((F.col("x") * 32 + F.col("y")) / 64).alias("f"))
    box = (F.col("x").between(8, 11)) & (F.col("y").between(8, 11))
    nz = zfile.filter(box).select("f").distinct().count()
    nx = xfile.filter(box).select("f").distinct().count()
    assert nz < nx


def test_bloom_prefilter_preserves_join_results(spark):
    """The 100 TB use-case: broadcast a Bloom filter of the (filtered)
    dim keys and pre-filter the fact side BEFORE the join. Must drop a
    meaningful fraction of fact rows (here the dim filter keeps ~20% of
    keys) while the join result stays identical — Bloom false positives
    are removed by the join itself, and no false negatives exist."""
    dim = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("seg")
    )
    fact = spark.range(10_000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("payload")
    )
    hot = dim.filter(F.col("seg") == 0)  # 100 of 500 keys survive

    plain = fact.join(hot, "k")

    bloom = bloom_build(hot, "k", m_bits=4096, n_hashes=3)
    passed = bloom_lookup(bloom, fact.select("k").distinct(), "k", 4096, 3)
    keep = passed.filter(F.col("hit") == 1).select("k")
    pruned_fact = fact.join(F.broadcast(keep), "k")
    pruned = pruned_fact.join(hot, "k")

    # identical results
    assert plain.exceptAll(pruned).count() == 0
    assert pruned.exceptAll(plain).count() == 0
    # and a real reduction of the fact side before the expensive join
    assert pruned_fact.count() < 0.5 * fact.count()


def test_kmv_exact_below_k_and_mergeable(spark):
    from qudo_etl_pipeline_spark.operators.sketches import (
        kmv_build,
        kmv_estimate,
    )

    a = spark.createDataFrame([(i,) for i in range(40)], "k long")
    b = spark.createDataFrame([(i,) for i in range(20, 60)], "k long")
    # unsaturated sketch (60 distinct < k=64... use k=64): exact count
    sk_union = kmv_build(a.union(b), "k", 64)
    est = kmv_estimate(sk_union, 64).collect()[0]
    assert est["n_kept"] == 60
    assert est["est_distinct"] == 60.0
    # mergeability: k-smallest of (kmv(A) union kmv(B)) == kmv(A union B)
    merged = (
        kmv_build(a, "k", 64)
        .union(kmv_build(b, "k", 64))
        .distinct()
        .orderBy("h")
        .limit(64)
    )
    assert sorted(r["h"] for r in merged.collect()) == sorted(
        r["h"] for r in sk_union.collect()
    )


def test_kmv_estimate_accuracy_saturated(spark):
    from qudo_etl_pipeline_spark.operators.sketches import (
        kmv_build,
        kmv_estimate,
    )

    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], "k long")
    est = kmv_estimate(kmv_build(df, "k", 256), 256).collect()[0]
    assert est["n_kept"] == 256
    # KMV relative error ~ 1/sqrt(k) ~= 6%; allow 4 sigma
    assert abs(est["est_distinct"] - n) / n < 0.25


def test_kmv_jaccard_matches_true_overlap(spark):
    from qudo_etl_pipeline_spark.operators.sketches import (
        kmv_build,
        kmv_jaccard,
    )

    # |A|=|B|=600, |A∩B|=300, |A∪B|=900 -> J = 1/3
    a = spark.createDataFrame([(i,) for i in range(600)], "k long")
    b = spark.createDataFrame([(i,) for i in range(300, 900)], "k long")
    r = kmv_jaccard(
        kmv_build(a, "k", 128), kmv_build(b, "k", 128), 128
    ).collect()[0]
    assert r["k_used"] == 128
    assert abs(r["jaccard6"] - 1 / 3) < 0.15

    # saturating sketches (k > |union|) recover Jaccard EXACTLY
    rx = kmv_jaccard(
        kmv_build(a, "k", 2048), kmv_build(b, "k", 2048), 2048
    ).collect()[0]
    assert rx["k_used"] == 900
    assert rx["n_matches"] == 300
    assert abs(rx["jaccard6"] - 1 / 3) < 1e-5


def test_hll_registers_merge_and_estimate(spark):
    from qudo_etl_pipeline_spark.operators.sketches import (
        hll_build,
        hll_estimate,
        hll_merge,
    )

    a = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(1000, 3000)], "k long")

    sk = hll_build(a.union(b), "k", p=8)
    assert sk.count() == 256  # full register vector, empty buckets = 0
    # mergeability is EXACT at register level: hll(A u B) == max-merge
    merged = hll_merge(hll_build(a, "k", p=8), hll_build(b, "k", p=8))
    diff = (
        merged.alias("m")
        .join(sk.alias("s"), "bucket")
        .filter("m.rho <> s.rho")
        .count()
    )
    assert diff == 0

    # estimator within the ~1.04/sqrt(m) band (3 sigma ~= 20% at p=8)
    est = hll_estimate(sk, p=8).collect()[0]["est"]
    assert abs(est - 3000) / 3000 < 0.20

    # small-range regime: linear counting kicks in and is near-exact
    small = spark.createDataFrame([(i,) for i in range(30)], "k long")
    s = hll_estimate(hll_build(small, "k", p=8), p=8).collect()[0]
    assert s["n_zero"] > 0
    assert abs(s["est"] - 30) < 4

    # duplicate-insensitivity: a multiset sketches like its support
    dup = spark.createDataFrame(
        [(i % 50,) for i in range(5000)], "k long"
    )
    d = hll_estimate(hll_build(dup, "k", p=8), p=8).collect()[0]
    assert abs(d["est"] - 50) < 8

    import pytest as _pt

    with _pt.raises(ValueError, match="p "):
        hll_build(a, "k", p=2)


def test_heavy_hitters_exact_on_skew(spark):
    from qudo_etl_pipeline_spark.operators.sketches import heavy_hitters

    # 3 hot keys + long unique tail; phi = 5% of 1060 rows = 53
    data = [1] * 300 + [2] * 200 + [3] * 60 + list(range(100, 600))
    df = _keys(spark, data).repartition(4)
    out = {
        r["k"]: (r["cnt"], r["n_total"])
        for r in heavy_hitters(
            df, "k", phi_num=5, phi_den=100, capacity=32
        ).collect()
    }
    assert out == {1: (300, 1060), 2: (200, 1060), 3: (60, 1060)}


def test_heavy_hitters_tiny_capacity_still_exact(spark):
    from qudo_etl_pipeline_spark.operators.sketches import heavy_hitters

    # capacity exactly 1/phi: the MG superset guarantee's edge.
    # phi = 1/4 of 40 rows = 10; key 9 sits exactly AT the threshold.
    data = [9] * 10 + [7] * 14 + list(range(20, 36))
    df = _keys(spark, data).repartition(3)
    out = {
        r["k"]: r["cnt"]
        for r in heavy_hitters(
            df, "k", phi_num=1, phi_den=4, capacity=4
        ).collect()
    }
    assert out == {9: 10, 7: 14}


def test_heavy_hitters_property_random(spark):
    """MG superset guarantee under random data and partitioning."""
    import random

    rng = random.Random(1234)
    for trial in range(3):
        n_hot = rng.randint(1, 4)
        data = []
        for h in range(n_hot):
            data += [h] * rng.randint(80, 200)
        data += [1000 + i for i in range(rng.randint(200, 800))]
        rng.shuffle(data)
        from qudo_etl_pipeline_spark.operators.sketches import (
            heavy_hitters,
        )

        df = _keys(spark, data).repartition(rng.randint(2, 8))
        phi_num, phi_den = 5, 100
        out = {
            r["k"]: r["cnt"]
            for r in heavy_hitters(
                df, "k", phi_num, phi_den, capacity=24
            ).collect()
        }
        import collections

        true = collections.Counter(data)
        n = len(data)
        expected = {
            k: c for k, c in true.items() if c * phi_den >= phi_num * n
        }
        assert out == expected, (trial, out, expected)
