"""Temporal operator semantics: as-of join, bucketed range join, rollup.

The sf0.01 catalog entries hash-check the happy path against DuckDB's
native ASOF JOIN / range join / ROLLUP; these tests pin the edge
semantics those rows never exercise — equal-timestamp ties, probes with
no preceding build row, intervals spanning many buckets, empty
intervals — and that the physical plans never fall back to a cartesian /
broadcast-nested-loop join.
"""

from __future__ import annotations

import contextlib
import datetime as dt
import io

from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.operators.temporal import (
    asof_join,
    range_join,
    rollup_time_grains,
)


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_asof_backward_inclusive_and_unmatched(spark):
    probe = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(5), "p2"), (2, _ts(3), "p3")],
        "k int, ts timestamp, pid string",
    )
    build = spark.createDataFrame(
        [(1, _ts(5), "exact"), (1, _ts(9), "latest"), (2, _ts(4), "after")],
        "k int, ts timestamp, tag string",
    )
    out = {
        r["pid"]: r["tag_b"]
        for r in asof_join(probe, build, on="k").collect()
    }
    # p1@10 takes build@9 (most recent <=), not build@5
    assert out["p1"] == "latest"
    # p2@5 matches the build row at EXACTLY ts=5 (inclusive)
    assert out["p2"] == "exact"
    # p3@3 precedes every build row for k=2 -> NULL
    assert out["p3"] is None


def test_asof_plan_has_no_cartesian(spark):
    probe = spark.createDataFrame([(1, _ts(1))], "k int, ts timestamp")
    build = spark.createDataFrame([(1, _ts(0), 9)], "k int, ts timestamp, v int")
    plan = _plan(asof_join(probe, build, on="k"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_multibucket_and_left_complete(spark):
    # 25-minute interval over 600s buckets spans 3-4 buckets; points in
    # different buckets must all match exactly once.
    intervals = spark.createDataFrame(
        [(1, _ts(0), _ts(25)), (2, _ts(40), _ts(41))],
        "iid int, s timestamp, e timestamp",
    )
    points = spark.createDataFrame(
        [(_ts(0), "at-start"), (_ts(12), "mid"), (_ts(24, 59), "near-end"),
         (_ts(25), "at-end-excl"), (_ts(39), "outside")],
        "ts timestamp, tag string",
    )
    rows = range_join(
        points, intervals, "ts", "s", "e", bucket_seconds=600, how="left"
    ).collect()
    by_iid: dict[int, list] = {}
    for r in rows:
        by_iid.setdefault(r["iid"], []).append(r["tag"])
    # start inclusive, end exclusive, no duplicates from the explode
    assert sorted(by_iid[1]) == ["at-start", "mid", "near-end"]
    # interval 2 matched nothing but survives with a NULL point
    assert by_iid[2] == [None]


def test_range_join_inner_plan_is_equijoin(spark):
    intervals = spark.createDataFrame(
        [(1, _ts(0), _ts(25))], "iid int, s timestamp, e timestamp"
    )
    points = spark.createDataFrame([(_ts(12),)], "ts timestamp")
    plan = _plan(range_join(points, intervals, "ts", "s", "e", 600))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_time_weighted_avg_locf(spark):
    from qudo_etl_pipeline_spark.operators.temporal import time_weighted_avg

    df = spark.createDataFrame(
        [
            # k=1: v=10 holds 60s, v=20 holds 180s, final sample unweighted
            (1, _ts(0), 10.0), (1, _ts(1), 20.0), (1, _ts(4), 99.0),
            # k=2: single sample -> no covered interval -> dropped
            (2, _ts(0), 5.0),
        ],
        "k int, ts timestamp, v double",
    )
    rows = time_weighted_avg(df, "k", "ts", "v").collect()
    assert len(rows) == 1 and rows[0]["k"] == 1
    assert rows[0]["twa"] == (10.0 * 60 + 20.0 * 180) / 240
    assert rows[0]["covered_us"] == 240 * 1_000_000


def test_time_weighted_avg_plan_reuses_partitioning(spark):
    import re

    from qudo_etl_pipeline_spark.operators.temporal import time_weighted_avg

    df = spark.createDataFrame([(1, _ts(0), 1.0)], "k int, ts timestamp, v double")
    plan = _plan(time_weighted_avg(df, "k", "ts", "v"))
    # the groupBy rides the window's hash partitioning: ONE exchange total
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1


def test_rollup_grain_consistency(spark):
    ev = spark.createDataFrame(
        [(_ts(1), 1.0), (_ts(2), 2.0),
         (dt.datetime(2024, 1, 1, 3, 0), 4.0),
         (dt.datetime(2024, 1, 2, 0, 0), 8.0)],
        "ts timestamp, value double",
    )
    rows = {
        (r["day"], r["hour"]): (r["n"], r["total_value"])
        for r in rollup_time_grains(ev).collect()
    }
    assert rows[("2024-01-01", 0)] == (2, 3.0)
    assert rows[("2024-01-01", 3)] == (1, 4.0)
    # day grain sums its hours; grand total sums the days
    assert rows[("2024-01-01", -1)] == (3, 7.0)
    assert rows[("ALL", -1)] == (4, 15.0)


def test_chunk_documents_overlap_semantics(spark):
    from qudo_etl_pipeline_spark.operators.packing import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, words), (2, "a b"), (3, "x")], "doc_id bigint, text string"
    )
    rows = chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 10 tokens, chunk 4, step 3 -> starts 0,3,6 (the chunk at 6 reaches
    # the end, so no degenerate "w9" tail chunk is emitted)
    c = by_doc[1]
    assert [r["chunk_text"] for r in c] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9",
    ]
    assert [r["n_tok"] for r in c] == [4, 4, 4]
    # full-coverage invariant: sum(n_tok) - overlap*(n_chunks-1) == n
    assert sum(r["n_tok"] for r in c) - 1 * (len(c) - 1) == 10
    # consecutive chunks share exactly `overlap` tokens
    assert c[0]["chunk_text"].split()[-1] == c[1]["chunk_text"].split()[0]
    # short docs produce one whole chunk
    assert [r["chunk_text"] for r in by_doc[2]] == ["a b"]
    assert [r["chunk_text"] for r in by_doc[3]] == ["x"]


def test_trailing_zscore_flags_spike(spark):
    from qudo_etl_pipeline_spark.operators.temporal import trailing_zscore

    # stable noisy series, one huge spike at t=20
    vals = [10, 11, 9, 10, 12, 8, 10, 11, 9, 10] * 2 + [100] + [10, 11]
    rows = [("a", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t int, v long")
    out = {r["t"]: (r["z"], r["is_anomaly"])
           for r in trailing_zscore(df, "k", "t", "v", window=10).collect()}
    # first 10 points have no full trailing window
    assert all(out[t][0] is None for t in range(10))
    assert out[20][1] == 1 and out[20][0] > 10
    # normal points are not flagged
    assert all(out[t][1] == 0 for t in range(10, 20))
    # the spike sits in t=21's trailing window and inflates its std,
    # so t=21 must not be flagged either
    assert out[21][1] == 0
    # hand-check one z: at t=10 the window is vals[0:10]
    import math
    w = vals[0:10]
    s, sq = sum(w), sum(x * x for x in w)
    expect = (10 * vals[10] - s) / math.sqrt(10 * sq - s * s)
    assert abs(out[10][0] - expect) < 1e-12


def test_trailing_zscore_constant_window_is_null(spark):
    from qudo_etl_pipeline_spark.operators.temporal import trailing_zscore

    df = spark.createDataFrame(
        [("a", i, 5) for i in range(8)], "k string, t int, v long"
    )
    out = trailing_zscore(df, "k", "t", "v", window=4).collect()
    assert all(r["z"] is None for r in out)


def test_range_join_left_null_payload_not_duplicated(spark):
    import datetime as dt

    from qudo_etl_pipeline_spark.operators.temporal import range_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    iv = spark.createDataFrame(
        [(1, None, t(0), t(10)), (2, "ok", t(20), t(30))],
        "iv_id long, note string, s timestamp, e timestamp",
    )
    pt = spark.createDataFrame([(100, t(5))], "p_id long, ts timestamp")
    out = sorted(
        (r["iv_id"], r["p_id"])
        for r in range_join(pt, iv, "ts", "s", "e", 600, how="left").collect()
    )
    # matched NULL-payload interval appears ONCE (with its match), not
    # again as a spurious empty row
    assert out == [(1, 100), (2, None)]


def test_rolling_time_stats_frames_and_ties(spark):
    import datetime as dt

    from qudo_etl_pipeline_spark.operators.temporal import rolling_time_stats

    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
    # key 1: points at 0s, 30s, 61s (61s frame [1,61] drops the 0s point),
    # plus a tie pair at 100s that must see each other symmetrically
    rows = [
        (1, t(0), 10.0),
        (1, t(30), 20.0),
        (1, t(61), 30.0),
        (1, t(100), 1.0),
        (1, t(100), 3.0),
        (2, t(5), 7.0),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = rolling_time_stats(df, "k", "ts", "v", window_sec=60)
    got = sorted(
        (r["k"], r["ts"].second + 60 * r["ts"].minute, r["v"],
         r["n_w"], r["sum_w"], r["avg_w"])
        for r in out.collect()
    )
    assert got == [
        (1, 0, 10.0, 1, 10.0, 10.0),
        (1, 30, 20.0, 2, 30.0, 15.0),
        (1, 61, 30.0, 2, 50.0, 25.0),   # 0s point aged out
        (1, 100, 1.0, 3, 34.0, 11.333333),  # tie peers see each other
        (1, 100, 3.0, 3, 34.0, 11.333333),  # (avg_w is ref_round(..., 6))
        (2, 5, 7.0, 1, 7.0, 7.0),
    ]


def test_asof_chunked_equals_unchunked_with_hot_key(spark):
    """Hot-key time-chunking property: for ANY chunk width the chunked
    plan must be row-identical to the un-chunked one, including probes
    in build-free chunks (carry-in from several chunks back) and probes
    before any build row (NULL). The fixture plants one pathologically
    hot key holding most rows."""
    import random

    rng = random.Random(17)
    probe_rows, build_rows = [], []
    pid = 0
    for k in [1, 1, 1, 1, 1, 1, 1, 1, 2, 3]:  # key 1 is hot
        base = rng.randrange(0, 3600)
        for _ in range(40 if k == 1 else 5):
            t = dt.datetime(2024, 1, 1) + dt.timedelta(
                seconds=base + rng.randrange(0, 7200)
            )
            if rng.random() < 0.5:
                pid += 1
                probe_rows.append((k, t, pid))
            else:
                build_rows.append((k, t))
    probe = spark.createDataFrame(
        probe_rows, "k int, ts timestamp, pid int"
    )
    # distinct build ts per key (dedup like the catalog does) so the
    # tie-winner nondeterminism documented on asof_join cannot differ
    # between the two plans
    build = (
        spark.createDataFrame(build_rows, "k int, ts timestamp")
        .groupBy("k", "ts")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    base_out = sorted(
        (r["pid"], r["v_b"])
        for r in asof_join(probe, build, on="k").collect()
    )
    for chunk_s in (60, 600, 3600, 10**9):
        got = sorted(
            (r["pid"], r["v_b"])
            for r in asof_join(
                probe, build, on="k", chunk_seconds=chunk_s
            ).collect()
        )
        assert got == base_out, f"chunk_seconds={chunk_s}"


def test_asof_chunked_hot_key_spans_multiple_window_partitions(spark):
    """The point of chunking: the final running-last window partitions
    by (key, chunk), so the planted hot key's rows land in >1 window
    partition (>1 task at scale) instead of serializing into one."""
    rows_p = [(1, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i * 30), i)
              for i in range(200)]
    rows_b = [(1, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i * 45), i)
              for i in range(100)]
    probe = spark.createDataFrame(rows_p, "k int, ts timestamp, pid int")
    build = spark.createDataFrame(rows_b, "k int, ts timestamp, v int")
    out = asof_join(probe, build, on="k", chunk_seconds=600)
    plan = _plan(out)
    # the window's required distribution includes the chunk column
    assert "__chunk" in plan
    # hot key 1 is active in multiple chunks -> multiple hash partitions
    n_chunks = (
        probe.select(
            F.floor(F.unix_micros("ts") / (600 * 1_000_000)).alias("c")
        )
        .distinct()
        .count()
    )
    assert n_chunks > 1
    # and correctness still holds vs the un-chunked reference
    a = sorted((r["pid"], r["v_b"]) for r in out.collect())
    b = sorted(
        (r["pid"], r["v_b"])
        for r in asof_join(probe, build, on="k").collect()
    )
    assert a == b


def test_ewma_matches_pandas_and_truncates(spark):
    import pandas as pd

    from qudo_etl_pipeline_spark.operators.temporal import ewma

    vals = [3.0, 1.0, 4.0, 1.5, 9.0, 2.5]
    rows = [(1, i, v) for i, v in enumerate(vals)] + [
        (2, i, float(i * i)) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "k: long, t: long, v: double")

    # window >= series length == untruncated pandas ewm(adjust=True)
    got = {
        (r["k"], r["t"]): r["ewma"]
        for r in ewma(df, "k", ["t"], "v", alpha=0.3, window=8).collect()
    }
    for k, series in ((1, vals), (2, [0.0, 1.0, 4.0, 9.0])):
        exp = pd.Series(series).ewm(alpha=0.3, adjust=True).mean()
        for t, e in enumerate(exp):
            assert abs(got[(k, t)] - e) < 1e-6, (k, t)

    # window=2: only the last two observations contribute
    got2 = {
        r["t"]: (r["n_w"], r["ewma"])
        for r in ewma(
            df.filter("k = 1"), "k", ["t"], "v", alpha=0.5, window=2
        ).collect()
    }
    assert got2[0] == (1, 3.0)
    # (1.0 + 0.5*3.0) / 1.5, then (4.0 + 0.5*1.0) / 1.5
    assert abs(got2[1][1] - 2.5 / 1.5) < 1e-6 and got2[1][0] == 2
    assert abs(got2[2][1] - 4.5 / 1.5) < 1e-6

    # NULL values drop out of the frame; the row still gets a score
    dfn = spark.createDataFrame(
        [(1, 0, 2.0), (1, 1, None), (1, 2, 6.0)], "k: long, t: long, v: double"
    )
    gotn = {
        r["t"]: (r["n_w"], r["ewma"])
        for r in ewma(dfn, "k", ["t"], "v", alpha=0.5, window=4).collect()
    }
    assert gotn[1] == (1, 2.0)  # null row scored from the trailing frame
    assert gotn[2][0] == 2 and abs(gotn[2][1] - (6.0 + 1.0) / 1.5) < 1e-6

    import pytest as _pt

    with _pt.raises(ValueError, match="alpha"):
        ewma(df, "k", ["t"], "v", alpha=0.0)
    with _pt.raises(ValueError, match="window"):
        ewma(df, "k", ["t"], "v", window=0)


def test_attribution_credit_hand_computed(spark):
    from qudo_etl_pipeline_spark.operators.temporal import attribution_credit

    def r(uid, eid, minute, ty):
        return (uid, eid, f"2024-01-01 00:{minute:02d}:00", ty)

    rows = [
        # u1: V(0) C(1) P(2) V(3) P(4): conv2 <- {V0, C1}, conv4 <- {V3}
        r(1, 0, 0, "view"),
        r(1, 1, 1, "click"),
        r(1, 2, 2, "purchase"),
        r(1, 3, 3, "view"),
        r(1, 4, 4, "purchase"),
        # u2: touch OUTSIDE the window (purchase 50 min later, win 10)
        r(2, 5, 0, "click"),
        r(2, 6, 50, "purchase"),
        # u3: touch at the SAME timestamp as the conversion -> credits it
        r(3, 7, 5, "view"),
        (3, 8, "2024-01-01 00:05:00", "purchase"),
        # u4: touch with no conversion at all
        r(4, 9, 0, "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id: long, event_id: long, ts: string, event_type: string"
    ).withColumn("ts", F.to_timestamp("ts"))

    lin = {
        r["touch_type"]: r
        for r in attribution_credit(
            df, "purchase", ["view", "click"], window_sec=600
        ).collect()
    }
    # views: 0.5 (conv2) + 1.0 (conv4) + 1.0 (u3) = 2.5; clicks: 0.5
    assert lin["view"]["credit"] == 2.5
    assert lin["click"]["credit"] == 0.5
    assert lin["view"]["n_conversions"] == 3
    assert lin["click"]["n_conversions"] == 1  # u2/u4 clicks dropped

    # time-decay, half-life 60s: conv2 gets V0 (dt=120s -> w=2^-2) and
    # C1 (dt=60s -> w=2^-1): V share 1/3, C share 2/3
    dec = {
        r["touch_type"]: r["credit"]
        for r in attribution_credit(
            df, "purchase", ["view", "click"], 600, half_life_sec=60
        ).collect()
    }
    assert abs(dec["view"] - (1 / 3 + 1.0 + 1.0)) < 1e-6
    assert abs(dec["click"] - 2 / 3) < 1e-6

    import pytest as _pt

    with _pt.raises(ValueError, match="window_sec"):
        attribution_credit(df, "purchase", ["view"], 0)


def test_resample_interpolate_hand_values(spark):
    import datetime as dt

    from qudo_etl_pipeline_spark.operators.temporal import (
        resample_interpolate,
    )

    t0 = dt.datetime(2024, 1, 1, 0)
    rows = [
        ("a", t0, 10.0),
        ("a", t0 + dt.timedelta(hours=3), 40.0),  # 2-hour gap
        ("a", t0 + dt.timedelta(hours=4), 0.0),
        ("b", t0, 5.0),                            # single point
    ]
    df = spark.createDataFrame(rows, "k string, bucket timestamp, v double")
    out = resample_interpolate(df, "k", "bucket", "v", 3600)
    got = {
        (r["k"], r["bucket"].hour): (r["is_observed"], r["value_filled"])
        for r in out.collect()
    }
    assert got[("a", 0)] == (1, 10.0)
    assert got[("a", 1)] == (0, 20.0)   # 10 + (40-10) * 1/3
    assert got[("a", 2)] == (0, 30.0)
    assert got[("a", 3)] == (1, 40.0)
    assert got[("a", 4)] == (1, 0.0)
    assert got[("b", 0)] == (1, 5.0)    # grid collapses to the point
    assert len(got) == 6


def test_cusum_closed_form_equals_recursion(spark):
    from qudo_etl_pipeline_spark.operators.temporal import (
        cusum_changepoints,
    )

    vals = [10, 11, 9, 10, 10, 11, 30, 31, 29, 30, 32, 31]
    rows = [("k", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t bigint, v double")
    out = sorted(
        cusum_changepoints(df, "k", "t", "v", 0.5, 2.0).collect(),
        key=lambda r: r["t"],
    )

    # textbook recursion mirror
    n = len(vals)
    mean = sum(vals) / n
    var = (n * sum(v * v for v in vals) - sum(vals) ** 2) / (n * (n - 1))
    sd = var ** 0.5
    sp = sn = 0.0
    for r, v in zip(out, vals):
        z = (v - mean) / sd
        sp = max(0.0, sp + z - 0.5)
        sn = max(0.0, sn - z - 0.5)
        assert abs(r["cusum_pos6"] - sp) < 1e-6
        assert abs(r["cusum_neg6"] - sn) < 1e-6
        assert r["alarm"] == (1 if (sp > 2.0 or sn > 2.0) else 0)
    # the level shift must alarm on the high side
    assert any(r["alarm"] == 1 for r in out)


def test_cusum_constant_series_dropped(spark):
    from qudo_etl_pipeline_spark.operators.temporal import (
        cusum_changepoints,
    )

    rows = [("k", i, 5.0) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, t bigint, v double")
    assert cusum_changepoints(df, "k", "t", "v").count() == 0


def test_lag_crosscorr_detects_planted_lead(spark):
    import datetime as dt

    from qudo_etl_pipeline_spark.operators.temporal import lag_crosscorr

    # y is exactly x shifted by +2 buckets -> corr at lag=2 is 1.0
    t0 = dt.datetime(2024, 1, 1)
    xs = [5, 9, 2, 7, 4, 8, 1, 6, 3, 9, 2, 5, 7, 1, 8, 4]
    rows = [
        (t0 + dt.timedelta(hours=i), float(xs[i]),
         float(xs[i - 2]) if i >= 2 else 0.0)
        for i in range(len(xs))
    ]
    df = spark.createDataFrame(rows, "bucket timestamp, x double, y double")
    out = {r["lag"]: r for r in
           lag_crosscorr(df, "bucket", "x", "y", 3, 3600).collect()}
    assert out[2]["corr6"] == 1.0
    assert abs(out[0]["corr6"]) < 0.7
    # pair counts shrink with |lag|
    assert out[3]["n"] == len(xs) - 3 and out[-3]["n"] == len(xs) - 3


def test_grid_radius_join_matches_bruteforce(spark):
    import random

    from qudo_etl_pipeline_spark.operators.spatial import grid_radius_join

    rng = random.Random(7)
    left = [(i, rng.randrange(0, 2000), rng.randrange(0, 2000))
            for i in range(120)]
    right = [(j, rng.randrange(0, 2000), rng.randrange(0, 2000))
             for j in range(90)]
    ldf = spark.createDataFrame(left, "lid bigint, x bigint, y bigint")
    rdf = spark.createDataFrame(right, "rid bigint, x bigint, y bigint")
    for radius, cell in [(150, None), (150, 300), (700, 700)]:
        got = {
            (r["lid"], r["rid"], r["dist2"])
            for r in grid_radius_join(
                ldf, rdf, "lid", "rid", radius, cell
            ).collect()
        }
        want = {
            (i, j, (xi - xj) ** 2 + (yi - yj) ** 2)
            for i, xi, yi in left
            for j, xj, yj in right
            if (xi - xj) ** 2 + (yi - yj) ** 2 <= radius * radius
        }
        assert got == want, (radius, cell, len(got), len(want))


def test_grid_radius_join_rejects_narrow_cell(spark):
    import pytest

    from qudo_etl_pipeline_spark.operators.spatial import grid_radius_join

    df = spark.createDataFrame([(1, 0, 0)], "i bigint, x bigint, y bigint")
    with pytest.raises(ValueError, match="cell width"):
        grid_radius_join(df, df, "i", "i", 100, 50)


def test_grid_radius_join_negative_coords(spark):
    from qudo_etl_pipeline_spark.operators.spatial import grid_radius_join

    # floor-division cells must stay consistent below zero
    left = [(1, -5, -5)]
    right = [(2, 5, 5), (3, -250, -5), (4, -90, -90)]
    ldf = spark.createDataFrame(left, "lid bigint, x bigint, y bigint")
    rdf = spark.createDataFrame(right, "rid bigint, x bigint, y bigint")
    got = {
        (r["lid"], r["rid"])
        for r in grid_radius_join(ldf, rdf, "lid", "rid", 150).collect()
    }
    assert got == {(1, 2), (1, 4)}


def test_theil_sen_resists_outlier(spark):
    from qudo_etl_pipeline_spark.operators.temporal import theil_sen_slope

    # perfect slope-2 line with one massive outlier: OLS would bend,
    # Theil-Sen must stay at 2
    pts = [(float(x), 2.0 * x + 1) for x in range(20)]
    pts[10] = (10.0, 500.0)
    df = spark.createDataFrame(
        [("k", x, y) for x, y in pts], "k string, x double, y double"
    )
    r = theil_sen_slope(df, "k", "x", "y").collect()[0]
    assert r["n_points"] == 20 and r["n_pairs"] == 190
    assert abs(r["slope6"] - 2.0) < 1e-9


def test_theil_sen_oversized_key_raises(spark):
    """The series contract is ENFORCED: a key with more points than
    max_points_per_key fails loudly before the quadratic pair join,
    instead of silently fanning out O(n^2)."""
    import pytest

    from qudo_etl_pipeline_spark.operators.temporal import theil_sen_slope

    df = spark.createDataFrame(
        [("k", float(i), float(i)) for i in range(50)],
        "k string, x double, y double",
    )
    with pytest.raises(Exception, match="max_points_per_key"):
        theil_sen_slope(df, "k", "x", "y", max_points_per_key=10).collect()
    with pytest.raises(ValueError, match="on_excess"):
        theil_sen_slope(df, "k", "x", "y", on_excess="nope")


def test_theil_sen_subsample_caps_pairs_and_keeps_small_keys_exact(spark):
    from qudo_etl_pipeline_spark.operators.temporal import theil_sen_slope

    big = [("big", float(i), 3.0 * i) for i in range(60)]
    small = [("small", float(i), 2.0 * i + 1) for i in range(8)]
    df = spark.createDataFrame(
        big + small, "k string, x double, y double"
    )
    out = {
        r["k"]: r
        for r in theil_sen_slope(
            df, "k", "x", "y", max_points_per_key=20,
            on_excess="subsample",
        ).collect()
    }
    # oversized key: 20 seeded-hash-chosen points -> at most C(20,2)
    # pairs; a perfect line still yields the exact slope
    assert out["big"]["n_points"] == 60  # ORIGINAL size reported
    assert out["big"]["n_pairs"] <= 190
    assert abs(out["big"]["slope6"] - 3.0) < 1e-9
    # under-cap key untouched: full pair frame, exact answer
    assert out["small"]["n_pairs"] == 28
    assert abs(out["small"]["slope6"] - 2.0) < 1e-9
    # determinism: same input -> identical subsample -> identical stats
    again = {
        r["k"]: r
        for r in theil_sen_slope(
            df, "k", "x", "y", max_points_per_key=20,
            on_excess="subsample",
        ).collect()
    }
    assert again["big"]["n_pairs"] == out["big"]["n_pairs"]
    assert again["big"]["slope6"] == out["big"]["slope6"]


def test_seasonal_decompose_recovers_planted_components(spark):
    """Pure signal = linear trend + exact period-4 seasonal pattern:
    the classical decomposition must recover the trend exactly on the
    interior (centered MA of a line is the line; the seasonal mean of
    a constant-by-position pattern is the pattern) and leave a zero
    remainder."""
    import datetime as dt

    from qudo_etl_pipeline_spark.operators.temporal import (
        seasonal_decompose,
    )

    period, step = 4, 3600
    season = [10.0, -2.0, -5.0, -3.0]  # sums to 0 -> already centered
    rows = []
    for i in range(40):
        t = dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)
        v = 100.0 + 2.0 * i + season[i % period]
        rows.append(("k", t, v))
    df = spark.createDataFrame(rows, "k string, t timestamp, v double")
    out = {
        r["t"].hour + 24 * (r["t"].day - 1): r
        for r in seasonal_decompose(df, "k", "t", "v", period, step).collect()
    }
    assert len(out) == 40
    # edges: half rows on each side have no full symmetric window
    for i in (0, 1, 38, 39):
        assert out[i]["trend6"] is None
    # classical 2xMA: endpoints at +-half are the SAME seasonal
    # position at half weight each, so every position carries weight 1
    # and the balanced season cancels EXACTLY -> trend is the pure line
    for i in range(2, 38):
        assert out[i]["trend6"] == round(100.0 + 2.0 * i, 6), i
    # the detrended series is exactly the planted pattern, so the
    # seasonal indices recover it and the remainder vanishes
    for i in range(2, 38):
        assert out[i]["seasonal6"] == round(season[i % period], 6), i
        assert abs(out[i]["remainder6"]) < 1e-6, i
    # seasonal indices repeat with the period
    for i in range(2, 34):
        assert out[i]["seasonal6"] == out[i + 4]["seasonal6"]


def test_seasonal_decompose_odd_period_symmetric_window(spark):
    """Odd period: a symmetric period-row window (no phase shift) —
    trend on a line + balanced period-3 season is exactly the line."""
    import datetime as dt

    from qudo_etl_pipeline_spark.operators.temporal import (
        seasonal_decompose,
    )

    period, step = 3, 3600
    season = [6.0, -2.0, -4.0]
    rows = []
    for i in range(30):
        t = dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)
        rows.append(("k", t, 50.0 + 1.5 * i + season[i % period]))
    df = spark.createDataFrame(rows, "k string, t timestamp, v double")
    out = {
        r["t"].hour + 24 * (r["t"].day - 1): r
        for r in seasonal_decompose(df, "k", "t", "v", period, step).collect()
    }
    assert out[0]["trend6"] is None and out[29]["trend6"] is None
    for i in range(1, 29):
        assert out[i]["trend6"] == round(50.0 + 1.5 * i, 6), i
        assert out[i]["seasonal6"] == round(season[i % period], 6), i
        assert abs(out[i]["remainder6"]) < 1e-6, i


def test_ewma_all_null_frame_is_null_not_crash(spark):
    """A row whose whole trailing frame is NULL values has den = 0:
    its EWMA is NULL, not an ANSI divide-by-zero (r11 NULL-salt
    sweep)."""
    from qudo_etl_pipeline_spark.operators.temporal import ewma

    rows = [(1, 1, None), (1, 2, None), (1, 3, 4.0)]
    df = spark.createDataFrame(rows, "k int, t int, v double")
    out = {r["t"]: r for r in ewma(df, "k", ["t"], "v", window=2).collect()}
    assert out[1]["ewma"] is None and out[1]["n_w"] == 0
    assert out[2]["ewma"] is None
    assert out[3]["ewma"] == 4.0
