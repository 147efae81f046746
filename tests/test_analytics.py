"""Funnel / retention / CDC-compaction edge semantics.

The sf0.01 catalog entries hash-check these against stage-join /
window-SQL oracles; here we pin the edges the real data never hits:
out-of-order funnel events, ts ties in the CDC merge, deletes followed
by re-inserts, and cohort-size consistency.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.operators.analytics import (
    cdc_compact,
    funnel_counts,
    funnel_depth,
    retention_cohorts,
)

STAGES = ["signup", "click", "purchase"]


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string"
    )


def test_funnel_depth_order_sensitivity(spark):
    ev = _events(spark, [
        # u1: full funnel in order
        (1, _ts(1), "signup"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        # u2: purchase BEFORE click -> depth stops at 2... signup, purchase,
        # click: click after signup counts, purchase before click doesn't
        (2, _ts(1), "signup"), (2, _ts(2), "purchase"), (2, _ts(3), "click"),
        # u3: click only, never signed up -> depth 0
        (3, _ts(1), "click"),
        # u4: two signups then click: second signup is ignored, click counts
        (4, _ts(1), "signup"), (4, _ts(2), "signup"), (4, _ts(3), "click"),
    ])
    d = {r["user_id"]: r["depth"] for r in funnel_depth(ev, STAGES).collect()}
    assert d == {1: 3, 2: 2, 3: 0, 4: 2}


def test_funnel_counts_are_cumulative(spark):
    ev = _events(spark, [
        (1, _ts(1), "signup"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        (2, _ts(1), "signup"), (2, _ts(3), "click"),
        (3, _ts(1), "signup"),
    ])
    c = {r["stage"]: r["n_users"] for r in funnel_counts(ev, STAGES).collect()}
    assert c == {1: 3, 2: 2, 3: 1}


def test_retention_offsets(spark):
    d1, d2, d3 = (dt.datetime(2024, 1, d, 12) for d in (1, 2, 3))
    ev = _events(spark, [
        (1, d1, "view"), (1, d3, "view"),          # cohort 01-01, back day 2
        (2, d1, "view"), (2, d1, "click"),          # same-day dup: one visit
        (3, d2, "view"), (3, d3, "view"),           # cohort 01-02, back day 1
    ])
    m = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in retention_cohorts(ev).collect()
    }
    assert m[("2024-01-01", 0)] == 2
    assert m[("2024-01-01", 2)] == 1
    assert m[("2024-01-02", 0)] == 1
    assert m[("2024-01-02", 1)] == 1
    assert ("2024-01-01", 1) not in m


def test_cdc_compact_semantics(spark):
    snap = spark.createDataFrame(
        [(1, "a", _ts(0)), (2, "b", _ts(0)), (3, "c", _ts(0)),
         (4, "d", _ts(5))],
        "k int, v string, ts timestamp",
    )
    chg = spark.createDataFrame(
        [
            (1, "a2", _ts(1), "U"),     # plain upsert
            (2, None, _ts(1), "D"),     # delete
            (3, "c2", _ts(1), "U"),     # upsert then later delete
            (3, None, _ts(2), "D"),
            (4, "d2", _ts(5), "U"),     # ts TIE with snapshot: change wins
            (5, "e", _ts(1), "U"),      # brand-new key
        ],
        "k int, v string, ts timestamp, op string",
    )
    out = {r["k"]: r["v"]
           for r in cdc_compact(snap, chg, ["k"], "ts").collect()}
    assert out == {1: "a2", 4: "d2", 5: "e"}


def test_scd2_history_intervals(spark):
    from qudo_etl_pipeline_spark.operators.analytics import scd2_history

    log = spark.createDataFrame(
        [
            (1, "a", _ts(0), "U"),   # version 1, closed by v2
            (1, "b", _ts(5), "U"),   # version 2, closed by the delete
            (1, None, _ts(9), "D"),  # delete: closes v2, emits nothing
            (2, "x", _ts(1), "U"),   # single open version
        ],
        "k int, v string, ts timestamp, op string",
    )
    rows = sorted(
        scd2_history(log, ["k"], "ts").collect(),
        key=lambda r: (r["k"], r["valid_from"]),
    )
    assert [(r["k"], r["v"], r["is_current"]) for r in rows] == [
        (1, "a", 0), (1, "b", 0), (2, "x", 1),
    ]
    # contiguity: v1 closes exactly where v2 opens
    assert rows[0]["valid_to"] == rows[1]["valid_from"]
    # the delete closed v2 at its own ts
    assert rows[1]["valid_to"] == _ts(9)
    # open version carries the sentinel
    assert rows[2]["valid_to"].year == 9999


def test_incremental_merge_is_split_invariant(spark):
    from qudo_etl_pipeline_spark.operators.incremental import (
        finalize_state,
        merge_states,
        partial_state,
    )

    df = spark.range(300).select(
        (F.col("id") % 7).alias("g"),
        (F.col("id") * 0.125 - 3).alias("v"),  # exact binary fractions
    )

    def run(splits):
        parts = [
            partial_state(df.filter(cond), ["g"], "v") for cond in splits
        ]
        out = finalize_state(merge_states(parts, ["g"]), ["g"])
        return sorted(
            (r["g"], r["n"], r["total"], r["total_sq"], r["mean"])
            for r in out.collect()
        )

    whole = run([F.lit(True)])
    halves = run([F.col("id") < 150, F.col("id") >= 150])
    thirds = run([F.col("id") % 3 == i for i in range(3)])
    assert whole == halves == thirds
    # merging with an EMPTY delta is the identity
    with_empty = run([F.lit(True), F.lit(False)])
    assert with_empty == whole


def test_cdc_compact_plan_single_shuffle(spark):
    import contextlib, io

    snap = spark.createDataFrame([(1, "a", _ts(0))], "k int, v string, ts timestamp")
    chg = spark.createDataFrame(
        [(1, "b", _ts(1), "U")], "k int, v string, ts timestamp, op string"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cdc_compact(snap, chg, ["k"], "ts").explain("formatted")
    plan = buf.getvalue()
    # union + window: exactly one exchange (hashpartitioning on the key);
    # count numbered node headers so the detail section isn't double-counted
    import re

    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1
    # Spark pre-limits each partition to the window top-1 BEFORE the
    # shuffle (partial WindowGroupLimit) — the map-side-combine analogue
    # for the merge; pin it so a regression reappears as a test failure
    assert "WindowGroupLimit" in plan


def test_funnel_same_timestamp_does_not_advance(spark):
    import datetime as dt

    from qudo_etl_pipeline_spark.operators.analytics import funnel_depth

    t0, t5 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 1, 0, 5)
    ev = spark.createDataFrame(
        [(1, t0, "signup"), (1, t5, "click"), (1, t5, "purchase"),
         (2, t0, "signup"), (2, t5, "click"),
         (2, dt.datetime(2024, 1, 1, 0, 6), "purchase")],
        "user_id long, ts timestamp, event_type string",
    )
    out = {r["user_id"]: r["depth"] for r in
           funnel_depth(ev, ["signup", "click", "purchase"]).collect()}
    # purchase at the SAME ts as the matched click is not strictly after
    assert out == {1: 2, 2: 3}


def test_ols_trend_matches_numpy_closed_form(spark):
    import numpy as np

    from qudo_etl_pipeline_spark.operators.analytics import ols_trend

    rng = np.random.default_rng(7)
    x = rng.uniform(1, 50, 200).round(2)
    y = (3.5 * x + 10 + rng.normal(0, 5, 200)).round(2)
    rows = [("a", float(a), float(b)) for a, b in zip(x, y)]
    # degenerate group: constant x -> slope/intercept/r2 NULL
    rows += [("b", 2.0, float(v)) for v in (1.0, 2.0, 3.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in ols_trend(df, ["g"], "x", "y").collect()}

    slope_np, intercept_np = np.polyfit(x, y, 1)
    r_np = np.corrcoef(x, y)[0, 1] ** 2
    assert out["a"]["n"] == 200
    # tolerances reflect the documented cross-engine moment pre-round
    # (Σxy to 1e-2, Σy² to 1): intercept absorbs ~n/var(x) of that
    assert abs(out["a"]["slope"] - slope_np) < 1e-5
    assert abs(out["a"]["intercept"] - intercept_np) < 1e-3
    assert abs(out["a"]["r2"] - r_np) < 1e-5
    assert out["b"]["slope"] is None
    assert out["b"]["intercept"] is None
    assert out["b"]["r2"] is None


def test_ols_trend_perfect_line_r2_one(spark):
    from qudo_etl_pipeline_spark.operators.analytics import ols_trend

    df = spark.createDataFrame(
        [("g", float(i), 2.0 * i - 1.0) for i in range(1, 6)],
        "g string, x double, y double",
    )
    r = ols_trend(df, ["g"], "x", "y").collect()[0]
    assert abs(r["slope"] - 2.0) < 1e-9
    assert abs(r["intercept"] + 1.0) < 1e-9
    assert abs(r["r2"] - 1.0) < 1e-9


def test_robust_zscore_flags_planted_outlier(spark):
    from qudo_etl_pipeline_spark.operators.analytics import robust_zscore

    # tight cluster around 10 plus one gross outlier; constant group
    # has MAD 0 -> NULL scores, flag 0
    rows = [("a", float(v)) for v in
            (9.8, 9.9, 10.0, 10.0, 10.1, 10.2, 500.0)]
    rows += [("b", 5.0)] * 4
    df = spark.createDataFrame(rows, "g string, x double")
    out = robust_zscore(df, ["g"], "x").collect()
    flagged = [(r["g"], r["x"]) for r in out if r["is_outlier"] == 1]
    assert flagged == [("a", 500.0)]
    # median=10, MAD=median(|x-10|)=0.1 -> rz(500) = .6745*490/.1
    big = [r for r in out if r["x"] == 500.0][0]
    assert abs(big["rz6"] - 0.6745 * 490.0 / 0.1) < 1e-3
    assert all(r["rz6"] is None and r["is_outlier"] == 0
               for r in out if r["g"] == "b")


def test_corr_matrix_matches_numpy(spark):
    import numpy as np

    from qudo_etl_pipeline_spark.operators.analytics import corr_matrix

    rng = np.random.default_rng(11)
    x = rng.uniform(0, 100, 300).round(2)
    y = (0.8 * x + rng.normal(0, 10, 300)).round(2)   # correlated
    z = rng.uniform(0, 1, 300).round(2)               # independent
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double",
    )
    out = {(r["col_x"], r["col_y"]): r["corr"]
           for r in corr_matrix(df, ["x", "y", "z"]).collect()}
    m = np.corrcoef(np.vstack([x, y, z]))
    assert abs(out[("x", "y")] - m[0, 1]) < 1e-5
    assert abs(out[("x", "z")] - m[0, 2]) < 1e-5
    assert abs(out[("y", "z")] - m[1, 2]) < 1e-5
    # constant column -> NULL
    df2 = df.withColumn("c", F.lit(5.0))
    out2 = {(r["col_x"], r["col_y"]): r["corr"]
            for r in corr_matrix(df2, ["x", "c"]).collect()}
    assert out2[("x", "c")] is None


def test_corr_matrix_underscore_names_no_alias_collision(spark):
    """Name-based moment aliases collided for column sets like
    ['unit','price_total','unit_price','total'] (two pairs both alias
    _p_unit_price_total); index-keyed aliases must handle them."""
    import numpy as np

    from qudo_etl_pipeline_spark.operators.analytics import corr_matrix

    rng = np.random.default_rng(7)
    cols = ["unit", "price_total", "unit_price", "total"]
    data = rng.uniform(0, 50, (200, 4)).round(2)
    data[:, 3] = (data[:, 0] * 2 + rng.normal(0, 5, 200)).round(2)
    df = spark.createDataFrame(
        [tuple(float(v) for v in row) for row in data],
        ", ".join(f"`{c}` double" for c in cols),
    )
    out = {(r["col_x"], r["col_y"]): r["corr"]
           for r in corr_matrix(df, cols).collect()}
    assert len(out) == 6  # all C(4,2) pairs present, no dup columns
    m = np.corrcoef(data.T)
    for (i, a) in enumerate(cols):
        for j in range(i + 1, 4):
            assert abs(out[(a, cols[j])] - m[i, j]) < 1e-5


def test_robust_zscore_approx_engine_and_null_groups(spark):
    from qudo_etl_pipeline_spark.operators.analytics import robust_zscore

    rows = [("a", float(v)) for v in
            (9.8, 9.9, 10.0, 10.0, 10.1, 10.2, 500.0)]
    # NULL group key: must still be scored (null-safe join), not dropped
    rows += [(None, float(v)) for v in (1.0, 1.0, 1.1, 0.9, 50.0)]
    df = spark.createDataFrame(rows, "g string, x double")

    exact = robust_zscore(df, ["g"], "x").collect()
    assert len(exact) == len(rows)  # NULL-key rows survive the join-back
    null_flags = {r["x"]: r["is_outlier"] for r in exact if r["g"] is None}
    assert null_flags[50.0] == 1 and null_flags[1.0] == 0

    # approx engine: the plan's aggregates must be the GK sketch, not
    # the exact per-group distinct-value histogram
    adf = robust_zscore(df, ["g"], "x", percentile="approx")
    plan = adf._jdf.queryExecution().optimizedPlan().toString()
    assert "percentile_approx" in plan
    assert "percentile(" not in plan.replace("percentile_approx(", "")

    # same schema and row count, flags agree on a fixture whose median
    # is unambiguous (odd n, well-separated)
    approx = adf.collect()
    assert len(approx) == len(rows)
    flags_e = sorted((r["g"] or "", r["x"], r["is_outlier"]) for r in exact)
    flags_a = sorted((r["g"] or "", r["x"], r["is_outlier"]) for r in approx)
    assert [f[:2] for f in flags_e] == [f[:2] for f in flags_a]
    assert [f[2] for f in flags_e] == [f[2] for f in flags_a]

    import pytest

    with pytest.raises(ValueError):
        robust_zscore(df, ["g"], "x", percentile="bogus")


def test_sequence_match_hand_cases(spark):
    from qudo_etl_pipeline_spark.operators.analytics import sequence_match

    sym = {"view": "V", "click": "C", "purchase": "P", "error": "E"}
    # u1: V C P V P   -> two non-overlapping V[VC]*P matches
    # u2: V E P       -> error breaks the run: no match
    # u3: C C         -> no match, but has mapped events (seq_len 2)
    # u4: only unmapped types -> absent from output entirely
    rows = []

    def ev(uid, i, t):
        rows.append((uid, i, f"2024-01-01 00:0{i}:00", t))

    for i, t in enumerate(["view", "click", "purchase", "view", "purchase"]):
        ev(1, i, t)
    for i, t in enumerate(["view", "error", "purchase"]):
        ev(2, i, t)
    for i, t in enumerate(["click", "click"]):
        ev(3, i, t)
    ev(4, 0, "signup")
    df = spark.createDataFrame(
        rows, "user_id: long, event_id: long, ts: string, event_type: string"
    ).withColumn("ts", F.to_timestamp("ts"))

    got = {
        r["user_id"]: r
        for r in sequence_match(df, sym, "V[VC]*P").collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1]["seq_len"] == 5 and got[1]["n_matches"] == 2
    assert got[1]["matched"] == 1 and got[1]["first_match"] == "VCP"
    assert got[2]["n_matches"] == 0 and got[2]["first_match"] == ""
    assert got[3]["seq_len"] == 2 and got[3]["matched"] == 0

    # negation via character class: purchase with NO click before it
    got2 = {
        r["user_id"]: r["n_matches"]
        for r in sequence_match(df, sym, "^[^C]*P").collect()
    }
    assert got2[1] == 0 and got2[2] == 1


def test_event_transitions_hand_computed(spark):
    from qudo_etl_pipeline_spark.operators.analytics import event_transitions

    rows = [
        # u1: A B A B  -> A->B x2, B->A x1
        (1, 0, "2024-01-01 00:00:00", "A"),
        (1, 1, "2024-01-01 00:01:00", "B"),
        (1, 2, "2024-01-01 00:02:00", "A"),
        (1, 3, "2024-01-01 00:03:00", "B"),
        # u2: A C  -> A->C x1; single-event users contribute nothing
        (2, 4, "2024-01-01 00:00:00", "A"),
        (2, 5, "2024-01-01 00:01:00", "C"),
        (3, 6, "2024-01-01 00:00:00", "B"),
    ]
    df = spark.createDataFrame(
        rows, "user_id: long, event_id: long, ts: string, event_type: string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["prev_type"], r["next_type"]): (r["n"], r["p"])
        for r in event_transitions(df).collect()
    }
    assert got[("A", "B")] == (2, 0.666667)
    assert got[("A", "C")] == (1, 0.333333)
    assert got[("B", "A")] == (1, 1.0)
    assert len(got) == 3  # u3's lone event emits no step


def test_item_cooccurrence_cap_and_stats(spark):
    from qudo_etl_pipeline_spark.operators.analytics import item_cooccurrence

    rows = (
        [(1, i) for i in (10, 20)]
        + [(2, i) for i in (10, 20, 30)]
        + [(3, 10)]
        + [(9, i) for i in range(50)]  # power user: capped out entirely
        + [(1, 10)]  # duplicate event: baskets are DISTINCT items
    )
    df = spark.createDataFrame(rows, "user_id: long, item: long")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in item_cooccurrence(
            df, "user_id", "item", max_basket=10
        ).collect()
    }
    # capped user 9 contributes no pairs and is excluded from n_users
    assert all(a < 40 and b < 40 for a, b in out)
    r = out[(10, 20)]
    # 3 kept users; {10,20} in u1+u2; 10 in u1,u2,u3; 20 in u1,u2
    assert (r["n_ab"], r["n_a"], r["n_b"]) == (2, 3, 2)
    assert r["support"] == 0.666667
    assert r["conf_a_b"] == 0.666667
    assert r["lift"] == 1.0  # 2*3 / (3*2)
    assert out[(10, 30)]["n_ab"] == 1 and out[(20, 30)]["n_ab"] == 1
    assert len(out) == 3


def test_table_diff_classification(spark):
    from qudo_etl_pipeline_spark.operators.incremental import table_diff

    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", None), (3, "c", "z"), (4, "d", "w")],
        "k: long, v: string, w: string",
    )
    new = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "CHANGED"), (5, "e", "q"), (4, "d", "w")],
        "k: long, v: string, w: string",
    )
    got = {
        r["k"]: r["change_type"]
        for r in table_diff(old, new, ["k"]).collect()
    }
    # 1 and 4 unchanged -> absent; NULL -> value counts as an update
    assert got == {2: "update", 3: "delete", 5: "insert"}

    # NULL vs the literal text 'NULL' must be an update, not equal
    o2 = spark.createDataFrame([(1, None)], "k: long, v: string")
    n3 = spark.createDataFrame([(1, "NULL")], "k: long, v: string")
    assert (
        table_diff(o2, n3, ["k"]).collect()[0]["change_type"] == "update"
    )

    import pytest as _pt

    with _pt.raises(ValueError, match="no columns"):
        table_diff(
            old.select("k"), new.select("k"), ["k"]
        )

    # scale shape: a single join, no cartesian
    plan = (
        table_diff(old, new, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Join") >= 1 and "CartesianProduct" not in plan


def test_kaplan_meier_textbook_curve(spark):
    from qudo_etl_pipeline_spark.operators.analytics import kaplan_meier

    # classic toy: durations (event=1 / censored=0)
    # t=6: 3 events, 1 censored of 10 at risk -> S = 7/10 * ... careful:
    # KM convention: deaths at t come out of the at-risk set AT t.
    rows = [
        (6, 1), (6, 1), (6, 1), (6, 0),
        (7, 1), (9, 0), (10, 1), (10, 0), (11, 0), (13, 1),
    ]
    df = spark.createDataFrame(rows, "dur bigint, ev int")
    out = {r["dur"]: r for r in kaplan_meier(df, "dur", "ev").collect()}
    assert out[6]["n_risk"] == 10
    assert out[6]["n_event"] == 3 and out[6]["n_censor"] == 1
    assert abs(out[6]["surv6"] - 0.7) < 1e-9          # 7/10
    assert out[7]["n_risk"] == 6
    assert abs(out[7]["surv6"] - 0.7 * 5 / 6) < 1e-6
    assert out[9]["n_risk"] == 5                       # censor only
    assert abs(out[9]["surv6"] - 0.7 * 5 / 6) < 1e-6   # S unchanged
    assert out[10]["n_risk"] == 4
    assert abs(out[10]["surv6"] - 0.7 * (5 / 6) * (3 / 4)) < 1e-6
    # last subject dies: factor hits 0 -> S pinned exactly 0
    assert out[13]["n_risk"] == 1 and out[13]["surv6"] == 0.0


def test_two_proportion_ztest_hand_computed(spark):
    import math

    from qudo_etl_pipeline_spark.operators.analytics import (
        two_proportion_ztest,
    )

    # A: 40/100, B: 60/100 -> pooled p=.5, se=sqrt(.5*.5*.02)
    rows = [("A", 1)] * 40 + [("A", 0)] * 60 + [("B", 1)] * 60 + [
        ("B", 0)
    ] * 40
    df = spark.createDataFrame(rows, "v string, s int")
    r = two_proportion_ztest(df, "v", "s").collect()[0]
    assert (r["group_a"], r["group_b"]) == ("A", "B")
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (
        100, 40, 100, 60,
    )
    se = math.sqrt(0.5 * 0.5 * 0.02)
    assert abs(r["z6"] - round(-0.2 / se, 6)) < 1e-9
    assert r["is_significant"] == 1
    assert abs(r["rate_diff6"] + 0.2) < 1e-9


def test_two_proportion_ztest_degenerate_rate_no_blowup(spark):
    from qudo_etl_pipeline_spark.operators.analytics import (
        two_proportion_ztest,
    )

    # everyone converts -> se = 0 -> z NULL, not significant, no error
    rows = [("A", 1)] * 5 + [("B", 1)] * 5
    df = spark.createDataFrame(rows, "v string, s int")
    r = two_proportion_ztest(df, "v", "s").collect()[0]
    assert r["z6"] is None and r["is_significant"] == 0


def test_two_proportion_ztest_three_groups_all_null(spark):
    from qudo_etl_pipeline_spark.operators.analytics import (
        two_proportion_ztest,
    )

    # 3 labels violate the exactly-two contract: the min/max struct
    # collapse would silently drop B and test A vs C — the guard must
    # null EVERY output instead of answering a different question
    rows = [("A", 1), ("A", 0), ("B", 1), ("C", 0), ("C", 1)]
    df = spark.createDataFrame(rows, "v string, s int")
    r = two_proportion_ztest(df, "v", "s").collect()[0]
    assert all(r[c] is None for c in r.asDict())


def test_winsorize_hand_bounds(spark):
    from qudo_etl_pipeline_spark.operators.analytics import winsorize

    vals = list(range(1, 101))  # 1..100 -> p05=5.95, p95=95.05
    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "g string, v double"
    )
    out = winsorize(df, ["g"], "v", 0.05, 0.95).collect()
    assert len(out) == 100
    lo = {r["v"]: r for r in out}[1.0]
    hi = {r["v"]: r for r in out}[100.0]
    mid = {r["v"]: r for r in out}[50.0]
    assert lo["w"] == lo["lo6"] == 5.95 and lo["clip_flag"] == -1
    assert hi["w"] == hi["hi6"] == 95.05 and hi["clip_flag"] == 1
    assert mid["w"] == 50.0 and mid["clip_flag"] == 0
    n_lo = sum(1 for r in out if r["clip_flag"] == -1)
    n_hi = sum(1 for r in out if r["clip_flag"] == 1)
    assert (n_lo, n_hi) == (5, 5)


def test_winsorize_null_group_and_value(spark):
    from qudo_etl_pipeline_spark.operators.analytics import winsorize

    rows = [(None, 1.0), (None, 2.0), (None, 3.0), ("g", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, ["g"], "v", 0.0, 1.0).collect()
    assert len(out) == 4  # NULL group kept (eqNullSafe), NULL value kept
    nullv = [r for r in out if r["v"] is None][0]
    assert nullv["w"] is None and nullv["clip_flag"] == 0


def test_exact_quantile_matches_sorted_rank(spark):
    from qudo_etl_pipeline_spark.operators.analytics import exact_quantile

    # deterministic non-uniform values, incl. heavy ties
    vals = [((i * 37) % 101) * 0.5 for i in range(1000)] + [7.0] * 500
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    srt = sorted(vals)
    for q_num, q_den in [(1, 2), (1, 4), (9, 10), (0, 1), (1, 1)]:
        k = (q_num * (len(vals) - 1)) // q_den
        r = exact_quantile(
            df, "x", q_num, q_den, buckets=8, max_leaf=50
        ).collect()[0]
        assert (r["n"], r["k"]) == (len(vals), k)
        assert r["value"] == srt[k], (q_num, q_den)


def test_exact_quantile_all_equal_and_empty(spark):
    from qudo_etl_pipeline_spark.operators.analytics import exact_quantile

    df = spark.createDataFrame([(3.5,)] * 100, "x double")
    r = exact_quantile(df, "x", 1, 2, buckets=4, max_leaf=10).collect()[0]
    assert r["value"] == 3.5
    empty = spark.createDataFrame([], "x double")
    assert exact_quantile(empty, "x", 1, 2).count() == 0


def test_exact_quantile_boundary_values_terminate(spark):
    """Values sitting exactly on refinement-bucket boundaries (and one
    ulp either side) must never land in bucket -1 after the range
    narrows — the two-sided clamp keeps every surviving row visible to
    the rank walk, so the loop terminates with the exact answer."""
    import math

    from qudo_etl_pipeline_spark.operators.analytics import exact_quantile

    base = [float(i) for i in range(0, 64)]
    edgy = [math.nextafter(v, -math.inf) for v in base] + [
        math.nextafter(v, math.inf) for v in base
    ]
    vals = base * 4 + edgy
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    srt = sorted(vals)
    for q_num, q_den in [(1, 3), (1, 2), (2, 3), (99, 100)]:
        k = (q_num * (len(vals) - 1)) // q_den
        r = exact_quantile(
            df, "x", q_num, q_den, buckets=4, max_leaf=8
        ).collect()[0]
        assert r["value"] == srt[k], (q_num, q_den)


def test_quantile_normalize_textbook(spark):
    from qudo_etl_pipeline_spark.operators.analytics import (
        quantile_normalize,
    )

    # classic worked example: A=[5,2,3,4], B=[4,1,4,2] ->
    # sorted A: 2,3,4,5; sorted B: 1,2,4,4; rank means: 1.5, 2.5, 4, 4.5
    rows = [(1, 5.0, 4.0), (2, 2.0, 1.0), (3, 3.0, 4.0), (4, 4.0, 2.0)]
    df = spark.createDataFrame(rows, "id bigint, a double, b double")
    out = quantile_normalize(df, "id", ["a", "b"])
    got = {
        (r["col_name"], r["id"]): (r["rank"], r["qnorm"])
        for r in out.collect()
    }
    assert got[("a", 2)] == (1, 1.5)
    assert got[("a", 3)] == (2, 2.5)
    assert got[("a", 4)] == (3, 4.0)
    assert got[("a", 1)] == (4, 4.5)
    assert got[("b", 2)] == (1, 1.5)
    assert got[("b", 4)] == (2, 2.5)
    # tie 4.0/4.0 in B -> id breaks: id=1 before id=3
    assert got[("b", 1)] == (3, 4.0)
    assert got[("b", 3)] == (4, 4.5)


def test_weighted_quantile_hand_cases(spark):
    from qudo_etl_pipeline_spark.operators.analytics import (
        weighted_quantile,
    )

    # g1: values 1..4 with weights 1,1,6,2 (tot 10) -> median at cum>=5 -> 3
    # g2: tie group at v=5 crosses midway -> still 5
    rows = [
        ("g1", 1.0, 1.0), ("g1", 2.0, 1.0), ("g1", 3.0, 6.0),
        ("g1", 4.0, 2.0),
        ("g2", 5.0, 1.0), ("g2", 5.0, 9.0), ("g2", 6.0, 10.0),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    out = {
        r["g"]: r for r in weighted_quantile(df, ["g"], "v", "w").collect()
    }
    assert out["g1"]["wq_value"] == 3.0
    assert out["g1"]["total_weight"] == 10.0 and out["g1"]["n"] == 4
    assert out["g2"]["wq_value"] == 5.0
    # p90: g1 cum target 9 -> value 4
    p90 = {
        r["g"]: r["wq_value"]
        for r in weighted_quantile(df, ["g"], "v", "w", 9, 10).collect()
    }
    assert p90["g1"] == 4.0


def test_mann_whitney_matches_reference_formula(spark):
    from qudo_etl_pipeline_spark.operators.analytics import mann_whitney_u

    # small two-sample with ties; mirror computed by the textbook
    # midrank formula in plain python
    a = [1, 2, 2, 3, 5, 7, 7, 8]
    b = [2, 4, 4, 5, 6, 7, 9, 9, 10]
    rows = [("A", float(v)) for v in a] + [("B", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mann_whitney_u(df, "g", "v", "A", "B").collect()[0]

    allv = sorted(a + b)
    import collections

    cnt = collections.Counter(allv)
    # midrank per value
    mid, seen = {}, 0
    for v in sorted(cnt):
        mid[v] = seen + (cnt[v] + 1) / 2
        seen += cnt[v]
    r_a = sum(mid[v] for v in a)
    u_a = r_a - len(a) * (len(a) + 1) / 2
    n1, n2, n = len(a), len(b), len(a) + len(b)
    t3 = sum(c**3 - c for c in cnt.values())
    var = n1 * n2 / 12 * ((n + 1) - t3 / (n * (n - 1)))
    z = (u_a - n1 * n2 / 2) / var**0.5
    assert (r["n_a"], r["n_b"]) == (n1, n2)
    assert r["u_a"] == u_a
    assert abs(r["z6"] - round(z, 6)) < 1e-9
    assert r["is_significant"] == 0


def test_mann_whitney_detects_shift(spark):
    from qudo_etl_pipeline_spark.operators.analytics import mann_whitney_u

    rows = [("A", float(v % 10)) for v in range(200)] + [
        ("B", float(v % 10 + 5)) for v in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mann_whitney_u(df, "g", "v", "A", "B").collect()[0]
    assert r["is_significant"] == 1 and r["z6"] < 0


def test_gini_known_values(spark):
    from qudo_etl_pipeline_spark.operators.analytics import gini_coefficient

    # perfectly equal -> 0
    eq = spark.createDataFrame([(5,)] * 10, "x bigint")
    assert gini_coefficient(eq, "x").collect()[0]["gini6"] == 0.0
    # one key holds everything among n=10 -> G = (n-1)/n * ... for
    # x = [0]*9 + [100]: G = 9/10
    conc = spark.createDataFrame([(0,)] * 9 + [(100,)], "x bigint")
    assert abs(gini_coefficient(conc, "x").collect()[0]["gini6"] - 0.9) < 1e-9
    # textbook small case [1,2,3,4] -> G = 0.25
    s = spark.createDataFrame([(1,), (2,), (3,), (4,)], "x bigint")
    assert abs(gini_coefficient(s, "x").collect()[0]["gini6"] - 0.25) < 1e-9


def test_hill_alpha_recovers_pareto_exponent(spark):
    from qudo_etl_pipeline_spark.operators.analytics import hill_tail_index

    # deterministic Pareto sample with ccdf exponent 2 via inverse CDF
    # on a grid: x = d_min / sqrt(1-u), u = (i+0.5)/n. The estimator is
    # the Clauset-Shalizi-Newman PDF-exponent form alpha = 1 + n/sum(ln)
    # -> expects ~3 (ccdf exponent + 1); integer truncation biases high.
    import math

    d_min, n = 10, 4000
    xs = [int(d_min / math.sqrt(1 - (i + 0.5) / n)) for i in range(n)]
    df = spark.createDataFrame([(x,) for x in xs], "x bigint")
    r = hill_tail_index(df, "x", d_min).collect()[0]
    assert r["n_tail"] == n
    assert 2.8 < r["alpha6"] < 3.4


def test_rake_weights_matches_ipf_mirror(spark):
    from qudo_etl_pipeline_spark.operators.weighting import (
        rake_summary,
        rake_weights,
    )

    # 2x2 design, deliberately unbalanced sample
    rows = (
        [("a", "x")] * 50 + [("a", "y")] * 10
        + [("b", "x")] * 20 + [("b", "y")] * 20
    )
    dims = {"d1": {"a": 0.5, "b": 0.5}, "d2": {"x": 0.4, "y": 0.6}}
    df = spark.createDataFrame(rows, "d1 string, d2 string")
    raked = rake_weights(df, dims, iters=5)
    summ = {
        (r["dim"], r["category"]): r["share6"]
        for r in rake_summary(raked, dims).collect()
    }

    # plain-python IPF mirror (same 9-dec fixed-point pinning)
    def fp9(x):
        import math

        return math.floor(x * 1e9 + 0.5) / 1e9

    w = {i: 1.0 for i in range(len(rows))}
    for _ in range(5):
        for dim, targets in dims.items():
            pos = 0 if dim == "d1" else 1
            tot = sum(w.values())
            cat = {}
            for i, r in enumerate(rows):
                cat[r[pos]] = cat.get(r[pos], 0.0) + w[i]
            for i, r in enumerate(rows):
                f = targets[r[pos]] * tot / cat[r[pos]]
                w[i] = fp9(w[i] * f)
    tot = sum(w.values())
    for dim, targets in dims.items():
        pos = 0 if dim == "d1" else 1
        for c in targets:
            share = sum(
                w[i] for i, r in enumerate(rows) if r[pos] == c
            ) / tot
            assert abs(summ[(dim, c)] - round(share, 6)) < 2e-6, (dim, c)
            # converged close to target after 5 iterations
            assert abs(summ[(dim, c)] - targets[c]) < 0.01, (dim, c)


def test_kish_neff_known_values(spark):
    from qudo_etl_pipeline_spark.operators.weighting import kish_neff

    # equal weights -> n_eff = n, deff = 1
    eq = spark.createDataFrame([(2.0,)] * 8, "w double")
    r = kish_neff(eq, "w").collect()[0]
    assert (r["n"], r["n_eff6"], r["deff6"]) == (8, 8.0, 1.0)
    # one dominant weight: w=[9,1,1,1] -> neff = 144/84
    dom = spark.createDataFrame([(9.0,), (1.0,), (1.0,), (1.0,)], "w double")
    r = kish_neff(dom, "w").collect()[0]
    assert abs(r["n_eff6"] - round(144 / 84, 6)) < 1e-9
    assert abs(r["deff6"] - round(4 * 84 / 144, 6)) < 1e-9


def test_bootstrap_ci_covers_mean_and_is_deterministic(spark):
    from qudo_etl_pipeline_spark.operators.analytics import (
        bootstrap_ci_mean,
    )

    rows = [(i, float((i * 37) % 100)) for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    r1 = bootstrap_ci_mean(df, "id", "v", n_boot=80, seed=5).collect()[0]
    r2 = bootstrap_ci_mean(df, "id", "v", n_boot=80, seed=5).collect()[0]
    assert r1 == r2                       # fully deterministic
    assert r1["n"] == 500
    assert r1["ci_lo6"] < r1["mean6"] < r1["ci_hi6"]
    # CI width sane for sd~29, n=500: se ~ 1.3 -> 95% half-width ~2.6
    assert 1.0 < (r1["ci_hi6"] - r1["ci_lo6"]) < 8.0
    # different seed -> different replicate draws
    r3 = bootstrap_ci_mean(df, "id", "v", n_boot=80, seed=6).collect()[0]
    assert (r3["ci_lo6"], r3["ci_hi6"]) != (r1["ci_lo6"], r1["ci_hi6"])


def test_cohort_ltv_hand_values(spark):
    import datetime as dt

    from qudo_etl_pipeline_spark.operators.analytics import cohort_ltv

    d = lambda day, h=12: dt.datetime(2024, 1, day, h)
    rows = [
        # cohort 01-01: users 1,2 — u1 buys day0 10.0, day2 5.0;
        # u2 never buys (still counts in cohort size)
        (1, d(1), "purchase", 10.0), (1, d(3), "purchase", 5.0),
        (2, d(1), "view", 1.0),
        # cohort 01-02: user 3 buys twice SAME day -> one offset row
        (3, d(2), "purchase", 2.0), (3, d(2), "purchase", 3.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string, value double"
    )
    got = {
        (r["cohort_day"], r["day_offset"]): (
            r["cohort_size"], r["rev"], r["cum_rev"], r["ltv6"]
        )
        for r in cohort_ltv(df, ["purchase"]).collect()
    }
    assert got[("2024-01-01", 0)] == (2, 10.0, 10.0, 5.0)
    assert got[("2024-01-01", 2)] == (2, 5.0, 15.0, 7.5)
    assert got[("2024-01-02", 0)] == (1, 5.0, 5.0, 5.0)
    assert len(got) == 3


def test_ks_two_sample_matches_reference(spark):
    from qudo_etl_pipeline_spark.operators.analytics import ks_two_sample

    a = [1.0, 2.0, 2.0, 3.0, 5.0, 7.0]
    b = [2.0, 4.0, 5.0, 6.0, 8.0, 9.0, 9.0]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_two_sample(df, "g", "v", "A", "B").collect()[0]

    # plain-python ECDF mirror
    vals = sorted(set(a + b))
    dmax = max(
        abs(
            sum(1 for x in a if x <= v) / len(a)
            - sum(1 for x in b if x <= v) / len(b)
        )
        for v in vals
    )
    assert (r["n_a"], r["n_b"]) == (6, 7)
    assert abs(r["d6"] - round(dmax, 6)) < 1e-9
    assert r["is_significant"] == 0  # tiny samples


def test_ks_detects_separated_distributions(spark):
    from qudo_etl_pipeline_spark.operators.analytics import ks_two_sample

    rows = [("A", float(i % 50)) for i in range(300)] + [
        ("B", float(i % 50 + 40)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_two_sample(df, "g", "v", "A", "B").collect()[0]
    assert r["is_significant"] == 1 and r["d6"] > 0.7


def test_ks_binned_bounds_and_degenerate(spark):
    """bins=B: with one bin per integer value the binned test equals
    the exact one; with coarse bins D is conservative (never above the
    exact D, within max-bin-mass below); an all-equal measure (width 0)
    collapses to one bucket with D = 0 instead of dividing by zero."""
    from qudo_etl_pipeline_spark.operators.analytics import ks_two_sample

    rows = [("A", float(i % 50)) for i in range(300)] + [
        ("B", float(i % 50 + 40)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    exact = ks_two_sample(df, "g", "v", "A", "B").collect()[0]
    # 90 distinct integer values over range [0, 89] -> 90 equi-width
    # bins separate every value: identical statistic
    fine = ks_two_sample(df, "g", "v", "A", "B", bins=90).collect()[0]
    assert fine["d6"] == exact["d6"]
    assert (fine["n_a"], fine["n_b"]) == (exact["n_a"], exact["n_b"])
    coarse = ks_two_sample(df, "g", "v", "A", "B", bins=9).collect()[0]
    # conservative: D_binned <= D_exact <= D_binned + max bin mass
    assert coarse["d6"] <= exact["d6"] + 1e-9
    assert coarse["d6"] >= exact["d6"] - (1 / 9 + 2e-2) - 1e-9
    assert coarse["is_significant"] == 1  # separation survives binning

    const = spark.createDataFrame(
        [("A", 5.0)] * 10 + [("B", 5.0)] * 10, "g string, v double"
    )
    r = ks_two_sample(const, "g", "v", "A", "B", bins=16).collect()[0]
    assert r["d6"] == 0.0 and r["is_significant"] == 0


def test_mutual_information_hand_computed(spark):
    import math

    from qudo_etl_pipeline_spark.operators.analytics import (
        mutual_information,
    )

    rows = (
        [("x", "p")] * 30 + [("x", "q")] * 10
        + [("y", "p")] * 10 + [("y", "q")] * 30
        + [(None, "p"), ("x", None)]  # excluded
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    n = 80
    cells = {("x", "p"): 30, ("x", "q"): 10, ("y", "p"): 10, ("y", "q"): 30}
    na = {"x": 40, "y": 40}
    nb = {"p": 40, "q": 40}
    mi = sum(
        c / n * math.log(n * c / (na[a] * nb[b]))
        for (a, b), c in cells.items()
    )
    h = sum(-(40 / n) * math.log(40 / n) for _ in range(2))
    assert r["n"] == n
    assert abs(r["mi6"] - round(mi, 6)) < 2e-6
    assert abs(r["h_a6"] - round(h, 6)) < 2e-6
    assert abs(r["nmi6"] - round(mi / math.sqrt(h * h), 6)) < 2e-6


def test_mutual_information_degenerate_and_empty(spark):
    from qudo_etl_pipeline_spark.operators.analytics import (
        mutual_information,
    )

    const = spark.createDataFrame(
        [("x", "p")] * 5 + [("x", "q")] * 5, "a string, b string"
    )
    r = mutual_information(const, "a", "b").collect()[0]
    # constant A: I = 0 exactly, H_A = 0 -> NMI undefined (NULL)
    assert r["mi6"] == 0.0 and r["h_a6"] == 0.0 and r["nmi6"] is None
    empty = spark.createDataFrame([], "a string, b string")
    assert mutual_information(empty, "a", "b").count() == 0


def test_kendall_tau_b_matches_bruteforce(spark):
    import itertools
    import math

    from qudo_etl_pipeline_spark.operators.analytics import kendall_tau_b

    # ordinal data with ties in both margins
    pts = [(1, 1), (1, 2), (2, 1), (2, 2), (2, 3), (3, 1), (3, 3),
           (3, 3), (4, 2), (4, 4), (5, 5), (5, 4)]
    df = spark.createDataFrame(pts, "a bigint, b bigint")
    r = kendall_tau_b(df, "a", "b").collect()[0]
    conc = disc = 0
    for (a1, b1), (a2, b2) in itertools.combinations(pts, 2):
        s = (a1 - a2) * (b1 - b2)
        conc += s > 0
        disc += s < 0
    n = len(pts)
    n0 = n * (n - 1) // 2
    n1 = sum(
        m * (m - 1) // 2
        for m in __import__("collections").Counter(a for a, _ in pts).values()
    )
    n2 = sum(
        m * (m - 1) // 2
        for m in __import__("collections").Counter(b for _, b in pts).values()
    )
    tau = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))
    assert (r["n"], r["conc"], r["disc"]) == (n, conc, disc)
    assert abs(r["tau_b6"] - round(tau, 6)) < 1e-9


def test_kendall_tau_b_perfect_and_degenerate(spark):
    from qudo_etl_pipeline_spark.operators.analytics import kendall_tau_b

    asc = spark.createDataFrame(
        [(i, i * 2) for i in range(10)], "a bigint, b bigint"
    )
    assert kendall_tau_b(asc, "a", "b").collect()[0]["tau_b6"] == 1.0
    desc = spark.createDataFrame(
        [(i, -i) for i in range(10)], "a bigint, b bigint"
    )
    assert kendall_tau_b(desc, "a", "b").collect()[0]["tau_b6"] == -1.0
    const = spark.createDataFrame(
        [(1, i) for i in range(5)], "a bigint, b bigint"
    )
    r = kendall_tau_b(const, "a", "b").collect()[0]
    assert r["tau_b6"] is None and r["conc"] == 0 and r["disc"] == 0
    empty = spark.createDataFrame([], "a bigint, b bigint")
    assert kendall_tau_b(empty, "a", "b").count() == 0


def test_spearman_rho_matches_midrank_pearson(spark):
    import collections
    import math

    from qudo_etl_pipeline_spark.operators.analytics import spearman_rho

    pts = [(1, 1), (1, 2), (2, 1), (2, 2), (2, 3), (3, 1), (3, 3),
           (3, 3), (4, 2), (4, 4), (5, 5), (5, 4)]
    df = spark.createDataFrame(pts, "a bigint, b bigint")
    r = spearman_rho(df, "a", "b").collect()[0]

    def midranks(vals):
        c = collections.Counter(vals)
        out, cum = {}, 0
        for v in sorted(c):
            out[v] = cum + (c[v] + 1) / 2
            cum += c[v]
        return out
    ma = midranks([a for a, _ in pts])
    mb = midranks([b for _, b in pts])
    xs = [ma[a] for a, _ in pts]
    ys = [mb[b] for _, b in pts]
    n = len(pts)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    vx = sum((x - mx) ** 2 for x in xs)
    vy = sum((y - my) ** 2 for y in ys)
    rho = cov / math.sqrt(vx * vy)
    assert r["n"] == n
    assert abs(r["rho6"] - round(rho, 6)) < 2e-6


def test_spearman_rho_perfect_and_degenerate(spark):
    from qudo_etl_pipeline_spark.operators.analytics import spearman_rho

    asc = spark.createDataFrame(
        [(i, i * 3 + 1) for i in range(12)], "a bigint, b bigint"
    )
    assert spearman_rho(asc, "a", "b").collect()[0]["rho6"] == 1.0
    desc = spark.createDataFrame(
        [(i, -i) for i in range(12)], "a bigint, b bigint"
    )
    assert spearman_rho(desc, "a", "b").collect()[0]["rho6"] == -1.0
    const = spark.createDataFrame(
        [(7, i) for i in range(5)], "a bigint, b bigint"
    )
    assert spearman_rho(const, "a", "b").collect()[0]["rho6"] is None
    empty = spark.createDataFrame([], "a bigint, b bigint")
    assert spearman_rho(empty, "a", "b").count() == 0


def test_psi_drift_identical_and_shifted(spark):
    import math

    from qudo_etl_pipeline_spark.operators.analytics import psi_drift

    same = spark.createDataFrame(
        [(float(i % 40),) for i in range(400)], "v double"
    )
    r = psi_drift(same, same, "v", bins=8).collect()[0]
    # identical distributions -> every bin share pair equal -> PSI = 0
    assert r["psi6"] == 0.0 and r["n_a"] == r["n_b"] == 400

    a = spark.createDataFrame([(float(i % 40),) for i in range(400)], "v double")
    b = spark.createDataFrame(
        [(float(i % 40 + 30),) for i in range(400)], "v double"
    )
    rs = psi_drift(a, b, "v", bins=8).collect()[0]
    # python mirror with the same pooled-range binning and ppm floor
    lo, hi = 0.0, 69.0
    width = (hi - lo) / 8
    import collections
    ca, cb = collections.Counter(), collections.Counter()
    for i in range(400):
        ca[min(7, max(0, int((float(i % 40) - lo) // width)))] += 1
        cb[min(7, max(0, int((float(i % 40 + 30) - lo) // width)))] += 1
    floor = 100 / 1_000_000
    psi = sum(
        (max(ca[k] / 400, floor) - max(cb[k] / 400, floor))
        * math.log(max(ca[k] / 400, floor) / max(cb[k] / 400, floor))
        for k in set(ca) | set(cb)
    )
    assert abs(rs["psi6"] - round(psi, 6)) < 2e-6
    assert rs["psi6"] > 0.25  # clearly shifted

    empty = spark.createDataFrame([], "v double")
    assert psi_drift(a, empty, "v").count() == 0


def test_gains_curve_separates_planted_signal(spark):
    from qudo_etl_pipeline_spark.operators.analytics import gains_curve

    # deterministic signal: top-scored half responds 80%, bottom 10%
    rows = []
    for i in range(400):
        score = float(400 - i)
        resp = 1 if (i < 200 and i % 5 != 0) or (i >= 200 and i % 10 == 0) else 0
        rows.append((i, score, resp))
    df = spark.createDataFrame(rows, "id bigint, score double, resp bigint")
    out = {
        r["bucket"]: r
        for r in gains_curve(df, "score", "resp", 4, ["id"]).collect()
    }
    assert [out[b]["n"] for b in (1, 2, 3, 4)] == [100] * 4
    # exact mirror: bucket 1..2 are i in [0,200) -> 80 responders each
    assert out[1]["responders"] == 80 and out[2]["responders"] == 80
    assert out[3]["responders"] == 10 and out[4]["responders"] == 10
    total = 180
    assert abs(out[2]["cum_capture6"] - round(160 / total, 6)) < 1e-9
    base = total / 400
    assert abs(out[1]["cum_lift6"] - round(0.8 / base, 6)) < 1e-9
    # lift decays toward 1.0 at the full population
    assert out[4]["cum_lift6"] == 1.0


def test_gains_curve_no_responders_nulls_ratios(spark):
    from qudo_etl_pipeline_spark.operators.analytics import gains_curve

    df = spark.createDataFrame(
        [(i, float(i), 0) for i in range(40)],
        "id bigint, score double, resp bigint",
    )
    out = gains_curve(df, "score", "resp", 4, ["id"]).collect()
    assert all(r["cum_capture6"] is None and r["cum_lift6"] is None
               for r in out)
    assert all(r["resp_rate6"] == 0.0 for r in out)


def test_rake_contraction_matches_row_fallback(spark):
    """The cell-contraction fit and the row-level fallback loop must be
    bit-identical — per-row starting weights included (cells keyed by
    (category tuple, start weight)) — and max_cells must dispatch to
    the fallback without changing a single weight."""
    from qudo_etl_pipeline_spark.operators.weighting import (
        _rake_weights_rows,
        rake_weights,
    )

    rows = [
        (i, ["a", "b", "c"][i % 3], ["x", "y"][i % 2], 1.0 + (i % 4) / 4)
        for i in range(240)
    ]
    df = spark.createDataFrame(rows, "id bigint, d1 string, d2 string, sw double")
    dims = {
        "d1": {"a": 0.5, "b": 0.3, "c": 0.2},
        "d2": {"x": 0.4, "y": 0.6},
    }
    contracted = {
        r["id"]: r["w"]
        for r in rake_weights(df, dims, iters=4, weight_col="sw").collect()
    }
    row_loop = {
        r["id"]: r["w"]
        for r in _rake_weights_rows(df, dims, 4, "sw").collect()
    }
    assert contracted == row_loop
    # forcing the fallback through max_cells reproduces the same fit
    forced = {
        r["id"]: r["w"]
        for r in rake_weights(
            df, dims, iters=4, weight_col="sw", max_cells=2
        ).collect()
    }
    assert forced == contracted
