"""Property tests for the r12 seventh NULL-divergence class: CDC
latest-wins and SCD2 interval pairing must be TOTAL-order
deterministic even when a key group (above all the NULL-key group)
ties on the timestamp — the winner/pairing is a function of the data,
never of partition order. Hypothesis drives logs dense in duplicate
keys, duplicate timestamps, and NULLs; the mirror is a plain-python
scan applying the documented order (ts DESC, src DESC, op ASC, then
payload columns ASC NULLS LAST for CDC; ts ASC then payload ASC NULLS
LAST for SCD2).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qudo_etl_pipeline_spark.operators.analytics import (
    OPEN_END,
    cdc_compact,
    scd2_history,
)

TS = ["2024-01-01 00:00:00", "2024-01-02 00:00:00", "2024-01-03 00:00:00"]


def _nulls_last_key(v):
    return (v is None, v if v is not None else 0)


def _row_key(t):
    return tuple(_nulls_last_key(v) for v in t)


@st.composite
def change_logs(draw):
    """(snapshot_rows, change_rows): few keys (None included), few
    timestamps — tie collisions by construction."""
    keys = [None, 1, 2]
    snap, used = [], set()
    for _ in range(draw(st.integers(1, 6))):
        k = draw(st.sampled_from(keys))
        s = draw(st.sampled_from(["a", "b", "c", None]))
        ts = draw(st.sampled_from(TS))
        if (k, s, ts) in used:  # full-row dups add nothing: drop
            continue
        used.add((k, s, ts))
        snap.append((k, s, ts))
    chg = []
    for _ in range(draw(st.integers(0, 6))):
        chg.append(
            (
                draw(st.sampled_from(keys)),
                draw(st.sampled_from(["x", "y", None])),
                draw(st.sampled_from(TS + [None])),
                draw(st.sampled_from(["U", "D"])),
            )
        )
    return snap, chg


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(log=change_logs(), parts=st.integers(1, 7))
def test_cdc_matches_sequential_mirror(spark, log, parts):
    snap_rows, chg_rows = log
    snap = spark.createDataFrame(
        snap_rows, "k int, status string, ts string"
    ).selectExpr("k", "status", "CAST(ts AS TIMESTAMP) AS ts")
    chg = spark.createDataFrame(
        chg_rows, "k int, status string, ts string, op string"
    ).selectExpr("k", "status", "CAST(ts AS TIMESTAMP) AS ts", "op")
    got = sorted(
        (
            (r.k, r.status, str(r.ts or ""))
            for r in cdc_compact(
                snap.repartition(parts), chg, keys=["k"], ts_col="ts"
            ).collect()
        ),
        key=_row_key,
    )

    # mirror: per key, order (ts DESC NULLS LAST, src DESC, op ASC
    # NULLS LAST, status ASC NULLS LAST, ts-payload ASC NULLS LAST);
    # winner row kept iff op == 'U'
    rows = [(k, s, ts, "U", 0) for k, s, ts in snap_rows] + [
        (k, s, ts, op, 1) for k, s, ts, op in chg_rows
    ]
    by_key: dict = {}
    for row in rows:
        by_key.setdefault(row[0], []).append(row)
    expect = []
    for k, group in by_key.items():
        group.sort(
            key=lambda r: (
                r[2] is None,  # NULLS LAST under DESC
                tuple(-ord(c) for c in (r[2] or "")),  # ts DESC
                -r[4],  # src DESC
                _nulls_last_key(r[3]),  # op ASC NULLS LAST
                _nulls_last_key(r[1]),  # status ASC NULLS LAST
            )
        )
        win = group[0]
        if win[3] == "U":
            expect.append((k, win[1], str(win[2] or "")))
    assert got == sorted(expect, key=_row_key)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(log=change_logs(), parts=st.integers(1, 7))
def test_scd2_matches_sequential_mirror(spark, log, parts):
    snap_rows, chg_rows = log
    rows = [(k, s, ts, "U") for k, s, ts in snap_rows] + [
        r for r in chg_rows if r[2] is not None
    ]
    rows = [r for r in rows if r[2] is not None]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "k int, status string, ts string, op string"
    ).selectExpr("k", "status", "CAST(ts AS TIMESTAMP) AS ts", "op")
    got = sorted(
        (
            (r.k, r.status, str(r.valid_from), str(r.valid_to), r.is_current)
            for r in scd2_history(
                df.repartition(parts), keys=["k"], ts_col="ts"
            ).collect()
        ),
        key=_row_key,
    )

    # mirror: per key order (ts ASC, status ASC NULLS LAST, op ASC
    # NULLS LAST); each 'U' row's interval closes at the NEXT row's ts
    by_key: dict = {}
    for row in rows:
        by_key.setdefault(row[0], []).append(row)
    expect = []
    for k, group in by_key.items():
        group.sort(
            key=lambda r: (
                r[2],
                _nulls_last_key(r[1]),
                _nulls_last_key(r[3]),
            )
        )
        for i, row in enumerate(group):
            if row[3] != "U":
                continue
            nxt = group[i + 1][2] if i + 1 < len(group) else None
            expect.append(
                (
                    k,
                    row[1],
                    row[2],
                    nxt if nxt is not None else OPEN_END,
                    0 if nxt is not None else 1,
                )
            )
    assert got == sorted(expect, key=_row_key)
