"""Property test: ranged_prefix_sums == sequential cumsum, any input.

The device's contract is exact equality with a single-threaded ordered
scan for integral sums — across group interleavings, duplicate-free
key sets of any shape, and both frame bounds. Hypothesis drives the
shapes; the mirror is plain python.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qudo_etl_pipeline_spark.operators.prefix import ranged_prefix_sums


@st.composite
def frames(draw):
    n_groups = draw(st.integers(1, 3))
    groups = [f"g{i}" for i in range(n_groups)]
    rows = []
    used = set()
    for _ in range(draw(st.integers(1, 60))):
        g = draw(st.sampled_from(groups))
        k = draw(st.integers(-1000, 1000))
        if (g, k) in used:
            continue
        used.add((g, k))
        rows.append((g, k, draw(st.integers(-50, 50))))
    return rows


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=frames(), inclusive=st.booleans())
def test_matches_sequential_scan(spark, rows, inclusive):
    df = spark.createDataFrame(rows, "g string, k bigint, x bigint")
    out = {
        (r["g"], r["k"]): r["cum"]
        for r in ranged_prefix_sums(
            df, ["k"], {"cum": "x"}, group_cols=["g"], inclusive=inclusive
        ).collect()
    }
    assert len(out) == len(rows)
    expect = {}
    by_group: dict = {}
    for g, k, x in sorted(rows):
        c = by_group.get(g, 0)
        expect[(g, k)] = c + x if inclusive else c
        by_group[g] = c + x
    assert out == expect


@st.composite
def null_group_frames(draw):
    """Frames where the group key may be NULL — the r11 contract: the
    NULL-key group is a group, accumulated and joined back like any
    other (eqNullSafe offsets join)."""
    n_groups = draw(st.integers(1, 2))
    groups = [f"g{i}" for i in range(n_groups)] + [None]
    rows = []
    used = set()
    for _ in range(draw(st.integers(1, 60))):
        g = draw(st.sampled_from(groups))
        k = draw(st.integers(-1000, 1000))
        if (g, k) in used:
            continue
        used.add((g, k))
        rows.append((g, k, draw(st.integers(-50, 50))))
    return rows


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=null_group_frames(), inclusive=st.booleans())
def test_null_group_matches_sequential_scan(spark, rows, inclusive):
    df = spark.createDataFrame(rows, "g string, k bigint, x bigint")
    out = {
        (r["g"], r["k"]): r["cum"]
        for r in ranged_prefix_sums(
            df, ["k"], {"cum": "x"}, group_cols=["g"], inclusive=inclusive
        ).collect()
    }
    assert len(out) == len(rows)  # NULL-group rows must not vanish
    expect = {}
    by_group: dict = {}
    key = lambda t: (t[0] is not None, t[0] or "", t[1])  # noqa: E731
    for g, k, x in sorted(rows, key=key):
        c = by_group.get(g, 0)
        expect[(g, k)] = c + x if inclusive else c
        by_group[g] = c + x
    assert out == expect
