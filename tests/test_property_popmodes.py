"""Property-based test: population_modes vs a pure-python mirror.

Random multi-select tables (sentinels, nulls, integer weights) are run
through the Spark plan and through a direct re-implementation of the
reference's semantics (chisquared_tester.py:695-838): per-row distinct
answers, 'not selected' stripped unless alone, weighted and unweighted
modes with (count desc, value asc) ties, proportions of the whole
sample rounded to 2.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qudo_etl_pipeline_spark.operators.popmodes import population_modes

VALUES = ["red", "blue", "not selected", "Not shown", None]

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["c0", "c1"]),
        st.integers(min_value=1, max_value=4),  # weight
        st.sampled_from(VALUES),
        st.sampled_from(VALUES),
    ),
    min_size=6,
    max_size=30,
)


def _mirror(rows):
    n_total = len(rows)
    w_total = float(sum(r[1] for r in rows))
    counts = defaultdict(lambda: [0, 0.0])  # (cluster, value) -> [n, wn]
    for cl, w, a, b in rows:
        vals = []
        for v in (a, b):
            if v is not None and v not in vals:
                vals.append(v)
        if not (len(vals) == 1 and vals[0] == "not selected"):
            vals = [v for v in vals if v != "not selected"]
        for v in vals:
            counts[(cl, v)][0] += 1
            counts[(cl, v)][1] += float(w)
    out = {}
    clusters = {cl for (cl, _) in counts}
    for cl in clusters:
        items = [(v, c) for (c2, v), c in counts.items() if c2 == cl]
        umode = min(items, key=lambda kv: (-kv[1][0], kv[0]))
        wmode = min(items, key=lambda kv: (-kv[1][1], kv[0]))
        out[cl] = (
            wmode[0],
            round(wmode[1][1] / w_total, 2),
            umode[0],
            round(umode[1][0] / n_total, 2),
        )
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy)
def test_population_modes_matches_mirror(spark, rows):
    df = spark.createDataFrame(
        rows, "cluster string, w long, q1_a string, q1_b string"
    )
    got = {
        r["cluster"]: (
            r["weighted_mode"],
            r["weighted_mode_prop"],
            r["unweighted_mode"],
            r["unweighted_mode_prop"],
        )
        for r in population_modes(
            df, {"q1": ["q1_a", "q1_b"]}, "cluster", weight_col="w"
        ).collect()
    }
    assert got == _mirror(rows)
