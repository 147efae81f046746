"""Property tests for the round-8 statistics: exact brute-force /
reference mirrors on hypothesis-driven inputs.

- roc_auc == pairwise brute force ((wins + ties/2) / (n_pos*n_neg))
  for any score/label multiset, ties and duplicates included;
- bh_fdr == the textbook reverse-cummin reference, monotone in rank,
  invariant to input row order;
- golden_record's most_frequent == a plain python mode with the
  declared (count desc, value asc) tie order.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qudo_etl_pipeline_spark.operators.analytics import bh_fdr, roc_auc
from qudo_etl_pipeline_spark.operators.entity import golden_record

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def scored(draw):
    n = draw(st.integers(2, 40))
    rows = [
        (
            float(draw(st.integers(0, 8))),  # heavy ties on purpose
            draw(st.integers(0, 1)),
        )
        for _ in range(n)
    ]
    return rows


@settings(**_SETTINGS)
@given(rows=scored())
def test_roc_auc_matches_pairwise_bruteforce(spark, rows):
    df = spark.createDataFrame(rows, "s double, y bigint")
    got = roc_auc(df, "s", "y").collect()[0]
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    if not pos or not neg:
        assert got["auc6"] is None
        return
    wins = sum(1 for p in pos for q in neg if p > q)
    ties = sum(1 for p in pos for q in neg if p == q)
    expected = (wins + ties / 2) / (len(pos) * len(neg))
    assert got["auc6"] == round(expected, 6)


@st.composite
def pvalues(draw):
    n = draw(st.integers(1, 25))
    # grid p-values so duplicates occur; exact doubles
    return [
        (f"t{i:02d}", draw(st.integers(0, 100)) / 100.0)
        for i in range(n)
    ]


@settings(**_SETTINGS)
@given(rows=pvalues(), perm=st.randoms(use_true_random=False))
def test_bh_fdr_matches_reference_and_order_invariant(spark, rows, perm):
    shuffled = list(rows)
    perm.shuffle(shuffled)
    df = spark.createDataFrame(shuffled, "test_id string, p double")
    out = bh_fdr(df, "test_id", "p", alpha=0.1).collect()
    # reference: sort by (p, key), q_i = m*p/i, reverse cummin, clamp
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    m = len(ordered)
    q = [m * p / (i + 1) for i, (_, p) in enumerate(ordered)]
    adj, run = [0.0] * m, float("inf")
    for i in range(m - 1, -1, -1):
        run = min(run, q[i])
        adj[i] = min(1.0, run)
    # exact step-up BH: reject ranks 1..k, k = max{r : m*p_r <= alpha*r}
    # (multiplication-only — the rounded-p_adj6 comparison mis-rejected
    # true adjusted p in (alpha, alpha + 5e-7])
    kmax = max(
        (i + 1 for i, (_, p) in enumerate(ordered) if m * p <= 0.1 * (i + 1)),
        default=0,
    )
    assert [r["test_id"] for r in out] == [k for k, _ in ordered]
    for i, (r, (k, p), a) in enumerate(zip(out, ordered, adj)):
        assert r["p"] == p
        assert r["p_adj6"] == round(a, 6)
        assert r["rejected"] == (1 if i + 1 <= kmax else 0)
    # monotone in rank
    vals = [r["p_adj6"] for r in out]
    assert vals == sorted(vals)


@st.composite
def mode_rows(draw):
    n = draw(st.integers(1, 30))
    return [
        (draw(st.integers(0, 2)), draw(st.sampled_from("abcde")))
        for _ in range(n)
    ]


@settings(**_SETTINGS)
@given(rows=mode_rows())
def test_golden_record_mode_matches_python(spark, rows):
    from collections import Counter

    df = spark.createDataFrame(rows, "g bigint, v string")
    got = {
        r["g"]: r["v"]
        for r in golden_record(df, "g", {"v": "most_frequent"}).collect()
    }
    for g in {g for g, _ in rows}:
        counts = Counter(v for gg, v in rows if gg == g)
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[g] == best, (g, counts)


@st.composite
def numeric_mode_rows(draw):
    n = draw(st.integers(1, 30))
    return [
        (draw(st.integers(0, 2)), draw(st.sampled_from([2, 3, 10, 100])))
        for _ in range(n)
    ]


@settings(**_SETTINGS)
@given(rows=numeric_mode_rows())
def test_golden_record_numeric_mode_matches_python(spark, rows):
    # ties among NUMERIC values break on numeric order (2 < 10), never
    # the melt's lexicographic string order ('10' < '2'); the survivor
    # keeps the source dtype.
    from collections import Counter

    df = spark.createDataFrame(rows, "g bigint, v bigint")
    out = golden_record(df, "g", {"v": "most_frequent"})
    assert dict(out.dtypes)["v"] == "bigint"
    got = {r["g"]: r["v"] for r in out.collect()}
    for g in {g for g, _ in rows}:
        counts = Counter(v for gg, v in rows if gg == g)
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[g] == best, (g, counts)


@st.composite
def weighted_rows(draw):
    n = draw(st.integers(1, 40))
    # small value domain -> heavy ties (the r9 distinct-value collapse
    # must be invisible); integer-quantized weights avoid float-sum
    # ambiguity in the python mirror
    return [
        (
            draw(st.integers(0, 1)),
            float(draw(st.integers(0, 5))),
            draw(st.integers(0, 4)) / 2.0,
        )
        for _ in range(n)
    ]


@settings(**_SETTINGS)
@given(rows=weighted_rows())
def test_weighted_median_matches_python_mirror(spark, rows):
    from collections import defaultdict

    from qudo_etl_pipeline_spark.operators.analytics import (
        weighted_quantile,
    )

    df = spark.createDataFrame(rows, "g bigint, v double, w double")
    got = {
        r["g"]: r
        for r in weighted_quantile(df, ["g"], "v", "w").collect()
    }
    per_g = defaultdict(lambda: defaultdict(float))
    n_g = defaultdict(int)
    for g, v, w in rows:
        per_g[g][v] += w
        n_g[g] += 1
    for g, by_v in per_g.items():
        tot = sum(by_v.values())
        cum = 0.0
        want = None
        for v in sorted(by_v):
            cum += by_v[v]
            # the integer-exact crossing test: 2*cum >= tot
            if 2 * cum >= tot:
                want = v
                break
        assert got[g]["wq_value"] == want, (g, dict(by_v))
        assert got[g]["total_weight"] == tot
        assert got[g]["n"] == n_g[g]
