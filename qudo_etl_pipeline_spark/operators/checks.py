"""Declarative data-quality constraint suite, evaluated in ONE pass.

Extension scope (no reference counterpart): the Deequ-style gate a
100 TB ingest needs before a table is published — completeness,
uniqueness, bounds, set/regex conformance, and foreign-key coverage,
declared as data and compiled into a single aggregation job (AWS Deequ,
VLDB'18, is the public model; this is the same "checks compile to one
scan" idea expressed as DataFrame aggregates).

Scale design:
- every check compiles to a conditional aggregate over the SAME
  ``df.agg(...)`` — one scan, map-side partial aggregation, output is
  O(#checks) rows regardless of input size;
- ``isin`` / ``pattern`` checks are pure JVM row expressions feeding
  the aggregate (no extra pass);
- ``fk_coverage`` adds one broadcast left-semi-style flag join against
  the (small, deduplicated) reference key column before the aggregate —
  the big side is never shuffled;
- ``uniqueness`` uses exact count-distinct. Multiple distinct
  aggregates plan as one Expand pass (rows × #distinct-checks), which
  is the exact-answer cost; pass ``approx_distinct=True`` to switch to
  HLL ``approx_count_distinct`` (no Expand) when a few-per-mille error
  is acceptable at very large row counts — same plan shape as a plain
  aggregate then.

The result is long-format: one row per check with the measured metric,
the declared gate, and a 0/1 ``passed`` flag — the shape a publish
gate, a metrics store, or an alerting join consumes.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.functions.rounding import ref_round

__all__ = ["Check", "check_suite", "table_diff", "join_profile"]

# metric comparison direction per check kind: metric OP threshold
_DIRECTION = {
    "completeness": ">=",
    "uniqueness": ">=",
    "min_value": ">=",
    "max_value": "<=",
    "mean_min": ">=",
    "mean_max": "<=",
    "isin": ">=",
    "pattern": ">=",
    "fk_coverage": ">=",
}


@dataclass(frozen=True)
class Check:
    """One declared constraint.

    kind:
      - ``completeness``: fraction of rows with ``column`` non-null
      - ``uniqueness``: distinct(column) / count(*) (1.0 == key)
      - ``min_value`` / ``max_value``: min/max of ``column`` vs gate
      - ``mean_min`` / ``mean_max``: mean of ``column`` vs gate
      - ``isin``: fraction of NON-NULL values in ``values``
      - ``pattern``: fraction of NON-NULL values matching ``pattern``
      - ``fk_coverage``: fraction of rows whose ``column`` appears in
        the reference table registered under ``ref`` in ``check_suite``'s
        ``refs`` argument (NULL keys count as uncovered)
    """

    name: str
    kind: str
    column: str
    threshold: float
    values: tuple[str, ...] = field(default=())
    pattern: str = ""
    ref: str = ""

    def __post_init__(self) -> None:
        if self.kind not in _DIRECTION:
            raise ValueError(f"unknown check kind {self.kind!r}")


def _metric_expr(c: Check, flag: str | None):
    col = F.col(c.column)
    n = F.count(F.lit(1))
    if c.kind == "completeness":
        return F.count(col) / n
    if c.kind == "uniqueness":
        raise AssertionError("handled by caller")  # pragma: no cover
    if c.kind == "min_value":
        return F.min(col).cast("double")
    if c.kind == "max_value":
        return F.max(col).cast("double")
    if c.kind in ("mean_min", "mean_max"):
        # exact decimal sum then one double division: summation-order
        # independent, so the metric is bit-identical across engines
        return F.sum(col.cast("decimal(18,4)")).cast("double") / F.count(col)
    if c.kind == "isin":
        return F.count(F.when(col.isin(*c.values), 1)) / F.count(col)
    if c.kind == "pattern":
        return F.count(F.when(col.rlike(c.pattern), 1)) / F.count(col)
    if c.kind == "fk_coverage":
        return F.count(F.when(F.col(flag).isNotNull(), 1)) / n
    raise AssertionError(c.kind)  # pragma: no cover


def check_suite(
    df: DataFrame,
    checks: list[Check],
    refs: dict[str, DataFrame] | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """Evaluate ``checks`` over ``df`` in one aggregation pass.

    ``refs`` maps ``Check.ref`` names to single-column DataFrames of
    valid keys for ``fk_coverage`` checks (deduplicated and broadcast
    here). Returns one row per check:
    ``(check_name, column, metric, threshold, passed)`` with ``metric``
    rounded to 6 (ref_round semantics) and ``passed`` as 0/1 bigint.
    """
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError("check names must be unique")

    # fk_coverage: broadcast-join a presence flag per referenced table
    flags: dict[str, str] = {}
    for c in checks:
        if c.kind != "fk_coverage":
            continue
        if not refs or c.ref not in refs:
            raise ValueError(f"fk_coverage check {c.name!r}: refs[{c.ref!r}] missing")
        flag = f"__ck_ref_{c.ref}_{c.column}"
        if flag not in flags.values():
            ref_df = refs[c.ref]
            key = ref_df.columns[0]
            keys = ref_df.select(
                F.col(key).alias(f"{flag}_k"),
                F.lit(1).alias(flag),
            ).dropDuplicates([f"{flag}_k"])
            df = df.join(
                F.broadcast(keys),
                df[c.column] == keys[f"{flag}_k"],
                "left",
            ).drop(f"{flag}_k")
        flags[(c.ref, c.column)] = flag

    aggs = []
    for i, c in enumerate(checks):
        if c.kind == "uniqueness":
            d = (
                F.approx_count_distinct(c.column)
                if approx_distinct
                else F.countDistinct(c.column)
            )
            m = d / F.count(F.lit(1))
        else:
            m = _metric_expr(c, flags.get((c.ref, c.column)))
        aggs.append(ref_round(m.cast("double"), 6).alias(f"_m{i}"))

    row = df.agg(*aggs)

    structs = []
    for i, c in enumerate(checks):
        op = _DIRECTION[c.kind]
        m = F.col(f"_m{i}")
        thr = F.lit(float(c.threshold))
        ok = (m >= thr) if op == ">=" else (m <= thr)
        structs.append(
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.lit(c.column).alias("col_name"),
                m.alias("metric"),
                thr.alias("threshold"),
                F.coalesce(ok.cast("bigint"), F.lit(0)).alias("passed"),
            )
        )
    return (
        row.select(F.explode(F.array(*structs)).alias("c"))
        .select("c.*")
    )


def _stack_metrics(agg, metrics: list[str]):
    """Pivot a 1-row wide aggregate into the long (metric, n) contract
    every reconciliation/profile operator emits."""
    stacked = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(m).alias("metric"), F.col(f"`{m}`").alias("n")
                )
                for m in metrics
            ]
        )
    ).alias("kv")
    return agg.select(stacked).select("kv.metric", "kv.n")


def table_diff(
    left,
    right,
    keys: list[str],
    compare_cols: list[str] | None = None,
):
    """Key-level reconciliation of two table versions — the
    anti-entropy audit a pipeline runs after a migration, backfill, or
    engine swap: which keys were added / removed, which changed in
    ANY compared column, and per-column change counts.

    KEY-LEVEL by construction: each side pre-aggregates to one row per
    key (count + a deterministic max-struct representative of the
    compared columns), so duplicate keys can never fan out the join
    and inflate the counts — they are surfaced instead as
    ``dup_keys:left`` / ``dup_keys:right`` (keys occurring more than
    once; a nonzero value means the per-key "changed" verdicts compare
    REPRESENTATIVES and the duplication itself is the finding to
    chase). The join is then a unique-key full-outer (AQE-coalescible,
    skew-splittable — the only shuffle on the wide data) feeding a
    single aggregate: output is O(8 + #columns) rows regardless of
    input size. Column comparison is null-safe (NULL == NULL is
    "unchanged", NULL vs value is a change). Keys are ALSO null-safe:
    the join matches on eqNullSafe, so a composite key with a NULL
    component pairs deterministically instead of double-counting as
    one removed + one added, and presence is detected from each
    side's count column (never from key nullness); keys containing
    any NULL component are additionally surfaced as
    ``null_keys:left`` / ``null_keys:right`` — like duplicates, a
    nonzero value is itself a data-quality finding.

    Output (long format): metric in {added, removed, changed,
    unchanged, dup_keys:left, dup_keys:right, changed:<col>...}, n —
    the shape a publish gate or drift alert consumes.
    """
    if compare_cols is None:
        compare_cols = [
            c for c in left.columns if c in set(right.columns)
            and c not in set(keys)
        ]

    def _keyed(df, tag):
        return (
            df.select(
                *[F.col(k).alias(f"_{tag}k_{k}") for k in keys],
                F.struct(
                    *[F.col(c).alias(c) for c in compare_cols]
                ).alias(f"_{tag}v"),
            )
            .groupBy(*[f"_{tag}k_{k}" for k in keys])
            .agg(
                F.count(F.lit(1)).alias(f"_{tag}n"),
                F.max(f"_{tag}v").alias(f"_{tag}v"),
            )
        )

    lf = _keyed(left, "l")
    rf = _keyed(right, "r")
    cond = None
    for k in keys:
        # eqNullSafe: NULL key components pair instead of producing a
        # phantom removed+added pair
        e = F.col(f"_lk_{k}").eqNullSafe(F.col(f"_rk_{k}"))
        cond = e if cond is None else cond & e
    j = lf.join(rf, cond, "full_outer")
    # presence from the per-side counts (>=1 whenever the side has the
    # key), NOT from key nullness -- a legitimately-NULL key component
    # must not read as "absent"
    in_l = F.col("_ln").isNotNull()
    in_r = F.col("_rn").isNotNull()
    null_key_l = in_l & functools.reduce(
        lambda a, b: a | b,
        [F.col(f"_lk_{k}").isNull() for k in keys],
    )
    null_key_r = in_r & functools.reduce(
        lambda a, b: a | b,
        [F.col(f"_rk_{k}").isNull() for k in keys],
    )
    col_changed = {
        c: in_l
        & in_r
        & ~F.col("_lv")[c].eqNullSafe(F.col("_rv")[c])
        for c in compare_cols
    }
    any_changed = F.lit(False)
    for e in col_changed.values():
        any_changed = any_changed | e
    # coalesce: an empty-vs-empty diff must report zeros, not NULLs
    cnt = lambda e: F.coalesce(  # noqa: E731
        F.sum(e.cast("bigint")), F.lit(0)
    )
    agg = j.agg(
        cnt(in_l & ~in_r).alias("removed"),
        cnt(~in_l & in_r).alias("added"),
        cnt(any_changed).alias("changed"),
        cnt(in_l & in_r & ~any_changed).alias("unchanged"),
        cnt(in_l & (F.col("_ln") > 1)).alias("dup_keys:left"),
        cnt(in_r & (F.col("_rn") > 1)).alias("dup_keys:right"),
        cnt(null_key_l).alias("null_keys:left"),
        cnt(null_key_r).alias("null_keys:right"),
        *[
            cnt(e).alias(f"changed:{c}")
            for c, e in col_changed.items()
        ],
    )
    metrics = [
        "added",
        "removed",
        "changed",
        "unchanged",
        "dup_keys:left",
        "dup_keys:right",
        "null_keys:left",
        "null_keys:right",
    ] + [f"changed:{c}" for c in compare_cols]
    return _stack_metrics(agg, metrics)


def join_profile(
    left,
    right,
    left_key: str,
    right_key: str,
):
    """Pre-join sanity profile of a key pair — the check a pipeline
    runs BEFORE a big join to predict fan-out and orphan loss:
    distinct key counts, matched keys, orphans on each side, row
    multiplicities (max and total rows per side over matched keys —
    the fan-out predictor: a matched row count far above the matched
    key count means the join will explode), and null-key row counts
    (silently dropped by an inner equi-join).

    Each side collapses to its (key, row-count) frame first (one keyed
    aggregate per side — the NULL-key group rides along as a sentinel
    row, so the whole profile is ONE lazy plan with no driver-side
    count jobs), then a unique-key full-outer join on the key-count
    frames feeds a single aggregate — never a pass over the joined
    fan-out itself.

    Output (long format): metric, n.
    """
    lk = (
        left.groupBy(F.col(left_key).alias("_k"))
        .agg(F.count(F.lit(1)).alias("_ln"))
        .withColumn("_lhas", F.lit(1))
    )
    rk = (
        right.groupBy(F.col(right_key).alias("_rk"))
        .agg(F.count(F.lit(1)).alias("_rn"))
        .withColumn("_rhas", F.lit(1))
    )
    # NULL keys never satisfy the equi-condition, so each side's
    # sentinel group survives as an unmatched row and is routed to the
    # null_keys metrics below instead of the key counts
    j = lk.join(rk, lk["_k"] == rk["_rk"], "full_outer")
    in_l = F.col("_lhas").isNotNull()
    in_r = F.col("_rhas").isNotNull()
    lkey_ok = in_l & F.col("_k").isNotNull()
    rkey_ok = in_r & F.col("_rk").isNotNull()
    cnt = lambda e: F.coalesce(  # noqa: E731
        F.sum(e.cast("bigint")), F.lit(0)
    )
    zsum = lambda c: F.coalesce(F.sum(c), F.lit(0))  # noqa: E731
    matched = lkey_ok & rkey_ok
    agg = j.agg(
        cnt(lkey_ok).alias("keys_left"),
        cnt(rkey_ok).alias("keys_right"),
        cnt(matched).alias("keys_matched"),
        cnt(lkey_ok & ~in_r).alias("keys_left_only"),
        cnt(rkey_ok & ~in_l).alias("keys_right_only"),
        zsum(F.when(matched, F.col("_ln") * F.col("_rn"))).alias(
            "joined_rows"
        ),
        F.coalesce(F.max(F.when(matched, F.col("_ln"))), F.lit(0)).alias(
            "max_left_rows_per_key"
        ),
        F.coalesce(F.max(F.when(matched, F.col("_rn"))), F.lit(0)).alias(
            "max_right_rows_per_key"
        ),
        zsum(F.when(in_l & F.col("_k").isNull(), F.col("_ln"))).alias(
            "null_keys_left"
        ),
        zsum(F.when(in_r & F.col("_rk").isNull(), F.col("_rn"))).alias(
            "null_keys_right"
        ),
        # side totals + matched-row mass: what a join planner needs to
        # pick broadcast (side size) vs salted (max/avg per-key ratio)
        zsum(F.when(in_l, F.col("_ln"))).alias("rows_left"),
        zsum(F.when(in_r, F.col("_rn"))).alias("rows_right"),
        zsum(F.when(matched, F.col("_ln"))).alias("rows_left_matched"),
        zsum(F.when(matched, F.col("_rn"))).alias("rows_right_matched"),
    )
    metrics = [
        "keys_left",
        "keys_right",
        "keys_matched",
        "keys_left_only",
        "keys_right_only",
        "joined_rows",
        "max_left_rows_per_key",
        "max_right_rows_per_key",
        "null_keys_left",
        "null_keys_right",
        "rows_left",
        "rows_right",
        "rows_left_matched",
        "rows_right_matched",
    ]
    return _stack_metrics(agg, metrics)
