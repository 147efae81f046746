"""Business metrics over the deliver-stats table and labeled data.

Re-implements (reference: src/kraken/app/metrics.py):
- M28 uniqueness (:311-337): per cluster, 1 - share of
  (q_code, sig_more_category) pairs that any other cluster also has.
- M29 communicability (:340-361): distinct significant 'psy|ae'
  q_codes per segment + the average over all segments.
- M30 social presence (:364-404): detect the `mc_` column carrying the
  platform, then per-cluster share answering exactly that platform.
- M31 magnitude (:636-687): cluster share (rounded 2) x share of
  significant `_tgt` variables (per segment), rounded 3, + total;
  NaN when the total is 0 or exceeds 1.
- M35 message reach (:690-711): social presence x signal per segment.
- M36 significant-variable spread (:177-231): counts of significant
  variables per segment (all and `_tgt`-only) and per-question-prefix
  proportions.
- M37 get_all_metrics (:814-911): the composition layer.

All inputs are DataFrames: `deliver` is the deliver-stats output of
operators/contingency.py (columns q_code, targeting_seg,
sig_more_category array, chi_2_result, pop_mode...), `labeled` is the
respondent table with a `prediction` column. Everything aggregates to
segment-cardinality results before collecting (tiny) — the deliver
table itself is already aggregate-sized (variables x segments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pair_key() -> "F.Column":
    """(q_code, sig_more_category) identity: the reference tuples the
    category list (metrics.py:330-332); arrays compare element-wise."""
    return F.concat_ws(
        "", F.col("q_code"), F.concat_ws("", F.col("sig_more_category"))
    )


def uniqueness(deliver: DataFrame, seg_col: str = "targeting_seg") -> dict:
    """M28: per cluster, 1 - duplicated-pair share (metrics.py:311-337)."""
    pairs = deliver.select(
        F.col(seg_col).alias("seg"), _pair_key().alias("pair")
    )
    dup = (
        pairs.groupBy("pair")
        .agg(F.countDistinct("seg").alias("n_segs"))
        .withColumn("dup", (F.col("n_segs") > 1).cast("int"))
    )
    rows = (
        pairs.join(dup.select("pair", "dup"), "pair")
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dup").alias("n_dup"),
        )
        .collect()
    )
    return {r["seg"]: 1 - r["n_dup"] / r["n"] for r in rows}


def communicability(
    deliver: DataFrame, seg_col: str = "targeting_seg", pattern: str = "psy|ae"
) -> dict:
    """M29 (metrics.py:340-361): distinct significant q_codes matching
    the creative/psychometric regex per segment; avg = total / number of
    segments in the WHOLE deliver table."""
    comm = (
        deliver.filter(F.col("q_code").rlike(pattern))
        .groupBy(seg_col)
        .agg(F.countDistinct("q_code").alias("communicability"))
        .collect()
    )
    n_segs = deliver.select(seg_col).distinct().count()
    data = {r[seg_col]: r["communicability"] for r in comm}
    avg = sum(data.values()) / n_segs if n_segs else float("nan")
    return {"data": data, "avg": avg}


def find_social_column(
    df: DataFrame, sm_platform: str, marker: str = "mc_"
) -> str | None:
    """Detect the multiple-choice column whose values mention the
    platform (metrics.py:374-390). One aggregation over candidates."""
    cands = [c for c in df.columns if marker in c]
    if not cands:
        return None
    row = df.agg(
        *[
            F.max(
                F.lower(F.col(c).cast("string")).contains(sm_platform.lower()).cast("int")
            ).alias(c)
            for c in cands
        ]
    ).collect()[0]
    for c in cands:
        if row[c] == 1:
            return c
    return None


def social_presence(
    labeled: DataFrame,
    sm_platform: str,
    pred: str = "prediction",
    marker: str = "mc_",
) -> dict | float:
    """M30 (metrics.py:364-404): per-cluster share answering exactly
    `sm_platform` on the detected column, rounded 3. NaN if no column."""
    col = find_social_column(labeled, sm_platform, marker)
    if col is None:
        return float("nan")
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    # ref_round: the reference rounds with Python round (metrics.py:402)
    rows = (
        labeled.groupBy(pred)
        .agg(
            ref_round(
                F.sum((F.col(col) == sm_platform).cast("int"))
                / F.count(F.lit(1)),
                3,
            ).alias("share")
        )
        .collect()
    )
    return {r[pred]: r["share"] for r in rows}


def magnitude(
    deliver: DataFrame,
    labeled: DataFrame,
    tgt_cols: list[str],
    pred: str = "prediction",
    seg_col: str = "targeting_seg",
) -> dict | float:
    """M31 (metrics.py:636-687): magnitude = cluster share (round 2) x
    (significant `_tgt` rows per segment / #tgt variables), round 3;
    plus 'all_clusters' total; NaN if total is 0 or > 1."""
    num_tgt = len(tgt_cols)
    if num_tgt == 0:
        return float("nan")
    sizes = labeled.groupBy(pred).agg(F.count(F.lit(1)).alias("n")).collect()
    total = sum(r["n"] for r in sizes)
    pct = {r[pred]: round(r["n"] / total, 2) for r in sizes}
    sig_counts = {
        r[seg_col]: r["n"]
        for r in deliver.filter(F.lower(F.col("q_code")).contains("tgt"))
        .groupBy(seg_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out = {}
    for seg, share in pct.items():
        ratio = sig_counts.get(str(seg), sig_counts.get(seg, 0)) / num_tgt
        out[seg] = round(ratio * share, 3)
    s = round(sum(out.values()), 3)
    if s <= 0 or s > 1:
        return float("nan")
    out["all_clusters"] = s
    return out


def message_reach(social: dict, signal: dict) -> dict | float:
    """M35 (metrics.py:690-711): presence x signal per segment."""
    signal = dict(signal)
    if not isinstance(social, dict):
        return float("nan")
    if len(signal) > len(social):
        signal.pop("all", None)
    if len(signal) != len(social) or not signal:
        return float("nan")
    out = {}
    for label in sorted(int(k) for k in signal):
        out[str(label)] = round(
            social[label] * signal[str(label)]["signal"], 3
        )
    return out


def question_prefix_col(col: str = "q_code") -> "F.Column":
    """Prefix before '_' when present, else the whole code
    (metrics.py:192-197)."""
    return F.when(
        F.col(col).contains("_"), F.split(F.col(col), "_")[0]
    ).otherwise(F.col(col))


def significant_variables_and_spread(
    deliver: DataFrame,
    alpha: float = 0.05,
    seg_col: str = "targeting_seg",
) -> tuple[dict, dict, dict, dict]:
    """M36 (metrics.py:208-231): counts of significant variables per
    segment (all / `_tgt`), and per-question-prefix proportions of
    significant variables vs all variables (all / `_tgt` universes)."""
    sig = deliver.filter(F.col("chi_2_result") <= alpha)
    num_sig = {
        r[seg_col]: r["n"]
        for r in sig.groupBy(seg_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sig_tgt = sig.filter(F.col("q_code").contains("_tgt"))
    num_sig_tgt = {
        r[seg_col]: r["n"]
        for r in sig_tgt.groupBy(seg_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    def spread(filtered: DataFrame, universe: DataFrame) -> dict:
        # the denominator is the prefix count over the UNFILTERED frame
        # across ALL segments — the reference's overall_counts
        # (metrics.py:198-204) divides exactly so; per-segment universes
        # would read more naturally but would break parity
        overall = {
            r["p"]: r["n"]
            for r in universe.select(question_prefix_col().alias("p"))
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        rows = (
            filtered.select(F.col(seg_col).alias("seg"), question_prefix_col().alias("p"))
            .groupBy("seg", "p")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        out: dict = {}
        for r in rows:
            out.setdefault(r["seg"], {})[r["p"]] = (
                r["n"] / overall[r["p"]] if overall.get(r["p"]) else float("nan")
            )
        return out

    return (
        num_sig,
        num_sig_tgt,
        spread(sig, deliver),
        spread(sig_tgt, deliver.filter(F.col("q_code").contains("_tgt"))),
    )


def get_all_metrics(
    labeled: DataFrame,
    deliver: DataFrame | None = None,
    features_col: str = "features",
    pred: str = "prediction",
    tgt_cols: list[str] | None = None,
    n_seed=None,
    sm_platform: str = "Facebook",
    refit=None,
    with_random_baseline: bool = True,
    social_df: DataFrame | None = None,
) -> dict:
    """M37 (metrics.py:814-911): compose quality + consistency +
    business metrics into one dict. `refit` (optional) is the
    train->scorer callable used by the consistency checks.

    ``social_df``: frame with the ORIGINAL (unencoded) answers plus the
    prediction column, for social presence — the reference passes
    full_data separately from data_encoded (metrics.py:840) because
    'facebook' matching cannot work on label codes. Defaults to
    ``labeled`` for callers that kept string answers."""
    from qudo_etl_pipeline_spark.ml import quality as Q
    from qudo_etl_pipeline_spark.ml import signal as S

    metrics = Q.cluster_quality(labeled, features=features_col, pred=pred, n_seed=n_seed)
    if with_random_baseline:
        metrics = Q.random_checker(
            labeled, features=features_col, pred=pred, cluster_metrics=metrics
        )
    metrics["fb_presence"] = social_presence(
        social_df if social_df is not None else labeled, sm_platform, pred=pred
    )
    if refit is not None:
        metrics["model_consistency"] = S.model_consistency(labeled, refit, label_col=pred)
        metrics["label_consistency"] = S.label_consistency(labeled, refit, label_col=pred)
    else:
        metrics["model_consistency"] = float("nan")
        metrics["label_consistency"] = float("nan")
    if deliver is not None:
        metrics["uniqueness"] = uniqueness(deliver)
        comm = communicability(deliver)
        metrics["communicability_clusters"] = comm["data"]
        metrics["communicability_avg"] = comm["avg"]
        if tgt_cols:
            metrics["magnitude"] = magnitude(deliver, labeled, tgt_cols, pred=pred)
            sig = S.signal_loss(labeled, tgt_cols, target_col=pred)
            metrics["signal_loss"] = sig
            metrics["message_reach"] = message_reach(
                metrics["fb_presence"], sig
            )
        (
            metrics["num_sig_vars"],
            metrics["num_sig_tgt_vars"],
            metrics["sig_question_groups"],
            metrics["sig_tgt_question_groups"],
        ) = significant_variables_and_spread(deliver)
    return metrics
