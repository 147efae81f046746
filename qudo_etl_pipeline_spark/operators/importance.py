"""Data-selection by importance resampling (DSIR) for pretraining corpora.

Beyond-reference operator (BASELINE.json north star): the DSIR method of
Xie et al., "Data Selection for Language Models via Importance
Resampling" (NeurIPS 2023). A target distribution (the high-quality
domain you want more of) and the raw corpus are both modeled as
bag-of-hashed-n-gram multinomials; every document is scored with its
log importance weight  sum_f log(p_target(f) / p_raw(f))  and selection
keeps the top-weighted documents. The paper samples with Gumbel noise;
this implementation ranks deterministically on the rounded weight so the
result is reproducible and oracle-checkable.

Scale design (100 TB corpus):
- features are word uni+bigrams hashed into ``n_buckets`` (the paper's
  10k-bucket device) — a narrow map, one md5 per gram;
- both multinomials come from ONE groupBy over the exploded feature
  stream (target counts are a conditional sum, not a second scan);
- the per-bucket log-ratio table is ``n_buckets`` rows — broadcast side
  of the feature join at any corpus size;
- per-document weights are one id-keyed aggregation; top-k selection is
  a distributed TakeOrdered, not a global sort.

Cross-engine determinism: per-bucket log-ratios are rounded to 9
decimals before the per-document sum, outputs to 6 (the cos9 device used
throughout the catalog).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.functions.hashing import hash64

# uni+bigram stream over the lowercased text; the 1-word degenerate doc
# contributes its word twice (concat_ws skips the missing neighbor),
# mirrored exactly in the DuckDB oracle
_GRAMS = (
    "concat(split(lower({t}), ' '), "
    "transform(sequence(1, greatest(size(split(lower({t}), ' ')) - 1, 1)), "
    "i -> concat_ws(' ', try_element_at(split(lower({t}), ' '), i), "
    "try_element_at(split(lower({t}), ' '), i + 1))))"
)


def dsir_weights(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document DSIR log importance weight.

    ``target`` is a boolean Column marking the documents that define the
    target distribution (e.g. ``F.col("source") == "src0"``). Both
    multinomials are Laplace-smoothed over the full bucket space:
    p(b) = (c_b + 1) / (T + n_buckets).

    Output: ``doc_id``, ``n_feats`` (gram count), ``dsir_logratio``
    (6-decimal log weight; positive = looks like the target).
    """
    feats = (
        docs.select(
            F.col(id_col),
            target.alias("_tgt"),
            F.explode(F.expr(_GRAMS.format(t=text_col))).alias("g"),
        )
        .filter(F.col("g") != "")
        .withColumn("b", hash64("g") % n_buckets)
    )
    counts = feats.groupBy("b").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.sum(F.col("_tgt").cast("long")).alias("c_tgt"),
    )
    totals = counts.agg(
        F.sum("c_raw").alias("_t_raw"), F.sum("c_tgt").alias("_t_tgt")
    )
    ratios = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        F.round(
            F.log(
                ((F.col("c_tgt") + 1.0) / (F.col("_t_tgt") + n_buckets))
                / ((F.col("c_raw") + 1.0) / (F.col("_t_raw") + n_buckets))
            ),
            9,
        ).alias("lr9"),
    )
    return (
        feats.join(F.broadcast(ratios), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
            F.round(F.sum("lr9"), 6).alias("dsir_logratio"),
        )
    )


def dsir_select(
    weights: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Top-``k`` documents by DSIR weight, deterministically.

    Rank on (rounded weight DESC, id ASC): ties on the 6-decimal weight
    cannot reorder across engines. The cut itself is
    ``orderBy(...).limit(k)`` — Spark's distributed TakeOrdered (per-
    partition top-k, then a k-row merge), NOT a global sort; the
    row_number window that materializes ``sel_rank`` runs over the
    already-cut k rows only, so no full-table single-partition stage
    exists at any scale.
    """
    order = [F.desc("dsir_logratio"), F.asc(id_col)]
    top = weights.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.select(
        id_col,
        "n_feats",
        "dsir_logratio",
        F.row_number().over(w).cast("bigint").alias("sel_rank"),
    )
