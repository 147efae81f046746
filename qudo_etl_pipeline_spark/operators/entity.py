"""Entity resolution: blocking -> bounded candidate pairs ->
multi-attribute fuzzy scoring -> connected-component entity ids.

Extension scope (no reference counterpart): record linkage is the
standard cleanup step before training-data aggregation joins user /
customer / account records that refer to the same real-world entity
under dirty keys (Fellegi-Sunter 1969 is the public model; the
blocking + within-block compare + transitive-closure shape is the one
every large-scale ER system uses — an all-pairs compare is O(n²) and
never runs at 100 TB).

Scale design:
- ``blocking_keys`` is a map-only projection (one or more deterministic
  key expressions per record, unioned);
- ``candidate_pairs`` self-joins WITHIN a block only, after dropping
  blocks larger than ``max_block_size`` (the standard hot-block guard:
  an over-broad key like an empty name would otherwise go quadratic;
  dropped blocks are a recall trade-off that the caller widens with a
  second, sharper blocking strategy). Cost is sum over blocks of
  |b|², bounded by ``max_block_size`` × rows;
- ``score_pairs`` joins the two records per pair (keyed shuffles on
  id) and computes JVM-side similarity: normalized Levenshtein on the
  fuzzy column plus optional exact-match attribute gates;
- ``resolve_entities`` reuses the near-dup connected-components
  operator (min-label / star contraction) over matched pairs, so the
  transitive closure is diameter-independent at scale.

Every step is a plain DataFrame op — no Python crossing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "blocking_keys",
    "candidate_pairs",
    "score_pairs",
    "resolve_entities",
]


def blocking_keys(
    records: DataFrame,
    id_col: str,
    key_exprs: list,
) -> DataFrame:
    """(block_key, id) pairs under one or more blocking strategies.

    ``key_exprs`` are Column expressions over ``records`` (e.g. a name
    prefix, a phonetic code, zip+last-name-initial); records emit one
    row per strategy. NULL keys are dropped (they would form a single
    giant junk block).
    """
    parts = [
        records.select(
            e.cast("string").alias("block_key"),
            F.col(id_col).alias("id"),
        )
        for e in key_exprs
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.filter(F.col("block_key").isNotNull())


def candidate_pairs(
    blocks: DataFrame,
    max_block_size: int = 1000,
) -> DataFrame:
    """Distinct within-block id pairs (id_a < id_b), skipping blocks
    over ``max_block_size`` members.

    The size gate runs as one aggregation over the block table; the
    pair join is then block-local, so worst-case work is
    ``max_block_size`` × |blocks| — never all-pairs.
    """
    from qudo_etl_pipeline_spark.operators.prefix import (
        acquire_operator_cache,
    )

    # the narrow (block_key, id) table feeds the size gate and BOTH
    # self-join sides — cached once so the caller's record plan (often
    # a union of derived scans) is not re-run per branch
    blocks = acquire_operator_cache(blocks)
    sized = blocks.groupBy("block_key").agg(
        F.count(F.lit(1)).alias("_bs")
    )
    kept = blocks.join(
        sized.filter(F.col("_bs") <= max_block_size).select("block_key"),
        "block_key",
    )
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
        )
        .distinct()
    )


def score_pairs(
    records: DataFrame,
    pairs: DataFrame,
    id_col: str,
    fuzzy_col: str,
    exact_cols: list[str] | None = None,
    threshold: float = 0.9,
) -> DataFrame:
    """Match candidate pairs: normalized Levenshtein similarity on
    ``fuzzy_col`` (1 - dist/max_len) gated by exact equality on each of
    ``exact_cols``. Returns (id_a, id_b, sim) for pairs with
    sim >= threshold and all exact gates passing; ``sim`` is rounded
    to 6 for cross-engine determinism.
    """
    from qudo_etl_pipeline_spark.operators.prefix import (
        acquire_operator_cache,
    )

    cols = [fuzzy_col] + list(exact_cols or [])
    # both join legs reference the narrow record side — cached once so
    # the record plan is not re-run per leg
    side = acquire_operator_cache(
        records.select(F.col(id_col).alias("id"), *cols)
    )
    a = side.alias("ra")
    b = side.alias("rb")
    j = (
        pairs.join(a, pairs.id_a == F.col("ra.id"))
        .join(b, pairs.id_b == F.col("rb.id"))
    )
    from qudo_etl_pipeline_spark.functions.rounding import ref_round

    fa, fb = F.col(f"ra.{fuzzy_col}"), F.col(f"rb.{fuzzy_col}")
    max_len = F.greatest(F.length(fa), F.length(fb))
    sim = ref_round(
        F.lit(1.0) - F.levenshtein(fa, fb) / max_len.cast("double"), 6
    )
    # exact gates FIRST in the conjunction: And short-circuits left to
    # right, so the O(len^2) levenshtein only runs on pairs that pass
    # the cheap equality gates (measured 10.8s -> sub-2s at sf0.1 on
    # the planted query, where the balance gate kills ~all candidates)
    cond = F.lit(True)
    for c in exact_cols or []:
        cond = cond & (F.col(f"ra.{c}") == F.col(f"rb.{c}"))
    cond = cond & (sim >= F.lit(threshold))
    return j.filter(cond).select("id_a", "id_b", sim.alias("sim"))


def resolve_entities(
    records: DataFrame,
    matched: DataFrame,
    id_col: str,
    method: str = "label",
) -> DataFrame:
    """(id, entity_id) for every record: connected components over the
    matched pairs (entity_id = min reachable id); singletons keep their
    own id. One left join of the CC labels onto the record ids."""
    from qudo_etl_pipeline_spark.operators.dedup import neardup_groups

    groups = neardup_groups(matched, id_col="id", method=method)
    return (
        records.select(F.col(id_col).alias("id"))
        .join(groups, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("group_id"), F.col("id")).alias("entity_id"),
        )
    )


def golden_record(
    records: DataFrame,
    group_col: str,
    rules: dict[str, str],
    recency_col: str | None = None,
) -> DataFrame:
    """Survivorship: collapse each matched-entity group to ONE golden
    record, per-attribute, by declared rule — the step after
    :func:`resolve_entities` turns match clusters into a master table.

    ``rules`` maps attribute -> rule:

    - ``"max"`` / ``"min"``: numeric/lex extremes (SQL MAX/MIN).
    - ``"longest"``: longest string, ties to the lexicographically
      LARGEST (one max-over-struct, no window).
    - ``"newest"``: value on the row with the greatest
      ``recency_col`` (ties again to the largest value) — requires
      ``recency_col``.
    - ``"most_frequent"``: modal value, ties to the SMALLEST value
      with non-null preferred — the contingency layer's
      min-over-struct argmax, melted so ALL mode attributes share ONE
      extra shuffle regardless of how many there are. The melt carries
      values as strings (the shared long-format type), but the tie
      order stays NUMERIC for numeric source columns (a parallel
      double sort key rides the struct — ``2`` beats ``10``, never
      lexicographic ``'10' < '2'``) and the surviving value is cast
      BACK to the source column's dtype after the pivot, so the
      output schema matches the input schema attribute-for-attribute.

    Every rule is a deterministic struct-ordered aggregate: no windows,
    no tie nondeterminism, one groupBy for the scalar rules plus one
    melted groupBy for the mode rules. NULLs lose to any value under
    longest/newest (struct nulls-first ordering is sidestepped by an
    explicit non-null flag).

    Output: one row per group, columns = group + the ruled attributes.
    """
    scalar_aggs = []
    mode_cols = []
    for col, rule in rules.items():
        c = F.col(col)
        if rule == "max":
            scalar_aggs.append(F.max(c).alias(col))
        elif rule == "min":
            scalar_aggs.append(F.min(c).alias(col))
        elif rule == "longest":
            scalar_aggs.append(
                F.max(
                    F.struct(
                        c.isNotNull().cast("int").alias("nn"),
                        F.coalesce(F.length(c), F.lit(-1)).alias("l"),
                        c.alias("v"),
                    )
                )["v"].alias(col)
            )
        elif rule == "newest":
            if recency_col is None:
                raise ValueError(
                    f"rule 'newest' for {col!r} needs recency_col"
                )
            scalar_aggs.append(
                F.max(
                    F.struct(
                        c.isNotNull().cast("int").alias("nn"),
                        F.col(recency_col).alias("r"),
                        c.alias("v"),
                    )
                )["v"].alias(col)
            )
        elif rule == "most_frequent":
            mode_cols.append(col)
        else:
            raise ValueError(f"unknown survivorship rule {rule!r}")

    base = records.groupBy(F.col(group_col).alias(group_col))
    out = base.agg(*scalar_aggs) if scalar_aggs else (
        records.select(group_col).distinct()
    )
    if mode_cols:
        dtypes = dict(records.dtypes)
        numeric_prefixes = (
            "tinyint", "smallint", "int", "bigint",
            "float", "double", "decimal",
        )
        long = None
        for col in mode_cols:
            # _vord keeps ties NUMERIC for numeric attributes: the
            # melt's shared string type would otherwise sort '10'
            # before '2'. Non-numeric attributes get a constant 0.0
            # so ordering falls through to the string value.
            if dtypes[col].startswith(numeric_prefixes):
                vord = F.coalesce(
                    F.col(col).cast("double"), F.lit(0.0)
                )
            else:
                vord = F.lit(0.0)
            part = records.select(
                F.col(group_col).alias("_g"),
                F.lit(col).alias("_a"),
                F.col(col).cast("string").alias("_v"),
                vord.alias("_vord"),
            )
            long = part if long is None else long.unionByName(part)
        counts = long.groupBy("_g", "_a", "_v", "_vord").agg(
            F.count(F.lit(1)).alias("_n")
        )
        pick = counts.groupBy("_g", "_a").agg(
            F.min(
                F.struct(
                    (-F.col("_n")).alias("neg_n"),
                    F.col("_v").isNull().cast("int").alias("null_last"),
                    F.col("_vord").alias("vord"),
                    F.col("_v").alias("v"),
                )
            ).alias("_m")
        )
        modes = (
            pick.groupBy("_g")
            .pivot("_a", mode_cols)
            .agg(F.first("_m.v"))
        )
        for col in mode_cols:
            modes = modes.withColumnRenamed(col, f"_mode_{col}")
        # eqNullSafe: the NULL-key group's modes must join back to its
        # golden record, not silently fall out (r11 NULL-salt parity)
        out = out.join(
            modes, out[group_col].eqNullSafe(modes["_g"]), "left"
        ).drop("_g")
        for col in mode_cols:
            # survivor rides the melt as a string — restore the
            # source dtype so the golden record schema matches input
            out = out.withColumn(
                col, F.col(f"_mode_{col}").cast(dtypes[col])
            ).drop(f"_mode_{col}")
    return out.select(group_col, *rules.keys())
