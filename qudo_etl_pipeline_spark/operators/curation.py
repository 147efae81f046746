"""End-to-end corpus curation: the training-data prep chain as ONE plan.

Beyond-reference operator (BASELINE.json north star): the standard
pretraining-corpus pipeline — quality gate, language gate, exact dedup,
near-dup drop — composed from the engine's existing JVM-side operators
into a per-document verdict table. This is the shape a 100 TB corpus
actually runs:

1. **quality gate** (map-only): token count + stopword-density score
   (operators/text.py expressions, no shuffle);
2. **language gate** (map-only): stopword-vote language id;
3. **exact dedup** (1 shuffle on the 64-bit content hash): keep the
   minimum doc id per identical text — hashes shuffle, never text;
4. **near-dup drop** (bucketed joins only): MinHash -> LSH banding ->
   candidate pairs -> true-Jaccard verification (operators/dedup.py),
   then drop every document with a verified near-duplicate of smaller
   id. This is *pair domination* — deterministic, one pass, and
   SQL-oracle-checkable — not transitive closure; component-level
   grouping is `dedup.neardup_groups` (label or star contraction) for
   callers that need whole-clique semantics.

Stages are applied in order: each gate sees only the previous stage's
survivors (dedup hashes are not wasted on rejected docs). Output is one
row per input document: (doc_id, kept, drop_reason) with drop_reason in
{'kept', 'low_quality', 'language', 'exact_dup', 'near_dup'}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.operators import dedup as D
from qudo_etl_pipeline_spark.operators import text as TX


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.5,
    n_hashes: int = 4,
    band_size: int = 2,
) -> DataFrame:
    """Per-document curation verdicts for the 4-stage pipeline above."""
    q = TX.quality_exprs(text_col)
    flagged = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.when(
            (q["n_tokens"] < min_tokens)
            | (q["quality_score"] < min_quality),
            F.lit("low_quality"),
        )
        .when(~TX.langid_pred(text_col).isin(*langs), F.lit("language"))
        .alias("_gate"),
    )

    s1 = flagged.filter(F.col("_gate").isNull()).select(id_col, text_col)

    # exact dedup among gate survivors: min id per content hash
    hashes = s1.select(
        F.col(id_col), D.exact_dup_hash(text_col).alias("_h")
    )
    keepers = hashes.groupBy("_h").agg(F.min(id_col).alias("_keeper"))
    exact_drop = (
        hashes.join(keepers, "_h")
        .filter(F.col(id_col) != F.col("_keeper"))
        .select(F.col(id_col), F.lit("exact_dup").alias("_exact"))
    )

    # near-dup drop among exact survivors: verified pair with smaller id
    s2 = s1.join(exact_drop.select(id_col), id_col, "left_anti")
    sigs = D.minhash_signatures(
        s2, id_col=id_col, text_col=text_col, n_hashes=n_hashes
    )
    cand = D.lsh_candidate_pairs(
        D.lsh_bands(sigs, n_hashes=n_hashes, band_size=band_size),
        id_col=id_col,
    )
    verified = D.verified_pairs(
        s2, cand, id_col=id_col, text_col=text_col,
        threshold=jaccard_threshold,
    )
    near_drop = (
        verified.select(F.col("id_b").alias(id_col))  # pairs have id_a < id_b
        .distinct()
        .withColumn("_near", F.lit("near_dup"))
    )

    # plain joins, NOT broadcast: duplicate sets are corpus-sized at
    # scale (dup share of a raw crawl is routinely 30-50%)
    return (
        flagged.join(exact_drop, id_col, "left")
        .join(near_drop, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("_gate", "_exact", "_near", F.lit("kept")).alias(
                "drop_reason"
            ),
        )
        .withColumn(
            "kept",
            (F.col("drop_reason") == "kept").cast("bigint"),
        )
    )
