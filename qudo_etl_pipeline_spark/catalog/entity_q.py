"""Entity-resolution catalog entries (operators/entity.py).

Planted construction: every customer record gets one "dirty" twin —
same row with the last name character replaced by ``X`` and the id
offset by 1e8 — so ground truth is known (each entity = {orig, twin}).
The pipeline must re-find it: block on the name's digit prefix
(``substr(name, 10, 8)`` = customer number / 10, so blocks stay
≤ 20 members at ANY scale factor), compare within blocks only,
match on normalized Levenshtein >= 0.9 AND exact account-balance
equality (the multi-attribute gate that rejects same-block neighbors
whose names are 1 edit apart), then transitively close matches into
entity ids with the connected-components operator.

The oracle replays the identical construction in DuckDB (levenshtein
is available there with the same plain-edit-distance semantics) and
closes the match graph with the recursive-CTE reachability used by the
near-dup CC oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.catalog import load_table, register
from qudo_etl_pipeline_spark.functions.rounding import ref_round_sql
from qudo_etl_pipeline_spark.operators import entity as E

_OFFSET = 100_000_000


def _dirty_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orig = cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
    )
    twin = cust.select(
        (F.col("c_custkey") + F.lit(_OFFSET)).alias("id"),
        F.concat(
            F.substring(
                F.col("c_name"), 1, F.length(F.col("c_name")) - 1
            ),
            F.lit("X"),
        ).alias("name"),
        F.col("c_acctbal").alias("bal"),
    )
    return orig.unionByName(twin)


_RECS_CTE = f"""recs AS (
      SELECT c_custkey AS id, c_name AS name, c_acctbal AS bal
      FROM customer
      UNION ALL
      SELECT c_custkey + {_OFFSET},
             substr(c_name, 1, length(c_name) - 1) || 'X',
             c_acctbal
      FROM customer
    )"""

_SIM = ref_round_sql(
    "1.0 - levenshtein(ra.name, rb.name) * 1.0 /"
    " GREATEST(length(ra.name), length(rb.name))",
    6,
)

_ER_ORACLE = f"""
    WITH RECURSIVE {_RECS_CTE},
    blocks AS (
      SELECT substr(name, 10, 8) AS block_key, id FROM recs
      WHERE substr(name, 10, 8) IS NOT NULL
    ),
    kept AS (
      SELECT b.block_key, b.id FROM blocks b
      JOIN (
        SELECT block_key FROM blocks GROUP BY block_key
        HAVING COUNT(*) <= 1000
      ) s USING (block_key)
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM kept a JOIN kept b
        ON a.block_key = b.block_key AND a.id < b.id
    ),
    vp AS (
      SELECT id_a, id_b FROM (
        SELECT c.id_a, c.id_b, {_SIM} AS sim
        FROM cand c
        JOIN recs ra ON c.id_a = ra.id
        JOIN recs rb ON c.id_b = rb.id
        WHERE ra.bal = rb.bal
      ) WHERE sim >= 0.9
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM vp
      UNION
      SELECT id_b AS src, id_a AS dst FROM vp
    ),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    cc AS (
      SELECT src AS id, LEAST(src, MIN(dst)) AS group_id
      FROM reach GROUP BY src
    )
    SELECT r.id AS id, COALESCE(cc.group_id, r.id) AS entity_id
    FROM recs r LEFT JOIN cc ON r.id = cc.id
    ORDER BY id
    """


@register(
    "entity_resolution_planted",
    oracle=_ER_ORACLE,
    survey_ids=["P7", "J3"],
    description="Record linkage over planted dirty customer twins: "
    "digit-prefix blocking (blocks <= 20 at any sf), within-block "
    "Levenshtein >= 0.9 + exact-balance gate, CC entity ids "
    "(oracle: DuckDB levenshtein + recursive-CTE closure)",
)
def entity_resolution_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    recs = _dirty_records(spark, sf_dir)
    blocks = E.blocking_keys(
        recs, "id", [F.substring(F.col("name"), 10, 8)]
    )
    cand = E.candidate_pairs(blocks, max_block_size=1000)
    matched = E.score_pairs(
        recs, cand, "id", "name", exact_cols=["bal"], threshold=0.9
    )
    return E.resolve_entities(recs, matched, "id").orderBy("id")


@register(
    "entity_match_pairs_planted",
    oracle=f"""
    WITH {_RECS_CTE},
    blocks AS (
      SELECT substr(name, 10, 8) AS block_key, id FROM recs
      WHERE substr(name, 10, 8) IS NOT NULL
    ),
    kept AS (
      SELECT b.block_key, b.id FROM blocks b
      JOIN (
        SELECT block_key FROM blocks GROUP BY block_key
        HAVING COUNT(*) <= 1000
      ) s USING (block_key)
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM kept a JOIN kept b
        ON a.block_key = b.block_key AND a.id < b.id
    )
    SELECT id_a, id_b, sim FROM (
      SELECT c.id_a, c.id_b, {_SIM} AS sim
      FROM cand c
      JOIN recs ra ON c.id_a = ra.id
      JOIN recs rb ON c.id_b = rb.id
      WHERE ra.bal = rb.bal
    ) WHERE sim >= 0.9
    ORDER BY id_a, id_b
    """,
    survey_ids=["P7", "J3"],
    description="Entity-resolution stage 2: scored within-block match "
    "pairs (normalized Levenshtein + exact-attribute gate)",
)
def entity_match_pairs_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    recs = _dirty_records(spark, sf_dir)
    blocks = E.blocking_keys(
        recs, "id", [F.substring(F.col("name"), 10, 8)]
    )
    cand = E.candidate_pairs(blocks, max_block_size=1000)
    return E.score_pairs(
        recs, cand, "id", "name", exact_cols=["bal"], threshold=0.9
    ).orderBy("id_a", "id_b")
