"""Coverage regression pin: every SURVEY §2 operator id keeps at least
one catalog query claiming it (survey_ids in @register), except the
documented tests-only tier: the IO surface S3-S8 (CSV/JSON/parquet
sinks, existence probes, work-queue writes — no query surface;
verified in test_popmodes_io.py / test_pipeline.py). M37 left the
tier in round 10: the whole-pipeline composition is now a rows-only
catalog surface (`pipeline_e2e_fixture`) in addition to its pytest
end-to-end coverage and the SCALING.md timed runs.

If an id disappears from this audit, a refactor silently dropped the
driver-gate verification for that operator.
"""

from __future__ import annotations

from qudo_etl_pipeline_spark.catalog import registry

TESTS_ONLY = {"S3", "S4", "S5", "S6", "S7", "S8"}

ALL_IDS = (
    [f"S{i}" for i in range(1, 9)]
    + [f"P{i}" for i in range(1, 11)]
    + [f"J{i}" for i in range(1, 6)]
    + [f"A{i}" for i in range(1, 13)]
    + [f"W{i}" for i in range(1, 5)]
    + [f"R{i}" for i in range(1, 7)]
    + [f"M{i}" for i in range(1, 38)]
)


def test_every_survey_id_has_a_catalog_query():
    claimed: set[str] = set()
    for spec in registry().values():
        claimed.update(spec.survey_ids)
    missing = [i for i in ALL_IDS if i not in claimed and i not in TESTS_ONLY]
    assert not missing, f"survey ids lost their catalog query: {missing}"


def test_registry_is_well_formed():
    specs = registry()
    assert len(specs) >= 128
    for name, spec in specs.items():
        assert spec.name == name
        assert callable(spec.spark)
        if spec.oracle is not None:
            assert "SELECT" in spec.oracle.upper()


def test_every_query_names_a_valid_survey_id():
    """Registry hygiene (r9 verdict task 7a): every catalog query must
    claim at least one VALID SURVEY §2 id — an id outside the §2
    inventory would silently inflate the coverage audit above."""
    valid = set(ALL_IDS)
    problems = {}
    for name, spec in registry().items():
        if not spec.survey_ids:
            problems[name] = "no survey_ids"
        else:
            bad = [s for s in spec.survey_ids if s not in valid]
            if bad:
                problems[name] = f"unknown ids {bad}"
    assert not problems, f"survey-id hygiene violations: {problems}"


def test_every_oracle_explains_in_duckdb():
    """Registry hygiene (r9 verdict task 7b): every oracle must be
    parseable/plannable by DuckDB (EXPLAIN dry-run over the real
    sf0.001 views) — a broken oracle would otherwise silently
    downgrade its query to a rows-only check at the driver gate."""
    import os

    import duckdb

    from qudo_etl_pipeline_spark.catalog import create_duckdb_views

    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001"
    )
    con = duckdb.connect()
    create_duckdb_views(con, sf_dir)
    broken = {}
    for name, spec in sorted(registry().items()):
        if spec.oracle is None:
            continue
        try:
            con.sql("EXPLAIN " + spec.oracle)
        except Exception as exc:  # noqa: BLE001
            broken[name] = str(exc).splitlines()[0]
    assert not broken, f"oracles DuckDB cannot plan: {broken}"


def test_no_catalog_output_schema_is_complex_typed(spark):
    """Registry hygiene (r9 verdict task 1b): no catalog query may
    emit an Array/Map/Struct column — the driver hashes results via
    pandas, which cannot hash list cells (the r9 `embedding_quantize`
    gate error). Complex values must serialize to canonical JSON
    strings at the catalog layer. Schema-only: builds every query's
    plan at sf0.001 (ML-fit queries do execute their fits). The rule
    itself is the shared catalog.complex_typed_cols helper — the same
    definition tools/selfcheck.py enforces every round."""
    import os

    from qudo_etl_pipeline_spark.catalog import complex_typed_cols
    from qudo_etl_pipeline_spark.operators.prefix import (
        prefix_cache_scope,
    )

    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001"
    )
    bad = {}
    for name, spec in sorted(registry().items()):
        with prefix_cache_scope():
            schema = spec.spark(spark, sf_dir).schema
        complex_cols = complex_typed_cols(schema)
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, f"complex-typed catalog outputs (driver-unhashable): {bad}"
