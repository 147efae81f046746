"""Coverage regression pin: every SURVEY §2 operator id keeps at least
one catalog query claiming it (survey_ids in @register), except the
documented tests-only tier: the IO surface S3-S8 (CSV/JSON/parquet
sinks, existence probes, work-queue writes — no query surface;
verified in test_popmodes_io.py / test_pipeline.py) and M37
(get_all_metrics / run_all_segmentations orchestration — a
composition, not a query; verified end-to-end in
test_get_all_metrics_composition / test_pipeline.py and timed as a
whole in SCALING.md).

If an id disappears from this audit, a refactor silently dropped the
driver-gate verification for that operator.
"""

from __future__ import annotations

from qudo_etl_pipeline_spark.catalog import registry

TESTS_ONLY = {"S3", "S4", "S5", "S6", "S7", "S8", "M37"}

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
