"""End-to-end pipeline test (reference: src/kraken/app/main.py:45-183)
on the deterministic survey fixtures, plus the work-queue protocol."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from qudo_etl_pipeline_spark import workqueue as WQ
from qudo_etl_pipeline_spark.pipeline import (
    SegmentationConfig,
    run_all_segmentations,
    select_scheme_columns,
)
from tests.fixtures import make_responses


@pytest.fixture(scope="module")
def responses(spark):
    return spark.createDataFrame(make_responses(n=600))


def test_select_scheme_columns(spark, responses):
    cols = select_scheme_columns(responses, ["fin_", "psy_"], "alchemer_id")
    assert set(cols) == {"fin_uk_risk_rb", "fin_uk_goal_fb", "psy_ww_openness_sc"}
    assert "alchemer_id" not in select_scheme_columns(responses, ["all"], "alchemer_id")


def test_end_to_end_segmentation(spark, responses, tmp_path):
    cfg = SegmentationConfig(
        survey_name="fixture_survey",
        schemes={
            "behavioral": [
                "weightgain_", "fin_uk_risk", "tech_", "psy_", "fin_uk_goal",
            ]
        },
        weight_col="weight",
        # configs reference POST-tag names, as the reference's do
        # (main.py applies add_tgt_tag before the segmentation loop)
        rules_col="fin_uk_goal_fb_tgt",
        algorithms=("kmeans", "kmodes", "rules_based"),
        ks=[3],
        seeds=[1, 42],
        bucket_table="e2e_resp_bucketed",
        n_buckets=4,
        capture_plans=True,
    )
    # disable auto-broadcast so the label joins must resolve as
    # sort-merge joins — the shape whose exchange-freedom the bucketed
    # write is meant to buy (tiny fixture labels would broadcast
    # otherwise; explicit F.broadcast hints elsewhere still apply)
    spark.sql("DROP TABLE IF EXISTS e2e_resp_bucketed")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = run_all_segmentations(
            spark, responses, cfg, output_dir=str(tmp_path / "out")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        # NOTE: the bucketed table is dropped at the END of the test —
        # the returned frames' lineage still reads its files
    by_algo = out["behavioral"]
    # bucketed-write evidence: the label joins whose lineage is narrow
    # (encode -> assemble -> transform) read both sides pre-hashed on the
    # id buckets — no shuffle exchange above the join
    for algo in ("kmeans_and_pca", "rules_based"):
        plan = by_algo[algo]["join_plan"]
        assert "SortMergeJoin" in plan, (algo, plan[:800])
        assert "Exchange hashpartitioning" not in plan, (algo, plan[:2000])
    # the fixture's scheme has numeric columns, so the kmodes family
    # dispatches to kprototypes (clustering.py:220-234 parity)
    assert set(by_algo) == {"kmeans_and_pca", "kprototypes", "rules_based"}
    for algo, res in by_algo.items():
        assert res["labels"] is not None, algo
        m = res["metrics"]
        assert m["algorithm"] == algo
        # every family found planted structure -> some significant vars
        assert res["deliver"].count() > 0, algo
        deliver_cols = set(res["deliver"].columns)
        assert {"q_code", "pop_mode", "chi_2_result", "targeting_seg"} <= deliver_cols
        # p-values significant at alpha=0.05 only
        assert res["deliver"].filter(F.col("chi_2_result") > 0.05).count() == 0
        # return_API_data third element: one modal answer per
        # (cluster, scheme column) plus the cluster column's own row
        ml = res["mode_list"]
        assert set(ml.columns) == {"cluster", "variable", "mode_value"}
        n_clusters = res["labels"].select("prediction").distinct().count()
        assert ml.count() > 0 and ml.count() % n_clusters == 0
        # parity regressions from round-4 review: tgt tagging makes the
        # _fb column a tgt feature (magnitude/signal-loss/message-reach
        # exist), and social presence reads ORIGINAL answers (real
        # shares, not NaN)
        import math as _math

        fb = m["fb_presence"]
        assert isinstance(fb, dict) and fb, algo
        assert all(not _math.isnan(v) for v in fb.values()), (algo, fb)
        assert "magnitude" in m and "signal_loss" in m, algo
        assert "message_reach" in m, algo
    # sinks materialized
    metrics_csv = spark.read.option("header", True).csv(
        str(tmp_path / "out" / "metrics_csv")
    )
    assert metrics_csv.count() == 3
    deliver_rt = spark.read.parquet(
        str(tmp_path / "out" / "behavioral" / "kmeans_and_pca" / "deliver")
    )
    assert deliver_rt.count() == by_algo["kmeans_and_pca"]["deliver"].count()
    spark.sql("DROP TABLE IF EXISTS e2e_resp_bucketed")


def test_workqueue_protocol(tmp_path):
    qp = str(tmp_path / "queue.json")
    surveys = [
        {"survey_name": "s1", "processed_by": ["kraken"]},
        {"survey_name": "s2", "processed_by": []},
    ]
    with open(qp, "w") as fh:
        json.dump(surveys, fh)
    loaded = WQ.collected_surveys(qp)
    nxt = WQ.next_survey(loaded)
    assert nxt["survey_name"] == "s1"  # kraken's tag is not ours
    WQ.mark_processed(qp, "s1")
    nxt2 = WQ.next_survey(WQ.collected_surveys(qp))
    assert nxt2["survey_name"] == "s2"
    WQ.mark_processed(qp, "s2")
    assert WQ.next_survey(WQ.collected_surveys(qp)) is None
    assert WQ.collected_surveys(str(tmp_path / "missing.json")) == []


def test_populate_curated_cols(tmp_path):
    """populate_curated_cols_s3 parity: comma-split col lists land at
    the conventional [industry/]curated/segmentation/cols.json paths;
    already-list values pass through (the script's AttributeError
    branch)."""
    import json

    from qudo_etl_pipeline_spark import workqueue as WQ

    meta = [
        {"segmentation": "behavioral", "cols": "q1,q2,q3"},
        {"segmentation": "financial", "cols": ["qa", "qb"]},
        {"industry": "fintech", "segmentation": "risk", "cols": "qx"},
    ]
    paths = WQ.populate_curated_cols(meta, str(tmp_path))
    assert paths == [
        f"{tmp_path}/curated/behavioral/cols.json",
        f"{tmp_path}/curated/financial/cols.json",
        f"{tmp_path}/fintech/curated/risk/cols.json",
    ]
    assert json.load(open(paths[0])) == ["q1", "q2", "q3"]
    assert json.load(open(paths[1])) == ["qa", "qb"]
    assert json.load(open(paths[2])) == ["qx"]


def test_fit_timeout_watchdog(spark, responses, monkeypatch):
    """Reference parity with the hard LCA timeout (reference:
    src/kraken/app/clustering.py:884-891): a family fit exceeding
    cfg.fit_timeout_secs is marked timed-out and the scheme still
    completes with the remaining families."""
    import time

    from qudo_etl_pipeline_spark import pipeline as P

    def slow_family(encoded, cols, cfg, num_cols):
        time.sleep(6)
        return ("slow", {"labels": None, "k": None, "seed": None})

    monkeypatch.setitem(P._FAMILIES, "slow", slow_family)
    cfg = SegmentationConfig(
        survey_name="watchdog",
        algorithms=("slow", "rules_based"),
        fit_timeout_secs=1.5,
    )
    cols = ["fin_uk_risk_rb", "psy_ww_openness_sc"]
    out = P.run_scheme(spark, responses, cols, cfg)
    assert out["slow"]["labels"] is None
    assert "timed out" in out["slow"]["metrics"]["error"]
    # the non-timed-out family still reported (no rules_col -> the
    # documented no-clustering result)
    assert out["rules_based"]["metrics"]["n_clusters"] == "no balanced clustering"
