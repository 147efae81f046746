"""Cleaning layer (P1-P10) unit tests + survey end-to-end inference."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qudo_etl_pipeline_spark.operators import cleaning as C
from qudo_etl_pipeline_spark.operators.contingency import (
    contingency_tables,
    deliver_stats,
    discover_stats,
)

from tests.fixtures import make_questions, make_responses


@pytest.fixture(scope="module")
def responses(spark):
    return spark.createDataFrame(make_responses())


@pytest.fixture(scope="module")
def questions(spark):
    return spark.createDataFrame(make_questions())


def test_drop_time_and_lowercase(spark, responses):
    out = C.drop_time_cols(responses)
    assert "shop_ww_basket_time_spent" not in out.columns
    assert all(c == c.lower() for c in out.columns)
    assert "fin_uk_risk_rb" in out.columns


def test_fill_na_policy(spark, responses):
    out = C.fill_na_policy(responses)
    n_null_str = out.filter(F.col("fin_uk_risk_rb").isNull()).count()
    assert n_null_str == 0
    assert out.filter(F.col("fin_uk_risk_rb") == "not selected").count() > 0
    # numeric NA -> -999
    assert out.filter(F.col("weight") == -999).count() > 0


def test_drop_cint_weight_cols(spark, responses):
    out = C.drop_cint_weight_cols(responses)
    assert "cint_id" not in out.columns
    assert "qudo_weight_scaled" not in out.columns
    assert "weight" in out.columns  # plain weight kept (excluded later)


def test_inference_excluded_cols():
    cols = [
        "weight", "precompletion_weight", "weightgain_ww_concern_rb",
        "qudo_spender_segmentation", "fin_uk_risk_rb",
    ]
    excl = C.inference_excluded_cols(cols, weight_col="weight")
    assert "weight" in excl and "precompletion_weight" in excl
    assert "qudo_spender_segmentation" in excl
    assert "weightgain_ww_concern_rb" not in excl  # decoy stays


def test_tgt_tagging_and_numeric_strip():
    cols = ["fin_uk_goal_fb", "mc_ww_smplatform_gg", "fin_uk_risk_rb",
            "already_fb_tgt", "score_numeric"]
    tagged = C.add_tgt_tag(cols)
    assert "fin_uk_goal_fb_tgt" in tagged
    assert "mc_ww_smplatform_gg_tgt" in tagged
    assert "fin_uk_risk_rb" in tagged
    assert "already_fb_tgt" in tagged  # not double-tagged
    assert C.remove_numeric_tag(["score_numeric"]) == ["score"]


def test_recode_option_values(spark, responses, questions):
    out = C.recode_option_values(responses, questions)
    vals = {
        r[0]
        for r in out.select("psy_ww_openness_sc").distinct().collect()
    }
    assert vals <= {"Very open", "Open", "Closed", "Very closed"}
    # risk column had no mismatches -> untouched
    risk = {r[0] for r in out.select("fin_uk_risk_rb").distinct().collect()}
    assert "High risk" in risk


def test_try_cast_numeric(spark):
    df = spark.createDataFrame(
        [("1", "a", "1.5"), ("2", "b", None), ("3", "1", "x")],
        "num_str string, mixed string, bad string",
    )
    out = C.try_cast_numeric(df)
    types = dict(out.dtypes)
    assert types["num_str"] == "double"  # fully castable
    assert types["mixed"] == "string"   # 'a','b' fail
    assert types["bad"] == "string"     # 'x' fails


def test_strip_html(spark, responses):
    out = responses.select(
        C.strip_html("att_ww_brand_html_rb").alias("clean")
    )
    vals = {r[0] for r in out.distinct().collect()}
    assert vals == {"Brand A", "Brand B", "Brand C"}


def test_find_weight_col_and_ci():
    cols = ["weight", "precompletion_weight", "x"]
    ec = {"weighting": {"utility": {"pre_completes": True, "post_completes": False}},
          "confidence_interval": "0.9"}
    assert C.find_weight_col(ec, cols) == "precompletion_weight"
    assert C.find_conf_interval(ec) == 0.9
    ec2 = {"weighting": {"utility": {"pre_completes": False, "post_completes": True}}}
    assert C.find_weight_col(ec2, cols) == "weight"
    assert C.find_conf_interval(ec2) == 0.95
    ec3 = {"weighting": {"utility": {"pre_completes": False, "post_completes": False}}}
    assert C.find_weight_col(ec3, cols) is None


def test_survey_end_to_end(spark, responses, questions):
    """Full pipeline: clean -> recode -> tag -> inference on planted classes."""
    clean = C.clean_responses(responses, questions=questions)
    clean = C.drop_cint_weight_cols(clean)
    clean = C.rename_columns(clean, C.add_tgt_tag(clean.columns))

    excluded = C.inference_excluded_cols(clean.columns, weight_col="weight")
    variables = [
        c
        for c in clean.columns
        if c not in excluded and c not in ("alchemer_id", "latent_class")
    ]
    tables = contingency_tables(
        clean, cluster_col="latent_class", variables=variables,
        weight_col="weight", id_vars=["alchemer_id"],
    )
    deliver = deliver_stats(tables).collect()
    assert len(deliver) > 0
    sig_vars = {r["q_code"] for r in deliver}
    # planted class-biased variables must be detected
    assert "fin_uk_risk_rb" in sig_vars
    assert "psy_ww_openness_sc" in sig_vars
    # recoded values (not raw codes) appear in significant categories
    all_cats = {c for r in deliver for c in r["sig_more_category"]}
    assert all_cats & {"Very open", "Open", "Closed", "Very closed"}
    assert not all_cats & {"10006", "10007", "10008", "10009"}
    assert "not selected" not in all_cats
    # p-values sorted ascending, weighted columns present
    ps = [r["chi_2_result"] for r in deliver]
    assert ps == sorted(ps)
    assert deliver[0]["weighted_pop_mode"] is not None

    disc = discover_stats(deliver_stats(tables)).collect()
    per_seg: dict[str, int] = {}
    for r in disc:
        per_seg[r["targeting_seg"]] = per_seg.get(r["targeting_seg"], 0) + 1
    assert max(per_seg.values()) <= 10
    assert set(per_seg) == {f"class_{k}" for k in range(6)}
