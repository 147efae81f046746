"""Deterministic survey-shaped fixtures (FIXTURES.md F1/F2), seed 42.

Lives in the package (not tests/) because the catalog's
``pipeline_e2e_fixture`` query generates its respondent frame here —
the driver gate must be able to run it from an installed package
without the repo checkout. tests/fixtures.py re-exports this module.

1000 respondents, 6 planted latent classes; column names follow the
reference's behavior-bearing conventions (_time, cint, qudo_, _fb/_gg,
weight decoys, html, numeric answer codes, 'Not shown' sentinels).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

LIKERT = [
    "Strongly agree", "Agree", "Neither agree nor disagree",
    "Disagree", "Strongly disagree",
]


def make_responses(n: int = 1000, n_classes: int = 6, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    cls = rng.integers(0, n_classes, size=n)

    def class_biased(options, strength=0.75):
        """Each latent class prefers one option with given probability."""
        out = []
        for k in cls:
            if rng.random() < strength:
                out.append(options[k % len(options)])
            else:
                out.append(options[rng.integers(0, len(options))])
        return out

    df = pd.DataFrame(
        {
            "alchemer_id": np.arange(1, n + 1, dtype=np.int64),
            "cint_id": [f"cint_{i:05d}" for i in range(n)],
            "weight": rng.uniform(0.5, 1.8, size=n),
            "precompletion_weight": rng.uniform(0.5, 1.8, size=n),
            "qudo_weight_scaled": rng.uniform(0.5, 1.8, size=n),
            "weightgain_ww_concern_rb": class_biased(["Yes", "No", "Maybe"]),
            "fin_uk_risk_rb": class_biased(
                ["High risk", "Medium risk", "Low risk"]
            ),
            "tech_ww_techcomfort_rb_ord": class_biased(LIKERT),
            "psy_ww_openness_sc": class_biased(["10006", "10007", "10008", "10009"]),
            "fin_uk_goal_fb": class_biased(["Save", "Invest", "Spend"]),
            "mc_ww_smplatform_gg": class_biased(
                ["Facebook", "Instagram", "TikTok", "not selected"]
            ),
            "qudo_spender_segmentation": class_biased(["Saver", "Spender"]),
            "shop_ww_basket_time_spent": rng.uniform(2, 300, size=n),
            "att_ww_brand_html_rb": class_biased(
                ["<b>Brand A</b>", "Brand B", "<i>Brand C</i>"]
            ),
            "latent_class": [f"class_{k}" for k in cls],
        }
    )
    # sprinkle NAs and 'Not shown'
    na_rows = rng.choice(n, size=n // 10, replace=False)
    df.loc[na_rows, "fin_uk_risk_rb"] = None
    ns_rows = rng.choice(n, size=n // 12, replace=False)
    df.loc[ns_rows, "tech_ww_techcomfort_rb_ord"] = "Not shown"
    wna_rows = rng.choice(n, size=n // 20, replace=False)
    df.loc[wna_rows, "weight"] = np.nan
    return df


def make_questions(seed: int = 42) -> pd.DataFrame:
    """F2 metadata: psy_ww_openness_sc codes mismatch their display text."""
    rows = [
        ("psy_ww_openness_sc", "q_openness", "Very open", "10006", "psy"),
        ("psy_ww_openness_sc", "q_openness", "Open", "10007", "psy"),
        ("psy_ww_openness_sc", "q_openness", "Closed", "10008", "psy"),
        ("psy_ww_openness_sc", "q_openness", "Very closed", "10009", "psy"),
        ("fin_uk_risk_rb", "q_risk", "High risk", "High risk", "att"),
        ("fin_uk_risk_rb", "q_risk", "Medium risk", "Medium risk", "att"),
        ("fin_uk_risk_rb", "q_risk", "Low risk", "Low risk", "att"),
    ]
    return pd.DataFrame(
        rows, columns=["varname", "shortname", "option_text", "option_value", "category"]
    )
