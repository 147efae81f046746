"""Pure-python/numpy mirrors of the scipy calls the reference makes,
used only by tests as a differential oracle (scipy is not installed).

Implements the textbook formulas: Pearson chi-squared with optional Yates
continuity correction (applied only at dof == 1, clamped — the scipy
behavior), expected frequencies, and adjusted residuals.
"""

from __future__ import annotations

import numpy as np

from qudo_etl_pipeline_spark.functions.stats import chi2_sf


def expected_freq(observed: np.ndarray) -> np.ndarray:
    observed = np.asarray(observed, dtype=np.float64)
    row = observed.sum(axis=1, keepdims=True)
    col = observed.sum(axis=0, keepdims=True)
    return row @ col / observed.sum()


def chi2_contingency(observed: np.ndarray, correction: bool = True):
    observed = np.asarray(observed, dtype=np.float64)
    expected = expected_freq(observed)
    if np.any(expected == 0):
        raise ValueError("zero element in expected frequencies")
    dof = (observed.shape[0] - 1) * (observed.shape[1] - 1)
    if dof == 0:
        return 0.0, 1.0, 0, expected
    diff = observed - expected
    if correction and dof == 1:
        diff = np.sign(diff) * np.maximum(np.abs(diff) - 0.5, 0.0)
    stat = float((diff**2 / expected).sum())
    p = float(chi2_sf(stat, dof))
    return stat, p, dof, expected


def adjusted_residuals(observed: np.ndarray) -> np.ndarray:
    observed = np.asarray(observed, dtype=np.float64)
    expected = expected_freq(observed)
    row = observed.sum(axis=1, keepdims=True)
    col = observed.sum(axis=0, keepdims=True)
    n = observed.sum()
    denom = np.sqrt(expected * (1 - row / n) * (1 - col / n))
    return (observed - expected) / denom
