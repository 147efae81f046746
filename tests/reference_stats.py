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


# --- sklearn-metric mirrors (sklearn is not installed) -----------------


def davies_bouldin_np(X: np.ndarray, labels: np.ndarray) -> float:
    X = np.asarray(X, dtype=np.float64)
    labels = np.asarray(labels)
    ks = np.unique(labels)
    cents = np.array([X[labels == k].mean(axis=0) for k in ks])
    scatter = np.array(
        [np.linalg.norm(X[labels == k] - cents[i], axis=1).mean() for i, k in enumerate(ks)]
    )
    db = 0.0
    for i in range(len(ks)):
        worst = 0.0
        for j in range(len(ks)):
            if i == j:
                continue
            d = np.linalg.norm(cents[i] - cents[j])
            worst = max(worst, (scatter[i] + scatter[j]) / d)
        db += worst
    return db / len(ks)


def calinski_harabasz_np(X: np.ndarray, labels: np.ndarray) -> float:
    X = np.asarray(X, dtype=np.float64)
    labels = np.asarray(labels)
    ks = np.unique(labels)
    n, k = len(X), len(ks)
    gmean = X.mean(axis=0)
    b = sum(
        (labels == c).sum() * np.linalg.norm(X[labels == c].mean(axis=0) - gmean) ** 2
        for c in ks
    )
    w = sum(
        (np.linalg.norm(X[labels == c] - X[labels == c].mean(axis=0), axis=1) ** 2).sum()
        for c in ks
    )
    return (b / (k - 1)) / (w / (n - k))


def silhouette_np(X: np.ndarray, labels: np.ndarray) -> float:
    X = np.asarray(X, dtype=np.float64)
    labels = np.asarray(labels)
    n = len(X)
    dist = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2))
    s = np.zeros(n)
    for i in range(n):
        same = labels == labels[i]
        n_same = same.sum()
        if n_same <= 1:
            s[i] = 0.0
            continue
        a = dist[i][same].sum() / (n_same - 1)
        b = min(
            dist[i][labels == c].mean() for c in np.unique(labels) if c != labels[i]
        )
        s[i] = (b - a) / max(a, b)
    return float(s.mean())


def silhouette_squared_np(X: np.ndarray, labels: np.ndarray) -> float:
    """MLlib SquaredEuclideanSilhouette mirror (the `silhouette_squared`
    scale path): dissimilarity to a cluster is the MEAN SQUARED distance
    to its points; the own-cluster mean (computed over all N members,
    self included) is rescaled by N/(N-1) to exclude the self-distance;
    singleton clusters score 0."""
    X = np.asarray(X, dtype=np.float64)
    labels = np.asarray(labels)
    n = len(X)
    ks = np.unique(labels)
    sq = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    s = np.zeros(n)
    for i in range(n):
        same = labels == labels[i]
        n_same = same.sum()
        if n_same <= 1:
            s[i] = 0.0
            continue
        a = sq[i][same].mean() * n_same / (n_same - 1)
        b = min(sq[i][labels == c].mean() for c in ks if c != labels[i])
        s[i] = (b - a) / max(a, b)
    return float(s.mean())


def adjusted_rand_np(a: np.ndarray, b: np.ndarray) -> float:
    a, b = np.asarray(a), np.asarray(b)
    ka, kb = np.unique(a), np.unique(b)
    cont = np.array([[((a == x) & (b == y)).sum() for y in kb] for x in ka])

    def c2(x):
        return x * (x - 1) / 2.0

    sum_nij = c2(cont).sum()
    sum_ai = c2(cont.sum(axis=1)).sum()
    sum_bj = c2(cont.sum(axis=0)).sum()
    cn2 = c2(len(a))
    expected = sum_ai * sum_bj / cn2
    maximum = (sum_ai + sum_bj) / 2.0
    if maximum == expected:
        return 1.0
    return float((sum_nij - expected) / (maximum - expected))


def cochrans_q_np(X: np.ndarray):
    X = np.asarray(X, dtype=np.float64)
    k = X.shape[1]
    t = X.sum(axis=0)
    r = X.sum(axis=1)
    n = X.sum()
    q = (k - 1) * (k * (t**2).sum() - n**2) / (k * n - (r**2).sum())
    return float(q), k - 1
